package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.link.PathNorm

/** Path normalization semantics (reference linker.rs:398-470 + paths_match
  * :481-506) — table-driven cases + ScalaCheck-generated invariants
  * (deterministic seed; no scalatestplus bridge in the offline cache).
  */
class PathNormSpec extends SparkSpec {
  import spark.implicits._

  private def runNorm(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: Seq[String]): Map[String, String] =
    in.toDF("p").select(col("p"), f(col("p")).as("n")).as[(String, String)].collect().toMap

  test("normalize_frontend: scheme/host strip, ${} -> :param, leading template trim") {
    val cases = Map(
      "https://api.example.com/api/users/${id}" -> "/api/users/:param",
      "http://h/x/" -> "/x",
      "/api/orders/${order_id}/items" -> "/api/orders/:param/items",
      "${base}/api/users" -> "/api/users",
      "/plain/path" -> "/plain/path",
      "/" -> "/"
    )
    val got = runNorm(PathNorm.normalizeFrontend, cases.keys.toSeq)
    cases.foreach { case (in, want) => assert(got(in) == want, s"frontend($in)") }
  }

  test("normalize_backend: {id} :id <id> (id) [x] [...x] -> :param; trailing slash") {
    val cases = Map(
      "/api/users/{id}" -> "/api/users/:param",
      "/api/users/{id?}" -> "/api/users/:param",
      "/api/users/:id" -> "/api/users/:param",
      "/api/users/<id>" -> "/api/users/:param",
      "/api/users/(id)" -> "/api/users/:param",
      "/api/files/[...slug]" -> "/api/files/:param",
      "/api/files/[slug]" -> "/api/files/:param",
      "/api/users/" -> "/api/users",
      "/" -> "/"
    )
    val got = runNorm(PathNorm.normalizeBackend, cases.keys.toSeq)
    cases.foreach { case (in, want) => assert(got(in) == want, s"backend($in)") }
  }

  test("canonical: concrete numeric segments equi-join with :param templates") {
    val got = runNorm(c => PathNorm.canonical(PathNorm.normalizeFrontend(c)),
      Seq("/api/orders/3", "/api/orders/${id}", "/api/v2/orders"))
    assert(got("/api/orders/3") == "/api/orders/:param")
    assert(got("/api/orders/${id}") == "/api/orders/:param")
    assert(got("/api/v2/orders") == "/api/v2/orders", "v2 is not all-numeric")
  }

  test("property: normalization is idempotent (200 generated paths, seed 42)") {
    val seg = Gen.oneOf(
      Gen.stringOfN(5, Gen.alphaLowerChar),
      Gen.chooseNum(0, 9999).map(_.toString),
      Gen.const("{id}"), Gen.const(":x"), Gen.const("<id>"), Gen.const("[slug]")
    )
    val pathGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, seg)).map(_.mkString("/", "/", ""))
    val paths = Gen.listOfN(200, pathGen)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    val once = paths.toDF("p").select(PathNorm.normalizeBackend(col("p")).as("n"))
    val twice = once.select(PathNorm.normalizeBackend(col("n")).as("n"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)

    val fOnce = paths.toDF("p").select(PathNorm.normalizeFrontend(col("p")).as("n"))
    val fTwice = fOnce.select(PathNorm.normalizeFrontend(col("n")).as("n"))
    assert(fOnce.as[String].collect().toSeq == fTwice.as[String].collect().toSeq)
  }

  test("linkApi joins param and concrete forms both ways") {
    val reqs = Seq(
      ("c1", 0, "GET", "/api/orders/${id}", "/api/orders/${id}"),
      ("c1", 1, "GET", "/api/orders/7", "/api/orders/7"),
      ("c1", 2, "POST", "/api/nomatch", "/api/nomatch")
    ).toDF("conv_id", "turn_idx", "verb", "name", "path")
    val eps = Seq(
      ("c9", 5, "GET", "/api/orders/{id}", "/api/orders/{id}")
    ).toDF("conv_id", "turn_idx", "verb", "name", "path")
    val linked = PathNorm.linkApi(reqs, eps).select("turn_idx", "norm_path")
      .as[(Int, String)].collect().toSet
    assert(linked == Set((0, "/api/orders/:param"), (1, "/api/orders/:param")))
  }

  test("linkTestsIndirect: helper scope + CALLS legs, one nested level, verb gate") {
    def n(tpe: String, key: String, name: String, verb: String = null) =
      (tpe, key, name, if (verb == null) Map.empty[String, String] else Map("verb" -> verb))
    val nodes = Seq(
      n("IntegrationTest", "t1", "test_orders"),
      n("Function", "h1", "fetch_orders"),   // top-level helper
      n("Function", "h2", "http_get"),       // nested helper of h1
      n("Request", "r1", "/api/orders/${id}", "GET"),  // NESTED_IN h1
      n("Request", "r2", "/api/users/3", "GET"),       // CALLS from h2
      n("Request", "r3", "/api/orders/9", "POST"),     // verb mismatch
      n("Endpoint", "e1", "/api/orders/:param", "GET"),
      n("Endpoint", "e2", "/api/users/:param", "GET")
    ).toDF("node_type", "node_key", "name", "meta")
    val edges = Seq(
      ("CALLS", "t1", "h1"),     // test -> helper
      ("CALLS", "h1", "h2"),     // helper -> nested helper
      ("NESTED_IN", "r1", "h1"), // scope containment leg
      ("CALLS", "h2", "r2"),     // explicit request-call leg
      ("NESTED_IN", "r3", "h1")  // links nowhere: no POST endpoint
    ).toDF("edge_type", "src_key", "dst_key")
    val got = PathNorm.linkTestsIndirect(nodes, edges)
      .select("endpoint", "verb", "indirect_test", "test_helper")
      .as[(String, String, String, String)].collect().toSet
    // both hits credit the TOP-level helper, as the reference's
    // add_test_helper does for nested-helper requests (linker.rs:120-128)
    assert(got == Set(
      ("/api/orders/:param", "GET", "test_orders", "fetch_orders"),
      ("/api/users/:param", "GET", "test_orders", "fetch_orders")))
  }
}
