package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.query.Learnings

/** Learning + Scope system (learnings.ts:19-196, neo4j.ts:962-1090) on a
  * hand-built transcript fixture where every expected row is computable by
  * eye: learning derivation (first tool/user turn, sorted distinct scopes),
  * the no-tool-turn exclusion, the scope inventory, and both stages of the
  * retrieval funnel (scope gate, cosine ranking, k-cut).
  */
class LearningsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  // conv A: user turn, then two tool turns (two scopes, one duplicated)
  // conv B: tool turn only (no user turn -> null reason)
  // conv C: user turns only -> NO learning (no rule to learn)
  private lazy val t = Seq(
    ("convA", 0, "user", "please check orders", null.asInstanceOf[String], ts(0)),
    ("convA", 1, "tool", "rule A", "svc_orders", ts(1)),
    ("convA", 2, "tool", "later tool turn", "svc_users", ts(2)),
    ("convA", 3, "tool", "dup scope", "svc_orders", ts(3)),
    ("convB", 0, "tool", "rule B", "svc_items", ts(4)),
    ("convC", 0, "user", "no tools here", null.asInstanceOf[String], ts(5))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("learnings: one per conversation with a tool turn; first-turn rule/reason; sorted distinct scopes") {
    val l = Learnings.learnings(t).orderBy("id").collect()
    assert(l.map(_.getString(0)).toSeq == Seq("convA", "convB"))
    val a = l(0)
    assert(a.getString(1) == "rule A") // FIRST tool turn, not a later one
    assert(a.getString(2) == "please check orders")
    assert(a.getSeq[String](3) == Seq("svc_orders", "svc_users")) // sorted, dedup'd
    val b = l(1)
    assert(b.getString(1) == "rule B")
    assert(b.isNullAt(2)) // no user turn -> null reason
    assert(b.getSeq[String](3) == Seq("svc_items"))
  }

  test("scopes: HAS_SCOPE in-degree per scope name") {
    val s = Learnings.scopes(t).orderBy("scope").collect()
    assert(s.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("svc_items", 1L), ("svc_orders", 1L), ("svc_users", 1L)))
  }

  test("relevant: scope gate excludes unmentioned scopes; ranking is cosine-desc; k cuts") {
    // prompt mentions svc_orders only -> convB (svc_items) is gated out
    val r1 = Learnings.relevant(t, "retry svc_orders now", 25).collect()
    assert(r1.map(_.getString(0)).toSeq == Seq("convA"))
    // a candidate carrying TWO relevant scopes appears once (dedup by id)
    val r2 = Learnings.relevant(t, "svc_orders and svc_users and svc_items", 25)
    assert(r2.where(col("id") === "convA").count() == 1)
    val rows = r2.collect()
    assert(rows.map(_.getString(0)).toSet == Set("convA", "convB"))
    // ranking: cosine descending, deterministic
    assert(rows.map(_.getDouble(3)).toSeq == rows.map(_.getDouble(3)).toSeq.sorted.reverse)
    // k-cut honored
    assert(Learnings.relevant(t, "svc_orders and svc_users and svc_items", 1).count() == 1)
    // no relevant scope -> empty result (reference returns [] then)
    assert(Learnings.relevant(t, "nothing matches", 25).count() == 0)
  }

  test("sf0.001: every learning's scopes are a subset of the corpus scope inventory") {
    val corpus = SparkTestSession.transcripts
    val l = Learnings.learnings(corpus)
    assert(l.count() > 0)
    val badScope = l
      .select(explode(col("scopes")).as("scope"))
      .join(
        corpus.where(col("tool").isNotNull).select(col("tool").as("scope")).distinct(),
        Seq("scope"), "left_anti")
    assert(badScope.count() == 0)
  }
}
