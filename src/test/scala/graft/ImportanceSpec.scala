package graft

import org.apache.spark.sql.functions._
import graft.query.Importance

/** Importance scoring (importance/detector.ts:12-166) on hand-built graphs
  * where the percentile thresholds and tag cascade are computable by eye,
  * plus a JS-twin property check of the floor-index percentile.
  */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def nodesOf(rows: (String, String)*) =
    rows.toDF("node_key", "node_type")
      .withColumn("name", col("node_key"))
      .withColumn("conv_id", lit(""))
      .withColumn("turn_idx", lit(-1))
      .withColumn("body", lit(""))
      .withColumn("ref_id", col("node_key"))

  private def edgesOf(rows: (String, String, String)*) =
    rows.toDF("edge_type", "src_key", "dst_key")
      .withColumn("confidence", lit(1.0))
      .withColumn("strategy", lit("t"))

  // JS twin: percentile(sorted, p) = sorted[min(floor(p/100*n), n-1)]
  private def jsPct(vs: Seq[Double], p: Double): Double =
    if (vs.isEmpty) 0.0
    else {
      val s = vs.sorted
      s(math.min(math.floor(p * s.length).toInt, s.length - 1))
    }

  test("floorPercentile matches the JS floor-index twin incl. duplicates and clamp") {
    for {
      vs <- Seq(
        Seq(1.0), Seq(1.0, 1.0, 1.0), Seq(0.5, 2.0, 2.0, 3.0, 9.0),
        (1 to 10).map(_.toDouble), (1 to 7).map(i => (i % 3).toDouble))
      p <- Seq(0.75, 0.9)
    } {
      val got = Importance
        .floorPercentile(vs.toDF("v"), "v", p)
        .as[Double].head()
      assert(got == jsPct(vs, p), s"vs=$vs p=$p")
    }
    // empty population -> 0.0 (percentile([], p) = 0, detector.ts:13)
    val empty = Importance
      .floorPercentile(Seq.empty[Double].toDF("v"), "v", 0.9)
      .as[Double].head()
    assert(empty == 0.0)
  }

  test("tag cascade: structural overrides, hub, entry, utility, connector") {
    // Page/Request are EntryPoint regardless of degrees; an Endpoint with
    // no callers is a pure API entry point; hub needs in*out at p90 of the
    // non-zero hubs; utility needs callers and top-25% in/(out+1).
    val nodes = nodesOf(
      "pg" -> "Page", "rq" -> "Request", "ep0" -> "Endpoint",
      "hub" -> "Function", "ut" -> "Function", "f1" -> "Function",
      "f2" -> "Function", "f3" -> "Function", "conn" -> "Function",
      "x" -> "Turn" // outside the projection — must not appear
    )
    val edges = edgesOf(
      // hub: 2 in, 2 out -> hub_score 4 (the only non-zero hub)
      ("CALLS", "f1", "hub"), ("CALLS", "f2", "hub"),
      ("CALLS", "hub", "ut"), ("RENDERS", "hub", "f3"),
      // ut: 2 in, 0 out -> utility_score 2 (top quartile)
      ("HANDLER", "f3", "ut"),
      // parallel edge of a second type between the same pair collapses
      ("CALLS", "f3", "ut"),
      // non-projected edge types are ignored
      ("CONTAINS", "pg", "hub"), ("MENTIONS", "x", "hub")
    )
    val out = Importance.scored(nodes, edges)
    val tags = out.select("node_key", "importance_tag").as[(String, String)]
      .collect().toMap
    assert(!tags.contains("x"), "projection must exclude non-member types")
    assert(tags("pg") == "EntryPoint" && tags("rq") == "EntryPoint")
    assert(tags("ep0") == "EntryPoint", "Endpoint with in=0 is structural")
    assert(tags("hub") == "Hub")
    assert(tags("ut") == "Utility")
    assert(tags("conn") == "Connector")
    val deg = out.where(col("node_key") === "ut")
      .select("in_degree", "out_degree").as[(Long, Long)].head()
    assert(deg == ((2L, 0L)), "HANDLER+CALLS between the same pair count once")
    // pagerank column present, rounded, mass conserved over the projection
    val prSum = out.agg(sum("pagerank")).as[Double].head()
    assert(math.abs(prSum - 9.0) < 1e-3, s"9 projected nodes, got $prSum")
  }

  test("top/byTag: pagerank-desc order with node_key tiebreak, limit honored") {
    val nodes = nodesOf(
      "a" -> "Function", "b" -> "Function", "c" -> "Function", "d" -> "Function")
    val edges = edgesOf(("CALLS", "a", "b"), ("CALLS", "b", "c"), ("CALLS", "c", "d"))
    val sc = Importance.scored(nodes, edges)
    val top2 = Importance.top(sc, 2).select("node_key").as[String].collect()
    assert(top2.length == 2 && top2.head == "d", "chain sink ranks highest")
    val tagged = Importance.byTag(sc, "Connector", 50).select("importance_tag")
      .as[String].collect()
    assert(tagged.forall(_ == "Connector"))
  }
}
