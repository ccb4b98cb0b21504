package graft

import org.apache.spark.sql.functions._
import graft.pipeline.GraphBuild

/** North-rule invariants on the corpus itself:
  *  - stable (conv_id, turn_idx) ordering: turn_idx is dense 0..n-1 per
  *    conversation and monotone in (ts, tie-break) — deterministic across
  *    shuffles and parallelism levels;
  *  - per-turn text equality end-to-end: the Turn nodes of the materialized
  *    graph carry the input `text` byte-identical.
  */
class TranscriptSpec extends SparkSpec {

  test("turn_idx is dense per conversation starting at 0") {
    val t = SparkTestSession.transcripts
    val bad = t
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n"), min("turn_idx").as("lo"), max("turn_idx").as("hi"),
        countDistinct("turn_idx").as("nd"))
      .where(col("lo") =!= 0 || col("hi") =!= col("n") - 1 || col("nd") =!= col("n"))
    assert(bad.isEmpty, "turn_idx must be dense 0..n-1 per conversation")
  }

  test("turn ordering is monotone in ts within a conversation") {
    import org.apache.spark.sql.expressions.Window
    val t = SparkTestSession.transcripts
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val bad = t
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .where(col("prev_ts").isNotNull && col("ts") < col("prev_ts"))
    assert(bad.isEmpty, "ts must be non-decreasing along turn_idx")
  }

  test("ordering is deterministic across parallelism levels") {
    // same derivation, different shuffle partitioning -> identical rows
    val t1 = SparkTestSession.transcripts
    val t2 = graft.sources.Transcripts
      .fromEvents(spark, sf0001)
      .repartition(13)
    assertSameRows(t1, t2)
  }

  test("per-turn text equality survives into the materialized Turn nodes") {
    val turnBodies = SparkTestSession.graph.nodes
      .where(col("node_type") === "Turn")
      .select(col("conv_id"), col("turn_idx"), col("body").as("text"))
    val input = SparkTestSession.transcripts.select("conv_id", "turn_idx", "text")
    assertSameRows(input, turnBodies)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
