package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.GraphBuild
import graft.sources.Transcripts

/** Benchmark main — one JSON line on stdout.
  *
  * Headline metric: end-to-end triples/sec for the full build (corpus ->
  * mentions -> resolution -> node/edge tables), plus per-query wall times
  * for every SparkEntry operator.
  *
  * Env knobs:
  *   SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS    local[N] + shuffle partitions (default 32)
  *   SPARK_GRAFT_SCALE   corpus replication factor R (default 1): the input
  *                       is unioned R times with distinct conv_id suffixes —
  *                       same deterministic job at R× the rows, used by
  *                       tools/scaling_bench.sh to measure throughput at two
  *                       parallelism levels on an input large enough that
  *                       fixed planning overhead doesn't dominate.
  *   SPARK_GRAFT_QUERIES set to "0" to skip the per-query suite (scaling
  *                       runs time only the build).
  */
object Bench {

  /** Deterministic R-fold corpus replication (conv-id suffix keeps every
    * conversation distinct, so work truly scales R×).
    */
  def scaledTranscripts(spark: SparkSession, sfDir: String, r: Int) = {
    val t = Transcripts.fromEvents(spark, sfDir)
    if (r <= 1) t
    else
      spark
        .range(r)
        .select(col("id").cast("string").as("rep"))
        .crossJoin(t)
        .withColumn("conv_id", concat(col("conv_id"), lit("-r"), col("rep")))
        .drop("rep")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default replication 16 (~1.6M turns at sf0.1): the headline build is
    // otherwise too small to outrun fixed per-stage overhead on 32 cores
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val runQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") != "0"
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: full-build throughput in emitted triples (edges) per second.
    // Nodes and edges are counted in ONE action so their (independent)
    // stage graphs overlap instead of running as two serial barrier chains.
    val b0 = System.nanoTime()
    val g = GraphBuild.build(spark, scaledTranscripts(spark, sfDir, scale))
    val counts = g.nodes
      .select(lit("nodes").as("k"))
      .unionByName(g.edges.select(lit("edges").as("k")))
      .groupBy("k")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val nEdges = counts.getOrElse("edges", 0L)
    val nNodes = counts.getOrElse("nodes", 0L)
    val buildSec = (System.nanoTime() - b0) / 1e9
    val triplesPerSec = nEdges / buildSec

    val results: Map[String, Double] =
      if (!runQueries) Map.empty
      else
        SparkEntry.queries.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case _: Throwable => -1L }
          name -> (System.nanoTime() - t0) / 1e9
        }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = buildSec + results.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""cpus":$cpus,"scale":$scale,"build_sec":$buildSec,"nodes":$nNodes,""" +
        s""""edges":$nEdges,"triples_per_sec":$triplesPerSec}"""
    )
    spark.stop()
  }
}
