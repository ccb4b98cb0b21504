package graft.app

import org.apache.spark.sql.SparkSession
import graft.pipeline.CheckpointedBuild
import graft.sources.Transcripts

/** spark-submit entrypoint for the full KG-construction job:
  *
  *   spark-submit --class graft.app.Main <jar> <sfDir> <outDir> [runId]
  *
  * Reads the transcript corpus, runs the checkpointed build
  * ([[CheckpointedBuild]] — per-stage snapshot commits + per-partition
  * lineage rows), and leaves the materialized node/edge tables plus the
  * `_lineage` metrics table under <outDir>. Re-running with the same
  * <outDir> resumes: committed stages are read back, not recomputed
  * (the reference's update_incremental semantics, graph_ops.rs:95-274).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_out"
    val runId = if (args.length > 2) args(2) else "run-1"
    val builder = SparkSession.builder().appName("graft-kg-build")
    // local default for the sandbox; spark-submit --master overrides
    val spark = (if (spark_master_set) builder else builder.master("local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Transcripts.fromEvents(spark, sfDir)
    val res = CheckpointedBuild.run(spark, t, outDir, runId)
    val nNodes = res.nodes.count()
    val nEdges = res.edges.count()
    println(s"[graft] build complete: $nNodes nodes, $nEdges edges -> $outDir")
    spark.stop()
  }

  private def spark_master_set: Boolean =
    sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER")
}
