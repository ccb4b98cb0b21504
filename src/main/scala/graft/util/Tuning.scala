package graft.util

import org.apache.spark.sql.SparkSession

/** Engine-level Spark conf the pipeline expects everywhere it runs (the
  * spark-submit deployment passes the same pairs as `--conf`). Derived from
  * thread-dump profiling of the full build at local[32] (BASELINE.md
  * round 3):
  *
  *  - Kryo serializer: RDD block + shuffle-spill (de)serialization of
  *    `UnsafeRow` under the default JavaSerializer runs through reflective
  *    `readExternal`/`ObjectStreamClass.newInstance` per row — with
  *    serialized checkpoint blocks it was the top CPU consumer at 32
  *    threads. Kryo writes the row bytes directly.
  *    (Combined with [[Ckpt]]'s serialized storage: 180 s -> 50 s full
  *    build at local[32], scale 16.)
  *  - `spark.file.transferTo=false`: the bypass shuffle writer's NIO
  *    `transferTo` concat mmaps/munmaps every partition segment; the
  *    process-wide mmap lock serializes 32 writers and burns system CPU
  *    (107 s -> 50 s together with Kryo). Plain stream copy is contention-
  *    free at identical throughput for these segment sizes.
  */
object Tuning {

  val confs: Seq[(String, String)] = Seq(
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    "spark.file.transferTo" -> "false"
  )

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
