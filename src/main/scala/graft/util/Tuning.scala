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
    // UnsafeRow blocks are acyclic: Kryo's reference tracking resets an
    // IdentityObjectIntMap per row — ~2.5% of build CPU in JFR samples of
    // the scale-64 build, pure overhead for this data model
    "spark.kryo.referenceTracking" -> "false",
    "spark.file.transferTo" -> "false",
    // collect_list/ObjectHashAggregate falls back to SORT-BASED aggregation
    // at 128 distinct keys per task (spark default) — the per-conversation
    // tool concat (B4 import sections) groups by conv_id (~100k+ groups per
    // task at bench scale), so the whole aggregation ran as an external row
    // sort of text-bearing rows (UnsafeExternalRowSorter was a top-5 CPU
    // frame). The hash map holds one small tool list per group; 4M entries
    // is well within executor memory at production sizing.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4000000"
  )

  /** Experiment overrides: `SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"` applied
    * AFTER the pinned confs — a dev knob for A/B-ing engine conf (e.g.
    * `spark.rdd.compress=true`) through the bench and scaling legs without
    * a rebuild. Empty/unset = the pinned configuration exactly.
    */
  private def extra: Seq[(String, String)] =
    sys.env
      .get("SPARK_GRAFT_EXTRA_CONF")
      .toSeq
      .flatMap(_.split(';'))
      .map(_.trim)
      .filter(_.contains('='))
      .map { kv =>
        val i = kv.indexOf('=')
        (kv.take(i).trim, kv.drop(i + 1).trim)
      }

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    (confs ++ extra).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
