package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Pipeline-wide local-checkpoint storage policy.
  *
  * `Dataset.localCheckpoint()` stores blocks DESERIALIZED
  * (MEMORY_AND_DISK): every block store runs Spark's `SizeEstimator`
  * sampling (`DeserializedValuesHolder.storeValue` ->
  * `SizeTracker.takeSample`), a reflective object-graph walk through a
  * SHARED class-info cache. Thread-dump profiling of the full build at
  * local[32] showed 15/33 task threads inside `SizeEstimator` /
  * its Guava cache — per-task CPU inflated ~17x vs local[8]
  * (258 task-seconds at 8 threads -> 4,400 at 32 for the same input).
  * Serialized storage (`MEMORY_AND_DISK_SER`) knows exact byte sizes and
  * never touches `SizeEstimator`, at the price of deserializing on each
  * downstream read. On a real cluster the same win holds per-executor
  * (fewer size-sampling walks, compact blocks); executors are typically
  * 4-8 cores, so the contention term is smaller but never negative.
  *
  * `SPARK_GRAFT_CKPT_LEVEL` overrides (any `StorageLevel.fromString` name)
  * for A/B measurement.
  */
object Ckpt {

  val level: StorageLevel = sys.env
    .get("SPARK_GRAFT_CKPT_LEVEL")
    .map(StorageLevel.fromString)
    .getOrElse(StorageLevel.MEMORY_AND_DISK_SER)

  implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** `localCheckpoint` under the pipeline-wide storage policy. */
    def lcp(eager: Boolean = true): Dataset[T] = ds.localCheckpoint(eager, level)
  }
}
