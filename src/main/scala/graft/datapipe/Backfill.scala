package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** H5 embeddings-backfill loop (reference: graph_ops.rs:424-448 — batches of
  * 32 rows with missing embeddings through the embedder). The embedder here
  * is a deterministic arithmetic stub (the container has no model runtime);
  * the Spark-side plumbing — nullable vector column, partition-local
  * batching, typed Dataset round-trip — is real. A deployment swaps
  * [[stubVector]] for a model call over each batch.
  */
object Backfill {

  final case class EmbRow(vec_id: Long, embedding: Array[Float], label: Int)
  final case class BackfilledRow(
      vec_id: Long,
      label: Int,
      embedding: Array[Float],
      backfilled: Boolean
  )

  val BatchSize = 32 // neo4j embedding backfill batch (graph_ops.rs:433)
  val Dim = 64

  /** Deterministic stand-in embedding, reproducible in the DuckDB oracle. */
  def stubVector(vecId: Long): Array[Float] =
    Array.tabulate(Dim)(i => ((vecId * 31 + i) % 997).toFloat / 997.0f)

  /** Simulate missing vectors: every 7th row loses its embedding. */
  def markMissing(emb: DataFrame): DataFrame =
    emb.withColumn(
      "embedding",
      when(pmod(col("vec_id"), lit(7)) === 0, lit(null)).otherwise(col("embedding"))
    )

  /** Fill null embeddings in partition-local batches of [[BatchSize]]. */
  def backfill(spark: SparkSession, emb: DataFrame): Dataset[BackfilledRow] = {
    import spark.implicits._
    emb
      .select("vec_id", "embedding", "label")
      .as[EmbRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // a real embedder runs ONCE per batch here (model call over the
          // missing rows); the stub fills each row independently
          batch.map { r =>
            if (r.embedding == null)
              BackfilledRow(r.vec_id, r.label, stubVector(r.vec_id), backfilled = true)
            else BackfilledRow(r.vec_id, r.label, r.embedding, backfilled = false)
          }
        }
      }
  }
}
