package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-batched
  * decode/feature passes.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[stubDecode]]); everything around
  * it — binary column handling, schema, batch shape, partition-local
  * processing via mapPartitions — is real and tested. Swapping the stub for
  * a JNI/codec call changes one function.
  */
object Multimodal {

  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Long,
      // STUB fields below: deterministic fakes derived from the payload —
      // a real deployment decodes width/height/duration from the bytes.
      fake_width: Int,
      fake_height: Int,
      checksum_prefix: String
  )

  /** Documents -> opaque binary payload column (utf8 bytes stand in for a
    * real media payload in this sandbox).
    */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes")
    )

  /** STUB decode: deterministic fake feature extraction, batched per
    * partition (the mapInPandas-batch analog in Scala). Real decode would
    * replace the body of `decodeOne`.
    */
  def stubDecode(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    val rows = media.select("doc_id", "payload", "n_bytes").as[(Long, Array[Byte], Long)]
    rows.mapPartitions { it =>
      // per-partition init (codec handles / model weights would load here)
      val digest = java.security.MessageDigest.getInstance("MD5")
      def decodeOne(docId: Long, payload: Array[Byte], nBytes: Long): MediaFeature = {
        digest.reset()
        val sum = digest.digest(payload).map("%02x".format(_)).mkString
        // ??? real decode goes here — deterministic fake dimensions instead
        MediaFeature(docId, nBytes, (nBytes % 640).toInt, (nBytes % 480).toInt, sum.take(8))
      }
      it.map { case (id, p, n) => decodeOne(id, p, n) }
    }
  }

  /** Catalyst-only twin of [[stubDecode]] used by the oracle-checked query
    * (identical output, asserted in MultimodalSpec).
    */
  def stubDecodeCatalyst(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("n_bytes"),
      pmod(col("n_bytes"), lit(640)).cast("int").as("fake_width"),
      pmod(col("n_bytes"), lit(480)).cast("int").as("fake_height"),
      substring(md5(col("payload")), 1, 8).as("checksum_prefix")
    )
}
