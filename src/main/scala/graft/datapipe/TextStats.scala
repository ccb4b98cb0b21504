package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over `documents`:
  * language ID (stopword-hit heuristic), quality scoring (length / stopword
  * ratios), token counting (whitespace + BPE-ish regex), and document
  * fingerprinting. All pure Catalyst string expressions — codegen'd, scan-
  * local (no shuffle except final aggregations), trivially 100 TB-safe.
  */
object TextStats {

  /** BPE-ish subword pattern (runs of letters / digits / single other
    * chars) — THE token estimator: [[tokenCounts]] and the AgentSession
    * rollup both count with it, so tuning it here keeps dp_token_counts
    * and kg_agent_sessions in lockstep (their oracle SQL twins carry the
    * same pattern).
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  private val stopEn = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Heuristic n-gram/stopword language ID: share of tokens that are English
    * stopwords; >= threshold -> 'en', else 'unk'.
    */
  def langId(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    toks
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin(stopEn: _*), 1L).otherwise(0L)).as("n_stop")
      )
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("pred_lang", when(col("stop_ratio") >= threshold, "en").otherwise("unk"))
      .select("doc_id", "n_tokens", "n_stop", "stop_ratio", "pred_lang")
  }

  /** Quality scoring: token count, mean token length, stopword ratio,
    * uppercase-start ratio — the length/punct/stopword family.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("n_chars"), explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    toks
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        max("n_chars").as("n_chars"),
        sum(length(col("tok"))).as("sum_tok_len"),
        sum(when(lower(col("tok")).isin(stopEn: _*), 1L).otherwise(0L)).as("n_stop")
      )
      .withColumn("avg_tok_len", col("sum_tok_len").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .select("doc_id", "n_tokens", "n_chars", "avg_tok_len", "stop_ratio")
  }

  /** Token counting: whitespace tokens + BPE-ish subword count (runs of
    * letters / digits / single other chars), via regexp_count — codegen'd.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit(TextStats.BpeIshPattern)).as("bpe_ish_tokens")
    )

  /** Content fingerprint: md5 over the sorted distinct token set — a
    * rolling-hash-style content identity stable under token reordering.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(
        array_join(array_sort(array_distinct(split(lower(col("text")), " "))), " ")
          .cast("binary")
      ).as("fingerprint")
    )
}
