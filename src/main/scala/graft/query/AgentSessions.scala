package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AgentSession rollup — re-expression of the reference's per-session
  * accumulator nodes and stats endpoint (mcp/src/graph/queries.ts:313-354
  * UPSERT/LIST/GET_SESSION_STATS; mcp/src/benchmark/sessions.ts:427-520).
  *
  * The reference MERGEs one AgentSession node per session id and
  * increments token/duration counters on every agent turn, then the stats
  * route streams EVERY session row to the JS process and loops to build
  * totals and a per-model breakdown. Over a transcript corpus the same
  * surface is a distributed rollup: a conversation IS a session, so one
  * groupBy(conv_id) derives the accumulated counters (turn count, start /
  * end / duration, input vs output token sums) and one groupBy over the
  * session dimension derives the stats breakdown — no driver-side loop at
  * any scale.
  *
  * Token estimator = the BPE-ish subword count already used by
  * dp_token_counts ([[graft.datapipe.TextStats.tokenCounts]]); assistant
  * turns count as output tokens, user/tool turns as input tokens. The
  * per-model grouping dimension of the reference (model/provider columns
  * the transcript table does not carry) maps to the session's modal tool
  * (`primary_tool`, lexicographic tie-break, 'none' when the session never
  * used a tool).
  */
object AgentSessions {

  private def toks = regexp_count(
    col("text"), lit(graft.datapipe.TextStats.BpeIshPattern)).cast("long")

  /** One AgentSession row per conversation (LIST_AGENT_SESSIONS analog). */
  def sessions(t: DataFrame): DataFrame = {
    val perTurn = t.select(
      col("conv_id"), col("ts"), col("tool"),
      when(col("role") === "assistant", toks).otherwise(lit(0L)).as("out_toks"),
      when(col("role") =!= "assistant", toks).otherwise(lit(0L)).as("in_toks"))
    val agg = perTurn
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        min("ts").as("start_time"),
        max("ts").as("end_time"),
        sum("in_toks").as("input_tokens"),
        sum("out_toks").as("output_tokens"))
      .withColumn("total_tokens", col("input_tokens") + col("output_tokens"))
      .withColumn(
        "duration_ms",
        // ts is TIMESTAMP_NTZ; the session runs in UTC so the cast is exact
        unix_millis(col("end_time").cast("timestamp")) -
          unix_millis(col("start_time").cast("timestamp")))
    // modal tool per conversation: conv-local window after a keyed count —
    // both stages shuffle on conv_id, so they line up with the corpus's
    // native partitioning
    val toolCounts = t
      .where(col("tool").isNotNull)
      .groupBy("conv_id", "tool")
      .agg(count(lit(1)).as("c"))
    val primary = toolCounts
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("conv_id").orderBy(desc("c"), col("tool"))))
      .where(col("rn") === 1)
      .select(col("conv_id"), col("tool").as("primary_tool"))
    agg
      .join(primary, Seq("conv_id"), "left")
      .na.fill("none", Seq("primary_tool"))
  }

  /** The stats breakdown (session_stats route): per-group session counts
    * and token/duration totals over the session dimension.
    */
  def stats(sessions: DataFrame): DataFrame =
    sessions
      .groupBy("primary_tool")
      .agg(
        count(lit(1)).as("sessions"),
        sum("n_turns").as("n_turns"),
        sum("input_tokens").as("input_tokens"),
        sum("output_tokens").as("output_tokens"),
        sum("total_tokens").as("total_tokens"),
        sum("duration_ms").as("duration_ms"))
}
