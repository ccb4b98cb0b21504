package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hint annotation overlay — re-expression of the reference's curated Q&A
  * hint store (mcp/src/graph/queries.ts:88-98 CREATE_HINT, :356-373
  * SIBLING edges, :307-311 HINTS_WITHOUT_SIBLINGS, :382-386
  * ORPHANED_HINTS): Hint nodes carry a question + answer body, SIBLING
  * edges cluster related hints, and maintenance queries surface hints with
  * no siblings / no outgoing edges.
  *
  * Transcript-domain re-expression (deterministic, oracle-verifiable):
  *  - a Hint per user turn: question = the turn's text, answer = the FIRST
  *    assistant turn that follows it in the conversation (a conv-local
  *    IGNORE NULLS window — no self-join);
  *  - the hint's anchor = the lexicographically-first canonical entity the
  *    question turn mentions (dictionary-resolved, C4) — the analog of
  *    CREATE_HINT_EDGES_BY_REF_IDS linking a hint to graph nodes;
  *  - SIBLING edges chain consecutive hints about the same entity WITHIN a
  *    conversation, in turn order (each hint links to the previous hint
  *    about the same entity in the same session): linear in hint count,
  *    never the quadratic all-pairs the curation UI could create by hand;
  *  - orphaned = hints with no answer edge (question at a conversation's
  *    tail), the no-outgoing-edges analog.
  *
  * Like the Learning/Scope store these stay query-layer-derived: the
  * reference writes Hints from the MCP server ad hoc, outside build_graph.
  *
  * Scale shape: every window here — answer attachment, the hint table, the
  * (conv_id, anchor) sibling chain — is conv_id-keyed, co-partitioned with
  * every build shuffle; no global or hot-entity-keyed ordering anywhere.
  */
object Hints {

  /** The hint table: (hint_key, conv_id, turn_idx, question, answer,
    * anchor). `resolvedEntities` = dictionary-resolved entity mentions
    * (conv_id, turn_idx, canonical), e.g. CallResolver.resolveEntities.
    */
  def hints(t: DataFrame, resolvedEntities: DataFrame): DataFrame = {
    val after = Window
      .partitionBy("conv_id")
      .orderBy("turn_idx")
      .rowsBetween(1, Window.unboundedFollowing)
    val withAnswer = t
      .withColumn(
        "answer",
        first(when(col("role") === "assistant", col("text")), ignoreNulls = true)
          .over(after))
      .where(col("role") === "user")
      .select(
        concat_ws(":", col("conv_id"), col("turn_idx")).as("hint_key"),
        col("conv_id"), col("turn_idx"),
        col("text").as("question"), col("answer"))
    val anchors = resolvedEntities
      .groupBy("conv_id", "turn_idx")
      .agg(min("canonical").as("anchor"))
    withAnswer.join(anchors, Seq("conv_id", "turn_idx"), "left")
  }

  /** ORPHANED_HINTS_QUERY analog: hints with no outgoing (answer) edge. */
  def orphaned(hintTable: DataFrame): DataFrame =
    hintTable.where(col("answer").isNull)

  /** The SIBLING edge set: per-(conversation, anchor) lag chain in turn
    * order (GET_HINT_SIBLINGS / CREATE_SIBLING_EDGE analog).
    */
  def siblings(hintTable: DataFrame): DataFrame = {
    val chain = Window.partitionBy("conv_id", "anchor").orderBy("turn_idx")
    hintTable
      .where(col("anchor").isNotNull)
      .withColumn("src_hint", lag("hint_key", 1).over(chain))
      .where(col("src_hint").isNotNull)
      .select(col("src_hint"), col("hint_key").as("dst_hint"), col("anchor"))
  }

  /** HINTS_WITHOUT_SIBLINGS_QUERY analog: hints in no SIBLING pair, either
    * direction (anti-join against both pair sides).
    */
  def withoutSiblings(hintTable: DataFrame): DataFrame = {
    val sib = siblings(hintTable)
    val members = sib
      .select(col("src_hint").as("hint_key"))
      .unionByName(sib.select(col("dst_hint").as("hint_key")))
      .distinct()
    hintTable.join(members, Seq("hint_key"), "left_anti")
  }
}
