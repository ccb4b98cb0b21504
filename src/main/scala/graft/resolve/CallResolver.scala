package graft.resolve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Dictionary

/** Concrete cascade instances for the transcript KG.
  *
  *  - [[resolveCalls]]: FunctionCall mentions -> defining conversation, via
  *    global_unique (0.90) -> same_conv (0.85) -> same_dir/same-user (0.45)
  *    -> unverified (0.35). Exact analog of call_finder.rs:41-128 with
  *    file := conversation and directory := user (conv_id prefix).
  *  - [[resolveEntities]]: Entity mentions -> canonical entity id via the
  *    broadcast alias dictionary (type_resolved analog, conf 1.0,
  *    registry resolve_call_at — format.rs:1031-1046). The dictionary join is
  *    BROADCAST (tiny build side) and the probe side contains the hot
  *    SparkEngine key; broadcast joins are skew-immune, and the salted-join
  *    path (Cascade.saltedJoin) is exercised when the dictionary is too big
  *    to broadcast (asserted equivalent in CascadeSpec).
  */
object CallResolver {

  /** defs: FunctionDef mentions (conv_id, name). calls: FunctionCall
    * mentions (conv_id, turn_idx, name). Output: (conv_id, turn_idx, name,
    * resolved_conv, confidence, strategy).
    */
  def resolveCalls(calls: DataFrame, defs: DataFrame): DataFrame = {
    val defConvs = defs.select(col("name"), col("conv_id").as("def_conv")).distinct()

    // global_unique (call_finder.rs:69-84: name unique among non-empty
    // bodies): exactly one distinct defining conversation.
    val globallyUnique = defConvs
      .groupBy("name")
      .agg(count(lit(1)).as("n"), min("def_conv").as("resolved_conv"))
      .where(col("n") === 1)
      .drop("n")

    // same_dir analog: same user = conv_id prefix "conv-XXXXXX"; pick the
    // lexicographically smallest defining conv for determinism.
    val byUser = defConvs
      .withColumn("user_prefix", substring(col("def_conv"), 1, 11))
      .groupBy("name", "user_prefix")
      .agg(min("def_conv").as("resolved_conv"))

    val strategies = Seq(
      Cascade.Strategy(
        "global_unique",
        0.90,
        rem => rem.join(broadcast(globallyUnique), Seq("name"))
      ),
      Cascade.Strategy(
        "same_conv",
        0.85,
        rem =>
          rem
            .join(
              defConvs.select(col("name"), col("def_conv").as("conv_id")).distinct(),
              Seq("name", "conv_id"),
              "left_semi"
            )
            .withColumn("resolved_conv", col("conv_id"))
      ),
      Cascade.Strategy(
        "same_dir",
        0.45,
        rem =>
          rem
            .withColumn("user_prefix", substring(col("conv_id"), 1, 11))
            .join(byUser, Seq("name", "user_prefix"))
            .drop("user_prefix")
      )
    )

    Cascade.run(
      calls.select("conv_id", "turn_idx", "name"),
      Seq("conv_id", "turn_idx", "name"),
      strategies,
      fallback = Some(rem => rem.withColumn("resolved_conv", lit("unverified")))
    ).select("conv_id", "turn_idx", "name", "resolved_conv", "confidence", "strategy")
  }

  /** Entity mentions -> canonical ids via broadcast dictionary (conf 1.0). */
  def resolveEntities(spark: SparkSession, entityMentions: DataFrame): DataFrame = {
    import spark.implicits._
    val dict = Dictionary.aliasToCanonical.toSeq.toDF("name", "canonical")
    entityMentions
      .select("conv_id", "turn_idx", "name")
      .join(broadcast(dict), Seq("name"))
      .withColumn("confidence", lit(1.0))
      .withColumn("strategy", lit("alias_dict"))
      .select("conv_id", "turn_idx", "name", "canonical", "confidence", "strategy")
  }

  /** [[resolveEntities]] through the salted shuffle join (north rule's
    * hot-entity skew defense, Cascade.saltedJoin): the dictionary build side
    * is replicated S ways and the probe key salted by hash(conv_id), so the
    * hot entity (~1/3 of all turns) fans across S reducers instead of one
    * straggler. Used when the entity dimension outgrows broadcast; output is
    * identical to the broadcast path (same DuckDB oracle, CascadeSpec).
    */
  def resolveEntitiesSalted(spark: SparkSession, entityMentions: DataFrame): DataFrame = {
    import spark.implicits._
    val dict = Dictionary.aliasToCanonical.toSeq.toDF("name", "canonical")
    Cascade
      .saltedJoin(
        entityMentions.select("conv_id", "turn_idx", "name"),
        dict,
        "name",
        col("conv_id"),
        salts = 8
      )
      .withColumn("confidence", lit(1.0))
      .withColumn("strategy", lit("alias_dict"))
      .select("conv_id", "turn_idx", "name", "canonical", "confidence", "strategy")
  }
}
