package graft.resolve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

/** The confidence-scored resolution cascade — re-expression of the
  * reference's `func_target_file_finder` strategy chain
  * (ast/src/lang/call_finder.rs:41-128) and `format_function_call`
  * (ast/src/lang/parse/format.rs:1017-1257).
  *
  * The reference tries 7 strategies in a fixed order, each with a fixed
  * confidence, stopping at the first hit. The cascade order is SEMANTIC and
  * must not be re-ordered by the optimizer, so it is encoded as sequential
  * passes over the *unresolved remainder* (left_anti after each pass), never
  * a single multiway join (SURVEY.md §7.5 item 4). Results carry
  * `confidence` + `strategy` provenance columns, persisted on edges exactly
  * as the reference persists them (neo4j/operations/batch.rs:158-160).
  *
  * Strategy/confidence table (call_finder.rs:61-126, format.rs:1227),
  * re-keyed to the transcript domain:
  *
  * | reference       | conf | transcript analog                             |
  * |-----------------|------|-----------------------------------------------|
  * | type_resolved   | 1.00 | dictionary/registry alias hit                 |
  * | global_unique   | 0.90 | name defined in exactly one conversation      |
  * | same_file       | 0.85 | defined in the same conversation              |
  * | import          | 0.80 | via the conversation's import/header map      |
  * | operand         | 0.70 | via instance typing (two-hop join)            |
  * | nested_var      | 0.60 | via enclosing-scope meta                      |
  * | same_dir        | 0.45 | defined by the same user (conv_id prefix)     |
  * | (member_expr)   | 0.35 | unverified stub when allow_unverified         |
  */
object Cascade {

  /** One strategy: name, fixed confidence, and a resolver that maps the
    * still-unresolved mention remainder to resolved rows. The resolver MUST
    * return at most one row per input mention key (enforced by resolvers via
    * uniqueness filters / deterministic min-aggregation, as the reference's
    * strategies each return a single file or nothing).
    */
  final case class Strategy(
      name: String,
      confidence: Double,
      resolve: DataFrame => DataFrame
  )

  /** Run the cascade. `mentions` must contain `keyCols`; each resolver output
    * must contain `keyCols` plus resolution payload columns. Returns the
    * union of per-strategy results with `confidence`/`strategy` literals,
    * plus (optionally) an `unverified` remainder produced by `fallback`.
    */
  def run(
      mentions: DataFrame,
      keyCols: Seq[String],
      strategies: Seq[Strategy],
      fallback: Option[DataFrame => DataFrame] = None
  ): DataFrame = {
    // Each pass's `resolved` feeds BOTH the output union and the next pass's
    // left_anti remainder. Without persistence, the strategy-k plan would
    // re-evaluate every earlier strategy's joins (and the full upstream
    // extraction) once per consumer — at sf0.1 that plan blowup made the
    // 4-strategy cascade cost 81.6 s (round-1 bench). persist() (NOT
    // localCheckpoint) gives each pass exactly-once computation with cache
    // reuse while keeping everything inside ONE job: per-pass eager/lazy
    // checkpoints added ~14 driver-sequential materialization barriers,
    // which dominated the build's Amdahl fixed term at bench scale.
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def track(df: DataFrame): DataFrame = { persisted += df.persist(); df }
    var remainder = track(mentions)
    var out: Option[DataFrame] = None
    strategies.foreach { st =>
      val resolved = track(
        st.resolve(remainder)
          .withColumn("confidence", lit(st.confidence))
          .withColumn("strategy", lit(st.name))
      )
      out = Some(out.fold(resolved)(_.unionByName(resolved)))
      // shrink the remainder — the reference stops at the first hit per
      // mention; left_anti on the mention key realizes that per-row.
      // the anti side is the (small) per-pass hit set: broadcast it so the
      // remainder never shuffles — the cascade stays one narrow stage chain
      remainder = track(
        remainder.join(broadcast(resolved.select(keyCols.map(col): _*)), keyCols, "left_anti")
      )
    }
    val withFallback = fallback match {
      case Some(fb) =>
        val fbRows = fb(remainder)
          .withColumn("confidence", lit(0.35))
          .withColumn("strategy", lit("unverified"))
        out.fold(fbRows)(_.unionByName(fbRows))
      case None => out.getOrElse(mentions.limit(0))
    }
    // materialize the final union once, then release every per-pass cache —
    // repeated cascade invocations in one session (bench reps, scaling legs)
    // must not accumulate cached blocks (heap-residency leak)
    val result = withFallback.lcp()
    persisted.foreach(_.unpersist())
    result
  }

  /** Salted equi-join for hot build-side keys (north-rule skew defense;
    * no analog in the single-process reference — SURVEY.md §4 hot-key row).
    *
    * Replicates each build row `salts` ways and salts the probe key by a
    * deterministic hash of `probeSaltSrc`, so one hot name (e.g. the
    * SparkEngine entity in ~1/3 of turns) fans across `salts` tasks instead
    * of one straggler. AQE skew-join remains the backstop.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeSaltSrc: Column,
      salts: Int = 8
  ): DataFrame = {
    val buildSalted = build
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
      .withColumn("__skey", concat_ws("#", col(key), col("__salt").cast("string")))
      .drop("__salt")
    val probeSalted = probe
      .withColumn(
        "__skey",
        concat_ws("#", col(key), pmod(xxhash64(probeSaltSrc), lit(salts)).cast("string"))
      )
    probeSalted
      .join(buildSalted.drop(key), Seq("__skey"))
      .drop("__skey")
  }
}
