package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical-identity column functions.
  *
  * Mirrors the reference's `create_node_key` / `sanitize_string`
  * (ast/src/utils.rs:82-136, 219-225): lowercase, strip non-alphanumerics,
  * join components with '-'. We replace the reference's random UUID `ref_id`
  * (ast/src/lang/graphs/mod.rs:131) with `sha2(node_key, 256)` so identity is
  * deterministic across runs — required for resume idempotence and parity.
  *
  * Pure Catalyst expressions (regexp_replace/lower/concat_ws) — codegen'd,
  * no UDF; identical semantics expressible in the DuckDB oracle as
  * `lower(regexp_replace(x, '[^a-zA-Z0-9]', '', 'g'))`.
  */
object Keys {

  /** sanitize_string (utils.rs:219-225): lowercase, alphanumerics only. */
  def sanitize(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9]", ""))

  /** node_key = sanitize(type)-sanitize(name)-sanitize(conv)-sanitize(turn)
    * (utils.rs:82-136; verb suffix appended by caller for Endpoint/Request).
    * Name capped at 2000 chars before sanitize, key semantics per reference.
    */
  def nodeKey(nodeType: Column, name: Column, convId: Column, turnIdx: Column): Column =
    concat_ws(
      "-",
      sanitize(nodeType),
      sanitize(substring(name, 1, 2000)),
      sanitize(convId),
      sanitize(turnIdx.cast("string"))
    )

  def nodeKeyWithVerb(
      nodeType: Column,
      name: Column,
      convId: Column,
      turnIdx: Column,
      verb: Column
  ): Column =
    concat_ws("-", nodeKey(nodeType, name, convId, turnIdx), sanitize(verb))

  /** Deterministic ref_id (replaces UUID v4; see Scaladoc above). */
  def refId(nodeKey: Column): Column = sha2(nodeKey, 256)
}
