package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Path normalization + Request→Endpoint linking (reference E1–E3:
  * ast/src/lang/linker.rs:362-470).
  *
  * The reference normalizes both sides to a canonical parameterized form and
  * its `paths_match` (linker.rs:481-506) additionally lets a `:param` segment
  * match a concrete one. We realize that as a PURE EQUI-JOIN by canonicalizing
  * concrete variable segments (numeric ids) to `:param` on both sides first —
  * at scale a segment-wise theta-join would be quadratic; the equi-join on
  * (canonical_path, verb) shuffles once on a well-distributed key.
  *
  * All regexp_replace chains — Catalyst-native, codegen'd, DuckDB-expressible.
  */
object PathNorm {

  /** normalize_frontend_path (linker.rs:398-430): strip scheme/host,
    * `${...}` templates → `:param`, drop a leading template segment.
    */
  def normalizeFrontend(c: Column): Column = {
    val noHost = regexp_replace(c, "^https?://[^/]+", "")
    val params = regexp_replace(noHost, "\\$\\{[^}]*\\}", ":param")
    val noLeading = regexp_replace(params, "^:param(?=/)", "")
    rtrimSlash(noLeading)
  }

  /** normalize_backend_path (linker.rs:432-470): `{id}` `{id?}` `:id` `<id>`
    * `(id)` `[...x]` `[x]` → `:param`; trailing slash trimmed.
    */
  def normalizeBackend(c: Column): Column = {
    var p = regexp_replace(c, "\\{[^}]*\\}", ":param")
    p = regexp_replace(p, "<[^>]*>", ":param")
    p = regexp_replace(p, "\\([^)]*\\)", ":param")
    p = regexp_replace(p, "\\[\\.\\.\\.[^\\]]*\\]", ":param")
    p = regexp_replace(p, "\\[[^\\]]*\\]", ":param")
    p = regexp_replace(p, "(?<=/):(?!param)[A-Za-z0-9_]+", ":param")
    rtrimSlash(p)
  }

  /** paths_match canonicalization (linker.rs:481-506): concrete id segments
    * (all-numeric) become `:param` so param↔concrete pairs equi-join.
    */
  def canonical(c: Column): Column =
    regexp_replace(c, "/[0-9]+(?=/|$)", "/:param")

  private def rtrimSlash(c: Column): Column =
    when(c =!= "/", regexp_replace(c, "/+$", "")).otherwise(c)

  /** link_api_nodes (E1, linker.rs:362-396): Request→Endpoint CALLS edges on
    * (canonical path, verb).
    *
    * The reference first DEDUPLICATES endpoints by (name, file, verb)
    * (D11, btreemap_graph.rs:352-372) and links requests against that
    * endpoint index — never against every declaration site. We do the same:
    * the build side is `distinct (canonical path, verb)` (dimension-sized →
    * broadcast), so a request links to exactly one endpoint identity and the
    * join can never blow up quadratically on popular endpoints.
    *
    * Output: one row per request mention with its endpoint identity key.
    */
  def linkApi(requests: DataFrame, endpoints: DataFrame): DataFrame = {
    val req = requests
      .withColumn("norm_path", canonical(normalizeFrontend(col("path"))))
    val ep = endpoints
      .withColumn("norm_path", canonical(normalizeBackend(col("path"))))
      .select("norm_path", "verb")
      .distinct()
    req
      .join(broadcast(ep), Seq("norm_path", "verb"))
      .select(
        col("conv_id"),
        col("turn_idx"),
        col("verb"),
        col("norm_path"),
        concat_ws("-", lit("endpoint"), col("norm_path"), col("verb")).as("endpoint_id"),
        col("path").as("req_path")
      )
  }
}
