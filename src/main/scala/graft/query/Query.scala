package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query/serving operators over the materialized graph (reference §2.G:
  * the Neo4j Cypher + TS layer + CLI, re-expressed as DataFrame programs).
  * Iterative operators (BFS expansion, PageRank) are driver loops over
  * DataFrames with localCheckpoint() per iteration to truncate lineage —
  * the Spark analog of APOC expandConfig / GDS pagerank.
  */
object Query {

  /** G6 get_subtree / G12 deps/impact: depth-bounded frontier expansion from
    * `start` keys following `edgeTypes` (reversed for impact). Returns
    * (node_key, depth) with BFS min-depth semantics.
    * (mcp/src/graph/queries.ts:616-759; cli/src/deps.rs:247, impact.rs:482)
    */
  def expand(
      edges: DataFrame,
      start: DataFrame, // single column node_key
      depth: Int,
      edgeTypes: Seq[String] = Nil,
      reverse: Boolean = false
  ): DataFrame = {
    val filtered0 = if (edgeTypes.isEmpty) edges else edges.where(col("edge_type").isin(edgeTypes: _*))
    val step =
      if (reverse) filtered0.select(col("dst_key").as("from"), col("src_key").as("to"))
      else filtered0.select(col("src_key").as("from"), col("dst_key").as("to"))
    val stepC = step.localCheckpoint() // leaf plan for the iterative loop

    var visited = start.select(col("node_key"), lit(0).as("depth")).localCheckpoint()
    var frontier = visited
    var d = 0
    while (d < depth && !frontier.isEmpty) {
      val next = frontier
        .join(stepC, frontier("node_key") === stepC("from"))
        .select(col("to").as("node_key"), lit(d + 1).as("depth"))
        .distinct()
        .join(visited.select("node_key"), Seq("node_key"), "left_anti")
        .localCheckpoint() // truncate iterative lineage (SURVEY.md §7.5)
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
      d += 1
    }
    visited
  }

  /** G9 shortest_path: BFS distance from src to dst over both directions;
    * returns min distance (queries.ts:820-849 — APOC shortestPath analog).
    */
  def shortestDist(
      edges: DataFrame,
      start: DataFrame,
      targetKey: String,
      maxDepth: Int
  ): DataFrame = {
    val undirected = edges
      .select(col("src_key"), col("dst_key"))
      .unionByName(edges.select(col("dst_key").as("src_key"), col("src_key").as("dst_key")))
      .withColumn("edge_type", lit("ANY"))
    expand(undirected, start, maxDepth).where(col("node_key") === targetKey)
  }

  /** G10 pagerank: fixed 20 iterations, damping 0.85 over the projected
    * entity graph (queries.ts:1065-1141). Dangling mass is redistributed
    * uniformly so ranks sum to N (matching GDS semantics closely enough for
    * top-k ordering; we assert convergence properties in tests).
    */
  def pagerank(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int = 20,
      damping: Double = 0.85
  ): DataFrame = {
    // materialize loop inputs once: iterative plans must start from leaves
    val keys = nodes.select(col("node_key")).localCheckpoint()
    val n = keys.count()
    val outDeg = edges.groupBy(col("src_key")).agg(count(lit(1)).as("out_deg"))
    val links = edges
      .select("src_key", "dst_key")
      .join(outDeg, "src_key")
      .localCheckpoint()
    // dangling = nodes with no out-links; their mass spreads uniformly
    val danglingKeys = keys
      .join(links.select(col("src_key").as("node_key")).distinct(), Seq("node_key"), "left_anti")
      .localCheckpoint()
    var ranks = keys.withColumn("rank", lit(1.0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(links, ranks("node_key") === links("src_key"))
        .select(col("dst_key").as("node_key"), (col("rank") / col("out_deg")).as("c"))
        .groupBy("node_key")
        .agg(sum("c").as("c"))
      val danglingMass = ranks
        .join(danglingKeys, Seq("node_key"), "left_semi")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      ranks = keys
        .join(contribs, Seq("node_key"), "left")
        .crossJoin(danglingMass) // scalar broadcast — no driver action
        .withColumn(
          "rank",
          lit(1 - damping) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dmass") / lit(n.toDouble))
        )
        .select("node_key", "rank")
        .localCheckpoint() // the single action per iteration
    }
    ranks
  }

  /** G3 CLI no-DB search scoring (cli/src/search.rs:93-132): additive
    * weights — exact name 100, name prefix 70, name contains 50, body
    * contains 25, conv path contains 20; top-k by (score desc, node_key).
    */
  def search(nodes: DataFrame, term: String, limit: Int): DataFrame = {
    val t = lit(term)
    val score =
      when(lower(col("name")) === lower(t), 100).otherwise(0) +
        when(lower(col("name")).startsWith(lower(t)) && lower(col("name")) =!= lower(t), 70)
          .otherwise(0) +
        when(
          lower(col("name")).contains(lower(t)) &&
            !lower(col("name")).startsWith(lower(t)),
          50
        ).otherwise(0) +
        when(lower(col("body")).contains(lower(t)), 25).otherwise(0) +
        when(lower(col("conv_id")).contains(lower(t)), 20).otherwise(0)
    nodes
      .withColumn("score", score.cast("int"))
      .where(col("score") > 0)
      .select("node_key", "node_type", "name", "score")
      .orderBy(col("score").desc, col("node_key"))
      .limit(limit)
  }

  /** G11 coverage (neo4j/operations/coverage.rs:16-41): share of Function
    * nodes with at least one incoming CALLS edge.
    */
  def coverage(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val fns = nodes.where(col("node_type") === "Function")
    val called = fns.join(
      edges.where(col("edge_type") === "CALLS").select(col("dst_key").as("node_key")),
      Seq("node_key"),
      "left_semi"
    )
    fns
      .agg(count(lit(1)).as("total_functions"))
      .crossJoin(called.agg(count(lit(1)).as("called_functions")))
      .withColumn(
        "coverage",
        col("called_functions").cast("double") / col("total_functions").cast("double")
      )
  }
}
