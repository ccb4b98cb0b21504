package graft

import org.apache.spark.sql.functions._
import graft.query.Query
import graft.schema.{EdgeTypes, NodeTypes}

/** Round-5 surface: Package/Concept node types + INCLUDES edges
  * (ast/src/lang/graphs/mod.rs:30-56,83-99), the type-constrained shortest
  * path (mcp/src/graph/queries.ts:820-849), and the inverted-index fulltext
  * arm (queries.ts:33-47,497-547).
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private lazy val g = SparkTestSession.graph

  test("Package nodes span the tool-prefix dimension; containment spine is closed") {
    val pkgs = g.nodes.where(col("node_type") === NodeTypes.Package)
    assert(pkgs.count() >= 1)
    // every Package is contained by the Corpus and contains >= 1 Tool
    val pkgKeys = pkgs.select("node_key")
    val fromCorpus = g.edges
      .where(col("edge_type") === EdgeTypes.Contains && col("strategy") === "corpus_package")
      .join(pkgKeys.withColumnRenamed("node_key", "dst_key"), Seq("dst_key"), "left_semi")
    assert(fromCorpus.count() == pkgs.count())
    val toTools = g.edges
      .where(col("edge_type") === EdgeTypes.Contains && col("strategy") === "package_tool")
    assert(toTools.count() >= 1)
    // every package_tool dst is a real Tool node
    val toolKeys = g.nodes.where(col("node_type") === NodeTypes.Tool).select("node_key")
    assert(
      toTools
        .join(toolKeys.withColumnRenamed("node_key", "dst_key"), Seq("dst_key"), "left_anti")
        .isEmpty)
  }

  test("Concept INCLUDES edges target existing Entity clusters only") {
    val concepts = g.nodes.where(col("node_type") === NodeTypes.Concept)
    assert(concepts.count() >= 1)
    val inc = g.edges.where(col("edge_type") === EdgeTypes.Includes)
    assert(inc.count() >= concepts.count()) // every concept has >= 1 member
    val entityKeys = g.nodes.where(col("node_type") === NodeTypes.Entity).select("node_key")
    assert(
      inc
        .join(entityKeys.withColumnRenamed("node_key", "dst_key"), Seq("dst_key"), "left_anti")
        .isEmpty)
    // a Concept only materializes when a member was observed: every INCLUDES
    // src is a Concept node and every Concept node has an INCLUDES edge
    val conceptKeys = concepts.select("node_key")
    assert(
      inc
        .join(conceptKeys.withColumnRenamed("node_key", "src_key"), Seq("src_key"), "left_anti")
        .isEmpty)
  }

  test("typeProjectedEdges never leaves the typed projection; typed path <= untyped reach") {
    val tEdges = Query.typeProjectedEdges(g.nodes, g.edges, Query.PathNodeTypes).cache()
    val typedKeys = g.nodes
      .where(col("node_type").isin(Query.PathNodeTypes: _*))
      .select("node_key")
    assert(
      tEdges.select(col("src_key").as("node_key"))
        .unionByName(tEdges.select(col("dst_key").as("node_key")))
        .join(typedKeys, Seq("node_key"), "left_anti")
        .isEmpty)
    // the typed relation is a subset of the full relation
    assert(tEdges.count() <= g.edges.count())
    tEdges.unpersist()
  }

  test("searchIndexed matches a brute-force token recount on the same nodes") {
    val postings = Query.buildPostings(g.nodes).cache()
    // tf parity: recount 'postgres' occurrences by tokenizing directly
    val brute = g.nodes
      .select(col("node_key"),
        explode(split(lower(concat_ws(" ", col("name"), col("body"))), "[^a-z0-9]+")).as("t"))
      .where(col("t") === "postgres")
      .groupBy("node_key").agg(count(lit(1)).as("tf"))
    assertSameRows(postings.where(col("term") === "postgres").drop("term"), brute)
    // the probe's top-k is consistent with summing tf over matched terms
    val hits = Query.searchIndexed(postings, g.nodes, "postgres handler", 10)
    assert(hits.count() == 10)
    val top = hits.orderBy(col("score").desc, col("node_key")).first()
    assert(top.getAs[Long]("score") >= 1L)
    postings.unpersist()
  }

  test("3-source RRF provenance carries all three source pivots") {
    val a = Seq(("k1", 5.0), ("k2", 3.0)).toDF("node_key", "score")
    val b = Seq(("k2", 0.9), ("k3", 0.5)).toDF("node_key", "score")
    val c = Seq(("k3", 1.0)).toDF("node_key", "score")
    val fused = Query.rrfFuseWithProvenance(
      Seq(("fulltext", a, 1.0), ("vector", b, 1.5), ("pagerank", c, 1.0)), 5, 10)
    val rows = fused.collect().map(r => r.getAs[String]("node_key") -> r).toMap
    assert(rows("k2").getAs[String]("sources") == "fulltext,vector")
    assert(rows("k3").getAs[String]("sources") == "pagerank,vector")
    assert(rows("k1").getAs[Int]("fulltext_rank") == 1)
    assert(rows("k3").getAs[Int]("pagerank_rank") == 1)
    // a missed source pivots to NULL
    assert(rows("k1").isNullAt(rows("k1").fieldIndex("vector_rank")))
  }
}
