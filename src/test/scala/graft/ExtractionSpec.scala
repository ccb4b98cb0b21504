package graft

import org.apache.spark.sql.functions._
import graft.extract.Mentions

/** The two mention-extraction implementations — pure-Catalyst and the
  * mapPartitions/broadcast-trie scale path — must emit identical mention
  * multisets (the reference has ONE extractor; we have two for perf and
  * must prove they agree).
  */
class ExtractionSpec extends SparkSpec {

  test("Catalyst extraction == mapPartitions trie extraction") {
    val t = SparkTestSession.transcripts
    val a = Mentions.extract(t)
    val b = Mentions.extractPartitioned(spark, t).toDF()
    assertSameRows(a, b)
  }

  test("trie longest-match semantics: no prefix-alias shadowing") {
    import spark.implicits._
    val t = Seq(
      ("c1", 0, "user", "please check ApacheSpark and Spark and SparkEngine", None: Option[String],
        new java.sql.Timestamp(0L)),
      ("c1", 1, "user", "AmazonS3 vs S3", None: Option[String], new java.sql.Timestamp(1L))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val names = Mentions
      .extract(t)
      .where(col("mention_type") === "Entity")
      .select("turn_idx", "name")
      .as[(Int, String)]
      .collect()
      .toSet
    assert(names == Set((0, "ApacheSpark"), (0, "Spark"), (0, "SparkEngine"),
      (1, "AmazonS3"), (1, "S3")))
  }

  test("mention extraction emits all five mention families") {
    val types = SparkTestSession.graph.mentions
      .select("mention_type").distinct().collect().map(_.getString(0)).toSet
    assert(
      Set("Entity", "FunctionDef", "FunctionCall", "Endpoint", "Request", "Tool")
        .subsetOf(types),
      s"got $types"
    )
  }
}
