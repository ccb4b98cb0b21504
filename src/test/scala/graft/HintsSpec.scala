package graft

import java.sql.Timestamp
import graft.query.Hints

/** Hint overlay (queries.ts:88-98,307-311,356-386) on a hand-built
  * transcript where answers, anchors, chains and orphans are computable by
  * eye.
  */
class HintsSpec extends SparkSpec {
  import spark.implicits._

  private val ts0 = Timestamp.valueOf("2024-01-01 10:00:00")

  // conv A: q0 about pg (answered), q2 about pg (answered by a LATER,
  //         non-adjacent assistant turn), q4 about kf (unanswered tail)
  // conv B: q0 with no entity mention (no anchor), unanswered
  private val t = Seq(
    ("A", 0, "user", "check pg please", None),
    ("A", 1, "assistant", "pg looks fine", None),
    ("A", 2, "user", "check pg again", None),
    ("A", 3, "tool", "pg metrics dump", Some("svc_a")),
    ("A", 4, "assistant", "still fine", None),
    ("A", 5, "user", "now check kf", None),
    ("B", 0, "user", "hello there", None)
  ).map { case (c, i, r, x, tl) => (c, i, r, x, tl, ts0) }
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  private val resolved = Seq(
    ("A", 0, "pg", "postgres"), ("A", 2, "pg", "postgres"), ("A", 5, "kf", "kafka")
  ).toDF("conv_id", "turn_idx", "name", "canonical")

  private lazy val h = Hints.hints(t, resolved)

  test("hints: next-assistant answer (skipping tool turns), anchor, orphan") {
    val byKey = h.collect().map(r => r.getAs[String]("hint_key") -> r).toMap
    assert(byKey.keySet == Set("A:0", "A:2", "A:5", "B:0"))
    assert(byKey("A:0").getAs[String]("answer") == "pg looks fine")
    // the tool turn between question and answer must be skipped
    assert(byKey("A:2").getAs[String]("answer") == "still fine")
    assert(byKey("A:2").getAs[String]("anchor") == "postgres")
    assert(byKey("A:5").getAs[String]("answer") == null, "tail question")
    assert(byKey("B:0").getAs[String]("anchor") == null, "no mention")
    val orphans = Hints.orphaned(h).select("hint_key").as[String].collect().toSet
    assert(orphans == Set("A:5", "B:0"))
  }

  test("siblings: conv-local per-anchor chain; withoutSiblings is the complement") {
    val sib = Hints.siblings(h)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(sib.toSeq == Seq(("A:0", "A:2", "postgres")),
      "only the two postgres hints in conv A chain; kafka is a singleton")
    val without = Hints.withoutSiblings(h)
      .select("hint_key").as[String].collect().toSet
    assert(without == Set("A:5", "B:0"))
  }
}
