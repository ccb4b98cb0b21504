package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.query.AgentSessions

/** AgentSession rollup (queries.ts:313-354) on a hand-built transcript. */
class AgentSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val t = Seq(
    // conv A: 3 turns over 90 s; tools svc_b x1, svc_a x1 (tie -> svc_a)
    ("A", 0, "user", "one two", None, ts("2024-01-01 10:00:00")),
    ("A", 1, "assistant", "three four five", Some("svc_b"), ts("2024-01-01 10:00:30")),
    ("A", 2, "tool", "six", Some("svc_a"), ts("2024-01-01 10:01:30")),
    // conv B: single turn, no tool
    ("B", 0, "user", "alpha", None, ts("2024-01-02 09:00:00"))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("sessions: token split by role, duration, modal-tool tie-break") {
    val out = AgentSessions.sessions(t).collect().map(r =>
      r.getAs[String]("conv_id") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_turns") == 3L)
    // input = user 'one two' (2) + tool 'six' (1); output = assistant (3)
    assert(a.getAs[Long]("input_tokens") == 3L)
    assert(a.getAs[Long]("output_tokens") == 3L)
    assert(a.getAs[Long]("total_tokens") == 6L)
    assert(a.getAs[Long]("duration_ms") == 90000L)
    assert(a.getAs[String]("primary_tool") == "svc_a", "lexicographic tie-break")
    val b = out("B")
    assert(b.getAs[String]("primary_tool") == "none")
    assert(b.getAs[Long]("duration_ms") == 0L)
  }

  test("stats: per-group totals match the session rows") {
    val sess = AgentSessions.sessions(t)
    val st = AgentSessions.stats(sess).collect().map(r =>
      r.getAs[String]("primary_tool") -> r).toMap
    assert(st.keySet == Set("svc_a", "none"))
    assert(st("svc_a").getAs[Long]("sessions") == 1L)
    assert(st("none").getAs[Long]("total_tokens") == 1L)
    val totalSessions = st.values.map(_.getAs[Long]("sessions")).sum
    assert(totalSessions == sess.count())
  }
}
