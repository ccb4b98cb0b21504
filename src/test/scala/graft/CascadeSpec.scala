package graft

import org.apache.spark.sql.functions._
import graft.resolve.{Cascade, CallResolver}

/** Cascade-resolution semantics (reference call_finder.rs:41-128): fixed
  * strategy order, first hit wins, fixed confidences, unverified fallback.
  */
class CascadeSpec extends SparkSpec {
  import spark.implicits._

  // calls: (conv_id, turn_idx, name); defs: (conv_id, name)
  private def run(calls: Seq[(String, Int, String)], defs: Seq[(String, String)]) =
    CallResolver
      .resolveCalls(
        calls.toDF("conv_id", "turn_idx", "name"),
        defs.map { case (c, n) => (c, 0, n) }.toDF("conv_id", "turn_idx", "name")
      )
      .select("name", "resolved_conv", "confidence", "strategy")
      .as[(String, String, Double, String)]
      .collect()
      .toSet

  test("global_unique wins when a name is defined in exactly one conversation") {
    val out = run(
      calls = Seq(("conv-000001-x", 0, "f")),
      defs = Seq(("conv-000002-y", "f"))
    )
    assert(out == Set(("f", "conv-000002-y", 0.90, "global_unique")))
  }

  test("same_conv beats same_dir for ambiguous names defined locally") {
    // name defined in two conversations (not globally unique), one of them
    // being the calling conversation -> same_conv at 0.85
    val out = run(
      calls = Seq(("conv-000001-a", 3, "g")),
      defs = Seq(("conv-000001-a", "g"), ("conv-000009-z", "g"))
    )
    assert(out == Set(("g", "conv-000001-a", 0.85, "same_conv")))
  }

  test("same_dir (same user prefix) resolves when not local, min conv picked") {
    val out = run(
      calls = Seq(("conv-000001-b", 1, "h")),
      defs = Seq(("conv-000001-a", "h"), ("conv-000001-c", "h"))
    )
    assert(out == Set(("h", "conv-000001-a", 0.45, "same_dir")))
  }

  test("unresolved mentions fall through to unverified at 0.35") {
    val out = run(
      calls = Seq(("conv-000001-a", 0, "nope")),
      defs = Seq(("conv-000002-b", "other"), ("conv-000003-c", "other"))
    )
    assert(out == Set(("nope", "unverified", 0.35, "unverified")))
  }

  test("each call resolves exactly once (cascade never duplicates)") {
    val m = SparkTestSession.graph.mentions.cache()
    val resolved = CallResolver.resolveCalls(
      m.where(col("mention_type") === "FunctionCall"),
      m.where(col("mention_type") === "FunctionDef")
    )
    val calls = m.where(col("mention_type") === "FunctionCall").count()
    assert(resolved.count() == calls)
    assert(
      resolved.groupBy("conv_id", "turn_idx", "name").count().where(col("count") > 1).isEmpty
    )
  }

  test("saltedJoin == plain equi-join (skew defense is semantics-preserving)") {
    val probe = (1 to 500).map(i => (s"k${i % 7}", i)).toDF("name", "payload")
    val build = (0 until 7).map(i => (s"k$i", s"v$i")).toDF("name", "v")
    val plain = probe.join(build, Seq("name")).select("name", "payload", "v")
    val salted = Cascade
      .saltedJoin(probe, build, "name", probeSaltSrc = col("payload"), salts = 8)
      .select("name", "payload", "v")
    assertSameRows(plain, salted)
  }
}
