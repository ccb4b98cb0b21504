package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for canonical node keys:
  * `concat_ws("-", parts.map(sanitize))` fused into one byte-level pass
  * (sanitize = lowercase ASCII letters, keep digits, drop everything else —
  * ast/src/utils.rs:82-136, 219-225; null parts skipped like concat_ws).
  *
  * This is the hottest expression of the whole build (two keys per edge,
  * ~100M evaluations at bench scale). A Scala UDF pays the
  * internal-row -> Scala conversion and ~5 allocations per call and breaks
  * the codegen pipeline at the UDF boundary; this expression stays inside
  * WholeStageCodegen ([[doGenCode]]) operating directly on UTF8String bytes
  * with a single output allocation.
  */
case class SanitizeKeyParts(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  // analysis-time type check: a non-string child would otherwise pass
  // analysis and fail at runtime (ClassCastException in eval / janino
  // compile error in codegen)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.zipWithIndex.filterNot(_._1.dataType == StringType)
    if (bad.isEmpty) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SanitizeKeyParts requires StringType children; got " +
          bad.map { case (c, i) => s"arg $i: ${c.dataType.catalogString}" }.mkString(", ")
      )
  }

  override def eval(input: InternalRow): Any = {
    val parts = new Array[UTF8String](children.length)
    var i = 0
    while (i < children.length) {
      parts(i) = children(i).eval(input).asInstanceOf[UTF8String]
      i += 1
    }
    SanitizeKeyParts.build(parts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String"
    val arr = ctx.freshName("keyParts")
    val evals = children.map(_.genCode(ctx))
    val setup = evals.zipWithIndex
      .map { case (e, i) =>
        code"""${e.code}
$arr[$i] = ${e.isNull} ? null : ${e.value};"""
      }
      .reduce(_ + _)
    ev.copy(
      code = code"""$cls[] $arr = new $cls[${children.length}];
$setup
$cls ${ev.value} = graft.functions.SanitizeKeyParts.build($arr);""",
      isNull = FalseLiteral
    )
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression = copy(children = newChildren)
}

object SanitizeKeyParts {

  /** Byte-level sanitize+join. ASCII letters lowercased, digits kept, all
    * other bytes dropped (multi-byte UTF-8 sequences are >= 0x80 → dropped,
    * identical to the regexp class `[^a-zA-Z0-9]`). Null parts are skipped
    * with no separator, empty parts keep their separator — concat_ws
    * semantics, mirrored by the DuckDB oracle's concat_ws of
    * regexp_replace'd components.
    */
  def build(parts: Array[UTF8String]): UTF8String = {
    var total = 0
    var k = 0
    while (k < parts.length) {
      if (parts(k) != null) total += parts(k).numBytes + 1
      k += 1
    }
    if (total == 0) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](total)
    var n = 0
    var first = true
    k = 0
    while (k < parts.length) {
      val p = parts(k)
      if (p != null) {
        if (!first) { out(n) = '-'; n += 1 }
        first = false
        val bytes = p.getBytes
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i)
          if ((b >= '0' && b <= '9') || (b >= 'a' && b <= 'z')) { out(n) = b; n += 1 }
          else if (b >= 'A' && b <= 'Z') { out(n) = (b + 32).toByte; n += 1 }
          i += 1
        }
      }
      k += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}
