package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the vector-similarity hot loops.
  *
  * The ANN operators (G4 vector search over node/table embeddings, hybrid
  * fusion's vector leg, the brute-force and IVF top-k baselines) previously
  * computed cosine / quantized dot via `zip_with` + `aggregate` HOF SQL.
  * Higher-order functions are NOT whole-stage-codegen'd: each row pays an
  * interpreted lambda per element with struct intermediates — at dim 64 over
  * 250k node rows that is ~16M short-lived allocations per query. These
  * expressions run the identical sequential double fold as one tight
  * primitive loop inside WholeStageCodegen (same [[SanitizeKeyParts]]
  * pattern; the reference scores vectors inside its vector index the same
  * single-pass way, mcp/src/graph/queries.ts:549-581).
  *
  * Bit-for-bit parity with the HOF (and the DuckDB oracle): accumulation is
  * a sequential double fold in element order — xy += x*y; xx += x*x;
  * yy += y*y; result xy/(sqrt(xx)*sqrt(yy)) — IEEE-identical to the struct
  * fold it replaces, so every oracle hash is unchanged.
  */
private[graft] trait VectorSimExpr extends BinaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs; got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
}

/** cosine(a, b) as DOUBLE — NaN on zero vectors (IEEE 0/0, matching the
  * plain double division of the SQL fold it replaces).
  */
case class CosineSim(left: Expression, right: Expression) extends VectorSimExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorSim.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorSim.cosine($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ floor(x*1000)·floor(y*1000) as BIGINT — the integer-quantized inner
  * product both engines agree on bit-for-bit (floor over DOUBLE, then long
  * multiply — see [[graft.datapipe.Ann]]).
  */
case class DotQuant(left: Expression, right: Expression) extends VectorSimExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_quant"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorSim.dotQuant(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorSim.dotQuant($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorSim {

  /** Sequential fold in element order over min(len) elements — zip_with over
    * equal-length vectors; the min guard only defends against malformed
    * input (all call sites produce fixed-dim arrays).
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      xy += x * y; xx += x * x; yy += y * y
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  def dotQuant(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += math.floor(x * 1000).toLong * math.floor(y * 1000).toLong
      i += 1
    }
    acc
  }
}
