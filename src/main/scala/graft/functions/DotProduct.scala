package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as a native Catalyst expression — the
  * candidate-verification hot path of every similarity op (brute-force
  * ranking, LSH/IVF re-scoring, near-dup pair verification, kNN
  * assignment). The `aggregate(zip_with(...))` composition it replaces is a
  * higher-order function, which Spark always interprets — per-row lambda
  * dispatch dominates when millions of candidate pairs are re-scored.
  *
  * Accumulates left-to-right in Double over `min(|a|, |b|)` elements, so
  * results are bit-identical to both the interpreted composition and the
  * DuckDB oracles' `list_dot_product`; Float inputs widen exactly. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // analysis-time check, so a wrongly-typed SQL call (e.g. graft_dot over
  // int arrays) fails with a named AnalysisException instead of a
  // ClassCastException inside codegen'd execution
  override def checkInputDataTypes(): TypeCheckResult = {
    def vec(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (vec(left.dataType) && vec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // null-tolerant extraction (null element = 0.0 on both execution paths)
  // shared with the other native vector expressions
  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(
      HyperplaneSignatures.doubles(l.asInstanceOf[ArrayData], isDouble(left)),
      HyperplaneSignatures.doubles(r.asInstanceOf[ArrayData], isDouble(right)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def toVec(e: Expression, c: String): String =
      s"graft.functions.HyperplaneSignatures.doubles($c, ${isDouble(e)})"
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.DotProduct.dot(${toVec(left, l)}, ${toVec(right, r)})")
  }
}

object DotProduct {

  def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
