package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** truncate(x, n) — drop digits beyond the n-th decimal place, toward
  * zero, exactly as the reference computes it (MathFunctions.java:363
  * truncate(double, long): NaN/Infinity pass through, n = 0 is
  * floor/ceil by sign, otherwise BigDecimal.setScale(n, ROUND_DOWN)).
  * The previous pow(10, n) expression algebra over/underflowed double
  * at large |n| (truncate(-1234.56, -500) gave NaN, the reference
  * gives 0.0); BigDecimal rescale has no such edge. */
case class TruncatePrecision(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(x: Any, n: Any): Any =
    TruncatePrecision.compute(x.asInstanceOf[Double], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, n) =>
      s"graft.functions.TruncatePrecision.compute($x, $n)")

  override def prettyName: String = "truncate"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TruncatePrecision =
    copy(left = l, right = r)
}

object TruncatePrecision {
  def compute(num: Double, decimals: Long): Double = {
    if (num.isNaN || num.isInfinite) num
    else if (decimals == 0) { if (num >= 0) math.floor(num) else math.ceil(num) }
    else java.math.BigDecimal.valueOf(num)
      // a double's value always fits in an Int scale; clamping keeps
      // pathological bigint precisions from raising in setScale
      .setScale(math.max(-10000, math.min(10000, decimals)).toInt,
        java.math.RoundingMode.DOWN)
      .doubleValue()
  }
}
