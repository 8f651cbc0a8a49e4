package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** IEEE-754 double division: plain Java `/`, so a zero denominator
  * yields ±Infinity (or NaN for 0/0) exactly like the reference's
  * DoubleOperators.java divide — Spark's ANSI [[org.apache.spark.sql
  * .catalyst.expressions.Divide]] raises DIVIDE_BY_ZERO even for
  * floating-point operands, which no IEEE engine does. Installed by
  * [[graft.plans.DoubleDivisionRewrite]] under every float-typed `/`.
  * Codegen is a single division — stays inside whole-stage codegen. */
case class IeeeDivide(left: Expression, right: Expression)
    extends BinaryExpression {

  // the installing rule only builds this under an already-resolved
  // double-typed Divide, so no input-type contract is needed
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    l.asInstanceOf[Double] / r.asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"($a / $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IeeeDivide =
    copy(left = newLeft, right = newRight)
}
