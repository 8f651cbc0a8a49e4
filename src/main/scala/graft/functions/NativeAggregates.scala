package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Order-independent aggregate checksum (reference: presto-main/.../
  * operator/aggregation/ChecksumAggregationFunction.java:53,110-118):
  * state += hash(value) * PRIME64, null contributes PRIME64, partials
  * combine by plain addition — so the merge is commutative/associative and
  * the checksum of 100 TB is the wrapping sum of per-partition checksums.
  * Hash is Spark's xxhash64 (behavior-compatible, not byte-compatible —
  * SURVEY §1.2); arithmetic is non-ANSI `Add` so overflow wraps exactly
  * like the reference's Java long addition. DeclarativeAggregate → whole
  * stage codegen, map-side partial aggregation for free.
  */
case class ChecksumAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val Prime64 = 0x9E3779B185EBCA87L

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "checksum"

  // NULL buffer = "no rows seen": like the reference's NullableLongState,
  // an empty group checksums to NULL, not 0.
  private lazy val sum = AttributeReference("sum", LongType, nullable = true)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sum)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, LongType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(
      Coalesce(Seq(sum, Literal(0L))),
      If(
        IsNull(child),
        Literal(Prime64),
        Multiply(new XxHash64(Seq(child)), Literal(Prime64), EvalMode.LEGACY)),
      EvalMode.LEGACY))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(
      IsNull(sum.left) && IsNull(sum.right),
      Literal(null, LongType),
      Add(
        Coalesce(Seq(sum.left, Literal(0L))),
        Coalesce(Seq(sum.right, Literal(0L))),
        EvalMode.LEGACY)))
  override lazy val evaluateExpression: Expression = sum

  override protected def withNewChildInternal(newChild: Expression): ChecksumAgg =
    copy(child = newChild)
}

/** Shannon entropy of count inputs (reference: presto-main/.../operator/
  * aggregation/EntropyAggregation.java:60-84): given counts c_i ≥ 0,
  * H = (ln ΣC − Σ(c·ln c)/ΣC) / ln 2, defined as 0 when ΣC = 0. State is
  * the pair (ΣC, Σ c·ln c) — two doubles that merge by addition, the
  * mergeable-moments trick that makes the whole thing one map-side pass.
  * Zero counts are no-ops (0·log 0 = 0), matching the reference.
  */
case class EntropyAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "entropy"

  private lazy val sumC = AttributeReference("sumC", DoubleType, nullable = false)()
  private lazy val sumCLogC =
    AttributeReference("sumCLogC", DoubleType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumC, sumCLogC)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0))

  private lazy val c = Cast(child, DoubleType)
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child) || c <= Literal(0.0), sumC, Add(sumC, c)),
    If(IsNull(child) || c <= Literal(0.0), sumCLogC,
      Add(sumCLogC, Multiply(c, Log(c)))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumC.left, sumC.right),
    Add(sumCLogC.left, sumCLogC.right))
  override lazy val evaluateExpression: Expression =
    If(
      sumC <= Literal(0.0),
      Literal(0.0),
      Greatest(Seq(
        Divide(
          Subtract(Log(sumC), Divide(sumCLogC, sumC)),
          Literal(math.log(2.0))),
        Literal(0.0))))

  override protected def withNewChildInternal(newChild: Expression): EntropyAgg =
    copy(child = newChild)
}
