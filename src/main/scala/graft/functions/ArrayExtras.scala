package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** The reference's SQL-defined array helpers (reference: presto-main/.../
  * operator/scalar/sql/ArraySqlFunctions.java — each is RETURN <sql> over
  * built-ins), re-expressed as [[RuntimeReplaceable]] Catalyst expressions:
  * the replacement is composed from Spark's codegen'd collection/lambda
  * expressions once the child's element type is known, so none of these
  * leave whole-stage codegen. Semantics mirrored per function:
  *
  *   - `array_sum`: sum ignoring NULL elements, 0 for empty; BIGINT for
  *     integral element types, DOUBLE otherwise.
  *   - `array_average`: DOUBLE average ignoring NULLs, NULL when no
  *     non-null elements.
  *   - `array_frequency`: map(element → count) over non-null elements.
  *   - `array_duplicates` / `array_dupes`: one NULL if NULL appears more
  *     than once, then the distinct elements with count > 1.
  *   - `array_has_duplicates` / `array_has_dupes`: any element (or NULL)
  *     appearing more than once.
  */
object ArrayExtras {

  private[functions] def lam1(et: DataType)(f: Expression => Expression): Expression = {
    val v = NamedLambdaVariable("v", et, nullable = true)
    LambdaFunction(f(v), Seq(v))
  }

  private[functions] def lam2(t1: DataType, t2: DataType)(
      f: (Expression, Expression) => Expression): Expression = {
    val a = NamedLambdaVariable("a", t1, nullable = true)
    val b = NamedLambdaVariable("b", t2, nullable = true)
    LambdaFunction(f(a, b), Seq(a, b))
  }

  private[functions] def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other            => other // non-array: replacement type-check reports it
  }

  /** filter(x, v -> v IS NOT NULL) */
  private[functions] def nonNulls(child: Expression): Expression =
    ArrayFilter(child, lam1(elemType(child))(v => IsNotNull(v)))

  /** map(element → count) over non-null elements, counts as INTEGER. */
  private[functions] def frequency(child: Expression): Expression = {
    val et = elemType(child)
    val keys = ArrayDistinct(nonNulls(child))
    val counts = ArrayTransform(
      keys,
      lam1(et)(k =>
        Size(ArrayFilter(child, lam1(et)(v => EqualNullSafe(v, k))),
          legacySizeOfNull = false)))
    MapFromArrays(keys, counts)
  }
}

case class ArraySumPresto(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import ArrayExtras._
  override lazy val replacement: Expression = {
    val et = elemType(child)
    val fractional = et match {
      case FloatType | DoubleType | _: DecimalType => true
      case _                                       => false
    }
    val target: DataType = if (fractional) DoubleType else LongType
    val zero = if (fractional) Literal(0d) else Literal(0L)
    // aggregate over an empty array returns the zero element, and a NULL
    // input propagates NULL — exactly the reference's empty/null handling
    ArrayAggregate(
      child, zero,
      lam2(target, et)((s, v) => Add(s, Coalesce(Seq(Cast(v, target), zero)))),
      lam1(target)(identity))
  }
  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "array_sum"
}

case class ArrayAveragePresto(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import ArrayExtras._
  override lazy val replacement: Expression = {
    val et = elemType(child)
    val nn = nonNulls(child)
    val n = Size(nn, legacySizeOfNull = false)
    val sum = ArrayAggregate(
      nn, Literal(0d),
      lam2(DoubleType, et)((s, v) => Add(s, Cast(v, DoubleType))),
      lam1(DoubleType)(identity))
    If(EqualTo(n, Literal(0)), Literal.create(null, DoubleType),
      Divide(sum, Cast(n, DoubleType)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "array_average"
}

case class ArrayFrequencyPresto(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = ArrayExtras.frequency(child)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "array_frequency"
}

case class ArrayDuplicatesPresto(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import ArrayExtras._
  override lazy val replacement: Expression = {
    val et = elemType(child)
    val nullCount = Size(
      ArrayFilter(child, lam1(et)(v => IsNull(v))), legacySizeOfNull = false)
    val nullPart = If(
      GreaterThan(nullCount, Literal(1)),
      CreateArray(Seq(Literal.create(null, et))),
      Literal.create(Seq.empty[Any], ArrayType(et)))
    val dupKeys = MapKeys(MapFilter(
      frequency(child),
      lam2(et, IntegerType)((_, c) => GreaterThan(c, Literal(1)))))
    Concat(Seq(nullPart, dupKeys))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "array_duplicates"
}

case class ArrayHasDuplicatesPresto(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression =
    GreaterThan(
      Size(child, legacySizeOfNull = false),
      Size(ArrayDistinct(child), legacySizeOfNull = false))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "array_has_duplicates"
}
