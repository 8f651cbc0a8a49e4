package graft.functions

import java.text.DecimalFormat

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Presto-conformant string renderings/matches for the SQL facade —
  * the expression halves of the plans/PrestoConformance rewrites. */

/** Type adapter for aggregates over a pure-NULL (UNKNOWN-typed) input
  * column: the reference coerces unknown → array(unknown) where the
  * composed set_union lowering needs an array operand
  * (SetUnionFunction.java via testSetUnion's `values null,null,null`).
  * Identity on every already-array input; a NullType child re-types as
  * array<void> (its only value is NULL either way). */
case class NullTypeAsArray(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, NullType}
  override def dataType: DataType = child.dataType match {
    case NullType => ArrayType(NullType)
    case dt => dt
  }
  override def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_null_as_array"
}

/** CAST(double|real AS VARCHAR) in the reference renders SCIENTIFIC
  * notation — `1.5` → `1.5E0`, `0.1` → `1.0E-1`, signed zeros as
  * `0E0`/`-0E0`, and bare `Infinity`/`-Infinity`/`NaN` — via a
  * mantissa-dot-exponent decimal format over the shortest decimal
  * representation (presto-main/.../type/DoubleOperators.java:255
  * castToVarchar, pattern 0.0###################E0;
  * RealOperators.java:194, pattern 0.0#####E0 over the float's own
  * shortest form). Spark renders plain decimal (`1.5`), which leaks
  * into every string context — the largest replay-residual family of
  * round 12. This expression reproduces the reference's rendering. */
case class PrestoDoubleString(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"presto_double_string expects double or real, got ${other.simpleString}")
  }

  private def isReal: Boolean = child.dataType == FloatType

  override def dataType: DataType = StringType
  override def prettyName: String = "presto_double_string"

  def compute(v: Any): UTF8String = {
    val s =
      if (isReal) {
        val f = v.asInstanceOf[Float]
        if (f == 0.0f) { if (1.0f / f > 0) "0E0" else "-0E0" }
        else if (f.isInfinite) { if (f > 0) "Infinity" else "-Infinity" }
        else if (f.isNaN) "NaN"
        // format the FLOAT's shortest decimal form, not the widened
        // double's (RealOperators parses Float.toString back to double)
        else PrestoDoubleString.realFormat.get()
          .format(java.lang.Double.parseDouble(java.lang.Float.toString(f)))
      } else {
        val d = v.asInstanceOf[Double]
        if (d == 0e0) { if (1e0 / d > 0) "0E0" else "-0E0" }
        else if (d.isInfinite) { if (d > 0) "Infinity" else "-Infinity" }
        else if (d.isNaN) "NaN"
        else PrestoDoubleString.doubleFormat.get().format(d)
      }
    UTF8String.fromString(s)
  }

  override protected def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prestoDoubleString", this,
      classOf[PrestoDoubleString].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PrestoDoubleString {
  // DecimalFormat is not thread-safe; one per thread, like the reference
  private val doubleFormat = new ThreadLocal[DecimalFormat] {
    override def initialValue() = new DecimalFormat("0.0###################E0")
  }
  private val realFormat = new ThreadLocal[DecimalFormat] {
    override def initialValue() = new DecimalFormat("0.0#####E0")
  }
}

/** LIKE with a NON-LITERAL pattern under the reference's no-implicit-
  * escape contract: % matches any run, _ exactly one code point, every
  * other character — INCLUDING backslash — is ordinary (presto-main/
  * .../type/LikeFunctions.java:92 likePattern compiles only the
  * user-declared escape; none here). The facade's text-level LIKE
  * branch conforms literal patterns by doubling backslashes, but a
  * pattern arriving through a column or expression reaches Spark's
  * LIKE, whose implicit backslash escape diverges — this expression
  * closes that path (plans/PrestoConformance routes non-literal
  * patterns here). Single-entry regex cache, like Spark's own
  * non-foldable LIKE. */
case class PrestoLike(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"presto_like expects (string, string), got $other")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "presto_like"

  // one immutable (pattern, regex) pair, swapped whole: the expression
  // object is SHARED across tasks through the codegen references array,
  // so a two-field cache could be observed half-updated; a reference
  // swap of a final-field pair cannot (worst case: a redundant compile)
  @transient private var cache: PrestoLike.Compiled = _

  private def regexFor(p: UTF8String): java.util.regex.Pattern = {
    val c = cache
    if (c != null && c.pattern == p) return c.regex
    val s = p.toString
    val sb = new StringBuilder("(?s)")
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cp match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case _ => sb.append(java.util.regex.Pattern.quote(
          new String(Character.toChars(cp))))
      }
      i += Character.charCount(cp)
    }
    val r = java.util.regex.Pattern.compile(sb.toString)
    cache = new PrestoLike.Compiled(p.clone(), r)
    r
  }

  def compute(str: UTF8String, pat: UTF8String): Boolean =
    regexFor(pat).matcher(str.toString).matches()

  override protected def nullSafeEval(s: Any, p: Any): Any =
    compute(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prestoLike", this, classOf[PrestoLike].getName)
    nullSafeCodeGen(ctx, ev, (s, p) => s"${ev.value} = $ref.compute($s, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PrestoLike {
  private[functions] final class Compiled(
      val pattern: UTF8String, val regex: java.util.regex.Pattern)
}
