// Lives in Catalyst's own package: HigherOrderFunction's argumentTypes/
// functionTypes signatures use the private[sql] AbstractDataType, which an
// external package cannot name — the established pattern for third-party
// HOF expressions.
package org.apache.spark.sql.catalyst.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{QuaternaryLike, TernaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/* Lambda-taking scalar functions the reference has and Spark lacks,
 * implemented as native Catalyst HigherOrderFunctions so Presto lambda
 * syntax (`x -> …`) resolves through Spark's own lambda binding.
 * CodegenFallback: all are regex-/parse-bound, not arithmetic-bound,
 * so interpreted eval of the lambda body is not the bottleneck. */

/** `regexp_replace(string, pattern, x -> …)` (reference: presto-main/
  * .../operator/scalar/JoniRegexpReplaceLambdaFunction.java): replaces
  * every match of `pattern` with the lambda applied to the match's
  * capture array (groups 1..n; an unmatched optional group is NULL —
  * there is no group for the entire match). A NULL lambda result makes
  * the whole result NULL; a pattern with no match returns the input
  * unchanged; a zero-width match advances one character, keeping the
  * skipped character in the output.
  */
case class RegexpReplaceLambda(
    subject: Expression, regexp: Expression, function: Expression)
  extends HigherOrderFunction with CodegenFallback with TernaryLike[Expression] {

  /** Compiled-pattern cache: patterns are almost always literal, so a
    * last-value cache avoids recompiling per row without unbounded
    * growth for the rare dynamic-pattern case. The key is CLONED —
    * a buffer-backed UTF8String from a shuffle/scan row mutates in
    * place, which would let a stale Pattern pass the equality check
    * (Spark's own RegExpUtils.getPatternAndLastRegex clones for the
    * same reason). */
  @transient private var cachedSrc: UTF8String = _
  @transient private var cachedPattern: Pattern = _
  private def patternFor(p: UTF8String): Pattern = {
    if (cachedPattern == null || cachedSrc != p) {
      cachedPattern = Pattern.compile(p.toString)
      cachedSrc = p.clone()
    }
    cachedPattern
  }

  override def dataType: DataType = StringType
  // a NULL lambda result nulls the whole string even when every argument
  // is non-null, so nullability cannot follow the arguments
  override def nullable: Boolean = true
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def arguments: Seq[Expression] = Seq(subject, regexp)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "regexp_replace"

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = function

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): RegexpReplaceLambda =
    copy(function = f(function, (ArrayType(StringType, containsNull = true), false) :: Nil))

  @transient private lazy val LambdaFunction(
    _, Seq(capturesVar: NamedLambdaVariable), _) = function: @unchecked

  @transient private lazy val functionForEval: Expression = functionsForEval.head

  override def eval(input: InternalRow): Any = {
    val src = subject.eval(input)
    val pat = regexp.eval(input)
    if (src == null || pat == null) return null
    val source = src.asInstanceOf[UTF8String].toString
    val matcher = patternFor(pat.asInstanceOf[UTF8String]).matcher(source)
    if (!matcher.find(0)) return src
    val out = new java.lang.StringBuilder(source.length)
    val groupCount = matcher.groupCount()
    var appendPos = 0
    var more = true
    while (more) {
      // mirror the reference's zero-width advance: next search starts one
      // past a zero-width match so the loop always progresses
      val nextStart =
        if (matcher.end == matcher.start) matcher.end + 1 else matcher.end
      out.append(source, appendPos, matcher.start)
      appendPos = matcher.end
      val captures = new Array[Any](groupCount)
      var g = 1
      while (g <= groupCount) {
        val c = matcher.group(g)
        captures(g - 1) = if (c == null) null else UTF8String.fromString(c)
        g += 1
      }
      capturesVar.value.set(new GenericArrayData(captures))
      val replaced = functionForEval.eval(input)
      if (replaced == null) return null // null replacement nulls the string
      out.append(replaced.asInstanceOf[UTF8String].toString)
      more = nextStart <= source.length && matcher.find(nextStart)
    }
    out.append(source, appendPos, source.length)
    UTF8String.fromString(out.toString)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RegexpReplaceLambda =
    copy(subject = newFirst, regexp = newSecond, function = newThird)
}

/** `split_to_map(string, entryDelim, kvDelim, (k, v1, v2) -> …)`
  * (reference: presto-main/.../operator/scalar/SplitToMapFunction.java —
  * the DuplicateKeyResolutionLambda overload): parses key-value entries
  * exactly like the 3-arg form, and on a duplicate key invokes the
  * lambda with (key, existingValue, newValue) to pick the kept value.
  * Entry parsing contract (shared with split_to_multimap): the first
  * kvDelim in an entry splits key from value; a missing kvDelim or one
  * appearing again inside the value raises.
  */
case class SplitToMapLambda(
    text: Expression, entryDelim: Expression, kvDelim: Expression,
    function: Expression)
  extends HigherOrderFunction with CodegenFallback with QuaternaryLike[Expression] {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def argumentTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def arguments: Seq[Expression] = Seq(text, entryDelim, kvDelim)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "split_to_map"

  override def first: Expression = text
  override def second: Expression = entryDelim
  override def third: Expression = kvDelim
  override def fourth: Expression = function

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): SplitToMapLambda =
    // v1 is the ACCUMULATED value — a previous duplicate resolution may
    // have returned NULL, which feeds back in, so its slot is nullable
    // (non-nullable would let NullPropagation miscompile the body)
    copy(function = f(function,
      (StringType, false) :: (StringType, true) :: (StringType, false) :: Nil))

  @transient private lazy val LambdaFunction(
    _, Seq(keyVar: NamedLambdaVariable, v1Var: NamedLambdaVariable,
      v2Var: NamedLambdaVariable), _) = function: @unchecked

  @transient private lazy val functionForEval: Expression = functionsForEval.head

  override def eval(input: InternalRow): Any = {
    val s = text.eval(input)
    val ed = entryDelim.eval(input)
    val kvd = kvDelim.eval(input)
    if (s == null || ed == null || kvd == null) return null
    // reuse the shared entry parser (same contract as split_to_multimap),
    // then fold each key's values with the lambda in encounter order
    val multimap = graft.functions.MiscExtras.splitToMultimap(
      s.toString, ed.toString, kvd.toString)
    val keys = new Array[Any](multimap.size)
    val values = new Array[Any](multimap.size)
    var i = 0
    multimap.foreach { case (k, vs) =>
      keys(i) = UTF8String.fromString(k)
      var acc: Any = UTF8String.fromString(vs.head)
      vs.tail.foreach { v =>
        keyVar.value.set(UTF8String.fromString(k))
        v1Var.value.set(acc)
        v2Var.value.set(UTF8String.fromString(v))
        acc = functionForEval.eval(input)
      }
      values(i) = acc
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): SplitToMapLambda =
    copy(text = newFirst, entryDelim = newSecond, kvDelim = newThird,
      function = newFourth)
}

/** `reduce_agg(inputValue, initialState, inputFunction, combineFunction)`
  * (reference: presto-main/.../operator/aggregation/
  * ReduceAggregationFunction.java; docs aggregate.rst): folds every
  * non-NULL input of a group into a scalar state with `inputFunction
  * (state, input) -> state`, merging partial states with
  * `combineFunction(state, state) -> state`; an empty or all-NULL group
  * yields NULL. The state type is the initial state's type (the
  * reference restricts it to boolean/integer/floating-point/date/time/
  * interval — any fixed-width type works here).
  *
  * Implemented as a DeclarativeAggregate whose update/merge expressions
  * are the user's BOUND LAMBDA BODIES with the lambda variables
  * substituted by the aggregation-buffer attributes — constant-size
  * state, and the combine lambda gives true map-side partial
  * aggregation. (The retained LambdaFunction children are
  * CodegenFallback, so the stage runs the interpreted HashAggregate
  * path — the same trade every udaf-registered aggregate makes; the
  * reference interprets its lambdas per row too.)
  */
case class ReduceAgg(
    input: Expression, zero: Expression,
    inputFn: Expression, combineFn: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
  with HigherOrderFunction with QuaternaryLike[Expression] {

  override def dataType: DataType = zero.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "reduce_agg"

  override def arguments: Seq[Expression] = Seq(input, zero)
  override def argumentTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.AnyDataType, org.apache.spark.sql.types.AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.AnyDataType, org.apache.spark.sql.types.AnyDataType)

  override def first: Expression = input
  override def second: Expression = zero
  override def third: Expression = inputFn
  override def fourth: Expression = combineFn

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ReduceAgg = {
    val s = zero.dataType
    copy(
      inputFn = f(inputFn, (s, true) :: (input.dataType, false) :: Nil),
      combineFn = f(combineFn, (s, true) :: (s, true) :: Nil))
  }

  private lazy val state =
    AttributeReference("state", zero.dataType, nullable = true)()
  private lazy val touched =
    AttributeReference("touched", org.apache.spark.sql.types.BooleanType,
      nullable = false)()

  /** The lambda body with its variables substituted by concrete
    * expressions — turns the bound lambda into a plain codegen-able
    * expression over the aggregation buffer. */
  private def splice(lambda: Expression, args: Expression*): Expression =
    lambda match {
      case LambdaFunction(body, lambdaArgs, _) =>
        val mapping = lambdaArgs.map(_.exprId).zip(args).toMap
        val spliced = body.transform {
          case v: NamedLambdaVariable if mapping.contains(v.exprId) =>
            mapping(v.exprId)
        }
        // the reference declares inputFunction/combineFunction to return
        // the state type; cast spliced results that widened (e.g. int
        // state + bigint input) back to it
        if (spliced.dataType == zero.dataType) spliced
        else Cast(spliced, zero.dataType)
      case other => other // unbound — resolution will fail loudly
    }

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(state, touched)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, zero.dataType), Literal(false))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(input), state,
      splice(inputFn, If(touched, state, zero), input)),
    Or(touched, IsNotNull(input)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(Not(touched.left), state.right,
      If(Not(touched.right), state.left,
        splice(combineFn, state.left, state.right))),
    Or(touched.left, touched.right))
  override lazy val evaluateExpression: Expression =
    If(touched, state, Literal.create(null, zero.dataType))

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): ReduceAgg =
    copy(input = newFirst, zero = newSecond,
      inputFn = newThird, combineFn = newFourth)
}

/** Registry-facing placeholder for `reduce_agg`: Spark's ResolveFunctions
  * requires a registry-resolved function with lambda arguments to BE a
  * HigherOrderFunction after resolution — and it wraps AggregateFunctions
  * into AggregateExpression before that check, so the real [[ReduceAgg]]
  * cannot come from the registry. This scalar-shaped HOF satisfies the
  * structural check and is immediately rewritten to
  * `ReduceAgg(...).toAggregateExpression()` by the ResolveReduceAgg
  * resolution rule (graft.plans); it never reaches evaluation.
  */
case class ReduceAggCall(
    input: Expression, zero: Expression,
    inputFn: Expression, combineFn: Expression)
  extends HigherOrderFunction with CodegenFallback with QuaternaryLike[Expression] {

  override def dataType: DataType = zero.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "reduce_agg"

  override def arguments: Seq[Expression] = Seq(input, zero)
  override def argumentTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.AnyDataType, org.apache.spark.sql.types.AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.AnyDataType, org.apache.spark.sql.types.AnyDataType)

  override def first: Expression = input
  override def second: Expression = zero
  override def third: Expression = inputFn
  override def fourth: Expression = combineFn

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ReduceAggCall = {
    val s = zero.dataType
    copy(
      inputFn = f(inputFn, (s, true) :: (input.dataType, false) :: Nil),
      combineFn = f(combineFn, (s, true) :: (s, true) :: Nil))
  }

  override def eval(input: InternalRow): Any =
    throw new IllegalStateException(
      "reduce_agg placeholder must be rewritten by ResolveReduceAgg")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): ReduceAggCall =
    copy(input = newFirst, zero = newSecond,
      inputFn = newThird, combineFn = newFourth)
}
