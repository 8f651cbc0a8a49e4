package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.types.{DoubleType, FloatType, MapType, StringType}

/** Round-13 conformance rewrites, all SCOPED to [[graft.Engine.sql]]
  * via the prestoDialectActive thread-local (the same contour as
  * [[IntegerDivisionRewrite]]): DataFrame programs and plain
  * `spark.sql` keep Spark semantics.
  */

/** The reference renders CAST(double|real AS VARCHAR) in scientific
  * notation (`1.5` → `1.5E0`; DoubleOperators.java:255 castToVarchar,
  * RealOperators.java:194) where Spark renders plain decimal — the
  * largest single replay-residual family of round 12, leaking into
  * every string context (concat coercions, group keys, json strings
  * built by cast). Lowers every float-rooted cast-to-varchar — user-
  * written or coercion-inserted — to
  * [[graft.functions.PrestoDoubleString]]. A cast to varchar cannot
  * fail, so TRY casts need no special handling (the rendering is
  * total), and the rewrite's output contains no Cast — trivially a
  * fixpoint. */
object DoubleToVarcharRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressionsWithPruning(
      _.containsPattern(TreePattern.CAST)) {
      case c: Cast
          if c.child.resolved && c.dataType.isInstanceOf[StringType] &&
            (c.child.dataType == DoubleType || c.child.dataType == FloatType) =>
        graft.functions.PrestoDoubleString(c.child)
    }
}

/** The reference's `map[k]` subscript RAISES on a missing key
  * ("Key not present in map: <key>", operator/scalar/
  * MapSubscriptOperator.java:129 missingKeyExceptionFactory) and is
  * null-propagating on a NULL map or key (RETURN_NULL_ON_NULL), while
  * Spark 4 has no raising map accessor left (SPARK-40066: under ANSI,
  * map element_at and GetMapValue both return NULL). The facade's text
  * pass lowers `x[i]` subscripts to a raw `element_at`, which resolves
  * to ElementAt(failOnError = true) — still raising for ARRAYS (the
  * reference's ArraySubscriptOperator contract, pinned by n07) but
  * silently NULL for maps. This rule rewrites exactly that map-typed
  * raising spelling to the guarded form
  *
  *   CASE WHEN map IS NULL OR k IS NULL THEN NULL
  *        WHEN array_contains(map_keys(map), k) THEN try_element_at(map, k)
  *        ELSE raise_error(...) END
  *
  * The user-facing `element_at(...)` FUNCTION is alias-mapped to
  * try_element_at (failOnError = false) before this rule sees it, so
  * it keeps the reference's NULL-returning element_at contract — and
  * the inner lookup here uses the same non-raising form, so the rule
  * never re-matches its own output. The error text renders the key
  * through the facade's own cast (a double key reads `1.5E0`, like
  * the reference's lookupCast-to-varchar). */
object RaisingMapSubscriptRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    // no pruning: ElementAt carries no dedicated TreePattern, and the
    // facade-scope check above already short-circuits every non-facade
    // plan before any traversal happens
    else plan.resolveExpressions {
      // the string-narrowed aggregates (map_agg/map_union/histogram —
      // the flat UDF registry can't be type-generic, README narrowing)
      // produce MAP<STRING,STRING>; a typed key from the same query
      // (m[max(orderkey)]) must coerce to the narrowed key type instead
      // of failing resolution
      case ElementAt(m, k, None, fail)
          if m.resolved && k.resolved &&
            m.dataType.isInstanceOf[MapType] &&
            m.dataType.asInstanceOf[MapType].keyType == StringType &&
            k.dataType != StringType &&
            !k.dataType.isInstanceOf[org.apache.spark.sql.types.NullType] =>
        ElementAt(m, Cast(k, StringType), None, fail)
      case g @ ElementAt(m, k, None, true)
          if g.resolved && m.dataType.isInstanceOf[MapType] =>
        rewriteOne(m, k, g.dataType)
      // defensive: a GetMapValue reaching the facade some other way
      // (e.g. DataFrame-built views queried through Engine.sql) gets
      // the same contract
      case g @ GetMapValue(m, k)
          if g.resolved && m.dataType.isInstanceOf[MapType] =>
        rewriteOne(m, k, g.dataType)
    }

  private def rewriteOne(
      m: Expression, k: Expression,
      dt: org.apache.spark.sql.types.DataType): Expression =
    // m and k are bound ONCE through a With/CommonExpressionDef: the
    // guarded form references each three times (null check, membership,
    // lookup/error text), and naive duplication would let a
    // non-deterministic key pass membership with one value and look up
    // another — spurious raise or wrong NULL
    With(m, k) { case Seq(mr, kr) =>
      val keyText = m.dataType.asInstanceOf[MapType].keyType match {
        case DoubleType | FloatType => graft.functions.PrestoDoubleString(kr)
        case _ => Cast(kr, StringType)
      }
      val raise = Cast(
        RaiseError(Concat(Seq(
          Literal("Key not present in map: "), keyText))),
        dt)
      If(Or(IsNull(mr), IsNull(kr)),
        Literal(null, dt),
        If(ArrayContains(MapKeys(mr), kr),
          ElementAt(mr, kr, None, failOnError = false),
          raise))
    }
}

/** The reference's common super type of REAL and DECIMAL is REAL
  * (type/TypeCoercer.java:236-239), so `real = decimal` compares at
  * FLOAT precision — CAST(1.2 AS REAL) = CAST(1.2 AS DECIMAL(2,1)) is
  * TRUE because both narrow to the same float
  * (AbstractTestJoinQueries testJoinWithConstantTrueExpressionWith
  * Coercion). Spark instead widens both sides to DOUBLE, where the
  * float's representation error surfaces (1.2f as double ≠ 1.2) and
  * the comparison is FALSE. Rewrites the coercion-inserted double
  * casts back to a float-typed comparison; user-written casts are
  * untouched. Fixpoint: the output carries no coercion double casts. */
object RealDecimalComparisonRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.DecimalType

  private def coerced(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DoubleType &&
        c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => Some(c.child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressions {
      case cmp: BinaryComparison
          if cmp.left.resolved && cmp.right.resolved =>
        (coerced(cmp.left), coerced(cmp.right)) match {
          case (Some(l), Some(r))
              if l.dataType == FloatType &&
                r.dataType.isInstanceOf[DecimalType] =>
            cmp.withNewChildren(Seq(l, Cast(r, FloatType)))
          case (Some(l), Some(r))
              if l.dataType.isInstanceOf[DecimalType] &&
                r.dataType == FloatType =>
            cmp.withNewChildren(Seq(Cast(l, FloatType), r))
          case _ => cmp
        }
    }
}

/** Resolution marker for Presto's length-carrying varchar cast: Spark
  * erases VARCHAR(n) to STRING at parse time
  * (spark.sql.preserveCharVarcharTypeInfo default), so the facade's
  * text pass captures n and emits this marker, which
  * [[VarcharLengthCastRewrite]] lowers once the child's type is
  * known. */
case class VarcharNMarker(
    child: Expression, n: Int, nullOnError: Boolean)
    extends UnaryExpression with Unevaluable {
  override def dataType: org.apache.spark.sql.types.DataType = StringType
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_varchar_n"
}

/** Presto CAST(x AS VARCHAR(n)) — the length is SEMANTIC:
  *   - a varchar source TRUNCATES to the first n code points
  *     (CharacterStringCasts.java:50 truncateToLength; AbstractTest
  *     Queries testNestedCast pins cast('9898.122' as varchar(3)) =
  *     '989'),
  *   - every other source renders first, then RAISES when the rendered
  *     string exceeds n ("Value %s cannot be represented as
  *     varchar(%s)", BigintOperators.java:283 et al; TRY_CAST nulls
  *     instead).
  * Spark erases the length entirely, so the facade's marker carries n
  * here; float-rooted sources render through the reference's
  * scientific notation like every other cast-to-varchar. */
object VarcharLengthCastRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressions {
      case m: VarcharNMarker if m.child.resolved =>
        m.child.dataType match {
          case _: StringType =>
            Substring(m.child, Literal(1), Literal(m.n))
          case dt =>
            def rendered = dt match {
              case DoubleType | FloatType =>
                graft.functions.PrestoDoubleString(m.child)
              case _ => Cast(m.child, StringType)
            }
            // NULL passes through (RETURN_NULL_ON_NULL) — without the
            // guard the three-valued length test would fall into the
            // raise branch with a NULL message
            If(IsNull(m.child), Literal(null, StringType),
              If(LessThanOrEqual(Length(rendered), Literal(m.n)),
                rendered,
                if (m.nullOnError) Literal(null, StringType)
                else Cast(RaiseError(Concat(Seq(
                  Literal("Value "), rendered,
                  Literal(s" cannot be represented as varchar(${m.n})")))),
                  StringType)))
        }
    }
}

/** The reference's ROW subscript — `row_expr[i]` with a constant
  * 1-based ordinal (planner/DesugarRowSubscript.java lowers it to field
  * access at analysis time) — has no Spark spelling: the facade's text
  * pass lowers every subscript to `element_at`, which only accepts
  * array/map operands, so a struct-typed base is left as an
  * ill-typed ElementAt. This rule rewrites exactly that spelling to
  * ordinal [[GetStructField]] access. Out-of-range or non-constant
  * ordinals deliberately don't match — CheckAnalysis then reports the
  * type error, mirroring the reference's compile-time rejection. */
object RowSubscriptRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
    ShortType, StructType}
  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressions {
      case ElementAt(r, k, None, _)
          if r.resolved && r.dataType.isInstanceOf[StructType] &&
            k.resolved && k.foldable && integral(k.dataType) &&
            ordinal(r, k) >= 1 =>
        val st = r.dataType.asInstanceOf[StructType]
        val i = ordinal(r, k)
        GetStructField(r, i - 1, Some(st(i - 1).name))
    }

  /** The constant 1-based ordinal if it addresses a field, else -1
    * (non-matching ordinals fall through to CheckAnalysis, mirroring
    * the reference's compile-time rejection). */
  private def ordinal(r: Expression, k: Expression): Int = {
    val n = k.eval() match {
      case x: java.lang.Number => x.intValue()
      case _ => -1
    }
    if (n >= 1 && n <= r.dataType.asInstanceOf[StructType].length) n else -1
  }
}

/** `WHERE NULL` / `HAVING NULL` — the reference coerces a bare NULL
  * predicate to BOOLEAN (unknown → every row rejected,
  * `TestAggregations.testCountWithNullPredicate`); Spark's CheckAnalysis
  * rejects the VOID-typed literal outright. Cast NullType filter
  * conditions to BOOLEAN. */
object NullFilterConditionRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  import org.apache.spark.sql.types.{BooleanType, NullType}
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveOperatorsUp {
      case f @ Filter(cond, _)
          if cond.resolved && cond.dataType == NullType =>
        f.copy(condition = Cast(cond, BooleanType))
    }
}

/** The reference allows `grouping(col)` under a PLAIN `GROUP BY` — the
  * group key is always present there, so it evaluates to 0
  * (GroupingOperationRewriter.java rewrites it against the grouping-set
  * mask; with a single implicit set the mask is all-zeros). Spark's
  * CheckAnalysis rejects grouping()/grouping_id() outside
  * GroupingSets/Cube/Rollup, so fold them to 0 when the Aggregate's
  * grouping expressions carry no grouping-set structure. Spark's own
  * ResolveGroupingAnalytics has already replaced the functions when
  * sets ARE present, so anything this rule sees over a plain Aggregate
  * is exactly the reference's always-grouped case. */
object PlainGroupByGroupingRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Aggregate
  import org.apache.spark.sql.types.{ByteType, LongType}
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveOperatorsUp {
      case a: Aggregate
          if a.groupingExpressions.nonEmpty &&
            !a.groupingExpressions.exists(_.isInstanceOf[BaseGroupingSets]) &&
            a.aggregateExpressions.exists(_.exists(e =>
              e.isInstanceOf[Grouping] || e.isInstanceOf[GroupingID])) =>
        a.transformExpressions {
          case _: Grouping => Literal(0.toByte, ByteType)
          case _: GroupingID => Literal(0L, LongType)
        }
    }
}

/** ARRAY/ROW `=` with the reference's THREE-VALUED semantics, in SELECT
  * positions only (the round-13 VERDICT's CHAR-style split adjudication,
  * measured this round: +10 reference assertions, 0 lost):
  *
  *   - Project / Aggregate output expressions are rewritten to
  *     [[graft.functions.ThreeValuedEqual]] — `ARRAY[1,null] =
  *     ARRAY[1,null]` is NULL like the reference, and ROWs carrying MAP
  *     fields become comparable at all (Spark raises
  *     INVALID_ORDERING_TYPE);
  *   - Filter predicates and join conditions are left Spark-semantics ON
  *     PURPOSE: rewriting them would hide the equi-join shape from the
  *     planner (array join keys lower to hash joins today; a CaseWhen'd
  *     comparison forces nested-loop plans) — and for filtering, NULL
  *     and FALSE reject rows identically except under NOT, a narrowing
  *     recorded in README's divergence matrix.
  *
  * IS [NOT] DISTINCT FROM stays on Spark's EqualNullSafe — DISTINCT
  * logic is two-valued in the reference too. */
object CollectionEqualityRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveOperatorsUpWithPruning(
      _.containsPattern(TreePattern.BINARY_COMPARISON)) {
      case p: Project =>
        p.copy(projectList = p.projectList
          .map(_.transformUp(rewrite).asInstanceOf[NamedExpression]))
      case a: Aggregate =>
        a.copy(aggregateExpressions = a.aggregateExpressions
          .map(_.transformUp(rewrite).asInstanceOf[NamedExpression]))
    }
  private val rewrite: PartialFunction[Expression, Expression] = {
    case EqualTo(l, r) if collection(l) && collection(r) =>
      graft.functions.ThreeValuedEqual(l, r)
  }
  private def collection(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => true
      case _: org.apache.spark.sql.types.StructType => true
      case _ => false
    })
}

/** NULL arguments to the reference's null-propagating map constructors:
  * `map_concat(m1, NULL, m2)` and `map_from_entries(NULL)` return NULL
  * (their operators are RETURN_NULL_ON_NULL — MapConcatFunction.java /
  * MapFromEntriesFunction.java), while Spark REJECTS the untyped-NULL
  * argument at type-check (MAP_CONCAT_DIFF_TYPES / UNEXPECTED_INPUT_TYPE).
  * A bare NULL literal argument folds the whole call to a typed NULL:
  * the map type comes from a sibling argument when one exists, else the
  * string-carrier map (the reference types it map(unknown,unknown);
  * only the NULL value is observable). */
object NullMapArgsRewrite extends Rule[LogicalPlan] {
  private val fallback =
    MapType(StringType, StringType)
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressions {
      case mc: MapConcat if mc.children.exists(isNullLit) =>
        val dt = mc.children.map(_.dataType)
          .collectFirst { case m: MapType => m }.getOrElse(fallback)
        Literal(null, dt)
      case mf: MapFromEntries if isNullLit(mf.child) =>
        Literal(null, fallback)
    }
  private def isNullLit(e: Expression): Boolean = e match {
    case Literal(null, org.apache.spark.sql.types.NullType) => true
    case Cast(c, _, _, _) => isNullLit(c)
    case _ => false
  }
}

/** array_join over DOUBLE/REAL elements: the reference stringifies each
  * element with its scalar cast-to-varchar — scientific notation
  * (ArrayJoin.java delegates to the element type's cast; TestArray-
  * Operators pins ARRAY_JOIN(ARRAY[1.0E0,…], 'x') = "1.0E0x…") — where
  * Spark renders plain decimal. Routes the element rendering through
  * [[graft.functions.PrestoDoubleString]] via a transform, after which
  * the join is string-typed and cannot re-match. */
object ArrayJoinDoubleRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressions {
      // type coercion has usually ALREADY wrapped the float array in
      // cast(arr AS array<string>) by the time the call resolves — match
      // through that wrapper and replace it; the bare pre-coercion form
      // is matched too
      case aj @ ArrayJoin(c @ Cast(arr, _, _, _), _, _)
          if aj.childrenResolved && isFloatArray(arr) &&
            c.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
        aj.withNewChildren(rendered(arr) +: aj.children.tail)
      case aj @ ArrayJoin(arr, _, _) if aj.childrenResolved && isFloatArray(arr) =>
        aj.withNewChildren(rendered(arr) +: aj.children.tail)
    }

  private def isFloatArray(arr: Expression): Boolean =
    arr.resolved && (arr.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    })

  private def rendered(arr: Expression): Expression = {
    val et = arr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val lv = NamedLambdaVariable("graft_e", et.elementType, et.containsNull)
    ArrayTransform(arr,
      LambdaFunction(graft.functions.PrestoDoubleString(lv), Seq(lv)))
  }
}

/** LIKE with a pattern arriving through a column or expression: the
  * text-level Dialect branch can only conform LITERAL patterns (it
  * doubles backslashes so Spark's implicit escape sees them as
  * ordinary characters — LikeFunctions.java:92 compiles no implicit
  * escape). A non-literal pattern reaches Spark's LIKE and gets
  * backslash-escape semantics, so those are routed through
  * [[graft.functions.PrestoLike]] instead. A user-declared ESCAPE
  * clause parses to a non-default escapeChar and is honored
  * identically by both engines — left untouched. (The one blind spot:
  * an EXPLICIT `ESCAPE '\'` over a non-literal pattern is
  * indistinguishable from the default at this level and loses its
  * escape; the literal-pattern path keeps it.) */
object RuntimeLikeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!graft.Engine.prestoDialectActive) plan
    else plan.resolveExpressionsWithPruning(
      _.containsPattern(TreePattern.LIKE_FAMLIY)) {
      case l @ Like(input, pattern, '\\')
          if l.resolved && !pattern.isInstanceOf[Literal] =>
        graft.functions.PrestoLike(input, pattern)
    }
}
