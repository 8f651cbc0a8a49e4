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
      dt: org.apache.spark.sql.types.DataType): Expression = {
    val keyText = m.dataType.asInstanceOf[MapType].keyType match {
      case DoubleType | FloatType => graft.functions.PrestoDoubleString(k)
      case _ => Cast(k, StringType)
    }
    val raise = Cast(
      RaiseError(Concat(Seq(
        Literal("Key not present in map: "), keyText))),
      dt)
    If(Or(IsNull(m), IsNull(k)),
      Literal(null, dt),
      If(ArrayContains(MapKeys(m), k),
        ElementAt(m, k, None, failOnError = false),
        raise))
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
