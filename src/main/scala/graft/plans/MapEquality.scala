package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, IntegerType, MapType}

/** Presto supports `MAP = MAP` / `!=` as first-class operators
  * (presto-main/.../operator/MapGenericEquality.java, pinned throughout
  * TestMapOperators): sizes must match, every left key must exist on the
  * right (a missing key is definitively FALSE), and value comparison is
  * KLEENE — any false pair → FALSE, else any null comparison → NULL,
  * else TRUE. Spark rejects map equality at analysis
  * (INVALID_ORDERING_TYPE), so this rule lowers the comparison to a
  * fold over the key set. Pure widening: every query this rule touches
  * failed analysis before it existed.
  *
  * The fold is a bound higher-order [[ArrayAggregate]] over
  * `map_keys(l)` carrying a tri-state int (1 true / 0 false / −1 null);
  * the Kleene combine keeps 0 dominant over −1 over 1. NULL maps
  * propagate NULL like every comparison operator.
  *
  * Scope: top-level map comparisons. A map nested INSIDE another map's
  * value type still fails analysis (the inner EqualTo this rule emits
  * would need the same lowering recursively at an unresolved type —
  * the reference's own generic equality recurses; not worth the
  * machinery until a query wants it).
  */
object MapEqualityRewrite extends Rule[LogicalPlan] {

  private def kleeneFold(l: Expression, r: Expression): Expression = {
    val keyType = l.dataType.asInstanceOf[MapType].keyType
    val acc = NamedLambdaVariable("acc", IntegerType, nullable = false)
    val k = NamedLambdaVariable("k", keyType, nullable = false)
    val lv = GetMapValue(l, k)
    val rv = GetMapValue(r, k)
    val eq = EqualTo(lv, rv)
    val cmp = If(Not(MapContainsKey(r, k)), Literal(0),
      If(IsNull(eq), Literal(-1), If(eq, Literal(1), Literal(0))))
    val step = If(Or(EqualTo(acc, Literal(0)), EqualTo(cmp, Literal(0))),
      Literal(0),
      If(Or(EqualTo(acc, Literal(-1)), EqualTo(cmp, Literal(-1))),
        Literal(-1), Literal(1)))
    val accOut = NamedLambdaVariable("accOut", IntegerType, nullable = false)
    ArrayAggregate(
      MapKeys(l), Literal(1),
      LambdaFunction(step, Seq(acc, k)),
      LambdaFunction(accOut, Seq(accOut)))
  }

  private def mapEq(l: Expression, r: Expression): Expression = {
    val sizesEq = EqualTo(Size(MapKeys(l)), Size(MapKeys(r)))
    val folded = kleeneFold(l, r)
    If(Or(IsNull(l), IsNull(r)),
      Literal.create(null, BooleanType),
      If(Not(sizesEq), Literal(false),
        If(EqualTo(folded, Literal(0)), Literal(false),
          If(EqualTo(folded, Literal(-1)),
            Literal.create(null, BooleanType), Literal(true)))))
  }

  private def bothMaps(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved &&
      l.dataType.isInstanceOf[MapType] && r.dataType.isInstanceOf[MapType]

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case EqualTo(l, r) if bothMaps(l, r) => mapEq(l, r)
    }
}
