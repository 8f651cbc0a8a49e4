package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** Reference-semantics `=` over ARRAY and ROW values: element-/field-wise
  * THREE-VALUED comparison (reference: the generated ArrayEqualOperator /
  * RowEqualOperator / MapGenericEquality — presto-main/.../operator/;
  * TestArrayOperators pins `ARRAY[1,2,null] = ARRAY[1,2,null]` = NULL and
  * `ARRAY[ARRAY[1],ARRAY[null],ARRAY[3]] = ARRAY[ARRAY[1],ARRAY[2],
  * ARRAY[3]]` = NULL), where Spark's EqualTo treats nested NULLs as
  * ordinary equal values. Semantics per level:
  *
  *   - different cardinality → definite FALSE (no null-peeking);
  *   - any element-pair comparing FALSE → FALSE;
  *   - otherwise any NULL element/field (either side) or unknown
  *     pair → NULL;
  *   - else TRUE.
  *
  * Maps recurse with the reference's map contract (size match, key
  * lookup definite, Kleene over values) — which also makes ROWs with MAP
  * fields comparable at all (Spark raises INVALID_ORDERING_TYPE).
  * Injected by [[graft.plans.CollectionEqualityRewrite]] in SELECT
  * positions only; see the rule for the join-key adjudication.
  */
case class ThreeValuedEqual(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    tri(a, b, left.dataType)

  /** null = unknown. */
  private def tri(a: Any, b: Any, dt: DataType): java.lang.Boolean = dt match {
    case ArrayType(et, _) =>
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (x.numElements() != y.numElements()) return java.lang.Boolean.FALSE
      var unknown = false
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i) || y.isNullAt(i)) unknown = true
        else tri(x.get(i, et), y.get(i, et), et) match {
          case java.lang.Boolean.FALSE => return java.lang.Boolean.FALSE
          case null => unknown = true
          case _ =>
        }
        i += 1
      }
      if (unknown) null else java.lang.Boolean.TRUE
    case st: StructType =>
      val (x, y) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
      var unknown = false
      var i = 0
      while (i < st.fields.length) {
        val ft = st.fields(i).dataType
        if (x.isNullAt(i) || y.isNullAt(i)) unknown = true
        else tri(x.get(i, ft), y.get(i, ft), ft) match {
          case java.lang.Boolean.FALSE => return java.lang.Boolean.FALSE
          case null => unknown = true
          case _ =>
        }
        i += 1
      }
      if (unknown) null else java.lang.Boolean.TRUE
    case MapType(kt, vt, _) =>
      val (x, y) = (a.asInstanceOf[MapData], b.asInstanceOf[MapData])
      if (x.numElements() != y.numElements()) return java.lang.Boolean.FALSE
      val (xk, xv) = (x.keyArray(), x.valueArray())
      val (yk, yv) = (y.keyArray(), y.valueArray())
      var unknown = false
      var i = 0
      while (i < x.numElements()) {
        // key lookup is DEFINITE (map keys are non-null); O(n·m) scan —
        // these are row-local literals/values, not relations
        var j = 0
        var found = -1
        while (j < y.numElements() && found < 0) {
          if (tri(xk.get(i, kt), yk.get(j, kt), kt) == java.lang.Boolean.TRUE)
            found = j
          j += 1
        }
        if (found < 0) return java.lang.Boolean.FALSE
        if (xv.isNullAt(i) || yv.isNullAt(found)) unknown = true
        else tri(xv.get(i, vt), yv.get(found, vt), vt) match {
          case java.lang.Boolean.FALSE => return java.lang.Boolean.FALSE
          case null => unknown = true
          case _ =>
        }
        i += 1
      }
      if (unknown) null else java.lang.Boolean.TRUE
    case BinaryType =>
      java.lang.Boolean.valueOf(java.util.Arrays.equals(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))
    case DoubleType =>
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      java.lang.Boolean.valueOf(x == y || (x.isNaN && y.isNaN))
    case FloatType =>
      val (x, y) = (a.asInstanceOf[Float], b.asInstanceOf[Float])
      java.lang.Boolean.valueOf(x == y || (x.isNaN && y.isNaN))
    case _ =>
      java.lang.Boolean.valueOf(a == b)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_collection_eq"
}
