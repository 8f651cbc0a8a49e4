package graft.plans

import graft.functions.UnnestGenerator
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Lower the interpreted [[UnnestGenerator]] to codegen'd built-in
  * expressions once types are known (reference analog: the planner's
  * unnest specialization in presto-main/.../operator/unnest/
  * UnnestOperator.java choosing ArrayUnnester vs MapUnnester vs
  * ArrayOfRowsUnnester per channel). The generator carries the
  * semantics and output schema; this rule is pure lowering:
  *
  *   - single `array(row(…))`, no ordinality → Inline (field expansion)
  *   - single `array(T)` / `map(K,V)`, no ordinality → Explode
  *   - everything else (multi-argument zip, WITH ORDINALITY, maps in
  *     any position) → Inline over a positionally-zipped row array:
  *
  *     inline(transform(slice(sequence(1, greatest(n, 1)), 1, n),
  *       i -> struct(ch1[i]…, chK[i].field…, entries(chM)[i].key/.value…,
  *                   CAST(i AS BIGINT))))
  *
  *     with n = greatest over the non-NULL argument sizes (a NULL
  *     argument contributes nothing to n and pads NULL columns; all
  *     NULL/empty → zero rows) — the same NULL-padded zip the
  *     reference's multi-channel unnester performs, kept entirely
  *     inside whole-stage codegen.
  *
  * The Generate node's resolved `generatorOutput` attributes are kept —
  * only the generator expression changes, and the lowered element
  * schema matches [[UnnestGenerator.elementSchema]] positionally in
  * arity and type by construction. The interpreted eval remains as the
  * semantic fallback for sessions without this rule installed.
  */
object UnnestCodegenRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case g @ Generate(u: UnnestGenerator, _, _, _, _, _) if u.resolved =>
      (u.children, u.withOrdinality) match {
        case (Seq(child), false) =>
          child.dataType match {
            case ArrayType(_: StructType, _) => g.copy(generator = Inline(child))
            case _: ArrayType                => g.copy(generator = Explode(child))
            case _: MapType                  => g.copy(generator = Explode(child))
            case _                           => g
          }
        case _ => g.copy(generator = Inline(lowerZip(u)))
      }
  }

  /** element_at with try semantics: NULL (never an error) beyond range. */
  private def at(arr: Expression, i: Expression): Expression =
    new ElementAt(arr, i, None, false)

  /** The zipped row-array expression described in the class doc. */
  private def lowerZip(u: UnnestGenerator): Expression = {
    val lv = NamedLambdaVariable("__graft_i", IntegerType, nullable = false)
    // per-argument length with NULL → 0 (size(NULL) is NULL in
    // non-legacy mode, which greatest would skip, but an explicit 0 keeps
    // the expression conf-independent)
    val lens = u.children.map(c =>
      Coalesce(Seq(Size(c, legacySizeOfNull = false), Literal(0))))
    val n = if (lens.size == 1) lens.head else Greatest(lens)
    val seq = new Sequence(
      Literal(1), Greatest(Seq(n, Literal(1))), None,
      Some(conf.sessionLocalTimeZone))
    val indices = Slice(seq, Literal(1), n)
    val fields: Seq[Expression] = u.children.flatMap { c =>
      c.dataType match {
        case ArrayType(st: StructType, _) =>
          val row = at(c, lv)
          st.fields.indices.map(j => GetStructField(row, j, Some(st.fields(j).name)))
        case _: ArrayType => Seq(at(c, lv))
        case _: MapType =>
          val entry = at(MapEntries(c), lv)
          Seq(GetStructField(entry, 0, Some("key")),
            GetStructField(entry, 1, Some("value")))
        case _ => Seq(at(c, lv)) // unreachable: checkInputDataTypes rejects
      }
    } ++ (if (u.withOrdinality) Seq(Cast(lv, LongType)) else Nil)
    val named = u.elementSchema.fields.map(_.name).zip(fields).flatMap {
      case (name, f) => Seq(Literal(name), f)
    }
    val struct = CreateNamedStruct(named.toSeq)
    ArrayTransform(indices, LambdaFunction(struct, Seq(lv)))
  }
}
