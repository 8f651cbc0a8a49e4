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
  *     any position) → Inline over [[graft.functions.ZipUnnestRows]],
  *     a native codegen kernel that materializes the NULL-padded
  *     positional zip (rows, flattened row fields, map entries,
  *     1-based BIGINT ordinality) in one primitive pass. r16 lowered
  *     this shape to `inline(transform(sequence(...), i -> struct(...)))`
  *     — semantically identical, but `transform` is a
  *     HigherOrderFunction whose lambda evaluates INTERPRETED (one
  *     dispatch per output row per column); the kernel closes that last
  *     interpreted generator path (r16 verdict #6). UnnestGeneratorSpec
  *     pins kernel ≡ the interpreted [[UnnestGenerator.eval]].
  *
  * The Generate node's resolved `generatorOutput` attributes are kept —
  * only the generator expression changes, and the lowered element
  * schema matches [[UnnestGenerator.elementSchema]] positionally in
  * arity and type by construction (ZipUnnestRows delegates its schema
  * to the generator). The interpreted eval remains as the semantic
  * fallback for sessions without this rule installed.
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
        case _ => g.copy(generator =
          Inline(graft.functions.ZipUnnestRows(u.children, u.withOrdinality)))
      }
  }
}
