package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's UUID type under the facade's narrowing to canonical
  * lowercase text (reference: presto-main/.../type/UuidOperators.java +
  * common/type/UuidType.java):
  *
  *   - `CAST(varchar AS UUID)` parses via java.util.UUID.fromString —
  *     the same mechanism the reference uses, so case folding and its
  *     lenient segment handling agree — and renders canonical
  *     lowercase (TestUuidOperators pins uppercase input → lowercase)
  *   - `CAST(varbinary AS UUID)` takes the 16-byte value in the
  *     reference's STORAGE order, which is the two halves
  *     byte-reversed (UuidType stores two little-endian longs:
  *     x'E911...8F' renders 12151fd2-7586-11e9-8f9e-2a86e4085a59)
  *   - `CAST(uuid AS VARCHAR)` is the identity on the canonical text
  *
  * Comparisons then ride Spark's string operators: on canonical
  * hyphenated lowercase hex, lexicographic text order equals the
  * unsigned byte order of the big-endian value. KNOWN DIVERGENCE: the
  * reference physically orders by the byte-swapped storage form, so
  * orderings that cross the half boundary can disagree; every
  * TestUuidOperators comparison (=, !=, <, BETWEEN) agrees under both
  * orders. */
case class UuidCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType => UuidCanon.fromBytes(v.asInstanceOf[Array[Byte]])
    case _ => UuidCanon.fromText(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType => defineCodeGen(ctx, ev,
        b => s"graft.functions.UuidCanon.fromBytes($b)")
      case _ => defineCodeGen(ctx, ev,
        s => s"graft.functions.UuidCanon.fromText($s)")
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_uuid"
}

object UuidCanon {
  def fromText(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.util.UUID.fromString(s.toString).toString)
    catch {
      case _: IllegalArgumentException => throw new IllegalArgumentException(
        s"Invalid UUID string length: ${s.numChars()}")
    }

  /** 16 storage-order bytes → canonical text: each 8-byte half is
    * little-endian (UuidType.getObjectValue reverses both longs). */
  def fromBytes(b: Array[Byte]): UTF8String = {
    if (b.length != 16) throw new IllegalArgumentException(
      s"UUIDs are exactly 16 bytes, got ${b.length}")
    var msb = 0L
    var lsb = 0L
    var i = 7
    while (i >= 0) { msb = (msb << 8) | (b(i) & 0xffL); i -= 1 }
    i = 15
    while (i >= 8) { lsb = (lsb << 8) | (b(i) & 0xffL); i -= 1 }
    UTF8String.fromString(new java.util.UUID(msb, lsb).toString)
  }
}
