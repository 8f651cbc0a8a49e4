package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's IPADDRESS type under the facade's narrowing to its
  * canonical text (reference: presto-main/.../type/IpAddressOperators
  * .java): any accepted spelling — dotted quad, full or compressed v6,
  * uppercase hex, embedded dotted quad, v4-mapped — canonicalizes on
  * construction, so `=` / `<>` / IS DISTINCT FROM between spellings of
  * one address agree with the reference as plain string operators
  * (`'1.2.3.4'` = `'::ffff:1.2.3.4'`). Sources: varchar, varbinary
  * (4 or 16 bytes), or an IPPREFIX value (→ its network address).
  * KNOWN DIVERGENCE: the reference ORDERS by the 16-byte value, so
  * `<`/BETWEEN across the v4/v6 boundary can disagree with canonical-
  * text order (same shape as the UUID half-boundary note). */
case class IpAddressCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType =>
      UTF8String.fromString(IpFunctions.canonAddress(v.asInstanceOf[Array[Byte]]))
    case _ =>
      UTF8String.fromString(
        IpFunctions.canonAddress(v.asInstanceOf[UTF8String].toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType => defineCodeGen(ctx, ev, b =>
        s"UTF8String.fromString(graft.functions.IpFunctions.canonAddress($b))")
      case _ => defineCodeGen(ctx, ev, s =>
        s"UTF8String.fromString(graft.functions.IpFunctions.canonAddress($s.toString()))")
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_ipaddress"
}

/** IPPREFIX narrowed to canonical text `network/len` (reference:
  * type/IpPrefixOperators.java — host bits masked off, the address part
  * in IPADDRESS canonical form). An address-valued source takes its
  * full-length prefix (/32 v4, /128 v6). */
case class IpPrefixCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      IpFunctions.canonPrefix(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.IpFunctions.canonPrefix($s.toString()))")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_ipprefix"
}
