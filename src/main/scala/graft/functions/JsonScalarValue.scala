package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `CAST(json AS <scalar>)` with the reference's token coercions
  * (presto-main/.../util/JsonUtil.java currentTokenAsBigint/Integer/
  * Smallint/Tinyint/Double/Real/Boolean/Varchar; operators wired in
  * JsonOperators.java):
  *
  *   - the JSON `null` token → typed NULL for every target
  *   - number → integral targets round HALF_UP (DoubleOperators
  *     .castToLong: `128.9` → 129), float targets take the value
  *   - `true`/`false` → 1/0 for numeric targets, themselves for
  *     BOOLEAN, `"true"`/`"false"` text for VARCHAR
  *   - a STRING token applies the varchar→target cast to the UNQUOTED
  *     text (`'"128"'` → 128; `'"True"'` → true via VarcharOperators
  *     .castToBoolean's case-insensitive t/f/1/0/true/false forms)
  *   - number → VARCHAR renders float tokens in the reference's
  *     scientific form (`128.9` → `1.289E2`) and integer tokens as
  *     their literal text
  *   - any other token (object/array start) raises, as does trailing
  *     content after the first value
  *
  * `kind` is the target family; `decimal` returns the numeric TEXT for
  * an outer `CAST(.. AS DECIMAL(p,s))` to harmonize (Spark's ANSI
  * decimal cast rounds HALF_UP on scale narrowing like the
  * reference's rescale). Dispatched from the facade's CAST rewrite
  * (Dialect.rewriteJsonCast), so it only ever sees JSON sources.
  * Evaluation is a Jackson parse per value (CodegenFallback) — the
  * same cost profile as Spark's own from_json, fine for the cast
  * surface. */
case class JsonScalarValue(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = kind match {
    case "bigint" => LongType
    case "integer" => IntegerType
    case "smallint" => ShortType
    case "tinyint" => ByteType
    case "double" => DoubleType
    case "real" => FloatType
    case "boolean" => BooleanType
    case "varchar" | "decimal" => StringType
    case other => throw new IllegalArgumentException(
      s"graft_json_scalar: unknown target kind '$other'")
  }
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    JsonScalarValue.parse(v.asInstanceOf[UTF8String].toString, kind)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_json_scalar"
}

object JsonScalarValue {
  private val factory = new JsonFactory()

  private def fail(json: String, kind: String): Nothing =
    throw new IllegalArgumentException(s"Cannot cast '$json' to $kind")

  /** HALF_UP round of a float token to a long, raising outside the
    * target's range (DoubleOperators.castToLong via DoubleMath
    * .roundToLong(value, HALF_UP)). */
  private def roundLong(d: Double, json: String, kind: String): Long = {
    if (d.isNaN || d.isInfinite) fail(json, kind)
    java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  private def narrow(l: Long, json: String, kind: String): Any = kind match {
    case "bigint" => l
    case "integer" =>
      if (l < Int.MinValue || l > Int.MaxValue) fail(json, kind) else l.toInt
    case "smallint" =>
      if (l < Short.MinValue || l > Short.MaxValue) fail(json, kind) else l.toShort
    case "tinyint" =>
      if (l < Byte.MinValue || l > Byte.MaxValue) fail(json, kind) else l.toByte
  }

  /** VarcharOperators.castToBoolean: 1-char t/f/1/0 or the words
    * true/false, all case-insensitive; anything else raises. */
  private def textBoolean(s: String, json: String): Boolean =
    s.toLowerCase match {
      case "t" | "1" | "true" => true
      case "f" | "0" | "false" => false
      case _ => fail(json, "BOOLEAN")
    }

  def parse(json: String, kind: String): Any = {
    val integral = kind == "bigint" || kind == "integer" ||
      kind == "smallint" || kind == "tinyint"
    try {
      val p = factory.createParser(json)
      val tok = p.nextToken()
      val out: Any = tok match {
        case null => fail(json, kind)
        case JsonToken.VALUE_NULL => null
        case JsonToken.VALUE_STRING =>
          val s = p.getText
          kind match {
            case _ if integral => narrow(java.lang.Long.parseLong(s), json, kind)
            case "double" => java.lang.Double.parseDouble(s)
            case "real" => java.lang.Float.parseFloat(s)
            case "boolean" => textBoolean(s, json)
            case "varchar" | "decimal" => UTF8String.fromString(s)
          }
        case JsonToken.VALUE_NUMBER_INT =>
          kind match {
            case _ if integral => narrow(p.getLongValue, json, kind)
            case "double" => p.getDoubleValue
            case "real" => p.getFloatValue
            case "boolean" => p.getLongValue != 0L
            case "varchar" | "decimal" => UTF8String.fromString(p.getText)
          }
        case JsonToken.VALUE_NUMBER_FLOAT =>
          kind match {
            case _ if integral => narrow(roundLong(p.getDoubleValue, json, kind), json, kind)
            case "double" => p.getDoubleValue
            case "real" => p.getFloatValue
            case "boolean" => p.getDoubleValue != 0.0
            case "varchar" =>
              PrestoDoubleString(Literal(0.0, DoubleType)).compute(p.getDoubleValue)
            case "decimal" => UTF8String.fromString(p.getText)
          }
        case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
          val b = tok == JsonToken.VALUE_TRUE
          kind match {
            case _ if integral => narrow(if (b) 1L else 0L, json, kind)
            case "double" => if (b) 1.0 else 0.0
            case "real" => if (b) 1.0f else 0.0f
            case "boolean" => b
            case "varchar" | "decimal" =>
              UTF8String.fromString(if (b) "true" else "false")
          }
        case _ => fail(json, kind)
      }
      // no trailing token after the first value (JsonOperators
      // checkCondition on every scalar cast)
      if (p.nextToken() != null) fail(json, kind)
      out
    } catch {
      case e: IllegalArgumentException => throw e
      case _: Exception => fail(json, kind)
    }
  }
}
