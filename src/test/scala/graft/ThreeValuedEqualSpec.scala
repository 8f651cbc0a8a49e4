package graft

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Direct-eval contract of [[graft.functions.ThreeValuedEqual]]:
  *
  *  1. PROPERTY — on null-free values it must agree exactly with Spark's
  *     EqualTo (the rewrite may only change what NULLs and maps mean,
  *     never a definite comparison);
  *  2. the reference's three-valued rows (TestArrayOperators /
  *     TestRowOperators) at the expression level.
  */
class ThreeValuedEqualSpec extends AnyFunSuite {

  private def holds(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  private def lit(v: Any, dt: DataType): Literal =
    Literal(CatalystTypeConverters.createToCatalystConverter(dt)(v), dt)

  private def tri(a: Any, b: Any, dt: DataType): Any = {
    val e = graft.functions.ThreeValuedEqual(lit(a, dt), lit(b, dt))
    e.eval(null)
  }

  private val intArray = ArrayType(IntegerType, containsNull = true)
  private val nested = ArrayType(intArray, containsNull = true)

  test("property: null-free arrays agree with Spark EqualTo") {
    val gen = Gen.listOfN(3, Gen.listOf(Gen.choose(-3, 3)))
    holds(Prop.forAll(gen, gen) { (a: List[List[Int]], b: List[List[Int]]) =>
      val l = lit(a, nested); val r = lit(b, nested)
      val spark = EqualTo(l, r).eval(null)
      val ours = graft.functions.ThreeValuedEqual(l, r).eval(null)
      ours == spark
    })
  }

  test("reference three-valued rows") {
    assert(tri(Seq(1, 2, null), Seq(1, 2, null), intArray) == null)
    assert(tri(Seq(1, 2, null), Seq(1, 3, null), intArray) == false)
    assert(tri(Seq(1, null), Seq(1, 2, null), intArray) == false) // cardinality
    assert(tri(Seq(1, 2), Seq(1, 2), intArray) == true)
    assert(tri(Seq(Seq(1), Seq[Any](null), Seq(3)),
      Seq(Seq(1), Seq(2), Seq(3)), nested) == null)
    assert(tri(Seq(Seq(1), Seq[Any](null)), Seq(Seq(2), Seq(2)), nested) == false)
    val row = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType)))
    assert(tri(org.apache.spark.sql.Row(1, null),
      org.apache.spark.sql.Row(1, 2), row) == null)
    assert(tri(org.apache.spark.sql.Row(1, null),
      org.apache.spark.sql.Row(2, 2), row) == false)
    assert(tri(org.apache.spark.sql.Row(1, 2),
      org.apache.spark.sql.Row(1, 2), row) == true)
    // maps: key-set mismatch definite, null value unknown
    val m = MapType(IntegerType, IntegerType, valueContainsNull = true)
    assert(tri(Map(1 -> 2), Map(1 -> 2), m) == true)
    assert(tri(Map(1 -> 2), Map(3 -> 2), m) == false)
    assert(tri(Map(1 -> null), Map(1 -> 2), m) == null)
    assert(tri(Map(1 -> 2, 3 -> 4), Map(3 -> 4, 1 -> 2), m) == true) // order-free
  }
}
