package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{UnnestGenerator, ZipUnnestRows}

/** Direct coverage of the INTERPRETED UnnestGenerator.eval — the
  * optimizer (plans/UnnestRewrite.scala) lowers every resolved shape to
  * built-in expressions in normal plans, so the fallback path that
  * defines the semantics needs its own unit tests.
  */
class UnnestGeneratorSpec extends AnyFunSuite {

  private def arr(values: Any*): Literal =
    Literal.create(values, ArrayType(IntegerType))

  private def rows(g: UnnestGenerator): Seq[Seq[Any]] =
    g.eval(InternalRow.empty).iterator.toSeq.map { r =>
      (0 until g.elementSchema.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i, g.elementSchema(i).dataType))
    }

  test("single array explodes; ordinality is 1-based") {
    val g = UnnestGenerator(Seq(arr(10, 20)), withOrdinality = true)
    assert(rows(g) == Seq(Seq(10, 1L), Seq(20, 2L)))
  }

  test("zip pads the shorter argument with NULLs") {
    val g = UnnestGenerator(Seq(arr(1, 2, 3), arr(9)), withOrdinality = false)
    assert(rows(g) == Seq(Seq(1, 9), Seq(2, null), Seq(3, null)))
  }

  test("NULL and empty arguments produce zero rows; NULL pads in a zip") {
    val nullArr = Literal.create(null, ArrayType(IntegerType))
    assert(rows(UnnestGenerator(Seq(nullArr), withOrdinality = false)).isEmpty)
    assert(rows(UnnestGenerator(Seq(arr()), withOrdinality = true)).isEmpty)
    val g = UnnestGenerator(Seq(nullArr, arr(5)), withOrdinality = false)
    assert(rows(g) == Seq(Seq(null, 5)))
  }

  test("array of rows expands fields; map widens to key/value") {
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val rowArr = Literal.create(
      ArrayData.toArrayData(Array[Any](
        InternalRow(1, UTF8String.fromString("x")),
        InternalRow(2, UTF8String.fromString("y")))),
      ArrayType(st))
    val g = UnnestGenerator(Seq(rowArr), withOrdinality = false)
    assert(g.elementSchema.fieldNames.toSeq == Seq("a", "b"))
    assert(rows(g) == Seq(
      Seq(1, UTF8String.fromString("x")), Seq(2, UTF8String.fromString("y"))))

    val m = Literal.create(
      new ArrayBasedMapData(
        ArrayData.toArrayData(Array(UTF8String.fromString("k1"))),
        ArrayData.toArrayData(Array(7))),
      MapType(StringType, IntegerType))
    val gm = UnnestGenerator(Seq(m), withOrdinality = true)
    assert(gm.elementSchema.fieldNames.toSeq == Seq("key", "value", "ordinality"))
    assert(rows(gm) == Seq(Seq(UTF8String.fromString("k1"), 7, 1L)))
  }

  test("duplicate output names deduplicate with positional suffixes") {
    val g = UnnestGenerator(Seq(arr(1), arr(2)), withOrdinality = false)
    assert(g.elementSchema.fieldNames.toSeq == Seq("col_0", "col_1"))
  }

  test("non-collection input fails type check") {
    val g = UnnestGenerator(Seq(Literal(1)), withOrdinality = false)
    assert(!g.checkInputDataTypes().isSuccess)
  }

  // ---- r17: the native ZipUnnestRows kernel (the codegen lowering of
  // the residual multi-arg/ordinality/map shapes) must produce EXACTLY
  // the interpreted generator's row sequence on every shape, including
  // the adversarial ones (NULL argument, empty array, shorter-side
  // padding, null elements, null struct fields, maps, ordinality).
  private def kernelRows(
      children: Seq[Literal], ord: Boolean): Seq[Seq[Any]] = {
    val k = ZipUnnestRows(children, ord)
    val schema = k.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val out = k.eval(InternalRow.empty).asInstanceOf[ArrayData]
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, schema.length)
      (0 until schema.length).map(j =>
        if (r.isNullAt(j)) null else r.get(j, schema(j).dataType))
    }
  }

  test("ZipUnnestRows ≡ interpreted eval on every residual shape") {
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val rowArr = Literal.create(
      ArrayData.toArrayData(Array[Any](
        InternalRow(1, UTF8String.fromString("x")),
        null, // null struct element → all-NULL fields
        InternalRow(2, null))), // null field stays null
      ArrayType(st))
    val m = Literal.create(
      new ArrayBasedMapData(
        ArrayData.toArrayData(Array(
          UTF8String.fromString("k1"), UTF8String.fromString("k2"))),
        ArrayData.toArrayData(Array[Any](7, null))),
      MapType(StringType, IntegerType))
    val nullArr = Literal.create(null, ArrayType(IntegerType))
    val shapes: Seq[(Seq[Literal], Boolean)] = Seq(
      (Seq(arr(1, 2, 3), arr(9)), false),           // zip, padding
      (Seq(arr(1, 2, 3), arr(9)), true),            // zip + ordinality
      (Seq(nullArr, arr(5)), false),                // NULL argument pads
      (Seq(nullArr, nullArr), true),                // all NULL → no rows
      (Seq(arr(), arr()), false),                   // all empty → no rows
      (Seq(arr(10, 20)), true),                     // single + ordinality
      (Seq(rowArr), true),                          // rows flatten + ord
      (Seq(m, arr(1, 2, 3)), false),                // map zips with array
      (Seq(rowArr, m, arr(4)), true))               // everything at once
    for ((children, ord) <- shapes) {
      val g = UnnestGenerator(children, ord)
      val expected = rows(g)
      assert(kernelRows(children, ord) == expected,
        s"shape ${children.map(_.dataType.simpleString)} ord=$ord")
    }
  }
}
