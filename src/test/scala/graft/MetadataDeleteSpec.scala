package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ops.MetadataDelete

/** MetadataDelete semantics (reference: MetadataDeleteOptimizer.java —
  * partition-predicate DELETEs become partition drops; everything else
  * must NOT silently fall back to a rewrite).
  */
class MetadataDeleteSpec extends QueryAssertions {

  private def writePartitioned(levels: Seq[String]): String = {
    val out = Files.createTempDirectory("graft_mdel_spec").toString
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 2000)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(levels: _*).parquet(out)
    out
  }

  test("partition columns are inferred from the directory layout") {
    val single = writePartitioned(Seq("o_orderstatus"))
    assert(MetadataDelete.partitionColumns(single) == Seq("o_orderstatus"))
    val nested = writePartitioned(Seq("o_orderstatus", "o_year"))
    assert(MetadataDelete.partitionColumns(nested) ==
      Seq("o_orderstatus", "o_year"))
  }

  test("a partition-predicate delete drops exactly the matching rows") {
    val out = writePartitioned(Seq("o_orderstatus"))
    val before = spark.read.parquet(out)
    val keep = before.filter(col("o_orderstatus") =!= "O").count()
    val n = MetadataDelete.deleteWhere(spark, out, col("o_orderstatus") === "O")
    assert(n == 1)
    assert(MetadataDelete.table(spark, out).count() == keep)
    // deleting an absent value is a no-op, not an error
    assert(MetadataDelete.deleteWhere(spark, out,
      col("o_orderstatus") === "NOPE") == 0)
  }

  test("nested partition predicate drops only matching leaves") {
    val out = writePartitioned(Seq("o_orderstatus", "o_year"))
    val before = spark.read.parquet(out)
    val expect = before.filter(!(col("o_orderstatus") === "F" &&
      col("o_year") < 1998)).count()
    MetadataDelete.deleteWhere(spark, out,
      col("o_orderstatus") === "F" && col("o_year") < 1998)
    assert(MetadataDelete.table(spark, out).count() == expect)
  }

  test("non-partition predicates are rejected loudly") {
    val out = writePartitioned(Seq("o_orderstatus"))
    val e = intercept[IllegalArgumentException](
      MetadataDelete.deleteWhere(spark, out, col("o_totalprice") > 1000))
    assert(e.getMessage.contains("partition columns only"), e.getMessage)
    val mixed = intercept[IllegalArgumentException](
      MetadataDelete.deleteWhere(spark, out,
        col("o_orderstatus") === "O" && col("o_custkey") === 1))
    assert(mixed.getMessage.contains("partition columns only"), mixed.getMessage)
    // an unpartitioned directory is not a metadata-delete target
    val flat = Files.createTempDirectory("graft_mdel_flat").toString
    Tables.load(spark, sfDir, "nation").write
      .mode(SaveMode.Overwrite).parquet(flat)
    val un = intercept[IllegalArgumentException](
      MetadataDelete.deleteWhere(spark, flat, col("n_nationkey") === 1))
    assert(un.getMessage.contains("directory-partitioned"), un.getMessage)
    // a nonexistent target is a clean error, not an NPE
    val gone = intercept[IllegalArgumentException](
      MetadataDelete.deleteWhere(spark, "/tmp/graft_no_such_dir",
        col("x") === 1))
    assert(gone.getMessage.contains("does not exist"), gone.getMessage)
  }
}
