package graft

import java.io.File
import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ops.RowLevelDelete

/** Copy-on-write row-level DELETE (reference: operator/DeleteOperator
  * .java): only the files containing matches are rewritten, everything
  * else stays byte-identical; SQL DELETE null semantics (NULL-predicate
  * rows survive); partition placement preserved.
  */
class RowLevelDeleteSpec extends QueryAssertions {

  private def md5(f: File): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  /** (relative path → md5) of every parquet file under `dir`. */
  private def fileHashes(dir: String): Map[String, String] = {
    def walk(d: File): Seq[File] =
      d.listFiles().toSeq.flatMap(c => if (c.isDirectory) walk(c) else Seq(c))
    walk(new File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(dir) -> md5(f)).toMap
  }

  test("only files containing matches are rewritten; others are byte-identical") {
    val out = Files.createTempDirectory("graft_rdel_spec").toString
    // partitionBy(o_orderstatus) groups matches into the F partition's
    // files, so the O/P partitions' files must come through untouched
    Tables.load(spark, sfDir, "orders").filter(col("o_orderkey") < 2000)
      .write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(out)
    val before = spark.read.parquet(out)
    val expectDeleted = before.filter(
      col("o_orderstatus") === "F" && col("o_totalprice") < 100000).count()
    val expectKeep = before.count() - expectDeleted
    // computed BEFORE the delete — `before` is lazy and its files go away
    val expectKeepF = before.filter(col("o_orderstatus") === "F" &&
      !(col("o_totalprice") < 100000)).count()
    val hashesBefore = fileHashes(out)

    val n = RowLevelDelete.deleteWhere(spark, out,
      col("o_orderstatus") === "F" && col("o_totalprice") < 100000)
    assert(n == expectDeleted && n > 0)

    val hashesAfter = fileHashes(out)
    val untouched = hashesBefore.keySet.filterNot(_.contains("o_orderstatus=F"))
    assert(untouched.nonEmpty)
    untouched.foreach { f =>
      assert(hashesAfter.get(f).contains(hashesBefore(f)),
        s"unaffected file $f was rewritten")
    }
    // the affected partition's files were replaced (no original survives)
    val affectedBefore = hashesBefore.keySet.filter(_.contains("o_orderstatus=F"))
    assert(affectedBefore.forall(f => !hashesAfter.contains(f)))

    val after = RowLevelDelete.table(spark, out)
    assert(after.count() == expectKeep)
    // partition values survived the rewrite
    assert(after.filter(col("o_orderstatus") === "F").count() == expectKeepF)
  }

  test("NULL-predicate rows survive (SQL DELETE semantics)") {
    val out = Files.createTempDirectory("graft_rdel_null").toString
    val s = spark
    import s.implicits._
    Seq(Some(1), Some(10), None, Some(3), None).toDF("x")
      .write.mode(SaveMode.Overwrite).parquet(out)
    val n = RowLevelDelete.deleteWhere(spark, out, col("x") > 5)
    assert(n == 1)
    val left = RowLevelDelete.table(spark, out)
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(left.count(_ == null) == 2 && left.toSet == Set(1, 3, null))
  }

  test("unpartitioned multi-file table: matched rows go, count is exact") {
    val out = Files.createTempDirectory("graft_rdel_flat").toString
    Tables.load(spark, sfDir, "orders").filter(col("o_orderkey") < 2000)
      .repartition(4).write.mode(SaveMode.Overwrite).parquet(out)
    val before = spark.read.parquet(out)
    val expectDeleted = before.filter(col("o_orderpriority") === "5-LOW").count()
    val total = before.count()
    val n = RowLevelDelete.deleteWhere(spark, out,
      col("o_orderpriority") === "5-LOW")
    assert(n == expectDeleted)
    val after = RowLevelDelete.table(spark, out)
    assert(after.count() == total - expectDeleted)
    assert(after.filter(col("o_orderpriority") === "5-LOW").count() == 0)
    // a no-match predicate is a no-op that touches nothing
    val hashes = fileHashes(out)
    assert(RowLevelDelete.deleteWhere(spark, out, col("o_orderkey") < 0) == 0)
    assert(fileHashes(out) == hashes)
  }

  test("a nonexistent target is a clean error") {
    val e = intercept[IllegalArgumentException](
      RowLevelDelete.deleteWhere(spark, "/tmp/graft_no_such_rdel",
        col("x") === 1))
    assert(e.getMessage.contains("does not exist"), e.getMessage)
  }
}
