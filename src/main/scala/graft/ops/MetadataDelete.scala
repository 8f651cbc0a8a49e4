package graft.ops

import java.io.File
import java.net.URLDecoder

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Metadata-only DELETE: dropping whole partitions of a
  * directory-partitioned parquet table without rewriting a single data
  * row (reference: presto-main/.../sql/planner/optimizations/
  * MetadataDeleteOptimizer.java — `DELETE FROM t WHERE <predicate over
  * partition keys>` becomes a MetadataDeleteNode that drops partitions
  * in the metastore; operator/DeleteOperator.java is the row-level
  * fallback we deliberately do NOT emulate).
  *
  * The predicate is evaluated on the PARTITION VALUES ONLY — a bounded
  * driver-side relation with one row per partition directory (thousands
  * of rows at 100 TB, never data-sized), so the whole operation is a
  * directory listing + a local filter + directory removals: O(partitions),
  * independent of table bytes. A predicate that references any
  * non-partition column is rejected LOUDLY — silently rewriting rows
  * would turn a metadata op into a full-table rewrite, which is the
  * reference optimizer's exact firing condition inverted.
  */
object MetadataDelete {

  /** Partition column names, outermost first, inferred from the
    * `col=value` directory layers under `path`. */
  def partitionColumns(path: String): Seq[String] = {
    def firstLayer(dir: File): Option[String] =
      dir.listFiles().toSeq.filter(_.isDirectory).map(_.getName)
        .filter(_.contains('=')).map(_.takeWhile(_ != '=')).distinct match {
        case Seq(one) => Some(one)
        case _ => None
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var dir = new File(path)
    var layer = firstLayer(dir)
    while (layer.isDefined) {
      out += layer.get
      dir = dir.listFiles().find(f =>
        f.isDirectory && f.getName.startsWith(layer.get + "=")).get
      layer = firstLayer(dir)
    }
    out.toSeq
  }

  /** One row per leaf partition: (directory, value per partition col). */
  private def listPartitions(
      path: String, cols: Seq[String]): Seq[(File, Seq[String])] = {
    def walk(dir: File, level: Int, acc: Seq[String]): Seq[(File, Seq[String])] =
      if (level == cols.length) Seq((dir, acc))
      else dir.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith(cols(level) + "="))
        .flatMap { f =>
          val v = URLDecoder.decode(
            f.getName.substring(cols(level).length + 1), "UTF-8")
          walk(f, level + 1, acc :+ v)
        }
    walk(new File(path), 0, Nil)
  }

  /** `DELETE FROM <path> WHERE <predicate>` as a partition drop. Returns
    * the number of partitions removed. Throws IllegalArgumentException
    * when the predicate references a non-partition column or the table
    * is not directory-partitioned.
    */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Int = {
    require(new File(path).isDirectory,
      s"Metadata delete target does not exist or is not a directory: $path")
    val cols = partitionColumns(path)
    require(cols.nonEmpty,
      s"Metadata delete requires a directory-partitioned table: $path")

    val parts = listPartitions(path, cols)
    // Evaluate the predicate with Spark's own comparison/coercion
    // semantics over the partition-value relation (strings, exactly as
    // the directory names spell them — Spark casts them in comparisons
    // the same way its partition pruning does). The relation has ONLY
    // the partition columns, so a predicate touching anything else
    // fails analysis — rethrown as the loud reference-style rejection.
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    val rows = new java.util.ArrayList[Row]()
    parts.foreach { case (_, vs) => rows.add(Row.fromSeq(vs)) }
    val matching =
      try spark.createDataFrame(rows, schema)
        .filter(predicate).collect().map(_.toSeq.map(String.valueOf)).toSet
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"Metadata delete predicate may reference partition columns only " +
              s"(${cols.mkString(", ")}): ${e.getMessage}. Row-level DELETE " +
              "is not supported — rewrite the table instead.", e)
      }

    // A failed deletion must be LOUD (FsOps.deleteRecursively): a
    // half-deleted partition is a corrupt parquet layout.
    val doomed = parts.filter { case (_, vs) => matching(vs.map(String.valueOf)) }
    doomed.foreach { case (dir, _) => FsOps.deleteRecursively(dir) }
    doomed.size
  }

  /** Read back what survives — plain parquet read of the pruned layout. */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
