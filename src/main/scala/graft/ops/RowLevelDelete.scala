package graft.ops

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level DELETE over a parquet directory as a COPY-ON-WRITE rewrite
  * (reference: presto-main/.../operator/DeleteOperator.java +
  * TableFinishOperator — the reference deletes row-by-row through the
  * connector; a file-based table has no row-level storage API, so the
  * equivalent is the Delta/Iceberg-style copy-on-write: rewrite ONLY the
  * files that contain matching rows, leave every other file untouched).
  *
  * Scale shape, in order:
  *   1. ONE distributed job finds the affected files and the per-file
  *      match counts: `filter(pred).groupBy(input_file_name()).count()`.
  *      Only (file, count) pairs reach the driver — bounded by the file
  *      count, never data-sized.
  *   2. ONE distributed job rewrites the survivors of exactly those
  *      files (`read(affected).filter(NOT pred <=> TRUE)`) into a temp
  *      dir next to the table. Unaffected files are never read, never
  *      rewritten — at 100 TB with a selective predicate this touches a
  *      sliver of the table. Partition columns recovered via basePath
  *      are written back with partitionBy, so survivors land in their
  *      original partition directories.
  *   3. The swap: new files move in (same-filesystem atomic renames),
  *      THEN the affected originals are removed. A crash between the two
  *      phases leaves transient DUPLICATES, never lost rows — the
  *      reference gets all-or-nothing from the metastore transaction;
  *      a bare directory has no transaction log, and this ordering is
  *      the loud, documented best-effort (duplicates are detectable and
  *      re-deletable; silent loss is not).
  *
  * DELETE semantics: rows where the predicate is TRUE are deleted; FALSE
  * and NULL rows survive (`NOT (pred IS TRUE)`), matching SQL DELETE.
  */
object RowLevelDelete {

  /** Delete matching rows; returns the number of rows deleted. */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Long = {
    require(new File(path).isDirectory,
      s"Row-level delete target does not exist or is not a directory: $path")
    val full = spark.read.parquet(path)
    val partCols = {
      // partition columns = columns absent from the physical files
      // (recovered from col=value directory names by partition discovery)
      val onDisk = spark.read.parquet(firstDataFile(path)).columns.toSet
      full.columns.filterNot(onDisk)
    }

    // Job 1: affected files + per-file deleted counts (bounded collect).
    val affected = full.filter(predicate)
      .groupBy(input_file_name().as("_file")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (affected.isEmpty) return 0L
    val deleted = affected.map(_._2).sum
    val affectedPaths = affected.map(_._1).map(stripScheme)

    // Job 2: rewrite survivors of the affected files only.
    val survivors = spark.read.option("basePath", path)
      .parquet(affectedPaths.toIndexedSeq: _*)
      .filter(not(predicate <=> true))
    val tmp = Files.createTempDirectory(
      Paths.get(path).getParent, ".delete_tmp_").toString
    val writer = survivors.write.mode("overwrite")
    (if (partCols.nonEmpty) writer.partitionBy(partCols.toIndexedSeq: _*)
     else writer).parquet(tmp)

    // Phase A: move the new files in (atomic per file, unique task names).
    moveDataFiles(new File(tmp), new File(path))
    FsOps.deleteRecursively(new File(tmp))
    // Phase B: remove the rewritten originals — loud on failure, same as
    // MetadataDelete (a half-swapped layout must not pass silently).
    affectedPaths.foreach { f =>
      require(new File(f).delete(), s"Could not delete rewritten file $f — " +
        "the table now holds transient duplicates; re-run the delete after " +
        "resolving the filesystem issue")
    }
    deleted
  }

  /** Read back what survives. */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def stripScheme(f: String): String =
    if (f.startsWith("file:")) f.stripPrefix("file:") else f

  private def firstDataFile(path: String): String = {
    def find(dir: File): Option[File] = {
      val children = dir.listFiles()
      require(children != null, s"Could not list $dir")
      children.sortBy(_.getName).collectFirst {
        case f if f.isFile && f.getName.endsWith(".parquet") => f
      }.orElse(children.filter(_.isDirectory).sortBy(_.getName)
        .iterator.flatMap(find(_).iterator).nextOption())
    }
    find(new File(path)).getOrElse(
      throw new IllegalArgumentException(s"No parquet files under $path")).toString
  }

  /** Move every data file under `from` into the mirror location under
    * `to`, preserving partition subdirectories; skips _SUCCESS/metadata. */
  private def moveDataFiles(from: File, to: File): Unit = {
    def walk(dir: File, rel: Seq[String]): Unit = {
      val children = dir.listFiles()
      require(children != null, s"Could not list $dir")
      children.foreach { c =>
        if (c.isDirectory) walk(c, rel :+ c.getName)
        else if (c.getName.endsWith(".parquet")) {
          val destDir = rel.foldLeft(to)((d, seg) => new File(d, seg))
          require(destDir.isDirectory || destDir.mkdirs(),
            s"Could not create $destDir")
          Files.move(c.toPath, new File(destDir, c.getName).toPath,
            StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
    walk(from, Nil)
  }

}
