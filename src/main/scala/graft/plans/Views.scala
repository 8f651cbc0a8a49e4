package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** View + materialized-view DDL behind the SQL facade (reference: grammar
  * SqlBase.g4:64-71 + :105-109; plain-view execution path
  * presto-main/.../execution/CreateViewTask.java; MV semantics
  * presto-main/.../execution/CreateMaterializedViewTask.java and the
  * partition-scoped refresh of RefreshMaterializedViewTask — Presto's MV
  * refresh is `REFRESH MATERIALIZED VIEW mv WHERE <partition predicate>`,
  * which recomputes ONLY the matching partitions of the storage table).
  *
  * Documented narrowings:
  *   - a plain view is a Spark temporary view over the translated defining
  *     query (no persistent catalog; names are single-part);
  *   - MV storage is a session-scoped parquet directory, partitioned by the
  *     reference's `partitioned_by` table property; other WITH properties
  *     are accepted and ignored;
  *   - the reference tracks MV staleness and can answer a stale MV query
  *     from base tables; here the MV always answers from its storage —
  *     freshness is the caller's REFRESH responsibility (the explicit half
  *     of the reference contract);
  *   - REFRESH requires the MV to be partitioned, mirroring the reference's
  *     partition-scoped refresh model. The predicate is evaluated on the
  *     recomputed defining query; affected partition values are discovered
  *     with one bounded DISTINCT aggregation (O(partitions), never data-
  *     sized — same contour as ops/MetadataDelete), those partition
  *     directories are swapped, and everything else is untouched.
  *
  * Scale shape: create = one distributed write; refresh = one distributed
  * recompute of the predicate's slice + a partition-directory swap. Nothing
  * row-sized ever reaches the driver.
  */
object Views {

  final case class MatView(
      name: String,
      bodySql: String,
      createSql: String,
      path: String,
      partitionedBy: Seq[String])

  /** Partition-value cap for a single refresh: the DISTINCT partition list
    * is collected (bounded metadata, like the reference's metastore calls);
    * beyond this a refresh predicate is suspiciously unselective. */
  private val MaxRefreshPartitions = 10000

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      require(children != null, s"cannot list $f during materialized-view swap")
      children.foreach(rm)
    }
    if (f.exists()) require(f.delete(), s"failed to delete $f")
  }

  def create(
      spark: SparkSession, mv: MatView, translatedBody: String): DataFrame = {
    val df = spark.sql(translatedBody)
    mv.partitionedBy.foreach(c =>
      require(df.columns.map(_.toLowerCase).contains(c.toLowerCase),
        s"materialized view ${mv.name}: partitioned_by column '$c' is not " +
          s"produced by the defining query (columns: ${df.columns.mkString(", ")})"))
    val w = df.write.mode(SaveMode.Overwrite)
    (if (mv.partitionedBy.nonEmpty) w.partitionBy(mv.partitionedBy: _*) else w)
      .parquet(mv.path)
    register(spark, mv)
    spark.sql(s"SELECT 'CREATE MATERIALIZED VIEW' AS result, '${mv.name}' AS view")
  }

  /** (Re)point the temp view at the storage directory. */
  def register(spark: SparkSession, mv: MatView): Unit =
    spark.read.parquet(mv.path).createOrReplaceTempView(mv.name)

  def refresh(
      spark: SparkSession, mv: MatView,
      translatedBody: String, translatedPred: String): DataFrame = {
    require(mv.partitionedBy.nonEmpty,
      s"REFRESH MATERIALIZED VIEW ${mv.name}: the view is unpartitioned — " +
        "the reference's WHERE-scoped refresh recomputes matching PARTITIONS; " +
        "recreate the view with partitioned_by, or DROP and CREATE it")
    val slice = spark.sql(translatedBody).where(translatedPred)
    // bounded partition-value discovery (one DISTINCT agg, O(partitions))
    val partCols = mv.partitionedBy
    val values = slice.selectExpr(partCols: _*).distinct()
      .limit(MaxRefreshPartitions + 1).collect()
    require(values.length <= MaxRefreshPartitions,
      s"REFRESH ${mv.name}: predicate selects > $MaxRefreshPartitions partitions")
    // swap: write the slice to the side, drop the affected partition dirs,
    // move the fresh ones in — readers of untouched partitions never see a
    // half state for their partition
    val stage = mv.path + ".refresh"
    rm(new java.io.File(stage))
    slice.write.mode(SaveMode.Overwrite).partitionBy(partCols: _*).parquet(stage)
    for (row <- values) {
      val rel = partCols.zipWithIndex.map { case (c, i) =>
        val v = row.get(i)
        s"$c=${if (v == null) "__HIVE_DEFAULT_PARTITION__" else v.toString}"
      }.mkString("/")
      val dst = new java.io.File(mv.path, rel)
      rm(dst)
      val src = new java.io.File(stage, rel)
      if (src.exists()) {
        require(dst.getParentFile.isDirectory || dst.getParentFile.mkdirs(),
          s"cannot create $dst")
        require(src.renameTo(dst), s"failed to move $src into place")
      }
    }
    rm(new java.io.File(stage))
    register(spark, mv)
    val n = values.length
    spark.sql(s"SELECT 'REFRESH MATERIALIZED VIEW' AS result, " +
      s"'${mv.name}' AS view, CAST($n AS BIGINT) AS partitions_refreshed")
  }

  def drop(spark: SparkSession, mv: MatView): Unit = {
    spark.catalog.dropTempView(mv.name)
    rm(new java.io.File(mv.path))
  }
}
