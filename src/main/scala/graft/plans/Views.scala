package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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
  *   - REFRESH requires the MV to be partitioned AND the predicate to
  *     reference partition columns only, mirroring the reference's
  *     partition-scoped refresh model (a row-level predicate would
  *     silently drop the partition's non-matching rows — rejected loudly
  *     instead, the same contract as ops/MetadataDelete).
  *
  * Refresh mechanics: the affected partition set is the UNION of the
  * partitions the predicate matches in the CURRENT storage (so a
  * partition whose rows vanished from the base is dropped, not left
  * stale) and the partitions the recomputed slice produces. The slice is
  * written with Spark's dynamic partition-overwrite (which handles
  * Hive-style path escaping — ':' in a timestamp value, '=' in a string
  * — correctly, where hand-built `col=value` paths would not), and the
  * vanished partitions are dropped through MetadataDelete's loud
  * partition-drop. Both partition-value discoveries are one bounded
  * DISTINCT each — O(partitions), never data-sized.
  *
  * Scale shape: create = one distributed write; refresh = one distributed
  * recompute of the predicate's slice + per-partition overwrites. Nothing
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

  /** Column names a (possibly unresolved) predicate references. */
  private def referencedColumns(spark: SparkSession, pred: String): Seq[String] =
    spark.sessionState.sqlParser.parseExpression(pred).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name.toLowerCase
    }.distinct

  def refresh(
      spark: SparkSession, mv: MatView,
      translatedBody: String, translatedPred: String): DataFrame = {
    require(mv.partitionedBy.nonEmpty,
      s"REFRESH MATERIALIZED VIEW ${mv.name}: the view is unpartitioned — " +
        "the reference's WHERE-scoped refresh recomputes matching PARTITIONS; " +
        "recreate the view with partitioned_by, or DROP and CREATE it")
    val partCols = mv.partitionedBy.map(_.toLowerCase)
    val refs = referencedColumns(spark, translatedPred)
    val offenders = refs.filterNot(partCols.contains)
    require(offenders.isEmpty,
      s"REFRESH MATERIALIZED VIEW ${mv.name}: the WHERE predicate may " +
        s"reference partition columns only (${partCols.mkString(", ")}); " +
        s"found: ${offenders.mkString(", ")}. A row-level predicate would " +
        "silently drop the partition's non-matching rows — recompute the " +
        "whole partition instead")

    // partitions the predicate matches in the CURRENT storage: these must
    // be refreshed even when the recomputed slice no longer produces them
    // (the vanished-partition case). String-typed values, exactly as a
    // partition-value comparison sees them.
    val oldVals = spark.read.parquet(mv.path)
      .where(translatedPred)
      .selectExpr(partCols.map(c => s"CAST($c AS STRING) AS $c"): _*)
      .distinct().limit(MaxRefreshPartitions + 1).collect()
      .map(_.toSeq.map(String.valueOf)).toSet
    require(oldVals.size <= MaxRefreshPartitions,
      s"REFRESH ${mv.name}: predicate selects > $MaxRefreshPartitions partitions")

    val slice = spark.sql(translatedBody).where(translatedPred)
    val newVals = slice
      .selectExpr(partCols.map(c => s"CAST($c AS STRING) AS $c"): _*)
      .distinct().limit(MaxRefreshPartitions + 1).collect()
      .map(_.toSeq.map(String.valueOf)).toSet
    require(newVals.size <= MaxRefreshPartitions,
      s"REFRESH ${mv.name}: predicate selects > $MaxRefreshPartitions partitions")

    // dynamic partition-overwrite: replaces exactly the partitions the
    // slice produces, with Spark's own path escaping and per-partition
    // swap — untouched partitions are never rewritten
    if (newVals.nonEmpty)
      slice.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(mv.partitionedBy: _*).parquet(mv.path)

    // drop the partitions that matched before but produced no rows now —
    // MetadataDelete evaluates on the directory partition values with
    // Spark semantics and deletes LOUDLY
    val vanished = oldVals -- newVals
    if (vanished.nonEmpty) {
      val pred = vanished.toSeq.map { vs =>
        partCols.zip(vs).map { case (c, v) => col(c) === lit(v) }
          .reduce(_ && _)
      }.reduce(_ || _)
      graft.ops.MetadataDelete.deleteWhere(spark, mv.path, pred)
    }

    register(spark, mv)
    val n = (oldVals ++ newVals).size
    spark.sql(s"SELECT 'REFRESH MATERIALIZED VIEW' AS result, " +
      s"'${mv.name}' AS view, CAST($n AS BIGINT) AS partitions_refreshed")
  }

  def drop(spark: SparkSession, mv: MatView): Unit = {
    spark.catalog.dropTempView(mv.name)
    graft.ops.FsOps.deleteRecursively(new java.io.File(mv.path))
  }
}
