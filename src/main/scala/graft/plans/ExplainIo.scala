package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** `EXPLAIN (TYPE IO)` — the reference's I/O plan (presto-main/.../sql/
  * planner/planPrinter/IOPlanPrinter.java, dispatched from
  * QueryExplainer.java `case IO`): a one-row one-column JSON document
  * listing every input table with the columns actually read and the
  * constraints pushed into its scan, plus the output table for write
  * statements. We render the same shape from the PHYSICAL plan's scan
  * nodes — `ReadSchema` is the post-pruning column set and
  * `PushedFilters` the connector-consumed constraints, so the document
  * reports what the scan will truly do, not what the query mentions
  * (the exact property the reference's planner-level printer has).
  * Table identity narrowing: fixture tables resolve through parquet
  * paths, so the table name is the path's last `<name>.parquet`
  * segment; DSv2 scans report their `Table.name()`.
  */
object ExplainIo {

  private def scans(p: SparkPlan): Seq[SparkPlan] = p match {
    case f: FileSourceScanExec => Seq(f)
    case b: BatchScanExec      => Seq(b)
    case other => PlanWalk.kids(other).flatMap(scans) ++
      other.subqueries.flatMap(scans)
  }

  private def q(s: String): String = "\"" + s.replace("\\", "\\\\")
    .replace("\"", "\\\"") + "\""

  /** Split a filter list on the ", " separators BETWEEN constraints —
    * renderings like `LessThan(o_orderkey,1000)` carry commas inside
    * their parentheses, and a pushed STRING literal can itself carry
    * ',' '(' ')' unescaped (source-Filter toString does not quote:
    * `StringContains(o_comment,a)b,c)`), which naive depth tracking
    * mis-splits. Two defenses: (a) parenthesis depth is clamped at 0 so
    * a stray ')' inside a literal cannot poison the rest of the list;
    * (b) a depth-0 separator only splits when the remainder starts with
    * a constraint head (`Name(` — every Spark source-Filter rendering
    * does: EqualTo, In, IsNotNull, Or, Not, StringContains, …), so
    * literal fragments like `c)` never become phantom constraints.
    * Head-matching applies to PushedFilters only (strictHeads=true);
    * PartitionFilters carry Catalyst renderings (`(p_cat#12 = 5)`,
    * `isnotnull(...)`, `dynamicpruning#...`) with no fixed head shape,
    * so they split on any clamped-depth-0 comma as before. */
  private val ConstraintHead = "^[A-Za-z_][A-Za-z0-9_]*\\(.*".r.pattern
  private def splitTopLevel(s: String, strictHeads: Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '(' => depth += 1; cur.append(c)
        case ')' => depth = math.max(0, depth - 1); cur.append(c)
        case ',' if depth == 0 && (!strictHeads ||
            (i + 1 < s.length && s.charAt(i + 1) == ' ' &&
              ConstraintHead.matcher(s.substring(i + 2)).matches())) =>
          out += cur.toString.trim; cur.clear()
          if (i + 1 < s.length && s.charAt(i + 1) == ' ') i += 1 // skip the space
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def tableOf(f: FileSourceScanExec): String = {
    val root = f.relation.location.rootPaths.headOption.map(_.toString).getOrElse("")
    val seg = root.split('/').reverse.find(_.nonEmpty).getOrElse(root)
    seg.stripSuffix(".parquet")
  }

  def run(spark: SparkSession, df: DataFrame): DataFrame = {
    val infos = scans(df.queryExecution.executedPlan).map {
      case f: FileSourceScanExec =>
        val cols = f.requiredSchema.fieldNames.toSeq.sorted
        val constraints =
          (f.metadata.get("PushedFilters").toSeq.flatMap(s =>
            splitTopLevel(s.stripPrefix("[").stripSuffix("]"), strictHeads = true)) ++
            f.metadata.get("PartitionFilters").toSeq.flatMap(s =>
              splitTopLevel(s.stripPrefix("[").stripSuffix("]"), strictHeads = false)))
            .filter(_.nonEmpty)
        (tableOf(f), cols, constraints)
      case b: BatchScanExec =>
        (b.table.name(), b.scan.readSchema().fieldNames.toSeq.sorted,
          Seq(b.scan.description()))
    }.distinct.sortBy(_._1)
    val json =
      infos.map { case (t, cols, cons) =>
        s"""{"table": ${q(t)}, "columns": [${cols.map(q).mkString(", ")}], """ +
          s""""columnConstraints": [${cons.map(q).mkString(", ")}]}"""
      }.mkString(
        "{\n  \"inputTableColumnInfos\": [\n    ", ",\n    ",
        "\n  ],\n  \"outputTable\": null\n}")
    import spark.implicits._
    Seq(json).toDF("Query Plan")
  }
}
