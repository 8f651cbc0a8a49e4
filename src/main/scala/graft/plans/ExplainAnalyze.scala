package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.{ReusedSubqueryExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** `EXPLAIN ANALYZE [VERBOSE] <statement>` — execute the statement, then
  * render the EXECUTED physical plan annotated with each operator's
  * observed runtime metrics (reference: presto-main/.../operator/
  * ExplainAnalyzeOperator.java + sql/planner/planPrinter/PlanPrinter.java
  * textDistributedPlan with stats; grammar SqlBase.g4:103). The reference
  * runs the query to completion and discards its rows, emitting a one-row
  * one-column plan text; we do the same — the probe job drains each
  * partition ON THE EXECUTORS (a runJob over the executed plan's RDD that
  * counts rows per partition), so nothing data-sized ever reaches the
  * driver, and the metrics we print are Spark's own SQLMetrics
  * accumulators (rows output, spill sizes, shuffle bytes, wall times) —
  * the exact counters the Spark UI shows.
  *
  * VERBOSE prints every metric an operator registered; the default keeps
  * the headline ones (the reference's default vs VERBOSE split is the
  * same idea: summary stats vs all-operator detail).
  */
/** Children across the AQE wrappers, shared by the post-execution plan
  * walkers (ExplainAnalyze, ExplainIo): after execution the interesting
  * tree hides behind AdaptiveSparkPlanExec.executedPlan / QueryStageExec
  * .plan / Reused*; plain `children` would render the wrappers as leaves
  * (and ExplainIo would MISS a scan sitting under a reused exchange). */
private[plans] object PlanWalk {
  def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case r: ReusedExchangeExec    => Seq(r.child)
    case r: ReusedSubqueryExec    => Seq(r.child)
    case other                    => other.children
  }
}

object ExplainAnalyze {

  private val headlineMetrics = Set(
    "numOutputRows", "numFiles", "filesSize", "numPartitions",
    "dataSize", "shuffleRecordsWritten", "spillSize", "numTasks")

  private def kids(p: SparkPlan): Seq[SparkPlan] = PlanWalk.kids(p)

  private def renderNode(
      p: SparkPlan, depth: Int, verbose: Boolean, sb: StringBuilder): Unit = {
    val shown = p.metrics.toSeq
      .filter { case (k, m) =>
        m.value >= 0 && (verbose || headlineMetrics(k) || k.endsWith("Rows")) }
      .sortBy(_._1)
      .map { case (k, m) => s"$k: ${m.value}" }
    sb.append("  " * depth).append(p.nodeName)
    if (shown.nonEmpty) sb.append(" [").append(shown.mkString(", ")).append("]")
    sb.append('\n')
    kids(p).foreach(renderNode(_, depth + 1, verbose, sb))
  }

  /** Execute `df` to completion (executor-side drain) and return the
    * one-row ("Query Plan") frame the reference's EXPLAIN ANALYZE emits. */
  def run(spark: SparkSession, df: DataFrame, verbose: Boolean): DataFrame = {
    val plan = df.queryExecution.executedPlan
    // Drain every partition where it lives; per-partition row counts come
    // back (bounded: one long per partition), the rows never move.
    val counts = spark.sparkContext.runJob(
      plan.execute(),
      (it: Iterator[InternalRow]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })
    val sb = new StringBuilder
    sb.append(s"Query Plan (executed; output rows: ${counts.sum}, " +
      s"partitions: ${counts.length})\n")
    renderNode(plan, 0, verbose, sb)
    import spark.implicits._
    Seq(sb.toString).toDF("Query Plan")
  }
}
