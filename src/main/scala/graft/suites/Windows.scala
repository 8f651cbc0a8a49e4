package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function corpus (SURVEY §2.5). The reference evaluates these in
  * a dedicated sorted-partition operator (reference: presto-main/.../
  * operator/WindowOperator.java, functions registered at metadata/
  * BuiltInTypeAndFunctionNamespaceManager.java:599-609, 31 reference tests
  * in presto-tests/.../AbstractTestWindowQueries.java); Spark's
  * WindowExec + WindowGroupLimitExec cover the same surface. Every
  * ordering includes a unique tiebreaker so results are deterministic
  * across engines.
  */
object Windows {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Orders of a small customer slice — enough partitions to be real,
    * small enough that corpus outputs stay reviewable. */
  private def ordSlice(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_custkey") < 50)

  private val byCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))
  private val byCustPrice = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  val defs: Seq[Qdef] = Seq(

    // Ranking functions over a deterministic per-customer order.
    Qdef(
      "w01_ranking",
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  rank()       OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(byCust).as("rn"),
          rank().over(byCust).as("rnk"),
          dense_rank().over(byCust).as("drnk"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Distribution functions: percent_rank / cume_dist / ntile.
    Qdef(
      "w02_distribution",
      """SELECT o_orderkey, o_custkey,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist()    OVER w, 6) AS cdist,
        |  ntile(4)             OVER w AS quartile
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          round(percent_rank().over(byCustPrice), 6).as("prnk"),
          round(cume_dist().over(byCustPrice), 6).as("cdist"),
          ntile(4).over(byCustPrice).as("quartile"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
        .drop("o_totalprice")
    },

    // lag/lead with explicit defaults (reference: presto-main/.../operator/
    // window/LagFunction.java, LeadFunction.java).
    Qdef(
      "w03_lag_lead",
      """SELECT o_orderkey, o_custkey,
        |  lag(o_totalprice, 1, 0.0)   OVER w AS prev_price,
        |  lead(o_totalprice, 1, -1.0) OVER w AS next_price
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          lag(col("o_totalprice"), 1, 0.0).over(byCust).as("prev_price"),
          lead(col("o_totalprice"), 1, -1.0).over(byCust).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .drop("o_orderdate")
    },

    // first/last/nth_value with an explicit ROWS frame (frame-aware value
    // functions, reference: presto-main/.../operator/window/
    // FramedWindowFunction.java).
    Qdef(
      "w04_value_functions",
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice)  OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .drop("o_orderdate")
    },

    // Aggregates over a running ROWS frame (cumulative sum/avg/count).
    Qdef(
      "w05_running_agg",
      """SELECT o_orderkey, o_custkey,
        |  sum(o_totalprice)   OVER w AS running_total,
        |  round(avg(o_totalprice) OVER w, 6) AS running_avg,
        |  count(*)            OVER w AS running_cnt
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          sum(col("o_totalprice")).over(w).as("running_total"),
          round(avg(col("o_totalprice")).over(w), 6).as("running_avg"),
          count(lit(1)).over(w).as("running_cnt"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .drop("o_orderdate")
    },

    // Sliding ROWS frame (moving window of 3 rows).
    Qdef(
      "w06_sliding_frame",
      """SELECT o_orderkey, o_custkey,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
        |  min(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS local_min
        |FROM orders
        |WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          round(avg(col("o_totalprice")).over(byCust.rowsBetween(-2, 0)), 6)
            .as("moving_avg3"),
          min(col("o_totalprice")).over(byCust.rowsBetween(-1, 1)).as("local_min"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .drop("o_orderdate")
    },

    // RANGE frame: peers (equal order keys) aggregate together — the only
    // RANGE form the reference supports (reference: presto-main/.../sql/
    // analyzer/StatementAnalyzer.java:2051-2077 restricts RANGE to
    // UNBOUNDED/CURRENT ROW); Spark is a superset.
    Qdef(
      "w07_range_frame",
      """SELECT o_orderkey, o_custkey,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS range_total
        |FROM orders
        |WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      ordSlice(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          sum(col("o_totalprice")).over(w).as("range_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .drop("o_orderdate")
    },

    // Top-N per partition: row_number + filter fuses into a rank-limited
    // window (Spark WindowGroupLimitExec; the reference's equivalent fusion
    // is presto-main/.../operator/TopNRowNumberOperator.java produced by
    // optimizations/WindowFilterPushDown.java).
    Qdef(
      "w08_topn_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) ranked
        |WHERE rn <= 3 AND o_custkey < 200
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byCustPrice).as("rn"))
        .filter(col("rn") <= 3 && col("o_custkey") < 200)
        .orderBy(col("o_custkey"), col("rn"))
    }
  )
}
