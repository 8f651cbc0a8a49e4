package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort/limit corpus (SURVEY §2.6) beyond the TopN the TPC-H shapes
  * exercise: OFFSET, DistinctLimit, and explicit NULLS FIRST/LAST
  * ordering. Presto's ASC default is NULLS LAST (reference: presto-main/
  * .../sql/planner/PlannerUtils.java:46, orders in presto-common/.../
  * block/SortOrder.java) while Spark's is NULLS FIRST — every nullable
  * sort key here carries an explicit null ordering on BOTH sides, which
  * is the convention the engine adopts.
  */
object Ordering {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // LIMIT + OFFSET pagination (reference: operator/LimitOperator.java,
    // planner/plan/OffsetNode.java + ImplementOffset rewrite).
    Qdef(
      "o01_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(20)
        .limit(10)
    },

    // DistinctLimit (reference: operator/DistinctLimitOperator.java) —
    // deterministic via ordered distinct values.
    Qdef(
      "o02_distinct_limit",
      """SELECT st FROM (
        |  SELECT DISTINCT o_orderstatus AS st FROM orders) d
        |ORDER BY st
        |LIMIT 2""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus").as("st"))
        .distinct()
        .orderBy("st")
        .limit(2)
    },

    // Explicit NULLS LAST on an ASC nullable key — the Presto default,
    // spelled out so Spark and the oracle agree (see object scaladoc).
    Qdef(
      "o03_nulls_last",
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS maybe_status
        |FROM orders
        |WHERE o_orderkey < 200
        |ORDER BY maybe_status ASC NULLS LAST, o_orderkey
        |LIMIT 40""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("maybe_status"))
        .orderBy(col("maybe_status").asc_nulls_last, col("o_orderkey"))
        .limit(40)
    },

    // NULLS FIRST on DESC (Presto's DESC default is NULLS FIRST too).
    Qdef(
      "o04_nulls_first_desc",
      """SELECT o_orderkey, nullif(o_orderstatus, 'F') AS maybe_status
        |FROM orders
        |WHERE o_orderkey < 200
        |ORDER BY maybe_status DESC NULLS FIRST, o_orderkey
        |LIMIT 40""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("F")).as("maybe_status"))
        .orderBy(col("maybe_status").desc_nulls_first, col("o_orderkey"))
        .limit(40)
    },

    // Multi-key mixed-direction global sort (range-partitioned exchange +
    // per-partition sort — Spark's merge-sorted-exchange equivalent,
    // reference: operator/OrderByOperator.java + MergeOperator.java).
    Qdef(
      "o05_multi_key_sort",
      """SELECT o_orderstatus, o_orderpriority, o_orderkey
        |FROM orders
        |WHERE o_orderkey < 500
        |ORDER BY o_orderstatus ASC, o_orderpriority DESC, o_orderkey ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select("o_orderstatus", "o_orderpriority", "o_orderkey")
        .orderBy(col("o_orderstatus").asc, col("o_orderpriority").desc,
          col("o_orderkey").asc)
    }
  )
}
