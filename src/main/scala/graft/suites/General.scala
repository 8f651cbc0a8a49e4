package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General query shapes mirroring the breadth of the reference's base
  * corpus (reference: presto-tests/.../AbstractTestQueries.java — 353
  * cases): uncorrelated scalar subqueries, literal IN lists, CASE in
  * GROUP BY, HAVING, self joins, chained CTEs, set ops in derived tables,
  * expression join keys, ordinal grouping.
  */
object General {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // Uncorrelated scalar subquery in the projection.
    Qdef(
      "g01_scalar_subquery",
      """SELECT o_orderkey, o_totalprice,
        |  round(o_totalprice / (SELECT max(o2.o_totalprice) FROM orders o2), 6)
        |    AS price_ratio
        |FROM orders
        |WHERE o_orderkey < 50
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val mx = t(s, dir, "orders").agg(max("o_totalprice").as("mx"))
      t(s, dir, "orders").filter(col("o_orderkey") < 50)
        .join(broadcast(mx))
        .select(col("o_orderkey"), col("o_totalprice"),
          round(col("o_totalprice") / col("mx"), 6).as("price_ratio"))
        .orderBy("o_orderkey")
    },

    // Literal IN list (compiled to a hash set, not a join).
    Qdef(
      "g02_in_literal_list",
      """SELECT o_orderstatus, count(*) AS cnt
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // CASE expression as a grouping key.
    Qdef(
      "g03_case_group_by",
      """SELECT CASE WHEN p_size < 10 THEN 'small'
        |            WHEN p_size < 30 THEN 'medium'
        |            ELSE 'large' END AS size_band,
        |  count(*) AS cnt, round(avg(p_retailprice), 4) AS avg_price
        |FROM part
        |GROUP BY 1
        |ORDER BY size_band""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .groupBy(
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large").as("size_band"))
        .agg(count(lit(1)).as("cnt"), round(avg("p_retailprice"), 4).as("avg_price"))
        .orderBy("size_band")
    },

    // HAVING over an aggregate not in the output list.
    Qdef(
      "g04_having",
      """SELECT c_nationkey, count(*) AS n_cust
        |FROM customer
        |GROUP BY c_nationkey
        |HAVING sum(c_acctbal) > 100000 AND count(*) > 10
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), sum("c_acctbal").as("bal"))
        .filter(col("bal") > 100000 && col("n_cust") > 10)
        .select("c_nationkey", "n_cust")
        .orderBy("c_nationkey")
    },

    // Self join: pairs of same-customer orders in two date windows.
    Qdef(
      "g05_self_join",
      """SELECT count(*) AS n_pairs
        |FROM orders o1
        |JOIN orders o2 ON o1.o_custkey = o2.o_custkey
        |  AND o1.o_orderkey < o2.o_orderkey
        |WHERE o1.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o1.o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'
        |  AND o2.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o2.o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'""".stripMargin) { (s, dir) =>
      val jan = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-02-01 00:00:00").cast("timestamp"))
      val o1 = jan.select(col("o_custkey").as("k1"), col("o_orderkey").as("id1"))
      val o2 = jan.select(col("o_custkey").as("k2"), col("o_orderkey").as("id2"))
      o1.join(o2, col("k1") === col("k2") && col("id1") < col("id2"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // Chained CTEs (one feeding the next).
    Qdef(
      "g06_chained_cte",
      """WITH big_orders AS (
        |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000),
        |cust_totals AS (
        |  SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS total
        |  FROM big_orders GROUP BY o_custkey)
        |SELECT count(*) AS n_cust, CAST(sum(n) AS BIGINT) AS n_orders,
        |  round(sum(total), 2) AS grand_total
        |FROM cust_totals
        |WHERE n >= 2""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
        .filter(col("n") >= 2)
        .agg(count(lit(1)).as("n_cust"), sum("n").cast("bigint").as("n_orders"),
          round(sum("total"), 2).as("grand_total"))
    },

    // Set operation inside a derived table, aggregated outside.
    Qdef(
      "g07_union_in_subquery",
      """SELECT src, count(*) AS cnt FROM (
        |  SELECT 'jan' AS src, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
        |  UNION ALL
        |  SELECT 'feb' AS src, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00'
        |) u
        |GROUP BY src
        |ORDER BY src""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
      def win(from: String, to: String, tag: String) = ord.filter(
        col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(to).cast("timestamp"))
        .select(lit(tag).as("src"), col("o_custkey"))
      win("1996-01-01 00:00:00", "1996-02-01 00:00:00", "jan")
        .union(win("1996-02-01 00:00:00", "1996-03-01 00:00:00", "feb"))
        .groupBy("src").agg(count(lit(1)).as("cnt"))
        .orderBy("src")
    },

    // Join key is an expression, not a bare column.
    Qdef(
      "g08_expression_join_key",
      """SELECT count(*) AS n
        |FROM customer c
        |JOIN supplier s ON (c.c_custkey % 100) = (s.s_suppkey % 100)
        |  AND c.c_nationkey = s.s_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "supplier"),
          (col("c_custkey") % 100) === (col("s_suppkey") % 100) &&
          col("c_nationkey") === col("s_nationkey"))
        .agg(count(lit(1)).as("n"))
    },

    // Correlated EXISTS under a disjunction (forces an existence-join
    // rather than a plain semi join).
    Qdef(
      "g10_exists_in_disjunction",
      """SELECT count(*) AS n
        |FROM customer c
        |WHERE c_acctbal > 9999
        |   OR EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)""".stripMargin) { (s, dir) =>
      val bigCust = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("bk")).distinct()
      t(s, dir, "customer")
        .join(bigCust, col("c_custkey") === col("bk"), "left")
        .filter(col("c_acctbal") > 9999 || col("bk").isNotNull)
        .agg(count(lit(1)).as("n"))
    },

    // Interval arithmetic on timestamps (day and month units).
    Qdef(
      "g11_interval_arithmetic",
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL '3' DAY AS DATE) AS due_date,
        |  CAST(o_orderdate - INTERVAL '1' MONTH AS DATE) AS prior_month
        |FROM orders
        |WHERE o_orderkey < 100
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL '3' DAY")).cast("date").as("due_date"),
          (col("o_orderdate") - expr("INTERVAL '1' MONTH")).cast("date")
            .as("prior_month"))
        .orderBy("o_orderkey")
    },

    // q11 shape — group share of a grand total (scalar subquery used in
    // both projection and HAVING).
    Qdef(
      "g12_value_share",
      """SELECT p_brand,
        |  round(sum(p_retailprice), 2) AS brand_value,
        |  round(sum(p_retailprice) / (SELECT sum(p_retailprice) FROM part), 6)
        |    AS share
        |FROM part
        |GROUP BY p_brand
        |HAVING sum(p_retailprice) > (SELECT 0.01 * sum(p_retailprice) FROM part)
        |ORDER BY brand_value DESC, p_brand""".stripMargin) { (s, dir) =>
      val total = t(s, dir, "part").agg(sum("p_retailprice").as("grand"))
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(sum("p_retailprice").as("bv"))
        .join(broadcast(total))
        .filter(col("bv") > col("grand") * 0.01)
        .select(
          col("p_brand"),
          round(col("bv"), 2).as("brand_value"),
          round(col("bv") / col("grand"), 6).as("share"))
        .orderBy(col("brand_value").desc, col("p_brand"))
    },

    // Time-series gap fill: a generated date spine LEFT JOINed to daily
    // counts, missing days surfaced as zero (sequence→rows + outer join —
    // the idiom behind every "fill the gaps" dashboard query).
    Qdef.duckOnly(
      "g13_gap_fill",
      """WITH spine AS (
        |  SELECT CAST(unnest(generate_series(DATE '1996-01-01',
        |    DATE '1996-01-31', INTERVAL '1 day')) AS DATE) AS d),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
        |  GROUP BY 1)
        |SELECT spine.d, CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.d = daily.d
        |ORDER BY spine.d""".stripMargin) { (s, dir) =>
      val spine = s.sql(
        "SELECT explode(sequence(DATE '1996-01-01', DATE '1996-01-31', INTERVAL '1' DAY)) AS d")
      val daily = t(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-02-01 00:00:00").cast("timestamp"))
        .groupBy(col("o_orderdate").cast("date").as("od"))
        .agg(count(lit(1)).as("n"))
      spine.join(daily, col("d") === col("od"), "left")
        .select(col("d"), coalesce(col("n"), lit(0L)).cast("bigint").as("n_orders"))
        .orderBy("d")
    },

    // Ordinal GROUP BY / ORDER BY references.
    Qdef(
      "g09_ordinal_refs",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )
}
