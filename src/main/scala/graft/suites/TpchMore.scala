package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes, adapted to the fixture columns
  * (no partsupp / l_shipmode / l_commitdate — see FIXTURES.md). Shapes
  * follow the reference benchmark set (reference:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/
  * q02.sql…q22.sql); correlated subqueries are expressed as joins on the
  * DataFrame side — the same decorrelation the reference's optimizer does
  * (reference: presto-main/.../sql/planner/iterative/rule/
  * TransformCorrelatedScalarAggregationToJoin.java) and Catalyst does for
  * the SQL path.
  */
object TpchMore {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // q02 shape — correlated scalar subquery (min within group), here
    // decorrelated to groupBy+join; shuffles on p_brand only.
    Qdef(
      "q02_min_cost_part",
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
        |                       WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_retailprice, p_partkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val part = t(s, dir, "part")
      val minPerBrand = part.groupBy(col("p_brand").as("mb_brand"))
        .agg(min("p_retailprice").as("min_price"))
      part.join(minPerBrand,
          col("p_brand") === col("mb_brand") &&
          col("p_retailprice") === col("min_price"))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(col("p_retailprice"), col("p_partkey"))
        .limit(20)
    },

    // q04 shape — EXISTS → left-semi join (reference:
    // presto-main/.../operator/HashSemiJoinOperator.java).
    Qdef(
      "q04_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "leftsemi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // q07 shape — bi-national volume by ship year: two nation lookups
    // (fixed 25 rows → broadcast), disjunctive nation-pair filter.
    Qdef(
      "q07_nation_volume",
      """SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .withColumn("l_year", year(col("l_shipdate")))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("volume").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // q08 shape — market share: conditional aggregation (CASE inside sum).
    Qdef(
      "q08_market_share",
      """SELECT o_year,
        |  sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)
        |    AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n_name AS nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(
          year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
          col("n_name").as("nation"))
        .groupBy("o_year")
        .agg((sum(when(col("nation") === "NATION_3", col("volume")).otherwise(0)) /
              sum(col("volume"))).as("mkt_share"))
        .orderBy("o_year")
    },

    // q09 shape — product-type profit by nation and year (profit proxy:
    // retail margin, since the fixture has no ps_supplycost).
    Qdef(
      "q09_product_profit",
      """SELECT nation, o_year, sum(amount) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, year(l_shipdate) AS o_year,
        |         l_extendedprice * (1 - l_discount)
        |           - p_retailprice * 0.8 * l_quantity AS amount
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%gear%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").like("%gear%")),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(
          col("n_name").as("nation"),
          year(col("l_shipdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("p_retailprice") * lit(0.8) * col("l_quantity")).as("amount"))
        .groupBy("nation", "o_year")
        .agg(sum("amount").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // q12 shape — two-branch conditional counts per line status (fixture
    // has no l_shipmode; priority buckets take its place).
    Qdef(
      "q12_priority_by_status",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val hi = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
      t(s, dir, "orders")
        .join(
          t(s, dir, "lineitem").filter(
            col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(hi, 1).otherwise(0)).as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // q13 shape — LEFT OUTER join preserving customers with zero orders,
    // then a second aggregation over the counts (reference:
    // presto-main/.../operator/LookupOuterOperator.java).
    Qdef(
      "q13_customer_distribution",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") =!= "F"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // q14 shape — promo revenue percentage: CASE-gated sum over a join.
    Qdef(
      "q14_promo_revenue",
      """SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { (s, dir) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0)) /
          sum(rev)).as("promo_revenue"))
    },

    // q15 shape — scalar subquery over a derived table used twice: the
    // supplier(s) hitting max revenue. The 1-row max side is broadcast.
    Qdef(
      "q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max("total_revenue").as("mx"))
      t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(mx), col("total_revenue") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // q16 shape — NOT IN → anti join + count(DISTINCT): lineitem stands in
    // for partsupp (reference rewrite: presto-main/.../iterative/rule/
    // TransformUncorrelatedInPredicateSubqueryToSemiJoin.java).
    Qdef(
      "q16_supplier_cnt",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 13, 17, 21)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 50""".stripMargin) { (s, dir) =>
      val badSupp = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(
            col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 5, 9, 13, 17, 21)),
          col("l_partkey") === col("p_partkey"))
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(50)
    },

    // q17 shape — correlated aggregate (per-part avg), decorrelated to a
    // pre-aggregated join on l_partkey.
    Qdef(
      "q17_small_qty_revenue",
      """SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#5'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin) { (s, dir) =>
      val avgQty = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("aq_partkey"))
        .agg((lit(0.2) * avg("l_quantity")).as("qty_limit"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_brand") === "Brand#5"),
          col("p_partkey") === col("l_partkey"))
        .join(avgQty, col("aq_partkey") === col("l_partkey"))
        .filter(col("l_quantity") < col("qty_limit"))
        .agg((sum("l_extendedprice") / 7.0).as("avg_yearly"))
    },

    // q18 shape — IN over a grouped HAVING subquery → semi join on the
    // aggregated keys.
    Qdef(
      "q18_large_orders",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       sum(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("big_orderkey"))
        .agg(sum("l_quantity").as("q")).filter(col("q") > 150)
        .select("big_orderkey")
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(big, col("o_orderkey") === col("big_orderkey"), "leftsemi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum("l_quantity").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // q19 shape — disjunction of conjuncts as the join residual: Catalyst
    // extracts the common p_partkey=l_partkey equi-condition and keeps the
    // OR as a post-join filter (reference: presto-main/.../operator/
    // JoinFilterFunction.java for the residual path).
    Qdef(
      "q19_disjunctive_revenue",
      """SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, dir) =>
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(cond)
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // q20 shape — nested IN chains → two stacked semi joins.
    Qdef(
      "q20_part_suppliers",
      """SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY l_suppkey
        |  HAVING sum(l_quantity) > 50)
        |ORDER BY s_name""".stripMargin) { (s, dir) =>
      val redParts = t(s, dir, "part").filter(col("p_name").like("red%"))
        .select("p_partkey")
      val bigSupp = t(s, dir, "lineitem")
        .join(redParts, col("l_partkey") === col("p_partkey"), "leftsemi")
        .groupBy("l_suppkey")
        .agg(sum("l_quantity").as("q")).filter(col("q") > 50)
        .select("l_suppkey")
      t(s, dir, "supplier")
        .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "leftsemi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    },

    // q21 shape — EXISTS + NOT EXISTS self-joins on lineitem with a
    // non-equi conjunct (other supplier in the same order).
    Qdef(
      "q21_waiting_supplier",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val l1 = li.select(col("l_orderkey").as("l1_orderkey"),
        col("l_suppkey").as("l1_suppkey"), col("l_returnflag").as("l1_flag"))
      val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"))
      l1.filter(col("l1_flag") === "R")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l1_orderkey"))
        .join(l2,
          col("l2_orderkey") === col("l1_orderkey") &&
          col("l2_suppkey") =!= col("l1_suppkey"), "leftsemi")
        .join(l3,
          col("l3_orderkey") === col("l1_orderkey") &&
          col("l3_suppkey") =!= col("l1_suppkey"), "left_anti")
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l1_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // q22 shape — NOT EXISTS anti join + uncorrelated scalar-avg threshold
    // (broadcast 1-row) + substr-derived grouping key.
    Qdef(
      "q22_idle_customers",
      """SELECT cntrycode, count(*) AS numcust, sum(c_acctbal) AS totacctbal
        |FROM (
        |  SELECT substr(c_name, 10, 2) AS cntrycode, c_acctbal, c_custkey
        |  FROM customer
        |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0.0)
        |) hot
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("avg_bal"))
      cust
        .join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(substring(col("c_name"), 10, 2).as("cntrycode"), col("c_acctbal"))
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), sum("c_acctbal").as("totacctbal"))
        .orderBy("cntrycode")
    }
  )
}
