package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS query SHAPES ported onto the fixture schema (reference:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/
  * q03,q07,q10,q14_1,q19,q27,q34,q42,q46,q67,q68.sql). The TPC-H-ish
  * fixtures have no
  * date_dim/store/demographics tables, so each port keeps the reference
  * query's STRUCTURE — star-join fan-in, derived-table aggregation with
  * HAVING-style bounds, ROLLUP + GROUPING(), a dimension joined twice
  * with an inequality between the two copies, disjunctive dimension
  * filters — while drawing dimensions from orders/customer/supplier/
  * part/nation. These compositions are where optimizer regressions hide
  * (join reorder, partial-agg pushdown, grouping-expansion width), which
  * is why they join the corpus even though every individual operator is
  * already covered.
  *
  * Scale notes: every query is a fact-table scan (lineitem) joined to
  * dimensions. `nation` (25 rows) is explicitly broadcast; part/orders/
  * customer joins are left to Catalyst + AQE, which broadcast them at
  * small SF and shuffle-hash at 100 TB where they outgrow the threshold.
  * ORDER BY ... LIMIT in the DataFrame programs lowers to TopN
  * (TakeOrderedAndProject), never a global sort. Queries whose sort key
  * is a float sum either omit LIMIT or use a limit comfortably above the
  * group count so the DuckDB/Spark last-bit float divergence can't change
  * the row cut.
  */
object TpcdsShapes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // q03 shape: date-dim ⋆ fact ⋆ item star, month filter on the date
    // dimension, attribute filter on the item, group by (year, brand).
    // Price sums run in DECIMAL (the measures are 2-decimal-quantized,
    // so decimal sums are EXACT and engine-identical — double sums
    // differ in the last ULP and flip round()/format boundaries, which
    // the sf0.1 gate replay caught on ds07). The FINAL projection casts
    // the decimal sum to DOUBLE (the n03_decimal_sum pattern): the
    // driver's hasher canonicalizes raw Spark decimal(28,2) vs DuckDB
    // DECIMAL(38,2) output differently, while an identical exact decimal
    // casts to an identical double on both engines. LIMIT 300 > the 7×25
    // max group count keeps the cut row-stable regardless of sort-key
    // ties.
    Qdef(
      "ds01_brand_by_year",
      """SELECT year(o_orderdate) AS d_year, p_brand AS brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_agg
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 15 AND month(o_orderdate) = 11
        |GROUP BY year(o_orderdate), p_brand
        |ORDER BY d_year ASC, sum_agg DESC, brand ASC
        |LIMIT 300""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(month(col("o_orderdate")) === 11)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "part").filter(col("p_size") === 15),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("o_orderdate")).as("d_year"), col("p_brand").as("brand"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_agg"))
        .orderBy(col("d_year").asc, col("sum_agg").desc, col("brand").asc)
        .limit(300)
    },

    // q07 shape: star join with two "demographics" predicates (market
    // segment + order priority stand in for cd_gender/cd_marital_status)
    // and FOUR avg aggregates over the fact measures.
    Qdef(
      "ds02_item_averages",
      """SELECT p_brand AS item_id,
        |  round(avg(l_quantity), 6) AS agg1,
        |  round(avg(l_extendedprice), 6) AS agg2,
        |  round(avg(l_discount), 6) AS agg3,
        |  round(avg(l_tax), 6) AS agg4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
        |  AND year(o_orderdate) = 1996
        |GROUP BY p_brand
        |ORDER BY item_id
        |LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(
          col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) === 1996),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("item_id"))
        .agg(
          round(avg("l_quantity"), 6).as("agg1"),
          round(avg("l_extendedprice"), 6).as("agg2"),
          round(avg("l_discount"), 6).as("agg3"),
          round(avg("l_tax"), 6).as("agg4"))
        .orderBy("item_id")
        .limit(100)
    },

    // q19 shape: 7-table star with a SUBSTRING INEQUALITY between two
    // dimension copies (customer nation prefix <> supplier nation prefix
    // stands in for ca_zip <> s_zip) — a residual predicate no join
    // implementation can use as a key.
    Qdef(
      "ds03_cross_nation_brand",
      """SELECT p_brand AS brand, p_type,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ext_price
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE month(o_orderdate) = 11 AND p_size BETWEEN 1 AND 15
        |  AND substring(cn.n_name, 8, 1) <> substring(sn.n_name, 8, 1)
        |GROUP BY p_brand, p_type
        |ORDER BY brand, p_type""".stripMargin) { (s, dir) =>
      val cn = t(s, dir, "nation")
        .select(col("n_nationkey").as("cnk"), col("n_name").as("c_nation"))
      val sn = t(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("s_nation"))
      t(s, dir, "orders").filter(month(col("o_orderdate")) === 11)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "part").filter(col("p_size").between(1, 15)),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cnk"))
        .join(broadcast(sn), col("s_nationkey") === col("snk"))
        .filter(substring(col("c_nation"), 8, 1) =!= substring(col("s_nation"), 8, 1))
        .groupBy(col("p_brand").as("brand"), col("p_type"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("ext_price"))
        .orderBy("brand", "p_type")
    },

    // q27 shape: ROLLUP over (item, state-analog) with GROUPING() in the
    // projection and four averages.
    Qdef(
      "ds04_rollup_grouping",
      """SELECT coalesce(p_brand, 'ALL') AS brand,
        |  coalesce(n_name, 'ALL') AS s_state,
        |  CAST(grouping(n_name) AS INT) AS g_state,
        |  round(avg(l_quantity), 6) AS agg1,
        |  round(avg(l_extendedprice), 6) AS agg2,
        |  round(avg(l_discount), 6) AS agg3,
        |  round(avg(l_tax), 6) AS agg4
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size < 10
        |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |GROUP BY ROLLUP (p_brand, n_name)
        |ORDER BY brand, s_state""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "part").filter(col("p_size") < 10),
          col("l_partkey") === col("p_partkey"))
        .rollup(col("p_brand"), col("n_name"))
        .agg(
          grouping(col("n_name")).cast("int").as("g_state"),
          round(avg("l_quantity"), 6).as("agg1"),
          round(avg("l_extendedprice"), 6).as("agg2"),
          round(avg("l_discount"), 6).as("agg3"),
          round(avg("l_tax"), 6).as("agg4"))
        .select(
          coalesce(col("p_brand"), lit("ALL")).as("brand"),
          coalesce(col("n_name"), lit("ALL")).as("s_state"),
          col("g_state"), col("agg1"), col("agg2"), col("agg3"), col("agg4"))
        .orderBy("brand", "s_state")
    },

    // q34 shape: derived-table count per ticket (order) with a BETWEEN
    // bound on the count, disjunctive month ranges on the date dimension,
    // then a join back to customer.
    Qdef(
      "ds05_lines_per_order_band",
      """SELECT c_name, o_orderkey, cnt
        |FROM (
        |  SELECT l_orderkey, count(*) AS cnt
        |  FROM lineitem
        |  GROUP BY l_orderkey) dn
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE cnt BETWEEN 6 AND 7
        |  AND (month(o_orderdate) BETWEEN 1 AND 3
        |    OR month(o_orderdate) BETWEEN 10 AND 12)
        |  AND o_orderpriority = '1-URGENT'
        |ORDER BY c_name, o_orderkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val dn = t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt").between(6, 7))
      dn.join(t(s, dir, "orders").filter(
          (month(col("o_orderdate")).between(1, 3) ||
            month(col("o_orderdate")).between(10, 12)) &&
            col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("cnt"))
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    },

    // q42 shape: date-dim ⋆ fact ⋆ item with a category grouping; no
    // LIMIT (the reference sorts by the float sum — canonical row compare
    // makes presentation order irrelevant without a cut).
    Qdef(
      "ds06_category_by_year",
      """SELECT year(o_orderdate) AS d_year, p_type,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#12' AND month(o_orderdate) = 11
        |GROUP BY year(o_orderdate), p_type""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(month(col("o_orderdate")) === 11)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "part").filter(col("p_brand") === "Brand#12"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("o_orderdate")).as("d_year"), col("p_type"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
    },

    // q46 shape: derived per-(order, supplier-nation) aggregation joined
    // back through customer to the nation dimension A SECOND TIME, with
    // an inequality between the two dimension copies (home nation <>
    // nation bought from).
    Qdef(
      "ds07_cross_nation_orders",
      """WITH dn AS (
        |  SELECT l_orderkey, s_nationkey AS bought_nk,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS amt,
        |    sum(CAST(l_extendedprice * l_tax AS DECIMAL(18,4))) AS tax_amt
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY l_orderkey, s_nationkey)
        |SELECT c_name, home.n_name AS home_nation,
        |  bought.n_name AS bought_nation, l_orderkey AS orderkey,
        |  CAST(amt AS DOUBLE) AS amt, CAST(tax_amt AS DOUBLE) AS tax_amt
        |FROM dn
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation home ON c_nationkey = home.n_nationkey
        |JOIN nation bought ON bought_nk = bought.n_nationkey
        |WHERE home.n_name <> bought.n_name AND o_totalprice > 400000
        |ORDER BY c_name, orderkey, bought_nation
        |LIMIT 100""".stripMargin) { (s, dir) =>
      // The oracle keeps the reference's WITH-first spelling; OUR plan
      // joins the SELECTIVE orders filter into the derived table BEFORE
      // the aggregation (identical result — o_orderkey is unique and the
      // filter is per-order), so at 100 TB the groupBy aggregates the
      // surviving sliver of lineitem, not the whole fact table.
      val keep = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_custkey"))
      val dn = t(s, dir, "lineitem")
        .join(keep, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"), col("o_custkey"),
          col("s_nationkey").as("bought_nk"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).as("amt"),
          sum((col("l_extendedprice") * col("l_tax"))
            .cast("decimal(18,4)")).as("tax_amt"))
      val home = t(s, dir, "nation")
        .select(col("n_nationkey").as("hnk"), col("n_name").as("home_nation"))
      val bought = t(s, dir, "nation")
        .select(col("n_nationkey").as("bnk"), col("n_name").as("bought_nation"))
      dn.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(home), col("c_nationkey") === col("hnk"))
        .join(broadcast(bought), col("bought_nk") === col("bnk"))
        .filter(col("home_nation") =!= col("bought_nation"))
        .select(col("c_name"), col("home_nation"), col("bought_nation"),
          col("l_orderkey").as("orderkey"),
          col("amt").cast("double").as("amt"),
          col("tax_amt").cast("double").as("tax_amt"))
        .orderBy("c_name", "orderkey", "bought_nation")
        .limit(100)
    },

    // q68 shape: the q46 family with a day-of-month band instead of the
    // price threshold and different measures (extended price + tax sums),
    // demonstrating the same double-dimension join under a different
    // residual.
    Qdef(
      "ds08_early_month_orders",
      """WITH dn AS (
        |  SELECT l_orderkey, s_nationkey AS bought_nk,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS extended_price,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY l_orderkey, s_nationkey)
        |SELECT c_name, home.n_name AS home_nation,
        |  bought.n_name AS bought_nation, l_orderkey AS orderkey,
        |  CAST(extended_price AS DOUBLE) AS extended_price,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM dn
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation home ON c_nationkey = home.n_nationkey
        |JOIN nation bought ON bought_nk = bought.n_nationkey
        |WHERE home.n_name <> bought.n_name
        |  AND day(o_orderdate) BETWEEN 1 AND 2
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY c_name, orderkey, bought_nation
        |LIMIT 100""".stripMargin) { (s, dir) =>
      // same filter-before-aggregate restructuring as ds07
      val keep = t(s, dir, "orders").filter(
          dayofmonth(col("o_orderdate")).between(1, 2) &&
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_custkey"))
      val dn = t(s, dir, "lineitem")
        .join(keep, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"), col("o_custkey"),
          col("s_nationkey").as("bought_nk"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("extended_price"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("total_qty"))
      val home = t(s, dir, "nation")
        .select(col("n_nationkey").as("hnk"), col("n_name").as("home_nation"))
      val bought = t(s, dir, "nation")
        .select(col("n_nationkey").as("bnk"), col("n_name").as("bought_nation"))
      dn.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(home), col("c_nationkey") === col("hnk"))
        .join(broadcast(bought), col("bought_nk") === col("bnk"))
        .filter(col("home_nation") =!= col("bought_nation"))
        .select(col("c_name"), col("home_nation"), col("bought_nation"),
          col("l_orderkey").as("orderkey"),
          col("extended_price").cast("double").as("extended_price"),
          col("total_qty").cast("double").as("total_qty"))
        .orderBy("c_name", "orderkey", "bought_nation")
        .limit(100)
    },

    // q51 shape: two per-day series FULL OUTER JOINed on the date, then
    // cumulative windows over the joined frame and a comparison between
    // the two running sums. The unpartitioned window is bounded by DAYS
    // (365 rows/year after the pre-aggregation), never by data size —
    // the daily rollup shuffles on the date key first, so at 100 TB the
    // window input is still one year of rows.
    Qdef(
      "ds09_cumulative_channels",
      """WITH u AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1996
        |  GROUP BY CAST(o_orderdate AS DATE)),
        |l AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  WHERE o_orderpriority = '5-LOW' AND year(o_orderdate) = 1996
        |  GROUP BY CAST(o_orderdate AS DATE)),
        |j AS (
        |  SELECT coalesce(u.d, l.d) AS d, u.rev AS urev, l.rev AS lrev
        |  FROM u FULL OUTER JOIN l ON u.d = l.d),
        |c AS (
        |  SELECT d,
        |    sum(coalesce(urev, 0)) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_urgent,
        |    sum(coalesce(lrev, 0)) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_low
        |  FROM j)
        |SELECT d, CAST(cum_urgent AS DOUBLE) AS cum_urgent,
        |  CAST(cum_low AS DOUBLE) AS cum_low
        |FROM c
        |WHERE cum_urgent > cum_low
        |ORDER BY d""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      def daily(prio: String, out: String): DataFrame =
        t(s, dir, "orders")
          .filter(col("o_orderpriority") === prio &&
            year(col("o_orderdate")) === 1996)
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as(out))
      val u = daily("1-URGENT", "urev")
      val l = daily("5-LOW", "lrev").withColumnRenamed("d", "ld")
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.join(l, col("d") === col("ld"), "full_outer")
        .select(coalesce(col("d"), col("ld")).as("d"),
          col("urev"), col("lrev"))
        .withColumn("cum_urgent", sum(coalesce(col("urev"), lit(0))).over(w))
        .withColumn("cum_low", sum(coalesce(col("lrev"), lit(0))).over(w))
        .filter(col("cum_urgent") > col("cum_low"))
        .select(col("d"),
          col("cum_urgent").cast("double").as("cum_urgent"),
          col("cum_low").cast("double").as("cum_low"))
        .orderBy("d")
    },

    // q88 shape: a row of independent scalar aggregates (quantity-band
    // counts) comma-joined into one result. The ORACLE keeps the
    // reference's N-subquery spelling (N scans); OUR plan computes all
    // bands in ONE pass with conditional aggregation — at 100 TB that is
    // one fact scan instead of six, the exact scan-sharing rewrite the
    // reference's optimizer performs via CTE reuse. PlanSpec pins the
    // single-scan shape.
    Qdef(
      "ds10_band_counts",
      """SELECT a.h1, b.h2, c.h3, d.h4, e.h5, f.h6 FROM
        |  (SELECT count(*) AS h1 FROM lineitem WHERE l_quantity BETWEEN 1 AND 8) a,
        |  (SELECT count(*) AS h2 FROM lineitem WHERE l_quantity BETWEEN 9 AND 16) b,
        |  (SELECT count(*) AS h3 FROM lineitem WHERE l_quantity BETWEEN 17 AND 24) c,
        |  (SELECT count(*) AS h4 FROM lineitem WHERE l_quantity BETWEEN 25 AND 32) d,
        |  (SELECT count(*) AS h5 FROM lineitem WHERE l_quantity BETWEEN 33 AND 40) e,
        |  (SELECT count(*) AS h6 FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) f""".stripMargin) { (s, dir) =>
      def band(lo: Int, hi: Int, out: String) =
        count(when(col("l_quantity").between(lo, hi), 1)).as(out)
      t(s, dir, "lineitem").agg(
        band(1, 8, "h1"), band(9, 16, "h2"), band(17, 24, "h3"),
        band(25, 32, "h4"), band(33, 40, "h5"), band(41, 50, "h6"))
    },

    // q11/q4 shape: a per-(customer, year) CTE referenced TWICE and
    // self-joined to find customers whose next-year spend outgrew a
    // ratio threshold — the canonical CTE-reuse composition. Our plan
    // expands the CTE per branch, which lets each branch push ITS year
    // filter into the orders scan (yr = 1996 and yr = 1997 become two
    // pruned scans) instead of materializing the two-year aggregate and
    // filtering after — at 100 TB each branch reads only its year.
    Qdef(
      "ds11_year_over_year",
      """WITH yearly AS (
        |  SELECT o_custkey, year(o_orderdate) AS yr,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders
        |  WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY o_custkey, year(o_orderdate))
        |SELECT c_name, CAST(y1.total AS DOUBLE) AS total_prev,
        |  CAST(y2.total AS DOUBLE) AS total_next
        |FROM yearly y1
        |JOIN yearly y2 ON y1.o_custkey = y2.o_custkey
        |JOIN customer ON y1.o_custkey = c_custkey
        |WHERE y1.yr = 1996 AND y2.yr = 1997
        |  AND CAST(y2.total AS DECIMAL(18,2)) * 2
        |    > CAST(y1.total AS DECIMAL(18,2)) * 3
        |ORDER BY c_name
        |LIMIT 100""".stripMargin) { (s, dir) =>
      // year(col) = yr is opaque to parquet row-group pruning; the
      // equivalent half-open range on the raw column reaches the scan
      // as a pushed filter (PlanSpec asserts it)
      def yearly(yr: Int, out: String): DataFrame =
        t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp_ntz"))
          .groupBy(col("o_custkey").as(s"ck_$out"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as(out))
      // the ratio test runs in integer-multiplied DECIMAL on both engines
      // (next*2 > prev*3 ⇔ next > prev*1.5, exact) — a double comparison
      // can flip a customer sitting within one ULP of the threshold.
      // Both factors are cast down to DECIMAL(18,2) first so the product
      // stays inside 38 digits on both engines (DuckDB's sum yields
      // DECIMAL(38,2), which no multiplication survives).
      yearly(1996, "total_prev")
        .join(yearly(1997, "total_next"),
          col("ck_total_prev") === col("ck_total_next"))
        .filter(col("total_next").cast("decimal(18,2)") * 2 >
          col("total_prev").cast("decimal(18,2)") * 3)
        .join(t(s, dir, "customer"),
          col("ck_total_prev") === col("c_custkey"))
        .select(col("c_name"),
          col("total_prev").cast("double").as("total_prev"),
          col("total_next").cast("double").as("total_next"))
        .orderBy("c_name")
        .limit(100)
    },

    // q23 flavor: a HAVING threshold drawn from an uncorrelated scalar
    // subquery over the same fact table (best-customer selection). The
    // one-row totals frame broadcasts; the per-customer aggregate is
    // filtered against it post-agg — the threshold never forces a second
    // data-sized pass. The threshold test `spend > 5 * avg(all)` is
    // rewritten `spend * n > 5 * total` so BOTH engines compare in exact
    // decimal arithmetic (a double avg differs by summation order and can
    // flip a customer within one ULP of the boundary); factors are cast
    // down so the products stay inside 38 digits on both engines.
    Qdef(
      "ds12_having_scalar_subquery",
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders
        |GROUP BY o_custkey
        |HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |    * CAST((SELECT count(*) FROM orders) AS DECIMAL(12,0))
        |  > 5 * CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        |    AS DECIMAL(20,2))
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val totals = t(s, dir, "orders")
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(20,2)").as("tot_spend"),
          count(lit(1)).cast("decimal(12,0)").as("n_all"))
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("spend_dec"))
        .join(broadcast(totals))
        .filter(col("spend_dec").cast("decimal(18,2)") * col("n_all") >
          lit(5) * col("tot_spend"))
        .select(col("o_custkey"), col("n_orders"),
          col("spend_dec").cast("double").as("spend"))
        .orderBy("o_custkey")
    },

    // q14_1 shape: a three-channel INTERSECT defines the qualifying
    // dimension-attribute set ("items sold in every channel"), which then
    // restricts a fact aggregation. Channels here are month/returnflag
    // slices; the intersect key is the (brand, type) pair, mirroring
    // q14's (brand_id, class_id, category_id) triple. INTERSECT lowers to
    // distinct + semi joins on the bounded attribute-pair domain (≤ a few
    // thousand pairs regardless of fact size), and the resulting pair set
    // is explicitly broadcast into the main star — at 100 TB the three
    // channel scans shuffle only deduped pairs, never fact rows, and the
    // final join adds no exchange.
    Qdef(
      "ds13_cross_channel_brands",
      """WITH cross_pairs AS (
        |  SELECT p_brand AS brand, p_type AS ptype
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE month(o_orderdate) = 1 AND l_quantity < 10
        |  INTERSECT
        |  SELECT p_brand, p_type
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE month(o_orderdate) = 2 AND l_quantity < 10
        |  INTERSECT
        |  SELECT p_brand, p_type
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_returnflag = 'R' AND l_quantity < 5)
        |SELECT year(o_orderdate) AS yr, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN cross_pairs ON p_brand = brand AND p_type = ptype
        |GROUP BY year(o_orderdate)
        |ORDER BY yr""".stripMargin) { (s, dir) =>
      def channel(f: DataFrame => DataFrame, joinOrders: Boolean): DataFrame = {
        val base =
          if (joinOrders)
            t(s, dir, "lineitem")
              .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          else t(s, dir, "lineitem")
        f(base).join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"), col("p_type").as("ptype"))
      }
      val pairs = channel(
          _.filter(month(col("o_orderdate")) === 1 && col("l_quantity") < 10),
          joinOrders = true)
        .intersect(channel(
          _.filter(month(col("o_orderdate")) === 2 && col("l_quantity") < 10),
          joinOrders = true))
        .intersect(channel(
          _.filter(col("l_returnflag") === "R" && col("l_quantity") < 5),
          joinOrders = false))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(broadcast(pairs),
          col("p_brand") === col("brand") &&
            col("p_type") === col("ptype"))
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy("yr")
    },

    // q67 shape: ROLLUP over the item hierarchy, then rank() PARTITIONed
    // by the top level ORDER BY the rolled-up sum, keeping the top-k per
    // partition — subtotal rows (NULL brand) rank alongside detail rows
    // exactly as q67's rollup output does. The rank's sort key stays
    // DECIMAL (exact, engine-identical — a double sort key could swap
    // two brands within a ULP and change the rank cut); only the FINAL
    // projection casts to DOUBLE. The window input is the rolled-up
    // aggregate (bounded by the attribute domain), never fact-sized.
    Qdef(
      "ds14_rollup_topk_per_type",
      """WITH base AS (
        |  SELECT p_type, p_brand,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sumsales
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 6
        |  GROUP BY ROLLUP (p_type, p_brand))
        |SELECT p_type, p_brand, CAST(sumsales AS DOUBLE) AS sumsales, rk
        |FROM (
        |  SELECT p_type, p_brand, sumsales,
        |    rank() OVER (PARTITION BY p_type ORDER BY sumsales DESC) AS rk
        |  FROM base) ranked
        |WHERE rk <= 5
        |ORDER BY p_type, p_brand""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(
          year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) <= 6),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .rollup(col("p_type"), col("p_brand"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("sumsales"))
      val w = Window.partitionBy("p_type").orderBy(col("sumsales").desc)
      base.withColumn("rk", rank().over(w))
        .filter(col("rk") <= 5)
        .select(col("p_type"), col("p_brand"),
          col("sumsales").cast("double").as("sumsales"), col("rk"))
        .orderBy("p_type", "p_brand")
    },

    // q10/q35 shape: demographic group counts over customers qualified by
    // one mandatory EXISTS channel AND a disjunction of two more EXISTS
    // channels. The disjunction of correlated EXISTS is algebraically a
    // semi join against the UNION of the two channels' key sets — the
    // plan is two LeftSemi hash joins on c_custkey (the mandatory channel
    // and the union), no per-row subquery execution and no fact-side
    // fan-out; the returned-lineitem channel projects only its custkeys
    // before the union.
    Qdef(
      "ds15_exists_channel_union",
      """SELECT c_mktsegment, n_name, count(*) AS cnt
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND year(o_orderdate) = 1996)
        |  AND (EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |  OR EXISTS (
        |    SELECT 1 FROM orders
        |    JOIN lineitem ON l_orderkey = o_orderkey
        |    WHERE o_custkey = c_custkey AND l_returnflag = 'R'))
        |GROUP BY c_mktsegment, n_name
        |ORDER BY c_mktsegment, n_name""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val in1996 = orders
        .filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      val urgent = orders
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val returned = orders
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
            .select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select("o_custkey")
      t(s, dir, "customer")
        .join(in1996, col("c_custkey") === col("o_custkey"), "left_semi")
        .join(urgent.union(returned),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment", "n_name")
    },

    // q14_2 flavor: a WITH … INTERSECT CTE consumed by TWO union
    // branches ("parts active in both years", then per-year stats over
    // exactly that set). Our plan expands the CTE per branch — the two
    // intersect subplans are IDENTICAL, so Spark's ReuseExchange/AQE
    // stage reuse materializes the underlying shuffles once; each branch
    // meanwhile pushes ITS year range into its own orders scan (the
    // ds11 pattern). The semi join keeps the fact rows on their existing
    // partitioning — no new exchange on the probe side.
    Qdef(
      "ds16_intersect_cte_reuse",
      """WITH active_parts AS (
        |  SELECT l_partkey AS pk
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996
        |  INTERSECT
        |  SELECT l_partkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1997)
        |SELECT 'y1996' AS channel, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN active_parts ON l_partkey = pk
        |WHERE year(o_orderdate) = 1996
        |UNION ALL
        |SELECT 'y1997' AS channel, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN active_parts ON l_partkey = pk
        |WHERE year(o_orderdate) = 1997
        |ORDER BY channel""".stripMargin) { (s, dir) =>
      def yearLines(yr: Int): DataFrame =
        t(s, dir, "lineitem").join(
          t(s, dir, "orders").filter(
            col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp_ntz")),
          col("l_orderkey") === col("o_orderkey"))
      val active = yearLines(1996).select("l_partkey")
        .intersect(yearLines(1997).select("l_partkey"))
      def branch(yr: Int, tag: String): DataFrame =
        yearLines(yr)
          .join(active.withColumnRenamed("l_partkey", "pk"),
            col("l_partkey") === col("pk"), "left_semi")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("revenue"))
          .select(lit(tag).as("channel"), col("n_lines"), col("revenue"))
      branch(1996, "y1996").union(branch(1997, "y1997")).orderBy("channel")
    },

    // q97 shape: two channel key-sets FULL OUTER joined to count the
    // overlap (customers active in both months / only one). Each channel
    // pre-aggregates to distinct keys BEFORE the join — the full-outer
    // join sees two deduped key columns, never fact rows, and the
    // conditional counts collapse to a single row map-side.
    Qdef(
      "ds17_channel_overlap",
      """WITH a AS (
        |  SELECT o_custkey AS ck FROM orders
        |  WHERE month(o_orderdate) = 1 GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey AS ck FROM orders
        |  WHERE month(o_orderdate) = 2 GROUP BY o_custkey)
        |SELECT
        |  CAST(count(*) FILTER (WHERE a.ck IS NOT NULL AND b.ck IS NOT NULL)
        |    AS BIGINT) AS both_ch,
        |  CAST(count(*) FILTER (WHERE a.ck IS NOT NULL AND b.ck IS NULL)
        |    AS BIGINT) AS only_first,
        |  CAST(count(*) FILTER (WHERE a.ck IS NULL AND b.ck IS NOT NULL)
        |    AS BIGINT) AS only_second
        |FROM a FULL OUTER JOIN b ON a.ck = b.ck""".stripMargin) { (s, dir) =>
      def channel(m: Int, out: String): DataFrame =
        t(s, dir, "orders").filter(month(col("o_orderdate")) === m)
          .select(col("o_custkey").as(out)).distinct()
      channel(1, "a_ck").join(channel(2, "b_ck"),
          col("a_ck") === col("b_ck"), "full_outer")
        .agg(
          count(when(col("a_ck").isNotNull && col("b_ck").isNotNull, 1))
            .as("both_ch"),
          count(when(col("a_ck").isNotNull && col("b_ck").isNull, 1))
            .as("only_first"),
          count(when(col("a_ck").isNull && col("b_ck").isNotNull, 1))
            .as("only_second"))
    },

    // q78 flavor: facts in one channel with NO activity in another —
    // parts sold urgent but never low-priority. The excluded key set is
    // deduped before a LeftAnti hash join on l_partkey (l_partkey is
    // non-null, so NOT IN needs no null-aware fallback); the anti join
    // runs on the already-filtered urgent sliver.
    Qdef(
      "ds18_anti_channel_parts",
      """WITH low_parts AS (
        |  SELECT DISTINCT l_partkey AS lp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority = '5-LOW')
        |SELECT p_brand, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE o_orderpriority = '1-URGENT'
        |  AND l_partkey NOT IN (SELECT lp FROM low_parts)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val lowParts = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "5-LOW"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("lp")).distinct()
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .join(lowParts, col("l_partkey") === col("lp"), "left_anti")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy("p_brand")
    },

    // q47/q57 shape: a monthly time series per (brand, year) with BOTH
    // window families q47 uses — the unordered per-partition aggregate
    // (yearly sum + month count, standing in for avg_monthly_sales) and
    // the ordered lag/lead neighbors — computed over the FULL series
    // first, deviation filter applied after (q47 filters on the windowed
    // values, so the windows must not see a pre-filtered series). The
    // deviation test |rev - avg| > 0.2*avg is cross-multiplied into
    // decimal×integer arithmetic (10*|rev*n - ysum| > 2*ysum) so both
    // engines evaluate it EXACTLY; lag/lead values stay decimal until
    // the final projection casts to DOUBLE. The window input is the
    // monthly pre-aggregate (bounded by brand×12), never fact-sized.
    Qdef(
      "ds19_monthly_deviation",
      """WITH monthly AS (
        |  SELECT p_brand AS brand, year(o_orderdate) AS yr,
        |    month(o_orderdate) AS mo,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 10
        |  GROUP BY p_brand, year(o_orderdate), month(o_orderdate)),
        |win AS (
        |  SELECT brand, yr, mo, rev,
        |    sum(rev) OVER (PARTITION BY brand, yr) AS ysum,
        |    count(*) OVER (PARTITION BY brand, yr) AS nmo,
        |    lag(rev) OVER (PARTITION BY brand, yr ORDER BY mo) AS prev_rev,
        |    lead(rev) OVER (PARTITION BY brand, yr ORDER BY mo) AS next_rev
        |  FROM monthly)
        |SELECT brand, yr, mo, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(prev_rev AS DOUBLE) AS prev_rev,
        |  CAST(next_rev AS DOUBLE) AS next_rev
        |FROM win
        |WHERE 10 * abs(rev * nmo - ysum) > 2 * ysum
        |ORDER BY brand, yr, mo""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val monthly = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "part").filter(col("p_size") <= 10),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      val byYear = Window.partitionBy("brand", "yr")
      val byMonth = byYear.orderBy("mo")
      monthly
        .withColumn("ysum", sum(col("rev")).over(byYear))
        .withColumn("nmo", count(lit(1)).over(byYear))
        .withColumn("prev_rev", lag(col("rev"), 1).over(byMonth))
        .withColumn("next_rev", lead(col("rev"), 1).over(byMonth))
        .filter(lit(10) * abs(col("rev") * col("nmo") - col("ysum")) >
          lit(2) * col("ysum"))
        .select(col("brand"), col("yr"), col("mo"),
          col("rev").cast("double").as("revenue"),
          col("prev_rev").cast("double").as("prev_rev"),
          col("next_rev").cast("double").as("next_rev"))
        .orderBy("brand", "yr", "mo")
    },

    // q78 shape proper (ds18 covers only its anti-join corner): the same
    // fact aggregated per (item, year) in two channels, FULL OUTER
    // joined on the group key with COALESCE-to-zero on both sides, a
    // cross-channel dominance filter, and the channel ratio in the
    // output. Sums are exact decimals; the ratio divides the two
    // decimal-derived doubles (IEEE division of identical inputs is
    // correctly rounded, so the ratio is bit-identical on both engines);
    // the sort key is the group key, never the float. At scale the two
    // channel aggregates shuffle once each on (pk, yr) and the full
    // join reuses that partitioning — no extra exchange.
    Qdef(
      "ds20_channel_ratio_fulljoin",
      """WITH f AS (
        |  SELECT l_partkey AS pk, year(l_shipdate) AS yr,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem WHERE l_linestatus = 'F'
        |  GROUP BY l_partkey, year(l_shipdate)),
        |o AS (
        |  SELECT l_partkey AS pk, year(l_shipdate) AS yr,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem WHERE l_linestatus = 'O'
        |  GROUP BY l_partkey, year(l_shipdate))
        |SELECT COALESCE(f.pk, o.pk) AS pk, COALESCE(f.yr, o.yr) AS yr,
        |  CAST(COALESCE(f.qty, 0) AS DOUBLE) AS f_qty,
        |  CAST(COALESCE(o.qty, 0) AS DOUBLE) AS o_qty,
        |  CAST(COALESCE(f.rev, 0) AS DOUBLE) AS f_rev,
        |  CAST(COALESCE(o.rev, 0) AS DOUBLE) AS o_rev,
        |  CAST(COALESCE(f.qty, 0) AS DOUBLE)
        |    / nullif(CAST(COALESCE(o.qty, 0) AS DOUBLE), 0) AS qty_ratio
        |FROM f FULL OUTER JOIN o ON f.pk = o.pk AND f.yr = o.yr
        |WHERE COALESCE(f.qty, 0) > COALESCE(o.qty, 0)
        |ORDER BY pk, yr""".stripMargin) { (s, dir) =>
      def channel(status: String): DataFrame = t(s, dir, "lineitem")
        .filter(col("l_linestatus") === status)
        .groupBy(col("l_partkey").as("pk"), year(col("l_shipdate")).as("yr"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      val f = channel("F").as("f")
      val o = channel("O").as("o")
      val zq = lit(0).cast("decimal(12,2)")
      f.join(o, col("f.pk") === col("o.pk") && col("f.yr") === col("o.yr"),
          "full_outer")
        .filter(coalesce(col("f.qty"), zq) > coalesce(col("o.qty"), zq))
        .select(
          coalesce(col("f.pk"), col("o.pk")).as("pk"),
          coalesce(col("f.yr"), col("o.yr")).as("yr"),
          coalesce(col("f.qty"), lit(0)).cast("double").as("f_qty"),
          coalesce(col("o.qty"), lit(0)).cast("double").as("o_qty"),
          coalesce(col("f.rev"), lit(0)).cast("double").as("f_rev"),
          coalesce(col("o.rev"), lit(0)).cast("double").as("o_rev"),
          (coalesce(col("f.qty"), lit(0)).cast("double") /
            nullif(coalesce(col("o.qty"), lit(0)).cast("double"), lit(0.0)))
            .as("qty_ratio"))
        .orderBy("pk", "yr")
    },

    // q49 shape: per-part return ratios ranked by TWO different metrics
    // (quantity ratio and amount ratio) inside each channel, keeping
    // rows in the top-k of EITHER ranking, channels tagged and
    // UNION ALLed. Both ratios divide exact-decimal-derived doubles
    // (bit-identical across engines) and every rank ORDER BY carries
    // pk as the deterministic tiebreak. The rank input is the per-part
    // aggregate, already reduced from the fact scan; the two channel
    // branches reuse the same shape q49 uses for store/catalog/web.
    Qdef(
      "ds21_dual_rank_returns",
      """WITH ch AS (
        |  SELECT l_linestatus AS channel, l_partkey AS pk,
        |    sum(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(l_quantity AS DECIMAL(12,2))
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_qty,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS tot_qty,
        |    sum(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_amt,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS tot_amt
        |  FROM lineitem
        |  GROUP BY l_linestatus, l_partkey
        |  HAVING count(*) >= 3),
        |ranked AS (
        |  SELECT channel, pk,
        |    CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) AS qty_ratio,
        |    CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE) AS amt_ratio,
        |    rank() OVER (PARTITION BY channel ORDER BY
        |      CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) DESC, pk)
        |      AS qty_rank,
        |    rank() OVER (PARTITION BY channel ORDER BY
        |      CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE) DESC, pk)
        |      AS amt_rank
        |  FROM ch)
        |SELECT channel, pk, qty_ratio, amt_ratio,
        |  CAST(qty_rank AS INTEGER) AS qty_rank,
        |  CAST(amt_rank AS INTEGER) AS amt_rank
        |FROM ranked
        |WHERE qty_rank <= 10 OR amt_rank <= 10
        |ORDER BY channel, pk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val zq = lit(0).cast("decimal(12,2)")
      val za = lit(0).cast("decimal(18,2)")
      val ch = t(s, dir, "lineitem")
        .groupBy(col("l_linestatus").as("channel"), col("l_partkey").as("pk"))
        .agg(
          sum(when(col("l_returnflag") === "R",
            col("l_quantity").cast("decimal(12,2)")).otherwise(zq))
            .as("ret_qty"),
          sum(col("l_quantity").cast("decimal(12,2)")).as("tot_qty"),
          sum(when(col("l_returnflag") === "R",
            col("l_extendedprice").cast("decimal(18,2)")).otherwise(za))
            .as("ret_amt"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("tot_amt"),
          count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .withColumn("qty_ratio",
          col("ret_qty").cast("double") / col("tot_qty").cast("double"))
        .withColumn("amt_ratio",
          col("ret_amt").cast("double") / col("tot_amt").cast("double"))
      val byQty = Window.partitionBy("channel")
        .orderBy(col("qty_ratio").desc, col("pk"))
      val byAmt = Window.partitionBy("channel")
        .orderBy(col("amt_ratio").desc, col("pk"))
      ch.withColumn("qty_rank", rank().over(byQty))
        .withColumn("amt_rank", rank().over(byAmt))
        .filter(col("qty_rank") <= 10 || col("amt_rank") <= 10)
        .select(col("channel"), col("pk"), col("qty_ratio"), col("amt_ratio"),
          col("qty_rank").cast("int").as("qty_rank"),
          col("amt_rank").cast("int").as("amt_rank"))
        .orderBy("channel", "pk")
    },

    // q31 shape: quarter-over-quarter growth compared ACROSS channels —
    // two per-(nation, quarter) channel aggregates, each CTE consumed
    // twice (four join inputs total), keeping nations where the second
    // channel grew faster: w2/w1 > s2/s1, cross-multiplied into
    // exact decimal products (w2*s1 > s2*w1) so no engine ever divides.
    // This is the corpus's only 4-way CTE-reuse join; each channel
    // aggregate is bounded by nation×quarter (≤ 100 rows), so all four
    // instances broadcast into a no-exchange join tree at any scale.
    Qdef(
      "ds22_quarter_growth",
      """WITH f AS (
        |  SELECT n_name AS nation, quarter(o_orderdate) AS qtr,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE year(o_orderdate) = 1995 AND l_linestatus = 'F'
        |  GROUP BY n_name, quarter(o_orderdate)),
        |o AS (
        |  SELECT n_name AS nation, quarter(o_orderdate) AS qtr,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE year(o_orderdate) = 1995 AND l_linestatus = 'O'
        |  GROUP BY n_name, quarter(o_orderdate))
        |SELECT s1.nation AS nation,
        |  CAST(s1.rev AS DOUBLE) AS f_q1, CAST(s2.rev AS DOUBLE) AS f_q2,
        |  CAST(w1.rev AS DOUBLE) AS o_q1, CAST(w2.rev AS DOUBLE) AS o_q2
        |FROM f s1
        |JOIN f s2 ON s1.nation = s2.nation
        |JOIN o w1 ON w1.nation = s1.nation
        |JOIN o w2 ON w2.nation = s1.nation
        |WHERE s1.qtr = 1 AND s2.qtr = 2 AND w1.qtr = 1 AND w2.qtr = 2
        |  AND w2.rev * s1.rev > s2.rev * w1.rev
        |ORDER BY s1.nation""".stripMargin) { (s, dir) =>
      def channel(status: String): DataFrame = t(s, dir, "lineitem")
        .filter(col("l_linestatus") === status)
        .join(t(s, dir, "orders")
            .filter(year(col("o_orderdate")) === 1995),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      val fch = channel("F")
      val och = channel("O")
      def slice(c: DataFrame, q: Int, out: String): DataFrame =
        c.filter(col("qtr") === q).select(col("nation"), col("rev").as(out))
      slice(fch, 1, "f1").join(broadcast(slice(fch, 2, "f2")), "nation")
        .join(broadcast(slice(och, 1, "o1")), "nation")
        .join(broadcast(slice(och, 2, "o2")), "nation")
        .filter(col("o2") * col("f1") > col("f2") * col("o1"))
        .select(col("nation"),
          col("f1").cast("double").as("f_q1"),
          col("f2").cast("double").as("f_q2"),
          col("o1").cast("double").as("o_q1"),
          col("o2").cast("double").as("o_q2"))
        .orderBy("nation")
    },

    // q76 shape: three tagged channel scans UNION ALLed into ONE
    // aggregation — the "count everything that fell through, per
    // channel" report. Each branch carries its own pushed filter; the
    // aggregate's partial phase runs ABOVE the union but still map-side
    // (one combined shuffle for all three branches, not three). The
    // three predicates partition lineitem exactly, so total counts are
    // also pinned by any one branch's complement.
    Qdef(
      "ds23_union_channel_report",
      """SELECT channel, yr, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT 'returned' AS channel, year(l_shipdate) AS yr, l_extendedprice
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT 'open', year(l_shipdate), l_extendedprice
        |  FROM lineitem WHERE l_returnflag <> 'R' AND l_linestatus = 'O'
        |  UNION ALL
        |  SELECT 'closed', year(l_shipdate), l_extendedprice
        |  FROM lineitem WHERE l_returnflag <> 'R' AND l_linestatus = 'F') u
        |GROUP BY channel, yr
        |ORDER BY channel, yr""".stripMargin) { (s, dir) =>
      def branch(tag: String, f: org.apache.spark.sql.Column): DataFrame =
        t(s, dir, "lineitem").filter(f)
          .select(lit(tag).as("channel"), year(col("l_shipdate")).as("yr"),
            col("l_extendedprice"))
      branch("returned", col("l_returnflag") === "R")
        .unionAll(branch("open",
          col("l_returnflag") =!= "R" && col("l_linestatus") === "O"))
        .unionAll(branch("closed",
          col("l_returnflag") =!= "R" && col("l_linestatus") === "F"))
        .groupBy("channel", "yr")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy("channel", "yr")
    },

    // q64 shape: ONE star-aggregation CTE referenced TWICE and
    // self-joined across two "years" with a count residual between the
    // copies (cross_sales cs1 JOIN cross_sales cs2 ON item WHERE
    // cs2.cnt <= cs1.cnt). The DataFrame program builds the aggregate
    // ONCE and filters two copies above it; Catalyst pushes each year
    // filter THROUGH the aggregate (it is a group key) into that
    // branch's orders scan — better than the reference's q64 CTE
    // materialization when the filter is selective, because each branch
    // scans one year instead of aggregating all years once. PlanSpec
    // pins the pushdown reaching both scans.
    Qdef(
      "ds24_cross_sales_self_join",
      """WITH cross_sales AS (
        |  SELECT p_partkey AS item, p_brand AS brand,
        |    year(o_orderdate) AS syear, count(*) AS cnt,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_size <= 10
        |  GROUP BY p_partkey, p_brand, year(o_orderdate))
        |SELECT cs1.item AS item, cs1.brand AS brand,
        |  cs1.sales AS sales1, cs1.cnt AS cnt1,
        |  cs2.sales AS sales2, cs2.cnt AS cnt2
        |FROM cross_sales cs1
        |JOIN cross_sales cs2 ON cs1.item = cs2.item
        |WHERE cs1.syear = 1996 AND cs2.syear = 1997 AND cs2.cnt <= cs1.cnt
        |ORDER BY item, brand""".stripMargin) { (s, dir) =>
      val crossSales = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "part").filter(col("p_size") <= 10),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_partkey").as("item"), col("p_brand").as("brand"),
          year(col("o_orderdate")).as("syear"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sales"))
      val cs1 = crossSales.filter(col("syear") === 1996)
      val cs2 = crossSales.filter(col("syear") === 1997)
        .select(col("item").as("item2"), col("cnt").as("cnt2"),
          col("sales").as("sales2"))
      cs1.join(cs2,
          col("item") === col("item2") && col("cnt2") <= col("cnt"))
        .select(col("item"), col("brand"),
          col("sales").as("sales1"), col("cnt").as("cnt1"),
          col("sales2"), col("cnt2"))
        .orderBy("item", "brand")
    },

    // q72 shape: the widest benchto join — a fact row fans through six
    // INNER dimensions (two copies of the date dimension linked by a
    // week-equality residual ACROSS tables plus a date-interval
    // inequality) and two LEFT dimensions whose NULLs are counted in
    // CASE aggregates; a measure inequality between two tables
    // (inv_quantity_on_hand < cs_quantity → p_size < l_quantity) rides
    // as a residual the join cannot consume. Exercises join reorder
    // under mixed inner/outer edges — the reference calls this the
    // optimizer's hardest reorder case.
    Qdef(
      "ds25_wide_join_promo",
      """SELECT p_brand AS brand, n1.n_name AS nation,
        |  CAST(sum(CASE WHEN n2.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_promo,
        |  CAST(sum(CASE WHEN n2.n_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS promo,
        |  count(*) AS total_cnt
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |LEFT JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |LEFT JOIN (SELECT l_orderkey AS r_okey, l_linenumber AS r_line
        |           FROM lineitem WHERE l_returnflag = 'R') r
        |  ON r.r_okey = l_orderkey AND r.r_line = l_linenumber
        |WHERE weekofyear(l_shipdate) = weekofyear(o_orderdate)
        |  AND p_size < l_quantity
        |  AND l_shipdate > o_orderdate + INTERVAL 5 DAY
        |  AND o_orderpriority = '1-URGENT'
        |  AND year(o_orderdate) = 1997
        |GROUP BY p_brand, n1.n_name
        |ORDER BY total_cnt DESC, brand, nation
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val returns = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_okey"), col("l_linenumber").as("r_line"))
      val promoNations = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("n2_name"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(
            col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) === 1997),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(promoNations),
          col("n2_key") === col("c_nationkey") &&
            col("n2_name").isin("NATION_1", "NATION_2", "NATION_3"),
          "left")
        .join(returns,
          col("r_okey") === col("l_orderkey") && col("r_line") === col("l_linenumber"),
          "left")
        .filter(
          weekofyear(col("l_shipdate")) === weekofyear(col("o_orderdate")) &&
          col("p_size") < col("l_quantity") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 5 DAY"))
        .groupBy(col("p_brand").as("brand"), col("n_name").as("nation"))
        .agg(
          sum(when(col("n2_key").isNull, 1).otherwise(0)).as("no_promo"),
          sum(when(col("n2_key").isNotNull, 1).otherwise(0)).as("promo"),
          count(lit(1)).as("total_cnt"))
        .orderBy(col("total_cnt").desc, col("brand"), col("nation"))
        .limit(100)
    },

    // q93 shape: the returns-reconciliation anti-pattern — fact LEFT
    // JOIN returns on the composite line key, CASE over the nullable
    // return quantity, and then a WHERE on a RIGHT-side column that
    // silently makes the outer join inner. The planner must see through
    // it (Spark's EliminateOuterJoin; the reference's
    // PruneOuterJoinNullability family) — PlanSpec asserts no outer
    // join survives in the optimized plan.
    Qdef(
      "ds26_returns_reconciliation",
      """SELECT ss_customer,
        |  CAST(sum(CAST(act_sales AS DECIMAL(18,2))) AS DOUBLE) AS sumsales
        |FROM (
        |  SELECT o_custkey AS ss_customer, r.ret_reason,
        |    CASE WHEN r.ret_qty IS NOT NULL
        |         THEN (l_quantity - r.ret_qty) * l_extendedprice
        |         ELSE l_quantity * l_extendedprice END AS act_sales
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  LEFT JOIN (SELECT l_orderkey AS r_okey, l_linenumber AS r_line,
        |               floor(l_quantity / 2) AS ret_qty,
        |               l_linestatus AS ret_reason
        |             FROM lineitem WHERE l_returnflag = 'R') r
        |    ON r.r_okey = l_orderkey AND r.r_line = l_linenumber
        |) t
        |WHERE ret_reason = 'F'
        |GROUP BY ss_customer
        |ORDER BY sumsales ASC, ss_customer ASC
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val returns = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_okey"), col("l_linenumber").as("r_line"),
          floor(col("l_quantity") / 2).as("ret_qty"),
          col("l_linestatus").as("ret_reason"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(returns,
          col("r_okey") === col("l_orderkey") && col("r_line") === col("l_linenumber"),
          "left")
        .select(col("o_custkey").as("ss_customer"), col("ret_reason"),
          when(col("ret_qty").isNotNull,
            (col("l_quantity") - col("ret_qty")) * col("l_extendedprice"))
            .otherwise(col("l_quantity") * col("l_extendedprice")).as("act_sales"))
        .filter(col("ret_reason") === "F")
        .groupBy("ss_customer")
        .agg(sum(col("act_sales").cast("decimal(18,2)"))
          .cast("double").as("sumsales"))
        .orderBy(col("sumsales").asc, col("ss_customer").asc)
        .limit(100)
    },

    // q95 shape (reference: presto-benchto-benchmarks/.../tpcds/q95.sql):
    // an expensive self-joined CTE (ws_wh — orders shipped from more
    // than one warehouse; here: orders with lines from more than one
    // supplier) consumed by TWO IN-subqueries over the same fact scan —
    // directly and through a returns join. Both INs must lower to
    // LeftSemi hash joins (never a nested loop), and the repeated
    // multi_supp subplan is where exchange reuse pays: PlanSpec pins the
    // semi lowering and the reused exchange under the self-join.
    Qdef(
      "ds27_ship_semi_reuse",
      """WITH multi_supp AS (
        |  SELECT l1.l_orderkey AS okey
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        |)
        |SELECT count(DISTINCT l_orderkey) AS order_cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS total_net
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-02'
        |  AND o_orderpriority = '1-URGENT'
        |  AND l_orderkey IN (SELECT okey FROM multi_supp)
        |  AND l_orderkey IN (
        |    SELECT lr.l_orderkey
        |    FROM lineitem lr JOIN multi_supp ON lr.l_orderkey = multi_supp.okey
        |    WHERE lr.l_returnflag = 'R')""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val multiSupp = li.as("l1")
        .join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l2.l_suppkey"))
        .select(col("l1.l_orderkey").as("okey"))
      val returnedMulti = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rkey"))
        .join(multiSupp, col("rkey") === col("okey"))
        .select("rkey")
      li.join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate").between("1996-01-01", "1996-03-02") &&
          col("o_orderpriority") === "1-URGENT")
        .join(multiSupp, col("l_orderkey") === col("okey"), "left_semi")
        .join(returnedMulti, col("l_orderkey") === col("rkey"), "left_semi")
        .agg(
          countDistinct(col("l_orderkey")).as("order_cnt"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("total_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,2)")).cast("double").as("total_net"))
    },

    // q23 shape (reference: .../tpcds/q23_1.sql): a multi-CTE
    // max-over-aggregate threshold chain — frequent items (HAVING over a
    // star join), a scalar MAX over per-customer sales, a best-customers
    // aggregate thresholded against that scalar (HAVING … > 0.5 * (SELECT
    // max …)), and a final windowed fact scan semi-joined against BOTH
    // derived sets. Inner per-group sums are DECIMAL(18,2) so every
    // threshold comparison is exact and order-independent in both
    // engines. The scalar max lands as a 1-row broadcast; the two
    // membership tests lower to LeftSemi joins.
    Qdef(
      "ds28_threshold_chain",
      """WITH frequent_items AS (
        |  SELECT l_partkey AS item_sk
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE year(o_orderdate) IN (1993, 1994, 1995, 1996)
        |  GROUP BY l_partkey HAVING count(*) > 4
        |),
        |max_sales AS (
        |  SELECT max(csales) AS tpcds_cmax FROM (
        |    SELECT o_custkey,
        |      sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2))) AS csales
        |    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |    WHERE year(o_orderdate) IN (1993, 1994, 1995, 1996)
        |    GROUP BY o_custkey) x
        |),
        |best_customers AS (
        |  SELECT o_custkey AS c_sk
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY o_custkey
        |  HAVING sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2)))
        |    > 0.5 * (SELECT tpcds_cmax FROM max_sales)
        |)
        |SELECT CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) AS total_sales
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE year(o_orderdate) = 1997
        |  AND l_partkey IN (SELECT item_sk FROM frequent_items)
        |  AND o_custkey IN (SELECT c_sk FROM best_customers)""".stripMargin) { (s, dir) =>
      val lo = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      val sales = (col("l_quantity") * col("l_extendedprice"))
        .cast("decimal(18,2)")
      val window4y = lo.filter(year(col("o_orderdate")).isin(1993, 1994, 1995, 1996))
      val frequentItems = window4y.groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 4)
        .select(col("l_partkey").as("item_sk"))
      val maxSales = window4y.groupBy("o_custkey")
        .agg(sum(sales).as("csales"))
        .agg(max("csales").as("tpcds_cmax"))
      val bestCustomers = lo.groupBy("o_custkey")
        .agg(sum(sales).as("ssales"))
        .join(broadcast(maxSales))
        .filter(col("ssales") > col("tpcds_cmax") * 0.5)
        .select(col("o_custkey").as("c_sk"))
      lo.filter(year(col("o_orderdate")) === 1997)
        .join(frequentItems, col("l_partkey") === col("item_sk"), "left_semi")
        .join(bestCustomers, col("o_custkey") === col("c_sk"), "left_semi")
        .agg(sum(sales).cast("double").as("total_sales"))
    },

    // q11/q4 shape (reference: .../tpcds/q11.sql, q04.sql): ONE
    // year_total CTE — per-customer yearly totals per sales channel —
    // self-joined FOUR ways (two channels × two consecutive years) with
    // a cross-channel growth-ratio comparison. Channels here are kept
    // vs returned lineitem revenue; years 1994/1995 are spelled as DATE
    // ranges so each of the four branches pushes ITS year into ITS scan
    // (PlanSpec pins the per-branch pushdown — the optimizer must split
    // the shared CTE, not materialize it unfiltered). The reference
    // compares r2/r1 > c2/c1 through CASE-guarded division; positive
    // totals make that equivalent to the cross-multiplied
    // r2·c1 > c2·r1, which stays in EXACT decimal arithmetic — no
    // engine-dependent quotient rounding can flip a boundary row.
    Qdef(
      "ds29_yoy_growth",
      """WITH year_total AS (
        |  SELECT o_custkey AS cust, year(o_orderdate) AS yr,
        |    l_returnflag = 'R' AS returned,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS total
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderdate BETWEEN DATE '1994-01-01' AND DATE '1995-12-31'
        |  GROUP BY 1, 2, 3)
        |SELECT c1.cust AS cust,
        |  CAST(c1.total AS DOUBLE) AS kept_y1,
        |  CAST(c2.total AS DOUBLE) AS kept_y2,
        |  CAST(r1.total AS DOUBLE) AS ret_y1,
        |  CAST(r2.total AS DOUBLE) AS ret_y2
        |FROM year_total c1
        |JOIN year_total c2 ON c1.cust = c2.cust
        |JOIN year_total r1 ON c1.cust = r1.cust
        |JOIN year_total r2 ON c1.cust = r2.cust
        |WHERE NOT c1.returned AND c1.yr = 1994
        |  AND NOT c2.returned AND c2.yr = 1995
        |  AND r1.returned AND r1.yr = 1994
        |  AND r2.returned AND r2.yr = 1995
        |  AND c1.total > 0 AND r1.total > 0
        |  AND r2.total * c1.total > c2.total * r1.total
        |ORDER BY cust""".stripMargin) { (s, dir) =>
      def yearTotal(y1: String, y2: String, ret: Boolean, pre: String) =
        t(s, dir, "lineitem")
          .filter(if (ret) col("l_returnflag") === "R"
            else col("l_returnflag") =!= "R")
          .join(t(s, dir, "orders").filter(
            col("o_orderdate").between(y1, y2)),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as(s"${pre}_cust"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .as(s"${pre}_total"))
      val c1 = yearTotal("1994-01-01", "1994-12-31", ret = false, "c1")
      val c2 = yearTotal("1995-01-01", "1995-12-31", ret = false, "c2")
      val r1 = yearTotal("1994-01-01", "1994-12-31", ret = true, "r1")
      val r2 = yearTotal("1995-01-01", "1995-12-31", ret = true, "r2")
      c1.join(c2, col("c1_cust") === col("c2_cust"))
        .join(r1, col("c1_cust") === col("r1_cust"))
        .join(r2, col("c1_cust") === col("r2_cust"))
        .filter(col("c1_total") > 0 && col("r1_total") > 0 &&
          col("r2_total") * col("c1_total") > col("c2_total") * col("r1_total"))
        .select(col("c1_cust").as("cust"),
          col("c1_total").cast("double").as("kept_y1"),
          col("c2_total").cast("double").as("kept_y2"),
          col("r1_total").cast("double").as("ret_y1"),
          col("r2_total").cast("double").as("ret_y2"))
        .orderBy("cust")
    },

    // q51 shape (reference: .../tpcds/q51.sql): two channel aggregates
    // (open vs finished lines stand in for web vs store sales) FULL
    // OUTER joined on (item group, month), then CUMULATIVE sums via
    // windows over the coalesced join output, keeping rows where one
    // channel's running total overtakes the other. The window
    // partitions by a COALESCE of the two join keys — the composition
    // q51 exists to stress (windows don't see which side a row came
    // from). Monthly sums are exact decimals; cumulative sums stay
    // decimal so the overtake comparison is engine-exact.
    Qdef(
      "ds30_cumulative_overtake",
      """WITH o AS (
        |  SELECT l_partkey % 25 AS grp, month(l_shipdate) AS mth,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
        |  FROM lineitem WHERE l_linestatus = 'O'
        |    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT l_partkey % 25 AS grp, month(l_shipdate) AS mth,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
        |  FROM lineitem WHERE l_linestatus = 'F'
        |    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(o.grp, f.grp) AS grp, coalesce(o.mth, f.mth) AS mth,
        |    coalesce(o.s, CAST(0 AS DECIMAL(18,2))) AS open_s,
        |    coalesce(f.s, CAST(0 AS DECIMAL(18,2))) AS fin_s
        |  FROM o FULL OUTER JOIN f ON o.grp = f.grp AND o.mth = f.mth)
        |SELECT grp, mth,
        |  CAST(cum_open AS DOUBLE) AS cum_open,
        |  CAST(cum_fin AS DOUBLE) AS cum_fin
        |FROM (
        |  SELECT grp, mth,
        |    sum(open_s) OVER (PARTITION BY grp ORDER BY mth) AS cum_open,
        |    sum(fin_s) OVER (PARTITION BY grp ORDER BY mth) AS cum_fin
        |  FROM j) w
        |WHERE cum_open > cum_fin
        |ORDER BY grp, mth""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
      def channel(status: String, pre: String) =
        li.filter(col("l_linestatus") === status)
          .groupBy((col("l_partkey") % 25).as(s"${pre}_grp"),
            month(col("l_shipdate")).as(s"${pre}_mth"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .as(s"${pre}_s"))
      val zero = lit(0).cast("decimal(18,2)")
      val j = channel("O", "o").join(channel("F", "f"),
          col("o_grp") === col("f_grp") && col("o_mth") === col("f_mth"),
          "full_outer")
        .select(coalesce(col("o_grp"), col("f_grp")).as("grp"),
          coalesce(col("o_mth"), col("f_mth")).as("mth"),
          coalesce(col("o_s"), zero).as("open_s"),
          coalesce(col("f_s"), zero).as("fin_s"))
      val w = Window.partitionBy("grp").orderBy("mth")
      j.select(col("grp"), col("mth"),
          sum("open_s").over(w).as("cum_open"),
          sum("fin_s").over(w).as("cum_fin"))
        .filter(col("cum_open") > col("cum_fin"))
        .select(col("grp"), col("mth"),
          col("cum_open").cast("double").as("cum_open"),
          col("cum_fin").cast("double").as("cum_fin"))
        .orderBy("grp", "mth")
    },

    // q39 shape (reference: .../tpcds/q39_1.sql): per-(group, month)
    // mean/stdev of a fact measure, rows flagged where the coefficient
    // of variation exceeds a threshold, then the flagged set SELF-JOINED
    // on consecutive months (mth, mth+1) — a statistical aggregate
    // feeding a sequential equi join. The reference filters
    // stdev/mean > 1 in floating point; quantities here are uniform
    // (cov ≈ 0.58) so the threshold is 0.5, and the FILTER is
    // cross-multiplied into exact decimal integer arithmetic —
    // 4·n·(n·Σq² − (Σq)²) > (Σq)²·(n−1) ⇔ stdev/mean > 0.5 — because a
    // last-ULP stdev difference between engines must not flip a
    // boundary row (the displayed mean/stdev stay double and compare
    // under the gate's float tolerance).
    Qdef(
      "ds31_variability_pairs",
      """WITH stats AS (
        |  SELECT l_partkey % 50 AS grp, month(l_shipdate) AS mth,
        |    count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS s2
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2 HAVING count(*) > 1),
        |flagged AS (
        |  SELECT grp, mth, n, s, s2 FROM stats
        |  WHERE 4 * n * (n * s2 - s * s) > s * s * (n - 1))
        |SELECT a.grp AS grp, a.mth AS mth1, b.mth AS mth2,
        |  round(CAST(a.s AS DOUBLE) / a.n, 6) AS mean1,
        |  round(sqrt((CAST(a.s2 AS DOUBLE) - CAST(a.s AS DOUBLE)
        |    * CAST(a.s AS DOUBLE) / a.n) / (a.n - 1)), 6) AS stdev1,
        |  round(CAST(b.s AS DOUBLE) / b.n, 6) AS mean2,
        |  round(sqrt((CAST(b.s2 AS DOUBLE) - CAST(b.s AS DOUBLE)
        |    * CAST(b.s AS DOUBLE) / b.n) / (b.n - 1)), 6) AS stdev2
        |FROM flagged a JOIN flagged b
        |  ON a.grp = b.grp AND b.mth = a.mth + 1
        |ORDER BY grp, mth1""".stripMargin) { (s, dir) =>
      val q = col("l_quantity").cast("decimal(18,2)")
      val stats = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy((col("l_partkey") % 50).as("grp"),
          month(col("l_shipdate")).as("mth"))
        .agg(count(lit(1)).as("n"), sum(q).as("s"),
          sum(q * q).cast("decimal(18,4)").as("s2"))
        .filter(col("n") > 1)
      val flagged = stats.filter(
        lit(4) * col("n") * (col("n") * col("s2") - col("s") * col("s")) >
          col("s") * col("s") * (col("n") - 1))
      def moments(pre: String)(d: DataFrame) = d.select(
        col("grp").as(s"${pre}_grp"), col("mth").as(s"${pre}_mth"),
        round(col("s").cast("double") / col("n"), 6).as(s"mean$pre"),
        round(sqrt((col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n")) /
          (col("n") - 1)), 6).as(s"stdev$pre"))
      moments("1")(flagged).join(moments("2")(flagged),
          col("1_grp") === col("2_grp") && col("2_mth") === col("1_mth") + 1)
        .select(col("1_grp").as("grp"), col("1_mth").as("mth1"),
          col("2_mth").as("mth2"), col("mean1"), col("stdev1"),
          col("mean2"), col("stdev2"))
        .orderBy("grp", "mth1")
    },

    // q1/q30/q81 shape (reference: .../tpcds/q1.sql): a per-(customer,
    // group) returns-total CTE filtered by a CORRELATED per-group
    // average threshold — "customers returning more than 1.2× their
    // nation's average". The oracle spells the reference's correlated
    // scalar subqueries; the Spark program is the decorrelated plan
    // every engine should reach: aggregate the SAME CTE per group once
    // and equi-join it back. The 1.2× comparison is cross-multiplied
    // into exact decimal/integer arithmetic (5·total·cnt > 6·Σtotal ⇔
    // total > 1.2·avg) so no engine's avg quotient rounding can flip a
    // boundary customer.
    Qdef(
      "ds32_return_outliers",
      """WITH ctr AS (
        |  SELECT c_custkey AS cust, c_nationkey AS grp,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY 1, 2)
        |SELECT c1.cust AS cust, c1.grp AS grp,
        |  CAST(c1.total AS DOUBLE) AS total
        |FROM ctr c1
        |WHERE 5 * c1.total
        |    * (SELECT CAST(count(*) AS DECIMAL(10,0)) FROM ctr c2 WHERE c2.grp = c1.grp)
        |  > 6 * (SELECT CAST(sum(total) AS DECIMAL(18,2)) FROM ctr c2 WHERE c2.grp = c1.grp)
        |ORDER BY cust""".stripMargin) { (s, dir) =>
      val ctr = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey").as("cust"), col("c_nationkey").as("grp"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("total"))
      val perNation = ctr.groupBy(col("grp").as("n_grp"))
        .agg(count(lit(1)).cast("decimal(10,0)").as("n_cnt"),
          sum(col("total")).cast("decimal(18,2)").as("n_sum"))
      ctr.join(perNation, col("grp") === col("n_grp"))
        .filter(lit(5) * col("total") * col("n_cnt") >
          lit(6) * col("n_sum"))
        .select(col("cust"), col("grp"), col("total").cast("double").as("total"))
        .orderBy("cust")
    },

    // q2/q59 shape (reference: .../tpcds/q2.sql): weekly revenue PIVOTED
    // by day-of-week through conditional aggregation (one scan, one
    // shuffle — the reference's 7 sum(CASE …) columns), then the weekly
    // rows SELF-JOINED on consecutive weeks and each day's ratio taken.
    // The week/day keys derive from raw day arithmetic (days since an
    // epoch Monday ÷ 7) rather than weekofyear(), whose ISO rules differ
    // between engines. Ratios are double divisions of exact decimal
    // sums — IEEE-identical in both engines — CASE-guarded like the
    // reference against empty denominators.
    Qdef(
      "ds33_weekly_dow_ratios",
      """WITH weekly AS (
        |  SELECT CAST(floor(date_diff('day', DATE '1996-01-01', l_shipdate) / 7.0) AS INTEGER) AS wk,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 0 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d0,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 1 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d1,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 2 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d2,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 3 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d3,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 4 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d4,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 5 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d5,
        |    sum(CASE WHEN date_diff('day', DATE '1996-01-01', l_shipdate) % 7 = 6 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS d6
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-22'
        |  GROUP BY 1)
        |SELECT a.wk AS wk,
        |  CASE WHEN a.d0 > 0 THEN round(CAST(b.d0 AS DOUBLE) / CAST(a.d0 AS DOUBLE), 6) END AS r0,
        |  CASE WHEN a.d1 > 0 THEN round(CAST(b.d1 AS DOUBLE) / CAST(a.d1 AS DOUBLE), 6) END AS r1,
        |  CASE WHEN a.d2 > 0 THEN round(CAST(b.d2 AS DOUBLE) / CAST(a.d2 AS DOUBLE), 6) END AS r2,
        |  CASE WHEN a.d3 > 0 THEN round(CAST(b.d3 AS DOUBLE) / CAST(a.d3 AS DOUBLE), 6) END AS r3,
        |  CASE WHEN a.d4 > 0 THEN round(CAST(b.d4 AS DOUBLE) / CAST(a.d4 AS DOUBLE), 6) END AS r4,
        |  CASE WHEN a.d5 > 0 THEN round(CAST(b.d5 AS DOUBLE) / CAST(a.d5 AS DOUBLE), 6) END AS r5,
        |  CASE WHEN a.d6 > 0 THEN round(CAST(b.d6 AS DOUBLE) / CAST(a.d6 AS DOUBLE), 6) END AS r6
        |FROM weekly a JOIN weekly b ON b.wk = a.wk + 1
        |ORDER BY wk""".stripMargin) { (s, dir) =>
      def weekly(pre: String): DataFrame = {
        val days = datediff(col("l_shipdate"), to_date(lit("1996-01-01")))
        val price = col("l_extendedprice").cast("decimal(18,2)")
        t(s, dir, "lineitem")
          .filter(col("l_shipdate").between("1996-01-01", "1996-12-22"))
          .groupBy(floor(days / 7).cast("int").as(s"${pre}_wk"))
          .agg(
            sum(when(days % 7 === 0, price)).as(s"${pre}_d0"),
            sum(when(days % 7 === 1, price)).as(s"${pre}_d1"),
            sum(when(days % 7 === 2, price)).as(s"${pre}_d2"),
            sum(when(days % 7 === 3, price)).as(s"${pre}_d3"),
            sum(when(days % 7 === 4, price)).as(s"${pre}_d4"),
            sum(when(days % 7 === 5, price)).as(s"${pre}_d5"),
            sum(when(days % 7 === 6, price)).as(s"${pre}_d6"))
      }
      def ratio(k: Int) = when(col(s"a_d$k") > 0,
        round(col(s"b_d$k").cast("double") / col(s"a_d$k").cast("double"), 6))
        .as(s"r$k")
      weekly("a").join(weekly("b"), col("b_wk") === col("a_wk") + 1)
        .select(col("a_wk").as("wk") +: (0 to 6).map(ratio): _*)
        .orderBy("wk")
    },

    // q54 shape (reference: .../tpcds/q54.sql): a customer COHORT defined
    // by one month's purchases of a target item class, that cohort's
    // revenue over the FOLLOWING three months — where the month-index
    // bounds are SCALAR SUBQUERIES (base month + 1 … base month + 3,
    // the reference's d_month_seq+1/+3 arithmetic), planned as a 1-row
    // broadcast — and the final segment histogram: count of customers
    // per floor(revenue/500) band. Composes an uncorrelated-scalar
    // filter bound, a DISTINCT semi-join cohort, and band bucketing.
    Qdef(
      "ds34_cohort_spend_bands",
      """WITH base AS (
        |  SELECT min(month(o_orderdate)) AS m FROM orders
        |  WHERE year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'),
        |cohort AS (
        |  SELECT DISTINCT o_custkey AS cust
        |  FROM orders
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE year(o_orderdate) = 1996
        |    AND month(o_orderdate) = (SELECT m + 1 FROM base)
        |    AND p_size = 15),
        |rev AS (
        |  SELECT o_custkey AS cust,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
        |  FROM orders
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996
        |    AND month(o_orderdate) BETWEEN (SELECT m + 2 FROM base)
        |                               AND (SELECT m + 4 FROM base)
        |    AND o_custkey IN (SELECT cust FROM cohort)
        |  GROUP BY 1)
        |SELECT CAST(floor(CAST(revenue AS DOUBLE) / 50000) AS BIGINT) AS band,
        |  count(*) AS cnt
        |FROM rev GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val base = broadcast(t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996 &&
          col("o_orderpriority") === "1-URGENT")
        .agg(min(month(col("o_orderdate"))).as("m")))
      val o96 = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
      val li = t(s, dir, "lineitem")
      val cohort = o96.crossJoin(base)
        .filter(month(col("o_orderdate")) === col("m") + 1)
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "part").filter(col("p_size") === 15),
          col("p_partkey") === col("l_partkey"))
        .select(col("o_custkey").as("cust")).distinct()
      o96.crossJoin(base)
        .filter(month(col("o_orderdate"))
          .between(col("m") + 2, col("m") + 4))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(cohort, col("o_custkey") === col("cust"), "left_semi")
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))
        .select(floor(col("revenue").cast("double") / 50000)
          .cast("bigint").as("band"))
        .groupBy("band").agg(count(lit(1)).as("cnt"))
        .orderBy("band")
    },

    // q5/q80 shape (reference: .../tpcds/q80.sql): a per-channel sales
    // report NETTED against returns — sales and returns aggregated to
    // the (channel, item) grain, LEFT JOINED (an item with sales but no
    // returns must survive with 0), profit = sales − returns in exact
    // decimals — under GROUP BY ROLLUP (channel, item) with grouping()
    // markers. The reference unions three channel tables; with one fact
    // table the faithful translation TAGS the channel (a CASE over the
    // order priority, the ds23 precedent) in one pass per side instead
    // of scanning three times. The LEFT join must survive optimization
    // (its NULLs feed coalesce, not a null-rejecting filter) — pinned
    // in PlanSpec.
    Qdef(
      "ds35_channel_returns_rollup",
      """WITH sales AS (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'pri'
        |              WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
        |              ELSE 'std' END AS channel,
        |    p_brand AS brand,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sales
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE l_returnflag <> 'R' AND year(l_shipdate) = 1996
        |  GROUP BY 1, 2),
        |rets AS (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'pri'
        |              WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
        |              ELSE 'std' END AS channel,
        |    p_brand AS brand,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS ret
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
        |  GROUP BY 1, 2)
        |SELECT coalesce(s.channel, 'ALL') AS channel,
        |  coalesce(s.brand, 'ALL') AS brand,
        |  CAST(grouping(s.channel) AS INT) AS g_ch,
        |  CAST(grouping(s.brand) AS INT) AS g_br,
        |  CAST(sum(s.sales) AS DOUBLE) AS sales,
        |  CAST(sum(coalesce(r.ret, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS ret,
        |  CAST(sum(s.sales - coalesce(r.ret, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS profit
        |FROM sales s LEFT JOIN rets r
        |  ON s.channel = r.channel AND s.brand = r.brand
        |GROUP BY ROLLUP (s.channel, s.brand)
        |ORDER BY channel, brand""".stripMargin) { (s, dir) =>
      val channel = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "pri")
        .when(col("o_orderpriority") === "3-MEDIUM", "mid")
        .otherwise("std")
      def side(returned: Boolean, pre: String): DataFrame =
        t(s, dir, "lineitem")
          .filter(year(col("l_shipdate")) === 1996 &&
            (if (returned) col("l_returnflag") === "R"
             else col("l_returnflag") =!= "R"))
          .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(channel.as(s"${pre}_channel"),
            col("p_brand").as(s"${pre}_brand"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as(pre))
      val zero = lit(0).cast("decimal(18,2)")
      side(returned = false, "sales")
        .join(side(returned = true, "rets"),
          col("sales_channel") === col("rets_channel") &&
            col("sales_brand") === col("rets_brand"), "left_outer")
        .select(col("sales_channel").as("channel"),
          col("sales_brand").as("brand"),
          col("sales"), coalesce(col("rets"), zero).as("netret"))
        .rollup(col("channel"), col("brand"))
        .agg(
          grouping(col("channel")).cast("int").as("g_ch"),
          grouping(col("brand")).cast("int").as("g_br"),
          sum(col("sales")).cast("double").as("sales"),
          sum(col("netret")).cast("double").as("ret"),
          sum(col("sales") - col("netret")).cast("double").as("profit"))
        .select(coalesce(col("channel"), lit("ALL")).as("channel"),
          coalesce(col("brand"), lit("ALL")).as("brand"),
          col("g_ch"), col("g_br"), col("sales"), col("ret"), col("profit"))
        .orderBy("channel", "brand")
    },

    // q17/q29/q25 shape (reference: .../tpcds/q29.sql): THREE instances
    // of the fact chained on a compound (customer, brand) key — a sale
    // in the first half-year, a return by the same customer of the same
    // brand during the year, and a second-half re-purchase — each leg a
    // full star (fact ⋆ orders ⋆ part) aggregated to its grain BEFORE
    // the chain (the fixture has no ticket linkage, and at 100 TB the
    // pre-aggregation is what keeps the 3-way join from exploding:
    // compound-key equi joins over reduced grains, not line×line×line).
    Qdef(
      "ds36_sale_return_repurchase",
      """WITH s AS (
        |  SELECT o_custkey AS cust, p_brand AS brand,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS q
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE l_returnflag <> 'R'
        |    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT o_custkey AS cust, p_brand AS brand,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS q
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT o_custkey AS cust, p_brand AS brand,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS q
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE l_returnflag <> 'R'
        |    AND o_orderdate BETWEEN DATE '1996-07-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2)
        |SELECT s.brand AS brand,
        |  CAST(sum(s.q) AS DOUBLE) AS sold_q,
        |  CAST(sum(r.q) AS DOUBLE) AS returned_q,
        |  CAST(sum(s2.q) AS DOUBLE) AS repurchased_q,
        |  count(*) AS chains
        |FROM s
        |JOIN r ON s.cust = r.cust AND s.brand = r.brand
        |JOIN s2 ON s.cust = s2.cust AND s.brand = s2.brand
        |GROUP BY 1
        |ORDER BY brand""".stripMargin) { (s, dir) =>
      def leg(flagR: Boolean, lo: String, hi: String, pre: String) =
        t(s, dir, "lineitem")
          .filter(if (flagR) col("l_returnflag") === "R"
            else col("l_returnflag") =!= "R")
          .join(t(s, dir, "orders")
              .filter(col("o_orderdate").between(lo, hi)),
            col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(col("o_custkey").as(s"${pre}_cust"),
            col("p_brand").as(s"${pre}_brand"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as(s"${pre}_q"))
      leg(flagR = false, "1996-01-01", "1996-06-30", "s")
        .join(leg(flagR = true, "1996-01-01", "1996-12-31", "r"),
          col("s_cust") === col("r_cust") && col("s_brand") === col("r_brand"))
        .join(leg(flagR = false, "1996-07-01", "1996-12-31", "s2"),
          col("s_cust") === col("s2_cust") && col("s_brand") === col("s2_brand"))
        .groupBy(col("s_brand").as("brand"))
        .agg(sum(col("s_q")).cast("double").as("sold_q"),
          sum(col("r_q")).cast("double").as("returned_q"),
          sum(col("s2_q")).cast("double").as("repurchased_q"),
          count(lit(1)).as("chains"))
        .orderBy("brand")
    },

    // q44 shape (reference: .../tpcds/q44.sql): one per-item aggregate
    // ranked BOTH ascending and descending, the top 10 of each joined
    // ON RANK POSITION, and the item dimension joined twice for the two
    // names. The rank key is an EXACT decimal sum (a double avg could
    // order differently in the two engines' last ULP and reshuffle rank
    // positions). The ranked input is the per-part aggregate — dimension
    // grain, not fact grain — which is what makes the unpartitioned
    // window acceptable at 100 TB (and q44's own semantics).
    Qdef(
      "ds37_best_worst_by_rank",
      """WITH perf AS (
        |  SELECT l_partkey AS part,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1),
        |best AS (
        |  SELECT part, rnk FROM (
        |    SELECT part, rank() OVER (ORDER BY rev DESC, part ASC) AS rnk
        |    FROM perf) b WHERE rnk <= 10),
        |worst AS (
        |  SELECT part, rnk FROM (
        |    SELECT part, rank() OVER (ORDER BY rev ASC, part ASC) AS rnk
        |    FROM perf) w WHERE rnk <= 10)
        |SELECT best.rnk AS rnk, p1.p_name AS best_name, p2.p_name AS worst_name
        |FROM best
        |JOIN worst ON best.rnk = worst.rnk
        |JOIN part p1 ON p1.p_partkey = best.part
        |JOIN part p2 ON p2.p_partkey = worst.part
        |ORDER BY rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val perf = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy(col("l_partkey").as("part"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("rev"))
      def ranked(w: org.apache.spark.sql.expressions.WindowSpec, pre: String) =
        perf.select(col("part").as(s"${pre}_part"),
            rank().over(w).as(s"${pre}_rnk"))
          .filter(col(s"${pre}_rnk") <= 10)
      val best = ranked(
        Window.orderBy(col("rev").desc, col("part").asc), "b")
      val worst = ranked(
        Window.orderBy(col("rev").asc, col("part").asc), "w")
      best.join(worst, col("b_rnk") === col("w_rnk"))
        .join(t(s, dir, "part").select(col("p_partkey").as("pk1"),
          col("p_name").as("best_name")), col("pk1") === col("b_part"))
        .join(t(s, dir, "part").select(col("p_partkey").as("pk2"),
          col("p_name").as("worst_name")), col("pk2") === col("w_part"))
        .select(col("b_rnk").as("rnk"), col("best_name"), col("worst_name"))
        .orderBy("rnk")
    },

    // q58 shape (reference: .../tpcds/q58.sql): three per-item channel
    // revenues (the three return-flag slices stand in for store/catalog/
    // web) joined three ways on the item, keeping items where EVERY
    // channel sits within ±10% of the three-channel average — the
    // symmetric band spelled 30·rev BETWEEN 9·total AND 11·total in
    // exact decimal arithmetic (the reference divides by 3 and
    // multiplies by 0.9/1.1 in float, where a last-ULP quotient could
    // flip a boundary item).
    Qdef(
      "ds38_symmetric_channel_band",
      """WITH flagrev AS (
        |  SELECT l_returnflag AS flag, l_partkey AS part,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2)
        |SELECT a.part AS part,
        |  CAST(a.rev AS DOUBLE) AS rev_a,
        |  CAST(n.rev AS DOUBLE) AS rev_n,
        |  CAST(r.rev AS DOUBLE) AS rev_r
        |FROM (SELECT part, rev FROM flagrev WHERE flag = 'A') a
        |JOIN (SELECT part, rev FROM flagrev WHERE flag = 'N') n ON a.part = n.part
        |JOIN (SELECT part, rev FROM flagrev WHERE flag = 'R') r ON a.part = r.part
        |WHERE 30 * a.rev BETWEEN 9 * (a.rev + n.rev + r.rev)
        |                     AND 11 * (a.rev + n.rev + r.rev)
        |  AND 30 * n.rev BETWEEN 9 * (a.rev + n.rev + r.rev)
        |                     AND 11 * (a.rev + n.rev + r.rev)
        |  AND 30 * r.rev BETWEEN 9 * (a.rev + n.rev + r.rev)
        |                     AND 11 * (a.rev + n.rev + r.rev)
        |ORDER BY part""".stripMargin) { (s, dir) =>
      def channel(flag: String, pre: String) =
        t(s, dir, "lineitem")
          .filter(col("l_shipdate").between("1996-01-01", "1996-12-31") &&
            col("l_returnflag") === flag)
          .groupBy(col("l_partkey").as(s"${pre}_part"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as(s"${pre}_rev"))
      val total = col("a_rev") + col("n_rev") + col("r_rev")
      def inBand(c: org.apache.spark.sql.Column) =
        (lit(30) * c).between(lit(9) * total, lit(11) * total)
      channel("A", "a")
        .join(channel("N", "n"), col("a_part") === col("n_part"))
        .join(channel("R", "r"), col("a_part") === col("r_part"))
        .filter(inBand(col("a_rev")) && inBand(col("n_rev")) &&
          inBand(col("r_rev")))
        .select(col("a_part").as("part"),
          col("a_rev").cast("double").as("rev_a"),
          col("n_rev").cast("double").as("rev_n"),
          col("r_rev").cast("double").as("rev_r"))
        .orderBy("part")
    },

    // q36/q70/q86 shape (reference: .../tpcds/q36.sql): rank() whose
    // PARTITION KEY is derived from the grouping() markers of a ROLLUP —
    // each row ranks against its siblings WITHIN its hierarchy level
    // (lochierarchy = grouping(a)+grouping(b); the parent key is
    // CASE WHEN grouping(b)=0 THEN a END, so leaf rows rank within their
    // parent and level-1 rows rank against each other in the NULL-parent
    // partition). The rank key is the EXACT decimal revenue (q36 ranks a
    // float margin ratio, where a last-ULP quotient could swap adjacent
    // ranks between engines) with (ptype, brand) tiebreaks. One Expand
    // feeds both the rollup aggregate and — a level up — the windows;
    // the window input is the rolled-up grain (≤ 6·25 + 6 + 1 rows), not
    // fact rows, so the unpartitioned level-2 row costs nothing at scale.
    Qdef(
      "ds39_rollup_rank_hierarchy",
      """WITH m AS (
        |  SELECT CAST(grouping(p_type) + grouping(p_brand) AS INT) AS hier,
        |    CASE WHEN grouping(p_brand) = 0 THEN p_type END AS parent,
        |    coalesce(p_type, 'ALL') AS ptype,
        |    coalesce(p_brand, 'ALL') AS brand,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY ROLLUP (p_type, p_brand))
        |SELECT hier, ptype, brand, CAST(rev AS DOUBLE) AS rev,
        |  rank() OVER (PARTITION BY hier, parent
        |    ORDER BY rev DESC, ptype ASC, brand ASC) AS rnk
        |FROM m
        |ORDER BY hier DESC, ptype, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val m = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .rollup(col("p_type"), col("p_brand"))
        .agg(
          (grouping(col("p_type")) + grouping(col("p_brand")))
            .cast("int").as("hier"),
          grouping(col("p_brand")).cast("int").as("g_brand"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("rev"))
        .select(col("hier"),
          when(col("g_brand") === 0, col("p_type")).as("parent"),
          coalesce(col("p_type"), lit("ALL")).as("ptype"),
          coalesce(col("p_brand"), lit("ALL")).as("brand"),
          col("rev"))
      val w = Window.partitionBy(col("hier"), col("parent"))
        .orderBy(col("rev").desc, col("ptype").asc, col("brand").asc)
      m.select(col("hier"), col("ptype"), col("brand"),
          col("rev").cast("double").as("rev"), rank().over(w).as("rnk"))
        .orderBy(col("hier").desc, col("ptype"), col("rnk"))
    },

    // q9 shape (reference: .../tpcds/q9.sql): five CASE branches each
    // choosing between two scalar subqueries by a third — 15 scalar
    // subqueries over the SAME fact with different quantity bands,
    // driven off a one-row dimension. The oracle keeps the reference's
    // 15-subquery spelling; the Spark program collapses all 15 into ONE
    // conditional-aggregation pass (count/avg over CASE WHEN band) — at
    // 100 TB that is 1 fact scan instead of 15, and the one-row result
    // broadcast-joins to the driver dimension. PlanSpec pins the single
    // lineitem scan.
    Qdef(
      "ds40_scalar_case_buckets",
      """SELECT
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 12000
        |       THEN (SELECT CAST(avg(l_extendedprice) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
        |       ELSE (SELECT CAST(avg(l_discount) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 12000
        |       THEN (SELECT CAST(avg(l_extendedprice) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
        |       ELSE (SELECT CAST(avg(l_discount) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2,
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 12000
        |       THEN (SELECT CAST(avg(l_extendedprice) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
        |       ELSE (SELECT CAST(avg(l_discount) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) END AS bucket3,
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) > 12000
        |       THEN (SELECT CAST(avg(l_extendedprice) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
        |       ELSE (SELECT CAST(avg(l_discount) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) END AS bucket4,
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) > 12000
        |       THEN (SELECT CAST(avg(l_extendedprice) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50)
        |       ELSE (SELECT CAST(avg(l_discount) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) END AS bucket5
        |FROM region WHERE r_regionkey = 0""".stripMargin) { (s, dir) =>
      def band(lo: Int, hi: Int) = col("l_quantity").between(lo, hi)
      val bands = Seq(1 -> 10, 11 -> 20, 21 -> 30, 31 -> 40, 41 -> 50)
      val aggs = bands.zipWithIndex.flatMap { case ((lo, hi), i) =>
        Seq(
          count(when(band(lo, hi), lit(1))).as(s"c${i + 1}"),
          avg(when(band(lo, hi), col("l_extendedprice"))).as(s"p${i + 1}"),
          avg(when(band(lo, hi), col("l_discount"))).as(s"d${i + 1}"))
      }
      val stats = t(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
      val buckets = (1 to 5).map(i =>
        when(col(s"c$i") > 12000, col(s"p$i")).otherwise(col(s"d$i"))
          .cast("double").as(s"bucket$i"))
      t(s, dir, "region").filter(col("r_regionkey") === 0)
        .crossJoin(broadcast(stats))
        .select(buckets: _*)
    },

    // q50/q62/q99 shape (reference: .../tpcds/q50.sql): the lag between
    // two joined event dates (sale → return; here order → ship) banded
    // into fixed windows as a sum(CASE) pivot per group — "how late do
    // we fulfil, by priority". The bands are computed MAP-SIDE before
    // the partial aggregate (5 counters per group, not a row per band),
    // so the only shuffle is the orderkey join plus a 5-group exchange;
    // the date window pushes into the orders scan.
    Qdef(
      "ds41_fulfillment_lag_buckets",
      """SELECT o_orderpriority AS priority,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val lag = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate").between("1996-01-01", "1996-12-31")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          sum(when(lag <= 30, 1).otherwise(0)).as("d30"),
          sum(when(lag.between(31, 60), 1).otherwise(0)).as("d60"),
          sum(when(lag.between(61, 90), 1).otherwise(0)).as("d90"),
          sum(when(lag.between(91, 120), 1).otherwise(0)).as("d120"),
          sum(when(lag > 120, 1).otherwise(0)).as("dmore"))
        .orderBy("priority")
    },

    // q66 shape (reference: .../tpcds/q66.sql): a very WIDE two-level
    // pivot — each channel pre-aggregates its own 12-month × 2-measure
    // sum(CASE) pivot (24 agg columns, NO Expand: this is conditional
    // aggregation, not grouping sets), the channel pivots UNION ALL, and
    // an outer aggregate re-sums all 24 columns per group. The 24-wide
    // aggregate is a codegen-width stress (q66 has 44 columns); decimal
    // sums keep every cell exact and the final projection casts to
    // DOUBLE. The month/measure column lists are generated — the SQL
    // and the DataFrame program are derived from the same (month,
    // measure) grid so the 48 aliases cannot drift apart.
    {
      val sqlPivot = (1 to 12).map(m =>
        s"    CAST(sum(CASE WHEN mon = $m THEN amt ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS amt_$m,\n" +
        s"    CAST(sum(CASE WHEN mon = $m THEN qty ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS qty_$m")
        .mkString(",\n")
      val sqlOuter = (1 to 12).flatMap(m => Seq(
        s"  CAST(sum(amt_$m) AS DOUBLE) AS amt_$m",
        s"  CAST(sum(qty_$m) AS DOUBLE) AS qty_$m")).mkString(",\n")
      def sqlChannel(flag: String) =
        s"""  SELECT n_name AS nation, month(l_shipdate) AS mon,
           |    CAST(l_extendedprice AS DECIMAL(18,2)) AS amt,
           |    CAST(l_quantity AS DECIMAL(18,2)) AS qty
           |  FROM lineitem
           |  JOIN supplier ON s_suppkey = l_suppkey
           |  JOIN nation ON n_nationkey = s_nationkey
           |  WHERE l_returnflag = '$flag'
           |    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""".stripMargin
      Qdef(
        "ds42_wide_month_pivot",
        s"""WITH c1 AS (
           |  SELECT nation,
           |$sqlPivot
           |  FROM (
           |${sqlChannel("A")}) ch
           |  GROUP BY nation),
           |c2 AS (
           |  SELECT nation,
           |$sqlPivot
           |  FROM (
           |${sqlChannel("N")}) ch
           |  GROUP BY nation)
           |SELECT nation,
           |$sqlOuter
           |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2) u
           |GROUP BY nation
           |ORDER BY nation""".stripMargin) { (s, dir) =>
        def channel(flag: String) = {
          val rows = t(s, dir, "lineitem")
            .filter(col("l_returnflag") === flag &&
              col("l_shipdate").between("1996-01-01", "1996-12-31"))
            .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
            .join(broadcast(t(s, dir, "nation")),
              col("n_nationkey") === col("s_nationkey"))
            .select(col("n_name").as("nation"),
              month(col("l_shipdate")).as("mon"),
              col("l_extendedprice").cast("decimal(18,2)").as("amt"),
              col("l_quantity").cast("decimal(18,2)").as("qty"))
          val pivots = (1 to 12).flatMap(m => Seq(
            sum(when(col("mon") === m, col("amt"))
              .otherwise(lit(0).cast("decimal(18,2)")))
              .cast("decimal(18,2)").as(s"amt_$m"),
            sum(when(col("mon") === m, col("qty"))
              .otherwise(lit(0).cast("decimal(18,2)")))
              .cast("decimal(18,2)").as(s"qty_$m")))
          rows.groupBy("nation").agg(pivots.head, pivots.tail: _*)
        }
        val outer = (1 to 12).flatMap(m => Seq(
          sum(col(s"amt_$m")).cast("double").as(s"amt_$m"),
          sum(col(s"qty_$m")).cast("double").as(s"qty_$m")))
        channel("A").unionByName(channel("N"))
          .groupBy("nation").agg(outer.head, outer.tail: _*)
          .orderBy("nation")
      }
    },

    // q75 shape (reference: .../tpcds/q75.sql): year-over-year DECLINE
    // over returns-netted quantities — per (year, brand) the net
    // quantity and amount (returned rows SUBTRACT, q75's
    // sales-minus-returns netting folded into one sum(CASE) at the
    // fact grain), the netted CTE self-joined prev-year × curr-year on
    // the brand, keeping brands that shrank. The decline compare and
    // the reported drop stay in EXACT decimals (q75 compares raw
    // quantities and reports sales_amt_diff; a double net could flip a
    // zero-margin brand between engines).
    Qdef(
      "ds43_yoy_decline_netted",
      """WITH net AS (
        |  SELECT year(o_orderdate) AS yr, p_brand AS brand,
        |    CAST(sum(CASE WHEN l_returnflag = 'R'
        |        THEN -CAST(l_quantity AS DECIMAL(18,2))
        |        ELSE CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS qty,
        |    CAST(sum(CASE WHEN l_returnflag = 'R'
        |        THEN -CAST(l_extendedprice AS DECIMAL(18,2))
        |        ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS amt
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1, 2)
        |SELECT prev.brand AS brand,
        |  CAST(prev.qty AS DOUBLE) AS prev_qty,
        |  CAST(curr.qty AS DOUBLE) AS curr_qty,
        |  CAST(prev.amt - curr.amt AS DOUBLE) AS amt_drop
        |FROM net prev
        |JOIN net curr ON prev.brand = curr.brand
        |WHERE prev.yr = 1995 AND curr.yr = 1996
        |  AND curr.qty < prev.qty
        |ORDER BY brand""".stripMargin) { (s, dir) =>
      // the oracle's yr filter is spelled as the equivalent per-branch
      // DATE RANGE (orderdates are midnight-quantized, so BETWEEN
      // yyyy-01-01 .. yyyy-12-31 IS year = yyyy) — a year(col) = lit
      // predicate would not reach the parquet scan, a range does
      // (PlanSpec pins both branches' bounds).
      def net(yr: Int, pre: String) = {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders")
              .filter(col("o_orderdate").between(s"$yr-01-01", s"$yr-12-31")),
            col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as(s"${pre}_brand"))
          .agg(
            sum(when(col("l_returnflag") === "R", -dec(col("l_quantity")))
              .otherwise(dec(col("l_quantity"))))
              .cast("decimal(18,2)").as(s"${pre}_qty"),
            sum(when(col("l_returnflag") === "R", -dec(col("l_extendedprice")))
              .otherwise(dec(col("l_extendedprice"))))
              .cast("decimal(18,2)").as(s"${pre}_amt"))
      }
      net(1995, "p").join(net(1996, "c"), col("p_brand") === col("c_brand"))
        .filter(col("c_qty") < col("p_qty"))
        .select(col("p_brand").as("brand"),
          col("p_qty").cast("double").as("prev_qty"),
          col("c_qty").cast("double").as("curr_qty"),
          (col("p_amt") - col("c_amt")).cast("double").as("amt_drop"))
        .orderBy("brand")
    },

    // q88 shape (reference: .../tpcds/q88.sql): EIGHT single-row count(*)
    // derived tables cross-joined into one 8-column row — each leg scans
    // the fact over its own contiguous time band (half-month l_shipdate
    // windows standing in for q88's half-hour time_dim bands; banding on
    // the fact column directly means each leg's range reaches its parquet
    // scan) with the SAME disjunctive demographics filter (three
    // (segment, acctbal-cap) branches mirroring q88's (dep_count,
    // vehicle_count) triples — the OR references only customer columns,
    // so it pushes into every leg's customer scan) and the same fixed
    // "store" equality (o_orderpriority). The cross join of eight 1-row
    // relations is the WANTED plan (BroadcastNestedLoop over single
    // rows is free); the window list is generated once so the SQL and
    // DataFrame legs cannot drift.
    {
      val bands = Seq(
        ("1995-03-01", "1995-03-15"), ("1995-03-16", "1995-03-31"),
        ("1995-04-01", "1995-04-15"), ("1995-04-16", "1995-04-30"),
        ("1995-05-01", "1995-05-15"), ("1995-05-16", "1995-05-31"),
        ("1995-06-01", "1995-06-15"), ("1995-06-16", "1995-06-30"))
      val demoSql =
        """((c_mktsegment = 'BUILDING' AND c_acctbal <= 6000)
          |      OR (c_mktsegment = 'AUTOMOBILE' AND c_acctbal <= 4000)
          |      OR (c_mktsegment = 'MACHINERY' AND c_acctbal <= 2000))""".stripMargin
      val legsSql = bands.zipWithIndex.map { case ((lo, hi), i) =>
        s"""  (SELECT count(*) AS h${i + 1}
           |    FROM lineitem
           |    JOIN orders ON o_orderkey = l_orderkey
           |    JOIN customer ON c_custkey = o_custkey
           |    WHERE l_shipdate BETWEEN DATE '$lo' AND DATE '$hi'
           |      AND o_orderpriority = '1-URGENT'
           |      AND $demoSql) s${i + 1}""".stripMargin
      }.mkString(",\n")
      Qdef(
        "ds44_timeband_counts",
        s"""SELECT *
           |FROM
           |$legsSql""".stripMargin) { (s, dir) =>
        def leg(lo: String, hi: String, i: Int) = {
          val demo = (col("c_mktsegment") === "BUILDING" && col("c_acctbal") <= 6000) ||
            (col("c_mktsegment") === "AUTOMOBILE" && col("c_acctbal") <= 4000) ||
            (col("c_mktsegment") === "MACHINERY" && col("c_acctbal") <= 2000)
          t(s, dir, "lineitem").filter(col("l_shipdate").between(lo, hi))
            .join(t(s, dir, "orders")
                .filter(col("o_orderpriority") === "1-URGENT"),
              col("o_orderkey") === col("l_orderkey"))
            .join(t(s, dir, "customer").filter(demo),
              col("c_custkey") === col("o_custkey"))
            .agg(count(lit(1)).as(s"h$i"))
        }
        bands.zipWithIndex.map { case ((lo, hi), i) => leg(lo, hi, i + 1) }
          .reduce(_.crossJoin(_))
      }
    },

    // q13 shape (reference: .../tpcds/q13.sql): one GLOBAL aggregate over
    // a star where the JOIN EQUALITIES THEMSELVES live inside each OR
    // branch — every demographic branch repeats the customer equi-key
    // next to its (segment, priority, price-band) conjunction, and every
    // geography branch repeats the supplier equi-key next to its
    // (nation-set, discount-band) conjunction. BooleanSimplification must
    // factor the common equality out of each disjunction so both joins
    // plan as hash joins with the band OR left as a residual — the plan
    // regression this guards is a BNLJ/cartesian when the factoring
    // fails (PlanSpec pins none appear). The nation dim-side equality is
    // pre-joined (broadcast, 25 rows) rather than repeated per branch:
    // repeating it would cross supplier×nation at scale for no semantic
    // gain.
    Qdef(
      "ds45_disjunctive_star",
      """SELECT round(avg(l_quantity), 6) AS agg1,
        |  round(avg(l_extendedprice), 6) AS agg2,
        |  round(avg(l_discount), 6) AS agg3,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS agg4
        |FROM lineitem, orders, customer, supplier, nation
        |WHERE l_orderkey = o_orderkey
        |  AND s_nationkey = n_nationkey
        |  AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
        |  AND ((o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        |        AND o_orderpriority = '1-URGENT'
        |        AND l_extendedprice BETWEEN 100 AND 30000)
        |    OR (o_custkey = c_custkey AND c_mktsegment = 'MACHINERY'
        |        AND o_orderpriority = '2-HIGH'
        |        AND l_extendedprice BETWEEN 20000 AND 60000)
        |    OR (o_custkey = c_custkey AND c_mktsegment = 'AUTOMOBILE'
        |        AND o_orderpriority = '3-MEDIUM'
        |        AND l_extendedprice BETWEEN 10000 AND 50000))
        |  AND ((l_suppkey = s_suppkey
        |        AND n_name IN ('FRANCE', 'GERMANY', 'RUSSIA')
        |        AND l_discount BETWEEN 0.01 AND 0.04)
        |    OR (l_suppkey = s_suppkey
        |        AND n_name IN ('JAPAN', 'CHINA', 'INDIA')
        |        AND l_discount BETWEEN 0.03 AND 0.07)
        |    OR (l_suppkey = s_suppkey
        |        AND n_name IN ('BRAZIL', 'CANADA', 'PERU')
        |        AND l_discount BETWEEN 0.00 AND 0.05))""".stripMargin) { (s, dir) =>
      val demoOr =
        (col("o_custkey") === col("c_custkey") &&
          col("c_mktsegment") === "BUILDING" &&
          col("o_orderpriority") === "1-URGENT" &&
          col("l_extendedprice").between(100, 30000)) ||
        (col("o_custkey") === col("c_custkey") &&
          col("c_mktsegment") === "MACHINERY" &&
          col("o_orderpriority") === "2-HIGH" &&
          col("l_extendedprice").between(20000, 60000)) ||
        (col("o_custkey") === col("c_custkey") &&
          col("c_mktsegment") === "AUTOMOBILE" &&
          col("o_orderpriority") === "3-MEDIUM" &&
          col("l_extendedprice").between(10000, 50000))
      val geoOr =
        (col("l_suppkey") === col("s_suppkey") &&
          col("n_name").isin("FRANCE", "GERMANY", "RUSSIA") &&
          col("l_discount").between(0.01, 0.04)) ||
        (col("l_suppkey") === col("s_suppkey") &&
          col("n_name").isin("JAPAN", "CHINA", "INDIA") &&
          col("l_discount").between(0.03, 0.07)) ||
        (col("l_suppkey") === col("s_suppkey") &&
          col("n_name").isin("BRAZIL", "CANADA", "PERU") &&
          col("l_discount").between(0.00, 0.05))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate").between("1995-01-01", "1995-12-31")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), demoOr)
        .join(t(s, dir, "supplier").join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey")),
          geoOr)
        .agg(
          round(avg("l_quantity"), 6).as("agg1"),
          round(avg("l_extendedprice"), 6).as("agg2"),
          round(avg("l_discount"), 6).as("agg3"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("agg4"))
    },

    // q78 shape (reference: .../tpcds/q78.sql): per-channel CTEs each
    // spelled as fact LEFT JOIN returns + WHERE return-key IS NULL (the
    // un-returned-sales anti idiom, kept verbatim rather than rewritten
    // to LEFT ANTI — the optimizer owns that choice), aggregated per
    // (year, item, customer), then the store channel LEFT-joins the
    // other two and the null-INTOLERANT COALESCE(qty,0) > 0 filters must
    // collapse BOTH top outer joins to inner (EliminateOuterJoin — the
    // whole point of the shape; PlanSpec counts surviving outer joins).
    // Channels split l_shipmode three ways; the group key is
    // (year, brand, segment) rather than q78's raw item/customer keys so
    // groups actually co-occur across all three channels at test SF; the
    // channel axis is the ORDER PRIORITY (the fixture lineitem carries
    // no shipmode), split three disjoint ways at the orders dimension.
    // Note the reference SQL's cs join carries a "cs_item_sk" =
    // "cs_item_sk" self-equality (a benchto typo); this port implements
    // the intended item = item key.
    Qdef(
      "ds46_cross_channel_qty_ratio",
      """WITH ret AS (
        |  SELECT DISTINCT l_orderkey AS r_ok, l_partkey AS r_pk
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |ch_ss AS (
        |  SELECT year(o_orderdate) AS yr, p_brand AS item, c_mktsegment AS cust,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ss_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ss_sp
        |  FROM lineitem
        |  LEFT JOIN ret ON r_ok = l_orderkey AND r_pk = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN customer ON c_custkey = o_custkey
        |  WHERE r_ok IS NULL AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  GROUP BY 1, 2, 3),
        |ch_ws AS (
        |  SELECT year(o_orderdate) AS yr, p_brand AS item, c_mktsegment AS cust,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ws_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ws_sp
        |  FROM lineitem
        |  LEFT JOIN ret ON r_ok = l_orderkey AND r_pk = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN customer ON c_custkey = o_custkey
        |  WHERE r_ok IS NULL AND o_orderpriority IN ('3-MEDIUM')
        |  GROUP BY 1, 2, 3),
        |ch_cs AS (
        |  SELECT year(o_orderdate) AS yr, p_brand AS item, c_mktsegment AS cust,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS cs_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS cs_sp
        |  FROM lineitem
        |  LEFT JOIN ret ON r_ok = l_orderkey AND r_pk = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN customer ON c_custkey = o_custkey
        |  WHERE r_ok IS NULL AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        |  GROUP BY 1, 2, 3)
        |SELECT c1.yr AS yr, c1.item AS item, c1.cust AS cust,
        |  CAST(ss_qty AS DOUBLE) / COALESCE(CAST(ws_qty + cs_qty AS DOUBLE), 1.0) AS ratio,
        |  CAST(ss_qty AS DOUBLE) AS store_qty,
        |  CAST(ss_sp AS DOUBLE) AS store_sp,
        |  CAST(COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS DOUBLE) AS other_qty,
        |  CAST(COALESCE(ws_sp, 0) + COALESCE(cs_sp, 0) AS DOUBLE) AS other_sp
        |FROM ch_ss c1
        |LEFT JOIN ch_ws c2 ON c2.yr = c1.yr AND c2.item = c1.item AND c2.cust = c1.cust
        |LEFT JOIN ch_cs c3 ON c3.yr = c1.yr AND c3.item = c1.item AND c3.cust = c1.cust
        |WHERE COALESCE(ws_qty, 0) > 0 AND COALESCE(cs_qty, 0) > 0
        |  AND c1.yr = 1995
        |ORDER BY yr, item, cust
        |LIMIT 100""".stripMargin) { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
      val ret = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
        .distinct()
      def channel(prios: Seq[String], pre: String) =
        t(s, dir, "lineitem")
          .join(ret, col("r_ok") === col("l_orderkey") &&
            col("r_pk") === col("l_partkey"), "left")
          .filter(col("r_ok").isNull)
          .join(t(s, dir, "orders")
              .filter(col("o_orderpriority").isin(prios: _*)),
            col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .groupBy(year(col("o_orderdate")).as(s"${pre}_yr"),
            col("p_brand").as(s"${pre}_item"),
            col("c_mktsegment").as(s"${pre}_cust"))
          .agg(
            sum(dec(col("l_quantity"))).cast("decimal(18,2)").as(s"${pre}_qty"),
            sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as(s"${pre}_sp"))
      val ss = channel(Seq("1-URGENT", "2-HIGH"), "ss")
      val ws = channel(Seq("3-MEDIUM"), "ws")
      val cs = channel(Seq("4-NOT SPECIFIED", "5-LOW"), "cs")
      ss.join(ws, col("ws_yr") === col("ss_yr") &&
          col("ws_item") === col("ss_item") &&
          col("ws_cust") === col("ss_cust"), "left")
        .join(cs, col("cs_yr") === col("ss_yr") &&
          col("cs_item") === col("ss_item") &&
          col("cs_cust") === col("ss_cust"), "left")
        .filter(coalesce(col("ws_qty"), lit(0)) > 0 &&
          coalesce(col("cs_qty"), lit(0)) > 0 &&
          col("ss_yr") === 1995)
        .select(col("ss_yr").as("yr"), col("ss_item").as("item"),
          col("ss_cust").as("cust"),
          (col("ss_qty").cast("double") /
            coalesce((col("ws_qty") + col("cs_qty")).cast("double"), lit(1.0)))
            .as("ratio"),
          col("ss_qty").cast("double").as("store_qty"),
          col("ss_sp").cast("double").as("store_sp"),
          (coalesce(col("ws_qty"), lit(0)) + coalesce(col("cs_qty"), lit(0)))
            .cast("double").as("other_qty"),
          (coalesce(col("ws_sp"), lit(0)) + coalesce(col("cs_sp"), lit(0)))
            .cast("double").as("other_sp"))
        .orderBy("yr", "item", "cust")
        .limit(100)
    })
}
