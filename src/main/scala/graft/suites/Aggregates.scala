package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation-breadth corpus (SURVEY §2.4): distinct aggs, grouping
  * sets/rollup/cube + grouping(), FILTER clause, min_by/max_by, stats
  * aggs, bool/bit aggs, approx sketches with error-bound property checks,
  * null handling. Reference implementations live under presto-main/.../
  * operator/aggregation/ (114 reference tests in presto-tests/.../
  * AbstractTestAggregations.java); Spark's HashAggregateExec +
  * RewriteDistinctAggregates + Expand cover the same surface.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // Multiple DISTINCT aggregates in one query — Catalyst expands with
    // Expand (the reference marks rows via operator/MarkDistinctOperator.java).
    Qdef(
      "a01_distinct_aggs",
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS distinct_supp,
        |  count(DISTINCT l_partkey) AS distinct_part,
        |  sum(DISTINCT l_quantity)  AS sum_distinct_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_suppkey").as("distinct_supp"),
          countDistinct("l_partkey").as("distinct_part"),
          sum_distinct(col("l_quantity")).as("sum_distinct_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // GROUPING SETS + grouping() marker (reference: presto-main/.../
    // operator/GroupIdOperator.java + planner/GroupingOperationRewriter.java).
    // NULL group keys are coalesced so ordering stays dialect-neutral.
    Qdef(
      "a02_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rflag,
        |       CAST(grouping(l_linestatus) AS INT) AS g_lstatus,
        |       count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rflag, g_lstatus, rflag, lstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rflag"),
          grouping(col("l_linestatus")).cast("int").as("g_lstatus"),
          count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("g_rflag"), col("g_lstatus"), col("cnt"), col("sum_qty"))
        .orderBy("g_rflag", "g_lstatus", "rflag", "lstatus")
    },

    // ROLLUP hierarchy totals.
    Qdef(
      "a03_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS cnt, sum(o_totalprice) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("total"))
        .orderBy("status", "priority")
    },

    // CUBE: all grouping combinations.
    Qdef(
      "a04_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("cnt"))
        .orderBy("rflag", "lstatus")
    },

    // FILTER (WHERE …) on aggregate arguments (reference rewrite:
    // presto-main/.../iterative/rule/ImplementFilteredAggregations.java).
    Qdef(
      "a05_filtered_aggs",
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS big_orders,
        |  sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_total,
        |  count(*) AS cnt
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("count(*) FILTER (WHERE o_totalprice > 100000)").as("big_orders"),
          expr("sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')")
            .as("urgent_total"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // min_by / max_by keyed by a UNIQUE ordering column so the winner is
    // deterministic (reference: presto-main/.../operator/aggregation/minmaxby/).
    Qdef(
      "a06_min_max_by",
      """SELECT o_orderstatus,
        |  min_by(o_totalprice, o_orderkey) AS first_price,
        |  max_by(o_totalprice, o_orderkey) AS last_price,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
        .orderBy("o_orderstatus")
    },

    // Statistical aggregates (reference: presto-main/.../operator/
    // aggregation/VarianceAggregation.java, DoubleCorrelationAggregation.java,
    // DoubleRegressionAggregation.java).
    Qdef(
      "a07_stats_aggs",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_samp,
        |  round(stddev_pop(l_quantity), 6)  AS sd_pop,
        |  round(var_samp(l_quantity), 6)    AS v_samp,
        |  round(var_pop(l_quantity), 6)     AS v_pop,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_samp"),
          round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
          round(var_samp(col("l_quantity")), 6).as("v_samp"),
          round(var_pop(col("l_quantity")), 6).as("v_pop"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("qty_price_covar"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("intercept"))
        .orderBy("l_returnflag")
    },

    // Boolean and bitwise aggregates + geometric mean via exp∘avg∘ln
    // (reference: BooleanAndAggregation.java, BitwiseAndAggregation.java,
    // GeometricMeanAggregations.java).
    Qdef(
      "a08_bool_bit_aggs",
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000)  AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k,
        |  bit_and(CAST(o_custkey AS BIGINT) % 256) AS key_bit_and,
        |  bit_or(CAST(o_custkey AS BIGINT) % 256)  AS key_bit_or,
        |  round(exp(avg(ln(o_totalprice))), 4) AS geo_mean_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
          bit_and(col("o_custkey").cast("bigint") % 256).as("key_bit_and"),
          bit_or(col("o_custkey").cast("bigint") % 256).as("key_bit_or"),
          round(exp(avg(ln(col("o_totalprice")))), 4).as("geo_mean_price"))
        .orderBy("o_orderstatus")
    },

    // approx_distinct (HLL) within its published error bound vs the exact
    // count — a property check, since sketch estimates are engine-specific
    // (reference: presto-main/.../operator/aggregation/
    // ApproximateCountDistinctAggregation.java; Spark runs HLL++).
    Qdef(
      "a09_approx_distinct_bounds",
      "SELECT true AS partkey_ok, true AS suppkey_ok, true AS orderkey_ok") { (s, dir) =>
      // rsd=0.02 with a 10% acceptance bound = 5σ headroom; a tight bound
      // at exactly the default rsd flakes (observed at sf0.001).
      //
      // r16: the sketches and the exact counts aggregate SEPARATELY and
      // meet in a 1-row × 1-row cross join. Mixed into ONE Aggregate,
      // the three countDistincts force Catalyst's two-level Expand
      // distinct plan and the HLL++ buffers ride it — merged once per
      // DISTINCT-VALUE group instead of once per task (measured 10.2
      // CPU-s in the final stage at sf0.1; split, the HLLs merge 21
      // partial buffers). Same estimates (HLL register-max merge is
      // order-independent), same exact counts, same booleans.
      val li = t(s, dir, "lineitem")
      val approx = li.agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apart"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("asupp"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("aorder"))
      val exact = li.agg(
        countDistinct("l_partkey").as("epart"),
        countDistinct("l_suppkey").as("esupp"),
        countDistinct("l_orderkey").as("eorder"))
      approx.crossJoin(exact).select(
        (abs(col("apart") - col("epart")) <= col("epart") * 0.1).as("partkey_ok"),
        (abs(col("asupp") - col("esupp")) <= col("esupp") * 0.1).as("suppkey_ok"),
        (abs(col("aorder") - col("eorder")) <= col("eorder") * 0.1).as("orderkey_ok"))
    },

    // approx_percentile within 2% of the exact percentile (reference:
    // ApproximateLongPercentileAggregations.java; Spark uses GK/QuantileSummaries).
    Qdef(
      "a10_approx_percentile_bounds",
      "SELECT true AS p50_ok, true AS p90_ok") { (s, dir) =>
      t(s, dir, "orders")
        .agg(
          expr("abs(approx_percentile(o_totalprice, 0.5) - percentile(o_totalprice, 0.5))" +
            " <= percentile(o_totalprice, 0.5) * 0.02").as("p50_ok"),
          expr("abs(approx_percentile(o_totalprice, 0.9) - percentile(o_totalprice, 0.9))" +
            " <= percentile(o_totalprice, 0.9) * 0.02").as("p90_ok"))
    },

    // array_agg with deterministic ORDER BY, surfaced as a joined string
    // (Presto: array_agg(x ORDER BY x); Spark: sort_array∘collect_list;
    // DuckDB oracle: string_agg ORDER BY — dialects differ, so duckOnly).
    Qdef.duckOnly(
      "a11_ordered_array_agg",
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"),
          countDistinct("l_linestatus").as("n_statuses"))
        .orderBy("l_returnflag")
    },

    // histogram / map_agg equivalent, canonicalized to a sorted "k:v"
    // string (reference: presto-main/.../operator/aggregation/histogram/).
    Qdef.duckOnly(
      "a12_histogram",
      """SELECT o_orderstatus,
        |  string_agg(p || ':' || c, ',' ORDER BY p) AS prio_histogram
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority AS p, count(*) AS c
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority").as("p"))
        .agg(count(lit(1)).as("c"))
        .groupBy("o_orderstatus")
        .agg(concat_ws(",",
          array_sort(collect_list(concat(col("p"), lit(":"), col("c")))))
          .as("prio_histogram"))
        .orderBy("o_orderstatus")
    },

    // EXACT percentiles (continuous interpolation): Spark percentile ==
    // DuckDB quantile_cont by definition (reference exposes the same via
    // qdigest-backed approx_percentile; the exact form anchors it).
    Qdef.duckOnly(
      "a14_exact_percentiles",
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4)  AS p90
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("o_orderstatus")
    },

    // count_if + null-aware counting: NULLIF manufactures NULLs, count(col)
    // skips them, avg ignores them (Presto/Spark/DuckDB agree).
    Qdef(
      "a13_null_handling",
      """SELECT
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_discount_cnt,
        |  count(nullif(l_returnflag, 'R')) AS non_r_cnt,
        |  count(*) AS total_cnt,
        |  round(avg(CASE WHEN l_discount > 0.05 THEN l_quantity END), 6)
        |    AS avg_qty_high_disc
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .agg(
          count_if(col("l_discount") > 0.05).as("high_discount_cnt"),
          count(nullif(col("l_returnflag"), lit("R"))).as("non_r_cnt"),
          count(lit(1)).as("total_cnt"),
          round(avg(when(col("l_discount") > 0.05, col("l_quantity"))), 6)
            .as("avg_qty_high_disc"))
    },

    // skewness / kurtosis under the REFERENCE's definitions (reference:
    // operator/aggregation/CentralMomentsAggregation.java — population
    // skewness √n·m3/m2^1.5, SAMPLE-adjusted excess kurtosis). Spark's
    // builtin kurtosis is population, so the graft builders rebuild the
    // sample form; the oracle replays the central moments two-pass.
    // DuckDB's own skewness()/kurtosis() are NOT used — both are
    // sample-adjusted differently than the population skewness here.
    Qdef.duckOnly(
      "a15_central_moments",
      """WITH s AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x
        |  FROM lineitem WHERE l_orderkey < 2000),
        |m AS (SELECT avg(x) AS mu, CAST(count(*) AS DOUBLE) AS n FROM s),
        |c AS (SELECT max(n) AS n,
        |             sum(pow(x - mu, 2)) AS m2,
        |             sum(pow(x - mu, 3)) AS m3,
        |             sum(pow(x - mu, 4)) AS m4
        |      FROM s, m)
        |SELECT round(sqrt(n) * m3 / pow(m2, 1.5), 6) AS skew,
        |       round((n-1)*n*(n+1)/((n-2)*(n-3)) * m4/(m2*m2)
        |             - 3*(n-1)*(n-1)/((n-2)*(n-3)), 6) AS kurt
        |FROM c""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT round(skewness(CAST(l_quantity AS DOUBLE)), 6) AS skew,
          |       round(kurtosis(CAST(l_quantity AS DOUBLE)), 6) AS kurt
          |FROM lineitem WHERE l_orderkey < 2000""".stripMargin)
    },

    // SQL-form array_agg(x ORDER BY k…) through the facade (reference:
    // SqlBase.g4 aggregate orderBy + ArrayAggregationFunction) — the
    // dialect rewrites to a sorted-struct projection since Spark
    // aggregates take no ORDER BY. Secondary key makes tie order
    // deterministic on both engines.
    Qdef.duckOnly(
      "a16_sql_ordered_array_agg",
      """SELECT o_orderpriority,
        |  array_to_string(list(CAST(o_orderkey AS VARCHAR)
        |    ORDER BY o_totalprice DESC, o_orderkey DESC), ',') AS keys_by_price
        |FROM orders
        |WHERE o_orderkey < 300
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT o_orderpriority,
          |  array_join(array_agg(CAST(o_orderkey AS VARCHAR)
          |    ORDER BY o_totalprice DESC, o_orderkey DESC), ',') AS keys_by_price
          |FROM orders
          |WHERE o_orderkey < 300
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // Ordered array_agg with NULL sort keys under an explicit NULLS
    // qualifier: the facade honors NULLS FIRST ascending (array_sort
    // compares struct fields nulls-first — round-9 ADVICE fix; the
    // contradictory qualifiers fail loudly instead). DuckDB replays the
    // exact element order with its native ORDER BY … NULLS FIRST. NULL
    // keys come from a LEFT JOIN miss so both engines build them the
    // same way.
    Qdef.duckOnly(
      "a17_ordered_array_agg_nulls",
      """SELECT c_mktsegment,
        |  array_to_string(list(CAST(c_custkey AS VARCHAR)
        |    ORDER BY o_orderkey NULLS FIRST, c_custkey), ',') AS keys_nf
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, min(o_orderkey) AS o_orderkey
        |           FROM orders WHERE o_orderkey < 500 GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |WHERE c_custkey < 80
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT c_mktsegment,
          |  array_join(array_agg(CAST(c_custkey AS VARCHAR)
          |    ORDER BY o_orderkey NULLS FIRST, c_custkey), ',') AS keys_nf
          |FROM customer
          |LEFT JOIN (SELECT o_custkey, min(o_orderkey) AS o_orderkey
          |           FROM orders WHERE o_orderkey < 500 GROUP BY o_custkey) o
          |  ON c_custkey = o_custkey
          |WHERE c_custkey < 80
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin)
    }
  )
}
