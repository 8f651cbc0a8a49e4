package graft.suites

import graft.{Qdef, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered-function corpus (SURVEY §2.11): typed Aggregator UDAFs and
  * scalar UDFs registered on the session and invoked THROUGH SQL — the
  * same path a user of Engine.sql gets.
  */
object Udfs {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    GraftFunctions.registerAll(s)
    graft.functions.HyperLogLog.registerAll(s)
    graft.functions.QuantileSketch.registerAll(s)
    graft.functions.TDigest.registerAll(s)
    Tables.load(s, dir, name)
  }

  val defs: Seq[Qdef] = Seq(

    // map_union_sum UDAF: per-status priority histogram as a merged map,
    // canonicalized to a sorted k:v string for comparison.
    Qdef.duckOnly(
      "c01_map_union_sum",
      """SELECT o_orderstatus,
        |  string_agg(p || ':' || c, ',' ORDER BY p) AS prio_map
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority AS p, count(*) AS c
        |  FROM orders GROUP BY 1, 2)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .selectExpr("o_orderstatus", "map(o_orderpriority, 1L) AS m")
        .groupBy("o_orderstatus")
        .agg(expr("map_union_sum(m)").as("merged"))
        .selectExpr(
          "o_orderstatus",
          """concat_ws(',', array_sort(transform(map_entries(merged),
            |  e -> concat(e.key, ':', e.value)))) AS prio_map""".stripMargin)
        .orderBy("o_orderstatus")
    },

    // geometric_mean UDAF vs the exp∘avg∘ln identity the oracle can run.
    Qdef(
      "c02_geometric_mean",
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 4) AS geo_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("geometric_mean(l_extendedprice)"), 4).as("geo_price"))
        .orderBy("l_returnflag")
    },

    // Scalar UDF registered and invoked via SQL; the oracle reproduces the
    // stemming rule with the same anchored regex.
    Qdef(
      "c03_word_stem_udf",
      """SELECT regexp_replace(p_name, '(ing|ed|s)$', '') AS stemmed,
        |  count(*) AS cnt
        |FROM part
        |GROUP BY 1
        |ORDER BY stemmed""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .selectExpr("word_stem_lite(p_name) AS stemmed")
        .groupBy("stemmed")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("stemmed")
    },

    // The Presto sketch-type API: approx_set → merge → cardinality. Builds
    // per-(flag,status) sketches, merges them WITHOUT rescanning raw data
    // (the mergeable-state property that ships sketches across exchanges),
    // and bounds the estimate against the exact count (HLL p=12 ⇒ σ≈1.6%;
    // 5% ≈ 3σ).
    Qdef(
      "c04_hll_sketch_merge",
      """SELECT DISTINCT l_returnflag, true AS card_ok
        |FROM lineitem
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val perGroup = li.groupBy("l_returnflag", "l_linestatus")
        .agg(expr("approx_set_agg(xxhash64(l_partkey))").as("hll"))
      val merged = perGroup.groupBy("l_returnflag")
        .agg(expr("hll_cardinality(merge_hll(hll))").as("est"))
      val exact = li.groupBy(col("l_returnflag").as("rf"))
        .agg(countDistinct("l_partkey").as("exact"))
      merged.join(exact, col("l_returnflag") === col("rf"))
        .select(col("l_returnflag"),
          (abs(col("est") - col("exact")) <= col("exact") * 0.05).as("card_ok"))
        .orderBy("l_returnflag")
    },

    // qdigest behavior: build per-status digests, merge WITHOUT raw data,
    // read quantiles off the merged digest; the log-spaced bins bound
    // relative error at ~2%, so the oracle checks against the exact
    // percentile with a 5% band.
    Qdef(
      "c05_qdigest_merge",
      """SELECT true AS p50_ok, true AS p90_ok
        |FROM (SELECT 1) one""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
      val perStatus = ord.groupBy("o_orderstatus")
        .agg(expr("qdigest_agg(o_totalprice)").as("qd"))
      val merged = perStatus
        .agg(expr("merge_qdigest(qd)").as("qd"))
        .select(
          expr("value_at_quantile(qd, 0.5)").as("est50"),
          expr("value_at_quantile(qd, 0.9)").as("est90"))
      val exact = ord.agg(
        expr("percentile(o_totalprice, 0.5)").as("ex50"),
        expr("percentile(o_totalprice, 0.9)").as("ex90"))
      merged.join(broadcast(exact))
        .select(
          (abs(col("est50") - col("ex50")) <= col("ex50") * 0.05).as("p50_ok"),
          (abs(col("est90") - col("ex90")) <= col("ex90") * 0.05).as("p90_ok"))
    },

    // t-digest behavior (reference: TDigestAggregationFunction.java +
    // TDigestFunctions.java): per-status digests merged WITHOUT raw data,
    // quantiles read off the merged digest. δ=100 bounds rank error at
    // O(q(1-q)/δ), so a 2% value band on a smooth distribution holds with
    // wide margin; the inverse read must round-trip the median's rank.
    Qdef(
      "c06_tdigest_merge",
      """SELECT true AS p50_ok, true AS p90_ok, true AS p99_ok, true AS inv_ok
        |FROM (SELECT 1) one""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
      val perStatus = ord.groupBy("o_orderstatus")
        .agg(expr("tdigest_agg(o_totalprice)").as("td"))
      val merged = perStatus
        .agg(expr("merge_tdigest(td)").as("td"))
        .select(
          expr("td_value_at_quantile(td, 0.5)").as("est50"),
          expr("td_value_at_quantile(td, 0.9)").as("est90"),
          expr("element_at(td_values_at_quantiles(td, array(0.99D)), 1)").as("est99"),
          expr("td_quantile_at_value(td, td_value_at_quantile(td, 0.5))").as("invq"))
      val exact = ord.agg(
        expr("percentile(o_totalprice, 0.5)").as("ex50"),
        expr("percentile(o_totalprice, 0.9)").as("ex90"),
        expr("percentile(o_totalprice, 0.99)").as("ex99"))
      merged.join(broadcast(exact))
        .select(
          (abs(col("est50") - col("ex50")) <= col("ex50") * 0.02).as("p50_ok"),
          (abs(col("est90") - col("ex90")) <= col("ex90") * 0.02).as("p90_ok"),
          (abs(col("est99") - col("ex99")) <= col("ex99") * 0.02).as("p99_ok"),
          (abs(col("invq") - 0.5) <= 0.02).as("inv_ok"))
    }
  )
}
