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
    }
  )
}
