package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-flavor corpus (SURVEY §2.3) beyond what the TPC-H shapes cover:
  * right/full outer, cross, non-equi residuals, null-aware NOT IN, and
  * IN-as-projected-boolean. Reference operators: presto-main/.../operator/
  * LookupJoinOperator.java + LookupOuterOperator.java (outer),
  * NestedLoopJoinOperator.java (cross/theta), HashSemiJoinOperator.java
  * (semi with projected boolean); 158 reference tests in
  * presto-tests/.../AbstractTestJoinQueries.java.
  */
object Joins {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // RIGHT OUTER: every nation survives, nations without suppliers get
    // NULL-extended rows (counted via the c_count=0 trick).
    Qdef(
      "j01_right_outer",
      """SELECT n_name, count(s_suppkey) AS n_suppliers
        |FROM supplier
        |RIGHT JOIN nation ON s_nationkey = n_nationkey AND s_acctbal > 9000
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey") && col("s_acctbal") > 9000,
          "right")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy("n_name")
    },

    // FULL OUTER of two aggregates — both unmatched sides preserved.
    Qdef(
      "j02_full_outer",
      """SELECT coalesce(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
        |      WHERE c_acctbal > 9900 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
        |           WHERE s_acctbal > 9900 GROUP BY s_nationkey) s
        |  ON c.nk = s.nk
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("c_nk")).agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").filter(col("s_acctbal") > 9900)
        .groupBy(col("s_nationkey").as("s_nk")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nk") === col("s_nk"), "full")
        .select(coalesce(col("c_nk"), col("s_nk")).as("nk"),
          col("n_cust"), col("n_supp"))
        .orderBy("nk")
    },

    // CROSS JOIN (cartesian of two small derived tables).
    Qdef(
      "j03_cross_join",
      """SELECT r_name, st
        |FROM region
        |CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) statuses
        |ORDER BY r_name, st""".stripMargin) { (s, dir) =>
      t(s, dir, "region").select("r_name")
        .crossJoin(t(s, dir, "orders").select(col("o_orderstatus").as("st")).distinct())
        .orderBy("r_name", "st")
    },

    // Equi join + non-equi residual (s_acctbal > c_acctbal stays a join
    // filter, reference: presto-main/.../operator/JoinFilterFunction.java).
    Qdef(
      "j04_non_equi_residual",
      """SELECT n_name, count(*) AS richer_pairs
        |FROM supplier
        |JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal + 9000
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "supplier")
        .join(t(s, dir, "customer"),
          col("s_nationkey") === col("c_nationkey") &&
          col("s_acctbal") > col("c_acctbal") + 9000)
        .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("richer_pairs"))
        .orderBy("n_name")
    },

    // Null-aware NOT IN: one NULL in the subquery list makes every NOT IN
    // evaluate UNKNOWN → zero rows. The DataFrame side encodes the same
    // null-aware anti join by hand (match-if-equal-or-null), which is what
    // Spark's NullAwareAntiJoin and the reference's planner both produce
    // (reference: presto-main/.../iterative/rule/
    // TransformUncorrelatedInPredicateSubqueryToSemiJoin.java).
    Qdef(
      "j05_null_aware_not_in",
      """SELECT count(*) AS n
        |FROM lineitem
        |WHERE l_suppkey NOT IN (SELECT nullif(s_suppkey, 3) FROM supplier)""".stripMargin) { (s, dir) =>
      val sub = t(s, dir, "supplier")
        .select(nullif(col("s_suppkey"), lit(3)).as("maybe_key"))
      // r16 (guide §3.1): the hand-encoded null-aware form
      // (anti join ON key = maybe_key OR maybe_key IS NULL) can only
      // plan as a nested-loop join — the OR disjunction has no equi
      // key, so every lineitem row scanned the broadcast list
      // (measured ~1.5 s at sf0.1). The null-awareness factors out of
      // the join instead: NOT IN is UNKNOWN for every row when the
      // subquery contains ANY null (zero rows), and a plain equi ANTI
      // join otherwise — so a broadcast 1-row has-null flag gates the
      // stream and the join becomes a hash-planable equi anti join.
      // Empty subquery: max(...) over zero rows is NULL → coalesce
      // false → all rows kept, and the anti join keeps them too —
      // exactly NOT IN over an empty list. Same count for every input.
      val hasNull = sub.agg(
        coalesce(max(col("maybe_key").isNull), lit(false)).as("has_null"))
      t(s, dir, "lineitem")
        .crossJoin(broadcast(hasNull))
        .filter(!col("has_null"))
        .join(sub.filter(col("maybe_key").isNotNull),
          col("l_suppkey") === col("maybe_key"), "left_anti")
        .agg(count(lit(1)).as("n"))
    },

    // LATERAL correlated derived table (reference: planner/plan/
    // LateralJoinNode.java, grammar SqlBase.g4:327) — decorrelated to a
    // pre-aggregated join on the DataFrame side, real LATERAL in the SQL.
    Qdef(
      "j07_lateral",
      // LEFT JOIN LATERAL ... ON TRUE, not the comma form: a correlated
      // scalar-aggregate lateral yields one row per outer row in the
      // reference (max over an empty group = NULL), but DuckDB lowers the
      // comma form to an inner join and DROPS outer rows with no matches
      // — visible at sf0.001 where only 10 of 25 nations have suppliers.
      """SELECT n_name, top_bal
        |FROM nation
        |LEFT JOIN LATERAL (SELECT max(s_acctbal) AS top_bal FROM supplier
        |                   WHERE s_nationkey = n_nationkey) t ON TRUE
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val topPerNation = t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(max("s_acctbal").as("top_bal"))
      broadcast(t(s, dir, "nation"))
        .join(topPerNation, col("n_nationkey") === col("s_nationkey"), "left")
        .select(col("n_name"), col("top_bal"))
        .orderBy("n_name")
    },

    // Skewed-key aggregation via deterministic salting (ops.Salting):
    // two-phase sum spreads each hot key over 16 reducers; result equals
    // the plain GROUP BY the oracle runs.
    Qdef(
      "j08_salted_aggregation",
      """SELECT event_type, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.ops.Salting.saltedSum(
          t(s, dir, "events"), col("event_type"), col("value"), col("event_id"))
        .select(col("__k").as("event_type"), round(col("total"), 2).as("total"))
        .orderBy("event_type")
    },

    // Semi join projected as a boolean column instead of a filter
    // (reference: HashSemiJoinOperator.java emits the match flag).
    Qdef(
      "j06_semi_projected_flag",
      """SELECT o_orderkey,
        |       o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |         AS rich_customer
        |FROM orders
        |WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("rich_key")).distinct()
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .join(rich, col("o_custkey") === col("rich_key"), "left")
        .select(col("o_orderkey"), col("rich_key").isNotNull.as("rich_customer"))
        .orderBy("o_orderkey")
    },

    // AS-OF join (ops/AsOfJoin): for every error event, the latest click
    // by the same user at or before it — verified against DuckDB's native
    // ASOF LEFT JOIN, whose inclusive-backward contract matches.
    Qdef.duckOnly(
      "j09_asof_join",
      """SELECT e.event_id,
        |  c.ts AS asof_ts, c.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'error' AND user_id < 40) e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error" && col("user_id") < 40)
      val clicks = ev.filter(col("event_type") === "click")
      graft.ops.AsOfJoin.asOf(
          errors, clicks, Seq("user_id"), "ts", "ts", Seq("ts", "value"))
        .select(col("event_id"), col("asof_ts"), col("asof_value"))
        .orderBy("event_id")
    },

    // Range join with NO equi key (ops/RangeJoin): clicks that fall in
    // the ±5-minute window around ANY error event, via time-bucketed
    // equi-join + residual — never a nested-loop. The oracle replays the
    // raw inequality join (fine at oracle scale, quadratic at ours).
    Qdef.duckOnly(
      "j10_range_join",
      """SELECT CAST(count(DISTINCT c.event_id) AS BIGINT) AS clicks_near_errors
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT ts - INTERVAL 5 MINUTE AS s, ts + INTERVAL 5 MINUTE AS e
        |      FROM events WHERE event_type = 'error') iv
        |  ON c.ts BETWEEN iv.s AND iv.e""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
      val windows = ev.filter(col("event_type") === "error")
        .select(
          (col("ts") - expr("INTERVAL '5' MINUTE")).as("s"),
          (col("ts") + expr("INTERVAL '5' MINUTE")).as("e"))
      graft.ops.RangeJoin.pointInInterval(clicks, "ts", windows, "s", "e")
        .agg(countDistinct("event_id").as("clicks_near_errors"))
    }
  )
}
