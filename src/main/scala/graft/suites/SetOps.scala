package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation corpus (SURVEY §2.7). The reference plans INTERSECT and
  * EXCEPT as UNION ALL + marker counts (reference: presto-main/.../sql/
  * planner/optimizations/ImplementIntersectAndExceptAsUnion.java:74-111);
  * Catalyst rewrites them to semi/anti joins — same semantics, and the
  * ALL-variants keep multiplicities.
  */
object SetOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Two overlapping lineitem slices keyed by supplier. */
  private def slices(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = t(s, dir, "lineitem")
    (li.filter(col("l_returnflag") === "R").select(col("l_suppkey").as("sk")),
      li.filter(col("l_linestatus") === "F").select(col("l_suppkey").as("sk")))
  }

  val defs: Seq[Qdef] = Seq(

    Qdef(
      "s01_union_all",
      """SELECT count(*) AS n, count(DISTINCT sk) AS nd FROM (
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_linestatus = 'F'
        |) u""".stripMargin) { (s, dir) =>
      val (a, b) = slices(s, dir)
      a.union(b).agg(count(lit(1)).as("n"), countDistinct("sk").as("nd"))
    },

    Qdef(
      "s02_union_distinct",
      """SELECT count(*) AS n FROM (
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_returnflag = 'R'
        |  UNION
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_linestatus = 'F'
        |) u""".stripMargin) { (s, dir) =>
      val (a, b) = slices(s, dir)
      a.union(b).distinct().agg(count(lit(1)).as("n"))
    },

    Qdef(
      "s03_intersect",
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
        |  INTERSECT
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
        |) i ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nk"))
        .intersect(
          t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
            .select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Qdef(
      "s04_intersect_all",
      """SELECT count(*) AS n, count(DISTINCT sk) AS nd FROM (
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_linestatus = 'F'
        |) i""".stripMargin) { (s, dir) =>
      val (a, b) = slices(s, dir)
      a.intersectAll(b).agg(count(lit(1)).as("n"), countDistinct("sk").as("nd"))
    },

    Qdef(
      "s05_except",
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        |  EXCEPT
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
        |) e ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nk"))
        .except(
          t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
            .select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Qdef(
      "s06_except_all",
      """SELECT count(*) AS n, count(DISTINCT sk) AS nd FROM (
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT ALL
        |  SELECT l_suppkey AS sk FROM lineitem WHERE l_linestatus = 'F'
        |) e""".stripMargin) { (s, dir) =>
      val (a, b) = slices(s, dir)
      a.exceptAll(b).agg(count(lit(1)).as("n"), countDistinct("sk").as("nd"))
    }
  )
}
