package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 generator connector's three connector obligations
  * (graft.sources.TpchGenSource; reference contract: the presto-tpch
  * connector's metadata/split/record-cursor triple): column pruning
  * reaches the reader, key predicates are consumed into the generator's
  * range, and out-of-range splits are never planned.
  */
class SourcesSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def table = spark.read.format("graft-tpch")
    .option("rows", "10000").option("splits", "8").load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get

  test("deterministic generation matches the closed forms") {
    val row = table.filter(col("o_orderkey") === 7L).collect()(0)
    assert(row.getLong(0) == 7L)
    assert(row.getLong(1) == (7L * 2654435761L) % 99991L)
    assert(row.getDouble(2) == ((7L * 7621L) % 900000L + 100000L).toDouble)
    assert(row.getDate(3).toLocalDate.toEpochDay == 9000L + (7L * 13L) % 2557L)
    assert(row.getString(4) == graft.sources.TpchGen.priorities(((7L * 11L) % 5L).toInt))
    assert(table.count() == 10000L)
  }

  test("column pruning reaches the reader schema") {
    val pruned = table.select("o_orderkey", "o_orderpriority")
    assert(scanOf(pruned).scan.readSchema().fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderpriority"))
  }

  test("key predicates are consumed into the generator range; others stay post-scan") {
    val df = table.filter(col("o_orderkey") > 2000L && col("o_orderkey") <= 6000L)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("keys [2001, 6000]"), scan.scan.description())
    assert(df.count() == 4000L)
    // a consumed filter is fully answered by the range: no Filter node
    // re-checks o_orderkey above the scan
    val hasResidual = df.queryExecution.executedPlan.toString
      .linesIterator.exists(l =>
        l.replace("RuntimeFilters", "").contains("Filter") && l.contains("o_orderkey"))
    assert(!hasResidual, "consumed key filter must not be re-evaluated post-scan")
    // a non-key filter stays with Spark and is NOT claimed by the scan
    val mixed = table.filter(col("o_custkey") > 50000L)
    assert(scanOf(mixed).scan.description().contains("keys [1, 10000]"),
      "a non-key predicate must not narrow the generator range")
    assert(mixed.queryExecution.executedPlan.toString
      .linesIterator.exists(l =>
        l.replace("RuntimeFilters", "").contains("Filter") && l.contains("o_custkey")),
      "residual filter must survive above the scan")
  }

  test("splits respect the narrowed range; an empty range plans zero partitions") {
    val narrowed = scanOf(table.filter(col("o_orderkey") <= 16L))
    // 16 keys across 8 requested splits: every planned split is inside the range
    assert(narrowed.inputPartitions.size == 8)
    assert(narrowed.inputPartitions.forall {
      case graft.sources.TpchGenPartition(s, e) => s >= 1 && e <= 16 && s <= e
    })
    val empty = scanOf(table.filter(col("o_orderkey") > 999999L))
    assert(empty.inputPartitions.isEmpty, "out-of-range scan must plan no splits")
    // fewer keys than splits degrades to one split per key
    val tiny = scanOf(table.filter(col("o_orderkey") === 5000L))
    assert(tiny.inputPartitions.size == 1)
  }

  private def partsuppTable = spark.read.format("graft-tpch")
    .option("table", "partsupp")
    .option("parts", "500").option("suppliers", "100")
    .option("splits", "8").load()

  test("partsupp: dbgen pair layout, closed forms, and partkey pushdown") {
    // 4 suppliers per part, all pairs distinct, suppliers within range.
    // Pair distinctness holds when the dbgen step (S/4 + p/S) never
    // divides S for a reachable p — true at the fixture ratios
    // (S=100/P=2000, S=1000/P=20000) and here; a tiny S like 10 can
    // collide, which only costs the PK property, not determinism.
    val ps = partsuppTable
    assert(ps.count() == 2000L)
    val stats = ps.agg(
      countDistinct(col("ps_partkey")).as("parts"),
      countDistinct(col("ps_partkey"), col("ps_suppkey")).as("pairs"),
      max("ps_suppkey").as("maxs"), min("ps_suppkey").as("mins")).collect()(0)
    assert(stats.getLong(0) == 500L && stats.getLong(1) == 2000L)
    assert(stats.getLong(2) <= 99L && stats.getLong(3) >= 0L)
    // closed forms at row key k = 10: p = 2, i = 2
    val row = ps.filter(col("ps_partkey") === 2L)
      .orderBy("ps_suppkey").collect()
    assert(row.length == 4, "every part has exactly 4 suppliers")
    // partkey range consumption prunes the key space 4:1
    val narrowed = scanOf(ps.filter(col("ps_partkey") === 123L))
    assert(narrowed.scan.description().contains("keys [492, 495]"),
      narrowed.scan.description())
    assert(ps.filter(col("ps_partkey") === 123L).count() == 4L)
  }
}
