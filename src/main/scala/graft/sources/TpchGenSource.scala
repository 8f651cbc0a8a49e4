package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 generator connector (reference: the presto-tpch
  * connector — `presto-tpch/src/main/java/com/facebook/presto/tpch/
  * TpchConnectorFactory.java` — which serves deterministic TPC-H data
  * straight from a generator, no storage). This is the same connector
  * contract re-expressed on Spark's DSv2 SPI, the engine's second
  * source kind after parquet files:
  *
  *   spark.read.format("graft-tpch")
  *     .option("rows", 60000).option("splits", 16).load()
  *
  * serves an orders-shaped table whose every cell is a pure integer
  * function of the row key — deterministic across runs, partitions and
  * engines (an external oracle can regenerate it from a row-number
  * sequence, which is how the corpus verifies it).
  *
  * Scale shape — the three things a real connector must get right:
  *   - SupportsPushDownRequiredColumns: the reader materializes ONLY
  *     the pruned columns (a projection of 2 columns generates 2).
  *   - SupportsPushDownFilters: o_orderkey comparisons are consumed
  *     into a key range (the generator's "index"); everything else is
  *     left to Spark as a post-scan filter.
  *   - planInputPartitions: the key space splits into `splits` ranges,
  *     and ranges fully outside the pushed key range are NOT planned —
  *     connector-side partition pruning, the analogue of the
  *     reference's per-node tpch splits
  *     (`TpchSplitManager.java` assigns one part per node/driver).
  */
class TpchGenProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tpch"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TpchGen.defFor(options.getOrDefault("table", "orders"),
      Option(options.get("rows")).map(_.toLong).getOrElse(15000L),
      Option(options.get("parts")).map(_.toLong).getOrElse(2000L),
      Option(options.get("suppliers")).map(_.toLong).getOrElse(100L)).schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(15000L)
    val parts = Option(properties.get("parts")).map(_.toLong).getOrElse(2000L)
    val suppliers =
      Option(properties.get("suppliers")).map(_.toLong).getOrElse(100L)
    val splits = Option(properties.get("splits")).map(_.toInt).getOrElse(8)
    require(rows >= 0, s"rows must be non-negative, got $rows")
    require(parts >= 0 && suppliers >= 1,
      s"parts must be non-negative and suppliers positive, got $parts/$suppliers")
    require(splits >= 1, s"splits must be positive, got $splits")
    val table = Option(properties.get("table")).getOrElse("orders")
    new TpchGenTable(TpchGen.defFor(table, rows, parts, suppliers), splits)
  }
}

object TpchGen {
  /** One generated table: a schema, a dense key range, per-column
    * closed-form generators, and the key-range mapping of the ONE
    * monotone "index" column filters push into (the generator's
    * analogue of the reference connector's per-table predicate
    * contract, `TpchMetadata.java:139-165` getTableLayouts). */
  final case class GenDef(
      schema: StructType,
      keyLo: Long, keyHi: Long,
      pushCol: String,
      // first/last key whose pushCol value is >= / <= the given value
      firstKeyAtOrAbove: Long => Long,
      lastKeyAtOrBelow: Long => Long,
      gen: String => Long => Any)

  /** orders-shaped schema; every value is a closed-form function of the
    * key so external engines can regenerate it:
    *   o_custkey       = (k * 2654435761) % 99991
    *   o_totalprice    = (k * 7621) % 900000 + 100000   (whole dollars —
    *                     exact in DOUBLE, no cent rounding)
    *   o_orderdate     = epoch day 9000 + (k * 13) % 2557
    *   o_orderpriority = PRIORITIES[(k * 11) % 5]
    */
  val schema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false),
    StructField("o_orderdate", DateType, nullable = false),
    StructField("o_orderpriority", StringType, nullable = false)))

  /** partsupp for the fixture star schema (0-based keys like the
    * parquet part/supplier tables): 4 suppliers per part via dbgen's
    * published assignment formula (TPC-H spec 4.2.3 / reference
    * presto-tpch serves the same generator layout), quantities and
    * whole-dollar costs as closed forms of the row key:
    *   row key k in [0, 4*parts);  p = k / 4;  i = k % 4
    *   ps_suppkey    = (p + i * (S/4 + p/S)) % S         (S = suppliers)
    *   ps_availqty   = (k * 7919) % 9999 + 1
    *   ps_supplycost = (k * 6271) % 900 + 100            (exact DOUBLE)
    */
  val partsuppSchema: StructType = StructType(Seq(
    StructField("ps_partkey", LongType, nullable = false),
    StructField("ps_suppkey", LongType, nullable = false),
    StructField("ps_availqty", IntegerType, nullable = false),
    StructField("ps_supplycost", DoubleType, nullable = false)))

  val priorities: Array[String] =
    Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def custkey(k: Long): Long = (k * 2654435761L) % 99991L
  def totalprice(k: Long): Double = ((k * 7621L) % 900000L + 100000L).toDouble
  def orderdateDays(k: Long): Int = (9000L + (k * 13L) % 2557L).toInt
  def priority(k: Long): String = priorities(((k * 11L) % 5L).toInt)

  def psSuppkey(k: Long, suppliers: Long): Long = {
    val p = k / 4; val i = k % 4
    (p + i * (suppliers / 4 + p / suppliers)) % suppliers
  }
  def psAvailqty(k: Long): Int = ((k * 7919L) % 9999L + 1L).toInt
  def psSupplycost(k: Long): Double = ((k * 6271L) % 900L + 100L).toDouble

  def defFor(table: String, rows: Long, parts: Long, suppliers: Long): GenDef =
    table match {
      case "orders" => GenDef(
        schema, 1L, rows, "o_orderkey", identity, identity,
        {
          case "o_orderkey" => (k: Long) => k
          case "o_custkey" => (k: Long) => custkey(k)
          case "o_totalprice" => (k: Long) => totalprice(k)
          case "o_orderdate" => (k: Long) => orderdateDays(k)
          case "o_orderpriority" =>
            (k: Long) => UTF8String.fromString(priority(k))
          case other =>
            throw new IllegalArgumentException(s"unknown column $other")
        })
      case "partsupp" => GenDef(
        partsuppSchema, 0L, 4 * parts - 1, "ps_partkey",
        v => 4 * v, v => 4 * v + 3,
        {
          case "ps_partkey" => (k: Long) => k / 4
          case "ps_suppkey" => (k: Long) => psSuppkey(k, suppliers)
          case "ps_availqty" => (k: Long) => psAvailqty(k)
          case "ps_supplycost" => (k: Long) => psSupplycost(k)
          case other =>
            throw new IllegalArgumentException(s"unknown column $other")
        })
      case other => throw new IllegalArgumentException(
        s"graft-tpch serves tables orders|partsupp, got '$other'")
    }
}

class TpchGenTable(tdef: TpchGen.GenDef, splits: Int)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft_tpch(${tdef.pushCol} in [${tdef.keyLo}, ${tdef.keyHi}])"
  override def schema(): StructType = tdef.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TpchGenScanBuilder(tdef, splits)
}

class TpchGenScanBuilder(tdef: TpchGen.GenDef, splits: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo: Long = tdef.keyLo
  private var hi: Long = tdef.keyHi
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tdef.schema

  /** Consume index-column comparisons into the generator's key range;
    * the rest stays with Spark. A consumed filter is FULLY answered by
    * the range (the index column is monotone over the dense key space),
    * so it is not re-evaluated post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val idx = tdef.pushCol
    val (consumed, rest) = filters.partition {
      case sources.GreaterThan(`idx`, v: Long) =>
        lo = math.max(lo, tdef.firstKeyAtOrAbove(v + 1)); true
      case sources.GreaterThanOrEqual(`idx`, v: Long) =>
        lo = math.max(lo, tdef.firstKeyAtOrAbove(v)); true
      case sources.LessThan(`idx`, v: Long) =>
        hi = math.min(hi, tdef.lastKeyAtOrBelow(v - 1)); true
      case sources.LessThanOrEqual(`idx`, v: Long) =>
        hi = math.min(hi, tdef.lastKeyAtOrBelow(v)); true
      case sources.EqualTo(`idx`, v: Long) =>
        lo = math.max(lo, tdef.firstKeyAtOrAbove(v))
        hi = math.min(hi, tdef.lastKeyAtOrBelow(v)); true
      // every generated column is non-nullable, so Spark's synthesized
      // IsNotNull guards are vacuously true — consume them too
      case sources.IsNotNull(col) if tdef.schema.fieldNames.contains(col) => true
      case _ => false
    }
    pushed = consumed
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TpchGenScan(tdef, lo, hi, splits, required)
}

class TpchGenScan(
    tdef: TpchGen.GenDef, lo: Long, hi: Long, splits: Int,
    required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tpch keys [$lo, $hi] cols ${required.fieldNames.mkString(",")}"

  /** Ranges fully outside [lo, hi] are never planned — the pruning a
    * pushed key predicate buys at the split level. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi < lo) return Array.empty
    val total = hi - lo + 1
    val n = math.min(splits.toLong, total).toInt
    (0 until n).map { i =>
      val start = lo + total * i / n
      val end = lo + total * (i + 1) / n - 1
      TpchGenPartition(start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TpchGenReaderFactory(tdef, required)
}

case class TpchGenPartition(start: Long, end: Long) extends InputPartition

class TpchGenReaderFactory(tdef: TpchGen.GenDef, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TpchGenPartition]
    // column generators bound once per split, not per row
    val gens: Array[Long => Any] = required.fieldNames.map(tdef.gen)
    new PartitionReader[InternalRow] {
      private var k = p.start - 1
      override def next(): Boolean = { k += 1; k <= p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(k)).toSeq)
      override def close(): Unit = ()
    }
  }
}
