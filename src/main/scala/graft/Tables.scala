package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table registry over the driver-generated testdata
  * (see TESTDATA.md / FIXTURES.md). The reference resolves tables via a
  * connector metadata layer (reference: presto-main/.../metadata/
  * MetadataManager.java); here every table is a parquet directory whose
  * schema comes from the footer, which keeps scans vectorized and lets
  * Catalyst push filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    // reader refuses; read it as a raw long (nanosAsLong, set in
    // Engine.session) and surface a micros-precision timestamp column so
    // every downstream operator sees a normal TimestampType.
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // `div` (integral division) — col/1000L would go through double and
      // lose exactness past 2^53 epoch-nanos.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
