package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
