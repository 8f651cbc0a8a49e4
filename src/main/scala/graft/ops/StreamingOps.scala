package graft.ops

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming plumbing for the `events` table (SURVEY §2.10).
  * The reference has no streaming runtime — Kafka topics are scanned as
  * batch tables (reference: presto-kafka/.../KafkaMetadata.java:61,120,
  * KafkaSplitManager.java:117-120 — splits are offset ranges captured at
  * plan time); Structured Streaming is the north-star upgrade. On a real
  * cluster the same code reads Kafka/files continuously; here the parquet
  * fixture is replayed with Trigger.AvailableNow so results are
  * deterministic and batch-verifiable.
  */
object StreamingOps {

  /** `events` as a stream: same schema + ts normalization as Tables.load
    * (nanos-as-long → micros; TIMESTAMP_NTZ → TimestampType — watermarks
    * reject NTZ event time, and the session TZ is pinned UTC so the cast
    * is value-preserving), via the file stream source. */
  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // The file stream source wants a directory; narrow it to the events
    // file with a glob filter.
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Run a streaming query to completion over the available data and
    * return the final result (memory sink; complete mode for
    * aggregations, append for joins/projections). */
  def runToCompletion(
      df: DataFrame, spark: SparkSession,
      mode: String = "complete"): DataFrame = {
    val name = "stream_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Run a stream through foreachBatch into parquet (the production sink
    * pattern: per-microbatch exactly-once file commits). */
  def runToParquet(df: DataFrame, outDir: String): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
