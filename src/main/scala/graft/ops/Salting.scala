package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY "Optimize for scale" — skewed
  * keys → salting or AQE skew-join). Two-phase aggregation: spread each
  * hot key over `buckets` salted sub-keys (random-free: salt derives from
  * a row hash, so results are deterministic), partially aggregate, then
  * combine. The salted shuffle distributes a hot key across `buckets`
  * reducers instead of one — the standard fix when one key holds 10% of
  * 100 TB. AQE's skewJoin handles the join case; this handles the
  * aggregation case AQE doesn't touch.
  */
object Salting {

  /** Deterministic salt in [0, buckets): hash of the full row's unique
    * column, not rand(), so reruns and retries agree. */
  def salt(unique: Column, buckets: Int): Column =
    pmod(xxhash64(unique), lit(buckets))

  /** groupBy(key).agg(sum(value)) with a salted first phase. */
  def saltedSum(
      df: DataFrame, key: Column, value: Column, unique: Column,
      buckets: Int = 16, resultName: String = "total"): DataFrame =
    df.select(key.as("__k"), value.as("__v"),
        salt(unique, buckets).as("__salt"))
      .groupBy("__k", "__salt")                 // phase 1: hot key spread
      .agg(sum("__v").as("__partial"))
      .groupBy(col("__k"))                      // phase 2: tiny combine
      .agg(sum("__partial").as(resultName))
}
