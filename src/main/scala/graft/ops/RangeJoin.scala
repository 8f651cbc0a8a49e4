package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join WITHOUT an equi key: points matched to intervals
  * that contain them. Spark's planner can only run a pure inequality join
  * as BroadcastNestedLoop/Cartesian — quadratic, dead at scale. The
  * standard scale-out shape (one of the brief's named custom-operator
  * extensions) is TIME BUCKETING: quantize both sides to fixed-width
  * buckets, explode each interval over the buckets it covers, equi-join
  * on the bucket id, then apply the exact containment predicate as a
  * residual filter. Shuffles are hash-on-bucket; interval replication is
  * ceil(len/bucket)+1 rows — bounded and tunable. PlanSpec asserts the
  * plan has no nested-loop join.
  */
object RangeJoin {

  private def bucketOf(ts: Column, bucketSeconds: Long): Column =
    floor(unix_timestamp(ts) / bucketSeconds)

  /** Join `points` (timestamp `ptCol`) to `intervals` ([startCol, endCol]
    * inclusive). Returns point rows + the matched interval's columns;
    * a point inside k overlapping intervals appears k times (standard
    * interval-join semantics — dedup downstream if needed). */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 600): DataFrame = {
    val p = points.withColumn("__b", bucketOf(col(ptCol), bucketSeconds))
    val iv = intervals.withColumn("__bs", bucketOf(col(startCol), bucketSeconds))
      .withColumn("__be", bucketOf(col(endCol), bucketSeconds))
      .withColumn("__b", explode(expr("sequence(__bs, __be)")))
      .drop("__bs", "__be")
    p.join(iv, Seq("__b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__b")
  }
}
