package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom function registry (SURVEY §2.11): the Spark equivalents of the
  * reference's annotated-function surface — scalar UDFs via
  * spark.udf.register (reference: @ScalarFunction + metadata/
  * FunctionListBuilder.java) and typed Aggregators via udaf() (reference:
  * @AggregationFunction compiled by aggregation/AccumulatorCompiler.java).
  * Registration is idempotent; every function is then SQL-invocable
  * through Engine.sql.
  */
object GraftFunctions {

  /** Presto map_union_sum (reference: presto-main/.../operator/
    * aggregation/MapUnionSumAggregation.java): merge maps, summing values
    * on key collisions. */
  class MapUnionSumAgg(enc: Encoder[Map[String, Long]])
      extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: Map[String, Long]): Map[String, Long] =
      merge(b, if (a == null) Map.empty else a)
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      b2.foldLeft(b1) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = enc
    def outputEncoder: Encoder[Map[String, Long]] = enc
  }

  /** Presto geometric_mean (reference: presto-main/.../operator/
    * aggregation/GeometricMeanAggregations.java): exp of the mean log.
    * Mergeable state (Σlog, n) — partial aggregation works. */
  object GeometricMeanAgg extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Light stemmer (reference: presto-main/.../operator/scalar/
    * WordStemFunction.java is Porter-based; this strips one plain English
    * suffix so the oracle can reproduce it with a single regex). */
  def wordStemLite(w: String): String =
    if (w == null) null else w.replaceAll("(ing|ed|s)$", "")

  /** Register everything on the session (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val mapEnc: Encoder[Map[String, Long]] = {
      implicit val strEnc: Encoder[String] = Encoders.STRING
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
    spark.udf.register("map_union_sum", udaf(new MapUnionSumAgg(mapEnc)))
    spark.udf.register("geometric_mean", udaf(GeometricMeanAgg))
    spark.udf.register("word_stem_lite", wordStemLite _)
  }
}
