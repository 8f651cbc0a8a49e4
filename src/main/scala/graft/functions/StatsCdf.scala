package graft.functions

import org.apache.commons.math3.distribution.{BetaDistribution, BinomialDistribution, CauchyDistribution, ChiSquaredDistribution, PoissonDistribution, WeibullDistribution}
import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.SparkSession

/** Statistical CDF scalars (reference: presto-main/.../operator/scalar/
  * MathFunctions.java:760-1010 — the reference itself computes these with
  * commons-math3, the same library bundled with Spark, so values agree
  * bit-for-bit). Argument order and the loud range checks mirror the
  * reference's checkCondition messages.
  */
object StatsCdf {

  private def check(cond: Boolean, msg: String): Unit =
    if (!cond) throw new IllegalArgumentException(msg)

  private[functions] def normalCdf(mean: Double, sd: Double, value: Double): Double = {
    check(sd > 0, "standardDeviation must be > 0")
    0.5 * (1 + Erf.erf((value - mean) / (sd * math.sqrt(2))))
  }

  private[functions] def inverseNormalCdf(mean: Double, sd: Double, p: Double): Double = {
    check(p > 0 && p < 1, "p must be 0 > p > 1")
    check(sd > 0, "sd must be > 0")
    mean + sd * 1.4142135623730951 * Erf.erfInv(2 * p - 1)
  }

  private[functions] def betaCdf(a: Double, b: Double, value: Double): Double = {
    check(value >= 0 && value <= 1, "value must be in the interval [0, 1]")
    check(a > 0, "a must be > 0")
    check(b > 0, "b must be > 0")
    new BetaDistribution(a, b).cumulativeProbability(value)
  }

  private[functions] def inverseBetaCdf(a: Double, b: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    check(a > 0, "a must be > 0")
    check(b > 0, "b must be > 0")
    new BetaDistribution(a, b).inverseCumulativeProbability(p)
  }

  private[functions] def cauchyCdf(median: Double, scale: Double, value: Double): Double = {
    check(scale > 0, "scale must be greater than 0")
    new CauchyDistribution(median, scale).cumulativeProbability(value)
  }

  private[functions] def inverseCauchyCdf(median: Double, scale: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    check(scale > 0, "scale must be greater than 0")
    new CauchyDistribution(median, scale).inverseCumulativeProbability(p)
  }

  private[functions] def chiSquaredCdf(df: Double, value: Double): Double = {
    check(value >= 0, "value must non-negative")
    check(df > 0, "df must be greater than 0")
    new ChiSquaredDistribution(df).cumulativeProbability(value)
  }

  private[functions] def inverseChiSquaredCdf(df: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    check(df > 0, "df must be greater than 0")
    new ChiSquaredDistribution(df).inverseCumulativeProbability(p)
  }

  private[functions] def poissonCdf(lambda: Double, value: Long): Double = {
    check(value >= 0, "value must be a non-negative integer")
    check(lambda > 0, "lambda must be greater than 0")
    new PoissonDistribution(lambda).cumulativeProbability(value.toInt)
  }

  private[functions] def inversePoissonCdf(lambda: Double, p: Double): Int = {
    check(p >= 0 && p < 1, "p must be in the interval [0, 1)")
    check(lambda > 0, "lambda must be greater than 0")
    new PoissonDistribution(lambda).inverseCumulativeProbability(p)
  }

  private[functions] def binomialCdf(trials: Int, sp: Double, value: Int): Double = {
    check(sp >= 0 && sp <= 1, "successProbability must be in the interval [0, 1]")
    check(trials > 0, "numberOfTrials must be greater than 0")
    new BinomialDistribution(trials, sp).cumulativeProbability(value)
  }

  private[functions] def inverseBinomialCdf(trials: Int, sp: Double, p: Double): Int = {
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    check(sp >= 0 && sp <= 1, "successProbability must be in the interval [0, 1]")
    check(trials > 0, "numberOfTrials must be greater than 0")
    new BinomialDistribution(trials, sp).inverseCumulativeProbability(p)
  }

  private[functions] def weibullCdf(a: Double, b: Double, value: Double): Double = {
    check(a > 0, "a must be greater than 0")
    check(b > 0, "b must be greater than 0")
    new WeibullDistribution(a, b).cumulativeProbability(value)
  }

  private[functions] def inverseWeibullCdf(a: Double, b: Double, p: Double): Double = {
    check(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    check(a > 0, "a must be greater than 0")
    check(b > 0, "b must be greater than 0")
    new WeibullDistribution(a, b).inverseCumulativeProbability(p)
  }

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("normal_cdf", normalCdf _)
    spark.udf.register("inverse_normal_cdf", inverseNormalCdf _)
    spark.udf.register("beta_cdf", betaCdf _)
    spark.udf.register("inverse_beta_cdf", inverseBetaCdf _)
    spark.udf.register("cauchy_cdf", cauchyCdf _)
    spark.udf.register("inverse_cauchy_cdf", inverseCauchyCdf _)
    spark.udf.register("chi_squared_cdf", chiSquaredCdf _)
    spark.udf.register("inverse_chi_squared_cdf", inverseChiSquaredCdf _)
    spark.udf.register("poisson_cdf", poissonCdf _)
    spark.udf.register("inverse_poisson_cdf", inversePoissonCdf _)
    spark.udf.register("binomial_cdf", binomialCdf _)
    spark.udf.register("inverse_binomial_cdf", inverseBinomialCdf _)
    spark.udf.register("weibull_cdf", weibullCdf _)
    spark.udf.register("inverse_weibull_cdf", inverseWeibullCdf _)
  }
}
