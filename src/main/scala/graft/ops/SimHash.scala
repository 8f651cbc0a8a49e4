package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting with a dialect-neutral hash family so
  * results are verifiable by any engine with md5/substr: bit j of a
  * token's hash is the high bit of the j-th hex digit of md5(token)
  * (digit ∈ '89abcdef' → 1, else 0). The document signature bit j is the
  * sign of Σ_tokens (±1). 16 bits keeps oracle SQL tractable; the
  * hamming-distance helper works for any width.
  *
  * North-star LLM-pipeline extension (SURVEY §7 Phase 5); the reference
  * has no fingerprinting operator.
  */
object SimHash {

  val Bits = 16

  /** Per-document 16-bit signature as a '0'/'1' string, MSB-first
    * (bit 1 = first md5 hex digit). Distributed: explode tokens, one
    * partial-aggregated groupBy — no driver involvement. */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode(split(col(textCol), " ")).as("__tok"))
      .filter(col("__tok") =!= "")
      .withColumn("__h", md5(col("__tok")))
    val bitSums = (1 to Bits).map { j =>
      sum(when(instr(lit("89abcdef"), substring(col("__h"), j, 1)) > 0, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val sums = toks.groupBy(col("__id")).agg(bitSums.head, bitSums.tail: _*)
    val bitChars = (1 to Bits).map(j =>
      when(col(s"b$j") > 0, "1").otherwise("0"))
    sums.select(col("__id").as(idCol), concat(bitChars: _*).as("simhash"))
  }

  /** Hamming distance between two equal-width bit strings. */
  def hamming(a: Column, b: Column): Column =
    expr(s"size(filter(sequence(1, $Bits), i -> " +
      s"substr(${a.toString}, i, 1) <> substr(${b.toString}, i, 1)))")
}
