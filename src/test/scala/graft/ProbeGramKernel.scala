package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolation probe for the r16 char-gram kernel: times explode →
  * partial-style aggregate over the x06 gram stream under four variants
  * (expression vs kernel × 2-split scan vs spread), so the kernel's and
  * the spread's contributions separate. Interleaved A-B-A-B, 3 rounds.
  */
object ProbeGramKernel {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("text"))

    val exprGrams = expr(
      """case when length(text) < 3 then cast(array() as array<string>)
        |else transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))
        |end""".stripMargin)
    val kernGrams = call_function("graft_char_grams", col("text"))

    def base(spreadIt: Boolean): DataFrame =
      if (spreadIt)
        docs.repartition(spark.sparkContext.defaultParallelism)
      else docs

    def variant(name: String, g: org.apache.spark.sql.Column,
        spreadIt: Boolean): (String, () => Unit) =
      name -> (() => {
        base(spreadIt)
          .select(col("doc_id"), col("lang"), explode(g).as("g"))
          .select(col("doc_id"), col("lang"), col("g")).distinct()
          .write.format("noop").mode("overwrite").save()
      })

    val variants = Seq(
      variant("expr_raw   ", exprGrams, spreadIt = false),
      variant("expr_spread", exprGrams, spreadIt = true),
      variant("kern_raw   ", kernGrams, spreadIt = false),
      variant("kern_spread", kernGrams, spreadIt = true))

    // prewarm all
    variants.foreach(_._2())
    for (round <- 1 to 3) {
      for ((name, run) <- variants) {
        val t0 = System.nanoTime()
        run()
        println(f"[gramk] round $round $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
