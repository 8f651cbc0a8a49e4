package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved old-vs-new x06 language-id measurement (round-15): the
  * round-14 verdict asked for x06 ≤ ~1.7 s at canary 0.38 via a shared
  * gram pass; the host has been in a uniformly-slow window all round,
  * so absolute walls can't show whether the restructure helped. This
  * alternates the ORIGINAL shape (gram explode above the parity filter
  * — each branch re-explodes the whole corpus, langs re-derives the
  * profile) with the CURRENT SparkEntry implementation in one session.
  * Run: `sbt "Test/runMain graft.ProbeX06"`.
  */
object ProbeX06 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def oldShape(): DataFrame = {
      val docs = Tables.load(spark, sfDir, "documents")
      val grams = docs.select(col("doc_id"), col("lang"),
        explode(expr(
          """case when length(text) < 3 then cast(array() as array<string>)
            |else transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))
            |end""".stripMargin))
          .as("g"))
      val profW = Window.partitionBy("plang")
        .orderBy(col("cnt").desc, col("g").asc)
      val profile = grams.filter(col("doc_id") % 2 === 0)
        .groupBy(col("lang").as("plang"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(profW))
        .filter(col("rn") <= 50)
        .select(col("plang"), col("g"))
      val test = grams.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang").as("actual"), col("g")).distinct()
      val langs = profile.select(col("plang").as("cand")).distinct()
      val overlap = test.join(broadcast(profile),
          test("g") === profile("g"), "inner")
        .groupBy(col("doc_id"), col("actual"), col("plang").as("cand"))
        .agg(count(lit(1)).as("score"))
      val scores = docs
        .filter(col("doc_id") % 2 === 1 && length(col("text")) >= 3)
        .select(col("doc_id"), col("lang").as("actual"))
        .crossJoin(broadcast(langs))
        .join(overlap, Seq("doc_id", "actual", "cand"), "left")
        .select(col("doc_id"), col("actual"), col("cand"),
          coalesce(col("score"), lit(0L)).as("score"))
      val predW = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("cand").asc)
      scores
        .withColumn("rn", row_number().over(predW))
        .filter(col("rn") === 1)
        .groupBy(col("actual"), col("cand").as("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("actual", "predicted")
    }

    val newShape = SparkEntry.allDefs.find(_.name == "x06_language_id").get

    def time(build: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // prewarm both
    time(() => oldShape()); time(() => newShape.run(spark, sfDir))
    val results = (1 to 3).map { r =>
      val o = time(() => oldShape())
      val n = time(() => newShape.run(spark, sfDir))
      val (c, cM) = Measure.canaryPair()
      System.err.println(
        f"round $r old=$o%.2f new=$n%.2f canary=$c%.3f multi=$cM%.3f")
      (o, n, c, cM)
    }
    println(s"""{"metric":"x06_ab","legs":[${results.map { case (o, n, c, cM) =>
      s"""{"old_sec":$o,"new_sec":$n,"canary_sec":$c,"canary_multi_sec":$cM}"""
    }.mkString(",")}]}""")
    spark.stop()
  }
}
