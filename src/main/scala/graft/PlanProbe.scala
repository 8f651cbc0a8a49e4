package graft

import org.apache.spark.sql.SparkSession

/** Planning-cost attribution probe (round-14 drift investigation): times
  * DataFrame CONSTRUCTION (parse + analysis — no execution) for each
  * headline query, the raw `spark.read.parquet` table-load leg in
  * isolation, and dumps Spark's own per-rule time ledger
  * (RuleExecutor.dumpTimeSpent) so "facade rules tax vs scan-relation
  * tax vs host noise" is measured, not guessed. Diagnostic main — not
  * part of the driver contract.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    val defs = SparkEntry.benchDefs
      .filterNot(q => Set("d02_minhash_near_dup", "d05_training_pipeline",
        "d07_embedding_near_dup", "d09_dup_clusters", "v04_ivf_recall")
        .contains(q.name)) // their "planning" runs eager checkpoints = execution

    // warm-up: one full construction of everything (JIT + FileIndex caches)
    defs.foreach(q => q.run(spark, sfDir))

    // leg 1: repeated raw table loads (listing + footer schema inference)
    val tables = Seq("lineitem", "orders", "customer", "supplier",
      "nation", "region", "part", "documents", "embeddings")
    tables.foreach { t =>
      val t0 = System.nanoTime()
      (1 to 10).foreach(_ => Tables.load(spark, sfDir, t))
      println(f"load-x10 $t%-12s ${(System.nanoTime() - t0) / 1e9}%8.4f s")
    }

    // leg 2: per-query construction time, median of 7
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val overall0 = System.nanoTime()
    defs.foreach { q =>
      val runs = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"construct ${q.name}%-28s med ${runs(3)}%7.4f  min ${runs.head}%7.4f  max ${runs.last}%7.4f")
    }
    println(f"construct-total ${(System.nanoTime() - overall0) / 1e9}%8.3f s")

    // leg 3: Spark's per-rule ledger across leg 2 (top lines only)
    val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
    println(dump.linesIterator.take(45).mkString("\n"))
    spark.stop()
  }
}
