import graft._
import graft.ops.MinHashLSH
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, shufflePartitions = 32)
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm up JVM/scan
    docs.count()

    // stage 1: shingles only
    time("shingles") {
      docs.select(MinHashLSH.shingles(col("text")).as("sh"))
        .select(sum(size(col("sh")))).collect()
    }
    // stage 2: prepare (shingles + signature + persist)
    val prep = time("prepare+count") {
      val p = MinHashLSH.prepare(docs, "doc_id", "text"); p.count(); p
    }
    time("candidates") { MinHashLSH.candidatePairs(prep).count() }
    prep.unpersist()
    time("full nearDuplicates") {
      MinHashLSH.nearDuplicates(docs, "doc_id", "text", 0.8).count()
    }
    time("full nearDuplicates 2nd") {
      MinHashLSH.nearDuplicates(docs, "doc_id", "text", 0.8).count()
    }
    spark.stop()
  }
}
