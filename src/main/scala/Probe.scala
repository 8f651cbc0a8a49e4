import graft._
import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, shufflePartitions = 32)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val exact = VectorSearch
        .cosineTopK(queries, emb, "vec_id", "embedding", 5)
        .select(col("qid").as("eqid"), col("nid").as("enid"))
      val total = exact.count()
      val n = emb.count()
      for ((p, l) <- Seq((4, 1), (4, 2), (4, 4), (6, 4), (6, 8), (8, 8))) {
        val approx = VectorSearch
          .annTopK(queries, emb, "vec_id", "embedding", 5, planes = p, tables = l)
          .select(col("qid"), col("nid"))
        val hits = approx.join(exact,
          col("qid") === col("eqid") && col("nid") === col("enid")).count()
        println(f"PROBE $dir planes=$p tables=$l recall=${hits.toDouble / total}%.2f scanEst=${l * (1.0 + p) / (1 << p)}%.2f n=$n")
      }
    }
    spark.stop()
  }
}
