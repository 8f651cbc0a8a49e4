package graft.suites

import graft.{Qdef, Tables}
import graft.ops.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-similarity corpus over `embeddings` (north-star LLM-pipeline
  * ops, SURVEY §7 Phase 5): exact cosine top-k as the baseline, LSH ANN
  * as the scale path with a recall property check.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // Brute-force cosine top-5 for 5 query vectors; DuckDB verifies with
    // its native list_cosine_similarity. Scores rounded to 4 dp; rank
    // ties broken by neighbor id on both sides.
    Qdef.duckOnly(
      "v01_cosine_topk",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |           WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, c.vec_id AS nid,
        |         list_cosine_similarity(q.qv, c.embedding) AS s
        |  FROM q JOIN embeddings c ON c.vec_id <> q.qid),
        |ranked AS (
        |  SELECT qid, nid, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, round(s, 4) AS score
        |FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      VectorSearch.cosineTopK(
          emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5)
        .orderBy("qid", "rank")
    },

    // LSH ANN: recall@5 against the exact top-5, plus a candidate-scan
    // bound — property checks, because bucket membership is the
    // approximation under test (deterministic given the md5 planes).
    Qdef(
      "v02_ann_recall",
      "SELECT true AS recall_ok, true AS scan_bounded") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val exact = VectorSearch.cosineTopK(queries, emb, "vec_id", "embedding", 5)
        .select(col("qid").as("eqid"), col("nid").as("enid"))
      // planes=4 → 16 buckets, 5 probed: measured recall 0.52 at sf0.001
      // and sf0.01 (deterministic md5 planes); floor 0.2 = 2.6× margin.
      val approx = VectorSearch.annTopK(queries, emb, "vec_id", "embedding", 5,
          planes = 4)
        .select(col("qid"), col("nid"))
      val hits = approx.join(exact,
        col("qid") === col("eqid") && col("nid") === col("enid")).count()
      val total = exact.count()
      val recall = hits.toDouble / total
      // scan bound: candidates probed ≈ (planes+1)/2^planes of the corpus
      val signs = VectorSearch.planeSigns(4, 64)
      val corpusN = emb.count()
      val probed = emb
        .withColumn("b", VectorSearch.bucketOf(col("embedding"), signs))
        .groupBy("b").count()
        .agg(max("count")).head().getLong(0)
      import s.implicits._
      Seq((recall >= 0.2, probed < corpusN)).toDF("recall_ok", "scan_bounded")
    },

    // Per-label vector statistics — the aggregate side of embedding
    // pipelines (norms, centroid components), double-accumulated
    // left-to-right on both engines.
    Qdef.duckOnly(
      "v03_vector_stats",
      """SELECT label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(avg(sqrt(list_dot_product(embedding, embedding))), 4) AS avg_norm,
        |  round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS centroid_d1,
        |  round(avg(CAST(embedding[2] AS DOUBLE)), 4) AS centroid_d2
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          round(avg(sqrt(expr(
            "aggregate(zip_with(embedding, embedding, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))), 4)
            .as("avg_norm"),
          round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("centroid_d1"),
          round(avg(element_at(col("embedding"), 2).cast("double")), 4).as("centroid_d2"))
        .orderBy("label")
    }
  )
}
