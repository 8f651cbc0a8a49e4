package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an Array[Float] embedding column.
  *
  * Two paths (SURVEY §7 Phase 5, the north-star similarity extension):
  *  - `cosineTopK`: exact brute force — the small-query-set baseline.
  *    Queries broadcast, corpus streamed, per-query top-k via
  *    WindowGroupLimit. Scales with |corpus|×|queries|.
  *  - `annTopK`: sign-random-projection LSH — each vector lands in a
  *    2^planes bucket; searches probe the query's bucket (plus 1-bit
  *    neighbors), so the scan fraction is ≈ (1+planes)/2^planes. The
  *    hyperplanes are deterministic ±1 matrices derived from md5 so any
  *    engine (and any rerun) reproduces the same buckets.
  *
  * The reference's nearest relative is cosine_similarity over sparse maps
  * (reference: presto-main/.../operator/scalar/MathFunctions.java); it
  * has no ANN operator.
  */
object VectorSearch {

  /** Cosine similarity between two equal-length float-array columns,
    * accumulated in double, left-to-right (bit-reproducible). Uses the
    * native codegen DotProductFloat expression (registered as graft_dot
    * by Engine.session) — a primitive loop with no intermediate arrays. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: String, y: String) = expr(s"graft_dot($x, $y)")
    val an = a.toString; val bn = b.toString
    dot(an, bn) / (sqrt(dot(an, an)) * sqrt(dot(bn, bn)))
  }

  /** Exact top-k neighbors for each query row (brute force).
    * Output: qid, rank (1..k), nid, score (rounded to 4 dp). */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = broadcast(q).join(c, col("qid") =!= col("nid"))
      .withColumn("score", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 4).as("score"))
  }

  /** Deterministic ±1 hyperplane matrix: sign(plane j, dim d) follows the
    * high bit of a hex digit of md5("j_d") — public, reproducible,
    * engine-independent. */
  def planeSigns(planes: Int, dim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (j, d) =>
      val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
      if ((hex(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** LSH bucket id (0 until 2^planes) for a vector column. */
  def bucketOf(vec: Column, signs: Array[Array[Double]]): Column = {
    val bits = signs.zipWithIndex.map { case (plane, j) =>
      val planeLit = array(plane.map(lit): _*)
      val d = expr(
        s"aggregate(zip_with(${vec.toString}, ${planeLit.toString}, " +
          "(p, q) -> CAST(p AS DOUBLE) * q), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates share the query's bucket or any bucket
    * at hamming distance 1 (multiprobe). Returns same shape as cosineTopK. */
  def annTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val signs = planeSigns(planes, dim)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nbucket", bucketOf(col("nv"), signs))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qbucket", bucketOf(col("qv"), signs))
      // multiprobe: own bucket + each 1-bit flip
      .withColumn("probe", explode(expr(
        s"array_union(array(qbucket), transform(sequence(0, ${planes - 1}), " +
          "j -> CAST(qbucket AS INT) ^ shiftleft(1, j)))")))
    val scored = broadcast(q).join(c,
        col("probe") === col("nbucket") && col("qid") =!= col("nid"))
      .withColumn("score", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 4).as("score"))
  }
}
