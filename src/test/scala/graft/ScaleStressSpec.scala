package graft

import graft.ops.ScaleStress
import org.apache.spark.sql.functions._

/** The 10× corpus multiplier and the LSH linearity contract it exists
  * to check (ops/ScaleStress; Bench carries the sf0.1 measurement).
  */
class ScaleStressSpec extends QueryAssertions {

  private def docs = Tables.load(spark, sfDir, "documents")

  test("multiplyDocs: 10x rows, unique ids, disjoint replica shingle spaces") {
    val k = 10
    val base = docs
    val mult = ScaleStress.multiplyDocs(base, k)
    val n = base.count()
    assert(mult.count() == k * n)
    assert(mult.select("doc_id").distinct().count() == k * n,
      "replica ids must stay unique")
    // replicas of one document must NOT be near-duplicates of each other
    // (that would manufacture k-cliques and make the linearity contract
    // unfalsifiable): word-prefixing gives replicas zero shingle overlap
    val one = mult.filter(col("doc_id") % 1000000000000L === 7L)
    val grams = one.select(col("doc_id"),
      graft.ops.MinHashLSH.shingles(col("text")).as("sh"))
    val a = grams.select(col("doc_id").as("ida"), col("sh").as("sha"))
    val b = grams.select(col("doc_id").as("idb"), col("sh").as("shb"))
    val overlaps = a.join(b, col("ida") < col("idb"))
      .select(size(array_intersect(col("sha"), col("shb"))).as("common"))
      .agg(max("common")).head().getInt(0)
    assert(overlaps == 0, s"replica shingle spaces must be disjoint, got $overlaps")
  }

  test("LSH contract: candidate pairs grow ~linearly under 10x corpus") {
    val pairs1 = ScaleStress.lshCandidateCount(docs)
    val pairs10 = ScaleStress.lshCandidateCount(ScaleStress.multiplyDocs(docs, 10))
    assert(pairs1 > 0, "fixture corpus must produce candidates")
    // linear contract: ~10x, never quadratic (~100x). The bound is
    // generous (15x) because replica shingle distributions shift hash
    // bucket boundaries slightly.
    assert(pairs10 <= 15 * pairs1,
      s"candidate pairs grew super-linearly: $pairs1 -> $pairs10")
    assert(pairs10 >= 5 * pairs1,
      s"candidate pairs grew sub-linearly (replicas lost their dups): $pairs1 -> $pairs10")
  }
}
