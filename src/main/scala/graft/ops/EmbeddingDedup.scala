package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection — the last member of the
  * dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine): documents are embedded as hashed-TF shingle
  * vectors, bucketed with sign-random-projection LSH, and candidate
  * pairs are verified with the exact cosine before reporting.
  *
  * Why derive embeddings from text instead of using the `embeddings`
  * table: that table's vectors are near-orthogonal random draws (max
  * pairwise cosine 0.51 at sf0.01), so a near-dup threshold over it is
  * vacuously empty. Hashed shingle-TF embeddings put the planted
  * near-duplicate documents at cosine >= 0.94 while unrelated pairs stay
  * below 0.38 — a real signal with margin on both sides of the 0.8
  * threshold.
  *
  * Scale shape (the 100-TB path):
  *  - Featurization is explode -> groupBy(doc, bucket) -> groupBy(doc):
  *    shuffle-on-key only, counts are integers so every downstream dot
  *    product is EXACT in double arithmetic (bit-identical to any other
  *    engine computing the same sums — the DuckDB oracle replays it).
  *  - The LSH projection is computed over the SPARSE (bucket, count)
  *    rows joined against a broadcast (table, bucket, signs[planes])
  *    matrix — plane signs ride as an array so the join's intermediate
  *    row count is counts×tables, not ×planes as well; no 256-wide
  *    dense arrays in the projection path, one shuffle on the doc key.
  *  - Candidates come from a self-equi-join on (table, lshBucket) with
  *    1-bit multiprobe expansion on the build side; never all pairs.
  *    Expected scan fraction ~ tables*(1+planes)/2^planes. Pairs must
  *    agree in >=2 independent tables (when tables >= 4) before
  *    verification — hash accidents rarely repeat across independent
  *    sign matrices, so most false candidates die before any dense
  *    vector is shipped.
  *  - Verification joins the surviving pair ids back to dense SMALLINT
  *    vectors (counts are exact integers, so shorts halve the shuffled
  *    bytes with bit-identical cosines) and scores with the native
  *    codegen dot product ([[VectorSearch.cosine]] / graft_dot).
  *
  * Reference capability analog: the reference's nearest operator is
  * cosine_similarity over sparse maps (presto-main/src/main/java/com/
  * facebook/presto/operator/scalar/MathFunctions.java); it has no
  * LSH/near-dup operator — this is part of the training-data-pipeline
  * extension surface.
  */
object EmbeddingDedup {

  /** Hashed-TF embedding dimension. 256 keeps distinct trigram shingles
    * nearly collision-free at the test vocabulary and costs 1 KB/doc as
    * float — at larger corpora raise it together with `planes`. */
  val Dim = 256

  /** Sparse (id, bucket, c) shingle-count rows: bucket is the first 4
    * md5 hex digits of the distinct trigram shingle mod [[Dim]] (a
    * public, engine-independent hash an oracle can replay), c the number
    * of distinct shingles landing in the bucket. */
  def shingleCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(MinHashLSH.shingles(col(textCol))).as("__g"))
      .select(col("__id"),
        (conv(substring(md5(col("__g")), 1, 4), 16, 10).cast("int")
          % Dim).as("__bucket"))
      .groupBy("__id", "__bucket")
      .agg(count(lit(1)).cast("double").as("__c"))

  /** Dense SMALLINT vector (length [[Dim]]) from the sparse counts —
    * only materialized for the verification dot product, never for the
    * LSH projection. Shorts, not floats: the counts are exact integers,
    * so a short reads back to the identical double the float form would
    * (bit-identical cosines) while the verify join — the pipeline's
    * dominant shuffle at stress scale, two dense vectors per candidate
    * pair — ships half the bytes. A per-document count that would
    * overflow a short (>32767 distinct shingles in ONE of 256 buckets ≈
    * an 8M-word document) fails loudly rather than wrapping. */
  private def densify(cnt: DataFrame): DataFrame =
    cnt.groupBy("__id")
      .agg(map_from_arrays(
        collect_list("__bucket"), collect_list("__c")).as("__m"),
        max("__c").as("__mx"))
      .select(col("__id"),
        when(col("__mx") <= 32767.0,
          transform(sequence(lit(0), lit(Dim - 1)),
            i => coalesce(element_at(col("__m"), i), lit(0.0))
              .cast("short")))
          .otherwise(raise_error(concat(
            lit("embedding shingle count overflows smallint: "),
            col("__mx").cast("string")))).as("__v"))

  /** Broadcastable sign matrix: one row per (table, bucket) carrying
    * ALL plane signs for that coordinate as an array — the
    * deterministic ±1 from [[VectorSearch.planeSigns]]. (Round 11: this
    * was one row per (table, plane, bucket); folding the plane axis
    * into an array cuts the projection join's intermediate row count by
    * `planes`× with bit-identical sums — the 10× stress run flagged the
    * join+partial-agg stage as the pipeline's dominant cost.) */
  private def signRows(
      spark: SparkSession, planes: Int, tables: Int): DataFrame = {
    import spark.implicits._
    (0 until tables).flatMap { t =>
      val signs = VectorSearch.planeSigns(planes, Dim, t)
      (0 until Dim).map(d =>
        (t, d, (0 until planes).map(j => signs(j)(d)).toSeq))
    }.toDF("__t", "__bucket", "__signs")
  }

  /** (id, t, lsh) bucket assignment per LSH table, projected from the
    * sparse counts: projection_j = Σ_bucket c·sign(j,bucket), bit j set
    * iff positive. One broadcast join row per (count-row, table); the
    * planes axis is evaluated as expressions over the signs array, not
    * materialized as rows. */
  def lshBuckets(
      cnt: DataFrame, planes: Int, tables: Int): DataFrame = {
    val spark = cnt.sparkSession
    val projAggs = (0 until planes).map { j =>
      sum(col("__c") * element_at(col("__signs"), j + 1)).as(s"__p$j")
    }
    val proj = cnt.join(broadcast(signRows(spark, planes, tables)), "__bucket")
      .groupBy("__id", "__t")
      .agg(projAggs.head, projAggs.tail: _*)
    val bucket = (0 until planes)
      .map(j => when(col(s"__p$j") > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
    proj.select(col("__id"), col("__t"), bucket.as("__lsh"))
  }

  /** All pairs (id1 < id2, cosine) with embedding cosine >= minCosine.
    * Output columns: id1, id2, cosine (rounded to 6 dp).
    *
    * SCALE THE GEOMETRY WITH THE CORPUS: the bucket count is 2^planes
    * PER TABLE, so with fixed defaults the per-bucket occupancy — and
    * with it the candidate-pair count — grows linearly in corpus size,
    * i.e. candidates grow QUADRATICALLY (the round-11 10× stress run
    * measured exactly that: 22 GB of spill at 50k docs on the 8-plane
    * default). Choose planes ≈ log2(n / 16) to hold occupancy, and grow
    * tables to hold recall as the per-table collision probability drops
    * (8 planes/8 tables at ≤5k docs → 12 planes/16 tables at 50k; see
    * ops/ScaleStress for the worked trade-off).
    *
    * `materialize = false` skips the persist + eager localCheckpoint and
    * returns the raw composed plan — for plan-shape tests only (the
    * checkpointed frame's executed plan is just an RDD scan, which would
    * make a no-cartesian assertion vacuous). */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, minCosine: Double,
      planes: Int = 8, tables: Int = 8,
      materialize: Boolean = true): DataFrame = {
    val raw = shingleCounts(df, idCol, textCol)
    if (!materialize)
      return pairsFrom(lshBuckets(raw, planes, tables), densify(raw),
        minCosine, planes, tables)
    // Persist every frame the candidate join consumes twice: the counts
    // feed both densify and the projection, the bucket assignment is both
    // sides of the self-join, and the vectors back both pair-id joins —
    // without the caches each is recomputed through the sign-matrix
    // shuffle (measured ~2x end-to-end at sf0.1). Same explicit
    // persist/release lifecycle as MinHashLSH.nearDuplicates.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cnt = raw.persist(lvl)
    val vecs = densify(cnt).persist(lvl)
    val assign = lshBuckets(cnt, planes, tables).persist(lvl)
    try pairsFrom(assign, vecs, minCosine, planes, tables)
      .localCheckpoint(eager = true)
    finally {
      assign.unpersist(blocking = false)
      vecs.unpersist(blocking = false)
      cnt.unpersist(blocking = false)
    }
  }

  /** LSH candidates -> exact-cosine verification. */
  private def pairsFrom(
      assign: DataFrame, vecs: DataFrame,
      minCosine: Double, planes: Int, tables: Int): DataFrame = {
    // 1-bit multiprobe on the left side only: XOR distance is symmetric,
    // so every hamming<=1 pair is found regardless of id order.
    val probes = assign.select(col("__id").as("id1"), col("__t"),
      explode(array(
        col("__lsh") +: (0 until planes)
          .map(j => col("__lsh").bitwiseXOR(lit(1 << j))): _*)).as("__probe"))
    // Cross-table signature-agreement prefilter (replaces the bare
    // distinct): per (pair, table) at most one probe can match (the
    // right side's bucket is a single value and the probe set is
    // distinct), so count(*) per pair IS the number of agreeing tables.
    // A truly-similar pair collides in MANY tables — at the 0.8
    // threshold and 8+ tables the expected agreement is >6 and
    // P(agreement<2) is ~1e-4 even for a pair AT the threshold — while
    // a hash-accident pair rarely repeats across independent sign
    // matrices. Requiring >=2 agreeing tables kills most false
    // candidates BEFORE any dense vector is joined or shipped: the
    // verify join below is the pipeline's dominant shuffle at stress
    // scale (BENCH_r11: 6.46 GB for d07x), and its input count is what
    // this filter cuts. The same groupBy that deduplicated pairs anyway
    // now also counts — no extra shuffle.
    val minAgree = if (tables >= 4) 2 else 1
    val cands = probes
      .join(assign.select(col("__id").as("id2"), col("__t"),
          col("__lsh").as("__probe")),
        Seq("__t", "__probe"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("__agree"))
      .filter(col("__agree") >= minAgree)
      .select("id1", "id2")
    cands
      .join(vecs.select(col("__id").as("id1"), col("__v").as("__v1")), "id1")
      .join(vecs.select(col("__id").as("id2"), col("__v").as("__v2")), "id2")
      .withColumn("cosine", VectorSearch.cosine(col("__v1"), col("__v2")))
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
  }
}
