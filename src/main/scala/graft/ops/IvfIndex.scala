package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second ANN
  * path next to [[VectorSearch.annTopK]]'s sign-LSH: a coarse k-means
  * quantizer partitions the corpus into k inverted lists; a query probes
  * only the `nprobe` lists whose centroids are nearest, then scores
  * exact cosine inside them. Scan fraction ≈ nprobe/k on balanced lists
  * (the classic IVF-Flat layout of the FAISS line of work).
  *
  * Everything is expressed as DataFrame ops that survive 100 TB:
  *  - Training iterates Lloyd's algorithm with the k centroids embedded
  *    as a LITERAL array — assignment is a MAP-SIDE codegen'd HOF argmin
  *    (zero exchange, rows stay n; see [[assignTo]] for the n×k-row
  *    broadcast-join design the 40× stress run retired), the update a
  *    posexplode → groupBy(cluster, dim) average. Only the k centroid
  *    rows ever reach the driver (the same bounded-model contour as
  *    [[VectorSearch.planeSigns]]), never the corpus.
  *  - Init and iteration are DETERMINISTIC: seeds are the k vectors
  *    with the smallest md5(id), and every centroid component is
  *    rounded to 6 dp after each update so shuffle-order float jitter
  *    cannot flip assignments between runs.
  *  - Search is one plan: query → nprobe nearest centroids (broadcast
  *    k rows + rank window) → equi-join on the cluster id against the
  *    assigned corpus → exact cosine → top-k window. Each corpus vector
  *    lives in exactly ONE list, so no candidate dedup is needed
  *    (unlike multi-table LSH).
  *
  * The reference has no ANN operator (its nearest relative is
  * cosine_similarity over sparse maps, presto-main/.../operator/scalar/
  * MathFunctions.java); this is part of the training-data-pipeline
  * extension surface.
  */
object IvfIndex {

  /** Squared L2 distance between two float-array columns via the native
    * codegen dot product: ||a-b||² = a·a − 2a·b + b·b. */
  private def sqDist(a: String, b: String) =
    expr(s"graft_dot($a, $a) - 2 * graft_dot($a, $b) + graft_dot($b, $b)")

  /** Train k centroids with `iters` Lloyd passes over deterministic
    * md5-ordered seeds. Returns a k-row frame (cluster, centroid) where
    * centroid is Array[Float]; only these k rows are collected.
    *
    * Every Lloyd pass ends in a MATERIALIZATION BARRIER (an eager
    * localCheckpoint of the k bounded rows — the same lifecycle as
    * [[MinHashLSH.nearDuplicates]] / [[EmbeddingDedup.nearDuplicates]];
    * a 100-TB pipeline writes them to reliable storage instead). Without
    * the barrier the returned frame's lineage holds `iters` full-corpus
    * assignment passes, and EVERY downstream consumer (index, each probe,
    * each search) silently re-executes the whole training — a ~(iters ×
    * consumers)× multiplier on the most expensive stage at scale. With it,
    * training runs exactly once: one corpus pass per iteration, k rows
    * checkpointed, and consumers see a constant-size leaf.
    * `materialize = false` keeps the raw composed plan for plan-shape
    * assertions (a checkpointed frame's executed plan is just an RDD scan,
    * which would make them vacuous). */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2, materialize: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    var centroids = c
      .withColumn("__h", md5(col("__id").cast("string")))
      .orderBy("__h").limit(k)
      .select(
        (row_number().over(Window.orderBy("__h")) - 1).as("cluster"),
        col("__v").cast("array<float>").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignTo(c, centroids)
      val updated = assigned
        .select(col("__cluster").as("cluster"),
          posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("cluster", "__d")
        .agg(avg(col("__x").cast("double")).as("__m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("__d"), col("__m")))).as("__dm"))
        // 6-dp rounding: shuffle-order float jitter in avg() must not be
        // able to flip a near-tie assignment between runs
        .select(col("cluster"),
          transform(col("__dm"), e => round(e("__m"), 6).cast("float"))
            .as("centroid"))
      // per-iteration barrier: iteration i+1's assignment must not drag
      // iteration i's corpus pass along in its lineage
      centroids =
        if (materialize) updated.localCheckpoint(eager = true) else updated
    }
    centroids
  }

  /** Nearest-centroid assignment, MAP-SIDE: the k centroids are
    * collected (k bounded rows — the same driver-size contract as the
    * trained model itself) and embedded as a LITERAL array, so each
    * corpus row computes its argmin in one codegen'd HOF pass over k
    * structs. The first design broadcast-JOINED the centroid frame and
    * min_by-grouped the n×k result — same flops, but it MATERIALIZED
    * and shuffled n×k rows carrying two dense vectors each; the 40×
    * ANN stress run measured what that does (80 000 × 283 ≈ 23 M
    * ~600-byte rows → 2.4 GB of spill, 78 s). Map-side, rows stay n
    * and assignment needs no exchange at all. Per-centroid squared
    * norms ride in the literal so the squared distance costs ONE dot
    * product per (row, centroid): ‖c−v‖² = ‖c‖² − 2c·v + ‖v‖², with
    * ‖v‖² hoisted out of the per-centroid lambda. Ties break to the
    * smallest cluster id via struct ordering, exactly like the min_by
    * form did. */
  private def assignTo(c: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .select(col("cluster").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Float]](1).toArray))
      .sortBy(_._1)
      .map { case (cl, cv) =>
        (cl, cv, cv.foldLeft(0.0)((s, x) => s + x.toDouble * x))
      }
    val centLit = typedlit(cents) // array<struct<_1:int,_2:array<float>,_3:double>>
    // running-argmin accumulator rather than array_min(transform(...)):
    // the transform form allocates a k-struct array PER ROW before
    // reducing it — measurable object churn at n·k scale. ‖v‖² is
    // dropped from the distance entirely: it is constant per row, so
    // argmin(‖c‖² − 2c·v) = argmin(‖c−v‖²). Strict `<` keeps the FIRST
    // minimum, and the literal is sorted by cluster id — ties break to
    // the smallest cluster, exactly like the min_by(struct(d, cl)) form.
    val best = aggregate(centLit,
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("cl")),
      (acc, e) => {
        val d = e("_3") -
          lit(2.0) * call_function("graft_dot", e("_2"), col("__v"))
        when(d < acc("d"), struct(d.as("d"), e("_1").as("cl")))
          .otherwise(acc)
      })
    c.withColumn("__cluster", best("cl"))
  }

  /** The inverted file: (id, vec, cluster) — cluster is the partition /
    * bucketing key a 100-TB layout would persist by (see the PlanSpec
    * partitioned-write test). `materialize = true` ends in the same eager
    * localCheckpoint barrier as [[train]], so callers probing the index
    * more than once (recall + scan-fraction branches, repeated searches)
    * pay the assignment pass exactly once. */
  def index(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, materialize: Boolean = false): DataFrame = {
    val assigned = assignTo(
      corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")), centroids)
      .select(col("__id").as("nid"), col("__v").as("nv"),
        col("__cluster").as("ncluster"))
    if (materialize) assigned.localCheckpoint(eager = true) else assigned
  }

  /** Probe the `nprobe` nearest lists per query and return exact-cosine
    * top-k within them — the [[VectorSearch.cosineTopK]] output shape
    * (qid, rank, nid, score). */
  def search(
      queries: DataFrame, idCol: String, vecCol: String,
      indexed: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy("qid")
      .orderBy(col("__qdist"), col("cluster"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("__qdist", sqDist("qv", "centroid"))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cluster"))
    val scored = probed
      .join(indexed, col("cluster") === col("ncluster") && col("qid") =!= col("nid"))
      .withColumn("score", VectorSearch.cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"),
        round(col("score"), 4).as("score"))
  }

  /** Candidate lists without scoring (for scan-fraction bounds). */
  def candidates(
      queries: DataFrame, idCol: String, vecCol: String,
      indexed: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy("qid")
      .orderBy(col("__qdist"), col("cluster"))
    q.crossJoin(broadcast(centroids))
      .withColumn("__qdist", sqDist("qv", "centroid"))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cluster"))
      .join(indexed, col("cluster") === col("ncluster") && col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("nid"), col("nv"))
  }
}
