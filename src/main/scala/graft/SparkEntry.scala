package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All capability queries, grouped by suite (SURVEY.md §2 coverage). */
  def allDefs: Seq[Qdef] =
    suites.TpchLike.defs ++ suites.TpchMore.defs ++
      suites.Windows.defs ++ suites.Aggregates.defs ++
      suites.SetOps.defs ++ suites.Joins.defs ++
      suites.Unnest.defs ++ suites.Scalars.defs ++
      suites.Dedup.defs ++ suites.Similarity.defs ++
      suites.TextAnalysis.defs ++ suites.Streaming.defs ++
      suites.Ordering.defs ++ suites.Storage.defs ++ suites.Udfs.defs ++
      suites.Extras.defs ++ suites.MultimodalSuite.defs ++
      suites.General.defs ++ suites.Conformance.defs ++ suites.Catalog.defs ++
      suites.TpcdsShapes.defs ++ suites.Geo.defs ++ suites.Ml.defs ++
      suites.TpchPartsupp.defs

  /** Pinned corpus size, asserted by CorpusSpec: a shrinking corpus (an
    * entry dropped because its builder throws) must FAIL a test, not
    * silently disappear from the driver's correctness artifact (that is
    * exactly what happened to st01/st02/st05 in round 8). Update this
    * number whenever entries are added or intentionally removed. */
  val expectedCorpusSize: Int = 308

  /** Headline subset the Bench main measures (2 prewarm + 6 runs each —
    * the full corpus would take too long under that protocol). */
  def benchDefs: Seq[Qdef] = {
    val headline = Set(
      "q01_pricing_summary", "q03_shipping_priority",
      "q05_local_supplier_volume", "q06_forecast_revenue",
      "q10_returned_items",
      // round-3 additions: joins/aggs/windows + LLM-pipeline ops
      "q09_product_profit", "q13_customer_distribution", "q18_large_orders",
      "q21_waiting_supplier", "w08_topn_per_group", "a01_distinct_aggs",
      "d02_minhash_near_dup", "d05_training_pipeline", "v01_cosine_topk",
      // round-9 additions: the heavy round-7 ops and a text-analysis
      // representative were previously unbenched
      "d07_embedding_near_dup", "v04_ivf_recall", "x06_language_id",
      // TPC-DS-shape representatives: widest star fan-in + the
      // derived-agg/double-dimension-join composition
      "ds03_cross_nation_brand", "ds07_cross_nation_orders",
      // round-10 addition: the only multi-round iterative-shuffle
      // workload class in the corpus (label-propagation components)
      "d09_dup_clusters",
      // round-10 addition: the grid spatial join (filter-and-refine
      // equi-join — a distinct shuffle/fan-out shape from every other
      // join in the headline set)
      "geo04_distance_join",
      // round-10 addition: grouped model training — the only
      // custom-Aggregator-dominated (ObjectHashAggregate, no codegen'd
      // update) workload class in the corpus
      "ml01_learn_regressor",
      // round-10 addition: the DSv2 generator connector scan — the only
      // non-parquet source path in the corpus (fixed 60k generated rows,
      // SF-independent by design)
      "w11_generator_connector")
    allDefs.filter(q => headline(q.name))
  }

  /** The streaming corpus entries — the bench's streaming block times
    * them separately from the headline set (additions-only: they never
    * enter the headline `queries` map or its total). */
  def streamingDefs: Seq[Qdef] = suites.Streaming.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
