package graft

/** Auto-generated differential test per corpus entry: every Qdef in
  * `SparkEntry.allDefs` whose oracle is shared-dialect runs both as a
  * DataFrame program and as SQL via `Engine.sql`, and the results must
  * match (unordered, float-tolerant). DuckDB-only oracles still execute
  * the DataFrame side so plan regressions fail fast.
  */
class CorpusSpec extends QueryAssertions {
  SparkEntry.allDefs.foreach { q =>
    test(s"corpus: ${q.name}") { assertQuery(q) }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
