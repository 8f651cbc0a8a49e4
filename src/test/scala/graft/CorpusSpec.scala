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

  test("corpus size is pinned (shrinkage is loud)") {
    assert(SparkEntry.allDefs.size == SparkEntry.expectedCorpusSize,
      s"allDefs has ${SparkEntry.allDefs.size} entries, expected " +
        s"${SparkEntry.expectedCorpusSize} — update the pin if intentional")
    // Distinct names too: a duplicate would silently collapse in the map.
    assert(SparkEntry.queries.size == SparkEntry.expectedCorpusSize)
  }
}
