package graft

/** Value certification for x09_decontamination: duckOnly corpus entries
  * are only frame-executed by CorpusSpec (their values are first checked
  * by the driver's DuckDB gate), so the n-gram overlap semantics are
  * asserted here against an independent pure-Scala recomputation.
  */
class TextDecontaminationSpec extends QueryAssertions {

  test("x09 matches an independent driver-side recomputation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // same tokenization as both query spellings: split on single spaces
    // keeping empties, word 5-grams joined with ' '
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(_._1 % 20 == 0).flatMap(d => grams(d._3)).toSet
    val train = docs.filter(_._1 % 20 != 0)
    val expected = train.groupBy(_._2).map { case (source, ds) =>
      val removed = ds.count(d => grams(d._3).exists(evalGrams))
      source -> ((ds.length.toLong, removed.toLong, (ds.length - removed).toLong))
    }

    val got = SparkEntry.queries("x09_decontamination")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    assert(got == expected, s"got $got\nexpected $expected")
    // the eval set really contaminates something at this SF — otherwise
    // the assertion above would be vacuously comparing all-zero removals
    assert(expected.values.map(_._2).sum > 0,
      "no contaminated docs at this SF — pick a longer-overlap fixture")
  }
}
