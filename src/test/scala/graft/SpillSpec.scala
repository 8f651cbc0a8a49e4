package graft

/** Constrained-resources re-run (SURVEY §5, mirroring the reference's
  * presto-tests/.../TestDistributedSpilledQueries.java): heavyweight
  * corpus entries must produce identical results with shuffle
  * parallelism squeezed to 2 — forcing big partitions through the
  * spill-capable operators instead of wide fan-out.
  */
class SpillSpec extends QueryAssertions {

  private val heavy = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q18_large_orders",
    "w08_topn_per_group", "a01_distinct_aggs", "s04_intersect_all")

  heavy.foreach { name =>
    test(s"constrained shuffle: $name") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        val q = SparkEntry.allDefs.find(_.name == name).get
        assertQuery(q)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
