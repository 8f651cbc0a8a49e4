package graft

/** Diagnostic main (not a test): runs the full frozen replay corpus and
  * writes EVERY non-matching assertion to /tmp/replay_failures.txt so
  * divergence families can be enumerated and adjudicated (the spec's
  * floor assertion only surfaces the first 20). Run with
  * `sbt "Test/runMain graft.ReplayAudit"`.
  */
object ReplayAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val dec = java.util.Base64.getDecoder
    def d(s: String) = new String(dec.decode(s), "UTF-8")
    val in = getClass.getResourceAsStream("/reference_assertions.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    var ok = 0
    val failures = collection.mutable.Buffer[String]()
    var activeZone = "UTC"
    for (line <- lines) {
      val parts = line.split("\t", 6)
      val Array(src, exprB, _, kind, expB) = parts.take(5)
      val expr = d(exprB); val expected = d(expB)
      // zone-pinned rows (column 6) replay under the session zone the
      // reference harness ran their file with
      val zone = if (parts.length > 5 && parts(5).nonEmpty) parts(5) else "UTC"
      if (zone != activeZone) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        activeZone = zone
      }
      try {
        val v = {
          val rows = Engine.sql(spark, sfDir, s"SELECT $expr AS v").collect()
          rows(0).get(0)
        }
        val got = if (v == null) "null" else v.toString
        val matches = kind match {
          case "null" => v == null
          case "num" =>
            v != null && (try {
              val e = BigDecimal(expected.stripSuffix("L"))
              val g = BigDecimal(got)
              e == g || (e != 0 && ((g - e) / e).abs < 1e-9) ||
                (e == 0 && g.abs < 1e-12)
            } catch { case _: Throwable => got == expected.stripSuffix("L") })
          case _ => got == expected
        }
        if (matches) ok += 1
        else failures += s"$src\t$expr\texp=$expected\tgot=$got"
      } catch { case e: Throwable =>
        failures += s"$src\t$expr\texp=$expected\tERR=${
          String.valueOf(e.getMessage).replace('\n', ' ').take(160)}"
      }
    }
    val out = new java.io.PrintWriter("/tmp/replay_failures.txt")
    failures.foreach(out.println)
    out.close()
    println(s"replay audit: $ok / ${lines.size} match; ${failures.size} " +
      "failures written to /tmp/replay_failures.txt")
    spark.stop()
  }
}
