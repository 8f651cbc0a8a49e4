object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(cores = 8, shufflePartitions = 8)
    val dir = "/root/testdata/sf0.001"
    val dec = java.util.Base64.getDecoder
    def d(s: String) = new String(dec.decode(s), "UTF-8")
    val lines = scala.io.Source.fromFile("/tmp/ref_cases.tsv").getLines().toVector
    var ok = 0; var diff = 0; var err = 0
    val diffs = collection.mutable.Buffer[String]()
    val errs = collection.mutable.Buffer[String]()
    for (line <- lines) {
      val Array(file, exprB, typ, kind, expB) = line.split("\t", 5)
      val expr = d(exprB); val expected = d(expB)
      try {
        val rows = graft.Engine.sql(spark, dir, s"SELECT $expr AS v").collect()
        val v = rows(0).get(0)
        val got = if (v == null) "null" else v match {
          case a: Array[Byte] => a.map("%02x".format(_)).mkString
          case x => x.toString
        }
        val matches = kind match {
          case "null" => v == null
          case "bool" => got == expected
          case "str"  => got == expected
          case "num" =>
            if (v == null) false
            else {
              val e = expected.stripSuffix("L")
              try {
                val eb = BigDecimal(e)
                val gb = BigDecimal(got)
                (eb == gb) || (eb != 0 && ((gb - eb) / eb).abs < 1e-9) ||
                  (eb == 0 && gb.abs < 1e-12)
              } catch { case _: Throwable => got == e }
            }
        }
        if (matches) ok += 1
        else { diff += 1; diffs += s"$file\t$expr\t exp=$expected got=$got" }
      } catch {
        case e: Throwable =>
          err += 1
          errs += s"$file\t$expr\t ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(160)}"
      }
    }
    println(s"REPLAY ok=$ok diff=$diff err=$err of ${lines.size}")
    val pw = new java.io.PrintWriter("/tmp/replay_diffs.txt")
    diffs.foreach(pw.println); pw.println("==== ERRORS ===="); errs.foreach(pw.println)
    pw.close()
    spark.stop()
  }
}
