object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(cores = 4, shufflePartitions = 4)
    val names = scala.io.Source.fromFile("/tmp/ref_docs_fns.txt").getLines().toSeq
    val spk = spark.catalog.listFunctions().collect().map(_.name.toLowerCase).toSet
    val missing = names.filterNot { n =>
      val ln = n.toLowerCase
      spk.contains(ln) ||
      // dialect translation: probe whether translate changes the call or
      // the translated text still parses to something known
      {
        val t = graft.Dialect.translate(s"SELECT $ln()")
        !t.toLowerCase.contains(ln + "(")
      }
    }
    println("MISSING_START")
    missing.foreach(println)
    println("MISSING_END count=" + missing.size)
    spark.stop()
  }
}
