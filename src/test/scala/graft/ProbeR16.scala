package graft

/** Diagnostic for the round-16 regexp failures: is the named-group
  * replacement loss in Spark's RegExpReplace or in the facade's text
  * pass? FINDING: neither — `spark.sql.variable.substitute` (default
  * ON) rewrites `${xyz}` out of the SQL TEXT before parsing, so engine
  * and raw spark.sql lose the reference identically even with
  * [[graft.functions.PrestoRegexpReplace]] registered. Engine.session
  * now sets it off; all four cases match the java baseline. */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    def viaEngine(q: String): Any =
      Engine.sql(spark, sfDir, s"SELECT $q AS v").collect()(0).get(0)
    def viaSpark(q: String): Any =
      spark.sql(s"SELECT $q AS v").collect()(0).get(0)
    val cases = Seq(
      "regexp_replace('wxyz', '(?<xyz>[xyz])', '${xyz}${xyz}')",
      "regexp_replace('wxyz', '(?<w>w)|(?<xyz>[xyz])', '[${w}](${xyz})')",
      "regexp_replace('xyz', '(?<xyz>[xyz])+', '${xyz}')",
      "regexp_replace('wxyz', '([xyz])', '$1$1')")
    for (c <- cases) {
      val e = try viaEngine(c).toString catch { case t: Throwable => "ERR " + t.getMessage.take(100) }
      val s = try viaSpark(c).toString catch { case t: Throwable => "ERR " + t.getMessage.take(100) }
      println(s"EXPR  $c\n  engine=$e\n  spark =$s")
    }
    // java baseline
    println("java  = " + "wxyz".replaceAll("(?<xyz>[xyz])", "${xyz}${xyz}"))
    println("java2 = " + "wxyz".replaceAll("(?<w>w)|(?<xyz>[xyz])", "[${w}](${xyz})"))
    spark.stop()
  }
}
