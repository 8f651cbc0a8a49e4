package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine facade: session construction + catalog registration + the
  * SQL entry point. The reference's only public query surface is SQL over
  * HTTP (reference: presto-main/src/main/java/com/facebook/presto/server/
  * protocol/QueuedStatementResource.java:168-169, parsed by presto-parser/
  * .../parser/SqlParser.java); our equivalent is `Engine.sql` — catalog
  * registration + a light Presto→Spark dialect shim + `spark.sql`, so
  * Catalyst does parse/analyze/optimize/execute (SURVEY §3.1-3.2).
  */
object Engine {

  /** Build a session tuned for the local[32] test box but configured the
    * way a large cluster job would be: AQE on (runtime re-plan, skew-join
    * splitting, dynamic coalesce), modest shuffle parallelism, UTC.
    */
  def session(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet stores TIMESTAMP(NANOS); read as long, converted in
      // Tables.load (Spark has no nanos timestamp type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The fixtures are single smallish files; the 128 MB default makes
      // every scan ONE task and the whole query single-threaded. 4 MB
      // splits spread scans across cores — the same knob that sizes scan
      // tasks against executor memory at the 100 TB design point.
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      // keep managed-table data out of the repo working tree
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DotProductFloat.register(spark)
    spark
  }

  /** Register the parquet catalog and run a query through Spark SQL after
    * the dialect shim. This is the reference's `POST /v1/statement`
    * equivalent: SQL in, DataFrame (result cursor) out.
    */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(translate(query))
  }

  /** Presto-ism → Spark SQL function-name rewrites (SURVEY §7 Phase 2).
    * Only aliases whose argument order and semantics match 1:1 are listed
    * (reference registrations: presto-main/.../metadata/
    * BuiltInTypeAndFunctionNamespaceManager.java:658-878). Word-bounded,
    * case-insensitive, applied before `spark.sql`.
    */
  private val functionAliases: Seq[(String, String)] = Seq(
    "approx_distinct"      -> "approx_count_distinct",
    "arbitrary"            -> "any_value",
    "strpos"               -> "instr",            // both are (string, substring) → 1-based
    "json_extract_scalar"  -> "get_json_object",  // both are (json, jsonpath)
    "json_array_length"    -> "json_array_length",
    "to_unixtime"          -> "unix_timestamp",
    "codepoint"            -> "ascii",
    "pow"                  -> "power",
    "ln"                   -> "ln",
    "truncate"             -> "trunc",
    "bitwise_and"          -> "bitand",
    "bitwise_or"           -> "bitor",
    "bitwise_xor"          -> "bitxor",
    "is_nan"               -> "isnan",
  )

  /** Translate Presto-dialect SQL to Spark SQL. String-level and
    * deliberately conservative: rewrites are word-bounded identifiers
    * immediately followed by '(' so column names never match, and
    * single-quoted string literals are left untouched (split on quotes:
    * even segments are code, odd segments are literal text — doubled ''
    * escapes produce empty segments and keep the parity correct).
    */
  def translate(query: String): String =
    query.split("'", -1).zipWithIndex.map { case (part, i) =>
      if (i % 2 != 0) part
      else functionAliases.foldLeft(part) { case (q, (from, to)) =>
        if (from == to) q
        else q.replaceAll("(?i)\\b" + from + "\\s*\\(", to + "(")
      }
    }.mkString("'")

  /** Presto/MySQL date_format tokens → java.time patterns (reference:
    * presto-main/.../operator/scalar/DateTimeFunctions.java — Presto's
    * date_format/date_parse speak the MySQL '%'-token dialect, Spark's
    * date_format speaks java.time). Literal letters are quoted so they
    * can't be misread as pattern letters.
    */
  private val mysqlTokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'c' -> "M", 'm' -> "MM", 'b' -> "MMM",
    'M' -> "MMMM", 'd' -> "dd", 'e' -> "d", 'j' -> "DDD",
    'a' -> "EEE", 'W' -> "EEEE",
    'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'l' -> "h", 'p' -> "a",
    'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS",
    'T' -> "HH:mm:ss")

  def prestoDateFormat(pattern: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '%' && i + 1 < pattern.length) {
        val t = pattern.charAt(i + 1)
        sb.append(mysqlTokens.getOrElse(t, if (t == '%') "%" else s"'$t'"))
        i += 2
      } else {
        if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
