package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * The driver's correctness gate runs `run` on Spark and `oracle` on DuckDB
  * over the same parquet tables and hash-compares rows with columns sorted
  * by name — so every computed column is aliased identically on both sides.
  *
  * `sharedDialect = true` means the oracle text is ALSO valid Spark SQL;
  * the ScalaTest harness then runs it through `Engine.sql` and cross-checks
  * the DataFrame program against Spark's independent SQL planning path
  * (mirrors the reference's engine-vs-oracle pattern, reference:
  * presto-tests/.../AbstractTestQueryFramework.java:131-141).
  */
final case class Qdef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    sharedDialect: Boolean = true)

object Qdef {
  /** Oracle SQL runnable by BOTH DuckDB and Spark SQL. */
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Qdef =
    Qdef(name, run, Some(oracle), sharedDialect = true)

  /** Oracle SQL using DuckDB-only syntax (not runnable via Engine.sql). */
  def duckOnly(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Qdef =
    Qdef(name, run, Some(oracle), sharedDialect = false)
}
