package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * The driver's correctness gate runs `run` on Spark and `oracle` on DuckDB
  * over the same parquet tables and hash-compares rows with columns sorted
  * by name — so every computed column is aliased identically on both sides.
  */
final case class Qdef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Qdef {
  /** Convenience constructor with an oracle. */
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Qdef =
    Qdef(name, run, Some(oracle))
}
