package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver's compare sorts columns by name before hashing. */
final case class Query(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Query {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Query =
    Query(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Query =
    Query(name, fn, None)
}
