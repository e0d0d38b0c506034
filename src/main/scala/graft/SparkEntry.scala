package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, CorpusBuild, Curation, Llm, Mining, Modeling, Pipeline, Prep, Query, Relational, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as one entry in
  * `queries`, with a DuckDB-runnable oracle in `oracleSql` whenever the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All registered queries, grouped by module. */
  def registry: Seq[Query] =
    Relational.all ++ Warehouse.all ++ Llm.all ++ Curation.all ++
      Prep.all ++ Pipeline.all ++ Analytics.all ++ Mining.all ++
      Modeling.all ++ CorpusBuild.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q2.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
