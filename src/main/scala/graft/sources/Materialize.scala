package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style materialization (reference `dbt_project.yml:25-43`:
  * raw/staging/intermediate are VIEWS, marts are TABLES).
  *
  * A view is a registered lazy logical plan — downstream queries fuse
  * with it and Catalyst optimizes across the boundary (filter/column
  * pushdown through the view for free). A table is a persisted parquet
  * relation in the session catalog — downstream reads scan the
  * materialized result instead of recomputing (the mart trade-off the
  * reference makes for its reporting layer). */
object Materialize {

  /** View materialization (S6): name the plan, persist nothing. */
  def view(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** Table materialization (S7: `CREATE TABLE AS` parity, reference
    * `example/my_first_dbt_model.sql:10` `materialized='table'`):
    * overwrite-save to the session catalog, return the re-read
    * relation so downstream plans scan the stored copy. */
  def table(df: DataFrame, name: String): DataFrame = {
    df.write.mode("overwrite").format("parquet").saveAsTable(name)
    df.sparkSession.table(name)
  }

  /** Bucketed table materialization (reference "clustering" intent,
    * `README.md:12,90`): co-locate a table on its join key so repeated
    * fact⋈fact joins on that key skip the shuffle entirely — the
    * biggest single lever for a join-heavy mart layer at 100 TB (both
    * sides bucketed on the key ⇒ SortMergeJoin with zero Exchange). */
  def bucketedTable(df: DataFrame, name: String, bucketCols: Seq[String],
      numBuckets: Int): DataFrame = {
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
    df.sparkSession.table(name)
  }

  /** Incremental table materialization: append `increment`, then
    * return the deduplicated view of the stored relation (append +
    * keep-latest — the reference's daily `--day` run shape,
    * `README.md:82`). */
  def tableIncremental(spark: SparkSession, name: String,
      increment: DataFrame, keys: Seq[String],
      orderCol: String): DataFrame = {
    val exists = spark.catalog.tableExists(name)
    increment.write.mode(if (exists) "append" else "overwrite")
      .format("parquet").saveAsTable(name)
    graft.stage.Staging.dedupLatest(spark.table(name), keys,
      org.apache.spark.sql.functions.col(orderCol))
  }
}
