package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 dimension building + point-in-time (as-of) lookup.
  *
  * The reference declares SCD2 snapshot dims and overlap prevention
  * (reference `README.md:37,58`; `dbt_project.yml:12,58-60` snapshot
  * config) but ships no implementation; this is the Spark-native form:
  * one window over (key, change-time) produces half-open
  * `[valid_from, valid_to)` intervals, exactly one `is_current` per key.
  *
  * Scale notes: building is a single shuffle on the business key; the
  * as-of join keeps an equi key (so Spark plans broadcast/shuffled-hash/
  * sort-merge on the key) with the range predicate applied as a post-join
  * filter — never a cartesian.
  */
object Scd2 {

  /** Build an SCD2 dimension from a change log.
    *
    * @param changes  one row per observed state of the entity
    * @param key      business key columns
    * @param changeTs change timestamp column name (valid_from)
    * @param tieBreak extra ordering columns making same-timestamp changes
    *                 deterministic
    */
  def build(changes: DataFrame, key: Seq[String], changeTs: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(changeTs) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    changes
      .withColumn("valid_from", col(changeTs))
      .withColumn("valid_to", lead(col(changeTs), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(w).cast("long"))
  }

  /** Point-in-time join (SURVEY J5): each fact row picks the dim version
    * whose `[valid_from, valid_to)` interval contains `factTs`.
    * Inner by default; current (open-ended) versions match any later ts. */
  def asOfJoin(fact: DataFrame, dim: DataFrame, key: Seq[String],
      factTs: Column, joinType: String = "inner"): DataFrame = {
    val cond = key.map(k => fact(k) === dim(k)).reduce(_ && _) &&
      factTs >= dim("valid_from") &&
      (dim("valid_to").isNull || factTs < dim("valid_to"))
    fact.join(dim, cond, joinType)
  }

  /** Overlap violations (reference `README.md:58` "SCD2 window overlap
    * prevention"): rows whose interval overlaps the next interval of the
    * same key — empty on a well-formed dim. Window-based (one shuffle),
    * not a self-join. */
  def overlapViolations(dim: DataFrame, key: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("valid_from").asc, col("version").asc)
    dim.withColumn("__next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("__next_from").isNotNull &&
        (col("valid_to").isNull || col("valid_to") > col("__next_from")))
      .drop("__next_from")
  }

  /** Exactly-one-current invariant check: keys with != 1 current row. */
  def currentViolations(dim: DataFrame, key: Seq[String]): DataFrame =
    dim.groupBy(key.map(col): _*)
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
      .filter(col("n_current") =!= 1)
}
