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

  /** No-op change suppression — the dbt snapshot `check` strategy's
    * core rule: a row only creates a new version when a WATCHED column
    * actually changed relative to the key's previous state; repeated
    * identical states collapse into the earlier version's interval.
    * One window over (key, change-time), comparing a struct of the
    * watched columns against its lag (null-safe, so null→value and
    * value→null count as changes). Run before [[build]]. */
  def collapseUnchanged(changes: DataFrame, key: Seq[String],
      changeTs: String, watch: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(changeTs) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    val state = struct(watch.map(col): _*)
    changes
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> state))
      .drop("__prev")
  }

  /** Incremental SCD2 merge — the dbt `snapshot` run semantic the
    * reference declares (`dbt_project.yml:12,58-60`; each run folds the
    * latest observed states into the dim, closing current rows and
    * inserting new versions): affected keys' version chains are rebuilt
    * from their existing versions plus the new changes; untouched keys
    * pass through via an anti-join with NO window work. The result is
    * row-identical to rebuilding from the full concatenated change log
    * (property-tested), but the window shuffle only touches changed
    * keys — at 100 TB a daily snapshot run re-versions the day's
    * changed entities, not the dimension.
    *
    * `changes` must carry the dim's original (non-SCD2) columns. */
  def merge(dim: DataFrame, changes: DataFrame, key: Seq[String],
      changeTs: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val scdCols = Seq("valid_from", "valid_to", "is_current", "version")
    val affectedKeys = changes.select(key.map(col): _*).distinct()
    val touched = dim.join(affectedKeys, key, "left_semi")
    val untouched = dim.join(affectedKeys, key, "left_anti")
    val touchedLog = touched.drop(scdCols: _*)
    val rebuilt = build(
      touchedLog.unionByName(
        changes.select(touchedLog.columns.toIndexedSeq.map(col): _*)),
      key, changeTs, tieBreak)
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time join (SURVEY J5): each fact row picks the dim version
    * whose `[valid_from, valid_to)` interval contains the fact's
    * `factTsCol`. Inner by default; current (open-ended) versions match
    * any later ts.
    *
    * Both sides are explicitly aliased so the join condition is
    * unambiguous even when fact and dim derive from the same scan (the
    * self-join case that otherwise degenerates to a trivially-true
    * predicate after a refactor). Returns all fact columns plus the
    * dim's non-key columns. */
  def asOfJoin(fact: DataFrame, dim: DataFrame, key: Seq[String],
      factTsCol: String, joinType: String = "inner"): DataFrame = {
    val f = fact.alias("__f")
    val d = dim.alias("__d")
    val ts = col(s"__f.$factTsCol")
    val cond = key.map(k => col(s"__f.$k") === col(s"__d.$k"))
      .reduce(_ && _) &&
      ts >= col("__d.valid_from") &&
      (col("__d.valid_to").isNull || ts < col("__d.valid_to"))
    val dimCols = dim.columns.filterNot(key.contains)
      .map(c => col(s"__d.$c"))
    f.join(d, cond, joinType).select((col("__f.*") +: dimCols.toSeq): _*)
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
