package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (the reference's org-skew
  * rule: top 5% orgs ≈ 50% of order volume, reference
  * `data_gen/pseudo_code_rules.txt:2-10`).
  *
  * AQE splits skewed JOIN partitions automatically, but a skewed
  * AGGREGATION still funnels every hot-key row through one reducer
  * before map-side combine saturates. Salting splits each key into
  * `saltBuckets` sub-keys for a partial aggregate, then re-aggregates
  * the tiny partials — two shuffles, both balanced.
  *
  * Only works for algebraic aggregates (sum/count/min/max — anything
  * with a merge step). The helpers here cover the common money cases;
  * arbitrary merges follow the same shape.
  */
object Skew {

  /** Salted sum+count per key: `df.groupBy(key).agg(sum(value),
    * count(*))` with balanced reducers. The salt is derived from the
    * row's DATA (hash of every input column), so it is stable under
    * stage retry — `rand()`, `spark_partition_id`, and
    * `monotonically_increasing_id` all change when a lost partition is
    * recomputed with different placement/order, which can double-count
    * or drop rows mid-shuffle. Identical rows share a salt, which only
    * hurts balance if a hot KEY is also a single repeated row. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], value: Column,
      sumName: String, countName: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(sumName),
        sum(col("__pcnt")).cast("long").as(countName))
  }
}
