package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions.md5Long

/** Deterministic weighted sampling without replacement — the
  * Efraimidis–Spirakis exponential-keys method (A-ES, IPL 2006): each
  * row draws `u ∈ (0,1]` and competes with key `ln(u)/w`; the top-k
  * keys ARE a weighted sample without replacement. Used by curation
  * pipelines to draw quality- or domain-weighted subsets (the
  * sampled-mixture step after q89's weights).
  *
  * Scale design (100 TB): one corpus scan computes keys (pure row-local
  * expressions, no RNG state — the uniform is the portable md5 hash, so
  * a retry or a different partitioning draws the SAME sample), and the
  * top-k goes through [[Ranking.withGlobalRank]] — range-partitioned
  * distributed rank, no single-partition window, no driver collect.
  */
object Sampling {

  /** 2^60 — md5Long's range is [0, 2^60), so `(h+1)/2^60 ∈ (0, 1]`. */
  private val HashRange = 1152921504606846976.0

  /** Weighted sample without replacement of size `k`. Adds `ws_key`
    * (the A-ES key `ln(u)/w`, larger = selected first) and `rnk`
    * (1-based selection order). `weight` must be strictly positive;
    * `idCol` seeds the per-row uniform and breaks key ties, so it must
    * be unique. */
  def weightedSample(df: DataFrame, idCol: Column, weight: Column, k: Int,
      seed: String): DataFrame = {
    val keyed = df.withColumn("ws_key", aesKey(idCol, weight, seed))
    Ranking
      .withGlobalRank(keyed,
        struct((col("ws_key") * -1).as("nk"), idCol.as("id")).asc, "rnk")
      .filter(col("rnk") <= k)
  }

  /** STRATIFIED weighted sample: an independent A-ES draw of size `k`
    * inside every group — the per-domain / per-language quota draw of
    * a curation mix. The rank window is PARTITIONED by the group
    * (bounded per-group state, the q5 window shape), never global. */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: Column, weight: Column, k: Int, seed: String): DataFrame = {
    val keyed = df.withColumn("ws_key", aesKey(idCol, weight, seed))
    keyed.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("ws_key").desc, idCol)))
      .filter(col("rnk") <= k)
  }

  /** The A-ES key `ln(u)/w` with the portable md5-derived uniform. */
  private def aesKey(idCol: Column, weight: Column, seed: String): Column = {
    val u = (md5Long(concat(lit(s"$seed:"), idCol.cast("string"))) + 1)
      .cast("double") / HashRange
    log(u) / weight
  }
}
