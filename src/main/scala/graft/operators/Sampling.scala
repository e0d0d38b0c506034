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
  *
  * Cross-engine determinism, two layers deep. (1) The key avoids libm:
  * Java StrictMath.log and DuckDB's std::log may disagree in the last
  * ulp, and a rank amplifies one ulp into a different sample (the r5
  * q139 failure) — so ln(u) is computed from IEEE-correctly-rounded
  * primitives only (+ − × ÷ are exactly specified by IEEE 754): the
  * binary exponent comes from the bin()-string length of the integer
  * hash, the mantissa log from a fixed-order atanh Horner series.
  * (2) The ranked key is then QUANTIZED to a 1e-12 integer grid —
  * `ws_key = floor(raw·1e12 + 0.5)` as BIGINT — so cross-engine
  * parity is structural: even if some environment's double pipeline
  * (build flags, x87 vs SSE, a different constant-folding path)
  * perturbs the raw key by an ulp, both engines compare the SAME
  * integers, and grid ties break deterministically on `idCol`. An ulp
  * can still straddle a grid boundary in principle, but a one-cell
  * move only reorders rows whose keys are within 1e-12 of each other —
  * versus raw-double ranking, where EVERY adjacent pair is one ulp
  * from swapping (the r7 driver-environment failure mode).
  *
  * Contract: `weight ≥ 0.005` keeps |raw|·1e12 below 2^53 (|ln u| ≤
  * 60·ln2 ≈ 41.6 for the 60-bit hash), so the grid value is an exact
  * double before the BIGINT cast in both engines.
  */
object Sampling {

  /** ln 2 as an exact double literal (both engines parse decimal
    * literals to the nearest IEEE double). */
  private val Ln2 = 0.6931471805599453

  /** Weighted sample without replacement of size `k`. Adds `ws_key`
    * (the A-ES key `ln(u)/w` on the 1e-12 integer grid, BIGINT,
    * larger = selected first) and `rnk` (1-based selection order).
    * `weight` must be ≥ 0.005 (see the grid contract above); `idCol`
    * seeds the per-row uniform and breaks grid ties, so it must be
    * unique. */
  def weightedSample(df: DataFrame, idCol: Column, weight: Column, k: Int,
      seed: String): DataFrame = {
    val keyed = withAesKey(df, idCol, weight, seed)
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
    val keyed = withAesKey(df, idCol, weight, seed)
    keyed.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("ws_key").desc, idCol)))
      .filter(col("rnk") <= k)
  }

  /** Adds `ws_key` = `ln(u)/w` with the portable md5-derived uniform
    * and the portable (libm-free) ln. Intermediate columns are scoped
    * to this method and dropped. */
  private def withAesKey(df: DataFrame, idCol: Column, weight: Column,
      seed: String): DataFrame = {
    // ENFORCED grid contract (not just scaladoc): weight < 0.005 would
    // push |raw·1e12| past 2^53 and silently lose integer-grid
    // exactness — the exact cross-engine rank-drift class the grid
    // exists to prevent — so a violating row fails the job loudly.
    // The guard is a no-op on conforming data, so the DuckDB oracle
    // twin (which has no guard) stays node-for-node equivalent.
    // isnan: NaN < 0.005 is false, so without it a NaN weight would
    // bypass the guard and silently produce an off-grid ws_key
    val checked = when(weight < lit(0.005) || weight.isNull ||
        isnan(weight.cast("double")),
      raise_error(concat(
        lit("Sampling: weight must be >= 0.005 (1e-12 grid contract), got "),
        weight.cast("string")))).otherwise(weight)
    val h = md5Long(concat(lit(s"$seed:"), idCol.cast("string")))
    df.withColumn("__hn", h + lit(1L))
      .withColumn("__bl", length(bin(col("__hn"))))
      .withColumn("__m",
        col("__hn").cast("double") /
          expr("CAST(shiftleft(CAST(1 AS BIGINT), __bl) AS DOUBLE)"))
      .withColumn("__z",
        (col("__m") - lit(1.0)) / (col("__m") + lit(1.0)))
      .withColumn("ws_key", aesKeyFromParts(checked))
      .drop("__hn", "__bl", "__m", "__z")
  }

  /** `floor(1e12·(2z·poly(z²) + (bl−60)·ln2)/w + 0.5)` as BIGINT —
    * the Horner atanh series for ln(m), m ∈ [0.5, 1], plus the
    * exponent term, quantized to the 1e-12 integer grid. Series
    * truncation after the z¹⁵ term: ≤ ~5e-10 relative — irrelevant
    * for sampling, and shared exactly by the oracle
    * ([[aesKeySqlCtes]] mirrors this tree node for node; Spark's
    * `floor(double)` already yields LongType, the SQL twin adds an
    * explicit BIGINT cast). */
  private def aesKeyFromParts(weight: Column): Column = {
    def inv(k: Int): Column = lit(1.0) / lit(k.toDouble)
    val z = col("__z")
    val z2 = z * z
    val poly = lit(1.0) + z2 * (inv(3) + z2 * (inv(5) + z2 * (inv(7) +
      z2 * (inv(9) + z2 * (inv(11) + z2 * (inv(13) + z2 * inv(15)))))))
    val lnm = (lit(2.0) * z) * poly
    val lnu = lnm + (col("__bl").cast("double") - lit(60.0)) * lit(Ln2)
    floor(lnu / weight * lit(1.0e12) + lit(0.5))
  }

  /** The DuckDB twin of the portable A-ES key: chained CTE SELECTs
    * that mirror [[withAesKey]]/[[aesKeyFromParts]] expression node
    * for expression node. `inner` must yield a column `__hn` (the
    * md5-long hash + 1) plus whatever `weightExpr` references; the
    * result is a CTE body chain
    * `__s0 AS (...), ... , <out> AS (SELECT *, ws_key FROM ...)`
    * to splice after `WITH`. */
  def aesKeySqlCtes(inner: String, out: String,
      weightExpr: String): String = {
    val c = (3 to 15 by 2)
      .map(k => s"(1::DOUBLE / $k::DOUBLE)")
    val poly = s"(1::DOUBLE + __z2 * (${c(0)} + __z2 * (${c(1)} + " +
      s"__z2 * (${c(2)} + __z2 * (${c(3)} + __z2 * (${c(4)} + " +
      s"__z2 * (${c(5)} + __z2 * ${c(6)})))))))"
    s"""__s0 AS ($inner),
       |__s1 AS (SELECT *, length(bin(__hn)) AS __bl FROM __s0),
       |__s2 AS (SELECT *,
       |  __hn::DOUBLE / (1::BIGINT << __bl)::DOUBLE AS __m FROM __s1),
       |__s3 AS (SELECT *,
       |  (__m - 1::DOUBLE) / (__m + 1::DOUBLE) AS __z FROM __s2),
       |__s4 AS (SELECT *, __z * __z AS __z2 FROM __s3),
       |$out AS (SELECT * EXCLUDE (__hn, __bl, __m, __z, __z2),
       |  CAST(floor(
       |    ((((2::DOUBLE * __z) * $poly)
       |      + (__bl::DOUBLE - 60::DOUBLE) * 0.6931471805599453::DOUBLE)
       |     / $weightExpr) * 1000000000000.0::DOUBLE + 0.5::DOUBLE)
       |  AS BIGINT) AS ws_key FROM __s4)""".stripMargin
  }
}
