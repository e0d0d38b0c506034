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
  * Cross-engine determinism: the key is ranked on raw doubles, so it
  * must be BIT-IDENTICAL between Spark and the DuckDB oracle — but
  * libm `ln` is not (Java StrictMath.log and DuckDB's std::log may
  * disagree in the last ulp, and a rank amplifies one ulp into a
  * different sample — the r5 q139 failure). [[portableLnU]] therefore
  * computes ln(u) from IEEE-correctly-rounded primitives only
  * (+ − × ÷ are exactly specified by IEEE 754; both engines implement
  * them identically): the binary exponent comes from the bin()-string
  * length of the integer hash, the mantissa log from a fixed-order
  * atanh Horner series. Same expression tree in both engines ⇒ same
  * doubles ⇒ same ranks, no quantization grid needed.
  */
object Sampling {

  /** ln 2 as an exact double literal (both engines parse decimal
    * literals to the nearest IEEE double). */
  private val Ln2 = 0.6931471805599453

  /** Weighted sample without replacement of size `k`. Adds `ws_key`
    * (the A-ES key `ln(u)/w`, larger = selected first) and `rnk`
    * (1-based selection order). `weight` must be strictly positive;
    * `idCol` seeds the per-row uniform and breaks key ties, so it must
    * be unique. */
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
    val h = md5Long(concat(lit(s"$seed:"), idCol.cast("string")))
    df.withColumn("__hn", h + lit(1L))
      .withColumn("__bl", length(bin(col("__hn"))))
      .withColumn("__m",
        col("__hn").cast("double") /
          expr("CAST(shiftleft(CAST(1 AS BIGINT), __bl) AS DOUBLE)"))
      .withColumn("__z",
        (col("__m") - lit(1.0)) / (col("__m") + lit(1.0)))
      .withColumn("ws_key", aesKeyFromParts(weight))
      .drop("__hn", "__bl", "__m", "__z")
  }

  /** `(2z·poly(z²) + (bl−60)·ln2) / w` — the Horner atanh series for
    * ln(m), m ∈ [0.5, 1], plus the exponent term. Truncation after the
    * z¹⁵ term: ≤ ~5e-10 relative — irrelevant for sampling, and shared
    * exactly by the oracle ([[aesKeySql]] mirrors this tree node for
    * node). */
  private def aesKeyFromParts(weight: Column): Column = {
    def inv(k: Int): Column = lit(1.0) / lit(k.toDouble)
    val z = col("__z")
    val z2 = z * z
    val poly = lit(1.0) + z2 * (inv(3) + z2 * (inv(5) + z2 * (inv(7) +
      z2 * (inv(9) + z2 * (inv(11) + z2 * (inv(13) + z2 * inv(15)))))))
    val lnm = (lit(2.0) * z) * poly
    val lnu = lnm + (col("__bl").cast("double") - lit(60.0)) * lit(Ln2)
    lnu / weight
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
       |  (((2::DOUBLE * __z) * $poly)
       |    + (__bl::DOUBLE - 60::DOUBLE) * 0.6931471805599453::DOUBLE)
       |  / $weightExpr AS ws_key FROM __s4)""".stripMargin
  }
}
