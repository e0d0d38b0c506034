package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** Document deduplication operators for LLM training-data pipelines:
  * exact (content hash), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * The reference repo has no document pipeline (its raw layer is the
  * SaaS CSV contract, reference `models/schema.yml`); these are the
  * project's north-star extension (SURVEY §7.2 step 7), designed
  * Spark-first for the 100 TB posture:
  *
  *  - **never all-pairs**: candidate pairs come from LSH band buckets /
  *    inverted-index joins only — the quadratic blowup is bounded per
  *    bucket, and hot tokens are dropped by document frequency exactly
  *    like stop-grams in production near-dedup systems;
  *  - **portable hashing**: everything keys off md5 (bit-identical in
  *    every engine), so each operator is verifiable against a SQL
  *    oracle — no JVM-private hash functions in results;
  *  - all shapes are `DataFrame => DataFrame` built-ins: whole-stage
  *    codegen end to end, no UDFs.
  */
object TextDedup {

  /** One-row exact-duplicate summary over a corpus: raw content hash and
    * whitespace/case-normalized hash, each with distinct / dup-group /
    * dup-row counts. All outputs are exact integers (no double sums). */
  def exactDupStats(docs: DataFrame, textCol: String): DataFrame = {
    def stats(h: Column, tag: String): DataFrame =
      docs.select(h.as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .agg(
          sum(col("c")).cast("long").as(s"n_docs_$tag"),
          count(lit(1)).cast("long").as(s"n_distinct_$tag"),
          sum(when(col("c") > 1, 1).otherwise(0)).cast("long")
            .as(s"n_dup_groups_$tag"),
          sum(col("c") - 1).cast("long").as(s"n_dup_rows_$tag"))
    stats(md5(col(textCol)), "raw")
      .crossJoin(stats(md5(normText(col(textCol))), "norm"))
      .withColumnRenamed("n_docs_raw", "n_docs")
      .drop("n_docs_norm")
  }

  /** (id, shingles) pairs — docs with fewer than `n` words drop out
    * (they have no shingle and can never pass a Jaccard threshold). */
  def docShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash signature columns `__sig0..__sig{k-1}`: per hash seed, the
    * lexicographic min of seeded md5 over the shingle set. Fixed-width
    * hex strings order exactly like their 128-bit values, so string min
    * IS minhash — and stays engine-portable. */
  def withMinhashSignature(shingled: DataFrame, k: Int): DataFrame =
    (0 until k).foldLeft(shingled) { (d, i) =>
      d.withColumn(s"__sig$i",
        array_min(transform(col("sh"), x => md5(concat_ws(":", lit(i), x)))))
    }

  /** Banded-LSH candidate pairs: signatures are split into `bands`
    * groups of `rowsPerBand`, each hashed to a bucket key; two docs are
    * candidates iff they share a bucket in ANY band. The pair join runs
    * within buckets only — never across the corpus. */
  def lshCandidates(signed: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame = {
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"__sig$i"))
      signed.select(col("doc_id"), lit(b).as("band_id"),
        md5(concat_ws("|", cols: _*)).as("band_key"))
    }
    val all = bandRows.reduce(_ unionByName _)
    val a = all.select(col("band_id"), col("band_key"),
      col("doc_id").as("doc_a"))
    val b = all.select(col("band_id").as("band_id_b"),
      col("band_key").as("band_key_b"), col("doc_id").as("doc_b"))
    a.join(b,
        a("band_id") === b("band_id_b") &&
          a("band_key") === b("band_key_b") &&
          a("doc_a") < b("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** MinHash near-dedup, end to end: shingle → sign → band → bucket-join
    * candidates → exact Jaccard verification (within candidates ONLY).
    * Returns (doc_a, doc_b, jaccard) for verified pairs ≥ `threshold`.
    * Jaccard is a ratio of exact integer set sizes — deterministic. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val shingled = docShingles(docs, idCol, textCol, shingleN)
    val signed = withMinhashSignature(shingled, numHashes)
    val cand = lshCandidates(signed, bands, numHashes / bands)
    val sa = shingled.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
    val sb = shingled.select(col("doc_id").as("doc_b"), col("sh").as("sb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("__jac",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_distinct(concat(col("sa"), col("sb")))).cast("double"))
      .filter(col("__jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("__jac"), 6).as("jaccard"))
  }

  /** 32-bit SimHash of the whitespace token multiset: bit b of the
    * fingerprint is the sign of `sum over tokens of (2*bit_b(h(t)) - 1)`
    * (ties count as set). Token hash = portable 60-bit md5. */
  def simhash32(textCol: Column): Column = {
    val hs = transform(tokens(textCol), t => md5Long(t))
    val n = size(hs)
    val bits = (0 until 32).map { b =>
      val ones = size(filter(hs, h => (shiftright(h, b) % 2) === 1))
      when(ones * 2 - n >= 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs: fingerprints are banded into 4 bytes; two
    * docs are candidates iff they share any byte (pigeonhole: every pair
    * within Hamming distance ≤ 3 shares at least one of 4 bands), then
    * verified with exact `bit_count(xor) <= maxHamming`. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole only guarantees hamming <= 3")
    val fp = docs.select(col(idCol).as("doc_id"),
      simhash32(col(textCol)).as("fp"))
    val banded = (0 until 4).map { j =>
      fp.select(col("doc_id"), col("fp"), lit(j).as("band_id"),
        (shiftright(col("fp"), j * 8) % 256).as("band_key"))
    }.reduce(_ unionByName _)
    val a = banded.select(col("band_id"), col("band_key"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band_id").as("band_id_b"),
      col("band_key").as("band_key_b"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, a("band_id") === b("band_id_b") &&
        a("band_key") === b("band_key_b") && a("doc_a") < b("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Character-n-gram Jaccard near-dups over an inverted index:
    * explode distinct grams → drop grams appearing in more than `maxDf`
    * docs (stop-gram removal — the scale guard: a gram shared by
    * millions of docs would otherwise create a quadratic bucket) →
    * pair docs via the index → exact Jaccard over the FILTERED gram
    * sets (both sizes and overlap count rare grams only). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Int, threshold: Double): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), explode(charNgrams(col(textCol), n))
        .as("gram"))
    val rare = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("gram")
    val filtered = grams.join(rare, "gram")
    val sizes = filtered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("sz"))
    val x = filtered.select(col("gram"), col("doc_id").as("doc_a"))
    val y = filtered.select(col("gram").as("gram_b"),
      col("doc_id").as("doc_b"))
    val overlap = x.join(y,
        x("gram") === y("gram_b") && x("doc_a") < y("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ovl"))
    overlap
      .join(sizes.withColumnsRenamed(
        Map("doc_id" -> "doc_a", "sz" -> "sz_a")), "doc_a")
      .join(sizes.withColumnsRenamed(
        Map("doc_id" -> "doc_b", "sz" -> "sz_b")), "doc_b")
      .withColumn("__jac", col("ovl").cast("double") /
        (col("sz_a") + col("sz_b") - col("ovl")).cast("double"))
      .filter(col("__jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("__jac"), 6).as("jaccard"))
  }

  /** Content-defined fingerprinting (winnowing-style sampling): the
    * fingerprint set of a doc is the char-n-gram hashes ≡ 0 (mod
    * `modulus`) — a deterministic ~1/modulus sample that survives local
    * edits. Pairs sharing ≥ `minShared` fingerprints are reported via
    * the same inverted-index join (never all-pairs). */
  def fingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, modulus: Int, minShared: Int): DataFrame = {
    val fps = docs
      .select(col(idCol).as("doc_id"),
        explode(charNgrams(col(textCol), n)).as("gram"))
      .select(col("doc_id"), md5Long(col("gram")).as("fp"))
      .filter(col("fp") % modulus === 0)
      .distinct()
    val a = fps.select(col("fp"), col("doc_id").as("doc_a"))
    val b = fps.select(col("fp").as("fp_b"), col("doc_id").as("doc_b"))
    a.join(b, a("fp") === b("fp_b") && a("doc_a") < b("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
