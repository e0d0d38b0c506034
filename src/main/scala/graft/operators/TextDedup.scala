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

  /** Doc ids that LOSE exact (normalized-content) dedup: every member
    * of a normalized-hash group except its min-id representative. One
    * map-side-combinable group on the hash + one equi-join back —
    * never an all-pairs form, and singleton groups are pruned before
    * the join. */
  def exactDupLosers(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).as("doc_id"),
      md5(normText(col(textCol))).as("__h"))
    val reps = hashed.groupBy(col("__h"))
      .agg(min(col("doc_id")).as("__m"), count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
    hashed.join(reps, "__h")
      .filter(col("doc_id") =!= col("__m"))
      .select(col("doc_id"))
  }

  /** Distinct (doc_id, g) word n-gram shingle ROWS — docs with fewer
    * than `n` words drop out (no shingle, can never pass a Jaccard
    * threshold).
    *
    * Deliberately explode-based, NOT an array-building higher-order
    * function: the `transform(sequence(...), i -> slice...)` form runs
    * one INTERPRETED lambda call per shingle, and after projection
    * collapse re-evaluates the tokenizer per element — measured ~8x
    * slower on the fixture corpus. Here tokenization happens once per
    * doc in the projection feeding the Generate (explode), which
    * materializes `__w` for its output rows, and each shingle is one
    * codegen'd slice+join. */
  def docShingleRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int, distinctGrams: Boolean = true): DataFrame = {
    val rows = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"),
        explode(when(size(col("__w")) >= n,
          sequence(lit(0), size(col("__w")) - n))
          .otherwise(array())).as("__i"))
      .select(col("doc_id"),
        array_join(slice(col("__w"), col("__i") + 1, lit(n)), " ").as("g"))
    // multiplicity-preserving form for occurrence statistics (repetition
    // signals); set form for similarity ops
    if (distinctGrams) rows.distinct() else rows
  }

  /** Distinct word-n-gram count of a text column — ROW-LOCAL (array
    * HOFs, no explode/shuffle); 0 for texts shorter than n words.
    * Matches [[docShingleRows]]'s gram definition exactly. */
  def distinctGramCount(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      size(array_distinct(transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " ")))))
      .otherwise(lit(0))
  }

  /** MinHash signatures `(doc_id, __sig0..__sig{k-1})` via
    * Carter-Wegman double hashing: only TWO md5 evaluations per shingle
    * (h1, h2); family member i is `min over shingles of
    * (h1 + i * (h2 mod 2^50))` — the standard trick for cheap minhash
    * families, exactly replicable in SQL. Computed relationally over
    * the exploded shingle rows (k min aggregates in ONE
    * map-side-combinable shuffle) instead of k array passes, so each
    * shingle is hashed once regardless of k. Returns ONLY ids +
    * signatures — the banding path never carries shingle sets through
    * its shuffles. Overflow-safe: h1 < 2^60 and (k-1)·2^50 < 2^55,
    * sum < 2^61. */
  def minhashSignatures(shingleRows: DataFrame, k: Int): DataFrame = {
    val ex = shingleRows
      .select(col("doc_id"), md5Long(col("g")).as("h1"),
        pmod(md5LongSeeded(col("g"), 999), lit(1L << 50)).as("h2"))
    ex.groupBy(col("doc_id"))
      .agg(min(col("h1")).as("__sig0"),
        (1 until k).map(i =>
          min(col("h1") + lit(i.toLong) * col("h2")).as(s"__sig$i")): _*)
  }

  /** Banded signature rows `(doc_id, band_id, band_key)`: signatures
    * split into `bands` groups of `rowsPerBand`, each hashed to a
    * bucket key. One `posexplode` emits all band rows in a single pass
    * (a per-band union would recompute the signature pipeline per
    * leg). Shared by the candidate join and the signature-only
    * dup-rate estimator. */
  def lshBandRows(signed: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame = {
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"__sig$i"))
      md5(concat_ws("|", cols: _*))
    }
    signed.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band_id", "band_key")))
  }

  /** Banded-LSH candidate pairs: two docs are candidates iff they share
    * a bucket in ANY band. The pair join runs within buckets only —
    * never across the corpus. The small (doc × bands)-row frame is
    * persisted because the self-join reads it twice. */
  def lshCandidates(signed: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame = {
    val all = lshBandRows(signed, bands, rowsPerBand)
      .transform(InternalCache.persist(_))
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
    // consumed by the signature pipeline, the size aggregate, AND both
    // sides of the verify join — persist instead of re-shingling
    val rows = docShingleRows(docs, idCol, textCol, shingleN)
      .transform(InternalCache.persist(_))
    val signed = minhashSignatures(rows, numHashes)
    val cand = lshCandidates(signed, bands, numHashes / bands)
    verifyJaccard(cand, rows, threshold)
  }

  /** Exact set Jaccard through the gram ROWS, restricted to candidate
    * pairs: |A∩B| via a shared-gram join, |A∪B| = szA + szB − overlap.
    * Identical values to the array intersect/union form, without
    * shuffling shingle arrays. `rows` must be the (doc_id, g) distinct
    * gram rows of every doc appearing in `cand`. */
  private def verifyJaccard(cand: DataFrame, rows: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccardAll(cand, rows)
      .filter(col("jraw") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Unthresholded verification: every candidate pair with ≥1 shared
    * gram, carrying BOTH the raw Jaccard (`jraw` — filter on this;
    * `jraw >= t` is the same comparison the thresholded path makes) and
    * the 6-dp presentation value (`jaccard`). Lets one verify pass
    * serve every threshold downstream. */
  private def verifyJaccardAll(cand: DataFrame, rows: DataFrame)
      : DataFrame = {
    val sizes = rows.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = rows.select(col("doc_id").as("doc_a"), col("g"))
    val b = rows.select(col("doc_id").as("doc_b"), col("g"))
    val ovl = cand.join(a, "doc_a").join(b, Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ovl"))
    ovl
      .join(sizes.withColumnsRenamed(
        Map("doc_id" -> "doc_a", "sz" -> "sz_a")), "doc_a")
      .join(sizes.withColumnsRenamed(
        Map("doc_id" -> "doc_b", "sz" -> "sz_b")), "doc_b")
      .withColumn("__jac", col("ovl").cast("double") /
        (col("sz_a") + col("sz_b") - col("ovl")).cast("double"))
      // sizes + overlap ride along so containment-style consumers
      // (q114) derive their ratios from the SAME verified frame instead
      // of re-running the pipeline
      .select(col("doc_a"), col("doc_b"), col("ovl"), col("sz_a"),
        col("sz_b"), col("__jac").as("jraw"),
        round(col("__jac"), 6).as("jaccard"))
  }

  /** [[minhashNearDups]] without the threshold: the full verified
    * candidate-pair frame (jraw + jaccard) — build once, filter many. */
  def minhashNearDupsAll(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = docShingleRows(docs, idCol, textCol, shingleN)
      .transform(InternalCache.persist(_))
    val signed = minhashSignatures(rows, numHashes)
    val cand = lshCandidates(signed, bands, numHashes / bands)
    verifyJaccardAll(cand, rows)
  }

  /** Incremental near-dedup: the daily-run shape. A NEW batch of docs
    * (rows satisfying `isNew` over `doc_id`) is checked against the
    * WHOLE corpus (existing + batch) without ever generating
    * existing×existing pairs — the candidate join keeps only pairs with
    * a new doc on the left, so a daily increment at 100 TB pays
    * |batch-bucket rows| × |bucket peers|, never the corpus self-join.
    * Within-batch pairs are canonicalized (doc_a < doc_b) so they are
    * not double-counted; batch-vs-existing pairs keep the NEW doc as
    * `doc_a` regardless of id order. Returns verified
    * (doc_a, doc_b, jaccard) like [[minhashNearDups]].
    *
    * In a production run the corpus band rows are a persisted index
    * written by earlier runs; here they are computed from the corpus
    * frame — the join shape (the scale-determining part) is identical. */
  def minhashNearDupsIncremental(docs: DataFrame, idCol: String,
      textCol: String, isNew: Column, shingleN: Int, numHashes: Int,
      bands: Int, threshold: Double): DataFrame =
    minhashNearDupsIncrementalBy(docs, idCol, textCol,
      _.withColumn("__new", isNew), shingleN, numHashes, bands, threshold)

  /** [[minhashNearDupsIncremental]] with the batch given as a FRAME
    * instead of an id predicate — the form a streaming `foreachBatch`
    * needs, where batch membership is not a pure function of the id.
    * The corpus is `existing` ∪ `batch`; newness is flagged by an
    * equi-join against the batch's distinct ids (never a collected id
    * list). */
  def minhashNearDupsIncremental(existing: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, shingleN: Int, numHashes: Int,
      bands: Int, threshold: Double): DataFrame = {
    val combined = existing.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    val newIds = batch.select(col(idCol).as("__nid")).distinct()
    minhashNearDupsIncrementalBy(combined, idCol, textCol,
      df => df.join(newIds, df("doc_id") === newIds("__nid"), "left")
        .withColumn("__new", col("__nid").isNotNull).drop("__nid"),
      shingleN, numHashes, bands, threshold)
  }

  /** Verified canonical (doc_a < doc_b) near-dup pairs assembled from
    * PRECOMPUTED band rows ([[lshBandRows]]) and gram rows
    * ([[docShingleRows]]) — for callers that also PUBLISH the band
    * rows as a persistent index (the composed corpus build), so the
    * signature pipeline runs once for both purposes. Same output as
    * [[minhashNearDups]]. Caller should persist both inputs. */
  def nearDupsFromBandRows(bandRows: DataFrame, rows: DataFrame,
      threshold: Double): DataFrame = {
    val a = bandRows.select(col("band_id"), col("band_key"),
      col("doc_id").as("doc_a"))
    val b = bandRows.select(col("band_id").as("band_id_b"),
      col("band_key").as("band_key_b"), col("doc_id").as("doc_b"))
    val cand = a.join(b,
        a("band_id") === b("band_id_b") &&
          a("band_key") === b("band_key_b") &&
          a("doc_a") < b("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cand, rows, threshold)
  }

  /** Incremental near-dedup served from a PERSISTED band index — the
    * form a composed corpus product needs at 100 TB, where
    * [[minhashNearDupsIncremental]]'s re-signing of the whole corpus
    * per delta is not affordable. Only the DELTA is shingled and
    * signed; candidates come from joining the delta's band rows
    * against `indexBands` — the stored `(doc_id, band_id, band_key)`
    * rows of every PRIOR candidate, written by earlier runs via
    * [[lshBandRows]] — plus canonicalized (a < b) within-delta pairs.
    * Verification then re-shingles ONLY the prior docs named by some
    * candidate pair, fetching their text from `corpusText`
    * (doc_id + `textCol`): cost is ∝ delta + candidates, never ∝
    * corpus.
    *
    * A candidate doc_b missing from `corpusText` (e.g. its band rows
    * outlived an erasure) verifies no pair — stale index entries are
    * harmless, the same contract as the decontamination gram index.
    *
    * Returns verified (doc_a, doc_b, jaccard): delta-vs-index pairs
    * keep the delta doc as doc_a; within-delta pairs are a < b. */
  def minhashNearDupsIndexed(delta: DataFrame, idCol: String,
      textCol: String, indexBands: DataFrame, corpusText: DataFrame,
      shingleN: Int, numHashes: Int, bands: Int, threshold: Double)
      : DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = docShingleRows(delta, idCol, textCol, shingleN)
      .transform(InternalCache.persist(_))
    val signed = minhashSignatures(rows, numHashes)
    // read by the index join, the within-delta join, and (appended by
    // the caller) the index maintenance write
    val deltaBands = lshBandRows(signed, bands, numHashes / bands)
      .transform(InternalCache.persist(_))
    val a = deltaBands.select(col("band_id"), col("band_key"),
      col("doc_id").as("doc_a"))
    val bIdx = indexBands.select(col("band_id").as("band_id_b"),
      col("band_key").as("band_key_b"), col("doc_id").as("doc_b"))
    // persisted: read by the verify join AND the prior-doc text fetch
    val candIdx = a.join(bIdx,
        a("band_id") === bIdx("band_id_b") &&
          a("band_key") === bIdx("band_key_b") &&
          a("doc_a") =!= bIdx("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .transform(InternalCache.persist(_))
    val bNew = deltaBands.select(col("band_id").as("band_id_b"),
      col("band_key").as("band_key_b"), col("doc_id").as("doc_b"))
    val candNew = a.join(bNew,
        a("band_id") === bNew("band_id_b") &&
          a("band_key") === bNew("band_key_b") &&
          a("doc_a") < bNew("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val cand = candIdx.unionByName(candNew).distinct()
    // shingle only the PRIOR docs some candidate names (left_semi on
    // the candidate doc_bs) — within-delta doc_bs are already in `rows`
    val priorRows = docShingleRows(
      corpusText.join(
        candIdx.select(col("doc_b").as(idCol)).distinct(),
        Seq(idCol), "left_semi"),
      idCol, textCol, shingleN)
    verifyJaccard(cand, rows.unionByName(priorRows), threshold)
  }

  private def minhashNearDupsIncrementalBy(docs: DataFrame, idCol: String,
      textCol: String, markNew: DataFrame => DataFrame, shingleN: Int,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = docShingleRows(docs, idCol, textCol, shingleN)
      .transform(InternalCache.persist(_))
    val signed = minhashSignatures(rows, numHashes)
    val rowsPerBand = numHashes / bands
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"__sig$i"))
      md5(concat_ws("|", cols: _*))
    }
    val all = signed.select(col("doc_id"),
        posexplode(array(bandKeys: _*)).as(Seq("band_id", "band_key")))
      .transform(markNew)
      .transform(InternalCache.persist(_))
    val a = all.filter(col("__new")).select(col("band_id"),
      col("band_key"), col("doc_id").as("doc_a"))
    val b = all.select(col("band_id").as("band_id_b"),
      col("band_key").as("band_key_b"), col("doc_id").as("doc_b"),
      col("__new").as("__new_b"))
    val cand = a.join(b,
        a("band_id") === b("band_id_b") &&
          a("band_key") === b("band_key_b") &&
          a("doc_a") =!= b("doc_b") &&
          (!b("__new_b") || a("doc_a") < b("doc_b")))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cand, rows, threshold)
  }

  /** 32-bit SimHash per doc, computed relationally: tokens exploded,
    * each hashed ONCE, then 32 conditional-sum aggregates in a single
    * map-side-combinable shuffle. (The pure-Column form re-evaluates
    * the token-hash array for every bit term after Catalyst collapses
    * projections — 32× the md5 work; the explode form hashes once.)
    * Bit b is the sign of `sum over tokens of (2*bit_b(h(t)) - 1)`,
    * ties counting as set. */
  def simhash32(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val ex = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("doc_id"), md5Long(col("t")).as("h"))
    val sums = ex.groupBy(col("doc_id"))
      .agg(sum(when((shiftright(col("h"), 0) % 2) === 1, 1).otherwise(-1))
          .as("__s0"),
        (1 until 32).map(b =>
          sum(when((shiftright(col("h"), b) % 2) === 1, 1).otherwise(-1))
            .as(s"__s$b")): _*)
    val fp = (0 until 32).map { b =>
      when(col(s"__s$b") >= 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    sums.select(col("doc_id"), fp.as("fp"))
  }

  /** SimHash near-dup pairs: fingerprints are banded into 4 bytes; two
    * docs are candidates iff they share any byte (pigeonhole: every pair
    * within Hamming distance ≤ 3 shares at least one of 4 bands), then
    * verified with exact `bit_count(xor) <= maxHamming`. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole only guarantees hamming <= 3")
    val fp = simhash32(docs, idCol, textCol)
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
    // feeds sizes + both sides of the pair join: persist one copy
    val filtered = grams.join(rare, "gram")
      .transform(InternalCache.persist(_))
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

  /** EXACT set-similarity join by prefix filtering (the PPJoin family,
    * Xiao et al. 2008): for token-set Jaccard ≥ t, two sets MUST share
    * at least one token among the first `|x| − ⌈t·|x|⌉ + 1` of a
    * global canonical ordering (rarest token first) — so candidates
    * are an equi join on PREFIX tokens only, and because rare tokens
    * lead, prefix postings are the SHORTEST lists in the corpus.
    * Unlike the df-capped inverted index ([[ngramJaccardPairs]], which
    * trades recall for bound), the prefix filter is LOSSLESS: every
    * qualifying pair is found (property-tested against brute force).
    *
    * Scale shape: one df aggregate, one ordered-list build (sorted
    * per-doc arrays — deterministic (df, token) order), prefix explode
    * (≈ half of each doc's tokens at t = 0.5), posting-list self-join,
    * exact verify on candidates through token rows. No all-pairs
    * product anywhere; the join is bounded by prefix-posting sizes,
    * which the rarest-first ordering minimizes. */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    require(threshold == 0.5,
      "integer-exact prefix length implemented for t = 0.5")
    // shingle sets, not raw tokens: on template-heavy corpora raw
    // token sets are corpus-wide near-identical (Jaccard ≥ 0.5 for
    // most pairs), while n-word shingles keep the similarity signal
    // discriminative — the same reason q23's minhash runs on shingles.
    // Shingles travel as 60-bit md5 hashes: every downstream shuffle
    // (df join, posting join, verify) carries 8-byte keys instead of
    // strings — q23's portable-hash trade, replayed by the oracle
    val rows = docShingleRows(docs, idCol, textCol, shingleN)
      .select(col("doc_id"), md5Long(col("g")).as("w"))
      .distinct() // distinct over HASHES, mirroring the oracle's form
      .transform(InternalCache.persist(_))
    val dfc = rows.groupBy(col("w")).agg(count(lit(1)).as("dfw"))
    val lists = rows.join(dfc, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("dfw"), col("w"))))
        .as("lst"))
      .select(col("doc_id"), size(col("lst")).as("n"), col("lst"))
    // prefix length for Jaccard t = 0.5: n − ⌈n/2⌉ + 1, exact integers.
    // Singleton pruning (lossless): a candidate pair needs its shared
    // token in BOTH prefixes, so df = 1 postings can never pair —
    // and rarest-first ordering makes singletons MOST of every prefix
    val prefix = lists.select(col("doc_id"),
        explode(expr("slice(lst, 1, n - ((n + 1) div 2) + 1)")).as("p"))
      .filter(col("p.dfw") >= 2)
      .select(col("doc_id"), col("p.w").as("w"))
      .transform(InternalCache.persist(_))
    val cand = prefix.select(col("w"), col("doc_id").as("doc_a"))
      .join(prefix.select(col("w"), col("doc_id").as("doc_b")), Seq("w"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sizes = rows.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = rows.select(col("doc_id").as("doc_a"), col("w"))
    val b = rows.select(col("doc_id").as("doc_b"), col("w"))
    val ovl = cand.join(a, "doc_a").join(b, Seq("doc_b", "w"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ovl"))
    ovl
      .join(sizes.withColumnsRenamed(
        Map("doc_id" -> "doc_a", "sz" -> "sz_a")), "doc_a")
      .join(sizes.withColumnsRenamed(
        Map("doc_id" -> "doc_b", "sz" -> "sz_b")), "doc_b")
      .withColumn("__pjac", col("ovl").cast("double") /
        (col("sz_a") + col("sz_b") - col("ovl")).cast("double"))
      .filter(col("__pjac") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("__pjac"), 6).as("jaccard"))
  }

  /** Connected components over near-dup pairs → dedup clusters:
    * every doc in a component gets the component's minimum doc id as
    * `cluster_id` (the canonical representative).
    *
    * Alternating large-star / small-star contraction (the MapReduce
    * connected-components formulation of Kiveris et al., SoCC'14):
    * each round is two relational star operations over the PAIR graph
    * only (tiny relative to the corpus — only near-dup docs appear),
    * and the round count is O(log n), independent of component
    * diameter — unlike min-label propagation, whose round count IS the
    * diameter. Convergence costs one (count, hash-sum) scalar per
    * ROUND — a batched check over the whole edge set, not a
    * per-propagation-step action. Lineage is truncated each round with
    * `localCheckpoint` — REQUIRED, not an optimization: every star
    * references its input plan several times, so without truncation the
    * logical-plan tree grows exponentially in the round count and the
    * optimizer, not the data, becomes the bottleneck. */
  def dupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // canonical undirected edges (small id first), self-loops dropped
    var edges = pairs
      .select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    // large-star: for every node u, connect each LARGER neighbor to the
    // minimum of u's closed neighborhood
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("__m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: for every node u, connect u and all its SMALLER
    // neighbors to the minimum of that set
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = oriented.groupBy("u").agg(min(col("v")).as("__m"))
      oriented.join(m, "u")
        .select(col("v").as("u"), col("__m").as("v"))
        .unionByName(m.select(col("u"), col("__m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // order-independent edge-set signature: equal signatures across a
    // round mean a fixed point (w.h.p.) — the edge set is then a
    // forest of stars, every edge (member → component min)
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      // decimal sum: long-summed hashes overflow under ANSI mode
      val r = e.agg(count(lit(1)), sum(xxhash64(col("u"), col("v"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }

    var sig = signature(edges)
    var converged = sig._1 == 0L
    var rounds = 0
    while (!converged && rounds < maxIters) {
      // TWO star rounds per convergence check: each localCheckpoint and
      // each signature is a driver action, and on real inputs the round
      // count is small (4-6) — checking every 2nd round halves the
      // action count while an extra round past the fixed point is a
      // no-op (stars map to themselves)
      val next = smallStar(largeStar(smallStar(largeStar(edges))))
        .localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      edges = next
      sig = nextSig
      rounds += 2
    }
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"dupClusters converged in $rounds star rounds")
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(edges.select(col("v").as("doc_id"),
        col("v").as("cluster_id")))
      .groupBy(col("doc_id"))
      .agg(min(col("cluster_id")).as("cluster_id"))
  }

  /** Benchmark decontamination check: corpus docs sharing at least
    * `minShared` word n-gram shingles with any PROBE doc (the
    * benchmark/eval set). The probe side is small BY CONTRACT, so its
    * exploded gram set is broadcast — the corpus is scanned ONCE with a
    * broadcast hash join and never shuffled for candidate generation,
    * which is the shape that survives a 100 TB corpus (the alternative,
    * a symmetric inverted index, shuffles the corpus grams).
    * Self-matches (probe docs present in the corpus) are excluded.
    * Returns (doc_id, probe_id, n_shared). */
  def contaminationPairs(corpus: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeIdCol: String, probeTextCol: String,
      n: Int, minShared: Int): DataFrame = {
    val probeGrams = broadcast(
      docShingleRows(probes, probeIdCol, probeTextCol, n)
        .select(col("doc_id").as("probe_id"), col("g").as("gram")))
    docShingleRows(corpus, idCol, textCol, n)
      .withColumnRenamed("g", "gram")
      .join(probeGrams, "gram")
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Content-defined fingerprinting (winnowing-style sampling): the
    * fingerprint set of a doc is the char-n-gram hashes ≡ 0 (mod
    * `modulus`) — a deterministic ~1/modulus sample that survives local
    * edits. Fingerprints present in more than `maxDf` docs are dropped
    * (boilerplate suppression — without it a corpus-common fingerprint
    * creates a quadratic bucket, the same hot-key failure as common
    * n-grams). Pairs sharing ≥ `minShared` surviving fingerprints are
    * reported via the inverted-index join — never all-pairs. */
  def fingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, modulus: Int, minShared: Int, maxDf: Int): DataFrame = {
    // persisted: the ~1/modulus sample is small, and both the df-count
    // and the kept-join would otherwise re-run the full gram hash pass
    val fps = docs
      .select(col(idCol).as("doc_id"),
        explode(charNgrams(col(textCol), n)).as("gram"))
      .select(col("doc_id"), md5Long(col("gram")).as("fp"))
      .filter(col("fp") % modulus === 0)
      .distinct()
      .transform(InternalCache.persist(_))
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("fp")
    // feeds both sides of the pair join
    val kept = fps.join(rare, "fp")
      .transform(InternalCache.persist(_))
    val a = kept.select(col("fp"), col("doc_id").as("doc_a"))
    val b = kept.select(col("fp").as("fp_b"), col("doc_id").as("doc_b"))
    a.join(b, a("fp") === b("fp_b") && a("doc_a") < b("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
