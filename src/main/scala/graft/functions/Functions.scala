package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level building blocks shared by operators and queries.
  *
  * All helpers return `Column` expressions built from
  * `org.apache.spark.sql.functions` so they stay inside whole-stage
  * codegen — no Scala UDFs in the hot path.
  */
object Functions {

  /** Exact money type. The reference quantizes money to 2 dp with
    * ROUND_HALF_UP (reference `data_gen/generate_and_load_script.py:55-56`)
    * and defers casts to the warehouse (`:18`); we cast at the edge so
    * every downstream sum is exact decimal arithmetic — deterministic
    * regardless of partitioning / aggregation order, which double sums
    * are not. */
  val Money: DecimalType = DecimalType(18, 2)

  /** Cast a double money column to exact decimal(18,2). */
  def money(c: Column): Column = c.cast(Money)

  /** Exact decimal sum of a double column, surfaced back as double so
    * output schemas stay stable for the oracle compare. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Deterministic mean: exact decimal sum / count, rounded. */
  def avgMoney(c: Column, dp: Int = 6): Column =
    round(sum(money(c)).cast("double") / count(c), dp)

  /** Parse a date that may arrive in any of the reference's inconsistent
    * formats (reference `data_gen/pseudo_code_rules.txt:57-65`:
    * MM/DD/YYYY vs DD-MM-YYYY vs ISO). `try_to_date`, not `to_date` —
    * under Spark 4's default ANSI mode a non-matching format THROWS,
    * and surviving dirty input is this function's whole purpose. */
  def multiFormatDate(c: Column): Column = coalesce(
    call_function("try_to_date", c, lit("yyyy-MM-dd")),
    call_function("try_to_date", c, lit("MM/dd/yyyy")),
    call_function("try_to_date", c, lit("dd-MM-yyyy")))

  /** Parse a numeric string that may use comma decimal separators
    * (reference `data_gen/pseudo_code_rules.txt:57-65`); null (not an
    * ANSI error) on garbage. */
  def multiFormatNumber(c: Column): Column =
    regexp_replace(c, ",", ".").try_cast("double")

  /** Generic email / PII detector (reference injects `leaked_email` into
    * event properties at 2%: `data_gen/generate_and_load_script.py:158`;
    * PII check declared `README.md:59`). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  def containsPii(c: Column): Column = c.rlike(EmailPattern)

  // ---------------------------------------------------------------- text

  /** Whitespace tokenizer over lowercased text. */
  def tokens(c: Column): Column =
    split(trim(lower(c)), "\\s+")

  /** Whitespace-normalized lowercase text (exact-dedup canonical form). */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** BPE-ish token pattern: a run of alphanumerics, or one non-space
    * symbol — a cheap, engine-portable proxy for subword tokenizers
    * (plain RE2-safe regex: no lookarounds, identical in DuckDB). */
  val BpeishPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** BPE-ish token count via `regexp_extract_all` (codegen'd). */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeishPattern), lit(0)))

  /** Count of ASCII punctuation characters (integer — safe to sum
    * exactly across docs; derive ratios with one final division). */
  def punctChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))

  /** Punctuation character ratio, a quality-score feature. */
  def punctRatio(c: Column): Column =
    punctChars(c).cast("double") / greatest(length(c), lit(1)).cast("double")

  /** Number of tokens (from `tokens`) contained in `set` — stopword-hit
    * counter for language ID / quality scoring. */
  def tokenHits(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(lit): _*)))

  /** Distinct word n-gram shingles of lowercased text: the unit of
    * minhash / Jaccard near-dedup. Empty when the doc has < n words
    * (guarded — Spark's `sequence(a, b)` runs DESCENDING when a > b,
    * it does not return empty). */
  def wordShingles(c: Column, n: Int): Column = {
    val w = tokens(c)
    when(size(w) >= n,
      array_distinct(
        transform(sequence(lit(0), size(w) - n),
          i => array_join(slice(w, i + 1, lit(n)), " "))))
      .otherwise(array())
  }

  /** Distinct character n-grams of the raw text. */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      array_distinct(
        transform(sequence(lit(1), length(c) - (n - 1)),
          i => c.substr(i, lit(n)))))
      .otherwise(array())

  // ------------------------------------------------------------- vectors

  /** Dot product of two array<double> columns via the `zip_with` /
    * `aggregate` higher-order functions — sequential fold, so the result
    * is bit-deterministic (same value on every engine that folds
    * left-to-right in double precision). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cast array<float> (the fixtures' embedding type) to array<double>
    * so all arithmetic is double-precision end to end. */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  // ------------------------------------------------------------- hashing

  /** Portable 60-bit hash: the first 15 hex chars of md5, as a positive
    * long. MD5 is bit-identical across engines (Spark, DuckDB, any SQL
    * dialect), which makes hash-based operators (dedup, minhash, simhash)
    * oracle-checkable. 15 hex chars = 60 bits < Long.MaxValue, so the
    * base-16 → base-10 conversion never overflows. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant for minhash families: hash of seed-prefixed value. */
  def md5LongSeeded(c: Column, seed: Int): Column =
    md5Long(concat_ws(":", lit(seed.toString), c))

  /** Rendezvous (highest-random-weight) shard assignment: the shard in
    * `[0, n)` whose portable md5 weight of `(id, shard)` is largest.
    * Row-local — an n-entry hash array folded with `array_max`, no
    * shuffle, no coordinator state — and partitioning/retry-invariant
    * like every md5-derived draw here. The HRW property: growing to
    * n+1 shards moves ONLY the keys whose new shard's weight wins
    * (≈ 1/(n+1) of them), each moving TO the new shard. */
  def rendezvousShard(id: Column, n: Int): Column =
    array_max(transform(sequence(lit(0), lit(n - 1)),
      s => struct(
        md5Long(concat(id.cast("string"), lit(":"), s.cast("string")))
          .as("h"),
        s.as("sid"))))
      .getField("sid").cast("long")
}
