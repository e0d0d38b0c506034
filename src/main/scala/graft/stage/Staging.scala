package graft.stage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StringType}

import graft.functions.Functions

/** Staging-layer transforms: the reference's raw → staging contract
  * (reference `README.md:36` "staging, rejects"; dirty-data rulebook
  * `data_gen/pseudo_code_rules.txt`).
  *
  * Every function is `DataFrame => DataFrame` (or a clean/reject pair) so
  * layers compose like dbt models (reference `dbt_project.yml:25-43`),
  * with Catalyst free to optimize across the whole composed plan.
  */
object Staging {

  /** Clean/reject split (SURVEY U2): one predicate, two complementary
    * outputs. Both reuse the same parent plan; Spark computes the scan
    * once per action — at scale, persist the parent if both sides are
    * consumed in the same job. */
  def splitValid(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.filter(valid), df.filter(!coalesce(valid, lit(false))))

  /** Keep-latest dedup (SURVEY W1; reference injects 5-10% duplicate rows,
    * `data_gen/pseudo_code_rules.txt:39-47`). One shuffle on the key;
    * `row_number` needs a total order, so `tieBreakers` must make the
    * ordering deterministic.
    *
    * Scale note: this is the standard top-1-per-key pattern; Spark runs it
    * as a single window over key-partitioned, sorted data. For heavily
    * skewed keys, pre-aggregate with `max_by` semantics instead. */
  def dedupLatest(df: DataFrame, keys: Seq[String], orderCol: Column,
      tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol.desc +: tieBreakers.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-latest dedup via aggregation (same result contract as
    * [[dedupLatest]]): `max_by` over a (orderCol, tieBreakers...) struct
    * is PARTIAL-AGGREGATABLE — each map task keeps one candidate row
    * per key before the shuffle, so a hot key ships one row per input
    * partition instead of funneling every duplicate through one
    * reducer's sort. Prefer this form at scale whenever downstream does
    * not need the window (the reference's 5-10% dup-rate rule over a
    * skewed org distribution is exactly this shape). Ordering columns
    * must be non-null and, with tieBreakers, unique per key for a
    * deterministic winner. */
  def dedupLatestAgg(df: DataFrame, keys: Seq[String], orderCol: Column,
      tieBreakers: Seq[Column] = Nil): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ordering = struct((orderCol +: tieBreakers): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ordering).as("__row"))
      .select(col("__row.*"))
  }

  /** Soft-delete filter (SURVEY P7; reference `is_deleted` 10% true,
    * `generate_and_load_script.py:88`). */
  def dropSoftDeleted(df: DataFrame, flag: String = "is_deleted"): DataFrame =
    df.filter(!coalesce(col(flag), lit(false)))

  /** Negative/zero money sanitization (SURVEY P6; reference injects 0.2%
    * negative price / 0.5% zero qty, `generate_and_load_script.py:112-113`;
    * declared test `README.md:55`). */
  def sanitizeMoney(df: DataFrame, price: String, qty: String)
      : (DataFrame, DataFrame) =
    splitValid(df, col(price) >= 0 && col(qty) > 0)

  /** Tolerant JSON parse with reject routing (SURVEY F6-F7; reference
    * injects 1-2% malformed JSON, `pseudo_code_rules.txt:30-38`, and 5%
    * schema drift, `generate_and_load_script.py:157`).
    *
    * Parses into `MapType(String,String)` so unknown/drifting keys are
    * retained instead of dropped; `from_json` yields null on malformed
    * input, which (with the raw column kept alongside) distinguishes
    * "malformed" from "absent". */
  def parseJsonTolerant(df: DataFrame, jsonCol: String,
      parsedCol: String = "parsed"): DataFrame =
    df.withColumn(parsedCol,
      from_json(col(jsonCol), MapType(StringType, StringType)))

  /** Rows whose JSON failed to parse (malformed, not merely null). */
  def malformedJson(df: DataFrame, jsonCol: String): DataFrame =
    parseJsonTolerant(df, jsonCol, "__p")
      .filter(col("__p").isNull && col(jsonCol).isNotNull)
      .drop("__p")

  /** Typed cast with reject routing: rows where any requested cast of a
    * non-null input produced null are routed to rejects (BigQuery
    * autodetect parity — reference defers casts to staging,
    * `generate_and_load_script.py:18`). `try_cast`, not `cast`: under
    * Spark 4's default ANSI mode a malformed value would otherwise
    * throw instead of routing to rejects. */
  def castStrict(df: DataFrame, casts: Map[String, DataType])
      : (DataFrame, DataFrame) = {
    val casted = casts.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c + "__cast", col(c).try_cast(t.sql))
    }
    val bad = casts.keys.map(c =>
      col(c).isNotNull && col(c + "__cast").isNull).reduce(_ || _)
    val clean = casted.filter(!bad)
      .select(df.columns.toSeq.map(c =>
        if (casts.contains(c)) col(c + "__cast").as(c) else col(c)): _*)
    val rejects = casted.filter(bad).select(df.columns.toSeq.map(col): _*)
    (clean, rejects)
  }

  /** Country normalization via a broadcast seed (SURVEY F12; the
    * reference stores full names on orgs but ISO codes on users,
    * `generate_and_load_script.py:74,87`, normalized through the
    * `iso_countries` seed, `README.md:22`). `seed` must carry
    * (country_name, iso_code).
    *
    * The seed is unpivoted to one lookup row per accepted spelling
    * (name→iso and code→iso), so the probe is a single equi-key and
    * Spark plans a codegen'd BroadcastHashJoin. Joining on
    * `k === name || k === code` instead would not be an equi-join and
    * falls back to BroadcastNestedLoopJoin — O(rows × seed) with the
    * key expression re-evaluated per comparison. */
  def normalizeCountry(df: DataFrame, countryCol: String, seed: DataFrame)
      : DataFrame = {
    val iso = upper(trim(col("iso_code")))
    val lookup = broadcast(seed
      .select(explode(array(
        struct(upper(trim(col("country_name"))).as("k"), iso.as("v")),
        struct(iso.as("k"), iso.as("v")))).as("__e"))
      .select(col("__e.k").as("__k"), col("__e.v").as("__ci"))
      .groupBy(col("__k")).agg(min(col("__ci")).as("__ci")))
    val k = upper(trim(col(countryCol)))
    df.join(lookup, k === col("__k"), "left")
      .withColumn(countryCol + "_iso", coalesce(col("__ci"),
        when(length(k) === 2, k)))
      .drop("__k", "__ci")
  }

  /** Multi-format date/number repair (SURVEY F4; reference rule
    * `pseudo_code_rules.txt:57-65`). */
  def repairDates(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, Functions.multiFormatDate(col(c)))
  def repairNumbers(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, Functions.multiFormatNumber(col(c)))
}
