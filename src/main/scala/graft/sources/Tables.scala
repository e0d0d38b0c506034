package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet fixtures
  * (`/root/testdata/sf*`; see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's dbt `sources:` block
  * (reference `models/schema.yml:4-9`): every relation is addressed by
  * name, resolved lazily, and carries an optional event-time column for
  * freshness checks (`models/schema.yml:13-14`).
  *
  * Scale posture: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so callers should express projection
  * and predicates declaratively and never pre-collect.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Event-time / freshness column per table, where one exists
    * (reference `models/schema.yml:9,13-14` — `loaded_at_field`). */
  val loadedAtField: Map[String, String] = Map(
    "orders" -> "o_orderdate",
    "lineitem" -> "l_shipdate",
    "events" -> "ts")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events fixture's `ts` to session-zoned TimestampType
    * regardless of how the parquet file encodes it — the fixture has
    * drifted across generator versions and the engine contract (SURVEY
    * §1.2) is TimestampType in UTC:
    *  - TIMESTAMP(NANOS): Spark's TimestampType (micros) can't represent
    *    it and the scan fails with PARQUET_TYPE_ILLEGAL by default. Read
    *    nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and
    *    truncate to micros with integer `div` (ns epochs exceed double's
    *    exact range), matching how micros engines (DuckDB) read the file.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
    *    TIMESTAMP_NTZ, which `withWatermark`/`unix_micros`/double casts
    *    all reject. Cast to TimestampType: the session TZ is pinned UTC,
    *    so wall-clock ≡ instant and DuckDB-oracle parity holds (DuckDB
    *    reads the same file as naive micros).
    *  - TIMESTAMP(MICROS, adjusted): already TimestampType; pass through. */
  private def loadNanosAware(spark: SparkSession, dir: String,
      name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, name), tsCol)
  }

  /** THE single coercion policy for timestamp-column fixture drift —
    * batch reads go through [[loadNanosAware]], streaming staging reads
    * (`graft.streaming.Streaming`) call this directly on their frames.
    * One place to extend when the generator ships a new encoding.
    *
    * The three encodings seen so far (INT64 nanos in r2, NTZ micros in
    * r6, adjusted micros) are handled; INT96 legacy timestamps need no
    * branch because Spark's vectorized reader surfaces them as
    * TimestampType directly (`spark.sql.parquet.int96RebaseModeInRead`
    * governs only pre-1582 rebasing, which the fixtures never hit).
    * Anything ELSE — a fourth drift — fails HERE with the column, the
    * observed type, and the handled set, instead of six analysis
    * errors downstream (the r6 failure mode). */
  private[graft] def normalizeTs(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"normalizeTs: column '$tsCol' has unhandled type $other — " +
            "the fixture encoding drifted again. Handled: INT64 nanos " +
            "(LongType via nanosAsLong), TIMESTAMP_NTZ micros, " +
            "TimestampType (adjusted micros / legacy INT96). Extend " +
            "Tables.normalizeTs with the new coercion.")
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    loadNanosAware(s, d, "events", "ts")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view so `spark.sql` queries
    * can address them by bare name — the analogue of dbt's `ref()`/
    * `source()` resolution (reference `example/my_second_dbt_model.sql:5`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
