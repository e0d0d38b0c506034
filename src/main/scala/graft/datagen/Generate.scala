package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Functions._

/** Seeded synthetic-data generator with the reference's entity graph
  * and dirty-data contract (reference
  * `data_gen/generate_and_load_script.py` — orgs → users → products →
  * orders → payments-shaped money math → events;
  * `data_gen/pseudo_code_rules.txt` — skew, late arrivals, malformed
  * JSON, duplicates, missing values, mixed formats, negative prices).
  *
  * Fully distributed and deterministic: every table is `spark.range`
  * plus seeded `rand()` column expressions — no driver-side loops, no
  * collect, so generation scales with the cluster exactly like any
  * other query (the reference's pandas generator is single-process;
  * this is the Spark-native re-expression, SURVEY F10).
  */
object Generate {

  /** Deterministic UUID-shaped id: md5 of (entity, ordinal), formatted
    * 8-4-4-4-12 — uuid4 parity (`generate_and_load_script.py:69` etc.)
    * without nondeterminism. */
  def uuidLike(entity: String, ordinal: Column): Column = {
    val h = md5(concat_ws(":", lit(entity), ordinal))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  private def pick(c: Column, values: Seq[String]): Column =
    element_at(array(values.map(lit): _*),
      (floor(c * values.size) + 1).cast("int"))

  private val Money18 = DecimalType(18, 2)

  /** Organizations (`generate_and_load_script.py:66-77`): plan enum,
    * ~30% enterprise, full country NAMES (inconsistent with users —
    * the seed-normalization test case). */
  def orgs(spark: SparkSession, n: Long, seed: Long): DataFrame =
    spark.range(n).select(
      col("id").as("org_idx"),
      uuidLike("org", col("id")).as("org_id"),
      concat(lit("Org "), col("id")).as("org_name"),
      pick(rand(seed + 1), Seq("basic", "pro", "enterprise")).as("plan_id"),
      (rand(seed + 2) < 0.3).as("is_enterprise"),
      timestamp_seconds(lit(1672531200L) +
        floor(rand(seed + 3) * 86400 * 365)).as("created_at"),
      pick(rand(seed + 4), Seq("Germany", "France", "United States",
        "Japan", "Brazil")).as("billing_country"))

  /** Users (`:79-91`): FK to orgs, 2% null email, 10% soft-deleted,
    * ISO country CODES. */
  def users(spark: SparkSession, orgsDf: DataFrame, n: Long,
      seed: Long, nOrgs: Long = -1): DataFrame = {
    // pass the known parent cardinality where available: counting a
    // fact-sized upstream just to derive an index range is a full scan
    val nOrgsC = lit(if (nOrgs > 0) nOrgs else orgsDf.count())
    val base = spark.range(n).select(
      col("id").as("user_idx"),
      uuidLike("user", col("id")).as("user_id"),
      floor(rand(seed + 10) * nOrgsC).as("org_idx"),
      when(rand(seed + 11) < 0.02, lit(null).cast("string"))
        .otherwise(concat(lit("user"), col("id"), lit("@example.com")))
        .as("email"),
      (rand(seed + 12) < 0.10).as("is_deleted"),
      pick(rand(seed + 13), Seq("DE", "FR", "US", "JP", "BR"))
        .as("country_code"))
    base.join(orgsDf.select(col("org_idx"), col("org_id")), "org_idx")
      .drop("org_idx")
  }

  /** Products (`:93-104`): SKU template, category enum, ~70% active. */
  def products(spark: SparkSession, n: Long, seed: Long): DataFrame =
    spark.range(n).select(
      col("id").as("product_idx"),
      uuidLike("product", col("id")).as("product_id"),
      format_string("SKU-%04d", col("id")).as("sku"),
      pick(rand(seed + 20), Seq("apparel", "electronics", "books", "food"))
        .as("category"),
      (rand(seed + 21) < 0.7).as("is_active"))

  /** Orders (`:106-127`) with the dirty-data contract: org-skew via a
    * power-law index (top orgs absorb most volume,
    * `pseudo_code_rules.txt:2-10`), exponential-ish quantity with 0.5%
    * zeros, uniform 5-500 money HALF_UP 2dp with 0.2% negatives, and a
    * string date column in deliberately mixed formats (`:57-65`). */
  def orders(spark: SparkSession, usersDf: DataFrame,
      productsDf: DataFrame, n: Long, seed: Long,
      nUsers: Long = -1, nProducts: Long = -1): DataFrame = {
    val nUsersC = lit(if (nUsers > 0) nUsers else usersDf.count())
    val nProductsC = lit(if (nProducts > 0) nProducts else productsDf.count())
    // pow(rand, 4): ~55% of draws land in the top 5% of the index range
    val base = spark.range(n).select(
      col("id").as("order_idx"),
      uuidLike("order", col("id")).as("order_id"),
      floor(pow(rand(seed + 30), 4) * nUsersC).as("user_idx"),
      floor(rand(seed + 31) * nProductsC).as("product_idx"),
      when(rand(seed + 32) < 0.005, 0)
        .otherwise((floor(-log(lit(1) - rand(seed + 33)) * 2) + 1)
          .cast("int")).as("quantity"),
      (when(rand(seed + 34) < 0.002, -1).otherwise(1) *
        round(rand(seed + 35) * 495 + 5, 2)).cast(Money18)
        .as("unit_price"),
      pick(rand(seed + 36), Seq("USD", "GBP", "EUR")).as("currency"),
      pick(rand(seed + 37), Seq("placed", "paid", "refunded",
        "partial_refund", "cancelled")).as("status"),
      timestamp_seconds(lit(1704067200L) +
        floor(rand(seed + 38) * 86400 * 30)).as("order_ts"),
      rand(seed + 39).as("__fmt"))
    val withRefs = base
      .join(usersDf.select(col("user_idx"), col("user_id"), col("org_id")),
        "user_idx")
      .join(productsDf.select(col("product_idx"), col("product_id")),
        "product_idx")
      .drop("user_idx", "product_idx")
    // mixed-format string date derived from order_ts (rule :57-65)
    withRefs.withColumn("order_date_str",
      when(col("__fmt") < 0.4, date_format(col("order_ts"), "yyyy-MM-dd"))
        .when(col("__fmt") < 0.7, date_format(col("order_ts"), "MM/dd/yyyy"))
        .otherwise(date_format(col("order_ts"), "dd-MM-yyyy")))
      .drop("__fmt")
  }

  /** Events (`:151-169`): event-time vs received-time with a heavy-ish
    * late tail (`pseudo_code_rules.txt:11-19`), JSON properties with 5%
    * schema drift and 2% leaked-email PII (`:156-158`), 1.5% malformed
    * JSON (`:30-38`). */
  def events(spark: SparkSession, usersDf: DataFrame, n: Long,
      seed: Long, nUsers: Long = -1): DataFrame = {
    val nUsersC = lit(if (nUsers > 0) nUsers else usersDf.count())
    // seasonality (`pseudo_code_rules.txt:21-29`): Nov/Dec carry ~45%
    // more traffic. Month picked by weighted inverse-CDF over a
    // MATERIALIZED uniform draw: `rand()` instances advance their
    // per-row sequence only when evaluated, so referencing the same
    // rand expression from several conditional branches desynchronizes
    // them — the draw must land as an attribute first.
    val monthWeights = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
      1.0, 1.0, 1.0, 1.0, 1.45, 1.45)
    val totalW = monthWeights.sum
    val monthStarts2024 = Seq( // UTC epoch seconds of each month start
      1704067200L, 1706745600L, 1709251200L, 1711929600L, 1714521600L,
      1717200000L, 1719792000L, 1722470400L, 1725148800L, 1727740800L,
      1730419200L, 1733011200L)
    val monthLens = monthStarts2024.sliding(2)
      .map(p => p(1) - p(0)).toSeq :+ (1735689600L - 1733011200L)
    val cum = monthWeights.scanLeft(0.0)(_ + _).tail.map(_ / totalW)
    val drawn = spark.range(n).select(
      col("id"),
      rand(seed + 60).as("__u"),
      rand(seed + 52).as("__frac"),
      rand(seed + 50).as("__ru"),
      rand(seed + 51).as("__rt"),
      rand(seed + 53).as("__rlate"),
      rand(seed + 54).as("__rdelay1"),
      rand(seed + 55).as("__rdelay2"),
      rand(seed + 56).as("__drift"),
      rand(seed + 57).as("__pii"),
      rand(seed + 58).as("__bad"))
    val seasonalTs = (0 until 12).reverse.foldLeft(
      lit(monthStarts2024.last) +
        floor(col("__frac") * monthLens.last)) { (acc, m) =>
      if (m == 11) acc
      else when(col("__u") < cum(m), lit(monthStarts2024(m)) +
        floor(col("__frac") * monthLens(m))).otherwise(acc)
    }
    val base = drawn.select(
      col("id").as("event_idx"),
      uuidLike("event", col("id")).as("event_id"),
      floor(col("__ru") * nUsersC).as("user_idx"),
      pick(col("__rt"), Seq("page_view", "add_to_cart",
        "checkout_started", "app_action_click")).as("event_type"),
      timestamp_seconds(seasonalTs).as("event_ts"),
      // ~15% of events arrive 1-7 days late, rest within 10 s
      when(col("__rlate") < 0.15,
        floor(col("__rdelay1") * 86400 * 6) + 86400)
        .otherwise(floor(col("__rdelay2") * 10)).as("__delay"),
      col("__drift"), col("__pii"), col("__bad"))
    val withJson = base
      .withColumn("received_ts",
        timestamp_seconds(unix_timestamp(col("event_ts")) + col("__delay")))
      // second JSON column, `context` = {ip, browser}
      // (`generate_and_load_script.py:166`)
      .withColumn("context", to_json(struct(
        concat(lit("10."), pmod(col("event_idx"), lit(256)), lit("."),
          pmod(col("event_idx") * 7, lit(256)), lit("."),
          pmod(col("event_idx") * 13, lit(256))).as("ip"),
        element_at(array(lit("chrome"), lit("firefox"), lit("safari")),
          (pmod(col("event_idx"), lit(3)) + 1).cast("int")).as("browser"))))
      .withColumn("properties",
        when(col("__bad") < 0.015, lit("{not json"))
          .otherwise(to_json(struct(
            concat(lit("/page/"), col("event_idx")).as("page"),
            round(rand(seed + 59) * 100, 2).as("cart_value"),
            when(col("__drift") < 0.05, lit("drift")).as("new_key"),
            when(col("__pii") < 0.02,
              concat(lit("leak"), col("event_idx"), lit("@example.com")))
              .as("leaked_email")))))
    withJson
      .join(usersDf.select(col("user_idx"), col("user_id"), col("org_id")),
        "user_idx")
      .drop("user_idx", "__delay", "__drift", "__pii", "__bad")
  }

  /** Payments (`generate_and_load_script.py:129-149`): orders sampled
    * WITH REPLACEMENT (`:131` — several charges may hit one order, the
    * J3 correlated-sampling shape), amount derived from the joined
    * order row (`amount = unit_price * max(quantity, 1)`, fee 3%, tax
    * 20%, refund factor ∈ {0, 0, 0.1, 0.25} — F9 money math, exact
    * decimal), plus the embedded JSON `raw_payload` (`:147`). */
  def payments(ordersDf: DataFrame, fraction: Double,
      seed: Long): DataFrame = {
    val sampled = ordersDf
      .sample(withReplacement = true, fraction, seed)
      .select(col("order_id"), col("org_id"), col("currency"),
        col("order_ts"), col("quantity"), col("unit_price"))
    val amount = (col("unit_price") *
      greatest(col("quantity"), lit(1))).cast(Money18)
    sampled
      .withColumn("__ord",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("order_id")).orderBy(col("order_ts"))))
      .select(
        uuidLike("charge", concat_ws("#", col("order_id"), col("__ord")))
          .as("charge_id"),
        col("order_id"), col("org_id"),
        amount.as("amount"),
        col("currency"),
        timestamp_seconds(unix_timestamp(col("order_ts")) +
          floor(rand(seed + 70) * 86400)).as("paid_ts"),
        pick(rand(seed + 71), Seq("paid", "failed", "refunded"))
          .as("status"),
        (amount * lit(0.03).cast(DecimalType(4, 2))).cast(Money18)
          .as("fee_amount"),
        (amount * lit(0.20).cast(DecimalType(4, 2))).cast(Money18)
          .as("tax_amount"),
        (amount * element_at(
          array(Seq(0.0, 0.0, 0.1, 0.25).map(f =>
            lit(f).cast(DecimalType(4, 2))): _*),
          (floor(rand(seed + 72) * 4) + 1).cast("int"))).cast(Money18)
          .as("refund_amount"),
        to_json(struct(lit("Stripe").as("gateway"),
          uuidLike("auth", col("order_id")).as("auth_id")))
          .as("raw_payload"))
  }

  /** Exact-duplicate injection (`pseudo_code_rules.txt:39-47`: 5-10%
    * duplicated rows): a seeded sample unioned back in. */
  def withDuplicates(df: DataFrame, fraction: Double,
      seed: Long): DataFrame =
    df.unionAll(df.sample(withReplacement = false, fraction, seed))
}
