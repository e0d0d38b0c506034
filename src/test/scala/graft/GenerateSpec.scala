package graft

import org.apache.spark.sql.functions._
import graft.datagen.Generate
import graft.stage.Staging

/** Generator-parity validation — the reference embeds a "Validate the
  * dataset" step in every dirty-data rule
  * (`data_gen/pseudo_code_rules.txt:10,19,29,38,47,56,65,74`); these
  * tests are those assertions over the Spark-native generator. */
class GenerateSpec extends SparkSpec {

  private lazy val orgsDf = Generate.orgs(spark, 50, 42).cache()
  private lazy val usersDf = Generate.users(spark, orgsDf, 2000, 42).cache()
  private lazy val productsDf = Generate.products(spark, 100, 42)
  private lazy val ordersDf =
    Generate.orders(spark, usersDf, productsDf, 10000, 42).cache()
  private lazy val eventsDf =
    Generate.events(spark, usersDf, 20000, 42).cache()

  test("determinism: same seed, same data") {
    val a = Generate.orgs(spark, 50, 42).collect().toSeq
    val b = Generate.orgs(spark, 50, 42).collect().toSeq
    assert(a == b)
  }

  test("referential integrity: every FK resolves") {
    assert(usersDf.join(orgsDf, Seq("org_id"), "left_anti").isEmpty)
    assert(ordersDf.join(usersDf.select("user_id"), Seq("user_id"),
      "left_anti").isEmpty)
  }

  test("missing values: ~2% null emails (rule :48-56)") {
    val rate = usersDf.filter(col("email").isNull).count().toDouble /
      usersDf.count()
    assert(rate > 0.005 && rate < 0.05, s"null-email rate $rate")
  }

  test("soft deletes: ~10% deleted users, filter drops them (P7)") {
    val rate = usersDf.filter(col("is_deleted")).count().toDouble /
      usersDf.count()
    assert(rate > 0.05 && rate < 0.15, s"deleted rate $rate")
    assert(Staging.dropSoftDeleted(usersDf).filter(col("is_deleted"))
      .isEmpty)
  }

  test("org skew: top 5% of users hold an outsized order share (rule :2-10)") {
    val n = ordersDf.count()
    val perUser = ordersDf.groupBy("user_id").count()
    val k = math.max(1, (usersDf.count() * 0.05).toInt)
    val topShare = perUser.orderBy(col("count").desc).limit(k)
      .agg(sum("count")).head.getLong(0).toDouble / n
    assert(topShare > 0.3, s"top-5% share $topShare")
  }

  test("dirty money: some negative prices and zero quantities (rules :66-74)") {
    val neg = ordersDf.filter(col("unit_price") < 0).count()
    val zero = ordersDf.filter(col("quantity") === 0).count()
    assert(neg > 0 && neg < 100, s"neg=$neg")
    assert(zero > 0 && zero < 200, s"zero=$zero")
  }

  test("mixed date formats round-trip through multiFormatDate (rule :57-65)") {
    import graft.functions.Functions
    val parsed = ordersDf.select(
      to_date(col("order_ts")).as("truth"),
      Functions.multiFormatDate(col("order_date_str")).as("parsed"))
    // MM/dd/yyyy vs dd-MM-yyyy is ambiguous when day <= 12 — the
    // documented repair limitation; all rows must at least parse
    assert(parsed.filter(col("parsed").isNull).isEmpty)
    val exact = parsed.filter(col("parsed") === col("truth")).count()
    assert(exact > parsed.count() * 0.7)
  }

  test("seasonality: Nov/Dec carry an elevated share (rule :21-29)") {
    // weights 1.45 for months 11-12 -> expected share 2*1.45/12.9 ~ 22.5%
    val share = eventsDf.filter(month(col("event_ts")) >= 11).count()
      .toDouble / eventsDf.count()
    assert(share > 0.19 && share < 0.26, s"Nov+Dec share $share")
  }

  test("late arrivals: 10-20% later than 1 day (rule :11-19)") {
    val late = eventsDf.filter(
      unix_timestamp(col("received_ts")) - unix_timestamp(col("event_ts"))
        >= 86400).count().toDouble / eventsDf.count()
    assert(late > 0.10 && late < 0.20, s"late rate $late")
  }

  test("malformed JSON ~1.5%, drift and PII keys present (rules :30-38)") {
    val bad = Staging.malformedJson(eventsDf, "properties").count()
      .toDouble / eventsDf.count()
    assert(bad > 0.005 && bad < 0.03, s"malformed rate $bad")
    val drift = eventsDf.filter(
      get_json_object(col("properties"), "$.new_key").isNotNull).count()
    val pii = eventsDf.filter(
      get_json_object(col("properties"), "$.leaked_email").isNotNull)
      .count()
    assert(drift > 0 && pii > 0)
    // the second JSON column always parses and carries ip + browser
    assert(eventsDf.filter(
      get_json_object(col("context"), "$.ip").isNull ||
        !get_json_object(col("context"), "$.browser")
          .isin("chrome", "firefox", "safari")).isEmpty)
  }

  test("withDuplicates injects and dedupLatest removes them (rule :39-47)") {
    val dup = Generate.withDuplicates(ordersDf, 0.07, 7)
    assert(dup.count() > ordersDf.count())
    val deduped = Staging.dedupLatest(dup, Seq("order_id"),
      col("order_ts"), Seq(col("order_idx")))
    assert(deduped.count() == ordersDf.count())
  }
}
