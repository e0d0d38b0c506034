package graft

import org.apache.spark.sql.functions._
import graft.datagen.Generate
import graft.sources.Materialize

/** Materialization semantics (S6/S7) + payments generation (J3/F9). */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("view stays lazy, table persists and re-reads from catalog") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Materialize.view(df, "mz_view")
    assert(spark.sql("SELECT COUNT(*) FROM mz_view").head.getLong(0) == 2)
    val t = Materialize.table(df, "mz_table")
    assert(t.count() == 2)
    assert(spark.catalog.tableExists("mz_table"))
    spark.sql("DROP TABLE mz_table")
  }

  test("tableIncremental appends then dedups keep-latest") {
    spark.sql("DROP TABLE IF EXISTS mz_inc")
    val day1 = Seq(("k1", "2024-01-01 00:00:00", "v1"))
      .toDF("k", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val day2 = Seq(
      ("k1", "2024-01-02 00:00:00", "v2"), // update for k1
      ("k2", "2024-01-02 00:00:00", "w1"))
      .toDF("k", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    Materialize.tableIncremental(spark, "mz_inc", day1, Seq("k"), "ts")
    val after = Materialize.tableIncremental(spark, "mz_inc", day2,
      Seq("k"), "ts")
    val got = rows(after.orderBy("k"))
      .map(r => (r.getString(0), r.getString(2)))
    assert(got == Seq(("k1", "v2"), ("k2", "w1")))
    spark.sql("DROP TABLE mz_inc")
  }

  test("payments: sampled with replacement, derived money math exact") {
    val orgs = Generate.orgs(spark, 10, 42)
    val users = Generate.users(spark, orgs, 100, 42)
    val products = Generate.products(spark, 20, 42)
    val orders = Generate.orders(spark, users, products, 1000, 42)
    val pays = Generate.payments(orders, 1.5, 42).cache()
    // with-replacement at fraction>1 must produce multi-charge orders
    assert(pays.groupBy("order_id").count().filter($"count" > 1)
      .count() > 0)
    // charge ids remain unique even for repeated orders
    assert(pays.groupBy("charge_id").count().filter($"count" > 1).isEmpty)
    // fee = 3% of amount exactly, in decimal
    val badFee = pays.filter(
      $"fee_amount" =!= ($"amount" * lit(BigDecimal("0.03")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
    assert(badFee.isEmpty)
    // raw_payload parses and carries the gateway key
    assert(pays.filter(
      get_json_object($"raw_payload", "$.gateway") =!= "Stripe").isEmpty)
  }
}
