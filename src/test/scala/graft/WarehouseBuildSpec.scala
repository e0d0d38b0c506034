package graft

import graft.sources.WarehouseBuild

/** The composed dbt-build lifecycle (q243): beyond the oracle's
  * value-for-value check, the report must be INTERNALLY consistent —
  * the observe counters partition their input, the dim invariants
  * hold, and both marts clear the WAP gate. */
class WarehouseBuildSpec extends SparkSpec {

  test("the composed build's report is internally consistent and " +
      "fully published") {
    val rep = rows(WarehouseBuild.run(spark, "/root/testdata/sf0.001"))
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    // observe counters partition rows_in exactly (same single scan)
    assert(rep(("staging", "stg_orders", "rows_in")) ==
      rep(("staging", "stg_orders", "rows_kept")) +
      rep(("staging", "stg_orders", "dropped_invalid")))
    assert(rep(("staging", "stg_customer", "rows_in")) ==
      rep(("staging", "stg_customer", "rows_kept")) +
      rep(("staging", "stg_customer", "soft_deleted")))
    // the soft-delete rule fires on the fixture (counter is live)
    assert(rep(("staging", "stg_customer", "soft_deleted")) > 0)
    // SCD2 invariants hold on the MATERIALIZED dim
    assert(rep(("dim", "dim_user_scd2", "overlap_violations")) == 0)
    assert(rep(("dim", "dim_user_scd2", "current_violations")) == 0)
    assert(rep(("dim", "dim_user_scd2", "versions")) >=
      rep(("dim", "dim_user_scd2", "current_rows")))
    // both marts cleared the WAP audit and published
    assert(rep(("mart", "mart_monthly_revenue", "published")) == 1)
    assert(rep(("mart", "mart_segment_revenue", "published")) == 1)
    assert(rep(("mart", "mart_monthly_revenue", "audit_violations")) == 0)
    // segment mart drops soft-deleted customers' orders, so its total
    // can never exceed the monthly mart's
    assert(rep(("mart", "mart_segment_revenue", "revenue_cents")) <=
      rep(("mart", "mart_monthly_revenue", "revenue_cents")))
  }

  test("the incremental run converges to the full rebuild, handles " +
      "resubmissions/invalid/late-event deltas, and replays as a no-op") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, dir)
    val events = graft.sources.Tables.events(spark, dir)
    val customer = graft.sources.Tables.customer(spark, dir)
    // deterministic split: ~1/7 of orders and ~1/5 of events arrive late
    val oBase = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 3)
    val oDeltaNat = orders.filter(pmod(col("o_orderkey"), lit(7)) === 3)
    val eBase = events.filter(pmod(col("event_id"), lit(5)) =!= 2)
    val eDelta = events.filter(pmod(col("event_id"), lit(5)) === 2)

    val hI = "whinc"
    WarehouseBuild.runOn(spark, oBase, customer, eBase, hI)
    // crafted delta rows: a RESUBMISSION of a staged base order (must
    // be dropped — the stored copy wins) and an INVALID order (gated)
    val resub = oBase.filter(validBase(oBase)).limit(1)
    val invalid = resub
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("o_totalprice",
        lit(-1).cast(orders.schema("o_totalprice").dataType))
    val oDelta = oDeltaNat.unionByName(resub).unionByName(invalid)

    val rep = rows(WarehouseBuild.runIncremental(spark, hI, oDelta,
      eDelta))
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    assert(rep(("staging", "stg_orders_delta", "resubmitted_dropped"))
      == 1, rep.toString)
    assert(rep(("staging", "stg_orders_delta", "dropped_invalid")) >= 1)
    assert(rep(("dim", "dim_user_scd2", "affected_users")) > 0)
    assert(rep(("dim", "dim_user_scd2", "versions_added")) > 0)
    assert(rep(("dim", "dim_user_scd2", "overlap_violations")) == 0)
    assert(rep(("dim", "dim_user_scd2", "current_violations")) == 0)
    assert(rep(("mart", "mart_monthly_revenue", "published")) == 1)

    // full rebuild over base ∪ delta must produce identical state
    val hF = "whfull"
    WarehouseBuild.runOn(spark, oBase.unionByName(oDeltaNat), customer,
      events, hF)
    def snap(h: String, t: String): Set[Seq[Any]] =
      spark.table(s"e2e_${t}_$h").collect().map(_.toSeq).toSet
    for (t <- Seq("stg_orders", "dim_user_scd2", "seg_month",
        "mart_monthly", "mart_segment"))
      assert(snap(hI, t) == snap(hF, t), s"$t diverged from full rebuild")

    // replay: the identical delta changes nothing
    val rep2 = rows(WarehouseBuild.runIncremental(spark, hI, oDelta,
      eDelta))
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    assert(rep2(("staging", "stg_orders", "rows_appended")) == 0)
    assert(rep2(("dim", "dim_user_scd2", "versions_added")) == 0)
    for (t <- Seq("stg_orders", "dim_user_scd2", "seg_month",
        "mart_monthly", "mart_segment"))
      assert(snap(hI, t) == snap(hF, t), s"$t drifted under replay")
  }

  test("adaptive dim maintenance: the bucket-scoped merge and the " +
      "one-pass rebuild land the identical dim state and report") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, dir)
    val events = graft.sources.Tables.events(spark, dir)
    val customer = graft.sources.Tables.customer(spark, dir)
    val oBase = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 3)
    val oDelta = orders.filter(pmod(col("o_orderkey"), lit(7)) === 3)
    val eBase = events.filter(pmod(col("event_id"), lit(5)) =!= 2)
    val eDelta = events.filter(pmod(col("event_id"), lit(5)) === 2)
    def repOf(df: org.apache.spark.sql.DataFrame) =
      rows(df).map(r => ((r.getString(0), r.getString(1),
        r.getString(2)), r.getLong(3))).toMap
    // same base, same scattered delta — one run forced through the
    // merge (threshold no scatter can reach), one forced through the
    // rebuild (threshold zero)
    WarehouseBuild.runOn(spark, oBase, customer, eBase, "whadm")
    WarehouseBuild.runOn(spark, oBase, customer, eBase, "whadr")
    val repM = repOf(WarehouseBuild.runIncremental(spark, "whadm",
      oDelta, eDelta, dimRebuildFraction = 1.1))
    val repR = repOf(WarehouseBuild.runIncremental(spark, "whadr",
      oDelta, eDelta, dimRebuildFraction = 0.0))
    assert(repM == repR, s"reports diverged:\n$repM\nvs\n$repR")
    def dimSnap(h: String): Set[Seq[Any]] =
      spark.table(s"e2e_dim_user_scd2_$h").collect().map(_.toSeq).toSet
    assert(dimSnap("whadm") == dimSnap("whadr"),
      "merge and rebuild paths produced different dim states")
    assert(repM(("dim", "dim_user_scd2", "versions_added")) > 0)
  }

  private def validBase(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    col("o_totalprice") > 0 && col("o_custkey").isNotNull
  }
}
