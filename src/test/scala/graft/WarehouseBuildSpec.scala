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
}
