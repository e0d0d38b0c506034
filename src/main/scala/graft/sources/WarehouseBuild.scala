package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions.money
import graft.operators.Scd2
import graft.quality.{NotNull, Quality, Unique}

/** The composed `dbt build` lifecycle as ONE product (reference
  * `.github/workflows/dbt-ci.yml:36-42` runs `dbt build` = run + test
  * in dependency order): ingest → staging → SCD2 dim → marts →
  * quality audit → publish, chained as a single pipeline that returns
  * ONE audit report frame — not 242 separate entries.
  *
  * Instrumentation design: staging-layer metrics ride the
  * materialization actions via `Dataset.observe` ([[Quality.observed]])
  * — rows-in, rows-kept, and violation counters cost ZERO extra scans;
  * the one pass that writes each staged table also counts it. Mart
  * publication goes through [[Materialize.publishAudited]] (the WAP
  * gate), so a failing quality suite leaves the previous version
  * untouched and the report's `published` metric reads 0 — the audit
  * report IS the gate's evidence, and the driver's oracle recomputes
  * every count independently from the raw tables.
  *
  * Scale posture (100 TB): every layer is a declarative frame —
  * staging filters push into the raw scans, the SCD2 chain is one
  * partitioned window, marts are map-side-combinable aggregates, and
  * the only driver-side values are the report's bounded scalars (one
  * Long per metric, ~20 rows total). Nothing in the chain collects
  * row-level data.
  */
object WarehouseBuild {

  /** One metric row of the audit report. */
  private type Metric = (String, String, String, Long)

  /** Run the full build against the fixture at `dir`. Returns the
    * audit report: (step, relation, metric, value BIGINT), one frame
    * summarizing every layer of the single composed run. Tables are
    * suffixed per-`dir` so concurrent scale factors don't collide. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    val h = math.abs(dir.hashCode).toString

    // ---- staging: orders. Counters ride the materialization action.
    val rawOrders = Tables.orders(spark, dir)
    val (ordersIn, ordersInObs) = Quality.observed(rawOrders, Seq(
      "rows_in" -> lit(true),
      "dropped_invalid" ->
        (col("o_totalprice") <= 0 || col("o_custkey").isNull),
      "high_value" -> (col("o_totalprice") > 400000)))
    val (ordersKept, ordersKeptObs) = Quality.observed(
      ordersIn.filter(col("o_totalprice") > 0 &&
        col("o_custkey").isNotNull),
      Seq("rows_kept" -> lit(true)))
    val stgOrders =
      Materialize.table(ordersKept, s"e2e_stg_orders_$h")

    // ---- staging: customer (q52 soft-delete rule: key ≡ 0 mod 10).
    val rawCust = Tables.customer(spark, dir)
      .withColumn("is_deleted", pmod(col("c_custkey"), lit(10)) === 0)
    val (custIn, custInObs) = Quality.observed(rawCust, Seq(
      "rows_in" -> lit(true),
      "soft_deleted" -> col("is_deleted")))
    val (custKept, custKeptObs) = Quality.observed(
      graft.stage.Staging.dropSoftDeleted(custIn),
      Seq("rows_kept" -> lit(true)))
    val stgCust =
      Materialize.table(custKept.drop("is_deleted"), s"e2e_stg_customer_$h")

    // ---- dim: SCD2 user-state chain from the event log (q6 shape),
    // materialized, then invariant-audited FROM THE STORED COPY (the
    // checks prove what readers will see, not what the plan computed).
    val dim = Materialize.table(
      Scd2.build(Tables.events(spark, dir), Seq("user_id"), "ts",
        Seq("event_id")),
      s"e2e_dim_user_scd2_$h")
    val dimVersions = dim.count()
    val dimCurrent = dim.filter(col("is_current")).count()
    val dimOverlap = Scd2.overlapViolations(dim, Seq("user_id")).count()
    val dimCurrentViol = Scd2.currentViolations(dim, Seq("user_id")).count()

    // ---- marts from the STAGED tables (proving the chain feeds
    // forward through the catalog), published as ONE all-or-nothing
    // SET ([[Materialize.publishSetAudited]]): the dbt-build promotion
    // semantic — if EITHER mart fails its audit, NEITHER publishes, so
    // readers never see a fresh mart beside the stale sibling it was
    // built with.
    val monthly = stgOrders
      .groupBy(trunc(col("o_orderdate"), "MM").as("month"))
      .agg(sum(money(col("o_totalprice"))).as("revenue"))
    val segment = stgOrders
      .join(stgCust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(money(col("o_totalprice"))).as("revenue"))
    val (martsOk, martsAudit) = Materialize.publishSetAudited(
      s"e2e_marts_$h", Seq(
        (monthly, s"e2e_mart_monthly_$h",
          Seq(NotNull("month"), NotNull("revenue"), Unique(Seq("month")))),
        (segment, s"e2e_mart_segment_$h",
          Seq(NotNull("c_mktsegment"), Unique(Seq("c_mktsegment"))))))
    val (monthlyOk, segmentOk) = (martsOk, martsOk)
    val monthlyAudit = martsAudit
      .find(_._1 == s"e2e_mart_monthly_$h").map(_._2).getOrElse(Nil)
    val segmentAudit = martsAudit
      .find(_._1 == s"e2e_mart_segment_$h").map(_._2).getOrElse(Nil)

    def martMetrics(rel: String, name: String, ok: Boolean,
        audit: Seq[Quality.Result]): Seq[Metric] = {
      // read back from the catalog: the report describes the
      // PUBLISHED artifact (cents stay exact: decimal × 100 → long)
      val m = spark.table(name)
        .agg(count(lit(1)).as("n"),
          sum((col("revenue") * 100).cast("long")).as("cents"))
        .head()
      Seq(
        ("mart", rel, "rows", m.getAs[Long]("n")),
        ("mart", rel, "revenue_cents", m.getAs[Long]("cents")),
        ("mart", rel, "published", if (ok) 1L else 0L),
        ("mart", rel, "audit_violations", audit.map(_.violations).sum))
    }

    // ---- the report: bounded driver scalars only (≤ ~20 Longs).
    def obsVal(o: org.apache.spark.sql.Observation, k: String): Long =
      o.get(k).asInstanceOf[Number].longValue()
    val rows: Seq[Metric] =
      Seq[Metric](
        ("staging", "stg_orders", "rows_in",
          obsVal(ordersInObs, "rows_in")),
        ("staging", "stg_orders", "rows_kept",
          obsVal(ordersKeptObs, "rows_kept")),
        ("staging", "stg_orders", "dropped_invalid",
          obsVal(ordersInObs, "dropped_invalid")),
        ("staging", "stg_orders", "high_value",
          obsVal(ordersInObs, "high_value")),
        ("staging", "stg_customer", "rows_in",
          obsVal(custInObs, "rows_in")),
        ("staging", "stg_customer", "rows_kept",
          obsVal(custKeptObs, "rows_kept")),
        ("staging", "stg_customer", "soft_deleted",
          obsVal(custInObs, "soft_deleted")),
        ("dim", "dim_user_scd2", "versions", dimVersions),
        ("dim", "dim_user_scd2", "current_rows", dimCurrent),
        ("dim", "dim_user_scd2", "overlap_violations", dimOverlap),
        ("dim", "dim_user_scd2", "current_violations", dimCurrentViol)) ++
      martMetrics("mart_monthly_revenue", s"e2e_mart_monthly_$h",
        monthlyOk, monthlyAudit) ++
      martMetrics("mart_segment_revenue", s"e2e_mart_segment_$h",
        segmentOk, segmentAudit)

    import spark.implicits._
    rows.toDF("step", "relation", "metric", "value")
  }
}
