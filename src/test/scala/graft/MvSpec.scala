package graft

import org.apache.spark.sql.functions._

import graft.functions.Functions.money
import graft.plans.Mv
import graft.sources.Tables

/** The MV rollup rewrite rule: fires for covered aggregates (scan
  * swaps to the mart, results identical), stays out of everything it
  * cannot prove (filters, distinct aggregates, unknown columns). */
class MvSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def events = Tables.events(spark, dir)

  private def buildAndRegister(): Unit = {
    spark.sql("DROP TABLE IF EXISTS mv_daily_type_test")
    // a crashed earlier run can leave the managed location behind with
    // no catalog entry — saveAsTable then refuses the name
    val loc = new java.io.File("/tmp/graft_test_warehouse/mv_daily_type_test")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    events.groupBy(date_trunc("day", col("ts")).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(money(col("value"))).as("total"))
      .write.mode("overwrite").saveAsTable("mv_daily_type_test")
    Mv.register(spark, "mv_daily_type_test", events,
      keys = Seq("day" -> date_trunc("day", col("ts")),
        "event_type" -> col("event_type")),
      sums = Seq("total" -> money(col("value"))),
      countStar = Some("n_events"))
  }

  private def scansMv(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("mv_daily_type_test")

  test("covered rollup rewrites to the mart and matches the fact scan") {
    buildAndRegister()
    try {
      val q = events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("total"))
      assert(scansMv(q), q.queryExecution.executedPlan.toString.take(3000))
      Mv.deregister("mv_daily_type_test")
      val direct = events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("total"))
      assert(!scansMv(direct))
      val a = rows(q.orderBy("event_type")).map(_.toSeq)
      val b = rows(direct.orderBy("event_type")).map(_.toSeq)
      assert(a == b, s"$a\nvs\n$b")
    } finally Mv.deregister("mv_daily_type_test")
  }

  test("full-key grouping and global aggregates both rewrite") {
    val expectDay = rows(events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).orderBy("day")).map(_.toSeq)
    val expectN = events.count()
    buildAndRegister()
    try {
      val byDay = events.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      assert(scansMv(byDay))
      val global = events.agg(count(lit(1)).as("n"))
      assert(scansMv(global))
      assert(rows(byDay.orderBy("day")).map(_.toSeq) == expectDay)
      assert(rows(global).head.getLong(0) == expectN)
    } finally Mv.deregister("mv_daily_type_test")
  }

  test("a filter covered by MV key expressions rewrites; the filtered " +
      "result matches the fact scan") {
    val cut = "2024-02-01"
    def fact = events
      .filter(date_trunc("day", col("ts")) >= lit(cut).cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("total"))
    val expect = rows(fact.orderBy("event_type")).map(_.toSeq)
    buildAndRegister()
    try {
      // filter key ∈ grouping set: WHERE day >= X GROUP BY day
      val byDay = events
        .filter(date_trunc("day", col("ts")) >= lit(cut).cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      assert(scansMv(byDay),
        byDay.queryExecution.executedPlan.toString.take(3000))
      // filter key ∉ grouping set: WHERE day >= X GROUP BY event_type
      // (the predicate is constant within each MV group either way)
      val byType = fact
      assert(scansMv(byType))
      assert(rows(byType.orderBy("event_type")).map(_.toSeq) == expect)
    } finally Mv.deregister("mv_daily_type_test")
  }

  test("filters, distinct aggs, and uncovered columns do NOT rewrite") {
    buildAndRegister()
    try {
      val filtered = events.filter(col("value") > 10)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(!scansMv(filtered))
      // a nondeterministic predicate has NO column references, so the
      // reference-subset gate alone would pass it — but rand() over
      // pre-aggregated rows samples GROUPS, not raw rows. Must abort.
      // (< 0.5, not an always-true bound: the optimizer FOLDS
      // `rand() < 2.0` away before the rule ever sees it)
      val nondet = events.filter(rand(7) < 0.5)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(!scansMv(nondet),
        nondet.queryExecution.executedPlan.toString.take(3000))
      val distinctAgg = events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
      assert(!scansMv(distinctAgg))
      val uncovered = events.groupBy(col("event_type"))
        .agg(sum(col("user_id")).as("s"))
      assert(!scansMv(uncovered))
      val wrongKey = events.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
      assert(!scansMv(wrongKey))
    } finally Mv.deregister("mv_daily_type_test")
  }

  test("smallest covering MV wins, independent of registration order") {
    // a coarser 1-key rollup of the same fact: both MVs cover a
    // GROUP BY event_type query; the fewest-keys mart must answer in
    // EITHER registration order (the choice is a sort, not registry
    // iteration order)
    def buildCoarse(): Unit = {
      spark.sql("DROP TABLE IF EXISTS mv_type_only_test")
      val loc = new java.io.File("/tmp/graft_test_warehouse/mv_type_only_test")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
      events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(money(col("value"))).as("total"))
        .write.mode("overwrite").saveAsTable("mv_type_only_test")
    }
    def registerCoarse(): Unit =
      Mv.register(spark, "mv_type_only_test", events,
        keys = Seq("event_type" -> col("event_type")),
        sums = Seq("total" -> money(col("value"))),
        countStar = Some("n_events"))
    def byType = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("total"))
    def byDay = events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    def scans(df: org.apache.spark.sql.DataFrame, t: String): Boolean =
      df.queryExecution.executedPlan.toString.contains(t)
    val expect = rows(byType.orderBy("event_type")).map(_.toSeq)
    buildCoarse()
    try {
      // order 1: fine first, coarse second
      buildAndRegister(); registerCoarse()
      assert(scans(byType, "mv_type_only_test"),
        byType.queryExecution.executedPlan.toString.take(3000))
      assert(!scans(byType, "mv_daily_type_test"))
      // a query only the fine MV covers still goes to the fine MV
      assert(scans(byDay, "mv_daily_type_test"))
      assert(rows(byType.orderBy("event_type")).map(_.toSeq) == expect)
      Mv.deregister("mv_daily_type_test")
      Mv.deregister("mv_type_only_test")
      // order 2: coarse first, fine second — same answers
      registerCoarse(); buildAndRegister()
      assert(scans(byType, "mv_type_only_test"))
      assert(!scans(byType, "mv_daily_type_test"))
      assert(rows(byType.orderBy("event_type")).map(_.toSeq) == expect)
    } finally {
      Mv.deregister("mv_daily_type_test")
      Mv.deregister("mv_type_only_test")
    }
  }
}
