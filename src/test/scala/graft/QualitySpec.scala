package graft

import org.apache.spark.sql.functions._
import graft.quality._

/** dbt schema-test parity (reference `models/schema.yml`). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("Unique flags duplicate keys only") {
    val df = Seq("a", "a", "b").toDF("id")
    val v = Unique(Seq("id")).violations(df)
    assert(rows(v).map(_.getString(0)) == Seq("a"))
  }

  test("NotNull counts null rows") {
    val df = Seq(Some(1), None, Some(3)).toDF("x")
    assert(NotNull("x").violations(df).count() == 1)
  }

  test("NonEmpty: zero rows is itself a violation (anti-vacuity)") {
    val empty = spark.range(0).selectExpr("id AS k")
    val full = spark.range(3).selectExpr("id AS k")
    // row-level checks hold VACUOUSLY on an empty table — the gap
    // NonEmpty exists to close
    assert(Quality.run(empty, Seq(NotNull("k"), Unique(Seq("k"))))
      .forall(_.passed))
    val r = Quality.runOnce(empty, Seq(NonEmpty(), NotNull("k")))
    assert(!r.head.passed && r.head.violations == 1L)
    assert(r(1).passed) // NotNull still vacuous; NonEmpty is the gate
    assert(Quality.runOnce(full, Seq(NonEmpty())).forall(_.passed))
  }

  test("Relationship ignores null child keys (dbt semantics)") {
    val parent = Seq(1, 2).toDF("pk")
    val child = Seq(Some(1), Some(99), None).toDF("fk")
    val v = Relationship("fk", parent, "pk").violations(child)
    assert(rows(v).map(_.getAs[Int]("fk")) == Seq(99))
  }

  test("AcceptedValues passes nulls, flags out-of-enum") {
    val df = Seq(Some("ok"), Some("bad"), None).toDF("status")
    val v = AcceptedValues("status", Seq("ok")).violations(df)
    assert(v.count() == 1)
  }

  test("Freshness warns only when max(loaded_at) is stale") {
    val df = Seq("2024-01-10 00:00:00").toDF("t")
      .withColumn("t", col("t").cast("timestamp"))
    val fresh = Freshness("t", 24, ts("2024-01-10 12:00:00"))
    assert(fresh.violations(df).isEmpty)
    val stale = Freshness("t", 24, ts("2024-01-20 00:00:00"))
    assert(stale.violations(df).count() == 1)
  }

  test("summarize emits one row per check with severity-tiered status") {
    val df = Seq("a", "a").toDF("id")
    import graft.quality.Severity.{Error, Warn}
    def legs = Seq(
      ("uniq", Unique(Seq("id")).violations(df), Error),
      ("nn", NotNull("id").violations(df), Error),
      ("uniq_w", Unique(Seq("id")).violations(df), Warn))
    val got = rows(Quality.summarize(spark, legs)).map(r =>
      r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getString(4),
          r.getBoolean(5)))).toMap
    // error tier fails; warn tier fires without failing, and
    // promoted_status shows what --warn-error would do to it
    assert(got == Map(
      "uniq" -> ((1L, "error", "error", "error", false)),
      "nn" -> ((0L, "error", "pass", "pass", true)),
      "uniq_w" -> ((1L, "warn", "warn", "error", true))))
    // --warn-error promotion flips the firing warn check to a failure
    val promoted = rows(Quality.summarize(spark, legs, warnAsError = true))
      .map(r => r.getString(0) -> ((r.getString(3), r.getBoolean(5)))).toMap
    assert(promoted("uniq_w") == (("error", false)))
    assert(promoted("nn") == (("pass", true)))
  }

  test("run reports warn-tier results and promotes under warnAsError") {
    val df = Seq("2024-01-10 00:00:00").toDF("t")
      .withColumn("t", col("t").cast("timestamp"))
    val stale = Freshness("t", 24, ts("2024-01-20 00:00:00"))
    val Seq(r) = Quality.run(df, Seq(stale))
    assert(r.severity == "warn" && r.status == "warn" && r.passed)
    val Seq(p) = Quality.run(df, Seq(stale), warnAsError = true)
    assert(p.status == "error" && !p.passed)
  }
}
