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

  test("summarize emits one row per check with pass flags") {
    val df = Seq("a", "a").toDF("id")
    val out = Quality.summarize(spark, Seq(
      "uniq" -> Unique(Seq("id")).violations(df),
      "nn" -> NotNull("id").violations(df)))
    val got = rows(out).map(r =>
      r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map("uniq" -> ((1L, false)), "nn" -> ((0L, true))))
  }
}
