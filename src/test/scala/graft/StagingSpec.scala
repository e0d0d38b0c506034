package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, DateType}
import graft.stage.Staging

/** Staging transforms against the reference's dirty-data rulebook
  * (reference `data_gen/pseudo_code_rules.txt`): dup rows, malformed
  * JSON, mixed formats, reject routing. */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  test("dedupLatest: keeps newest, tie-break is deterministic") {
    val df = Seq(
      ("k1", "2024-01-02 00:00:00", "new"),
      ("k1", "2024-01-01 00:00:00", "old"),
      ("k2", "2024-01-01 00:00:00", "tieA"),
      ("k2", "2024-01-01 00:00:00", "tieB"))
      .toDF("key", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Staging.dedupLatest(df, Seq("key"), col("ts"), Seq(col("v")))
    val got = rows(out.orderBy("key")).map(_.getAs[String]("v"))
    // k2 tie resolved by v desc -> tieB
    assert(got == Seq("new", "tieB"))
  }

  test("dedupLatestAgg equals dedupLatest and plans without a window") {
    val df = (1 to 300).map { i =>
      (s"k${i % 7}", f"2024-01-${i % 28 + 1}%02d 00:00:00", s"v$i")
    }.toDF("key", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val win = rows(Staging.dedupLatest(df, Seq("key"), col("ts"),
      Seq(col("v"))).orderBy("key"))
      .map(r => (r.getString(0), r.getString(2)))
    val agg = Staging.dedupLatestAgg(df, Seq("key"), col("ts"),
      Seq(col("v")))
    val got = rows(agg.orderBy("key"))
      .map(r => (r.getString(0), r.getString(2)))
    assert(got == win)
    // the scale property: a partial (map-side) aggregate, no WindowExec
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected aggregate plan:\n$plan")
  }

  test("splitValid: null predicate rows are rejects, split is complete") {
    val df = Seq(("a", Some(1)), ("b", None), ("c", Some(-1)))
      .toDF("id", "x")
    val (clean, rejects) = Staging.splitValid(df, col("x") > 0)
    assert(rows(clean).map(_.getString(0)) == Seq("a"))
    assert(rows(rejects).map(_.getString(0)).sorted == Seq("b", "c"))
    assert(clean.count() + rejects.count() == df.count())
  }

  test("castStrict: non-castable non-null values route to rejects") {
    val df = Seq(("1", "2024-01-05"), ("oops", "2024-01-06"),
      (null, "2024-01-07"))
      .toDF("qty", "d")
    val (clean, rejects) =
      Staging.castStrict(df, Map("qty" -> IntegerType, "d" -> DateType))
    // null input is NOT a reject (absent != malformed)
    assert(clean.count() == 2)
    assert(rows(rejects).map(_.getString(0)) == Seq("oops"))
    assert(clean.schema("qty").dataType == IntegerType)
  }

  test("parseJsonTolerant distinguishes malformed from absent") {
    val df = Seq(("a", """{"k":"1"}"""), ("b", "{not json"), ("c", null))
      .toDF("id", "js")
    val bad = Staging.malformedJson(df, "js")
    assert(rows(bad).map(_.getString(0)) == Seq("b"))
    val parsed = Staging.parseJsonTolerant(df, "js")
    assert(parsed.filter(col("parsed").isNotNull).count() == 1)
  }

  test("sanitizeMoney rejects negative price and zero quantity") {
    val df = Seq((10.0, 1), (-1.0, 2), (5.0, 0)).toDF("price", "qty")
    val (clean, rejects) = Staging.sanitizeMoney(df, "price", "qty")
    assert(clean.count() == 1 && rejects.count() == 2)
  }

  test("normalizeCountry maps names and codes through the seed") {
    val seed = Seq(("Germany", "DE"), ("France", "FR"))
      .toDF("country_name", "iso_code")
    val df = Seq("germany", "FR", "Atlantis").toDF("country")
    val out = Staging.normalizeCountry(df, "country", seed)
    val got = rows(out.select("country", "country_iso"))
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("germany") == "DE")
    assert(got("FR") == "FR")
    assert(got("Atlantis") == null)
  }

  test("multiFormatDate parses the reference's inconsistent formats") {
    import graft.functions.Functions
    val df = Seq("2024-03-05", "03/05/2024", "05-03-2024", "junk")
      .toDF("d")
    val got = rows(df.select(Functions.multiFormatDate(col("d"))))
      .map(r => Option(r.get(0)).map(_.toString).orNull)
    assert(got == Seq("2024-03-05", "2024-03-05", "2024-03-05", null))
  }
}
