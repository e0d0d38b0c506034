package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 invariants (SURVEY §7.3 risk list): half-open intervals,
  * exactly one current row per key, overlap detection, as-of lookup. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def changes = Seq(
    ("k1", "2024-01-01 00:00:00", "a"),
    ("k1", "2024-01-03 00:00:00", "b"),
    ("k1", "2024-01-05 00:00:00", "c"),
    ("k2", "2024-02-01 12:00:00", "x"))
    .toDF("key", "ts", "state")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("build: half-open intervals chain with no gaps") {
    val dim = Scd2.build(changes, Seq("key"), "ts")
    val k1 = rows(dim.filter($"key" === "k1").orderBy("version"))
    assert(k1.map(_.getAs[Any]("valid_from").toString.take(10)) ==
      Seq("2024-01-01", "2024-01-03", "2024-01-05"))
    // each valid_to equals the next valid_from (half-open chain)
    assert(k1(0).getAs[Any]("valid_to") == k1(1).getAs[Any]("valid_from"))
    assert(k1(1).getAs[Any]("valid_to") == k1(2).getAs[Any]("valid_from"))
    assert(k1(2).getAs[Any]("valid_to") == null)
  }

  test("build: exactly one current row per key") {
    val dim = Scd2.build(changes, Seq("key"), "ts")
    assert(Scd2.currentViolations(dim, Seq("key")).isEmpty)
    assert(dim.filter($"is_current").count() == 2)
  }

  test("overlapViolations: clean dim passes, corrupted dim is caught") {
    val dim = Scd2.build(changes, Seq("key"), "ts")
    assert(Scd2.overlapViolations(dim, Seq("key")).isEmpty)
    // widen version 1's valid_to past version 2's valid_from -> overlap
    val bad = dim.withColumn("valid_to",
      when($"version" === 1 && $"key" === "k1",
        lit(ts("2024-01-04 00:00:00"))).otherwise($"valid_to"))
    assert(Scd2.overlapViolations(bad, Seq("key")).count() == 1)
  }

  test("asOfJoin: picks the version containing the fact timestamp") {
    val dim = Scd2.build(changes, Seq("key"), "ts")
      .select($"key", $"state", $"valid_from", $"valid_to")
    val facts = Seq(
      ("f1", "k1", "2024-01-02 00:00:00"), // inside [v1, v2)
      ("f2", "k1", "2024-01-03 00:00:00"), // boundary -> half-open: v2
      ("f3", "k1", "2024-12-31 00:00:00"), // open-ended current
      ("f4", "k2", "2024-01-01 00:00:00")) // before first version: no match
      .toDF("fact_id", "key", "fts")
      .withColumn("fts", col("fts").cast("timestamp"))
    val j = Scd2.asOfJoin(facts, dim, Seq("key"), "fts")
    val got = rows(j.select($"fact_id", $"state").orderBy($"fact_id"))
      .map(r => (r.getString(0), r.getString(1)))
    assert(got == Seq(("f1", "a"), ("f2", "b"), ("f3", "c")))
  }
}
