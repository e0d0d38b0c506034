package graft

/** Every registered query must analyze and execute on the smallest
  * fixture — this is the in-repo insurance against analysis-time
  * regressions (the class of bug where a query only fails when the
  * driver's correctness gate runs it). */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("events.ts normalizes to TimestampType whatever the fixture encodes") {
    // fixture drift broke 6 queries silently in round 6 (NANOS→NTZ);
    // the reader contract (SURVEY §1.2) is session-zoned TimestampType,
    // so any future physical-encoding drift must fail HERE, loudly
    import org.apache.spark.sql.types.TimestampType
    assert(sources.Tables.events(spark, dir).schema("ts").dataType ==
      TimestampType)
  }

  test("normalizeTs fails loudly, naming the type, on an unknown " +
      "encoding") {
    // drift #3 insurance: a fourth fixture encoding must produce a
    // one-line diagnosis at the reader, not six analysis errors
    import spark.implicits._
    val weird = Seq("2024-01-01").toDF("ts") // StringType: not handled
    val e = intercept[IllegalArgumentException] {
      sources.Tables.normalizeTs(weird, "ts")
    }
    assert(e.getMessage.contains("'ts'"))
    assert(e.getMessage.contains("StringType"))
    assert(e.getMessage.contains("normalizeTs"))
  }

  test("every query has an oracle (or is consciously rows-only)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle: $noOracle")
  }
}
