package graft

import org.apache.spark.sql.functions._

/** Runtime-filtering contracts — the scan-elimination levers that
  * decide whether a 100 TB job reads 100 TB or just the slice a dim
  * filter selects. Both are free Catalyst behavior ON OUR LAYOUTS, so
  * these specs lock that the layouts keep qualifying:
  *
  *  - Dynamic Partition Pruning: a date-partitioned fact
  *    ([[graft.sources.Ingest.writePartitioned]], the reference's
  *    "by source and date" raw layout) joined to a filtered dim on the
  *    partition column must plan a `dynamicpruning` subquery in the
  *    fact scan's PartitionFilters — fact partitions for days the dim
  *    filter rejects are never opened.
  *  - Runtime bloom-filter join: a selective dim joined to an
  *    unpartitioned fact on a NON-partition key must inject
  *    `bloom_filter_might_contain` on the fact side — the row-group
  *    analogue of DPP for keys that aren't the partition column.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val base = "/tmp/graft_test_runtime_filters"

  private def partitionedFact(): String = {
    val path = s"$base/fact_by_day"
    graft.sources.Ingest.deletePath(spark, path)
    import spark.implicits._
    val fact = spark.range(0, 2000)
      .select(col("id"),
        concat(lit("2024-01-"),
          lpad(((col("id") % 10) + 1).cast("string"), 2, "0")).as("d"),
        (col("id") % 97).as("k"))
    graft.sources.Ingest.writePartitioned(fact, path, Seq("d"), "overwrite")
    path
  }

  test("DPP: the partitioned-fact ⋈ filtered-dim join prunes " +
      "partitions via a dynamicpruning subquery") {
    val path = partitionedFact()
    import spark.implicits._
    // dim: one row per day, an attribute the query filters on — only
    // 2 of 10 days survive; DPP must push that set into the fact scan.
    // Written to parquet and filtered ON READ: DPP requires a visible
    // selective predicate on the dim side (an in-memory local relation
    // constant-folds the filter away and nothing fires)
    val dimPath = s"$base/dim_days"
    graft.sources.Ingest.deletePath(spark, dimPath)
    (1 to 10)
      .map(i => (f"2024-01-$i%02d", if (i <= 2) "keep" else "drop"))
      .toDF("d", "flag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.parquet(path)
    val q = fact.join(dim.filter(col("flag") === "keep"), Seq("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    assert(q.collect().map(_.getLong(1)).sum == 400L) // 2 of 10 days
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruning subquery in the fact scan:\n${plan.take(3000)}")
  }

  test("runtime bloom filter: a selective dim shuffle-join injects " +
      "might_contain on the fact side") {
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    // the application-side size gate defaults to 10 GiB — lower it so
    // the fixture-sized fact qualifies; the CONTRACT under test is the
    // plan shape, the production gate stays default
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    try {
      val path = s"$base/fact_flat"
      graft.sources.Ingest.deletePath(spark, path)
      spark.range(0, 5000)
        .select(col("id"), (col("id") % 1000).as("k"))
        .write.mode("overwrite").parquet(path)
      val dimPath = s"$base/dim_flat"
      graft.sources.Ingest.deletePath(spark, dimPath)
      spark.range(0, 1000)
        .select(col("id").as("k"),
          when(col("id") < 10, "keep").otherwise("drop").as("flag"))
        .write.mode("overwrite").parquet(dimPath)
      val fact = spark.read.parquet(path)
      val dim = spark.read.parquet(dimPath).filter(col("flag") === "keep")
      val q = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"))
      assert(q.collect().head.getLong(0) == 50L) // 10 keys × 5 rows
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter on the fact side:\n${plan.take(3000)}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("AQE demotes a statically-planned sort-merge join to broadcast " +
      "at runtime when the built side turns out small") {
    // the README's cluster-posture claim ("leave AQE on: it re-plans
    // joins"), spec-locked: static size estimates over-estimate a
    // filtered dim, AQE sees the REAL post-shuffle size and broadcasts
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // static: SMJ
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
    try {
      val path = s"$base/fact_aqe"
      graft.sources.Ingest.deletePath(spark, path)
      spark.range(0, 5000)
        .select(col("id"), (col("id") % 500).as("k"))
        .write.mode("overwrite").parquet(path)
      val dimPath = s"$base/dim_aqe"
      graft.sources.Ingest.deletePath(spark, dimPath)
      spark.range(0, 500).select(col("id").as("k"), col("id").as("v"))
        .write.mode("overwrite").parquet(dimPath)
      val q = spark.read.parquet(path)
        .join(spark.read.parquet(dimPath), Seq("k"))
        .agg(count(lit(1)).as("n"))
      assert(q.collect().head.getLong(0) == 5000L)
      val plan = q.queryExecution.executedPlan.toString
      val (finalPart, initialPart) = plan.indexOf("== Initial Plan ==") match {
        case -1 => (plan, "")
        case i  => (plan.take(i), plan.drop(i))
      }
      assert(initialPart.contains("SortMergeJoin"),
        s"static plan was not SMJ:\n${plan.take(3000)}")
      assert(finalPart.contains("BroadcastHashJoin"),
        s"AQE did not demote to broadcast:\n${plan.take(3000)}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
