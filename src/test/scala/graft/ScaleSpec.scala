package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Materialize

/** Scale-path mechanics: salted aggregation correctness and
  * shuffle-free bucketed joins. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the plain aggregate on skewed data") {
    // hot key: 90% of rows on one key
    val df = (1 to 5000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }.toDF("k", "v")
    val salted = rows(Skew.saltedSumCount(df, Seq("k"), col("v"),
      "total", "n").orderBy("k"))
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = rows(df.groupBy("k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n")).orderBy("k"))
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join, inner and left") {
    val facts = (1 to 3000).map { i =>
      (if (i % 10 == 0) i % 7 else 999, s"f$i")
    }.toDF("k", "fv")
    val dims = Seq((999, "hot"), (0, "d0"), (1, "d1"), (42, "unmatched"))
      .toDF("k", "dv")
    for (jt <- Seq("inner", "left")) {
      val salted = rows(Skew.saltedJoin(facts, dims, Seq("k"), jt)
        .orderBy("k", "fv"))
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      val plain = rows(facts.join(dims, Seq("k"), jt).orderBy("k", "fv"))
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoinAgg equals the plain join-then-aggregate on skewed " +
      "data") {
    val facts = (1 to 4000).map { i =>
      (if (i % 10 == 0) i % 7 else 999, i.toDouble)
    }.toDF("k", "v")
    val dims = Seq((999, 2.0), (0, 1.0), (1, 3.0), (42, 9.0))
      .toDF("k", "m")
    val salted = rows(Skew.saltedJoinAgg(facts, dims, Seq("k"),
        col("v") * col("m"), "total", "n").orderBy("k"))
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val plain = rows(facts.join(dims, Seq("k"))
        .groupBy("k")
        .agg(sum(col("v") * col("m")).as("total"),
          count(lit(1)).as("n")).orderBy("k"))
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(salted == plain)
  }

  test("saltedJoinAggHot equals the plain join-then-aggregate across " +
      "hot and cold keys") {
    // one dominant hot key, a mid-weight key, and a long cold tail —
    // with hotKeyCount=2 both slices (salted hot path, plain cold
    // path) are exercised and must merge to the exact plain result
    val facts = (1 to 5000).map { i =>
      val k = if (i % 2 == 0) 7 else if (i % 5 == 0) 13 else i % 500
      (k, i.toDouble)
    }.toDF("k", "v")
    val dims = ((0 to 500) :+ 999).map(k => (k, (k % 9 + 1).toDouble))
      .toDF("k", "m")
    def shape(df: org.apache.spark.sql.DataFrame) =
      rows(df.orderBy("k"))
        .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val hot = shape(Skew.saltedJoinAggHot(facts, dims, Seq("k"),
      col("v") * col("m"), "total", "n", saltBuckets = 8,
      hotKeyCount = 2))
    val plain = shape(facts.join(dims, Seq("k")).groupBy("k")
      .agg(sum(col("v") * col("m")).as("total"),
        count(lit(1)).as("n")))
    assert(hot == plain)
  }

  test("SharedFrames.getOrBuild is reentrant: nested builds never " +
      "throw Recursive update") {
    import graft.operators.SharedFrames
    // the r8 scale-panel crash: a builder that itself calls getOrBuild
    // (q48's clusters build on the shared pair frame) recursed into
    // computeIfAbsent and threw IllegalStateException whenever the two
    // keys collided into one bin — flaky by bin layout. 100 nested
    // pairs into a fresh map makes a collision near-certain under the
    // old implementation; the reentrant form must never throw.
    SharedFrames.release()
    try {
      val base = Seq((1, "a")).toDF("id", "v")
      for (i <- 1 to 100) {
        val outer = SharedFrames.getOrBuild(s"rt_outer_$i") {
          SharedFrames.getOrBuild(s"rt_inner_$i")(base)
            .select(col("id"))
        }
        assert(outer.count() == 1)
      }
      // second lookup returns the SAME cached frame, no rebuild
      val again = SharedFrames.getOrBuild("rt_outer_1")(
        sys.error("must not rebuild"))
      assert(again.count() == 1)
    } finally SharedFrames.release()
  }

  test("nullSafeLeftJoin equals the plain left join with null keys") {
    val left = Seq((Some(1), "a"), (None, "b"), (Some(2), "c"),
      (None, "d")).toDF("k", "lv")
    val right = Seq((1, "r1"), (3, "r3")).toDF("k", "rv")
    val got = rows(Skew.nullSafeLeftJoin(left, right, Seq("k"))
      .orderBy("lv"))
      .map(r => (Option(r.get(0)), r.getString(1),
        Option(r.get(2))))
    val plain = rows(left.join(right, Seq("k"), "left").orderBy("lv"))
      .map(r => (Option(r.get(0)), r.getString(1),
        Option(r.get(2))))
    assert(got == plain)
  }

  test("partitioned layout prunes partitions for a date filter") {
    val path = "/tmp/graft_test_prune"
    graft.sources.Ingest.deletePath(spark, path)
    val df = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "d").withColumn("d", col("d").cast("date"))
    graft.sources.Ingest.writePartitioned(df, path, Seq("d"), "overwrite")
    val q = spark.read.parquet(path)
      .filter(col("d") === lit("2024-01-02").cast("date"))
    val scan = q.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (pruned at listing time),
    // not as a post-scan data filter
    assert(scan.contains("PartitionFilters: [isnotnull(d"),
      s"expected partition filter in:\n$scan")
    assert(q.count() == 1)
    // count the files actually read: only the matching partition
    assert(q.select(input_file_name()).distinct().count() == 1)
  }

  test("bucketed-to-bucketed join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lines")
    // a crashed prior run can leave the location without the catalog entry
    graft.sources.Ingest.deletePath(spark,
      "/tmp/graft_test_warehouse/bk_orders")
    graft.sources.Ingest.deletePath(spark,
      "/tmp/graft_test_warehouse/bk_lines")
    val orders = (1L to 200L).map(i => (i, s"o$i")).toDF("ok", "ov")
    val lines = (1L to 600L).map(i => (i % 200 + 1, i)).toDF("ok", "lv")
    val bo = Materialize.bucketedTable(orders, "bk_orders", Seq("ok"), 4)
    val bl = Materialize.bucketedTable(lines, "bk_lines", Seq("ok"), 4)
    // forbid broadcast so the planner must use the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo.join(bl, "ok")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 600)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE bk_orders")
    spark.sql("DROP TABLE bk_lines")
  }

  test("z-order layout touches fewer files than a single-column sort") {
    import graft.operators.Zorder
    // two independent uniform dims — the worst case for one-column sort
    val df = (0 until 20000).map { i =>
      val x = (i * 2654435761L) % 4096
      val y = (i * 40503L) % 4096
      (x, y)
    }.toDF("x", "y").persist()
    val byX = "/tmp/graft_test_sortx"
    val byZ = "/tmp/graft_test_zorder"
    graft.sources.Ingest.deletePath(spark, byX)
    graft.sources.Ingest.deletePath(spark, byZ)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(byX)
    Zorder.clusterBy(df, Zorder.zValue2(col("x"), col("y"), 12), 16)
      .write.parquet(byZ)
    // a y-only range predicate: the x-sorted layout scatters it across
    // every file; z-clustering confines it to the files whose y-bit
    // prefix can match
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") >= 100 && col("y") < 200)
        .select(input_file_name()).distinct().count()
    val nx = filesTouched(byX)
    val nz = filesTouched(byZ)
    df.unpersist()
    assert(nz < nx, s"z-order should touch fewer files: z=$nz, x-sort=$nx")
    // and both layouts return the identical rows
    assert(spark.read.parquet(byZ).filter(col("y") >= 100 && col("y") < 200)
      .count() ==
      spark.read.parquet(byX).filter(col("y") >= 100 && col("y") < 200)
        .count())
  }
}
