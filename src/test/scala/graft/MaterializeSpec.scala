package graft

import org.apache.spark.sql.functions._
import graft.datagen.Generate
import graft.sources.Materialize

/** Materialization semantics (S6/S7) + payments generation (J3/F9). */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("view stays lazy, table persists and re-reads from catalog") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Materialize.view(df, "mz_view")
    assert(spark.sql("SELECT COUNT(*) FROM mz_view").head.getLong(0) == 2)
    val t = Materialize.table(df, "mz_table")
    assert(t.count() == 2)
    assert(spark.catalog.tableExists("mz_table"))
    spark.sql("DROP TABLE mz_table")
  }

  test("eraseKeys rewrites only affected partitions, drops emptied ones") {
    spark.sql("DROP TABLE IF EXISTS mz_gdpr")
    graft.sources.Ingest.deletePath(spark,
      "/tmp/graft_test_warehouse/mz_gdpr")
    val src = Seq((1L, "d1", "x"), (2L, "d1", "y"), (3L, "d2", "z"),
      (4L, "d3", "w")).toDF("uid", "d", "v")
    src.write.mode("overwrite").format("parquet")
      .partitionBy("d").saveAsTable("mz_gdpr")
    // erase uid 2 (partial partition) and uid 4 (entire partition d3)
    val affected = Materialize.eraseKeys(spark, "mz_gdpr", "uid",
      Seq(2L, 4L).toDF("uid"), "d")
    assert(affected.toSet == Set("d1", "d3"))
    val left = rows(spark.table("mz_gdpr")).map(_.getLong(0)).sorted
    assert(left == Seq(1L, 3L))
    // the fully-erased partition is gone from the catalog, not stale
    assert(rows(spark.sql("SHOW PARTITIONS mz_gdpr"))
      .map(_.getString(0)).forall(!_.contains("d3")))
    spark.sql("DROP TABLE mz_gdpr")
  }

  test("eraseAggKeys rewrites only the touched (partition, batch) " +
      "slices; untouched batch slices keep their exact files") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    Materialize.dropAggState(spark, "mz_aggslice")
    // two batches: b0 holds keys 1/2 in partition d1; b1 holds key 3
    // in d1 and key 4 in d2. Erasing key 1 touches ONLY (d1, b0) —
    // (d1, b1) is an untouched batch slice of an AFFECTED partition,
    // the write-amplification case: its files must not be rewritten
    def partial(rows: Seq[(Long, String, Long)]) =
      rows.toDF("uid", "d", "n")
    Materialize.aggIncremental(spark, "mz_aggslice",
      partial(Seq((1L, "d1", 10L), (2L, "d1", 20L))),
      Seq("uid", "d"), "d", "b0")
    Materialize.aggIncremental(spark, "mz_aggslice",
      partial(Seq((3L, "d1", 30L), (4L, "d2", 40L))),
      Seq("uid", "d"), "d", "b1")
    def filesOf(b: String): Set[String] =
      rows(spark.table("mz_aggslice__partials")
        .filter(col("__batch") === b)
        .select(input_file_name().as("f")).distinct())
        .map(_.getString(0)).toSet
    val b1Before = filesOf("b1")
    assert(b1Before.nonEmpty)
    val (pubParts, slices) = Materialize.eraseAggKeys(spark,
      "mz_aggslice", "uid", Seq(1L).toDF("uid"), "d")
    assert(slices == 1L, s"expected 1 touched slice, got $slices")
    assert(pubParts == Seq("d1"))
    // untouched batch slice: byte-identical files, not a rewrite
    assert(filesOf("b1") == b1Before,
      "untouched (d1, b1) slice was rewritten")
    // content: key 1 gone everywhere, the rest intact
    assert(rows(spark.table("mz_aggslice__partials").select("uid"))
      .map(_.getLong(0)).sorted == Seq(2L, 3L, 4L))
    assert(rows(spark.table("mz_aggslice").select("uid"))
      .map(_.getLong(0)).sorted == Seq(2L, 3L, 4L))
    Materialize.dropAggState(spark, "mz_aggslice")
  }

  test("compactFiles: content identical, one file per partition after") {
    spark.sql("DROP TABLE IF EXISTS mz_cmp")
    graft.sources.Ingest.deletePath(spark,
      "/tmp/graft_test_warehouse/mz_cmp")
    val df = (1 to 100).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "d")
    df.repartition(8).write.mode("overwrite").format("parquet")
      .partitionBy("d").saveAsTable("mz_cmp")
    def filesPerPart() = rows(spark.table("mz_cmp")
        .withColumn("__f", input_file_name())
        .groupBy($"d").agg(countDistinct($"__f").as("nf")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(filesPerPart().values.exists(_ > 1), "fixture not fragmented")
    val before = rows(spark.table("mz_cmp")).map(_.getLong(0)).sorted
    val affected = Materialize.compactFiles(spark, "mz_cmp", "d")
    assert(affected.nonEmpty)
    assert(filesPerPart().values.forall(_ == 1))
    assert(rows(spark.table("mz_cmp")).map(_.getLong(0)).sorted == before)
    // idempotent: second pass finds nothing to do
    assert(Materialize.compactFiles(spark, "mz_cmp", "d").isEmpty)
    spark.sql("DROP TABLE mz_cmp")
  }

  test("publishAudited: passing audit swaps, failing audit rejects") {
    import graft.quality.NotNull
    spark.sql("DROP TABLE IF EXISTS mz_wap")
    spark.sql("DROP TABLE IF EXISTS mz_wap__staging")
    val v1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val (ok1, r1) = Materialize.publishAudited(v1, "mz_wap",
      Seq(NotNull("v")))
    assert(ok1 && r1.head.status == "pass")
    assert(rows(spark.table("mz_wap")).map(_.getInt(0)).sorted == Seq(1, 2))
    // poisoned v2: audit fails, published table must stay at v1
    val v2 = Seq((3, null.asInstanceOf[String])).toDF("id", "v")
    val (ok2, r2) = Materialize.publishAudited(v2, "mz_wap",
      Seq(NotNull("v")))
    assert(!ok2 && r2.head.status == "error" && r2.head.violations == 1)
    assert(rows(spark.table("mz_wap")).map(_.getInt(0)).sorted == Seq(1, 2))
    // staging never lingers, in either outcome
    assert(!spark.catalog.tableExists("mz_wap__staging"))
    // a clean v3 replaces v1 (repeatable lifecycle)
    val v3 = Seq((9, "z")).toDF("id", "v")
    val (ok3, _) = Materialize.publishAudited(v3, "mz_wap",
      Seq(NotNull("v")))
    assert(ok3 && rows(spark.table("mz_wap")).map(_.getInt(0)) == Seq(9))
    spark.sql("DROP TABLE mz_wap")
  }

  test("publish crash windows: a reader always sees a complete version") {
    import graft.quality.NotNull
    def ids(n: String) = rows(spark.table(n)).map(_.getInt(0)).sorted
    Seq("mz_cw", "mz_cw__staging", "mz_cw__prev")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val v1 = Seq((1, "a")).toDF("id", "v")
    val v2 = Seq((2, "b")).toDF("id", "v")
    assert(Materialize.publishAudited(v1, "mz_cw", Seq(NotNull("v")))._1)
    // crash window 1: staged, no rename yet — old version serves,
    // recoverPrev is a no-op, and a retry completes cleanly
    Materialize.table(v2, "mz_cw__staging")
    assert(ids("mz_cw") == Seq(1))
    assert(!Materialize.recoverPrev(spark, "mz_cw"))
    assert(Materialize.publishAudited(v2, "mz_cw", Seq(NotNull("v")))._1)
    assert(ids("mz_cw") == Seq(2))
    // crash window 2: rename-aside done, rename-in not — the one gap
    // state; recoverPrev restores the COMPLETE previous version
    spark.sql("ALTER TABLE mz_cw RENAME TO mz_cw__prev")
    assert(!spark.catalog.tableExists("mz_cw"))
    assert(Materialize.recoverPrev(spark, "mz_cw"))
    assert(ids("mz_cw") == Seq(2))
    assert(!Materialize.recoverPrev(spark, "mz_cw")) // idempotent
    // crash window 3: renamed in, prev not dropped — readers see the
    // new version and the NEXT publish clears the leftover
    Materialize.table(v1, "mz_cw__prev")
    assert(ids("mz_cw") == Seq(2))
    val v3 = Seq((3, "c")).toDF("id", "v")
    assert(Materialize.publishAudited(v3, "mz_cw", Seq(NotNull("v")))._1)
    assert(ids("mz_cw") == Seq(3))
    assert(!spark.catalog.tableExists("mz_cw__prev"))
    spark.sql("DROP TABLE mz_cw")
  }

  test("publish crash injection: every mid-swap crash leaves a " +
      "recoverable complete version") {
    import graft.quality.NotNull
    def ids(n: String) = rows(spark.table(n)).map(_.getInt(0)).sorted
    val name = "mz_ci"
    // Unlike the hand-built crash-window test above, this drives the
    // REAL publish path and kills it after each step of its actual
    // sequence — so a reordering of the swap ops is caught here even
    // if every hand-modeled window still passes.
    for (k <- 0 to 4) {
      Seq(name, s"${name}__staging", s"${name}__prev")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val v1 = Seq((1, "a")).toDF("id", "v")
      val v2 = Seq((2, "b")).toDF("id", "v")
      assert(Materialize.publishAudited(v1, name, Seq(NotNull("v")))._1)
      intercept[Materialize.CrashInjected] {
        Materialize.publishAudited(v2, name, Seq(NotNull("v")),
          crashAfterStep = k)
      }
      // repair, then the invariant: the published name resolves to a
      // COMPLETE version — all of v1 or all of v2, never a mix/empty
      Materialize.recoverPrev(spark, name)
      assert(spark.catalog.tableExists(name), s"step $k: published name lost")
      val got = ids(name)
      assert(got == Seq(1) || got == Seq(2), s"step $k: partial state $got")
      // and a clean retry always lands v2, leftovers notwithstanding
      assert(Materialize.publishAudited(v2, name, Seq(NotNull("v")))._1,
        s"step $k: retry failed")
      assert(ids(name) == Seq(2), s"step $k: retry content")
    }
    Seq(name, s"${name}__staging", s"${name}__prev")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("tableIncremental merges only touched partitions, deduped at rest") {
    spark.sql("DROP TABLE IF EXISTS mz_inc")
    graft.sources.Ingest.deletePath(spark, "/tmp/graft_test_warehouse/mz_inc")
    def frame(xs: Seq[(String, String, String, String)]) =
      xs.toDF("k", "ts", "v", "d")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("d", col("d").cast("date"))
    val inc1 = frame(Seq(
      ("k1", "2024-01-01 10:00:00", "v1", "2024-01-01"),
      ("k3", "2024-01-01 11:00:00", "x1", "2024-01-01"),
      ("k4", "2023-12-31 09:00:00", "z1", "2023-12-31")))
    val inc2 = frame(Seq(
      ("k1", "2024-01-01 12:00:00", "v2", "2024-01-01"), // update in d1
      ("k2", "2024-01-02 08:00:00", "w1", "2024-01-02"))) // new partition
    Materialize.tableIncremental(spark, "mz_inc", inc1, Seq("k"), "ts", "d")
    val after = Materialize.tableIncremental(spark, "mz_inc", inc2,
      Seq("k"), "ts", "d")
    val got = rows(after.orderBy("k"))
      .map(r => (r.getString(0), r.getString(2)))
    assert(got ==
      Seq(("k1", "v2"), ("k2", "w1"), ("k3", "x1"), ("k4", "z1")))
    // deduped AT REST: a raw table read (no dedup on the read path)
    // already shows one row per key
    assert(spark.table("mz_inc").count() == 4)
    // the merge's read shape (touched-partition isin filter) is
    // statically pruned: plan carries PartitionFilters and never lists
    // a file from the untouched 2023-12-31 partition
    val pruned = spark.table("mz_inc")
      .filter(col("d").isin(java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf("2024-01-02")))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:"),
      s"no partition filter in:\n$plan")
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(files.nonEmpty && files.forall(!_.contains("d=2023-12-31")),
      s"untouched partition listed: $files")
    spark.sql("DROP TABLE mz_inc")
  }

  test("tableIncremental replay converges: retry after a partial " +
      "partition commit reaches the same state as a clean apply") {
    // The dynamic-partition-overwrite commit replaces each touched
    // partition near-atomically but the SET of touched partitions is
    // not one atomic unit — a crash mid-commit can land some
    // partitions and not others. The recovery contract is REPLAY: the
    // merge is deterministic (dedupLatest of existing ∪ increment),
    // so re-running the same increment from ANY partial state
    // converges to the clean-apply state.
    def frame(xs: Seq[(String, String, String, String)]) =
      xs.toDF("k", "ts", "v", "d")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("d", col("d").cast("date"))
    val base = frame(Seq(
      ("k1", "2024-01-01 10:00:00", "v1", "2024-01-01"),
      ("k2", "2024-01-02 09:00:00", "w1", "2024-01-02"),
      ("k3", "2024-01-03 08:00:00", "x1", "2024-01-03")))
    val inc = frame(Seq(
      ("k1", "2024-01-01 12:00:00", "v2", "2024-01-01"),
      ("k2", "2024-01-02 11:00:00", "w2", "2024-01-02")))
    def shape(n: String) = rows(spark.table(n).select("k", "v"))
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // clean apply on one table = the reference final state
    for (n <- Seq("mz_rep_clean", "mz_rep_crash")) {
      spark.sql(s"DROP TABLE IF EXISTS $n")
      graft.sources.Ingest.deletePath(spark,
        s"/tmp/graft_test_warehouse/$n")
      Materialize.tableIncremental(spark, n, base, Seq("k"), "ts", "d")
    }
    Materialize.tableIncremental(spark, "mz_rep_clean", inc,
      Seq("k"), "ts", "d")
    // partial crash state: only the 2024-01-01 slice of the increment
    // committed (the mid-commit mixed state), then the FULL increment
    // replays
    Materialize.tableIncremental(spark, "mz_rep_crash",
      inc.filter(col("d") === "2024-01-01"), Seq("k"), "ts", "d")
    Materialize.tableIncremental(spark, "mz_rep_crash", inc,
      Seq("k"), "ts", "d")
    assert(shape("mz_rep_crash") == shape("mz_rep_clean"))
    assert(shape("mz_rep_clean") ==
      Seq(("k1", "v2"), ("k2", "w2"), ("k3", "x1")))
    // plain same-increment retry is also a no-op on content
    Materialize.tableIncremental(spark, "mz_rep_clean", inc,
      Seq("k"), "ts", "d")
    assert(shape("mz_rep_clean") ==
      Seq(("k1", "v2"), ("k2", "w2"), ("k3", "x1")))
    Seq("mz_rep_clean", "mz_rep_crash")
      .foreach(n => spark.sql(s"DROP TABLE $n"))
  }

  test("aggIncremental replay converges: a replayed batch never " +
      "double-counts, from any partial state") {
    // Additive merging of a replayed partial can never be absorbing,
    // so the operator stores batch-keyed partials and RECOMPUTES
    // touched partitions from storage — replaying the same (batchId,
    // partial) from any crash state must land on the clean-apply
    // state, the same contract as tableIncremental's.
    def frame(xs: Seq[(String, String, Long)]) =
      xs.toDF("d", "k", "v").withColumn("d", col("d").cast("date"))
    val batchA = frame(Seq(("2024-01-01", "k1", 10L),
      ("2024-01-02", "k2", 5L)))
    val batchB = frame(Seq(("2024-01-01", "k1", 7L),
      ("2024-01-03", "k3", 2L)))
    def shape(n: String) = rows(spark.table(n).select("d", "k", "v"))
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val want = Seq(("2024-01-01", "k1", 17L), ("2024-01-02", "k2", 5L),
      ("2024-01-03", "k3", 2L))
    for (n <- Seq("mz_agg_clean", "mz_agg_crash")) {
      Materialize.dropAggState(spark, n)
      Materialize.aggIncremental(spark, n, batchA, Seq("d", "k"), "d",
        "A")
    }
    // clean apply = the reference final state
    Materialize.aggIncremental(spark, "mz_agg_clean", batchB,
      Seq("d", "k"), "d", "B")
    assert(shape("mz_agg_clean") == want)
    // crash state: only the 2024-01-01 slice of batch B committed,
    // then the FULL batch replays under the SAME id — the overlap
    // slice must not double-count (the pre-r9 failure mode: 24)
    Materialize.aggIncremental(spark, "mz_agg_crash",
      batchB.filter(col("d") === "2024-01-01"), Seq("d", "k"), "d", "B")
    Materialize.aggIncremental(spark, "mz_agg_crash", batchB,
      Seq("d", "k"), "d", "B")
    assert(shape("mz_agg_crash") == want)
    // plain duplicate apply of a committed batch is a content no-op
    Materialize.aggIncremental(spark, "mz_agg_clean", batchB,
      Seq("d", "k"), "d", "B")
    assert(shape("mz_agg_clean") == want)
    // and a genuinely NEW batch still merges additively
    Materialize.aggIncremental(spark, "mz_agg_clean",
      frame(Seq(("2024-01-01", "k1", 3L))), Seq("d", "k"), "d", "C")
    assert(shape("mz_agg_clean").head == ("2024-01-01", "k1", 20L))
    Seq("mz_agg_clean", "mz_agg_crash")
      .foreach(n => Materialize.dropAggState(spark, n))
  }

  test("checkpointPartials bounds recompute input: history folds to " +
      "one slice, newer batches survive, content never moves") {
    // the O(#batches) growth path: a streaming ingest that touches
    // today's partition EVERY batch makes the partition's recompute
    // read one stored row-set per batch forever — unless folded
    val n = "mz_agg_ckpt"
    val partials = s"${n}__partials"
    Materialize.dropAggState(spark, n)
    def frame(xs: Seq[(String, String, Long)]) =
      xs.toDF("d", "k", "v").withColumn("d", col("d").cast("date"))
    def slicesOf(d: String): Set[String] =
      rows(spark.table(partials).filter(col("d") === d)
        .select("__batch").distinct()).map(_.getString(0)).toSet
    def agg(): Seq[(String, String, Long)] =
      rows(spark.table(n).select("d", "k", "v"))
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2))
    // 5 batches, every one touching 2024-01-01; b000 also seeds -02
    for (i <- 0 until 5)
      Materialize.aggIncremental(spark, n,
        frame(Seq(("2024-01-01", "k1", 10L + i)) ++
          (if (i == 0) Seq(("2024-01-02", "k2", 5L)) else Nil)),
        Seq("d", "k"), "d", f"b$i%03d")
    val want = Seq(("2024-01-01", "k1", 60L), ("2024-01-02", "k2", 5L))
    assert(agg() == want)
    assert(slicesOf("2024-01-01").size == 5)
    // fold everything below b003: the recompute input for -01 is now
    // 1 (fold) + 2 (surviving batches) row-sets, not 5
    val affected = Materialize.checkpointPartials(spark, n,
      Seq("d", "k"), "d", "b003")
    assert(affected.map(_.toString).toSet ==
      Set("2024-01-01", "2024-01-02"))
    assert(slicesOf("2024-01-01") == Set("#ckpt_b003", "b003", "b004"))
    assert(slicesOf("2024-01-02") == Set("#ckpt_b003"))
    assert(agg() == want, "checkpoint moved the published aggregate")
    // replaying the same checkpoint is a metadata-only no-op
    assert(Materialize.checkpointPartials(spark, n,
      Seq("d", "k"), "d", "b003").isEmpty)
    assert(slicesOf("2024-01-01") == Set("#ckpt_b003", "b003", "b004"))
    // a post-fold increment recomputes from the folded state correctly
    Materialize.aggIncremental(spark, n,
      frame(Seq(("2024-01-01", "k1", 3L))), Seq("d", "k"), "d", "b005")
    val want2 = Seq(("2024-01-01", "k1", 63L), ("2024-01-02", "k2", 5L))
    assert(agg() == want2)
    // a LATER checkpoint folds the earlier fold in: one slice remains
    Materialize.checkpointPartials(spark, n, Seq("d", "k"), "d", "b006")
    assert(slicesOf("2024-01-01") == Set("#ckpt_b006"))
    assert(agg() == want2)
    // and the folded state still recomputes to the full aggregate
    Materialize.aggIncremental(spark, n,
      frame(Seq(("2024-01-01", "k1", 2L))), Seq("d", "k"), "d", "b007")
    assert(agg() == Seq(("2024-01-01", "k1", 65L),
      ("2024-01-02", "k2", 5L)))
    Materialize.dropAggState(spark, n)
  }

  test("checkpointPartials stages all partitions in one distributed " +
      "write: fold jobs scale 1-per-partition, not stage+merge each") {
    val n = "mz_agg_ckpt_wide"
    Materialize.dropAggState(spark, n)
    def frame(xs: Seq[(String, String, Long)]) =
      xs.toDF("d", "k", "v").withColumn("d", col("d").cast("date"))
    val days = (1 to 8).map(i => f"2024-02-$i%02d")
    for (b <- 0 until 4)
      Materialize.aggIncremental(spark, n,
        frame(days.map(d => (d, "k1", 10L + b))), Seq("d", "k"), "d",
        f"b$b%03d")
    // job-group accounting (thread-local, so only this fold's jobs):
    // the maintenance-window contract (r13) is ONE distributed
    // merge-and-write plus ONE batched drop — O(1) commands in the
    // partition count. The bound below still admits the pre-r13
    // one-commit-per-partition shape; the partitions-axis ScaleBench
    // row is the regression signal for the O(1) claim itself.
    val sc = spark.sparkContext
    sc.setJobGroup("ckpt_job_count", "fold job accounting", false)
    val affected =
      try Materialize.checkpointPartials(spark, n, Seq("d", "k"), "d",
        "b003")
      finally sc.clearJobGroup()
    assert(affected.size == 8)
    val jobs = sc.statusTracker.getJobIdsForGroup("ckpt_job_count").length
    assert(jobs <= affected.size + 8,
      s"fold ran $jobs jobs for ${affected.size} partitions")
    // every partition folded to the synthetic slice + the surviving b003
    val slices = rows(spark.table(s"${n}__partials")
      .select("d", "__batch").distinct())
      .map(r => (r.getDate(0).toString, r.getString(1)))
    assert(slices.groupBy(_._1).values
      .forall(_.map(_._2).toSet == Set("#ckpt_b003", "b003")))
    // and the published aggregate never moved (10+11+12+13 per day)
    val agg = rows(spark.table(n).select("d", "k", "v"))
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    assert(agg.toSet == days.map(d => (d, "k1", 46L)).toSet)
    Materialize.dropAggState(spark, n)
  }

  test("checkpointPartials folds any partition value — quotes " +
      "included — through the batched quoted drop") {
    // pre-r13 the fold interpolated partition values into per-partition
    // INSERT OVERWRITE statements and had to REJECT values outside a
    // safe charset; the batched dropPartitions helper escapes centrally,
    // so a quoted value now folds like any other
    val n = "mz_agg_ckpt_badval"
    Materialize.dropAggState(spark, n)
    Materialize.aggIncremental(spark, n,
      Seq(("ok_val", "k1", 1L), ("bad'val", "k1", 2L)).toDF("p", "k", "v"),
      Seq("p", "k"), "p", "b000")
    Materialize.aggIncremental(spark, n,
      Seq(("ok_val", "k1", 3L), ("bad'val", "k1", 5L)).toDF("p", "k", "v"),
      Seq("p", "k"), "p", "b001")
    val affected =
      Materialize.checkpointPartials(spark, n, Seq("p", "k"), "p", "b001")
    assert(affected.toSet == Set("ok_val", "bad'val"))
    // both partitions folded: one synthetic slice + the surviving b001,
    // with the quoted partition's absorbed slice physically dropped
    val slices = rows(spark.table(s"${n}__partials")
      .select("p", "__batch").distinct())
      .map(r => (r.getString(0), r.getString(1)))
    assert(slices.groupBy(_._1).values
      .forall(_.map(_._2).toSet == Set("#ckpt_b001", "b001")))
    val out = Materialize.aggIncremental(spark, n,
      Seq(("ok_val", "k1", 4L)).toDF("p", "k", "v"),
      Seq("p", "k"), "p", "b002", foldEvery = 1)
    assert(rows(out.select("p", "k", "v"))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("ok_val", "k1", 8L), ("bad'val", "k1", 7L)))
    Materialize.dropAggState(spark, n)
  }

  test("a crash between the fold's two commits is invisible to " +
      "readers and converges on replay") {
    // the r13 fold protocol: commit 1 writes the synthetic slices,
    // commit 2 drops the absorbed originals. This case manufactures
    // the mid-crash state — checkpoint AND originals both present —
    // and requires (a) the recompute reads the CONVERGED content (the
    // visibleSlices watermark hides absorbed rows), (b) a replayed
    // fold finishes the drop and changes no content
    val n = "mz_agg_ckpt_crash"
    Materialize.dropAggState(spark, n)
    def frame(xs: Seq[(String, String, Long)]) =
      xs.toDF("d", "k", "v")
    Materialize.aggIncremental(spark, n,
      frame(Seq(("d1", "k1", 10L), ("d2", "k1", 1L))), Seq("d", "k"),
      "d", "b000")
    Materialize.aggIncremental(spark, n,
      frame(Seq(("d1", "k1", 20L))), Seq("d", "k"), "d", "b001")
    // manufacture commit-1-only state: append the synthetic slice the
    // fold WOULD write (sum of the sub-watermark slices), keep b000
    val partials = s"${n}__partials"
    Seq(("d1", "k1", 10L, "#ckpt_b001"), ("d2", "k1", 1L, "#ckpt_b001"))
      .toDF("d", "k", "v", "__batch")
      .select(spark.table(partials).columns.map(col): _*)
      .write.mode("append").insertInto(partials)
    spark.catalog.refreshTable(partials)
    // (a) a batch through the apply in this state must NOT double-count
    // the absorbed b000 rows: d1 = 10+20+5, d2 untouched = 1
    val out = Materialize.aggIncremental(spark, n,
      frame(Seq(("d1", "k1", 5L))), Seq("d", "k"), "d", "b002")
    assert(rows(out.select("d", "k", "v"))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("d1", "k1", 35L), ("d2", "k1", 1L)))
    // (b) the replayed fold finishes the drop: b000 gone, content same
    Materialize.checkpointPartials(spark, n, Seq("d", "k"), "d", "b001")
    val batches = rows(spark.table(partials).select("d", "__batch")
      .distinct()).map(r => (r.getString(0), r.getString(1))).toSet
    assert(!batches.exists(_._2 == "b000"), batches.toString)
    val recheck = Materialize.aggIncremental(spark, n,
      frame(Seq(("d2", "k1", 2L))), Seq("d", "k"), "d", "b003")
    assert(rows(recheck.select("d", "k", "v"))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("d1", "k1", 35L), ("d2", "k1", 3L)))
    Materialize.dropAggState(spark, n)
  }

  test("compact reconciles cross-partition movers to full-rebuild dedup") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    // versioned rows: key, unique version ts, value, partition
    val logGen: Gen[List[(String, String)]] =
      Gen.listOfN(40, for {
        key <- Gen.oneOf("k0", "k1", "k2", "k3", "k4", "k5")
        part <- Gen.oneOf("2024-01-01", "2024-01-02", "2024-01-03")
      } yield (key, part))
    for ((log, caseId) <- samples(logGen, 4).zipWithIndex) {
      val name = s"mz_compact_$caseId"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      graft.sources.Ingest.deletePath(spark,
        s"/tmp/graft_test_warehouse/$name")
      val versioned = log.zipWithIndex
        .map { case ((k, d), i) => (k, i.toLong, s"v$i", d) }
      // four incremental batches in version order — later batches that
      // give a key a NEW partition leave the old version stranded
      versioned.grouped(10).foreach { batch =>
        Materialize.tableIncremental(spark, name,
          batch.toDF("k", "ts", "v", "d"), Seq("k"), "ts", "d")
      }
      val affected = Materialize.compact(spark, name, Seq("k"), "ts", "d")
      val full = graft.stage.Staging.dedupLatest(
        versioned.toDF("k", "ts", "v", "d"), Seq("k"), col("ts"))
      def shape(d: org.apache.spark.sql.DataFrame) =
        rows(d.select("k", "ts", "v", "d")).map(_.toSeq)
          .sortBy(_.mkString("|"))
      assert(shape(spark.table(name)) == shape(full),
        s"case $caseId: compacted table != full-rebuild dedup")
      // idempotent: a second pass finds nothing to rewrite
      assert(Materialize.compact(spark, name, Seq("k"), "ts", "d").isEmpty)
      spark.sql(s"DROP TABLE $name")
    }
  }

  test("payments: sampled with replacement, derived money math exact") {
    val orgs = Generate.orgs(spark, 10, 42)
    val users = Generate.users(spark, orgs, 100, 42)
    val products = Generate.products(spark, 20, 42)
    val orders = Generate.orders(spark, users, products, 1000, 42)
    val pays = Generate.payments(orders, 1.5, 42).cache()
    // with-replacement at fraction>1 must produce multi-charge orders
    assert(pays.groupBy("order_id").count().filter($"count" > 1)
      .count() > 0)
    // charge ids remain unique even for repeated orders
    assert(pays.groupBy("charge_id").count().filter($"count" > 1).isEmpty)
    // fee = 3% of amount exactly, in decimal
    val badFee = pays.filter(
      $"fee_amount" =!= ($"amount" * lit(BigDecimal("0.03")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
    assert(badFee.isEmpty)
    // raw_payload parses and carries the gateway key
    assert(pays.filter(
      get_json_object($"raw_payload", "$.gateway") =!= "Stripe").isEmpty)
  }
}
