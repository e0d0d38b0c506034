package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Stream/batch parity: the streaming rollup over a file source must
  * equal the batch aggregate over the same rows. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("dailyRollupAvailableNow equals the batch rollup") {
    val path = "/tmp/graft_test_stream_events"
    graft.sources.Ingest.deletePath(spark, path)
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (2L, "2024-01-01 11:00:00", 5.5),
      (3L, "2024-01-02 09:00:00", 2.25))
      .toDF("event_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    ev.write.mode("overwrite").parquet(path)
    val streamed = rows(Streaming.dailyRollupAvailableNow(spark, path)
      .orderBy("day"))
      .map(r => (r.getAs[Any]("day").toString.take(10),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(streamed == Seq(
      ("2024-01-01", 2L, 15.5), ("2024-01-02", 1L, 2.25)))
    val batch = rows(Streaming.dailyRollup(ev).orderBy("day"))
      .map(r => (r.getAs[Any]("day").toString.take(10),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(batch == streamed)
  }

  test("stateful sessionizeStream matches batch sessionize") {
    import graft.operators.Marts
    val path = "/tmp/graft_test_stream_sessions"
    graft.sources.Ingest.deletePath(spark, path)
    // two users; sessions split by >30-min gaps; a far-future sentinel
    // per user closes the last real session within AvailableNow
    val real = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (1L, "2024-01-01 11:30:00"),
      (2L, "2024-01-01 09:00:00"),
      (2L, "2024-01-01 09:45:00"), (2L, "2024-01-01 09:50:00"))
    val sentinel = Seq((1L, "2024-03-01 00:00:00"),
      (2L, "2024-03-01 00:00:00"))
    (real ++ sentinel).toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(path)
    val stream = spark.readStream
      .schema(spark.read.parquet(path).schema).parquet(path)
    val out = graft.streaming.Streaming.sessionizeStream(stream, 30)
    val sink = s"sess_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = rows(spark.table(sink)
      .select("user_id", "session_id", "n_events", "session_start",
        "session_end").orderBy("user_id", "session_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
    val batch = rows(Marts.sessionize(
      real.toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp")),
      "user_id", "ts", col("ts"), 30)
      .select("user_id", "session_id", "n_events", "session_start",
        "session_end").orderBy("user_id", "session_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
    assert(streamed == batch)
  }

  test("sessionize family: q17 window-arithmetic, q50 streaming state " +
      "and q70 session_window agree frame-for-frame") {
    // the three paths compute the same 30-minute-gap sessions three
    // ways; each is oracle-green separately, but a drift in ONE path
    // must fail against its siblings here, not just against DuckDB
    val dir = "/root/testdata/sf0.001"
    def canon(df: org.apache.spark.sql.DataFrame) =
      rows(df.select("user_id", "n_events", "session_start",
        "session_end").orderBy("user_id", "session_start"))
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getTimestamp(3)))
    val batch = canon(graft.queries.Warehouse.q17.fn(spark, dir))
    val builtin = canon(graft.queries.Warehouse.q70.fn(spark, dir))
    val streamed = canon(graft.queries.Pipeline.q50.fn(spark, dir))
    assert(batch.nonEmpty)
    assert(batch == builtin,
      "q17 (window arithmetic) vs q70 (session_window) drifted")
    assert(batch == streamed,
      "q17 (batch) vs q50 (flatMapGroupsWithState) drifted")
  }

  test("foreachBatch upserts micro-batches into the incremental table") {
    val base = "/tmp/graft_test_stream_inc_src"
    val ckpt = "/tmp/graft_test_stream_inc_ckpt"
    graft.sources.Ingest.deletePath(spark, base)
    graft.sources.Ingest.deletePath(spark, ckpt)
    spark.sql("DROP TABLE IF EXISTS stream_inc")
    graft.sources.Ingest.deletePath(spark,
      "/tmp/graft_test_warehouse/stream_inc")
    def writeBatch(xs: Seq[(String, String, String, String)],
        mode: String) =
      xs.toDF("k", "ts", "v", "d")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("d", col("d").cast("date"))
        .coalesce(1).write.mode(mode).parquet(base)
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(base).schema).parquet(base)
      val q = graft.streaming.Streaming.streamIntoIncremental(
        stream, "stream_inc", Seq("k"), "ts", "d", ckpt)
      q.awaitTermination()
    }
    writeBatch(Seq(("k1", "2024-01-01 10:00:00", "v1", "2024-01-01")),
      "overwrite")
    run()
    // second batch: update for k1 (same partition) + a new key/partition;
    // the checkpoint makes run 2 process ONLY the new file
    writeBatch(Seq(
      ("k1", "2024-01-01 12:00:00", "v2", "2024-01-01"),
      ("k2", "2024-01-02 08:00:00", "w1", "2024-01-02")), "append")
    run()
    val got = rows(spark.table("stream_inc").orderBy("k"))
      .map(r => (r.getString(0), r.getString(2)))
    assert(got == Seq(("k1", "v2"), ("k2", "w1")))
    // deduped at rest: no stale k1/v1 row survives the merge
    assert(spark.table("stream_inc").count() == 2)
    spark.sql("DROP TABLE stream_inc")
  }

  test("fold cadence bounds partials slices under a many-batch ingest; " +
      "the final aggregate is identical to the unfolded run") {
    import graft.sources.Materialize
    val src = "/root/testdata/sf0.001/events.parquet"
    val cut = "2024-01-15 12:00:00"
    val folded = "stream_agg_folded"
    val unfolded = "stream_agg_unfolded"
    Seq(folded, unfolded).foreach(Materialize.dropAggState(spark, _))
    // 10 hash-spread micro-batches: every batch touches ~every day, so
    // an unfolded ingest grows every day-partition's recompute input
    // O(#batches) — the exact q127/q201 growth path the cadence bounds
    graft.streaming.Streaming.streamIntoAggIncremental(
      spark, src, folded, cut, splits = 10, foldEvery = 4)
    graft.streaming.Streaming.streamIntoAggIncremental(
      spark, src, unfolded, cut, splits = 10, foldEvery = 0)
    def sliceIds(n: String): Seq[(String, String)] =
      rows(spark.table(s"${n}__partials")
        .select("day", "__batch").distinct())
        .map(r => (r.get(0).toString, r.getString(1)))
    val slices = sliceIds(folded)
    val perDay = slices.groupBy(_._1).map(_._2.length)
    assert(perDay.max <= 4, s"worst day holds ${perDay.max} slices")
    assert(slices.exists(_._2.startsWith("#ckpt_")), "no fold ever ran")
    // the unfolded control really did grow past the cadence bound
    assert(sliceIds(unfolded).groupBy(_._1).map(_._2.length).max > 4)
    // the fold is content-invisible: both runs land identical state
    def shape(n: String) = rows(spark.table(n)
        .select("day", "event_type", "n_events", "value_sum"))
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDecimal(3)))
      .toSet
    assert(shape(folded) == shape(unfolded))
    Seq(folded, unfolded).foreach(Materialize.dropAggState(spark, _))
  }

  test("watermark drops rows later than the lateness bound (ST2)") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "/tmp/graft_test_stream_late"
    val ckpt = "/tmp/graft_test_stream_late_ckpt"
    graft.sources.Ingest.deletePath(spark, base)
    graft.sources.Ingest.deletePath(spark, ckpt)
    def writeBatch(rows: Seq[(Long, String, Double)], mode: String) =
      rows.toDF("event_id", "ts", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode(mode).parquet(base)
    val out = "/tmp/graft_test_stream_late_out"
    graft.sources.Ingest.deletePath(spark, out)
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(base).schema).parquet(base)
      val q = graft.streaming.Streaming
        .watermarkedDailyRollup(stream, "1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append") // append: only watermark-finalized windows
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: fresh Jan 10 events -> checkpointed watermark Jan 10 11:00
    writeBatch(Seq((1L, "2024-01-10 12:00:00", 5.0),
      (2L, "2024-01-10 13:00:00", 7.0)), "overwrite")
    run()
    // run 2 (checkpoint-recovered): a 5-days-late straggler (behind
    // the watermark) plus one fresh event
    writeBatch(Seq((3L, "2024-01-05 00:00:00", 100.0),
      (4L, "2024-01-10 13:30:00", 1.0)), "append")
    run()
    // run 3: a far-future event pushes the watermark past Jan 10,
    // finalizing its window into the append sink
    writeBatch(Seq((5L, "2024-01-20 00:00:00", 0.5)), "append")
    run()
    val got = rows(spark.read.parquet(out))
      .map(r => (r.getAs[java.sql.Timestamp]("day").toString.take(10),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      .sorted
    // Jan 10 finalized WITHOUT the dropped straggler; no Jan 5 window
    // ever existed; Jan 20 never finalized (watermark never passed it)
    assert(got == Seq(("2024-01-10", 3L, 13.0)), s"got $got")
  }

  test("watermarkedDailyRollup builds a valid streaming plan") {
    // plan-level check: watermark attaches and the aggregate analyzes
    val ev = Seq((1L, "2024-01-01 10:00:00", 1.0))
      .toDF("event_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val plan = Streaming.watermarkedDailyRollup(ev, "2 hours")
    assert(plan.schema.fieldNames.toSeq ==
      Seq("day", "n_events", "total_value"))
  }

  test("sessionizer state survives a checkpointed restart and " +
      "stitches the boundary session") {
    // The operational recovery story for ST5/q50: a stateful query
    // stopped mid-stream (deploy, crash, rescale) must resume from
    // its checkpoint with (a) source offsets intact — already-read
    // files are not reprocessed — and (b) the flatMapGroupsWithState
    // state restored, so a session OPEN across the stop/start boundary
    // is stitched into one session, not split or truncated. If state
    // did not carry, user 1's session would come back as n_events=1
    // (only the post-restart event); if offsets did not carry, the
    // run would double-fold the phase-1 rows.
    val base = "/tmp/graft_test_stream_restart"
    graft.sources.Ingest.deletePath(spark, base)
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    def stage(xs: Seq[(Long, String)]): Unit =
      xs.toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(src)
    // phase 1: user 1 has an OPEN 2-event session; user 2 one event
    stage(Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (2L, "2024-01-01 09:00:00")))
    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = Streaming.sessionizeStream(stream, 30)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    // no session closed yet — everything is in state, nothing emitted
    assert(spark.read.parquet(out).count() == 0)
    // phase 2 (after the "restart"): an event WITHIN the gap extends
    // user 1's open session; far-future sentinels close everything
    stage(Seq((1L, "2024-01-01 10:20:00"),
      (1L, "2024-03-01 00:00:00"), (2L, "2024-03-01 00:00:00")))
    runOnce()
    val got = rows(spark.read.parquet(out)
      .select("user_id", "session_id", "n_events", "session_start",
        "session_end").orderBy("user_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
    assert(got == Seq(
      (1L, 1L, 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00")),
      (2L, 1L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"))))
  }

  test("oncePerBatch applies a committed batchId exactly once on replay") {
    val ckpt = s"/tmp/graft_test_once_${java.util.UUID.randomUUID()}"
    var applied = 0
    Streaming.oncePerBatch(spark, ckpt, 7L) { applied += 1 }
    // at-least-once replay of the SAME batchId: the marker short-circuits
    Streaming.oncePerBatch(spark, ckpt, 7L) { applied += 1 }
    assert(applied == 1)
    // a different batchId under the same checkpoint still applies
    Streaming.oncePerBatch(spark, ckpt, 8L) { applied += 1 }
    assert(applied == 2)
    // a DIFFERENT checkpoint is a different replay scope: batch ids
    // restart at 0 there, so its batch 7 must apply independently
    val ckpt2 = s"/tmp/graft_test_once_${java.util.UUID.randomUUID()}"
    Streaming.oncePerBatch(spark, ckpt2, 7L) { applied += 1 }
    assert(applied == 3)
  }

  test("oncePerBatch marker-after-body window: crash before marker replays") {
    // Documents the residual at-least-once window: the marker is written
    // AFTER the body commits, so a crash between body and marker leaves
    // no marker and the replay re-runs the body. This is the accepted
    // floor without a transactional sink — callers' bodies are additive
    // merges whose double-apply window is exactly this crash slice.
    val ckpt = s"/tmp/graft_test_once_${java.util.UUID.randomUUID()}"
    var applied = 0
    intercept[RuntimeException] {
      Streaming.oncePerBatch(spark, ckpt, 1L) {
        applied += 1
        throw new RuntimeException("crash before marker")
      }
    }
    assert(applied == 1)
    // no marker was written → the replay applies the body again
    Streaming.oncePerBatch(spark, ckpt, 1L) { applied += 1 }
    assert(applied == 2)
    // and now the marker exists → further replays are no-ops
    Streaming.oncePerBatch(spark, ckpt, 1L) { applied += 1 }
    assert(applied == 2)
  }
}
