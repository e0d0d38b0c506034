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

  test("watermarkedDailyRollup builds a valid streaming plan") {
    // plan-level check: watermark attaches and the aggregate analyzes
    val ev = Seq((1L, "2024-01-01 10:00:00", 1.0))
      .toDF("event_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val plan = Streaming.watermarkedDailyRollup(ev, "2 hours")
    assert(plan.schema.fieldNames.toSeq ==
      Seq("day", "n_events", "total_value"))
  }
}
