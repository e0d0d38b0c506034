package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.sources.Tables

/** Reader-contract armor for the events fixture: whatever physical
  * encoding the generator emits for `ts`, `Tables.events` must yield
  * session-zoned TimestampType with the SAME instants. The fixture has
  * already drifted twice (TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
  * isAdjustedToUTC=false)); this spec synthesizes every encoding the
  * reader claims to handle so the next drift fails here, by name. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val Micros = 1705314600123456L // 2024-01-15 10:30:00.123456 UTC

  private def readBack(dir: String): (Long, Boolean) = {
    val ev = Tables.events(spark, dir)
    val inst = ev.select(unix_micros(col("ts"))).head().getLong(0)
    (inst, ev.schema("ts").dataType == TimestampType)
  }

  test("nanos-as-long, NTZ micros, and adjusted micros all normalize " +
      "to TimestampType with identical instants") {
    val base = s"/tmp/graft_test_ts_enc_${java.util.UUID.randomUUID()}"

    // (a) INT64 nanos — the pre-r6 fixture shape (read via the legacy
    // nanosAsLong flag as a plain long, then truncated to micros)
    Seq((1L, Micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$base/a/events.parquet")

    // (b) TIMESTAMP_NTZ micros — the r6 drift that broke 6 queries
    Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(Micros)).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$base/b/events.parquet")

    // (c) session-zoned TimestampType — the contract type itself
    Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(Micros)))
      .write.mode("overwrite").parquet(s"$base/c/events.parquet")

    for (enc <- Seq("a", "b", "c")) {
      val (inst, isTs) = readBack(s"$base/$enc")
      assert(isTs, s"encoding $enc: ts is not TimestampType")
      assert(inst == Micros,
        s"encoding $enc: instant drifted ($inst != $Micros)")
    }
  }
}
