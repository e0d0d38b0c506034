package graft

import org.apache.spark.sql.functions._
import graft.operators.{Marts, Ranking}

/** Mart operators: funnel ordering edges, sessionization gap boundary,
  * reconciliation exactness, late-arrival, distributed ranking. */
class MartsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, String, String)*) =
    rows.toSeq.toDF("user", "etype", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("funnel: stage counts only when hit strictly after previous conversion") {
    val events = ev(
      // u1 completes all 4 in order
      ("u1", "s0", "2024-01-01 00:00:00"),
      ("u1", "s1", "2024-01-01 01:00:00"),
      ("u1", "s2", "2024-01-01 02:00:00"),
      ("u1", "s3", "2024-01-01 03:00:00"),
      // u2: s1 BEFORE s0 -> converts s0 only
      ("u2", "s1", "2024-01-01 00:00:00"),
      ("u2", "s0", "2024-01-01 01:00:00"),
      // u3: s0 and s1 at the SAME instant -> not strictly after
      ("u3", "s0", "2024-01-01 00:00:00"),
      ("u3", "s1", "2024-01-01 00:00:00"),
      // u4 skips s1: s2 cannot count without s1
      ("u4", "s0", "2024-01-01 00:00:00"),
      ("u4", "s2", "2024-01-01 01:00:00"))
    val out = Marts.funnel(events, "user", "etype", "ts",
      Seq("s0", "s1", "s2", "s3"))
    val got = rows(out.orderBy("stage_index")).map(_.getAs[Long]("users"))
    assert(got == Seq(4L, 1L, 1L, 1L))
  }

  test("sessionize: gap strictly over threshold starts a new session") {
    val events = Seq(
      ("u1", "2024-01-01 00:00:00", 1L),
      ("u1", "2024-01-01 00:30:00", 2L), // exactly 30 min -> SAME session
      ("u1", "2024-01-01 01:00:01", 3L)) // 30m01s -> new session
      .toDF("user", "ts", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Marts.sessionize(events, "user", "ts", col("eid"), 30)
    val got = rows(out.orderBy("session_id"))
      .map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events")))
    assert(got == Seq((1L, 2L), (2L, 1L)))
  }

  test("reconcile: decimal-exact diff classification") {
    val orders = Seq((1L, 10.00), (2L, 20.00), (3L, 5.00))
      .toDF("ok", "total")
    val lines = Seq((1L, 10.00), (2L, 19.98)) // order 3 has no lines
      .toDF("lk", "amount")
    val out = Marts.reconcile(orders, lines, "ok", "lk",
      col("total"), graft.functions.Functions.money(col("amount")), "0.01")
    val r = rows(out).head
    assert(r.getAs[Long]("n_orders") == 3)
    assert(r.getAs[Long]("n_missing_lines") == 1)
    assert(r.getAs[Long]("n_mismatch") == 2) // 0.02 diff + missing 5.00
    assert(r.getAs[Double]("total_abs_diff") == 5.02)
  }

  test("lateArrivalRate counts events past the threshold") {
    val df = Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:00:05"),
      ("2024-01-01 00:00:00", "2024-01-01 02:00:00"))
      .toDF("ets", "rts")
      .withColumn("ets", col("ets").cast("timestamp"))
      .withColumn("rts", col("rts").cast("timestamp"))
    val r = rows(Marts.lateArrivalRate(df, col("ets"), col("rts"), 60)).head
    assert(r.getAs[Long]("n_late") == 1)
    assert(r.getAs[Double]("late_rate") == 0.5)
  }

  test("withGlobalRank matches single-partition window rank, ties included") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 83).toDouble))
      .toDF("id", "v") // 83 distinct values over 500 rows -> many ties
    val expected = df.withColumn("r",
      rank().over(Window.orderBy(col("v").desc)))
    val got = Ranking.withGlobalRank(df, col("v").desc, "r", 7)
    val em = rows(expected)
      .map(r => r.getLong(0) -> r.getAs[Int]("r").toLong).toMap
    val gm = rows(got).map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    assert(em == gm)
  }

  test("withRunningTotal matches single-partition exclusive window sum") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong * 3 % 501, (i % 7 + 1).toLong))
      .toDF("id", "w") // ids unique but unordered across partitions
    val expected = df.withColumn("rt",
      coalesce(sum(col("w")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val got = Ranking.withRunningTotal(df, col("id").asc, col("w"), "rt", 7)
    val em = rows(expected)
      .map(r => r.getLong(0) -> r.getAs[Long]("rt")).toMap
    val gm = rows(got).map(r => r.getLong(0) -> r.getAs[Long]("rt")).toMap
    assert(em == gm)
  }

  test("markov attribution: removal effects on a hand-solvable chain " +
      "are exact fixed-point values") {
    // u1: view -> purchase; u2: view -> click (no conversion);
    // u3: purchase immediately (empty journey, start -> conversion)
    val ev = Seq(
      (1L, "view", "2024-01-01 01:00:00", 1L),
      (1L, "purchase", "2024-01-01 02:00:00", 2L),
      (2L, "view", "2024-01-01 01:00:00", 3L),
      (2L, "click", "2024-01-01 02:00:00", 4L),
      (3L, "purchase", "2024-01-01 01:00:00", 5L))
      .map { case (u, t, tss, id) => (u, t, ts(tss), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val (res, nConv) = Marts.markovRemovalEffects(ev, "user_id",
      "event_type", "ts", col("event_id"), "purchase",
      Seq("view", "click"), 8)
    assert(nConv == 2L)
    // chain: start ->(2/3) view ->(1/2) conversion, start ->(1/3) conv
    // base cvr = 1/3 + (2/3)(1/2) = 2/3; removing view leaves 1/3;
    // removing click changes nothing (its path never converts)
    val S = 1000000000000L
    assert(res == Seq(
      ("view", 2 * (S / 3), S / 3, S / 3),
      ("click", 2 * (S / 3), 2 * (S / 3), 0L)))
  }

  test("topShare: exact percent-rank cut on distinct values") {
    // values 999 down to 900 -> top 5% of 100 keys = ranks 1..5
    val df = (1 to 100).map(i => (i.toLong, (1000 - i).toDouble))
      .toDF("k", "amt")
    val r = rows(Marts.topShare(df, "k", col("amt"), 0.05)).head
    assert(r.getAs[Long]("top_n") == 5)
    assert(r.getAs[Double]("top_revenue") == 999.0 + 998 + 997 + 996 + 995)
    assert(r.getAs[Double]("total_revenue") == (900 to 999).sum.toDouble)
  }
}
