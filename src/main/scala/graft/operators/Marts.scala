package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** Mart-layer operators the reference declares (reference `README.md:9,
  * 38-40`: "revenue, funnel, operations, attribution marts", anomaly
  * detection) plus its custom DQ aggregates (`README.md:56-57`).
  *
  * All are `DataFrame => DataFrame` compositions of built-in operators;
  * every aggregate is partial-aggregatable, every window is a single
  * shuffle on its partition key.
  */
object Marts {

  /** Sequential funnel (SURVEY W3): for each ordered stage, a user
    * converts iff they hit that stage strictly after their conversion
    * time for the previous stage. Returns (stage_index, stage, users).
    *
    * One shuffle on user (conditional min-aggregation per stage), then a
    * tiny rollup — no joins, no re-scan per stage. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    // per-user min ts per stage, as stage_0..stage_k columns
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(stages.zipWithIndex.map { case (s, i) =>
        min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i")
      }.head, stages.zipWithIndex.tail.map { case (s, i) =>
        min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i")
      }: _*)
    // conversion time at stage i = first hit strictly after stage i-1 conv;
    // with min-ts semantics this telescopes: conv_i valid iff t_i > conv_{i-1}
    val withConv = stages.indices.tail.foldLeft(
      perUser.withColumn("__c0", col("__t0"))) { (d, i) =>
      d.withColumn(s"__c$i",
        when(col(s"__c${i - 1}").isNotNull &&
          col(s"__t$i") > col(s"__c${i - 1}"), col(s"__t$i")))
    }
    val counts = withConv.agg(
      sum(when(col("__c0").isNotNull, 1).otherwise(0)).cast("long").as("s0"),
      stages.indices.tail.map(i =>
        sum(when(col(s"__c$i").isNotNull, 1).otherwise(0))
          .cast("long").as(s"s$i")): _*)
    val legs = stages.zipWithIndex.map { case (s, i) =>
      counts.select(lit(i).as("stage_index"), lit(s).as("stage"),
        col(s"s$i").as("users"))
    }
    legs.reduce(_ unionByName _)
  }

  /** First/last-touch attribution (SURVEY W4): per user, the first and
    * last event type over the full history (explicit full frame for
    * last_value), then counts per (first_touch, last_touch) path. */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, tieBreak.asc)
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events
      .withColumn("first_touch", first(col(typeCol)).over(full))
      .withColumn("last_touch", last(col(typeCol)).over(full))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("users"))
  }

  /** Multi-touch attribution (reference `README.md:40` "attribution
    * marts", plural — position-only first/last touch is the minimum
    * form): LINEAR (every pre-conversion touch gets 1/n of the
    * conversion credit) and TIME-DECAY (touch weight halves per day of
    * distance from the conversion) per channel.
    *
    * Determinism contract (cross-engine hash-comparable, like every
    * money metric here): decay weights are 0.5^(integer day delta,
    * capped) — exact binary fractions whose sums are EXACT in double,
    * so per-user normalizers are order-independent; each per-user
    * share is one double division, then rounded and cast to decimal so
    * the cross-user credit sum is an exact decimal sum, never a
    * double accumulation.
    *
    * Scale shape: one aggregate finds each user's first conversion,
    * one join bounds touches to pre-conversion rows, and every
    * aggregate/join in the pipeline keys on the user column — a single
    * shuffle family, no windows, map-side combinable throughout. */
  def multiTouchAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, convType: String,
      decayCapDays: Int = 40): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__conv_ts"))
    val touches = events.join(conv, userCol)
      .filter(col(tsCol) < col("__conv_ts"))
      .withColumn("__w", pow(lit(0.5),
        least(datediff(to_date(col("__conv_ts")), to_date(col(tsCol))),
          lit(decayCapDays))))
    val perChannel = touches
      .groupBy(col(userCol), col(typeCol).as("channel"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__w")).as("__wch"))
    val perUser = perChannel.groupBy(col(userCol))
      .agg(sum(col("__cnt")).as("__n"), sum(col("__wch")).as("__sumw"))
    val shareType = org.apache.spark.sql.types.DecimalType(28, 14)
    perChannel.join(perUser, userCol)
      .select(col("channel"), col("__cnt"),
        round(col("__cnt").cast("double") / col("__n"), 9)
          .cast(shareType).as("__lin"),
        round(col("__wch") / col("__sumw"), 9).cast(shareType).as("__dec"))
      .groupBy(col("channel"))
      .agg(sum(col("__cnt")).cast("long").as("n_touches"),
        round(sum(col("__lin")).cast("double"), 6).as("linear_credit"),
        round(sum(col("__dec")).cast("double"), 6).as("decay_credit"))
  }

  /** Top-share concentration (SURVEY W5/A6; reference skew rule: top 5%
    * orgs ≈ 50% of volume, `pseudo_code_rules.txt:2-10`). Returns one row
    * (top_n, top_revenue, total_revenue, share). The per-key aggregate
    * shuffles once; the percent rank over keys is computed with
    * [[Ranking.withGlobalPercentRank]] — exact `percent_rank()`
    * semantics with no single-partition window, so the ranking stays
    * parallel even when the key count is fact-sized. */
  def topShare(df: DataFrame, keyCol: String, amount: Column,
      topFraction: Double): DataFrame = {
    val perKey = df.groupBy(col(keyCol)).agg(sum(money(amount)).as("__rev"))
    val ranked = Ranking.withGlobalPercentRank(perKey,
      col("__rev").desc, "__pr")
    ranked.agg(
      sum(when(col("__pr") < topFraction, 1).otherwise(0))
        .cast("long").as("top_n"),
      sum(when(col("__pr") < topFraction, col("__rev")))
        .cast("double").as("top_revenue"),
      sum(col("__rev")).cast("double").as("total_revenue"))
      .withColumn("share",
        round(col("top_revenue") / col("total_revenue"), 6))
  }

  /** Daily z-score anomalies (SURVEY A7; reference Sprint 5
    * `README.md:40`). Exact decimal daily sums; z-scores from the
    * population of daily totals. */
  def dailyAnomalies(events: DataFrame, tsCol: String, valueCol: Column,
      zThreshold: Double): DataFrame = {
    // cache: the daily frame (one row per day — tiny) feeds both the
    // stats aggregate and the z-score join; without it Spark recomputes
    // the full event scan + shuffle twice. Registered with
    // InternalCache so callers can release it deterministically.
    val daily = InternalCache.persist(events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(money(valueCol)).cast("double").as("daily_value")))
    val stats = daily.agg(
      avg(col("daily_value")).as("__mu"),
      stddev_samp(col("daily_value")).as("__sigma"))
    // filter on the unrounded z; round only for output (matches the SQL
    // oracle, which does the same)
    daily.crossJoin(broadcast(stats))
      .filter(abs((col("daily_value") - col("__mu")) / col("__sigma")) >
        zThreshold)
      .select(col("day"), col("daily_value"),
        round((col("daily_value") - col("__mu")) / col("__sigma"), 6)
          .as("z"))
  }

  /** Robust daily anomalies — median/MAD instead of mean/stddev: the
    * z-score's mean and σ are themselves dragged by the outliers being
    * hunted, so a day must be wildly off to stand out; the median and
    * the median absolute deviation are outlier-resistant. Flags days
    * with |x − median| / (1.4826·MAD) > threshold (1.4826 scales MAD
    * to σ under normality — the standard robust z). Exact percentiles
    * over the DAILY frame (one row per day — tiny), not the raw
    * events. */
  def robustDailyAnomalies(events: DataFrame, tsCol: String,
      valueCol: Column, zThreshold: Double): DataFrame = {
    val daily = InternalCache.persist(events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(money(valueCol)).cast("double").as("daily_value")))
    val med = daily.agg(
      expr("percentile(daily_value, 0.5)").as("__med"))
    val withMed = daily.crossJoin(broadcast(med))
    val mad = withMed
      .agg(expr("percentile(abs(daily_value - __med), 0.5)").as("__mad"))
    withMed.crossJoin(broadcast(mad))
      .withColumn("__rz",
        abs(col("daily_value") - col("__med")) / (lit(1.4826) * col("__mad")))
      .filter(col("__rz") > zThreshold)
      .select(col("day"), col("daily_value"), round(col("__rz"), 6)
        .as("robust_z"))
  }

  /** Order↔lineitem reconciliation (SURVEY J4; reference "Payment
    * reconciliation (orders ≈ payments)", `README.md:56`): header total
    * vs exact sum of line amounts, tolerance-classified summary.
    *
    * All money stays DECIMAL end-to-end — `lineAmount` must already be a
    * decimal expression (decimal subtraction is exact, so no engine ever
    * has to break a rounding tie); the only double cast is in the final
    * projection. */
  def reconcile(orders: DataFrame, lines: DataFrame, orderKey: String,
      lineOrderKey: String, headerAmount: Column, lineAmount: Column,
      tolerance: String): DataFrame = {
    val lineSums = lines.groupBy(col(lineOrderKey).as(orderKey))
      .agg(sum(lineAmount).as("line_total"))
    val joined = orders
      .select(col(orderKey), money(headerAmount).as("header_total"))
      .join(lineSums, Seq(orderKey), "left")
      .withColumn("abs_diff",
        abs(col("header_total") -
          coalesce(col("line_total"), lit(0).cast(Money))))
    joined.agg(
      count(lit(1)).as("n_orders"),
      sum(when(col("line_total").isNull, 1).otherwise(0))
        .cast("long").as("n_missing_lines"),
      sum(when(col("abs_diff") > expr(tolerance), 1).otherwise(0))
        .cast("long").as("n_mismatch"),
      round(sum(col("abs_diff")).cast("double"), 2)
        .as("total_abs_diff"))
  }

  /** Gap-based sessionization (operations mart; SURVEY §2.9 adjacency):
    * a new session starts when the gap to the user's previous event
    * exceeds `gapMinutes`. Two windows over the same (user, ts) shuffle —
    * Spark reuses the exchange. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieBreak: Column, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, tieBreak.asc)
    // micros-exact gap arithmetic (unix_micros), not a double cast:
    // type-strict (rejects non-timestamp input at analysis) and immune to
    // double rounding on large epochs, while still sub-second precise
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapMicros,
        1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Markov-chain removal-effect attribution (Anderl et al. 2014) —
    * the model-based complement of the heuristic credits
    * ([[attribution]] first/last, [[multiTouchAttribution]]
    * linear/decay): user journeys become a first-order Markov chain
    * (start → channels → conversion|null), and a channel's credit is
    * its REMOVAL EFFECT — how much the chain's conversion rate drops
    * when every transition into the channel is redirected to null.
    *
    * Determinism contract: conversion probability is computed by
    * `iters` rounds of fixed-point power iteration in PURE INTEGER
    * arithmetic — state mass is 1e12-scaled, each flow is
    * `mass * count div rowsum` (long division) — so the result is
    * independent of iteration order and a SQL engine replays it bit
    * for bit (the [[Graph]] fixed-point discipline).
    *
    * Scale posture: the distributed part is one window + one
    * aggregation producing the (src, dst, count) transition table,
    * which is CHANNELS²-bounded regardless of event volume — at 100 TB
    * it is still ~dozens of rows. That bounded table is the ONE driver
    * collect (the k-means-centroid precedent); the power iteration
    * runs on ≤ (channels+3)² longs.
    *
    * Returns one row per channel:
    * (channel, base_cvr_q, removal_cvr_q, removal_drop_q, n_conversions)
    * with `*_q` 1e12-scaled longs — the caller presents ratios. */
  def markovRemovalEffects(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: Column,
      conversionType: String, channels: Seq[String],
      iters: Int): (Seq[(String, Long, Long, Long)], Long) = {
    val Scale = 1000000000000L
    val w = Window.partitionBy(col("u")).orderBy(col("__ts"), col("__tie"))
    val r = events.select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("__ts"), tieCol.as("__tie"))
      .withColumn("rn", row_number().over(w))
    val fp = r.filter(col("t") === conversionType)
      .groupBy(col("u")).agg(min(col("rn")).as("prn"))
    val j = InternalCache.persist(r.join(fp, Seq("u"), "left")
      .filter(col("prn").isNull || col("rn") < col("prn"))
      .select(col("u"), col("t"), col("rn")))
    val absorber = r.select(col("u")).distinct()
      .join(fp.select(col("u"), lit(true).as("__c")), Seq("u"), "left")
      .select(col("u"), when(col("__c"), lit("conversion"))
        .otherwise(lit("null")).as("ab"))
    val wj = Window.partitionBy(col("u")).orderBy(col("rn"))
    val seq0 = j.withColumn("nxt", lead(col("t"), 1).over(wj))
    val internal = seq0.filter(col("nxt").isNotNull)
      .select(col("t").as("src"), col("nxt").as("dst"))
    val lastToAb = seq0.filter(col("nxt").isNull).join(absorber, Seq("u"))
      .select(col("t").as("src"), col("ab").as("dst"))
    val firstCh = j.groupBy(col("u")).agg(min(col("rn")).as("mrn"))
    val startEdge = j.join(firstCh, Seq("u"))
      .filter(col("rn") === col("mrn"))
      .select(lit("start").as("src"), col("t").as("dst"))
    val emptyJourney = absorber
      .join(j.select(col("u")).distinct(), Seq("u"), "left_anti")
      .select(lit("start").as("src"), col("ab").as("dst"))
    val trans = internal.unionByName(lastToAb).unionByName(startEdge)
      .unionByName(emptyJourney)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
    // the ONE bounded driver collect: ≤ (channels+3)² rows
    val cnt: Map[(String, String), Long] = trans.collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getLong(2))
      .toMap
    val nConv = fp.count()
    InternalCache.release()

    def cvr(removed: Option[String]): Long = {
      val edges = cnt.toSeq.collect {
        case ((s0, d0), c0) if !removed.contains(s0) =>
          (s0, if (removed.contains(d0)) "null" else d0, c0)
      }
      val merged = edges.groupBy(e => (e._1, e._2)).toSeq
        .map { case ((s0, d0), es) => (s0, d0, es.map(_._3).sum) }
      val rowsum = merged.groupBy(_._1)
        .map { case (k, es) => k -> es.map(_._3).sum }
      val out = merged.groupBy(_._1)
        .map { case (k, es) => k -> es.map(e => (e._2, e._3)) }
      var p = Map("start" -> Scale)
      for (_ <- 1 to iters) {
        val next = scala.collection.mutable.Map[String, Long]()
          .withDefaultValue(0L)
        for ((st, mass) <- p) {
          if (st == "conversion" || st == "null") next(st) += mass
          else for ((d0, c0) <- out.getOrElse(st, Nil))
            next(d0) += mass * c0 / rowsum(st)
        }
        p = next.toMap
      }
      p.getOrElse("conversion", 0L)
    }

    val base = cvr(None)
    val rows = channels.map { ch =>
      val cc = cvr(Some(ch))
      (ch, base, cc, math.max(base - cc, 0L))
    }
    (rows, nConv)
  }

  /** Late-arrival rate (SURVEY A4; reference `README.md:57`, lateness =
    * received - event, `generate_and_load_script.py:162`). */
  def lateArrivalRate(df: DataFrame, eventTs: Column, receivedTs: Column,
      thresholdSeconds: Long): DataFrame =
    df.agg(
      count(lit(1)).as("n_events"),
      sum(when(unix_timestamp(receivedTs) - unix_timestamp(eventTs) >
        thresholdSeconds, 1).otherwise(0)).cast("long").as("n_late"))
      .withColumn("late_rate",
        round(col("n_late").cast("double") / col("n_events"), 6))
}
