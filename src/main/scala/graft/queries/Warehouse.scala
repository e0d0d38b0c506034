package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Functions._
import graft.operators.{Cdc, Marts, Scd2}
import graft.quality._
import graft.sources.Tables
import graft.stage.Staging

/** Warehouse-layer queries: staging dedup, SCD2 + as-of, window marts,
  * quality suite, reconciliation, freshness — the reference's declared
  * pipeline semantics (SURVEY §2.2-2.9) exercised over the fixture
  * tables, each with a DuckDB oracle.
  */
object Warehouse {

  /** W1 keep-latest dedup (reference dup-row rule
    * `pseudo_code_rules.txt:39-47`). */
  val q5 = Query(
    "q5_dedup_latest",
    """SELECT user_id, event_type, event_id, ts, value FROM events
      |QUALIFY row_number() OVER (
      |  PARTITION BY user_id, event_type
      |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin) { (s, dir) =>
    Staging.dedupLatest(Tables.events(s, dir),
      Seq("user_id", "event_type"), col("ts"), Seq(col("event_id")))
      .select("user_id", "event_type", "event_id", "ts", "value")
  }

  /** W1 keep-latest dedup, AGGREGATE form: `dedupLatestAgg` (max_by
    * over an ordering struct — partial-aggregatable, no window sort,
    * the hot-key-safe shape) against the SAME oracle as q5: both forms
    * must pick identical winners. */
  val q65 = Query(
    "q65_dedup_latest_agg",
    """SELECT user_id, event_type, event_id, ts, value FROM events
      |QUALIFY row_number() OVER (
      |  PARTITION BY user_id, event_type
      |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin) { (s, dir) =>
    Staging.dedupLatestAgg(Tables.events(s, dir),
      Seq("user_id", "event_type"), col("ts"), Seq(col("event_id")))
      .select("user_id", "event_type", "event_id", "ts", "value")
  }

  /** Null-key-guarded left join (`Skew.nullSafeLeftJoin`): null FKs are
    * routed around the join instead of hashing to one reducer. FK
    * nulls are injected deterministically (the fixture has none); the
    * oracle is the PLAIN left join — the guard must be invisible in
    * results. */
  val q66 = Query(
    "q66_null_safe_join",
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END
      |      AS c_custkey
      |  FROM orders)
      |SELECT
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN c.c_mktsegment IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_unmatched,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total
      |FROM o LEFT JOIN customer c ON o.c_custkey = c.c_custkey""".stripMargin) {
    (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_totalprice"),
        when(pmod(col("o_orderkey"), lit(10)) === 0, lit(null))
          .otherwise(col("o_custkey")).as("c_custkey"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.Skew.nullSafeLeftJoin(o, c, Seq("c_custkey"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("c_mktsegment").isNull, 1).otherwise(0))
            .cast("long").as("n_unmatched"),
          sumMoney(col("o_totalprice")).as("total"))
  }

  /** W2 SCD2 versioning (reference `README.md:37`): each event is a state
    * change of its user; intervals are half-open `[valid_from, valid_to)`. */
  val q6 = Query(
    "q6_scd2_dim",
    """SELECT user_id, event_id, event_type,
      |  ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  (LEAD(ts) OVER w IS NULL) AS is_current,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
    (s, dir) =>
      Scd2.build(Tables.events(s, dir), Seq("user_id"), "ts", Seq("event_id"))
        .select("user_id", "event_id", "event_type",
          "valid_from", "valid_to", "is_current", "version")
  }

  /** W2 incremental form (the dbt snapshot RUN): the dim is built from
    * history before the cutoff, then a second batch of changes is
    * folded in with `Scd2.merge` — which rebuilds only affected keys'
    * chains. The oracle is the SAME full-rebuild SQL as q6: an
    * incremental merge must be indistinguishable from rebuilding over
    * the whole log. */
  val q63 = Query(
    "q63_scd2_merge",
    """SELECT user_id, event_id, event_type,
      |  ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  (LEAD(ts) OVER w IS NULL) AS is_current,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
    (s, dir) =>
      val ev = Tables.events(s, dir)
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      val dim0 = Scd2.build(ev.filter(col("ts") < cutoff),
        Seq("user_id"), "ts", Seq("event_id"))
      Scd2.merge(dim0, ev.filter(col("ts") >= cutoff),
          Seq("user_id"), "ts", Seq("event_id"))
        .select("user_id", "event_id", "event_type",
          "valid_from", "valid_to", "is_current", "version")
  }

  /** W2 `check`-strategy snapshot: consecutive rows with an UNCHANGED
    * watched column (event_type) collapse into one version — dbt's
    * no-op suppression rule — then the SCD2 chain is built over the
    * true state changes only. */
  val q64 = Query(
    "q64_scd2_check_strategy",
    """WITH o AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT user_id, event_id, event_type, ts FROM o
      |  WHERE prev_type IS NULL OR prev_type IS DISTINCT FROM event_type)
      |SELECT user_id, event_id, event_type,
      |  ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  (LEAD(ts) OVER w IS NULL) AS is_current,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
      |FROM c
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
    (s, dir) =>
      val collapsed = Scd2.collapseUnchanged(
        Tables.events(s, dir).select("user_id", "event_id", "event_type",
          "ts"),
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
      Scd2.build(collapsed, Seq("user_id"), "ts", Seq("event_id"))
        .select("user_id", "event_id", "event_type",
          "valid_from", "valid_to", "is_current", "version")
  }

  /** J5 as-of join: purchases pick the 'view' state valid at purchase
    * time (point-in-time lookup against the SCD2 dim). */
  val q7 = Query(
    "q7_asof_join",
    """WITH dim AS (
      |  SELECT user_id, value AS state_value, ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM events WHERE event_type = 'view'),
      |fact AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, f.ts, d.valid_from, d.state_value
      |FROM fact f JOIN dim d
      |  ON f.user_id = d.user_id AND f.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)""".stripMargin) {
    (s, dir) =>
      val ev = Tables.events(s, dir)
      val dim = Scd2.build(ev.filter(col("event_type") === "view"),
        Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("value").as("state_value"),
          col("valid_from"), col("valid_to"))
      val fact = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      Scd2.asOfJoin(fact, dim, Seq("user_id"), "ts")
        .select("event_id", "user_id", "ts", "valid_from", "state_value")
  }

  /** Running revenue window (SURVEY §2.5 frame specs): exact decimal
    * running total per customer. */
  val q8 = Query(
    "q8_running_total",
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        sum(money(col("o_totalprice"))).over(w).cast("double")
          .as("running_total"))
  }

  private val funnelStages = Seq("signup", "view", "click", "purchase")

  /** W3 funnel mart (first-touch-ordered: stage i counts iff its first
    * hit is strictly after the stage i-1 conversion). */
  val q9 = Query(
    "q9_funnel",
    """WITH per_user AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type='signup' THEN ts END) AS t0,
      |    min(CASE WHEN event_type='view' THEN ts END) AS t1,
      |    min(CASE WHEN event_type='click' THEN ts END) AS t2,
      |    min(CASE WHEN event_type='purchase' THEN ts END) AS t3
      |  FROM events GROUP BY user_id),
      |conv AS (
      |  SELECT t0 AS c0,
      |    CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END AS c1,
      |    CASE WHEN (CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END) IS NOT NULL
      |         AND t2 > (CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END)
      |         THEN t2 END AS c2,
      |    CASE WHEN (CASE WHEN (CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END) IS NOT NULL
      |              AND t2 > (CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END) THEN t2 END) IS NOT NULL
      |         AND t3 > (CASE WHEN (CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END) IS NOT NULL
      |              AND t2 > (CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN t1 END) THEN t2 END)
      |         THEN t3 END AS c3
      |  FROM per_user),
      |counts AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN c0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s0,
      |    CAST(SUM(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s2,
      |    CAST(SUM(CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s3
      |  FROM conv)
      |SELECT 0 AS stage_index, 'signup' AS stage, s0 AS users FROM counts
      |UNION ALL SELECT 1, 'view', s1 FROM counts
      |UNION ALL SELECT 2, 'click', s2 FROM counts
      |UNION ALL SELECT 3, 'purchase', s3 FROM counts""".stripMargin) {
    (s, dir) =>
      Marts.funnel(Tables.events(s, dir), "user_id", "event_type", "ts",
        funnelStages)
  }

  /** W4 attribution (first/last touch per user over the full frame). */
  val q10 = Query(
    "q10_attribution",
    """WITH t AS (
      |  SELECT user_id,
      |    first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_touch,
      |    last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_touch,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT first_touch, last_touch, CAST(COUNT(*) AS BIGINT) AS users
      |FROM t WHERE rn = 1 GROUP BY first_touch, last_touch""".stripMargin) {
    (s, dir) =>
      Marts.attribution(Tables.events(s, dir), "user_id", "event_type",
        "ts", col("event_id"))
  }

  /** W4 multi-touch attribution: linear + time-decay credit per
    * channel over each user's pre-conversion touches (first purchase =
    * the conversion). Exact-binary decay weights and decimal credit
    * sums keep both models hash-comparable across engines. */
  val q75 = Query(
    "q75_multi_touch_attribution",
    """WITH conv AS (
      |  SELECT user_id, MIN(ts) AS conv_ts FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id),
      |touch AS (
      |  SELECT e.user_id, e.event_type AS channel,
      |    power(0.5, LEAST(date_diff('day', CAST(e.ts AS DATE),
      |      CAST(c.conv_ts AS DATE)), 40)) AS w
      |  FROM events e JOIN conv c ON e.user_id = c.user_id
      |  WHERE e.ts < c.conv_ts),
      |g1 AS (
      |  SELECT user_id, channel, COUNT(*) AS cnt, SUM(w) AS wch
      |  FROM touch GROUP BY 1, 2),
      |tot AS (
      |  SELECT user_id, SUM(cnt) AS n, SUM(wch) AS sumw
      |  FROM g1 GROUP BY 1),
      |sh AS (
      |  SELECT g1.channel, g1.cnt,
      |    CAST(ROUND(CAST(g1.cnt AS DOUBLE) / tot.n, 9)
      |      AS DECIMAL(28,14)) AS lin,
      |    CAST(ROUND(g1.wch / tot.sumw, 9) AS DECIMAL(28,14)) AS dec_sh
      |  FROM g1 JOIN tot USING (user_id))
      |SELECT channel, CAST(SUM(cnt) AS BIGINT) AS n_touches,
      |  ROUND(CAST(SUM(lin) AS DOUBLE), 6) AS linear_credit,
      |  ROUND(CAST(SUM(dec_sh) AS DOUBLE), 6) AS decay_credit
      |FROM sh GROUP BY channel""".stripMargin) { (s, dir) =>
    Marts.multiTouchAttribution(Tables.events(s, dir), "user_id",
      "event_type", "ts", "purchase")
  }

  private val MkIters = 8
  private val MkChannels = Seq("click", "error", "signup", "view")

  /** Markov-chain removal-effect attribution
    * ([[graft.operators.Marts.markovRemovalEffects]]): the model-based
    * third member of the attribution family (q10 first/last heuristics,
    * q75 linear/decay credits) — each channel's credit is how much the
    * journey chain's conversion rate drops when the channel is removed
    * (transitions into it redirected to null). The chain solve is
    * [[MkIters]] fixed-point rounds of PURE INTEGER power iteration on
    * the channels²-bounded transition table (the one driver collect,
    * k-means-precedent), and the oracle replays the identical rounds
    * per variant as unrolled CTEs — no float tolerance anywhere. */
  val q204 = Query(
    "q204_markov_attribution", {
      val S = "1000000000000"
      def variantCtes(tag: String, removed: Option[String]): String = {
        val eSel = removed match {
          case None =>
            "SELECT src, dst, SUM(c) AS c FROM tc GROUP BY 1, 2"
          case Some(ch) =>
            s"""SELECT src,
               |    CASE WHEN dst = '$ch' THEN 'null' ELSE dst END AS dst,
               |    SUM(c) AS c FROM tc WHERE src != '$ch'
               |  GROUP BY 1, 2""".stripMargin
        }
        val iters = (1 to MkIters).map { k =>
          s"""p_${tag}_$k AS MATERIALIZED (
             |  SELECT state, CAST(SUM(m) AS BIGINT) AS p FROM (
             |    SELECT e.dst AS state, (p.p * e.c) // rs.rowsum AS m
             |    FROM p_${tag}_${k - 1} p
             |    JOIN e_$tag e ON e.src = p.state
             |    JOIN rs_$tag rs ON rs.src = p.state
             |    WHERE p.state NOT IN ('conversion', 'null')
             |    UNION ALL
             |    SELECT state, p FROM p_${tag}_${k - 1}
             |    WHERE state IN ('conversion', 'null'))
             |  GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""e_$tag AS MATERIALIZED ($eSel),
           |rs_$tag AS MATERIALIZED (
           |  SELECT src, SUM(c) AS rowsum FROM e_$tag GROUP BY 1),
           |p_${tag}_0 AS MATERIALIZED (
           |  SELECT 'start' AS state, CAST($S AS BIGINT) AS p),
           |$iters,
           |cvr_$tag AS MATERIALIZED (
           |  SELECT COALESCE(MAX(CASE WHEN state = 'conversion'
           |    THEN p END), 0) AS cvr FROM p_${tag}_$MkIters)""".stripMargin
      }
      val variants = (("base", None) +:
        MkChannels.map(ch => (ch, Some(ch))))
        .map { case (t, rm) => variantCtes(t, rm) }.mkString(",\n")
      val effRows = MkChannels.map(ch =>
        s"SELECT '$ch' AS channel, (SELECT cvr FROM cvr_$ch) AS cc")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH r AS MATERIALIZED (
         |  SELECT user_id AS u, event_type AS t, row_number() OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events),
         |fp AS MATERIALIZED (SELECT u, MIN(rn) AS prn FROM r
         |  WHERE t = 'purchase' GROUP BY 1),
         |j AS MATERIALIZED (SELECT r.u, r.t, r.rn FROM r LEFT JOIN fp USING (u)
         |  WHERE fp.prn IS NULL OR r.rn < fp.prn),
         |ab AS MATERIALIZED (
         |  SELECT uu.u, CASE WHEN fp.prn IS NOT NULL THEN 'conversion'
         |    ELSE 'null' END AS ab
         |  FROM (SELECT DISTINCT u FROM r) uu LEFT JOIN fp USING (u)),
         |sq AS MATERIALIZED (SELECT u, t, rn,
         |    lead(t) OVER (PARTITION BY u ORDER BY rn) AS nxt
         |  FROM j),
         |tr AS MATERIALIZED (
         |  SELECT t AS src, nxt AS dst FROM sq WHERE nxt IS NOT NULL
         |  UNION ALL
         |  SELECT sq.t AS src, ab.ab AS dst FROM sq JOIN ab USING (u)
         |  WHERE sq.nxt IS NULL
         |  UNION ALL
         |  SELECT 'start' AS src, j.t AS dst FROM j
         |  JOIN (SELECT u, MIN(rn) AS mrn FROM j GROUP BY 1) f
         |    ON f.u = j.u AND j.rn = f.mrn
         |  UNION ALL
         |  SELECT 'start' AS src, ab.ab AS dst FROM ab
         |  WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.u = ab.u)),
         |tc AS MATERIALIZED (SELECT src, dst, COUNT(*) AS c FROM tr GROUP BY 1, 2),
         |nc AS MATERIALIZED (SELECT COUNT(*) AS nconv FROM fp),
         |$variants,
         |eff AS (
         |  $effRows),
         |res AS MATERIALIZED (
         |  SELECT eff.channel, b.cvr AS cb, eff.cc,
         |    GREATEST(b.cvr - eff.cc, 0) AS d
         |  FROM eff CROSS JOIN cvr_base b),
         |sd AS MATERIALIZED (SELECT SUM(d) AS sd FROM res)
         |SELECT channel,
         |  ROUND(CAST(cb AS DOUBLE) / $S.0, 6) AS base_cvr,
         |  ROUND(CAST(cc AS DOUBLE) / $S.0, 6) AS removal_cvr,
         |  CASE WHEN cb > 0 THEN
         |    ROUND(CAST(d AS DOUBLE) / CAST(cb AS DOUBLE), 6)
         |  END AS removal_effect,
         |  CASE WHEN sd.sd > 0 THEN
         |    ROUND((CAST(nc.nconv AS DOUBLE) * CAST(d AS DOUBLE))
         |      / CAST(sd.sd AS DOUBLE), 6)
         |  END AS attributed_conversions
         |FROM res CROSS JOIN sd CROSS JOIN nc""".stripMargin
    }) { (s, dir) =>
    val (rows, nConv) = Marts.markovRemovalEffects(Tables.events(s, dir),
      "user_id", "event_type", "ts", col("event_id"), "purchase",
      MkChannels, MkIters)
    import s.implicits._
    val sd = rows.map(_._4).sum
    rows.toDF("channel", "cb", "cc", "d").select(col("channel"),
      round(col("cb").cast("double") / 1000000000000.0d, 6)
        .as("base_cvr"),
      round(col("cc").cast("double") / 1000000000000.0d, 6)
        .as("removal_cvr"),
      when(col("cb") > 0, round(
        col("d").cast("double") / col("cb").cast("double"), 6))
        .as("removal_effect"),
      when(lit(sd) > 0, round(
        (lit(nConv.toDouble) * col("d").cast("double"))
          / lit(sd.toDouble), 6)).as("attributed_conversions"))
  }

  /** Time-to-convert survival analysis with right-censoring: the
    * Nelson–Aalen cumulative-hazard estimator over days from a user's
    * first touch to their first purchase; users who never convert are
    * censored at the observation end instead of silently dropped (the
    * error every naive "average days to convert" mart makes). The
    * Nelson–Aalen form `H(t) = Σ d_i/n_i` is chosen over Kaplan–Meier
    * deliberately: it needs NO logarithm or cumulative product — each
    * increment is an exact integer division on a 1e9 grid and the
    * cumulative sum stays integer, so both engines agree bit for bit.
    * The per-day frame is observation-window-bounded (≤ days rows), so
    * its global cumulative windows are the q84 bounded-bucket pattern,
    * not a row-scale window; the per-user reduction is one
    * map-side-combinable aggregate. */
  val q206 = Query(
    "q206_conversion_hazard",
    """WITH u AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS t0
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cd
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |g AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
      |d AS (
      |  SELECT CASE WHEN p.cd IS NOT NULL THEN (p.cd - u.t0)
      |      ELSE (g.maxd - u.t0) END AS day,
      |    CASE WHEN p.cd IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM u LEFT JOIN p USING (user_id) CROSS JOIN g),
      |byday AS (
      |  SELECT day, SUM(ev) AS d_i, SUM(1 - ev) AS c_i
      |  FROM d GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n FROM u),
      |w AS (
      |  SELECT day, d_i, c_i,
      |    (SELECT n FROM tot) - COALESCE(SUM(d_i + c_i) OVER (
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) AS n_risk
      |  FROM byday),
      |h AS (
      |  SELECT day, d_i, c_i, n_risk,
      |    SUM(CASE WHEN n_risk > 0 THEN (d_i * 1000000000) // n_risk
      |      ELSE 0 END) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS hq
      |  FROM w)
      |SELECT CAST(day AS BIGINT) AS day,
      |  CAST(n_risk AS BIGINT) AS n_risk,
      |  CAST(d_i AS BIGINT) AS n_conv,
      |  CAST(c_i AS BIGINT) AS n_censored,
      |  ROUND(CAST(hq AS DOUBLE) / 1000000000.0, 6) AS cum_hazard
      |FROM h""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val u = ev.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("t0"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts").cast("date")).as("cd"))
    val g = ev.agg(max(col("ts").cast("date")).as("maxd"))
    val d = u.join(p, Seq("user_id"), "left").crossJoin(broadcast(g))
      .select(
        when(col("cd").isNotNull, datediff(col("cd"), col("t0")))
          .otherwise(datediff(col("maxd"), col("t0"))).as("day"),
        when(col("cd").isNotNull, 1L).otherwise(0L).as("ev"))
    val byday = d.groupBy(col("day"))
      .agg(sum(col("ev")).as("d_i"), sum(lit(1L) - col("ev")).as("c_i"))
    val tot = u.count() // ONE bounded driver scalar (node-count precedent)
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byday
      .withColumn("n_risk", lit(tot) -
        coalesce(sum(col("d_i") + col("c_i")).over(wPrev), lit(0L)))
      .withColumn("hq", sum(when(col("n_risk") > 0,
        expr("(d_i * 1000000000) div n_risk")).otherwise(0L)).over(wCur))
      .select(col("day").cast("long").as("day"),
        col("n_risk").cast("long").as("n_risk"),
        col("d_i").cast("long").as("n_conv"),
        col("c_i").cast("long").as("n_censored"),
        round(col("hq").cast("double") / 1000000000.0d, 6)
          .as("cum_hazard"))
  }

  /** W5/A6 top-share concentration (reference org-skew rule
    * `pseudo_code_rules.txt:2-10`). */
  val q11 = Query(
    "q11_top_share",
    """WITH per AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT rev, percent_rank() OVER (ORDER BY rev DESC) AS pr FROM per)
      |SELECT
      |  CAST(SUM(CASE WHEN pr < 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS top_n,
      |  CAST(SUM(CASE WHEN pr < 0.05 THEN rev END) AS DOUBLE) AS top_revenue,
      |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
      |  ROUND(CAST(SUM(CASE WHEN pr < 0.05 THEN rev END) AS DOUBLE) /
      |        CAST(SUM(rev) AS DOUBLE), 6) AS share
      |FROM r""".stripMargin) { (s, dir) =>
    Marts.topShare(Tables.orders(s, dir), "o_custkey",
      col("o_totalprice"), 0.05)
  }

  /** A7 anomaly detection: daily totals more than 2σ from the mean. */
  val q12 = Query(
    "q12_daily_anomalies",
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_value
      |  FROM events GROUP BY 1),
      |stats AS (
      |  SELECT avg(daily_value) AS mu, stddev_samp(daily_value) AS sigma
      |  FROM daily)
      |SELECT day, daily_value,
      |  ROUND((daily_value - mu) / sigma, 6) AS z
      |FROM daily, stats
      |WHERE ABS((daily_value - mu) / sigma) > 2.0""".stripMargin) { (s, dir) =>
    // filter on unrounded z in both engines; z is rounded for output
    Marts.dailyAnomalies(Tables.events(s, dir), "ts", col("value"), 2.0)
  }

  /** A7 robust variant: median/MAD anomalies — outlier-resistant where
    * q12's mean/σ gets dragged by the anomalies themselves. Exact
    * percentiles hash-match DuckDB's quantile_cont (proven q47). */
  val q67 = Query(
    "q67_robust_anomalies",
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_value
      |  FROM events GROUP BY 1),
      |med AS (SELECT quantile_cont(daily_value, 0.5) AS m FROM daily),
      |mad AS (
      |  SELECT quantile_cont(abs(daily_value - m), 0.5) AS d
      |  FROM daily, med)
      |SELECT day, daily_value,
      |  ROUND(abs(daily_value - m) / (1.4826 * d), 6) AS robust_z
      |FROM daily, med, mad
      |WHERE abs(daily_value - m) / (1.4826 * d) > 2.5""".stripMargin) {
    (s, dir) =>
      Marts.robustDailyAnomalies(Tables.events(s, dir), "ts",
        col("value"), 2.5)
  }

  /** W3 companion: conversion LATENCY — exact median/p90 seconds from a
    * user's first signup to their first later purchase. One conditional
    * min-aggregation per user (map-side combinable), then a tiny exact
    * percentile over converted users. */
  val q68 = Query(
    "q68_conversion_latency",
    """WITH per_user AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id),
      |conv AS (
      |  SELECT epoch(t_purchase) - epoch(t_signup) AS latency_s
      |  FROM per_user
      |  WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
      |    AND t_purchase > t_signup)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
      |  ROUND(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
      |  ROUND(quantile_cont(latency_s, 0.9), 6) AS p90_latency_s
      |FROM conv""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "purchase", col("ts")))
          .as("t_purchase"))
      .filter(col("t_signup").isNotNull && col("t_purchase").isNotNull &&
        col("t_purchase") > col("t_signup"))
      .select((col("t_purchase").cast("double") -
        col("t_signup").cast("double")).as("latency_s"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(latency_s, 0.5)"), 6).as("p50_latency_s"),
        round(expr("percentile(latency_s, 0.9)"), 6).as("p90_latency_s"))
  }

  /** A1-A3/S4 quality suite — dbt schema-test parity
    * (reference `models/schema.yml`) as one summary frame. */
  val q13 = Query(
    "q13_quality_suite",
    """WITH counts AS (
      |  SELECT 'unique_o_orderkey' AS check_name, 'error' AS severity,
      |    CAST(COUNT(*) AS BIGINT) AS violations
      |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'not_null_o_custkey', 'error', CAST(COUNT(*) AS BIGINT)
      |  FROM orders WHERE o_custkey IS NULL
      |  UNION ALL
      |  SELECT 'relationship_l_orderkey', 'error', CAST(COUNT(*) AS BIGINT)
      |  FROM lineitem l WHERE l.l_orderkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'accepted_values_event_type', 'error', CAST(COUNT(*) AS BIGINT)
      |  FROM events WHERE event_type IS NOT NULL
      |    AND event_type NOT IN ('signup','view','click','purchase','error')
      |  UNION ALL
      |  SELECT 'no_negative_price', 'error', CAST(COUNT(*) AS BIGINT)
      |  FROM lineitem WHERE l_extendedprice < 0 OR l_quantity <= 0
      |  UNION ALL
      |  SELECT 'freshness_ts', 'warn',
      |    CAST(CASE WHEN max(ts) < TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 24 HOURS
      |         THEN 1 ELSE 0 END AS BIGINT)
      |  FROM events)
      |SELECT check_name, violations, severity,
      |  CASE WHEN violations = 0 THEN 'pass'
      |       WHEN severity = 'error' THEN 'error' ELSE 'warn' END AS status,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'error' END
      |    AS promoted_status,
      |  NOT (violations > 0 AND severity = 'error') AS passed
      |FROM counts""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val events = Tables.events(s, dir)
    import graft.quality.Severity.{Error, Warn}
    Quality.summarize(s, Seq(
      ("unique_o_orderkey",
        Unique(Seq("o_orderkey")).violations(orders), Error),
      ("not_null_o_custkey",
        NotNull("o_custkey").violations(orders), Error),
      ("relationship_l_orderkey",
        Relationship("l_orderkey", orders, "o_orderkey")
          .violations(lineitem), Error),
      ("accepted_values_event_type",
        AcceptedValues("event_type",
          Seq("signup", "view", "click", "purchase", "error"))
          .violations(events), Error),
      ("no_negative_price",
        Predicate("no_negative_price",
          col("l_extendedprice") < 0 || col("l_quantity") <= 0)
          .violations(lineitem), Error),
      // freshness is warn-tier (reference warn_after): it FIRES on the
      // fixture (stale max ts) but does not fail the run — unless
      // promoted, which promoted_status makes visible
      ("freshness_ts",
        Freshness("ts", 24, Timestamp.valueOf("2024-02-01 00:00:00"))
          .violations(events), Warn)))
  }

  /** J4 reconciliation: order header totals vs exact line sums. Money is
    * DECIMAL end-to-end in BOTH engines (inputs cast to decimal before
    * any arithmetic; decimal subtraction is exact, so no rounding ties
    * ever occur); the only double cast is the final projection. */
  val q14 = Query(
    "q14_reconciliation",
    """WITH ls AS (
      |  SELECT l_orderkey AS o_orderkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |        * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS line_total
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT ls.line_total,
      |    ABS(CAST(o.o_totalprice AS DECIMAL(18,2))
      |        - COALESCE(ls.line_total, 0)) AS abs_diff
      |  FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.o_orderkey)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing_lines,
      |  CAST(SUM(CASE WHEN abs_diff > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_mismatch,
      |  ROUND(CAST(SUM(abs_diff) AS DOUBLE), 2) AS total_abs_diff
      |FROM j""".stripMargin) { (s, dir) =>
    val one = lit(1).cast(org.apache.spark.sql.types.DecimalType(1, 0))
    val rate = (c: String) =>
      col(c).cast(org.apache.spark.sql.types.DecimalType(4, 2))
    Marts.reconcile(Tables.orders(s, dir), Tables.lineitem(s, dir),
      "o_orderkey", "l_orderkey", col("o_totalprice"),
      money(col("l_extendedprice")) * (one - rate("l_discount")) *
        (one + rate("l_tax")),
      "0.01")
  }

  /** S4 freshness report across sources (reference
    * `models/schema.yml:13-14`), with injected as-of times for
    * reproducibility. */
  val q15 = Query(
    "q15_freshness_report",
    """SELECT 'orders' AS table_name, max(o_orderdate) AS max_loaded_at,
      |  CAST(FLOOR((epoch(TIMESTAMP '2001-09-01 00:00:00') - epoch(max(o_orderdate))) / 3600) AS BIGINT) AS hours_stale,
      |  max(o_orderdate) >= TIMESTAMP '2001-09-01 00:00:00' - INTERVAL 24 HOURS AS fresh
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem', max(l_shipdate),
      |  CAST(FLOOR((epoch(TIMESTAMP '2001-09-01 00:00:00') - epoch(max(l_shipdate))) / 3600) AS BIGINT),
      |  max(l_shipdate) >= TIMESTAMP '2001-09-01 00:00:00' - INTERVAL 24 HOURS
      |FROM lineitem
      |UNION ALL
      |SELECT 'events', max(ts),
      |  CAST(FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(max(ts))) / 3600) AS BIGINT),
      |  max(ts) >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 24 HOURS
      |FROM events""".stripMargin) { (s, dir) =>
    // orders/lineitem dates land as TIMESTAMP_NTZ, events as TIMESTAMP —
    // NTZ casts straight to double crash at analysis; go NTZ→TIMESTAMP
    // (session TZ is UTC) →double for epoch math, and emit max_loaded_at
    // uniformly as TIMESTAMP_NTZ so the union legs agree on one type
    // (DuckDB's timestamps are NTZ, so the oracle compare lines up too).
    def leg(df: org.apache.spark.sql.DataFrame, name: String, tsCol: String,
        asOf: String) = {
      val asOfTs = lit(Timestamp.valueOf(asOf))
      val maxTs = col("__max").cast("timestamp")
      df.agg(max(col(tsCol)).as("__max"))
        .select(
          lit(name).as("table_name"),
          col("__max").cast("timestamp_ntz").as("max_loaded_at"),
          floor((asOfTs.cast("double") - maxTs.cast("double"))
            / 3600).cast("long").as("hours_stale"),
          (maxTs >= asOfTs - expr("INTERVAL 24 HOURS")).as("fresh"))
    }
    // loaded-at columns come from the source registry's freshness
    // metadata (Tables.loadedAtField — the dbt `loaded_at_field`)
    leg(Tables.orders(s, dir), "orders", Tables.loadedAtField("orders"),
        "2001-09-01 00:00:00")
      .unionByName(leg(Tables.lineitem(s, dir), "lineitem",
        Tables.loadedAtField("lineitem"), "2001-09-01 00:00:00"))
      .unionByName(leg(Tables.events(s, dir), "events",
        Tables.loadedAtField("events"), "2024-02-01 00:00:00"))
  }

  /** F6 JSON extraction + aggregation over the extracted key. */
  val q16 = Query(
    "q16_json_extract",
    """SELECT CAST(FLOOR(CAST(props->>'k' AS INTEGER) / 10) AS BIGINT) AS k_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE CAST(props->>'k' AS INTEGER) IS NOT NULL
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("__k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("__k").isNotNull)
      .groupBy(floor(col("__k") / 10).cast("long").as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("total_value"))
  }

  /** Gap-based sessionization (operations mart). */
  val q17 = Query(
    "q17_sessionize",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM g)
      |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
    Marts.sessionize(Tables.events(s, dir), "user_id", "ts",
      col("event_id"), 30)
  }

  /** Gap sessionization via Spark's BUILT-IN `session_window` — the
    * declarative twin of q17's window-arithmetic form and q50's
    * custom-state streaming form (all three must agree). Session
    * identity here is (user, window); q17's running session_id is the
    * one thing the built-in doesn't provide, so the comparison drops
    * it and keys sessions by their start instead. */
  val q70 = Query(
    "q70_session_window",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select("user_id", "n_events", "session_start", "session_end")
  }

  /** ST5 tumbling-window rollup, batch form: monthly revenue. */
  val q18 = Query(
    "q18_monthly_revenue",
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** U1/set ops: customers with completed ('F') orders but no open ('O')
    * orders — EXCEPT (distinct semantics in both engines). */
  val q19 = Query(
    "q19_set_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) {
    (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
  }

  /** U1/set ops companion to q19: INTERSECT — customers with BOTH
    * completed and open orders (distinct semantics in both engines). */
  val q73 = Query(
    "q73_set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) {
    (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(
          o.filter(col("o_orderstatus") === "O").select("o_custkey"))
  }

  /** F7/F8 audit: malformed JSON, schema drift, PII scan
    * (reference rules `pseudo_code_rules.txt:30-38`,
    * `generate_and_load_script.py:157-158`, `README.md:59`). */
  val q20 = Query(
    "q20_json_pii_audit",
    """SELECT 'events' AS table_name, 'malformed_json' AS check_name,
      |  CAST(SUM(CASE WHEN props IS NOT NULL AND NOT json_valid(props)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n
      |FROM events
      |UNION ALL
      |SELECT 'events', 'json_drift_keys',
      |  CAST(SUM(CASE WHEN json_valid(props) AND json_keys(props) != ['k']
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM events
      |UNION ALL
      |SELECT 'documents', 'pii_email',
      |  CAST(SUM(CASE WHEN regexp_matches(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM documents""".stripMargin) { (s, dir) =>
    val ev = Staging.parseJsonTolerant(Tables.events(s, dir), "props")
    val malformed = ev.agg(
      sum(when(col("props").isNotNull && col("parsed").isNull, 1)
        .otherwise(0)).cast("long").as("n"))
      .select(lit("events").as("table_name"),
        lit("malformed_json").as("check_name"), col("n"))
    val drift = ev.agg(
      sum(when(col("parsed").isNotNull &&
        map_keys(col("parsed")) =!= array(lit("k")), 1)
        .otherwise(0)).cast("long").as("n"))
      .select(lit("events").as("table_name"),
        lit("json_drift_keys").as("check_name"), col("n"))
    val pii = Tables.documents(s, dir).agg(
      sum(when(containsPii(col("text")), 1).otherwise(0)).cast("long")
        .as("n"))
      .select(lit("documents").as("table_name"),
        lit("pii_email").as("check_name"), col("n"))
    malformed.unionByName(drift).unionByName(pii)
  }

  /** Pivot → unpivot roundtrip: monthly revenue spread into one column
    * per order status (`pivot` with EXPLICIT values — the dynamic
    * two-pass form is a driver-side distinct, never needed when the
    * domain is declared), then melted back to rows with `unpivot`. The
    * null cells a pivot manufactures for absent (month, status) combos
    * are filtered after the melt, so the roundtrip is exactly the plain
    * grouped form the oracle computes — proving the two reshapes are
    * lossless inverses. Pivot compiles to ONE aggregate pass
    * (conditional sums), not a join per status. */
  val q103 = Query(
    "q103_pivot_roundtrip",
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |  o_orderstatus AS status,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val wide = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sumMoney(col("o_totalprice")))
    wide.unpivot(Array(col("month")),
        Array(col("F"), col("O"), col("P")), "status", "revenue")
      .filter(col("revenue").isNotNull)
  }

  /** Record linkage ([[graft.operators.Linkage.fuzzyJoin]]): a "CRM"
    * side is derived from part names with a deterministic first-char
    * corruption (ucfirst), then fuzzy-joined back to the clean dim —
    * blocked on (length, chars 2..8), which is invariant under the
    * injected corruption, verified by `levenshtein <= 2` on candidates
    * only (never all-pairs). The summary counts pairs by distance and
    * how many link back to their own source row vs a colliding
    * look-alike — the precision profile an entity-resolution pass
    * reports before anyone trusts auto-merges. */
  val q104 = Query(
    "q104_fuzzy_join",
    """WITH clean AS (SELECT p_partkey, p_name FROM part),
      |dirty AS (
      |  SELECT p_partkey AS crm_id,
      |    upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS crm_name
      |  FROM part),
      |cand AS (
      |  SELECT crm_id, p_partkey,
      |    levenshtein(crm_name, p_name) AS dist
      |  FROM dirty JOIN clean
      |    ON CAST(length(crm_name) AS VARCHAR) || ':' ||
      |       substr(crm_name, 2, 7) =
      |       CAST(length(p_name) AS VARCHAR) || ':' || substr(p_name, 2, 7))
      |SELECT CAST(dist AS BIGINT) AS dist,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN crm_id = p_partkey THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_self,
      |  CAST(COUNT(DISTINCT crm_id) AS BIGINT) AS n_crm_matched
      |FROM cand WHERE dist <= 2 GROUP BY 1""".stripMargin) { (s, dir) =>
    // value-level form (Linkage.fuzzyJoinValues): p_name is massively
    // repeated (64 distinct values over 20k rows at sf0.1), so the
    // row-level block join would pay ~6.3M levenshteins; the distinct-
    // value join pays ≤ 64² and recovers every row-level statistic as
    // an exact weighted sum. The oracle stays row-level — the semantic
    // ground truth the compression must reproduce bit for bit.
    val clean = Tables.part(s, dir).select(col("p_name"))
    val dirty = Tables.part(s, dir).select(
      concat(upper(substring(col("p_name"), 1, 1)),
        expr("substring(p_name, 2)")).as("crm_name"))
    val block = (c: org.apache.spark.sql.Column) =>
      concat(length(c).cast("string"), lit(":"), substring(c, 2, 7))
    val pairs = graft.operators.Linkage
      .fuzzyJoinValues(dirty, "crm_name", clean, "p_name", block, 2)
      // the diagonal: value pairs of the form (corrupt(x), x) hold the
      // row-level self matches (crm_id = p_partkey), one per clean row
      .withColumn("__self_rn",
        when(concat(upper(substring(col("p_name"), 1, 1)),
          expr("substring(p_name, 2)")) === col("crm_name"),
          col("__rn")).otherwise(lit(0L)))
    // a crm id matches at a given dist iff its VALUE has a pair there:
    // group by (dist, value) first so each value's ids count once
    val perValue = pairs.groupBy(col("__dist"), col("crm_name"),
        col("__ln"))
      .agg(sum(col("__ln") * col("__rn")).as("__pairs"),
        sum(col("__self_rn")).as("__self"))
    perValue.groupBy(col("__dist").cast("long").as("dist"))
      .agg(sum(col("__pairs")).as("n_pairs"),
        sum(col("__self")).as("n_self"),
        sum(col("__ln")).as("n_crm_matched"))
  }

  // ------------------------------------------------------------ q137

  /** CDC changelog apply ([[graft.operators.Cdc]]): base snapshot +
    * I/U/D change stream → current state, highest-seq-wins, winning D
    * removes the key, U/I on an absent key upserts. The fixture
    * derives a deterministic changelog from `orders` via the portable
    * md5 hash (70% of keys in base; updates, double-updates, deletes,
    * and late inserts from disjoint hash classes), so the oracle
    * replays the exact apply. One shuffle; the reducer is a
    * map-combinable `max(struct(seq, …))`, not a window. */
  val q137 = Query(
    "q137_cdc_apply",
    s"""WITH h AS (
       |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p0,
       |    ${Llm.dHash64("'cdc:' || CAST(o_orderkey AS VARCHAR)")} % 100
       |      AS h
       |  FROM orders),
       |base AS (SELECT o_orderkey, p0 AS price FROM h WHERE h < 70),
       |log AS (
       |  SELECT o_orderkey, 1 AS seq, 'U' AS op,
       |    CAST(p0 + 1.00 AS DECIMAL(18,2)) AS price
       |  FROM h WHERE h % 7 IN (0, 2)
       |  UNION ALL
       |  SELECT o_orderkey, 2, 'U', CAST(p0 * 2 AS DECIMAL(18,2))
       |  FROM h WHERE h % 7 = 2
       |  UNION ALL
       |  SELECT o_orderkey, 1, 'D', NULL FROM h WHERE h % 7 = 1
       |  UNION ALL
       |  SELECT o_orderkey, 1, 'I', p0 FROM h WHERE h >= 70 AND h % 7 = 3),
       |u AS (
       |  SELECT o_orderkey, seq, op, price FROM (
       |    SELECT o_orderkey, seq, op, price, row_number() OVER (
       |      PARTITION BY o_orderkey ORDER BY seq DESC) AS rk
       |    FROM (
       |      SELECT o_orderkey, -1 AS seq, 'I' AS op, price FROM base
       |      UNION ALL SELECT * FROM log))
       |  WHERE rk = 1),
       |cnt AS (SELECT o_orderkey, COUNT(*) AS n_ops FROM log GROUP BY 1)
       |SELECT u.o_orderkey, CAST(u.price AS DOUBLE) AS price,
       |  CAST(u.seq AS BIGINT) AS last_seq,
       |  CAST(COALESCE(cnt.n_ops, 0) AS BIGINT) AS n_ops
       |FROM u LEFT JOIN cnt USING (o_orderkey)
       |WHERE u.op <> 'D'""".stripMargin) { (s, dir) =>
    val h = Tables.orders(s, dir).select(
      col("o_orderkey"),
      money(col("o_totalprice")).as("p0"),
      (md5Long(concat(lit("cdc:"), col("o_orderkey").cast("string")))
        % 100).as("h"))
    val base = h.filter(col("h") < 70)
      .select(col("o_orderkey"), col("p0").as("price"))
    def leg(pred: Column, seq: Int, op: String, price: Column) =
      h.filter(pred).select(col("o_orderkey"), lit(seq).as("seq"),
        lit(op).as("op"), money(price).as("price"))
    val changelog = leg(col("h") % 7 === 0 || col("h") % 7 === 2, 1, "U",
        col("p0") + lit(BigDecimal("1.00")))
      .unionByName(leg(col("h") % 7 === 2, 2, "U", col("p0") * 2))
      .unionByName(leg(col("h") % 7 === 1, 1, "D", lit(null)))
      .unionByName(leg(col("h") >= 70 && col("h") % 7 === 3, 1, "I",
        col("p0")))
    Cdc.apply(base, changelog, Seq("o_orderkey"), "seq", "op")
      .select(col("o_orderkey"), col("price").cast("double").as("price"),
        col("last_seq"), col("n_ops"))
  }

  // ------------------------------------------------------------ q150

  /** Survivorship merge ([[graft.operators.Cdc.survivorship]], the
    * MDM golden record): three partially-populated source records per
    * customer (legacy / CRM / app, with deterministic field nulls and
    * recency seqs) merge into one — per FIELD, the most recent
    * non-null value wins; a field null everywhere stays null. Both
    * engines' argmax-by-presence (`max_by` / `arg_max`) skip
    * null-ordered rows, which IS the survivorship rule. One
    * partial-aggregatable shuffle. */
  val q150 = Query(
    "q150_survivorship_golden",
    s"""WITH h AS (
       |  SELECT c_custkey, c_name, c_mktsegment,
       |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
       |    ${Llm.dHash64("'gr:' || CAST(c_custkey AS VARCHAR)")} % 60
       |      AS h
       |  FROM customer),
       |recs AS (
       |  SELECT c_custkey, 1 AS seq, c_name AS name,
       |    CASE WHEN h % 3 = 0 THEN NULL ELSE bal END AS acctbal,
       |    c_mktsegment AS segment
       |  FROM h
       |  UNION ALL
       |  SELECT c_custkey, 2,
       |    CASE WHEN h % 2 = 0 THEN NULL ELSE upper(c_name) END,
       |    NULL,
       |    CASE WHEN h % 4 = 0 THEN 'UNKNOWN' ELSE NULL END
       |  FROM h
       |  UNION ALL
       |  SELECT c_custkey, 3, NULL,
       |    CAST(bal + 1.00 AS DECIMAL(18,2)), NULL
       |  FROM h WHERE h % 5 = 0)
       |SELECT c_custkey,
       |  arg_max(name, CASE WHEN name IS NOT NULL THEN seq END) AS name,
       |  CAST(arg_max(acctbal, CASE WHEN acctbal IS NOT NULL THEN seq END)
       |    AS DOUBLE) AS acctbal,
       |  arg_max(segment, CASE WHEN segment IS NOT NULL THEN seq END)
       |    AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS n_records,
       |  CAST(MAX(seq) AS BIGINT) AS last_seq
       |FROM recs GROUP BY 1""".stripMargin) { (s, dir) =>
    val h = Tables.customer(s, dir).select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      money(col("c_acctbal")).as("bal"),
      (md5Long(concat(lit("gr:"), col("c_custkey").cast("string")))
        % 60).as("h"))
    def rec(seq: Int, name: Column, bal: Column, seg: Column,
        src: DataFrame = h) =
      src.select(col("c_custkey"), lit(seq.toLong).as("seq"),
        name.as("name"), money(bal).as("acctbal"), seg.as("segment"))
    val recs = rec(1, col("c_name"),
        when(col("h") % 3 === 0, lit(null)).otherwise(col("bal")),
        col("c_mktsegment"))
      .unionByName(rec(2,
        when(col("h") % 2 === 0, lit(null)).otherwise(upper(col("c_name"))),
        lit(null), when(col("h") % 4 === 0, lit("UNKNOWN"))
          .otherwise(lit(null))))
      .unionByName(rec(3, lit(null),
        col("bal") + lit(BigDecimal("1.00")), lit(null),
        h.filter(col("h") % 5 === 0)))
    Cdc.survivorship(recs, Seq("c_custkey"), "seq")
      .select(col("c_custkey"), col("name"),
        col("acctbal").cast("double").as("acctbal"), col("segment"),
        col("n_records"), col("last_seq"))
  }

  val all: Seq[Query] = Seq(q5, q6, q7, q8, q9, q10, q11, q12, q13, q14,
    q15, q16, q17, q18, q19, q20, q63, q64, q65, q66, q67, q68, q70,
    q73, q75, q103, q104, q137, q150, q204, q206)
}
