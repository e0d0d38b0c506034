package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Functions.money
import graft.operators.Graph
import graft.sources.Tables

/** Warehouse-analytics extensions: the maintenance and analysis passes a
  * mature engine runs over the same marts the reference builds — stats
  * collection for the catalog (the input to any cost-based decision),
  * rolling time-range windows, and closed-form per-segment trend fits.
  *
  * Reference basis: the dbt project's marts are consumed by BI-style
  * queries (reference `README.md:12,59` — "analytics-ready marts",
  * test/audit culture); these queries are the standard follow-ons every
  * warehouse runs on such marts. Everything here follows the repo-wide
  * determinism contract: exact integer/decimal aggregation first, double
  * arithmetic only as a fixed sequence of single IEEE ops at the end, so
  * DuckDB replays every value bit for bit.
  */
object Analytics {

  // ------------------------------------------------------------ q106

  private val StatNumCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val StatStrCols = Seq("l_returnflag", "l_linestatus")
  private val StatDateCols = Seq("l_shipdate")

  /** ANALYZE-style stats catalog for `lineitem`: per column, row/null
    * counts, EXACT distinct count, and min/max (numerics and dates in
    * one double-typed pair — dates as days since epoch — strings in a
    * varchar pair).
    *
    * Plan shape: one aggregate pass PER COLUMN, unioned. With parquet
    * column pruning each pass reads exactly one column, so the total
    * bytes scanned equal one full-width pass — while avoiding the N-way
    * `Expand` blowup a single multi-`count_distinct` aggregate plans
    * (which would multiply every input row by the number of columns
    * before the shuffle). Each per-column aggregate is an ordinary
    * 2-phase (partial/final) hash aggregate. At 100 TB the same shape
    * holds; swap exact NDV for the HLL sketch (q39's operator) when
    * ±2% is acceptable — the pass structure is unchanged. */
  val q106 = Query(
    "q106_table_stats", {
      def num(c: String, minMax: String => String) =
        s"""SELECT '$c' AS column_name,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN(${minMax(c)}) AS DOUBLE) AS min_num,
           |  CAST(MAX(${minMax(c)}) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str,
           |  CAST(NULL AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS column_name,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  MIN($c) AS min_str, MAX($c) AS max_str
           |FROM lineitem""".stripMargin
      (StatNumCols.map(num(_, identity)) ++
        StatDateCols.map(num(_,
          c => s"(CAST($c AS DATE) - DATE '1970-01-01')")) ++
        StatStrCols.map(str)).mkString("\nUNION ALL\n")
    }) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    def base(c: String) = (
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_nulls"),
      count_distinct(col(c)).as("n_distinct"))
    def num(c: String, v: Column): DataFrame = {
      val (r, n, d) = base(c)
      li.select(v.as(c)).agg(r, n, d,
          min(col(c)).cast("double").as("min_num"),
          max(col(c)).cast("double").as("max_num"))
        .select(lit(c).as("column_name"), col("*"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
    }
    def str(c: String): DataFrame = {
      val (r, n, d) = base(c)
      li.select(col(c)).agg(r, n, d, min(col(c)).as("min_str"),
          max(col(c)).as("max_str"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"), col("min_str"),
          col("max_str"))
    }
    val parts =
      StatNumCols.map(c => num(c, col(c))) ++
        StatDateCols.map(c => num(c,
          datediff(col(c).cast("date"), lit("1970-01-01").cast("date")))) ++
        StatStrCols.map(str)
    parts.reduce(_.unionAll(_))
  }

  // ------------------------------------------------------------ q110

  /** Day number since epoch for `l_shipdate` — the integer RANGE-frame
    * order key both engines compute identically. */
  private def dayNum(c: Column): Column =
    datediff(c.cast("date"), lit("1970-01-01").cast("date"))

  /** 7-day rolling revenue per return flag: a time-RANGE window frame
    * (`RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` on the day number),
    * the standard BI rolling-average shape.
    *
    * Scale posture: the window runs over the PRE-AGGREGATED daily frame
    * (≤ one row per flag × day — bounded by the calendar, not the
    * data), never the fact table; the fact-side work is one map-side-
    * combinable group-by. Rolling sums stay decimal inside the frame,
    * so the result is exact regardless of frame-evaluation order. */
  val q110 = Query(
    "q110_rolling_window",
    """WITH d AS (
      |  SELECT l_returnflag AS flag,
      |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS day_num,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT flag, CAST(day_num AS INT) AS day_num,
      |  CAST(rev AS DOUBLE) AS day_revenue,
      |  CAST(SUM(rev) OVER w AS DOUBLE) AS rolling_7d,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_days_in_window
      |FROM d WINDOW w AS (PARTITION BY flag ORDER BY day_num
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, dir) =>
    val daily = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"),
        dayNum(col("l_shipdate")).as("day_num"))
      .agg(sum(money(col("l_extendedprice"))).as("rev"))
    val w = Window.partitionBy(col("flag")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily.select(col("flag"), col("day_num"),
      col("rev").cast("double").as("day_revenue"),
      sum(col("rev")).over(w).cast("double").as("rolling_7d"),
      count(lit(1)).over(w).cast("long").as("n_days_in_window"))
  }

  // ------------------------------------------------------------ q112

  private val D38 = DecimalType(38, 0)

  /** Per-segment trend line: closed-form OLS of daily revenue against
    * the day index, per return flag — slope (revenue drift per day) and
    * the fitted value at the segment's last day.
    *
    * Determinism contract: every regression input is EXACT — revenue in
    * integer cents, day index x centered on the segment's first day
    * (which also keeps Σxy within 64 bits at warehouse scale), all five
    * sums integer. The normal-equation numerator/denominator are
    * decimal(38) products of those sums; only then does each engine
    * perform the IDENTICAL fixed sequence of double ops (cast, divide,
    * multiply-subtract), so slope/intercept/fit hash-match without any
    * rounding tolerance. At 100 TB the shape is unchanged: the daily
    * pre-aggregate is calendar-bounded, the regression runs on ≤ days
    * rows per segment. */
  val q112 = Query(
    "q112_segment_trend",
    """WITH d AS (
      |  SELECT l_returnflag AS flag,
      |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS day_num,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS cents
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT flag, day_num - MIN(day_num) OVER (PARTITION BY flag)
      |      AS x, cents
      |  FROM d),
      |sums AS (
      |  SELECT flag, CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(x) AS HUGEINT) AS sx,
      |    CAST(SUM(CAST(x AS BIGINT) * x) AS HUGEINT) AS sxx,
      |    CAST(SUM(cents) AS HUGEINT) AS sy,
      |    CAST(SUM(x * cents) AS HUGEINT) AS sxy,
      |    MAX(x) AS mx
      |  FROM c GROUP BY 1),
      |fit AS (
      |  SELECT flag, n, mx,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_c,
      |    CAST(sy AS DOUBLE) AS sy_d, CAST(sx AS DOUBLE) AS sx_d
      |  FROM sums)
      |SELECT flag, CAST(n AS BIGINT) AS n_days,
      |  slope_c / 100.0 AS slope_per_day,
      |  ((sy_d - slope_c * sx_d) / CAST(n AS DOUBLE)
      |    + slope_c * CAST(mx AS DOUBLE)) / 100.0 AS fit_end
      |FROM fit""".stripMargin) { (s, dir) =>
    val daily = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"),
        dayNum(col("l_shipdate")).as("day_num"))
      .agg(sum((money(col("l_extendedprice")) * 100).cast("long"))
        .as("cents"))
    val d0 = daily.groupBy(col("flag")).agg(min(col("day_num")).as("d0"))
    val c = daily.join(broadcast(d0), "flag")
      .select(col("flag"), (col("day_num") - col("d0")).as("x"),
        col("cents"))
    val sums = c.groupBy(col("flag")).agg(
      count(lit(1)).cast(D38).as("n"),
      sum(col("x")).cast(D38).as("sx"),
      sum(col("x").cast("long") * col("x")).cast(D38).as("sxx"),
      sum(col("cents")).cast(D38).as("sy"),
      sum(col("x") * col("cents")).cast(D38).as("sxy"),
      max(col("x")).as("mx"))
    val fit = sums.select(col("flag"), col("n"), col("mx"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope_c"),
      col("sy").cast("double").as("sy_d"),
      col("sx").cast("double").as("sx_d"))
    fit.select(col("flag"), col("n").cast("long").as("n_days"),
      (col("slope_c") / 100.0).as("slope_per_day"),
      (((col("sy_d") - col("slope_c") * col("sx_d")) /
        col("n").cast("double")) +
        col("slope_c") * col("mx").cast("double")).divide(100.0)
        .as("fit_end"))
  }

  // ------------------------------------------------------------ q107

  private val CmD = 4 // Count-Min hash rows
  private val CmW = 256 // Count-Min buckets per row

  /** DuckDB fragment: the Count-Min bucket of key expression `k` under
    * hash row `r` (mirror of `Sketch`'s Carter-Wegman pair). */
  private def dCmBucket(r: String, k: String) = {
    def h(seed: String) =
      s"('0x' || substr(md5('$seed:' || CAST($k AS VARCHAR)), 1, 15))" +
        "::BIGINT"
    s"((${h("cm1")} + $r * (${h("cm2")} % ${1L << 50})) % $CmW)"
  }

  /** Heavy hitters through a Count-Min sketch ([[Sketch]]): the exact
    * top-20 part keys by lineitem frequency, each with its sketch
    * estimate and the (always ≥ 0) collision overcount — the
    * measured-accuracy view of the sketch the reference's whale-skew
    * checks would use at scale (reference `pseudo_code_rules.txt:47-50`).
    *
    * Scale posture: the sketch build shuffles ≤ d·w = 1024 cells per
    * task regardless of key cardinality; probes join against the
    * BROADCAST sketch; the exact side (here, the ground truth being
    * audited) goes through the distributed rank, not a single-partition
    * window. The md5-derived buckets make the sketch itself — not just
    * the exact counts — engine-portable, so the oracle replays every
    * cell. */
  val q107 = Query(
    "q107_heavy_hitters", {
      val ranges = s"(SELECT UNNEST(range($CmD)) AS r)"
      s"""WITH ex AS (
         |  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
         |  FROM lineitem GROUP BY 1),
         |top AS (
         |  SELECT k, exact_cnt,
         |    ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, k) AS rnk
         |  FROM ex QUALIFY rnk <= 20),
         |sk AS (
         |  SELECT r, ${dCmBucket("r", "l_partkey")} AS b,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lineitem CROSS JOIN $ranges GROUP BY 1, 2)
         |SELECT t.k AS l_partkey, CAST(t.rnk AS BIGINT) AS rnk,
         |  t.exact_cnt, CAST(MIN(sk.c) AS BIGINT) AS est_cnt,
         |  CAST(MIN(sk.c) - t.exact_cnt AS BIGINT) AS overcount
         |FROM top t CROSS JOIN $ranges rr
         |JOIN sk ON sk.r = rr.r AND sk.b = ${dCmBucket("rr.r", "t.k")}
         |GROUP BY 1, 2, 3""".stripMargin
    }) { (s, dir) =>
    import graft.operators.{InternalCache, Ranking, Sketch}
    val li = Tables.lineitem(s, dir)
    // the rank reads the exact counts twice (range + counts legs)
    val exact = InternalCache.persist(
      li.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_cnt")))
    val top = Ranking.withGlobalRank(exact,
        struct((col("exact_cnt") * -1).as("nc"),
          col("l_partkey").as("k")).asc, "rnk")
      .filter(col("rnk") <= 20)
    val sk = Sketch.countMin(li, col("l_partkey"), CmD, CmW)
    Sketch.estimate(sk, top, "l_partkey", CmD, CmW)
      .select(col("l_partkey"), col("rnk"), col("exact_cnt"),
        col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }

  // ------------------------------------------------------------ q111

  /** The part↔supplier sourcing graph — distinct lineitem (part,
    * supplier) pairs as bidirectional edges — shared by PageRank (q111)
    * and BFS reach (q179) through [[graft.operators.SharedFrames]]: a
    * pipeline materializes the edge table once, every graph consumer
    * reads it. Also the cold-start fix: the first graph query pays the
    * lineitem scan + distinct exactly once per run. */
  private def partSupplierEdges(s: SparkSession, dir: String): DataFrame =
    graft.operators.SharedFrames.getOrBuild(
      graft.operators.SharedFrames.key(s, "psEdges", dir)) {
      val pe = Tables.lineitem(s, dir).select(
        concat(lit("p:"), col("l_partkey").cast("string")).as("a"),
        concat(lit("s:"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      pe.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pe.select(col("b").as("src"), col("a").as("dst")))
    }

  private val PrIters = 3

  /** PageRank over the part↔supplier sourcing graph ([[Graph]]):
    * distinct lineitem (part, supplier) pairs as bidirectional edges,
    * [[PrIters]] damped fixed-point rounds, top-20 nodes. Which parts /
    * suppliers sit at the center of the sourcing network — the graph
    * question behind the reference's supplier mart joins
    * (reference `models/example` SQL models).
    *
    * The oracle unrolls the SAME [[PrIters]] integer-arithmetic rounds
    * as nested CTEs, so the fixed-point ranks match exactly — no float
    * tolerance anywhere. Top-20 via the distributed rank. */
  val q111 = Query(
    "q111_pagerank", {
      val S = Graph.ScaleSqlLiteral
      def round(prev: String, out: String) =
        s"""$out AS (
           |  SELECT n2.node,
           |    (15 * ($S // nn.n)) // 100
           |      + (85 * COALESCE(m.s, 0)) // 100 AS pr
           |  FROM nodes n2
           |  LEFT JOIN (
           |    SELECT e.dst AS node, SUM(p.pr // d.deg) AS s
           |    FROM e JOIN $prev p ON p.node = e.src
           |      JOIN deg d ON d.src = e.src
           |    GROUP BY 1) m ON m.node = n2.node
           |  CROSS JOIN nn)"""
      val rounds = (1 to PrIters)
        .map(i => round(if (i == 1) "p0" else s"it${i - 1}", s"it$i"))
        .mkString(",\n")
      s"""WITH pe AS (
         |  SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS a,
         |    's:' || CAST(l_suppkey AS VARCHAR) AS b
         |  FROM lineitem),
         |e AS (SELECT a AS src, b AS dst FROM pe
         |  UNION ALL SELECT b, a FROM pe),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM e GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |p0 AS (SELECT node, $S // nn.n AS pr FROM nodes CROSS JOIN nn),
         |$rounds,
         |ranked AS (
         |  SELECT node, pr,
         |    ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS rnk
         |  FROM it$PrIters QUALIFY rnk <= 20)
         |SELECT node, CAST(rnk AS BIGINT) AS rnk,
         |  CAST(pr AS BIGINT) AS pr_fixed,
         |  CAST(pr AS DOUBLE) / 1000000000000.0 AS pr
         |FROM ranked""".stripMargin
    }) { (s, dir) =>
    import graft.operators.{Graph, Ranking}
    val edges = partSupplierEdges(s, dir)
    val pr = Graph.pageRankFixed(edges, PrIters)
    Ranking.withGlobalRank(pr,
        struct((col("pr") * -1).as("np"), col("node").as("n")).asc, "rnk")
      .filter(col("rnk") <= 20)
      .select(col("node"), col("rnk"), col("pr").as("pr_fixed"),
        (col("pr").cast("double") / lit(1.0e12)).as("pr"))
  }

  // ------------------------------------------------------------ q113

  private val DvB = 64 // divergence histogram buckets

  /** Per-source token-distribution divergence vs the whole corpus:
    * smoothed hashed-unigram histograms ([[DvB]] buckets, the q95 DSIR
    * representation), KL both directions and Jensen-Shannon — the
    * domain-shift monitor a training-data pipeline runs when a new
    * source lands.
    *
    * Scale posture: the only fact-side work is one map-side-combinable
    * (source × bucket) count; everything after runs on ≤ sources ×
    * [[DvB]] rows with broadcast-only joins. Determinism: bucket counts
    * are exact integers, each p/q is a single division, and the final
    * sums run over [[DvB]] terms rounded at 6 dp — the q94/q95 ln()
    * contract. */
  val q113 = Query(
    "q113_source_divergence", {
      val h = Llm.dHash64("'dv:' || w")
      s"""WITH tok AS (
         |  SELECT source, UNNEST(${Llm.DTokens}) AS w FROM documents),
         |tb AS (
         |  SELECT source, $h % $DvB AS b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2),
         |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot
         |  FROM tb GROUP BY 1),
         |qb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS qc FROM tb GROUP BY 1),
         |qt AS (SELECT CAST(SUM(c) AS BIGINT) AS qtot FROM tb),
         |grid AS (
         |  SELECT s.source, g.b
         |  FROM (SELECT DISTINCT source FROM documents) s
         |  CROSS JOIN (SELECT UNNEST(range($DvB)) AS b) g),
         |terms AS (
         |  SELECT grid.source, st.tot,
         |    (COALESCE(tb.c, 0) + 1.0) / (st.tot + $DvB.0) AS p,
         |    (COALESCE(qb.qc, 0) + 1.0) / (qt.qtot + $DvB.0) AS q
         |  FROM grid
         |  LEFT JOIN tb ON tb.source = grid.source AND tb.b = grid.b
         |  JOIN st ON st.source = grid.source
         |  LEFT JOIN qb ON qb.b = grid.b
         |  CROSS JOIN qt)
         |SELECT source, CAST(MAX(tot) AS BIGINT) AS n_tokens,
         |  round(SUM(p * ln(p / q)), 6) AS kl_pq,
         |  round(SUM(q * ln(q / p)), 6) AS kl_qp,
         |  round(SUM(0.5 * p * ln(p / ((p + q) / 2))
         |    + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS js
         |FROM terms GROUP BY 1""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Functions.{md5Long, tokens}
    import graft.operators.InternalCache
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("source"),
      explode(tokens(col("text"))).as("w"))
    val tb = InternalCache.persist(
      tok.groupBy(col("source"),
          (md5Long(concat(lit("dv:"), col("w"))) % DvB).as("b"))
        .agg(count(lit(1)).as("c")))
    val st = tb.groupBy(col("source")).agg(sum(col("c")).as("tot"))
    val qb = tb.groupBy(col("b")).agg(sum(col("c")).as("qc"))
    val qt = tb.agg(sum(col("c")).as("qtot"))
    val grid = docs.select(col("source")).distinct()
      .withColumn("b", explode(sequence(lit(0), lit(DvB - 1))))
    val terms = grid
      .join(tb, Seq("source", "b"), "left")
      .join(broadcast(st), Seq("source"))
      .join(broadcast(qb), Seq("b"), "left")
      .crossJoin(broadcast(qt))
      .select(col("source"), col("tot"),
        ((coalesce(col("c"), lit(0L)) + 1.0) / (col("tot") + lit(DvB)
          .cast("double"))).as("p"),
        ((coalesce(col("qc"), lit(0L)) + 1.0) / (col("qtot") + lit(DvB)
          .cast("double"))).as("q"))
    terms.groupBy(col("source")).agg(
      max(col("tot")).cast("long").as("n_tokens"),
      round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl_pq"),
      round(sum(col("q") * log(col("q") / col("p"))), 6).as("kl_qp"),
      round(sum(lit(0.5) * col("p") * log(col("p") /
          ((col("p") + col("q")) / 2)) +
        lit(0.5) * col("q") * log(col("q") /
          ((col("p") + col("q")) / 2))), 6).as("js"))
  }

  // ------------------------------------------------------------ q108

  /** ORC sink + reload (S1/S2 format breadth beyond CSV/JSON/parquet):
    * a two-column projection written as PARTITIONED ORC (directory per
    * return flag), re-read through partition discovery, aggregated.
    * The oracle computes the same mart from the parquet source — any
    * loss in the ORC writer/reader roundtrip (values, partition-column
    * reconstruction) would mismatch. Doubles survive ORC bit-exact
    * (binary format); money still goes through exact decimal sums. */
  val q108 = Query(
    "q108_orc_roundtrip",
    """SELECT l_returnflag AS flag,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS gross
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.sumMoney
    import graft.sources.Ingest
    val path = s"/tmp/graft_orc_sink_${math.abs(dir.hashCode)}"
    Ingest.deletePath(s, path)
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .write.mode("overwrite").partitionBy("l_returnflag").orc(path)
    s.read.orc(path)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("gross"))
  }

  // ------------------------------------------------------------ q109

  private val SjWithinMin = 60

  /** Stream-stream interval join ([[graft.streaming.Streaming
    * .intervalJoinAvailableNow]]): view events joined to the same
    * user's purchase events landing within [[SjWithinMin]] minutes —
    * the streaming form of the reference's view→purchase attribution
    * window (reference `pseudo_code_rules.txt:29-33`). Both streams are
    * watermarked so a continuous deployment bounds its join state; the
    * emitted pairs equal the batch interval join the oracle runs. */
  val q109 = Query(
    "q109_stream_interval_join",
    s"""WITH v AS (
       |  SELECT event_id, user_id, ts FROM events
       |  WHERE event_type = 'view'),
       |p AS (
       |  SELECT event_id, user_id, ts FROM events
       |  WHERE event_type = 'purchase')
       |SELECT v.event_id AS l_id, p.event_id AS r_id,
       |  v.user_id AS user_id,
       |  (epoch_us(p.ts) - epoch_us(v.ts)) // 60000000 AS lag_minutes
       |FROM v JOIN p ON v.user_id = p.user_id
       |  AND p.ts >= v.ts
       |  AND p.ts <= v.ts + INTERVAL $SjWithinMin MINUTES""".stripMargin) {
    (s, dir) =>
    graft.streaming.Streaming.intervalJoinAvailableNow(
      s, s"$dir/events.parquet", "view", "purchase", SjWithinMin)
  }

  // ------------------------------------------------------------ q114

  private val ContThreshold = 0.8

  /** Near-SUPERSET detection via shingle containment: for every
    * verified LSH candidate pair, containment = |A∩B| / min(|A|,|B|)
    * (the smaller doc's coverage by the larger). A doc embedded inside
    * a bigger one scores containment ≈ 1 while its Jaccard stays low —
    * the doc-in-doc duplication Jaccard-threshold dedup (q23) misses
    * by design. Pairs at containment ≥ [[ContThreshold]], with both
    * set sizes, the overlap, and the Jaccard for contrast.
    *
    * Scale posture: ZERO new pipeline cost — rides the one shared
    * verified minhash pair frame (sizes and overlap were carried
    * through the verify join), so this is a filter over an
    * already-built bounded frame. Determinism: exact integer sizes,
    * one division, the repo's raw-threshold/rounded-presentation
    * contract. */
  val q114 = Query(
    "q114_containment_pairs",
    s"""${Llm.minhashJacCtes("AND a.doc_id < b.doc_id")}
       |SELECT doc_a, doc_b,
       |  CAST(sz_a AS BIGINT) AS sz_a, CAST(sz_b AS BIGINT) AS sz_b,
       |  CAST(ovl AS BIGINT) AS ovl,
       |  ROUND(ovl::DOUBLE / least(sz_a, sz_b)::DOUBLE, 6)
       |    AS containment,
       |  ROUND(j, 6) AS jaccard
       |FROM jac
       |WHERE ovl::DOUBLE / least(sz_a, sz_b)::DOUBLE
       |  >= $ContThreshold""".stripMargin) { (s, dir) =>
    Llm.minhashPairsAllShared(s, dir)
      .withColumn("__cont", col("ovl").cast("double") /
        least(col("sz_a"), col("sz_b")).cast("double"))
      .filter(col("__cont") >= ContThreshold)
      .select(col("doc_a"), col("doc_b"),
        col("sz_a").cast("long").as("sz_a"),
        col("sz_b").cast("long").as("sz_b"),
        col("ovl").cast("long").as("ovl"),
        round(col("__cont"), 6).as("containment"), col("jaccard"))
  }

  // ------------------------------------------------------------ q115

  private val WavSamples = 8
  private val WavRates = Seq(8000, 12000, 16000, 20000)

  /** 4-byte little-endian hex of an int (WAV header fields). */
  private def le4(v: Int): String =
    f"${v & 255}%02X${(v >> 8) & 255}%02X${(v >> 16) & 255}%02X${(v >> 24) & 255}%02X"

  /** The audio-side multimodal container path (q59's PNG twin): each
    * doc's deterministic PCM payload is wrapped in REAL RIFF/WAV bytes
    * (44-byte header, 16-bit mono, per-doc sample rate), then the
    * header fields AND the samples are parsed back OUT OF THE BYTES —
    * the byte-level metadata/feature extraction an audio ingest runs
    * before any codec (here there is no codec at all: PCM in a RIFF
    * container IS the raw format). Frame energy Σv² is an exact
    * integer, checksummed across the corpus with order-independent
    * `bit_xor`. All row-local byte arithmetic — one scan, no joins;
    * the oracle rebuilds and reparses identical bytes in SQL. */
  val q115 = Query(
    "q115_wav_audio_frames", {
      def h(e: String) = Llm.dHash64(e)
      val dataBytes = WavSamples * 2
      // per-sample 16-bit LE hex from the portable hash
      val sampleHex = (0 until WavSamples).map { i =>
        val sv = s"(${h(s"'wavs:$i:' || text")} % 65536)"
        s"lpad(hex($sv % 256), 2, '0') || lpad(hex($sv // 256), 2, '0')"
      }.mkString(" || ")
      val rateCase = WavRates.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN '${le4(r)}'" }
        .mkString("CASE rate_idx ", " ", " END")
      val byteRateCase = WavRates.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN '${le4(2 * r)}'" }
        .mkString("CASE rate_idx ", " ", " END")
      val rateValCase = WavRates.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString("CASE rate_idx ", " ", " END")
      // parsed sample i: LE bytes at hex positions 89+4i (lo), 91+4i (hi)
      def sVal(i: Int) =
        s"('0x' || substr(hx, ${91 + 4 * i}, 2) ||" +
          s" substr(hx, ${89 + 4 * i}, 2))::BIGINT"
      val energy = (0 until WavSamples).map { i =>
        val v = s"(CASE WHEN ${sVal(i)} > 32767 THEN ${sVal(i)} - 65536" +
          s" ELSE ${sVal(i)} END)"
        s"$v * $v"
      }.mkString(" + ")
      def le4Parse(pos: Int) =
        s"('0x' || substr(hx, ${pos + 6}, 2) || substr(hx, ${pos + 4}, 2)" +
          s" || substr(hx, ${pos + 2}, 2) || substr(hx, $pos, 2))::BIGINT"
      s"""WITH m AS (
         |  SELECT text, ${h("'wavr:' || text")} % 4 AS rate_idx
         |  FROM documents),
         |w AS (
         |  SELECT $rateValCase AS rate,
         |    unhex('52494646' || '${le4(36 + dataBytes)}' || '57415645'
         |      || '666D7420' || '10000000' || '0100' || '0100'
         |      || $rateCase || $byteRateCase || '0200' || '1000'
         |      || '64617461' || '${le4(dataBytes)}' || $sampleHex)
         |      AS wav
         |  FROM m),
         |x AS (
         |  SELECT rate, octet_length(wav) AS nb, hex(wav) AS hx
         |  FROM w),
         |p AS (
         |  SELECT rate, nb,
         |    (substr(hx, 1, 8) = '52494646'
         |      AND substr(hx, 17, 8) = '57415645') AS riff_ok,
         |    ${le4Parse(49)} AS parsed_rate,
         |    ${le4Parse(81)} // 2 AS n_samples,
         |    $energy AS energy
         |  FROM x)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_audio,
         |  CAST(SUM(CASE WHEN riff_ok THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_valid_riff,
         |  CAST(SUM(CASE WHEN parsed_rate = rate THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_rate_ok,
         |  CAST(SUM(n_samples) AS BIGINT) AS total_samples,
         |  CAST(bit_xor(energy) AS BIGINT) AS energy_checksum,
         |  CAST(SUM(nb) AS BIGINT) AS total_bytes
         |FROM p""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Functions.md5Long
    val dataBytes = WavSamples * 2
    def le2hex(c: Column): Column =
      concat(lpad(hex(c % 256), 2, "0"),
        lpad(hex(shiftright(c, 8)), 2, "0"))
    val sampleHex = concat((0 until WavSamples).map { i =>
      le2hex(md5Long(concat(lit(s"wavs:$i:"), col("text"))) % 65536)
    }: _*)
    val rateIdx = md5Long(concat(lit("wavr:"), col("text"))) % 4
    def caseOf(f: Int => Column): Column =
      WavRates.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (acc, (r, i)) => when(col("rate_idx") === i, f(r)).otherwise(acc)
      }
    val m = Tables.documents(s, dir)
      .select(col("text"), rateIdx.as("rate_idx"))
    val w = m.select(
      WavRates.zipWithIndex.foldLeft(lit(-1)) { case (acc, (r, i)) =>
        when(col("rate_idx") === i, lit(r)).otherwise(acc)
      }.as("rate"),
      unhex(concat(
        lit("52494646"), lit(le4(36 + dataBytes)), lit("57415645"),
        lit("666D7420"), lit("10000000"), lit("0100"), lit("0100"),
        caseOf(r => lit(le4(r))), caseOf(r => lit(le4(2 * r))),
        lit("0200"), lit("1000"), lit("64617461"), lit(le4(dataBytes)),
        sampleHex)).as("wav"))
    val x = w.select(col("rate"), length(col("wav")).as("nb"),
      hex(col("wav")).as("hx"))
    def sValC(i: Int): Column =
      conv(concat(substring(col("hx"), 91 + 4 * i, 2),
        substring(col("hx"), 89 + 4 * i, 2)), 16, 10).cast("long")
    val energy = (0 until WavSamples).map { i =>
      val v = when(sValC(i) > 32767, sValC(i) - 65536).otherwise(sValC(i))
      v * v
    }.reduce(_ + _)
    def le4ParseC(pos: Int): Column =
      conv(concat(substring(col("hx"), pos + 6, 2),
        substring(col("hx"), pos + 4, 2),
        substring(col("hx"), pos + 2, 2),
        substring(col("hx"), pos, 2)), 16, 10).cast("long")
    val p = x.select(col("rate"), col("nb"),
      (substring(col("hx"), 1, 8) === "52494646" &&
        substring(col("hx"), 17, 8) === "57415645").as("riff_ok"),
      le4ParseC(49).as("parsed_rate"),
      (le4ParseC(81) / 2).cast("long").as("n_samples"),
      energy.as("energy"))
    p.agg(count(lit(1)).as("n_audio"),
      sum(when(col("riff_ok"), 1).otherwise(0)).cast("long")
        .as("n_valid_riff"),
      sum(when(col("parsed_rate") === col("rate"), 1).otherwise(0))
        .cast("long").as("n_rate_ok"),
      sum(col("n_samples")).cast("long").as("total_samples"),
      expr("bit_xor(energy)").cast("long").as("energy_checksum"),
      sum(col("nb")).cast("long").as("total_bytes"))
  }

  // ------------------------------------------------------------ q116

  /** Explicit GROUPING SETS with a grouping id (§2.4 completeness
    * beyond q4's ROLLUP and q72's CUBE): per-flag totals, per-status
    * totals, and the grand total in ONE pass — Spark plans a single
    * Expand + aggregate, the relational form of "compute these three
    * marts together". The grouping id is derived the portable way
    * (2·grouping(flag) + grouping(status)), not from engine-specific
    * `grouping_id()` bit order. */
  val q116 = Query(
    "q116_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |  COALESCE(l_linestatus, 'ALL') AS status,
      |  CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
      |    AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS gross
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
      .stripMargin) { (s, dir) =>
    import graft.functions.Functions.sumMoney
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg((lit(2) * grouping(col("l_returnflag")) +
          grouping(col("l_linestatus"))).cast("long").as("gid"),
        count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("gross"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("n_items"), col("gross"))
  }

  // ------------------------------------------------------------ q117

  /** Exact higher-moment statistics per return flag: variance,
    * skewness, kurtosis of the price distribution, computed from EXACT
    * integer power sums (cents, cents², cents³, cents⁴ in decimal(38)/
    * HUGEINT — never a streaming float variance, whose merge order
    * changes the result). The four sums are one map-side-combinable
    * aggregate; the moment formulas then run as an IDENTICAL fixed
    * sequence of double ops in both engines, so values match at 6 dp
    * without any variance-algorithm coupling. The scale shape is the
    * textbook distributed-moments pattern: power sums merge
    * associatively across any partitioning. */
  val q117 = Query(
    "q117_price_moments",
    """WITH c AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS v
      |  FROM lineitem),
      |s AS (
      |  SELECT flag, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(v AS HUGEINT)) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(v AS HUGEINT) * v * v) AS DOUBLE) AS s3,
      |    CAST(SUM(CAST(v AS HUGEINT) * v * v * v) AS DOUBLE) AS s4,
      |    CAST(COUNT(*) AS BIGINT) AS n_items
      |  FROM c GROUP BY 1),
      |m AS (
      |  SELECT flag, n_items, s1 / n AS mean,
      |    s2 / n - (s1 / n) * (s1 / n) AS m2,
      |    s3 / n - 3.0 * (s1 / n) * (s2 / n)
      |      + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
      |    s4 / n - 4.0 * (s1 / n) * (s3 / n)
      |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
      |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      |  FROM s)
      |SELECT flag, n_items,
      |  round(mean / 100.0, 6) AS mean_price,
      |  round(m2 / 10000.0, 6) AS variance,
      |  round(m3 / (sqrt(m2) * m2), 6) AS skewness,
      |  round(m4 / (m2 * m2), 6) AS kurtosis
      |FROM m""".stripMargin) { (s, dir) =>
    val c = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      (money(col("l_extendedprice")) * 100).cast("long").as("v"))
    val vd = col("v").cast(D38)
    val sums = c.groupBy(col("flag")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(vd).cast("double").as("s1"),
      sum(vd * col("v")).cast("double").as("s2"),
      sum(vd * col("v") * col("v")).cast("double").as("s3"),
      sum(vd * col("v") * col("v") * col("v")).cast("double").as("s4"),
      count(lit(1)).as("n_items"))
    def mn = col("s1") / col("n")
    val m = sums.select(col("flag"), col("n_items"), mn.as("mean"),
      (col("s2") / col("n") - mn * mn).as("m2"),
      (col("s3") / col("n") - lit(3.0) * mn * (col("s2") / col("n"))
        + lit(2.0) * mn * mn * mn).as("m3"),
      (col("s4") / col("n") - lit(4.0) * mn * (col("s3") / col("n"))
        + lit(6.0) * mn * mn * (col("s2") / col("n"))
        - lit(3.0) * mn * mn * mn * mn).as("m4"))
    m.select(col("flag"), col("n_items"),
      round(col("mean") / 100.0, 6).as("mean_price"),
      round(col("m2") / 10000.0, 6).as("variance"),
      round(col("m3") / (sqrt(col("m2")) * col("m2")), 6).as("skewness"),
      round(col("m4") / (col("m2") * col("m2")), 6).as("kurtosis"))
  }

  // ------------------------------------------------------------ q118

  /** Calendar gap-fill + forward fill over the event stream: each
    * event type's daily counts densified to its full [first, last] day
    * range (`sequence` + explode — the relational dimension-generate,
    * no driver loop), missing days zero-filled AND forward-filled with
    * the last observed count, flagged as gaps. The window runs over
    * calendar-bounded daily rows per type, partitioned — never the
    * event stream. The time-series-preparation operator every
    * BI/feature pipeline needs before resampling or joins against
    * dense series. */
  val q118 = Query(
    "q118_gap_fill",
    """WITH d AS (
      |  SELECT event_type,
      |    (CAST(ts AS DATE) - DATE '1970-01-01') AS day_num,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |b AS (
      |  SELECT event_type, MIN(day_num) AS d0, MAX(day_num) AS d1
      |  FROM d GROUP BY 1),
      |g AS (
      |  SELECT b.event_type, UNNEST(range(b.d0, b.d1 + 1)) AS day_num
      |  FROM b),
      |j AS (
      |  SELECT g.event_type, g.day_num, d.c
      |  FROM g LEFT JOIN d
      |    ON d.event_type = g.event_type AND d.day_num = g.day_num)
      |SELECT event_type, CAST(day_num AS INT) AS day_num,
      |  CAST(COALESCE(c, 0) AS BIGINT) AS n_events,
      |  CAST(last_value(c IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY day_num
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_events_ffill,
      |  (c IS NULL) AS was_gap
      |FROM j""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        dayNum(col("ts")).as("day_num"))
      .agg(count(lit(1)).as("c"))
    val bounds = daily.groupBy(col("event_type"))
      .agg(min(col("day_num")).as("d0"), max(col("day_num")).as("d1"))
    val grid = bounds.select(col("event_type"),
      explode(sequence(col("d0"), col("d1"))).as("day_num"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("event_type", "day_num"), "left")
      .select(col("event_type"), col("day_num"),
        coalesce(col("c"), lit(0L)).as("n_events"),
        last(col("c"), ignoreNulls = true).over(w).cast("long")
          .as("n_events_ffill"),
        col("c").isNull.as("was_gap"))
  }

  // ------------------------------------------------------------ q119

  /** Streaming exact-dedup ([[graft.streaming.Streaming
    * .streamDedupAvailableNow]]): the fixture arrives fully DUPLICATED
    * (staged twice) and `dropDuplicatesWithinWatermark` must emit each
    * event id exactly once — per-type counts equal the plain batch
    * counts over the single fixture. The watermark variant is the
    * production shape: dedup state is evicted at the horizon instead
    * of growing with the stream. */
  val q119 = Query(
    "q119_stream_dedup",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    graft.streaming.Streaming
      .streamDedupAvailableNow(s, s"$dir/events.parquet")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
  }

  // ------------------------------------------------------------ q121

  private val BfM = 256 // Bloom bits (deliberately tight: FPs visible)
  private val BfK = 3 // Bloom probes per key

  /** DuckDB fragment: 60-bit seeded md5 hash of an expression. */
  private def dBfHash(seed: String, k: String) =
    s"('0x' || substr(md5('$seed:' || CAST($k AS VARCHAR)), 1, 15))" +
      "::BIGINT"

  /** Bloom-filter scan pruning ([[graft.operators.Bloom]]): the
    * supplier keys of a nation group compress into a [[BfM]]-bit filter
    * that ships as a plan LITERAL — the fact scan drops non-matching
    * rows inside whole-stage codegen with zero joins and zero
    * shuffles, then the (broadcast) exact join removes the false
    * positives. At 100 TB this is the semi-join pushdown that turns
    * "join then discard 97% of the fact table" into "never read it
    * past the scan". The filter is deliberately small so false
    * positives are VISIBLE: the oracle replays the exact bit
    * positions (portable md5 double-hashing), so n_candidates —
    * including every false positive — hash-matches, not just the
    * exact result. */
  val q121 = Query(
    "q121_bloom_prune", {
      val pPos = (0 until BfK)
        .map(i => s"(ph.h1 + $i * ph.h2) % $BfM").mkString(", ")
      val lPos = (0 until BfK)
        .map(i => s"(lh.h1 + $i * lh.h2) % $BfM").mkString(", ")
      s"""WITH probe AS (
         |  SELECT s_suppkey FROM supplier JOIN nation
         |    ON s_nationkey = n_nationkey
         |  WHERE n_nationkey % 5 = 3),
         |ph AS (
         |  SELECT ${dBfHash("bf1", "s_suppkey")} AS h1,
         |    ${dBfHash("bf2", "s_suppkey")} AS h2
         |  FROM probe),
         |pos AS (
         |  SELECT DISTINCT UNNEST([$pPos]) AS p FROM ph),
         |pl AS (SELECT list(p) AS pl FROM pos),
         |lh AS (
         |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
         |      AS month,
         |    l_suppkey, l_extendedprice,
         |    ${dBfHash("bf1", "l_suppkey")} AS h1,
         |    ${dBfHash("bf2", "l_suppkey")} AS h2
         |  FROM lineitem),
         |cand AS (
         |  SELECT month, l_suppkey, l_extendedprice
         |  FROM lh CROSS JOIN pl
         |  WHERE list_has_all(pl, [$lPos])),
         |a AS (
         |  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_candidates
         |  FROM cand GROUP BY 1),
         |b AS (
         |  SELECT c.month, CAST(COUNT(*) AS BIGINT) AS n_true,
         |    SUM(CAST(c.l_extendedprice AS DECIMAL(18,2))) AS rev
         |  FROM cand c JOIN probe ON c.l_suppkey = probe.s_suppkey
         |  GROUP BY 1)
         |SELECT a.month, a.n_candidates,
         |  COALESCE(b.n_true, 0) AS n_true,
         |  CAST(COALESCE(b.rev, 0) AS DOUBLE) AS revenue
         |FROM a LEFT JOIN b ON a.month = b.month""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Functions.md5Long
    import graft.operators.{Bloom, InternalCache}
    def h(seed: String, c: Column) =
      md5Long(concat(lit(s"$seed:"), c.cast("string")))
    val probe = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_nationkey") % 5 === 3)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val posRows = probe.select(explode(Bloom.positionsArray(
      h("bf1", col("s_suppkey")), h("bf2", col("s_suppkey")),
      BfK, BfM)).as("p"))
    val words = Bloom.bitsetWords(posRows, "p", BfM)
    // hash the key ONCE per row into a cached projection; the bit
    // tests then run over the materialized hash pair instead of
    // re-deriving md5 for every probe position
    val lh = InternalCache.persist(Tables.lineitem(s, dir)
      .select(date_trunc("month", col("l_shipdate")).as("month"),
        col("l_suppkey"), col("l_extendedprice"),
        h("bf1", col("l_suppkey")).as("__h1"),
        h("bf2", col("l_suppkey")).as("__h2")))
    val cand = InternalCache.persist(lh
      .filter(Bloom.mightContain(words, col("__h1"), col("__h2"),
        BfK, BfM))
      .drop("__h1", "__h2"))
    val a = cand.groupBy(col("month"))
      .agg(count(lit(1)).as("n_candidates"))
    val b = cand.join(broadcast(probe),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_true"),
        sum(money(col("l_extendedprice"))).cast("double").as("revenue"))
    a.join(b, Seq("month"), "left")
      .select(col("month"), col("n_candidates"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
  }

  // ------------------------------------------------------------ q122

  private val SwSizeS = 6 * 3600 // 6-hour windows...
  private val SwSlideS = 5400 // ...advancing every 90 minutes

  /** Sliding-window streaming rollup ([[graft.streaming.Streaming
    * .slidingRollupAvailableNow]]): 6-hour event-time windows every 90
    * minutes — each event feeds size/slide = 4 overlapping windows.
    * The oracle enumerates the same epoch-aligned window starts per
    * event (integer-second arithmetic) and reproduces every window's
    * count and exact-decimal value sum. */
  val q122 = Query(
    "q122_sliding_rollup",
    s"""WITH e AS (
       |  SELECT ts, value,
       |    (epoch_us(ts) // ${SwSlideS.toLong * 1000000}) * $SwSlideS
       |      AS base_s
       |  FROM events),
       |w AS (
       |  SELECT make_timestamp((base_s - j.r * $SwSlideS) * 1000000)
       |      AS window_start,
       |    value
       |  FROM e CROSS JOIN (SELECT UNNEST(range(${SwSizeS / SwSlideS}))
       |    AS r) j)
       |SELECT window_start,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |    AS total_value
       |FROM w GROUP BY 1""".stripMargin) { (s, dir) =>
    graft.streaming.Streaming.slidingRollupAvailableNow(
      s, s"$dir/events.parquet", s"${SwSizeS / 3600} hours",
      s"${SwSlideS / 60} minutes")
  }

  // ------------------------------------------------------------ q123

  /** Incremental AGGREGATE mart maintenance
    * ([[graft.sources.Materialize.aggIncremental]]): a monthly revenue
    * mart built from two increments split mid-month — the overlap
    * month receives partial sums from BOTH runs, so the additive merge
    * itself is exercised, and the second run rewrites only the
    * partitions it touches. The oracle is the FULL aggregate over all
    * orders: incremental maintenance must equal a from-scratch
    * rebuild. */
  val q123 = Query(
    "q123_incremental_agg",
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
      |    AS month,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.sources.Materialize
    val name = s"graft_agginc_${math.abs(dir.hashCode)}"
    Materialize.dropAggState(s, name)
    val orders = Tables.orders(s, dir)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(money(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders"))
    val cut = lit("1996-06-15").cast("date")
    Materialize.aggIncremental(s, name,
      partial(orders.filter(col("o_orderdate") < cut)),
      Seq("month"), "month", "inc1")
    Materialize.aggIncremental(s, name,
      partial(orders.filter(col("o_orderdate") >= cut)),
      Seq("month"), "month", "inc2")
    s.table(name).select(col("month").cast("timestamp_ntz").as("month"),
      col("revenue").cast("double").as("revenue"), col("n_orders"))
  }

  // ------------------------------------------------------------ q124

  private val AqpMod = 10 // deterministic 1-in-10 hash sample

  /** Approximate query processing by deterministic hash sampling: a
    * 10% md5 sample of lineitem estimates monthly revenue (scale-up is
    * an EXACT decimal ×10 — no float scaling), reported against the
    * exact answer with the relative error. The 100 TB story: a 10%
    * sample answers the dashboard query from 10% of the bytes; the
    * hash cut is deterministic and engine-portable, so the oracle
    * replays the sample membership row for row (same pattern as q56's
    * train/val split). */
  val q124 = Query(
    "q124_sample_estimate", {
      val h = "('0x' || substr(md5('smp:' || CAST(l_orderkey AS " +
        "VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))" +
        "::BIGINT"
      s"""WITH l AS (
         |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
         |      AS month,
         |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         |    ($h % $AqpMod = 0) AS in_sample
         |  FROM lineitem)
         |SELECT month,
         |  CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sample,
         |  CAST(SUM(CASE WHEN in_sample THEN price ELSE 0 END)
         |    * $AqpMod AS DOUBLE) AS est_revenue,
         |  CAST(SUM(price) AS DOUBLE) AS exact_revenue,
         |  round(abs(CAST(SUM(CASE WHEN in_sample THEN price ELSE 0
         |    END) * $AqpMod AS DOUBLE) - CAST(SUM(price) AS DOUBLE))
         |    / CAST(SUM(price) AS DOUBLE), 6) AS rel_err
         |FROM l GROUP BY 1""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Functions.md5Long
    val l = Tables.lineitem(s, dir).select(
      date_trunc("month", col("l_shipdate")).as("month"),
      money(col("l_extendedprice")).as("price"),
      (md5Long(concat(lit("smp:"), col("l_orderkey").cast("string"),
        lit(":"), col("l_linenumber").cast("string"))) % AqpMod === 0)
        .as("in_sample"))
    val est = sum(when(col("in_sample"), col("price")).otherwise(
      lit(0).cast(graft.functions.Functions.Money))) * AqpMod
    val exact = sum(col("price"))
    l.groupBy(col("month")).agg(
        sum(when(col("in_sample"), 1).otherwise(0)).cast("long")
          .as("n_sample"),
        est.cast("double").as("est_revenue"),
        exact.cast("double").as("exact_revenue"),
        round(abs(est.cast("double") - exact.cast("double")) /
          exact.cast("double"), 6).as("rel_err"))
  }

  // ------------------------------------------------------------ q127

  /** Streaming ADDITIVE mart ([[graft.streaming.Streaming
    * .streamIntoAggIncremental]]): events stream in two micro-batches
    * split mid-day into a day-partitioned aggregate table via
    * `foreachBatch` → `Materialize.aggIncremental`; the boundary day
    * merges partial sums from both batches. The oracle is the one-shot
    * batch aggregate — streaming maintenance must land on identical
    * state. */
  val q127 = Query(
    "q127_stream_agg_mart",
    """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val name = s"graft_stragg_${math.abs(dir.hashCode)}"
    graft.sources.Materialize.dropAggState(s, name)
    graft.streaming.Streaming.streamIntoAggIncremental(
        s, s"$dir/events.parquet", name, "2024-01-15 12:00:00")
      .select(col("day").cast("timestamp_ntz").as("day"),
        col("event_type"), col("n_events"),
        col("value_sum").cast("double").as("total_value"))
  }

  // ------------------------------------------------------------ q129

  /** Strict-ORDER funnel (q9's funnel counts steps; this requires the
    * sequence view → click → purchase in temporal order): earliest
    * view per user, earliest click AFTER it, earliest purchase after
    * that — three bounded aggregate+join rounds, the relational
    * encoding of sequential pattern matching (no per-user UDF state,
    * no window over the event stream). Latency stays integer micros
    * until one mirrored division pair at the end. */
  val q129 = Query(
    "q129_event_sequence",
    """WITH v AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS v_us
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
      |  GROUP BY 1),
      |u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events)
      |SELECT u.n_users,
      |  CAST(COUNT(p.user_id) AS BIGINT) AS n_sequenced,
      |  round(CAST(SUM(p.p_us - v.v_us) AS DOUBLE)
      |    / CAST(COUNT(p.user_id) AS DOUBLE) / 60000000.0, 6)
      |    AS avg_latency_min
      |FROM p JOIN v ON v.user_id = p.user_id CROSS JOIN u
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    def firstAfter(tpe: String, prev: DataFrame, prevCol: String,
        outCol: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("us") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("us")).as(outCol))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = firstAfter("click", v, "v_us", "c_us")
    val p = firstAfter("purchase", c, "c_us", "p_us")
    val u = ev.agg(count_distinct(col("user_id")).as("n_users"))
    p.join(v, Seq("user_id")).crossJoin(broadcast(u))
      .groupBy(col("n_users"))
      .agg(count(col("user_id")).as("n_sequenced"),
        round(sum(col("p_us") - col("v_us")).cast("double") /
          count(col("user_id")).cast("double") / 60000000.0, 6)
          .as("avg_latency_min"))
  }

  // ------------------------------------------------------------ q130

  /** The stats catalog USED: textbook CBO join-cardinality estimation
    * — `|A ⋈ B| ≈ |A|·|B| / max(ndv_A(k), ndv_B(k))` from exactly the
    * statistics q106 collects — against the measured row count, for
    * the two central mart joins. Integer arithmetic end to end (the
    * estimate is an integer division; the error ratio is one mirrored
    * double division). At 100 TB this formula (over sketched NDVs) is
    * what decides join order and broadcast eligibility before any data
    * moves. */
  val q130 = Query(
    "q130_join_estimate",
    """WITH ol AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_o,
      |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv_o
      |  FROM orders),
      |ll AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_l,
      |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv_l
      |  FROM lineitem),
      |cl AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_c,
      |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ndv_c
      |  FROM customer),
      |oc AS (
      |  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_oc
      |  FROM orders),
      |a1 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS actual
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |a2 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS actual
      |  FROM customer JOIN orders ON c_custkey = o_custkey)
      |SELECT 'orders_lineitem' AS join_name,
      |  ol.n_o AS n_left, ll.n_l AS n_right,
      |  ol.ndv_o AS ndv_left, ll.ndv_l AS ndv_right,
      |  (ol.n_o * ll.n_l) // greatest(ol.ndv_o, ll.ndv_l) AS est_rows,
      |  a1.actual,
      |  round(CAST((ol.n_o * ll.n_l) // greatest(ol.ndv_o, ll.ndv_l)
      |    AS DOUBLE) / CAST(a1.actual AS DOUBLE), 6) AS est_over_actual
      |FROM ol, ll, a1
      |UNION ALL
      |SELECT 'customer_orders',
      |  cl.n_c, ol.n_o, cl.ndv_c, oc.ndv_oc,
      |  (cl.n_c * ol.n_o) // greatest(cl.ndv_c, oc.ndv_oc),
      |  a2.actual,
      |  round(CAST((cl.n_c * ol.n_o) // greatest(cl.ndv_c, oc.ndv_oc)
      |    AS DOUBLE) / CAST(a2.actual AS DOUBLE), 6)
      |FROM cl, ol, oc, a2""".stripMargin) { (s, dir) =>
    def stats(df: DataFrame, key: String, nc: String, dc: String) =
      df.agg(count(lit(1)).as(nc), count_distinct(col(key)).as(dc))
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val c = Tables.customer(s, dir)
    def leg(name: String, sLeft: DataFrame, sRight: DataFrame,
        actual: DataFrame): DataFrame =
      sLeft.crossJoin(sRight).crossJoin(actual)
        .select(lit(name).as("join_name"),
          col("n_left"), col("n_right"), col("ndv_left"),
          col("ndv_right"),
          expr("(n_left * n_right) div " +
            "greatest(ndv_left, ndv_right)").as("est_rows"),
          col("actual"),
          round(expr("(n_left * n_right) div " +
            "greatest(ndv_left, ndv_right)").cast("double") /
            col("actual").cast("double"), 6).as("est_over_actual"))
    val leg1 = leg("orders_lineitem",
      stats(o, "o_orderkey", "n_left", "ndv_left"),
      stats(l, "l_orderkey", "n_right", "ndv_right"),
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("actual")))
    val leg2 = leg("customer_orders",
      stats(c, "c_custkey", "n_left", "ndv_left"),
      stats(o, "o_custkey", "n_right", "ndv_right"),
      c.join(o, col("c_custkey") === col("o_custkey"))
        .agg(count(lit(1)).as("actual")))
    leg1.unionAll(leg2)
  }

  // ------------------------------------------------------------ q131

  /** Rolling 7-day active users (WAU) with DAU and stickiness — the
    * sliding COUNT DISTINCT, which no window frame can compute
    * (distinct doesn't merge across frame slides). Relational form:
    * the DISTINCT (user, day) frame — bounded by users × days, not
    * events — fans each row out to the ≤ 7 target days it supports,
    * then one distinct-count per target. The fact table is touched
    * once; everything after runs on the bounded activity frame. */
  val q131 = Query(
    "q131_rolling_wau",
    """WITH du AS (
      |  SELECT DISTINCT (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
      |    user_id
      |  FROM events),
      |mx AS (SELECT MAX(day) AS md FROM du),
      |t AS (
      |  SELECT du.user_id, du.day + j.r AS target
      |  FROM du CROSS JOIN (SELECT UNNEST(range(7)) AS r) j),
      |w AS (
      |  SELECT target, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM t CROSS JOIN mx WHERE target <= mx.md GROUP BY 1),
      |d AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1)
      |SELECT CAST(w.target AS INT) AS day_num,
      |  CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau, w.wau,
      |  round(CAST(COALESCE(d.dau, 0) AS DOUBLE)
      |    / CAST(w.wau AS DOUBLE), 6) AS stickiness
      |FROM w LEFT JOIN d ON d.day = w.target""".stripMargin) {
    (s, dir) =>
    import graft.operators.InternalCache
    val du = InternalCache.persist(Tables.events(s, dir)
      .select(dayNum(col("ts")).as("day"), col("user_id")).distinct())
    val mx = du.agg(max(col("day")).as("md"))
    val w = du
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("target"))
      .crossJoin(broadcast(mx))
      .filter(col("target") <= col("md"))
      .groupBy(col("target"))
      .agg(count_distinct(col("user_id")).as("wau"))
    val d = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    w.join(d, col("day") === col("target"), "left")
      .select(col("target").as("day_num"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        round(coalesce(col("dau"), lit(0L)).cast("double") /
          col("wau").cast("double"), 6).as("stickiness"))
  }

  // ------------------------------------------------------------ q132

  /** Co-occurrence mining (market-basket pairs): parts ordered
    * together in the same order, counted and ranked. The pair
    * generation is ORDER-bounded (an order holds a handful of lines →
    * ≤ lines² pairs per order, generated by a within-order self-join
    * on the already-shuffled order key), never a global product; the
    * global top-20 goes through the distributed rank. The first step
    * of any co-purchase recommender over the reference's order data.
    */
  val q132 = Query(
    "q132_part_cooccurrence",
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT part_a, part_b, n_orders,
      |    ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b)
      |      AS rnk
      |  FROM pairs QUALIFY rnk <= 20)
      |SELECT part_a, part_b, n_orders, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    // the SHARED counted pair frame (one build per run for q132/q138/q211)
    val pairs = Mining.partPairs(s, dir)
      .select(col("a").as("part_a"), col("b").as("part_b"),
        col("n").as("n_orders"))
    Ranking.withGlobalRank(pairs,
        struct((col("n_orders") * -1).as("no"), col("part_a").as("a"),
          col("part_b").as("b")).asc, "rnk")
      .filter(col("rnk") <= 20)
      .select(col("part_a"), col("part_b"), col("n_orders"), col("rnk"))
  }

  // ------------------------------------------------------------ q133

  /** Customer revenue deciles through the DISTRIBUTED percent rank
    * (`Ranking.withGlobalPercentRank`: range partition + per-partition
    * window + broadcast offsets — never a single-partition global
    * window): per-decile customer counts and exact decimal revenue
    * totals, the segmentation cut every CRM mart ships. The oracle
    * uses a plain `percent_rank()` window — DuckDB doesn't need to
    * scale; the engine side must. */
  val q133 = Query(
    "q133_revenue_deciles",
    """WITH cr AS (
      |  SELECT o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |pr AS (
      |  SELECT o_custkey, rev,
      |    percent_rank() OVER (ORDER BY rev, o_custkey) AS p
      |  FROM cr)
      |SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(rev) AS DOUBLE) AS revenue
      |FROM pr GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val cr = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    Ranking.withGlobalPercentRank(cr,
        struct(col("rev").as("r"), col("o_custkey").as("k")).asc, "p")
      .select(least(floor(col("p") * 10), lit(9)).cast("long")
          .as("decile"), col("rev"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev")).cast("double").as("revenue"))
  }

  // ------------------------------------------------------------ q140

  /** Mergeable-sketch rollup: per-DAY HLL sketches of distinct users
    * (`hll_sketch_agg`, Apache DataSketches) unioned into per-MONTH
    * estimates — the pre-aggregated distinct-count table every
    * warehouse keeps because COUNT(DISTINCT) does not roll up but
    * sketches do. At 100 TB the daily sketch table is a few KB per
    * (day, dimension) cell and the monthly rollup never rescans the
    * fact. Sketch bytes differ per engine, so the contract is the q39
    * accuracy bound (±15% at lgK=12 is ~50σ headroom), checked per
    * month, plus the exact values. */
  val q140 = Query(
    "q140_hll_sketch_rollup",
    """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_within_tolerance
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(date_trunc("month", col("ts")).as("month"),
        date_trunc("day", col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val monthly = daily.groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
    val exact = ev.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(monthly, Seq("month"))
      .select(col("month"), col("exact_users"),
        (abs(col("approx") - col("exact_users")).cast("double") /
          col("exact_users") < 0.15).as("approx_within_tolerance"))
  }

  // ------------------------------------------------------------ q142

  /** Materialized-view rollup rewrite ([[graft.plans.Mv]], a Catalyst
    * `Rule[LogicalPlan]` via `experimental.extraOptimizations`): the
    * per-type revenue rollup keeps addressing the EVENTS fact table,
    * but with the daily mart registered as its MV the optimizer plans
    * the scan against the mart (days×types rows instead of the raw
    * fact — the rollup factor at 100 TB is 10³-10⁶×). The oracle runs
    * the plain fact-side SQL: the rewrite must be semantically
    * invisible. Evaluated eagerly inside the register/deregister
    * window (`localCheckpoint`) so the rule never sees another
    * query's plan; MvSpec locks that the rewrite actually fires for
    * this shape and stays out of uncovered ones. */
  val q142 = Query(
    "q142_mv_rewrite_rollup",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val mv = ev
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(money(col("value"))).as("total"))
    graft.sources.Materialize.table(mv, "mv_daily_type")
    graft.plans.Mv.register(s, "mv_daily_type", ev,
      keys = Seq("day" -> date_trunc("day", col("ts")),
        "event_type" -> col("event_type")),
      sums = Seq("total" -> money(col("value"))),
      countStar = Some("n_events"))
    try
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(money(col("value"))).cast("double").as("total_value"))
        .localCheckpoint()
    finally graft.plans.Mv.deregister("mv_daily_type")
  }

  // ------------------------------------------------------------ q251

  /** The COVERED-FILTER MV rewrite (the [[graft.plans.Mv]] extension
    * over q142's exact-shape match): the consumer filters on the MV's
    * key expression — `WHERE day >= X GROUP BY day` — and the rule
    * maps the predicate onto the mart's grouping column, so the plan
    * filters days×types pre-aggregated rows instead of scanning the
    * fact. At 100 TB this is the common dashboard shape: a date-range
    * predicate over a rollup key, answered from the mart WITH the
    * range pushed to its (typically partition-pruned) scan. The
    * oracle runs the plain fact-side SQL — the rewrite must be
    * semantically invisible; MvSpec locks that the rewrite fires for
    * this shape and that non-key filters stay out. */
  val q251 = Query(
    "q251_mv_covered_filter",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-15'
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val mv = ev
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(money(col("value"))).as("total"))
    graft.sources.Materialize.table(mv, "mv_daily_type_cf")
    graft.plans.Mv.register(s, "mv_daily_type_cf", ev,
      keys = Seq("day" -> date_trunc("day", col("ts")),
        "event_type" -> col("event_type")),
      sums = Seq("total" -> money(col("value"))),
      countStar = Some("n_events"))
    try
      ev.filter(date_trunc("day", col("ts")) >=
          lit("2024-01-15").cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(money(col("value"))).cast("double").as("total_value"))
        .localCheckpoint()
    finally graft.plans.Mv.deregister("mv_daily_type_cf")
  }

  // ------------------------------------------------------------ q252

  /** The covered-filter MV rewrite with the mart DATE-PARTITIONED
    * (q251's scaladoc promise made structural): the mart is laid out
    * `PARTITIONED BY (day)`, so when [[graft.plans.Mv]] maps the
    * consumer's date-range predicate onto the mart's `day` key, the
    * physical scan carries the range in `PartitionFilters` — at 100 TB
    * the dashboard query reads only the asked-for days' partitions of
    * an already rollup-factor-smaller table (pruned at LISTING time,
    * never opened). PlanContractSpec locks the PartitionFilters shape;
    * the oracle runs the plain fact-side SQL — the rewrite plus the
    * layout must stay semantically invisible. */
  val q252 = Query(
    "q252_mv_partition_pruned",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-15'
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val mv = ev
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(money(col("value"))).as("total"))
    graft.sources.Materialize.partitionedTable(mv, "mv_daily_type_pp",
      "day")
    graft.plans.Mv.register(s, "mv_daily_type_pp", ev,
      keys = Seq("day" -> date_trunc("day", col("ts")),
        "event_type" -> col("event_type")),
      sums = Seq("total" -> money(col("value"))),
      countStar = Some("n_events"))
    try
      ev.filter(date_trunc("day", col("ts")) >=
          lit("2024-01-15").cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(money(col("value"))).cast("double").as("total_value"))
        .select(col("day").cast("timestamp_ntz").as("day"),
          col("n_events"), col("total_value"))
        .localCheckpoint()
    finally graft.plans.Mv.deregister("mv_daily_type_pp")
  }

  // ------------------------------------------------------------ q253

  /** The HISTORY-FOLDED incremental aggregate under continuous ingest
    * — q123's operator in the deployment profile that motivated
    * [[graft.sources.Materialize.checkpointPartials]]: four
    * deterministic hash-split increments (every yearly partition
    * touched by ~every batch, the WORST slice-growth shape) land
    * through `aggIncremental(foldEvery = 2)`, so the partials history
    * folds mid-run — twice here — and recompute input stays bounded at
    * ≤ foldEvery+1 row-sets per partition regardless of how many
    * batches ever ran. The oracle is the FULL aggregate over orders:
    * cadence folding must be invisible to published content (the
    * StreamingSpec sibling pins the slice BOUND; this query puts the
    * content claim under the cross-engine gate). */
  val q253 = Query(
    "q253_agg_fold_maintenance",
    """SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP)
      |    AS year,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.sources.Materialize
    val name = s"graft_aggfold_${math.abs(dir.hashCode)}"
    Materialize.dropAggState(s, name)
    val orders = Tables.orders(s, dir)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("year", col("o_orderdate")).as("year"))
        .agg(sum(money(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders"))
    val h = pmod(graft.functions.Functions.md5Long(
      col("o_orderkey").cast("string")), lit(4))
    for (i <- 0 until 4)
      Materialize.aggIncremental(s, name, partial(orders.filter(h === i)),
        Seq("year"), "year", f"inc$i%02d", foldEvery = 2)
    s.table(name).select(col("year").cast("timestamp_ntz").as("year"),
      col("revenue").cast("double").as("revenue"), col("n_orders"))
  }

  // ------------------------------------------------------------ q151

  /** RFM customer segmentation (recency/frequency/monetary quintiles —
    * the standard CRM mart over the order fact). Each dimension's
    * bucket comes from an exact global row_number through
    * [[graft.operators.Ranking.withGlobalRank]] (unique tie-break on
    * custkey makes rank ≡ row_number), so no unpartitioned window
    * exists at any customer cardinality. The bucket cut is integer
    * arithmetic — `((rn-1)*5) DIV n + 1` — identical in both engines
    * (no NTILE, whose remainder placement is engine-defined). */
  val q151 = Query(
    "q151_rfm_segments",
    """WITH b AS (
      |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_order,
      |    COUNT(*) AS freq,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_cust FROM b),
      |r AS (
      |  SELECT o_custkey, monetary,
      |    ROW_NUMBER() OVER (ORDER BY last_order, o_custkey) AS r_rn,
      |    ROW_NUMBER() OVER (ORDER BY freq, o_custkey) AS f_rn,
      |    ROW_NUMBER() OVER (ORDER BY monetary, o_custkey) AS m_rn
      |  FROM b),
      |s AS (
      |  SELECT CAST(((r_rn - 1) * 5) // n_cust + 1 AS BIGINT) AS r_bucket,
      |    CAST(((f_rn - 1) * 5) // n_cust + 1 AS BIGINT) AS f_bucket,
      |    CAST(((m_rn - 1) * 5) // n_cust + 1 AS BIGINT) AS m_bucket,
      |    monetary
      |  FROM r CROSS JOIN n)
      |SELECT r_bucket, f_bucket, m_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(monetary) AS DOUBLE) AS monetary_total
      |FROM s GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val base = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("freq"),
        sum(money(col("o_totalprice"))).as("monetary"))
    val ranked = Seq(
      ("r_rn", struct(col("last_order"), col("o_custkey")).asc),
      ("f_rn", struct(col("freq"), col("o_custkey")).asc),
      ("m_rn", struct(col("monetary"), col("o_custkey")).asc))
      .foldLeft(base) { case (df, (c, ord)) =>
        Ranking.withGlobalRank(df, ord, c)
      }
    val n = base.agg(count(lit(1)).as("n_cust"))
    def bucket(rn: String): Column =
      expr(s"(($rn - 1) * 5) DIV n_cust").cast("long") + 1
    ranked.crossJoin(broadcast(n))
      .select(bucket("r_rn").as("r_bucket"), bucket("f_rn").as("f_bucket"),
        bucket("m_rn").as("m_bucket"), col("monetary"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).cast("double").as("monetary_total"))
  }

  // ------------------------------------------------------------ q152

  /** Consecutive-day activity streaks (gaps-and-islands): per user,
    * the island id is `day - row_number` over the user's distinct
    * activity days — the classic identity, with every window
    * PARTITIONED BY user (no global window, so user cardinality never
    * collapses a stage). Output is the distribution of per-user
    * longest streaks. */
  val q152 = Query(
    "q152_activity_streaks",
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    day - CAST(ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      |  FROM d),
      |s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2),
      |m AS (SELECT user_id, MAX(len) AS streak_days FROM s GROUP BY 1)
      |SELECT CAST(streak_days AS BIGINT) AS streak_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM m GROUP BY 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("streak_days"))
      .groupBy(col("streak_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ------------------------------------------------------------ q153

  private val EsAlpha = 0.3

  /** Single-exponential-smoothing forecast of monthly revenue per
    * order priority: the per-group series is aggregated first (months
    * × priorities rows), collected into an ordered array, and smoothed
    * by a ROW-LOCAL left fold (`aggregate` HOF seeded with the first
    * month) — the same fixed IEEE sequence DuckDB's `list_reduce`
    * replays, so the forecast hash-matches bit for bit. No window, no
    * driver collect; the heavy input never leaves its aggregate. */
  val q153 = Query(
    "q153_exp_smoothing",
    s"""WITH m AS (
       |  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
       |  FROM orders GROUP BY 1, 2),
       |s AS (
       |  SELECT o_orderpriority,
       |    list(CAST(rev AS DOUBLE) ORDER BY month) AS l
       |  FROM m GROUP BY 1)
       |SELECT o_orderpriority, CAST(len(l) AS BIGINT) AS n_months,
       |  round(list_reduce(l,
       |    (acc, x) -> $EsAlpha*x + ${1 - EsAlpha}*acc), 6) AS forecast
       |FROM s""".stripMargin) { (s, dir) =>
    val monthly = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    val series = monthly
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_list(
        struct(col("month"), col("rev").cast("double").as("rev"))))
        .as("sr"))
      .withColumn("l", transform(col("sr"), _.getField("rev")))
    series.select(col("o_orderpriority"),
      size(col("l")).cast("long").as("n_months"),
      round(aggregate(
        slice(col("l"), lit(2), greatest(size(col("l")) - 1, lit(0))),
        element_at(col("l"), 1),
        (acc, x) => lit(EsAlpha) * x + lit(1 - EsAlpha) * acc), 6)
        .as("forecast"))
  }

  // ------------------------------------------------------------ q154

  private val KllK = 200 // ~1.65% normalized rank error at 99% conf

  /** Mergeable QUANTILE rollup (Apache DataSketches KLL,
    * [[graft.operators.Sketch.kllBy]]) — q140's HLL pattern for the
    * other non-additive aggregate every warehouse pre-computes:
    * per-DAY value sketches merge into per-MONTH medians without
    * rescanning the fact. Sketch bytes are engine-specific, so the
    * contract is rank accuracy: the estimated median's TRUE rank
    * inside the month must sit within 0.5 ± 0.05 (30× the k=200
    * error bound), checked in-engine; the exact median itself is
    * value-checked against the oracle (q47's interpolation parity). */
  val q154 = Query(
    "q154_kll_quantile_rollup",
    """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
      |  quantile_cont(value, 0.5) AS exact_median,
      |  TRUE AS approx_within_tolerance
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.operators.Sketch
    val ev = Tables.events(s, dir)
      .select(to_date(date_trunc("day", col("ts"))).as("day"),
        date_trunc("month", col("ts")).as("month"), col("value"))
    val daily = Sketch.kllBy(ev.select(col("day"), col("value")),
      "day", "value", KllK)
    val monthly = daily
      .withColumn("month",
        date_trunc("month", to_date(col("day"))).as("month"))
      .groupBy(col("month"))
      .agg(Sketch.kllQuantile(col("sketch"), 0.5).as("approx_median"))
    val exact = ev.groupBy(col("month"))
      .agg(expr("percentile(value, 0.5)").as("exact_median"),
        count(lit(1)).as("n"))
    exact.join(monthly, Seq("month"))
      .join(ev.select(col("month"), col("value")), Seq("month"))
      .groupBy(col("month"), col("exact_median"), col("n"),
        col("approx_median"))
      .agg(sum(when(col("value") <= col("approx_median"), 1L)
        .otherwise(0L)).as("rank"))
      .select(col("month"), col("exact_median"),
        (abs(col("rank").cast("double") / col("n") - 0.5) <= 0.05)
          .as("approx_within_tolerance"))
  }

  // ------------------------------------------------------------ q156

  /** Theta-sketch audience overlap: distinct-user intersection AND
    * union for every event-type pair from per-type sketches
    * ([[graft.operators.Sketch.thetaBy]]) — the set algebra HLL
    * (q140) cannot do. The fact is scanned once to build one sketch
    * per type; every pairwise question is then answered over the
    * sketch table (rows = type-pair count, independent of fact size —
    * the self-join is over ~5 sketch rows, never over users). Exact
    * counts ride the same output; the sketch contract is the q140
    * tolerance bound (default lgK retains 4096 hashes — exact mode at
    * test scale, ±15% is ~50σ headroom beyond). */
  val q156 = Query(
    "q156_theta_overlap",
    """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
      |n AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS exact_both
      |  FROM d a JOIN d b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, exact_both,
      |  CAST(na.n + nb.n - exact_both AS BIGINT) AS exact_union,
      |  TRUE AS overlap_within_tolerance,
      |  TRUE AS union_within_tolerance
      |FROM p
      |JOIN n na ON na.event_type = type_a
      |JOIN n nb ON nb.event_type = type_b""".stripMargin) { (s, dir) =>
    import graft.operators.{InternalCache, Sketch}
    val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    // one sketch row per event type; all pair ops run over this frame
    val sk = InternalCache.persist(Sketch.thetaBy(ev, "event_type", "user_id"))
    val skPairs = sk.select(col("event_type").as("type_a"),
        col("sketch").as("sk_a"))
      .join(sk.select(col("event_type").as("type_b"),
        col("sketch").as("sk_b")), col("type_a") < col("type_b"))
    // unpivot each pair to two sketch rows, then intersect/union-agg
    val approx = skPairs
      .select(col("type_a"), col("type_b"),
        explode(array(col("sk_a"), col("sk_b"))).as("sketch"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(Sketch.thetaIntersectEstimate(col("sketch")).as("approx_both"),
        Sketch.thetaUnionEstimate(col("sketch")).as("approx_union"))
    val d = InternalCache.persist(ev.distinct())
    val perType = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val exact = d.select(col("event_type").as("type_a"), col("user_id"))
      .join(d.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_both"))
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("exact_both"),
        (col("n_a") + col("n_b") - col("exact_both")).as("exact_union"))
    exact.join(broadcast(approx), Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("exact_both"),
        col("exact_union"),
        (abs(col("approx_both") - col("exact_both")) /
          col("exact_both").cast("double") < 0.15)
          .as("overlap_within_tolerance"),
        (abs(col("approx_union") - col("exact_union")) /
          col("exact_union").cast("double") < 0.15)
          .as("union_within_tolerance"))
  }

  // ------------------------------------------------------------ q157

  /** Event-transition (first-order Markov) matrix: for each ordered
    * pair of consecutive events WITHIN a user's stream, the count and
    * the conditional probability P(next | current). The sequence
    * window is partitioned by user — user cardinality is the
    * parallelism, nothing global — and the per-from normalizer is a
    * types-sized broadcast. The single double op per row (the
    * probability division) is rounded to 6 dp in both engines. */
  val q157 = Query(
    "q157_event_transitions",
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |t AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_transitions
      |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_type, SUM(n_transitions) AS tot FROM t GROUP BY 1)
      |SELECT from_type, to_type, n_transitions,
      |  round(CAST(n_transitions AS DOUBLE) / CAST(tot AS DOUBLE), 6)
      |    AS probability
      |FROM t JOIN f USING (from_type)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("tot"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") /
          col("tot").cast("double"), 6).as("probability"))
  }

  // ------------------------------------------------------------ q159

  /** Expected first-digit shares under Benford's law, in exact ppm —
    * computed once driver-side (9 constants), emitted as literals in
    * BOTH engines. */
  private val BenfordPpm: Map[Int, Long] = (1 to 9).map { d =>
    d -> Math.round(Math.log10(1.0 + 1.0 / d) * 1000000L)
  }.toMap

  /** Benford's-law audit of order amounts — the standard financial
    * anomaly screen. The first significant digit comes from the
    * DECIMAL string form (`regexp_extract '[1-9]'`), never from
    * `log10` on a double, so both engines bin identically; shares are
    * integer ppm via the exact round-half-up identity
    * `(n·2e6 + total) DIV (2·total)` — no floating point anywhere.
    * One scan, 9 groups, map-side combinable. */
  val q159 = Query(
    "q159_benford_audit",
    s"""WITH d AS (
       |  SELECT CAST(regexp_extract(
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
       |    '[1-9]', 0) AS BIGINT) AS digit
       |  FROM orders),
       |t AS (SELECT COUNT(*) AS total FROM d),
       |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
       |SELECT digit, CAST(n AS BIGINT) AS n_orders,
       |  CAST((n * 2000000 + total) // (2 * total) AS BIGINT) AS obs_ppm,
       |  CAST(CASE digit ${BenfordPpm.toSeq.sorted
            .map { case (d, p) => s"WHEN $d THEN $p" }
            .mkString(" ")} END AS BIGINT) AS benford_ppm
       |FROM g CROSS JOIN t""".stripMargin) { (s, dir) =>
    val digits = Tables.orders(s, dir)
      .select(regexp_extract(money(col("o_totalprice")).cast("string"),
        "[1-9]", 0).cast("long").as("digit"))
    val total = digits.agg(count(lit(1)).as("total"))
    val benford = BenfordPpm.foldLeft(lit(null).cast("long")) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
    }
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n").as("n_orders"),
        expr("(n * 2000000 + total) DIV (2 * total)")
          .cast("long").as("obs_ppm"),
        benford.as("benford_ppm"))
  }

  // ------------------------------------------------------------ q161

  /** Weight-of-evidence / information-value screening of a categorical
    * feature against a binary outcome (the credit-scoring feature-
    * selection standard): does order priority predict order failure?
    * Per category: exact good/bad counts, WOE = ln of a single ratio
    * of exact integer products (one ln per row, rounded 6 dp — the
    * q94/q113 ln contract), and the category's IV contribution
    * computed the same way. One scan, categories-sized output, no
    * cross-row double summation (each row is independently exact). */
  val q161 = Query(
    "q161_woe_iv",
    """WITH c AS (
      |  SELECT o_orderpriority AS category,
      |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_bad,
      |    SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS n_good
      |  FROM orders GROUP BY 1),
      |t AS (SELECT SUM(n_bad) AS b_tot, SUM(n_good) AS g_tot FROM c)
      |SELECT category, CAST(n_good AS BIGINT) AS n_good,
      |  CAST(n_bad AS BIGINT) AS n_bad,
      |  round(ln(CAST(n_good * b_tot AS DOUBLE)
      |    / CAST(n_bad * g_tot AS DOUBLE)), 6) AS woe,
      |  round((CAST(n_good AS DOUBLE) / CAST(g_tot AS DOUBLE)
      |    - CAST(n_bad AS DOUBLE) / CAST(b_tot AS DOUBLE))
      |    * ln(CAST(n_good * b_tot AS DOUBLE)
      |      / CAST(n_bad * g_tot AS DOUBLE)), 6) AS iv_contribution
      |FROM c CROSS JOIN t""".stripMargin) { (s, dir) =>
    val cats = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("category"))
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("n_bad"),
        sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L))
          .as("n_good"))
    val tot = cats.agg(sum(col("n_bad")).as("b_tot"),
      sum(col("n_good")).as("g_tot"))
    val woe = log((col("n_good") * col("b_tot")).cast("double") /
      (col("n_bad") * col("g_tot")).cast("double"))
    cats.crossJoin(broadcast(tot))
      .select(col("category"), col("n_good"), col("n_bad"),
        round(woe, 6).as("woe"),
        round((col("n_good").cast("double") / col("g_tot").cast("double") -
          col("n_bad").cast("double") / col("b_tot").cast("double")) * woe, 6)
          .as("iv_contribution"))
  }

  // ------------------------------------------------------------ q162

  /** Equi-depth histogram boundaries for the CBO stats catalog
    * (q106/q130's missing piece — range selectivity needs depth
    * boundaries, not just min/max): the EXACT decile boundary values
    * of order totals, each the value at global row_number `k·n DIV 10`
    * under a unique (price, orderkey) order — computed through the
    * distributed rank, so no unpartitioned window at any fact size.
    * The boundary-rank table is 10 rows built from the row count; the
    * fact is scanned once for ranking and filtered to exactly the 10
    * boundary rows. */
  val q162 = Query(
    "q162_equidepth_histogram",
    """WITH b AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderkey,
      |    row_number() OVER (
      |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rn
      |  FROM orders),
      |n AS (SELECT COUNT(*) AS n FROM b),
      |k AS (
      |  SELECT unnest(generate_series(1, 10)) AS bucket),
      |r AS (SELECT bucket, (bucket * n) // 10 AS brn FROM k CROSS JOIN n)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(brn AS BIGINT) AS boundary_rank,
      |  CAST(price AS DOUBLE) AS boundary_value
      |FROM r JOIN b ON b.rn = r.brn""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val priced = Tables.orders(s, dir)
      .select(money(col("o_totalprice")).as("price"), col("o_orderkey"))
    val ranked = Ranking.withGlobalRank(priced,
      struct(col("price"), col("o_orderkey")).asc, "rn")
    val n = priced.agg(count(lit(1)).as("n"))
    val boundaries = s.range(1, 11).select(col("id").as("bucket"))
      .crossJoin(broadcast(n))
      .select(col("bucket"), expr("(bucket * n) DIV 10").as("brn"))
    ranked.join(broadcast(boundaries), col("rn") === col("brn"))
      .select(col("bucket"), col("brn").as("boundary_rank"),
        col("price").cast("double").as("boundary_value"))
  }

  // ------------------------------------------------------------ q163

  private val HoltAlpha = 0.4
  private val HoltBeta = 0.3

  /** Holt linear-trend (double exponential smoothing) one-step
    * forecast of monthly revenue per order priority — q153's level-
    * only smoother plus a trend term. The per-group series aggregates
    * first; the smoother is a ROW-LOCAL fold over a (level, trend)
    * struct accumulator seeded with (x₁, x₂−x₁) and folded from x₃ —
    * the identical fixed IEEE sequence the oracle replays with a
    * RECURSIVE CTE over the per-month rows. (Not `list_reduce` with a
    * struct lambda: DuckDB v1.0.0 aliases accumulator fields to their
    * already-updated siblings mid-step, silently corrupting any
    * multi-field recurrence.) */
  val q163 = Query(
    "q163_holt_forecast",
    s"""WITH RECURSIVE x AS (
       |  SELECT o_orderpriority AS p, date_trunc('month', o_orderdate)
       |      AS month,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM orders GROUP BY 1, 2),
       |r AS (
       |  SELECT p, rev, row_number() OVER (
       |    PARTITION BY p ORDER BY month) AS rn FROM x),
       |n AS (SELECT p, COUNT(*) AS n FROM r GROUP BY 1),
       |h AS (
       |  SELECT r1.p, CAST(2 AS BIGINT) AS j, r1.rev AS lv,
       |    r2.rev - r1.rev AS tr
       |  FROM (SELECT p, rev FROM r WHERE rn = 1) r1
       |  JOIN (SELECT p, rev FROM r WHERE rn = 2) r2 USING (p)
       |  UNION ALL
       |  SELECT h.p, h.j + 1,
       |    $HoltAlpha*r.rev + ${1 - HoltAlpha}*(h.lv + h.tr),
       |    $HoltBeta*(($HoltAlpha*r.rev + ${1 - HoltAlpha}*(h.lv + h.tr))
       |      - h.lv) + ${1 - HoltBeta}*h.tr
       |  FROM h JOIN r ON r.p = h.p AND r.rn = h.j + 1)
       |SELECT p AS o_orderpriority, CAST(n AS BIGINT) AS n_months,
       |  round(lv + tr, 6) AS forecast
       |FROM h JOIN n USING (p) WHERE j = n""".stripMargin) { (s, dir) =>
    val monthly = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    val series = monthly
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_list(
        struct(col("month"), col("rev").cast("double").as("rev"))))
        .as("sr"))
      .withColumn("l", transform(col("sr"), _.getField("rev")))
    def step(acc: Column, x: Column): Column = {
      val lv = lit(HoltAlpha) * x +
        lit(1 - HoltAlpha) * (acc.getField("lv") + acc.getField("tr"))
      struct(lv.as("lv"),
        (lit(HoltBeta) * (lv - acc.getField("lv")) +
          lit(1 - HoltBeta) * acc.getField("tr")).as("tr"))
    }
    series.select(col("o_orderpriority"),
      size(col("l")).cast("long").as("n_months"),
      round({
        val acc = aggregate(
          slice(col("l"), lit(3), greatest(size(col("l")) - 2, lit(0))),
          struct(element_at(col("l"), 1).as("lv"),
            (element_at(col("l"), 2) - element_at(col("l"), 1)).as("tr")),
          step)
        acc.getField("lv") + acc.getField("tr")
      }, 6).as("forecast"))
  }

  // ------------------------------------------------------------ q167

  /** Exact Pearson correlation matrix over the four lineitem measures
    * (q117's power-sum machinery widened to CROSS moments): all 14
    * sums — four Σx, four Σx², six Σxy — come from ONE map-side-
    * combinable aggregate over hundredths-scaled integers in
    * DECIMAL(38)/HUGEINT (associative-exact under any partitioning,
    * unlike a streaming covariance). Each correlation is then a fixed
    * double tree over the exact sums; sqrt is IEEE-correctly-rounded,
    * so values match the oracle bit for bit at 6 dp. */
  val q167 = Query(
    "q167_correlation_matrix",
    """WITH c AS (
      |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS e,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d,
      |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS t
      |  FROM lineitem),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(q AS HUGEINT)) AS DOUBLE) AS sq,
      |    CAST(SUM(CAST(e AS HUGEINT)) AS DOUBLE) AS se,
      |    CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) AS sd,
      |    CAST(SUM(CAST(t AS HUGEINT)) AS DOUBLE) AS st,
      |    CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE) AS sqq,
      |    CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE) AS see,
      |    CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE) AS sdd,
      |    CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS stt,
      |    CAST(SUM(CAST(q AS HUGEINT) * e) AS DOUBLE) AS sqe,
      |    CAST(SUM(CAST(q AS HUGEINT) * d) AS DOUBLE) AS sqd,
      |    CAST(SUM(CAST(q AS HUGEINT) * t) AS DOUBLE) AS sqt,
      |    CAST(SUM(CAST(e AS HUGEINT) * d) AS DOUBLE) AS sed,
      |    CAST(SUM(CAST(e AS HUGEINT) * t) AS DOUBLE) AS set_,
      |    CAST(SUM(CAST(d AS HUGEINT) * t) AS DOUBLE) AS sdt
      |  FROM c)
      |SELECT var_x, var_y, n_rows,
      |  round((n * sxy - sx * sy)
      |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
      |    AS corr
      |FROM (
      |  SELECT 'quantity' AS var_x, 'extendedprice' AS var_y, n_rows,
      |    n, sqe AS sxy, sq AS sx, se AS sy, sqq AS sxx, see AS syy FROM s
      |  UNION ALL SELECT 'quantity', 'discount', n_rows,
      |    n, sqd, sq, sd, sqq, sdd FROM s
      |  UNION ALL SELECT 'quantity', 'tax', n_rows,
      |    n, sqt, sq, st, sqq, stt FROM s
      |  UNION ALL SELECT 'extendedprice', 'discount', n_rows,
      |    n, sed, se, sd, see, sdd FROM s
      |  UNION ALL SELECT 'extendedprice', 'tax', n_rows,
      |    n, set_, se, st, see, stt FROM s
      |  UNION ALL SELECT 'discount', 'tax', n_rows,
      |    n, sdt, sd, st, sdd, stt FROM s)""".stripMargin) { (s, dir) =>
    val c = Tables.lineitem(s, dir).select(
      (money(col("l_quantity")) * 100).cast("long").as("q"),
      (money(col("l_extendedprice")) * 100).cast("long").as("e"),
      (money(col("l_discount")) * 100).cast("long").as("d"),
      (money(col("l_tax")) * 100).cast("long").as("t"))
    def dd(x: String) = col(x).cast(D38)
    val sums = c.agg(
      count(lit(1)).cast("double").as("n"),
      count(lit(1)).as("n_rows"),
      sum(dd("q")).cast("double").as("sq"),
      sum(dd("e")).cast("double").as("se"),
      sum(dd("d")).cast("double").as("sd"),
      sum(dd("t")).cast("double").as("st"),
      sum(dd("q") * col("q")).cast("double").as("sqq"),
      sum(dd("e") * col("e")).cast("double").as("see"),
      sum(dd("d") * col("d")).cast("double").as("sdd"),
      sum(dd("t") * col("t")).cast("double").as("stt"),
      sum(dd("q") * col("e")).cast("double").as("sqe"),
      sum(dd("q") * col("d")).cast("double").as("sqd"),
      sum(dd("q") * col("t")).cast("double").as("sqt"),
      sum(dd("e") * col("d")).cast("double").as("sed"),
      sum(dd("e") * col("t")).cast("double").as("set_"),
      sum(dd("d") * col("t")).cast("double").as("sdt"))
    val pairs = Seq(
      ("quantity", "extendedprice", "sqe", "sq", "se", "sqq", "see"),
      ("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"),
      ("quantity", "tax", "sqt", "sq", "st", "sqq", "stt"),
      ("extendedprice", "discount", "sed", "se", "sd", "see", "sdd"),
      ("extendedprice", "tax", "set_", "se", "st", "see", "stt"),
      ("discount", "tax", "sdt", "sd", "st", "sdd", "stt"))
    pairs.map { case (vx, vy, sxy, sx, sy, sxx, syy) =>
      sums.select(lit(vx).as("var_x"), lit(vy).as("var_y"), col("n_rows"),
        round((col("n") * col(sxy) - col(sx) * col(sy)) /
          (sqrt(col("n") * col(sxx) - col(sx) * col(sx)) *
            sqrt(col("n") * col(syy) - col(sy) * col(sy))), 6).as("corr"))
    }.reduce(_ unionAll _)
  }

  // ------------------------------------------------------------ q169

  /** Forecast-accuracy backtest (MASE — mean absolute scaled error,
    * the standard scale-free forecast metric): the seasonal-naive
    * forecast x_{t-12} is scored against the walk-forward naive
    * x_{t-1} over each priority's monthly revenue series. Lag joins
    * are self-equi-joins on (priority, month±k) — no windows, no
    * order dependence; absolute errors are exact integer cents summed
    * exactly, with ONE double division (the MASE ratio) per group. */
  val q169 = Query(
    "q169_mase_backtest",
    """WITH m AS (
      |  SELECT o_orderpriority AS p, date_trunc('month', o_orderdate)
      |      AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1, 2),
      |sn AS (
      |  SELECT a.p, a.month, abs(a.rev - b.rev) AS err
      |  FROM m a JOIN m b
      |    ON b.p = a.p AND b.month = a.month - INTERVAL 12 MONTH),
      |nv AS (
      |  SELECT a.p, a.month, abs(a.rev - b.rev) AS err
      |  FROM m a JOIN m b
      |    ON b.p = a.p AND b.month = a.month - INTERVAL 1 MONTH
      |  WHERE a.month >= (SELECT MIN(month) + INTERVAL 12 MONTH FROM m)),
      |s AS (
      |  SELECT sn.p, CAST(COUNT(*) AS BIGINT) AS n_backtest_months,
      |    SUM(sn.err) AS sae FROM sn GROUP BY 1),
      |v AS (SELECT p, SUM(err) AS nae, COUNT(*) AS nn FROM nv GROUP BY 1)
      |SELECT s.p AS o_orderpriority, n_backtest_months,
      |  round((CAST(sae AS DOUBLE) / n_backtest_months)
      |    / (CAST(nae AS DOUBLE) / nn), 6) AS mase
      |FROM s JOIN v ON v.p = s.p""".stripMargin) { (s, dir) =>
    val m = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("p"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev"))
    def lagged(k: Int) = m.select(col("p"), col("month"),
      col("rev").as("prev"))
      .withColumn("month", col("month") + expr(s"INTERVAL $k MONTH"))
    val sn = m.join(lagged(12), Seq("p", "month"))
      .select(col("p"), col("month"), abs(col("rev") - col("prev"))
        .as("err"))
    val minM = m.agg(min(col("month")).as("m0"))
    val nv = m.join(lagged(1), Seq("p", "month"))
      .crossJoin(broadcast(minM))
      .filter(col("month") >= col("m0") + expr("INTERVAL 12 MONTH"))
      .select(col("p"), abs(col("rev") - col("prev")).as("err"))
    val sAgg = sn.groupBy(col("p"))
      .agg(count(lit(1)).as("n_backtest_months"), sum(col("err")).as("sae"))
    val vAgg = nv.groupBy(col("p"))
      .agg(sum(col("err")).as("nae"), count(lit(1)).as("nn"))
    sAgg.join(vAgg, Seq("p"))
      .select(col("p").as("o_orderpriority"), col("n_backtest_months"),
        round((col("sae").cast("double") / col("n_backtest_months")) /
          (col("nae").cast("double") / col("nn")), 6).as("mase"))
  }

  // ------------------------------------------------------------ q170

  /** Exact grouped percentile bands (P10/P50/P90 of event value per
    * event type) through the q84 bucketed-histogram pattern: 2-dp
    * values ARE integer cents, so the histogram (type, cents) → count
    * is a lossless map-side-combinable aggregate; the cumulative
    * window runs over aggregated HISTOGRAM rows per type (≤ distinct
    * values, not events), and each band picks the FIRST value whose
    * cumulative count reaches the integer-cross-multiplied rank
    * threshold — no approximation, no per-event sort, no global
    * window, identical arithmetic in both engines. */
  val q170 = Query(
    "q170_percentile_bands",
    """WITH h AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, cents, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |b AS (
      |  SELECT event_type, q,
      |    MIN(cents) AS cents
      |  FROM c CROSS JOIN (VALUES (10), (50), (90)) AS t(q)
      |  WHERE cum * 100 >= q * n
      |  GROUP BY 1, 2)
      |SELECT event_type,
      |  CAST(MAX(CASE WHEN q = 10 THEN cents END) AS DOUBLE) / 100 AS p10,
      |  CAST(MAX(CASE WHEN q = 50 THEN cents END) AS DOUBLE) / 100 AS p50,
      |  CAST(MAX(CASE WHEN q = 90 THEN cents END) AS DOUBLE) / 100 AS p90
      |FROM b GROUP BY 1""".stripMargin) { (s, dir) =>
    val h = Tables.events(s, dir)
      .groupBy(col("event_type"),
        (money(col("value")) * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val totals = h.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    val c = h.select(col("event_type"), col("cents"),
        sum(col("cnt")).over(w).as("cum"))
      .join(broadcast(totals), Seq("event_type"))
    val qs = s.range(0, 3).select(
      element_at(array(lit(10), lit(50), lit(90)), col("id").cast("int") + 1)
        .as("q"))
    c.crossJoin(broadcast(qs))
      .filter(col("cum") * 100 >= col("q") * col("n"))
      .groupBy(col("event_type"), col("q"))
      .agg(min(col("cents")).as("cents"))
      .groupBy(col("event_type"))
      .agg(
        (max(when(col("q") === 10, col("cents"))).cast("double") / 100)
          .as("p10"),
        (max(when(col("q") === 50, col("cents"))).cast("double") / 100)
          .as("p50"),
        (max(when(col("q") === 90, col("cents"))).cast("double") / 100)
          .as("p90"))
  }

  // ------------------------------------------------------------ q171

  /** Streaming mergeable-sketch state
    * ([[graft.streaming.Streaming.streamIntoSketchRollup]]): the
    * micro-batch-maintained daily theta-sketch table rolled up to
    * monthly distinct users by SKETCH UNION — q140's rollup with the
    * state built by a stream instead of a batch scan, and the
    * mid-day split proving cross-batch merge. Exact counts ride
    * along; the q39/q140 tolerance contract closes it (exact mode at
    * test scale). */
  val q171 = Query(
    "q171_stream_sketch_rollup",
    """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_within_tolerance
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.operators.Sketch
    import graft.sources.Ingest
    val name = s"graft_strsketch_${math.abs(dir.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS $name")
    Ingest.deletePath(s,
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
        s"/$name")
    val daily = graft.streaming.Streaming.streamIntoSketchRollup(
      s, s"$dir/events.parquet", name, "2024-01-15 12:00:00")
    val monthly = daily
      .groupBy(date_trunc("month", col("day").cast("timestamp_ntz"))
        .as("month"))
      .agg(Sketch.thetaUnionEstimate(col("sketch")).as("approx"))
    val exact = Tables.events(s, dir)
      .groupBy(date_trunc("month", col("ts")).as("month"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(monthly, Seq("month"))
      .select(col("month").cast("timestamp_ntz").as("month"),
        col("exact_users"),
        (abs(col("approx") - col("exact_users")).cast("double") /
          col("exact_users") < 0.15).as("approx_within_tolerance"))
  }

  // ------------------------------------------------------------ q181

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM
    * 2013): users split into two variants by id parity, the
    * pre-period (Jan 1–15) per-user spend is the covariate, the
    * post-period (Jan 16+) spend is the metric, and
    * `θ = cov(X,Y)/var(X)` — computed from exact HUGEINT/DECIMAL(38)
    * cents power sums, the q117 discipline — adjusts each variant's
    * post mean: `μ_adj = μ_Y − θ·(μ_X − X̄)`. Variant means need only
    * per-variant integer sums (the per-user adjustment is affine), so
    * the whole readout is two map-combinable aggregates and one
    * broadcast of the global θ row. 6-dp rounding closes the one
    * double division per figure. */
  val q181 = Query(
    "q181_cuped_adjustment",
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |    COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END), 0) AS x,
      |    COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END), 0) AS y
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      |  FROM u),
      |v AS (
      |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(COUNT(*) AS DOUBLE) AS nv,
      |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sxv,
      |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS syv
      |  FROM u GROUP BY 1),
      |t AS (
      |  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
      |    sx / n AS xbar FROM g)
      |SELECT CAST(variant AS BIGINT) AS variant, n_users,
      |  ROUND(syv / nv / 100.0, 6) AS mean_post,
      |  ROUND((syv / nv - theta * (sxv / nv - xbar)) / 100.0, 6)
      |    AS mean_adjusted,
      |  ROUND(theta, 6) AS theta
      |FROM v CROSS JOIN t""".stripMargin) { (s, dir) =>
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val cents = (money(col("value")) * 100).cast("long")
    val u = Tables.events(s, dir)
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(
        coalesce(sum(when(col("ts") < cut, cents).otherwise(0L)), lit(0L))
          .as("x"),
        coalesce(sum(when(col("ts") >= cut, cents).otherwise(0L)), lit(0L))
          .as("y"))
    val xd = col("x").cast(D38)
    val g = u.agg(
      count(lit(1)).cast("double").as("n"),
      sum(xd).cast("double").as("sx"),
      sum(col("y").cast(D38)).cast("double").as("sy"),
      sum(xd * col("x")).cast("double").as("sxx"),
      sum(xd * col("y")).cast("double").as("sxy"))
    val t = g.select(
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))).as("theta"),
      (col("sx") / col("n")).as("xbar"))
    val v = u.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        count(lit(1)).cast("double").as("nv"),
        sum(xd).cast("double").as("sxv"),
        sum(col("y").cast(D38)).cast("double").as("syv"))
    v.crossJoin(broadcast(t))
      .select(col("variant"), col("n_users"),
        round(col("syv") / col("nv") / 100.0, 6).as("mean_post"),
        round((col("syv") / col("nv") - col("theta") *
          (col("sxv") / col("nv") - col("xbar"))) / 100.0, 6)
          .as("mean_adjusted"),
        round(col("theta"), 6).as("theta"))
  }

  // ------------------------------------------------------------ q183

  /** Pre-join skew audit — the fan-out forecast you run BEFORE
    * committing a 100 TB join: per-key row counts on each side, the
    * per-key output estimate `n_left · n_right`, and the top-10
    * hottest keys through the distributed rank (no global window).
    * The audit itself is two map-combinable counts and a broadcast-
    * sized join of the count frames — reading two tables' keys, never
    * their payloads. These are the numbers that decide broadcast vs
    * shuffle vs salting (`operators/Skew.saltedJoin`, q58). */
  val q183 = Query(
    "q183_join_skew_audit",
    """WITH l AS (
      |  SELECT o_custkey AS key, COUNT(*) AS n_left
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT user_id AS key, COUNT(*) AS n_right
      |  FROM events GROUP BY 1),
      |j AS (
      |  SELECT l.key, n_left, n_right, n_left * n_right AS est_rows
      |  FROM l JOIN r USING (key)),
      |rk AS (
      |  SELECT key, n_left, n_right, est_rows,
      |    ROW_NUMBER() OVER (ORDER BY est_rows DESC, key) AS rnk
      |  FROM j QUALIFY rnk <= 10)
      |SELECT CAST(key AS BIGINT) AS key,
      |  CAST(n_left AS BIGINT) AS n_left,
      |  CAST(n_right AS BIGINT) AS n_right,
      |  CAST(est_rows AS BIGINT) AS est_rows,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM rk""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val l = Tables.orders(s, dir).groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val r = Tables.events(s, dir).groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val j = l.join(r, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("est_rows"))
    Ranking.withGlobalRank(j,
        struct((-col("est_rows")).as("ne"), col("key").as("k")).asc, "rnk")
      .filter(col("rnk") <= 10)
      .select(col("key"), col("n_left"), col("n_right"), col("est_rows"),
        col("rnk"))
  }

  // ------------------------------------------------------------ q184

  /** Rate screen for log-derived training data: per-user peak
    * events-per-hour against a fixed abuse threshold — the bot /
    * scraper filter a pipeline runs before user-generated text enters
    * a corpus. Two map-combinable aggregates (user×hour counts, then
    * per-user max/sum); no windows, no self-joins; the flagged set is
    * naturally tiny. */
  val q184 = Query(
    "q184_rate_screen",
    """WITH h AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, MAX(n) AS peak_hour_events,
      |    SUM(n) AS n_events, COUNT(*) AS n_active_hours
      |  FROM h GROUP BY 1)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |  CAST(peak_hour_events AS BIGINT) AS peak_hour_events,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_active_hours AS BIGINT) AS n_active_hours
      |FROM u WHERE peak_hour_events >= 4""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("peak_hour_events"),
        sum(col("n")).as("n_events"),
        count(lit(1)).as("n_active_hours"))
      .filter(col("peak_hour_events") >= 4)
  }

  // ------------------------------------------------------------ q179

  private val BfsMaxHops = 4

  /** BFS reach audit ([[graft.operators.Graph.bfsHops]]): hop distance
    * from the seed parts (partkey ≡ 0 mod 500) over the part↔supplier
    * sourcing graph (q111's edge set) — "every entity within k
    * relationship hops of a watchlist", the traversal form the graph
    * family was missing next to PageRank / components / triangles.
    * Output: nodes per hop (0 = seeds) plus a hop = −1 row for nodes
    * outside the [[BfsMaxHops]]-hop ball. The oracle unrolls the same
    * frontier rounds as chained CTEs — exact set equality per round,
    * no tolerance. */
  val q179 = Query(
    "q179_bfs_reach", {
      val rounds = (1 to BfsMaxHops).map { h =>
        val prevF = if (h == 1) "v0" else s"f${h - 1}"
        s"""f$h AS (
           |  SELECT DISTINCT e.dst AS node FROM e
           |  JOIN $prevF p ON p.node = e.src
           |  WHERE e.dst NOT IN (SELECT node FROM v${h - 1})),
           |v$h AS (SELECT node, hop FROM v${h - 1}
           |  UNION ALL SELECT node, $h AS hop FROM f$h)"""
      }.mkString(",\n")
      s"""WITH pe AS (
         |  SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS a,
         |    's:' || CAST(l_suppkey AS VARCHAR) AS b
         |  FROM lineitem),
         |e AS (SELECT a AS src, b AS dst FROM pe
         |  UNION ALL SELECT b, a FROM pe),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |v0 AS (
         |  SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS node,
         |    0 AS hop
         |  FROM lineitem WHERE l_partkey % 500 = 0),
         |$rounds
         |SELECT CAST(hop AS BIGINT) AS hop,
         |  CAST(COUNT(*) AS BIGINT) AS n_nodes
         |FROM v$BfsMaxHops GROUP BY 1
         |UNION ALL
         |SELECT -1, (SELECT COUNT(*) FROM nodes)
         |  - (SELECT COUNT(*) FROM v$BfsMaxHops)""".stripMargin
    }) { (s, dir) =>
    import graft.operators.Graph
    val edges = partSupplierEdges(s, dir)
    val seeds = Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 500 === 0)
      .select(concat(lit("p:"), col("l_partkey").cast("string"))
        .as("node"))
    val visited = Graph.bfsHops(edges, seeds, BfsMaxHops)
    val nodes = edges.select(col("src").as("node")).distinct()
    val unreached = nodes
      .join(visited.select(col("node")), Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1L).as("hop"), col("n_nodes"))
    visited.groupBy(col("hop"))
      .agg(count(lit(1)).as("n_nodes"))
      .unionByName(unreached)
  }

  // ------------------------------------------------------------ q195

  private val LpaIters = 3

  /** Community detection over the part↔supplier sourcing graph (the
    * q111/q179 shared edge frame) by SYNCHRONOUS label propagation:
    * every node starts as its own label, and each of [[LpaIters]]
    * rounds every node adopts the most frequent label among its
    * neighbors (ties broken by smallest label) — the classic
    * near-linear community detector (Raghavan et al. 2007), made fully
    * deterministic by the synchronous schedule and the total
    * (count desc, label asc) tie-break, so a SQL engine replays it
    * round for round (the oracle unrolls the same [[LpaIters]] CTEs).
    *
    * Each node's OWN current label joins the vote (a self-loop of
    * weight 1): plain synchronous LPA 2-cycles on bipartite graphs
    * (each side adopts the other's labels forever — and this graph IS
    * bipartite), while the self-vote anchors converged nodes and is
    * the standard convergence fix for the synchronous schedule.
    *
    * Scale posture: each round is ONE equi-join of the cached edge
    * frame with the (node, label) frame plus one map-side-combinable
    * count and one PER-NODE window — the O(iters·m) Pregel schedule,
    * no driver-side state, no global window. A fixed round count
    * (not convergence-polled) keeps the plan static. */
  val q195 = Query(
    "q195_label_propagation", {
      val iterCtes = (1 to LpaIters).map { i =>
        s"""n$i AS (
           |  SELECT src, label, COUNT(*) AS cnt FROM (
           |    SELECT e.src, l.label
           |    FROM e JOIN l${i - 1} l ON l.node = e.dst
           |    UNION ALL SELECT node AS src, label FROM l${i - 1})
           |  GROUP BY 1, 2),
           |l$i AS (
           |  SELECT src AS node, label FROM (
           |    SELECT src, label,
           |      row_number() OVER (PARTITION BY src
           |        ORDER BY cnt DESC, label) AS rk
           |    FROM n$i) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pe AS (
         |  SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS a,
         |    's:' || CAST(l_suppkey AS VARCHAR) AS b
         |  FROM lineitem),
         |e AS (SELECT a AS src, b AS dst FROM pe
         |  UNION ALL SELECT b AS src, a AS dst FROM pe),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         |$iterCtes
         |SELECT label AS community,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(CASE WHEN node LIKE 'p:%' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_parts,
         |  CAST(SUM(CASE WHEN node LIKE 's:%' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_suppliers,
         |  MIN(node) AS first_member
         |FROM l$LpaIters GROUP BY 1""".stripMargin
    }) { (s, dir) =>
    val labels = Graph.labelPropagation(partSupplierEdges(s, dir),
      LpaIters)
    labels.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("node").startsWith("p:"), 1).otherwise(0))
          .cast("long").as("n_parts"),
        sum(when(col("node").startsWith("s:"), 1).otherwise(0))
          .cast("long").as("n_suppliers"),
        min(col("node")).as("first_member"))
  }

  // ------------------------------------------------------------ q207

  /** Experiment readout with INFERENCE: per variant (the q181 id-parity
    * split), the user-level conversion rate with its Wilson 95%
    * interval — the binomial CI that stays inside [0,1] and behaves at
    * small n, i.e. what an experimentation platform actually prints
    * next to a rate. Counts are one map-side-combinable aggregate; the
    * interval is a fixed parenthesized chain of IEEE ops on those
    * exact counts whose only transcendental is `sqrt` — correctly
    * rounded per IEEE-754 in every engine, unlike ln/exp — so both
    * engines agree bit for bit before the 6-dp close. */
  val q207 = Query(
    "q207_wilson_readout",
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS conv
      |  FROM events GROUP BY 1, 2),
      |v AS (
      |  SELECT variant, COUNT(*) AS n, SUM(conv) AS k
      |  FROM u GROUP BY 1),
      |w AS (
      |  SELECT variant, n, k,
      |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM v)
      |SELECT CAST(variant AS BIGINT) AS variant,
      |  CAST(n AS BIGINT) AS n_users, CAST(k AS BIGINT) AS n_conv,
      |  ROUND(p, 6) AS rate,
      |  ROUND(((p + (3.8416 / (2.0 * nd)))
      |    - (1.96 * sqrt(((p * (1.0 - p)) / nd)
      |      + (3.8416 / ((4.0 * nd) * nd)))))
      |    / (1.0 + (3.8416 / nd)), 6) AS wilson_lo,
      |  ROUND(((p + (3.8416 / (2.0 * nd)))
      |    + (1.96 * sqrt(((p * (1.0 - p)) / nd)
      |      + (3.8416 / ((4.0 * nd) * nd)))))
      |    / (1.0 + (3.8416 / nd)), 6) AS wilson_hi
      |FROM w""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("conv"))
    val v = u.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    val nd = col("n").cast("double")
    val p = col("k").cast("double") / nd
    val center = p + (lit(3.8416d) / (lit(2.0d) * nd))
    val margin = lit(1.96d) * sqrt(((p * (lit(1.0d) - p)) / nd) +
      (lit(3.8416d) / ((lit(4.0d) * nd) * nd)))
    val denomw = lit(1.0d) + (lit(3.8416d) / nd)
    v.select(col("variant").cast("long").as("variant"),
      col("n").cast("long").as("n_users"),
      col("k").cast("long").as("n_conv"),
      round(p, 6).as("rate"),
      round((center - margin) / denomw, 6).as("wilson_lo"),
      round((center + margin) / denomw, 6).as("wilson_hi"))
  }

  // ------------------------------------------------------------ q201

  private val SpWidth = 50 // value-bucket width
  private val SpB = 10 // fixed bucket count

  /** STREAMING drift monitor: micro-batches maintain a
    * day-partitioned (day, bucket, count) histogram state table
    * ([[graft.streaming.Streaming.streamIntoBucketCounts]] — additive
    * merge into touched partitions only, replay-guarded), and the
    * readout computes each day's PSI of the event-value distribution
    * against the whole-period reference — q199's alarm pointed at a
    * stream, with the reference derived from the SAME state table (one
    * rollup, no second fact scan). Fixed data-independent bucket edges
    * mean every micro-batch/replay buckets identically, which is what
    * makes histogram state mergeable at all. Oracle replays the batch
    * equivalent — the streamed state table must equal the batch
    * aggregate exactly (the q127/q171 exactly-once contract). */
  val q201 = Query(
    "q201_stream_psi_drift",
    s"""WITH d AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    LEAST(CAST(floor(value / $SpWidth) AS BIGINT), ${SpB - 1})
       |      AS b
       |  FROM events),
       |db AS (SELECT day, b, COUNT(*) AS c FROM d GROUP BY 1, 2),
       |dt AS (SELECT day, SUM(c) AS tot FROM db GROUP BY 1),
       |rb AS (SELECT b, SUM(c) AS rc FROM db GROUP BY 1),
       |rt AS (SELECT SUM(c) AS rtot FROM db),
       |grid AS (
       |  SELECT dd.day, g.b
       |  FROM (SELECT DISTINCT day FROM d) dd
       |  CROSS JOIN (SELECT UNNEST(range($SpB)) AS b) g),
       |terms AS (
       |  SELECT grid.day, dt.tot,
       |    (COALESCE(db.c, 0) + 1.0) / (dt.tot + $SpB.0) AS p,
       |    (COALESCE(rb.rc, 0) + 1.0) / (rt.rtot + $SpB.0) AS q
       |  FROM grid
       |  LEFT JOIN db ON db.day = grid.day AND db.b = grid.b
       |  JOIN dt ON dt.day = grid.day
       |  LEFT JOIN rb ON rb.b = grid.b
       |  CROSS JOIN rt)
       |SELECT CAST(day AS TIMESTAMP) AS day,
       |  CAST(MAX(tot) AS BIGINT) AS n_events,
       |  round(SUM((p - q) * ln(p / q)), 6) AS psi
       |FROM terms GROUP BY 1""".stripMargin) { (s, dir) =>
    val name = s"graft_strpsi_${math.abs(dir.hashCode)}"
    graft.sources.Materialize.dropAggState(s, name)
    val db = graft.streaming.Streaming.streamIntoBucketCounts(
      s, s"$dir/events.parquet", name, "2024-01-15 12:00:00",
      SpWidth, SpB)
    val dt = db.groupBy(col("day")).agg(sum(col("c")).as("tot"))
    val rb = db.groupBy(col("b")).agg(sum(col("c")).as("rc"))
    val rt = db.agg(sum(col("c")).as("rtot"))
    val grid = db.select(col("day")).distinct()
      .withColumn("b", explode(sequence(lit(0L), lit((SpB - 1).toLong))))
    val terms = grid
      .join(db, Seq("day", "b"), "left")
      .join(dt, Seq("day"))
      .join(broadcast(rb), Seq("b"), "left")
      .crossJoin(broadcast(rt))
      .select(col("day"), col("tot"),
        ((coalesce(col("c"), lit(0L)) + 1.0d) /
          (col("tot") + lit(SpB.toDouble))).as("p"),
        ((coalesce(col("rc"), lit(0L)) + 1.0d) /
          (col("rtot") + lit(SpB.toDouble))).as("q"))
    terms.groupBy(col("day").cast("timestamp_ntz").as("day"))
      .agg(max(col("tot")).cast("long").as("n_events"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"))
  }

  val all: Seq[Query] = Seq(q106, q107, q108, q109, q110, q111, q112,
    q113, q114, q115, q116, q117, q118, q119, q121, q122, q123, q124,
    q127, q129, q130, q131, q132, q133, q140, q142, q151, q152, q153,
    q154, q156, q157, q159, q161, q162, q163, q167, q169, q170, q171,
    q179, q181, q183, q184, q195, q201, q207, q251, q252, q253)
}
