package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Functions.money
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

  val all: Seq[Query] = Seq(q106, q110, q112)
}
