package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Functions.tokens
import graft.sources.Tables

/** Model-adjacent analytics: the feature-engineering, evaluation, and
  * monitoring passes an ML platform runs on warehouse/corpus data
  * before and after training — closed-form regression from distributed
  * sufficient statistics, χ² feature selection, threshold-free ranking
  * evaluation (AUC), and population-stability drift monitoring.
  *
  * Reference basis: the reference's marts feed BI and "further
  * analysis" (reference `README.md:12,59`); these are the standard ML
  * follow-ons over such marts, and they complete the project's
  * training-data north star (quality scores exist → is the signal
  * predictive? sources exist → did their distribution drift?).
  *
  * Determinism contract (repo-wide): exact integer/decimal aggregation
  * first; double arithmetic only as a fixed parenthesized sequence of
  * IEEE ops at the end (identical expression tree in the oracle), so
  * DuckDB replays every value bit for bit. The one libm use (PSI's
  * `ln`) follows the q113/q141 precedent: O(1)-magnitude ratios,
  * 6-dp-rounded outputs.
  */
object Modeling {

  private val d38 = DecimalType(38, 0)

  /** Exact decimal → correctly-rounded double, portably: the cast goes
    * THROUGH a decimal string, so both engines do an IEEE-754
    * correctly-rounded string→double parse (OpenJDK's
    * `BigDecimal.doubleValue` shortcuts only below 2⁵², and DuckDB's
    * int128→double is not documented correctly-rounded — the string
    * route pins both). Used on the >2⁵³ cross-products in q196. */
  private def dd(c: Column): Column = c.cast("string").cast("double")

  // ------------------------------------------------------------ q196

  /** Two-regressor OLS (price ~ quantity + discount) computed entirely
    * from DISTRIBUTED SUFFICIENT STATISTICS: one map-side-combinable
    * aggregate produces the 10 exact decimal sums (n, Σx, Σx², Σxy …),
    * and the normal equations are solved in closed form (Cramer on the
    * n-scaled centered moments) in the final one-row projection — the
    * textbook "train a linear model in one scan" pattern; no gradient
    * loop, no driver-side matrix, nothing proportional to row count
    * anywhere.
    *
    * Exactness: per-row products are small longs; sums are
    * DECIMAL(38,0) (overflow-safe far past the test SFs); the n-scaled
    * centered moments and their Cramer cross-products stay exact in
    * 38-digit decimal (DuckDB: HUGEINT) up to ~10⁸ rows of this
    * schema. Beyond that the production path centers by streaming
    * means and gives up oracle bit-parity — recorded here rather than
    * hidden. The exact integers cross to double via [[dd]] and the
    * final β/R² arithmetic is a fixed parenthesized IEEE sequence.
    */
  val q196 = Query(
    "q196_ols_price_model",
    """WITH b AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x1,
      |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
      |    CAST(floor(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem),
      |st AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(x1) AS HUGEINT) AS s1,
      |    CAST(SUM(x2) AS HUGEINT) AS s2,
      |    CAST(SUM(y) AS HUGEINT) AS sy,
      |    CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
      |    CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
      |    CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
      |    CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
      |    CAST(SUM(x2 * y) AS HUGEINT) AS s2y,
      |    CAST(SUM(y * y) AS HUGEINT) AS syy
      |  FROM b),
      |m AS (
      |  SELECT n, s1, s2, sy,
      |    n * s11 - s1 * s1 AS a11,
      |    n * s12 - s1 * s2 AS a12,
      |    n * s22 - s2 * s2 AS a22,
      |    n * s1y - s1 * sy AS c1,
      |    n * s2y - s2 * sy AS c2,
      |    n * syy - sy * sy AS syyc
      |  FROM st),
      |x AS (
      |  SELECT n, s1, s2, sy, c1, c2, syyc,
      |    a11 * a22 - a12 * a12 AS det,
      |    c1 * a22 - c2 * a12 AS b1n,
      |    a11 * c2 - a12 * c1 AS b2n
      |  FROM m),
      |f AS (
      |  SELECT CAST(n AS BIGINT) AS n_rows,
      |    CAST(CAST(n AS VARCHAR) AS DOUBLE) AS nd,
      |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
      |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d,
      |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
      |    CAST(CAST(c1 AS VARCHAR) AS DOUBLE) AS c1d,
      |    CAST(CAST(c2 AS VARCHAR) AS DOUBLE) AS c2d,
      |    CAST(CAST(syyc AS VARCHAR) AS DOUBLE) AS syycd,
      |    CAST(CAST(det AS VARCHAR) AS DOUBLE) AS detd,
      |    CAST(CAST(b1n AS VARCHAR) AS DOUBLE) AS b1nd,
      |    CAST(CAST(b2n AS VARCHAR) AS DOUBLE) AS b2nd
      |  FROM x),
      |g AS (
      |  SELECT n_rows, nd, s1d, s2d, syd, c1d, c2d, syycd, detd,
      |    CASE WHEN detd != 0.0 THEN b1nd / detd END AS beta1,
      |    CASE WHEN detd != 0.0 THEN b2nd / detd END AS beta2
      |  FROM f)
      |SELECT n_rows,
      |  CASE WHEN nd != 0.0 THEN ROUND(syd / nd, 6) END AS mean_price,
      |  CASE WHEN detd != 0.0 THEN
      |    ROUND(((syd - (beta1 * s1d)) - (beta2 * s2d)) / nd, 6)
      |  END AS beta_intercept,
      |  CASE WHEN detd != 0.0 THEN ROUND(beta1, 6) END AS beta_quantity,
      |  CASE WHEN detd != 0.0 THEN ROUND(beta2, 6) END AS beta_discount,
      |  CASE WHEN detd != 0.0 AND syycd != 0.0 THEN
      |    ROUND(((beta1 * c1d) + (beta2 * c2d)) / syycd, 6)
      |  END AS r2
      |FROM g""".stripMargin) { (s, dir) =>
    // fixture doubles: quantity is integral (cast exact in both
    // engines); discount×100 sits an ulp off an integer, so ROUND
    // before the integer cast (Spark's double→long cast truncates,
    // DuckDB's rounds — round() first makes both exact); floor of the
    // shared price double is the same IEEE op in both
    val b = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100).cast("long").as("x2"),
      floor(col("l_extendedprice")).cast("long").as("y"))
    val st = b.agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x1").cast(d38)).as("s1"),
      sum(col("x2").cast(d38)).as("s2"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x1") * col("x1")).cast(d38)).as("s11"),
      sum((col("x1") * col("x2")).cast(d38)).as("s12"),
      sum((col("x2") * col("x2")).cast(d38)).as("s22"),
      sum((col("x1") * col("y")).cast(d38)).as("s1y"),
      sum((col("x2") * col("y")).cast(d38)).as("s2y"),
      sum((col("y") * col("y")).cast(d38)).as("syy"))
    val m = st.select(col("n"), col("s1"), col("s2"), col("sy"),
      (col("n") * col("s11") - col("s1") * col("s1")).as("a11"),
      (col("n") * col("s12") - col("s1") * col("s2")).as("a12"),
      (col("n") * col("s22") - col("s2") * col("s2")).as("a22"),
      (col("n") * col("s1y") - col("s1") * col("sy")).as("c1"),
      (col("n") * col("s2y") - col("s2") * col("sy")).as("c2"),
      (col("n") * col("syy") - col("sy") * col("sy")).as("syyc"))
    val x = m.select(col("n"), col("s1"), col("s2"), col("sy"),
      col("c1"), col("c2"), col("syyc"),
      (col("a11") * col("a22") - col("a12") * col("a12")).as("det"),
      (col("c1") * col("a22") - col("c2") * col("a12")).as("b1n"),
      (col("a11") * col("c2") - col("a12") * col("c1")).as("b2n"))
    val f = x.select(col("n").cast("long").as("n_rows"),
      dd(col("n")).as("nd"), dd(col("s1")).as("s1d"),
      dd(col("s2")).as("s2d"), dd(col("sy")).as("syd"),
      dd(col("c1")).as("c1d"), dd(col("c2")).as("c2d"),
      dd(col("syyc")).as("syycd"), dd(col("det")).as("detd"),
      dd(col("b1n")).as("b1nd"), dd(col("b2n")).as("b2nd"))
    // ANSI mode: division by zero throws, so the degenerate-design
    // (det = 0) and empty-input (n = 0) divisions must be gated BEFORE
    // they evaluate, identically in the oracle's CASE WHEN
    val g = f.select(col("*"),
      when(col("detd") =!= 0.0d, col("b1nd") / col("detd")).as("beta1"),
      when(col("detd") =!= 0.0d, col("b2nd") / col("detd")).as("beta2"))
    val fit = col("detd") =!= 0.0d
    g.select(col("n_rows"),
      when(col("nd") =!= 0.0d, round(col("syd") / col("nd"), 6))
        .as("mean_price"),
      when(fit, round(
        ((col("syd") - (col("beta1") * col("s1d"))) -
          (col("beta2") * col("s2d"))) / col("nd"), 6))
        .as("beta_intercept"),
      when(fit, round(col("beta1"), 6)).as("beta_quantity"),
      when(fit, round(col("beta2"), 6)).as("beta_discount"),
      when(fit && col("syycd") =!= 0.0d, round(
        ((col("beta1") * col("c1d")) + (col("beta2") * col("c2d"))) /
          col("syycd"), 6)).as("r2"))
  }

  // ------------------------------------------------------------ q197

  private val ChiMinDf = 5 // ignore words in fewer docs (unstable χ²)
  private val ChiK = 10 // top terms per language

  /** χ² feature selection: per language, the [[ChiK]] tokens whose
    * document-level presence is most dependent on the language — the
    * classic feature-selection / keyword-extraction statistic over the
    * (token × class) contingency table, run before training any text
    * classifier (and the per-class complement of q166's tf-idf
    * keywords). One distinct (doc, lang, word) frame feeds three
    * map-side-combinable counts; the document-frequency and per-class
    * frames are vocabulary- and class-bounded (Heaps' law), so both
    * broadcast at any corpus size while the corpus itself is scanned
    * once and shuffled only by word. Only terms PRESENT in a class are
    * that class's candidates (the a=0 complement of another class's
    * marker surfaces on that class's own list — χ² is symmetric —
    * so nothing indicative is lost and the candidate set stays
    * presence-bounded). The χ² value is a fixed parenthesized IEEE
    * sequence over exact long counts (all < 2⁵³); ranking uses the
    * raw double (identical in both engines), word tie-break. */
  val q197 = Query(
    "q197_chi2_terms",
    s"""WITH t0 AS (
       |  SELECT doc_id, lang, unnest(${Llm.DTokens}) AS word
       |  FROM documents),
       |t AS (SELECT DISTINCT doc_id, lang, word FROM t0),
       |wl AS (SELECT word, lang, COUNT(*) AS a FROM t GROUP BY 1, 2),
       |w AS (SELECT word, COUNT(*) AS dw FROM t GROUP BY 1),
       |lg AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY 1),
       |g AS (SELECT COUNT(*) AS n FROM documents),
       |sc AS (
       |  SELECT wl.lang, wl.word, wl.a,
       |    ((CAST(n AS DOUBLE)
       |      * CAST(a * (n - nl - dw + a) - (dw - a) * (nl - a)
       |          AS DOUBLE))
       |      * CAST(a * (n - nl - dw + a) - (dw - a) * (nl - a)
       |          AS DOUBLE))
       |    / ((CAST(dw AS DOUBLE) * CAST(n - dw AS DOUBLE))
       |      * (CAST(nl AS DOUBLE) * CAST(n - nl AS DOUBLE))) AS chi2raw
       |  FROM wl JOIN w USING (word) JOIN lg USING (lang) CROSS JOIN g
       |  WHERE dw >= $ChiMinDf AND dw < n AND nl < n),
       |r AS (
       |  SELECT lang, word, a, chi2raw, row_number() OVER (
       |    PARTITION BY lang ORDER BY chi2raw DESC, word) AS rk
       |  FROM sc)
       |SELECT lang, CAST(rk AS BIGINT) AS rk, word,
       |  CAST(a AS BIGINT) AS n_docs_in_lang, ROUND(chi2raw, 4) AS chi2
       |FROM r WHERE rk <= $ChiK""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val t = docs.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("word")).distinct()
    val wl = t.groupBy(col("word"), col("lang"))
      .agg(count(lit(1)).as("a"))
    val w = t.groupBy(col("word")).agg(count(lit(1)).as("dw"))
    val lg = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val g = docs.agg(count(lit(1)).as("n"))
    val adbc = (col("a") * (col("n") - col("nl") - col("dw") + col("a"))
      - (col("dw") - col("a")) * (col("nl") - col("a"))).cast("double")
    val chi2raw = ((col("n").cast("double") * adbc) * adbc) /
      ((col("dw").cast("double") * (col("n") - col("dw")).cast("double"))
        * (col("nl").cast("double")
          * (col("n") - col("nl")).cast("double")))
    val sc = wl.join(broadcast(w), Seq("word"))
      .join(broadcast(lg), Seq("lang")).crossJoin(broadcast(g))
      .filter(col("dw") >= ChiMinDf && col("dw") < col("n") &&
        col("nl") < col("n"))
      .select(col("lang"), col("word"), col("a"), chi2raw.as("chi2raw"))
    val rw = Window.partitionBy(col("lang"))
      .orderBy(col("chi2raw").desc, col("word").asc)
    sc.withColumn("rk", row_number().over(rw))
      .filter(col("rk") <= ChiK)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("word"),
        col("a").cast("long").as("n_docs_in_lang"),
        round(col("chi2raw"), 4).as("chi2"))
  }

  // ------------------------------------------------------------ q198

  /** Ranking evaluation without thresholds: per-source AUC of a
    * candidate quality signal (document length) against a binary
    * relevance label (lang = 'en') via the Mann–Whitney U rank
    * statistic — "is this signal worth filtering on, per source?",
    * the evaluation a curation pipeline runs before turning any score
    * (q28/q84/q94) into a filter. The mid-rank/tie-correct U is
    * computed from per-distinct-score counts with a cumulative window,
    * and 2·U is an EXACT integer (the ·2 clears the tie half-weights),
    * so the only double op is the final division — no rank window over
    * raw rows, no per-row state, and ties (heavy here: small integer
    * scores) are handled exactly. */
  val q198 = Query(
    "q198_quality_auc",
    """WITH d AS (
      |  SELECT source, n_chars AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |gs AS (
      |  SELECT source, score, SUM(pos) AS np, COUNT(*) - SUM(pos) AS nn
      |  FROM d GROUP BY 1, 2),
      |c AS (
      |  SELECT source, np, nn, SUM(nn) OVER (PARTITION BY source
      |    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW) AS cumnn
      |  FROM gs),
      |a AS (
      |  SELECT source, SUM(np) AS npos, SUM(nn) AS nneg,
      |    SUM(np * (2 * (cumnn - nn) + nn)) AS u2
      |  FROM c GROUP BY 1)
      |SELECT source, CAST(npos AS BIGINT) AS n_pos,
      |  CAST(nneg AS BIGINT) AS n_neg,
      |  CASE WHEN npos > 0 AND nneg > 0 THEN
      |    ROUND(CAST(u2 AS DOUBLE) / ((2.0 * CAST(npos AS DOUBLE))
      |      * CAST(nneg AS DOUBLE)), 6)
      |  END AS auc
      |FROM a""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select(col("source"),
      col("n_chars").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val gs = d.groupBy(col("source"), col("score"))
      .agg(sum(col("pos")).as("np"),
        (count(lit(1)) - sum(col("pos"))).as("nn"))
    val w = Window.partitionBy(col("source")).orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = gs.select(col("source"), col("np"), col("nn"),
      sum(col("nn")).over(w).as("cumnn"))
    val a = c.groupBy(col("source"))
      .agg(sum(col("np")).as("npos"), sum(col("nn")).as("nneg"),
        sum(col("np") * (lit(2) * (col("cumnn") - col("nn"))
          + col("nn"))).as("u2"))
    a.select(col("source"), col("npos").cast("long").as("n_pos"),
      col("nneg").cast("long").as("n_neg"),
      when(col("npos") > 0 && col("nneg") > 0,
        round(col("u2").cast("double") /
          ((lit(2.0d) * col("npos").cast("double"))
            * col("nneg").cast("double")), 6)).as("auc"))
  }

  // ------------------------------------------------------------ q199

  private val PsiBuckets = 8 // fixed-width value buckets (width 100)

  /** Population-stability-index drift monitor: per source, the PSI of
    * its document-length distribution against the whole corpus —
    * THE standard production drift alarm over any scored feature
    * (PSI > 0.2 ⇒ investigate), complementing q113's token-space
    * KL/JS with a value-space histogram on fixed data-independent
    * bucket edges (so two runs, or two clusters, bucket identically
    * with no quantile pass). Laplace-smoothed like q113; the grid
    * cross-join guarantees every (source, bucket) term exists.
    * Integer counts shuffle; ratios and the O(1)-magnitude `ln`
    * follow the q113/q141 libm precedent, rounded at 6 dp. */
  val q199 = Query(
    "q199_psi_drift",
    s"""WITH d AS (
       |  SELECT source,
       |    LEAST(CAST(floor(n_chars / 100) AS BIGINT),
       |      ${PsiBuckets - 1}) AS b
       |  FROM documents),
       |sb AS (SELECT source, b, COUNT(*) AS c FROM d GROUP BY 1, 2),
       |st AS (SELECT source, SUM(c) AS tot FROM sb GROUP BY 1),
       |rb AS (SELECT b, SUM(c) AS rc FROM sb GROUP BY 1),
       |rt AS (SELECT SUM(c) AS rtot FROM sb),
       |grid AS (
       |  SELECT s.source, g.b
       |  FROM (SELECT DISTINCT source FROM documents) s
       |  CROSS JOIN (SELECT UNNEST(range($PsiBuckets)) AS b) g),
       |terms AS (
       |  SELECT grid.source, st.tot,
       |    (COALESCE(sb.c, 0) + 1.0) / (st.tot + $PsiBuckets.0) AS p,
       |    (COALESCE(rb.rc, 0) + 1.0) / (rt.rtot + $PsiBuckets.0) AS q
       |  FROM grid
       |  LEFT JOIN sb ON sb.source = grid.source AND sb.b = grid.b
       |  JOIN st ON st.source = grid.source
       |  LEFT JOIN rb ON rb.b = grid.b
       |  CROSS JOIN rt)
       |SELECT source, CAST(MAX(tot) AS BIGINT) AS n_docs,
       |  round(SUM((p - q) * ln(p / q)), 6) AS psi
       |FROM terms GROUP BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val d = docs.select(col("source"),
      least(floor(col("n_chars") / 100).cast("long"),
        lit((PsiBuckets - 1).toLong)).as("b"))
    val sb = d.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val st = sb.groupBy(col("source")).agg(sum(col("c")).as("tot"))
    val rb = sb.groupBy(col("b")).agg(sum(col("c")).as("rc"))
    val rt = sb.agg(sum(col("c")).as("rtot"))
    val grid = docs.select(col("source")).distinct()
      .withColumn("b", explode(sequence(lit(0L),
        lit((PsiBuckets - 1).toLong))))
    val terms = grid
      .join(sb, Seq("source", "b"), "left")
      .join(st, Seq("source"))
      .join(broadcast(rb), Seq("b"), "left")
      .crossJoin(broadcast(rt))
      .select(col("source"), col("tot"),
        ((coalesce(col("c"), lit(0L)) + 1.0d) /
          (col("tot") + lit(PsiBuckets.toDouble))).as("p"),
        ((coalesce(col("rc"), lit(0L)) + 1.0d) /
          (col("rtot") + lit(PsiBuckets.toDouble))).as("q"))
    terms.groupBy(col("source"))
      .agg(max(col("tot")).cast("long").as("n_docs"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"))
  }

  // ------------------------------------------------------------ q202

  private val CalCap = 500L // score saturation: pred = min(len,500)/500
  private val CalBins = 10

  /** Calibration / reliability table: q198 asks whether a score
    * DISCRIMINATES (AUC); this asks whether it is CALIBRATED — treat
    * the saturating length heuristic `min(n_chars,500)/500` as a
    * pseudo-probability of lang='en' and report, per confidence
    * decile, the mean predicted confidence vs the empirical positive
    * rate and the gap between them (the reliability diagram a model
    * monitor plots; |gap| is the per-bin ECE contribution). All three
    * figures are single divisions of exact integer sums — predicted
    * confidence sums as `min(n_chars,500)` longs, so nothing double
    * accumulates across rows — and per-bin rows avoid any cross-bin
    * double sum entirely. One map-side-combinable aggregate, no
    * joins. */
  val q202 = Query(
    "q202_calibration_bins",
    s"""WITH d AS (
       |  SELECT LEAST(n_chars, $CalCap) AS s,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM documents),
       |b AS (
       |  SELECT LEAST(CAST(floor((s * $CalBins) / $CalCap) AS BIGINT),
       |      ${CalBins - 1}) AS bin,
       |    COUNT(*) AS n, SUM(s) AS ssum, SUM(pos) AS npos
       |  FROM d GROUP BY 1)
       |SELECT bin, CAST(n AS BIGINT) AS n_docs,
       |  ROUND(CAST(ssum AS DOUBLE) / (CAST(n AS DOUBLE) * $CalCap.0),
       |    6) AS mean_confidence,
       |  ROUND(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |    AS positive_rate,
       |  ROUND(CAST(ssum AS DOUBLE) / (CAST(n AS DOUBLE) * $CalCap.0)
       |    - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gap
       |FROM b""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select(
      least(col("n_chars"), lit(CalCap)).as("s"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val b = d.groupBy(
        least(floor((col("s") * CalBins) / CalCap).cast("long"),
          lit((CalBins - 1).toLong)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ssum"),
        sum(col("pos")).as("npos"))
    val conf = col("ssum").cast("double") /
      (col("n").cast("double") * lit(CalCap.toDouble))
    val rate = col("npos").cast("double") / col("n").cast("double")
    b.select(col("bin"), col("n").cast("long").as("n_docs"),
      round(conf, 6).as("mean_confidence"),
      round(rate, 6).as("positive_rate"),
      round(conf - rate, 6).as("gap"))
  }

  val all: Seq[Query] = Seq(q196, q197, q198, q199, q202)
}
