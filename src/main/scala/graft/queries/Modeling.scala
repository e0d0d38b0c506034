package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Functions.{money, tokens}
import graft.operators.Ranking
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

  // ------------------------------------------------------------ q208

  /** Per-region Gini coefficient of customer revenue — the standard
    * concentration/inequality readout over any value distribution
    * (revenue, token counts, shard sizes), complementing q11's
    * top-share and q133's deciles with the single scalar an
    * executive dashboard tracks. Uses the rank formula
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending per-region
    * ranks. The rank comes from ONE distributed global rank
    * (`Ranking.withGlobalRank` on (region, rev, custkey) — range
    * shuffle + per-partition window, never a single-partition window);
    * per-region positions are recovered by subtracting the broadcast
    * per-region minimum, so a 10⁹-customer region never sorts in one
    * task. The (rev, custkey) order is total, so rank ≡ row_number
    * and equals the oracle's per-region window; equal revenues may
    * permute among themselves but i·x is invariant within a tie run.
    * All sums are exact DECIMAL(38) (i·x stays integral); the exact
    * integers cross to double via the [[dd]] string route and the
    * Gini is one IEEE division, rounded 6 dp. */
  val q208 = Query(
    "q208_gini_concentration",
    """WITH cr AS (
      |  SELECT r_name, c_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS rev
      |  FROM orders
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation ON n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT r_name, rev, row_number() OVER (
      |    PARTITION BY r_name ORDER BY rev, c_custkey) AS i
      |  FROM cr),
      |a AS (
      |  SELECT r_name, CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(CAST(rev AS HUGEINT)) AS HUGEINT) AS s,
      |    CAST(SUM(CAST(i AS HUGEINT) * rev) AS HUGEINT) AS t
      |  FROM r GROUP BY 1)
      |SELECT r_name, CAST(n AS BIGINT) AS n_customers,
      |  ROUND(CAST(s AS DOUBLE) / 100.0, 2) AS revenue,
      |  CASE WHEN n * s != 0 THEN
      |    ROUND(CAST(CAST(2 * t - (n + 1) * s AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(n * s AS VARCHAR) AS DOUBLE), 6)
      |  END AS gini
      |FROM a""".stripMargin) { (s, dir) =>
    val cr = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("n_nationkey") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("r_name"), col("c_custkey"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev"))
    val ranked = Ranking.withGlobalRank(cr,
      struct(col("r_name").as("r"), col("rev").as("x"),
        col("c_custkey").as("k")).asc, "grank")
    // per-region rank = global rank − broadcast per-region minimum + 1
    val off = ranked.groupBy(col("r_name"))
      .agg(min(col("grank")).as("off"))
    val a = ranked.join(broadcast(off), Seq("r_name"))
      .select(col("r_name"), col("rev"),
        (col("grank") - col("off") + 1L).as("i"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("rev").cast(d38)).as("s"),
        sum(col("i").cast(d38) * col("rev")).as("t"))
    a.select(col("r_name"), col("n").cast("long").as("n_customers"),
      round(col("s").cast("double") / 100.0d, 2).as("revenue"),
      when(col("n") * col("s") =!= 0,
        round(dd(lit(2).cast(d38) * col("t")
            - (col("n") + 1) * col("s")) /
          dd(col("n") * col("s")), 6)).as("gini"))
  }

  // ------------------------------------------------------------ q209

  private val AcfMaxLag = 7

  /** Autocorrelation function of the daily revenue series at lags
    * 1..7 — the seasonality diagnostic run before choosing any
    * forecast model (q153's smoothing span, q163's Holt trend, q169's
    * seasonal-naive lag all presuppose knowing which lags carry
    * signal; a strong lag-7 says weekly cycle). The series is the
    * per-DAY revenue rollup, so the frame is CALENDAR-BOUNDED
    * (~2.4k rows at any corpus size — at 100 TB the only big-data
    * stage is still the one map-side-combinable daily aggregate) and
    * the lag joins are broadcast self-equi-joins on day±k (the q169
    * shape — no windows, no order dependence). Exactness: with S=Σx
    * over n days, n·(xₜ−x̄) = n·xₜ−S is an exact DECIMAL(38) integer,
    * so numerator and denominator are exact n²-scaled sums whose
    * ratio IS r_k — the scale factor cancels; headroom holds past
    * 10⁵× the test scale (n·x ≈ 2e16 cents → squared-sum ≈ 1e36).
    * One string-route double cast per side and one IEEE division. */
  val q209 = Query(
    "q209_revenue_acf",
    s"""WITH m AS (
       |  SELECT date_trunc('day', o_orderdate) AS day,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
       |      AS rev
       |  FROM orders GROUP BY 1),
       |st AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(CAST(rev AS HUGEINT)) AS HUGEINT) AS s
       |  FROM m),
       |den AS (
       |  SELECT SUM((n * rev - s) * (n * rev - s)) AS den
       |  FROM m CROSS JOIN st),
       |lags AS (SELECT UNNEST(range(1, ${AcfMaxLag + 1})) AS lag),
       |num AS (
       |  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    SUM((st.n * a.rev - st.s) * (st.n * b.rev - st.s)) AS num
       |  FROM lags l
       |  JOIN m a ON TRUE
       |  JOIN m b ON b.day = a.day - to_days(CAST(l.lag AS INTEGER))
       |  CROSS JOIN st
       |  GROUP BY 1)
       |SELECT l.lag, (SELECT CAST(n AS BIGINT) FROM st) AS n_days,
       |  COALESCE(num.n_pairs, 0) AS n_pairs,
       |  CASE WHEN den.den != 0 AND num.num IS NOT NULL THEN
       |    ROUND(CAST(CAST(num.num AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(den.den AS VARCHAR) AS DOUBLE), 6)
       |  END AS acf
       |FROM lags l LEFT JOIN num ON num.lag = l.lag
       |CROSS JOIN den""".stripMargin) { (s, dir) =>
    val m = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev"))
    val st = m.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("rev").cast(d38)).as("s"))
    val cm = m.crossJoin(broadcast(st))
    val den = cm.agg(sum((col("n") * col("rev") - col("s")) *
      (col("n") * col("rev") - col("s"))).as("den"))
    val aSide = cm.select(col("day"), col("rev").as("xa"),
      col("n"), col("s"))
    val bSide = m.select(col("day").as("day_b"), col("rev").as("xb"))
    val lags = s.range(1, AcfMaxLag + 1).toDF("lag")
    val num = broadcast(lags)
      .join(aSide, expr("true"))
      .join(broadcast(bSide),
        col("day_b") === col("day") - make_dt_interval(col("lag")))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("n") * col("xa") - col("s")) *
          (col("n") * col("xb") - col("s"))).as("num"))
    val nDays = st.select(col("n").cast("long").as("n_days"))
    // broadcast the RIGHT side: build-left is unsupported for left-outer
    lags.join(broadcast(num), Seq("lag"), "left")
      .crossJoin(broadcast(nDays))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("den") =!= 0 && col("num").isNotNull,
          round(dd(col("num")) / dd(col("den")), 6)).as("acf"))
  }

  // ------------------------------------------------------------ q210

  /** Kendall τ-b rank correlation between quantity and discount —
    * the tie-robust ordinal complement to q167's Pearson matrix
    * (both variables here are heavily tied small grids, where
    * Pearson's linearity assumption and Spearman's mid-ranks both
    * distort). Computed WITHOUT any pairwise row join: both variables
    * have bounded cardinality (≤50 × ≤11 values), so the
    * (quantity, discount) CONTINGENCY GRID is aggregated once
    * (map-side combinable) and concordant/discordant weights come
    * from the ≤550² broadcast cell-pair join — O(rows) + O(grid²)
    * at any corpus size, vs the textbook O(rows²). Counts and the
    * n0/n1/n2 tie terms are exact DECIMAL(38); τ-b is a fixed IEEE
    * tree (one division, two sqrts) over string-route double casts,
    * rounded 6 dp. */
  val q210 = Query(
    "q210_kendall_tau",
    """WITH b AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_discount * 100) AS BIGINT) AS d
      |  FROM lineitem),
      |cells AS (
      |  SELECT q, d, CAST(COUNT(*) AS HUGEINT) AS c FROM b GROUP BY 1, 2),
      |cd AS (
      |  SELECT
      |    SUM(CASE WHEN y.d > x.d THEN x.c * y.c ELSE 0 END) AS conc,
      |    SUM(CASE WHEN y.d < x.d THEN x.c * y.c ELSE 0 END) AS disc
      |  FROM cells x JOIN cells y ON y.q > x.q),
      |tq AS (
      |  SELECT SUM(cq * (cq - 1)) AS t1_2 FROM (
      |    SELECT SUM(c) AS cq FROM cells GROUP BY q)),
      |td AS (
      |  SELECT SUM(cd_ * (cd_ - 1)) AS t2_2 FROM (
      |    SELECT SUM(c) AS cd_ FROM cells GROUP BY d)),
      |n AS (SELECT SUM(c) AS n FROM cells),
      |f AS (
      |  SELECT n.n, conc, disc,
      |    n.n * (n.n - 1) - tq.t1_2 AS u1_2,
      |    n.n * (n.n - 1) - td.t2_2 AS u2_2
      |  FROM n CROSS JOIN cd CROSS JOIN tq CROSS JOIN td)
      |SELECT CAST(n AS BIGINT) AS n_rows,
      |  CASE WHEN u1_2 > 0 AND u2_2 > 0 THEN
      |    ROUND((2.0 * (CAST(CAST(conc AS VARCHAR) AS DOUBLE)
      |        - CAST(CAST(disc AS VARCHAR) AS DOUBLE)))
      |      / (sqrt(CAST(CAST(u1_2 AS VARCHAR) AS DOUBLE))
      |        * sqrt(CAST(CAST(u2_2 AS VARCHAR) AS DOUBLE))), 6)
      |  END AS tau_b,
      |  CASE WHEN n > 1 THEN
      |    ROUND((2.0 * CAST(CAST(conc AS VARCHAR) AS DOUBLE))
      |      / (CAST(CAST(n AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(n - 1 AS VARCHAR) AS DOUBLE)), 6)
      |  END AS concordant_share,
      |  CASE WHEN n > 1 THEN
      |    ROUND((2.0 * CAST(CAST(disc AS VARCHAR) AS DOUBLE))
      |      / (CAST(CAST(n AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(n - 1 AS VARCHAR) AS DOUBLE)), 6)
      |  END AS discordant_share
      |FROM f""".stripMargin) { (s, dir) =>
    // same fixture-double handling as q196: quantity is integral,
    // discount×100 needs the pre-cast round
    val b = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("q"),
      round(col("l_discount") * 100).cast("long").as("d"))
    val cells = b.groupBy(col("q"), col("d"))
      .agg(count(lit(1)).cast(d38).as("c"))
    val x = cells.select(col("q").as("xq"), col("d").as("xd"),
      col("c").as("xc"))
    val y = cells.select(col("q").as("yq"), col("d").as("yd"),
      col("c").as("yc"))
    val cdf = x.join(broadcast(y), col("yq") > col("xq"))
      .agg(
        sum(when(col("yd") > col("xd"), col("xc") * col("yc"))
          .otherwise(lit(0).cast(d38))).as("conc"),
        sum(when(col("yd") < col("xd"), col("xc") * col("yc"))
          .otherwise(lit(0).cast(d38))).as("disc"))
    val tq = cells.groupBy(col("q")).agg(sum(col("c")).as("cq"))
      .agg(sum(col("cq") * (col("cq") - 1)).as("t1_2"))
    val td = cells.groupBy(col("d")).agg(sum(col("c")).as("cd_"))
      .agg(sum(col("cd_") * (col("cd_") - 1)).as("t2_2"))
    val n = cells.agg(sum(col("c")).as("n"))
    val f = n.crossJoin(broadcast(cdf)).crossJoin(broadcast(tq))
      .crossJoin(broadcast(td))
      .select(col("n"), col("conc"), col("disc"),
        (col("n") * (col("n") - 1) - col("t1_2")).as("u1_2"),
        (col("n") * (col("n") - 1) - col("t2_2")).as("u2_2"))
    f.select(col("n").cast("long").as("n_rows"),
      when(col("u1_2") > 0 && col("u2_2") > 0,
        round((lit(2.0d) * (dd(col("conc")) - dd(col("disc")))) /
          (sqrt(dd(col("u1_2"))) * sqrt(dd(col("u2_2")))), 6))
        .as("tau_b"),
      when(col("n") > 1,
        round((lit(2.0d) * dd(col("conc"))) /
          (dd(col("n")) * dd(col("n") - 1)), 6)).as("concordant_share"),
      when(col("n") > 1,
        round((lit(2.0d) * dd(col("disc"))) /
          (dd(col("n")) * dd(col("n") - 1)), 6)).as("discordant_share"))
  }

  // ------------------------------------------------------------ q216

  private val BootB = 40 // bootstrap replicates
  private val BootCap = 9 // Poisson(1) weight cap (tail mass ~1e-6)
  private val BootLoRank = 1 // ⌈0.025·B⌉  of 40, 1-based ascending
  private val BootHiRank = 39 // ⌊0.975·B⌋

  /** Poisson(1) CDF thresholds on the 60-bit hash grid:
    * `t(k) = floor(P(X ≤ k) · 2⁶⁰)`, k = 0..[[BootCap]]−1. Computed
    * once at BUILD time and embedded as identical integer literals in
    * both engines, so the replicate draw has no cross-engine float
    * surface at all. */
  private val BootThresholds: Seq[Long] = {
    val pmf = Iterator.iterate((math.exp(-1.0), 0)) { case (p, k) =>
      (p / (k + 1), k + 1)
    }.map(_._1).take(BootCap).toSeq
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * math.pow(2.0, 60)).toLong)
  }

  /** Distributed Poisson bootstrap CI of mean order value — the
    * resampling member of the experimentation family (q181 CUPED,
    * q207 Wilson): a percentile interval for a statistic with no
    * closed-form CI, from [[BootB]] deterministic replicates in ONE
    * ×B scan. Each (row, replicate) draws a multiplicity from
    * Poisson(1) — the standard big-data bootstrap approximation to
    * multinomial resampling — via the portable md5 uniform against
    * build-time integer thresholds ([[BootThresholds]]), so every
    * replicate is partitioning/retry-invariant and the oracle redraws
    * identically. Per-replicate sums are exact integer cents
    * (map-side combinable to B rows); each mean is ONE double
    * division; the percentile ranks are fixed (ranks [[BootLoRank]]/
    * [[BootHiRank]] of the B sorted means, b tie-break) over a
    * B-row bounded frame. */
  val q216 = Query(
    "q216_bootstrap_ci",
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders),
       |reps AS (SELECT UNNEST(range($BootB)) AS b),
       |draw AS (
       |  SELECT b, cents,
       |    ${Llm.dHash64(
              "'bs:' || CAST(b AS VARCHAR) || ':' || " +
                "CAST(o_orderkey AS VARCHAR)")} AS u
       |  FROM base CROSS JOIN reps),
       |w AS (
       |  SELECT b, cents,
       |    CASE${BootThresholds.zipWithIndex
              .map { case (t, k) => s" WHEN u < $t THEN $k" }
              .mkString("\n       |     ", "\n       |     ", "")}
       |      ELSE $BootCap END AS w
       |  FROM draw),
       |rep AS (
       |  SELECT b, SUM(w) AS n_b, SUM(w * cents) AS s_b
       |  FROM w GROUP BY 1),
       |m AS (
       |  SELECT b,
       |    CASE WHEN n_b > 0 THEN
       |      CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b
       |  FROM rep),
       |r AS (
       |  SELECT mean_b, row_number() OVER (
       |    ORDER BY mean_b, b) AS rk
       |  FROM m WHERE mean_b IS NOT NULL),
       |full_ AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
       |      / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS mean_full
       |  FROM base)
       |SELECT n_rows, CAST($BootB AS BIGINT) AS n_replicates,
       |  ROUND(mean_full, 6) AS mean_value,
       |  ROUND((SELECT mean_b FROM r WHERE rk = $BootLoRank) / 100.0,
       |    6) AS ci_lo,
       |  ROUND((SELECT mean_b FROM r WHERE rk = $BootHiRank) / 100.0,
       |    6) AS ci_hi
       |FROM full_""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.md5Long
    val base = Tables.orders(s, dir).select(col("o_orderkey"),
      (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val reps = s.range(0, BootB).toDF("b")
    val draw = base.crossJoin(broadcast(reps))
      .select(col("b"), col("cents"),
        md5Long(concat_ws(":", lit("bs"), col("b").cast("string"),
          col("o_orderkey").cast("string"))).as("u"))
    val w = BootThresholds.zipWithIndex
      .foldRight(lit(BootCap): Column) { case ((t, k), acc) =>
        when(col("u") < t, lit(k)).otherwise(acc)
      }
    val rep = draw.select(col("b"), col("cents"), w.as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_b"),
        sum(col("w") * col("cents")).as("s_b"))
    val m = rep.select(col("b"),
      when(col("n_b") > 0,
        col("s_b").cast("double") / col("n_b").cast("double"))
        .as("mean_b"))
      .filter(col("mean_b").isNotNull)
    // B-row bounded frame: the rank window is deliberate and tiny
    val rw = Window.orderBy(col("mean_b").asc, col("b").asc)
    val r = m.withColumn("rk", row_number().over(rw))
    val lo = r.filter(col("rk") === BootLoRank)
      .select(round(col("mean_b") / 100.0d, 6).as("ci_lo"))
    val hi = r.filter(col("rk") === BootHiRank)
      .select(round(col("mean_b") / 100.0d, 6).as("ci_hi"))
    val full = base.agg(count(lit(1)).as("n_rows"),
      (sum(col("cents").cast(d38)).cast("double") /
        (count(lit(1)).cast("double") * lit(100.0d))).as("mean_full"))
    // left joins on TRUE, not crossJoins: the oracle reads ci_lo/ci_hi
    // via scalar subqueries, which yield NULL when fewer than
    // BootHiRank replicates have a defined mean (degenerate input) —
    // a crossJoin would drop the summary row instead
    full.select(col("n_rows"),
        lit(BootB.toLong).as("n_replicates"),
        round(col("mean_full"), 6).as("mean_value"))
      .join(broadcast(lo), lit(true), "left")
      .join(broadcast(hi), lit(true), "left")
  }

  // ------------------------------------------------------------ q222

  /** Two-sample Kolmogorov–Smirnov drift statistic per source: the
    * sup-distance between the source's document-length CDF and the
    * corpus CDF — the distribution-shape alarm beside q199's binned
    * PSI (KS needs no bucket-edge choice and catches shifts PSI's 8
    * coarse buckets smear out). Both CDFs are step functions jumping
    * only at observed lengths, so the sup is attained on the
    * VALUE-DISTINCT grid (bounded by the length domain, never by the
    * corpus row count): per-(source,length) counts aggregate once,
    * cumulate under per-source windows, and the max of
    * |cum_s·tot − cum·tot_s| is an exact integer — the only double op
    * is the final division, string-parse-pinned. */
  val q222 = Query(
    "q222_ks_drift",
    """WITH d AS (SELECT source, n_chars AS v FROM documents),
      |sl AS (SELECT source, v, COUNT(*) AS c FROM d GROUP BY 1, 2),
      |cl AS (SELECT v, SUM(c) AS rc FROM sl GROUP BY 1),
      |ct AS (SELECT v, SUM(rc) OVER (ORDER BY v) AS ccum FROM cl),
      |tt AS (SELECT CAST(SUM(c) AS HUGEINT) AS tot FROM sl),
      |stt AS (
      |  SELECT source, CAST(SUM(c) AS HUGEINT) AS tot_s
      |  FROM sl GROUP BY 1),
      |grid AS (
      |  SELECT s.source, cl.v
      |  FROM (SELECT DISTINCT source FROM d) s CROSS JOIN cl),
      |sc AS (
      |  SELECT grid.source, grid.v,
      |    SUM(COALESCE(sl.c, 0)) OVER (
      |      PARTITION BY grid.source ORDER BY grid.v) AS scum
      |  FROM grid
      |  LEFT JOIN sl ON sl.source = grid.source AND sl.v = grid.v),
      |dn AS (
      |  SELECT sc.source, MAX(stt.tot_s) AS tot_s, MAX(tt.tot) AS tot,
      |    MAX(ABS(CAST(scum AS HUGEINT) * tt.tot
      |      - CAST(ccum AS HUGEINT) * stt.tot_s)) AS dnum
      |  FROM sc
      |  JOIN ct USING (v)
      |  JOIN stt ON stt.source = sc.source
      |  CROSS JOIN tt
      |  GROUP BY 1)
      |SELECT source, CAST(tot_s AS BIGINT) AS n_docs,
      |  ROUND(CAST(CAST(dnum AS VARCHAR) AS DOUBLE)
      |    / (CAST(CAST(tot_s AS VARCHAR) AS DOUBLE)
      |      * CAST(CAST(tot AS VARCHAR) AS DOUBLE)), 6) AS ks_d
      |FROM dn""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .select(col("source"), col("n_chars").as("v"))
    val sl = d.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val cl = sl.groupBy(col("v")).agg(sum(col("c")).as("rc"))
    // value-domain-bounded frames: the one global window runs over
    // DISTINCT lengths (the q199 histogram rationale), not rows
    val ct = cl.withColumn("ccum",
      sum(col("rc")).over(Window.orderBy(col("v"))))
    val tt = sl.agg(sum(col("c")).cast(d38).as("tot"))
    val stt = sl.groupBy(col("source"))
      .agg(sum(col("c")).cast(d38).as("tot_s"))
    val grid = d.select(col("source")).distinct()
      .crossJoin(cl.select(col("v")))
    val sc = grid.join(sl, Seq("source", "v"), "left")
      .withColumn("scum", sum(coalesce(col("c"), lit(0L))).over(
        Window.partitionBy(col("source")).orderBy(col("v"))))
    val dn = sc
      .join(broadcast(ct.select(col("v"), col("ccum"))), Seq("v"))
      .join(broadcast(stt), Seq("source"))
      .crossJoin(broadcast(tt))
      .groupBy(col("source"))
      .agg(max(col("tot_s")).as("tot_s"), max(col("tot")).as("tot"),
        max(abs(col("scum").cast(d38) * col("tot") -
          col("ccum").cast(d38) * col("tot_s"))).as("dnum"))
    dn.select(col("source"), col("tot_s").cast("long").as("n_docs"),
      round(dd(col("dnum")) / (dd(col("tot_s")) * dd(col("tot"))), 6)
        .as("ks_d"))
  }

  // ------------------------------------------------------------ q223

  /** Day-of-week seasonality index of order revenue: per ISO weekday,
    * the mean daily revenue relative to the overall mean daily
    * revenue — the seasonal profile that turns q12's daily anomaly
    * thresholds and q163's forecasts weekday-aware. Daily revenue is
    * one exact cents rollup; the index is a ratio of exact integer
    * cross-products ((Σrev_dow·total_days) / (days_dow·Σrev)), so the
    * only double ops are the two final string-parse-pinned
    * divisions. */
  val q223 = Query(
    "q223_seasonality_index",
    """WITH b AS (
      |  SELECT o_orderdate AS d,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |daily AS (
      |  SELECT d, CAST(SUM(cents) AS HUGEINT) AS rev FROM b GROUP BY 1),
      |dw AS (
      |  SELECT isodow(d) AS dow, COUNT(*) AS n_days,
      |    CAST(SUM(rev) AS HUGEINT) AS srev
      |  FROM daily GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_days) AS HUGEINT) AS td,
      |    CAST(SUM(srev) AS HUGEINT) AS trev
      |  FROM dw)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(n_days AS BIGINT) AS n_days,
      |  ROUND(CAST(CAST(srev AS VARCHAR) AS DOUBLE)
      |    / (CAST(CAST(n_days AS VARCHAR) AS DOUBLE) * 100.0), 6)
      |    AS avg_daily_rev,
      |  CASE WHEN CAST(CAST(CAST(n_days AS HUGEINT) * trev AS VARCHAR)
      |      AS DOUBLE) != 0.0 THEN
      |    ROUND(CAST(CAST(srev * td AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(CAST(n_days AS HUGEINT) * trev AS VARCHAR)
      |        AS DOUBLE), 6)
      |  END AS seasonal_index
      |FROM dw CROSS JOIN tot""".stripMargin) { (s, dir) =>
    val b = Tables.orders(s, dir).select(col("o_orderdate").as("d"),
      (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val daily = b.groupBy(col("d"))
      .agg(sum(col("cents").cast(d38)).as("rev"))
    val dw = daily
      .groupBy((pmod(dayofweek(col("d")) + 5, lit(7)) + 1).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("rev")).as("srev"))
    val tot = dw.agg(sum(col("n_days")).cast(d38).as("td"),
      sum(col("srev")).as("trev"))
    dw.crossJoin(broadcast(tot))
      .select(col("dow").cast("long").as("dow"),
        col("n_days").cast("long").as("n_days"),
        round(dd(col("srev")) /
          (dd(col("n_days")) * lit(100.0d)), 6).as("avg_daily_rev"),
        when(dd(col("n_days").cast(d38) * col("trev")) =!= 0.0d,
          round(dd(col("srev") * col("td")) /
            dd(col("n_days").cast(d38) * col("trev")), 6))
          .as("seasonal_index"))
  }

  // ------------------------------------------------------------ q224

  private val HillK = 100 // tail order statistics in the estimate
  private val HillScale = 1000000L // per-term ln quantization grid

  /** Hill tail-index estimate of the order-value distribution:
    * α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎) over the top-k order statistics — the
    * standard heavy-tail exponent (α ≤ 2 ⇒ infinite variance: means
    * and CIs stop being trustworthy), completing the concentration
    * family (q11 top-share, q133 deciles, q208 Gini) with the
    * extreme-value view. The top-(k+1) rows come from the distributed
    * global rank on a TOTAL order (value desc, key asc — rank ≡
    * row_number, engine-exact); each ln of an O(1) ratio is quantized
    * to the 1e-6 grid (q211 precedent) so the sum is an exact
    * integer and α̂ is one string-parse-pinned division. */
  val q224 = Query(
    "q224_hill_tail_index",
    s"""WITH b AS (
       |  SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders),
       |r AS (
       |  SELECT cents, row_number() OVER (
       |    ORDER BY cents DESC, o_orderkey) AS rnk
       |  FROM b),
       |thr AS (SELECT cents AS xk FROM r WHERE rnk = ${HillK + 1}),
       |q AS (
       |  SELECT CAST(round(ln(CAST(cents AS DOUBLE)
       |    / CAST(xk AS DOUBLE)) * $HillScale) AS BIGINT) AS lq
       |  FROM r CROSS JOIN thr WHERE rnk <= $HillK),
       |st AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS k,
       |    CAST(SUM(lq) AS HUGEINT) AS s
       |  FROM q)
       |SELECT CAST(k AS BIGINT) AS k_tail,
       |  (SELECT CAST(xk AS BIGINT) FROM thr) AS threshold_cents,
       |  ROUND(CAST(CAST(s AS VARCHAR) AS DOUBLE)
       |    / (CAST(CAST(k AS VARCHAR) AS DOUBLE) * $HillScale.0), 6)
       |    AS mean_ln_excess,
       |  CASE WHEN CAST(CAST(s AS VARCHAR) AS DOUBLE) != 0.0 THEN
       |    ROUND((CAST(CAST(k AS VARCHAR) AS DOUBLE) * $HillScale.0)
       |      / CAST(CAST(s AS VARCHAR) AS DOUBLE), 6)
       |  END AS hill_alpha
       |FROM st""".stripMargin) { (s, dir) =>
    val b = Tables.orders(s, dir).select(col("o_orderkey"),
      (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val r = Ranking.withGlobalRank(b,
        struct((col("cents") * -1).as("nc"),
          col("o_orderkey").as("ok")).asc, "rnk")
      .filter(col("rnk") <= HillK + 1)
    val thr = r.filter(col("rnk") === HillK + 1)
      .select(col("cents").as("xk"))
    val st = r.filter(col("rnk") <= HillK)
      .crossJoin(broadcast(thr))
      .select(round(log(col("cents").cast("double") /
        col("xk").cast("double")) * HillScale).cast("long").as("lq"))
      .agg(count(lit(1)).cast(d38).as("k"),
        sum(col("lq").cast(d38)).as("s"))
    // left join on TRUE, not crossJoin: the oracle reads the threshold
    // via a scalar subquery, which yields NULL when `thr` is empty
    // (input ≤ HillK rows) — a crossJoin would drop the row instead
    st.join(broadcast(thr), lit(true), "left")
      .select(col("k").cast("long").as("k_tail"),
        col("xk").cast("long").as("threshold_cents"),
        round(dd(col("s")) /
          (dd(col("k")) * HillScale.toDouble), 6).as("mean_ln_excess"),
        when(dd(col("s")) =!= 0.0d,
          round((dd(col("k")) * HillScale.toDouble) / dd(col("s")), 6))
          .as("hill_alpha"))
  }

  // ------------------------------------------------------------ q225

  /** CUSUM changepoint scan over daily revenue: the max absolute
    * deviation of the cumulative sum from its grand-mean trend line,
    * and the day attaining it — the classic single-changepoint
    * estimator a revenue monitor runs beside the pointwise alarms
    * (q12/q67 flag outlier DAYS; this flags a LEVEL SHIFT and dates
    * it). The daily rollup is the only row-count-proportional pass;
    * everything after runs on the calendar-bounded series, where the
    * n-scaled deviation n·cumₜ − t·S is an exact integer, so argmax
    * and ties (earliest day wins) are engine-exact, and the one
    * double op converts the max deviation to mean-scale currency. */
  val q225 = Query(
    "q225_cusum_changepoint",
    """WITH b AS (
      |  SELECT o_orderdate AS d,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |daily AS (
      |  SELECT d, CAST(SUM(cents) AS HUGEINT) AS x FROM b GROUP BY 1),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT)
      |    AS s
      |  FROM daily),
      |c AS (
      |  SELECT d, row_number() OVER (ORDER BY d) AS t,
      |    SUM(x) OVER (ORDER BY d) AS cum
      |  FROM daily),
      |dev AS (
      |  SELECT d, t, ABS(n * CAST(cum AS HUGEINT) - CAST(t AS HUGEINT)
      |    * s) AS adev, n
      |  FROM c CROSS JOIN tot),
      |r AS (
      |  SELECT d, t, adev, n, row_number() OVER (
      |    ORDER BY adev DESC, d) AS rk
      |  FROM dev)
      |SELECT CAST(n AS BIGINT) AS n_days, d AS cp_date,
      |  CAST(t AS BIGINT) AS cp_t,
      |  ROUND(CAST(CAST(adev AS VARCHAR) AS DOUBLE)
      |    / (CAST(CAST(n AS VARCHAR) AS DOUBLE) * 100.0), 6)
      |    AS max_cusum
      |FROM r WHERE rk = 1""".stripMargin) { (s, dir) =>
    val b = Tables.orders(s, dir).select(col("o_orderdate").as("d"),
      (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val daily = b.groupBy(col("d"))
      .agg(sum(col("cents").cast(d38)).as("x"))
    val tot = daily.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("x")).as("s"))
    // calendar-bounded series: the global windows run over DAYS
    val c = daily.select(col("d"), col("x"))
      .withColumn("t", row_number().over(Window.orderBy(col("d"))))
      .withColumn("cum", sum(col("x")).over(Window.orderBy(col("d"))))
    val dev = c.crossJoin(broadcast(tot))
      .select(col("d"), col("t"), col("n"),
        abs(col("n") * col("cum") - col("t").cast(d38) * col("s"))
          .as("adev"))
    dev.withColumn("rk", row_number().over(
        Window.orderBy(col("adev").desc, col("d"))))
      .filter(col("rk") === 1)
      .select(col("n").cast("long").as("n_days"), col("d").as("cp_date"),
        col("t").cast("long").as("cp_t"),
        round(dd(col("adev")) / (dd(col("n")) * lit(100.0d)), 6)
          .as("max_cusum"))
  }

  // ------------------------------------------------------------ q229

  /** Two-proportion z-test of the experiment readout: split orders
    * into the deterministic A/B halves (the q186 fold hash), define
    * conversion as urgent/high priority, and report per-variant rates
    * plus the pooled-SE z statistic — the frequentist significance
    * companion to q207's Wilson intervals (q207 bounds each variant;
    * this scores the DIFFERENCE). Counts are exact integers from one
    * map-side-combinable aggregate; the z tree is a fixed IEEE
    * sequence over string-parse-pinned doubles (sqrt is
    * correctly-rounded in both engines). */
  val q229 = Query(
    "q229_ab_proportion_test",
    """WITH b AS (
      |  SELECT o_orderkey % 2 AS variant,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS conv
      |  FROM orders),
      |v AS (
      |  SELECT variant, COUNT(*) AS n, SUM(conv) AS c
      |  FROM b GROUP BY 1),
      |w AS (
      |  SELECT
      |    MAX(CASE WHEN variant = 0 THEN n END) AS na,
      |    MAX(CASE WHEN variant = 0 THEN c END) AS ca,
      |    MAX(CASE WHEN variant = 1 THEN n END) AS nb,
      |    MAX(CASE WHEN variant = 1 THEN c END) AS cb
      |  FROM v),
      |f AS (
      |  SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
      |    CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
      |    CAST(CAST(na AS VARCHAR) AS DOUBLE) AS nad,
      |    CAST(CAST(ca AS VARCHAR) AS DOUBLE) AS cad,
      |    CAST(CAST(nb AS VARCHAR) AS DOUBLE) AS nbd,
      |    CAST(CAST(cb AS VARCHAR) AS DOUBLE) AS cbd
      |  FROM w),
      |g AS (
      |  SELECT n_a, conv_a, n_b, conv_b,
      |    cad / nad AS pa, cbd / nbd AS pb,
      |    (cad + cbd) / (nad + nbd) AS pp,
      |    (1.0 / nad) + (1.0 / nbd) AS hh
      |  FROM f WHERE n_a > 0 AND n_b > 0)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  ROUND(pa, 6) AS rate_a, ROUND(pb, 6) AS rate_b,
      |  CASE WHEN pp > 0.0 AND pp < 1.0 THEN
      |    ROUND((pa - pb) / sqrt((pp * (1.0 - pp)) * hh), 6)
      |  END AS z_score
      |FROM g""".stripMargin) { (s, dir) =>
    val b = Tables.orders(s, dir).select(
      (col("o_orderkey") % 2).as("variant"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("conv"))
    val v = b.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val w = v.agg(
      max(when(col("variant") === 0, col("n"))).as("na"),
      max(when(col("variant") === 0, col("c"))).as("ca"),
      max(when(col("variant") === 1, col("n"))).as("nb"),
      max(when(col("variant") === 1, col("c"))).as("cb"))
    val f = w.select(
      col("na").cast("long").as("n_a"), col("ca").cast("long")
        .as("conv_a"),
      col("nb").cast("long").as("n_b"), col("cb").cast("long")
        .as("conv_b"),
      dd(col("na")).as("nad"), dd(col("ca")).as("cad"),
      dd(col("nb")).as("nbd"), dd(col("cb")).as("cbd"))
    val g = f.filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        (col("cad") / col("nad")).as("pa"),
        (col("cbd") / col("nbd")).as("pb"),
        ((col("cad") + col("cbd")) / (col("nad") + col("nbd")))
          .as("pp"),
        ((lit(1.0d) / col("nad")) + (lit(1.0d) / col("nbd"))).as("hh"))
    g.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(col("pa"), 6).as("rate_a"), round(col("pb"), 6).as("rate_b"),
      when(col("pp") > 0.0d && col("pp") < 1.0d,
        round((col("pa") - col("pb")) /
          sqrt((col("pp") * (lit(1.0d) - col("pp"))) * col("hh")), 6))
        .as("z_score"))
  }

  // ------------------------------------------------------------ q231

  private val TrimDenom = 20 // trim floor(n/20) = 5% from each tail

  /** Trimmed and winsorized means of order value — the robust location
    * estimates a metrics platform reports beside the raw mean when
    * q224 says the tail is heavy (trimming DROPS the extreme 5% per
    * side; winsorizing CLAMPS them to the cut values, keeping n).
    * One distributed global rank on a total order gives the cut
    * boundaries and the interior sum — all exact integer cents — and
    * each mean is one string-parse-pinned division.
    *
    * Degenerate contract (the q224/q216 review item, checked here
    * too): on EMPTY input both engines produce zero rows — the
    * lo/hi cut frames are empty and both sides reach the final
    * select through plain joins of them (Spark crossJoin of an empty
    * broadcast ≡ the oracle's CROSS JOIN of an empty CTE), so the
    * engines agree by construction and no guard is needed. */
  val q231 = Query(
    "q231_trimmed_mean",
    s"""WITH b AS (
       |  SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders),
       |n AS (SELECT COUNT(*) AS n,
       |  CAST(floor(COUNT(*) / $TrimDenom.0) AS BIGINT) AS k FROM b),
       |r AS (
       |  SELECT cents, row_number() OVER (
       |    ORDER BY cents, o_orderkey) AS rnk
       |  FROM b),
       |mid AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS nm,
       |    CAST(SUM(cents) AS HUGEINT) AS sm
       |  FROM r CROSS JOIN n WHERE rnk > k AND rnk <= n - k),
       |lo AS (SELECT cents AS xlo FROM r CROSS JOIN n
       |  WHERE rnk = k + 1),
       |hi AS (SELECT cents AS xhi FROM r CROSS JOIN n
       |  WHERE rnk = n - k),
       |f AS (
       |  SELECT n.n, n.k, mid.nm, mid.sm, lo.xlo, hi.xhi,
       |    mid.sm + CAST(n.k AS HUGEINT)
       |      * (CAST(lo.xlo AS HUGEINT) + CAST(hi.xhi AS HUGEINT))
       |      AS sw
       |  FROM n CROSS JOIN mid CROSS JOIN lo CROSS JOIN hi)
       |SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS k_trim,
       |  ROUND(CAST(xlo AS DOUBLE) / 100.0, 6) AS cut_lo,
       |  ROUND(CAST(xhi AS DOUBLE) / 100.0, 6) AS cut_hi,
       |  CASE WHEN CAST(CAST(nm AS VARCHAR) AS DOUBLE) != 0.0 THEN
       |    ROUND(CAST(CAST(sm AS VARCHAR) AS DOUBLE)
       |      / (CAST(CAST(nm AS VARCHAR) AS DOUBLE) * 100.0), 6)
       |  END AS trimmed_mean,
       |  CASE WHEN n > 0 THEN
       |    ROUND(CAST(CAST(sw AS VARCHAR) AS DOUBLE)
       |      / (CAST(CAST(n AS VARCHAR) AS DOUBLE) * 100.0), 6)
       |  END AS winsorized_mean
       |FROM f""".stripMargin) { (s, dir) =>
    val b = Tables.orders(s, dir).select(col("o_orderkey"),
      (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val n = b.agg(count(lit(1)).as("n"))
      .select(col("n"),
        floor(col("n") / lit(TrimDenom.toDouble)).cast("long").as("k"))
    val r = Ranking.withGlobalRank(b,
      struct(col("cents").as("c"), col("o_orderkey").as("ok")).asc,
      "rnk")
    val rn = r.crossJoin(broadcast(n))
    val mid = rn.filter(col("rnk") > col("k") &&
        col("rnk") <= col("n") - col("k"))
      .agg(count(lit(1)).cast(d38).as("nm"),
        sum(col("cents").cast(d38)).as("sm"))
    val lo = rn.filter(col("rnk") === col("k") + 1)
      .select(col("cents").as("xlo"))
    val hi = rn.filter(col("rnk") === col("n") - col("k"))
      .select(col("cents").as("xhi"))
    n.crossJoin(broadcast(mid)).crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("n").cast("long").as("n_rows"),
        col("k").cast("long").as("k_trim"),
        round(col("xlo").cast("double") / 100.0d, 6).as("cut_lo"),
        round(col("xhi").cast("double") / 100.0d, 6).as("cut_hi"),
        when(dd(col("nm")) =!= 0.0d,
          round(dd(col("sm")) / (dd(col("nm")) * lit(100.0d)), 6))
          .as("trimmed_mean"),
        when(col("n") > 0,
          round(dd(col("sm") + col("k").cast(d38) *
            (col("xlo").cast(d38) + col("xhi").cast(d38))) /
            (dd(col("n")) * lit(100.0d)), 6)).as("winsorized_mean"))
  }

  val all: Seq[Query] =
    Seq(q196, q197, q198, q199, q202, q208, q209, q210, q216, q222,
      q223, q224, q225, q229, q231)
}
