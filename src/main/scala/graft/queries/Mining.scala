package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Functions.tokens
import graft.operators.{Graph, InternalCache, NaiveBayes, Ranking, Sampling, SharedFrames, TfIdf}
import graft.sources.Tables

/** Text/data-mining operators beyond the dedup + ANN families:
  * TF-IDF similarity, classification, graph statistics, weighted
  * sampling. Every query is oracle-checked; all heavy arithmetic is
  * integer-exact with at most one final double op per output row. */
object Mining {

  import Llm.DTokens

  // ------------------------------------------------------------ q135

  private val TfMaxDf = 50 // posting-list cap ≈ 10% of sf0.01 corpus
  private val TfIdfScale = 1000 // idf quantization grid (1e-3)
  private val TfMinCos = 0.5

  /** TF-IDF cosine near-dup pairs over a df-capped inverted index —
    * the word-weighted similarity path beside the set-based ones
    * (q23 minhash, q25 simhash, q26 char-gram, q128 prefix-filter).
    * Integer quantized-idf weights make dot products and norms exact
    * integer sums; the single double op per pair (cosine) is rounded
    * to 6 dp in both engines. */
  val q135 = Query(
    "q135_tfidf_cosine_pairs",
    s"""WITH t AS (
       |  SELECT doc_id, unnest($DTokens) AS word FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (
       |  SELECT word, COUNT(*) AS df FROM tf GROUP BY 1
       |  HAVING COUNT(*) <= $TfMaxDf),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |w AS (
       |  SELECT doc_id, tf.word,
       |    tf * CAST(round(ln(n.n::DOUBLE / df.df::DOUBLE)
       |      * $TfIdfScale) AS BIGINT) AS w
       |  FROM tf JOIN df USING (word) CROSS JOIN n),
       |nm AS (SELECT doc_id, SUM(w * w) AS nrm FROM w GROUP BY 1),
       |d AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    SUM(a.w * b.w) AS dot
       |  FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(dot::DOUBLE / (sqrt(x.nrm::DOUBLE) * sqrt(y.nrm::DOUBLE)),
       |    6) AS cosine
       |FROM d
       |JOIN nm x ON x.doc_id = d.doc_a
       |JOIN nm y ON y.doc_id = d.doc_b
       |WHERE round(dot::DOUBLE / (sqrt(x.nrm::DOUBLE) * sqrt(y.nrm::DOUBLE)),
       |    6) >= $TfMinCos""".stripMargin) { (s, dir) =>
    TfIdf.cosinePairs(Tables.documents(s, dir), "doc_id", "text",
      TfMaxDf, TfIdfScale, TfMinCos)
  }

  // ------------------------------------------------------------ q136

  private val NbVocabK = 5000
  private val NbScale = 1000000L // ln quantization grid (1e-6)

  /** The full NB train+apply oracle chain ending at CTE
    * `pr(doc_id, pred)` — shared by q136 (confusion matrix) and q217
    * (per-class precision/recall/F1). */
  private def dNbChain: String =
    s"""t AS (
       |  SELECT doc_id, lang, unnest($DTokens) AS word FROM documents),
       |f AS (SELECT word, COUNT(*) AS cnt FROM t GROUP BY 1),
       |v AS (
       |  SELECT word FROM (
       |    SELECT word, row_number() OVER (ORDER BY cnt DESC, word) AS rk
       |    FROM f)
       |  WHERE rk <= $NbVocabK),
       |vs AS (SELECT COUNT(*) AS v FROM v),
       |tv AS (SELECT t.* FROM t JOIN v USING (word)),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |cls AS (SELECT lang AS cls, COUNT(*) AS ndocs FROM documents
       |  GROUP BY 1),
       |ctok AS (SELECT lang AS cls, COUNT(*) AS ntok FROM tv GROUP BY 1),
       |ctab AS (
       |  SELECT cls.cls, COALESCE(ctok.ntok, 0) AS ntok, vs.v,
       |    CAST(round(ln(cls.ndocs::DOUBLE / n.n::DOUBLE) * $NbScale)
       |      AS BIGINT) AS prior
       |  FROM cls LEFT JOIN ctok USING (cls) CROSS JOIN n CROSS JOIN vs),
       |wc AS (SELECT word, lang AS cls, COUNT(*) AS wc FROM tv
       |  GROUP BY 1, 2),
       |grid AS (
       |  SELECT v.word, c.cls,
       |    CAST(round(ln((COALESCE(wc.wc, 0) + 1)::DOUBLE
       |      / (c.ntok + c.v)::DOUBLE) * $NbScale) AS BIGINT) AS lnq
       |  FROM v CROSS JOIN ctab c
       |  LEFT JOIN wc ON wc.word = v.word AND wc.cls = c.cls),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tv GROUP BY 1, 2),
       |sc AS (
       |  SELECT doc_id, cls, SUM(s) AS score FROM (
       |    SELECT d.doc_id, c.cls, c.prior AS s
       |    FROM documents d CROSS JOIN ctab c
       |    UNION ALL
       |    SELECT tf.doc_id, g.cls, tf.tf * g.lnq AS s
       |    FROM tf JOIN grid g USING (word))
       |  GROUP BY 1, 2),
       |pr AS (
       |  SELECT doc_id, cls AS pred FROM (
       |    SELECT doc_id, cls, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY score DESC, cls DESC) AS rk
       |    FROM sc)
       |  WHERE rk = 1)""".stripMargin

  /** The scored NB prediction frame `(doc_id, label, pred)` — SHARED:
    * trained and applied once per run for q136 and q217. */
  private def nbPredShared(s: SparkSession, dir: String): DataFrame =
    SharedFrames.getOrBuild(SharedFrames.key(s, "nbPred", dir)) {
      NaiveBayes.trainPredict(Tables.documents(s, dir), "doc_id",
        "text", "lang", NbVocabK, NbScale)
    }

  /** Distributed multinomial Naive Bayes language classifier
    * (train + score in one pipeline — the fastText-style corpus
    * classifier shape), surfaced as the confusion matrix of predicted
    * vs labeled language. Integer-grid log probabilities make every
    * score an exact integer sum; the oracle replays the full train +
    * apply pipeline via [[dNbChain]]; the prediction frame itself is
    * shared with q217. */
  val q136 = Query(
    "q136_naive_bayes_langid",
    s"""WITH $dNbChain
       |SELECT d.lang, pr.pred, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM documents d JOIN pr USING (doc_id)
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    nbPredShared(s, dir)
      .groupBy(col("label").as("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
  }

  // ------------------------------------------------------------ q138

  private val TriMinSupport = 2 // co-occurrence support for an edge

  /** The counted part co-occurrence pair frame (`a < b`, `n` = orders
    * containing both) — SHARED: q132 ranks it, q138's triangles and
    * q211's link prediction filter it at support ≥ [[TriMinSupport]].
    * One lineitem scan + one within-order self-join per pipeline run;
    * every consumer reads the persisted table (the same
    * materialize-the-edge-table-once shape as the part↔supplier graph
    * feeding q111/q179). */
  private[queries] def partPairs(s: SparkSession, dir: String): DataFrame =
    SharedFrames.getOrBuild(SharedFrames.key(s, "partPairs", dir)) {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("b"))
      a.join(b, Seq("l_orderkey"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n"))
    }

  /** Triangle count + global clustering coefficient of the part
    * co-occurrence graph (q132's edges at support ≥ 2) — the graph-
    * statistics companion to PageRank (q111) and connected components
    * (q48). The Spark side counts wedges with DEGREE ORIENTATION
    * (per-node fan-out capped at O(√m) — a degree-10⁶ hub yields zero
    * oriented wedges, not 10¹²); the oracle's id-ordered triple join
    * provably counts the same triangles. */
  val q138 = Query(
    "q138_triangle_count",
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b,
       |    COUNT(*) AS n
       |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |    AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |e AS (SELECT a, b FROM p WHERE n >= $TriMinSupport),
       |d AS (
       |  SELECT v, COUNT(*) AS deg FROM (
       |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
       |  GROUP BY 1),
       |tri AS (
       |  SELECT COUNT(*) AS t
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
       |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
       |w AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges
       |  FROM d)
       |SELECT w.n_nodes,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       |  CAST(tri.t AS BIGINT) AS n_triangles,
       |  w.n_wedges,
       |  CASE WHEN w.n_wedges > 0
       |    THEN round(3 * tri.t::DOUBLE / w.n_wedges::DOUBLE, 6)
       |  END AS gcc
       |FROM w CROSS JOIN tri""".stripMargin) { (s, dir) =>
    Graph.triangleStats(partPairs(s, dir)
      .filter(col("n") >= TriMinSupport)
      .select(col("a"), col("b")))
  }

  // ------------------------------------------------------------ q139

  private val WsK = 100

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * exponential keys) of 100 orders, weight = order value: the
    * deterministic draw a curation pipeline uses for quality-weighted
    * subset selection. The md5-derived uniform makes the sample
    * retry- and partitioning-invariant, and lets the oracle replay
    * the exact draw: same keys, same ranks. */
  val q139 = Query(
    "q139_weighted_sample",
    s"""WITH ${Sampling.aesKeySqlCtes(
         s"""SELECT o_orderkey, o_totalprice AS weight,
            |    ${Llm.dHash64(
                 "'ws:' || CAST(o_orderkey AS VARCHAR)")} + 1 AS __hn
            |  FROM orders""".stripMargin, "k", "weight")},
       |r AS (
       |  SELECT o_orderkey, weight, ws_key, row_number() OVER (
       |    ORDER BY ws_key DESC, o_orderkey) AS rnk
       |  FROM k)
       |SELECT o_orderkey, weight, ws_key,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= $WsK""".stripMargin) { (s, dir) =>
    Sampling
      .weightedSample(
        Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_totalprice").as("weight")),
        col("o_orderkey"), col("weight"), WsK, "ws")
      .select(col("o_orderkey"), col("weight"), col("ws_key"),
        col("rnk"))
  }

  // ------------------------------------------------------------ q141

  private val BmK = 10 // results per probe query
  private val BmProbes: Seq[(Int, String)] = Seq(
    0 -> "join", 0 -> "hash", 0 -> "scan",
    1 -> "customer", 1 -> "order", 1 -> "line",
    2 -> "stream", 2 -> "window", 2 -> "batch")

  /** BM25 keyword retrieval (Robertson–Walker Okapi, k1=1.2, b=0.75):
    * top-10 documents for each of three probe keyword queries — the
    * SEARCH path over the corpus, beside the pairwise-similarity and
    * ANN paths. Per-(doc, term) BM25 contributions are a fixed
    * parenthesized chain of IEEE double ops (identical in both
    * engines), quantized to a 1e-6 integer grid, so per-doc scores are
    * exact integer sums; ranking is per-query partitioned (never a
    * global window). Only probe-term postings are scored — the corpus
    * is scanned once and never joined to itself. */
  /** The BM25 oracle CTE chain up to `sc` (query_id, doc_id,
    * integer-quantized score) — shared verbatim by q141 and the q200
    * fusion oracle so both replay the identical scorer. */
  private val bmOracleCtes: String = {
    val probeRows = BmProbes
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""probes(query_id, term) AS (VALUES $probeRows),
       |t AS (
       |  SELECT doc_id, unnest($DTokens) AS word FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY 1),
       |g AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
       |tf AS (
       |  SELECT p.query_id, t.doc_id, t.word, COUNT(*) AS tf
       |  FROM t JOIN probes p ON p.term = t.word
       |  GROUP BY 1, 2, 3),
       |df AS (
       |  SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT tf.query_id, tf.doc_id,
       |    CAST(SUM(CAST(round(
       |      ln(1.0 + (g.n::DOUBLE - df.df::DOUBLE + 0.5)
       |        / (df.df::DOUBLE + 0.5))
       |      * ((tf.tf::DOUBLE * 2.2) / (tf.tf::DOUBLE
       |        + 1.2 * (0.25 + 0.75 * (dl.dl::DOUBLE
       |          / (g.tot::DOUBLE / g.n::DOUBLE)))))
       |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score
       |  FROM tf
       |  JOIN df USING (word)
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN g
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** The BM25 scored frame (query_id, doc_id, score): probe-matched
    * docs only, per-(doc, term) contributions quantized to a 1e-6
    * integer grid so per-doc scores are exact integer sums. SHARED
    * (materialized once per run) between q141's ranking and q200's
    * lexical fusion leg. */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    SharedFrames.getOrBuild(SharedFrames.key(s, "bm25sc", dir)) {
      import s.implicits._
      val probes = broadcast(BmProbes.toDF("query_id", "term"))
      val t = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.Functions.tokens(col("text"))).as("word"))
      val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val g = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
      val tf = t.join(probes, probes("term") === t("word"))
        .groupBy(col("query_id"), col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("word"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val dD = col("df").cast("double")
      val idf = log(lit(1.0) +
        (col("n").cast("double") - dD + lit(0.5)) / (dD + lit(0.5)))
      val tfD = col("tf").cast("double")
      val tfc = (tfD * lit(2.2)) / (tfD +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") /
          (col("tot").cast("double") / col("n").cast("double")))))
      tf.join(broadcast(df), Seq("word"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(g))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(round(idf * tfc * lit(1000000.0)).cast("long"))
          .as("score"))
    }

  val q141 = Query(
    "q141_bm25_search",
    s"""WITH $bmOracleCtes
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score
       |FROM (
       |  SELECT query_id, doc_id, score, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
       |  FROM sc)
       |WHERE rnk <= $BmK""".stripMargin) { (s, dir) =>
    bm25Scored(s, dir).withColumn("rnk",
        row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rnk") <= BmK)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score"))
  }

  // ------------------------------------------------------------ q143

  private val TriTopK = 20

  /** Frequent triples via A-PRIORI pruning over the market baskets
    * (Agrawal & Srikant 1994, the downward-closure step after q132's
    * pairs): candidate triples are generated ONLY by extending
    * frequent pairs, and every face of the triple must itself be a
    * frequent pair before the support count. At 100 TB the candidate
    * space is bounded by the frequent-pair set (a semi-join filter),
    * never by baskets³; the top-k goes through the distributed rank.
    */
  val q143 = Query(
    "q143_frequent_triples",
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b
       |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |    AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $TriMinSupport),
       |t AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b, z.l_partkey AS c,
       |    CAST(COUNT(*) AS BIGINT) AS support
       |  FROM li x
       |  JOIN li y ON y.l_orderkey = x.l_orderkey
       |    AND y.l_partkey > x.l_partkey
       |  JOIN li z ON z.l_orderkey = x.l_orderkey
       |    AND z.l_partkey > y.l_partkey
       |  JOIN p ab ON ab.a = x.l_partkey AND ab.b = y.l_partkey
       |  JOIN p ac ON ac.a = x.l_partkey AND ac.b = z.l_partkey
       |  JOIN p bc ON bc.a = y.l_partkey AND bc.b = z.l_partkey
       |  GROUP BY 1, 2, 3
       |  HAVING COUNT(*) >= $TriMinSupport),
       |r AS (
       |  SELECT a, b, c, support, row_number() OVER (
       |    ORDER BY support DESC, a, b, c) AS rnk
       |  FROM t)
       |SELECT a, b, c, support, CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= $TriTopK""".stripMargin) { (s, dir) =>
    val li = InternalCache.persist(Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct())
    def side(n: String) =
      li.select(col("l_orderkey"), col("l_partkey").as(n))
    val pairs = InternalCache.persist(
      side("a").join(side("b"), Seq("l_orderkey"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= TriMinSupport)
        .select(col("a"), col("b")))
    def face(x: String, y: String) = pairs
      .select(col("a").as(x), col("b").as(y))
    val triples = side("a").join(side("b"), Seq("l_orderkey"))
      .filter(col("a") < col("b"))
      .join(side("c"), Seq("l_orderkey"))
      .filter(col("b") < col("c"))
      .join(face("a", "b"), Seq("a", "b"), "left_semi")
      .join(face("a", "c"), Seq("a", "c"), "left_semi")
      .join(face("b", "c"), Seq("b", "c"), "left_semi")
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= TriMinSupport)
    Ranking.withGlobalRank(triples,
        struct((col("support") * -1).as("ns"), col("a").as("ka"),
          col("b").as("kb"), col("c").as("kc")).asc, "rnk")
      .filter(col("rnk") <= TriTopK)
      .select(col("a"), col("b"), col("c"), col("support"), col("rnk"))
  }

  // ------------------------------------------------------------ q144

  private val WsgK = 5

  /** Stratified weighted sampling: an independent Efraimidis–Spirakis
    * draw of 5 docs per language, weighted by document length — the
    * per-domain quota draw of a curation mix (each stratum gets its
    * quota regardless of corpus share; within the stratum, longer
    * docs are proportionally more likely). Partitioned rank window,
    * exact-replay oracle. */
  val q144 = Query(
    "q144_stratified_weighted_sample",
    s"""WITH ${Sampling.aesKeySqlCtes(
         s"""SELECT lang, doc_id, n_chars,
            |    ${Llm.dHash64(
                 "'wsg:' || CAST(doc_id AS VARCHAR)")} + 1 AS __hn
            |  FROM documents""".stripMargin, "k", "n_chars::DOUBLE")},
       |r AS (
       |  SELECT lang, doc_id, n_chars, ws_key, row_number() OVER (
       |    PARTITION BY lang ORDER BY ws_key DESC, doc_id) AS rnk
       |  FROM k)
       |SELECT lang, doc_id, n_chars, ws_key,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= $WsgK""".stripMargin) { (s, dir) =>
    Sampling
      .weightedSamplePerGroup(
        Tables.documents(s, dir).select(col("lang"), col("doc_id"),
          col("n_chars")),
        Seq("lang"), col("doc_id"), col("n_chars").cast("double"),
        WsgK, "wsg")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        col("ws_key"), col("rnk").cast("long").as("rnk"))
  }

  // ------------------------------------------------------------ q146

  /** Per-user event-path features through the NESTED-DATA route: the
    * event sequence is collected into a sorted array of structs and
    * every feature is computed row-locally with higher-order array
    * functions (`transform`/`filter`/`aggregate`) — one shuffle (the
    * collect), zero windows, the complex-type processing path a
    * sequence mart uses when per-entity history must travel as ONE
    * row (session replay, trajectory features). The oracle computes
    * identical scalars with window functions — the two routes must
    * agree exactly. Per-user state is bounded by the user's own event
    * count (same bound any per-entity window has). */
  val q146 = Query(
    "q146_event_path_features",
    """WITH s AS (
      |  SELECT user_id, event_type, ts,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(ts) OVER w AS prev_ts,
      |    row_number() OVER w AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS cnt
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT user_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CASE WHEN prev_type IS NOT NULL
      |      AND prev_type <> event_type THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_transitions,
      |    COALESCE(CAST(MAX(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT),
      |      0) AS max_gap_us,
      |    MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
      |    MAX(CASE WHEN rn = cnt THEN event_type END) AS last_type
      |  FROM s GROUP BY 1)
      |SELECT user_id, n_events, n_transitions, max_gap_us,
      |  first_type, last_type
      |FROM f""".stripMargin) { (s, dir) =>
    val path = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("p"))
    val n = size(col("p"))
    val heads = slice(col("p"), lit(1), greatest(n - 1, lit(0)))
    val tails = slice(col("p"), lit(2), greatest(n - 1, lit(0)))
    val steps = zip_with(heads, tails, (a, b) => struct(
      (unix_micros(b.getField("ts")) - unix_micros(a.getField("ts")))
        .as("gap_us"),
      (b.getField("event_type") =!= a.getField("event_type"))
        .cast("long").as("chg")))
    path.select(
      col("user_id"),
      n.cast("long").as("n_events"),
      aggregate(steps, lit(0L), (acc, x) =>
        acc + x.getField("chg")).as("n_transitions"),
      aggregate(steps, lit(0L), (acc, x) =>
        greatest(acc, x.getField("gap_us"))).as("max_gap_us"),
      element_at(col("p"), 1).getField("event_type").as("first_type"),
      element_at(col("p"), -1).getField("event_type").as("last_type"))
  }

  // ------------------------------------------------------------ q158

  private val RuleMinSupport = 3
  private val RuleTopK = 30

  /** Association rules from frequent item pairs (q143's a-priori
    * machinery, surfaced as the market-basket end product): for every
    * frequent co-occurring pair, both directed rules with support,
    * confidence `s(a,b)/s(a)` and lift `s(a,b)·N/(s(a)·s(b))`. All
    * counts are exact basket counts; confidence and lift are each ONE
    * double division of exact integer products, rounded to 6 dp in
    * both engines, and the top-k goes through the distributed rank
    * (unique (lift, antecedent, consequent) order, so rank ≡
    * row_number). Pair generation is the same basket self-join as
    * q143 — bounded by per-basket item counts, never items². */
  val q158 = Query(
    "q158_association_rules",
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
       |it AS (SELECT l_partkey, COUNT(*) AS s FROM li GROUP BY 1),
       |p AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b,
       |    CAST(COUNT(*) AS BIGINT) AS s_ab
       |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |    AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $RuleMinSupport),
       |r AS (
       |  SELECT a AS antecedent, b AS consequent, s_ab FROM p
       |  UNION ALL SELECT b, a, s_ab FROM p),
       |j AS (
       |  SELECT antecedent, consequent, s_ab AS support,
       |    round(CAST(s_ab AS DOUBLE) / CAST(sa.s AS DOUBLE), 6)
       |      AS confidence,
       |    round(CAST(s_ab * n_baskets AS DOUBLE)
       |      / CAST(sa.s * sc.s AS DOUBLE), 6) AS lift
       |  FROM r
       |  JOIN it sa ON sa.l_partkey = antecedent
       |  JOIN it sc ON sc.l_partkey = consequent
       |  CROSS JOIN nb),
       |k AS (
       |  SELECT *, row_number() OVER (
       |    ORDER BY lift DESC, antecedent, consequent) AS rnk
       |  FROM j)
       |SELECT antecedent, consequent, support, confidence, lift,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM k WHERE rnk <= $RuleTopK""".stripMargin) { (s, dir) =>
    val li = InternalCache.persist(Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct())
    val nBaskets = li.agg(
      countDistinct(col("l_orderkey")).as("n_baskets"))
    val items = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("s"))
    def side(n: String) =
      li.select(col("l_orderkey"), col("l_partkey").as(n))
    val pairs = side("a").join(side("b"), Seq("l_orderkey"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("s_ab"))
      .filter(col("s_ab") >= RuleMinSupport)
    val rules = pairs.select(col("a").as("antecedent"),
        col("b").as("consequent"), col("s_ab"))
      .unionAll(pairs.select(col("b").as("antecedent"),
        col("a").as("consequent"), col("s_ab")))
    val scored = rules
      .join(items.select(col("l_partkey").as("antecedent"),
        col("s").as("s_a")), Seq("antecedent"))
      .join(items.select(col("l_partkey").as("consequent"),
        col("s").as("s_c")), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"),
        col("s_ab").as("support"),
        round(col("s_ab").cast("double") / col("s_a").cast("double"), 6)
          .as("confidence"),
        round((col("s_ab") * col("n_baskets")).cast("double") /
          (col("s_a") * col("s_c")).cast("double"), 6).as("lift"))
    Ranking.withGlobalRank(scored,
        struct((col("lift") * -1).as("nl"), col("antecedent").as("ka"),
          col("consequent").as("kc")).asc, "rnk")
      .filter(col("rnk") <= RuleTopK)
      .select(col("antecedent"), col("consequent"), col("support"),
        col("confidence"), col("lift"), col("rnk"))
  }

  // ------------------------------------------------------------ q166

  private val KwTopK = 3

  /** Per-document TF-IDF keyword extraction — q135's weighting turned
    * into the per-doc summarization product (the "top terms" column a
    * search index or doc-card wants). Scores are exact integers (tf ×
    * the q135 quantized-idf grid), so the per-doc top-k order
    * (score desc, word asc) is total and engine-exact; the window is
    * PARTITIONED BY doc — parallelism is document count, nothing
    * global. */
  val q166 = Query(
    "q166_doc_keywords",
    s"""WITH t AS (
       |  SELECT doc_id, unnest($DTokens) AS word FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |w AS (
       |  SELECT doc_id, tf.word,
       |    tf * CAST(round(ln(n.n::DOUBLE / df.df::DOUBLE)
       |      * $TfIdfScale) AS BIGINT) AS score
       |  FROM tf JOIN df USING (word) CROSS JOIN n),
       |r AS (
       |  SELECT doc_id, word, score, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, word) AS rnk
       |  FROM w WHERE score > 0)
       |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, word, score
       |FROM r WHERE rnk <= $KwTopK""".stripMargin) { (s, dir) =>
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val tf = TextDedup
      .docShingleRows(docs, "doc_id", "text", 1, distinctGrams = false)
      .groupBy(col("doc_id"), col("g").as("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, Seq("word"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"),
        (col("tf") * round(log(col("n").cast("double") /
          col("df").cast("double")) * TfIdfScale).cast("long"))
          .as("score"))
      .filter(col("score") > 0)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= KwTopK)
      .select(col("doc_id"), col("rnk"), col("word"), col("score"))
  }

  // ------------------------------------------------------------ q186

  private val TeFolds = 5

  /** Out-of-fold TARGET ENCODING — the leakage-safe categorical
    * encoder every tabular-ML prep pipeline ships: each
    * (category, fold) cell gets the target mean computed from every
    * OTHER fold (`(S_c − S_cf) / (n_c − n_cf)`), so a row never sees
    * its own target. The whole encoder is one map-combinable
    * (category × fold) aggregate plus a broadcast-sized per-category
    * rollup — two tiny frames regardless of input size. Sums are
    * exact HUGEINT/DECIMAL(38) cents (the q117 discipline); the one
    * double division is 6-dp rounded. Single-fold categories encode
    * NULL in both engines. */
  val q186 = Query(
    "q186_target_encoding",
    s"""WITH b AS (
       |  SELECT o_orderpriority AS priority, o_orderkey % $TeFolds AS fold,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders),
       |cf AS (
       |  SELECT priority, fold, COUNT(*) AS n_cf,
       |    SUM(CAST(cents AS HUGEINT)) AS s_cf
       |  FROM b GROUP BY 1, 2),
       |c AS (
       |  SELECT priority, SUM(n_cf) AS n_c, SUM(s_cf) AS s_c
       |  FROM cf GROUP BY 1)
       |SELECT cf.priority, CAST(fold AS BIGINT) AS fold,
       |  CAST(n_cf AS BIGINT) AS n_rows,
       |  CASE WHEN n_c > n_cf THEN
       |    ROUND((CAST(s_c - s_cf AS DOUBLE)
       |      / CAST(n_c - n_cf AS DOUBLE)) / 100.0, 6)
       |  ELSE NULL END AS oof_mean_price
       |FROM cf JOIN c USING (priority)""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.money
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = Tables.orders(s, dir).select(
      col("o_orderpriority").as("priority"),
      (col("o_orderkey") % TeFolds).as("fold"),
      (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val cf = b.groupBy(col("priority"), col("fold"))
      .agg(count(lit(1)).as("n_cf"), sum(col("cents").cast(d38)).as("s_cf"))
    val c = cf.groupBy(col("priority"))
      .agg(sum(col("n_cf")).as("n_c"), sum(col("s_cf")).as("s_c"))
    cf.join(broadcast(c), "priority")
      .select(col("priority"), col("fold"), col("n_cf").as("n_rows"),
        when(col("n_c") > col("n_cf"),
          round((col("s_c") - col("s_cf")).cast("double") /
            (col("n_c") - col("n_cf")).cast("double") / 100.0, 6))
          .otherwise(lit(null).cast("double")).as("oof_mean_price"))
  }

  // ------------------------------------------------------------ q200

  private val FusK = 20 // per-retriever candidate depth
  private val FusOut = 10 // fused results per query
  private val RrfC = 60 // the standard RRF constant (Cormack 2009)
  private val RrfScale = 1000000000L // integer RRF grid: 1e9 div (c+r)

  /** The dense retrieval scored frame (query_id, doc_id, cos): every
    * embedded doc's cosine to each probe query's pseudo-relevance-
    * feedback centroid (the integer-grid exact mean embedding of the
    * query's term-matched docs). SHARED between q200's dense fusion
    * leg and q203's MMR candidate pool — one centroid build + one
    * corpus scan per run. */
  private def denseScored(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    SharedFrames.getOrBuild(SharedFrames.key(s, "fusion_dense", dir)) {
      val sc = bm25Scored(s, dir)
      val v = Tables.embeddings(s, dir).select(col("vec_id"),
        graft.functions.Functions.toDoubleArray(col("embedding"))
          .as("e"))
      val md = sc.select(col("query_id"), col("doc_id")).distinct()
      val me = md.join(v, md("doc_id") === v("vec_id"))
        .select(col("query_id"), col("e"))
      val ex = me.select(col("query_id"), posexplode(col("e")))
        .select(col("query_id"), col("pos"),
          floor(col("col") * lit(1000000.0d)).cast("long").as("qx"))
      val cs = ex.groupBy(col("query_id"), col("pos"))
        .agg(sum(col("qx")).as("sq"), count(lit(1)).as("nq"))
      val cent = cs.groupBy(col("query_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          (col("sq").cast("double") / (col("nq") * lit(1000000L)))
            .as("cx")))), x => x.getField("cx")).as("c"))
      v.crossJoin(broadcast(cent))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          graft.functions.Functions.cosine(col("c"), col("e")).as("cos"))
    }

  /** Hybrid retrieval via RECIPROCAL RANK FUSION: each probe query's
    * BM25 top-[[FusK]] (the q141 lexical retriever, shared scored
    * frame — not recomputed) is fused with a dense top-[[FusK]] from
    * the embedding space, by summing `1e9 div (60 + rank)` points per
    * list — the standard fuse for lexical×dense rankings with
    * incomparable scores (and the production answer when only SOME
    * docs are embedded: RRF never compares raw scores, so partial
    * dense coverage degrades gracefully instead of skewing).
    *
    * The dense query vector is pseudo-relevance feedback: the centroid
    * of the embeddings of the query's term-matched docs — per-dim sums
    * quantized to an integer grid (exact, order-independent), one
    * dim-level shuffle of the (small) matched set. The corpus is then
    * scanned ONCE against the broadcast centroids (the q24 shape) and
    * everything downstream of the two rank windows is pure integer
    * arithmetic — fusion points, ties, and final ranking replay
    * exactly in the oracle. */
  /** Oracle CTEs through `ds` (the dense scored frame) — the SQL twin
    * of [[denseScored]], shared by the q200 and q203 oracles. */
  private val denseOracleCtes: String =
    s"""$bmOracleCtes,
       |v AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS e
       |  FROM embeddings),
       |md AS (SELECT DISTINCT query_id, doc_id FROM sc),
       |me AS (SELECT md.query_id, v.e FROM md
       |  JOIN v ON v.vec_id = md.doc_id),
       |ex AS (SELECT query_id,
       |    unnest(range(1, len(e) + 1)) AS pos,
       |    unnest([CAST(floor(x * 1000000.0) AS BIGINT) for x in e])
       |      AS qx
       |  FROM me),
       |cs AS (SELECT query_id, pos, SUM(qx) AS sq, COUNT(*) AS nq
       |  FROM ex GROUP BY 1, 2),
       |cent AS (SELECT query_id,
       |    list(sq::DOUBLE / (nq * 1000000) ORDER BY pos) AS c
       |  FROM cs GROUP BY 1),
       |ds AS (SELECT cent.query_id, v.vec_id AS doc_id,
       |    ${Llm.dCosine("cent.c", "v.e")} AS cos
       |  FROM v CROSS JOIN cent)""".stripMargin

  val q200 = Query(
    "q200_hybrid_rank_fusion",
    s"""WITH $denseOracleCtes,
       |lexr AS (
       |  SELECT query_id, doc_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
       |  FROM sc),
       |lex AS (
       |  SELECT query_id, doc_id,
       |    $RrfScale // ($RrfC + rnk) AS lex_pts
       |  FROM lexr WHERE rnk <= $FusK),
       |dnr AS (SELECT query_id, doc_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rnk
       |  FROM ds),
       |den AS (
       |  SELECT query_id, doc_id,
       |    $RrfScale // ($RrfC + rnk) AS den_pts
       |  FROM dnr WHERE rnk <= $FusK),
       |fused AS (
       |  SELECT query_id, doc_id,
       |    COALESCE(lex_pts, 0) + COALESCE(den_pts, 0) AS rrf,
       |    lex_pts IS NOT NULL AS in_lexical,
       |    den_pts IS NOT NULL AS in_dense
       |  FROM lex FULL JOIN den USING (query_id, doc_id)),
       |r AS (SELECT query_id, doc_id, rrf, in_lexical, in_dense,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS rk
       |  FROM fused)
       |SELECT query_id, CAST(rk AS BIGINT) AS rnk, doc_id,
       |  CAST(rrf AS BIGINT) AS rrf_pts, in_lexical, in_dense
       |FROM r WHERE rk <= $FusOut""".stripMargin) { (s, dir) =>
    val sc = bm25Scored(s, dir)
    val wq = Window.partitionBy(col("query_id"))
    val lexr = sc.withColumn("rnk", row_number().over(
        wq.orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rnk") <= FusK)
      .select(col("query_id"), col("doc_id"),
        expr(s"${RrfScale}L div ($RrfC + rnk)").as("lex_pts"))
    val ds = denseScored(s, dir)
    val denr = ds.withColumn("rnk", row_number().over(
        wq.orderBy(col("cos").desc, col("doc_id"))))
      .filter(col("rnk") <= FusK)
      .select(col("query_id"), col("doc_id"),
        expr(s"${RrfScale}L div ($RrfC + rnk)").as("den_pts"))
    val fused = lexr.join(denr, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(col("lex_pts"), lit(0L)) +
          coalesce(col("den_pts"), lit(0L))).as("rrf"),
        col("lex_pts").isNotNull.as("in_lexical"),
        col("den_pts").isNotNull.as("in_dense"))
    fused.withColumn("rk", row_number().over(
        wq.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rk") <= FusOut)
      .select(col("query_id"), col("rk").cast("long").as("rnk"),
        col("doc_id"), col("rrf").cast("long").as("rrf_pts"),
        col("in_lexical"), col("in_dense"))
  }

  // ------------------------------------------------------------ q203

  private val MmrCand = 12 // candidate pool per query (dense top-12)
  private val MmrPicks = 4 // diversified picks per query
  private val MmrLw = 7 // λ = 0.7, scaled by 10: 7·rel − 3·maxSim
  private val MmrDw = 3

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified re-rank of the dense retrieval candidates: per probe
    * query, pick [[MmrPicks]] docs greedily — the first by relevance,
    * each next maximizing `λ·rel − (1−λ)·max-sim-to-already-picked` —
    * the diversity pass a retrieval/few-shot-selection pipeline runs
    * so near-duplicate hits don't crowd the result list.
    *
    * Determinism: relevance and pairwise cosines are quantized to a
    * 1e-6 integer grid up front, so every subsequent comparison is
    * integer arithmetic (`7·relq − 3·simq`) with doc-id tie-breaks —
    * the greedy rounds replay exactly as [[MmrPicks]] unrolled oracle
    * CTEs. Scale shape: the candidate cut (window over the SHARED
    * dense scored frame) and the ≤[[MmrCand]]² pairwise cosines run
    * distributed; the greedy selection itself runs on the DRIVER over
    * those two frames — both bounded by the fixed probe workload
    * (k·|probes| and k²·|probes| rows), the q204/k-means
    * bounded-collect precedent. Distributing the greedy rounds as
    * Spark jobs costs ~10 s of pure scheduling for microseconds of
    * arithmetic; at a larger query fleet the per-query selection is
    * embarrassingly parallel and would move into a row-local fold
    * over per-query candidate arrays. */
  val q203 = Query(
    "q203_mmr_rerank", {
      val rounds = (2 to MmrPicks).map { p =>
        s"""m$p AS (
           |  SELECT pr.query_id, pr.d AS doc_id, MAX(pr.simq) AS msim
           |  FROM pr JOIN sel${p - 1} sl
           |    ON sl.query_id = pr.query_id AND sl.doc_id = pr.s
           |  GROUP BY 1, 2),
           |c$p AS (
           |  SELECT c.query_id, c.doc_id, c.relq, m$p.msim,
           |    $MmrLw * c.relq - $MmrDw * m$p.msim AS mmr
           |  FROM cand c JOIN m$p
           |    ON m$p.query_id = c.query_id AND m$p.doc_id = c.doc_id
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${p - 1} s
           |    WHERE s.query_id = c.query_id AND s.doc_id = c.doc_id)),
           |s$p AS (
           |  SELECT query_id, doc_id, $p AS pick, relq,
           |    msim AS max_sim_q, mmr AS mmr_q
           |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY mmr DESC, doc_id) AS rk FROM c$p)
           |  WHERE rk = 1),
           |sel$p AS (SELECT * FROM sel${p - 1}
           |  UNION ALL SELECT * FROM s$p)""".stripMargin
      }.mkString(",\n")
      s"""WITH $denseOracleCtes,
         |cand AS (
         |  SELECT query_id, doc_id,
         |    CAST(round(cos * 1000000.0) AS BIGINT) AS relq
         |  FROM (SELECT query_id, doc_id, cos, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rnk
         |    FROM ds)
         |  WHERE rnk <= $MmrCand),
         |ce AS (SELECT c.query_id, c.doc_id, v.e
         |  FROM cand c JOIN v ON v.vec_id = c.doc_id),
         |pr AS (
         |  SELECT a.query_id, a.doc_id AS d, b.doc_id AS s,
         |    CAST(round(${Llm.dCosine("a.e", "b.e")} * 1000000.0)
         |      AS BIGINT) AS simq
         |  FROM ce a JOIN ce b ON a.query_id = b.query_id
         |    AND a.doc_id != b.doc_id),
         |sel1 AS (
         |  SELECT query_id, doc_id, 1 AS pick, relq,
         |    CAST(NULL AS BIGINT) AS max_sim_q,
         |    CAST(NULL AS BIGINT) AS mmr_q
         |  FROM (SELECT query_id, doc_id, relq, row_number() OVER (
         |      PARTITION BY query_id ORDER BY relq DESC, doc_id) AS rk
         |    FROM cand)
         |  WHERE rk = 1),
         |$rounds
         |SELECT query_id, CAST(pick AS BIGINT) AS pick, doc_id,
         |  relq AS relevance_q, max_sim_q, mmr_q
         |FROM sel$MmrPicks""".stripMargin
    }) { (s, dir) =>
    val wq = Window.partitionBy(col("query_id"))
    val cand = InternalCache.persist(denseScored(s, dir)
      .withColumn("rnk", row_number().over(
        wq.orderBy(col("cos").desc, col("doc_id"))))
      .filter(col("rnk") <= MmrCand)
      .select(col("query_id"), col("doc_id"),
        round(col("cos") * 1000000.0).cast("long").as("relq")))
    val v = Tables.embeddings(s, dir).select(col("vec_id"),
      graft.functions.Functions.toDoubleArray(col("embedding")).as("e"))
    val ce = cand.join(v, cand("doc_id") === v("vec_id"))
      .select(col("query_id"), col("doc_id"), col("e"))
    val pr = ce.as("a")
      .join(ce.as("b"), col("a.query_id") === col("b.query_id") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.doc_id").as("d"), col("b.doc_id").as("s"),
        round(graft.functions.Functions.cosine(col("a.e"), col("b.e"))
          * 1000000.0).cast("long").as("simq"))
    // the bounded driver collects: k·|probes| candidates, k²·|probes|
    // pair sims (the cosines themselves were computed by the SAME
    // Spark fold the oracle replays)
    val candRows = cand.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val sim: Map[(Int, Long, Long), Long] = pr.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    InternalCache.release()
    val out = candRows.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      val pool = cs.map(c => (c._2, c._3)) // (doc_id, relq)
      val first = pool.minBy { case (d0, r0) => (-r0, d0) }
      var picked = Vector((q, 1L, first._1, first._2,
        Option.empty[Long], Option.empty[Long]))
      var rest = pool.filterNot(_._1 == first._1)
      for (p <- 2 to MmrPicks if rest.nonEmpty) {
        val scored = rest.map { case (d0, r0) =>
          val ms = picked.map(pk => sim((q, d0, pk._3))).max
          (d0, r0, ms, MmrLw.toLong * r0 - MmrDw.toLong * ms)
        }
        val best = scored.minBy { case (d0, _, _, m) => (-m, d0) }
        picked :+= ((q, p.toLong, best._1, best._2,
          Some(best._3), Some(best._4)))
        rest = rest.filterNot(_._1 == best._1)
      }
      picked
    }
    import s.implicits._
    out.toDF("query_id", "pick", "doc_id", "relevance_q",
      "max_sim_q", "mmr_q")
  }

  // ------------------------------------------------------------ q211

  private val AaMaxDeg = 64 // hub cap: z with deg > cap yields no wedges
  private val AaScale = 1000000L // 1/ln(deg) quantization grid (1e-6)
  private val AaK = 20

  /** Adamic–Adar link prediction over the part co-occurrence graph
    * (q132's support-≥2 edges): for each NON-adjacent part pair, the
    * sum of 1/ln(deg(z)) over common neighbors z — the classic
    * "which products will be bought together next" score, completing
    * the graph family (PageRank q111, components q48, triangles q138,
    * communities q195, BFS q179) with its prediction member. Wedge
    * generation is the triangle-count shape: pairs come only from a
    * per-common-neighbor fan-out, and a degree cap [[AaMaxDeg]]
    * bounds it at O(cap²) per node — a 10⁶-degree hub contributes
    * zero wedges instead of 10¹² (and ~zero AA signal anyway:
    * 1/ln(10⁶) ≈ 0.07, the score's own discount says hubs are
    * uninformative). Per-z weights quantize 1/ln(deg) onto a 1e-6
    * integer grid (deg is a SMALL INT, so ln hits identical doubles
    * in both engines — the q135/q136 precedent), making every score
    * an exact integer sum; ranking is the distributed global rank. */
  val q211 = Query(
    "q211_adamic_adar",
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
       |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |    AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |e AS (SELECT a, b FROM p WHERE n >= $TriMinSupport),
       |adj AS (
       |  SELECT a AS z, b AS nb FROM e
       |  UNION ALL SELECT b AS z, a AS nb FROM e),
       |d AS (SELECT z, COUNT(*) AS deg FROM adj GROUP BY 1),
       |w AS (
       |  SELECT z, CAST(round($AaScale.0 / ln(CAST(deg AS DOUBLE)))
       |    AS BIGINT) AS w
       |  FROM d WHERE deg >= 2 AND deg <= $AaMaxDeg),
       |wedge AS (
       |  SELECT x.nb AS pa, y.nb AS pb, w.w
       |  FROM adj x JOIN adj y ON y.z = x.z AND y.nb > x.nb
       |  JOIN w ON w.z = x.z),
       |sc AS (
       |  SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n_common,
       |    SUM(w) AS aa
       |  FROM wedge GROUP BY 1, 2),
       |nonadj AS (
       |  SELECT sc.* FROM sc
       |  LEFT JOIN e ON e.a = sc.pa AND e.b = sc.pb
       |  WHERE e.a IS NULL),
       |r AS (
       |  SELECT pa, pb, n_common, aa, row_number() OVER (
       |    ORDER BY aa DESC, pa, pb) AS rnk
       |  FROM nonadj)
       |SELECT pa AS part_a, pb AS part_b, n_common,
       |  ROUND(CAST(aa AS DOUBLE) / $AaScale.0, 6) AS aa_score,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= $AaK""".stripMargin) { (s, dir) =>
    val edges = partPairs(s, dir)
      .filter(col("n") >= TriMinSupport)
      .select(col("a"), col("b"))
    val nonadj = Graph.adamicAdar(edges, AaMaxDeg, AaScale)
    Ranking.withGlobalRank(nonadj,
        struct((col("aa") * -1).as("s"), col("pa").as("x"),
          col("pb").as("y")).asc, "rnk")
      .filter(col("rnk") <= AaK)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_common"),
        round(col("aa").cast("double") / AaScale.toDouble, 6)
          .as("aa_score"),
        col("rnk"))
  }

  // ------------------------------------------------------------ q217

  /** Per-class precision / recall / F1 of the NB language classifier —
    * the metric panel a model card reports, derived from the SAME
    * shared prediction frame as q136's confusion matrix (the model
    * trains and scores once per run; this query only re-aggregates).
    * tp / n_true / n_pred are exact integer counts from two bounded
    * class-keyed aggregates joined on the label set (classes-bounded,
    * broadcast); P, R are single divisions and F1 the fixed
    * `(2·p·r)/(p+r)` tree, each gated against empty denominators. */
  val q217 = Query(
    "q217_classifier_prf",
    s"""WITH $dNbChain,
       |jj AS (
       |  SELECT d.lang AS label, pr.pred,
       |    CASE WHEN d.lang = pr.pred THEN 1 ELSE 0 END AS hit
       |  FROM documents d JOIN pr USING (doc_id)),
       |tcls AS (
       |  SELECT label, COUNT(*) AS n_true, SUM(hit) AS tp
       |  FROM jj GROUP BY 1),
       |pcls AS (SELECT pred, COUNT(*) AS n_pred FROM jj GROUP BY 1),
       |fm AS (
       |  SELECT tcls.label, tcls.n_true,
       |    COALESCE(pcls.n_pred, 0) AS n_pred, tcls.tp,
       |    CASE WHEN COALESCE(pcls.n_pred, 0) > 0 THEN
       |      CAST(tcls.tp AS DOUBLE) / CAST(pcls.n_pred AS DOUBLE)
       |    END AS pr_,
       |    CASE WHEN tcls.n_true > 0 THEN
       |      CAST(tcls.tp AS DOUBLE) / CAST(tcls.n_true AS DOUBLE)
       |    END AS rc
       |  FROM tcls LEFT JOIN pcls ON pcls.pred = tcls.label)
       |SELECT label, CAST(n_true AS BIGINT) AS n_true,
       |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
       |  ROUND(pr_, 6) AS precision_,
       |  ROUND(rc, 6) AS recall_,
       |  CASE WHEN pr_ IS NOT NULL AND rc IS NOT NULL
       |      AND pr_ + rc > 0 THEN
       |    ROUND(((2.0 * pr_) * rc) / (pr_ + rc), 6)
       |  END AS f1
       |FROM fm""".stripMargin) { (s, dir) =>
    val j = nbPredShared(s, dir).select(col("label"), col("pred"),
      when(col("label") === col("pred"), 1L).otherwise(0L).as("hit"))
    val t = j.groupBy(col("label"))
      .agg(count(lit(1)).as("n_true"), sum(col("hit")).as("tp"))
    val p = j.groupBy(col("pred")).agg(count(lit(1)).as("n_pred"))
    val prc = when(col("n_pred") > 0,
      col("tp").cast("double") / col("n_pred").cast("double"))
    val rc = when(col("n_true") > 0,
      col("tp").cast("double") / col("n_true").cast("double"))
    t.join(broadcast(p), col("pred") === col("label"), "left")
      .select(col("label"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("tp"),
        prc.as("pr_"), rc.as("rc"))
      .select(col("label"), col("n_true"), col("n_pred"), col("tp"),
        round(col("pr_"), 6).as("precision_"),
        round(col("rc"), 6).as("recall_"),
        when(col("pr_").isNotNull && col("rc").isNotNull &&
            col("pr_") + col("rc") > 0,
          round(((lit(2.0d) * col("pr_")) * col("rc")) /
            (col("pr_") + col("rc")), 6)).as("f1"))
  }

  // ------------------------------------------------------------ q218

  private val ZipfK = 100 // terms in the fit, per language
  private val ZipfMinCnt = 2 // candidate floor (engine-consistent)
  private val ZipfScale = 1000000L // ln quantization grid (1e-6)

  /** Exact decimal → correctly-rounded double through a decimal
    * string — the q196 route; both engines then do the same IEEE
    * string→double parse. Needed wherever an exact cross-product can
    * exceed 2⁵³. */
  private def dd(c: Column): Column = c.cast("string").cast("double")

  private val mD38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Zipf's-law fit per language: OLS slope of ln(frequency) against
    * ln(rank) over the top-[[ZipfK]] terms — the standard corpus
    * health probe (natural text sits near −1; templated or spammy
    * corpora bend the curve, so slope + R² is a generation-quality
    * alarm beside q28's heuristics). Term counts are one map-side
    * combinable aggregate; the per-language rank is a vocab-bounded
    * window AFTER a count floor. Both engines apply the same floor, so
    * oracle equality holds regardless; for a language with fewer than
    * [[ZipfK]] terms of count ≥ [[ZipfMinCnt]] the floor shrinks
    * n_terms (hapax terms would otherwise fill the top-K) — for
    * typical languages it only keeps the hapax tail out of the sort.
    * Both
    * lns are of exact small integers, quantized to the 1e-6 grid (the
    * q211 precedent), so the OLS sufficient statistics are exact
    * decimal sums and slope/R² are fixed IEEE trees over
    * string-parsed doubles. */
  val q218 = Query(
    "q218_zipf_fit",
    s"""WITH t AS (
       |  SELECT lang, unnest($DTokens) AS word FROM documents),
       |c AS (
       |  SELECT lang, word, COUNT(*) AS c FROM t GROUP BY 1, 2
       |  HAVING COUNT(*) >= $ZipfMinCnt),
       |r AS (
       |  SELECT lang, c, row_number() OVER (
       |    PARTITION BY lang ORDER BY c DESC, word) AS rk
       |  FROM c),
       |q AS (
       |  SELECT lang,
       |    CAST(round(ln(CAST(rk AS DOUBLE)) * $ZipfScale) AS BIGINT)
       |      AS lx,
       |    CAST(round(ln(CAST(c AS DOUBLE)) * $ZipfScale) AS BIGINT)
       |      AS ly
       |  FROM r WHERE rk <= $ZipfK),
       |st AS (
       |  SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(lx) AS HUGEINT) AS sx,
       |    CAST(SUM(ly) AS HUGEINT) AS sy,
       |    CAST(SUM(lx * lx) AS HUGEINT) AS sxx,
       |    CAST(SUM(lx * ly) AS HUGEINT) AS sxy,
       |    CAST(SUM(ly * ly) AS HUGEINT) AS syy
       |  FROM q GROUP BY 1),
       |f AS (
       |  SELECT lang, CAST(n AS BIGINT) AS n_terms,
       |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
       |    CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
       |    CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy
       |  FROM st)
       |SELECT lang, n_terms,
       |  CASE WHEN vx != 0.0 THEN ROUND(cov / vx, 6) END AS zipf_slope,
       |  CASE WHEN vx != 0.0 AND vy != 0.0 THEN
       |    ROUND((cov * cov) / (vx * vy), 6)
       |  END AS r2
       |FROM f""".stripMargin) { (s, dir) =>
    val c = Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= ZipfMinCnt)
    val r = c.withColumn("rk", row_number().over(Window
        .partitionBy(col("lang"))
        .orderBy(col("c").desc, col("word"))))
      .filter(col("rk") <= ZipfK)
    val q = r.select(col("lang"),
      round(log(col("rk").cast("double")) * ZipfScale).cast("long")
        .as("lx"),
      round(log(col("c").cast("double")) * ZipfScale).cast("long")
        .as("ly"))
    val st = q.groupBy(col("lang")).agg(
      count(lit(1)).cast(mD38).as("n"),
      sum(col("lx").cast(mD38)).as("sx"),
      sum(col("ly").cast(mD38)).as("sy"),
      sum((col("lx") * col("lx")).cast(mD38)).as("sxx"),
      sum((col("lx") * col("ly")).cast(mD38)).as("sxy"),
      sum((col("ly") * col("ly")).cast(mD38)).as("syy"))
    val f = st.select(col("lang"), col("n").cast("long").as("n_terms"),
      dd(col("n") * col("sxy") - col("sx") * col("sy")).as("cov"),
      dd(col("n") * col("sxx") - col("sx") * col("sx")).as("vx"),
      dd(col("n") * col("syy") - col("sy") * col("sy")).as("vy"))
    f.select(col("lang"), col("n_terms"),
      when(col("vx") =!= 0.0d, round(col("cov") / col("vx"), 6))
        .as("zipf_slope"),
      when(col("vx") =!= 0.0d && col("vy") =!= 0.0d,
        round((col("cov") * col("cov")) / (col("vx") * col("vy")), 6))
        .as("r2"))
  }

  // ------------------------------------------------------------ q219

  private val KapScale = 1000000L // per-class F1 quantization grid

  /** Single-row classifier agreement panel over the SAME shared NB
    * prediction frame as q136/q217: overall accuracy, Cohen's κ
    * (chance-corrected agreement), multiclass MCC (the Rₖ statistic),
    * and macro-F1. Everything reduces to the bounded class-keyed
    * marginals: n, the diagonal, Σnₜ·nₚ, Σnₜ², Σnₚ², and the per-class
    * F1s quantized to the 1e-6 grid so their mean is an exact integer
    * sum divided by the class count (a raw double sum over classes
    * would be engine-order-dependent). Cross-products go through
    * DECIMAL(38) and the string→double route; sqrt is IEEE
    * correctly-rounded in both engines. */
  val q219 = Query(
    "q219_kappa_panel",
    s"""WITH $dNbChain,
       |jj AS (
       |  SELECT d.lang AS label, pr.pred,
       |    CASE WHEN d.lang = pr.pred THEN 1 ELSE 0 END AS hit
       |  FROM documents d JOIN pr USING (doc_id)),
       |tcls AS (
       |  SELECT label, COUNT(*) AS n_true, SUM(hit) AS tp
       |  FROM jj GROUP BY 1),
       |pcls AS (SELECT pred, COUNT(*) AS n_pred FROM jj GROUP BY 1),
       |cmg AS (
       |  SELECT COALESCE(tcls.label, pcls.pred) AS cls,
       |    COALESCE(tcls.n_true, 0) AS n_true,
       |    COALESCE(pcls.n_pred, 0) AS n_pred,
       |    COALESCE(tcls.tp, 0) AS tp
       |  FROM tcls FULL OUTER JOIN pcls ON pcls.pred = tcls.label),
       |fq AS (
       |  SELECT cls, n_true, n_pred, tp,
       |    CASE WHEN tp > 0 THEN CAST(round(
       |      (((2.0 * (CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)))
       |        * (CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE)))
       |       / ((CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE))
       |        + (CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE))))
       |      * $KapScale) AS BIGINT) ELSE 0 END AS f1q
       |  FROM cmg),
       |kst AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS n_cls,
       |    CAST(SUM(n_true) AS HUGEINT) AS n,
       |    CAST(SUM(tp) AS HUGEINT) AS diag,
       |    CAST(SUM(CAST(n_true AS HUGEINT)
       |      * CAST(n_pred AS HUGEINT)) AS HUGEINT) AS stp,
       |    CAST(SUM(CAST(n_true AS HUGEINT)
       |      * CAST(n_true AS HUGEINT)) AS HUGEINT) AS stt,
       |    CAST(SUM(CAST(n_pred AS HUGEINT)
       |      * CAST(n_pred AS HUGEINT)) AS HUGEINT) AS spp,
       |    CAST(SUM(f1q) AS HUGEINT) AS sf1
       |  FROM fq),
       |kf AS (
       |  SELECT CAST(n AS BIGINT) AS n_docs,
       |    CAST(n_cls AS BIGINT) AS n_classes,
       |    CAST(CAST(n AS VARCHAR) AS DOUBLE) AS nd,
       |    CAST(CAST(diag AS VARCHAR) AS DOUBLE) AS diagd,
       |    CAST(CAST(n * diag - stp AS VARCHAR) AS DOUBLE) AS numd,
       |    CAST(CAST(n * n - stp AS VARCHAR) AS DOUBLE) AS dkap,
       |    CAST(CAST(n * n - stt AS VARCHAR) AS DOUBLE) AS dt,
       |    CAST(CAST(n * n - spp AS VARCHAR) AS DOUBLE) AS dp,
       |    CAST(CAST(sf1 AS VARCHAR) AS DOUBLE) AS sf1d,
       |    CAST(CAST(n_cls AS VARCHAR) AS DOUBLE) AS ncd
       |  FROM kst)
       |SELECT n_docs, n_classes,
       |  CASE WHEN nd != 0.0 THEN ROUND(diagd / nd, 6) END AS accuracy,
       |  CASE WHEN dkap != 0.0 THEN ROUND(numd / dkap, 6) END AS kappa,
       |  CASE WHEN dt > 0.0 AND dp > 0.0 THEN
       |    ROUND(numd / (sqrt(dt) * sqrt(dp)), 6)
       |  END AS mcc,
       |  CASE WHEN ncd != 0.0 THEN
       |    ROUND((sf1d / ncd) / $KapScale.0, 6)
       |  END AS macro_f1
       |FROM kf""".stripMargin) { (s, dir) =>
    val j = nbPredShared(s, dir).select(col("label"), col("pred"),
      when(col("label") === col("pred"), 1L).otherwise(0L).as("hit"))
    val t = j.groupBy(col("label"))
      .agg(count(lit(1)).as("n_true"), sum(col("hit")).as("tp"))
    val p = j.groupBy(col("pred")).agg(count(lit(1)).as("n_pred"))
    val cls = t.join(p, col("pred") === col("label"), "full_outer")
      .select(coalesce(col("label"), col("pred")).as("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val prd = col("tp").cast("double") / col("n_pred").cast("double")
    val rcd = col("tp").cast("double") / col("n_true").cast("double")
    val fq = cls.select(col("n_true"), col("n_pred"), col("tp"),
      when(col("tp") > 0,
        round((((lit(2.0d) * prd) * rcd) / (prd + rcd)) * KapScale)
          .cast("long")).otherwise(0L).as("f1q"))
    val st = fq.agg(
      count(lit(1)).cast(mD38).as("n_cls"),
      sum(col("n_true").cast(mD38)).as("n"),
      sum(col("tp").cast(mD38)).as("diag"),
      sum(col("n_true").cast(mD38) * col("n_pred").cast(mD38)).as("stp"),
      sum(col("n_true").cast(mD38) * col("n_true").cast(mD38)).as("stt"),
      sum(col("n_pred").cast(mD38) * col("n_pred").cast(mD38)).as("spp"),
      sum(col("f1q").cast(mD38)).as("sf1"))
    val f = st.select(
      col("n").cast("long").as("n_docs"),
      col("n_cls").cast("long").as("n_classes"),
      dd(col("n")).as("nd"), dd(col("diag")).as("diagd"),
      dd(col("n") * col("diag") - col("stp")).as("numd"),
      dd(col("n") * col("n") - col("stp")).as("dkap"),
      dd(col("n") * col("n") - col("stt")).as("dt"),
      dd(col("n") * col("n") - col("spp")).as("dp"),
      dd(col("sf1")).as("sf1d"), dd(col("n_cls")).as("ncd"))
    f.select(col("n_docs"), col("n_classes"),
      when(col("nd") =!= 0.0d, round(col("diagd") / col("nd"), 6))
        .as("accuracy"),
      when(col("dkap") =!= 0.0d, round(col("numd") / col("dkap"), 6))
        .as("kappa"),
      when(col("dt") > 0.0d && col("dp") > 0.0d,
        round(col("numd") / (sqrt(col("dt")) * sqrt(col("dp"))), 6))
        .as("mcc"),
      when(col("ncd") =!= 0.0d,
        round((col("sf1d") / col("ncd")) / KapScale.toDouble, 6))
        .as("macro_f1"))
  }

  // ------------------------------------------------------------ q220

  private val BurstK = 50 // terms reported

  /** Term burstiness: for the top-[[BurstK]] corpus terms, the
    * variance-to-mean ratio of the per-document count — the classic
    * spam/template detector (a Poisson-scattered term has VMR ≈ 1;
    * boilerplate repeated inside few docs is over-dispersed), feeding
    * the same curation verdicts as q80's doc-frequency grams. Per-doc
    * term counts aggregate once; per-term (df, Σc, Σc²) are exact
    * sums over CONTAINING docs only (absent docs contribute 0 to
    * every sum), so population VMR = (N·Σc² − (Σc)²)/(N·Σc) is a
    * ratio of exact integers. Top-K selection is the distributed
    * global rank, never a driver sort. */
  val q220 = Query(
    "q220_term_burstiness",
    s"""WITH t AS (
       |  SELECT doc_id, unnest($DTokens) AS word FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS c FROM t GROUP BY 1, 2),
       |st AS (
       |  SELECT word, CAST(COUNT(*) AS HUGEINT) AS df,
       |    CAST(SUM(c) AS HUGEINT) AS tot,
       |    CAST(SUM(c * c) AS HUGEINT) AS s2
       |  FROM tf GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nd FROM documents),
       |r AS (
       |  SELECT word, df, tot, s2, row_number() OVER (
       |    ORDER BY tot DESC, word) AS rnk
       |  FROM st)
       |SELECT CAST(rnk AS BIGINT) AS rnk, word,
       |  CAST(df AS BIGINT) AS df, CAST(tot AS BIGINT) AS total_cnt,
       |  CASE WHEN CAST(CAST(nd * tot AS VARCHAR) AS DOUBLE) != 0.0 THEN
       |    ROUND(CAST(CAST(nd * s2 - tot * tot AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(nd * tot AS VARCHAR) AS DOUBLE), 6)
       |  END AS vmr,
       |  ROUND(CAST(CAST(tot AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(df AS VARCHAR) AS DOUBLE), 6) AS mean_in_docs
       |FROM r CROSS JOIN nn WHERE rnk <= $BurstK""".stripMargin) {
      (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val st = tf.groupBy(col("word")).agg(
      count(lit(1)).cast(mD38).as("df"),
      sum(col("c").cast(mD38)).as("tot"),
      sum((col("c") * col("c")).cast(mD38)).as("s2"))
    val nn = docs.agg(count(lit(1)).cast(mD38).as("nd"))
    val r = Ranking.withGlobalRank(st,
      struct((col("tot") * -1).as("nt"), col("word").as("w")).asc, "rnk")
      .filter(col("rnk") <= BurstK)
    r.crossJoin(broadcast(nn))
      .select(col("rnk"), col("word"), col("df").cast("long").as("df"),
        col("tot").cast("long").as("total_cnt"),
        when(dd(col("nd") * col("tot")) =!= 0.0d,
          round(dd(col("nd") * col("s2") - col("tot") * col("tot")) /
            dd(col("nd") * col("tot")), 6)).as("vmr"),
        round(dd(col("tot")) / dd(col("df")), 6).as("mean_in_docs"))
  }

  // ------------------------------------------------------------ q226

  private val KcK = 3 // the core order
  private val KcRounds = 8 // peel rounds the oracle unrolls

  /** 3-core of the part co-occurrence graph: iteratively peel nodes
    * of degree < k until stable — the standard dense-substructure
    * extractor (spam/ring detection on co-occurrence graphs; the
    * complement of q138's triangle density and q195's communities).
    * Runs through [[Graph.kCore]]: per round one map-side degree
    * count + two semi-joins, early-stopped on a bounded driver
    * scalar. Peeling is monotone-idempotent, so early stop ≡ the
    * oracle's fixed [[KcRounds]]-round unroll (MATERIALIZED CTEs —
    * the q204 inline-CTE lesson; each round references the previous
    * one three times). */
  val q226 = Query(
    "q226_kcore", {
      val rounds = (1 to KcRounds).map { r =>
        s"""d$r AS MATERIALIZED (
           |  SELECT z, COUNT(*) AS deg FROM (
           |    SELECT a AS z FROM e${r - 1}
           |    UNION ALL SELECT b FROM e${r - 1})
           |  GROUP BY 1),
           |e$r AS MATERIALIZED (
           |  SELECT e.a, e.b FROM e${r - 1} e
           |  JOIN d$r x ON x.z = e.a AND x.deg >= $KcK
           |  JOIN d$r y ON y.z = e.b AND y.deg >= $KcK)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (
         |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
         |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
         |    AND x.l_partkey < y.l_partkey
         |  GROUP BY 1, 2),
         |e0 AS MATERIALIZED (
         |  SELECT a, b FROM p WHERE n >= $TriMinSupport),
         |$rounds,
         |fin AS (
         |  SELECT
         |    (SELECT COUNT(*) FROM (
         |      SELECT a AS z FROM e$KcRounds
         |      UNION SELECT b FROM e$KcRounds)) AS n_core_nodes,
         |    (SELECT COUNT(*) FROM e$KcRounds) AS n_core_edges,
         |    (SELECT COUNT(*) FROM e0) AS ne0)
         |SELECT CAST($KcK AS BIGINT) AS k_value,
         |  CAST(n_core_nodes AS BIGINT) AS n_core_nodes,
         |  CAST(n_core_edges AS BIGINT) AS n_core_edges,
         |  CAST(ne0 AS BIGINT) AS n_edges_input,
         |  CASE WHEN ne0 > 0 THEN
         |    ROUND(CAST(n_core_edges AS DOUBLE) / CAST(ne0 AS DOUBLE),
         |      6)
         |  END AS core_edge_share
         |FROM fin""".stripMargin
    }) { (s, dir) =>
    val e0 = partPairs(s, dir)
      .filter(col("n") >= TriMinSupport)
      .select(col("a"), col("b"))
    val core = Graph.kCore(e0, KcK, KcRounds)
    val edges = core.agg(count(lit(1)).as("n_core_edges"))
    val nodes = core.select(col("a").as("z"))
      .unionByName(core.select(col("b").as("z"))).distinct()
      .agg(count(lit(1)).as("n_core_nodes"))
    val ne0 = e0.agg(count(lit(1)).as("ne0"))
    nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(ne0))
      .select(lit(KcK.toLong).as("k_value"), col("n_core_nodes"),
        col("n_core_edges"), col("ne0").as("n_edges_input"),
        when(col("ne0") > 0,
          round(col("n_core_edges").cast("double") /
            col("ne0").cast("double"), 6)).as("core_edge_share"))
  }

  // ------------------------------------------------------------ q227

  private val NovScale = 1000000L // idf quantization grid (1e-6)

  /** Source-level token rarity (novelty): the token-weighted mean IDF
    * of each source's stream — a corpus that only repeats the global
    * head vocabulary scores low; one contributing rare/specialist
    * text scores high. The dual of q91's vocab coverage (how much of
    * the corpus a vocab explains) and the aggregate form of TF-IDF
    * keywording (q166). IDFs are quantized to the 1e-6 grid
    * (vocab-sized broadcast, the q94/q95 model-table posture), so the
    * per-source numerator is an exact integer sum and the mean is
    * one string-parse-pinned division. */
  val q227 = Query(
    "q227_source_novelty",
    s"""WITH t AS (
       |  SELECT doc_id, source, unnest($DTokens) AS word
       |  FROM documents),
       |dw AS (SELECT DISTINCT doc_id, word FROM t),
       |df AS (SELECT word, COUNT(*) AS df FROM dw GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |idf AS (
       |  SELECT word, CAST(round(ln(CAST(n AS DOUBLE)
       |    / CAST(df AS DOUBLE)) * $NovScale) AS BIGINT) AS idfq
       |  FROM df CROSS JOIN n),
       |s AS (
       |  SELECT t.source, CAST(COUNT(*) AS HUGEINT) AS total_tokens,
       |    CAST(SUM(idfq) AS HUGEINT) AS sidf
       |  FROM t JOIN idf USING (word) GROUP BY 1),
       |nd AS (
       |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT s.source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(total_tokens AS BIGINT) AS total_tokens,
       |  CASE WHEN CAST(CAST(total_tokens AS VARCHAR) AS DOUBLE)
       |      != 0.0 THEN
       |    ROUND(CAST(CAST(sidf AS VARCHAR) AS DOUBLE)
       |      / (CAST(CAST(total_tokens AS VARCHAR) AS DOUBLE)
       |        * $NovScale.0), 6)
       |  END AS mean_token_idf
       |FROM s JOIN nd ON nd.source = s.source""".stripMargin) {
      (s, dir) =>
    val docs = Tables.documents(s, dir)
    val t = docs.select(col("doc_id"), col("source"),
      explode(tokens(col("text"))).as("word"))
    val df0 = t.select(col("doc_id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = df0.crossJoin(broadcast(n))
      .select(col("word"),
        round(log(col("n").cast("double") / col("df").cast("double"))
          * NovScale).cast("long").as("idfq"))
    val sAgg = t.join(broadcast(idf), Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(mD38).as("total_tokens"),
        sum(col("idfq").cast(mD38)).as("sidf"))
    val nd = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    sAgg.join(broadcast(nd), Seq("source"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        col("total_tokens").cast("long").as("total_tokens"),
        when(dd(col("total_tokens")) =!= 0.0d,
          round(dd(col("sidf")) /
            (dd(col("total_tokens")) * NovScale.toDouble), 6))
          .as("mean_token_idf"))
  }

  // ------------------------------------------------------------ q228

  /** Degree distribution of the co-occurrence graph in power-of-two
    * buckets: per bit-length bucket, the node count, exact degree
    * range, and node share — the scale-free-ness check that pairs
    * with q218's Zipf fit (a power-law degree tail is what makes the
    * q211/q226 degree caps and peels effective). The bucket is the
    * BIT LENGTH of the degree (`length(bin(deg))` — exact integer
    * string ops in both engines, the q139 `bin()` precedent), so no
    * libm is involved anywhere. */
  val q228 = Query(
    "q228_degree_histogram",
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n
       |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |    AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |e AS (SELECT a, b FROM p WHERE n >= $TriMinSupport),
       |adj AS (
       |  SELECT a AS z FROM e UNION ALL SELECT b AS z FROM e),
       |d AS (SELECT z, COUNT(*) AS deg FROM adj GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS nn FROM d),
       |h AS (
       |  SELECT length(bin(deg)) AS bucket_bits,
       |    COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg
       |  FROM d GROUP BY 1)
       |SELECT CAST(bucket_bits AS BIGINT) AS bucket_bits,
       |  CAST(n_nodes AS BIGINT) AS n_nodes,
       |  CAST(min_deg AS BIGINT) AS min_deg,
       |  CAST(max_deg AS BIGINT) AS max_deg,
       |  ROUND(CAST(n_nodes AS DOUBLE) / CAST(nn AS DOUBLE), 6)
       |    AS node_share
       |FROM h CROSS JOIN tot""".stripMargin) { (s, dir) =>
    val e = partPairs(s, dir)
      .filter(col("n") >= TriMinSupport)
      .select(col("a"), col("b"))
    val d = e.select(col("a").as("z"))
      .unionByName(e.select(col("b").as("z")))
      .groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val tot = d.agg(count(lit(1)).as("nn"))
    d.groupBy(length(bin(col("deg"))).as("bucket_bits"))
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"))
      .crossJoin(broadcast(tot))
      .select(col("bucket_bits").cast("long").as("bucket_bits"),
        col("n_nodes"), col("min_deg"), col("max_deg"),
        round(col("n_nodes").cast("double") / col("nn").cast("double"),
          6).as("node_share"))
  }

  // ------------------------------------------------------------ q240

  /** Heaps'-law fit: vocabulary growth V(n) ≈ K·nᵝ across ten corpus
    * checkpoints — q218's Zipf companion (the two exponents are the
    * standard corpus-statistics pair; β far from ~0.5 flags templated
    * or synthetic text). NO cumulative re-scan per checkpoint: each
    * word's vocabulary contribution is pinned to the decile of its
    * FIRST document (per-word min + one rank join), each document's
    * tokens to its own decile — two integer-exact decile assignments
    * ((10·rank + n − 1) div n), two 10-row cumsums, then the same
    * quantized-ln OLS machinery as q218 over ≤10 points. */
  val q240 = Query(
    "q240_heaps_fit",
    s"""WITH dt AS (
       |  SELECT doc_id, len($DTokens) AS nt FROM documents),
       |rk AS (
       |  SELECT doc_id, nt, row_number() OVER (ORDER BY doc_id) AS rnk
       |  FROM dt),
       |nn AS (SELECT COUNT(*) AS n FROM dt),
       |docd AS (
       |  SELECT doc_id, nt, (10 * rnk + n - 1) // n AS d
       |  FROM rk CROSS JOIN nn),
       |tokd AS (
       |  SELECT d, SUM(SUM(nt)) OVER (ORDER BY d) AS tok
       |  FROM docd GROUP BY d),
       |fw AS (
       |  SELECT MIN(doc_id) AS first_doc
       |  FROM (SELECT unnest($DTokens) AS word, doc_id FROM documents)
       |  GROUP BY word),
       |wd AS (
       |  SELECT docd.d AS d FROM fw
       |  JOIN docd ON docd.doc_id = fw.first_doc),
       |vocd AS (
       |  SELECT d, SUM(COUNT(*)) OVER (ORDER BY d) AS voc
       |  FROM wd GROUP BY d),
       |pts AS (
       |  SELECT CAST(round(ln(CAST(tok AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS lx,
       |    CAST(round(ln(CAST(voc AS DOUBLE)) * 1000000) AS BIGINT)
       |      AS ly,
       |    tok, voc
       |  FROM tokd JOIN vocd USING (d)
       |  WHERE tok > 0 AND voc > 0),
       |st AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS np,
       |    CAST(SUM(lx) AS HUGEINT) AS sx,
       |    CAST(SUM(ly) AS HUGEINT) AS sy,
       |    CAST(SUM(lx * lx) AS HUGEINT) AS sxx,
       |    CAST(SUM(lx * ly) AS HUGEINT) AS sxy,
       |    CAST(SUM(ly * ly) AS HUGEINT) AS syy,
       |    CAST(MAX(tok) AS BIGINT) AS total_tokens,
       |    CAST(MAX(voc) AS BIGINT) AS total_vocab
       |  FROM pts),
       |f AS (
       |  SELECT total_tokens, total_vocab,
       |    CAST(CAST(np AS VARCHAR) AS DOUBLE) AS npd,
       |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
       |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
       |    CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
       |    CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
       |    CAST(CAST(np * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy
       |  FROM st)
       |SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_docs,
       |  total_tokens, total_vocab,
       |  CASE WHEN vx != 0.0 THEN ROUND(cov / vx, 6) END AS heaps_beta,
       |  CASE WHEN vx != 0.0 THEN
       |    ROUND(((syd - ((cov / vx) * sxd)) / npd) / 1000000.0, 6)
       |  END AS heaps_lnk,
       |  CASE WHEN vx != 0.0 AND vy != 0.0 THEN
       |    ROUND((cov * cov) / (vx * vy), 6)
       |  END AS r2
       |FROM f""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val dt = docs.select(col("doc_id"), size(tokens(col("text")))
      .as("nt"))
    val rk = Ranking.withGlobalRank(dt,
      struct(col("doc_id").as("d")).asc, "rnk")
    val nn = dt.agg(count(lit(1)).as("n"))
    val docd = rk.crossJoin(broadcast(nn))
      .withColumn("d", expr("(10 * rnk + n - 1) div n"))
    val tokd = docd.groupBy(col("d"))
      .agg(sum(col("nt").cast(mD38)).as("tk"))
      .withColumn("tok", sum(col("tk")).over(Window.orderBy(col("d"))))
    val fw = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(min(col("doc_id")).as("first_doc"))
    val wd = fw.join(docd.select(col("doc_id").as("first_doc"),
      col("d")), Seq("first_doc"))
    val vocd = wd.groupBy(col("d")).agg(count(lit(1)).as("vc"))
      .withColumn("voc", sum(col("vc")).over(Window.orderBy(col("d"))))
    val pts = tokd.join(vocd, Seq("d"))
      .filter(col("tok") > 0 && col("voc") > 0)
      .select(
        round(log(col("tok").cast("double")) * 1000000L).cast("long")
          .as("lx"),
        round(log(col("voc").cast("double")) * 1000000L).cast("long")
          .as("ly"),
        col("tok"), col("voc"))
    val st = pts.agg(count(lit(1)).cast(mD38).as("np"),
      sum(col("lx").cast(mD38)).as("sx"),
      sum(col("ly").cast(mD38)).as("sy"),
      sum((col("lx") * col("lx")).cast(mD38)).as("sxx"),
      sum((col("lx") * col("ly")).cast(mD38)).as("sxy"),
      sum((col("ly") * col("ly")).cast(mD38)).as("syy"),
      max(col("tok")).cast("long").as("total_tokens"),
      max(col("voc")).cast("long").as("total_vocab"))
    val f = st.select(col("total_tokens"), col("total_vocab"),
      dd(col("np")).as("npd"), dd(col("sx")).as("sxd"),
      dd(col("sy")).as("syd"),
      dd(col("np") * col("sxy") - col("sx") * col("sy")).as("cov"),
      dd(col("np") * col("sxx") - col("sx") * col("sx")).as("vx"),
      dd(col("np") * col("syy") - col("sy") * col("sy")).as("vy"))
    f.crossJoin(broadcast(nn))
      .select(col("n").cast("long").as("n_docs"),
        col("total_tokens"), col("total_vocab"),
        when(col("vx") =!= 0.0d, round(col("cov") / col("vx"), 6))
          .as("heaps_beta"),
        when(col("vx") =!= 0.0d,
          round(((col("syd") - ((col("cov") / col("vx")) * col("sxd")))
            / col("npd")) / 1000000.0d, 6)).as("heaps_lnk"),
        when(col("vx") =!= 0.0d && col("vy") =!= 0.0d,
          round((col("cov") * col("cov")) / (col("vx") * col("vy")), 6))
          .as("r2"))
  }

  val all: Seq[Query] = Seq(q135, q136, q138, q139, q141, q143, q144,
    q146, q158, q166, q186, q200, q203, q211, q217, q218, q219, q220,
    q226, q227, q228, q240)
}
