package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{NaiveBayes, TfIdf}
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

  /** Distributed multinomial Naive Bayes language classifier
    * (train + score in one pipeline — the fastText-style corpus
    * classifier shape), surfaced as the confusion matrix of predicted
    * vs labeled language. Integer-grid log probabilities make every
    * score an exact integer sum; the oracle replays the full train +
    * apply pipeline. */
  val q136 = Query(
    "q136_naive_bayes_langid",
    s"""WITH t AS (
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
       |  WHERE rk = 1)
       |SELECT d.lang, pr.pred, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM documents d JOIN pr USING (doc_id)
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    NaiveBayes
      .trainPredict(Tables.documents(s, dir), "doc_id", "text", "lang",
        NbVocabK, NbScale)
      .groupBy(col("label").as("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
  }

  val all: Seq[Query] = Seq(q135, q136)
}
