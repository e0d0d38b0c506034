package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Functions.tokens

/** Distributed multinomial Naive Bayes over whitespace tokens — the
  * fastText-style corpus classifier shape (train on labeled docs,
  * score every doc) used for quality/language filtering in
  * training-data pipelines (CCNet, RefinedWeb). Train and apply are
  * both single-pass distributed aggregations; the MODEL is the only
  * thing that moves (a broadcast), never the corpus.
  *
  * Determinism contract (what makes this oracle-checkable): all log
  * probabilities are quantized to an integer grid
  * (`round(ln(p) · scale)` as BIGINT), so per-doc scores are exact
  * integer sums — partitioning-order-independent — and the argmax is
  * total-ordered by (score, label).
  *
  * Scale design (100 TB):
  *  - Vocabulary is the global top-`vocabK` words by corpus frequency
  *    (via [[Ranking.withGlobalRank]] — range-partitioned distributed
  *    rank, no single-partition window); non-vocab tokens are ignored
  *    by contract. Model size is vocabK × #classes rows — broadcast.
  *  - Training = one (word, class) count aggregation, map-side
  *    combinable; one shuffle.
  *  - Scoring = one corpus scan, broadcast-hash join against the
  *    model grid, then a (doc, class) partial-aggregatable sum and a
  *    (doc) argmax. Prior rows enter the same sum via a per-doc class
  *    fan-out (#classes rows per doc), which also covers docs with
  *    zero vocab tokens — no special case.
  */
object NaiveBayes {

  /** Per-doc prediction frame `(id, label, pred)`: multinomial NB with
    * add-one smoothing over the top-`vocabK` vocabulary, log-space
    * scores on an integer grid of `scale`. */
  def trainPredict(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, vocabK: Int, scale: Long): DataFrame = {
    val t = docs.select(col(idCol).as("__id"), col(labelCol).as("__lab"),
      explode(tokens(col(textCol))).as("__word"))

    // global top-K vocabulary: (freq desc, word asc) — total order
    val freq = t.groupBy(col("__word")).agg(count(lit(1)).as("__cnt"))
    val vocab = Ranking
      .withGlobalRank(freq,
        struct((col("__cnt") * -1).as("nc"), col("__word").as("w")).asc,
        "__rk")
      .filter(col("__rk") <= vocabK)
      .select(col("__word"))
    val vocabSize = vocab.agg(count(lit(1)).as("__v"))

    val tv = t.join(broadcast(vocab), Seq("__word")) // vocab tokens only

    // class table: doc count (priors) + vocab-token count per class
    val classes = docs.groupBy(col(labelCol).as("__cls"))
      .agg(count(lit(1)).as("__ndocs"))
    val classTok = tv.groupBy(col("__lab").as("__cls"))
      .agg(count(lit(1)).as("__ntok"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val classTab = classes
      .join(classTok, Seq("__cls"), "left")
      .na.fill(0L, Seq("__ntok"))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(vocabSize))
      .select(col("__cls"), col("__ntok"), col("__v"),
        round(log(col("__ndocs").cast("double") / col("__n").cast("double"))
          * scale).cast("long").as("__prior"))

    // model grid: vocab × classes, add-one smoothed conditional lnq
    val wc = tv.groupBy(col("__word"), col("__lab").as("__cls"))
      .agg(count(lit(1)).as("__wc"))
    val grid = vocab.crossJoin(broadcast(classTab))
      .join(wc, Seq("__word", "__cls"), "left")
      .na.fill(0L, Seq("__wc"))
      .select(col("__word"), col("__cls"),
        round(log((col("__wc") + 1).cast("double") /
          (col("__ntok") + col("__v")).cast("double")) * scale)
          .cast("long").as("__lnq"))

    // per-(doc, class) scores: prior fan-out rows ∪ token-sum rows
    val priorRows = docs.select(col(idCol).as("__id"))
      .crossJoin(broadcast(classTab.select(col("__cls"), col("__prior"))))
      .select(col("__id"), col("__cls"), col("__prior").as("__s"))
    val tf = tv.groupBy(col("__id"), col("__word"))
      .agg(count(lit(1)).as("__tf"))
    val tokenRows = tf.join(broadcast(grid), Seq("__word"))
      .select(col("__id"), col("__cls"), (col("__tf") * col("__lnq")).as("__s"))
    val scores = priorRows.unionByName(tokenRows)
      .groupBy(col("__id"), col("__cls"))
      .agg(sum(col("__s")).as("__score"))

    // argmax with (score, class) total order
    val pred = scores.groupBy(col("__id"))
      .agg(max(struct(col("__score"), col("__cls"))).as("__m"))
      .select(col("__id"), col("__m.__cls").as("pred"))
    docs.select(col(idCol).as("__id"), col(labelCol).as("label"))
      .join(pred, Seq("__id"))
      .select(col("__id").as("id"), col("label"), col("pred"))
  }
}
