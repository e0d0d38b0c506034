package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions.{md5Long, tokens}
import graft.operators.Ranking
import graft.sources.Tables

/** Training-prep queries: the passes that turn a curated corpus into
  * model-ready data — span-level boilerplate removal with document
  * reconstruction, tokenizer-vocabulary coverage, and leakage-safe
  * train/val splitting. Like the rest of the LLM extension these are
  * specified by the task brief (the reference repo has no document
  * layer); every query has a full DuckDB oracle over the identical
  * pipeline. */
object Prep {

  import Llm.{DTokens, dHash64}

  // ------------------------------------------------------------ q90

  private val SpanW = 5 // words per (non-overlapping) span
  private val SpanDfMin = 2 // C4's rule: any span occurring in >1 doc

  /** Span-level boilerplate removal WITH document reconstruction (the
    * C4 dedup rule: drop any fixed-width word span that occurs in more
    * than one document). Docs are cut into non-overlapping
    * [[SpanW]]-word spans; a span whose text appears in ≥ [[SpanDfMin]]
    * distinct docs is removed everywhere; each doc is reassembled from
    * its surviving spans IN ORDER and fingerprinted. Reconstruction
    * collects only a doc's own spans (bounded by doc length, never by
    * corpus size) and sorts by span index — deterministic, so the md5
    * of every rebuilt doc hash-matches the oracle's `string_agg`. At
    * 100 TB: span rows are one Generate (no array shuffles), the df
    * count is map-side combinable, and the rebuild groups by doc_id —
    * the same partitioning the span explode already has. */
  val q90 = Query(
    "q90_span_boilerplate_removal",
    s"""WITH toks AS (
       |  SELECT doc_id, source, $DTokens AS w FROM documents),
       |sp AS (
       |  SELECT doc_id, source, unnest(
       |    [struct_pack(s := i,
       |       g := array_to_string(
       |              list_slice(w, i*$SpanW + 1, i*$SpanW + $SpanW), ' '),
       |       stok := len(list_slice(w, i*$SpanW + 1, i*$SpanW + $SpanW)))
       |     for i in range(0, (len(w) - 1) // $SpanW + 1)],
       |    recursive := true)
       |  FROM toks),
       |bp AS (
       |  SELECT g FROM (
       |    SELECT g, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY g)
       |  WHERE df >= $SpanDfMin)
       |SELECT doc_id, source,
       |  CAST(COUNT(*) AS BIGINT) AS n_spans,
       |  CAST(SUM(CASE WHEN bp.g IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_removed,
       |  CAST(SUM(CASE WHEN bp.g IS NULL THEN stok ELSE 0 END) AS BIGINT)
       |    AS clean_tokens,
       |  md5(COALESCE(string_agg(CASE WHEN bp.g IS NULL THEN sp.g END,
       |    ' ' ORDER BY s), '')) AS clean_md5
       |FROM sp LEFT JOIN bp ON sp.g = bp.g
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val sp = spanRows(Tables.documents(s, dir))
    val bp = sp.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= SpanDfMin)
      .select(col("g"), lit(1).as("__bp"))
    sp.join(bp, Seq("g"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__bp").isNull, 0).otherwise(1)).cast("long")
          .as("n_removed"),
        sum(when(col("__bp").isNull, col("stok")).otherwise(0))
          .cast("long").as("clean_tokens"),
        md5(array_join(
          transform(
            sort_array(collect_list(
              when(col("__bp").isNull, struct(col("s"), col("g"))))),
            x => x.getField("g")),
          " ")).as("clean_md5"))
  }

  /** Non-overlapping span rows `(doc_id, source, s, g, stok)` — one
    * Generate over the token array; the span text and its token count
    * are codegen row expressions (no HOF lambdas in the hot path). The
    * tail span may be shorter than [[SpanW]] (both engines clamp the
    * slice). */
  private def spanRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("source"), col("__w"),
        explode(sequence(lit(0L),
          floor((size(col("__w")) - 1) / lit(SpanW.toDouble)).cast("long")))
          .as("s"))
      .select(col("doc_id"), col("source"), col("s"),
        array_join(slice(col("__w"), (col("s") * SpanW + 1).cast("int"),
          lit(SpanW)), " ").as("g"),
        size(slice(col("__w"), (col("s") * SpanW + 1).cast("int"),
          lit(SpanW))).cast("long").as("stok"))

  // ------------------------------------------------------------ q91

  private val VocabK = 20 // top-K words form the "tokenizer" vocabulary

  /** Tokenizer-vocabulary coverage: build the top-[[VocabK]] word
    * vocabulary by corpus frequency (total order: count desc, word asc)
    * and report each language's out-of-vocabulary token rate — the
    * audit run before committing a tokenizer to a corpus. The global
    * top-K uses the distributed [[Ranking]] operator (no
    * single-partition window); the vocabulary is broadcast back, so the
    * corpus token stream is scanned once and never shuffled by word.
    * All rates are integer sums with one final division. */
  val q91 = Query(
    "q91_vocab_coverage",
    s"""WITH t AS (
       |  SELECT doc_id, lang, unnest($DTokens) AS word FROM documents),
       |c AS (SELECT word, COUNT(*) AS cnt FROM t GROUP BY 1),
       |v AS (
       |  SELECT word FROM (
       |    SELECT word, row_number() OVER (ORDER BY cnt DESC, word) AS rk
       |    FROM c)
       |  WHERE rk <= $VocabK)
       |SELECT lang,
       |  CAST(COUNT(*) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS oov_tokens,
       |  ROUND(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*), 6) AS oov_rate,
       |  CAST(COUNT(DISTINCT t.word) AS BIGINT) AS distinct_words,
       |  CAST(COUNT(DISTINCT CASE WHEN v.word IS NULL THEN t.word END)
       |    AS BIGINT) AS distinct_oov_words
       |FROM t LEFT JOIN v USING (word)
       |GROUP BY lang""".stripMargin) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
    val c = t.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // (−cnt, word) ascending ≡ (cnt desc, word asc); word uniqueness
    // makes the order total, so rank() ≡ row_number()
    val vocab = Ranking
      .withGlobalRank(c, struct((col("cnt") * -1).as("nc"),
        col("word").as("w")).asc, "rk")
      .filter(col("rk") <= VocabK)
      .select(col("word"), lit(1).as("__v"))
    t.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("total_tokens"),
        sum(when(col("__v").isNull, 1).otherwise(0)).cast("long")
          .as("oov_tokens"),
        round(sum(when(col("__v").isNull, 1).otherwise(0)).cast("double") /
          count(lit(1)), 6).as("oov_rate"),
        countDistinct(col("word")).as("distinct_words"),
        countDistinct(when(col("__v").isNull, col("word")))
          .as("distinct_oov_words"))
  }

  // ------------------------------------------------------------ q92

  private val TrainPct = 80 // hash mod 100 < 80 → train

  /** Deterministic md5 split of a key: 'train' / 'val'. */
  private def splitCol(key: Column): Column =
    when(md5Long(concat(lit("split:"), key.cast("string"))) % 100
      < TrainPct, "train").otherwise("val")

  private def dSplit(key: String): String =
    s"""CASE WHEN ${dHash64(s"'split:' || CAST($key AS VARCHAR)")} % 100
       | < $TrainPct THEN 'train' ELSE 'val' END""".stripMargin

  /** Leakage-safe train/val splitting: hashing DOC ids sends the two
    * halves of a near-dup pair to different splits (train/val
    * contamination); hashing the near-dup CLUSTER id keeps every pair
    * together by construction. Both methods are measured side by side —
    * doc counts, token counts, and the number of near-dup pairs that
    * cross the split (the leakage metric; 0 for by_cluster). Clusters
    * come from the SHARED minhash component labels (q48); docs outside
    * the pair graph are their own singleton cluster. At 100 TB the
    * split adds one broadcast-size join (cluster labels cover only
    * near-dup docs) on top of q56's pure hash — no new shuffle of the
    * corpus. */
  val q92 = Query(
    "q92_leakage_safe_split",
    s"""WITH cl AS (
       |${Llm.componentsOracle(Llm.minhashOracle)}),
       |a AS (
       |  SELECT d.doc_id, len($DTokens) AS tok,
       |    COALESCE(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN cl c ON d.doc_id = c.doc_id),
       |s AS (
       |  SELECT doc_id, tok,
       |    ${dSplit("doc_id")} AS sd,
       |    ${dSplit("cluster_id")} AS sc
       |  FROM a),
       |m AS (
       |  SELECT 'by_doc' AS method, doc_id, tok, sd AS split FROM s
       |  UNION ALL
       |  SELECT 'by_cluster', doc_id, tok, sc FROM s),
       |agg AS (
       |  SELECT method,
       |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_train_docs,
       |    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_val_docs,
       |    CAST(SUM(CASE WHEN split = 'train' THEN tok ELSE 0 END)
       |      AS BIGINT) AS n_train_tokens,
       |    CAST(SUM(CASE WHEN split = 'val' THEN tok ELSE 0 END) AS BIGINT)
       |      AS n_val_tokens
       |  FROM m GROUP BY method),
       |p AS (SELECT doc_a, doc_b FROM (
       |${Llm.minhashOracle}) mp),
       |leaks AS (
       |  SELECT 'by_doc' AS method,
       |    CAST(SUM(CASE WHEN sa.sd != sb.sd THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_cross_split_pairs
       |  FROM p JOIN s sa ON p.doc_a = sa.doc_id
       |         JOIN s sb ON p.doc_b = sb.doc_id
       |  UNION ALL
       |  SELECT 'by_cluster',
       |    CAST(SUM(CASE WHEN sa.sc != sb.sc THEN 1 ELSE 0 END) AS BIGINT)
       |  FROM p JOIN s sa ON p.doc_a = sa.doc_id
       |         JOIN s sb ON p.doc_b = sb.doc_id)
       |SELECT method, n_train_docs, n_val_docs, n_train_tokens,
       |  n_val_tokens, n_cross_split_pairs
       |FROM agg JOIN leaks USING (method)""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("tok"))
    val clusters = Llm.minhashClustersShared(s, dir)
    val assigned = docs
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tok"),
        splitCol(col("doc_id")).as("sd"),
        splitCol(coalesce(col("cluster_id"), col("doc_id"))).as("sc"))
    val m = assigned
      .select(lit("by_doc").as("method"), col("doc_id"), col("tok"),
        col("sd").as("split"))
      .unionByName(assigned.select(lit("by_cluster").as("method"),
        col("doc_id"), col("tok"), col("sc").as("split")))
    val agg = m.groupBy(col("method"))
      .agg(
        sum(when(col("split") === "train", 1).otherwise(0)).cast("long")
          .as("n_train_docs"),
        sum(when(col("split") === "val", 1).otherwise(0)).cast("long")
          .as("n_val_docs"),
        sum(when(col("split") === "train", col("tok")).otherwise(0))
          .cast("long").as("n_train_tokens"),
        sum(when(col("split") === "val", col("tok")).otherwise(0))
          .cast("long").as("n_val_tokens"))
    val splits = assigned.select(col("doc_id"), col("sd"), col("sc"))
    val pairs = Llm.minhashPairsShared(s, dir)
      .select(col("doc_a"), col("doc_b"))
      .join(splits.select(col("doc_id").as("doc_a"),
        col("sd").as("__sda"), col("sc").as("__sca")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"),
        col("sd").as("__sdb"), col("sc").as("__scb")), "doc_b")
    val leaks = pairs
      .select(lit("by_doc").as("method"),
        (col("__sda") =!= col("__sdb")).as("__x"))
      .unionByName(pairs.select(lit("by_cluster").as("method"),
        (col("__sca") =!= col("__scb")).as("__x")))
      .groupBy(col("method"))
      .agg(sum(when(col("__x"), 1).otherwise(0)).cast("long")
        .as("n_cross_split_pairs"))
    agg.join(leaks, "method")
      .select(col("method"), col("n_train_docs"), col("n_val_docs"),
        col("n_train_tokens"), col("n_val_tokens"),
        col("n_cross_split_pairs"))
  }

  val all: Seq[Query] = Seq(q90, q91, q92)
}
