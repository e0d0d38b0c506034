package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Ranking, Similarity, TextDedup}
import graft.sources.Tables

/** Corpus-curation queries beyond the dedup/similarity core
  * (`queries/Llm.scala`): repetition-based quality signals, semantic
  * (embedding-space) dedup, and boilerplate phrase mining — the
  * filtering passes a training-data pipeline runs between ingestion
  * and mixing. Like the rest of the LLM extension these are specified
  * by the task brief (the reference repo has no document layer). */
object Curation {

  import Llm.{DTokens, dHash64}

  // ------------------------------------------------------------ q78

  // a doc is "repetitious" when its most frequent word bigram exceeds
  // 1/10 of all bigram occurrences — integer cross-multiplication, so
  // the cut is exact in both engines
  private val RepTopFrac = 10

  /** Repetition quality signals (the Gopher/C4-family filters): per
    * language, the duplicate-token mass and the share of docs dominated
    * by one repeated bigram. All metrics are integer sums with one
    * final division; the per-doc "top bigram" needs only a per-doc
    * count aggregate (map-side combinable), never a window over the
    * corpus. Docs with fewer than 2 tokens carry no bigram and are
    * excluded in both engines. */
  val q78 = Query(
    "q78_repetition_signals",
    s"""WITH t AS (
       |  SELECT doc_id, lang, $DTokens AS w FROM documents),
       |d AS (
       |  SELECT doc_id, lang, len(w) AS nt, len(list_distinct(w)) AS ndt,
       |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bg
       |  FROM t WHERE len(w) >= 2),
       |e AS (SELECT doc_id, unnest(bg) AS g FROM d),
       |c AS (SELECT doc_id, g, COUNT(*) AS c FROM e GROUP BY 1, 2),
       |m AS (
       |  SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM c GROUP BY 1)
       |SELECT lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
       |  CAST(SUM(ndt) AS BIGINT) AS total_distinct_tokens,
       |  ROUND(1.0 - CAST(SUM(ndt) AS DOUBLE) / SUM(nt), 6)
       |    AS dup_token_ratio,
       |  CAST(SUM(CASE WHEN mx * $RepTopFrac > tot THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_repetitious,
       |  ROUND(CAST(SUM(mx) AS DOUBLE) / SUM(tot), 6)
       |    AS avg_top_bigram_share
       |FROM d JOIN m USING (doc_id)
       |GROUP BY lang""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val base = docs
      .select(col("doc_id"), col("lang"),
        graft.functions.Functions.tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("lang"), size(col("__w")).as("nt"),
        size(array_distinct(col("__w"))).as("ndt"))
      .filter(col("nt") >= 2)
    val top = TextDedup
      .docShingleRows(docs, "doc_id", "text", 2, distinctGrams = false)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
    base.join(top, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).cast("long").as("total_tokens"),
        sum(col("ndt")).cast("long").as("total_distinct_tokens"),
        round(lit(1.0) - sum(col("ndt")).cast("double") / sum(col("nt")),
          6).as("dup_token_ratio"),
        sum(when(col("mx") * RepTopFrac > col("tot"), 1).otherwise(0))
          .cast("long").as("n_repetitious"),
        round(sum(col("mx")).cast("double") / sum(col("tot")), 6)
          .as("avg_top_bigram_share"))
  }

  // ------------------------------------------------------------ q79

  /** Semantic dedup (the SemDeDup shape): connected components over the
    * EMBEDDING near-dup pair graph (q45's hyperplane-bucketed cosine
    * pairs), each cluster keeping its min-id representative, summarized
    * per embedding label. The vector-space twin of q54's text-space
    * removal: pair generation is bucket-bounded, clustering touches
    * only the near-dup graph, removal is one join against the corpus. */
  val q79 = Query(
    "q79_semantic_dedup",
    s"""WITH clusters AS (
       |${Llm.componentsOracle(
             s"SELECT id_a AS doc_a, id_b AS doc_b FROM (\n" +
               s"${Llm.embNearDupOracle})")}),
       |removed AS (
       |  SELECT doc_id FROM clusters WHERE doc_id != cluster_id)
       |SELECT label,
       |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_removed
       |FROM embeddings v LEFT JOIN removed r ON v.vec_id = r.doc_id
       |GROUP BY label""".stripMargin) { (s, dir) =>
    val v = Tables.embeddings(s, dir)
    val pairs = Similarity.cosineNearDupPairs(v, "vec_id", "embedding",
        Llm.NdPlanes, Llm.NdDims, Llm.NdThreshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val removed = TextDedup.dupClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"), lit(1).as("__rm"))
    v.join(removed, Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("__rm").isNull, 1).otherwise(0)).cast("long")
          .as("n_kept"),
        sum(when(col("__rm").isNull, 0).otherwise(1)).cast("long")
          .as("n_removed"))
  }

  // ------------------------------------------------------------ q80

  private val BpN = 3
  private val BpTopK = 20

  /** Boilerplate phrase mining (the C4-style boilerplate pass): the
    * top-20 word trigrams by DOCUMENT frequency (distinct grams per
    * doc, so a doc repeating a phrase counts once). Ordering is total
    * (df desc, gram asc) so the cut is deterministic; the global rank
    * uses the distributed Ranking operator (no single-partition
    * window), and only `k` rows ever reach the driver-side limit. */
  val q80 = Query(
    "q80_boilerplate_grams",
    s"""WITH toks AS (
       |  SELECT doc_id, $DTokens AS w FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest([array_to_string(list_slice(w, i, i + ${BpN - 1}), ' ')
       |            for i in range(1, len(w) - ${BpN - 2})]) AS g
       |  FROM toks WHERE len(w) >= $BpN),
       |df AS (
       |  SELECT g AS gram, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM sh GROUP BY g),
       |r AS (
       |  SELECT gram, df, row_number() OVER (ORDER BY df DESC, gram)
       |    AS rk
       |  FROM df)
       |SELECT CAST(rk AS BIGINT) AS rank, gram, df
       |FROM r WHERE rk <= $BpTopK""".stripMargin) { (s, dir) =>
    val df = TextDedup
      .docShingleRows(Tables.documents(s, dir), "doc_id", "text", BpN)
      .groupBy(col("g").as("gram"))
      .agg(count(lit(1)).as("df"))
    // (−df, gram) ascending ≡ (df desc, gram asc); gram uniqueness makes
    // the order total, so rank() ≡ row_number() with no ties to share
    val order = struct((col("df") * -1).as("nd"), col("gram").as("g")).asc
    Ranking.withGlobalRank(df, order, "rank")
      .filter(col("rank") <= BpTopK)
      .select(col("rank"), col("gram"), col("df"))
  }

  // ------------------------------------------------------------ q82

  private val ShardBudget = 4096L

  /** Token-budget shard packing — the training-shard writer's
    * assignment step: docs in doc_id order are packed greedily into
    * shards of ~[[ShardBudget]] whitespace tokens (a doc starts in the
    * shard its exclusive prefix-sum lands in, so a doc may straddle its
    * shard's tail — the standard greedy contract). The prefix sum is
    * `Ranking.withRunningTotal`: range-partition + per-partition sums +
    * broadcast offsets — NO unpartitioned window, so packing a 100 TB
    * corpus never collapses to one task. */
  val q82 = Query(
    "q82_shard_packing",
    s"""WITH t AS (
       |  SELECT doc_id, len($DTokens) AS tok FROM documents),
       |p AS (
       |  SELECT doc_id, tok,
       |    COALESCE(SUM(tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
       |  FROM t)
       |SELECT CAST(FLOOR(prev / $ShardBudget.0) AS BIGINT) AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS shard_tokens,
       |  MIN(doc_id) AS first_doc,
       |  MAX(doc_id) AS last_doc
       |FROM p GROUP BY shard""".stripMargin) { (s, dir) =>
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(graft.functions.Functions.tokens(col("text"))).cast("long")
          .as("tok"))
    Ranking.withRunningTotal(toks, col("doc_id").asc, col("tok"), "prev")
      .groupBy(floor(col("prev") / lit(ShardBudget.toDouble)).cast("long")
        .as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  // ------------------------------------------------------------ q83

  /** Cross-source near-dup overlap matrix: how much does each pair of
    * ingestion sources duplicate each other? Composes the SHARED
    * verified minhash pair graph (built once for q23/q48/q54) with the
    * doc→source dimension; sources are unordered (least/greatest), so
    * (a,b) and (b,a) fold together. Only min/max of the (already
    * 6-rounded) jaccard are reported — order-independent aggregates,
    * never a fold-order-dependent double sum. */
  val q83 = Query(
    "q83_cross_source_overlap",
    s"""WITH mp AS (
       |${Llm.minhashOracle})
       |SELECT least(da.source, db.source) AS source_a,
       |  greatest(da.source, db.source) AS source_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  ROUND(MIN(jaccard), 6) AS min_jaccard,
       |  ROUND(MAX(jaccard), 6) AS max_jaccard
       |FROM mp
       |JOIN documents da ON mp.doc_a = da.doc_id
       |JOIN documents db ON mp.doc_b = db.doc_id
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    Llm.minhashPairsShared(s, dir)
      .join(d.select(col("doc_id").as("doc_a"), col("source").as("__sa")),
        "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("source").as("__sb")),
        "doc_b")
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(min(col("jaccard")), 6).as("min_jaccard"),
        round(max(col("jaccard")), 6).as("max_jaccard"))
  }

  // ------------------------------------------------------------ q84

  private val QBuckets = 1000
  private val QDecile = 10

  /** DuckDB CTE block: per-source score histogram + bottom-decile
    * cutoff bucket from a scored relation `srel`(source, score, ...).
    * Shared by q84 (summary) and q85 (per-doc manifest). */
  private def dCutCtes(srel: String): String =
    s"""h AS (
       |  SELECT source, CAST(FLOOR(score * $QBuckets) AS BIGINT) AS b,
       |    COUNT(*) AS c
       |  FROM $srel GROUP BY 1, 2),
       |tot AS (SELECT source, SUM(c) AS n FROM h GROUP BY 1),
       |cum AS (
       |  SELECT source, b, c,
       |    SUM(c) OVER (PARTITION BY source ORDER BY b) AS cc
       |  FROM h),
       |cut AS (
       |  SELECT cum.source, MIN(b) AS cutoff_bucket
       |  FROM cum JOIN tot USING (source)
       |  WHERE cc * $QDecile >= n
       |  GROUP BY 1)""".stripMargin

  /** Spark twin of the histogram CTE: (source, b, c). Extra columns in
    * `scored` are ignored by the grouping. */
  private def histFrame(
      scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    scored.groupBy(col("source"),
        floor(col("score") * QBuckets).cast("long").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Spark twin of the tot/cum/cut CTEs: (source, cutoff_bucket). The
    * window runs over aggregated bucket rows only (≤[[QBuckets]]+1 per
    * source), never over docs. */
  private def cutFrame(
      h: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tot = h.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("b"))
    h.withColumn("cc", sum(col("c")).over(wc))
      .join(tot, "source")
      .filter(col("cc") * QDecile >= col("n"))
      .groupBy(col("source")).agg(min(col("b")).as("cutoff_bucket"))
  }

  /** Per-source ADAPTIVE quality filtering: drop each source's bottom
    * decile by quality score, with the cut found on a bucketed score
    * histogram (floor(score*1000)) instead of a per-source sort — the
    * 100 TB-safe exact-quantile pattern. The histogram is map-side
    * combinable; the cumulative window runs over ≤1001 rows PER SOURCE
    * (aggregated buckets, not docs); the cutoff set is broadcast back.
    * Integer cross-multiplication (cc*10 >= n) keeps the decile test
    * exact in both engines. */
  val q84 = Query(
    "q84_adaptive_quality_filter",
    s"""WITH f AS (
       |  ${Llm.dQualityFeatures("source")}),
       |sc AS (
       |  SELECT source,
       |    ${Llm.DScore} AS score
       |  FROM f WHERE tok >= 1),
       |${dCutCtes("sc")}
       |SELECT h.source,
       |  CAST(SUM(c) AS BIGINT) AS n_docs,
       |  cutoff_bucket,
       |  CAST(SUM(CASE WHEN b >= cutoff_bucket THEN c ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN b < cutoff_bucket THEN c ELSE 0 END) AS BIGINT)
       |    AS n_dropped
       |FROM h JOIN cut ON h.source = cut.source
       |GROUP BY 1, 3""".stripMargin) { (s, dir) =>
    val sc = Llm.qualityFeatures(Tables.documents(s, dir), "source")
      .filter(col("tok") >= 1)
      .select(col("source"), Llm.qualityScoreCol.as("score"))
    val h = histFrame(sc)
    val cut = cutFrame(h)
    h.join(broadcast(cut), "source")
      .groupBy(col("source"), col("cutoff_bucket"))
      .agg(sum(col("c")).cast("long").as("n_docs"),
        sum(when(col("b") >= col("cutoff_bucket"), col("c")).otherwise(0))
          .cast("long").as("n_kept"),
        sum(when(col("b") < col("cutoff_bucket"), col("c")).otherwise(0))
          .cast("long").as("n_dropped"))
      .select(col("source"), col("n_docs"), col("cutoff_bucket"),
        col("n_kept"), col("n_dropped"))
  }

  // ------------------------------------------------------------ q85

  /** The curation MANIFEST — the end product a training-data pipeline
    * actually ships: one decision per document with a fixed precedence
    * (exact_dup > near_dup > contaminated > low_quality > keep),
    * summarized per source. Every signal is a composed, already-proven
    * sub-pipeline: normalized-hash exact dedup (q22's normalization),
    * the SHARED verified minhash pair graph's components (q23/q48),
    * broadcast-probe decontamination (q55), and the per-source
    * histogram-decile quality cut (q84). Each removal set is keyed by
    * doc_id with at most one row per doc, so the left joins never fan
    * out; at 100 TB the manifest is four bounded joins against small
    * flag sets, not a re-scan per signal. */
  val q85 = Query(
    "q85_curation_manifest",
    s"""WITH nh AS (
       |  SELECT doc_id,
       |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
       |  FROM documents),
       |ed AS (
       |  SELECT nh.doc_id FROM nh
       |  JOIN (SELECT h, MIN(doc_id) AS m, COUNT(*) AS c
       |        FROM nh GROUP BY h) g USING (h)
       |  WHERE g.c > 1 AND nh.doc_id != g.m),
       |nd AS (
       |  SELECT doc_id FROM (
       |${Llm.componentsOracle(Llm.minhashOracle)}) cmp
       |  WHERE doc_id != cluster_id),
       |ct AS (
       |  SELECT DISTINCT doc_id FROM (
       |${Llm.dContamPairs}) cp),
       |f AS (
       |  ${Llm.dQualityFeatures("doc_id, source")}),
       |sc AS (
       |  SELECT doc_id, source,
       |    ${Llm.DScore} AS score
       |  FROM f WHERE tok >= 1),
       |${dCutCtes("sc")},
       |lq AS (
       |  SELECT sb.doc_id FROM (
       |    SELECT doc_id, source,
       |      CAST(FLOOR(score * $QBuckets) AS BIGINT) AS b
       |    FROM sc) sb
       |  JOIN cut USING (source) WHERE sb.b < cut.cutoff_bucket)
       |SELECT f.source,
       |  CASE WHEN ed.doc_id IS NOT NULL THEN 'exact_dup'
       |       WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
       |       WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
       |       WHEN lq.doc_id IS NOT NULL THEN 'low_quality'
       |       ELSE 'keep' END AS decision,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS n_tokens
       |FROM f
       |LEFT JOIN ed ON f.doc_id = ed.doc_id
       |LEFT JOIN nd ON f.doc_id = nd.doc_id
       |LEFT JOIN ct ON f.doc_id = ct.doc_id
       |LEFT JOIN lq ON f.doc_id = lq.doc_id
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val feats = Llm.qualityFeatures(docs, "doc_id", "source")
    val scored = feats.filter(col("tok") >= 1)
      .select(col("doc_id"), col("source"),
        Llm.qualityScoreCol.as("score"))
    val cut = cutFrame(histFrame(scored))
    val lq = scored
      .select(col("doc_id"), col("source"),
        floor(col("score") * QBuckets).cast("long").as("b"))
      .join(broadcast(cut), "source")
      .filter(col("b") < col("cutoff_bucket"))
      .select(col("doc_id"))
    val ed = TextDedup.exactDupLosers(docs, "doc_id", "text")
    val nd = Llm.minhashClustersShared(s, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val ct = Llm.contamPairsShared(s, dir)
      .select(col("doc_id")).distinct()
    def flag(f: org.apache.spark.sql.DataFrame, c: String) =
      f.withColumn(c, lit(1))
    feats.select(col("doc_id"), col("source"), col("tok"))
      .join(flag(ed, "__ed"), Seq("doc_id"), "left")
      .join(flag(nd, "__nd"), Seq("doc_id"), "left")
      .join(flag(ct, "__ct"), Seq("doc_id"), "left")
      .join(flag(lq, "__lq"), Seq("doc_id"), "left")
      .withColumn("decision",
        when(col("__ed").isNotNull, lit("exact_dup"))
          .when(col("__nd").isNotNull, lit("near_dup"))
          .when(col("__ct").isNotNull, lit("contaminated"))
          .when(col("__lq").isNotNull, lit("low_quality"))
          .otherwise(lit("keep")))
      .groupBy(col("source"), col("decision"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"))
  }

  // ------------------------------------------------------------ q89

  private val MixBudget = 1000000L // target corpus size in ws tokens

  /** Temperature-weighted mixture sampling (the `n^α` reweighting the
    * data-mixture literature uses to up-sample small sources; α = 0.5
    * here, i.e. sqrt): per-source token counts → weight
    * `√n_i / Σ √n_j` → integer token target for a fixed budget. The
    * denominator is a DOUBLE sum over sources, which a plain aggregate
    * would make partitioning-order-dependent — so both engines fold the
    * SAME sorted list (collect per-source counts, sort by source,
    * strict left fold), the deterministic-reduction pattern for
    * small-group double sums. The mixture table is inherently tiny
    * (one row per source), so the single-row collect is bounded by
    * contract, not by luck. */
  val q89 = Query(
    "q89_temperature_mix",
    s"""WITH c AS (
       |  SELECT source, CAST(SUM(len($DTokens)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |d AS (
       |  SELECT list_reduce(
       |    [sqrt(x.n_tokens::DOUBLE) for x in
       |     list_sort(list(struct_pack(source := source,
       |                                n_tokens := n_tokens)))],
       |    (a, b) -> a + b) AS denom
       |  FROM c)
       |SELECT source, n_tokens,
       |  ROUND(sqrt(n_tokens::DOUBLE) / denom, 6) AS weight,
       |  CAST(FLOOR(sqrt(n_tokens::DOUBLE) / denom * $MixBudget.0)
       |    AS BIGINT) AS target_tokens
       |FROM c, d""".stripMargin) { (s, dir) =>
    val counts = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(graft.functions.Functions.tokens(col("text"))))
        .cast("long").as("n_tokens"))
    val denom = counts.agg(
      aggregate(
        sort_array(collect_list(struct(col("source"), col("n_tokens")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_tokens").cast("double")))
        .as("denom"))
    counts.crossJoin(broadcast(denom))
      .select(col("source"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")) / col("denom"), 6)
          .as("weight"),
        floor(sqrt(col("n_tokens").cast("double")) / col("denom") *
          lit(MixBudget.toDouble)).cast("long").as("target_tokens"))
  }

  // ------------------------------------------------------------ q102

  // RE2-safe patterns (no lookarounds, no \d shorthand inside classes)
  // so Spark's Java regex and DuckDB's RE2 match identically
  private val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction — the scrub counterpart to q20's detection: every
    * email and phone-shaped span is replaced with a fixed placeholder
    * token, reported per source with match counts, the net character
    * delta, and a `bit_xor` checksum of every redacted document (so
    * the oracle verifies the REDACTED TEXT itself, not just counts).
    * The synthetic corpus carries no organic PII, so both pipelines
    * first INJECT deterministic email/phone spans into a keyed subset
    * of docs (doc_id mod 7 / mod 11) — the redaction then has real
    * work, and the cross-engine checksum proves the match boundaries
    * and replacements agree byte for byte. Pure per-row regex work
    * inside one scan — codegen'd, no joins, no shuffle beyond the
    * rollup; exactly the shape that sustains a 100 TB scrub pass. */
  val q102 = Query(
    "q102_pii_redaction",
    s"""WITH aug AS (
       |  SELECT doc_id, source,
       |    text ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' ||
       |      CAST(doc_id AS VARCHAR) || '@mail.example.com now'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0
       |      THEN ' call +44 20 7946 0958 today' ELSE '' END AS text
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, text,
       |    len(regexp_extract_all(text,
       |      '${graft.functions.Functions.EmailPattern}')) AS n_email,
       |    regexp_replace(
       |      regexp_replace(text,
       |        '${graft.functions.Functions.EmailPattern}', '<EMAIL>', 'g'),
       |      '$PhonePattern', '<PHONE>', 'g') AS red,
       |    len(regexp_extract_all(text, '$PhonePattern')) AS n_phone
       |  FROM aug)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_docs_with_pii,
       |  CAST(SUM(n_email) AS BIGINT) AS n_emails,
       |  CAST(SUM(n_phone) AS BIGINT) AS n_phones,
       |  CAST(SUM(length(text) - length(red)) AS BIGINT) AS chars_delta,
       |  CAST(bit_xor(${dHash64("red")}) AS BIGINT) AS redacted_checksum
       |FROM r GROUP BY source""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.{md5Long, EmailPattern}
    val aug = Tables.documents(s, dir)
      .select(col("source"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example.com now"))).otherwise(""),
          when(pmod(col("doc_id"), lit(11)) === 0,
            lit(" call +44 20 7946 0958 today")).otherwise(""))
          .as("text"))
    val r = aug
      .select(col("source"), col("text"),
        size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0)))
          .as("n_email"),
        size(regexp_extract_all(col("text"), lit(PhonePattern), lit(0)))
          .as("n_phone"),
        regexp_replace(
          regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>").as("red"))
      .withColumn("__h", md5Long(col("red")))
    r.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_phone") > 0, 1).otherwise(0))
          .cast("long").as("n_docs_with_pii"),
        sum(col("n_email")).cast("long").as("n_emails"),
        sum(col("n_phone")).cast("long").as("n_phones"),
        sum(length(col("text")) - length(col("red"))).cast("long")
          .as("chars_delta"),
        expr("bit_xor(__h)").cast("long").as("redacted_checksum"))
  }

  // ------------------------------------------------------------ q155

  private val KAnonK = 20

  /** k-anonymity audit (privacy compliance beside q102's PII
    * redaction): a released row is safe only if its quasi-identifier
    * combination is shared by ≥ k rows. Audited at two generalization
    * levels — (segment, nation) and the coarser (segment, region) —
    * showing how generalizing the hierarchy recovers suppressed rows.
    * Pure two-level aggregation (rows → QI groups → audit summary);
    * the dimension joins are broadcasts; nothing is row-order
    * dependent. */
  val q155 = Query(
    "q155_k_anonymity",
    s"""WITH c AS (
       |  SELECT c_mktsegment, n_name, r_name
       |  FROM customer
       |  JOIN nation ON n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n_regionkey),
       |lv AS (
       |  SELECT 'nation' AS level, c_mktsegment AS qi1, n_name AS qi2,
       |    COUNT(*) AS n FROM c GROUP BY 1, 2, 3
       |  UNION ALL
       |  SELECT 'region' AS level, c_mktsegment AS qi1, r_name AS qi2,
       |    COUNT(*) AS n FROM c GROUP BY 1, 2, 3)
       |SELECT level,
       |  CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(SUM(CASE WHEN n < $KAnonK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_groups_suppressed,
       |  CAST(SUM(CASE WHEN n < $KAnonK THEN n ELSE 0 END) AS BIGINT)
       |    AS n_rows_suppressed,
       |  CAST(SUM(CASE WHEN n >= $KAnonK THEN n ELSE 0 END) AS BIGINT)
       |    AS n_rows_safe
       |FROM lv GROUP BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("n_nationkey") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("c_mktsegment"), col("n_name"), col("r_name"))
    def level(name: String, qi2: String) = c
      .groupBy(col("c_mktsegment").as("qi1"), col(qi2).as("qi2"))
      .agg(count(lit(1)).as("n"))
      .select(lit(name).as("level"), col("n"))
    level("nation", "n_name").unionAll(level("region", "r_name"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < KAnonK, 1L).otherwise(0L))
          .as("n_groups_suppressed"),
        sum(when(col("n") < KAnonK, col("n")).otherwise(0L))
          .as("n_rows_suppressed"),
        sum(when(col("n") >= KAnonK, col("n")).otherwise(0L))
          .as("n_rows_safe"))
  }

  // ------------------------------------------------------------ q173

  /** Source-priority survivorship for near-dup clusters: within each
    * minhash component, keep the doc from the LEXICOGRAPHICALLY first
    * source (ingestion-trust order), tie-broken by doc_id — the text
    * analogue of q150's golden-record rule, riding the SHARED
    * component labels (zero extra pipeline builds in a sweep). The
    * winner per cluster is one `min(struct(source, doc_id))`
    * aggregate — map-side combinable, no window. Output: the
    * per-source keep/drop ledger. */
  val q173 = Query(
    "q173_survivorship_dedup",
    s"""WITH cl AS (
       |${Llm.componentsOracle(Llm.minhashOracle)}),
       |j AS (
       |  SELECT d.doc_id, d.source, cl.cluster_id
       |  FROM documents d JOIN cl USING (doc_id)),
       |r AS (
       |  SELECT doc_id, source, row_number() OVER (
       |    PARTITION BY cluster_id ORDER BY source, doc_id) AS rn
       |  FROM j),
       |drops AS (
       |  SELECT source, COUNT(*) AS n_dropped FROM r
       |  WHERE rn > 1 GROUP BY 1),
       |tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT tot.source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(COALESCE(n_dropped, 0) AS BIGINT) AS n_dropped,
       |  CAST(n_docs - COALESCE(n_dropped, 0) AS BIGINT) AS n_kept
       |FROM tot LEFT JOIN drops USING (source)""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val labeled = docs.select(col("doc_id"), col("source"))
      .join(Llm.minhashClustersShared(s, dir), Seq("doc_id"))
    val winners = labeled.groupBy(col("cluster_id"))
      .agg(min(struct(col("source"), col("doc_id"))).as("w"))
    val drops = labeled.join(broadcast(winners), Seq("cluster_id"))
      .filter(struct(col("source"), col("doc_id")) =!= col("w"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_dropped"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(drops, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_docs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
  }

  // ------------------------------------------------------------ q174

  private val CanaryOffset = 1000000000L

  /** Canary end-to-end decontamination proof — pipeline VALIDATION,
    * not another detector: every benchmark probe is injected verbatim
    * into the corpus as a synthetic canary doc, the q55 contamination
    * pass runs over the augmented corpus, and the output certifies
    * that EVERY detectable canary (probe with ≥ [[Llm.DcMinShared]]
    * distinct word-trigrams — a shorter probe has nothing to share)
    * was flagged against exactly its own probe. The oracle computes
    * the detectability bound independently; `all_detected` is the
    * proof bit. */
  val q174 = Query(
    "q174_canary_decontamination",
    s"""WITH pr AS (
       |  SELECT doc_id, $DTokens AS w FROM documents
       |  WHERE doc_id % ${Llm.DcProbeEvery} = 0),
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= ${Llm.DcN}
       |      THEN len(list_distinct(
       |        [array_to_string(list_slice(w, i, i + ${Llm.DcN - 1}), ' ')
       |         for i in range(1, len(w) - ${Llm.DcN - 2})]))
       |      ELSE 0 END AS n_grams
       |  FROM pr)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_canaries,
       |  CAST(SUM(CASE WHEN n_grams >= ${Llm.DcMinShared} THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_detectable,
       |  CAST(SUM(CASE WHEN n_grams >= ${Llm.DcMinShared} THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_detected,
       |  TRUE AS all_detected
       |FROM g""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val probes = docs.filter(col("doc_id") % Llm.DcProbeEvery === 0)
    val canaries = probes.select(
      (col("doc_id") + CanaryOffset).as("doc_id"), col("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(canaries)
    val pairs = TextDedup.contaminationPairs(corpus, "doc_id", "text",
      probes, "doc_id", "text", Llm.DcN, Llm.DcMinShared)
    val canaryHits = pairs
      .filter(col("doc_id") >= CanaryOffset &&
        col("doc_id") - CanaryOffset === col("probe_id"))
      .agg(countDistinct(col("doc_id")).as("n_detected"))
    probes.agg(count(lit(1)).as("n_canaries"),
        sum(when(TextDedup.distinctGramCount(col("text"), Llm.DcN) >=
          Llm.DcMinShared, 1L).otherwise(0L)).as("n_detectable"))
      .crossJoin(broadcast(canaryHits))
      .select(col("n_canaries"), col("n_detectable"), col("n_detected"),
        (col("n_detectable") === col("n_detected")).as("all_detected"))
  }

  // ------------------------------------------------------------ q175

  /** Segment width (whitespace tokens) for exact-substring dedup. */
  private val SegW = 10

  /** Exact SEGMENT-level dedup (the Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better" shape, at fixed
    * granularity): every doc is cut into non-overlapping [[SegW]]-word
    * segments, a segment is duplicated when its text occurs anywhere
    * else in the corpus, and the per-source report gives the
    * duplicated-segment mass a substring-level scrub would remove —
    * strictly finer than q22's whole-doc hash and cheaper than q23's
    * similarity pass.
    *
    * Scale: segments never shuffle as text — each segment becomes one
    * portable 60-bit md5 immediately after the row-local slice, the
    * frequency table is a map-combinable count on that hash, and the
    * flag-back join is hash×hash. One corpus scan, two bounded
    * shuffles; at 100 TB the segment-hash table is the only state. */
  val q175 = Query(
    "q175_segment_dedup",
    s"""WITH t AS (
       |  SELECT doc_id, source, $DTokens AS w FROM documents),
       |s AS (
       |  SELECT doc_id, source,
       |    [array_to_string(list_slice(w, 1 + k*$SegW, (k+1)*$SegW), ' ')
       |     for k in range(0, len(w) // $SegW)] AS segs
       |  FROM t),
       |e AS (SELECT doc_id, source, unnest(segs) AS seg FROM s),
       |hh AS (
       |  SELECT doc_id, source, ${dHash64("seg")} AS h FROM e),
       |f AS (SELECT h, COUNT(*) AS freq FROM hh GROUP BY 1),
       |d AS (
       |  SELECT hh.source, COUNT(*) AS n_seg,
       |    SUM(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS n_dup
       |  FROM hh JOIN f USING (h) GROUP BY 1),
       |tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT tot.source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(COALESCE(n_seg, 0) AS BIGINT) AS n_segments,
       |  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_segments,
       |  CAST(CASE WHEN COALESCE(n_seg, 0) > 0
       |    THEN (1000000 * COALESCE(n_dup, 0)) // n_seg
       |    ELSE 0 END AS BIGINT) AS dup_ppm
       |FROM tot LEFT JOIN d ON tot.source = d.source""".stripMargin) {
    (s, dir) =>
    import graft.functions.Functions.{md5Long, tokens}
    val docs = Tables.documents(s, dir)
    val segRows = docs
      .select(col("source"), tokens(col("text")).as("w"))
      .withColumn("nseg", floor(size(col("w")) / SegW).cast("int"))
      .filter(col("nseg") >= 1)
      .select(col("source"),
        explode(sequence(lit(0), col("nseg") - 1)).as("k"), col("w"))
      .select(col("source"),
        md5Long(array_join(
          slice(col("w"), col("k") * SegW + 1, lit(SegW)), " ")).as("h"))
    val freq = segRows.groupBy(col("h")).agg(count(lit(1)).as("freq"))
    val d = segRows.join(freq, "h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seg"),
        sum(when(col("freq") > 1, 1L).otherwise(0L)).as("n_dup"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(d, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_seg"), lit(0L)).as("n_segments"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_segments"))
      .withColumn("dup_ppm",
        when(col("n_segments") > 0,
          expr("(1000000 * n_dup_segments) div n_segments"))
          .otherwise(0L))
  }

  // ------------------------------------------------------------ q248

  /** Sliding-window width (whitespace tokens) for span-level scrub. */
  private val SpanW = 10

  /** Substring-level duplicated-SPAN scrub — the full Lee et al. 2021
    * semantics q175's fixed tiling approximates: every OVERLAPPING
    * [[SpanW]]-word window is hashed, a window occurring ≥ 2 times
    * anywhere in the corpus (other docs or the same doc) is
    * duplicated, a token position is removed when ANY duplicated
    * window covers it, and every document is REBUILT from its
    * surviving tokens. A span of any length ≥ [[SpanW]] that repeats
    * is covered exactly (each of its windows repeats), which the
    * non-overlapping tiling misses at segment boundaries. The
    * per-source report carries the scrub mass AND a `bit_xor`
    * checksum over every rebuilt document, so the reconstruction
    * itself — not just the counts — is value-checked cross-engine.
    *
    * Scale: corpus text never shuffles — windows collapse to 60-bit
    * hashes row-locally, the frequency table is one map-combinable
    * count, the flag-back join moves only (doc_id, i, h) longs, and
    * the duplicated window STARTS come back to each doc row as one
    * sorted array (bounded by the doc's own token count — the
    * per-doc row-local contract) where coverage + rebuild run as
    * array HOFs inside codegen. */
  val q248 = Query(
    "q248_span_scrub",
    s"""WITH t AS (
       |  SELECT doc_id, source, $DTokens AS w FROM documents),
       |s AS (
       |  SELECT doc_id, source, w,
       |    [array_to_string(list_slice(w, i + 1, i + $SpanW), ' ')
       |     for i in range(0, len(w) - $SpanW + 1)] AS segs
       |  FROM t WHERE len(w) >= $SpanW),
       |e AS (
       |  SELECT doc_id, source,
       |    unnest(range(0, len(w) - $SpanW + 1)) AS i,
       |    unnest(segs) AS seg
       |  FROM s),
       |hh AS (
       |  SELECT doc_id, source, i, ${dHash64("seg")} AS h FROM e),
       |f AS (SELECT h, COUNT(*) AS freq FROM hh GROUP BY 1),
       |dupw AS (
       |  SELECT doc_id, source, i FROM hh JOIN f USING (h)
       |  WHERE freq > 1),
       |cov AS (
       |  SELECT DISTINCT doc_id, source, i + d AS p
       |  FROM dupw CROSS JOIN (SELECT unnest(range(0, $SpanW)) AS d)),
       |tokp AS (
       |  SELECT doc_id, unnest(w) AS tok,
       |    unnest(range(0, len(w))) AS p
       |  FROM t),
       |kept AS (
       |  SELECT tokp.doc_id, tokp.p, tokp.tok
       |  FROM tokp LEFT JOIN cov
       |    ON tokp.doc_id = cov.doc_id AND tokp.p = cov.p
       |  WHERE cov.p IS NULL),
       |reb AS (
       |  SELECT doc_id,
       |    array_to_string(list(tok ORDER BY p), ' ') AS txt
       |  FROM kept GROUP BY 1),
       |chk AS (
       |  SELECT t.doc_id, t.source, len(w) AS n_tok,
       |    CASE WHEN len(w) >= $SpanW THEN len(w) - $SpanW + 1
       |      ELSE 0 END AS n_win,
       |    ${dHash64("COALESCE(reb.txt, '')")} AS rh
       |  FROM t LEFT JOIN reb USING (doc_id)),
       |a1 AS (
       |  SELECT source, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens,
       |    SUM(n_win) AS n_windows, bit_xor(rh) AS scrub_checksum
       |  FROM chk GROUP BY 1),
       |a2 AS (
       |  SELECT source, COUNT(*) AS n_dup_windows,
       |    COUNT(DISTINCT doc_id) AS docs_affected
       |  FROM dupw GROUP BY 1),
       |a3 AS (
       |  SELECT source, COUNT(*) AS tokens_removed FROM cov GROUP BY 1)
       |SELECT a1.source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_windows AS BIGINT) AS n_windows,
       |  CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(COALESCE(docs_affected, 0) AS BIGINT) AS docs_affected,
       |  CAST(COALESCE(tokens_removed, 0) AS BIGINT) AS tokens_removed,
       |  CAST(CASE WHEN n_tokens > 0
       |    THEN (1000000 * COALESCE(tokens_removed, 0)) // n_tokens
       |    ELSE 0 END AS BIGINT) AS removed_ppm,
       |  CAST(scrub_checksum AS BIGINT) AS scrub_checksum
       |FROM a1 LEFT JOIN a2 USING (source)
       |LEFT JOIN a3 USING (source)""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.{md5Long, tokens}
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), col("source"),
      tokens(col("text")).as("w"))
    val wins = toks.filter(size(col("w")) >= SpanW)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0), size(col("w")) - SpanW)).as("i"),
        col("w"))
      .select(col("doc_id"), col("source"), col("i"),
        md5Long(array_join(
          slice(col("w"), col("i") + 1, lit(SpanW)), " ")).as("h"))
    val freq = wins.groupBy(col("h")).agg(count(lit(1)).as("freq"))
    val dupw = wins.join(freq.filter(col("freq") > 1), "h")
      .select(col("doc_id"), col("source"), col("i"))
    // bounded per-group state: ≤ one start per token of ONE doc
    val starts = dupw.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i"))).as("st"))
    val perDoc = toks.join(starts, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("st").isNull, col("w"))
          .otherwise(filter(col("w"), (_, idx) =>
            !exists(col("st"), st =>
              st <= idx && idx < st + lit(SpanW)))))
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("n_win",
        when(size(col("w")) >= SpanW,
          (size(col("w")) - SpanW + 1).cast("long")).otherwise(0L))
      .withColumn("removed",
        (size(col("w")) - size(col("kept"))).cast("long"))
      .withColumn("rh", md5Long(array_join(col("kept"), " ")))
    val a1 = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_win")).as("n_windows"),
        sum(col("removed")).as("tokens_removed"),
        expr("bit_xor(rh)").cast("long").as("scrub_checksum"))
    val a2 = dupw.groupBy(col("source"))
      .agg(count(lit(1)).as("n_dup_windows"),
        countDistinct(col("doc_id")).as("docs_affected"))
    a1.join(a2, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("docs_affected"), lit(0L)).as("docs_affected"),
        col("tokens_removed"),
        when(col("n_tokens") > 0,
          expr("(1000000 * tokens_removed) div n_tokens"))
          .otherwise(0L).as("removed_ppm"),
        col("scrub_checksum"))
  }

  // ------------------------------------------------------------ q176

  /** 2^60 as a double — md5Long's range, the uniform's denominator. */
  private val DpHashRange = 1152921504606846976.0

  /** Differentially-private mart release: per-source doc and token
    * counts published with Laplace(b=2) noise (ε=0.5 per statistic,
    * ε=1.0 total per source) via the inverse-CDF transform of a SEEDED
    * uniform — `u = (md5(key)+0.5)/2^60` — so the mechanism is
    * deterministic given the release key (a retry or a different
    * partitioning publishes the SAME noisy value; rotate the key
    * prefix per release period to re-randomize). Complements q155's
    * k-anonymity: suppression bounds re-identification, the noisy
    * release bounds what any single row can shift. The oracle replays
    * hash → uniform → Laplace bit for bit; a 6-dp rounding contract
    * absorbs cross-engine `ln` ulps.
    *
    * Scale: one map-combinable aggregate per source; the noise is a
    * row-local expression over the aggregated (tiny) frame. */
  val q176 = Query(
    "q176_dp_release",
    s"""WITH a AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    SUM(len($DTokens)) AS n_tokens
       |  FROM documents GROUP BY 1),
       |u AS (
       |  SELECT source, n_docs, n_tokens,
       |    ((${dHash64("'dp:docs:' || source")} + 0.5)
       |      / $DpHashRange) AS u1,
       |    ((${dHash64("'dp:tokens:' || source")} + 0.5)
       |      / $DpHashRange) AS u2
       |  FROM a)
       |SELECT source,
       |  ROUND(n_docs + (-2.0 * sign(u1 - 0.5)
       |    * ln(1.0 - 2.0 * abs(u1 - 0.5))), 6) AS released_docs,
       |  ROUND(n_tokens + (-2.0 * sign(u2 - 0.5)
       |    * ln(1.0 - 2.0 * abs(u2 - 0.5))), 6) AS released_tokens,
       |  CAST(1.0 AS DOUBLE) AS epsilon_spent
       |FROM u""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.{md5Long, tokens}
    def uniform(prefix: String) =
      (md5Long(concat(lit(prefix), col("source"))) + lit(0.5)) /
        lit(DpHashRange)
    def laplace(cnt: org.apache.spark.sql.Column,
        u: org.apache.spark.sql.Column) =
      round(cnt + (lit(-2.0) * signum(u - lit(0.5)) *
        log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))), 6)
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).cast("long").as("n_tokens"))
      .withColumn("u1", uniform("dp:docs:"))
      .withColumn("u2", uniform("dp:tokens:"))
      .select(col("source"),
        laplace(col("n_docs"), col("u1")).as("released_docs"),
        laplace(col("n_tokens"), col("u2")).as("released_tokens"),
        lit(1.0).as("epsilon_spent"))
  }

  // ------------------------------------------------------------ q177

  /** Per-source keep cap for the quality rank. */
  private val CapK = 15

  /** Per-source document cap (the per-domain quota every web-scale
    * curation run applies): each source keeps its [[CapK]] best docs by
    * the shared q28 quality score (doc_id tie-break), everything else
    * drops. The per-source rank is the GLOBAL distributed rank on
    * `(source, -score, doc_id)` minus a per-source offset from a
    * triangular join over the per-source counts (#sources rows) — the
    * sort key keeps each source contiguous, so no per-source window
    * ever sees unbounded rows and a hot source cannot pin a task.
    * Score doubles are bit-identical cross-engine (q28's contract), so
    * the kept SET matches exactly, not just the counts. */
  val q177 = Query(
    "q177_source_cap",
    s"""WITH f AS (
       |  ${Llm.dQualityFeatures("doc_id, source")}),
       |sc AS (
       |  SELECT doc_id, source, tok,
       |    ${Llm.DScore} AS score
       |  FROM f),
       |r AS (
       |  SELECT doc_id, source, tok,
       |    row_number() OVER (
       |      PARTITION BY source ORDER BY score DESC, doc_id) AS rn
       |  FROM sc)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rn <= $CapK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN rn > $CapK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(SUM(CASE WHEN rn <= $CapK THEN tok ELSE 0 END) AS BIGINT)
       |    AS kept_tokens
       |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
    val sc = Llm.qualityFeatures(Tables.documents(s, dir), "doc_id", "source")
      .select(col("doc_id"), col("source"), col("tok"),
        Llm.qualityScoreCol.as("score"))
    val ranked = Ranking.withGlobalRank(sc,
      struct(col("source"), (-col("score")).as("ns"),
        col("doc_id").as("id")).asc, "grnk")
    val cnt = sc.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    // exclusive per-source offsets: triangular join over #sources rows
    val off = cnt.select(col("source")).join(
        cnt.select(col("source").as("src_b"), col("cnt")),
        col("src_b") < col("source"), "left")
      .groupBy(col("source"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("off"))
    ranked.join(broadcast(off), "source")
      .withColumn("rn", col("grnk") - col("off"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= CapK, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > CapK, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rn") <= CapK, col("tok")).otherwise(0L))
          .cast("long").as("kept_tokens"))
  }

  // ------------------------------------------------------------ q180

  /** Shard counts before/after the resize. */
  private val HrwOld = 8

  /** Consistent shard REBALANCE via rendezvous hashing
    * ([[graft.functions.Functions.rendezvousShard]]): docs are
    * assigned to [[HrwOld]] shards by highest-random-weight, the
    * fleet grows by one shard, and the per-shard ledger shows how
    * many docs move — the HRW guarantee is that every mover lands ON
    * THE NEW SHARD (no peer-to-peer churn), certified by the
    * `all_moves_to_new` bit. This is the mod-free resharding a 100 TB
    * store needs: `hash % n` would relocate (n−1)/n of all keys on a
    * resize; HRW relocates ≈ 1/(n+1). Assignment is row-local (an
    * n-entry hash array, no shuffle) and the oracle replays the
    * argmax per key. */
  val q180 = Query(
    "q180_rendezvous_resharding", {
      def assign(n: Int, alias: String) =
        s"""(SELECT doc_id, s AS $alias FROM (
           |  SELECT doc_id, s,
           |    ${dHash64(s"CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)")} AS h
           |  FROM documents CROSS JOIN range(0, $n) t(s))
           |  QUALIFY row_number() OVER (
           |    PARTITION BY doc_id ORDER BY h DESC, s DESC) = 1)"""
      s"""WITH a8 AS ${assign(HrwOld, "s_old")},
         |a9 AS ${assign(HrwOld + 1, "s_new")},
         |j AS (
         |  SELECT s_old, s_new FROM a8 JOIN a9 USING (doc_id))
         |SELECT CAST(s_old AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved,
         |  COALESCE(BOOL_AND(s_old = s_new OR s_new = $HrwOld), TRUE)
         |    AS all_moves_to_new
         |FROM j GROUP BY 1""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Functions.rendezvousShard
    Tables.documents(s, dir)
      .select(col("doc_id"),
        rendezvousShard(col("doc_id"), HrwOld).as("s_old"),
        rendezvousShard(col("doc_id"), HrwOld + 1).as("s_new"))
      .groupBy(col("s_old").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_old") =!= col("s_new"), 1L).otherwise(0L))
          .as("n_moved"),
        coalesce(every(col("s_old") === col("s_new") ||
          col("s_new") === HrwOld), lit(true)).as("all_moves_to_new"))
  }

  // ------------------------------------------------------------ q182

  /** Dataset VERSION DIFF (the DVC/LakeFS-style audit between two
    * corpus snapshots): v2 deterministically removes every 13th doc,
    * rewrites every surviving 17th, and lands new docs for every 19th
    * under offset ids; the diff classifies every id on either side as
    * added / removed / changed / unchanged by id-presence + content
    * hash and reports doc and token deltas per class — what a corpus
    * release note states. One full outer join on doc_id with row-local
    * hash compare; content never shuffles beyond the id join, so the
    * diff of two 100 TB snapshots moves ids + hashes + token counts,
    * not text. */
  val q182 = Query(
    "q182_snapshot_diff",
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
       |v2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END
       |      AS text
       |  FROM documents WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT doc_id + 1000000000, text FROM documents
       |  WHERE doc_id % 19 = 0),
       |d AS (
       |  SELECT
       |    CASE WHEN v1.doc_id IS NULL THEN 'added'
       |         WHEN v2.doc_id IS NULL THEN 'removed'
       |         WHEN md5(v1.text) <> md5(v2.text) THEN 'changed'
       |         ELSE 'unchanged' END AS status,
       |    COALESCE(len(string_split_regex(trim(lower(v2.text)),
       |      '\\s+')), 0)
       |      - COALESCE(len(string_split_regex(trim(lower(v1.text)),
       |      '\\s+')), 0) AS delta
       |  FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id)
       |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(delta) AS BIGINT) AS token_delta
       |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.tokens
    val docs = Tables.documents(s, dir)
    val v1 = docs.select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
    val a = v1.select(col("doc_id").as("id1"), col("text").as("t1"))
    val b = v2.select(col("doc_id").as("id2"), col("text").as("t2"))
    a.join(b, col("id1") === col("id2"), "full")
      .select(
        when(col("id1").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(md5(col("t1")) =!= md5(col("t2")), "changed")
          .otherwise("unchanged").as("status"),
        // size(null) is -1 in Spark (legacy sizeOfNull), so guard on
        // the id instead of coalescing the size
        (when(col("id2").isNull, 0).otherwise(size(tokens(col("t2")))) -
          when(col("id1").isNull, 0).otherwise(size(tokens(col("t1")))))
          .as("delta"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("delta")).cast("long").as("token_delta"))
  }

  // ------------------------------------------------------------ q212

  private val LDivL = 3 // required distinct sensitive values per group
  private val LDivBucket = 1000.0d // acctbal sensitivity granularity

  /** l-diversity audit — the attribute-disclosure complement to q155's
    * k-anonymity: a QI group of 1000 rows is still unsafe if every row
    * shares the SAME sensitive value (here the $1000 account-balance
    * band), because group membership then reveals the attribute.
    * Audited at q155's two generalization levels, (segment, nation)
    * and (segment, region). Shape: rows → QI groups (count +
    * count-distinct, both map-side partial) → per-level summary;
    * broadcast dimension joins; the only double op is the IEEE floor
    * that banks the balance (identical in both engines — the fixture
    * double is shared bit-for-bit). */
  val q212 = Query(
    "q212_l_diversity",
    s"""WITH c AS (
       |  SELECT c_mktsegment, n_name, r_name,
       |    CAST(floor(c_acctbal / $LDivBucket) AS BIGINT) AS sens
       |  FROM customer
       |  JOIN nation ON n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n_regionkey),
       |lv AS (
       |  SELECT 'nation' AS level, c_mktsegment AS qi1, n_name AS qi2,
       |    COUNT(*) AS n, COUNT(DISTINCT sens) AS l
       |  FROM c GROUP BY 1, 2, 3
       |  UNION ALL
       |  SELECT 'region' AS level, c_mktsegment AS qi1, r_name AS qi2,
       |    COUNT(*) AS n, COUNT(DISTINCT sens) AS l
       |  FROM c GROUP BY 1, 2, 3)
       |SELECT level,
       |  CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(MIN(l) AS BIGINT) AS min_diversity,
       |  CAST(SUM(CASE WHEN l < $LDivL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_groups_failing,
       |  CAST(SUM(CASE WHEN l < $LDivL THEN n ELSE 0 END) AS BIGINT)
       |    AS n_rows_at_risk
       |FROM lv GROUP BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("n_nationkey") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("c_mktsegment"), col("n_name"), col("r_name"),
        floor(col("c_acctbal") / LDivBucket).cast("long").as("sens"))
    def level(name: String, qi2: String) = c
      .groupBy(col("c_mktsegment").as("qi1"), col(qi2).as("qi2"))
      .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("l"))
      .select(lit(name).as("level"), col("n"), col("l"))
    level("nation", "n_name").unionAll(level("region", "r_name"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"),
        min(col("l")).cast("long").as("min_diversity"),
        sum(when(col("l") < LDivL, 1L).otherwise(0L))
          .as("n_groups_failing"),
        sum(when(col("l") < LDivL, col("n")).otherwise(0L))
          .as("n_rows_at_risk"))
  }

  // ------------------------------------------------------------ q221

  /** Effective sample size of length-proportional sampling, per
    * source: when a curation mix draws documents with probability ∝
    * size (the token-budget draw q139/q144 perform with these
    * weights), Kish's ESS = (Σw)²/Σw² says how many EFFECTIVE
    * documents the weighted draw is worth — a low ess_ratio flags a
    * source whose mass sits in a few giant documents (the mix then
    * over-trains on them). One map-side-combinable scan; the sums are
    * exact DECIMAL(38) and cross to double via the decimal-string
    * route (the q196 parse-pinning), so the two divisions are fixed
    * IEEE trees. */
  val q221 = Query(
    "q221_ess_weights",
    """WITH st AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS HUGEINT) AS sw,
      |    CAST(SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
      |      AS HUGEINT) AS sw2
      |  FROM documents GROUP BY 1)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(sw AS BIGINT) AS total_chars,
      |  CASE WHEN CAST(CAST(sw2 AS VARCHAR) AS DOUBLE) != 0.0 THEN
      |    ROUND(CAST(CAST(sw * sw AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(sw2 AS VARCHAR) AS DOUBLE), 6)
      |  END AS ess,
      |  CASE WHEN CAST(CAST(sw2 AS VARCHAR) AS DOUBLE) != 0.0
      |      AND n_docs > 0 THEN
      |    ROUND((CAST(CAST(sw * sw AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(sw2 AS VARCHAR) AS DOUBLE))
      |      / CAST(CAST(n_docs AS VARCHAR) AS DOUBLE), 6)
      |  END AS ess_ratio
      |FROM st""".stripMargin) { (s, dir) =>
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val st = Tables.documents(s, dir).groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars").cast(d38)).as("sw"),
      sum((col("n_chars") * col("n_chars")).cast(d38)).as("sw2"))
    val ess = dd(col("sw") * col("sw")) / dd(col("sw2"))
    st.select(col("source"), col("n_docs").cast("long").as("n_docs"),
      col("sw").cast("long").as("total_chars"),
      when(dd(col("sw2")) =!= 0.0d, round(ess, 6)).as("ess"),
      when(dd(col("sw2")) =!= 0.0d && col("n_docs") > 0,
        round(ess / dd(col("n_docs")), 6)).as("ess_ratio"))
  }

  // ------------------------------------------------------------ q230

  /** Warner randomized response (local differential privacy): each row
    * reports its sensitive bit (lang = 'en') truthfully with
    * probability 3/4, flipped otherwise — the per-record privacy
    * mechanism beside q176's central-DP release — and the debiased
    * estimator n̂ = (4·obs − n)/2 recovers the population count. The
    * coin is the portable md5 draw `%4 < 3` (EXACT 3/4 — an integer
    * comparison, no float threshold), so the mechanism replays
    * engine-for-engine and the audit can report the estimator's
    * actual error. One map-side-combinable scan; the only double ops
    * are the two final halvings. */
  val q230 = Query(
    "q230_randomized_response",
    s"""WITH b AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
       |    CASE WHEN ${dHash64(
             "'rr:' || CAST(doc_id AS VARCHAR)")} % 4 < 3
       |      THEN 1 ELSE 0 END AS coin
       |  FROM documents),
       |r AS (
       |  SELECT t, CASE WHEN coin = 1 THEN t ELSE 1 - t END AS rep
       |  FROM b),
       |st AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(rep) AS HUGEINT) AS obs,
       |    CAST(SUM(t) AS HUGEINT) AS act
       |  FROM r)
       |SELECT CAST(n AS BIGINT) AS n_docs,
       |  CAST(obs AS BIGINT) AS n_reported_true,
       |  CAST(act AS BIGINT) AS n_actual_true,
       |  ROUND(CAST(CAST(4 * obs - n AS VARCHAR) AS DOUBLE) / 2.0, 6)
       |    AS est_true,
       |  ROUND(CAST(CAST((4 * obs - n) - 2 * act AS VARCHAR) AS DOUBLE)
       |    / 2.0, 6) AS est_error
       |FROM st""".stripMargin) { (s, dir) =>
    import graft.functions.Functions.md5Long
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val b = Tables.documents(s, dir).select(
      when(col("lang") === "en", 1L).otherwise(0L).as("t"),
      when(pmod(md5Long(concat(lit("rr:"),
        col("doc_id").cast("string"))), lit(4L)) < 3, 1L)
        .otherwise(0L).as("coin"))
    val r = b.select(col("t"),
      when(col("coin") === 1, col("t")).otherwise(lit(1L) - col("t"))
        .as("rep"))
    val st = r.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("rep").cast(d38)).as("obs"),
      sum(col("t").cast(d38)).as("act"))
    st.select(col("n").cast("long").as("n_docs"),
      col("obs").cast("long").as("n_reported_true"),
      col("act").cast("long").as("n_actual_true"),
      round(dd(lit(4) * col("obs") - col("n")) / 2.0d, 6)
        .as("est_true"),
      round(dd((lit(4) * col("obs") - col("n")) -
        lit(2) * col("act")) / 2.0d, 6).as("est_error"))
  }

  val all: Seq[Query] = Seq(q78, q79, q80, q82, q83, q84, q85, q89, q102,
    q155, q173, q174, q175, q176, q177, q180, q182, q212, q221, q230,
    q248)
}
