package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** Embedding similarity search (LLM-pipeline north star, SURVEY §7.2
  * step 7): brute-force cosine top-k as the correctness baseline, and a
  * hyperplane-LSH bucketed variant as the 100 TB path.
  *
  * Determinism contract: cosine is a strict left-to-right double fold
  * (`aggregate` higher-order fn), so any engine folding the same way
  * (e.g. DuckDB's `list_reduce`) produces bit-identical doubles — the
  * similarity values themselves are oracle-checkable, not just the ids.
  *
  * Scale notes: the query set is broadcast (it is small by contract);
  * per-candidate scoring streams map-side; top-k per query uses a
  * partial-aggregatable Aggregator, so only `k` rows per (query ×
  * input-partition) ever reach the shuffle — NOT a window over all
  * n×|Q| scored pairs. The LSH variant prunes the scored set itself:
  * sign-buckets from deterministic hash-derived hyperplanes, candidates
  * joined within buckets only.
  */
object Similarity {

  /** One scored neighbor. */
  final case class Scored(id: Long, score: Double)

  /** Top-k buffer as parallel sequences (kept sorted by score desc, id
    * asc) — a Product, so the public `Encoders.product` covers it. */
  final case class TopBuf(ids: Seq[Long], scores: Seq[Double])

  /** Partial-aggregatable exact top-k by (score desc, id asc). The
    * buffer never exceeds k elements, so map-side combine bounds both
    * memory and shuffle volume — only k rows per (query × partition)
    * reach the exchange, vs a window over every scored pair. */
  final class TopK(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def toList(buf: TopBuf): List[Scored] =
      buf.ids.lazyZip(buf.scores).map(Scored.apply).toList
    private def fromList(xs: List[Scored]): TopBuf =
      TopBuf(xs.map(_.id), xs.map(_.score))
    private def insert(buf: List[Scored], x: Scored): List[Scored] =
      if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
      else {
        val (before, after) = buf.span(better(_, x))
        val merged = before ::: (x :: after)
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }
    def zero: TopBuf = TopBuf(Nil, Nil)
    def reduce(buf: TopBuf, x: Scored): TopBuf =
      fromList(insert(toList(buf), x))
    def merge(a: TopBuf, b: TopBuf): TopBuf =
      fromList(toList(b).foldLeft(toList(a))(insert))
    def finish(buf: TopBuf): TopBuf = buf
    def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Cosine over float embeddings: the native codegen'd expression
    * ([[graft.expressions.CosineSimilarity]]) — bit-identical to the
    * HOF fold (`Functions.cosine` over double-cast arrays) and to
    * DuckDB's `list_reduce`, but a single fused primitive loop inside
    * whole-stage codegen instead of one interpreted lambda call per
    * element. */
  def cosineF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ExprColumn.of(
      graft.expressions.CosineSimilarity(
        org.apache.spark.sql.graft.ExprColumn.expr(a),
        org.apache.spark.sql.graft.ExprColumn.expr(b)))

  /** Native codegen'd dot product ([[graft.expressions.DotProduct]]),
    * bit-identical to the `Functions.dot` fold. Used for plane/centroid
    * bucket assignment, which evaluates 6-8 dots per corpus vector —
    * the full-scan part of ANN, so it must stay inside codegen. */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ExprColumn.of(
      graft.expressions.DotProduct(
        org.apache.spark.sql.graft.ExprColumn.expr(a),
        org.apache.spark.sql.graft.ExprColumn.expr(b)))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param vectors (id, vec) corpus; `vec` is `array<float>`
    * @param queries (query_id, qvec) — small, broadcast
    * @return (query_id, rank, neighbor_id, cosine) — rank 1..k by
    *         (cosine desc, neighbor_id asc); self-matches excluded
    */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val scored = vectors.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining (contrastive-training data prep): for each
    * query vector, the exact top-k cosine neighbors whose label DIFFERS
    * from the query's — the semantically-closest wrong-class examples,
    * the standard negatives for training retrieval/embedding models.
    * Same scale shape as [[bruteForceTopK]]: the query set is broadcast,
    * the corpus is scanned once and never shuffled before the map-side-
    * combinable TopK partial aggregation; at 100 TB the per-class ANN
    * index replaces the brute scan, with this as its recall baseline. */
  def hardNegativesTopK(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, queryLabelCol: String, k: Int): DataFrame =
    labelFilteredTopK(vectors, idCol, vecCol, labelCol, queries,
      queryIdCol, queryVecCol, queryLabelCol, k, sameLabel = false)

  /** The positive counterpart: exact top-k cosine neighbors SHARING the
    * query's label — the in-class nearest neighbors contrastive
    * training pairs with the anchors (and the other half of a triplet
    * next to [[hardNegativesTopK]]). */
  def labelPositivesTopK(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, queryLabelCol: String, k: Int): DataFrame =
    labelFilteredTopK(vectors, idCol, vecCol, labelCol, queries,
      queryIdCol, queryVecCol, queryLabelCol, k, sameLabel = true)

  private def labelFilteredTopK(vectors: DataFrame, idCol: String,
      vecCol: String, labelCol: String, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, queryLabelCol: String,
      k: Int, sameLabel: Boolean): DataFrame = {
    val labelPred =
      if (sameLabel) col(labelCol) === col(queryLabelCol)
      else col(labelCol) =!= col(queryLabelCol)
    val scored = vectors.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(queryIdCol) && labelPred)
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }

  /** Shared tail: scored (query_id, id, score) → ranked top-k rows. */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("id"), col("score")).as("top"))
      .select(col("query_id"),
        posexplode(arrays_zip(col("top.ids"), col("top.scores")))
          .as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("n.ids").as("neighbor_id"),
        round(col("n.scores"), 6).as("cosine"))
  }

  /** Deterministic hash-derived hyperplane weights: plane `p`, dim `d`
    * gets `(md5_60bit("plane:p:d") mod 1001 - 500) / 500` ∈ [-1, 1].
    * Pure literals — Catalyst constant-folds the whole array. */
  def planeWeights(p: Int, dims: Int): Column =
    array((0 until dims).map { d =>
      ((md5Long(lit(s"plane:$p:$d")) % 1001 - 500).cast("double") / 500.0)
    }: _*)

  /** Sign-bucket id of a vector under `planes` hyperplanes: bit p is
    * `dot(plane_p, v) >= 0`. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      when(dotF(vec, planeWeights(p, dims)) >= 0,
        lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** IVF-style coarse quantization: `cells` deterministic centroid
    * vectors (components hash-derived in [-1, 1], like the LSH planes),
    * each vector assigned to the centroid with the max dot product
    * (first-wins on ties). Pure literals — Catalyst constant-folds the
    * centroids; the argmax runs over MATERIALIZED dot columns so each
    * centroid dot is computed once per row. */
  def centroidWeights(m: Int, dims: Int): Column =
    array((0 until dims).map { d =>
      ((md5Long(lit(s"centroid:$m:$d")) % 1001 - 500).cast("double") / 500.0)
    }: _*)

  /** First-wins argmax over `cells` dot columns supplied by `d`. */
  private def argmaxCell(cells: Int, d: Int => Column): Column =
    (0 until cells - 1).foldRight(lit(cells - 1): Column) { (m, acc) =>
      val later = (m + 1 until cells).map(d)
      val laterMax =
        if (later.size == 1) later.head else greatest(later: _*)
      when(d(m) >= laterMax, lit(m)).otherwise(acc)
    }

  /** Appends `__cell` — the assigned coarse cell id. */
  def withIvfCell(df: DataFrame, vecCol: String, cells: Int,
      dims: Int): DataFrame = {
    val withDots = (0 until cells).foldLeft(df) { (d, m) =>
      d.withColumn(s"__dot$m",
        dotF(col(vecCol), centroidWeights(m, dims)))
    }
    withDots
      .withColumn("__cell", argmaxCell(cells, m => col(s"__dot$m")))
      .drop((0 until cells).map(m => s"__dot$m"): _*)
  }

  /** Deterministic hash-derived PQ codebook entry: subspace `s`,
    * centroid `j`, local dim `d` — same [-1, 1] hash family as the
    * planes/centroids, so the codebook is replayable in plain SQL. */
  def pqWeights(s: Int, j: Int, subDims: Int): Column =
    array((0 until subDims).map { d =>
      ((md5Long(lit(s"pq:$s:$j:$d")) % 1001 - 500).cast("double") / 500.0)
    }: _*)

  /** First-wins argmin over `cells` distance columns supplied by `d`. */
  private[operators] def argminCell(cells: Int, d: Int => Column): Column =
    (0 until cells - 1).foldRight(lit(cells - 1): Column) { (m, acc) =>
      val later = (m + 1 until cells).map(d)
      val laterMin =
        if (later.size == 1) later.head else least(later: _*)
      when(d(m) <= laterMin, lit(m)).otherwise(acc)
    }

  /** Product quantization: each vector's `dims` components split into
    * `m` subvectors, each assigned (exact L2², first-wins argmin) to
    * one of `k` hash-derived codebook centroids for its subspace —
    * 64 floats compress to `m` small codes, the memory step that makes
    * billion-vector ANN (IVF+PQ) fit RAM at 100 TB. One codegen'd
    * linear scan, no shuffle: distances expand to
    * `vv - 2·(v·c) + (c·c)` with every term a strict left fold
    * ([[dotF]]), so codes AND reconstruction error are bit-replayable
    * in the SQL oracle. Returns (vec_id, code0..code{m-1}, err) with
    * `err` = Σ per-subspace min L2², rounded to 6. */
  /** Appends `code0..code{m-1}` and `__pqerr` (Σ per-subspace min L2²,
    * unrounded) to `df`, leaving every other column in place. */
  def withPqCodes(df0: DataFrame, vecCol: String, m: Int, k: Int,
      dims: Int): DataFrame = {
    require(dims % m == 0, "dims must divide into m subspaces")
    val sub = dims / m
    var df = df0
    for (s <- 0 until m) {
      df = df.withColumn(s"__sub$s", slice(col(vecCol), s * sub + 1, sub))
        .withColumn(s"__vv$s", dotF(col(s"__sub$s"), col(s"__sub$s")))
      for (j <- 0 until k)
        df = df.withColumn(s"__d${s}_$j",
          col(s"__vv$s") -
            lit(2.0) * dotF(col(s"__sub$s"), pqWeights(s, j, sub)) +
            dotF(pqWeights(s, j, sub), pqWeights(s, j, sub)))
      df = df
        .withColumn(s"code$s",
          argminCell(k, j => col(s"__d${s}_$j")).cast("long"))
        .withColumn(s"__e$s",
          least((0 until k).map(j => col(s"__d${s}_$j")): _*))
    }
    df.withColumn("__pqerr",
        (0 until m).map(s => col(s"__e$s")).reduce(_ + _))
      .drop((0 until m).flatMap(s =>
        Seq(s"__sub$s", s"__vv$s", s"__e$s") ++
          (0 until k).map(j => s"__d${s}_$j")): _*)
  }

  def pqCodes(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dims: Int): DataFrame =
    withPqCodes(
        vectors.select(col(idCol).as("vec_id"), col(vecCol).as("__v")),
        "__v", m, k, dims)
      .select(col("vec_id") +:
        (0 until m).map(s => col(s"code$s")) :+
        round(col("__pqerr"), 6).as("err"): _*)

  /** IVF+PQ search — the architecture that makes billion-vector ANN
    * fit memory: coarse IVF cells prune candidates (equi join, never
    * all-pairs), and within a cell every candidate is scored by
    * ASYMMETRIC distance — the query precomputes its `m × k` distance
    * table to the codebooks, and a candidate costs `m` table lookups
    * over its codes instead of a `dims`-long scan of the raw vector.
    * Exact L2² per term (`vv - 2·(v·c) + c·c`, strict left folds), so
    * ranks AND distances replay in the SQL oracle. Returns
    * (query_id, rank, neighbor_id, adist), rank 1..`topK` by
    * (adist asc, id asc), self-matches excluded. */
  def ivfPqTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      topK: Int, cells: Int, m: Int, codebook: Int, dims: Int)
      : DataFrame = {
    val sub = dims / m
    // compressed index: coarse cell + PQ codes per corpus vector
    val coded = withPqCodes(
      withIvfCell(
        vectors.select(col(idCol).as("vec_id"), col(vecCol).as("__v")),
        "__v", cells, dims),
      "__v", m, codebook, dims)
      .select(col("vec_id") +: col("__cell") +:
        (0 until m).map(s => col(s"code$s")): _*)
    // query side: cell probe + the m×k distance table, as m arrays
    var q = withIvfCell(
      queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q")),
      "__q", cells, dims)
    for (s <- 0 until m) {
      q = q.withColumn(s"__qsub$s", slice(col("__q"), s * sub + 1, sub))
        .withColumn(s"__qvv$s", dotF(col(s"__qsub$s"), col(s"__qsub$s")))
      for (j <- 0 until codebook)
        q = q.withColumn(s"__qd${s}_$j",
          col(s"__qvv$s") -
            lit(2.0) * dotF(col(s"__qsub$s"), pqWeights(s, j, sub)) +
            dotF(pqWeights(s, j, sub), pqWeights(s, j, sub)))
      q = q.withColumn(s"__qd$s",
        array((0 until codebook).map(j => col(s"__qd${s}_$j")): _*))
    }
    val qSel = q.select(col("query_id") +: col("__cell").as("__qcell") +:
      (0 until m).map(s => col(s"__qd$s")): _*)
    val adist = (0 until m)
      .map(s => element_at(col(s"__qd$s"), col(s"code$s").cast("int") + 1))
      .reduce(_ + _)
    val scored = coded
      .join(broadcast(qSel),
        col("__cell") === col("__qcell") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        (-adist).as("score"))
    topKPerQuery(scored, topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(-col("cosine"), 6).as("adist"))
  }

  /** Appends `__probe0..__probe{nProbe-1}` — the top-`nProbe` cells by
    * centroid dot product. Probe i+1 re-runs the same first-wins argmax
    * with all previously chosen cells' dots masked to -1e308, so the
    * probe sequence is deterministic and replayable in plain SQL. */
  def withIvfProbes(df: DataFrame, vecCol: String, cells: Int,
      dims: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= cells, "1 <= nProbe <= cells")
    val withDots = (0 until cells).foldLeft(df) { (d, m) =>
      d.withColumn(s"__dot$m",
        dotF(col(vecCol), centroidWeights(m, dims)))
    }
    val staged = (0 until nProbe).foldLeft(withDots) { (d, i) =>
      val masked: Int => Column = m => {
        val prior = (0 until i).map(j => col(s"__probe$j") === m)
        if (prior.isEmpty) col(s"__dot$m")
        else when(prior.reduce(_ || _), lit(-1e308))
          .otherwise(col(s"__dot$m"))
      }
      d.withColumn(s"__probe$i", argmaxCell(cells, masked))
    }
    staged.drop((0 until cells).map(m => s"__dot$m"): _*)
  }

  /** IVF multi-probe top-k: each query probes its top-`nProbe` coarse
    * cells instead of one — the standard recall lever for IVF (a query
    * near a cell boundary recovers the neighbors that landed just
    * across it) at nProbe/cells of the corpus read. Cells are disjoint,
    * so no candidate dedup is needed. */
  def ivfTopKMultiProbe(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, cells: Int, dims: Int, nProbe: Int): DataFrame = {
    val binned = withIvfCell(vectors, vecCol, cells, dims)
    val qb = withIvfProbes(queries, queryVecCol, cells, dims, nProbe)
      .withColumn("__qcell", explode(array(
        (0 until nProbe).map(i => col(s"__probe$i")): _*)))
      .drop((0 until nProbe).map(i => s"__probe$i"): _*)
    val scored = binned.join(broadcast(qb),
        col("__cell") === col("__qcell") &&
          col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }

  /** IVF approximate top-k: candidates are corpus vectors in the SAME
    * coarse cell as the query (single-probe), exact cosine + top-k
    * within the cell. The centroid-partitioned corpus is the classic
    * inverted-file layout — at scale, cells map to partitions and a
    * probe touches 1/cells of the data. */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, cells: Int, dims: Int): DataFrame = {
    val binned = withIvfCell(vectors, vecCol, cells, dims)
    val qb = withIvfCell(queries, queryVecCol, cells, dims)
      .withColumnRenamed("__cell", "__qcell")
    val scored = binned.join(broadcast(qb),
        col("__cell") === col("__qcell") &&
          col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }

  /** TRAINED-IVF approximate top-k: like [[ivfTopK]], but cells come
    * from a [[KMeans]]-trained centroid table instead of the
    * hash-derived family — the recall lever the untrained layout
    * leaves on the floor. Assignment uses the same quantized-L2 argmin
    * the training loop used (so train and serve agree on boundaries);
    * scoring within a cell is exact cosine. Plan shape is identical to
    * the untrained path: centroids fold into the row expression, the
    * cell join is equi, top-k is the partial-aggregatable Aggregator. */
  def trainedIvfTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, cents: Array[Array[Double]]): DataFrame = {
    def binned(df: DataFrame, vec: String) =
      KMeans.withCellDist(
          df.withColumn("__vq", KMeans.quantize(col(vec))), "__vq", cents)
        .drop("__vq", "__kdist")
    val b = binned(vectors, vecCol)
    val qb = binned(queries, queryVecCol)
      .withColumnRenamed("__cell", "__qcell")
    val scored = b.join(broadcast(qb),
        col("__cell") === col("__qcell") &&
          col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }

  /** Multi-probe LSH top-k: each query probes its own sign-bucket PLUS
    * every bucket at Hamming distance 1 (one flipped hyperplane) —
    * `planes + 1` probes recover the neighbors lost to a single
    * boundary flip, the dominant LSH miss mode. Probe buckets are
    * pairwise distinct and each vector lives in exactly one bucket, so
    * candidates need no dedup. */
  def lshTopKMultiProbe(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, planes: Int, dims: Int): DataFrame = {
    val bucketed = vectors.withColumn("__bucket",
      lshBucket(col(vecCol), planes, dims))
    val qb = queries.withColumn("__qbucket",
      lshBucket(col(queryVecCol), planes, dims))
      .withColumn("__probe", explode(array(
        (col("__qbucket") +: (0 until planes).map(p =>
          col("__qbucket").bitwiseXOR(lit(1L << p)))): _*)))
      .drop("__qbucket")
    val scored = bucketed.join(broadcast(qb),
        col("__bucket") === col("__probe") &&
          col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: vectors in the same
    * hyperplane sign-bucket are paired (a < b) and kept when exact
    * cosine ≥ `threshold`. The bucket join bounds the pair blowup the
    * same way LSH banding does for minhash — never all-pairs. */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String,
      vecCol: String, planes: Int, dims: Int,
      threshold: Double): DataFrame = {
    val b = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes, dims).as("__bucket"))
    val left = b.select(col("__bucket"), col("id").as("id_a"),
      col("v").as("va"))
    val right = b.select(col("__bucket").as("__bucket_b"),
      col("id").as("id_b"), col("v").as("vb"))
    left.join(right,
        left("__bucket") === right("__bucket_b") &&
          left("id_a") < right("id_b"))
      .withColumn("__cos", cosineF(col("va"), col("vb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 6).as("cosine"))
  }

  /** Approximate top-k: candidates are corpus vectors in the SAME
    * hyperplane sign-bucket as the query (2^planes buckets); exact
    * cosine + top-k within candidates only. Trades recall for pruning —
    * the bucket join replaces the full scan, which is what survives a
    * 100× corpus. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, planes: Int, dims: Int): DataFrame = {
    val bucketed = vectors.withColumn("__bucket",
      lshBucket(col(vecCol), planes, dims))
    val qb = queries.withColumn("__qbucket",
      lshBucket(col(queryVecCol), planes, dims))
    val scored = bucketed.join(broadcast(qb),
        col("__bucket") === col("__qbucket") &&
          col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol).as("query_id"),
        col(idCol).as("id"),
        cosineF(col(vecCol), col(queryVecCol)).as("score"))
    topKPerQuery(scored, k)
  }
}
