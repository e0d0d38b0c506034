package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.Functions.md5Long

/** Count-Min sketch: frequency estimation in sub-linear state.
  *
  * The reference's skew/top-share checks (reference `README.md:59`,
  * `pseudo_code_rules.txt:47-50` — whale-account concentration) need
  * per-key frequencies; at 100 TB the exact per-key aggregate is a
  * full-cardinality shuffle, while the sketch build below is ONE
  * map-side-combinable aggregate with a FIXED group count (`d × w`
  * cells) — state independent of key cardinality, mergeable across
  * partitions/days by cell-wise addition, never wrong by undercount
  * (estimates only ever overcount, by collision).
  *
  * Hashing is the repo-wide portable md5 scheme ([[md5Long]]), so a SQL
  * engine replays the exact sketch cell-for-cell — the property the
  * oracle check (q107) relies on.
  */
object Sketch {

  /** Carter-Wegman hash pair: row r's bucket is `(h1 + r·h2) mod w` —
    * the standard pairwise-independent CMS family, and only TWO md5
    * evaluations per key regardless of sketch depth (the same trick
    * the minhash signatures use). h2 is clamped to 2^50 so
    * `h1 + (d-1)·h2` never overflows a long. */
  private def h1(k: Column): Column = md5Long(concat(lit("cm1:"), k))
  private def h2(k: Column): Column =
    pmod(md5Long(concat(lit("cm2:"), k)), lit(1L << 50))

  /** Build the d×w Count-Min table over `key`: one row per non-empty
    * cell `(r, b, c)`. The explode multiplies input rows by `d` AFTER
    * the two hashes are computed once per row, and partial aggregation
    * collapses the exploded rows to ≤ d·w groups per task — the
    * shuffle carries at most d·w rows per partition regardless of
    * input size. */
  def countMin(df: DataFrame, key: Column, d: Int, w: Int): DataFrame =
    df.select(key.cast("string").as("__k"))
      .select(h1(col("__k")).as("__h1"), h2(col("__k")).as("__h2"))
      .select(col("__h1"), col("__h2"),
        explode(sequence(lit(0), lit(d - 1))).as("__r"))
      .groupBy(col("__r"),
        ((col("__h1") + col("__r") * col("__h2")) % w).as("__b"))
      .agg(count(lit(1)).as("__c"))

  /** Point-estimate every key in `keys` (column `keyCol`, cast to
    * string for hashing): min over the d cells the key maps to. The
    * sketch (≤ d·w rows) is BROADCAST, so probing any number of keys
    * never shuffles them. Estimates satisfy `est ≥ true count`.
    *
    * The join is a LEFT join with empty cells coalesced to 0: a key
    * absent from the stream maps to d cells that may all be missing
    * from the sparse sketch rows, and the CM semantics for it are
    * est = 0 (min over d zero cells), not "row disappears"; likewise a
    * key with SOME empty cells must take 0 from those cells, not min
    * over only the non-empty ones (which would overestimate). */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val probes = keys
      .withColumn("__h1", h1(col(keyCol).cast("string")))
      .withColumn("__h2", h2(col(keyCol).cast("string")))
      .withColumn("__r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("__b", (col("__h1") + col("__r") * col("__h2")) % w)
    probes.join(broadcast(sketch), Seq("__r", "__b"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("__c"), lit(0L))).as("est_cnt"))
  }

  // ------------------------------------------------------------ KLL

  /** Merge per-partition KLL sketch blobs into one. The input rows are
    * ALREADY sketches (one per partition×key from [[kllBy]]'s local
    * build), so the heapify cost is per-sketch, never per raw row. */
  private object KllMergeAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def mergeB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val s = KllDoublesSketch.heapify(Memory.wrap(a))
        s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
        s.toByteArray
      }
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] = mergeB(acc, x)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeB(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge sketch blobs and finish with the estimated quantile `q` —
    * keeps quantile extraction inside an Aggregator, so no scalar
    * row-UDF exists anywhere on the path. */
  private final class KllQuantileAgg(q: Double)
      extends Aggregator[Array[Byte], Array[Byte], Double] {
    def zero: Array[Byte] = KllMergeAgg.zero
    def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] =
      KllMergeAgg.reduce(acc, x)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      KllMergeAgg.merge(a, b)
    def finish(r: Array[Byte]): Double =
      if (r.isEmpty) Double.NaN
      else KllDoublesSketch.heapify(Memory.wrap(r)).getQuantile(q)
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column aggregate: merge KLL sketch blobs (column of binary). */
  def kllMerge(sketch: Column): Column = udaf(KllMergeAgg).apply(sketch)

  /** Column aggregate: merge KLL sketch blobs and estimate quantile
    * `q` of the merged sketch. */
  def kllQuantile(sketch: Column, q: Double): Column =
    udaf(new KllQuantileAgg(q)).apply(sketch)

  /** Per-key KLL quantile sketches (Apache DataSketches,
    * `KllDoublesSketch`, parameter `k`): the MERGEABLE quantile state
    * that `percentile`/`approx_percentile` outputs are not — daily
    * sketches roll up to monthly/yearly by merge, never rescanning
    * the fact (the quantile twin of the q140 HLL rollup).
    *
    * Build shape: one `mapPartitions` pass holds a local
    * key→sketch map (bounded by keys-per-partition × k doubles) and
    * emits ONE sketch row per partition×key — the map-side combine —
    * then a single aggregate merges those blobs per key. The shuffle
    * carries sketches, not values, so a 100 TB fact shuffles a few KB
    * per (partition, key) cell.
    *
    * `keyCol` must be a string column that round-trips its value
    * (e.g. an ISO `yyyy-MM-dd` day); `valueCol` is cast to double. */
  def kllBy(df: DataFrame, keyCol: String, valueCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
    val local = pairs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, KllDoublesSketch]()
      it.foreach { case (key, v) =>
        m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(v)
      }
      m.iterator.map { case (key, sk) => (key, sk.toByteArray) }
    }.toDF(keyCol, "sketch")
    local.groupBy(col(keyCol)).agg(kllMerge(col("sketch")).as("sketch"))
  }

  // ------------------------------------------------------------ Theta

  /** Union-merge theta sketch blobs (compact serialized form). Inputs
    * are already-built sketches, so cost is per-sketch. */
  private object ThetaUnionAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def mergeB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val u = SetOperation.builder().buildUnion()
        u.union(Sketches.wrapSketch(Memory.wrap(a)))
        u.union(Sketches.wrapSketch(Memory.wrap(b)))
        u.getResult.toByteArray
      }
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] = mergeB(acc, x)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeB(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union-merge theta blobs and finish with the distinct estimate. */
  private object ThetaUnionEstAgg
      extends Aggregator[Array[Byte], Array[Byte], Double] {
    def zero: Array[Byte] = ThetaUnionAgg.zero
    def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] =
      ThetaUnionAgg.reduce(acc, x)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      ThetaUnionAgg.merge(a, b)
    def finish(r: Array[Byte]): Double =
      if (r.isEmpty) 0.0
      else Sketches.wrapSketch(Memory.wrap(r)).getEstimate
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Intersect theta blobs and finish with the distinct estimate of
    * the intersection — the set operation HLL cannot do. The empty
    * blob is the "no sketch yet" identity (a real empty sketch still
    * serializes to >0 bytes, so the two are never confused). */
  private object ThetaIntersectEstAgg
      extends Aggregator[Array[Byte], Array[Byte], Double] {
    private def inter(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val i = SetOperation.builder().buildIntersection()
        i.intersect(Sketches.wrapSketch(Memory.wrap(a)))
        i.intersect(Sketches.wrapSketch(Memory.wrap(b)))
        i.getResult.toByteArray
      }
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] = inter(acc, x)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inter(a, b)
    def finish(r: Array[Byte]): Double =
      if (r.isEmpty) 0.0
      else Sketches.wrapSketch(Memory.wrap(r)).getEstimate
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column aggregate: union theta blobs into one blob. */
  def thetaUnion(sketch: Column): Column = udaf(ThetaUnionAgg).apply(sketch)

  /** Column aggregate: union theta blobs, estimate distinct count. */
  def thetaUnionEstimate(sketch: Column): Column =
    udaf(ThetaUnionEstAgg).apply(sketch)

  /** Column aggregate: intersect theta blobs, estimate the distinct
    * count of the intersection. */
  def thetaIntersectEstimate(sketch: Column): Column =
    udaf(ThetaIntersectEstAgg).apply(sketch)

  /** Per-key theta sketches of distinct `valueCol` (cast to long) —
    * the mergeable distinct-count state with full SET ALGEBRA: unlike
    * HLL (union-only, q140), theta sketches intersect, so
    * audience-overlap questions ("users who did A and B") are
    * answered from per-segment sketches without rescanning the fact.
    *
    * Build shape mirrors [[kllBy]]: one `mapPartitions` pass holds a
    * local key→UpdateSketch map and emits ONE compact blob per
    * partition×key (the map-side combine; ≤ 4096 retained hashes each
    * at the default lgK), then a single aggregate unions blobs per
    * key. The shuffle carries sketches, not values. Downstream set
    * ops run over the per-key sketch table — rows bounded by KEY
    * cardinality, independent of fact size. */
  def thetaBy(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(keyCol).cast("string"), col(valueCol).cast("long"))
      .as[(String, Long)]
    val local = pairs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, UpdateSketch]()
      it.foreach { case (key, v) =>
        m.getOrElseUpdate(key, UpdateSketch.builder().build()).update(v)
      }
      m.iterator.map { case (key, sk) =>
        (key, sk.compact().toByteArray)
      }
    }.toDF(keyCol, "sketch")
    local.groupBy(col(keyCol)).agg(thetaUnion(col("sketch")).as("sketch"))
  }
}
