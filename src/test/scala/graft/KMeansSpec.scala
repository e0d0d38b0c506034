package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "v")
      .select(col("vec_id"),
        KMeans.quantize(transform(col("v"), x => x.cast("float"))).as("vq"))

  test("initCentroids is deterministic, in [-1, 1], and mirrors md5Long") {
    val a = KMeans.initCentroids(3, dims)
    val b = KMeans.initCentroids(3, dims)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x >= -1.0 && x <= 1.0))
    // the driver-side hash must equal the Spark-side md5Long formula
    val sparkHash = spark.range(1)
      .select(graft.functions.Functions.md5Long(lit("km:0:0")))
      .head().getLong(0)
    assert(KMeans.hash60("km:0:0") == sparkHash)
  }

  test("fit recovers exact means of well-separated blobs") {
    // two blobs far apart; every init centroid is in [-1,1]^4, so one
    // iteration separates them and the second fixes the exact means
    val blobA = Seq.tabulate(5)(i =>
      (i.toLong, Seq(10.0 + i, 10.0, 10.0, 10.0)))
    val blobB = Seq.tabulate(5)(i =>
      (100L + i, Seq(-10.0 - i, -10.0, -10.0, -10.0)))
    val df = vecs(blobA ++ blobB).persist()
    val cents = KMeans.fit(df, "vq", 2, dims, 3)
    // exact integer-grid means: (10+11+12+13+14)/5 = 12, etc.
    val got = cents.map(_.toSeq).sortBy(_.head)
    assert(got(0) == Seq(-12.0, -10.0, -10.0, -10.0))
    assert(got(1) == Seq(12.0, 10.0, 10.0, 10.0))
    df.unpersist()
  }

  test("fit is bit-deterministic across repeated runs") {
    val data = Seq.tabulate(20)(i =>
      (i.toLong, Seq(math.sin(i.toDouble), math.cos(i.toDouble),
        math.sin(i * 2.0), math.cos(i * 3.0))))
    val df = vecs(data).persist()
    val a = KMeans.fit(df, "vq", 3, dims, 3)
    val b = KMeans.fit(df, "vq", 3, dims, 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    df.unpersist()
  }

  test("withCellDist2 yields the runner-up distance; ties carry the " +
      "tied distance") {
    val cents = Array(Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 0.0, 0.0, 0.0))
    // point at x=1: own cell 0 (d²=1), runner-up cell 1 (d²=81)
    val r = rows(KMeans.withCellDist2(
      vecs(Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)))), "vq", cents)).head
    assert(r.getAs[Int]("__cell") == 0)
    assert(r.getAs[Double]("__kdist") == 1.0)
    assert(r.getAs[Double]("__kdist2") == 81.0)
    // equidistant point at x=5: first-wins cell 0, runner-up ties at 25
    val t = rows(KMeans.withCellDist2(
      vecs(Seq((2L, Seq(5.0, 0.0, 0.0, 0.0)))), "vq", cents)).head
    assert(t.getAs[Int]("__cell") == 0)
    assert(t.getAs[Double]("__kdist") == 25.0)
    assert(t.getAs[Double]("__kdist2") == 25.0)
  }

  test("empty clusters keep their init centroid") {
    // all points identical → they all land in ONE cell; the other
    // centroids must remain exactly the hash init
    val df = vecs(Seq.tabulate(4)(i => (i.toLong, Seq(5.0, 5.0, 5.0, 5.0))))
    val cents = KMeans.fit(df, "vq", 3, dims, 2)
    val init = KMeans.initCentroids(3, dims)
    val moved = cents.indices.filter(m =>
      cents(m).toSeq != init(m).toSeq)
    assert(moved.size == 1)
    assert(cents(moved.head).toSeq == Seq(5.0, 5.0, 5.0, 5.0))
  }

  test("both assignment forms are bit-identical at the same k, and " +
      "the form switch at SmallK changes nothing") {
    // the engine picks the assignment form by k (codegen column fold
    // at k <= SmallK, the O(1)-plan typedlit+HOF array above); both
    // compute the exact distTo fold sequence, so distances, cells,
    // runner-ups, and probe lists must be BIT-identical — including
    // on ties (both crafted tie rows below land between centroids)
    val data = Seq.tabulate(40)(i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.9),
        math.sin(i * 2.3), math.cos(i * 3.1)))) ++
      Seq((100L, Seq(5.0, 0.0, 0.0, 0.0)),   // tie between cells 0/1
        (101L, Seq(0.0, 5.0, 0.0, 0.0)))
    val df = vecs(data).persist()
    // k on BOTH sides of the threshold: SmallK (column form) and
    // SmallK+1 (HOF form) — and at each k, force the HOF form and
    // require equality with whatever the public pick produced
    for (k <- Seq(2, KMeans.SmallK, KMeans.SmallK + 1)) {
      val cents = KMeans.initCentroids(k, dims)
        .updated(0, Array(5.0, 5.0, 0.0, 0.0)) // makes the ties real
      def all(): Seq[Seq[Any]] = {
        val d2 = KMeans.withCellDist2(df, "vq", cents)
        val pn = KMeans.withCellN(df, "vq", cents, math.min(4, k))
        rows(KMeans.withCellDist(df, "vq", cents)
          .join(d2.select(col("vec_id"), col("__kdist2"),
            col("__cell").as("__cell_b")), Seq("vec_id"))
          .join(pn.drop("__kdist", "__cell"), Seq("vec_id"))
          .orderBy(col("vec_id"))).map(_.toSeq)
      }
      val picked = all()
      KMeans.forceHof = true
      val hof = try all() finally KMeans.forceHof = false
      assert(picked == hof, s"forms diverged at k=$k")
      assert(picked.nonEmpty && picked.size == data.size)
    }
    df.unpersist()
    ()
  }

  test("assignment is the argmin cell with first-wins ties") {
    val df = vecs(Seq((1L, Seq(1.0, 0.0, 0.0, 0.0))))
    val cents = Array(
      Array(9.0, 9.0, 9.0, 9.0),
      Array(1.0, 0.0, 0.0, 0.0), // exact match
      Array(1.0, 0.0, 0.0, 0.0)) // tie → first wins
    val r = KMeans.withCellDist(df, "vq", cents).select("__cell", "__kdist")
      .head()
    assert(r.getInt(0) == 1)
    assert(r.getDouble(1) == 0.0)
  }
}
