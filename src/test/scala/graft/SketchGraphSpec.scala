package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Sketch}

class SketchGraphSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ Sketch

  private val CmD = 4
  private val CmW = 64

  private def keyed(n: Int) =
    // key i appears i+1 times → known exact counts 1..n
    (0 until n).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("k")

  test("Count-Min estimates never undercount, and total mass is exact") {
    val df = keyed(30)
    val sk = Sketch.countMin(df, col("k"), CmD, CmW)
    // every hash row holds the full stream mass
    val perRow = rows(sk.groupBy("__r").agg(sum("__c").as("m")))
      .map(r => r.getLong(1))
    assert(perRow.size == CmD && perRow.forall(_ == 30 * 31 / 2))
    val keys = df.distinct()
    val est = rows(Sketch.estimate(sk, keys, "k", CmD, CmW))
      .map(r => r.getString(0).drop(1).toInt -> r.getLong(1)).toMap
    (0 until 30).foreach { i =>
      assert(est(i) >= i + 1, s"k$i underestimated: ${est(i)}")
    }
  }

  test("Count-Min cells are invariant to input partitioning") {
    val df = keyed(30)
    def cells(d: org.apache.spark.sql.DataFrame) =
      rows(Sketch.countMin(d, col("k"), CmD, CmW))
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(cells(df.repartition(7)) == cells(df.coalesce(1)))
  }

  // ------------------------------------------------------------- Graph

  /** Driver-side replica of the fixed-point update — the reference
    * implementation the distributed operator must match exactly. */
  private def prReference(edges: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = nodes.map { nd =>
        nd -> ((15L * (Graph.Scale / n)) / 100 +
          (85L * in.getOrElse(nd, 0L)) / 100)
      }.toMap
    }
    pr
  }

  private def undirected(pairs: (String, String)*): Seq[(String, String)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("pageRankFixed: a symmetric pair stays at the uniform fixpoint") {
    val e = undirected(("a", "b")).toDF("src", "dst")
    val got = rows(Graph.pageRankFixed(e, 3))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> Graph.Scale / 2, "b" -> Graph.Scale / 2))
    graft.operators.InternalCache.release()
  }

  test("pageRankFixed matches the integer reference on a star + chain") {
    val edges = undirected(("c", "l1"), ("c", "l2"), ("c", "l3"),
      ("c", "l4"), ("l4", "t1"), ("t1", "t2"))
    val got = rows(Graph.pageRankFixed(edges.toDF("src", "dst"), 3))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == prReference(edges, 3))
    // the hub outranks leaves; ranks are exact integers, no tolerance
    assert(got("c") > got("l1"))
    graft.operators.InternalCache.release()
  }

  test("pageRankFixed is invariant to edge partitioning") {
    val edges = undirected(("c", "l1"), ("c", "l2"), ("l2", "l3"))
    def run(df: org.apache.spark.sql.DataFrame) = {
      val r = rows(Graph.pageRankFixed(df, 3))
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      graft.operators.InternalCache.release()
      r
    }
    assert(run(edges.toDF("src", "dst").repartition(5)) ==
      run(edges.toDF("src", "dst").coalesce(1)))
  }

  // ------------------------------------------------------------ Theta

  test("theta: exact-mode estimates, set algebra, partition invariance") {
    // two keys with a known overlap, both under the 4096 exact-mode cap
    val a = (0 until 300).map(i => ("a", i.toLong))
    val b = (200 until 500).map(i => ("b", i.toLong))
    val df = (a ++ b ++ a ++ b).toDF("k", "v") // duplicates must not count
    def est(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val sk = Sketch.thetaBy(d, "k", "v")
      val r = sk.select(col("sketch"))
        .agg(Sketch.thetaUnionEstimate(col("sketch")).as("u"),
          Sketch.thetaIntersectEstimate(col("sketch")).as("i"))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (u, i) = est(df.repartition(7))
    assert(u == 500.0, s"union estimate $u") // exact mode below lgK cap
    assert(i == 100.0, s"intersect estimate $i")
    assert(est(df.coalesce(1)) == ((u, i)))
  }

  // ------------------------------------------------------------ BFS

  /** Driver-side reference BFS over an adjacency list. */
  private def bfsReference(edges: Seq[(String, String)],
      seeds: Set[String], maxHops: Int): Map[String, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("bfsHops matches the reference BFS on a random graph and is " +
      "partitioning-invariant") {
    val rnd = new scala.util.Random(42)
    val nodes = (0 until 40).map(i => s"n$i")
    val base = Seq.tabulate(70)(_ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
      .filter(p => p._1 != p._2).distinct
    val edges = undirected(base: _*)
    val seeds = Set("n0", "n7")
    val expect = bfsReference(edges, seeds, 3)
    def run(parts: Int) = {
      val got = rows(Graph.bfsHops(
          edges.toDF("src", "dst").repartition(parts),
          seeds.toSeq.toDF("node"), 3))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.operators.InternalCache.release()
      got
    }
    assert(run(7) == expect)
    assert(run(1) == expect)
  }

  test("bfsHops: hop counts are monotone covers — seeds at hop 0, " +
      "no node appears twice") {
    val edges = undirected(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val got = rows(Graph.bfsHops(edges.toDF("src", "dst"),
        Seq("a").toDF("node"), 2))
      .map(r => r.getString(0) -> r.getLong(1))
    graft.operators.InternalCache.release()
    assert(got.map(_._1).distinct.size == got.size)
    assert(got.toMap == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  // ------------------------------------------------------ rendezvous

  test("rendezvousShard: deterministic, bounded, and growing the " +
      "fleet only moves keys onto the new shard") {
    import graft.functions.Functions.rendezvousShard
    val ids = (0L until 2000L).toDF("id")
      .select(col("id"), rendezvousShard(col("id"), 8).as("s8"),
        rendezvousShard(col("id"), 9).as("s9"))
    val r = rows(ids)
    assert(r.forall(x => x.getLong(1) >= 0 && x.getLong(1) < 8))
    assert(r.forall(x => x.getLong(2) >= 0 && x.getLong(2) < 9))
    // every mover lands on the NEW shard (HRW's defining property)
    val movers = r.filter(x => x.getLong(1) != x.getLong(2))
    assert(movers.nonEmpty && movers.forall(_.getLong(2) == 8))
    // movement fraction ≈ 1/9 of keys (loose band: 5%..20%)
    val frac = movers.size.toDouble / r.size
    assert(frac > 0.05 && frac < 0.20, s"moved fraction $frac")
    // partitioning invariance: row-local expression, same assignment
    val again = rows((0L until 2000L).toDF("id").repartition(13)
      .select(col("id"), rendezvousShard(col("id"), 8).as("s8")))
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.map(x => x.getLong(0) -> x.getLong(1)).toMap == again)
  }

  // ------------------------------------------------------------ kCore

  test("kCore: a pendant tail peels off, the clique survives intact") {
    // K4 on 1-4 plus the tail 4-5-6: 5 and 6 never reach degree 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val core = rows(Graph.kCore(edges, 3, 8))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.operators.InternalCache.release()
    assert(core == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
  }

  test("kCore: cascading peel dissolves a path entirely, within the " +
      "round budget") {
    // path 1-2-3-4-5 under k = 2: ends peel first, then the middle —
    // needs MULTIPLE rounds, converges to empty before round 8
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val core = rows(Graph.kCore(edges, 2, 8))
    graft.operators.InternalCache.release()
    assert(core.isEmpty)
    // and a 4-cycle under k = 2 is its own core (every node at deg 2)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val kept = rows(Graph.kCore(cyc, 2, 8))
    graft.operators.InternalCache.release()
    assert(kept.size == 4)
  }

  test("kCore: reliable checkpoint snapshots are reclaimed round by " +
      "round, only the final round's survives") {
    // with a checkpoint dir configured each round writes a DFS
    // snapshot the ContextCleaner never reclaims — the operator must
    // delete round N-1's dir once round N materializes, or a
    // long-running session leaks one snapshot per round
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      // a 5-path under k=2 peels over MULTIPLE rounds (ends first,
      // then middle) so several snapshots are written and reclaimed
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
        .toDF("a", "b")
      val core = Graph.kCore(edges, 2, 8)
      val remaining = {
        val s = java.nio.file.Files.walk(dir)
        try s.filter(p => p.getFileName.toString.startsWith("rdd-"))
          .count()
        finally s.close()
      }
      assert(remaining <= 1, s"leaked $remaining checkpoint snapshots")
      // the returned frame still reads from its surviving snapshot
      assert(rows(core).isEmpty)
    } finally {
      graft.operators.InternalCache.release()
      // restore the no-checkpoint-dir default for the shared session
      // (private[spark] var -> public setter at bytecode level)
      spark.sparkContext.getClass
        .getMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(spark.sparkContext, None)
    }
  }
}
