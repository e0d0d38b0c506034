package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Scd2, Similarity}
import graft.stage.Staging

/** Property-based invariants over ScalaCheck generators (sampled with
  * fixed seeds — deterministic CI): SCD2 well-formedness for arbitrary
  * change logs, dedup cardinality, TopK vs reference sort. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val changeLogGen: Gen[List[(String, Int, Int)]] =
    Gen.listOfN(60, for {
      key <- Gen.oneOf("a", "b", "c", "d")
      ts <- Gen.choose(0, 20) // deliberately collides: tie-break matters
      tie <- Gen.choose(0, 1000000)
    } yield (key, ts, tie))

  test("SCD2 invariants hold for arbitrary change logs") {
    for (log <- samples(changeLogGen, 8) if log.nonEmpty) {
      val df = log.toDF("key", "ts", "tie")
      val dim = Scd2.build(df, Seq("key"), "ts", Seq("tie")).cache()
      // exactly one current row per key
      assert(Scd2.currentViolations(dim, Seq("key")).isEmpty)
      // no overlapping intervals
      assert(Scd2.overlapViolations(dim, Seq("key")).isEmpty)
      // row conservation: every change becomes exactly one version
      assert(dim.count() == log.size)
      // versions are dense 1..n per key
      val maxV = dim.groupBy("key").agg(
        max("version").as("mx"), count(lit(1)).as("n"))
      assert(maxV.filter($"mx" =!= $"n").isEmpty)
      dim.unpersist()
    }
  }

  test("dedupLatest emits exactly one row per distinct key") {
    for (log <- samples(changeLogGen, 8) if log.nonEmpty) {
      val df = log.toDF("key", "ts", "tie")
      val out = Staging.dedupLatest(df, Seq("key"), col("ts"),
        Seq(col("tie")))
      assert(out.count() == log.map(_._1).distinct.size)
    }
  }

  test("SCD2 incremental merge equals a full rebuild") {
    for (log <- samples(changeLogGen, 6) if log.size > 10) {
      val (h1, h2) = log.splitAt(log.size / 2)
      def shape(d: org.apache.spark.sql.DataFrame) =
        rows(d.select("key", "ts", "tie", "valid_from", "valid_to",
          "is_current", "version"))
          .map(_.toSeq).sortBy(_.mkString("|"))
      val merged = Scd2.merge(
        Scd2.build(h1.toDF("key", "ts", "tie"), Seq("key"), "ts",
          Seq("tie")),
        h2.toDF("key", "ts", "tie"), Seq("key"), "ts", Seq("tie"))
      val full = Scd2.build(log.toDF("key", "ts", "tie"), Seq("key"),
        "ts", Seq("tie"))
      assert(shape(merged) == shape(full))
    }
  }

  test("asOfJoin: exactly one version matches any covered fact ts") {
    for ((log, i) <- samples(changeLogGen, 4).zipWithIndex
        if log.nonEmpty) {
      // distinct (key, ts) so versions have distinct valid_from values
      val changes = log.map { case (k, ts, _) => (k, ts) }.distinct
      // dim's change column named apart from the fact's ts so the
      // post-join assertions are unambiguous
      val dim = Scd2.build(changes.toDF("key", "cts"), Seq("key"), "cts")
      val facts = (0 to 25).flatMap(t =>
        Seq("a", "b", "c", "d").map(k => (k, t, s"f$i-$k-$t")))
        .toDF("key", "ts", "fact_id")
      val joined = Scd2.asOfJoin(facts, dim, Seq("key"), "ts")
      // uniqueness: no fact ever matches two versions
      assert(joined.groupBy("fact_id").count()
        .filter($"count" > 1).isEmpty)
      // coverage: a fact matches iff its ts >= the key's first version
      val firstSeen = changes.groupBy(_._1).view.mapValues(_.map(_._2).min)
      val expected = (0 to 25).flatMap(t =>
        Seq("a", "b", "c", "d").filter(k =>
          firstSeen.get(k).exists(t >= _)).map(k => (k, t))).size
      assert(joined.count() == expected)
      // correctness: the matched interval contains the fact ts
      assert(joined.filter(!($"ts" >= $"valid_from" &&
        ($"valid_to".isNull || $"ts" < $"valid_to"))).isEmpty)
    }
  }

  test("dedupLatestAgg equals the window dedup for arbitrary logs") {
    for (log <- samples(changeLogGen, 8) if log.nonEmpty) {
      val df = log.toDF("key", "ts", "tie")
      def shape(d: org.apache.spark.sql.DataFrame) =
        rows(d.orderBy("key"))
          .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      assert(shape(Staging.dedupLatestAgg(df, Seq("key"), col("ts"),
        Seq(col("tie")))) ==
        shape(Staging.dedupLatest(df, Seq("key"), col("ts"),
          Seq(col("tie")))))
    }
  }

  test("TopK aggregator equals sort-take for any input order and k") {
    val scoredGen = Gen.listOfN(50, for {
      id <- Gen.choose(0L, 30L)
      s <- Gen.choose(-100, 100)
    } yield Similarity.Scored(id, s / 10.0))
    for (xs <- samples(scoredGen, 20); k <- Seq(1, 3, 8)) {
      val agg = new Similarity.TopK(k)
      // split arbitrarily, reduce both halves, merge
      val (l, r) = xs.splitAt(xs.size / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      val expected = xs.sortBy(x => (-x.score, x.id)).take(k)
      assert(merged.ids == expected.map(_.id))
      assert(merged.scores == expected.map(_.score))
    }
  }

  private val batchesGen: Gen[List[List[(String, String, Long)]]] =
    Gen.listOfN(5, Gen.listOfN(6, for {
      p <- Gen.oneOf("p1", "p2", "p3")
      k <- Gen.oneOf("k1", "k2")
      v <- Gen.choose(1L, 9L)
    } yield (p, k, v)))

  test("aggIncremental with history folds equals the full aggregate " +
      "for arbitrary batch sequences and fold cadences") {
    import graft.sources.Materialize
    for ((batches, ci) <- samples(batchesGen, 4).zipWithIndex) {
      val name = s"prop_aggfold_$ci"
      Materialize.dropAggState(spark, name)
      val foldEvery = ci % 4 // 0 (never folds) through 3
      batches.zipWithIndex.foreach { case (b, i) =>
        if (b.nonEmpty)
          Materialize.aggIncremental(spark, name, b.toDF("p", "k", "v"),
            Seq("p", "k"), "p", f"b$i%03d", foldEvery = foldEvery)
      }
      val want = batches.flatten.groupBy(x => (x._1, x._2))
        .map { case ((p, k), xs) => (p, k, xs.map(_._3).sum) }.toSet
      def got() = rows(spark.table(name).select("p", "k", "v"))
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got() == want, s"case $ci foldEvery=$foldEvery")
      if (foldEvery > 0) {
        // at rest: ≤ foldEvery unfolded (no trip) or fold+current
        val perPart = rows(spark.table(s"${name}__partials")
          .select("p", "__batch").distinct())
          .map(r => (r.getString(0), r.getString(1)))
          .groupBy(_._1).map(_._2.size)
        assert(perPart.max <= foldEvery + 1,
          s"case $ci: ${perPart.max} slices > ${foldEvery + 1}")
      }
      // replaying the newest batch (the only one an at-least-once
      // source can redeliver — the fold watermark trails it) no-ops
      batches.zipWithIndex.reverse.find(_._1.nonEmpty).foreach {
        case (b, i) =>
          Materialize.aggIncremental(spark, name, b.toDF("p", "k", "v"),
            Seq("p", "k"), "p", f"b$i%03d", foldEvery = foldEvery)
      }
      assert(got() == want, s"case $ci replay moved content")
      Materialize.dropAggState(spark, name)
    }
  }

  /** One interleaved lifecycle op: a partial batch, a key erasure, or
    * an explicit history fold. */
  private val aggOpsGen: Gen[List[Either[List[(String, String, Long)],
      Either[List[String], Unit]]]] =
    Gen.listOfN(8, Gen.frequency(
      5 -> (for {
        rows <- Gen.listOfN(5, for {
          p <- Gen.oneOf("p1", "p2", "p3")
          k <- Gen.oneOf("k1", "k2", "k3")
          v <- Gen.choose(1L, 9L)
        } yield (p, k, v))
      } yield Left(rows)),
      2 -> Gen.someOf(Seq("k1", "k2", "k3"))
        .map(ks => Right(Left(ks.toList))),
      2 -> Gen.const(Right(Right(())))))

  test("interleaved aggIncremental batches, folds, and key erasures " +
      "converge to the replayed model for any order and fold cadence") {
    import graft.sources.Materialize
    var liveErases = 0
    var liveFolds = 0
    for ((ops, ci) <- samples(aggOpsGen, 4).zipWithIndex) {
      // three engines over the SAME op sequence: no folding, the
      // automatic foldEvery cadence, and a fold forced after every op
      // — content must be cadence-invariant AND match the model
      val variants = Seq(("n", 0, false), ("c", 2, false), ("f", 0, true))
      val model =
        scala.collection.mutable.Map.empty[(String, String), Long]
      var applied = 0
      for ((op, oi) <- ops.zipWithIndex) {
        val bid = f"b$oi%03d"
        op match {
          case Left(rows) if rows.nonEmpty =>
            for ((tag, fe, _) <- variants)
              Materialize.aggIncremental(spark,
                s"prop_aggmix_${ci}_$tag", rows.toDF("p", "k", "v"),
                Seq("p", "k"), "p", bid, foldEvery = fe)
            rows.foreach { case (p, k, v) =>
              model((p, k)) = model.getOrElse((p, k), 0L) + v }
            applied += 1
          case Left(_) => ()
          case Right(Left(ks)) if ks.nonEmpty && applied > 0 =>
            for ((tag, _, _) <- variants)
              Materialize.eraseAggKeys(spark, s"prop_aggmix_${ci}_$tag",
                "k", ks.toDF("k"), "p")
            model.keys.filter(pk => ks.contains(pk._2)).toList
              .foreach(model.remove)
            liveErases += 1
          case Right(Left(_)) => ()
          case Right(Right(())) if applied > 0 =>
            // explicit fold variant only; watermark = everything so far
            Materialize.checkpointPartials(spark,
              s"prop_aggmix_${ci}_f", Seq("p", "k"), "p", bid)
            liveFolds += 1
          case Right(Right(())) => ()
        }
      }
      val want = model.map { case ((p, k), v) => (p, k, v) }.toSet
      for ((tag, fe, _) <- variants) {
        val name = s"prop_aggmix_${ci}_$tag"
        if (applied > 0) {
          val got = rows(spark.table(name).select("p", "k", "v"))
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
            .toSet
          assert(got == want,
            s"case $ci variant $tag (foldEvery=$fe) diverged")
        }
        Materialize.dropAggState(spark, name)
      }
    }
    // the generator must have exercised both op kinds against live
    // state — a fold-free or erase-free pass would prove nothing new
    assert(liveErases > 0 && liveFolds > 0,
      s"vacuous fixture: $liveErases erases, $liveFolds folds")
  }
}
