package graft

import org.apache.spark.sql.functions._

import graft.quality.{NotNull, Unique}
import graft.sources.Materialize

/** Multi-table all-or-nothing publish ([[Materialize.publishSetAudited]]
  * / [[Materialize.recoverSet]]): one failing audit anywhere must keep
  * EVERY previous version serving; a crash at ANY swap point must
  * recover to ONE consistent generation (never a fresh mart beside its
  * stale sibling); recovery is idempotent and a retry lands the new
  * generation. Fault injection drives the REAL swap sequence, not a
  * hand-modeled state. */
class PublishSetSpec extends SparkSpec {
  import spark.implicits._

  private def gen(k: Long, g: Int) = Seq((k, g.toLong)).toDF("k", "v")

  private def reset(names: Seq[String], set: String): Unit = {
    (names.flatMap(n => Seq(n, s"${n}__staging", s"${n}__prev")) :+
      s"${set}__swapping")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  private def generation(n: String): Option[Long] =
    if (spark.catalog.tableExists(n))
      Some(spark.table(n).head().getLong(1))
    else None

  test("a failing audit anywhere publishes NOTHING") {
    val names = Seq("pset_a1", "pset_a2")
    reset(names, "pset_a")
    val (ok0, _) = Materialize.publishSetAudited("pset_a", Seq(
      (gen(1, 1), names(0), Seq(NotNull("k"))),
      (gen(2, 1), names(1), Seq(NotNull("k")))))
    assert(ok0)
    val bad = Seq((Option.empty[Long], 2L)).toDF("k", "v")
    val (ok1, results) = Materialize.publishSetAudited("pset_a", Seq(
      (gen(1, 2), names(0), Seq(NotNull("k"))),
      (bad, names(1), Seq(NotNull("k")))))
    assert(!ok1)
    assert(results.find(_._1 == names(0)).get._2.forall(_.passed))
    assert(!results.find(_._1 == names(1)).get._2.forall(_.passed))
    // both keep generation 1; no staging debris; next publish works
    assert(names.map(generation) == Seq(Some(1L), Some(1L)))
    names.foreach(n =>
      assert(!spark.catalog.tableExists(s"${n}__staging")))
    val (ok2, _) = Materialize.publishSetAudited("pset_a", Seq(
      (gen(1, 3), names(0), Seq(NotNull("k"))),
      (gen(2, 3), names(1), Seq(NotNull("k")))))
    assert(ok2 && names.map(generation) == Seq(Some(3L), Some(3L)))
  }

  test("an EMPTY staged table is refused when the suite carries " +
      "NonEmpty — row-level audits alone pass it vacuously") {
    import graft.quality.NonEmpty
    val names = Seq("pset_e1", "pset_e2")
    reset(names, "pset_e")
    val (ok0, _) = Materialize.publishSetAudited("pset_e", Seq(
      (gen(1, 1), names(0), Seq(NonEmpty(), NotNull("k"))),
      (gen(2, 1), names(1), Seq(NonEmpty(), NotNull("k")))))
    assert(ok0)
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    // without NonEmpty the vacuity gap is real: an empty staging
    // passes NotNull+Unique and would replace the serving version
    val (okVacuous, rVac) = Materialize.publishSetAudited("pset_e", Seq(
      (gen(1, 2), names(0), Seq(NotNull("k"), Unique(Seq("k")))),
      (empty, names(1), Seq(NotNull("k"), Unique(Seq("k"))))))
    assert(okVacuous && rVac.forall(_._2.forall(_.passed)))
    assert(spark.table(names(1)).isEmpty) // the empty table IS serving
    // with NonEmpty the same publish is refused and BOTH tables keep
    // (or restore) the previous generation — all-or-nothing
    reset(names, "pset_e")
    val (okSeed, _) = Materialize.publishSetAudited("pset_e", Seq(
      (gen(1, 1), names(0), Seq(NonEmpty())),
      (gen(2, 1), names(1), Seq(NonEmpty()))))
    assert(okSeed)
    val (ok1, results) = Materialize.publishSetAudited("pset_e", Seq(
      (gen(1, 2), names(0), Seq(NonEmpty())),
      (empty, names(1), Seq(NonEmpty()))))
    assert(!ok1)
    assert(results.find(_._1 == names(1)).get._2
      .exists(r => r.check == "non_empty" && !r.passed))
    assert(names.map(generation) == Seq(Some(1L), Some(1L)))
  }

  test("a crash at every swap point recovers to ONE consistent " +
      "generation, idempotently, and a retry lands the new one") {
    // 2 tables → injection points: after swap 0 (mixed on disk!),
    // after swap 1 (all swapped), after all swaps pre-cleanup
    for (k <- 0 to 2) {
      val names = Seq("pset_c1", "pset_c2")
      reset(names, "pset_c")
      val clean = Materialize.publishSetAudited("pset_c", Seq(
        (gen(1, 1), names(0), Seq(NotNull("k"), Unique(Seq("k")))),
        (gen(2, 1), names(1), Seq(NotNull("k")))))
      assert(clean._1)
      intercept[Materialize.CrashInjected] {
        Materialize.publishSetAudited("pset_c", Seq(
          (gen(1, 2), names(0), Seq(NotNull("k"))),
          (gen(2, 2), names(1), Seq(NotNull("k")))),
          crashAfterSwap = k)
      }
      val dir = Materialize.recoverSet(spark, "pset_c", names)
      val expected = if (k == 0) ("back", 1L) else ("forward", 2L)
      assert(dir == expected._1, s"k=$k")
      // the set is consistent: BOTH tables at the same generation
      assert(names.map(generation) ==
        Seq(Some(expected._2), Some(expected._2)), s"k=$k")
      // no debris survives recovery
      names.foreach { n =>
        assert(!spark.catalog.tableExists(s"${n}__staging"), s"k=$k")
        assert(!spark.catalog.tableExists(s"${n}__prev"), s"k=$k")
      }
      assert(!spark.catalog.tableExists("pset_c__swapping"), s"k=$k")
      // idempotent: a second recovery is a no-op
      assert(Materialize.recoverSet(spark, "pset_c", names) == "noop")
      // a retry publishes the crashed generation cleanly
      val retry = Materialize.publishSetAudited("pset_c", Seq(
        (gen(1, 2), names(0), Seq(NotNull("k"))),
        (gen(2, 2), names(1), Seq(NotNull("k")))))
      assert(retry._1 &&
        names.map(generation) == Seq(Some(2L), Some(2L)), s"k=$k")
    }
  }

  test("a FIRST publish crashed mid-swap rolls back to unpublished") {
    val names = Seq("pset_f1", "pset_f2")
    reset(names, "pset_f")
    intercept[Materialize.CrashInjected] {
      Materialize.publishSetAudited("pset_f", Seq(
        (gen(1, 1), names(0), Seq(NotNull("k"))),
        (gen(2, 1), names(1), Seq(NotNull("k")))),
        crashAfterSwap = 0)
    }
    assert(Materialize.recoverSet(spark, "pset_f", names) == "back")
    names.foreach(n => assert(!spark.catalog.tableExists(n)))
    // an unrecovered marker refuses the next publish loudly
    reset(names, "pset_f")
    intercept[Materialize.CrashInjected] {
      Materialize.publishSetAudited("pset_f", Seq(
        (gen(1, 1), names(0), Seq(NotNull("k")))), crashAfterSwap = 0)
    }
    val e = intercept[IllegalStateException] {
      Materialize.publishSetAudited("pset_f", Seq(
        (gen(1, 2), names(0), Seq(NotNull("k")))))
    }
    assert(e.getMessage.contains("recoverSet"))
    assert(Materialize.recoverSet(spark, "pset_f", names.take(1))
      == "forward") // the single table fully swapped before the crash
  }

  test("a second publisher racing a live one is refused loudly and " +
      "damages nothing") {
    // the long-running-driver scenario: session B starts a publish of
    // the same set while session A holds the marker mid-publish. The
    // marker is taken ATOMICALLY as step 1 (before any staging), so B
    // cannot stage over A's stagings — B fails fast, A's in-flight
    // state is untouched, and A's publish completes normally.
    val names = Seq("pset_race1")
    reset(names, "pset_race")
    // publisher A: establish a served generation first
    val (ok0, _) = Materialize.publishSetAudited("pset_race", Seq(
      (gen(1, 1), names(0), Seq(NotNull("k")))))
    assert(ok0)
    // simulate A mid-publish: marker held, staging written (the state
    // between steps 2 and 4)
    spark.sql(
      "CREATE TABLE pset_race__swapping (committed INT) USING parquet")
    Materialize.table(gen(2, 1), s"${names(0)}__staging")
    val aStaging = rows(spark.table(s"${names(0)}__staging"))
    // publisher B: refused at the mutex, before staging anything
    val e = intercept[IllegalStateException] {
      Materialize.publishSetAudited("pset_race", Seq(
        (gen(3, 1), names(0), Seq(NotNull("k")))))
    }
    assert(e.getMessage.contains("concurrent"))
    // nothing of A's was damaged: marker still held, staging intact,
    // the served generation untouched
    assert(spark.catalog.tableExists("pset_race__swapping"))
    assert(rows(spark.table(s"${names(0)}__staging")) == aStaging)
    assert(rows(spark.table(names(0))).nonEmpty)
    // A finishes: its crash-recovery path completes the swap
    assert(Materialize.recoverSet(spark, "pset_race", names) == "back")
    // and a retry of the publish lands cleanly after the marker frees
    val (ok1, _) = Materialize.publishSetAudited("pset_race", Seq(
      (gen(2, 1), names(0), Seq(NotNull("k")))))
    assert(ok1)
    reset(names, "pset_race")
  }

  test("a failing audit releases the marker so the next publish can " +
      "proceed") {
    val names = Seq("pset_aud1")
    reset(names, "pset_aud")
    val bad = Seq((Option.empty[Long], 1L)).toDF("k", "v")
    val (ok0, _) = Materialize.publishSetAudited("pset_aud", Seq(
      (bad, names(0), Seq(NotNull("k")))))
    assert(!ok0)
    assert(!spark.catalog.tableExists("pset_aud__swapping"))
    // the gate is free: a clean publish right after succeeds
    val (ok1, _) = Materialize.publishSetAudited("pset_aud", Seq(
      (gen(1, 1), names(0), Seq(NotNull("k")))))
    assert(ok1)
    reset(names, "pset_aud")
  }
}
