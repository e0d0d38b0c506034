package graft

/** q248's sliding-window duplicated-span scrub, pinned on a
  * closed-form corpus: coverage must be EXACTLY the repeated spans
  * (no bleed into the unique neighbors), a span straddling q175's
  * 10-token tile boundary is still fully covered (the case fixed
  * tiling misses), a window repeated WITHIN one document is scrubbed
  * at both occurrences, and the rebuilt-document checksum matches a
  * driver-side reconstruction token for token. */
class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private def tok(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("scrub covers exactly the repeated spans, straddling tile " +
      "boundaries and within-doc repeats, and rebuilds the survivors") {
    val span = tok("s", 12) // one shared 12-token span → 3 windows/doc
    val a = tok("fa", 5) ++ span ++ tok("ga", 13) // span at 5..16
    val b = tok("fb", 9) ++ span ++ tok("gb", 9) // at 9..20: straddles
    val c = tok("fc", 30) // untouched control
    val t10 = tok("t", 10) // a whole window repeated INSIDE one doc
    val d = t10 ++ tok("fd", 5) ++ t10
    val dir = "/tmp/graft_test_spanscrub"
    graft.sources.Ingest.deletePath(spark, dir)
    Seq((1L, a, "s1"), (2L, b, "s1"), (3L, c, "s2"), (4L, d, "s3"))
      .map { case (id, w, src) =>
        (id, w.mkString(" "), "en", src, w.mkString(" ").length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = rows(graft.queries.Curation.q248.fn(spark, dir))
      .map(r => r.getString(0) -> r).toMap
    def h(w: Seq[String]): Long =
      graft.operators.KMeans.hash60(w.mkString(" "))

    val s1 = got("s1")
    assert(s1.getLong(1) == 2 && s1.getLong(2) == 60) // docs, tokens
    assert(s1.getLong(3) == 42) // (30-10+1) windows per doc
    assert(s1.getLong(4) == 6, "3 full-span windows per doc repeat")
    assert(s1.getLong(5) == 2) // both docs affected
    assert(s1.getLong(6) == 24, "exactly the 12-token span per doc")
    assert(s1.getLong(7) == 400000L) // 24/60 in ppm, integer div
    assert(s1.getLong(8) ==
      (h(tok("fa", 5) ++ tok("ga", 13)) ^ h(tok("fb", 9) ++ tok("gb", 9))),
      "rebuilt docs must be the originals minus the span")

    val s2 = got("s2")
    assert(s2.getLong(6) == 0 && s2.getLong(8) == h(c),
      "an untouched doc rebuilds to itself")

    val s3 = got("s3")
    assert(s3.getLong(4) == 2 && s3.getLong(5) == 1)
    assert(s3.getLong(6) == 20, "both within-doc occurrences scrubbed")
    assert(s3.getLong(8) == h(tok("fd", 5)))
  }
}
