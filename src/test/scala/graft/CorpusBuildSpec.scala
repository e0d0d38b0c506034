package graft

import graft.queries.CorpusBuild

/** The composed corpus-curation lifecycle (q245): beyond the oracle's
  * value-for-value check, the report must be INTERNALLY consistent —
  * the gate counters partition the input scan, the curated count
  * reconciles against the dedup/decontamination removals, the shard
  * manifest clears the WAP gate — and the whole build must be
  * deterministic under replay (every stage is a pure function of the
  * input, so a re-run publishes byte-identical metrics). */
class CorpusBuildSpec extends SparkSpec {

  private def report(dir: String): Map[(String, String, String), Long] =
    rows(CorpusBuild.run(spark, dir))
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap

  test("the composed curation report is internally consistent and " +
      "published") {
    val rep = report("/root/testdata/sf0.001")
    // the three observe counters + the dedup survivor count partition
    // the single input scan exactly
    assert(rep(("quality", "corpus", "rows_in")) ==
      rep(("quality", "corpus", "dropped_low_quality")) +
      rep(("langid", "corpus", "dropped_non_en")) +
      rep(("dedup", "corpus", "dup_rows_removed")) +
      rep(("dedup", "corpus", "rows_kept")))
    // every gate is live on the fixture
    assert(rep(("quality", "corpus", "dropped_low_quality")) > 0)
    assert(rep(("langid", "corpus", "dropped_non_en")) > 0)
    assert(rep(("decontam", "corpus", "eval_docs_removed")) > 0)
    assert(rep(("decontam", "corpus", "contaminated_removed")) > 0)
    // the curated count reconciles against the removals
    assert(rep(("corpus", "curated", "rows_final")) ==
      rep(("dedup", "corpus", "rows_kept")) -
      rep(("decontam", "corpus", "eval_docs_removed")) -
      rep(("decontam", "corpus", "contaminated_removed")))
    // greedy exclusive-prefix packing: a doc may straddle its shard's
    // tail, so n_shards is within one of the ideal token-budget count
    val shards = rep(("shards", "manifest", "n_shards"))
    val total = rep(("shards", "manifest", "total_tokens"))
    assert(shards >= 1 && shards <= total / 4096L + 1)
    assert(rep(("shards", "manifest", "max_shard_tokens")) <= total)
    // the manifest cleared the WAP audit
    assert(rep(("shards", "manifest", "published")) == 1)
    assert(rep(("shards", "manifest", "audit_violations")) == 0)
  }

  test("an EMPTY corpus builds a zero report, not a crash") {
    // the q224-class degenerate contract: every aggregate in the chain
    // must survive zero input rows — observe counters coalesce to 0
    // (sum over an empty scan is NULL), the manifest read-back
    // coalesces, and the WAP publish still promotes an empty manifest
    import org.apache.spark.sql.types._
    val dir = "/tmp/graft_test_empty_corpus"
    graft.sources.Ingest.deletePath(spark, dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rep = report(dir)
    assert(rep.size == 13)
    assert(rep(("quality", "corpus", "rows_in")) == 0)
    assert(rep(("corpus", "curated", "rows_final")) == 0)
    assert(rep(("shards", "manifest", "n_shards")) == 0)
    assert(rep(("shards", "manifest", "total_tokens")) == 0)
    assert(rep(("shards", "manifest", "published")) == 1)
    assert(rep(("shards", "manifest", "audit_violations")) == 0)
  }

  test("the curation build is deterministic under replay") {
    // every stage is a pure function of the input (content hashes,
    // argmax gates, window keyed on unique doc_id), so a second run —
    // overwriting the same staged/curated/manifest tables — must
    // publish the identical report
    val a = report("/root/testdata/sf0.001")
    val b = report("/root/testdata/sf0.001")
    assert(a == b)
  }
}
