package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the incremental corpus build's value proposition: applying
  * a ~1% delta via [[graft.queries.CorpusBuild.runIncremental]] vs
  * rebuilding the corpus with [[graft.queries.CorpusBuild.run]].
  *
  * Honest accounting: the incremental path is delta-proportional in
  * its gates/dedup/decontamination, but the retro-decontamination
  * scan and the manifest prefix-sum repack remain corpus-proportional
  * (two cheap 2-3 column scans) — the measured ratio, not a claimed
  * asymptote, is the evidence. Prints one JSON line. */
object IncBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CorpusBuild

    // SPARK_GRAFT_INC_MULT=k replicates the corpus k× with id-offset,
    // text-salted copies (salting keeps the replicas from collapsing
    // in the exact-dedup stage) — the lever that separates per-doc
    // cost from the pipeline's fixed action count
    val mult = sys.env.getOrElse("SPARK_GRAFT_INC_MULT", "1").toInt
    val src1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val off = src1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val src =
      if (mult <= 1) src1
      else (0 until mult).map { k =>
        src1.select((col("doc_id") + lit(k * off)).as("doc_id"),
          concat(col("text"), lit(s" r$k")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
    val cut = src.stat.approxQuantile("doc_id", Array(0.99), 0.0).head.toLong
    val baseDir = "/tmp/graft_incbench_base"
    val fullDir = "/tmp/graft_incbench_full"
    for (d <- Seq(baseDir, fullDir))
      graft.sources.Ingest.deletePath(spark, d)
    src.filter(col("doc_id") < cut)
      .write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
    src.write.mode("overwrite").parquet(s"$fullDir/documents.parquet")
    val delta = src.filter(col("doc_id") >= cut)
    val deltaRows = delta.count()
    val totalRows = src.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    graft.operators.InternalCache.release()
    val tBase = time { CorpusBuild.run(spark, baseDir).count(); () }
    graft.operators.InternalCache.release()
    val tInc = time {
      CorpusBuild.runIncremental(spark, baseDir, delta).count(); ()
    }
    graft.operators.InternalCache.release()
    val tFull = time { CorpusBuild.run(spark, fullDir).count(); () }

    def r3(v: Double) = f"$v%.3f"
    println(s"""{"metric":"incremental_corpus_build","rows_total":$totalRows,"rows_delta":$deltaRows,"sec_full_rebuild":${r3(tFull)},"sec_incremental_delta":${r3(tInc)},"sec_base_build":${r3(tBase)},"speedup_vs_rebuild":${r3(tFull / tInc)}}""")
    spark.stop()
  }
}
