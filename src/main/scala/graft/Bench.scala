package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // wall-clock on a shared machine swings ±40% run to run; the median
    // of `reps` timings per query is stable enough to compare rounds
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: two representative queries absorb the one-off
    // whole-stage-codegen/JIT infra startup (~5-10 s) that would
    // otherwise land on whichever timed query happens to run first
    Seq("q1_pricing_summary", "q12_daily_anomalies").foreach { q =>
      try { SparkEntry.queries(q)(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    // warmup queries cache frames internally (e.g. q12's daily frame);
    // drop them so the first timed query starts from the same cold
    // cache state as every other one
    spark.catalog.clearCache()
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // operators persist small reused frames internally; drop them so
      // later queries aren't squeezed by accumulated cache blocks
      graft.operators.InternalCache.release()
      spark.catalog.clearCache()
      elapsed
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val m = median((1 to reps).map(_ => timeOnce(fn)))
      // a 59-query sweep accumulates generated-class + broadcast debris;
      // collecting between queries keeps late queries from paying the
      // GC bill of earlier ones (observed up to 2.5x inflation)
      System.gc()
      name -> m
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"stat":"median_per_query"}""")
    spark.stop()
  }
}
