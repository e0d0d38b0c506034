package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every registered query's physical plan for scale
  * red flags — windows with no partition spec (everything lands in one
  * task) and cartesian products. A partitioned Window line prints
  * three bracket groups `Window [fns], [partSpec], [orderSpec]`; a
  * global one prints two. */
object PlanLint {

  /** Global windows accepted because their input frame is BOUNDED BY
    * CONTRACT — the same convention as the repo's bounded `.collect()`
    * calls: the window runs over a post-aggregation frame whose row
    * count is fixed by a constant, a value domain, or calendar time,
    * never by the dataset size. Anything NOT listed here that plans a
    * global window is a flag. */
  private val boundedWindowByContract = Map(
    "q206_conversion_hazard" ->
      "per-day frame, bounded by the calendar span",
    "q216_bootstrap_ci" ->
      "B=40 bootstrap replicate means (constant)",
    "q222_ks_drift" ->
      "distinct n_chars values (value-domain-bounded, q199 rationale)",
    "q225_cusum_changepoint" ->
      "per-day frame, bounded by the calendar span",
    "q240_heaps_fit" ->
      "per-day vocabulary frame, bounded by the calendar span")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // local-mode partition DISCOVERY: listing an 80-partition month
      // table as a distributed job costs ~0.2 s of scheduling per
      // (refresh, read) pair - a composed build pays it dozens of times
      // (measured, JobProfile q250). Up to 256 paths the driver lists
      // in microseconds; beyond that the distributed path is right.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    var flags = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        // a Window line prints `[fns], [partSpec], [orderSpec]`;
        // partitioned-but-unordered windows print two groups with NO
        // sort direction in the second — only flag a true global
        // window: one group, or two where the second is an orderSpec
        val globalWindow = plan.linesIterator.exists { l =>
          val t = l.replaceFirst("^[-+:\\s]*", "")
          t.startsWith("Window ") &&
            !t.matches(".*\\], \\[.*\\], \\[.*") &&
            (!t.matches(".*\\], \\[.*") ||
              t.replaceFirst(".*\\], \\[", "").matches(".*(ASC|DESC).*"))
        }
        val windowMsg =
          if (!globalWindow) Nil
          else boundedWindowByContract.get(n) match {
            case Some(bound) =>
              println(s"NOTE $n: global window, bounded by contract " +
                s"($bound)")
              Nil
            case None => Seq("GLOBAL window (no partition)")
          }
        val msgs =
          (if (plan.contains("CartesianProduct")) Seq("cartesian product")
           else Nil) ++ windowMsg
        if (msgs.nonEmpty) {
          flags += 1
          println(s"FLAG $n: ${msgs.mkString("; ")}")
        }
      } catch {
        case e: Throwable => println(s"ERR $n ${e.getMessage.take(120)}")
      }
    }
    println(s"done, $flags flagged")
    spark.stop()
  }
}
