package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every registered query's physical plan for scale
  * red flags — windows with no partition spec (everything lands in one
  * task) and cartesian products. A partitioned Window line prints
  * three bracket groups `Window [fns], [partSpec], [orderSpec]`; a
  * global one prints two. */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
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
        val msgs =
          (if (plan.contains("CartesianProduct")) Seq("cartesian product")
           else Nil) ++
          (if (globalWindow) Seq("GLOBAL window (no partition)") else Nil)
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
