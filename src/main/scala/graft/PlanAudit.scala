package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-quality audits
  * (pushdown, pruning, join strategy, codegen spans). Not part of the
  * query surface. Usage: runMain graft.PlanAudit <sfDir> <query...> */
object PlanAudit {
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
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"==== $n ====")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
