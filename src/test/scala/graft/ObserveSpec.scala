package graft

import org.apache.spark.sql.functions._
import graft.quality.Quality

/** Zero-extra-scan quality metrics via Dataset.observe. */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observed metrics ride along with the action") {
    val df = Seq((Some(1), "ok"), (None, "ok"), (Some(-5), "bad"))
      .toDF("qty", "status")
    val (instrumented, obs) = Quality.observed(df, Seq(
      "null_qty" -> col("qty").isNull,
      "negative_qty" -> (col("qty") < 0),
      "bad_status" -> (col("status") === "bad")))
    // one action — all three counters come back with it
    assert(instrumented.count() == 3)
    val m = obs.get
    assert(m("null_qty") == 1L)
    assert(m("negative_qty") == 1L)
    assert(m("bad_status") == 1L)
  }
}
