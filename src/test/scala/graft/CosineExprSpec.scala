package graft

import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** The native CosineSimilarity expression must be bit-identical to the
  * HOF fold (the oracle contract depends on it). */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  private def viaExpr(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ExprColumn.of(
      graft.expressions.CosineSimilarity(
        org.apache.spark.sql.graft.ExprColumn.expr(a),
        org.apache.spark.sql.graft.ExprColumn.expr(b)))

  test("expression == HOF fold, bit for bit, on float arrays") {
    val df = (1 to 200).map { i =>
      (Array.tabulate(64)(j => ((i * 31 + j * 7) % 97 - 48) / 7.0f),
        Array.tabulate(64)(j => ((i * 17 + j * 13) % 89 - 44) / 5.0f))
    }.toDF("a", "b")
    val both = df.select(
      viaExpr($"a", $"b").as("fast"),
      cosine(toDoubleArray($"a"), toDoubleArray($"b")).as("hof"))
    // bit-exact: compare raw doubles, no tolerance
    assert(both.filter($"fast" =!= $"hof").isEmpty)
  }

  test("interpreted eval matches codegen result") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val fromCodegen = rows(df.select(viaExpr($"a", $"b"))).head.getDouble(0)
    val e = graft.expressions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 2.0f, 1.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null).asInstanceOf[Double] == fromCodegen)
  }

  test("null elements and length mismatches null out like the HOF fold") {
    // zip_with pads the shorter array with nulls and null arithmetic
    // propagates, so the HOF yields null; the expression must agree
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f),
        Array[java.lang.Float](3.0f, 2.0f, 1.0f)),   // null element left
      (Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](3.0f, null)),          // null element right
      (Array[java.lang.Float](1.0f, 2.0f, 3.0f),
        Array[java.lang.Float](3.0f, 2.0f)),          // length mismatch
      (Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](3.0f, 4.0f)))          // clean control row
      .toDF("a", "b")
    val both = df.select(
      viaExpr($"a", $"b").as("fast"),
      cosine(toDoubleArray($"a"), toDoubleArray($"b")).as("hof"))
    val got = rows(both).map(r => (r.isNullAt(0), r.isNullAt(1)))
    assert(got == Seq((true, true), (true, true), (true, true),
      (false, false)))
    // the clean row still agrees bit for bit
    assert(both.filter($"fast".isNotNull && $"fast" =!= $"hof").isEmpty)
  }

  test("cosine_sim is SQL-callable once registered") {
    org.apache.spark.sql.graft.GraftSqlRegistry.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head.getDouble(0)
    assert(r == 1.0)
  }

  test("DotProduct expression == HOF dot fold, bit for bit") {
    import graft.operators.Similarity
    val df = (1 to 200).map { i =>
      Array.tabulate(64)(j => ((i * 31 + j * 7) % 97 - 48) / 7.0f)
    }.toDF("v")
    // float vector × constant double weights — the bucket-assignment
    // shape (plane 0 weights are hash-derived constants)
    val w = Similarity.planeWeights(0, 64)
    val both = df.select(
      Similarity.dotF($"v", w).as("fast"),
      dot(toDoubleArray($"v"), w).as("hof"))
    assert(both.filter($"fast" =!= $"hof").isEmpty)
    // null/mismatch contract matches the fold too
    val edge = Seq(
      (Array[java.lang.Float](1.0f, null), Array(1.0, 2.0)),
      (Array[java.lang.Float](1.0f, 2.0f), Array(1.0)))
      .toDF("a", "b")
    val got = rows(edge.select(Similarity.dotF($"a", $"b").as("d"),
      dot(toDoubleArray($"a"), $"b").as("h")))
      .map(r => (r.isNullAt(0), r.isNullAt(1)))
    assert(got == Seq((true, true), (true, true)))
  }
}
