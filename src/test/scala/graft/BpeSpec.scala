package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Token-level reference: canonical greedy leftmost non-overlapping
    * BPE — merge occurrences of the best pair left to right, recount,
    * repeat. The distributed fold must match this exactly. */
  private def refMergeOnce(toks: List[String], x: String, y: String)
      : List[String] = toks match {
    case a :: b :: rest if a == x && b == y =>
      (x + Bpe.Joiner + y) :: refMergeOnce(rest, x, y)
    case a :: rest => a :: refMergeOnce(rest, x, y)
    case Nil => Nil
  }

  private def refLearn(corpus: Seq[String], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var docs = corpus.map(_.trim.toLowerCase.split("\\s+").toList)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to k) {
      val counts = docs.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
      if (counts.nonEmpty) {
        val ((x, y), f) = counts.minBy { case ((x, y), f) => (-f, x, y) }
        out += ((r, x, y, f))
        docs = docs.map(refMergeOnce(_, x, y))
      }
    }
    out.result()
  }

  test("learnMerges matches canonical BPE, including repeated-token " +
      "chains and cross-round merged-token pairs") {
    val corpus = Seq(
      "the cat sat on the mat the cat ran",
      "the cat the cat the cat",           // chained best-pair repeats
      "a a a a a",                          // self-pair (x == y) chain
      "on the mat on the mat",
      "b")                                  // single token passes through
    val got = Bpe.learnMerges(corpus.toDF("text"), "text", 5)
    assert(got == refLearn(corpus, 5), s"got $got")
  }

  test("applyMerges reproduces the trained tokenization row-locally") {
    val corpus = Seq("x y x y x y", "z x y z", "y x")
    val merges = Bpe.learnMerges(corpus.toDF("text"), "text", 3)
    val applied = corpus.toDF("text")
      .select(Bpe.applyMerges(
        graft.functions.Functions.tokens(col("text")),
        merges.map(m => (m._2, m._3))).as("t"))
      .as[Seq[String]].collect().toSeq
    var ref = corpus.map(_.trim.toLowerCase.split("\\s+").toList)
    merges.foreach { case (_, x, y, _) =>
      ref = ref.map(refMergeOnce(_, x, y))
    }
    assert(applied.map(_.toList) == ref)
  }

  test("merge fold is invariant to input partitioning") {
    val corpus = (1 to 50).map(i => s"p q r s p q t u p q")
    def run(parts: Int) =
      Bpe.learnMerges(corpus.toDF("text").repartition(parts), "text", 3)
    assert(run(7) == run(1))
  }
}
