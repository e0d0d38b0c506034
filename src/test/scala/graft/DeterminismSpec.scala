package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The canonical-hash primitives behind graft.DeterminismCheck — the
  * hash must be insensitive to row ORDER (partitioning reorders rows)
  * and to decimal SCALE representation, while staying bit-sensitive to
  * double VALUES (the drift the sweep exists to catch). */
class DeterminismSpec extends AnyFunSuite {
  import DeterminismCheck.{canonCell, frameHash}

  test("canonCell normalizes decimal scale, renders binary and nests") {
    assert(canonCell(new java.math.BigDecimal("1.50")) ==
      canonCell(new java.math.BigDecimal("1.5")))
    assert(canonCell(Array[Byte](0, 15, -1)) == "0x000fff")
    assert(canonCell(Seq(1, Seq(2, 3))) == "[1,[2,3]]")
    assert(canonCell(Row("a", null, 2L)) == "(a,∅,2)")
    assert(canonCell(null) == "∅")
  }

  test("canonCell is bit-sensitive to doubles: a 1-ulp wobble differs") {
    val x = 0.1 + 0.2
    assert(canonCell(x) != canonCell(0.3)) // the classic last-ulp pair
    assert(canonCell(1.0) == canonCell(1.0))
  }

  test("frameHash ignores row order but not values or columns") {
    val r1 = Seq(Row(1L, "a"), Row(2L, "b"))
    val r2 = Seq(Row(2L, "b"), Row(1L, "a"))
    val cols = Seq("id", "s")
    assert(frameHash(cols, r1) == frameHash(cols, r2))
    assert(frameHash(cols, r1) != frameHash(cols, Seq(Row(1L, "a"), Row(2L, "c"))))
    assert(frameHash(Seq("id", "t"), r1) != frameHash(cols, r1))
  }

  test("frameHash cell concatenation cannot collide across boundaries") {
    // ("ab","c") vs ("a","bc") must hash differently — the separator
    // contract; a plain concat would collide
    assert(frameHash(Seq("x", "y"), Seq(Row("ab", "c"))) !=
      frameHash(Seq("x", "y"), Seq(Row("a", "bc"))))
  }
}
