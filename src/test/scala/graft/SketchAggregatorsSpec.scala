package graft

import graft.functions.SketchAggregators.TopKByScore
import org.scalatest.funsuite.AnyFunSuite

/** TopKByScore's merge algebra, checked directly (no Spark needed): the
  * result must be invariant to how the input is split across partial
  * buffers, and ties must break exactly like ORDER BY score DESC, id ASC.
  */
class SketchAggregatorsSpec extends AnyFunSuite {

  private val agg = new TopKByScore(3)

  private def run(xs: Seq[(Double, Long, Int)]): Seq[(Double, Long, Int)] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps the k best by (score desc, id asc), best-first") {
    val xs = Seq((0.1, 1L, 0), (0.9, 2L, 1), (0.5, 3L, 2), (0.7, 4L, 3), (0.9, 5L, 4))
    assert(run(xs) == Seq((0.9, 2L, 1), (0.9, 5L, 4), (0.7, 4L, 3)))
  }

  test("ties on score break by smaller id") {
    val xs = Seq((0.5, 9L, 0), (0.5, 1L, 1), (0.5, 5L, 2), (0.5, 3L, 3))
    assert(run(xs) == Seq((0.5, 1L, 1), (0.5, 3L, 3), (0.5, 5L, 2)))
  }

  test("merge of partial buffers equals single-pass reduce for any split") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(40)((rnd.nextInt(8) / 8.0, rnd.nextLong().abs % 100, rnd.nextInt(5)))
    val whole = run(xs)
    for (cut <- Seq(0, 1, 13, 20, 39, 40)) {
      val (l, r) = xs.splitAt(cut)
      assert(agg.merge(run(l), run(r)) == whole, s"split at $cut diverged")
    }
  }

  test("fewer than k inputs are all kept, ordered") {
    assert(run(Seq((0.2, 2L, 0), (0.4, 1L, 1))) == Seq((0.4, 1L, 1), (0.2, 2L, 0)))
    assert(run(Nil) == Nil)
  }
}
