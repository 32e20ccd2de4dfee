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

  // ----- TopKByLongScore: the exact-integer twin priority sampling uses ----

  private val lagg = new functions.SketchAggregators.TopKByLongScore(3)
  private def lrun(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.foldLeft(lagg.zero)(lagg.reduce)

  test("long-score top-k: (score desc, id asc) order, exact past 2^53") {
    // scores differing by 1 at 2^60 — a Double buffer would collapse them
    val big = 1L << 60
    val xs = Seq((big, 4L), (big + 1, 9L), (big + 1, 2L), (big - 1, 1L), (5L, 7L))
    assert(lrun(xs) == Seq((big + 1, 2L), (big + 1, 9L), (big, 4L)))
  }

  test("long-score top-k: merge invariant to partial-buffer split") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(50)((rnd.nextInt(6).toLong, rnd.nextLong().abs % 40))
    val whole = lrun(xs)
    for (cut <- Seq(0, 7, 25, 49, 50)) {
      val (l, r) = xs.splitAt(cut)
      assert(lagg.merge(lrun(l), lrun(r)) == whole, s"split at $cut diverged")
    }
  }

  // ----- MisraGries: the guarantee the heavy-hitters query stands on -------
  // Any item with true frequency > n/(capacity+1) must survive — under
  // single-pass reduce AND under every split-into-partials-then-merge
  // shape, because Spark chooses the partial aggregation boundaries.

  private def mgRun(mg: functions.SketchAggregators.MisraGries,
      xs: Seq[String]): Map[String, Long] =
    xs.foldLeft(mg.zero)(mg.reduce)

  test("misra-gries retains every item above n/(capacity+1), any merge split") {
    val rnd = new scala.util.Random(11)
    val mg = new functions.SketchAggregators.MisraGries(7)
    // Zipf-ish stream over 40 items: item i drawn with weight ~ 1/(i+1)
    val weights = (0 until 40).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val xs = Seq.fill(3000) {
      val u = rnd.nextDouble() * total
      s"w${cum.indexWhere(u <= _)}"
    }
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hot = exact.collect { case (w, c) if c > xs.size / 8 => w }.toSet
    assert(hot.nonEmpty, "fixture must exercise the guarantee")

    val whole = mg.finish(mgRun(mg, xs)).toSet
    assert(hot.subsetOf(whole), s"single-pass lost ${hot.diff(whole)}")

    for (cuts <- Seq(Seq(100), Seq(1500), Seq(500, 1000, 2900))) {
      val parts = (0 +: cuts :+ xs.size).sliding(2).map {
        case Seq(a, b) => mgRun(mg, xs.slice(a, b))
      }.toSeq
      val merged = mg.finish(parts.reduce(mg.merge)).toSet
      assert(hot.subsetOf(merged), s"merge split $cuts lost ${hot.diff(merged)}")
      assert(merged.size <= 7, "capacity exceeded after merge")
    }
  }

  test("misra-gries buffer never exceeds capacity and decrements evict") {
    val mg = new functions.SketchAggregators.MisraGries(2)
    val buf = mgRun(mg, Seq("a", "a", "b", "c", "a", "d"))
    assert(buf.size <= 2)
    assert(buf.contains("a")) // freq 3 of 6 > 6/3
  }
}
