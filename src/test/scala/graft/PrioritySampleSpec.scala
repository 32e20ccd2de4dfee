package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins that txt_priority_sample's Duffield/Lund/Thorup estimator actually
  * ESTIMATES: with priorities q = (w * M) div u in token units and
  * inc = max(w, tau) comparing like units, the per-stratum subset-sum
  * estimate must land near the true stratum total. Round-7 advice found
  * the previous form compared tau in priority units (w*1e12/u) against
  * weights in w*1e12 units, so the tau branch never fired and the
  * "estimate" degenerated to the raw 10-sample sum (ratio << 1) — this
  * spec would have caught that. Bounds are generous because k = 10
  * samples per 25-doc stratum is genuinely high-variance; the broken
  * estimator sat at ratio ~0.15, far outside them.
  */
class PrioritySampleSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("subset-sum estimator ratio is near 1 on every stratum") {
    val rows = SparkEntry.queries("txt_priority_sample")(spark, sf)
      .select("source", "ratio").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { case (src, ratio) =>
      assert(ratio > 0.35 && ratio < 2.5,
        s"stratum $src estimator ratio $ratio is not an estimate of 1")
    }
    val mean = rows.map(_._2).sum / rows.length
    assert(mean > 0.75 && mean < 1.3,
      s"mean estimator ratio $mean across ${rows.length} strata is biased")
  }

  test("the Lehmer draw is spread, not monotone in doc_id") {
    // one Lehmer step has no wraparound below doc_id ~44k (48271 * 44486
    // < 2^31), making u monotone and the sample just the smallest ids;
    // the triple-iterated hash must break that ordering on sequential ids
    import spark.implicits._
    val u = spark.range(0, 1000).toDF("doc_id")
      .selectExpr(
        "((((doc_id + 1) * 48271) % 2147483647 * 48271) % 2147483647 * 48271) % 2147483647 + 1 AS u")
      .collect().map(_.getLong(0))
    val inversions = u.sliding(2).count(p => p(1) < p(0))
    assert(inversions > 300, s"only $inversions/999 descents: u still ~monotone")
    // and the draw reaches both halves of [1, 2^31-1]
    assert(u.count(_ > 1073741823L) > 300)
    assert(u.count(_ <= 1073741823L) > 300)
  }
}
