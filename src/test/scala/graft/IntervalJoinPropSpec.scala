package graft

import graft.plans.IntervalJoin
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based correctness of the native interval-join exec against the
  * declarative range join on GENERATED data: for every random mix of keys,
  * duplicate times, empty/inverted/full-span windows and key groups that
  * exist on only one side, the custom merge must return exactly the rows
  * `l.k = r.k AND r.t BETWEEN l.lo AND l.hi` returns. This is the
  * insurance an example-based spec can't give a hand-written merge with
  * cursor state (group loading, monotone advance, binary-search bounds):
  * the failure modes — a group skipped after an empty one, a stale buffer
  * served to the next key, an off-by-one at the window edge — all need
  * adversarial shapes to surface.
  *
  * Raw ScalaCheck generators over fixed seeds (the scalatest bridge is not
  * in the offline cache): every run checks the same 40 deterministic
  * datasets.
  */
class IntervalJoinPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  // small domains force collisions: few keys, coarse times, narrow spans
  private val genLeft = Gen.listOf(for {
    k <- Gen.choose(0L, 6L)
    lo <- Gen.choose(0L, 30L)
    span <- Gen.choose(-3L, 8L) // negative span = inverted window
  } yield (k, lo, lo + span))
  private val genRight = Gen.listOf(for {
    k <- Gen.choose(0L, 8L) // superset of left keys: right-only groups
    t <- Gen.choose(0L, 30L)
  } yield (k, t))

  test("native join equals the declarative range join on 40 generated datasets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 40).foreach { i =>
      val seed = Seed(0xC0FFEEL + i)
      val ls = genLeft.apply(Gen.Parameters.default.withSize(30), seed).get
      val rs = genRight.apply(Gen.Parameters.default.withSize(30), seed.next).get
      val l = ls.zipWithIndex.map { case ((k, lo, hi), id) => (id.toLong, k, lo, hi) }
        .toDF("lid", "k", "lo", "hi")
      val r = rs.zipWithIndex.map { case ((k, t), id) => (id.toLong, k, t) }
        .toDF("rid", "rk", "t")
      val native = IntervalJoin.join(l, r, "k", "rk", "lo", "hi", "t")
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSorted
      val ref = l.join(r, col("k") === col("rk") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSorted
      assert(native.sameElements(ref),
        s"dataset $i diverged: native=${native.take(20).toSeq} ref=${ref.take(20).toSeq}")
    }
  }

  private implicit class SortOps(a: Array[(Long, Long)]) {
    def toSorted: Array[(Long, Long)] = a.sorted
  }
}
