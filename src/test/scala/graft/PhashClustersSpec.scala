package graft

import org.scalatest.funsuite.AnyFunSuite

/** mm_phash_clusters semantics: every verified phash pair's endpoints land
  * in one cluster (transitive closure over the pair graph), every cluster
  * has at least two assets, and the representative is its own smallest
  * member.
  */
class PhashClustersSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("clusters are the closure of mm_phash_pairs; reps are min members") {
    val dir = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("mm_phash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("mm_phash_clusters")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    graft.CacheTracker.releaseAll()

    assert(pairs.nonEmpty, "fixture must produce verified pairs")
    val memberToRep = clusters.flatMap { case (rep, _, ms) =>
      ms.split(',').map(m => m.toLong -> rep)
    }.toMap
    // closure: both endpoints of every verified pair share a cluster
    pairs.foreach { case (a, b) =>
      assert(memberToRep.contains(a) && memberToRep.contains(b), s"($a,$b)")
      assert(memberToRep(a) == memberToRep(b), s"pair ($a,$b) split across clusters")
    }
    // structure: >= 2 assets per cluster, rep = smallest member, sizes match
    clusters.foreach { case (rep, n, ms) =>
      val members = ms.split(',').map(_.toLong)
      assert(n >= 2 && members.length == n, s"cluster $rep")
      assert(members.min == rep, s"cluster $rep: rep is not min member")
    }
  }
}
