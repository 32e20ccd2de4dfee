package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation on shapes the clique-like oracle data doesn't
  * exercise: long chains (many propagation rounds), disjoint components,
  * and cycles — on BOTH tiers (single-task union-find below the edge
  * threshold, distributed pointer-jumping loop above it, forced here with
  * `localSolveEdges = 0`).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def comps(edges: Seq[(Long, Long)], localSolveEdges: Long): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    ConnectedComponents.components(df, "src", "dst", localSolveEdges = localSolveEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  for ((tier, threshold) <- Seq(("local union-find", 4000000L), ("distributed loop", 0L))) {

    test(s"$tier: a 12-hop chain collapses to its minimum id") {
      val chain = (1L to 12L).sliding(2).map(p => (p(1), p(0))).toSeq // 12->11->...->1
      val got = comps(chain, threshold)
      assert(got.size == 12 && got.values.forall(_ == 1L))
    }

    test(s"$tier: disjoint components keep separate representatives; cycles terminate") {
      val edges = Seq(
        (1L, 2L), (2L, 3L), (3L, 1L), // cycle {1,2,3}
        (10L, 11L),                   // pair {10,11}
        (20L, 21L), (21L, 22L))       // path {20,21,22}
      val got = comps(edges, threshold)
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    }
  }

  test("empty edge set yields an empty labeling") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.components(df, "src", "dst").count() == 0)
  }
}
