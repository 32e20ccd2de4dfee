package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-task graph tiers' heap budget to the threshold they
  * share with the union-find solver (round 12, VERDICT item 10 + the r11
  * ADVICE item): the local representation is primitive arrays — 16 B/arc
  * input (two longs) + 4 B/arc CSR neighbor + ~12 B/node (sorted id long +
  * offset int) — so the worst case at the shared 16M-edge default
  * (32M symmetrized arcs, every node distinct) must stay under the stated
  * ~1 GB single-task bound. If anyone raises the threshold or fattens the
  * per-arc representation, this fails before an executor OOMs.
  */
class GraphHeapSpec extends AnyFunSuite {

  test("local-tier heap at the shared threshold stays under the stated bound") {
    val arcs = 2L * operators.ConnectedComponents.LocalSolveEdgesDefault
    val bytesPerArc = 16L + 4L // src+dst longs + CSR neighbor int
    val bytesPerNode = 8L + 4L // sorted id long + offset int
    val worstNodes = arcs      // every arc endpoint distinct — upper bound
    val worstBytes = arcs * bytesPerArc + worstNodes * bytesPerNode
    assert(worstBytes <= (1.1 * (1L << 30)).toLong,
      f"local graph tier worst-case heap ${worstBytes / 1e9}%.2f GB exceeds " +
        "the ~1 GB budget documented in GraphQueries.localRows — lower the " +
        "threshold or slim the representation")
  }

  test("buildCsr round-trips adjacency with sorted-id indexing") {
    val es = Seq((5L, 2L), (2L, 5L), (9L, 2L), (2L, 9L), (5L, 9L), (9L, 5L))
    val (ids, off, nbr) = analytics.GraphQueries.buildCsr(
      es.map(_._1).toArray, es.map(_._2).toArray)
    assert(ids.toSeq == Seq(2L, 5L, 9L))
    val adj = ids.indices.map { v =>
      ids(v) -> (off(v) until off(v + 1)).map(i => ids(nbr(i))).sorted
    }.toMap
    assert(adj == Map(2L -> Seq(5L, 9L), 5L -> Seq(2L, 9L), 9L -> Seq(2L, 5L)))
  }
}
