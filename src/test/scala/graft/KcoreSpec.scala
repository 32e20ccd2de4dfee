package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins graph_kcore's peeling semantics on hand-built graphs where the
  * correct 2-core is known by inspection:
  *
  *  1. a triangle with a pendant chain — the chain peels round by round
  *     (each round only exposes the NEXT chain node, so convergence takes
  *     multiple rounds), the triangle survives with induced degree 2;
  *  2. two 4-cycles joined by a bridge — every node lies on a cycle, so
  *     nothing peels, and the bridge endpoints keep degree 3;
  *  3. fixpoint: once the alive set is stable, more rounds change nothing
  *     (round-budget result ≡ double-budget result).
  */
class KcoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def sym(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val e = edges.toDF("doc_a", "doc_b")
    e.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
  }

  private def core(edges: Seq[(Long, Long)], k: Int, iters: Int): Map[Long, Long] = {
    val out = graft.analytics.GraphQueries.kcoreRounds(sym(edges), k, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheTracker.releaseAll()
    out
  }

  test("triangle survives, pendant chain peels one node per round") {
    // triangle 1-2-3, chain 3-4-5-6 hanging off it
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    // after round 1 only 6 is gone (5 still saw degree 2); needs 3 rounds
    val got = core(edges, k = 2, iters = 6)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cycles joined by a bridge: nothing peels, bridge degree = 3") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), // square A
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L), // square B
      (4L, 5L)) // bridge
    val got = core(edges, k = 2, iters = 6)
    assert(got.keySet == (1L to 8L).toSet)
    assert(got(4L) == 3L && got(5L) == 3L)
    assert((got - 4L - 5L).values.forall(_ == 2L))
  }

  test("fixpoint: extra rounds are a no-op once the peel converges") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
    assert(core(edges, 2, 6) == core(edges, 2, 12))
  }

  test("k=3: a 2-core square is NOT a 3-core; K4 is") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(core(square, 3, 6).isEmpty)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(core(k4, 3, 6) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
