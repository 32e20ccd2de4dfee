package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synchronous LPA semantics on crafted graphs: the self-vote keeps isolated
  * pairs from two-cycling back to singletons, and a bridge between two
  * triangles does NOT merge their communities (the granularity that
  * distinguishes LPA from connected components).
  */
class LabelPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = edges.toDF("a", "b")
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
    val withSelf = sym.unionByName(
      sym.select(col("src")).distinct().select(col("src"), col("src").as("dst")))
    graft.analytics.GraphQueries.lpaRounds(withSelf, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("isolated pair converges to the smaller label (no two-cycle)") {
    val got = run(Seq((7L, 3L)), iters = 4)
    assert(got == Map(3L -> 3L, 7L -> 3L), s"got $got")
  }

  test("bridged triangles stay two communities; components would merge them") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val got = run(tri :+ ((3L, 10L)), iters = 4)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $got")
  }
}
