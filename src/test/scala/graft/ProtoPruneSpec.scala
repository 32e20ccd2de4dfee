package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_proto_prune semantics on a corpus with 16 planted direction
  * groups: the Lloyd cells recover the groups, each cell prunes exactly
  * n div 4 members, and the pruned set is the top of the
  * cosine-to-centroid ranking — verified against a plain-Scala
  * re-derivation of the trained centroid and the cosine ordering, not
  * against the query's own expressions.
  */
class ProtoPruneSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val Dim = 16
  private val PerGroup = 8

  /** Member (g, j): unit mass on lane g plus a j-scaled tilt onto lane
    * g+1 — vec_id = j*16 + g, so ids 0..15 (the Lloyd seeds) are the 16
    * exact axis vectors and both Lloyd rounds keep each group intact.
    */
  private def member(g: Int, j: Int): Array[Float] = {
    val v = Array.fill(Dim)(0.0f)
    v(g) = 1.0f
    v((g + 1) % Dim) = 0.01f * j
    v
  }

  test("per-cell quarter pruned; pruned = most prototypical by exact rederivation") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("protoprune").toString
    val rows = for (j <- 0 until PerGroup; g <- 0 until Dim)
      yield ((j * 16 + g).toLong, g, member(g, j).toSeq)
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got = SparkEntry.queries("dedup_proto_prune")(spark, tmp)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4)))
    graft.CacheTracker.releaseAll()

    // 16 cells x 8 members -> 2 pruned each
    assert(got.length == 32, s"got ${got.length} rows")
    val byCell = got.groupBy(_._1)
    assert(byCell.size == 16 && byCell.values.forall(_.length == 2))
    assert(got.forall(t => t._5 == 8L && (t._4 == 1 || t._4 == 2)))

    // plain-Scala mirror: quantized lanes, trained centroid = integer group
    // mean (lane g: 1e6, lane g+1: mean(10000j) = 35000 exactly), expected
    // prune set = top-2 by (cosine desc, vec_id)
    def q(x: Float): Long = math.round(x.toDouble * 1000000)
    for (g <- 0 until Dim) {
      val ce = Array.fill(Dim)(0L)
      ce(g) = 1000000L
      ce((g + 1) % Dim) = (0 until PerGroup).map(j => q(0.01f * j)).sum / PerGroup
      val cnrm = ce.map(x => x * x).sum
      val ranked = (0 until PerGroup).map { j =>
        val qe = member(g, j).map(q)
        val dot = qe.zip(ce).map { case (a, b) => a * b }.sum
        val nrm = qe.map(x => x * x).sum.toDouble
        val c2c = BigDecimal(dot / (math.sqrt(nrm) * math.sqrt(cnrm.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        ((j * 16 + g).toLong, c2c)
      }.sortBy { case (id, c) => (-c, id) }
      val expected = ranked.take(2).map(_._1).toSet
      // cells are discovered, not assumed: find the cell holding this
      // group's members by intersecting ids
      val cellRows = got.filter(t => expected.contains(t._2))
      assert(cellRows.length == 2,
        s"group $g: expected pruned $expected, got ${got.toSeq}")
      assert(cellRows.map(_._1).distinct.length == 1)
    }
  }
}
