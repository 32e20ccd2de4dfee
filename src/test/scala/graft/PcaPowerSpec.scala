package graft

import org.scalatest.funsuite.AnyFunSuite

/** sim_pca_power semantics on a corpus with a planted dominant direction:
  * the power iteration recovers it, the Rayleigh share reflects it, the
  * renormalized coordinates stay bounded, and the query adapts to the
  * input dimensionality (nothing hard-codes 64).
  */
class PcaPowerSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("recovers a planted dominant direction; coords bounded; dim-agnostic") {
    import spark.implicits._
    val dim = 8
    // 40 vectors mostly along e1 with small deterministic off-axis noise
    val rows = (0 until 40).map { k =>
      val v = Array.fill(dim)(0.0f)
      v(0) = 1.0f + 0.01f * (k % 5)
      v(1 + k % (dim - 1)) = 0.05f * ((k % 3) - 1)
      (k.toLong, v.toSeq)
    }
    val tmp = java.nio.file.Files.createTempDirectory("pcapower").toString
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got = SparkEntry.queries("sim_pca_power")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.CacheTracker.releaseAll()

    assert(got.length == dim, s"one row per input dimension, got ${got.length}")
    val coords = got.map(t => t._1 -> t._2).toMap
    // renormalization contract: max |coord| is exactly 1000, rest bounded
    assert(got.map(t => math.abs(t._2)).max == 1000L)
    assert(got.forall(t => math.abs(t._2) <= 1000L))
    // the planted direction dominates: e1 carries the max coordinate and
    // every off-axis coordinate is small next to it
    assert(math.abs(coords(1)) == 1000L, s"e1 should dominate, got $coords")
    assert((2 to dim).forall(i => math.abs(coords(i)) < 200L), s"got $coords")
    // Rayleigh share: the planted axis holds nearly all squared mass
    val share = got.head._4
    assert(share > 900000L && share <= 1000000L, s"share_micro = $share")
    assert(got.map(_._3).distinct.length == 1 && got.head._3 > 0L)
  }
}
