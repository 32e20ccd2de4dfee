package graft

import org.scalatest.funsuite.AnyFunSuite

/** sim_matryoshka_recall semantics: one row per truncation width, recall
  * counted against the full-dim exact top-10, and the rerank-dominates-
  * direct theorem (a direct hit displaced from the reranked top-10 is
  * displaced only by higher-true-cosine shortlist members, which are then
  * hits themselves) holds on an adversarial corpus whose prefixes disagree
  * with the full vectors.
  */
class MatryoshkaSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("3 dim rows; rerank >= direct at every width; counts bounded") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("matryoshka").toString
    // deterministic pseudo-random 64-dim vectors; lanes 32..63 carry most
    // of the mass so small prefixes genuinely mis-rank (the case the
    // rerank ladder exists for)
    val rows = (0 until 80).map { k =>
      val v = Array.tabulate(64) { i =>
        val h = (k * 131 + i * 37) % 19 - 9
        val scale = if (i >= 32) 0.9f else 0.3f
        h * scale / 9.0f
      }
      (k.toLong, k % 4, v.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got = SparkEntry.queries("sim_matryoshka_recall")(spark, tmp)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    graft.CacheTracker.releaseAll()

    assert(got.map(_._1).toSeq == Seq(8, 16, 32), s"got ${got.toSeq}")
    for ((dims, nd, rd, nr, rr) <- got) {
      assert(nd >= 0 && nd <= 50 && nr >= 0 && nr <= 50, s"dims=$dims: $nd/$nr")
      // the theorem: rerank@50 recovers every direct hit
      assert(nr >= nd, s"dims=$dims: rerank $nr < direct $nd")
      assert(math.abs(rd - nd / 50.0) < 1e-6 && math.abs(rr - nr / 50.0) < 1e-6)
    }
    // 50-deep shortlist over a 79-vector corpus nearly saturates: rerank
    // recall should be high even where the raw prefix ranking is poor
    assert(got.forall(_._5 >= 0.5), s"got ${got.toSeq}")
  }
}
