package graft

import org.scalatest.funsuite.AnyFunSuite

/** sim_hamming_recall semantics: recall is monotone in shortlist depth (a
  * true-top-10 member displaced from the reranked top-10 is displaced only
  * by higher-cosine members, themselves hits), and a depth covering the
  * whole corpus recalls exactly 1.
  */
class HammingRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("monotone in depth; full-corpus depth recalls 1.0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hamming").toString
    val rows = (0 until 30).map { k =>
      val v = Array.tabulate(64)(i => ((k * 131 + i * 37) % 19 - 9) / 9.0f)
      (k.toLong, k % 3, v.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got = SparkEntry.queries("sim_hamming_recall")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    graft.CacheTracker.releaseAll()

    assert(got.map(_._1).toSeq == Seq(10, 50, 100, 200), s"got ${got.toSeq}")
    val recalls = got.map(_._3)
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone: ${recalls.toSeq}")
    // depths 50/100/200 all cover the 29-vector corpus -> exact recall
    assert(got.drop(1).forall(_._3 == 1.0), s"got ${got.toSeq}")
    assert(got.head._2 <= 50)
  }
}
