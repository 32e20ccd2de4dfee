package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_sig_jaccard semantics: identical docs estimate at exactly 16/16
  * lanes with zero error, and on the fixture corpus every row's error
  * column re-derives from its own estimate and exact-Jaccard columns with
  * the estimate on the 1/16 grid.
  */
class SigJaccardSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("identical pair at 16 lanes, zero error") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sigj").toString
    val same = (1 to 10).map(i => s"t$i").mkString(" ")
    Seq((0L, same), (1L, same), (5L, "other tokens entirely disjoint here now"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("dedup_sig_jaccard")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    graft.CacheTracker.releaseAll()
    assert(got.toSeq == Seq((0L, 1L, 16L, 1000000L, 1.0, 0L)), s"got ${got.toSeq}")
  }

  test("error column re-derives on the fixture corpus; estimates on the 1/16 grid") {
    val got = SparkEntry.queries("dedup_sig_jaccard")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))
    graft.CacheTracker.releaseAll()
    assert(got.nonEmpty)
    got.foreach { case (lanes, est, j, err) =>
      assert(lanes >= 0 && lanes <= 16)
      assert(est == lanes * 1000000L / 16L)
      assert(err == math.abs(est - math.floor(j * 1e6 + 0.5).toLong), s"row $lanes/$j")
      assert(j >= 0.5, "only verified pairs are reported")
    }
  }
}
