package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact-span dedup semantics on crafted documents: the reported span is the
  * precise shared-token run length (run-of-matching-shingles + 2), pairs
  * below the 20-token threshold are excluded, and identical documents
  * report their full length as one span.
  */
class DedupSpanSpec extends AnyFunSuite {

  test("dedup_span reports exact shared span lengths above the threshold") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val shared = (1 to 25).map(i => s"s$i").mkString(" ")
    // 25 shared tokens embedded at different offsets in otherwise-unique text
    val d1 = ((1 to 10).map(i => s"a$i") :+ shared) ++ (11 to 20).map(i => s"a$i")
    val d2 = ((1 to 5).map(i => s"c$i") :+ shared) ++ (6 to 12).map(i => s"c$i")
    val ident = (1 to 30).map(i => s"b$i").mkString(" ")
    // a 10-token overlap stays below the 20-token reporting threshold
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("dedupspan").toString
    Seq(
      (1L, d1.mkString(" ")),
      (2L, d2.mkString(" ")),
      (3L, ident),
      (4L, ident),
      (5L, s"z1 z2 $short z3 z4"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val res = SparkEntry.queries("dedup_span")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(res.toSeq === Seq((1L, 2L, 25L, 1L), (3L, 4L, 30L, 1L)))
  }
}
