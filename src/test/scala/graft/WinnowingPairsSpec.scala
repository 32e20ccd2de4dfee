package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_winnowing_pairs semantics on crafted documents: the winnowing
  * coverage guarantee (every true shared span of >= 20 tokens surfaces),
  * sub-threshold overlaps stay silent, and the sparse fingerprint set is
  * genuinely smaller than dedup_span's full positional index.
  */
class WinnowingPairsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("every dedup_span pair (>=20-token true span) is caught; short overlaps are not") {
    import spark.implicits._
    val shared = (1 to 25).map(i => s"s$i").mkString(" ")
    val d1 = ((1 to 10).map(i => s"a$i") :+ shared) ++ (11 to 20).map(i => s"a$i")
    val d2 = ((1 to 5).map(i => s"c$i") :+ shared) ++ (6 to 12).map(i => s"c$i")
    val ident = (1 to 30).map(i => s"b$i").mkString(" ")
    // a 10-token overlap: below even the winnowing report bar (14)
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("winnowpairs").toString
    Seq(
      (1L, d1.mkString(" ")),
      (2L, d2.mkString(" ")),
      (3L, ident),
      (4L, ident),
      (5L, s"z1 z2 $short z3 z4"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("dedup_winnowing_pairs")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheTracker.releaseAll()
    val pairs = got.map(t => (t._1, t._2)).toSet
    // coverage: both true >=20-token pairs surface
    assert(pairs == Set((1L, 2L), (3L, 4L)), s"got ${got.toSeq}")
    // the detected span is within the winnowing boundary slack of truth:
    // true span T is detected as a run in [T - 2(w-1), T]
    val bySpan = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(bySpan((1L, 2L)) >= 25L - 6 && bySpan((1L, 2L)) <= 25L)
    assert(bySpan((3L, 4L)) >= 30L - 6 && bySpan((3L, 4L)) <= 30L)
  }

  test("coverage vs dedup_span on the fixture corpus; posting mass is sparser") {
    val sf = "/root/testdata/sf0.001"
    val spanPairs = SparkEntry.queries("dedup_span")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheTracker.releaseAll()
    val winPairs = SparkEntry.queries("dedup_winnowing_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheTracker.releaseAll()
    // the guarantee direction: winnowing catches every >=20-token span pair
    assert(spanPairs.subsetOf(winPairs),
      s"missed: ${(spanPairs -- winPairs).take(5)}")

    // sparsity: winnowed postings ~2/(w+1) of the full positional index
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val sh = Tables.t(spark, sf, "documents")
      .withColumn("t", expr(tokensS("text")))
      .withColumn("th", expr(tokenHashesS("t")))
      .select(col("doc_id"), expr(shingleHashesS("th")).as("sh"))
      .filter(size(col("sh")) >= 4)
      .persist()
    val full = sh.select(sum(size(col("sh")))).collect()(0).getLong(0)
    val sel = sh.withColumn("ps", expr(
        "array_distinct(transform(sequence(1, size(sh) - 3), p -> " +
        "p + 3 - pmod(array_min(transform(sequence(p, p + 3), " +
        "j -> element_at(sh, j) * 8 + (p + 3 - j))), 8)))"))
      .select(sum(size(col("ps")))).collect()(0).getLong(0)
    sh.unpersist()
    assert(sel.toDouble / full < 0.55, s"selected $sel of $full postings")
  }
}
