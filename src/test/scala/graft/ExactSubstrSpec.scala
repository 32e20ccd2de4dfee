package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_exact_substr semantics on crafted documents: the canonical (lowest
  * doc_id) copy keeps its text, every later doc loses exactly the shared
  * >=20-token spans, sub-threshold overlaps are untouched, and overlapping
  * islands from different partners union without double-counting.
  */
class ExactSubstrSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("keep-first rewrite removes exactly the duplicated token mass") {
    import spark.implicits._
    val shared = (1 to 30).map(i => s"s$i")
    val tmp = java.nio.file.Files.createTempDirectory("exactsubstr").toString
    val ident = (1 to 25).map(i => s"d$i")
    Seq(
      // canonical owner of `shared`: removal never touches the lowest id
      (1L, "a", ((1 to 5).map(i => s"a$i") ++ shared ++ (6 to 10).map(i => s"a$i")).mkString(" ")),
      // later doc sharing the 30-token span: loses exactly those 30 tokens
      (2L, "b", ((1 to 3).map(i => s"b$i") ++ shared ++ (4 to 7).map(i => s"b$i")).mkString(" ")),
      // 10-token overlap with doc 1: below the 20-token bar, untouched
      (3L, "c", ((1 to 20).map(i => s"c$i") ++ shared.take(10)).mkString(" ")),
      // identical twins: the later one is removed wholesale
      (4L, "d", ident.mkString(" ")),
      (5L, "d", ident.mkString(" ")),
      // shares `shared` with BOTH doc 1 and doc 2: intervals union, not add
      (6L, "e", shared.mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("dedup_exact_substr")(spark, tmp)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    graft.CacheTracker.releaseAll()
    assert(got.toSeq == Seq(
      ("a", 1L, 0L, 0L, 40L),
      ("b", 1L, 1L, 30L, 37L),
      ("c", 1L, 0L, 0L, 30L),
      ("d", 2L, 1L, 25L, 50L),
      ("e", 1L, 1L, 30L, 30L)), s"got ${got.toSeq}")
  }
}
