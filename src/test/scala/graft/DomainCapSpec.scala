package graft

import org.scalatest.funsuite.AnyFunSuite

/** txt_domain_cap semantics: over-cap domains keep their 10 best docs
  * (quality desc, doc_id tiebreak), under-cap domains pass untouched, and
  * min_kept_quality reports the induced threshold.
  */
class DomainCapSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("cap keeps the best 10 per domain; small domains untouched") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("domaincap").toString
    // 12 docs in "big": quality rises with repetition-free length, so the
    // two shortest all-identical-token docs are the two dropped ones
    val big = (1 to 12).map { i =>
      val distinct = (1 to (i + 2)).map(j => s"w${i}_$j")
      (i.toLong, "big", (distinct ++ distinct.take(2)).mkString(" "))
    }
    val small = Seq((100L, "small", "the a of unique tokens here"))
    (big ++ small).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("txt_domain_cap")(spark, tmp)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    graft.CacheTracker.releaseAll()
    val bys = got.map(t => t._1 -> t).toMap
    assert(bys("big")._2 == 10L && bys("big")._3 == 2L, s"got ${got.toSeq}")
    assert(bys("small") == ("small", 1L, 0L, 6L, 0L), s"got ${got.toSeq}")
    // dropped token mass = the two lowest-quality docs' tokens (docs 1-2:
    // 5 and 6 tokens — shortest, lowest len_score at equal distinct ratio)
    assert(bys("big")._5 == 11L, s"got ${got.toSeq}")
  }
}
