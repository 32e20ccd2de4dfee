package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_cluster_canonical semantics: the canonical member is the
  * highest-quality one (not the min id), ties fall to the smaller id, and
  * the cluster key stays on the min-id representative.
  */
class ClusterCanonicalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("keeps the best member; rep stays min id; quality ties break to min id") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("canon").toString
    val toks = (1 to 12).map(i => s"w$i")
    // cluster A: identical token sequences (identical shingles -> identical
    // minhash -> guaranteed verified pair at j = 1), but doc 1 is padded
    // with extra whitespace: tokens and shingles are unchanged (split on
    // \s+) while length(trim(text)) grows, so len_score — and with it
    // quality — is strictly higher for doc 1 than doc 0
    val short = toks.mkString(" ")
    val long = toks.mkString("      ")
    // cluster B: two byte-identical docs -> equal quality, canonical = min id
    val same = (21 to 32).map(i => s"v$i").mkString(" ")
    Seq((0L, short), (1L, long), (10L, same), (11L, same))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("dedup_cluster_canonical")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.CacheTracker.releaseAll()

    assert(got.length == 2, s"got ${got.toSeq}")
    val bys = got.map(t => t._1 -> t).toMap
    // cluster A keyed on rep 0, canonical is the longer (higher-quality) doc 1
    assert(bys(0L)._2 == 2L && bys(0L)._3 == 1L, s"got ${got.toSeq}")
    // cluster B: equal quality, tie falls to the smaller id
    assert(bys(10L)._2 == 2L && bys(10L)._3 == 10L, s"got ${got.toSeq}")
  }
}
