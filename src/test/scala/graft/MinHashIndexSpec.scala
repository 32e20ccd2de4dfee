package graft

import graft.operators.MinHashIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent MinHash signature index: incremental pairs must equal the
  * from-scratch pipeline restricted to pairs touching the new batch, the
  * stored side must come from the signature parquet (not a re-tokenization
  * of the corpus), and appended batches must be visible to later ones.
  */
class MinHashIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.t(spark, sf, "documents").select("doc_id", "text")

  test("incremental pairs equal the from-scratch run restricted to new docs") {
    val dir = java.nio.file.Files.createTempDirectory("mh_index").toString
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    MinHashIndex.build(existing, dir)

    val got = MinHashIndex.newPairs(fresh, dir)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // from-scratch reference over the full corpus, restricted to pairs
    // with >= 1 new-batch member
    val want = graft.analytics.DedupQueries.minhashPairs(spark, sf)
      .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.CacheTracker.releaseAll()

    assert(want.nonEmpty, "fixture must contain near-dups touching the new slice")
    assert(got == want)
    // and nothing between two indexed docs leaks through
    assert(got.forall(p => p._1 % 10 == 0 || p._2 % 10 == 0))
  }

  test("stored side reads the index parquet with sig/hs in the scan schema") {
    // the decisive proof that the stored side comes from the index, not a
    // re-tokenization, is behavioral (the append test: doc 2 is visible to
    // batch 2 ONLY via the signature parquet). This pins the plan shape:
    // the signature store is scanned, and the scan carries the stored hs
    // and sig columns — i.e. the join consumes persisted signatures rather
    // than recomputing them.
    val dir = java.nio.file.Files.createTempDirectory("mh_index_plan").toString
    MinHashIndex.build(docs.filter(col("doc_id") % 10 =!= 0), dir)
    val plan = MinHashIndex.newPairs(docs.filter(col("doc_id") % 10 === 0), dir)
      .queryExecution.executedPlan.toString
    graft.CacheTracker.releaseAll()
    val sigScan = plan.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("signatures"))
    assert(sigScan.isDefined, s"expected a signature-store scan in:\n$plan")
    assert(sigScan.get.contains("sig"), s"sig missing from scan: ${sigScan.get}")
  }

  test("appended batches are dedup targets for later batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mh_index_append").toString
    val text = "the quick brown fox jumps over the lazy dog and then naps all afternoon in the warm sun"
    val batch0 = Seq((1L, "completely unrelated first document about spark shuffles and partitions and joins and aggregations"))
      .toDF("doc_id", "text")
    val batch1 = Seq((2L, text)).toDF("doc_id", "text")
    val batch2 = Seq((3L, text), (4L, "another singleton document mentioning parquet footers and column chunks and row groups only"))
      .toDF("doc_id", "text")

    MinHashIndex.build(batch0, dir)
    assert(MinHashIndex.exists(spark, dir))
    // batch1 arrives: no dups yet
    val p1 = MinHashIndex.newPairs(batch1, dir).collect()
    assert(p1.isEmpty, s"got ${p1.toSeq}")
    MinHashIndex.append(batch1, dir)
    // batch2 duplicates doc 2, which arrived by APPEND, not build
    val p2 = MinHashIndex.newPairs(batch2, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheTracker.releaseAll()
    assert(p2 == Set((2L, 3L)), s"got $p2")
    // folding batch2 in completes the cycle: all four docs' signatures stored
    MinHashIndex.append(batch2, dir)
    assert(MinHashIndex.signatures(spark, dir).count() == 4)
  }

  test("ensureBuilt is idempotent and registryPath is corpus-stable") {
    val p1 = MinHashIndex.registryPath(spark, sf, "mod10")
    val p2 = MinHashIndex.registryPath(spark, sf, "mod10")
    assert(p1 == p2)
    assert(p1 != MinHashIndex.registryPath(spark, sf, "other-tag"))

    val dir = java.nio.file.Files.createTempDirectory("mh_index_idem").toString
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    MinHashIndex.ensureBuilt(existing, dir)
    val firstWrite = new java.io.File(s"$dir/signatures/_SUCCESS").lastModified()
    MinHashIndex.ensureBuilt(existing, dir)
    assert(new java.io.File(s"$dir/signatures/_SUCCESS").lastModified() == firstWrite,
      "second ensureBuilt must not rebuild")
  }
}
