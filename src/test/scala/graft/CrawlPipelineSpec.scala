package graft

import graft.sources.CrawlImport
import graft.streaming.DocumentStream
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-to-lake end to end: JSONL shards arrive in a watched directory,
  * stream through the full curation tier (quality -> repetition ->
  * near-dup vs the persistent index), and survivors land PII-scrubbed in
  * the lake — with cross-shard dedup proving the index horizon spans the
  * whole crawl history, not just one micro-batch.
  */
class CrawlPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val textA = "the winter summer autumn spring ocean forest desert tundra and valley is wide"
  private val textC = "the copper silver golden bronze iron marble granite quartz and slate is dense"
  private val textPii =
    "the contact is john@example.com or https://example.com/page and the office address stands elsewhere"

  test("jsonl shards stream through curation into a scrubbed, deduped lake") {
    val shards = java.nio.file.Files.createTempDirectory("crawl_shards")
    val idx = java.nio.file.Files.createTempDirectory("crawl_idx").toString
    val lake = java.nio.file.Files.createTempDirectory("crawl_lake").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl_ckpt").toString

    def writeShard(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("shard", ".tmp")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      // atomic move: the file source must never read a half-written shard
      java.nio.file.Files.move(tmp, shards.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    // shard 1: a PII doc, a clean doc, an in-shard near-dup of it, a
    // repetition-junk doc, and a malformed line (dropped by the source)
    writeShard("s1.jsonl", Seq(
      s"""{"doc_id": 1, "text": "$textPii", "fetched_at": "2024-07-23 10:00:00"}""",
      s"""{"doc_id": 2, "text": "$textA", "fetched_at": "2024-07-23 10:00:01"}""",
      s"""{"doc_id": 3, "text": "$textA iota", "fetched_at": "2024-07-23 10:00:02"}""",
      s"""{"doc_id": 4, "text": "spam spam spam spam spam spam spam spam spam spam spam spam", "fetched_at": "2024-07-23 10:00:03"}""",
      """not json {{{"""))

    val reports = scala.collection.mutable.ArrayBuffer
      .empty[DocumentStream.CurationBatchReport]
    val q = DocumentStream.curateContinuous(
      CrawlImport.stream(spark, shards.toString), idx, lake, ckpt,
      onBatch = reports += _)
    try {
      q.processAllAvailable()
      // shard 2 arrives later: a cross-shard near-dup of doc 2 (must drop
      // against the INDEX, not an in-batch pair) and a genuinely new doc
      writeShard("s2.jsonl", Seq(
        s"""{"doc_id": 11, "text": "$textA kappa", "fetched_at": "2024-07-23 11:00:00"}""",
        s"""{"doc_id": 12, "text": "$textC", "fetched_at": "2024-07-23 11:00:01"}"""))
      q.processAllAvailable()

      val landed = spark.read.parquet(lake).select("docId", "text").collect()
        .map(r => r.getAs[Long]("docId") -> r.getAs[String]("text")).toMap
      // survivors: 1 (scrubbed), 2, 12; dropped: 3 + 11 (near-dup),
      // 4 (repetition), the malformed line never entered
      assert(landed.keySet == Set(1L, 2L, 12L), s"unexpected lake set $landed")
      assert(landed(1L).contains("[EMAIL]") && landed(1L).contains("[URL]"),
        s"PII not scrubbed: ${landed(1L)}")
      assert(!landed(1L).contains("john@example.com"))
      val dupDrops = reports.map(_.droppedDuplicate).sum
      assert(dupDrops == 2, s"expected 2 near-dup drops, got $reports")
    } finally q.stop()
  }
}
