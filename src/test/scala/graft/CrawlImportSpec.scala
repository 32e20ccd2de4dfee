package graft

import graft.sources.CrawlImport
import org.scalatest.funsuite.AnyFunSuite

/** JSONL crawl importing: good lines land in the documents shape with
  * deterministic defaults, malformed lines and text-less objects are
  * quarantined (never thrown, never silently dropped), and content-hash
  * fallback ids are replay-stable.
  */
class CrawlImportSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def shard(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("crawl")
    java.nio.file.Files.write(dir.resolve("part-000.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("good, defaulted, malformed, and text-less lines route correctly") {
    val p = shard(Seq(
      """{"doc_id": 7, "text": "hello world", "lang": "en", "source": "webA"}""",
      """{"text": "sans id et source, avec des accents: é"}""",
      """{"doc_id": 9, "lang": "en"}""",
      """this is not json at all {{{""",
      """{"doc_id": "not-a-number", "text": "typed wrong"}"""))
    val imp = CrawlImport.fromJsonl(spark, p)
    val docs = imp.docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._2)

    // doc 7 verbatim; the id-less line got defaults + a stable hash id
    assert(docs.map(_._2).toSeq ==
      Seq("hello world", "sans id et source, avec des accents: é"))
    val Seq(full, defaulted) = docs.sortBy(_._2).toSeq
    assert(full == (7L, "hello world", "en", "webA", 11L))
    assert(defaulted._3 == "und" && defaulted._4 == "crawl")
    assert(defaulted._1 >= 0L)
    // same shard re-imported => same ids (content-hash fallback, no RNG)
    val again = CrawlImport.fromJsonl(spark, p).docs.collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(again == docs.map(_._1).sorted.toSeq)

    // the bare-garbage line and the wrong-typed line are quarantined;
    // the parseable-but-text-less object is quarantined too
    assert(imp.quarantine.count() == 3)
  }

  test("imported docs flow straight into the engine's query surface") {
    val p = shard((1 to 30).map(i =>
      s"""{"doc_id": $i, "text": "alpha beta gamma delta token$i", "lang": "en"}"""))
    val docs = CrawlImport.fromJsonl(spark, p).docs
    // the documents-table shape is what every txt_/dedup_ operator reads
    assert(docs.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val stats = analytics.TextQueries.bm25Postings(docs)
      .groupBy().count().collect().head.getLong(0)
    assert(stats > 0, "postings built from imported docs")
  }
}
