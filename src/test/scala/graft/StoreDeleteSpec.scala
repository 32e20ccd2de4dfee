package graft

import graft.operators.{DupGraph, IvfIndex, MinHashIndex, PqIndex, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion propagation across the persistent derived stores: after
  * `delete(ids)`, every store must behave exactly as if the ids were never
  * ingested — search/probe results equal a fresh build over the survivors,
  * no stale partition keeps serving deleted rows, and fully-emptied
  * partitions disappear from disk (the dynamic-overwrite blind spot).
  */
class StoreDeleteSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
  private def emb = Tables.t(spark, sf, "embeddings")

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def idFrame(ids: Seq[Long], name: String) = {
    import spark.implicits._
    ids.toDF(name)
  }

  test("text index: post-delete search equals a fresh build over survivors") {
    val idx = tmp("ti_del")
    val ref = tmp("ti_del_ref")
    val deleted = Seq(3L, 7L, 11L, 42L)
    TextIndex.build(docs, idx)
    TextIndex.delete(spark, idx, idFrame(deleted, "doc_id"))
    TextIndex.build(docs.filter(!col("doc_id").isin(deleted: _*)), ref)
    val qids = idFrame(Seq(0L, 5L, 20L), "qid")
    val got = TextIndex.search(spark, idx, qids, k = 5).collect().toSet
    val want = TextIndex.search(spark, ref, qids, k = 5).collect().toSet
    graft.CacheTracker.releaseAll()
    // N/avgdl/df re-derive from surviving rows, so scores — including other
    // docs' normalization — must be BIT-identical to the never-ingested index
    assert(want.nonEmpty && got == want)
  }

  test("batched text index: only affected partitions rewrite; emptied batch dir vanishes") {
    val idx = tmp("ti_del_batched")
    val b0 = docs.filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
    val b2 = docs.filter(col("doc_id") >= 120 && col("doc_id") < 200)
    TextIndex.appendBatch(b0, idx, 0L)
    TextIndex.appendBatch(b1, idx, 1L)
    TextIndex.appendBatch(b2, idx, 2L)
    val untouched = new java.io.File(s"$idx/postings/batch_id=2")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    // delete a slice of batch 0 and ALL of batch 1
    val deleted = (Seq(3L, 7L) ++ (100L until 120L)).map(Long.box).map(Long.unbox)
    TextIndex.delete(spark, idx, idFrame(deleted, "doc_id"))
    // batch 1 emptied entirely -> its partition dirs must be gone
    assert(!new java.io.File(s"$idx/postings/batch_id=1").exists())
    assert(!new java.io.File(s"$idx/doclens/batch_id=1").exists())
    // batch 2 held no deleted docs -> its files must be byte-untouched
    val after = new java.io.File(s"$idx/postings/batch_id=2")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == untouched, "unaffected partition was rewritten")
    // and no surviving row references a deleted doc
    assert(TextIndex.postings(spark, idx)
      .filter(col("doc_id").isin(deleted: _*)).count() == 0)
    assert(TextIndex.docLengths(spark, idx)
      .filter(col("doc_id").isin(deleted: _*)).count() == 0)
  }

  test("minhash index: deleted docs can never pair with a later batch") {
    val idx = tmp("mh_del")
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    MinHashIndex.build(existing, idx)
    val sigBefore = MinHashIndex.signatures(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deleted = sigBefore.take(30).toSeq
    MinHashIndex.delete(spark, idx, idFrame(deleted, "doc_id"))
    val sigAfter = MinHashIndex.signatures(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigAfter == sigBefore -- deleted)
    val pairs = MinHashIndex.newPairs(docs.filter(col("doc_id") % 10 === 0), idx)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    graft.CacheTracker.releaseAll()
    assert(pairs.forall { case (a, b) => !deleted.contains(a) && !deleted.contains(b) })
  }

  test("ivf index: probes exclude deleted vectors; emptied cell dir vanishes") {
    val idx = tmp("ivf_del")
    IvfIndex.build(emb, idx, nCells = 8, iters = 2)
    val byCell = spark.read.parquet(s"$idx/vectors")
      .select("vec_id", "cell").collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // empty one whole cell, plus a couple of vectors from another
    val (deadCell, deadIds) = byCell.minBy(_._2.size)
    val partial = byCell.filter(_._1 != deadCell).head._2.take(2)
    val deleted = (deadIds ++ partial).toSeq
    IvfIndex.delete(spark, idx, idFrame(deleted, "vec_id"))
    assert(!new java.io.File(s"$idx/vectors/cell=$deadCell").exists())
    val remaining = spark.read.parquet(s"$idx/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(remaining == byCell.values.flatten.toSet -- deleted)
    val probed = IvfIndex.probe(spark, idx,
        emb.filter(col("vec_id") < 3), k = 5, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    graft.CacheTracker.releaseAll()
    assert(probed.nonEmpty && probed.intersect(deleted.toSet).isEmpty)
  }

  test("pq index: deleted codes leave the ADC scan; codebooks stay frozen") {
    val idx = tmp("pq_del")
    PqIndex.build(emb, idx)
    val cbBefore = PqIndex.codebooks(spark, idx).collect().toSet
    val deleted = Seq(10L, 11L, 12L)
    PqIndex.delete(spark, idx, idFrame(deleted, "vec_id"))
    assert(PqIndex.codes(spark, idx)
      .filter(col("vec_id").isin(deleted: _*)).count() == 0)
    assert(PqIndex.codebooks(spark, idx).collect().toSet == cbBefore)
  }

  test("streaming takedown: one request batch reaches index, BM25 store, and lake; replay is idempotent") {
    import java.sql.Timestamp
    import graft.streaming.DocumentStream
    val idx = tmp("td_idx")
    val ti = tmp("td_text")
    val lake = tmp("td_lake")
    import spark.implicits._
    val b0 = Seq(
      DocumentStream.DocEvent(1L, "alpha beta gamma delta epsilon zeta", Timestamp.valueOf("2024-07-23 10:00:00")),
      DocumentStream.DocEvent(2L, "one two three four five six seven", Timestamp.valueOf("2024-07-23 10:00:10")),
      DocumentStream.DocEvent(3L, "red orange yellow green blue indigo", Timestamp.valueOf("2024-07-23 10:00:20"))).toDF()
    DocumentStream.ingestBatch(b0, 0L, idx, lake)
    TextIndex.appendBatch(b0.select(col("docId").as("doc_id"), col("text")), ti, 0L)
    // media-fingerprint store over the same docs (batch-driven layout)
    val mi = tmp("td_media")
    graft.operators.MediaGraph.appendBatch(
      b0.select(col("docId").as("doc_id"), col("text")), mi, 0L)

    DocumentStream.takedownBatch(idFrame(Seq(2L), "doc_id"), idx, lake,
      Some(ti), Some(mi))
    def lakeIds = spark.read.parquet(lake).select("docId")
      .collect().map(_.getLong(0)).toSet
    def sigIds = MinHashIndex.signatures(spark, idx).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    def postIds = TextIndex.postings(spark, ti).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    def mediaIds = graft.operators.MediaGraph.phash(spark, mi).select("doc_id")
      .unionByName(graft.operators.MediaGraph.audio(spark, mi).select("doc_id"))
      .unionByName(graft.operators.MediaGraph.frames(spark, mi).select("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(lakeIds == Set(1L, 3L) && sigIds == Set(1L, 3L) && postIds == Set(1L, 3L))
    assert(!mediaIds.contains(2L) && mediaIds.contains(1L))

    // at-least-once replay of the same request batch: same state, no error
    DocumentStream.takedownBatch(idFrame(Seq(2L), "doc_id"), idx, lake,
      Some(ti), Some(mi))
    assert(lakeIds == Set(1L, 3L) && sigIds == Set(1L, 3L) && postIds == Set(1L, 3L))
    assert(!mediaIds.contains(2L))
    graft.CacheTracker.releaseAll()
  }

  test("takedownContinuous: requests stream through foreachBatch to the stores") {
    import java.sql.Timestamp
    import graft.streaming.DocumentStream
    val idx = tmp("tdc_idx")
    val lake = tmp("tdc_lake")
    val ckpt = tmp("tdc_ckpt")
    import spark.implicits._
    DocumentStream.ingestBatch(Seq(
      DocumentStream.DocEvent(1L, "alpha beta gamma delta epsilon zeta", Timestamp.valueOf("2024-07-23 10:00:00")),
      DocumentStream.DocEvent(2L, "one two three four five six seven", Timestamp.valueOf("2024-07-23 10:00:10")),
      DocumentStream.DocEvent(3L, "red orange yellow green blue indigo", Timestamp.valueOf("2024-07-23 10:00:20"))).toDF(),
      0L, idx, lake)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = DocumentStream.takedownContinuous(ms.toDS(), idx, lake, ckpt)
    try {
      ms.addData(1L)
      q.processAllAvailable()
      ms.addData(3L)
      q.processAllAvailable()
      val sig = MinHashIndex.signatures(spark, idx).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val lk = spark.read.parquet(lake).select("docId")
        .collect().map(_.getLong(0)).toSet
      assert(sig == Set(2L) && lk == Set(2L))
    } finally q.stop()
    graft.CacheTracker.releaseAll()
  }

  test("embedding takedown: one request batch reaches IVF, PQ and SQ8 stores; replay is idempotent") {
    import graft.streaming.EmbeddingStream
    import graft.operators.SqIndex
    val ivf = tmp("etd_ivf")
    val pq = tmp("etd_pq")
    val sq = tmp("etd_sq")
    IvfIndex.build(emb, ivf, nCells = 8, iters = 2)
    PqIndex.build(emb, pq)
    SqIndex.build(emb, sq)
    val deleted = Seq(5L, 9L, 13L)
    EmbeddingStream.takedownBatch(idFrame(deleted, "vec_id"),
      Some(ivf), Some(pq), Some(sq))
    def ivfIds = spark.read.parquet(s"$ivf/vectors").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    def pqIds = PqIndex.codes(spark, pq).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    def sqIds = SqIndex.codes(spark, sq).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val want = emb.select("vec_id").collect().map(_.getLong(0)).toSet -- deleted
    assert(ivfIds == want && pqIds == want && sqIds == want)
    // probes can never return deleted vectors from ANY store
    val probed = IvfIndex.probe(spark, ivf,
        emb.filter(col("vec_id") < 3), k = 5, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probed.nonEmpty && probed.intersect(deleted.toSet).isEmpty)
    // at-least-once replay: same state, no error
    EmbeddingStream.takedownBatch(idFrame(deleted, "vec_id"),
      Some(ivf), Some(pq), Some(sq))
    assert(ivfIds == want && pqIds == want && sqIds == want)
    graft.CacheTracker.releaseAll()
  }

  test("embedding takedownContinuous: requests stream through foreachBatch to all vector stores") {
    import graft.streaming.EmbeddingStream
    import graft.operators.SqIndex
    val ivf = tmp("etdc_ivf")
    val sq = tmp("etdc_sq")
    IvfIndex.build(emb, ivf, nCells = 8, iters = 2)
    SqIndex.build(emb, sq)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = EmbeddingStream.takedownContinuous(ms.toDS(), tmp("etdc_ckpt"),
      ivfPath = Some(ivf), sqPath = Some(sq))
    try {
      ms.addData(1L)
      q.processAllAvailable()
      ms.addData(4L)
      q.processAllAvailable()
      val ivfIds = spark.read.parquet(s"$ivf/vectors").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val sqIds = SqIndex.codes(spark, sq).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(!ivfIds.contains(1L) && !ivfIds.contains(4L))
      assert(!sqIds.contains(1L) && !sqIds.contains(4L))
      assert(ivfIds.nonEmpty && ivfIds == sqIds)
    } finally q.stop()
    graft.CacheTracker.releaseAll()
  }

  test("dup graph: edges touching deleted docs drop from edges AND signatures") {
    val idx = tmp("dg_del")
    DupGraph.buildFrom(docs, idx)
    val before = DupGraph.edges(spark, idx)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(before.nonEmpty, "fixture must contain near-dup edges")
    val deleted = Seq(before.head._1, before.last._2).distinct
    DupGraph.delete(spark, idx, idFrame(deleted, "doc_id"))
    val after = DupGraph.edges(spark, idx)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheTracker.releaseAll()
    // surviving edges = exactly the original minus those touching deleted
    assert(after.toSet == before.filterNot { case (a, b) =>
      deleted.contains(a) || deleted.contains(b) }.toSet)
    val sigs = MinHashIndex.signatures(spark, s"$idx/sig")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigs.intersect(deleted.toSet).isEmpty)
  }
}
