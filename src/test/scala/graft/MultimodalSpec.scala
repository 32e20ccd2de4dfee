package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The typed batched-decode path must agree with the declarative SQL path
  * (mm_media_meta) on the shared feature columns, and batching must not
  * change results — only the amortization shape.
  */
class MultimodalSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSpec.spark

  private lazy val media = Multimodal.toMedia(Tables.t(spark, sf, "documents"))

  test("decodeBatch features match the SQL mm_media_meta computation") {
    val typed = Multimodal.decodeBatch(media, batchSize = 32)
      .collect().map(f => f.docId -> f).toMap
    val sql = SparkEntry.queries("mm_media_meta")(spark, sf).collect()
    assert(sql.nonEmpty && sql.length == typed.size)
    sql.foreach { row =>
      val f = typed(row.getAs[Long]("doc_id"))
      assert(f.mediaType == row.getAs[String]("media_type"))
      assert(f.nBytes == row.getAs[Int]("n_bytes"))
      assert(f.payloadMd5 == row.getAs[String]("payload_md5"))
      assert(f.width == row.getAs[Int]("width"))
      assert(f.height == row.getAs[Int]("height"))
      assert(math.abs(f.meanByte - row.getAs[Double]("mean_byte")) < 1e-4)
    }
  }

  test("batch size does not change results, only batch shape") {
    val a = Multimodal.decodeBatch(media, batchSize = 1)
      .collect().sortBy(_.docId).map(f => (f.docId, f.payloadMd5, f.byteHisto.toSeq))
    val b = Multimodal.decodeBatch(media, batchSize = 1000)
      .collect().sortBy(_.docId).map(f => (f.docId, f.payloadMd5, f.byteHisto.toSeq))
    assert(a.toSeq == b.toSeq)
  }

  test("byte histogram buckets sum to payload size") {
    Multimodal.decodeBatch(media).collect().foreach { f =>
      assert(f.byteHisto.sum == f.nBytes)
    }
  }

  test("custom decoder gets open-once/close-on-drain per task and bounded batches") {
    MultimodalSpec.opens.set(0)
    MultimodalSpec.closes.set(0)
    MultimodalSpec.maxBatch.set(0)
    val spread = media.repartition(4)
    val n = Multimodal.decodeBatch(spread, batchSize = 16,
      decoder = new MultimodalSpec.CountingDecoder).count()
    assert(n == media.count())
    assert(MultimodalSpec.opens.get() == 4, s"opens=${MultimodalSpec.opens.get()}")
    assert(MultimodalSpec.closes.get() == 4, s"closes=${MultimodalSpec.closes.get()}")
    assert(MultimodalSpec.maxBatch.get() <= 16)
  }
}

object MultimodalSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxBatch = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Instruments the per-task lifecycle (local mode: one shared JVM). */
  final class CountingDecoder extends Multimodal.MediaDecoder {
    override def open(): Unit = opens.incrementAndGet()
    override def decode(batch: Seq[Multimodal.MediaRecord]): Iterator[Multimodal.MediaFeatures] = {
      maxBatch.getAndUpdate(m => math.max(m, batch.size))
      batch.iterator.map(Multimodal.fakeDecode)
    }
    override def close(): Unit = closes.incrementAndGet()
  }
}
