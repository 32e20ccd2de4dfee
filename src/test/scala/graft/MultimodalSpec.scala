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
}
