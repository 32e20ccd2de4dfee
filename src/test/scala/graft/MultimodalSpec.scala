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

  test("JdkDecoder decodes real PNG payloads: true dimensions + luminance stats") {
    import spark.implicits._
    // 3 real PNGs with known content: solid black, solid white, half/half
    def png(w: Int, h: Int, fill: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val black = png(40, 30, (_, _) => 0x000000)
    val white = png(16, 16, (_, _) => 0xffffff)
    val half = png(10, 10, (x, _) => if (x < 5) 0x000000 else 0xffffff)
    val ds = Seq(
      Multimodal.MediaRecord(1L, "image", black, 99, 99),
      Multimodal.MediaRecord(2L, "image", white, 99, 99),
      Multimodal.MediaRecord(3L, "image", half, 99, 99)).toDS()
    val out = Multimodal.decodeBatch(ds, batchSize = 2,
      decoder = Multimodal.JdkDecoder).collect().map(f => f.docId -> f).toMap
    // declared 99x99 is ignored: dimensions come from the DECODED image
    assert(out(1L).width == 40 && out(1L).height == 30)
    assert(out(1L).meanByte == 0.0 && out(1L).byteHisto(0) == 1200L)
    assert(out(2L).width == 16 && out(2L).height == 16)
    // BT.601 of white = (299+587+114)*255/1000 = 255 -> bucket 7
    assert(out(2L).meanByte == 255.0 && out(2L).byteHisto(7) == 256L)
    assert(out(3L).byteHisto(0) == 50L && out(3L).byteHisto(7) == 50L)
    assert(out(3L).meanByte == 127.5)
  }

  test("JdkDecoder decodes real PCM WAV payloads: channels, rate, amplitude stats") {
    import spark.implicits._
    // real 16-bit mono PCM WAV, 8 kHz: constant amplitude 12800 (|s|>>7=100)
    def wav(samples: Array[Short], rateHz: Float): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val tone = wav(Array.fill[Short](800)(12800), 8000f)
    val ds = Seq(Multimodal.MediaRecord(7L, "audio", tone, 0, 0)).toDS()
    val f = Multimodal.decodeBatch(ds, decoder = Multimodal.JdkDecoder)
      .collect().head
    assert(f.width == 1, "channels")
    assert(f.height == 8, "sample rate kHz")
    assert(f.meanByte == 100.0, "mean scaled amplitude")
    assert(f.byteHisto(3) == 800L, "all samples in bucket 100>>5=3")
  }

  test("JdkDecoder falls back to pseudo-features for undecodable payloads") {
    import spark.implicits._
    val junk = Multimodal.MediaRecord(9L, "video",
      "not a media file".getBytes("UTF-8"), 11, 13)
    val f = Multimodal.decodeBatch(Seq(junk).toDS(),
      decoder = Multimodal.JdkDecoder).collect().head
    val want = Multimodal.fakeDecode(junk)
    assert((f.docId, f.mediaType, f.nBytes, f.payloadMd5, f.width, f.height,
      f.meanByte, f.byteHisto.toSeq) ==
      (want.docId, want.mediaType, want.nBytes, want.payloadMd5, want.width,
        want.height, want.meanByte, want.byteHisto.toSeq))
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
