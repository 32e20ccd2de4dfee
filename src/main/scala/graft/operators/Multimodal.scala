package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads are
  * opaque `binary` columns with typed metadata, processed in *batches* inside
  * `mapPartitions` (the Scala analog of python's `mapInPandas` batch UDFs —
  * the iterator is chunked so a real decoder could amortize model/codec
  * setup per batch instead of per row).
  *
  * Decoding is REAL for the codecs the JDK ships: [[JdkDecoder]] decodes
  * PNG/JPEG/BMP/GIF images through `javax.imageio` and PCM WAV audio
  * through `javax.sound.sampled`, emitting true dimensions and
  * luminance/amplitude statistics. Payloads no JDK codec accepts (video,
  * exotic formats) fall back to [[fakeDecode]]'s deterministic
  * pseudo-features, keeping the pipeline total; a production deployment
  * plugs richer codec bindings into the same [[MediaDecoder]] lifecycle.
  *
  * Scale notes: payloads stay columnar (BinaryType) end-to-end; the batch
  * map is a narrow transformation (no shuffle); feature extraction
  * parallelizes per partition, so 100 TB of media spreads across executors
  * with bounded memory = batchSize * maxPayload per task.
  */
object Multimodal {

  /** Typed media row: payload is opaque bytes + declared modality/meta. */
  final case class MediaRecord(
      docId: Long,
      mediaType: String, // "image" | "audio" | "video" — drives the decoder
      payload: Array[Byte],
      declaredWidth: Int,
      declaredHeight: Int)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      docId: Long,
      mediaType: String,
      nBytes: Int,
      payloadMd5: String,
      width: Int,
      height: Int,
      meanByte: Double,
      byteHisto: Array[Long]) // 8 coarse byte-value buckets

  /** Documents -> media records: the text bytes stand in for image payloads
    * (deterministic; in production this column arrives as real media bytes).
    */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("docId"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("mediaType"),
      encode(trim(col("text")), "UTF-8").as("payload"),
      (lit(32) + pmod(col("n_chars"), lit(97))).cast("int").as("declaredWidth"),
      (lit(32) + pmod(col("n_chars") * 31, lit(71))).cast("int").as("declaredHeight"))
      .as[MediaRecord]
  }

  /** Pluggable decode stage. Implementations get a per-partition lifecycle:
    * `open()` once per task (codec init, model load), `decode` per batch,
    * `close()` when the partition drains — the contract a real
    * image/audio/video codec binding would implement. Must be Serializable:
    * the instance ships to executors inside the task closure.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(batch: Seq[MediaRecord]): Iterator[MediaFeatures]
    def close(): Unit = ()
  }

  /** Default decoder: deterministic pseudo-features from payload bytes (real
    * codecs are not available in this environment). Everything around it —
    * schema, batch shape, lifecycle — is the production surface.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decode(batch: Seq[MediaRecord]): Iterator[MediaFeatures] =
      batch.iterator.map(fakeDecode)
  }

  /** Real decoder over the JDK's built-in codecs. `width`/`height` are the
    * modality's shape dims: images report pixel dimensions; audio reports
    * (channels, sample-rate kHz). `meanByte`/`byteHisto` are content
    * statistics over decoded samples — 8-bucket BT.601 luminance for
    * images, 8-bucket absolute 16-bit amplitude (scaled to 0-255) for
    * audio — so downstream quality filters see signal stats, not
    * container-byte noise. Payloads neither codec accepts fall back to
    * [[fakeDecode]] so the pipeline stays total.
    */
  object JdkDecoder extends MediaDecoder {
    override def open(): Unit =
      // executors must not spill ImageIO's tmp-file read cache to disk
      javax.imageio.ImageIO.setUseCache(false)

    override def decode(batch: Seq[MediaRecord]): Iterator[MediaFeatures] =
      batch.iterator.map { r =>
        val real =
          if (r.mediaType == "audio") decodeWav(r) else decodeImage(r)
        real.getOrElse(fakeDecode(r))
      }

    private def decodeImage(r: MediaRecord): Option[MediaFeatures] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          val histo = new Array[Long](8)
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              // integer BT.601 luma — deterministic across platforms
              val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              histo(lum >> 5) += 1
              sum += lum
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          Some(MediaFeatures(r.docId, r.mediaType, r.payload.length,
            md5Hex(r.payload), img.getWidth, img.getHeight,
            if (n == 0) 0.0 else sum.toDouble / n, histo))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    private def decodeWav(r: MediaRecord): Option[MediaFeatures] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = in.getFormat
          // real feature pass needs deterministic sample access: 16-bit PCM
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = in.readAllBytes()
            val big = fmt.isBigEndian
            val histo = new Array[Long](8)
            var sum = 0L
            var i = 0
            while (i + 1 < bytes.length) {
              val s =
                if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
              val amp = math.min(math.abs(s.toInt), 32767) >> 7 // 0..255
              histo(amp >> 5) += 1
              sum += amp
              i += 2
            }
            val n = bytes.length / 2
            Some(MediaFeatures(r.docId, r.mediaType, r.payload.length,
              md5Hex(r.payload), fmt.getChannels,
              math.round(fmt.getSampleRate / 1000f),
              if (n == 0) 0.0 else sum.toDouble / n, histo))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 8×8 block-mean BT.601 luminance grid of a decoded image: each grid
    * cell averages its pixel block (area pooling), so the grid — and the
    * gradient signs hashed from it — is stable under resizing and under
    * global brightness shifts (adding a constant preserves every adjacent
    * comparison). This is the real-decode twin of `mm_phash_pairs`' text
    * stand-in resample.
    */
  def luminanceGrid8(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = new Array[Int](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        // block [x0, x1) x [y0, y1), never empty for w, h >= 8; for tiny
        // images the max() guard keeps at least one pixel per block
        val x0 = gx * w / 8; val x1 = math.max((gx + 1) * w / 8, x0 + 1)
        val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        grid(gy * 8 + gx) = if (n == 0) 0 else (sum / n).toInt
        gx += 1
      }
      gy += 1
    }
    grid
  }

  /** 56-bit horizontal-gradient hash over an 8×8 grid — bit i is set iff
    * pix[(i/7)*8 + i%7] > pix[(i/7)*8 + i%7 + 1]. The SAME packing as the
    * mm_phash_pairs stand-in (8 rows × 7 adjacent comparisons), so hashes
    * from real decoded images drop straight into the banded-LSH candidate
    * pipeline.
    */
  def phash56(pix: Array[Int]): Long = {
    require(pix.length == 64, s"need an 8x8 grid, got ${pix.length}")
    var h = 0L
    var i = 0
    while (i < 56) {
      val p = (i / 7) * 8 + (i % 7)
      if (pix(p) > pix(p + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  /** Decode an image payload with the JDK codecs and hash its luminance
    * grid — None when no codec accepts the bytes (callers fall back to the
    * deterministic stand-in, keeping the pipeline total).
    */
  def phashImage(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some(phash56(luminanceGrid8(img)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 8×8 audio feature grid: 8 equal time windows × 8 "band" energies,
    * band k = log-scaled energy of the k-th order finite difference of the
    * window's samples. Each differencing step is a high-pass, so ascending
    * orders form a crude deterministic filter bank (no FFT dependency),
    * and every energy scales by c² under a volume change c — the
    * adjacent-band comparisons hashed from the grid are amplitude-scale
    * INVARIANT. The grid feeds [[phash56]] unchanged: one 56-bit packing
    * and one banded-LSH candidate pipeline serve both image and audio
    * near-dup detection.
    *
    * Energies accumulate in Double (sequential loop — deterministic IEEE;
    * a Long sum of 7th-order differences squared could overflow on long
    * windows); log1p is a monotone transform, so the Int grid preserves
    * every comparison.
    */
  def audioGrid8(samples: Array[Int]): Array[Int] = {
    val grid = new Array[Int](64)
    val n = samples.length
    var w = 0
    while (w < 8) {
      val x0 = w * n / 8
      val x1 = math.min(math.max((w + 1) * n / 8, x0 + 1), math.max(n, x0 + 1))
      var cur: Array[Int] =
        if (x0 < n) java.util.Arrays.copyOfRange(samples, x0, math.min(x1, n))
        else Array(0)
      var k = 0
      while (k < 8) {
        var e = 0.0
        var i = 0
        while (i < cur.length) { val v = cur(i).toDouble; e += v * v; i += 1 }
        grid(w * 8 + k) = (1000.0 * math.log1p(e)).toInt
        if (cur.length > 1) {
          val nxt = new Array[Int](cur.length - 1)
          var j = 0
          while (j < nxt.length) { nxt(j) = cur(j + 1) - cur(j); j += 1 }
          cur = nxt
        } else cur = Array(0)
        k += 1
      }
      w += 1
    }
    grid
  }

  /** Decode a 16-bit PCM WAV payload with the JDK codec and fingerprint
    * its sample stream — None when the codec rejects the bytes or the
    * format is not 16-bit PCM (callers fall back to the deterministic
    * stand-in, keeping the pipeline total). The audio twin of
    * [[phashImage]].
    */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val big = fmt.isBigEndian
          val samples = new Array[Int](bytes.length / 2)
          var i = 0
          while (2 * i + 1 < bytes.length) {
            samples(i) =
              (if (big) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
               else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort).toInt
            i += 1
          }
          if (samples.isEmpty) None else Some(phash56(audioGrid8(samples)))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode a multi-frame payload (animated GIF — the one video-shaped
    * format the JDK ships a codec for) into per-frame perceptual hashes:
    * frame i → [[phash56]] of its luminance grid, the SAME 56-bit packing
    * the image and audio paths emit, so video frames drop straight into
    * the banded-LSH candidate pipeline and the clip-runs logic of
    * `mm_video_pairs`. Frames are read as stored (the spec writes
    * full-size frames; delta-coded GIFs would need disposal-method
    * compositing first). None when no codec accepts the bytes or the
    * stream holds no frames — callers stay total.
    */
  def videoFrameHashes(payload: Array[Byte]): Option[Vector[Long]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) None
      else {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n <= 0) None
            else Some((0 until n).map(i => phash56(luminanceGrid8(r.read(i)))).toVector)
          } finally { r.dispose(); iis.close() }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def md5Hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString

  /** Fallback decode fn — deterministic pseudo-features from payload bytes,
    * for payloads no JDK codec accepts (video, exotic formats).
    */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    val histo = new Array[Long](8)
    var sum = 0L
    r.payload.foreach { b =>
      val v = b & 0xff
      histo(v >> 5) += 1
      sum += v
    }
    MediaFeatures(
      docId = r.docId,
      mediaType = r.mediaType,
      nBytes = r.payload.length,
      payloadMd5 = hex,
      width = r.declaredWidth,
      height = r.declaredHeight,
      meanByte = if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length,
      byteHisto = histo)
  }

  /** Batched feature extraction: chunk each partition's iterator so the
    * decoder amortizes setup per batch (mapInPandas-style batch shape), with
    * open-once / close-on-drain lifecycle per task.
    */
  def decodeBatch(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64,
      decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    require(batchSize > 0, "batchSize must be positive")
    ds.mapPartitions { it =>
      decoder.open()
      val base = it.grouped(batchSize).flatMap(decoder.decode)
      new Iterator[MediaFeatures] {
        private var closed = false
        def hasNext: Boolean = {
          val h = base.hasNext
          if (!h && !closed) { decoder.close(); closed = true }
          h
        }
        def next(): MediaFeatures = base.next()
      }
    }
  }
}
