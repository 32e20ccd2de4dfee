package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The real-binary video path: per-frame perceptual hashes over
  * JDK-decoded animated-GIF frames must detect a SHARED CLIP — a run of
  * consecutive frames matching at a constant temporal offset — between
  * actually-perturbed videos, while a frame-REORDERED video (same frames,
  * shuffled) and an unrelated video stay out. Drives
  * [[graft.analytics.MultimodalQueries.clipPairsFromFrameHashes]], the
  * same banded-LSH + diagonal-runs logic `mm_video_pairs` oracle-checks
  * on the text stand-in.
  */
class MultimodalVideoSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Deterministic structured frame: a diagonal gradient with
    * seed-dependent texture — distinct seeds yield hashes far apart (the
    * separation assertion below makes that self-checking).
    */
  private def frame(seed: Int, w: Int = 64, h: Int = 64,
      bright: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = (x * 255 / w + y * 128 / h + ((x + seed * 7) / 9 % 2) * 40 +
        ((y + seed * 13) / 11 % 2) * 30 + seed * 29) % 256
      val v = math.min(t + bright, 255)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def gif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("animated-GIF frames decode to per-frame hashes; distinct frames separate") {
    val hs = Multimodal.videoFrameHashes(gif((1 to 8).map(frame(_)))).get
    assert(hs.length == 8)
    // distinct-seed frames must not sit within the verify radius of each
    // other, or clip detection could not tell frames apart
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 6,
        s"frames $i,$j too close: ${hamming(hs(i), hs(j))}")
    // a brightness-perturbed re-encode of a frame stays within the radius
    val hb = Multimodal.videoFrameHashes(gif(Seq(frame(3, bright = 20)))).get
    assert(hamming(hs(2), hb(0)) <= 6,
      s"brightness drifted ${hamming(hs(2), hb(0))} bits")
    // undecodable bytes stay total via None
    assert(Multimodal.videoFrameHashes(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("shared clip detected between perturbed videos; reordered/unrelated stay out") {
    import spark.implicits._
    // A: frames 1..8. B: noise, then A's frames 3..6 brightened (a lifted
    // clip at temporal offset 1), then noise. C: A's frames pair-swapped —
    // every frame matches somewhere but no 3 consecutive share a diagonal.
    // D: unrelated frames entirely.
    val vids = Seq(
      1 -> gif((1 to 8).map(frame(_))),
      2 -> gif(Seq(frame(11)) ++ (3 to 6).map(frame(_, bright = 20)) ++ Seq(frame(12))),
      3 -> gif(Seq(2, 1, 4, 3, 6, 5, 8, 7).map(frame(_))),
      4 -> gif((21 to 26).map(frame(_))))
    val fr = vids.flatMap { case (vid, bytes) =>
      Multimodal.videoFrameHashes(bytes).get.zipWithIndex.map {
        case (h, i) => (vid, i + 1, h)
      }
    }.toDF("vid", "fi", "h")
    val pairs = graft.analytics.MultimodalQueries
      .clipPairsFromFrameHashes(fr, hamMax = 6, minClip = 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1, 2)), s"lifted clip not found: $pairs")
    assert(pairs((1, 2)) == 4L, s"expected 4-frame clip, got ${pairs((1, 2))}")
    assert(!pairs.contains((1, 3)), s"reordered video paired: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 4 || p._2 == 4),
      s"unrelated video paired: $pairs")
  }
}
