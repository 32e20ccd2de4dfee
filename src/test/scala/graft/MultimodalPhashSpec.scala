package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real-binary perceptual-hash path: pHash over JDK-decoded luminance
  * grids must (1) survive the perturbations image near-dup detection
  * exists for — resize and brightness shift — while separating unrelated
  * images, and (2) drive the SAME banded-LSH candidate pipeline the
  * registry query uses, producing verified pairs from actually-perturbed
  * PNG bytes. Also pins the candidate pipeline on constructed near-
  * identical TEXT payloads through the registry query itself, so the band
  * join, star emission, and hamming verify are exercised with nonzero
  * result rows (the corpus-slice differential check passes at 0 rows and
  * would hide a dead pipeline).
  */
class MultimodalPhashSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Deterministic structured test image: a diagonal luminance gradient
    * with block texture — enough gradient signal that every 8×8 block mean
    * is well separated from its neighbor.
    */
  private def baseImage(w: Int, h: Int, invert: Boolean = false): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = (x * 255 / w + y * 128 / h + (x / 9 % 2) * 40) % 256
      val v = if (invert) 255 - t else t
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def resized(img: java.awt.image.BufferedImage, w: Int, h: Int) = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  private def brightened(img: java.awt.image.BufferedImage, delta: Int) = {
    val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      def c(v: Int) = math.min(v + delta, 255)
      out.setRGB(x, y, (c((rgb >> 16) & 0xff) << 16) | (c((rgb >> 8) & 0xff) << 8) | c(rgb & 0xff))
    }
    out
  }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("pHash of decoded PNGs survives resize and brightness, separates unrelated") {
    val base = baseImage(64, 64)
    val hBase = Multimodal.phashImage(png(base)).get
    val hSmall = Multimodal.phashImage(png(resized(base, 48, 48))).get
    val hBig = Multimodal.phashImage(png(resized(base, 96, 96))).get
    val hBright = Multimodal.phashImage(png(brightened(base, 25))).get
    val hInv = Multimodal.phashImage(png(baseImage(64, 64, invert = true))).get
    assert(hamming(hBase, hSmall) <= 6, s"resize down drifted ${hamming(hBase, hSmall)} bits")
    assert(hamming(hBase, hBig) <= 6, s"resize up drifted ${hamming(hBase, hBig)} bits")
    assert(hamming(hBase, hBright) <= 6, s"brightness drifted ${hamming(hBase, hBright)} bits")
    assert(hamming(hBase, hInv) > 20, s"inverted image too close: ${hamming(hBase, hInv)}")
    // undecodable bytes stay total via None
    assert(Multimodal.phashImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("perturbed real images pair through the banded-LSH pipeline") {
    import spark.implicits._
    val base = baseImage(64, 64)
    val payloads = Seq(
      1L -> png(base),
      2L -> png(resized(base, 80, 80)),
      3L -> png(brightened(base, 20)),
      4L -> png(baseImage(64, 64, invert = true)),
      5L -> png(resized(baseImage(64, 64, invert = true), 72, 72)))
    val h = payloads.map { case (id, p) =>
      (id, Multimodal.phashImage(p).get)
    }.toDF("doc_id", "h")
    val pairs = graft.analytics.MultimodalQueries.phashPairsFromHashes(h)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheTracker.releaseAll()
    // the base's perturbations cluster with it; the inverted pair clusters
    // with itself; the two families never cross
    assert(pairs.contains((1L, 2L)), s"resize pair missing from $pairs")
    assert(pairs.contains((1L, 3L)), s"brightness pair missing from $pairs")
    assert(pairs.contains((4L, 5L)), s"inverted-family pair missing from $pairs")
    assert(!pairs.exists { case (a, b) => a <= 3 && b >= 4 },
      s"families crossed in $pairs")
  }

  test("registry mm_phash_pairs emits verified pairs on a near-identical corpus") {
    import spark.implicits._
    // same-length texts: sampling positions align, so a one-char edit
    // flips at most a few grid cells — in hamming range; the distinct
    // filler docs share nothing with them
    val body = ("the quick brown fox jumps over the lazy dog and then " * 4).take(200)
    val corpus = Seq(
      (1L, body),
      (2L, body.updated(100, 'x')),
      (3L, body.updated(101, 'q').updated(150, 'z'))) ++
      (10L until 18L).map(i => (i, s"wholly distinct filler number $i " +
        ("zyx" * (10 + i.toInt % 5)) + s" tail${i * 7}"))
    val dir = java.nio.file.Files.createTempDirectory("phash_docs").toString
    corpus.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("mm_phash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheTracker.releaseAll()
    assert(got.contains((1L, 2L)), s"near-identical pair missing from $got")
    assert(got.contains((1L, 3L)) || got.contains((2L, 3L)),
      s"two-edit doc paired with neither sibling: $got")
    // in-query perturbed twins (doc_id % 5 == 0 → −(id+1)) pair with their
    // own originals — including filler twins like (−11, 10) — so the
    // cross-family check applies to REAL (non-negative) doc ids only
    assert(got.contains((-11L, 10L)) && got.contains((-16L, 15L)),
      s"derived twins must pair with their originals: $got")
    assert(!got.exists { case (a, b) => a >= 0L && a <= 3L && b >= 10L },
      s"filler docs must not pair with the body family: $got")
  }
}
