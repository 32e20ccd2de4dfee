package graft

import graft.operators.{MediaGraph, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real-codec ingestion path of the media-fingerprint store:
  * [[MediaGraph.appendAssets]] decodes ACTUAL media bytes (PNG via
  * javax.imageio, 16-bit PCM WAV via javax.sound.sampled, animated GIF
  * frames) into the same store schema the stand-in build writes, the
  * store-reading pair pipelines find genuinely perturbed near-dups, and
  * undecodable payloads are skipped without failing the batch.
  */
class MediaGraphAssetsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  // ---- deterministic media generators (the sibling specs' shapes) ---------
  private def image(seed: Int, w: Int = 64, h: Int = 64, bright: Int = 0) = {
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

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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

  private def wav(freqs: Seq[Double], amp: Double): Array[Byte] = {
    val samples = freqs.flatMap { f =>
      (0 until 400).map(i =>
        (amp * math.sin(2 * math.Pi * f * i / 8000.0)).toShort)
    }.toArray
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("appendAssets: real PNG/WAV/GIF bytes land as fingerprints; pairs work off the store") {
    val dir = tmp("media_assets")
    import spark.implicits._
    val freqs = Seq(400.0, 900.0, 600.0, 1800.0, 500.0, 2600.0, 700.0, 1100.0)
    val assets = Seq(
      // image 1 and its brightness-perturbed re-encode: a true near-dup
      (1L, "image", png(image(5))),
      (2L, "image", png(image(5, bright = 20))),
      // an unrelated image: must NOT pair with 1 or 2
      (3L, "image", png(image(9))),
      // same tone sequence at two volumes: amplitude-invariant fingerprint
      (10L, "audio", wav(freqs, 12000.0)),
      (11L, "audio", wav(freqs, 4000.0)),
      // video A and a re-encode lifting A's frames 3..6 at offset 1
      (20L, "video", gif((1 to 8).map(image(_)))),
      (21L, "video", gif(Seq(image(11)) ++ (3 to 6).map(image(_, bright = 20)) ++ Seq(image(12)))),
      // garbage bytes under every modality: skipped, never fatal
      (90L, "image", Array[Byte](1, 2, 3)),
      (91L, "audio", Array[Byte](4, 5, 6)),
      (92L, "video", Array[Byte](7, 8, 9)))
      .toDF("doc_id", "media_type", "payload")
    MediaGraph.appendAssets(assets, dir, 0L)

    // image near-dup found BY THE STORE-READING pipeline; unrelated stays out
    val pairs = graft.analytics.MultimodalQueries
      .phashPairsFromHashes(MediaGraph.phash(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")

    // volume-scaled fingerprints sit inside the verify radius (the
    // amplitude-invariance contract MultimodalAudioSpec pins: log-scaled
    // band energies shift uniformly under volume, so comparisons survive
    // up to the small-energy +1 of log1p)
    val au = MediaGraph.audio(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(au.keySet == Set(10L, 11L) &&
      java.lang.Long.bitCount(au(10L) ^ au(11L)) <= 6,
      s"volume drifted ${java.lang.Long.bitCount(au(10L) ^ au(11L))} bits")

    // lifted clip found from stored frame hashes
    val clips = graft.analytics.MultimodalQueries.clipPairsFromFrameHashes(
        MediaGraph.frames(spark, dir)
          .select(col("doc_id").as("vid"), col("fi"), col("h")),
        hamMax = 6, minClip = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(clips.get((20L, 21L)).contains(4L), s"got $clips")

    // undecodable payloads skipped entirely
    val allIds = MediaGraph.phash(spark, dir).select("doc_id")
      .unionByName(MediaGraph.audio(spark, dir).select("doc_id"))
      .unionByName(MediaGraph.frames(spark, dir).select("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(allIds.intersect(Set(90L, 91L, 92L)).isEmpty)

    // replay idempotence holds for the asset path too
    MediaGraph.appendAssets(assets, dir, 0L)
    assert(MediaGraph.phash(spark, dir).count() == 3)
  }
}
