package graft

import java.nio.file.Files

import graft.streaming.DocumentStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-curation SCALE probe (builder tooling, like [[Bench]] /
  * [[TimelineLakeBench]]): slices the `documents` table of
  * `SPARK_GRAFT_SF_DIR` into `SPARK_GRAFT_INGEST_BATCHES` micro-batches
  * (by doc_id modulus, so a replicated corpus spreads each duplicate
  * clique across every batch — the recrawl worst case) and drives
  * [[DocumentStream.curateBatch]] through them sequentially against one
  * persistent MinHash index + lake, timing each batch.
  *
  * What the growth rows show: per-batch wall as the INDEX grows — the
  * asymmetric candidate pipeline means batch k pays for its own signatures
  * plus candidates touching the stored side, never a stored-stored
  * re-comparison, so per-batch cost must stay ~flat while the index
  * accumulates every prior survivor. Prints one JSON line.
  */
object IngestionBench {

  /** Deterministic REAL media generators for the assets mode — the
    * MediaGraphAssetsSpec shapes, sized for bulk generation on executors:
    * every payload is an actual PNG / 16-bit PCM WAV / animated GIF the
    * JDK codecs decode, with near-dup twins built in (brightness-perturbed
    * image re-encodes, volume-perturbed tracks, clip-sharing videos) so
    * the store-reading pair queries chew on real banded candidates.
    */
  private object Gen {
    def image(seed: Long, bright: Int): java.awt.image.BufferedImage = {
      val (w, h) = (64, 64)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val t = (x * 255 / w + y * 128 / h + ((x + seed * 7) / 9 % 2) * 40 +
            ((y + seed * 13) / 11 % 2) * 30 + seed * 29) % 256
          val v = math.min(t + bright, 255).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      img
    }

    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def gif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
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

    def wav(seed: Long, amp: Double): Array[Byte] = {
      val freqs = (0 until 8).map(k => 300.0 + ((seed * 31 + k * 97) % 23) * 100.0)
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

    /** One asset per id: ~1/2 images (in twin pairs: even seed, odd =
      * +20-brightness re-encode of the same scene), ~1/4 audio (twin =
      * volume-perturbed same tone sequence), ~1/4 video (twin shares 3 of
      * its 4 frames — a real clip overlap).
      */
    def asset(id: Long): (Long, String, Array[Byte]) = id % 4 match {
      case 0 | 2 =>
        val scene = id / 4
        val bright = if (id % 4 == 2) 20 else 0
        (id, "image", png(image(scene, bright)))
      case 1 =>
        val tone = id / 8
        val amp = if (id % 8 == 1) 9000.0 else 12000.0
        (id, "audio", wav(tone, amp))
      case _ =>
        val base = id / 8
        val off = if (id % 8 == 3) 0 else 1 // twin shifted by one frame
        (id, "video", gif((0 until 4).map(k => image(base * 11 + off + k, 0))))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_INGEST_BATCHES", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = Files.createTempDirectory("ingest_bench_idx").toString
    val lake = Files.createTempDirectory("ingest_bench_lake").toString
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id").as("docId"), col("text"),
        lit(java.sql.Timestamp.valueOf("2024-07-23 10:00:00")).as("eventTime"))
    // SPARK_GRAFT_INGEST_MODE=search: probe the streaming-retrieval tier
    // instead — per batch, appendBatch into the TextIndex then run one
    // 4-query search against the accumulated store. Append must stay FLAT
    // (batch-local postings + that batch's doclens only); search grows
    // with the stored postings (sublinearly — broadcast query side).
    if (sys.env.get("SPARK_GRAFT_INGEST_MODE").contains("search")) {
      val qids = docs.select(col("docId").as("qid")).orderBy(col("qid")).limit(4)
      val phases = (0 until nBatches).map { i =>
        val b = docs.filter(col("docId") % nBatches === i)
          .select(col("docId").as("doc_id"), col("text"))
        val t0 = System.nanoTime()
        graft.operators.TextIndex.appendBatch(b, idx, i)
        val tAppend = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n = graft.operators.TextIndex.search(spark, idx, qids, 5).count()
        val tSearch = (System.nanoTime() - t1) / 1e9
        graft.CacheTracker.releaseAll()
        (i, tAppend, tSearch, n)
      }
      val total = phases.map(p => p._2 + p._3).sum
      val batches = phases.map { case (i, ta, ts, n) =>
        f"""{"batch":$i,"append_sec":$ta%.3f,"search_sec":$ts%.3f,"hits":$n}"""
      }.mkString("[", ",", "]")
      println(f"""{"metric":"ingest_search","value":$total%.3f,"unit":"sec","batches":$batches,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    // SPARK_GRAFT_INGEST_MODE=graph: probe the streaming dup-graph tier —
    // per batch, DupGraph.appendBatch folds verified new-touching edges
    // into the batch-partitioned store, then a degree aggregate reads the
    // accumulated graph. Per-batch wall must stay ~flat (asymmetric
    // candidates against the stored signatures, never stored-stored)
    // while the edge store grows with every recrawl collision.
    if (sys.env.get("SPARK_GRAFT_INGEST_MODE").contains("graph")) {
      // SPARK_GRAFT_INGEST_LABELS=1 adds the incremental-label contrast:
      // per batch, time the contracted-graph label refresh (must stay flat
      // — its cost keys on the BATCH's edge mass) against a from-scratch
      // components recompute over the accumulated log (grows with the log —
      // the cost the label store exists to avoid paying per batch).
      val withLabels = sys.env.get("SPARK_GRAFT_INGEST_LABELS").contains("1")
      val phases = (0 until nBatches).map { i =>
        val b = docs.filter(col("docId") % nBatches === i)
          .select(col("docId").as("doc_id"), col("text"))
        val t0 = System.nanoTime()
        graft.operators.DupGraph.appendBatch(b, idx, i)
        val tAppend = (System.nanoTime() - t0) / 1e9
        val (tLbl, tCc, nLbl) = if (withLabels) {
          val tl0 = System.nanoTime()
          graft.operators.DupGraph.refreshLabels(spark, idx,
            graft.operators.DupGraph.edges(spark, idx)
              .filter(col("batch_id") === i)
              .select(col("doc_a"), col("doc_b")))
          val tl = (System.nanoTime() - tl0) / 1e9
          val n = graft.operators.DupGraph.labels(spark, idx).count()
          val tc0 = System.nanoTime()
          graft.operators.ConnectedComponents.components(
            graft.operators.DupGraph.edges(spark, idx), "doc_a", "doc_b").count()
          val tc = (System.nanoTime() - tc0) / 1e9
          (tl, tc, n)
        } else (0.0, 0.0, 0L)
        val t1 = System.nanoTime()
        val edges = graft.operators.DupGraph.edges(spark, idx).count()
        val tQuery = (System.nanoTime() - t1) / 1e9
        graft.CacheTracker.releaseAll()
        (i, tAppend, tQuery, edges, tLbl, tCc, nLbl)
      }
      val total = phases.map(p => p._2 + p._3 + p._5).sum
      val batches = phases.map { case (i, ta, tq, e, tl, tc, nl) =>
        f"""{"batch":$i,"append_sec":$ta%.3f,"query_sec":$tq%.3f,"edges":$e""" +
          (if (withLabels) f""","labels_sec":$tl%.3f,"cc_scratch_sec":$tc%.3f,"labels":$nl}"""
           else "}")
      }.mkString("[", ",", "]")
      println(f"""{"metric":"ingest_graph","value":$total%.3f,"unit":"sec","batches":$batches,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    // SPARK_GRAFT_INGEST_MODE=assets: the REAL-codec scale point — per
    // batch, generate actual PNG/WAV/GIF binaries ON EXECUTORS
    // (SPARK_GRAFT_ASSET_COUNT total, default 10000), decode them through
    // MediaGraph.appendAssets (javax.imageio / javax.sound.sampled — the
    // production ingest path MediaGraphAssetsSpec pins at fixture scale),
    // then run the store-reading phash pair pipeline against the
    // accumulated store. Append wall includes codec decode (batch-local,
    // no stored-side read — must stay flat); the pair wall tracks stored
    // hash mass, never payload bytes (payloads are generated, decoded,
    // and DROPPED inside one narrow stage — they never shuffle and never
    // persist).
    if (sys.env.get("SPARK_GRAFT_INGEST_MODE").contains("assets")) {
      val nAssets = sys.env.getOrElse("SPARK_GRAFT_ASSET_COUNT", "10000").toInt
      import spark.implicits._
      val phases = (0 until nBatches).map { i =>
        val assets = spark.range(nAssets)
          .filter(col("id") % nBatches === i)
          .repartition(cpus.toInt)
          .as[Long]
          .map(Gen.asset)
          .toDF("doc_id", "media_type", "payload")
        val t0 = System.nanoTime()
        graft.operators.MediaGraph.appendAssets(assets, idx, i)
        val tAppend = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val pairs = graft.analytics.MultimodalQueries.phashPairsFromHashes(
          graft.operators.MediaGraph.phash(spark, idx)).count()
        val tQuery = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val audioPairs = graft.analytics.MultimodalQueries.phashPairsFromHashes(
          graft.operators.MediaGraph.audio(spark, idx)).count()
        val tAudio = (System.nanoTime() - t2) / 1e9
        graft.CacheTracker.releaseAll()
        (i, tAppend, tQuery, pairs, tAudio, audioPairs)
      }
      val total = phases.map(p => p._2 + p._3 + p._5).sum
      val batches = phases.map { case (i, ta, tq, p, tau, ap) =>
        f"""{"batch":$i,"append_sec":$ta%.3f,"phash_pairs_sec":$tq%.3f,"phash_pairs":$p,"audio_pairs_sec":$tau%.3f,"audio_pairs":$ap}"""
      }.mkString("[", ",", "]")
      println(f"""{"metric":"ingest_assets","value":$total%.3f,"unit":"sec","assets":$nAssets,"batches":$batches,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    // SPARK_GRAFT_INGEST_MODE=media: probe the streaming media-fingerprint
    // tier — per batch, MediaGraph.appendBatch lands the batch's hashes
    // (fingerprint cost is batch-local by construction: each modality is a
    // narrow per-row pass over THIS batch's docs, no stored-side read at
    // all, so append must stay flat), then the store-reading phash pair
    // pipeline runs against the accumulated store — the freshness query
    // whose cost tracks stored hash mass, never corpus bytes.
    if (sys.env.get("SPARK_GRAFT_INGEST_MODE").contains("media")) {
      val phases = (0 until nBatches).map { i =>
        val b = docs.filter(col("docId") % nBatches === i)
          .select(col("docId").as("doc_id"), col("text"))
        val t0 = System.nanoTime()
        graft.operators.MediaGraph.appendBatch(b, idx, i)
        val tAppend = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val pairs = graft.analytics.MultimodalQueries.phashPairsFromHashes(
          graft.operators.MediaGraph.phash(spark, idx)).count()
        val tQuery = (System.nanoTime() - t1) / 1e9
        graft.CacheTracker.releaseAll()
        (i, tAppend, tQuery, pairs)
      }
      val total = phases.map(p => p._2 + p._3).sum
      val batches = phases.map { case (i, ta, tq, p) =>
        f"""{"batch":$i,"append_sec":$ta%.3f,"pairs_sec":$tq%.3f,"pairs":$p}"""
      }.mkString("[", ",", "]")
      println(f"""{"metric":"ingest_media","value":$total%.3f,"unit":"sec","batches":$batches,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    val phases = (0 until nBatches).map { i =>
      val b = docs.filter(col("docId") % nBatches === i)
      val t0 = System.nanoTime()
      val r = DocumentStream.curateBatch(b, i, idx, lake)
      val dt = (System.nanoTime() - t0) / 1e9
      (i, dt, r)
    }
    val total = phases.map(_._2).sum
    val batches = phases.map { case (i, dt, r) =>
      f"""{"batch":$i,"sec":$dt%.3f,"input":${r.input},"landed":${r.landed},""" +
        s""""dropQ":${r.droppedQuality},"dropR":${r.droppedRepetition},""" +
        s""""dropDup":${r.droppedDuplicate}}"""
    }.mkString("[", ",", "]")
    println(f"""{"metric":"ingest_curate","value":$total%.3f,"unit":"sec","batches":$batches,"sf":"$sfDir"}""")
    spark.stop()
  }
}
