package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** One SparkSession per benchmark chunk. Recreated (not getOrCreate'd)
    * so each chunk starts with empty shuffle dirs, an empty broadcast
    * manager and a fresh MapOutputTracker — round-7 measurements showed
    * heavy-shuffle queries reading 1.5-2.3x slower late in a 139-query
    * single-session sweep than under the solo protocol, purely from
    * accumulated session residue (the code was identical). JVM-level
    * warmth (JIT, the static codegen cache) survives the restart, so the
    * warmup pass stays meaningful.
    */
  private def newSession(cpus: String): SparkSession = {
    // Shuffle partitions default to the core count (right for sf<=0.1) but
    // are overridable for scale probes: a 128x corpus through 32 partitions
    // puts ~40M token-level rows in each per-partition sort — past the
    // executor-memory envelope, so every wide stage tips into external
    // sort/spill. Production sizing is partitions ~ input-bytes / 128MB,
    // which is exactly what the probe passes here.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // AQE's size-based coalescing folds every small shuffle to ONE
      // partition, serializing CPU-bound stages (signature hashing, pair
      // joins). These workloads are compute-heavy per byte — keep the
      // explicit partition count.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // typed Aggregators (minhash_union, top7_by_score) run through
      // ObjectHashAggregate, whose default 128-key fallback degrades the
      // partial phase to sort-based almost immediately; the buffers here
      // are tiny fixed-width rows, so a large hash map is the right trade
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_ONLY: optional regex to bench a subset (builder-side tool)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.findFirstIn(n).isDefined)
    }.toSeq.sortBy(_._1)
    // Chunks never cross a query-family boundary (the name prefix before
    // the first '_') and are capped at SPARK_GRAFT_CHUNK queries, so a
    // large family still gets session recycling mid-family. Each chunk is
    // the solo protocol in miniature: fresh session, warmup, timed runs.
    val chunkCap = sys.env.get("SPARK_GRAFT_CHUNK").map(_.toInt).getOrElse(8)
    val chunks = selected.foldLeft(Vector.empty[Vector[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]]) {
      case (acc, q @ (name, _)) =>
        val fam = name.takeWhile(_ != '_')
        acc.lastOption match {
          case Some(last) if last.size < chunkCap &&
              last.head._1.takeWhile(_ != '_') == fam =>
            acc.init :+ (last :+ q)
          case _ => acc :+ Vector(q)
        }
    }
    val warmups = sys.env.get("SPARK_GRAFT_WARMUP").map(_.toInt).getOrElse(1)
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    val verbose = sys.env.contains("SPARK_GRAFT_VERBOSE")
    val results = scala.collection.mutable.Map.empty[String, Double]
    chunks.foreach { chunk =>
      val spark = newSession(cpus)
      // Warm-up pass (untimed): JIT + codegen + parquet-footer caches make
      // the first execution of JSON-parse/join-heavy queries swing up to
      // 12x vs warm runs on identical code; timings below are warm.
      for (_ <- 1 to warmups) chunk.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        CacheTracker.releaseAll()
      }
      // Timed passes: min over SPARK_GRAFT_RUNS (default 2) executions per
      // query — the standard stable estimator under GC/JIT noise. Caches
      // persisted inside query builders (e.g. LSH signatures) are dropped
      // before each pass so every timed run re-executes the full lineage.
      val passes = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        chunk.map { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage.take(200)}"); false }
          val dt = (System.nanoTime() - t0) / 1e9
          // outside the timed window: each query's persisted projections
          // are dead once its action finishes
          CacheTracker.releaseAll()
          if (verbose) System.err.println(f"[bench] $name%-28s $dt%8.2f s${if (ok) "" else " (FAILED)"}")
          name -> dt
        }.toMap
      }
      chunk.foreach { case (name, _) =>
        results(name) = passes.map(_(name)).min
      }
      // stop() removes the context's local shuffle/block dirs — the
      // residue that inflated late-sweep rows never reaches the next chunk
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
    // Values rounded to 0.1 ms: bench noise dwarfs that, and the shorter
    // line survives tail-style output capture with every query present.
    def json(r: Map[String, Double]): String = {
      val qs = r.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val total = f"${if (r.nonEmpty) r.values.sum else 0.0}%.4f"
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val line = json(results.toMap)
    println(line)
    // Complete artifact on disk as well — the stdout line is subject to
    // whatever capture window the harness uses, the file never is.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
  }
}
