package graft

/** Input-size-derived session sizing. The shuffle partition count is the
  * one knob that silently breaks at scale when left at a fixed default:
  * the 128× probes showed `txt_cdc_chunking` at 122.7 s and
  * `sim_knn_classify` at 220 s purely because 32 partitions (= core count,
  * right for sf0.1) put ~40M token-level rows into each per-partition sort
  * — external sort/spill on every wide stage; at 256 partitions the same
  * plans ran 18.0 s / 47.1 s. AQE coalescing SHRINKS an oversized count
  * but never grows an undersized one, so the INITIAL count must scale with
  * the input. A production job derives it from input bytes; this does the
  * same, with the env var kept as an explicit override for probes.
  */
object Sizing {

  /** On-disk parquet bytes per shuffle partition. Token-level projections
    * (shingles, frame hashes, posting lists) expand compressed parquet
    * ~10-20× in unsafe-row form, so 8 MiB on disk lands each partition in
    * the classic 64-128 MiB in-memory envelope. Calibration points: sf0.1
    * (17.5 MB) → 32 partitions (the core-count floor, unchanged bench
    * protocol), 128× (2.0 GB) → 256 — exactly the count the 128× probes
    * fixed the two cliffs with.
    */
  val BytesPerPartition: Long = 8L << 20

  /** Ceiling on the DERIVED partition count: past ~64k partitions the
    * per-task scheduling and shuffle-file overheads dominate any spill
    * relief (Spark's own shuffle tracking structures are O(maps×reduces)),
    * and a petabyte input dir should raise bytes-per-partition instead of
    * partition count. The explicit env override is NOT capped — probes may
    * exceed it deliberately.
    */
  val MaxDerivedPartitions = 65536

  /** Total bytes under `dir` (recursive), resolved through the Hadoop
    * FileSystem for the path's scheme — `getContentSummary` is one
    * namenode/object-store call on a cluster deployment, and the local
    * filesystem answers it by walking, so local harness runs and scheme'd
    * cluster paths share one code path (`SizingSpec` drives it over the
    * mock object store). Falls back to a plain java.io walk when the
    * Hadoop resolution fails (an unregistered scheme), and to 0 when the
    * path does not exist — the core-count floor then applies.
    */
  def inputBytes(dir: String): Long =
    inputBytes(dir, new org.apache.hadoop.conf.Configuration())

  /** [[inputBytes]] with an explicit Hadoop configuration (tests register
    * mock filesystem schemes through it).
    */
  def inputBytes(dir: String, conf: org.apache.hadoop.conf.Configuration): Long =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.getOrElse {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(dir))
    }

  /** Shuffle partition count for a run over `sfDir`:
    * `SPARK_GRAFT_SHUFFLE_PARTITIONS` when set (explicit probe override,
    * validated but uncapped), else
    * min([[MaxDerivedPartitions]], max(core count, input bytes /
    * [[BytesPerPartition]])).
    */
  def shufflePartitions(sfDir: String, cores: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map { raw =>
      val v = raw.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_SHUFFLE_PARTITIONS must be a positive integer, got: '$raw'"))
      require(v >= 1, s"SPARK_GRAFT_SHUFFLE_PARTITIONS must be >= 1, got: $v")
      v
    }.getOrElse {
      val derived = ((inputBytes(sfDir) + BytesPerPartition - 1) /
        BytesPerPartition).toInt
      math.min(MaxDerivedPartitions, math.max(cores, derived))
    }
}
