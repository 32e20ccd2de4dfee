package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Layout-optimized parquet writer for curated output lakes — the file
  * layout is the dominant scan-cost lever at 100 TB, and this encodes the
  * three levers the engine's own readers (and any downstream engine)
  * exploit:
  *
  *   - **Hive partitioning** on low-cardinality columns → partition pruning
  *     eliminates directories before any file is opened;
  *   - **partition-aligned shuffle**: `repartition(partitionCols)` before
  *     `write.partitionBy` means each task holds exactly the rows of its
  *     output partitions — without it every task writes a file into every
  *     partition, the classic small-files explosion (tasks × partitions
  *     files);
  *   - **sort-within-partitions clustering** on query columns → parquet
  *     min/max zone maps become selective, so row groups and whole files
  *     prune for range predicates; multi-dimensional locality via
  *     [[graft.functions.ZOrder]] (`zorder2`) instead of a lexicographic
  *     sort when two columns are queried independently;
  *   - **bounded file sizes** via `maxRecordsPerFile`, keeping splits
  *     uniform for downstream parallelism.
  *
  * The same config serves curated-corpus writes (partition by lang, cluster
  * by quality) and the mirrored-lake analytics tables (partition by table,
  * cluster by commit ts).
  */
object LakeLayout {

  final case class LayoutConfig(
      partitionCols: Seq[String],
      clusterCols: Seq[Column],
      maxRecordsPerFile: Long = 1000000L,
      // target task count for the cluster-only range shuffle (defaults to
      // spark.sql.shuffle.partitions) — the output-file-count lever when
      // there is no Hive partitioning
      clusterPartitions: Option[Int] = None)

  /** Write `df` to `path` with the layout above. `clusterCols` may be plain
    * columns (lexicographic clustering) or a `zorder2(...)` expression
    * (multi-dimensional tiles). `mode` is "overwrite" for batch rebuilds,
    * "append" for incremental/streaming micro-batches (each batch writes
    * its own layout-clean files into the same partition tree).
    */
  def write(df: DataFrame, path: String, cfg: LayoutConfig,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit = {
    require(cfg.partitionCols.nonEmpty || cfg.clusterCols.nonEmpty,
      "layout must partition or cluster (or both)")
    // With no Hive partitioning the clustering must still be GLOBAL: a
    // range shuffle on the cluster columns gives tasks disjoint key ranges,
    // so per-file zone ranges never overlap across tasks (plain
    // sortWithinPartitions on the incoming partitioning would only cluster
    // within each input task).
    val aligned =
      if (cfg.partitionCols.isEmpty)
        cfg.clusterPartitions match {
          case Some(n) => df.repartitionByRange(n, cfg.clusterCols: _*)
          case None => df.repartitionByRange(cfg.clusterCols: _*)
        }
      else df.repartition(cfg.partitionCols.map(col): _*)
    // partition columns lead the sort: the parquet write path requires its
    // ordering to start with them and would otherwise inject its own
    // (unstable) sort by partition columns, destroying the clustering
    val sortCols = cfg.partitionCols.map(col) ++ cfg.clusterCols
    val clustered =
      if (sortCols.isEmpty) aligned
      else aligned.sortWithinPartitions(sortCols: _*)
    val writer = clustered.write
      .mode(mode)
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
      .options(options)
    (if (cfg.partitionCols.isEmpty) writer
     else writer.partitionBy(cfg.partitionCols: _*)).parquet(path)
  }

  final case class CompactReport(
      partitionsSeen: Int, partitionsCompacted: Int,
      filesBefore: Int, filesAfter: Int)

  /** Compact the small files a streaming lake accumulates: every
    * micro-batch append writes its own files, so a partition touched by k
    * batches holds >= k files and scan cost grows with file COUNT (open +
    * footer + seek per file) long before it grows with bytes. This walks
    * the partition tree, and for each leaf holding at least
    * `minFilesPerPartition` files rewrites JUST that leaf — read the
    * leaf's rows, re-cluster on `clusterCols` (restoring the zone-map
    * locality interleaved appends destroyed), write one file per
    * `maxRecordsPerFile` rows, stage-and-swap the directory. Leaves below
    * the threshold are not touched at all (byte-identical files — the
    * spec pins it), so repeated compaction is idempotent and cheap, and
    * the rewrite unit is one partition: a 100 TB lake compacts
    * incrementally, partition by partition, never as a whole.
    *
    * `clusterCols` must be data columns (partition values are constant
    * within a leaf and live in the directory name, not the files).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      clusterCols: Seq[Column], minFilesPerPartition: Int = 4,
      maxRecordsPerFile: Long = 1000000L): CompactReport = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return CompactReport(0, 0, 0, 0)
    // leaf = a directory directly holding parquet files; each level first
    // repairs any crashed prior swap (missing leaf with its `.old` copy
    // aside -> restored; post-swap residue / stale stages -> cleared)
    def leaves(dir: Path): Seq[Path] = {
      DirSwap.recoverIn(fs, dir)
      val st = fs.listStatus(dir)
      val subdirs = st.filter(_.isDirectory)
        .filterNot(_.getPath.getName.startsWith("."))
      val hasParquet = st.exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      (if (hasParquet) Seq(dir) else Nil) ++ subdirs.flatMap(s => leaves(s.getPath))
    }
    var seen = 0; var compacted = 0; var before = 0; var after = 0
    leaves(root).foreach { leaf =>
      val files = fs.listStatus(leaf)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      seen += 1; before += files.length
      if (files.length >= minFilesPerPartition) {
        val df = spark.read.parquet(leaf.toString)
        val rows = df.count()
        val nOut = math.max(1L, (rows + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt
        val ranged =
          if (clusterCols.isEmpty) df.coalesce(nOut)
          else df.repartitionByRange(nOut, clusterCols: _*)
            .sortWithinPartitions(clusterCols: _*)
        // stage dot-prefixed (discovery-invisible), swap rename-rename-
        // delete: the worst crash state is a recoverable duplicate, never
        // a missing partition or a bogus `day=1.compact` partition dir
        val staged = DirSwap.stagePath(leaf)
        fs.delete(staged, true)
        ranged.write.mode("overwrite")
          .option("maxRecordsPerFile", maxRecordsPerFile)
          .parquet(staged.toString)
        DirSwap.swapInto(fs, staged, leaf)
        compacted += 1
        after += fs.listStatus(leaf)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      } else after += files.length
    }
    CompactReport(seen, compacted, before, after)
  }
}
