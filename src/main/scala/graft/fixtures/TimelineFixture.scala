package graft.fixtures

import java.sql.Timestamp

import graft.model.FileEntry
import org.apache.spark.sql.{Dataset, SparkSession}

/** Canonical timeline listing fixture (FIXTURES.md §1) covering every
  * filename shape the reference handles: complete/incomplete commit groups,
  * savepoint/rollback 2-file groups, lone completed rollbacks, V9
  * `requestTs_completionTs` instants, non-whitelisted actions, V1 archived
  * files (with numeric ordering > lexical), V2/LSM history entries, and
  * directories.
  *
  * The same row list feeds both the Spark Dataset and the DuckDB `VALUES`
  * clause used by the oracle SQL, so the two can never drift.
  */
object TimelineFixture {

  /** (filename, lastModifiedAt as 'yyyy-MM-dd HH:mm:ss', isDirectory) */
  val rows: Seq[(String, String, Boolean)] = Seq(
    ("hoodie.properties", "2024-07-20 00:00:00", false),
    // complete 3-file commit group
    ("20240115103045123.commit.requested", "2024-07-23 00:00:00", false),
    ("20240115103045123.commit.inflight", "2024-07-23 00:00:00", false),
    ("20240115103045123.commit", "2024-07-23 00:00:00", false),
    // complete deltacommit group
    ("20240116010101001.deltacommit.requested", "2024-07-23 01:00:00", false),
    ("20240116010101001.deltacommit.inflight", "2024-07-23 01:00:00", false),
    ("20240116010101001.deltacommit", "2024-07-23 01:00:00", false),
    // compaction group: completed file carries the .commit action
    ("20240117020202002.compaction.requested", "2024-07-23 02:00:00", false),
    ("20240117020202002.compaction.inflight", "2024-07-23 02:00:00", false),
    ("20240117020202002.commit", "2024-07-23 02:00:00", false),
    // savepoint 2-file group
    ("20240118030303003.savepoint.inflight", "2024-07-23 03:00:00", false),
    ("20240118030303003.savepoint", "2024-07-23 03:00:00", false),
    // rollback 2-file group (pre-0.8 shape)
    ("20240119040404004.rollback.inflight", "2024-07-23 04:00:00", false),
    ("20240119040404004.rollback", "2024-07-23 04:00:00", false),
    // lone completed rollback
    ("20240120050505005.rollback", "2024-07-23 05:00:00", false),
    // incomplete clean group (older than a typical checkpoint)
    ("20240121060606006.clean.requested", "2024-07-21 00:00:00", false),
    ("20240121060606006.clean.inflight", "2024-07-21 00:00:00", false),
    // non-whitelisted action
    ("20240122070707007.unknown.requested", "2024-07-23 06:00:00", false),
    ("20240122070707007.unknown.inflight", "2024-07-23 06:00:00", false),
    ("20240122070707007.unknown", "2024-07-23 06:00:00", false),
    // bare inflight commit (X.inflight => action=commit)
    ("20240123080808008.commit.requested", "2024-07-23 07:00:00", false),
    ("20240123080808008.inflight", "2024-07-23 07:00:00", false),
    ("20240123080808008.commit", "2024-07-23 07:00:00", false),
    // V9 completed instants: requestTs_completionTs (varied latencies so
    // completion-time analytics have a distribution to rank)
    ("20260204053206256.deltacommit.requested", "2026-02-04 00:00:00", false),
    ("20260204053206256.deltacommit.inflight", "2026-02-04 00:00:00", false),
    ("20260204053206256_20260204053210895.deltacommit", "2026-02-04 00:00:00", false),
    ("20260205060000000.commit.requested", "2026-02-05 00:00:00", false),
    ("20260205060000000.commit.inflight", "2026-02-05 00:00:00", false),
    ("20260205060000000_20260205060002500.commit", "2026-02-05 00:00:00", false),
    ("20260206070000000.replacecommit.requested", "2026-02-06 00:00:00", false),
    ("20260206070000000.replacecommit.inflight", "2026-02-06 00:00:00", false),
    ("20260206070000000_20260206070130000.replacecommit", "2026-02-06 00:00:00", false),
    // V1 archived files — numeric index sort differs from lexical (10 > 5)
    (".commits_.archive.5_20260101-20260115-50", "2024-07-19 00:00:00", false),
    (".commits_.archive.10_20260116-20260131-50", "2024-07-19 01:00:00", false),
    // V2 / LSM history entries
    ("20240101_20240131_0.parquet", "2024-07-19 02:00:00", false),
    ("manifest_3", "2024-07-19 03:00:00", false),
    ("_version_", "2024-07-19 04:00:00", false),
    // directories + a non-instant data file
    (".aux", "2024-07-19 05:00:00", true),
    ("metadata", "2024-07-19 06:00:00", true),
    ("part-00000-data.parquet", "2024-07-19 07:00:00", false)
  )

  /** Commit-metadata bodies (what completed instant files contain): the
    * Hudi commit JSON's partitionToWriteStats shape, per instant. Feeds the
    * Table Stats / Partition Insights queries exactly as the product parses
    * the mirrored instants (README.md §Table Stats).
    */
  val commitMetaRows: Seq[(String, String, String)] = Seq(
    ("20240115103045123", "commit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"numWrites":120,"totalWriteBytes":48000,"numDeletes":0}],"dt=2024-01-02":[{"numWrites":80,"totalWriteBytes":32000,"numDeletes":2}]}}"""),
    ("20240116010101001", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-02":[{"numWrites":40,"totalWriteBytes":20000,"numDeletes":1},{"numWrites":10,"totalWriteBytes":4000,"numDeletes":0}]}}"""),
    ("20240117020202002", "commit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"numWrites":200,"totalWriteBytes":90000,"numDeletes":5}],"dt=2024-01-03":[{"numWrites":60,"totalWriteBytes":25000,"numDeletes":0}]}}"""),
    ("20260204053206256", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-03":[{"numWrites":30,"totalWriteBytes":12000,"numDeletes":3}]}}""")
  )

  val commitMetaValuesSql: String = commitMetaRows
    .map { case (ts, a, j) => s"('$ts', '$a', '$j')" }
    .mkString("(VALUES\n  ", ",\n  ", ")\n  AS t(ts, action, meta)")

  /** MOR-table commit metadata at FILE-GROUP granularity: each write stat
    * carries the `fileId` it lands in, the way Hudi deltacommit/compaction
    * metadata does (the product's Compaction Backlog Monitoring tracks
    * "log-file build-up per file group", not a global count —
    * /root/reference/README.md). Interleaved compactions reset individual
    * file groups: fg-1 is compacted twice (backlog restarts at the later
    * one), fg-2 once, fg-3 never (its backlog spans the whole timeline).
    */
  val fileGroupMetaRows: Seq[(String, String, String)] = Seq(
    ("20240110010000001", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-1","numWrites":10,"totalWriteBytes":4000,"numDeletes":0},{"fileId":"fg-2","numWrites":12,"totalWriteBytes":5000,"numDeletes":0}]}}"""),
    ("20240111010000002", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-1","numWrites":8,"totalWriteBytes":3200,"numDeletes":1}],"dt=2024-01-02":[{"fileId":"fg-3","numWrites":20,"totalWriteBytes":9000,"numDeletes":0}]}}"""),
    ("20240112010000003", "compaction",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-1","numWrites":18,"totalWriteBytes":7000,"numDeletes":0},{"fileId":"fg-2","numWrites":12,"totalWriteBytes":5000,"numDeletes":0}]}}"""),
    ("20240113010000004", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-1","numWrites":5,"totalWriteBytes":2000,"numDeletes":0},{"fileId":"fg-2","numWrites":6,"totalWriteBytes":2400,"numDeletes":0}],"dt=2024-01-02":[{"fileId":"fg-3","numWrites":7,"totalWriteBytes":2800,"numDeletes":0}]}}"""),
    ("20240114010000005", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-2","numWrites":9,"totalWriteBytes":3600,"numDeletes":2}],"dt=2024-01-02":[{"fileId":"fg-3","numWrites":11,"totalWriteBytes":4400,"numDeletes":0}]}}"""),
    ("20240115010000006", "compaction",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-1","numWrites":23,"totalWriteBytes":9000,"numDeletes":0}]}}"""),
    ("20240116010000007", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-1","numWrites":4,"totalWriteBytes":1600,"numDeletes":0}],"dt=2024-01-02":[{"fileId":"fg-3","numWrites":6,"totalWriteBytes":2400,"numDeletes":1}]}}"""),
    ("20240117010000008", "deltacommit",
      """{"partitionToWriteStats":{"dt=2024-01-01":[{"fileId":"fg-2","numWrites":7,"totalWriteBytes":2800,"numDeletes":0}],"dt=2024-01-02":[{"fileId":"fg-3","numWrites":8,"totalWriteBytes":3200,"numDeletes":0}]}}""")
  )

  val fileGroupMetaValuesSql: String = fileGroupMetaRows
    .map { case (ts, a, j) => s"('$ts', '$a', '$j')" }
    .mkString("(VALUES\n  ", ",\n  ", ")\n  AS t(ts, action, meta)")

  /** Hudi table URIs for the tableId (UUIDv3) derivation fixture. */
  val tableUris: Seq[String] = Seq(
    "s3://lake-bucket/tables/db1/trips",
    "s3://lake-bucket/tables/db1/rides",
    "gs://lake-bucket/tables/db2/users",
    "abfss://container@account.dfs.core.windows.net/tables/db3/orders",
    "file:///tmp/fixture-lake/db1/trips_v2"
  )

  def dataset(spark: SparkSession): Dataset[FileEntry] = {
    import spark.implicits._
    spark.createDataset(rows.map { case (n, t, d) =>
      FileEntry(n, Timestamp.valueOf(t), d)
    })
  }

  /** DuckDB FROM clause with the same rows: `(VALUES ...) t(filename,
    * last_modified_at, is_directory)`.
    */
  val valuesSql: String = rows
    .map { case (n, t, d) => s"('$n', TIMESTAMP '$t', $d)" }
    .mkString("(VALUES\n  ", ",\n  ", s")\n  AS t(filename, last_modified_at, is_directory)")

  val urisValuesSql: String = tableUris
    .map(u => s"('$u')")
    .mkString("(VALUES ", ", ", ") AS t(uri)")
}
