package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL crawl-shard importer: raw web-crawl dumps arrive as newline-
  * delimited JSON (the CommonCrawl/WARC-derivative interchange shape), one
  * document object per line, shards gzip-split for parallelism. This maps
  * them onto the engine's `documents` schema with the tolerance a crawl
  * actually needs: malformed lines and wrong-typed fields must never kill
  * a 100 TB import — they are counted and quarantined, not thrown.
  *
  * Scale shape: Spark's JSON source splits uncompressed shards by byte
  * range and assigns whole gzip shards per task (gzip is not splittable —
  * the crawl convention of many ~100 MB shards exists exactly for this);
  * the schema is EXPLICIT, so the reader never runs the schema-inference
  * pre-pass over the corpus (a silent full extra scan when left to
  * default). PERMISSIVE mode lands unparseable lines in
  * `_corrupt_record`; [[fromJsonl]] splits them into a quarantine frame
  * so the caller can land both sides.
  */
object CrawlImport {

  /** The raw-crawl line schema: the documents-table fields plus the
    * corrupt-record capture column. `text` is the only REQUIRED field —
    * a line without it is quarantined, everything else defaults.
    */
  val crawlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt_record", StringType)))

  /** Import result: `docs` in the documents-table shape (missing langs
    * default to "und", missing sources to `defaultSource`, missing ids to
    * a deterministic content hash — stable across replays), `quarantine`
    * holds the raw text of every rejected line.
    */
  final case class Import(docs: DataFrame, quarantine: DataFrame)

  def fromJsonl(spark: SparkSession, path: String,
      defaultSource: String = "crawl"): Import = {
    val raw = spark.read
      .schema(crawlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // PERMISSIVE corrupt-record rows are only materialized when the
      // column is referenced alongside others from a cached projection
      .cache()
    // a line is usable iff it parsed AND carries text
    val ok = raw.filter(col("_corrupt_record").isNull && col("text").isNotNull)
    val docs = ok.select(
      // deterministic fallback id: content-hashed, so replaying the same
      // shard yields the same ids (no RNG, no monotonically_increasing_id
      // whose values depend on partition layout)
      coalesce(col("doc_id"), pmod(xxhash64(col("text")), lit(Long.MaxValue)))
        .as("doc_id"),
      col("text"),
      coalesce(col("lang"), lit("und")).as("lang"),
      coalesce(col("source"), lit(defaultSource)).as("source"),
      length(col("text")).cast("long").as("n_chars"))
    val quarantine = raw
      .filter(col("_corrupt_record").isNotNull || col("text").isNull)
      .select(coalesce(col("_corrupt_record"), lit("")).as("raw_line"))
    Import(docs, quarantine)
  }

  /** [[crawlSchema]] plus the optional crawl fetch timestamp (ISO string in
    * the shard) used as the streaming event time.
    */
  val streamSchema: StructType =
    StructType(crawlSchema.fields.init ++ Seq(
      StructField("fetched_at", StringType),
      StructField("_corrupt_record", StringType)))

  /** Streaming form: watch `shardDir` for arriving JSONL shards and emit
    * [[graft.streaming.DocumentStream.DocEvent]] rows, ready to feed
    * `curateContinuous` / `ingestContinuous` / `searchableContinuous` —
    * the crawl-to-lake front door. Same tolerance contract as the batch
    * path except unusable lines are dropped (a streaming source has
    * nowhere to return a quarantine frame; run [[fromJsonl]] over
    * suspect shards for forensics). Event time comes from the record's
    * own `fetched_at` (epoch default when absent) — deterministic under
    * checkpoint replay, where a processing-time stamp would re-date a
    * replayed batch and break the lake's exactly-once day partitions.
    */
  def stream(spark: SparkSession, shardDir: String): org.apache.spark.sql.Dataset[graft.streaming.DocumentStream.DocEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(streamSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(shardDir)
      .filter(col("_corrupt_record").isNull && col("text").isNotNull)
      .select(
        coalesce(col("doc_id"), pmod(xxhash64(col("text")), lit(Long.MaxValue)))
          .as("docId"),
        col("text"),
        coalesce(to_timestamp(col("fetched_at")),
          lit("1970-01-01 00:00:00").cast("timestamp")).as("eventTime"))
      .as[graft.streaming.DocumentStream.DocEvent]
  }
}
