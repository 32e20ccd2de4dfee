package graft.streaming

import java.sql.Timestamp

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming form of the LLM-training-data document pipeline: the batch
  * text/dedup operators re-expressed over an unbounded document stream.
  * At 100 TB ingestion is a continuous drip from crawlers, not a one-shot
  * batch; these shapes keep all state bounded by watermark so the pipeline
  * runs indefinitely:
  *
  *   - scoring is a stateless projection (whole-stage codegen, no state);
  *   - exact dedup keys state by content hash and expires it at the
  *     watermark horizon — the cross-batch window in which a re-crawl of
  *     the same page is dropped;
  *   - corpus stats are a watermarked event-time window aggregate whose
  *     state is one row per open window.
  */
object DocumentStream {

  /** One ingested document (the streaming row). */
  final case class DocEvent(docId: Long, text: String, eventTime: Timestamp)

  /** Stateless per-document enrichment: token count plus the same floor-form
    * quality score as batch `txt_quality_score` (identical constants and
    * rounding, so a document scores the same whether it arrives in a
    * backfill batch or on the stream).
    */
  def scored(docs: Dataset[DocEvent]): DataFrame =
    docs.toDF()
      .withColumn("t", expr(tokensS("text")))
      .withColumn("n_tokens", expr("size(t)"))
      .withColumn("stop_ratio", expr(stopRatioS("t")))
      .withColumn("distinct_ratio", expr(distinctRatioS("t")))
      .withColumn("len_score", expr(lenScoreS("text")))
      .withColumn("quality", expr(QualityS))
      .drop("t")

  /** Cross-micro-batch exact dedup on the content hash. State is one entry
    * per distinct hash seen inside the watermark horizon and is dropped as
    * event time advances past it (`dropDuplicatesWithinWatermark`), so the
    * store never grows beyond `rate x horizon` regardless of stream age;
    * the only shuffle is the hash-key exchange. First sighting wins and is
    * emitted immediately (no aggregation barrier).
    */
  def dedupExact(docs: Dataset[DocEvent], watermarkDelay: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withColumn("content_hash", md5(trim(col("text"))))
      .withWatermark("eventTime", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Event-time windowed corpus health: volume, token throughput, and mean
    * quality per window — the streaming twin of `txt_corpus_rollup`.
    */
  def windowedCorpusStats(
      docs: Dataset[DocEvent],
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    scored(docs)
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(window(col("eventTime"), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        avg(col("quality")).as("avg_quality"))
}
