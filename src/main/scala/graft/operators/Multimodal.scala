package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads are
  * opaque `binary` columns with typed metadata, processed in *batches* inside
  * `mapPartitions` (the Scala analog of python's `mapInPandas` batch UDFs —
  * the iterator is chunked so a real decoder could amortize model/codec
  * setup per batch instead of per row).
  *
  * The decode step is a STUB: real image/audio codecs are not available in
  * this environment, so [[fakeDecode]] derives deterministic pseudo-features
  * from the payload bytes. Everything around it — the binary column schema,
  * partitioning, batch shape, and feature output schema — is real and is
  * what a production decoder would plug into.
  *
  * Scale notes: payloads stay columnar (BinaryType) end-to-end; the batch
  * map is a narrow transformation (no shuffle); feature extraction
  * parallelizes per partition, so 100 TB of media spreads across executors
  * with bounded memory = batchSize * maxPayload per task.
  */
object Multimodal {

  /** Typed media row: payload is opaque bytes + declared modality/meta. */
  final case class MediaRecord(
      docId: Long,
      mediaType: String, // "image" | "audio" | "video" — drives the decoder
      payload: Array[Byte],
      declaredWidth: Int,
      declaredHeight: Int)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      docId: Long,
      mediaType: String,
      nBytes: Int,
      payloadMd5: String,
      width: Int,
      height: Int,
      meanByte: Double,
      byteHisto: Array[Long]) // 8 coarse byte-value buckets

  /** Documents -> media records: the text bytes stand in for image payloads
    * (deterministic; in production this column arrives as real media bytes).
    */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("docId"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("mediaType"),
      encode(trim(col("text")), "UTF-8").as("payload"),
      (lit(32) + pmod(col("n_chars"), lit(97))).cast("int").as("declaredWidth"),
      (lit(32) + pmod(col("n_chars") * 31, lit(71))).cast("int").as("declaredHeight"))
      .as[MediaRecord]
  }

  /** Pluggable decode stage. Implementations get a per-partition lifecycle:
    * `open()` once per task (codec init, model load), `decode` per batch,
    * `close()` when the partition drains — the contract a real
    * image/audio/video codec binding would implement. Must be Serializable:
    * the instance ships to executors inside the task closure.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(batch: Seq[MediaRecord]): Iterator[MediaFeatures]
    def close(): Unit = ()
  }

  /** Default decoder: deterministic pseudo-features from payload bytes (real
    * codecs are not available in this environment). Everything around it —
    * schema, batch shape, lifecycle — is the production surface.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decode(batch: Seq[MediaRecord]): Iterator[MediaFeatures] =
      batch.iterator.map(fakeDecode)
  }

  /** STUB decode fn — deterministic pseudo-features from payload bytes. A
    * real implementation would decode the codec indicated by `mediaType`.
    */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    val histo = new Array[Long](8)
    var sum = 0L
    r.payload.foreach { b =>
      val v = b & 0xff
      histo(v >> 5) += 1
      sum += v
    }
    MediaFeatures(
      docId = r.docId,
      mediaType = r.mediaType,
      nBytes = r.payload.length,
      payloadMd5 = hex,
      width = r.declaredWidth,
      height = r.declaredHeight,
      meanByte = if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length,
      byteHisto = histo)
  }

  /** Batched feature extraction: chunk each partition's iterator so the
    * decoder amortizes setup per batch (mapInPandas-style batch shape), with
    * open-once / close-on-drain lifecycle per task.
    */
  def decodeBatch(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64,
      decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    require(batchSize > 0, "batchSize must be positive")
    ds.mapPartitions { it =>
      decoder.open()
      val base = it.grouped(batchSize).flatMap(decoder.decode)
      new Iterator[MediaFeatures] {
        private var closed = false
        def hasNext: Boolean = {
          val h = base.hasNext
          if (!h && !closed) { decoder.close(); closed = true }
          h
        }
        def next(): MediaFeatures = base.next()
      }
    }
  }
}
