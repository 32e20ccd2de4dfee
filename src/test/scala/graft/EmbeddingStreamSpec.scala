package graft

import java.sql.Timestamp

import graft.streaming.EmbeddingStream
import graft.streaming.EmbeddingStream.VecEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming embedding near-dup detector against its batch twin: the
  * SAME corpus streamed through the stateful bucket detector must surface
  * the SAME (pair, cosine) set as the batch `dedup_embedding_lsh` bucket
  * equi-join (identical quantization, bucket key, threshold and rounding),
  * plus bounded-state and replay-idempotence behavior the batch form
  * doesn't need.
  */
class EmbeddingStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def vec(id: Long, xs: Seq[Float], ts: String) =
    VecEvent(id, xs, Timestamp.valueOf(ts))

  test("stream and batch agree on every near-dup pair and cosine") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => vec(r.getLong(0), r.getSeq[Float](1), "2024-07-23 10:00:00"))
    val ms = MemoryStream[VecEvent]
    val q = EmbeddingStream.nearDupPairs(ms.toDS())
      .writeStream.format("memory").queryName("vec_parity").outputMode("append").start()
    try {
      val (first, second) = corpus.splitAt(corpus.length / 2)
      ms.addData(first.toSeq: _*); q.processAllAvailable()
      ms.addData(second.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT vecA, vecB, cosine FROM vec_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = SparkEntry.queries("dedup_embedding_lsh")(spark, sf)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
    assert(batch.nonEmpty, "corpus should contain same-bucket near-dups")
  }

  test("replayed vecIds are ignored; FIFO cap bounds bucket state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // vectors engineered into one bucket: all-positive components keep
    // every hyperplane sum positive, so the bucket key is all-ones
    def v(id: Long) = vec(id, Seq(1f, 1f, 1f, 1f), "2024-07-23 10:00:00")
    val ms = MemoryStream[VecEvent]
    val q = EmbeddingStream.nearDupPairs(ms.toDS(), bucketCap = 2)
      .writeStream.format("memory").queryName("vec_cap").outputMode("append").start()
    try {
      ms.addData(v(1), v(2)); q.processAllAvailable()
      ms.addData(v(1)); q.processAllAvailable() // replay: no new pairs
      val afterReplay = spark.sql("SELECT * FROM vec_cap").count()
      // identical vectors: cosine 1.0 -> pair (1,2)
      assert(afterReplay == 1L)
      // cap=2: adding 3 evicts 1, so 4 pairs only with {2,3}, never with 1
      ms.addData(v(3)); q.processAllAvailable()
      ms.addData(v(4)); q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.sql("SELECT vecA, vecB FROM vec_cap")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("windowed norm stats aggregate per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[VecEvent]
    val q = EmbeddingStream.windowedNormStats(ms.toDS(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("vec_norms").outputMode("complete").start()
    try {
      ms.addData(
        vec(1, Seq(3e-6f, 4e-6f), "2024-07-23 10:10:00"),
        vec(2, Seq(6e-6f, 8e-6f), "2024-07-23 10:40:00"),
        vec(3, Seq(3e-6f, 4e-6f), "2024-07-23 11:10:00"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql(
      "SELECT window.start, n_vecs, round(avg_norm, 3), round(min_norm, 3) FROM vec_norms ORDER BY 1")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // quantized 3e-6*1e6 = 3, 4e-6*1e6 = 4 -> norm 5; doubled -> 10
    assert(rows.toSeq == Seq(
      ("2024-07-23 10:00:00.0", 2L, 7.5, 5.0),
      ("2024-07-23 11:00:00.0", 1L, 5.0, 5.0)))
  }
}
