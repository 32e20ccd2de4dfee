package graft.analytics

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal-column queries over derived binary payloads (see
  * [[graft.operators.Multimodal]] for the typed batched-decode path). The
  * Spark side genuinely operates on a BinaryType `payload` column
  * (encode/md5/octet_length over bytes); the DuckDB oracle computes the same
  * values from the source text (identical UTF-8 bytes) because DuckDB 1.0
  * has no md5(BLOB).
  */
object MultimodalQueries {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  val all: Map[String, QuerySpec] = Map(

    // ----- payload metadata: size, content hash, stub-decoded dimensions ----
    "mm_media_meta" -> QuerySpec(
      (s, d) => {
        docs(s, d)
          .withColumn("payload", encode(trim(col("text")), "UTF-8"))
          .select(
            col("doc_id"),
            expr("case when doc_id % 3 = 0 then 'image' " +
              "when doc_id % 3 = 1 then 'audio' else 'video' end").as("media_type"),
            expr("octet_length(payload)").as("n_bytes"),
            md5(col("payload")).as("payload_md5"),
            expr("cast(32 + pmod(n_chars, 97) as int)").as("width"),
            expr("cast(32 + pmod(n_chars * 31, 71) as int)").as("height"),
            // empty-payload guard: Spark's sequence(1, 0) is [1, 0] (not
            // empty) and 0/0 is NaN where DuckDB yields NULL — match DuckDB
            expr("if(octet_length(payload) = 0, cast(null as double), " +
              "floor(aggregate(transform(sequence(1, length(trim(text))), " +
              "i -> ascii(substring(trim(text), i, 1))), cast(0 as bigint), " +
              "(a, x) -> a + x) / octet_length(payload) * 1e6 + 0.5) / 1e6)").as("mean_byte"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             |  octet_length(encode(trim(text))) AS n_bytes,
             |  md5(trim(text)) AS payload_md5,
             |  CAST(32 + n_chars % 97 AS INT) AS width,
             |  CAST(32 + (n_chars * 31) % 71 AS INT) AS height,
             |  floor(CAST(list_sum(list_transform(generate_series(1, length(trim(text))),
             |    i -> ascii(substr(trim(text), i, 1)))) AS BIGINT)
             |    / octet_length(encode(trim(text))) * 1e6 + 0.5) / 1e6 AS mean_byte
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // ----- frame sampling: 64-byte stride, 16-byte frames, every 2nd kept ---
    "mm_frame_sample" -> QuerySpec(
      (s, d) => {
        docs(s, d)
          .withColumn("body", trim(col("text")))
          // empty-body guard: Spark's sequence(0, -1) is [0, -1], DuckDB's
          // generate_series(0, -1) is empty — emit no frames for empty docs
          .select(col("doc_id"), col("body"),
            explode(expr("if(length(body) = 0, cast(array() as array<int>), " +
              "sequence(0, cast(floor((length(body) - 1) / 64) as int)))"))
              .as("frame_idx"))
          .filter(col("frame_idx") % 2 === 0)
          .withColumn("frame", expr("substring(body, frame_idx * 64 + 1, 16)"))
          .select(
            col("doc_id"), col("frame_idx"),
            md5(col("frame")).as("frame_md5"),
            expr("octet_length(frame)").as("frame_bytes"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH b AS (SELECT doc_id, trim(text) AS body FROM documents),
             |f AS (SELECT doc_id, body,
             |    unnest(generate_series(0, CAST(floor((length(body) - 1) / 64) AS INT))) AS frame_idx
             |  FROM b)
             |SELECT doc_id, frame_idx,
             |  md5(substr(body, frame_idx * 64 + 1, 16)) AS frame_md5,
             |  octet_length(encode(substr(body, frame_idx * 64 + 1, 16))) AS frame_bytes
             |FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin)
    )
  )
}
