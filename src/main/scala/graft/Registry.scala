package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query exposed through [[SparkEntry]]: the Spark implementation
  * plus (when SQL-expressible) the equivalent ANSI SQL the driver runs in
  * DuckDB over the same parquet tables. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

object Tables {
  /** Spread a small input across the session's full parallelism with an
    * EXPLICIT partition count: compute-heavy per-row projections (signature
    * hashing, vector math) otherwise serialize, because a small file arrives
    * as one split and AQE coalesces count-less `repartition(col)` exchanges
    * right back to one partition.
    *
    * CONDITIONAL (round 11): `repartition` is never a no-op — it is a full
    * Exchange of every input byte, and for `documents` that means shuffling
    * the whole corpus (text payload included) before a narrow projection.
    * At 100 TB that is exactly the shuffle guide §2.4 says to remove: a
    * large input already arrives in enough file splits to fill the
    * session's cores, so the exchange only applies when the scan is
    * under-split (estimated splits below the core count — the gate/bench
    * corpora, sub-MB single-row-group files, estimate to 0-1 splits and
    * keep the historical plan byte-identical). The estimate is
    * statistics-only (optimizer size-in-bytes / files.maxPartitionBytes) —
    * no RDD materialization, no job.
    */
  def spread(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val maxSplit = org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val plan = df.queryExecution.optimizedPlan
    // The skip applies only to RAW scans (scan + narrow projections):
    // without CBO a Filter/Limit node passes its child's sizeInBytes
    // through, so a tiny filtered slice of a huge table would estimate
    // "big" and wrongly skip the parallelism exchange this helper exists
    // to provide (r12, the r11 ADVICE item). Filtered frames keep the
    // historical repartition — which shuffles only the SURVIVING rows, so
    // the 100 TB full-corpus-shuffle concern does not apply to them.
    val bareScan = !plan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter => true
      case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
      case _ => false
    }
    val bytes = plan.stats.sizeInBytes
    if (bareScan && bytes / maxSplit >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }
  /** Load one of the driver-provided tables from a scale-factor dir.
    *
    * `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` it surfaces
    * as a LongType of nanoseconds — normalize it to a microsecond
    * TimestampType column (the source data is µs-precision, so lossless).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == org.apache.spark.sql.types.LongType &&
        (f.name == "ts" || f.name.endsWith("_ts_nanos")))
        // integer DIV, not `/`: epoch nanos (~1.7e18) exceed double's 53-bit
        // mantissa, so floating division is off by +/-1us on ~half the rows
        acc.withColumn(f.name,
          org.apache.spark.sql.functions.expr(
            s"timestamp_micros(${f.name} DIV 1000)"))
      else acc
    }
  }

  /** All driver-provided table names at a scale-factor dir. */
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (plus the native vector/text
    * functions) so users can drive the engine through plain `spark.sql`.
    */
  def createViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.VectorExpressions.register(spark)
    Names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
  }
}
