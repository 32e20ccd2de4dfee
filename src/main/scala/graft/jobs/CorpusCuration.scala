package graft.jobs

import graft.functions.TextFunctions._
import graft.operators.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training run actually
  * consumes, chaining the individually-oracled operators into one DataFrame
  * flow — quality scoring, repetition filtering, benchmark holdout +
  * decontamination, duplicate-cluster dropping, and PII scrubbing.
  *
  * Plan shape at 100 TB: the corpus is scanned ONCE for the stateless
  * signals (quality, trigram repetition, shingles); the only corpus-sized
  * shuffle is the top-token aggregate (map-side combined on (doc, hash));
  * the contamination and duplicate drop lists are orders of magnitude
  * smaller than the corpus and join back as broadcasts; the scrub is a
  * codegen'd regexp chain in the final projection stage. Each document
  * is attributed to the FIRST stage that drops it, so the report's
  * per-reason counts sum exactly to the input count.
  */
object CorpusCuration {

  final case class CurationConfig(
      minQuality: Double = 0.3,
      maxTopTokenFrac: Double = 0.2,
      maxDupTrigramFrac: Double = 0.2,
      benchMod: Int = 20) // doc_id % benchMod == 0 -> benchmark holdout slice

  final case class CurationReport(
      input: Long,
      kept: Long,
      benchmark: Long,
      droppedQuality: Long,
      droppedRepetition: Long,
      droppedContamination: Long,
      droppedDuplicate: Long)

  /** @param docs         corpus with (doc_id, text, ...) columns
    * @param nearDupPairs verified near-dup pairs (doc_a, doc_b), e.g. from
    *                     the MinHash+LSH pipeline
    * @return (curated corpus with scrubbed text, per-stage drop report)
    */
  def curate(
      docs: DataFrame,
      nearDupPairs: DataFrame,
      cfg: CurationConfig = CurationConfig()): (DataFrame, CurationReport) = {
    val base = docs
      .withColumn("t", expr(tokensS("text")))
      .withColumn("th", expr(tokenHashesS("t")))
      .withColumn("tri", expr(s"array_distinct(${shingleHashesS("th")})"))
      .withColumn("n_tokens", expr("cast(size(t) as bigint)"))
      .withColumn("stop_ratio", expr(
        "floor(size(filter(t, w -> array_contains(array('the','a','of','and','is','to'), w))) / size(t) * 1e6 + 0.5) / 1e6"))
      .withColumn("distinct_ratio", expr(
        "floor(size(array_distinct(t)) / size(t) * 1e6 + 0.5) / 1e6"))
      .withColumn("len_score", expr(
        "floor(least(length(trim(text)), 400) / 400 * 1e6 + 0.5) / 1e6"))
      .withColumn("quality", expr(
        "floor((0.3 * stop_ratio + 0.4 * distinct_ratio + 0.3 * len_score) * 1e6 + 0.5) / 1e6"))
      .withColumn("dup_trigram_frac", expr(
        s"floor((1 - size(tri) / greatest(size(${shingleHashesS("th")}), 1)) * 1e6 + 0.5) / 1e6"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // top-token share: the one corpus-sized aggregate
    val top = base.select(col("doc_id"), explode(col("th")).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("top_n"))

    // benchmark n-gram set and the training docs overlapping it
    val bench = base.filter(col("doc_id") % cfg.benchMod === 0)
      .select(explode(col("tri")).as("h")).distinct()
    val contaminated = base.filter(col("doc_id") % cfg.benchMod =!= 0)
      .select(col("doc_id"), explode(col("tri")).as("h"))
      .join(broadcast(bench), "h")
      .select(col("doc_id")).distinct()

    // duplicate-cluster non-representatives
    val dupDrop = ConnectedComponents.components(nearDupPairs, "doc_a", "doc_b")
      .filter(col("id") =!= col("lbl")).select(col("id").as("doc_id"))

    val flagged = base
      .join(top, Seq("doc_id"), "left")
      .join(broadcast(contaminated.withColumn("contam", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(dupDrop.withColumn("dupe", lit(true))), Seq("doc_id"), "left")
      .withColumn("top_token_frac", col("top_n") / col("n_tokens"))
      .withColumn("reason",
        when(col("doc_id") % cfg.benchMod === 0, "benchmark")
          .when(col("quality") < cfg.minQuality, "quality")
          .when(col("top_token_frac") > cfg.maxTopTokenFrac ||
            col("dup_trigram_frac") > cfg.maxDupTrigramFrac, "repetition")
          .when(col("contam"), "contamination")
          .when(col("dupe"), "duplicate"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val counts = flagged.groupBy(col("reason")).count().collect()
      .map(r => Option(r.getString(0)).getOrElse("kept") -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val report = CurationReport(
      input = counts.values.sum,
      kept = counts("kept"),
      benchmark = counts("benchmark"),
      droppedQuality = counts("quality"),
      droppedRepetition = counts("repetition"),
      droppedContamination = counts("contamination"),
      droppedDuplicate = counts("duplicate"))

    val keptCols = docs.columns.filter(_ != "text").map(col).toSeq
    val curated = flagged.filter(col("reason").isNull)
      .select(keptCols ++ Seq(
        expr(scrubS("text")).as("text"),
        col("n_tokens"), col("quality")): _*)
    base.unpersist(blocking = false)
    (curated, report)
  }
}
