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
  * per-reason counts sum exactly to the input count — and each duplicate
  * cluster's representative is chosen among members that SURVIVE the
  * earlier stages, so content is never lost just because its min-id copy
  * failed an upstream filter.
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
      .withColumn("stop_ratio", expr(stopRatioS("t")))
      .withColumn("distinct_ratio", expr(distinctRatioS("t")))
      .withColumn("len_score", expr(lenScoreS("text")))
      .withColumn("quality", expr(QualityS))
      .withColumn("dup_trigram_frac", expr(
        s"if(size(th) < 3, cast(0.0 as double), " +
          s"floor((1 - size(tri) / size(${shingleHashesS("th")})) * 1e6 + 0.5) / 1e6)"))
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

    // every pre-dedup verdict first: the duplicate stage must pick each
    // cluster's representative among docs that SURVIVE the earlier stages,
    // or a cluster whose min-id member fails (say) quality loses every copy
    // of its content
    val pre = base
      .join(top, Seq("doc_id"), "left")
      .join(broadcast(contaminated.withColumn("contam", lit(true))), Seq("doc_id"), "left")
      .withColumn("top_token_frac", col("top_n") / col("n_tokens"))
      .withColumn("pre_reason",
        when(col("doc_id") % cfg.benchMod === 0, "benchmark")
          .when(col("quality") < cfg.minQuality, "quality")
          .when(col("top_token_frac") > cfg.maxTopTokenFrac ||
            col("dup_trigram_frac") > cfg.maxDupTrigramFrac, "repetition")
          .when(col("contam"), "contamination"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // duplicate clusters: among surviving members keep the min doc_id
    val comp = ConnectedComponents.components(nearDupPairs, "doc_a", "doc_b")
    val survivingMembers = pre.filter(col("pre_reason").isNull)
      .select(col("doc_id"))
      .join(broadcast(comp), col("doc_id") === col("id"))
      .select(col("doc_id"), col("lbl"))
    val reps = survivingMembers.groupBy(col("lbl")).agg(min(col("doc_id")).as("rep"))
    val dupDrop = survivingMembers.join(reps, "lbl")
      .filter(col("doc_id") =!= col("rep")).select(col("doc_id"))

    val flagged = pre
      .join(broadcast(dupDrop.withColumn("dupe", lit(true))), Seq("doc_id"), "left")
      .withColumn("reason", coalesce(col("pre_reason"), when(col("dupe"), "duplicate")))
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
    // `flagged` stays cached — it backs the returned `curated`; write the
    // output, then release session caches (bench/verify already clearCache)
    base.unpersist(blocking = false)
    pre.unpersist(blocking = false)
    (curated, report)
  }
}
