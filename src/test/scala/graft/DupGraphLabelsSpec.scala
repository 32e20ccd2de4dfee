package graft

import graft.operators.{ConnectedComponents, DupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental component labels over the dup graph: per-batch contracted
  * maintenance equals from-scratch components after every batch — including
  * a batch that MERGES two previously separate components through a new
  * doc — replay is idempotent, and only the touched buckets rewrite.
  */
class DupGraphLabelsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_a", "doc_b")
  }

  private def labelMap(path: String): Map[Long, Long] =
    DupGraph.labels(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fromScratch(all: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val m = ConnectedComponents.components(all, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.CacheTracker.releaseAll()
    m
  }

  test("batch maintenance == from-scratch; merges propagate; replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("dupgraph_labels").toString

    // batch 0: two separate components {1,2} and {10,11}
    val b0 = edges(1L -> 2L, 10L -> 11L)
    DupGraph.refreshLabels(spark, dir, b0)
    assert(labelMap(dir) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))

    // batch 1: extends one component and adds a fresh one
    val b1 = edges(2L -> 3L, 20L -> 21L)
    DupGraph.refreshLabels(spark, dir, b1)
    assert(labelMap(dir) == fromScratch(b0.unionByName(b1)))
    assert(labelMap(dir)(3L) == 1L)

    // batch 2: a bridge doc MERGES the 1- and 10-components; the new global
    // min (1) must reach every member of the absorbed component
    val b2 = edges(5L -> 2L, 5L -> 11L)
    DupGraph.refreshLabels(spark, dir, b2)
    val all = b0.unionByName(b1).unionByName(b2)
    val expected = fromScratch(all)
    assert(labelMap(dir) == expected)
    assert(labelMap(dir)(10L) == 1L && labelMap(dir)(11L) == 1L)

    // replay of batch 2: identity remap, store unchanged
    DupGraph.refreshLabels(spark, dir, b2)
    assert(labelMap(dir) == expected)

    // a new component whose id is SMALLER than an existing label never
    // perturbs unrelated components
    val b3 = edges(0L -> 100L)
    DupGraph.refreshLabels(spark, dir, b3)
    val expected3 = fromScratch(all.unionByName(b3))
    assert(labelMap(dir) == expected3)
    assert(labelMap(dir)(0L) == 0L && labelMap(dir)(100L) == 0L)
  }

  test("delete propagates to the label store: bridge split + edge-less drop") {
    val dir = java.nio.file.Files.createTempDirectory("dupgraph_del").toString
    import spark.implicits._
    // components: triangle {1,2,3}, bridge chain {10,11,12}, pair {20,21}
    val all = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (1L, 3L, 0.9),
      (10L, 11L, 0.8), (11L, 12L, 0.8), (20L, 21L, 0.7))
      .toDF("doc_a", "doc_b", "j")
    all.withColumn("batch_id", lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/edges")
    DupGraph.refreshLabels(spark, dir,
      all.select(col("doc_a"), col("doc_b")))
    assert(labelMap(dir) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))

    // deleting the bridge doc 11 splits its chain; 10 and 12 become
    // edge-less and must DROP from the store, not linger merged via 11
    DupGraph.delete(spark, dir, Seq(11L).toDF("doc_id"))
    assert(labelMap(dir) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      20L -> 20L, 21L -> 20L))
    // the invariant the store pins: labels == from-scratch components of
    // the surviving edge log
    assert(labelMap(dir) ==
      fromScratch(DupGraph.edges(spark, dir).select("doc_a", "doc_b")))

    // deleting a triangle member keeps the survivors connected (1-3 edge)
    DupGraph.delete(spark, dir, Seq(2L).toDF("doc_id"))
    assert(labelMap(dir) == Map(1L -> 1L, 3L -> 1L, 20L -> 20L, 21L -> 20L))
    assert(labelMap(dir) ==
      fromScratch(DupGraph.edges(spark, dir).select("doc_a", "doc_b")))

    // replay of the same delete is a no-op
    DupGraph.delete(spark, dir, Seq(2L).toDF("doc_id"))
    assert(labelMap(dir) == Map(1L -> 1L, 3L -> 1L, 20L -> 20L, 21L -> 20L))
  }

  test("delete on a LAGGING label store folds unfolded edges first") {
    val dir = java.nio.file.Files.createTempDirectory("dupgraph_lag").toString
    import spark.implicits._
    // batch 0 folded into labels: components {1,2} and {10,11}
    val b0 = Seq((1L, 2L, 0.9), (10L, 11L, 0.9)).toDF("doc_a", "doc_b", "j")
    b0.withColumn("batch_id", lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/edges")
    DupGraph.refreshLabels(spark, dir, b0.select(col("doc_a"), col("doc_b")))
    // batch 1 lands in the edge log but refreshLabels was NEVER run for it:
    // an UNLABELED doc 5 bridges component {1,2} to {10,11}, and an
    // unfolded stored-stored edge merges {1,2} with a new pair {20,21}
    Seq((5L, 2L, 0.9), (5L, 11L, 0.9), (20L, 21L, 0.9), (20L, 1L, 0.9))
      .toDF("doc_a", "doc_b", "j")
      .withColumn("batch_id", lit(1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/edges")
    // deleting an UNRELATED doc must still leave labels == from-scratch
    // components of the surviving log — delete syncs the lag first, so the
    // bridge doc is not labeled from one touched subgraph only
    DupGraph.delete(spark, dir, Seq(99L).toDF("doc_id"))
    assert(labelMap(dir) ==
      fromScratch(DupGraph.edges(spark, dir).select("doc_a", "doc_b")))
    assert(labelMap(dir)(11L) == 1L && labelMap(dir)(21L) == 1L)
    // and a delete that TOUCHES the lagging region is surgical over the
    // now-synced components: dropping bridge 5 re-splits {10,11} from the
    // 1-component (20,21 stay via the 20-1 edge)
    DupGraph.delete(spark, dir, Seq(5L).toDF("doc_id"))
    assert(labelMap(dir) ==
      fromScratch(DupGraph.edges(spark, dir).select("doc_a", "doc_b")))
    assert(labelMap(dir)(10L) == 10L && labelMap(dir)(21L) == 1L)
  }

  test("dedup_clusters_indexed: label-store scan, no closure stage, result == recompute") {
    val sf = "/root/testdata/sf0.001"
    val indexed = SparkEntry.registry("dedup_clusters_indexed").fn(spark, sf)
    // the read-side dividend the store exists for: the plan is a label-
    // bucket parquet scan + one aggregate — no edge-log scan, no iterative
    // component joins
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("labels"), "plan must scan the label store")
    assert(!plan.contains("edges"), "plan must not read the edge log")
    // and the maintained labels answer EXACTLY what the from-scratch
    // ConnectedComponents row answers
    val recompute = SparkEntry.registry("dedup_clusters").fn(spark, sf)
    assert(indexed.exceptAll(recompute).isEmpty)
    assert(recompute.exceptAll(indexed).isEmpty)
    graft.CacheTracker.releaseAll()
  }

  test("converted dedup rows read the stores, not the verify pipeline") {
    val sf = "/root/testdata/sf0.001"
    // round-11 conversions: pairs (and j) come from the edge store,
    // components from the label store — no tokenize → shingle → minhash →
    // band → verify lineage may appear in any of these plans. Oracles stay
    // from-scratch, so the driver hash gate pins store ≡ recompute.
    // dedup_clusters is converted too but not plan-pinnable: its
    // ConnectedComponents solve materializes through localCheckpoint, so
    // the final plan roots at an ExistingRDD that hides ALL lineage
    // (store scan and pipeline alike); its store read is the same
    // registryEdges call dedup_threshold_curve pins below, and its result
    // stays oracle-pinned against ground-truth closure.
    for (q <- Seq("dedup_threshold_curve", "dedup_filtered_corpus",
        "dedup_leakage_split", "dedup_minhash_lsh", "dedup_sig_jaccard",
        "dedup_contamination", "dedup_contamination_bloom")) {
      val plan = SparkEntry.registry(q).fn(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("graft-dupgraph"), s"$q must scan the dup-graph store")
      assert(!plan.contains("shingle3_hash"), s"$q must not re-shingle the corpus")
      assert(!plan.contains("minhash16"), s"$q must not re-run minhash")
      graft.CacheTracker.releaseAll()
    }
  }

  test("mid-life adoption bootstraps from the existing edge log") {
    val dir = java.nio.file.Files.createTempDirectory("dupgraph_adopt").toString
    import spark.implicits._
    // an edge store that predates label maintenance
    Seq((1L, 2L, 0.9), (2L, 3L, 0.8)).toDF("doc_a", "doc_b", "j")
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/edges")
    // first refresh carries only the NEW batch's edges, yet the bootstrap
    // must fold the pre-existing log in
    DupGraph.refreshLabels(spark, dir, edges(7L -> 8L))
    assert(labelMap(dir) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }
}
