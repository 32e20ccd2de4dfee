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
