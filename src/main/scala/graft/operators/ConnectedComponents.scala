package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by min-label propagation — the operator that turns
  * near-duplicate PAIRS into duplicate CLUSTERS (pick one representative per
  * component, drop the rest), the step after candidate generation in a
  * training-data dedup pipeline.
  *
  * Iterates `label(v) <- min(label(v), min over neighbors)` to fixpoint:
  * after k rounds every vertex holds the minimum id of its k-hop
  * neighborhood, so the iteration count is bounded by the component
  * diameter (near-dup clusters are clique-like: 2-3 rounds in practice).
  * Each round is one shuffle on the edge key + one on the vertex key; the
  * convergence check is a cheap `limit(1).count` on changed labels. At
  * 100 TB the same loop runs with the edge list partitioned by `b` —
  * the classic alternative for skewed graphs is large-star/small-star,
  * which this structure extends to.
  */
object ConnectedComponents {

  /** @return one row per vertex: (id, lbl) with lbl = min id of its component.
    *
    * Each iteration's result is snapshotted to a persisted RDD and re-wrapped
    * as a fresh DataFrame: without this lineage cut the logical plan embeds
    * the previous round's plan twice per round (2^k growth — on a 12-hop
    * chain the analyzed-plan string alone OOMs the driver). The snapshot
    * keeps plan size constant per round and lets the loop free exactly the
    * previous round's blocks.
    */
  def components(edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    def snapshot(df: DataFrame): (DataFrame, RDD[Row]) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    var (labels, labelsRdd) = snapshot(
      und.select(col("a").as("id")).distinct().withColumn("lbl", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
      val (next, nextRdd) = snapshot(
        labels.join(nbrMin, col("id") === col("a"), "left")
          .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
      val changed = next.as("n").join(labels.as("p"), "id")
        .filter(col("n.lbl") =!= col("p.lbl")).limit(1).count()
      labelsRdd.unpersist(blocking = false)
      labels = next
      labelsRdd = nextRdd
      converged = changed == 0
      i += 1
    }
    und.unpersist(blocking = false)
    labels
  }
}
