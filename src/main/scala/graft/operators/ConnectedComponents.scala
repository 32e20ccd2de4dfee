package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** @return one row per vertex: (id, lbl) with lbl = min id of its component. */
  def components(edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
      val next = labels.join(nbrMin, col("id") === col("a"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.as("n").join(labels.as("p"), "id")
        .filter(col("n.lbl") =!= col("p.lbl")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    und.unpersist()
    labels
  }
}
