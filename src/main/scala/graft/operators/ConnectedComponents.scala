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
  * Two-tier by edge count: graphs under `localSolveEdges` are solved by
  * union-find inside a single executor task (a verified near-dup graph is
  * ~0.1% of its corpus, so this is the common case and skips all per-round
  * shuffle overhead); larger graphs run distributed min-label propagation
  * with pointer jumping, converging in O(log diameter) rounds of two
  * equi-joins each. The classic refinement for skewed giant components is
  * large-star/small-star, which the iterative structure extends to.
  */
object ConnectedComponents {

  /** @return one row per vertex: (id, lbl) with lbl = min id of its component. */
  def components(edges: DataFrame, src: String, dst: String, maxIter: Int = 20,
                 localSolveEdges: Long = 4000000L): DataFrame = {
    // no distinct: duplicate edges change neither union-find nor a
    // neighbor-min, and deduping them costs a full shuffle of the edge list
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = und.count()
    val out =
      if (nEdges <= localSolveEdges) localSolve(und)
      else iterate(und, maxIter)
    und.unpersist(blocking = false)
    out
  }

  /** Single-task union-find for graphs under the local threshold.
    *
    * A verified near-dup pair graph is orders of magnitude smaller than the
    * corpus it came from (LSH banding + Jaccard verify keep ~0.1% of rows as
    * edges), so the common case even for a very large corpus is a graph that
    * fits comfortably in one executor task. Each distributed round of the
    * iterative path costs several shuffles plus plan compilation — ~1 s of
    * fixed overhead regardless of data size — while union-find over a few
    * million edges in a single `mapPartitions` task is milliseconds, stays
    * off the driver, and needs no iteration at all. Graphs above the
    * threshold take the O(log diameter) distributed path.
    */
  private def localSolve(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    val idType = und.schema("a").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType, nullable = false),
      org.apache.spark.sql.types.StructField("lbl", idType, nullable = false)))
    val labeled = und.rdd.coalesce(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      def lt(x: Any, y: Any): Boolean =
        x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
      it.foreach { row =>
        val (a, b) = (row.get(0), row.get(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
      }
      // snapshot the key set: find()'s path compression updates the map
      val ks = parent.keys.toArray
      ks.iterator.map(k => Row(k, find(k)))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    labeled.count() // materialize before the caller unpersists the edge cache
    spark.createDataFrame(labeled, schema)
  }

  /** Distributed min-label propagation for graphs above the local threshold.
    *
    *   - Lineage cut per round: each result is snapshotted to a persisted RDD
    *     and re-wrapped as a fresh DataFrame. Without this the logical plan
    *     embeds the previous round's plan twice per round (2^k growth — on a
    *     12-hop chain the analyzed-plan string alone OOMs the driver).
    *   - Pointer jumping: after the neighbor-min step, each vertex adopts its
    *     representative's label (`lbl <- lbl(lbl)`), so labels hop two levels
    *     per round and the loop converges in O(log diameter) rounds, not
    *     O(diameter). Every label IS a vertex id, so the shortcut is an
    *     equi-join back onto the same round's labels.
    *   - Convergence by label sum: per-vertex labels only ever decrease, so
    *     the DECIMAL(38,0) sum strictly decreases until the fixpoint — one
    *     aggregate over the just-cached round, no comparison join, and the
    *     same action that materializes the round's RDD.
    */
  private def iterate(und: DataFrame, maxIter: Int): DataFrame = {
    val spark = und.sparkSession

    def snapshot(df: DataFrame): (DataFrame, RDD[Row]) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.get(0)
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal]
    }

    var (labels, labelsRdd) = snapshot(
      und.select(col("a").as("id")).distinct().withColumn("lbl", col("id")))
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
      val hop = labels.join(nbrMin, col("id") === col("a"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val (next, nextRdd) = snapshot(
        hop.as("n")
          .join(hop.select(col("id").as("rid"), col("lbl").as("rlbl")).as("r"),
            col("n.lbl") === col("r.rid"), "left")
          .select(col("n.id").as("id"), coalesce(col("rlbl"), col("n.lbl")).as("lbl")))
      val nextSum = labelSum(next)
      labelsRdd.unpersist(blocking = false)
      labels = next
      labelsRdd = nextRdd
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    labels
  }
}
