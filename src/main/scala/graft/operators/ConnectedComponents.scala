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
  * shuffle overhead); larger graphs run alternating large-star/small-star
  * rounds (Kiveris et al., SoCC'14) — the skew-robust formulation: a giant
  * boilerplate component (the worst case real near-dup graphs produce)
  * shuffles on CHILD vertex ids each round, never funnelling its whole
  * membership through the representative's partition the way min-label
  * propagation does. See [[iterateWithRounds]].
  */
object ConnectedComponents {

  /** Default local-solve threshold; `SPARK_GRAFT_CC_LOCAL_EDGES` overrides
    * (0 forces the distributed star tier — the scale-probe knob, since at
    * bench scale every near-dup graph otherwise resolves in the local tier).
    *
    * 16M: measured on a 4.66M-edge near-dup graph (32x corpus), the local
    * union-find task solves in 9.0 s where one star round + hand-off takes
    * 15.1 s and full star convergence (2 rounds) 20.3 s — each distributed
    * round carries ~5 s of fixed shuffle + plan cost regardless of size, so
    * the crossover sits where union-find's single task stops fitting task
    * memory, not where rounds get cheap. 16M edges is ~1-1.5 GB of
    * union-find state — safe in any reasonable executor; beyond it the
    * star tier (result-equal, spec- and probe-verified) takes over.
    */
  val LocalSolveEdgesDefault: Long = sys.env.get("SPARK_GRAFT_CC_LOCAL_EDGES") match {
    case None => 16000000L
    case Some(raw) =>
      // fail naming the knob: a raw .toLong here would surface as an
      // ExceptionInInitializerError that never mentions the env var
      val v = scala.util.Try(raw.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_CC_LOCAL_EDGES must be a non-negative integer, got: '$raw'"))
      if (v < 0) throw new IllegalArgumentException(
        s"SPARK_GRAFT_CC_LOCAL_EDGES must be >= 0, got: $v")
      v
  }

  /** @return one row per vertex: (id, lbl) with lbl = min id of its component. */
  def components(edges: DataFrame, src: String, dst: String, maxIter: Int = 20,
                 localSolveEdges: Long = LocalSolveEdgesDefault): DataFrame = {
    // no distinct: duplicate edges change neither union-find nor a
    // neighbor-min, and deduping them costs a full shuffle of the edge
    // list. Symmetrize via explode, NOT union of two selects: a union
    // evaluates the upstream pair pipeline (for near-dup graphs, the whole
    // LSH candidate + verify join) once per branch when this persist
    // materializes — explode reads it once.
    val und = edges
      .select(explode(array(
        struct(col(src).as("a"), col(dst).as("b")),
        struct(col(dst).as("a"), col(src).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = und.count()
    val out =
      if (nEdges <= localSolveEdges) localSolve(und)
      else iterate(und, maxIter, localSolveEdges)
    if (sys.env.contains("SPARK_GRAFT_VERBOSE"))
      System.err.println(s"[cc] edges=$nEdges tier=" +
        (if (nEdges <= localSolveEdges) "local" else "star"))
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
    // tracked: the result RDD must outlive this call (the caller's action
    // reads it), so release happens at the harness seam, not here
    val labeled = graft.CacheTracker.trackRdd(und.rdd.coalesce(1).mapPartitions { it =>
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
    }.persist(StorageLevel.MEMORY_AND_DISK))
    labeled.count() // materialize before the caller unpersists the edge cache
    spark.createDataFrame(labeled, schema)
  }

  /** Distributed tier: alternating large-star / small-star rounds (the
    * MapReduce CC algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) until the edge set is a fixpoint — a
    * forest of stars rooted at each component's minimum vertex.
    *
    *   - Large-star: every vertex u hangs its LARGER neighbors onto
    *     m = min(N(u) ∪ {u}). Small-star: with all edges now child→smaller,
    *     every u re-hangs itself and all its parents onto its smallest
    *     parent. Both halve tree heights, so the loop converges in
    *     O(log² n) rounds worst-case (O(log n) in practice).
    *   - Why this beats plain min-label propagation on a skewed graph: the
    *     per-vertex min is a map-side-combined aggregate, and every emitted
    *     edge is KEYED BY THE CHILD vertex — uniformly distributed even
    *     when one giant component dominates. Label propagation instead
    *     shuffles and joins on the label VALUE, so a giant component
    *     funnels its entire membership through the representative's
    *     partition every round.
    *   - Lineage cut per round: each round's edge set is snapshotted to a
    *     persisted RDD and re-wrapped as a fresh DataFrame; without this
    *     the logical plan nests the previous round's plan several times per
    *     round (exponential growth — the analyzed-plan string alone OOMs
    *     the driver on a 12-hop chain).
    *   - Fixpoint check: stars are invariant under both operations, so the
    *     loop stops when a round reproduces the identical (distinct) edge
    *     set — count equality + an empty `except`, computed on the two
    *     cached rounds.
    *   - Hybrid hand-off: each round's edge set is an equivalent graph
    *     (same components, fewer edges — a star round collapses most of a
    *     near-dup graph's clique mass to one edge per member), so once the
    *     count falls under `localCut` the remaining rounds are finished by
    *     the single-task union-find tier instead of 2-3 more distributed
    *     rounds of joins plus convergence checks.
    */
  private def iterate(und: DataFrame, maxIter: Int, localCut: Long): DataFrame =
    iterateWithRounds(und, maxIter, localCut)._1

  /** [[iterate]] plus the number of distributed rounds run — exposed for
    * the spec's convergence-rate assertions (`localCut = 0` keeps the loop
    * purely distributed to full star convergence).
    */
  private[graft] def iterateWithRounds(und: DataFrame, maxIter: Int,
      localCut: Long = 0L): (DataFrame, Int) = {
    val spark = und.sparkSession

    def snapshot(df: DataFrame): (DataFrame, RDD[Row]) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    var (edges, edgesRdd) = snapshot(und.filter(col("a") =!= col("b")))
    var rounds = 0
    var converged = false
    var localResult: Option[DataFrame] = None
    while (localResult.isEmpty && !converged && rounds < maxIter) {
      // large-star over full neighborhoods (symmetrize: the round-1 input
      // is undirected; later rounds are child→smaller but the union keeps
      // the step uniform and idempotent on stars)
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val mL = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val large = sym.join(mL, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
      // small-star: all edges point child→smaller now, so each child's
      // parents are exactly its (smaller) neighbors
      val mS = large.groupBy(col("a")).agg(min(col("b")).as("m"))
      val small = large.join(mS, "a")
        .select(col("b").as("v"), col("m"))
        .union(mS.select(col("a").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()
      val (next, nextRdd) = snapshot(small)
      val nextCnt = next.count()
      if (nextCnt <= localCut) {
        // the contracted graph fits the local tier: finish with one
        // union-find task instead of more distributed rounds
        edgesRdd.unpersist(blocking = false)
        edges = next
        edgesRdd = nextRdd
        localResult = Some(localSolve(next))
      } else {
        val same = nextCnt == edges.count() && next.except(edges).isEmpty
        edgesRdd.unpersist(blocking = false)
        edges = next
        edgesRdd = nextRdd
        converged = same
      }
      rounds += 1
    }
    // converged edge set = {(member, component-min)}; roots carry no edge.
    // On the hybrid path the labels come from union-find over the
    // contracted graph instead (same components by construction). The
    // min-aggregate is the one-row-per-vertex contract guard: if maxIter
    // exhausts before star convergence, a vertex can still carry edges to
    // several candidate labels — emit its smallest (best-known) label
    // rather than duplicate rows.
    val resolved = localResult.getOrElse(
      edges.select(col("a").as("id"), col("b").as("lbl")))
    val (labels, labelsRdd) = snapshot(
      und.select(col("a").as("id")).distinct()
        .join(resolved, Seq("id"), "left")
        .groupBy(col("id"))
        .agg(min(coalesce(col("lbl"), col("id"))).as("lbl")))
    // the labels snapshot must outlive this call (the caller's action reads
    // it) — release at the harness seam via the tracker
    graft.CacheTracker.trackRdd(labelsRdd)
    labels.count() // materialize before the caller unpersists the edge cache
    edgesRdd.unpersist(blocking = false)
    if (sys.env.contains("SPARK_GRAFT_VERBOSE"))
      System.err.println(s"[cc] star rounds=$rounds " +
        s"handoff=${localResult.isDefined} converged=$converged")
    (labels, rounds)
  }
}
