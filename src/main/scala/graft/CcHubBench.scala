package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hub-skew SCALE probe for the distributed connected-components tier
  * (builder tooling, like [[TimelineLakeBench]]): the near-dup fixtures'
  * 32x replication produces many SMALL stars (degree ~31 — every reducer
  * happy), but the production worst case is one GIANT star: a boilerplate
  * template near-duplicating millions of documents, whose representative's
  * neighborhood is a single join key. This main synthesizes exactly that —
  * one hub adjacent to `SPARK_GRAFT_HUB_EDGES` vertices (default 4M) plus a
  * disjoint-pairs background graph — and times
  * [[operators.ConnectedComponents.components]] with the local tier
  * disabled, printing per-run seconds and the label checksum (which must be
  * invariant under any join strategy).
  *
  * This probe DECIDED AGAINST salting the star rounds' min-joins (SURVEY
  * §4 records the numbers): an 8-way salted variant of both joins measured
  * 45.7 s where the plain joins take 35.5 s at hub = 4M, identical
  * checksums. The Kiveris formulation already bounds hub damage — every
  * shuffled row is keyed by the CHILD vertex and the per-vertex min is
  * map-side combined, so the hub's one heavy task is a cheap hash probe,
  * while salting pays an 8x explosion of the one-row-per-vertex min side
  * on every round. Salting earns its keep only when one reducer's share is
  * wall-clock-dominating on a multi-node cluster; if that regime arrives,
  * this main is the harness to justify it with.
  */
object CcHubBench {
  def main(args: Array[String]): Unit = {
    val hubEdges = sys.env.getOrElse("SPARK_GRAFT_HUB_EDGES", "4000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one hub (id 0) + hubEdges spokes, plus a 10%-sized set of disjoint
    // PAIRS as non-skewed background mass so the probe isn't ONLY the hot
    // key (pairs, not a chain: a path graph's diameter forces O(log n)
    // star rounds and would measure round count, not join skew)
    val spokes = spark.range(1, hubEdges + 1)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val pairs = spark.range(0, hubEdges / 10)
      .select((col("id") * 2 + hubEdges + 1).as("src"),
        (col("id") * 2 + hubEdges + 2).as("dst"))
    val edges = spokes.unionByName(pairs)

    val t0 = System.nanoTime()
    val labels = operators.ConnectedComponents
      .components(edges, "src", "dst", localSolveEdges = 0L)
    val checksum = labels.agg(sum(expr("id + lbl"))).collect()(0).getLong(0)
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"cc_hub","hub_edges":$hubEdges,""" +
      s""""seconds":${f"$dt%.2f"},"checksum":$checksum}""")
    spark.stop()
  }
}
