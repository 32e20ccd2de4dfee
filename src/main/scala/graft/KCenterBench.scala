package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round flatness probe for the incremental k-center selection
  * (builder tooling, like [[IntervalJoinBench]]): runs
  * [[graft.analytics.SimilarityQueries.kcenterTrajectory]] at
  * `SPARK_GRAFT_KC_K` (default 64) over `SPARK_GRAFT_SF_DIR`'s embeddings
  * and prints one JSON line with every round's wall millis. The
  * incremental recurrence joins each round against ONE new center, so
  * per-round cost must stay flat in r; the replaced O(n·k²) form
  * re-aggregated the corpus against all r−1 centers and grew linearly
  * per round (quadratic in total).
  */
object KCenterBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_KC_K", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.analytics.SimilarityQueries
    graft.functions.VectorExpressions.register(spark)
    val q = Tables.spread(Tables.t(spark, sfDir, "embeddings"), "vec_id")
      .select(col("vec_id"),
        expr(graft.functions.TextFunctions.quantizeS("embedding")).as("qe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    q.count() // warm the projection so round times measure rounds only

    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val picks = SimilarityQueries.kcenterTrajectory(spark, q, k,
      (r, ms) => times += ((r, ms)))
    require(picks.size == k && picks.map(_._2).distinct.size == k,
      s"expected $k distinct picks, got ${picks.size}")
    // covering radius must be non-increasing (greedy max-min invariant)
    val radii = picks.drop(1).map(_._3)
    require(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      "covering radius increased between rounds")

    val half = times.size / 2
    val firstHalf = times.take(half).map(_._2)
    val secondHalf = times.drop(half).map(_._2)
    def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val json = s"""{"metric":"kcenter_per_round","sf_dir":"$sfDir","k":$k,""" +
      s""""median_first_half_ms":${med(firstHalf.toSeq)},""" +
      s""""median_second_half_ms":${med(secondHalf.toSeq)},""" +
      s""""rounds_ms":[${times.map(_._2).mkString(",")}]}"""
    println(json)
    spark.stop()
  }
}
