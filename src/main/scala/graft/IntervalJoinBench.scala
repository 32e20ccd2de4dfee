package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key separation probe for the native interval join (builder tooling,
  * like [[CcHubBench]]): one key owns `SPARK_GRAFT_IJ_ROWS` (default 20k)
  * rows on BOTH sides with narrow windows, so the output is near-linear
  * while Spark's built-in plan — SMJ on the key with the range as a
  * per-key-group post-filter — must enumerate all |Lk| x |Rk| pairs
  * (4 x 10^8 at the default) before discarding. Times the declarative form
  * and [[graft.plans.IntervalJoin]] on identical data and asserts equal
  * row counts; prints one JSON line.
  */
object IntervalJoinBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_IJ_ROWS", "20000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a 64-key background plus ONE hot key (the skew shape): the hot key
    // holds n rows on both sides; left windows [4i, 4i + 40] over right
    // times 4j — ~11 matches per left row, output ~11 rows/left while the
    // hot group's pair space is n^2. Keys are data-derived (no constant
    // folding shortcuts for the built-in plan).
    def side(idc: String) = spark.range(0, 2 * n).select(
      col("id").as(idc),
      when(col("id") < n, lit(999L)).otherwise(pmod(col("id"), lit(64L))).as("key"),
      (pmod(col("id"), lit(n)) * 4).as("tm"))
    val l = side("lid").select(col("lid"), col("key").as("k"),
      col("tm").as("lo"), (col("tm") + 40).as("hi"))
    val r = side("rid").select(col("rid"), col("key").as("rk"), col("tm").as("t"))

    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = body
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val (nNative, tNative) = timed {
      graft.plans.IntervalJoin.join(l, r, "k", "rk", "lo", "hi", "t").count()
    }
    val (nSmj, tSmj) = timed {
      l.join(r, col("k") === col("rk") && col("t") >= col("lo") && col("t") <= col("hi")).count()
    }
    require(nNative == nSmj, s"row counts diverge: $nNative vs $nSmj")
    println(s"""{"metric":"interval_join_hotkey","rows_per_side":$n,""" +
      s""""matches":$nNative,"native_s":${f"$tNative%.2f"},"smj_s":${f"$tSmj%.2f"}}""")
    spark.stop()
  }
}
