package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the minhash family (builder-side tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)

    def time(label: String)(f: => Long): Unit = {
      // warm then min of 2
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"[prof] $label%-32s ${ts.map(_._1).min}%8.1f ms  rows=${ts.head._2}")
      graft.CacheTracker.releaseAll()
      spark.catalog.clearCache()
    }

    val sh = () => graft.analytics.DedupQueries.shingleProjection(spark, d)
    time("shingleProjection.count") { sh().count() }
    time("signatures(minhash16)") {
      sh().withColumn("sig", expr("minhash16(hs)")).select("doc_id", "sig").count()
    }
    time("bands0(explode)") {
      val sig = sh().withColumn("sig", expr("minhash16(hs)"))
      sig.selectExpr("doc_id",
        s"explode(transform(sequence(0, ${graft.functions.TextFunctions.Bands - 1}), b -> named_struct(" +
          s"'b', b, 'k', array_join(slice(sig, b * ${graft.functions.TextFunctions.RowsPerBand} + 1, ${graft.functions.TextFunctions.RowsPerBand}), '_')))) AS bk")
        .count()
    }
    time("pairs(candidates+verify)") {
      graft.analytics.DedupQueries.minhashPairsFrom(sh()).count()
    }
    time("full dedup_minhash_lsh") {
      graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d).count()
    }
    time("full dedup_filtered_corpus") {
      graft.SparkEntry.queries("dedup_filtered_corpus")(spark, d).count()
    }
    spark.stop()
  }
}
