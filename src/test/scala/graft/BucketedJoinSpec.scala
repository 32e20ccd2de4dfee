package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = co-located joins: writing both join sides bucketed+sorted on
  * the key lets the sort-merge join run with NO shuffle exchange — the
  * pre-partitioning that makes repeated fact-fact joins cheap at 100 TB.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    import java.nio.file.{Files, Paths}
    val wh = Paths.get("target/tmp/bucket-warehouse").toAbsolutePath
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      Files.createDirectories(wh)

      Tables.t(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .option("path", s"$wh/li_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      Tables.t(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .option("path", s"$wh/ord_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      // co-located: no shuffle on either side of the join
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")

      // and results match the plain-parquet join
      val exp = Tables.t(spark, sf, "lineitem")
        .join(Tables.t(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == exp)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
