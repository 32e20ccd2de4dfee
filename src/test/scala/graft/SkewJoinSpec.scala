package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join must be result-identical to the plain join and spread a hot
  * key across salt buckets.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join matches plain join on a skewed key distribution") {
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val ord = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))

    val plain = li.join(ord, "l_orderkey")
      .agg(count(lit(1)), sum("l_quantity").cast("decimal(18,2)"),
        sum("o_custkey")).collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(li, ord, "l_orderkey",
        saltSource = col("l_partkey") * 7 + col("l_quantity"))
      .agg(count(lit(1)), sum("l_quantity").cast("decimal(18,2)"),
        sum("o_custkey")).collect().toSeq
    assert(plain == salted)
  }

  test("hot key spreads across salt buckets") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => ("hot", i)).toDF("k", "payload")
    val salted = hot.withColumn("__salt",
      pmod(hash(col("payload")), lit(8)))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length == 8)
    assert(buckets.map(_.getLong(1)).max < 1000 * 0.3) // no bucket dominates
  }
}
