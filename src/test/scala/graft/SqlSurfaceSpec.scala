package graft

import org.scalatest.funsuite.AnyFunSuite

/** The raw `spark.sql` surface: Tables.createViews registers every
  * driver-provided table (with the nanos→µs timestamp normalization) and
  * the native functions, so the engine is drivable with plain SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("plain SQL over registered views, timestamps normalized, natives registered") {
    Tables.createViews(spark, "/root/testdata/sf0.001")

    val joined = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin).collect()
    assert(joined.length == 5 && joined.map(_.getLong(1)).sum > 0)

    // events.ts surfaced as a usable TimestampType despite TIMESTAMP(NANOS)
    val days = spark.sql(
      "SELECT COUNT(DISTINCT date_trunc('day', ts)) FROM events").head.getLong(0)
    assert(days > 0)

    // native expressions callable from SQL
    val h = spark.sql(
      "SELECT simhash32(array(CAST(7 AS BIGINT), CAST(11 AS BIGINT)))").head.getLong(0)
    assert(h != 0L)
  }
}
