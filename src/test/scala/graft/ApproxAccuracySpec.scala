package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL estimate itself is checked, not just its row count:
  * `evt_approx_users_by_type` (rsd 0.02, no DuckDB oracle — Spark and DuckDB
  * HLL implementations estimate differently) must sit within ±5% of the
  * exact distinct count per event type.
  */
class ApproxAccuracySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("evt_approx_users_by_type is within 5% of exact per type") {
    val approx = SparkEntry.queries("evt_approx_users_by_type")(spark, sf)
      .select(col("event_type"), col("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    assert(exact.values.forall(_ > 0))
    exact.foreach { case (tpe, ex) =>
      val ap = approx(tpe)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 0.05,
        f"$tpe: approx=$ap exact=$ex relErr=$relErr%.4f exceeds 5%%")
    }
  }
}
