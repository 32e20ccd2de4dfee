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

  test("rel_percentiles_approx is within 1% of the exact percentiles per flag") {
    val approx = SparkEntry.queries("rel_percentiles_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (flag, (e50, e90)) =>
      val (a50, a90) = approx(flag)
      assert(math.abs(a50 - e50) / e50 <= 0.01,
        f"$flag p50: approx=$a50%.2f exact=$e50%.2f")
      assert(math.abs(a90 - e90) / e90 <= 0.01,
        f"$flag p90: approx=$a90%.2f exact=$e90%.2f")
    }
  }

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
