package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch estimates are checked two ways: the registry queries now carry
  * their accuracy contract in-band (`within_1pct` / `within_5pct` booleans
  * the DuckDB oracle hash-checks), and this spec asserts (a) those booleans
  * are true for every row and (b) the raw estimates — recomputed standalone,
  * since the oracled outputs only expose the bound — actually sit within the
  * documented error of the exact values (±1% GK percentiles, ±5% HLL
  * distinct counts).
  */
class ApproxAccuracySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("rel_percentiles_approx: in-band bound holds and estimates are within 1%") {
    val rows = SparkEntry.queries("rel_percentiles_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_1pct"), s"bound violated in row $r")
    }
    val both = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("a90"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val flag = r.getString(0)
      val (a50, a90) = (r.getDouble(1), r.getDouble(2))
      val (e50, e90) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - e50) / e50 <= 0.01,
        f"$flag p50: approx=$a50%.2f exact=$e50%.2f")
      assert(math.abs(a90 - e90) / e90 <= 0.01,
        f"$flag p90: approx=$a90%.2f exact=$e90%.2f")
    }
  }

  test("evt_approx_users_by_type: in-band bound holds and estimates are within 5%") {
    val rows = SparkEntry.queries("evt_approx_users_by_type")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"), s"bound violated in row $r")
    }
    val both = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (tpe, ap, ex) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ex > 0)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 0.05,
        f"$tpe: approx=$ap exact=$ex relErr=$relErr%.4f exceeds 5%%")
    }
  }
}
