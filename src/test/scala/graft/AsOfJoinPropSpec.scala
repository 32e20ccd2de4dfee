package graft

import graft.plans.AsOfJoin
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based correctness of the native as-of merge against the
  * window-composed declarative form on GENERATED data: random key
  * collisions, duplicate right times (ties resolve to the LAST right row
  * in (key, time, …) sort order — pinned by deduping the right side per
  * (key, time) to make the contract total), left rows before any right
  * row, and key groups on only one side. The cursor state (buffered
  * match, key-change reset, monotone advance) needs adversarial shapes to
  * break — an example spec can't cover the orderings a generator finds.
  *
  * Raw ScalaCheck generators over fixed seeds (the scalatest bridge is
  * not in the offline cache): every run checks the same 40 deterministic
  * datasets.
  */
class AsOfJoinPropSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val genLeft = Gen.listOf(for {
    k <- Gen.choose(0L, 6L)
    t <- Gen.choose(0L, 30L)
  } yield (k, t))
  private val genRight = Gen.listOf(for {
    k <- Gen.choose(0L, 8L)
    t <- Gen.choose(0L, 30L)
  } yield (k, t))

  test("native as-of equals the window-composed form on 40 generated datasets") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 40).foreach { i =>
      val seed = Seed(0xA50FL + i)
      val ls = genLeft.apply(Gen.Parameters.default.withSize(30), seed).get
      val rs = genRight.apply(Gen.Parameters.default.withSize(30), seed.next).get
      val l = ls.zipWithIndex.map { case ((k, t), id) => (id.toLong, k, t) }
        .toDF("lid", "k", "t")
      // dedup right per (key, time), keeping max rid — the same
      // determinism move the registry query makes, so the tie contract
      // ("last in sort order") is a single well-defined row
      val r = rs.zipWithIndex.map { case ((k, t), id) => (id.toLong, k, t) }
        .toDF("rid", "rk", "rt")
        .groupBy(col("rk"), col("rt")).agg(max(col("rid")).as("rid"))
      val native = AsOfJoin.join(l, r, "k", "rk", "t", "rt")
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      val ref = l.join(r, col("k") === col("rk") && col("rt") <= col("t"), "left")
        .withColumn("rn", row_number().over(Window.partitionBy(col("lid"))
          .orderBy(col("rt").desc_nulls_last)))
        .filter(col("rn") === 1)
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      assert(native == ref, s"dataset $i diverged")
    }
  }
}
