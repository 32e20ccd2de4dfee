package graft

import org.scalatest.funsuite.AnyFunSuite

/** evt_kmv_overlap semantics: below the sketch size the KMV estimates are
  * EXACT (the sketch holds the whole hash set), entities are (user, day)
  * pairs, and disjoint types report zero intersection.
  */
class KmvOverlapSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("sub-k sketches are exact; user-day entities; disjoint types at zero") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmv").toString
    val d1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val d2 = java.sql.Timestamp.valueOf("2024-01-02 10:00:00")
    // x: users 1..10 on day 1 plus user 1 again on day 2 -> 11 user-days
    // y: users 6..15 on day 1 -> 10 user-days, overlap with x = 5
    // z: users 21..30 on day 1 -> disjoint from both
    val rows =
      (1 to 10).map(u => ("x", u.toLong, d1)) ++ Seq(("x", 1L, d2)) ++
        (6 to 15).map(u => ("y", u.toLong, d1)) ++
        (21 to 30).map(u => ("z", u.toLong, d1))
    rows.toDF("event_type", "user_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val got = SparkEntry.queries("evt_kmv_overlap")(spark, tmp)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    graft.CacheTracker.releaseAll()

    assert(got.size == 3, s"got $got")
    // exact == estimate everywhere: every sketch holds its full set (n < k)
    assert(got(("x", "y")) == ((16L, 5L, 16L, 5L, 5L * 1000000L / 16L)), s"got $got")
    assert(got(("x", "z")) == ((21L, 0L, 21L, 0L, 0L)), s"got $got")
    assert(got(("y", "z")) == ((20L, 0L, 20L, 0L, 0L)), s"got $got")
  }

  test("mergeability: K(A union B) == k-smallest of K(A) union K(B)") {
    // the property the query's pair stage RELIES on — sketches built on two
    // shards merge into exactly the sketch of the union, no re-scan —
    // checked in plain Scala with the engine's triple-iterated Lehmer hash
    val MP = 2147483647L
    def h(ent: Long): Long = {
      var x = ent
      for (_ <- 1 to 3) x = (48271L * x + 11) % MP
      x
    }
    val k = 64
    val a = (0L until 500L).map(_ * 7919L).toSet
    val b = (0L until 500L).map(_ * 104729L + 3L).toSet
    def sketch(s: Set[Long]): Vector[Long] =
      s.map(h).toVector.distinct.sorted.take(k)
    val mergedFromSketches =
      (sketch(a) ++ sketch(b)).distinct.sorted.take(k)
    assert(mergedFromSketches == sketch(a ++ b))
  }
}
