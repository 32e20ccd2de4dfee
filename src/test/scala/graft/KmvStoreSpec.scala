package graft

import graft.operators.KmvStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent KMV sketch tier: per-(type, day) stored slices merge at
  * read time into EXACTLY the sketch a from-scratch pass would build
  * (mergeability made load-bearing), batch appends replay idempotently,
  * and day-slice retention / rebuild work without corpus-sized passes.
  */
class KmvStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  /** From-scratch per-type sketch, the way evt_kmv_overlap builds it. */
  private def fromScratch(events: org.apache.spark.sql.DataFrame)
      : Map[String, Vector[Long]] = {
    val MP = graft.functions.TextFunctions.MP
    events.select(col("event_type"),
        (col("user_id") * 65536L +
          datediff(col("ts").cast("date"), lit("1970-01-01"))).as("ent"))
      .distinct()
      .withColumn("h", expr(s"(48271L * ((48271L * ((48271L * ent + 11) % ${MP}L) " +
        s"+ 11) % ${MP}L) + 11) % ${MP}L"))
      .select("event_type", "h").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).toVector.sorted.take(KmvStore.K)).toMap
  }

  private def stored(path: String): Map[String, Vector[Long]] =
    KmvStore.typeSketches(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector.sorted).toMap

  test("store-merged type sketches == from-scratch sketches (flat build)") {
    val path = tmp("kmv_flat")
    KmvStore.build(spark, sf, path)
    assert(stored(path) == fromScratch(Tables.t(spark, sf, "events")))
  }

  test("batch-driven store: arbitrary event splits + replay == one build") {
    val path = tmp("kmv_batched")
    val ev = Tables.t(spark, sf, "events")
    // split WITHIN days (user parity), so (type, day) slices span batches
    // and the read-side merge does real mergeability work
    KmvStore.appendBatch(ev.filter(col("user_id") % 2 === 0), path, 0L)
    KmvStore.appendBatch(ev.filter(col("user_id") % 2 === 1), path, 1L)
    // replay batch 1: rewrites its own partition, no duplication
    KmvStore.appendBatch(ev.filter(col("user_id") % 2 === 1), path, 1L)
    assert(stored(path) == fromScratch(ev))
  }

  test("day retention drops slices; rebuildDays re-sketches post-takedown") {
    val path = tmp("kmv_days")
    val ev = Tables.t(spark, sf, "events")
    KmvStore.appendBatch(ev, path, 0L)
    val someDay = KmvStore.rows(spark, path)
      .agg(min(col("day"))).collect()(0).getInt(0)
    import spark.implicits._
    KmvStore.deleteDays(spark, path, Seq(someDay).toDF("day"))
    assert(KmvStore.rows(spark, path).filter(col("day") === someDay).isEmpty)
    // == from-scratch over events excluding that day
    val evRest = ev.filter(
      datediff(col("ts").cast("date"), lit("1970-01-01")) =!= someDay)
    assert(stored(path) == fromScratch(evRest))
    // user takedown: drop the user's events, rebuild exactly their days
    val victim = ev.agg(min(col("user_id"))).collect()(0).getLong(0)
    val surviving = ev.filter(col("user_id") =!= victim &&
      datediff(col("ts").cast("date"), lit("1970-01-01")) =!= someDay)
    val victimDays = ev.filter(col("user_id") === victim)
      .select(datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"))
      .distinct().filter(col("day") =!= someDay)
    KmvStore.rebuildDays(surviving, path, victimDays, 99L)
    assert(stored(path) == fromScratch(surviving))
  }

  test("rebuildDays is staged: a crash between append and delete loses no " +
      "slices, and a re-run with the same batch id converges") {
    val path = tmp("kmv_crash")
    val ev = Tables.t(spark, sf, "events")
    KmvStore.appendBatch(ev, path, 0L)
    val victim = ev.agg(min(col("user_id"))).collect()(0).getLong(0)
    val surviving = ev.filter(col("user_id") =!= victim)
    val victimDays = ev.filter(col("user_id") === victim)
      .select(datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"))
      .distinct()
    // simulate the crash: the staged FIRST half only (rebuilt slices land
    // under the new batch partition; the stale rows were never dropped)
    import org.apache.spark.sql.functions.broadcast
    KmvStore.appendBatch(
      surviving.join(broadcast(victimDays),
        datediff(col("ts").cast("date"), lit("1970-01-01")) === col("day"))
        .drop("day"),
      path, 7L)
    // mid-crash reads still cover every day (stale-but-complete): the
    // affected days' sketches answer — the victim's entries are still
    // visible, but no slice is LOST
    val days = KmvStore.rows(spark, path).select("day").distinct().count()
    assert(days == ev.select(
      datediff(col("ts").cast("date"), lit("1970-01-01"))).distinct().count())
    // re-run with the SAME batch id completes the rebuild
    KmvStore.rebuildDays(surviving, path, victimDays, 7L)
    assert(stored(path) == fromScratch(surviving))
  }

  test("rebuildDays refuses a reused batch id holding other days' slices") {
    val path = tmp("kmv_reuse")
    val ev = Tables.t(spark, sf, "events")
    KmvStore.appendBatch(ev, path, 0L)
    val d = KmvStore.rows(spark, path)
      .agg(min(col("day"))).collect()(0).getInt(0)
    import spark.implicits._
    // batch 0 holds every day's slices — rebuilding only day d under
    // batch 0 would wipe the rest of the partition
    val e = intercept[IllegalArgumentException] {
      KmvStore.rebuildDays(ev, path, Seq(d).toDF("day"), 0L)
    }
    assert(e.getMessage.contains("fresh batch id"))
  }
}
