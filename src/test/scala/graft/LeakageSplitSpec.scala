package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_leakage_split semantics on a crafted corpus: the cluster-aware
  * assignment never lets a verified near-dup pair cross the train/val/test
  * boundary, the naive per-doc assignment measurably does, and both
  * strategies partition the whole corpus.
  */
class LeakageSplitSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("cluster split leaks zero pairs; naive split leaks; both partition the corpus") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    def uniq(id: Long) = (1 to 30).map(i => s"u${id}x$i").mkString(" ")
    // twins (8, 19): naive buckets val vs test -> a leaked pair; the
    // cluster rep (8) puts both in val. Twins (3, 13): naive puts both in
    // train -> not leaked even naively (leak count is measured, not "all
    // pairs"). Docs 0-5 unique: singletons keep their own bucket.
    val rows =
      Seq(8L -> base, 19L -> base, 3L -> (base + " tail3"), 13L -> (base + " tail3")) ++
        (0L to 5L).map(i => i -> uniq(i))
    val tmp = java.nio.file.Files.createTempDirectory("leaksplit").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("dedup_leakage_split")(spark, tmp)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    graft.CacheTracker.releaseAll()

    val (ct, cv, cs, cl) = got("cluster")
    val (nt, nv, ns, nl) = got("naive")
    // the guarantee: no verified near-dup pair crosses a cluster-split boundary
    assert(cl == 0L, s"cluster split leaked $cl pairs")
    // the contrast: the naive split leaks the (8, 19) pair (val vs test)
    assert(nl >= 1L, s"naive split should leak, got $nl")
    // both strategies partition the SAME corpus
    assert(ct + cv + cs == rows.size && nt + nv + ns == rows.size)
    // cluster moves docs relative to naive only within the same total
    assert((ct, cv, cs) != (0L, 0L, 0L))
  }
}
