package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-task BPE merge tier bit-equal to the distributed rounds
  * (round 12): same pair counts, same `cnt DESC, a, b` argmax tie-break
  * (UTF-8 binary order), same greedy left-to-right non-overlapping fold,
  * same corpus-symbol trajectory — on a deterministic pseudo-random
  * vocabulary crafted to force count ties and repeated-symbol merges.
  */
class BpeLocalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Deterministic vocabulary with heavy shared substructure (ties) and
    * runs of repeated characters (the aa+a non-overlap case).
    */
  private def vocab(): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    (1 to 400).map { i =>
      val len = 1 + rnd.nextInt(8)
      val w = (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (w, 1L + rnd.nextInt(5).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
  }

  test("local loop == distributed rounds on a random vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v = vocab()
    val w0 = v.toDF("wd", "n")
      .withColumn("syms",
        expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))"))
      .persist()
    val (mergedDf, distStats) = analytics.TextQueries.bpeMergeRounds(w0, 4)
    val distNp = mergedDf.select(col("wd"), size(col("syms")).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val words = v.sortBy(_._1).toArray
    val (locStats, locNps) = analytics.TextQueries.bpeLocalLoop(words, 4)
    val locNp = words.map(_._1).zip(locNps).toMap

    assert(locStats == distStats,
      s"round stats diverge:\nlocal  $locStats\ndist   $distStats")
    assert(locNp == distNp, "final per-word piece counts diverge")
    w0.unpersist()
  }

  test("greedy fold is non-overlapping (aaa + merge (a,a) -> [aa, a])") {
    val (stats, nps) = analytics.TextQueries.bpeLocalLoop(
      Array(("aaa", 10L), ("aa", 1L)), 1)
    assert(stats.head._2 == "a" && stats.head._3 == "a")
    // "aaa" -> [aa, a] (2 pieces), "aa" -> [aa] (1 piece)
    assert(nps.toSeq == Seq(2L, 1L), s"got ${nps.toSeq}")
  }

  test("utf8Lt matches Spark StringType ordering on supplementary chars") {
    // U+FFFD (efbfbd in UTF-8) vs U+10400 (f0908090): UTF-16 compareTo
    // would order the surrogate pair FIRST; UTF-8 binary orders it AFTER.
    val bmp = "�"
    val supp = new String(Character.toChars(0x10400))
    assert(analytics.TextQueries.utf8Lt(bmp, supp))
    assert(bmp.compareTo(supp) > 0, "sanity: UTF-16 order differs")
  }
}
