package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two claims the round-9 LM-filter additions make:
  *
  *  1. txt_ccnet_buckets really is a per-language tercile split: within
  *     every language the buckets are ordered by cross-entropy
  *     (max(head) <= min(middle) <= ... — equality only possible on tied
  *     scores, which the doc_id tiebreak assigns deterministically) and
  *     the three bucket sizes differ by at most one;
  *  2. txt_kn_perplexity's pre-aggregated hot/cold-split pipeline equals
  *     the naive per-INSTANCE form (explode every bigram occurrence, join
  *     the full cost table, average) — the equivalence that makes the
  *     scale shape a pure optimization.
  */
class CcnetKnSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("ccnet buckets: ordered terciles of near-equal size per language") {
    val rows = graft.analytics.TextQueries.all("txt_ccnet_buckets")
      .fn(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).toSet.subsetOf(Set("head", "middle", "tail")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val sizes = Seq("head", "middle", "tail").map(b =>
        byBucket.getOrElse(b, Array.empty[Long]).length)
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      for (Seq(lo, hi) <- Seq("head", "middle", "tail").sliding(2)
           if byBucket.contains(lo) && byBucket.contains(hi)) {
        assert(byBucket(lo).max <= byBucket(hi).min,
          s"$lang: $lo max ${byBucket(lo).max} > $hi min ${byBucket(hi).min}")
      }
    }
  }

  test("KN perplexity: split pipeline equals the naive per-instance form") {
    import graft.functions.TextFunctions.tokensS
    val docs = Tables.t(spark, sf, "documents")
    // naive: one row per bigram INSTANCE, full cost join, no pre-agg/split
    val inst = docs
      .withColumn("t", expr(tokensS("text")))
      .select(col("doc_id"), explode(expr(
        "if(size(t) < 2, cast(array() as array<string>), " +
          "transform(sequence(1, size(t) - 1), " +
          "j -> concat(element_at(t, j), ' ', element_at(t, j + 1))))")).as("b"))
    val sp = inst.groupBy(col("b")).agg(count(lit(1)).cast("bigint").as("cb"))
      .withColumn("w1", expr("substring_index(b, ' ', 1)"))
      .withColumn("w2", expr("substring_index(b, ' ', -1)"))
    val c1 = sp.groupBy(col("w1"))
      .agg(sum(col("cb")).cast("bigint").as("c1"), count(lit(1)).as("n1a"))
    val c2 = sp.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val tt = sp.agg(count(lit(1)).as("t"))
    val cost = sp.join(c1, Seq("w1")).join(c2, Seq("w2")).crossJoin(broadcast(tt))
      .select(col("b"),
        expr("cast(floor(ln(cast(4 * c1 as double) * cast(t as double) / " +
          "cast(greatest(4 * cb - 3, cast(0 as bigint)) * t + 3 * n1a * n1b as double)) " +
          "* 1e6) as bigint)").as("cm"))
    val naive = inst.join(cost, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_bigram"),
        sum(col("cm")).cast("bigint").as("sc"))
      .select(col("doc_id"), col("n_bigram"), expr("sc div n_bigram").as("kn_micro"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(naive.nonEmpty)

    val got = graft.analytics.TextQueries.all("txt_kn_perplexity")
      .fn(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    CacheTracker.releaseAll()
    assert(got == naive, "split/pre-agg pipeline diverged from naive form")
  }

  test("KN continuation mass: diverse-context tokens score cheaper") {
    // the Kneser-Ney property in controlled isolation (famously:
    // 'francisco' is frequent but only ever follows 'san', so its
    // CONTINUATION probability is tiny). Docs 1 and 2 are structurally
    // identical — same bigram counts, same left-context counts, same
    // follower diversity on the left tokens — except that doc 2's second
    // token `t` also appears after two other contexts (docs 3/4), while
    // doc 1's `v` only ever follows `u`. Every KN term is then equal
    // EXCEPT N1+(.t) = 3 vs N1+(.v) = 1, so doc 2 must score strictly
    // cheaper, and only through the continuation-mass term.
    import spark.implicits._
    val docs = Seq(
      (1L, "u v u v"),
      (2L, "s t s t"),
      (3L, "p t"),
      (4L, "r t")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-kn").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.analytics.TextQueries.all("txt_kn_perplexity")
      .fn(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    CacheTracker.releaseAll()
    assert(out(1L) > out(2L),
      s"expected the low-diversity continuation to score worse: $out")
  }
}
