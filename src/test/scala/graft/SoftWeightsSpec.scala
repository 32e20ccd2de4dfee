package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_soft_weights semantics: every near-dup cluster member keeps weight
  * 1e6 div cluster_size, singletons keep full weight, and the per-source
  * rollup reports exact effective corpus size in micro-docs.
  */
class SoftWeightsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("cluster members split one doc's weight; singletons keep full weight") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("softw").toString
    // source A: a 3-clique of identical docs + one unique doc;
    // source B: a 2-clique + one unique doc. Token sets are disjoint across
    // cliques so components never bridge sources.
    val tripleA = "alpha beta gamma delta epsilon zeta eta theta"
    val doubleB = "omega psi chi phi upsilon tau sigma rho"
    val rows = Seq(
      (0L, "A", tripleA), (1L, "A", tripleA), (2L, "A", tripleA),
      (3L, "A", "uniq1 uniq2 uniq3 uniq4 uniq5 uniq6"),
      (10L, "B", doubleB), (11L, "B", doubleB),
      (12L, "B", "lone1 lone2 lone3 lone4 lone5 lone6"))
    rows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("dedup_soft_weights")(spark, tmp)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.CacheTracker.releaseAll()

    assert(got.length == 2, s"got ${got.toSeq}")
    val bys = got.map(t => t._1 -> t).toMap
    // A: 3-cluster at 333333 micro each (integer div) + 1 singleton
    assert(bys("A") == ("A", 4L, 3L, 3L * 333333L + 1000000L), s"got ${got.toSeq}")
    // B: 2-cluster at exactly half weight + 1 singleton
    assert(bys("B") == ("B", 3L, 2L, 2L * 500000L + 1000000L), s"got ${got.toSeq}")
  }
}
