package graft

import org.scalatest.funsuite.AnyFunSuite

/** The EVAL sampling stride resolves PER RUN from the current corpus-dir
  * hint — a long-lived session serving two corpora of different sizes gets
  * each corpus's own stride (the round-10 form froze the first corpus's
  * value at object init) — and the row-count hint reads BOTH embeddings
  * layouts (single file and Spark directory output).
  */
class EvalStrideSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def corpusWithRows(n: Int): String = {
    val d = java.nio.file.Files.createTempDirectory(s"stride_corpus_$n")
    import spark.implicits._
    // standard Spark DIRECTORY layout (part files under embeddings.parquet/)
    // — the layout the round-10 single-file footer read silently missed
    (0 until n).map(_.toLong).toDF("vec_id")
      .repartition(2)
      .write.parquet(s"$d/embeddings.parquet")
    d.toString
  }

  test("stride follows the CURRENT corpus hint, directory layout included") {
    val big = corpusWithRows(20000)   // 20000/8 = 2500 <= 4096 -> stride 8
    val small = corpusWithRows(100)   // under threshold -> stride 1
    val saved = sys.props.get("graft.sf.dir")
    try {
      System.setProperty("graft.sf.dir", big)
      assert(graft.analytics.DedupQueries.EvalStride == 8)
      // switching corpora MID-SESSION re-resolves (the round-10 footgun)
      System.setProperty("graft.sf.dir", small)
      assert(graft.analytics.DedupQueries.EvalStride == 1)
      // and back — memoized per dir, stable within a run
      System.setProperty("graft.sf.dir", big)
      assert(graft.analytics.DedupQueries.EvalStride == 8)
    } finally {
      saved match {
        case Some(v) => System.setProperty("graft.sf.dir", v)
        case None => System.clearProperty("graft.sf.dir")
      }
    }
  }

  test("unresolvable hint keeps stride 1 (and the guard off, loudly)") {
    val saved = sys.props.get("graft.sf.dir")
    try {
      System.setProperty("graft.sf.dir", "/nonexistent/corpus")
      assert(graft.analytics.DedupQueries.EvalStride == 1)
    } finally {
      saved match {
        case Some(v) => System.setProperty("graft.sf.dir", v)
        case None => System.clearProperty("graft.sf.dir")
      }
    }
  }
}
