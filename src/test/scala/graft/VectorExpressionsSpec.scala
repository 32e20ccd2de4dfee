package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity guard: each native codegen expression must be bit-identical to its
  * declarative HOF form (which is what the DuckDB oracle mirrors). Runs over
  * real sf0.001 data so array shapes/edge lengths come from the actual
  * corpus.
  */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSpec.spark
    graft.functions.VectorExpressions.register(s)
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def docsTh = Tables.t(spark, sf, "documents")
    .withColumn("t", expr(tokensS("text")))
    .withColumn("th", expr(tokenHashesS("t")))

  test("shingle3_hash matches the HOF shingle form") {
    val diff = docsTh
      .withColumn("a", expr("shingle3_hash(th)"))
      .withColumn("b", expr(shingleHashesS("th")))
      .filter(expr("a != b"))
      .count()
    assert(diff == 0)
  }

  test("minhash16 matches the HOF minhash signature") {
    val diff = docsTh
      .withColumn("hs", expr("array_distinct(shingle3_hash(th))"))
      .withColumn("a", expr("minhash16(hs)"))
      .withColumn("b", expr(minhashSigS("hs")))
      .filter(expr("a != b"))
      .count()
    assert(diff == 0)
  }

  test("simhash32 matches the two-step HOF form") {
    val diff = docsTh
      .withColumn("bs", expr(simhashBitsS("th")))
      .withColumn("a", expr("simhash32(th)"))
      .withColumn("b", expr(simhashFromBitsS("bs")))
      .filter(expr("a != b"))
      .count()
    assert(diff == 0)
  }

  test("long_dot and long_l2 match HOF folds on quantized embeddings") {
    val e = Tables.t(spark, sf, "embeddings")
      .withColumn("qe", expr(quantizeS("embedding")))
      .withColumn("qr", expr("reverse(qe)"))
    val diff = e
      .withColumn("d1", expr("long_dot(qe, qr)"))
      .withColumn("d2", expr(dotS("qe", "qr")))
      .withColumn("l1", expr("long_l2(qe, qr)"))
      .withColumn("l2", expr(
        "aggregate(zip_with(qe, qr, (x, y) -> (x - y) * (x - y)), cast(0 as bigint), (a, v) -> a + v)"))
      .filter(expr("d1 != d2 OR l1 != l2"))
      .count()
    assert(diff == 0)
  }

  test("hyperplane_key6 matches the HOF hyperplane fold") {
    val e = Tables.t(spark, sf, "embeddings")
      .withColumn("qe", expr(quantizeS("embedding")))
    val hof = s"aggregate(sequence(0, 5), cast(0 as bigint), (acc, i) -> acc + " +
      s"if(aggregate(sequence(1, size(qe)), cast(0 as bigint), " +
      s"(s2, j) -> s2 + (((i * 37 + j * 101) % 19) - 9) * element_at(qe, j)) > 0, " +
      s"shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"
    val diff = e
      .withColumn("a", expr("hyperplane_key6(qe)"))
      .withColumn("b", expr(hof))
      .filter(expr("a != b"))
      .count()
    assert(diff == 0)
  }
}
