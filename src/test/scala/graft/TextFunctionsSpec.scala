package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the shared text expression builders: Spark's
  * sequence(1, 0) is [1, 0] (descending, NOT empty like DuckDB's
  * generate_series), so n-gram builders need explicit empty branches; and
  * the PII scrub must hit phone/email/URL/IP shapes without corrupting
  * dates or decimals.
  */
class TextFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("shingle hashes are empty (not a crash) for docs under 3 tokens") {
    import spark.implicits._
    val sizes = Seq("one", "hello world", "a b c", "a b c d")
      .toDF("text")
      .withColumn("t", expr(tokensS("text")))
      .withColumn("th", expr(tokenHashesS("t")))
      .select(expr(s"size(${shingleHashesS("th")})"))
      .collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(0, 0, 1, 2))
  }

  test("scrub redacts PII shapes") {
    import spark.implicits._
    val out = Seq(
      "contact john@example.com via https://x.io/p?q=1 now",
      "call (555) 123-4567 or +1 555 123 4567 from 10.0.0.1")
      .toDF("text").select(expr(scrubS("text")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out(0) == "contact [EMAIL] via [URL] now")
    assert(out(1) == "call [PHONE] or [PHONE] from [IP]")
  }

  test("scrub leaves dates, decimals, and version strings untouched") {
    import spark.implicits._
    val text = "released on 2024-07-23, pi is 3.14159265, build 1.2.3-rc4 ok"
    val out = Seq(text).toDF("text").select(expr(scrubS("text")).as("s"))
      .collect().head.getString(0)
    assert(out == text)
  }
}
