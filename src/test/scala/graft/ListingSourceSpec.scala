package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 listing source: schema, multi-dir partitions, filter pushdown
  * (prefix + startAfter reach the scan), column pruning, and parity with the
  * driver-side lister.
  */
class ListingSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val root = "target/tmp/listing-fixture"

  private def mkFixture(): String = {
    val r = Paths.get(root)
    if (Files.exists(r)) {
      import scala.jdk.CollectionConverters._
      Files.walk(r).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    for (d <- Seq("t1", "t2"); f <- Seq("100.commit", "200.commit", "300.clean", "hoodie.properties"))
      { val p = Paths.get(s"$root/$d/$f"); Files.createDirectories(p.getParent); Files.writeString(p, "") }
    Files.createDirectories(Paths.get(s"$root/t1/subdir"))
    s"file:///${Paths.get(root).toAbsolutePath.toString.stripPrefix("/")}"
  }

  test("reads multiple dirs as one table, one partition each") {
    val base = mkFixture()
    val df = spark.read.format("graft-listing")
      .option("dirs", s"$base/t1,$base/t2").load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("dir", "filename", "lastModifiedAt", "isDirectory"))
    assert(df.count() == 9) // 4 files x 2 dirs + 1 subdir
    assert(df.rdd.getNumPartitions == 2)
    assert(df.filter(col("isDirectory")).count() == 1)
  }

  test("startAfter and prefix filters are pushed into the scan") {
    val base = mkFixture()
    val df = spark.read.format("graft-listing")
      .option("dirs", s"$base/t1").load()
      .filter(col("filename") > "100.commit" && col("filename").startsWith("2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-listing prefix='2' startAfter='100.commit'"),
      s"pushdown missing in plan:\n$plan")
    assert(df.collect().map(_.getAs[String]("filename")).toSeq == Seq("200.commit"))
  }

  test("column pruning reaches the reader") {
    val base = mkFixture()
    val df = spark.read.format("graft-listing")
      .option("dirs", s"$base/t1").load()
      .select("filename")
    assert(df.schema.fieldNames.toSeq == Seq("filename"))
    assert(df.collect().map(_.getString(0)).sorted.head == "100.commit")
  }

  test("parity with the driver-side lister") {
    val base = mkFixture()
    val viaSource = spark.read.format("graft-listing")
      .option("dirs", s"$base/t2").load()
      .select("filename", "isDirectory")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1).toSeq
    val direct = graft.sources.FsListing
      .listDir(spark.sparkContext.hadoopConfiguration, s"$base/t2")
      .map(f => (f.filename, f.isDirectory)).sortBy(_._1)
    assert(viaSource == direct)
  }
}
