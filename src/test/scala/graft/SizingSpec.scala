package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Input-derived session sizing: byte totals resolve through the Hadoop
  * FileSystem of the path's scheme (the cluster form — probed over the
  * mock object store), the derived shuffle-partition count floors at the
  * core count and caps at [[Sizing.MaxDerivedPartitions]].
  */
class SizingSpec extends AnyFunSuite {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p)

  test("inputBytes resolves scheme'd paths through the Hadoop FileSystem") {
    val conf = new Configuration()
    conf.set("fs.mocks3.impl", classOf[MockObjectStoreFs].getName)
    val root = new Path("mocks3://sizing-bucket/corpus")
    val fs = root.getFileSystem(conf)
    val o1 = fs.create(new Path(root, "a.parquet")); o1.write(new Array[Byte](1000)); o1.close()
    val o2 = fs.create(new Path(root, "sub/b.parquet")); o2.write(new Array[Byte](234)); o2.close()
    assert(Sizing.inputBytes(root.toString, conf) == 1234L)
  }

  test("inputBytes of a local dir sums recursively; absent dir is 0") {
    val d = tmp("sizing_local")
    java.nio.file.Files.write(d.resolve("x.bin"), new Array[Byte](500))
    val sub = java.nio.file.Files.createDirectory(d.resolve("sub"))
    java.nio.file.Files.write(sub.resolve("y.bin"), new Array[Byte](250))
    assert(Sizing.inputBytes(d.toString) == 750L)
    assert(Sizing.inputBytes(d.resolve("nope").toString) == 0L)
  }

  test("derived partition count: core floor, bytes/8MiB growth, 64k cap") {
    // small input floors at the core count
    val small = tmp("sizing_small")
    java.nio.file.Files.write(small.resolve("t.parquet"), new Array[Byte](100))
    assert(Sizing.shufflePartitions(small.toString, 16) == 16)
    // sparse files carry length without disk usage — the rule reads length
    val big = tmp("sizing_big")
    val raf = new java.io.RandomAccessFile(big.resolve("t.parquet").toFile, "rw")
    raf.setLength(170L << 20) // 170 MiB -> ceil(170/8) = 22 partitions
    raf.close()
    assert(Sizing.shufflePartitions(big.toString, 4) == 22)
    // a petabyte-class dir caps at MaxDerivedPartitions
    val huge = tmp("sizing_huge")
    val raf2 = new java.io.RandomAccessFile(huge.resolve("t.parquet").toFile, "rw")
    raf2.setLength(600L << 30) // 600 GiB -> 76,800 uncapped
    raf2.close()
    assert(Sizing.shufflePartitions(huge.toString, 4) == Sizing.MaxDerivedPartitions)
  }

  test("Tables.spread: under-split inputs spread, well-split inputs skip the exchange") {
    val spark = SparkSpec.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def hasExchange(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Exchange")
    // a sub-MB file estimates to 0 splits -> the parallelism exchange applies
    assert(hasExchange(Tables.spread(docs, "doc_id")),
      "small input must be repartitioned for parallelism")
    // force the estimate over the core count: with 1 KiB max split size the
    // same file estimates to hundreds of splits -> the corpus-wide Exchange
    // must disappear (the 100 TB plan shape)
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      assert(!hasExchange(Tables.spread(docs, "doc_id")),
        "well-split input must not pay a corpus-wide repartition")
      // r12 (the r11 ADVICE item): a FILTERED frame must keep the exchange
      // even when the underlying table estimates "big" — without CBO the
      // Filter passes its child's sizeInBytes through, so the skip gate
      // would otherwise starve a tiny compute-heavy slice of parallelism
      import org.apache.spark.sql.functions.col
      assert(hasExchange(Tables.spread(docs.filter(col("doc_id") < 5), "doc_id")),
        "filtered frame must keep the parallelism exchange")
    } finally spark.conf.set(key, old)
  }
}
