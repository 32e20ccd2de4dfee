package graft.sources

import java.sql.Timestamp

import graft.model.FileEntry
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Object-store listing source (SURVEY §2.1 S1-S4) over the Hadoop
  * FileSystem API — one code path for file://, hdfs://, s3a://, gs://,
  * abfss:// instead of the reference's three cloud SDK clients
  * (`storage/S3AsyncStorageClient.java:48-115` et al).
  *
  * Semantics normalized across stores (the reference's Azure client ignores
  * `startAfter` server-side, `storage/AzureAsyncStorageClient.java:48-113`;
  * we apply it uniformly as a post-filter, which is the same relational
  * contract: `filename > startAfter`):
  *   - one level per call (delimiter="/" behavior);
  *   - `prefix` filters by filename prefix;
  *   - `startAfter` keeps strictly-greater filenames (seek/resume key);
  *   - filenames are returned relative to the listed directory
  *     (prefix-stripped, like the reference's File model).
  *
  * At scale the fan-out happens in [[listDirs]]: directories are distributed
  * across executors and each task drains its directory's pages through the
  * store's own iterator — the driver never holds more than the collected
  * survivors of one BFS level.
  */
object FsListing {

  /** List one directory on the driver. Page drains ride the T6 retry policy
    * so a one-off store fault re-lists the directory instead of failing the
    * table (reference wraps every storage call,
    * `AsyncHttpClientWithRetry.java:41-129`).
    */
  def listDir(
      conf: Configuration,
      dirUri: String,
      prefix: String = "",
      startAfter: String = ""): Seq[FileEntry] = graft.operators.Retry.storageIO {
    val path = new Path(dirUri)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Nil
    else {
      val it = fs.listStatusIterator(path)
      val out = Seq.newBuilder[FileEntry]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if ((prefix.isEmpty || name.startsWith(prefix)) &&
          (startAfter.isEmpty || name > startAfter)) {
          out += FileEntry(name, new Timestamp(st.getModificationTime), st.isDirectory)
        }
      }
      out.result()
    }
  }

  /** Distributed listing of many directories: one task per partition of the
    * directory list; emits (dirUri, entry) pairs. Executors talk straight to
    * the store — no listing bytes flow through the driver.
    */
  def listDirs(spark: SparkSession, dirUris: Seq[String]): Dataset[(String, FileEntry)] = {
    import spark.implicits._
    val hadoopConf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val parallelism = math.max(1, math.min(dirUris.size, 64))
    spark.createDataset(dirUris)
      .repartition(parallelism)
      .mapPartitions { dirs =>
        val conf = hadoopConf.value
        dirs.flatMap(d => listDir(conf, d).map(d -> _))
      }
  }
}

/** Minimal serializable Hadoop-conf wrapper (Spark's own is private). */
final class SerializableConfiguration(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
