package graft.sources

import graft.model.ManifestSnapshot
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSM archived-timeline (V2) manifest reader (SURVEY §2.1 S6/S7).
  * Layout (reference `LSMTimelineManifestReader.java:23-38`):
  *
  *   .hoodie/timeline/history/
  *     _version_        <- single int: latest manifest version
  *     manifest_N       <- JSON {"files":[{"fileName":..., "fileLen":...}]}
  *     *.parquet        <- the archived commit batches the manifest points at
  *
  * A missing `_version_` means "no archived snapshot yet" (empty snapshot,
  * `LSMTimelineManifestReader.java:58-83`).
  */
object LsmManifestReader {

  /** Read the `_version_` marker; None when absent. */
  def latestVersion(conf: Configuration, historyUri: String): Option[Int] = {
    val path = new Path(s"${historyUri.stripSuffix("/")}/_version_")
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }
  }

  /** Read manifest_N's file-name list with spark.read.json + explode (S6). */
  def readManifest(spark: SparkSession, historyUri: String, version: Int): ManifestSnapshot = {
    val uri = s"${historyUri.stripSuffix("/")}/manifest_$version"
    val names = spark.read
      .json(uri)
      .select(explode(col("files.fileName")).as("fileName"))
      .collect()
      .map(_.getString(0))
      .toSeq
    ManifestSnapshot(version, names)
  }

  /** Latest snapshot, or an empty version-0 snapshot when none exists. */
  def latestSnapshot(spark: SparkSession, historyUri: String): ManifestSnapshot =
    latestVersion(spark.sparkContext.hadoopConfiguration, historyUri) match {
      case Some(v) => readManifest(spark, historyUri, v)
      case None    => ManifestSnapshot(0, Nil)
    }

  /** V2 incremental diff (SURVEY §2.7 J1): files in `current` but not in
    * `previous` — the anti-join that drives the archived mirror — plus the
    * ordered trailer (manifest_N then _version_) appended by the sink (T5).
    */
  def newFiles(spark: SparkSession, current: ManifestSnapshot,
      previous: ManifestSnapshot): Seq[String] = {
    import spark.implicits._
    if (previous.parquetFileNames.isEmpty) current.parquetFileNames
    else {
      val cur = spark.createDataset(current.parquetFileNames).toDF("fileName")
      val prev = spark.createDataset(previous.parquetFileNames).toDF("fileName")
      cur.join(prev, Seq("fileName"), "left_anti")
        .as[String].collect().toSeq.sorted
    }
  }
}
