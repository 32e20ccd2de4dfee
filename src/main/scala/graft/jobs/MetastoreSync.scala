package graft.jobs

import graft.functions.InstantFunctions._
import graft.model.{HudiProperties, HudiTable}
import graft.sources.FsListing
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Post-sync metastore hook (§3.2 lifecycle parity): the reference chains a
  * Glue/Hive catalog sync after each lakeview sync so the synced table is
  * queryable by name (lakeview-sync-tool/src/main/java/ai/onehouse/lakeview/
  * sync/LakeviewGlueSyncTool.java:9, LakeviewHiveSyncTool.java:9). Callers
  * plug an implementation into [[LakeViewSync.SyncConfig.metastore]]; it is
  * invoked once per successfully mirrored table, inside the table's failure
  * isolation (a hook failure fails that table, not the run).
  */
trait MetastoreSync {

  /** Register `table` (mirrored under `mirroredTableDir`) with a catalog. */
  def register(spark: SparkSession, table: HudiTable, props: HudiProperties,
      mirroredTableDir: String): Unit
}

/** The sandbox-honest catalog: registers each mirrored table's timeline in
  * the local Spark catalog as `<database>.<tableName>_timeline`. The mirrored
  * active + archived listings are parsed into instant columns and written as
  * a parquet table under `<mirroredTableDir>/_catalog`, then registered as an
  * external table — after `runOnce`, `spark.sql` can query any mirrored
  * table's history by name, which is exactly what the Glue/Hive chaining
  * buys the reference's users.
  */
final class SparkCatalogSync(database: String = "lakeview") extends MetastoreSync {

  private def sanitize(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9_]", "_")

  override def register(spark: SparkSession, table: HudiTable,
      props: HudiProperties, mirroredTableDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    val entries = Seq("active", "archived").flatMap { sub =>
      FsListing.listDir(conf, s"${mirroredTableDir.stripSuffix("/")}/$sub")
        .filter(!_.isDirectory)
        .map(f => (sub, f.filename, f.lastModifiedAt))
    }
    val df = entries.toDF("timeline", "filename", "last_modified_at")
      .withColumn("is_instant", isActiveInstantFile(col("filename")))
      .withColumn("ts", when(col("is_instant"), instantTs(col("filename"))))
      .withColumn("completion_ts",
        when(col("is_instant"), instantCompletionTs(col("filename"))))
      .withColumn("action", when(col("is_instant"), instantAction(col("filename"))))
      .withColumn("state", when(col("is_instant"), instantState(col("filename"))))
    val catalogDir = new Path(s"${mirroredTableDir.stripSuffix("/")}/_catalog")
    val loc = catalogDir.getFileSystem(conf).makeQualified(catalogDir).toString
    // timeline metadata is KB-scale per table: one file
    df.coalesce(1).write.mode("overwrite").parquet(loc)
    val name = s"`$database`.`${sanitize(props.tableName)}_timeline`"
    // DDL serialized per hook instance: tables in a batch register from
    // parallel threads and the in-memory catalog's create is not atomic
    synchronized {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$loc'")
      spark.sql(s"REFRESH TABLE $name")
    }
  }
}
