package graft.jobs

import org.apache.spark.sql.SparkSession

/** `spark-submit` entry point (SURVEY §3.1): `-p/--path <file>` or
  * `-c/--config <yaml-string>` (mutually exclusive) and `-h/--help`,
  * matching the reference CLI (`cli_parser/CliParser.java:19-63`). The
  * loaded config's `jobRunMode` selects ONCE (sync, print the report, exit)
  * or CONTINUOUS (schedule discovery + upload polls until interrupted).
  */
object SyncCli {

  final case class CliArgs(
      configFilePath: Option[String] = None,
      configYaml: Option[String] = None,
      helpRequested: Boolean = false)

  val usage: String =
    """usage: graft.jobs.SyncCli [-p|--path <file>] [-c|--config <yaml>] [-h|--help]
      | -p,--path <file>    The file path to the configuration file
      | -c,--config <yaml>  The YAML configuration string
      | -h,--help           Display help information""".stripMargin

  /** Pure argument parse — Left(error) on misuse. */
  def parseArgs(args: Array[String]): Either[String, CliArgs] = {
    var out = CliArgs()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-h" | "--help" => out = out.copy(helpRequested = true)
        case "-p" | "--path" =>
          if (i + 1 >= args.length) return Left("Missing argument for option: p")
          out = out.copy(configFilePath = Some(args(i + 1))); i += 1
        case "-c" | "--config" =>
          if (i + 1 >= args.length) return Left("Missing argument for option: c")
          out = out.copy(configYaml = Some(args(i + 1))); i += 1
        case other => return Left(s"Unrecognized option: $other")
      }
      i += 1
    }
    if (out.configFilePath.isDefined && out.configYaml.isDefined)
      Left("Cannot specify both file path and config string.")
    else Right(out)
  }

  /** JSON-argv embedding (SURVEY §3.3 — the reference Glue wrapper's
    * contract, `lakeview-glue/.../GlueWrapperMain.java:6-19`): platforms
    * whose unit of work is "call a function with a JSON string" invoke the
    * sync as `SyncCli.runJson(spark, "[\"-c\", \"<yaml>\"]")`. Returns
    * "SUCCESS" or throws — a failed sync must fail the enclosing job, like
    * the wrapper's propagated exception. Driver-side by design: unlike the
    * reference (whose engine is Spark-free and so can run inside an
    * executor-side UDF), this engine schedules Spark jobs, which must
    * happen on the driver.
    */
  def runJson(spark: SparkSession, argJson: String): String = {
    val argv = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(argJson, classOf[Array[String]])
    if (argv == null) throw new IllegalArgumentException("argJson must be a JSON array")
    val cli = parseArgs(argv).fold(e => throw new IllegalArgumentException(e), identity)
    if (cli.helpRequested) return usage
    val loaded = (cli.configFilePath, cli.configYaml) match {
      case (Some(p), _) => ConfigLoader.loadFile(p)
      case (_, Some(y)) => ConfigLoader.loadString(y)
      case _ => throw new IllegalArgumentException("One of -p or -c is required.")
    }
    val report = loaded.jobRunMode match {
      case "ONCE_WITH_RETRY" => LakeViewSync.runOnceWithRetry(spark, loaded.sync)
      case "ONCE" => LakeViewSync.runOnce(spark, loaded.sync)
      case other => // a silently-downgraded CONTINUOUS would betray the caller
        throw new IllegalArgumentException(
          s"jobRunMode $other is not embeddable; use SyncCli.main or ContinuousSync")
    }
    if (!report.allSucceeded)
      throw new IllegalStateException(
        s"sync failed for ${report.failures.size} table(s): ${report.failures}")
    "SUCCESS"
  }

  def main(args: Array[String]): Unit = {
    parseArgs(args) match {
      case Left(err) =>
        System.err.println(err); System.err.println(usage); sys.exit(2)
      case Right(cli) if cli.helpRequested =>
        println(usage)
      case Right(cli) =>
        val loaded = (cli.configFilePath, cli.configYaml) match {
          case (Some(p), _) => ConfigLoader.loadFile(p)
          case (_, Some(y)) => ConfigLoader.loadString(y)
          case _ =>
            System.err.println("One of -p or -c is required."); System.err.println(usage)
            sys.exit(2); return
        }
        val spark = SparkSession.builder()
          .appName("graft-lakeview-sync")
          .config("spark.sql.shuffle.partitions", 32)
          .getOrCreate()
        // sinkConfig.metricsPort: Prometheus exposition for the whole run
        // (reference Main.start brings its HTTPServer up before the job)
        val metricsServer = loaded.metricsPort.map(SyncMetrics.global.serve)
        loaded.jobRunMode match {
          case "CONTINUOUS" =>
            val cs = new LakeViewSync.ContinuousSync(spark, loaded.sync, loaded.cadence)
            val scheduler = cs.start()
            scheduler.awaitTermination(Long.MaxValue, java.util.concurrent.TimeUnit.DAYS)
          case mode => // ONCE / ONCE_WITH_RETRY
            val report =
              if (mode == "ONCE_WITH_RETRY") LakeViewSync.runOnceWithRetry(spark, loaded.sync)
              else LakeViewSync.runOnce(spark, loaded.sync)
            println(s"tablesDiscovered=${report.tablesDiscovered} " +
              s"tablesSynced=${report.tablesSynced} filesMirrored=${report.filesMirrored} " +
              s"allSucceeded=${report.allSucceeded}")
            // ONCE lingers so a scraper can collect the final counters
            // (reference waitTimeBeforeShutdown, 120 s default)
            metricsServer.foreach { srv =>
              Thread.sleep(loaded.shutdownLingerSeconds * 1000L)
              srv.stop(0)
            }
            if (!report.allSucceeded) sys.exit(1)
        }
    }
  }
}
