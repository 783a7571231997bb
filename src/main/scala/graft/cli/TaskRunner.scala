package graft.cli

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Command-line entrypoint mirroring the reference's per-task jar
  * invocation (reference README.md:96-145 — `hadoop jar
  * CS4433_Project1.jar <TaskClass> <inputs...> <output>`): one
  * spark-submit-able main that runs any registered query against a
  * table directory and writes a Hadoop-shaped output directory.
  *
  * {{{
  * spark-submit --class graft.cli.TaskRunner graft.jar \
  *   TaskE /data/tables /out/taskE [--format=tsv|parquet]
  * }}}
  *
  * The reference task names (TaskA..TaskH, WordCount, Pi) resolve to
  * their re-expressed queries; any `SparkEntry.queries` key also works
  * verbatim, so the CLI surface grows with the registry for free. The
  * default `tsv` format writes tab-separated `part-*` files — the same
  * shape the reference's `hdfs dfs -cat output/part-r-00000` expects —
  * and `--format=parquet` writes typed parquet instead. The output
  * directory is overwritten, automating the reference README's "remove
  * the output directory before running each job" note.
  *
  * Input paths differ from the reference by design: the reference
  * passes one CSV path per table because each Hadoop job re-declares
  * its inputs; here the single `<tableDir>` is the directory holding
  * the parquet/CSV tables and each query reads the tables it needs
  * (the S2 multi-source pattern). On a cluster this is an HDFS/S3
  * prefix; locally a filesystem path.
  */
object TaskRunner {

  /** Reference entrypoint → registered query. TaskB resolves to the
    * README-advertised top-10 variant (`taskB_counts_join` is its
    * fully-joined twin).
    */
  val taskAliases: Map[String, String] = Map(
    "TaskA"     -> "taskA_filter_project",
    "TaskB"     -> "taskB_top10",
    "TaskC"     -> "taskC_group_count",
    "TaskD"     -> "taskD_indegree_leftjoin",
    "TaskE"     -> "taskE_count_distinct",
    "TaskF"     -> "taskF_anti_join",
    "TaskG"     -> "taskG_inactive",
    "TaskH"     -> "taskH_above_avg",
    "WordCount" -> "wordcount",
    "Pi"        -> "pi_montecarlo")

  def resolve(task: String): Option[String] =
    taskAliases.get(task).orElse(Some(task).filter(SparkEntry.queries.contains))

  private def usage: String =
    s"""usage: TaskRunner <task> <tableDir> <outputDir> [--format=tsv|parquet]
       |  <task>: ${taskAliases.keys.toSeq.sorted.mkString(", ")}, or any
       |  registered query name (${SparkEntry.queries.size} available)""".stripMargin

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length == 3, usage)
    val Seq(task, tableDir, outDir) = pos.toSeq
    val format = flags.collectFirst {
      case f if f.startsWith("--format=") => f.stripPrefix("--format=")
    }.getOrElse("tsv")
    require(format == "tsv" || format == "parquet", usage)
    val name = resolve(task).getOrElse(
      throw new IllegalArgumentException(s"unknown task '$task'\n$usage"))

    // Under spark-submit the master comes from the launcher; bare
    // `runMain` falls back to all-core local mode.
    val builder = SparkSession.builder()
      .appName(s"graft-$name")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val spark =
      (if (sys.props.contains("spark.master")) builder
       else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]")
         .config("spark.sql.shuffle.partitions",
           sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
        .getOrCreate()

    val result = SparkEntry.queries(name)(spark, tableDir)
    format match {
      case "parquet" => result.write.mode("overwrite").parquet(outDir)
      case _         => graft.sources.Csv.writeKv(result, outDir)
    }
  }
}
