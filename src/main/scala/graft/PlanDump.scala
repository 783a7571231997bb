package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: prints the (post-AQE) physical plan of a
  * registered query — the `.explain`-and-iterate loop the perf work
  * runs, as a one-command main so it never needs an ad-hoc scratch
  * file. `runMain graft.PlanDump <query> [sfDir]` prints the formatted
  * plan BEFORE execution, runs the query to a noop sink, then prints
  * the final adaptive plan (AQE's runtime reoptimization — broadcast
  * conversions, coalesced exchanges — only exists after an action).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"===== $name: static plan =====")
    df.explain("formatted")
    df.write.mode("overwrite").format("noop").save()
    println(s"===== $name: final adaptive plan =====")
    println(df.queryExecution.executedPlan.toString)
    // Whole-stage-codegen health readout: the max generated-method
    // BYTECODE size across everything this query compiled. The JVM
    // refuses to JIT any method over HugeMethodLimit = 8000 bytecodes
    // (it runs interpreted, 2-10x slower, and whether its callers got
    // compiled before the code cache filled varies run to run) — the
    // codegen-oscillation diagnosis this readout exists to pin.
    val h = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot
    println(f"===== $name: codegen metrics =====")
    println(f"generated methods: max bytecode ${h.getMax}%d B, " +
      f"p99 ${h.getValue(0.99)}%.0f B, p95 ${h.getValue(0.95)}%.0f B " +
      f"(JIT HugeMethodLimit = 8000 B)")
    val src = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_SOURCE_CODE_SIZE.getSnapshot
    val ct = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot.getValues
    println(f"generated sources: n=${src.size}%d, max ${src.getMax}%d B, " +
      f"total ≈ ${src.getValues.sum}%d B; Janino compile total " +
      f"${ct.sum}%d ms (max ${if (ct.nonEmpty) ct.max else 0L}%d ms) — " +
      "paid INSIDE a timed run whenever the 100-entry codegen class " +
      "cache has evicted this query's stages")
    spark.stop()
  }
}
