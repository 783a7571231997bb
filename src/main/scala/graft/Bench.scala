package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line. Failures are loud:
  * a throwing query lands in the `failed` list (and is excluded from
  * `queries`/`value`) instead of being silently recorded as a timing.
  * Optional args name a subset to time (iteration loop:
  * `sbt "runMain graft.Bench copurchase_pairs corpus_curate"`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session once (FS/committer init, first codegen, executor
    // spin-up) so per-query timings measure the query, not JVM startup —
    // the first query otherwise absorbs ~4s of one-time cost.
    try Tables.lineitem(spark, sfDir).limit(1000)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    // Two timed runs per query, min recorded: a one-shot measurement is
    // dominated by JIT/whole-stage-codegen compilation of that query's
    // generated methods (measured: same query swings 2-10x run to run
    // while GC totals ~0.7s and host CPU is stable); the min of two runs
    // is the steady-state figure a real deployment sees.
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }.toSeq
    selected.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // drop the query's persisted sketch tables so the repeat run
          // (and later queries) start cold and dead caches don't pile up
          spark.catalog.clearCache()
          dt
        }
        timings(name) = runs.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          spark.catalog.clearCache()
      }
    }
    val qs = timings.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timings.values.sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}"""
    println(json)
    // Robust copy for parsers that can't read sbt-prefixed stdout.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), json)
    spark.stop()
  }
}
