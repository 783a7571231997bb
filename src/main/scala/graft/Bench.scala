package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line. Failures are loud:
  * a throwing query lands in the `failed` list (and is excluded from
  * `queries`/`value`) instead of being silently recorded as a timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
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
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
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
