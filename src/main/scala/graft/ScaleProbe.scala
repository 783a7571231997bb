package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe for the heaviest registered queries: builds a
  * key-shifted N× replica of the tables a query reads, times the query
  * at base scale and at N×, and prints the wall-time ratio. The claim
  * under test is "parallelizes linearly" — a ratio far above N means a
  * superlinear term (driver state, quadratic fanout, spill collapse)
  * that small-SF correctness runs can't see.
  *
  * Usage: sbt "runMain graft.ScaleProbe /root/testdata/sf0.1 /tmp/sfx 10"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir  = if (args.length > 1) args(1) else "/tmp/graft-scale-probe"
    val factor  = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Replicate with SHIFTED keys (not copies of the same key space):
    // key cardinality must scale with volume or group counts stay flat
    // and the probe under-states shuffle growth.
    def replicate(df: DataFrame, keyCols: Seq[String], name: String): Unit = {
      val spans = keyCols.map(k => k -> (df.agg(max(col(k))).head.getLong(0) + 1L)).toMap
      (0 until factor)
        .map { i =>
          keyCols.foldLeft(df) { (d, k) =>
            d.withColumn(k, col(k) + lit(i.toLong * spans(k)))
          }
        }
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }

    def timed(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }
    def run(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t = timed(fn(spark, dir).write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
      t
    }

    val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "revenue_bootstrap" -> (operators.Relational.revenueBootstrap _),
      "stream_novelty" -> ((s: SparkSession, d: String) =>
        streaming.DocStreams.streamNovelty(s, d)))

    println(s"[probe] building ${factor}x replicas under $outDir")
    replicate(Tables.lineitem(spark, baseDir).withColumn(
      "l_orderkey", col("l_orderkey").cast("long")), Seq("l_orderkey"), "lineitem")
    replicate(Tables.documents(spark, baseDir), Seq("doc_id"), "documents")

    val results = probes.map { case (name, fn) =>
      // warm once at base so neither measurement pays first-codegen
      run(fn, baseDir)
      val base = math.min(run(fn, baseDir), run(fn, baseDir))
      val big = math.min(run(fn, outDir), run(fn, outDir))
      val ratio = big / base
      println(f"[probe] $name: base=$base%.1fs ${factor}x=$big%.1fs ratio=$ratio%.1fx")
      f""""$name":{"base_sec":$base%.2f,"scaled_sec":$big%.2f,"ratio":$ratio%.2f}"""
    }
    println(s"""{"factor":$factor${results.map("," + _).mkString}}""")
    spark.stop()
  }
}
