package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Partitioned/clustered sink: directory layout, pruning, fidelity. */
class SinksSpec extends AnyFunSuite with SparkFixture {

  test("writePartitioned produces prunable partition dirs with intact data") {
    val docs = Tables.documents(spark, fixtureDir)
    val out = scratchDir("graft-sink")
    Sinks.writePartitioned(docs, s"$out/docs", Seq("source"), Seq("doc_id"))

    // hive-style partition directories, one per source value
    val dirs = new java.io.File(s"$out/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("source=src0", "source=src1", "source=src2"))

    // round-trip fidelity (partition column restored from the path)
    val back = spark.read.parquet(s"$out/docs")
    assert(back.count() === docs.count())
    assert(back.select("doc_id", "text", "source").collect().toSet ===
      docs.select("doc_id", "text", "source").collect().toSet)

    // a partition-filtered read touches only the matching directory
    val pruned = spark.read.parquet(s"$out/docs").filter("source = 'src1'")
    assert(pruned.count() === 2)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(!scanned.contains("src0"), "partition pruning should drop src0")
  }
}
