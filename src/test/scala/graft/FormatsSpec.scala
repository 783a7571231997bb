package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Formats

/** JSON / ORC / text round-trips with fidelity checks. */
class FormatsSpec extends AnyFunSuite with SparkFixture {

  test("JSONL round-trip preserves rows; corrupt lines become null rows") {
    val docs = Tables.documents(spark, fixtureDir).select("doc_id", "text", "lang")
    val dir = scratchDir("graft-json")
    Formats.writeJsonl(docs, s"$dir/docs")
    val back = Formats.readJsonl(spark, s"$dir/docs", docs.schema)
    assert(back.collect().toSet === docs.collect().toSet)

    // corrupt line: PERMISSIVE yields a null row, a filter drops it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/docs/zz_corrupt.json"), "{not json at all\n")
    val withCorrupt = Formats.readJsonl(spark, s"$dir/docs", docs.schema)
    assert(withCorrupt.count() === docs.count() + 1)
    assert(withCorrupt.filter(col("doc_id").isNotNull).count() === docs.count())
  }

  test("ORC round-trip preserves rows and pushes filters into the scan") {
    val cust = Tables.customer(spark, fixtureDir)
    val dir = scratchDir("graft-orc")
    Formats.writeOrc(cust, s"$dir/c")
    val back = Formats.readOrc(spark, s"$dir/c")
    assert(back.collect().toSet === cust.collect().toSet)
    val plan = back.filter(col("c_custkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"), plan)
  }

  test("raw text source feeds the wordcount shape line by line") {
    val dir = scratchDir("graft-text")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.txt"), "to be or\nnot to be\n")
    val counts = Formats.readText(spark, s"$dir/data.txt")
      .select(explode(graft.operators.TextOps.tokens(col("value"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("to" -> 2L, "be" -> 2L, "or" -> 1L, "not" -> 1L))
  }

  test("binaryFile source ingests opaque payloads byte-exactly with glob filtering") {
    val dir = scratchDir("graft-bin")
    val png = Array[Byte](0x50, 0x4E, 0x47, 0x00, 0x7F, -1, 0x42)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.png"), png)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.wav"),
      Array[Byte](0x52, 0x49, 0x46, 0x46))
    val rows = Formats.readBinaryFiles(spark, dir, glob = "*.png").collect()
    assert(rows.length === 1) // the .wav is glob-filtered out
    val r = rows.head
    assert(r.getAs[String]("path").endsWith("a.png"))
    assert(r.getAs[Long]("length") === png.length.toLong)
    assert(r.getAs[Array[Byte]]("content").toSeq === png.toSeq)
  }
}
