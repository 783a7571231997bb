package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Csv

/** The reference's CSV edge rules, asserted against the declarative
  * reader: header skipped, short/overlong rows dropped, unparseable
  * timestamps dropped, types landed as declared.
  */
class CsvSpec extends AnyFunSuite with SparkFixture {

  private def writeCsv(name: String, lines: String*): String = {
    val dir = Paths.get(scratchDir("graft-csv"))
    val f = dir.resolve(name)
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("pages: header row and malformed rows are dropped, types are typed") {
    val path = writeCsv("pages.csv",
      "PersonID,Name,Nationality,Country Code,Hobby",
      "1,alice,Russia,7,chess",
      "2,bob,France,33",            // 4 fields → dropped
      "zzz,carol,Japan,81,go",      // non-numeric id → dropped
      "3,dave,Russia,7,running")
    val got = Csv.pages(spark, path).collect().toSet
    assert(got === Set(
      Row(1L, "alice", "Russia", "7", "chess"),
      Row(3L, "dave", "Russia", "7", "running")))
  }

  test("access_logs: bad timestamps are dropped like the reference's parse guard") {
    val path = writeCsv("access_logs.csv",
      "AccessID,ByWho,WhatPage,TypeOfAccess,AccessTime",
      "1,10,20,view,2024-01-01 10:00:00",
      "2,11,21,view,not-a-time",    // TaskG.java:57-59 behavior
      "3,12,22,edit,2024-01-02 11:30:00")
    val got = Csv.accessLogs(spark, path)
    assert(got.schema("AccessTime").dataType.typeName === "timestamp")
    // collect() materializes every column → the malformed row is dropped.
    // (A bare count() parses no columns under CSV column pruning and
    // would still see 3 raw lines — same laziness as the reference,
    // whose parse guard only fires when the timestamp is consumed.)
    val rows = got.collect()
    assert(rows.length === 2)
    val times = rows.map(_.getTimestamp(4).toString).sorted
    assert(times === Array("2024-01-01 10:00:00.0", "2024-01-02 11:30:00.0"))
  }

  test("friends: dates parse; kv sink round-trips tab-separated lines") {
    val path = writeCsv("friends.csv",
      "FriendRel,PersonID,MyFriend,DateOfFriendship,Desc",
      "1,10,11,2023-05-01,college",
      "2,10,12,2023-06-02,work")
    val df = Csv.friends(spark, path)
    assert(df.collect().map(_.getDate(3).toString).sorted === Array("2023-05-01", "2023-06-02"))

    val out = scratchDir("graft-kv") + "/out"
    Csv.writeKv(df.selectExpr("PersonID", "MyFriend"), out)
    val lines = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
      .sorted
    assert(lines.toSeq === Seq("10\t11", "10\t12"))
  }
}
