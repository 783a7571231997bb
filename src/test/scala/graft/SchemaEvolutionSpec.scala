package graft

import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on the read path: a long-lived 100 TB dataset is
  * written by many pipeline versions — newer files carry columns older
  * ones lack. `mergeSchema` reconciles them; missing columns read as
  * NULL, never as an error.
  */
class SchemaEvolutionSpec extends AnyFunSuite with SparkFixture {

  test("mergeSchema unions columns across file generations") {
    import spark.implicits._
    val dir = scratchDir("graft-evo")
    // generation 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/gen=1")
    // generation 2 adds a quality score
    Seq((3L, "gamma", 0.9))
      .toDF("doc_id", "text", "quality").write.parquet(s"$dir/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "gen", "quality", "text"))
    val byId = merged.collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[Any]("quality"))).toMap
    assert(byId === Map(1L -> None, 2L -> None, 3L -> Some(0.9)))
  }

  test("ignoreCorruptFiles skips a truncated file instead of failing the scan") {
    import spark.implicits._
    val dir = scratchDir("graft-corrupt")
    Seq((1L, "ok"), (2L, "fine")).toDF("doc_id", "text").write.parquet(s"$dir/data")
    // a garbage file in the same directory — at 100 TB some file is
    // ALWAYS damaged; the scan must degrade, not die
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/data/part-99999-garbage.snappy.parquet"),
      Array.fill[Byte](64)(0x42))
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      assert(spark.read.parquet(s"$dir/data").count() === 2L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("explicit schema subsets old and new files uniformly") {
    import spark.implicits._
    val dir = scratchDir("graft-evo2")
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/p1")
    Seq((2L, "b", 7L)).toDF("doc_id", "text", "extra").write.parquet(s"$dir/p2")
    // reading with a pinned schema ignores the extra column entirely
    val pinned = spark.read
      .schema("doc_id LONG, text STRING")
      .parquet(s"$dir/p1", s"$dir/p2")
    assert(pinned.columns.toSeq === Seq("doc_id", "text"))
    assert(pinned.count() === 2L)
  }
}
