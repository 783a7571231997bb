package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite with SparkFixture {

  test("zorder2 matches a reference Morton interleave") {
    import spark.implicits._
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (7L, 9L), (65535L, 0L), (0L, 65535L))
    val got = cases.toDF("a", "b")
      .withColumn("z", Layout.zorder2(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) === morton(a, b), s"($a, $b)")
    }
    // canonical identities: interleave of all-ones halves
    assert(got((65535L, 0L)) === 0x55555555L)
    assert(got((0L, 65535L)) === 0xAAAAAAAAL)
  }

  test("z-sorted layout keeps row-group stats selective for BOTH dimensions") {
    import spark.implicits._
    // 64x64 grid of (user, vbin) points, one file per 8 z-runs vs
    // one-dimension sort: z-layout bounds BOTH dims per file
    val grid = for (u <- 0L until 64L; v <- 0L until 64L) yield (u, v)
    val df = grid.toDF("user_id", "vbin")
      .withColumn("z", Layout.zorder2(col("user_id"), col("vbin")))
    val files = 16
    val zDir = scratchDir("graft-z")
    df.repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(zDir)
    // per-file (min,max) spans of each dimension under z-layout
    val spans = spark.read.parquet(zDir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("vbin").as("vlo"), max("vbin").as("vhi"))
      .collect()
    assert(spans.length === files)
    // Most files must stay within half of BOTH dimensions' domains — a
    // predicate on either dimension then prunes them. (Files whose
    // z-range crosses a major quadrant boundary can legitimately span
    // wide; a 1-D sort by user_id would leave EVERY file spanning the
    // full vbin domain.)
    val tight = spans.count(r =>
      r.getAs[Long]("uhi") - r.getAs[Long]("ulo") <= 32 &&
        r.getAs[Long]("vhi") - r.getAs[Long]("vlo") <= 32)
    assert(tight >= 12, s"only $tight/16 files dimension-bounded: ${spans.mkString("\n")}")
  }
}
