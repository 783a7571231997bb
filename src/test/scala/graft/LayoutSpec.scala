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

  /** Plain-loop Hilbert xy→d (the classic rotate-and-recurse
    * formulation) — the independent reference the LUT machine is
    * checked against.
    */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L; var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert2 LUT machine matches the loop reference over the full 8-bit grid") {
    import spark.implicits._
    val grid = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val got = Layout.hilbert2(grid.toDF("x", "y"), "x", "y", bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === hilbertRef(8, x, y), s"($x, $y)")
    }
    // the curve is a bijection onto [0, 2^16)
    assert(got.values.toSet.size === 65536)
    assert(got.values.min === 0L && got.values.max === 65535L)
  }

  test("hilbert layout prunes at least as tightly as z-order on the same grid") {
    import spark.implicits._
    def tightCount(keyed: org.apache.spark.sql.DataFrame, key: String): Int = {
      val dirOut = scratchDir(s"graft-$key")
      keyed.repartitionByRange(16, col(key)).sortWithinPartitions(col(key))
        .write.mode("overwrite").parquet(dirOut)
      spark.read.parquet(dirOut)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(min("x").as("xlo"), max("x").as("xhi"),
          min("y").as("ylo"), max("y").as("yhi"))
        .collect()
        .count(r => r.getAs[Long]("xhi") - r.getAs[Long]("xlo") <= 32 &&
          r.getAs[Long]("yhi") - r.getAs[Long]("ylo") <= 32)
    }
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val base = grid.toDF("x", "y")
    val hTight = tightCount(Layout.hilbert2(base, "x", "y"), "h")
    val zTight = tightCount(base.withColumn("z",
      Layout.zorder2(col("x"), col("y"))), "z")
    // Hilbert's no-jump property: its per-file envelopes are never
    // looser than the Z-curve's on an identical grid + file budget
    assert(hTight >= zTight, s"hilbert $hTight < zorder $zTight")
    assert(hTight >= 12, s"only $hTight/16 hilbert files dimension-bounded")
  }

  test("output shard plan: shards end at-or-past the target, per source") {
    import spark.implicits._
    import graft.operators.Layout
    val dir = scratchDir("graft-shard")
    // source A: 4 docs × 10000 chars, target 16384:
    //   cum-before 0 / 10000 / 20000 / 30000 → shards 0, 0, 1, 1
    // source B: one huge doc lands alone in shard 0
    Seq(
      (1L, "A", 10000L), (2L, "A", 10000L), (3L, "A", 10000L), (4L, "A", 10000L),
      (5L, "B", 50000L), (6L, "B", 10L))
      .map { case (id, s, n) => (id, "t", "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Layout.outputShardPlan(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 3L))
  }

  test("shard manifest: xor checksum is order-independent and content-sensitive") {
    import spark.implicits._
    import graft.operators.Layout
    def write(dir: String, rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, t) => (id, t, "en", "A", 10L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def manifest(dir: String): Map[(String, Long), (Long, Long, Long)] =
      Layout.shardManifest(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val d1 = scratchDir("graft-manifest-a")
    write(d1, Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    val m1 = manifest(d1)

    // same documents written in a different physical order → same manifest
    val d2 = scratchDir("graft-manifest-b")
    write(d2, Seq(3L -> "gamma", 1L -> "alpha", 2L -> "beta"))
    assert(manifest(d2) === m1)

    // one changed document flips the checksum, not the counts
    val d3 = scratchDir("graft-manifest-c")
    write(d3, Seq(1L -> "alpha", 2L -> "CHANGED", 3L -> "gamma"))
    val m3 = manifest(d3)
    assert(m3.keySet === m1.keySet)
    m1.foreach { case (key, (n, b, ck)) =>
      assert(m3(key)._1 === n && m3(key)._2 === b)
      assert(m3(key)._3 !== ck, s"checksum did not flip for $key")
    }

    // checksum matches an independent reimplementation (md5 prefix xor)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(t: String): Long = java.lang.Long.parseLong(
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val expect = Seq("alpha", "beta", "gamma").map(h).reduce(_ ^ _)
    assert(m1(("A", 0L))._3 === expect)
  }
}
