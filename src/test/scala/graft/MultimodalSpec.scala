package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("binary dedup groups identical payloads; keeper is the min id") {
    // docs 0 and 1 carry byte-identical text payloads; 2, 3, 4 unique
    val got = operators.Multimodal.multimodalDedup(spark, fixtureDir)
      .select("keep_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("perceptual hash: brightness-shift invariant, patch-local, replay-exact") {
    import spark.implicits._
    val dir = scratchDir("graft-phash")
    val rnd = new scala.util.Random(19)
    // "image" A: 512 code units in [40, 110); B = A with EVERY unit +1
    // (uniform brightness shift — every byte differs, sha dedup calls
    // them distinct, the mean-centered aHash must call them identical);
    // C = A with one 8-unit patch blown out (local edit); D unrelated
    val a = Array.fill(512)((40 + rnd.nextInt(70)).toChar)
    val b = a.map(c => (c + 1).toChar)
    val c = a.clone(); (256 until 264).foreach(i => c(i) = '~')
    val d = Array.fill(512)((40 + rnd.nextInt(70)).toChar)
    val docs = Seq(0L -> new String(a), 1L -> new String(b),
      2L -> new String(c), 3L -> new String(d))
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent in-test replay of the block-mean aHash
    def sig(s: String): Array[Long] = {
      val n = s.length
      val sums = new Array[Long](64); val cnts = new Array[Long](64)
      (0 until n).foreach { p =>
        val blk = (p.toLong * 64 / n).toInt
        sums(blk) += s.charAt(p).toInt; cnts(blk) += 1
      }
      val px = Array.tabulate(64)(i => if (cnts(i) == 0) 0L else sums(i) / cnts(i))
      val mean = px.sum / 64
      val ch = Array.fill(4)(0L)
      (0 until 64).foreach(i => if (px(i) > mean) ch(i / 16) |= 1L << (i % 16))
      ch
    }
    def ham(x: Array[Long], y: Array[Long]): Long =
      x.zip(y).map { case (p, q) => java.lang.Long.bitCount(p ^ q).toLong }.sum
    val expected = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib && ham(sig(sa), sig(sb)) <= 3
    } yield (ia, ib, ham(sig(sa), sig(sb)))).toSet

    val got = Multimodal.perceptualHashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // the design points, stated directly:
    assert(got((0L, 1L, 0L)), "uniform brightness shift must hash identically")
    assert(got.exists(p => p._1 == 0L && p._2 == 2L),
      "a local patch must stay within the near-dup threshold")
    assert(!got.exists(p => p._2 == 3L || p._1 == 3L), "unrelated image leaked in")
    // ...and sha-exact dedup genuinely misses the brightness pair
    val exact = Multimodal.multimodalDedup(spark, dir).collect()
    assert(exact.forall(_.getLong(3) == 1L), "payloads are all byte-distinct")
  }

  test("multimodal metadata: stub decode is deterministic over the byte payload") {
    val rows = Multimodal.multimodalMeta(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val n = Fixtures.DocA.getBytes("UTF-8").length.toLong
    assert(rows(0L)._1 === n)
    assert(rows(0L) === rows(1L)) // identical payload → identical meta
    // checksum recomputed independently of the operator's code path
    val expect = Fixtures.DocA.getBytes("UTF-8")
      .foldLeft(1L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    assert(rows(0L)._5 === expect)
    assert(rows(0L)._5 !== rows(4L)._5) // permutation: different byte order
  }

  test("frame sampling emits every stride-th fixed-size frame with correct ranges") {
    val frames = Multimodal.frameSample(spark, fixtureDir, frameBytes = 10, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = Fixtures.DocA.getBytes("UTF-8").length
    val doc0 = frames.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0.map(_._2).toSeq === (0 until n / 10 by 2).map(_.toLong))
    assert(doc0.forall { case (_, idx, off, len, _) => off === idx * 10 && len === 10L })
    // per-frame checksum recomputed independently
    val bytes = Fixtures.DocA.getBytes("UTF-8")
    val expect0 = bytes.slice(0, 10).foldLeft(1L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(doc0.head._5 === expect0)
    // identical payloads sample identically
    assert(frames.filter(_._1 == 1L).map(t => t.copy(_1 = 0L)).toSet === doc0.toSet)
  }

  test("resize plan fits stub dims into 224 preserving aspect with integer math") {
    val rows = Multimodal.resizePlan(spark, fixtureDir).collect()
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ow === w * 224 / math.max(w, h))
      assert(oh === h * 224 / math.max(w, h))
      assert(math.max(ow, oh) === 224 || math.max(w, h) === 0)
    }
  }

  test("binaryFile rows feed the same decode as documents payloads") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val dir = scratchDir("graft-media")
    val payload = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/clip.bin"), payload)
    val blobs = graft.sources.Formats.readBinaryFiles(spark, dir)
      .select(xxhash64(col("path")).as("media_id"), col("content"))
    val meta = Multimodal.metaFor(blobs, "media_id", "content").collect()
    assert(meta.length === 1)
    val r = meta.head
    assert(r.getAs[Long]("n_bytes") === 100L)
    assert(r.getAs[Long]("width") === 16L + 100 % 624)
    // checksum matches the reference recurrence over the same bytes
    val expected = payload.foldLeft(1L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(r.getAs[Long]("checksum") === expected)
  }
}
