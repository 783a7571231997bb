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

  // independent in-test aHash over a decoded raster (no operator code)
  private def ahashOf(w: Int, h: Int, rgb: Array[Byte]): Array[Long] = {
    val sums = new Array[Long](64); val cnts = new Array[Long](64)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      val blk = (y * 8 / h) * 8 + x * 8 / w
      sums(blk) += (299 * (rgb(o) & 0xff) + 587 * (rgb(o + 1) & 0xff) +
        114 * (rgb(o + 2) & 0xff)) / 1000
      cnts(blk) += 1
    }
    val px = Array.tabulate(64)(i => if (cnts(i) == 0) 0L else sums(i) / cnts(i))
    val mean = px.sum / 64
    val ch = Array.fill(4)(0L)
    (0 until 64).foreach(i => if (px(i) > mean) ch(i / 16) |= 1L << (i % 16))
    ch
  }
  private def ham(x: Array[Long], y: Array[Long]): Long =
    x.zip(y).map { case (p, q) => java.lang.Long.bitCount(p ^ q).toLong }.sum

  test("PPM P6 codec: roundtrip, comments, maxval scaling, malformed rejection") {
    import graft.operators.Ppm
    val rnd = new scala.util.Random(7)
    val rgb = Array.fill(24 * 16 * 3)(rnd.nextInt(256).toByte)
    // roundtrip
    Ppm.decodeP6(Ppm.encodeP6(24, 16, rgb)) match {
      case Some((w, h, px)) =>
        assert(w === 24 && h === 16 && px.sameElements(rgb))
      case None => fail("roundtrip decode failed")
    }
    // header comments and generous whitespace parse like any netpbm reader
    val commented = ("P6 # a comment\n# another\n 4\t2 # dims\n255\n").getBytes("US-ASCII") ++
      Array.fill(4 * 2 * 3)(100.toByte)
    assert(Ppm.decodeP6(commented).exists { case (w, h, px) =>
      w == 4 && h == 2 && px.forall(_ == 100.toByte) })
    // maxval < 255 scales samples to 8-bit (v * 255 / maxval)
    val scaled = "P6\n1 1\n85\n".getBytes("US-ASCII") ++ Array[Byte](85, 17, 0)
    assert(Ppm.decodeP6(scaled).exists { case (_, _, px) =>
      (px(0) & 0xff) == 255 && (px(1) & 0xff) == 51 && px(2) == 0 })
    // malformed: wrong magic, P5, 16-bit maxval, truncated payload
    assert(Ppm.decodeP6("JUNK".getBytes) === None)
    assert(Ppm.decodeP6(("P5\n4 2\n255\n").getBytes ++ Array.fill(8)(0.toByte)) === None)
    assert(Ppm.decodeP6(("P6\n1 1\n65535\n").getBytes ++ Array.fill(6)(0.toByte)) === None)
    assert(Ppm.decodeP6(("P6\n4 2\n255\n").getBytes ++ Array.fill(10)(0.toByte)) === None)
    // hostile dimensions whose w*h*3 overflows Int must reject, not throw
    assert(Ppm.decodeP6(("P6\n46341 46341\n255\n").getBytes ++ Array.fill(16)(0.toByte)) === None)
  }

  test("perceptual hash over real decoded images: brightness-invariant, patch-local") {
    import spark.implicits._
    import graft.operators.Ppm
    val rnd = new scala.util.Random(19)
    val (w, h) = (24, 16)
    // image A: random mid-range RGB; B = A with EVERY channel +3
    // (uniform brightness shift — every byte differs, sha dedup calls
    // them distinct, the mean-centered aHash must call them identical);
    // C = A with one 2x2 block blown out (local edit); D unrelated
    val a = Array.fill(w * h * 3)((40 + rnd.nextInt(150)).toByte)
    val b = a.map(v => (v + 3).toByte)
    val c = a.clone()
    for (y <- 0 until 2; x <- 0 until 3; k <- 0 until 3)
      c(3 * (y * w + x) + k) = 255.toByte
    val d = Array.fill(w * h * 3)((40 + rnd.nextInt(150)).toByte)
    val imgs = Seq(0L -> a, 1L -> b, 2L -> c, 3L -> d)
    val blobs = imgs.map { case (id, px) => (id, Ppm.encodeP6(w, h, px)) } :+
      (9L, "not a ppm at all".getBytes("US-ASCII")) // malformed → dropped
    val got = Multimodal.perceptualHashPairsFor(
        blobs.toDF("doc_id", "blob"), "doc_id", "blob").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val expected = (for {
      (ia, pa) <- imgs; (ib, pb) <- imgs
      if ia < ib && ham(ahashOf(w, h, pa), ahashOf(w, h, pb)) <= 3
    } yield (ia, ib, ham(ahashOf(w, h, pa), ahashOf(w, h, pb)))).toSet
    assert(got === expected)
    assert(got((0L, 1L, 0L)), "uniform brightness shift must hash identically")
    assert(got.exists(p => p._1 == 0L && p._2 == 2L),
      "a local patch must stay within the near-dup threshold")
    assert(!got.exists(p => p._2 == 3L || p._1 == 3L), "unrelated image leaked in")
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L), "malformed blob must be dropped")
  }

  test("corpus phash: text→PPM render decodes to the oracle's arithmetic, replay-exact") {
    import spark.implicits._
    val dir = scratchDir("graft-phash")
    val rnd = new scala.util.Random(23)
    val a = Array.fill(512)((40 + rnd.nextInt(70)).toChar)
    val d = Array.fill(512)((40 + rnd.nextInt(70)).toChar)
    val docs = Seq(0L -> new String(a), 1L -> new String(a), // identical render
      2L -> "ab", 3L -> new String(d)) // 2-char doc: the old NULL-chunk corner
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent replay: render formula → decode-free luma → aHash
    def renderSig(s: String): Array[Long] = {
      val n = s.length
      val rgb = new Array[Byte](24 * 16 * 3)
      (0 until 24 * 16).foreach { i =>
        rgb(3 * i) = (s.charAt(i % n) & 0x7f).toByte
        rgb(3 * i + 1) = (s.charAt((7 * i) % n) & 0x7f).toByte
        rgb(3 * i + 2) = ((11 * i) % 256).toByte
      }
      ahashOf(24, 16, rgb)
    }
    val expected = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib && ham(renderSig(sa), renderSig(sb)) <= 3
    } yield (ia, ib, ham(renderSig(sa), renderSig(sb)))).toSet
    val got = Multimodal.perceptualHashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got((0L, 1L, 0L)), "identical text must render and hash identically")
  }

  // independent in-test replica of the text→P6-stream render (header
  // string + pixel formula, no operator code)
  private def refStream(s: String): Array[Byte] = {
    val n = s.length
    val w = 8 + n % 5; val h = 8 + (3 * n) % 7; val f = 1 + n % 4
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    (0 until f).flatMap(fi =>
      hdr ++ Array.tabulate(w * h * 3)(j => (s.charAt((31 * fi + j) % n) & 0x7f).toByte)
    ).toArray
  }
  private def refChecksum(bytes: Array[Byte]): Long =
    bytes.foldLeft(1L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)

  test("multimodal metadata comes from a real P6-stream header parse") {
    val rows = Multimodal.multimodalMeta(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val s = Fixtures.DocA
    val n = s.length
    val stream = refStream(s)
    assert(rows(0L)._1 === stream.length.toLong)              // n_bytes
    assert(rows(0L)._2 === (8 + n % 5).toLong)                // width (parsed)
    assert(rows(0L)._3 === (8 + (3 * n) % 7).toLong)          // height (parsed)
    assert(rows(0L)._4 === (1 + n % 4).toLong)                // n_frames (parsed)
    assert(rows(0L)._5 === refChecksum(stream))               // over container bytes
    assert(rows(0L) === rows(1L)) // identical payload → identical meta
    assert(rows(0L)._5 !== rows(4L)._5) // permuted text → different stream
  }

  test("WAV codec: hostile chunk size that overflows the bounds check rejects, not throws") {
    import graft.operators.Wav
    // declared data size 0x7ffffff0 wraps p+8+size as an Int
    val evil = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](36, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "data".getBytes("US-ASCII") ++
      Array[Byte](-16, -1, -1, 127) ++ Array.fill(8)(0.toByte)
    assert(Wav.decodePcm8(evil) === None)
  }

  test("WAV codec: roundtrip, unknown-chunk walk, malformed rejection") {
    import graft.operators.Wav
    val data = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    Wav.decodePcm8(Wav.encodePcm8(2, 8000, data)) match {
      case Some((c, sr, d)) => assert(c === 2 && sr === 8000 && d.sameElements(data))
      case None => fail("roundtrip decode failed")
    }
    // a LIST chunk between fmt and data is skipped by declared size
    val enc = Wav.encodePcm8(2, 8000, data)
    val withList = enc.slice(0, 36) ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII") ++ enc.slice(36, enc.length)
    assert(Wav.decodePcm8(withList).exists(_._3.sameElements(data)))
    // malformed: magic, non-PCM, truncated data chunk
    assert(Wav.decodePcm8("JUNKJUNKJUNK".getBytes) === None)
    val nonPcm = enc.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Wav.decodePcm8(nonPcm) === None)
    assert(Wav.decodePcm8(enc.slice(0, enc.length - 8)) === None)
  }

  test("channel stats de-interleave by the PARSED channel count") {
    val got = Multimodal.channelStats(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val s = Fixtures.DocA
    val n = s.length
    val vals = Array.tabulate(512)(i => ((s.charAt((3 * i) % n) & 0x7f) + i) % 256)
    for (c <- 0 to 1) {
      val mine = vals.zipWithIndex.filter(_._2 % 2 == c).map(_._1.toLong)
      assert(got((0L, c)) === ((mine.length.toLong, mine.sum)))
    }
  }

  test("frame sampling walks real P6 frame headers for offsets, lengths, pixels") {
    val frames = Multimodal.frameSample(spark, fixtureDir, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val s = Fixtures.DocA
    val n = s.length
    val w = 8 + n % 5; val h = 8 + (3 * n) % 7; val f = 1 + n % 4
    val frameLen = s"P6\n$w $h\n255\n".length + w * h * 3
    val doc0 = frames.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0.map(_._2).toSeq === (0 until f by 2).map(_.toLong))
    assert(doc0.forall { case (_, idx, off, len, _) =>
      off === idx * frameLen && len === frameLen.toLong })
    // per-frame pixel checksum recomputed independently of the decoder
    val pix0 = Array.tabulate(w * h * 3)(j => (s.charAt(j % n) & 0x7f).toByte)
    assert(doc0.head._5 === refChecksum(pix0))
    // identical payloads sample identically
    assert(frames.filter(_._1 == 1L).map(t => t.copy(_1 = 0L)).toSet === doc0.toSet)
  }

  test("resize plan fits parsed dims into 224 preserving aspect with integer math") {
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
    // an unrecognized payload falls back to the documented stub fields
    assert(r.getAs[Long]("width") === 16L + 100 % 624)
    // checksum matches the reference recurrence over the same bytes
    val expected = payload.foldLeft(1L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(r.getAs[Long]("checksum") === expected)

    // a file that IS a P6 stream reports parsed geometry, not the stub
    import graft.operators.Ppm
    val rnd = new scala.util.Random(5)
    val img = Array.fill(6 * 4 * 3)(rnd.nextInt(256).toByte)
    val two = Ppm.encodeP6(6, 4, img) ++ Ppm.encodeP6(6, 4, img)
    val dir2 = scratchDir("graft-media-ppm")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir2/clip.ppm"), two)
    val blobs2 = graft.sources.Formats.readBinaryFiles(spark, dir2)
      .select(xxhash64(col("path")).as("media_id"), col("content"))
    val r2 = Multimodal.metaFor(blobs2, "media_id", "content").collect().head
    assert(r2.getAs[Long]("width") === 6L && r2.getAs[Long]("height") === 4L)
    assert(r2.getAs[Long]("n_frames") === 2L)
    assert(r2.getAs[Long]("n_bytes") === two.length.toLong)
  }

  test("audio fingerprint over real decoded WAV: gain-invariant, content-discriminating") {
    import spark.implicits._
    import graft.operators.Wav
    val rnd = new scala.util.Random(31)
    // clip A: amplitude-MODULATED noise — an envelope alternating
    // loud/quiet 32-sample segments (the structure real audio has;
    // the fingerprint captures the envelope contour, so windows sit
    // clearly above or below the mean instead of hugging it the way
    // stationary white noise does). B = A re-leveled toward center at
    // half gain (every byte differs, sha dedup calls them distinct;
    // halved differences keep the contour, so the mean-thresholded
    // bits barely move); C = unrelated clip with its own envelope;
    // plus one malformed blob (dropped).
    def clip(r: scala.util.Random): Array[Byte] = Array.tabulate(512) { i =>
      val env = if ((i / 32) % 2 == 0) 55.0 else 8.0
      (128 + (r.nextGaussian() * env).toInt.max(-120).min(120)).toByte
    }
    val a = clip(rnd)
    val b = a.map(v => (128 + ((v & 0xff) - 128) / 2).toByte)
    val c = clip(new scala.util.Random(67))
    val blobs = Seq(
      (0L, Wav.encodePcm8(2, 8000, a)),
      (1L, Wav.encodePcm8(2, 8000, b)),
      (2L, Wav.encodePcm8(2, 8000, c)),
      (9L, "RIFFbroken".getBytes("US-ASCII")))
    val got = Multimodal.audioFingerprintPairsFor(
        blobs.toDF("doc_id", "blob"), "doc_id", "blob").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.exists(p => p._1 == 0L && p._2 == 1L),
      s"gain-scaled copy must stay within hamming 3: $got")
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L), "unrelated clip leaked in")
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L), "malformed blob must be dropped")
  }

  test("corpus audio fingerprint: WAV render round-trip matches a direct arithmetic replay") {
    import spark.implicits._
    val dir = scratchDir("graft-audiofp")
    val rnd = new scala.util.Random(37)
    def txt(): String = new String(Array.fill(300)((40 + rnd.nextInt(70)).toChar))
    val ta = txt(); val tc = txt()
    // two docs with IDENTICAL text render identical WAVs -> hamming 0;
    // an unrelated text must not pair with them
    Seq((0L, ta), (1L, ta), (2L, tc))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.audioFingerprintPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((0L, 1L, 0L)), s"identical render must be hamming 0: $got")
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc leaked in")
    // replay the fingerprint directly from the text arithmetic (the
    // oracle's view) and check it equals the container round-trip
    val cp = ta.codePoints().toArray
    val v = Array.tabulate(512)(i => (((cp((3 * i) % cp.length) & 0x7f) + i) % 256))
    val sums = new Array[Long](64); val cnts = new Array[Long](64)
    for (i <- 1 until 512) {
      val d = ((v(i) - v(i - 1) + 384) % 256) - 128
      sums(i * 64 / 512) += d.toLong * d; cnts(i * 64 / 512) += 1
    }
    val px = Array.tabulate(64)(w => if (cnts(w) == 0) 0L else sums(w) / cnts(w))
    val mean = px.sum / 64
    val expect = Array.fill(4)(0L)
    for (w <- 0 until 64 if px(w) > mean) expect(w / 16) |= 1L << (w % 16)
    val sig = Multimodal.audioFingerprint(
      graft.operators.Multimodal.textWav(ta)).get
    assert((sig.c0, sig.c1, sig.c2, sig.c3) ===
      ((expect(0), expect(1), expect(2), expect(3))))
  }
}
