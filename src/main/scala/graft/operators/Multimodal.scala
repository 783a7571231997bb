package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling: media payloads ride as opaque `BINARY`
  * columns; decode / feature-extraction runs batch-wise in
  * `mapPartitions` over a typed Dataset (the Scala analogue of a Pandas
  * batch UDF) emitting typed metadata.
  *
  * The environment ships no codec libraries, so decode runs through
  * the dependency-free [[Ppm]] (P6 image / concatenated-P6 stream) and
  * [[Wav]] (RIFF PCM) parsers — real container walks with malformed
  * rejection, not stubs. The corpus-to-media bridges ([[textPpm]],
  * [[textPpmStream]], [[textWav]]) render document text into those
  * formats with oracle-replayable arithmetic, so every pipeline is
  * exercised end-to-end over genuinely parsed bytes; only the
  * unrecognized-media fallback in [[metaFor]] keeps the documented
  * length-derived stub fields.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long, checksum: Long)

  /** Per-byte rolling checksum, modded so the accumulator never exceeds
    * 31·(1e9+7)+255 — no wraparound, so the DuckDB oracle can evaluate
    * the identical recurrence (bigint overflow throws there).
    */
  private def checksum(bytes: Array[Byte]): Long = {
    var acc = 1L
    var k = 0
    while (k < bytes.length) {
      acc = (acc * 31 + (bytes(k) & 0xff)) % 1000000007L
      k += 1
    }
    acc
  }

  final case class Frame(
      doc_id: Long, frame_idx: Long, off: Long, len: Long, frame_checksum: Long)

  /** The corpus-to-video bridge: render each document's text into a
    * short CONCATENATED-P6 stream — the netpbm/ffmpeg `image2pipe`
    * convention for raw video — with text-dependent geometry:
    * `1 + n%4` frames of `(8 + n%5) × (8 + 3n%7)` RGB pixels, pixel
    * byte j of frame f = `code(text[(31·f + j) mod n]) & 0x7f`. The
    * DuckDB oracle replays this arithmetic; the Spark side round-trips
    * through [[Ppm.encodeP6]]/[[Ppm.decodeP6Stream]], so frame
    * delimiting is a genuine header parse, not fixed-width windowing.
    */
  def textPpmStream(s: String): Array[Byte] = {
    // index by CODE POINT, not UTF-16 unit — the DuckDB oracle's
    // substr/ord/len(text) are code-point ops, so charAt/String.length
    // would silently diverge on non-BMP text
    val cp = s.codePoints().toArray
    val n = cp.length
    val w = 8 + n % 5
    val h = 8 + (3 * n) % 7
    val frames = 1 + n % 4
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      val rgb = Array.tabulate(w * h * 3)(j => (cp((31 * f + j) % n) & 0x7f).toByte)
      out.write(Ppm.encodeP6(w, h, rgb))
      f += 1
    }
    out.toByteArray
  }

  /** Frame sampling over a real container: parse the P6 stream
    * ([[Ppm.decodeP6Stream]] — per-frame header parse, offsets and
    * lengths from the parse, stream ends at the first malformed
    * frame) and emit every `stride`-th frame's byte range plus a
    * checksum over its DECODED pixels. The 1→n generator over a
    * binary column, batched per partition — the video frame-sampler
    * shape.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import spark.implicits._
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 1)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, s) =>
          Ppm.decodeP6Stream(textPpmStream(s)).zipWithIndex.collect {
            case ((off, len, _, _, rgb), idx) if idx % stride == 0 =>
              Frame(id, idx.toLong, off, len, checksum(rgb))
          }
        }
      }
      .toDF()
  }

  /** Resize planning: fit the PARSED (width, height) into a 224×224
    * square preserving aspect ratio — all-integer arithmetic
    * (truncating division) so the oracle agrees bit-for-bit.
    */
  def resizePlan(spark: SparkSession, dir: String, target: Int = 224): DataFrame =
    multimodalMeta(spark, dir)
      .select(
        col("doc_id"), col("width"), col("height"),
        expr(s"width * $target DIV greatest(width, height)").as("out_w"),
        expr(s"height * $target DIV greatest(width, height)").as("out_h"))

  final case class Channel(doc_id: Long, channel: Int, n_samples: Long, sum_val: Long)

  /** The corpus-to-audio bridge: render each document's text into a
    * real RIFF/WAV blob — 512 interleaved stereo 8-bit PCM samples,
    * sample i = `(code(text[(3·i) mod n]) & 0x7f + i) mod 256` — via
    * [[Wav.encodePcm8]]. Oracle-replayable arithmetic inside a genuine
    * container.
    */
  def textWav(s: String): Array[Byte] = {
    // code-point indexing — see [[textPpmStream]]'s oracle-parity note
    val cp = s.codePoints().toArray
    val n = cp.length
    val data = Array.tabulate(512)(i => (((cp((3 * i) % n) & 0x7f) + i) % 256).toByte)
    Wav.encodePcm8(channels = 2, sampleRate = 8000, data)
  }

  /** Channel de-interleaving over a real container: parse the WAV
    * ([[Wav.decodePcm8]] — RIFF chunk walk, PCM/8-bit validation,
    * channel count FROM THE HEADER) and emit per-channel sample
    * counts and value sums — the audio channel-split + feature pass
    * (1→k generator over a binary column, batched per partition).
    * Malformed blobs are dropped (DROPMALFORMED).
    */
  def channelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 1)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, s) =>
          Wav.decodePcm8(textWav(s)).toSeq.flatMap { case (channels, _, data) =>
            val counts = new Array[Long](channels)
            val sums = new Array[Long](channels)
            var i = 0
            while (i < data.length) {
              val c = i % channels
              counts(c) += 1
              sums(c) += data(i) & 0xff
              i += 1
            }
            (0 until channels).map(c => Channel(id, c, counts(c), sums(c)))
          }
        }
      }
      .toDF()
  }

  /** Typed metadata from a REAL header parse: each document's rendered
    * P6 stream ([[textPpmStream]]) goes through [[metaFor]], whose
    * width/height/n_frames come from [[Ppm.decodeP6Stream]].
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    metaFor(
      Tables.documentsSpread(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(length(col("text")) >= 1)
        .as[(Long, String)]
        .mapPartitions(it => it.map { case (id, s) => (id, textPpmStream(s)) })
        .toDF("doc_id", "blob"),
      "doc_id", "blob")
  }

  /** Binary-content exact dedup — the image/audio analog of
    * `dedup_exact`: payloads grouped by (sha-256 digest, n_bytes),
    * keeper = min id. The digest is `sha2(blob, 256)` — a codegen'd
    * expression evaluated scan-side, so at 100 TB the groupBy key is
    * the 64-char hex digest plus a long per payload and the media
    * bytes never cross the exchange. SHA-256 collisions are
    * cryptographically negligible (and would additionally need equal
    * byte lengths to merge groups).
    */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .groupBy(sha2(col("blob"), 256).as("digest"),
        length(col("blob")).cast("long").as("n_bytes"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  final case class PHash(doc_id: Long, c0: Long, c1: Long, c2: Long, c3: Long)

  /** The corpus-to-image bridge: render each document's text into a
    * fixed 24×16 RGB raster and encode it as a REAL PPM (P6) blob.
    * Pixel i ∈ [0, 384): `r = code(text[i mod n]) & 0x7f`,
    * `g = code(text[(7·i) mod n]) & 0x7f`, `b = (11·i) mod 256` — a
    * deterministic render the DuckDB oracle replays arithmetically,
    * while the Spark side round-trips the bytes through
    * [[Ppm.encodeP6]]/[[Ppm.decodeP6]], so the decode under test is a
    * genuine format parse, not a stub.
    */
  def textPpm(s: String, w: Int = 24, h: Int = 16): Array[Byte] = {
    // code-point indexing — see [[textPpmStream]]'s oracle-parity note
    val cp = s.codePoints().toArray
    val n = cp.length
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      rgb(3 * i) = (cp(i % n) & 0x7f).toByte
      rgb(3 * i + 1) = (cp((7 * i) % n) & 0x7f).toByte
      rgb(3 * i + 2) = ((11 * i) % 256).toByte
      i += 1
    }
    Ppm.encodeP6(w, h, rgb)
  }

  /** Perceptual near-dup pairs — the aHash complement to the byte-exact
    * [[multimodalDedup]]: re-encodes, brightness shifts, or local
    * patches change every byte (and the sha digest) while the
    * perceptual signature barely moves. The corpus path renders each
    * text to a real PPM via [[textPpm]] and hands the BLOBS to
    * [[perceptualHashPairsFor]], whose decode is [[Ppm.decodeP6]] —
    * header parse, maxval scaling, truncation handling — over genuine
    * image bytes.
    */
  def perceptualHashPairs(spark: SparkSession, dir: String,
                          maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 1)
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, s) => (id, textPpm(s)) })
      .toDF("doc_id", "blob")
    perceptualHashPairsFor(blobs, "doc_id", "blob", maxHamming)
  }

  /** aHash near-dup pairs over arbitrary `(id, PPM-P6 blob)` rows —
    * the entry point for real images ingested via
    * [[graft.sources.Formats.readBinaryFiles]]. Decode is the real
    * [[Ppm.decodeP6]] (malformed blobs are dropped, the DROPMALFORMED
    * convention); grayscale is integer BT.601 [[Ppm.luma]]; the hash is
    * the classic average-hash: downscale to an 8×8 grid of block
    * means (block (bx,by) = pixels with ⌊x·8/w⌋ = bx, ⌊y·8/h⌋ = by —
    * a local edit moves one block's mean a little instead of shifting
    * every downstream sample), bit = block mean > global mean
    * (truncated). The 64-bit signature rides as four 16-bit chunks;
    * candidate pairs come from exact-chunk banding, which is LOSSLESS
    * for hamming ≤ 3 (pigeonhole: 3 flipped bits cannot touch all 4
    * chunks), then one bit_count(xor) verify per candidate. Same
    * shape as the simhash/minhash families: linear signature pass,
    * collision-bounded candidates, never N².
    */
  def perceptualHashPairsFor(blobs: DataFrame, idCol: String, blobCol: String,
                             maxHamming: Int = 3): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    require(maxHamming < 4, "4-chunk banding is only lossless below hamming 4")
    val sigs = blobs
      .select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Ppm.decodeP6(bytes).map { case (w, h, rgb) =>
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            var y = 0
            while (y < h) {
              val by = y * 8 / h
              var x = 0
              while (x < w) {
                val o = 3 * (y * w + x)
                val blk = by * 8 + x * 8 / w
                sums(blk) += Ppm.luma(rgb(o) & 0xff, rgb(o + 1) & 0xff, rgb(o + 2) & 0xff)
                cnts(blk) += 1
                x += 1
              }
              y += 1
            }
            val px = Array.tabulate(64)(i => if (cnts(i) == 0) 0L else sums(i) / cnts(i))
            val mean = px.sum / 64
            val chunks = Array.fill(4)(0L)
            var i = 0
            while (i < 64) {
              if (px(i) > mean) chunks(i / 16) |= 1L << (i % 16)
              i += 1
            }
            PHash(id, chunks(0), chunks(1), chunks(2), chunks(3))
          }
        }
      }.toDF()

    chunkBandPairs(sigs.toDF(), maxHamming)
  }

  /** The 4×16-bit chunk-banded near-dup join shared by every 64-bit
    * perceptual signature family ([[perceptualHashPairsFor]] for
    * images, [[audioFingerprintPairs]] for audio): candidates from
    * exact-chunk collisions (lossless for hamming ≤ 3 by pigeonhole),
    * one `bit_count(xor)` verify per candidate, never N².
    */
  private def chunkBandPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < 4, "4-chunk banding is only lossless below hamming 4")
    val bands = sigs.select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      explode(array(
        struct(lit(0).as("b"), col("c0").as("v")),
        struct(lit(1).as("b"), col("c1").as("v")),
        struct(lit(2).as("b"), col("c2").as("v")),
        struct(lit(3).as("b"), col("c3").as("v")))).as("band"))
      .select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        col("band.b").as("b"), col("band.v").as("v"))

    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        (bit_count(col("x.c0").bitwiseXOR(col("y.c0"))) +
          bit_count(col("x.c1").bitwiseXOR(col("y.c1"))) +
          bit_count(col("x.c2").bitwiseXOR(col("y.c2"))) +
          bit_count(col("x.c3").bitwiseXOR(col("y.c3")))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit audio energy fingerprint over decoded PCM — the
    * [[perceptualHashPairsFor]] analog for audio, closing the
    * near-dup-across-modalities story on real containers. The decode
    * is the genuine [[Wav.decodePcm8]] RIFF chunk walk; the signature
    * is DERIVATIVE energy (the classic high-pass fingerprint): the
    * sample stream's CENTERED CIRCULAR first differences
    * d(i) = ((s(i) − s(i−1) + 384) mod 256) − 128 split into 64
    * windows (diff i → window ⌊i·64/n⌋), each window's energy is
    * the integer sum of d², and bit w = (window mean energy > global
    * mean of window means) — truncating integer division throughout so
    * the DuckDB oracle replays it exactly. The difference SHAPE was
    * measured, not assumed: plain center-deviation energy is dominated
    * by the textWav render's `+i` ramp (hamming ≤ 3 matched ~7% of ALL
    * pairs), and a plain difference still spikes 255² wherever the
    * 8-bit sawtooth wraps — wrap positions are ramp-determined, so
    * every doc lit the same windows (~6% of pairs). The circular
    * difference maps a wrap step to its small residue, leaving only
    * the content jitter; and the threshold-vs-own-mean construction is
    * AMPLITUDE-INVARIANT: re-leveled or gain-scaled copies (every byte
    * different, sha useless) keep their high-frequency CONTOUR, so the
    * signature barely moves — MultimodalSpec plants exactly that pair.
    * None rows (malformed WAV) drop, DROPMALFORMED.
    */
  private[graft] def audioFingerprint(bytes: Array[Byte]): Option[PHash] =
    Wav.decodePcm8(bytes).flatMap { case (_, _, data) =>
      val n = data.length
      if (n < 2) None
      else {
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var i = 1
        while (i < n) {
          val d = (((data(i) & 0xff) - (data(i - 1) & 0xff) + 384) % 256) - 128
          val blk = (i.toLong * 64 / n).toInt
          sums(blk) += d.toLong * d
          cnts(blk) += 1
          i += 1
        }
        val px = Array.tabulate(64)(w => if (cnts(w) == 0) 0L else sums(w) / cnts(w))
        val mean = px.sum / 64
        val chunks = Array.fill(4)(0L)
        var w = 0
        while (w < 64) {
          if (px(w) > mean) chunks(w / 16) |= 1L << (w % 16)
          w += 1
        }
        Some(PHash(0L, chunks(0), chunks(1), chunks(2), chunks(3)))
      }
    }

  /** Audio near-dup pairs over `(id, WAV blob)` rows: fingerprint via
    * [[audioFingerprint]], candidates + verify via the shared
    * [[chunkBandPairs]] (hamming ≤ `maxHamming`, banding lossless).
    */
  def audioFingerprintPairsFor(blobs: DataFrame, idCol: String, blobCol: String,
                               maxHamming: Int = 3): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val sigs = blobs
      .select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        audioFingerprint(bytes).map(p => p.copy(doc_id = id))
      })
      .toDF()
    chunkBandPairs(sigs, maxHamming)
  }

  /** The corpus path: render each document to a real WAV via
    * [[textWav]] and mine audio near-dups from the decoded PCM.
    */
  def audioFingerprintPairs(spark: SparkSession, dir: String,
                            maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 1)
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, s) => (id, textWav(s)) })
      .toDF("doc_id", "blob")
    audioFingerprintPairsFor(blobs, "doc_id", "blob", maxHamming)
  }

  /** Metadata decode over arbitrary `(id, BINARY)` rows — the entry
    * point for real media ingested via
    * [[graft.sources.Formats.readBinaryFiles]] (`xxhash64(path)` makes
    * a stable id for file-sourced payloads). A payload that parses as
    * a P6 stream reports its REAL geometry (first frame's width and
    * height, parsed frame count); anything else falls back to the
    * documented length-derived stub fields (the pre-round-14 decode,
    * kept so unrecognized media still yields a deterministic row
    * instead of silently disappearing — a row is still a blob to
    * catalog even when no codec claims it). The checksum always runs
    * over the raw container bytes.
    */
  def metaFor(blobs: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val frames = Ppm.decodeP6Stream(bytes)
          if (frames.nonEmpty) {
            val (_, _, w, h, _) = frames.head
            MediaMeta(id, n, w.toLong, h.toLong, frames.size.toLong, checksum(bytes))
          } else
            MediaMeta(
              doc_id = id,
              n_bytes = n,
              width = 16 + n % 624,
              height = 16 + (n * 7) % 464,
              n_frames = 1 + n % 30,
              checksum = checksum(bytes))
        }
      }
      .toDF()
  }
}
