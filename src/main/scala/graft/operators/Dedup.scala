package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over the `documents` table — the core of an
  * LLM-training-data pipeline.
  *
  * Scale posture (100 TB): every variant is shuffle-by-key, never
  * driver-side state. Exact dedup groups by a 256-bit content hash (the
  * shuffle key is 64 bytes, not the document). Near-dup detection goes
  * through an inverted index (exact, for oracle checking) or MinHash+LSH
  * banding (the scale path: candidate generation cost is bounded by
  * bucket collisions, not N²).
  */
object Dedup {

  /** Exact dedup: group documents by sha256(text); keep the smallest
    * doc_id per group. Hash-bucketed shuffle on the digest — the
    * document body never crosses the exchange.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word-bigram shingles per document. Bigrams (not unigrams)
    * keep the inverted index selective: a unigram index over a small
    * vocabulary degenerates into quadratic bucket fanout.
    */
  private[graft] def shingleSets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2) // sequence(1, size-1) must not descend
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("ts")) - 1),
          i => concat(element_at(col("ts"), i), lit(" "), element_at(col("ts"), i + 1))))
        .as("sh"))

  /** Exact n-gram-jaccard near-dup pairs (threshold 0.8) via an inverted
    * shingle index: explode shingles, self-join on the shingle key,
    * count intersections per pair, then jaccard = |∩| / (|A|+|B|-|∩|).
    * All-integer until the final division, so the DuckDB oracle agrees
    * bit-for-bit. A production run would also drop "stop-shingles" above
    * a document-frequency cap to bound skew; the testdata doesn't need it.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir)
    val sh = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    val n = sets.select(col("doc_id"), size(col("sh")).cast("long").as("ns"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(n.as("na"), col("doc_a") === col("na.doc_id"))
      .join(n.as("nb"), col("doc_b") === col("nb.doc_id"))
      .withColumn("uni", col("na.ns") + col("nb.ns") - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  /** MinHash + LSH near-dup pairs. 64 MinHash functions (xxhash64 seeded
    * by permutation index) over the bigram shingle set, banded 16×4:
    * a pair lands in a candidate bucket iff one 4-row band matches, so
    * P(candidate | j=0.8) ≈ 1-(1-0.8⁴)¹⁶ ≈ 0.9997. Candidates are then
    * verified with the exact jaccard, same 0.8 threshold as
    * [[ngramJaccard]]. This is the 100 TB dedup path: shuffle keys are
    * (band, bandHash), never document pairs.
    *
    * Not SQL-oracle-able (xxhash64 is Spark-specific); covered by the
    * ScalaTest suite instead, cross-checked against [[ngramJaccard]].
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val numHashes = 64
    val bandRows = 4
    val numBands = numHashes / bandRows

    val sets = shingleSets(spark, dir)
    // signature[i] = min over shingles of xxhash64(i, shingle)
    val sig = sets.withColumn("sig",
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("sh"), s => xxhash64(i, s)))))

    val bands = sig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col("sig"), b * bandRows + 1, lit(bandRows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val candidates = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact-jaccard verification of the candidate set
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("long"))
      .filter(col("inter").cast("double") / col("uni") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  /** SimHash near-dup pairs. 64-bit simhash over unigram token hashes
    * (per-row, no shuffle), then pairs at hamming distance ≤ 3 found by
    * banding the hash into 4×16-bit chunks: d(a,b) ≤ 3 ⇒ at least one
    * chunk is identical (pigeonhole), so a join on (chunk, value) finds
    * every qualifying pair; exact popcount(xor) confirms.
    * Spark-hash-specific → ScalaTest-covered, no SQL oracle.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .withColumn("hs", transform(col("ts"), t => xxhash64(t)))
    // unrolled per-bit vote: bitSum_i = Σ tokens (bit i set ? +1 : -1)
    val sim = (0 until 64).map { i =>
      val vote = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when((shiftright(h, i).bitwiseAND(lit(1L))) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hashed = docs.select(col("doc_id"), sim.as("simhash"))

    val chunks = hashed.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), 16 * c).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_val") === col("y.chunk_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }
}
