package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Planted-cardinality proof that the IVF family's derived `nlist`
  * (Similarity.derivedNlist — the smallest power of two k ≥ 16 with
  * k²·8 ≥ N, i.e. k ≈ √(N/8)) keeps the probed-cell scan SUBLINEAR in
  * corpus size, where the retired fixed-16 knob reverts it to linear —
  * the same cliff shape BandScaleSpec closed for LSH banding in r18,
  * here applied to the coarse quantizer (the r18 verdict's item 5).
  *
  * With k cells over N vectors, a query's candidate scan costs
  * nprobe · N/k rows (balanced cells): fixed k ⇒ cost ∝ N; derived
  * k ∝ √N ⇒ cost ∝ √N. Two synthetic corpora straddle the rule's
  * first boundary (k²·8 = 2048 at k = 16):
  *   - N = 2,000  (≤ 2048 → nlist = 16, identical to the old knob —
  *                 which is also why every registered-corpus oracle
  *                 hash was bit-identical when the derivation landed)
  *   - N = 16,000 (8× → nlist = 64)
  * and the measured per-query candidate load is compared across legs
  * through the REAL pipeline (parquet dir → corpus-count cache →
  * trained spherical codebook → assignment → probe join), not a unit
  * re-derivation. Integer-rule unit tests pin the derivation itself,
  * including the 2^20 ceiling and the oracle-replay boundary cases.
  */
class IvfScaleSpec extends AnyFunSuite with SparkFixture {

  // ---- integer rule ---------------------------------------------------

  test("derivedNlist: power-of-two √(N/8) sizing, floor 16, cap 2^20") {
    assert(Similarity.derivedNlist(1L) === 16)
    assert(Similarity.derivedNlist(500L) === 16)
    // boundary: 16²·8 = 2048 is the last 16-cell corpus
    assert(Similarity.derivedNlist(2048L) === 16)
    assert(Similarity.derivedNlist(2049L) === 32)
    assert(Similarity.derivedNlist(32L * 32 * 8) === 32)
    assert(Similarity.derivedNlist(32L * 32 * 8 + 1) === 64)
    // a billion-vector corpus: 2^14 cells, ~61k vectors/cell
    assert(Similarity.derivedNlist(1000000000L) === (1 << 14))
    // ceiling: cell count stops at 2^20 (training is sampled past it)
    assert(Similarity.derivedNlist(Long.MaxValue / 4) === (1 << 20))
    // occupancy invariant: k·k·8 ≥ N at every derived k below the cap
    for (n <- Seq(1L, 2048L, 2049L, 100000L, 123456789L)) {
      val k = Similarity.derivedNlist(n).toLong
      assert(k * k * 8 >= n || k == (1 << 20), s"occupancy violated at n=$n k=$k")
    }
  }

  // ---- planted-cardinality E2E ----------------------------------------

  private val Dim = 16

  /** Deterministic pseudo-random corpus in the embeddings schema (the
    * BandScaleSpec generator): component j of vector id =
    * (xxhash64(id, j) mod 2001 − 1000)/1000.
    */
  private def synthCorpus(n: Long): String = {
    val dir = scratchDir(s"graft-ivfscale-$n")
    spark.range(n).select(
      col("id").as("vec_id"),
      array((0 until Dim).map(j =>
        ((pmod(xxhash64(col("id"), lit(j)), lit(2001)) - 1000) / 1000.0)
          .cast("float")): _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Per-query candidate rows the probe join scans at nprobe = 4 —
    * the IVF cost axis — through the real codebook/assignment/probe
    * machinery (the AnnCodebookSpec candidate counter, over the first
    * ten vectors as queries like the registered rows).
    */
  private def perQueryLoad(dir: String, nlist: Int): Double = {
    val cb = Similarity.ivfCodebook(spark, dir, nlist).get
    val (nCells, cellSims) = cb
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(transform(col("v"), x => x * x),
        lit(0.0), (a, x) => a + x)))
      .withColumn("cs", cellSims(col("v"), col("nrm")))
      .withColumn("cell", array_position(col("cs"), array_max(col("cs"))).cast("int"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        explode(slice(
          transform(
            reverse(array_sort(zip_with(col("cs"), sequence(lit(1), lit(nCells)),
              (s, i) => struct(s.as("s"), i.as("i"))))),
            p => p.getField("i")),
          1, 4)).as("cell"))
    emb.select(col("vec_id"), col("cell")).join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("qid")).count() / 10.0
  }

  test("8× the corpus: derived nlist keeps per-query scan sublinear; " +
    "the fixed-16 knob measurably does not") {
    val nLo = 2000L   // at the boundary → derived nlist = 16
    val nHi = 16000L  // 8× → derived nlist = 64
    val dirLo = synthCorpus(nLo)
    val dirHi = synthCorpus(nHi)

    // the real derivation path (corpus count → cell count)
    assert(Similarity.corpusNlist(spark, dirLo) === 16)
    assert(Similarity.corpusNlist(spark, dirHi) === 64)

    val loadLoDerived = perQueryLoad(dirLo, 16)
    val loadHiDerived = perQueryLoad(dirHi, 64)
    val loadHiFixed = perQueryLoad(dirHi, 16)
    info(f"per-query candidates at 4 probes: N=$nLo derived=$loadLoDerived%.0f; " +
      f"N=$nHi derived=$loadHiDerived%.0f fixed16=$loadHiFixed%.0f")

    // fixed knob: cell population ∝ N, so 8× the corpus ≈ 8× the scan
    // (isotropic corpus → balanced cells; allow slack for skew)
    assert(loadHiFixed / loadLoDerived >= 4.0,
      s"expected the fixed knob's linear reversion at 8× N " +
        s"(lo=$loadLoDerived hiFixed=$loadHiFixed)")
    // derived knob: k grows 16→64, so the scan grows ≈ 8×/4 = 2× — the
    // √N shape; 3.2× is the generous ceiling (allows 60% cell skew)
    assert(loadHiDerived / loadLoDerived <= 3.2,
      s"derived nlist failed to hold the scan sublinear " +
        s"(lo=$loadLoDerived hiDerived=$loadHiDerived)")
    // and the derived scan is strictly cheaper than the fixed one
    assert(loadHiDerived < loadHiFixed / 2.0,
      s"derived should scan ≤ half of fixed at 8× N " +
        s"(derived=$loadHiDerived fixed=$loadHiFixed)")
  }
}
