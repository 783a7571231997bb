package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 synthetic corpus: determinism, split planning, column
  * pruning, and a scale-stress drive of the dedup pipeline far beyond
  * the shipped testdata.
  */
class SynthSourceSpec extends AnyFunSuite with SparkFixture {

  private def synth(rows: Long, parts: Int = 8) =
    spark.read.format("graft.sources.SynthProvider")
      .option("rows", rows).option("partitions", parts).load()

  test("deterministic rows, partition planning, and column pruning") {
    val df = synth(1000, parts = 7)
    assert(df.rdd.getNumPartitions === 7)
    assert(df.count() === 1000L)
    // partition-layout independence: same content at different splits
    val a = df.select("doc_id", "n_chars").collect().toSet
    val b = synth(1000, parts = 3).select("doc_id", "n_chars").collect().toSet
    assert(a === b)
    // pruning reaches the reader: the BatchScan's output carries ONLY
    // doc_id (the text column is never generated)
    val pruned = synth(1000).select("doc_id")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("BatchScan graft_synth[doc_id"), scan)
    assert(!scan.contains("text"), scan)
  }

  test("minhash LSH dedup finds exactly the planted pairs on 20k synth docs") {
    // per decade of ids {10d, 10d+1 (exact dup), 10d+2 (near dup)}:
    // pairs (base,dup) j=1.0, (base,near) and (dup,near) j≈0.98 — all
    // above the 0.8 threshold → exactly 3 pairs per decade.
    val rows = 20000L
    val dir = scratchDir("graft-synth-scale")
    synth(rows, parts = 16).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val found = graft.operators.Dedup.minhashLsh(spark, dir).count()
    // P(band miss | j >= 0.98) < 1e-14 per pair: the count is exact
    assert(found === 3L * rows / 10)
  }

  test("prefix-filtered inverted index matches LSH exactly on 10k synth docs") {
    val rows = 10000L
    val dir = scratchDir("graft-synth-ngram")
    synth(rows, parts = 16).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // the exact PPJoin-style index and the probabilistic LSH pipeline
    // must agree pair-for-pair at this duplicate density
    val exact = graft.operators.Dedup.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect().toSet
    assert(exact.size === (3L * rows / 10).toInt)
    val lsh = graft.operators.Dedup.minhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect().toSet
    assert(lsh === exact)
  }

  test("planted duplicate structure shows up in dedup at 20x testdata scale") {
    val docs = synth(10000, parts = 16)
    // exact dups: doc_id % 10 == 1 repeats doc_id-1 → 1000 pairs of
    // identical texts → distinct hash groups = 10000 - 1000
    val exactGroups = docs
      .groupBy(sha2(col("text"), 256)).count()
    assert(exactGroups.count() === 9000L)
    assert(exactGroups.filter(col("count") === 2).count() === 1000L)

    // near dups: doc_id % 10 == 2 differs from doc_id-2 in one token;
    // spot-check bigram jaccard via the operator kernel on one pair
    val pair = docs.filter(col("doc_id").isin(10L, 12L))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val t10 = pair(10L).split(" ").toSeq
    val t12 = pair(12L).split(" ").toSeq
    assert(t10.init === t12.init)
    assert(t10.last !== t12.last)
  }
}
