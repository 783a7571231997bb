package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational, Similarity, TextOps}

/** Round-6 pipeline operators: quality-aware canonical selection,
  * duplicated-span fraction, bloom-prefiltered incremental dedup,
  * weighted systematic sampling, integer-exact k-means, CDC merge.
  *
  * Fixture doc geometry (see [[Fixtures]]): doc0 = doc1 exactly,
  * doc2 is a one-token edit of doc0, doc3 unrelated, doc4 a
  * permutation of doc0. Components are {0,1,2}, {3}, {4}.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkFixture {

  test("dedup_canonical keeps the biggest member per component, ties to min id") {
    val got = Dedup.dedupCanonical(spark, fixtureDir).collect().toSet
    // comp {0,1,2}: doc0/doc1 have 150 chars, doc2 has 149 → doc0 on the tie
    assert(got === Set(
      Row(0L, 0L, 150L, 3L),
      Row(3L, 3L, 150L, 1L),
      Row(4L, 4L, 150L, 1L)))
  }

  test("span_dup_fraction counts exactly the 8-gram positions shared across docs") {
    val got = Dedup.spanDupFraction(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 40 tokens → 33 8-gram positions per doc; doc2 differs only in
    // token 40, which only the last gram covers
    assert(got === Map(
      0L -> ((33L, 33L, 1.0)),
      1L -> ((33L, 33L, 1.0)),
      2L -> ((33L, 32L, 32.0 / 33.0)),
      3L -> ((33L, 0L, 0.0)),
      4L -> ((33L, 0L, 0.0))))
  }

  test("dedup_bloom_prefilter flags exactly the batch docs duplicating the standing corpus") {
    import spark.implicits._
    val dir = scratchDir("graft-bloom")
    // ids 0..9 → cut = 7: standing {0..7}, batch {8, 9};
    // doc8 duplicates doc0 (and doc5 duplicates doc0 inside standing —
    // the canonical keeper must be the MIN standing id), doc9 is novel
    val texts = Seq(
      0L -> "alpha beta gamma", 1L -> "one", 2L -> "two", 3L -> "three",
      4L -> "four", 5L -> "alpha beta gamma", 6L -> "six", 7L -> "seven",
      8L -> "alpha beta gamma", 9L -> "nine")
    texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupBloomPrefilter(spark, dir).collect().toSet
    assert(got === Set(Row(8L, 0L)))
  }

  test("bloom prefilter agrees with dedup_incremental's standing-corpus dups at sf0.001") {
    // same probe semantics: incremental's rows whose canonical is a
    // STANDING doc (dup_of <= cut) are exactly the bloom query's output
    val dir = "/root/testdata/sf0.001"
    val cut = Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.expr("max(doc_id) * 8 div 10")).head().getLong(0)
    val incremental = Dedup.dedupIncremental(spark, dir).collect()
      .filter(_.getLong(1) <= cut).map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Dedup.dedupBloomPrefilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom === incremental)
  }

  /** Independent Scala replay of the systematic PPS sample. */
  private def replaySample(dir: String, k: Int = 100, shards: Int = 32): Set[(Long, Long, Long)] = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) => (id % shards, id) }
    val total = docs.map(_._2).sum
    if (total == 0) return Set.empty
    val stride = math.max(total / k, 1L)
    var cum = 0L
    docs.flatMap { case (id, w) =>
      val start = cum; cum += w
      val nextMult = ((start + stride - 1) / stride) * stride
      if (nextMult < cum) Some((id, w, start)) else None
    }.toSet
  }

  test("weighted_sample matches an independent replay on fixture and sf0.001") {
    for (dir <- Seq(fixtureDir, "/root/testdata/sf0.001")) {
      val got = TextOps.weightedSample(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === replaySample(dir), s"dir=$dir")
      assert(got.nonEmpty)
    }
  }

  test("kmeans_train runs two exact integer Lloyd iterations") {
    import spark.implicits._
    val dir = scratchDir("graft-kmeans")
    // two clean clusters around (100,0) and (0,100); init = vecs 0,1
    Seq(
      (0L, Seq(100f, 0f), 0), (1L, Seq(0f, 100f), 1),
      (2L, Seq(90f, 10f), 0), (3L, Seq(10f, 90f), 1),
      (4L, Seq(80f, 20f), 0), (5L, Seq(20f, 80f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.kmeansTrain(spark, dir, k = 2).collect().toSet
    // per-vector max-abs scaling → codes (127,0),(0,127),(127,14),
    // (14,127),(127,31),(31,127); both rounds assign {0,2,4} / {1,3,5};
    // centroid = trunc(mean): (127, trunc(45/3)=15) and its mirror
    assert(got === Set(
      Row(0L, 0L, 3L, 127L), Row(0L, 1L, 3L, 15L),
      Row(1L, 0L, 3L, 15L), Row(1L, 1L, 3L, 127L)))
  }

  test("dedup_semantic recovers every exact embedding near-dup pair on separable clusters") {
    // fixture embeddings: 60 vectors in 3 well-separated clusters
    // (label = vec_id % 3); init vectors 0,1,2 land one per cluster, so
    // the k=3 cells converge onto the labels and the within-cell pairs
    // are EXACTLY the >=0.9-cosine pairs — recall 1.0 here, by design
    val exact = Similarity.dedupEmbedding(spark, fixtureDir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val semantic = Similarity.dedupSemantic(spark, fixtureDir, k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 3 * (20 * 19) / 2) // all within-cluster pairs
    assert(semantic === exact)
  }

  test("bpeTrain learns the classic low/lower/lowest merge sequence") {
    import spark.implicits._
    val dir = scratchDir("graft-bpe")
    Seq((0L, "low low low lower lowest", "en", "s", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = TextOps.bpeTrain(spark, dir, rounds = 3)
    // (l,o) ties (o,w) at 5 → lexicographic; then (lo,w)=5; then (low,e)=2
    assert(merges === Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)))

    // encode replays the same merges per token: low → [low],
    // lower → [lowe, r], lowest → [lowe, s, t]
    val enc = TextOps.bpeEncode(spark, dir, rounds = 3).collect()
    assert(enc.length === 1)
    assert(enc(0).getLong(1) === 5L) // n_tokens
    assert(enc(0).getLong(2) === 8L) // n_pieces: 1+1+1+2+3
    assert(enc(0).getString(3) === "low low low lowe r lowe s t")
  }

  test("orders_cdc_merge applies update/delete/insert with latest-version-wins") {
    val orders = Tables.orders(spark, fixtureDir)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = orders.flatMap { case (k, c, p) =>
      k % 10 match {
        case m if m < 3 => Seq((k, c, p + 100.0, "U"))
        case 5          => Seq.empty // deleted
        case 3 | 4      => Seq((k, c, p, "keep"), (k + 1000000000L, c, p, "I"))
        case _          => Seq((k, c, p, "keep"))
      }
    }.toSet
    val got = Relational.ordersCdcMerge(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
