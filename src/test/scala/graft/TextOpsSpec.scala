package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite with SparkFixture {

  test("wordcount counts tokens across all documents") {
    val got = TextOps.wordcount(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("w1") === 4L) // docs 0, 1, 2, 4
    assert(got("w40") === 3L) // docs 0, 1, 4 (doc2 replaced it with zz)
    assert(got("zz") === 1L)
    assert(got("x7") === 1L)
    assert(got.values.sum === 200L) // 5 docs x 40 tokens
  }

  test("text_stats matches hand-computed counts on doc0") {
    val r = TextOps.textStats(spark, fixtureDir)
      .filter("doc_id = 0").collect().head
    val toks = Fixtures.DocA.split("\\s+").filter(_.nonEmpty)
    assert(r.getLong(1) === Fixtures.DocA.length.toLong)
    assert(r.getLong(2) === toks.length.toLong)
    assert(r.getLong(3) === toks.distinct.length.toLong)
    assert(r.getDouble(4) === toks.map(_.length).sum.toDouble / toks.length)
  }

  test("text_quality ratios match hand-computed counts on doc0") {
    val r = TextOps.textQuality(spark, fixtureDir)
      .filter("doc_id = 0").collect().head
    val s = Fixtures.DocA
    assert(r.getDouble(1) === s.count(_.isLetter).toDouble / s.length)
    assert(r.getDouble(2) === s.count(_.isDigit).toDouble / s.length)
    assert(r.getDouble(3) === 0.0) // no stopwords in synthetic tokens
  }

  test("token_count: w<N> tokens split into letter-run + digit-run") {
    val r = TextOps.tokenCount(spark, fixtureDir)
      .filter("doc_id = 0").collect().head
    assert(r.getLong(1) === 80L) // 40 x ("w" + digits)
    assert(r.getLong(2) === 40L)
  }

  test("lang_id labels stopword-free synthetic text as 'other'") {
    val got = TextOps.langId(spark, fixtureDir).collect()
      .map(_.getString(1)).toSet
    assert(got === Set("other"))
  }

  test("doc_fingerprint is order-sensitive: dup matches, permutation differs") {
    val fp = TextOps.docFingerprint(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === fp(1L)) // identical text
    assert(fp(0L) !== fp(4L)) // permuted tokens → different rolling hash
    assert(fp(0L) !== fp(2L))
  }

  test("winnowing: identical docs share all fingerprints; near-dup shares most") {
    val fps = TextOps.textWinnow(spark, fixtureDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("fp"), r.getAs[Long]("fp_pos"))).toSet)
      .toMap
    assert(fps(0L) === fps(1L)) // exact dup: identical fingerprint sets
    // doc2 differs only in the final token: the guarantee says any
    // shared token run of >= w+k-1 = 6 yields a shared fingerprint
    val sharedHashes = fps(0L).map(_._1) intersect fps(2L).map(_._1)
    assert(sharedHashes.nonEmpty)
    // unrelated doc3 shares nothing with doc0
    assert((fps(0L).map(_._1) intersect fps(3L).map(_._1)) === Set.empty)
  }

  test("ngram_lm_probs: per-context probabilities sum to 1 with exact counts") {
    val rows = TextOps.ngramLmProbs(spark, fixtureDir).collect()
    val byW1 = rows.groupBy(_.getString(0))
    byW1.foreach { case (w1, rs) =>
      val ctx = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum === ctx, s"context total for $w1")
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9, s"probs for $w1")
    }
    // "w1 w2" appears in docs 0, 1 (DocA x2) and 2 (DocC differs only in
    // its final token); permuted DocE has "w2 w1", reversed
    val w1w2 = rows.find(r => r.getString(0) == "w1" && r.getString(1) == "w2")
    assert(w1w2.map(_.getLong(2)) === Some(3L))
  }

  test("vocab_build: dense ids ranked by count desc then token asc") {
    val rows = TextOps.vocabBuild(spark, fixtureDir).collect()
      .sortBy(_.getLong(2))
    assert(rows.map(_.getLong(2)).toSeq === rows.indices.map(_.toLong))
    // ordering invariant: counts non-increasing; ties broken by token asc
    rows.sliding(2).foreach { case Array(a, b) =>
      val ok = a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0))
      assert(ok, s"$a !>= $b")
    }
    // w1..w39 appear in 4 docs (0,1,2,4); w40 in 3; x*/zz fewer
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("w1") === 4L)
    assert(m("w40") === 3L)
  }
}
