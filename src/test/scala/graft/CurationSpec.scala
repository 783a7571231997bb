package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, EventOps, QualityWeights, TextOps}

/** The synthetic corpus contains no PII and no heavy repetition, so the
  * oracle check alone can't prove those paths do anything — this spec
  * plants fixtures that exercise each rule.
  */
class CurationSpec extends AnyFunSuite with SparkFixture {

  test("dup rate by source: component non-keepers attributed to their source") {
    // cluster {0,1,2} keeps 0 → doc1 (src0) and doc2 (src1) are dups;
    // singletons 3 (src1), 4 (src2) keep themselves
    val got = operators.Curation.dupRateBySource(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "src0" -> ((2L, 1L)),
      "src1" -> ((2L, 1L)),
      "src2" -> ((1L, 0L))))
  }

  /** documents.parquet with planted PII / repetition / contamination. */
  lazy val curDir: String = {
    import spark.implicits._
    val dir = scratchDir("graft-curation")
    val bench = (1 to 20).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      // doc 0 is "benchmark"; corpus doc 10 copies tokens t5..t16 (12
      // tokens = 5 distinct 8-grams), doc 11 is disjoint
      (0L, bench),
      (10L, ((5 to 16).map(i => s"t$i") ++ (1 to 10).map(i => s"u$i")).mkString(" ")),
      (11L, (1 to 30).map(i => s"v$i").mkString(" ")),
      // PII: two emails, one url, one phone
      (12L, "contact a@b.com or c.d@e-f.org via https://x.io/p?q=1 or 555-123-4567 now"),
      // repetition: "a b " * 12 → trigrams all dup after the first two
      (13L, Seq.fill(12)("a b").mkString(" ")),
      (14L, (1 to 24).map(i => s"n$i").mkString(" ")))
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pii_redact replaces emails, urls, phones and counts them") {
    val r = Curation.piiRedact(spark, curDir).filter("doc_id = 12").collect().head
    assert(r.getString(1) ===
      "contact <EMAIL> or <EMAIL> via <URL> or <PHONE> now")
    assert(r.getLong(2) === 4L)
  }

  test("pii_redact leaves clean documents untouched") {
    val rows = Curation.piiRedact(spark, curDir)
      .filter("doc_id IN (11, 14)").collect()
    assert(rows.forall(_.getLong(2) == 0L))
  }

  test("doc_repetition flags the repetitive doc and keeps the varied one") {
    val m = Curation.docRepetition(spark, curDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 13: 24 tokens alternating a/b → 22 trigrams, only 2 distinct
    assert(m(13L).getLong(1) === 22L)
    assert(m(13L).getLong(2) === 2L)
    assert(!m(13L).getBoolean(4))
    // doc 14: all-distinct tokens → dup_frac 0, kept
    assert(m(14L).getDouble(3) === 0.0)
    assert(m(14L).getBoolean(4))
  }

  test("contamination_check finds exactly the overlapping doc and gram count") {
    val rows = Curation.contaminationCheck(spark, curDir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 10L)
    // t5..t16 = 12 shared tokens → 12 - 8 + 1 = 5 shared 8-grams
    assert(rows.head.getLong(1) === 5L)
  }

  test("inverted_index df and capped sorted postings") {
    val m = TextOps.invertedIndex(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("w1").getLong(1) === 4L) // docs 0,1,2,4
    assert(m("w1").getString(2) === "0,1,2,4")
    assert(m("zz").getLong(1) === 1L)
    assert(m("zz").getString(2) === "2")
  }

  test("doc_top_terms ranks by tf desc then term asc with corpus df") {
    val rows = TextOps.docTopTerms(spark, fixtureDir)
      .filter("doc_id = 3").orderBy("rnk").collect()
    // doc 3 tokens x1..x40 all tf=1 → rank by term asc
    assert(rows.map(_.getString(2)).toSeq ===
      Seq("x1", "x10", "x11", "x12", "x13"))
    assert(rows.forall(r => r.getLong(3) == 1L && r.getLong(4) == 1L))
  }

  test("corpus_stats counts within-group exact dups and exact token volumes") {
    val got = Curation.corpusStats(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // src0 = docs 0 and 1, both DocA → 2 docs, 1 distinct text, 1 dup
    val s0 = got("src0")
    assert(s0.getLong(2) === 2L)
    assert(s0.getLong(4) === 1L)
    assert(s0.getAs[Long]("dup_docs") === 1L)
    assert(s0.getLong(3) === 80L) // 2 docs x 40 tokens
    // src1 = docs 2 and 3, distinct → no dups
    assert(got("src1").getAs[Long]("dup_docs") === 0L)
  }

  test("brand_market_share shares sum to 1 with exact per-brand ratios") {
    val rows = graft.operators.Relational.brandMarketShare(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("Brand#1") === ((2L, 2.0 / 3.0)))
    assert(rows("Brand#2") === ((1L, 1.0 / 3.0)))
  }

  test("cohort_retention cohorts by first-event week with integer offsets") {
    val got = EventOps.cohortRetention(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1: events at ref and ref-20d → weeks 2817/2814, cohort 2814
    // user 2: events at ref-14d and ref-30d → weeks 2815/2813, cohort 2813
    assert(got === Set((2814L, 0L, 1L), (2814L, 3L, 1L),
      (2813L, 0L, 1L), (2813L, 2L, 1L)))
  }

  // ---- hashed linear quality classifier + source-mix sampler ----

  /** Independent replay of the operators' md5-derived integers: hex md5
    * via MessageDigest, first 7 hex digits as a 28-bit int.
    */
  private def md5Prefix7(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString.take(7), 16)
  }

  private def tokenWeight(t: String): Long =
    QualityWeights.W((md5Prefix7(t) % 1024L).toInt)

  /** Fixture for the classifier/sampler: one empty-text doc, one
    * single-token doc, a multi-token doc and its token permutation, and
    * a 1000-vs-4 source imbalance for the mix gate.
    */
  lazy val mixDir: String = {
    import spark.implicits._
    val dir = scratchDir("graft-mix")
    val planted = Seq(
      (0L, "", "big"),
      (1L, "hello", "big"),
      (2L, "the quick brown fox jumps", "big"),
      (3L, "fox jumps the brown quick", "big"))
    val bulk = (10L until 1010L).map(i => (i, s"filler d$i", "big")) ++
      (2000L until 2004L).map(i => (i, s"rare r$i", "tiny"))
    (planted ++ bulk).map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("quality_classifier score is bias plus the exact sum of trained bucket weights") {
    val m = Curation.qualityClassifier(spark, mixDir)
      .filter("doc_id < 4").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // empty doc: fold seed leaves the bias, not NULL
    assert(m(0L) === ((QualityWeights.Bias, false)))
    assert(m(1L)._1 === QualityWeights.Bias + tokenWeight("hello"))
    val expected2 = QualityWeights.Bias +
      "the quick brown fox jumps".split(" ").map(tokenWeight).sum
    assert(m(2L)._1 === expected2)
    assert(m(2L)._2 === (expected2 > 0L))
    // bag-of-words: a token permutation scores identically
    assert(m(3L)._1 === expected2)
  }

  test("quality_classifier separates prose from junk: held-out AUC > 0.9") {
    import spark.implicits._
    // The trainer's held-out generator (tools/train_quality.py,
    // offset=5000), replayed in Scala: even docs prose-leaning, odd
    // junk-leaning, lengths spanning the 50-word Gopher floor, up to
    // 40% cross-class contamination. Labels come from the REAL rule
    // suite (gopherRules), scores from the trained classifier — the
    // claim under test is that the learned weights track the published
    // heuristics on data the fit never saw.
    val prose = ("the be to of and that have with it is in for not on as you do at " +
      "this but his by from they we say her she or an will my one all " +
      "would there their what so up out if about who get which go me when " +
      "make can like time no just him know take people into year your good " +
      "some could them see other than then now look only come its over " +
      "think also back after use two how our work first well way even new " +
      "want because any these give day most us great long small own old " +
      "right big high different such why ask men need").split(" ")
    val junk = ("buy cheap casino loan click free win credit $$$ !!! ### 0x1f 0xdead " +
      "111 222222 3333333 99999999 aaaaaaaaaaaaaaaaaaaa zzzzzzzzzzzz " +
      "qqqqqqqqqq href= <div> </div> [url] {json} %%% ~~~ === +++ 4u2 " +
      "l33t w1n n0w fr33 2022 2023 2024 12345 67890").split(" ")
    val off = 5000
    val docs = (0 until 400).map { i =>
      val n = 30 + (i * 7 + off) % 90
      val mix = (i * 13 + off) % 10
      val toks = (0 until n).map { j =>
        val other = (j % 10) < (mix / 2)
        if ((i % 2 == 0) != other) prose((i * 17 + j * 31 + off) % prose.length)
        else junk((i * 11 + j * 23 + off) % junk.length)
      }
      (i.toLong, toks.mkString(" "))
    }
    val dir = scratchDir("graft-quality-auc")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val labels = Curation.gopherRules(spark, dir).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val scores = Curation.qualityClassifier(spark, dir).select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.values.count(identity) > 100 && labels.values.count(!_) > 100,
      "held-out labels must be two-sided for AUC to mean anything")

    // Mann-Whitney AUC over the integer scores (average ranks on ties)
    val sorted = scores.sortBy(_._2)
    val rank = scala.collection.mutable.Map[Long, Double]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      (i until j).foreach(k => rank(sorted(k)._1) = avg)
      i = j
    }
    val pos = scores.collect { case (id, _) if labels(id) => rank(id) }
    val nPos = pos.length.toDouble
    val nNeg = scores.length - nPos
    val auc = (pos.sum - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
    assert(auc > 0.9, s"held-out AUC $auc should beat 0.9")
  }

  test("quality_classifier_trained: in-plan NB beats the baked offline weights " +
    "at its gate and calibrates monotonically") {
    import spark.implicits._
    // A fresh draw of the prose-vs-junk generator (offset 9000 — data
    // neither the offline fit nor the AUC test used). The trained row
    // fits the corpus's OWN gopher labels in-plan; the claims:
    //  (1) its keep decisions agree with the gopher gate strictly
    //      more often than the offline baked weights do,
    //  (2) its score ranks gopher-kept docs above dropped ones
    //      (Mann-Whitney AUC ≥ the baked classifier's), and
    //  (3) calibration is monotone at the ends: the top score tercile
    //      keep-rate exceeds the bottom tercile's.
    val prose = ("the be to of and that have with it is in for not on as you do at " +
      "this but his by from they we say her she or an will my one all " +
      "would there their what so up out if about who get which go me when " +
      "make can like time no just him know take people into year your good").split(" ")
    val junk = ("buy cheap casino loan click free win credit $$$ !!! ### 0x1f 0xdead " +
      "111 222222 3333333 99999999 aaaaaaaaaaaaaaaaaaaa zzzzzzzzzzzz " +
      "qqqqqqqqqq href= <div> </div> [url] {json} %%% ~~~ === +++ 4u2").split(" ")
    val off = 9000
    val docs = (0 until 400).map { i =>
      val n = 30 + (i * 7 + off) % 90
      val mix = (i * 13 + off) % 10
      val toks = (0 until n).map { j =>
        val other = (j % 10) < (mix / 2)
        if ((i % 2 == 0) != other) prose((i * 17 + j * 31 + off) % prose.length)
        else junk((i * 11 + j * 23 + off) % junk.length)
      }
      (i.toLong, toks.mkString(" "))
    }
    val dir = scratchDir("graft-quality-trained")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val labels = Curation.gopherRules(spark, dir).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(labels.values.count(identity) > 100 && labels.values.count(!_) > 100,
      "labels must be two-sided for agreement/AUC to mean anything")
    def collected(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
      df.select("doc_id", "score", "keep").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val baked = collected(Curation.qualityClassifier(spark, dir))
    val trained = collected(Curation.qualityClassifierTrained(spark, dir))

    val agreeBaked = labels.count { case (id, l) => baked(id)._2 == l }
    val agreeTrained = labels.count { case (id, l) => trained(id)._2 == l }
    info(s"gate agreement over ${labels.size}: baked=$agreeBaked trained=$agreeTrained")
    assert(agreeTrained > agreeBaked,
      s"in-plan training should beat offline weights at its own gate " +
        s"($agreeTrained vs $agreeBaked)")

    def auc(scores: Map[Long, (Long, Boolean)]): Double = {
      val sorted = scores.toArray.map { case (id, (s, _)) => (id, s) }.sortBy(_._2)
      val rank = scala.collection.mutable.Map[Long, Double]()
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
        val avg = (i + 1 + j).toDouble / 2.0
        (i until j).foreach(k => rank(sorted(k)._1) = avg)
        i = j
      }
      val pos = sorted.collect { case (id, _) if labels(id) => rank(id) }
      val nPos = pos.length.toDouble
      (pos.sum - nPos * (nPos + 1) / 2.0) / (nPos * (sorted.length - nPos))
    }
    val aucTrained = auc(trained)
    info(f"AUC vs gopher labels: baked=${auc(baked)}%.3f trained=$aucTrained%.3f")
    assert(aucTrained > 0.95, s"trained AUC $aucTrained should beat 0.95 on its gate")
    assert(aucTrained >= auc(baked) - 0.005,
      "training in-plan must not rank worse than the offline fit")

    // end-to-end calibration: top vs bottom score tercile keep-rate
    val byScore = trained.toSeq.sortBy(_._2._1).map(_._1)
    val third = byScore.length / 3
    def keepRate(ids: Seq[Long]): Double =
      ids.count(labels(_)).toDouble / ids.length
    val lo = keepRate(byScore.take(third))
    val hi = keepRate(byScore.takeRight(third))
    info(f"keep-rate by score tercile: bottom=$lo%.2f top=$hi%.2f")
    assert(hi > lo + 0.5,
      s"calibration collapsed: top tercile $hi vs bottom $lo")
  }

  test("source_mix_sample saturates starved sources and replays the gate exactly") {
    val kept = Curation.sourceMixSample(spark, mixDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // tiny: n_s=4, w=2; big: n_s=1004, w=31; w_tot=33, budget=(1008/2)=504
    // quota_tiny = 504*2//33 = 30 > 4 → rate saturates, all 4 kept
    assert((2000L until 2004L).forall(kept.contains))
    // big side: replay the md5 gate — kept iff h*1004 < quota_big*1e6
    val quotaBig = 504L * 31L / 33L
    val bigIds = Seq(0L, 1L, 2L, 3L) ++ (10L until 1010L)
    val expectBig = bigIds.filter(id =>
      (md5Prefix7(s"mix:$id") % 1000000L) * 1004L < quotaBig * 1000000L).toSet
    assert(kept.filter(_._2 == "big").keySet === expectBig)
    // the rebalance bites: big is downsampled near its quota, not kept whole
    assert(expectBig.size < 600 && expectBig.size > 300)
  }

  test("gopher_rules: each rule trips exactly at its published boundary") {
    import spark.implicits._
    val dir = scratchDir("graft-gopher")
    def doc(words: Seq[String]) = words.mkString(" ")
    val texts = Seq(
      // 0: passes everything — 50 words, 2 stopwords, mean len ~3.9
      0L -> doc(Seq("the", "of") ++ Seq.fill(48)("word")),
      // 1: 49 words — one below the count floor, everything else fine
      1L -> doc(Seq("the", "of") ++ Seq.fill(47)("word")),
      // 2: 12-char words push mean length over 10
      2L -> doc(Seq("the", "of") ++ Seq.fill(48)("abcdefghijkl")),
      // 3: exactly 80% alphabetic words — boundary PASSES (>= not >)
      3L -> doc(Seq("the", "of") ++ Seq.fill(38)("word") ++ Seq.fill(10)("123")),
      // 4: 78% alphabetic — below the 80% floor
      4L -> doc(Seq("the", "of") ++ Seq.fill(37)("word") ++ Seq.fill(11)("123")),
      // 5: only ONE distinct stopword (repeated) — stopword gate fails;
      //    mean length 3 sits exactly on the lower bound (passes)
      5L -> doc(Seq.fill(50)("the")))
    texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.gopherRules(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("r_count"), r.getAs[Boolean]("r_len"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_stop"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(0L) === ((true, true, true, true, true)))
    assert(got(1L) === ((false, true, true, true, false)))
    assert(got(2L) === ((true, false, true, true, false)))
    assert(got(3L) === ((true, true, true, true, true)))
    assert(got(4L) === ((true, true, false, true, false)))
    assert(got(5L) === ((true, true, true, false, false)))
  }

  test("dsir_importance keeps target-vocabulary docs regardless of their source") {
    import spark.implicits._
    val dir = scratchDir("graft-dsir")
    val tgtText = (1 to 10).flatMap(_ => Seq("alpha", "beta", "gamma", "delta")).mkString(" ")
    val rawText = (1 to 10).flatMap(_ => Seq("omega", "sigma", "kappa", "theta")).mkString(" ")
    Seq(
      (0L, tgtText, "src0"), // defines the target distribution
      (1L, tgtText, "src0"),
      (2L, rawText, "srcX"), // raw-only vocabulary — below-average affinity
      (3L, rawText, "srcX"),
      (4L, rawText, "srcX"),
      (5L, tgtText, "srcX"), // DSIR's point: target-LIKE doc from a raw source
      (6L, "", "srcX"))      // zero tokens: surfaced, not dropped
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.dsirImportance(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size === 7)
    assert(got(6L) === ((0L, 0L, false)))
    // target-vocab docs beat the corpus-average affinity, raw-only don't
    assert(Seq(0L, 1L, 5L).forall(got(_)._3 === true))
    assert(Seq(2L, 3L, 4L).forall(got(_)._3 === false))
    // scores are bag-of-words sums: identical text → identical score
    assert(got(0L)._2 === got(5L)._2)
    assert(got(0L)._1 === 40L)
  }

  test("ngram novelty: dup docs score zero, partial overlap scores the shared tail") {
    import spark.implicits._
    val dir = scratchDir("graft-novelty")
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base),                                          // introduces all 33 8-grams
      (1L, base),                                          // exact dup: novelty 0
      (2L, ((1 to 39).map(i => s"w$i") :+ "edited").mkString(" ")), // last token edited: 1 novel gram
      (3L, "one two three"),                               // < 8 tokens: zeros, not dropped
      (4L, (1 to 12).map(i => s"u$i").mkString(" ")))      // disjoint vocab: all 5 novel
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.ngramNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      0L -> ((33L, 33L, 1000000L)),
      1L -> ((33L, 0L, 0L)),
      2L -> ((33L, 1L, 30303L)), // only the start-33 gram contains the edit
      3L -> ((0L, 0L, 0L)),
      4L -> ((5L, 5L, 1000000L))))
  }

  test("incremental novelty: batch scores against the standing gram set only") {
    import spark.implicits._
    val dir = scratchDir("graft-novelty-incr")
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // ids 0..12 → cut = 12*8 div 10 = 9: standing {0..9}, batch {10,11,12}
    val standing = (0L to 9L).map(i =>
      (i, if (i == 0L) base else (1 to 10).map(j => s"f${i}_$j").mkString(" ")))
    val batch = Seq(
      (10L, base),                                  // copies a standing doc: 0 novel
      (11L, (1 to 12).map(i => s"v$i").mkString(" ")), // fresh vocab: all 5 novel
      (12L, "one two three"))                       // sub-window: zeros, still surfaced
    (standing ++ batch).map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.ngramNoveltyIncremental(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // only batch docs appear; standing docs are not re-scored
    assert(got === Map(
      10L -> ((33L, 0L, 0L)),
      11L -> ((5L, 5L, 1000000L)),
      12L -> ((0L, 0L, 0L))))
  }

  test("dup matrix: near-dup pairs land in symmetric source cells") {
    // fixture pairs (0,1),(0,2),(1,2) with sources src0,src0,src1
    val got = Curation.dupMatrixBySource(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("src0", "src0", 1L), ("src0", "src1", 2L)))
  }

  test("curation funnel reconciles with its five gate operators, in order") {
    val row = Curation.curationFunnel(spark, fixtureDir).collect().head
    val got = (1 to 5).map(row.getLong) // after lang, gopher, rep, cls, dedup
    def boolMap(df: org.apache.spark.sql.DataFrame, c: String): Map[Long, Boolean] =
      df.select("doc_id", c).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val lang = TextOps.langId(spark, fixtureDir).select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1) != "other")).toMap
    val gop = boolMap(Curation.gopherRules(spark, fixtureDir), "keep")
    val rep = boolMap(Curation.docRepetition(spark, fixtureDir), "keep").withDefaultValue(true)
    val cls = boolMap(Curation.qualityClassifier(spark, fixtureDir), "keep")
    val ded = boolMap(operators.Dedup.dedupComponents(spark, fixtureDir), "keep")
    val ids = lang.keySet
    val stages = List(lang, gop, rep, cls, ded)
    val want = (1 to 5).map(k =>
      ids.count(id => stages.take(k).forall(_(id))).toLong)
    assert(row.getLong(0) === ids.size.toLong)
    assert(got === want, s"funnel $got vs operator-derived $want")
    // cumulative: monotone non-increasing
    assert((row.getLong(0) +: got).sliding(2).forall { case Seq(a, b) => b <= a })
  }

  test("source quality report reconciles with its four source operators") {
    import org.apache.spark.sql.functions.col
    val rep = Curation.sourceQualityReport(spark, fixtureDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // mixed-source fixture: src0 = {0,1}, src1 = {2,3}, src2 = {4}
    assert(rep.keySet === Set("src0", "src1", "src2"))
    assert(rep.values.map(_._1).sum === 5L)
    // reconcile each column against an independent per-operator rollup
    val srcOf = Tables.documents(spark, fixtureDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def bySrc(pairs: Seq[(Long, Long)]): Map[String, Long] =
      pairs.groupBy(p => srcOf(p._1)).view.mapValues(_.map(_._2).sum).toMap.withDefaultValue(0L)
    val gKeep = bySrc(Curation.gopherRules(spark, fixtureDir).select("doc_id", "keep")
      .collect().map(r => (r.getLong(0), if (r.getBoolean(1)) 1L else 0L)).toSeq)
    val qKeep = bySrc(Curation.qualityClassifier(spark, fixtureDir).select("doc_id", "keep")
      .collect().map(r => (r.getLong(0), if (r.getBoolean(1)) 1L else 0L)).toSeq)
    val predEn = bySrc(TextOps.langId(spark, fixtureDir).select("doc_id", "pred_lang")
      .collect().map(r => (r.getLong(0), if (r.getString(1) == "en") 1L else 0L)).toSeq)
    val nPii = bySrc(Curation.piiRedact(spark, fixtureDir).select("doc_id", "n_pii")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val nDocs = bySrc(srcOf.keys.map(id => id -> 1L).toSeq)
    for (s <- rep.keySet) {
      assert(rep(s) === ((nDocs(s), gKeep(s), qKeep(s), predEn(s), nPii(s))),
        s"source $s: report ${rep(s)} vs operators " +
          s"(${nDocs(s)}, ${gKeep(s)}, ${qKeep(s)}, ${predEn(s)}, ${nPii(s)})")
    }
  }

  test("quality calibration reconciles against its two source operators") {
    val scores = Curation.qualityClassifier(spark, curDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gKeep = Curation.gopherRules(spark, curDir)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) 1L else 0L)).toMap
    val expected = scores.keys.groupBy(id => {
      val s = scores(id); s / 500L // same truncating division as the operator
    }).map { case (b, ids) =>
      val n = ids.size.toLong
      val k = ids.map(gKeep).sum
      b -> ((n, k, k * 1000000L / n))
    }
    val got = Curation.qualityCalibration(spark, curDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === scores.size.toLong) // every doc banded once
  }

  test("split leakage: test docs score their train-gram overlap; valid docs excluded") {
    import spark.implicits._
    val dir = scratchDir("graft-leak")
    // md5 split gate: doc 0 → train, 8 & 27 → test, 19 → valid.
    // doc 8 copies tokens t1..t12 from train doc 0 (5 fully-covered
    // 8-grams); doc 27 is disjoint; doc 19 would leak but is valid-split
    val docs = Seq(
      (0L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (8L, (1 to 12).map(i => s"t$i").mkString(" ")),
      (27L, (1 to 12).map(i => s"u$i").mkString(" ")),
      (19L, (1 to 12).map(i => s"t$i").mkString(" ")))
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.splitLeakage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      8L -> ((5L, 5L, 1000000L)),
      27L -> ((5L, 0L, 0L))))
  }

  test("blocklist filter: any banned token drops the doc, clean docs keep") {
    import spark.implicits._
    val dir = scratchDir("graft-block")
    Seq(
      (1L, "clean text only here"),
      (2L, "one dup token sinks it"),
      (3L, "slow and dup both present"),
      (4L, "dupster is not dup-like")) // substring ≠ token: must keep
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.blocklistFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((4L, 0L, true)))
    assert(got(2L) === ((5L, 1L, false)))
    assert(got(3L) === ((5L, 2L, false)))
    assert(got(4L) === ((4L, 0L, true)))
  }

  test("mixture temperature: α=0.25 up-samples the small source; weights sum to 1") {
    // shared fixture token counts per source: src0 = 80 (two 40-token
    // docs), src1 = 80, src2 = 40
    def wq(n: Long): Long =
      math.floor(math.sqrt(math.sqrt(n.toDouble)) * 1e6).toLong
    val wTot = (wq(80) * 2 + wq(40)).toDouble
    val got = Curation.mixtureTemperature(spark, fixtureDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("src0") === ((80L, 0.4, wq(80) / wTot, wq(80) / wTot * 1e6 / 80.0)))
    assert(got("src2") === ((40L, 0.2, wq(40) / wTot, wq(40) / wTot * 1e6 / 40.0)))
    // flattening: the small source's mixture share exceeds its natural
    // share, the big ones' fall below theirs
    assert(got("src2")._3 > 0.2 && got("src0")._3 < 0.4)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-12)
  }

  test("groupReservoirSample: k beyond a stratum's size keeps the whole stratum with contiguous ranks") {
    // fixture strata: src0 = {0,1}, src1 = {2,3}, src2 = {4}; k = 50
    // exceeds every stratum so ALL docs survive — and each stratum's
    // ranks must be exactly 1..n (the two-phase rank must not skip)
    val rows = operators.Curation.groupReservoirSample(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._3)).toSet ===
      Set(("src0", 0L), ("src0", 1L), ("src1", 2L), ("src1", 3L), ("src2", 4L)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq === (1L to g.length.toLong))
    }
    // exact-k: k=1 keeps exactly one doc per stratum
    val k1 = operators.Curation.groupReservoirSample(spark, fixtureDir, k = 1)
      .collect()
    assert(k1.length === 3 && k1.forall(_.getLong(1) === 1L))
  }

  test("dupQualityAssociation: cells reconcile with the two source operators; empty cell guards OR") {
    // fixture: dup cluster {0,1,2} keeps 0 → dups = {1,2}; gopher keeps
    // nothing (40-token docs fail the >=50 count rule) → a = c = 0
    val r = operators.Curation.dupQualityAssociation(spark, fixtureDir)
      .collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 0L && r.getLong(3) === 3L)
    assert(r.isNullAt(4)) // empty quality cells → NULL odds ratio
  }

  test("sourceLangKl: a source matching the corpus mix diverges by exactly zero") {
    // every fixture doc is lang=en → each source's distribution IS the
    // corpus distribution → all log-ratios are ln(1) = 0
    val got = operators.Curation.sourceLangKl(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("src0" -> 0L, "src1" -> 0L, "src2" -> 0L))
  }

  test("momentsBySource: power sums are exact and the derived moments match hand math") {
    val la = Fixtures.DocA.length.toLong
    val lc = Fixtures.DocC.length.toLong
    val ld = Fixtures.DocD.length.toLong
    val got = operators.Curation.momentsBySource(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = got("src0") // two DocA copies: zero variance
    assert(s0.getLong(1) === 2L && s0.getLong(2) === 2 * la)
    assert(s0.getLong(3) === 2 * la * la)
    assert(s0.getDouble(6) === la.toDouble && s0.getDouble(7) === 0.0)
    val s1 = got("src1") // DocC, DocD
    assert(s1.getLong(4) === math.min(lc, ld) && s1.getLong(5) === math.max(lc, ld))
    val mean = (lc + ld).toDouble / 2.0
    assert(math.abs(s1.getDouble(6) - mean) < 1e-12)
  }
}
