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

  test("doc_chunks: boundary docs — empty, sub-window, exact window, exact-multiple, ragged") {
    import spark.implicits._
    // window 8, overlap 2 → stride 6. Doc lengths picked to hit every
    // boundary: 0 (no chunks), 3 (< window: one short chunk), 8
    // (== window: exactly one full chunk), 20 (8 + 2*6: last chunk
    // exactly full), 40 (ragged 4-token tail).
    val dir = scratchDir("graft-chunks")
    def mk(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    Seq((0L, "", "en", "s", 0L), (1L, mk(3), "en", "s", 0L),
      (2L, mk(8), "en", "s", 0L), (3L, mk(20), "en", "s", 0L),
      (4L, mk(40), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val W = 8; val S = 6
    val got = TextOps.docChunks(spark, dir, window = W, overlap = W - S).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap

    // reference implementation: plain Scala sliding window
    val expected = Seq(1 -> 3, 2 -> 8, 3 -> 20, 4 -> 40).flatMap { case (id, n) =>
      val toks = (1 to n).map(i => s"t$i")
      val k = if (n <= W) 0 else (n - W + S - 1) / S
      (0 to k).map { i =>
        val start = i * S
        val len = math.min(n - start, W)
        (id.toLong, i.toLong) ->
          (id.toLong * 1000000L + i, start.toLong, len.toLong,
            toks.slice(start, start + len).mkString(" "))
      }
    }.toMap
    assert(got === expected)
    // empty doc contributes nothing; chunk counts per doc
    assert(!got.keys.exists(_._1 == 0L))
    val counts = got.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts === Map(1L -> 1, 2L -> 1, 3L -> 3, 4L -> 7))
    // coverage: chunks tile [0, n) — last chunk ends exactly at n
    assert(got((3L, 2L))._3 === 8L) // exact-multiple: last chunk full
    assert(got((4L, 6L))._2 === 36L)
    assert(got((4L, 6L))._3 === 4L) // ragged tail
  }

  test("perplexity buckets replay the tertile rank cuts; ties land low") {
    // independent replay: the k-th smallest score, k = ceil(n/3) and
    // ceil(2n/3), must be the broadcast thresholds (all fixture docs
    // share lang 'en', so one stratum covers the logic)
    val scored = TextOps.docPerplexity(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2) / r.getLong(1)).toMap
    val scores = scored.values.toSeq.sorted
    val n = scores.size
    val t1 = scores((n + 2) / 3 - 1)
    val t2 = scores((2 * n + 2) / 3 - 1)
    val got = TextOps.perplexityBuckets(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got.keySet === scored.keySet)
    got.foreach { case (id, b) =>
      val s = scored(id)
      val expect = if (s <= t1) "head" else if (s <= t2) "middle" else "tail"
      assert(b === expect, s"doc $id score $s t1=$t1 t2=$t2")
    }
    // exact dups share a score, so a tie at a threshold keeps them in
    // ONE bucket — no row_number coin flip
    assert(got(0L) === got(1L))
  }

  test("Kneser-Ney probabilities match the hand-computed formula exactly") {
    import spark.implicits._
    val dir = scratchDir("graft-kn")
    // bigrams: (a,b)x2, (a,c)x1, (b,c)x1 → ctx a=3 b=1; N1+(a·)=2,
    // N1+(b·)=1; N1+(·b)=1, N1+(·c)=2; D=3 distinct types
    Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "b c"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.kneserNeyProbs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7)))).toMap
    def kn(cnt: Long, ctx: Long, n1f: Long, n1p: Long, d: Long): Double =
      (cnt.toDouble - 0.75) / ctx + (0.75 * n1f / ctx) * (n1p.toDouble / d)
    assert(got(("a", "b")) === ((2L, 3L, 2L, 1L, 3L, kn(2, 3, 2, 1, 3))))
    assert(got(("a", "c")) === ((1L, 3L, 2L, 2L, 3L, kn(1, 3, 2, 2, 3))))
    assert(got(("b", "c")) === ((1L, 1L, 1L, 2L, 3L, kn(1, 1, 1, 2, 3))))
    // simplex check: a's observed successors {b, c} are the ENTIRE
    // continuation vocabulary, so interpolated KN must sum to exactly 1
    // — the discount mass flows wholly back through p_cont
    assert(kn(2, 3, 2, 1, 3) + kn(1, 3, 2, 2, 3) === 1.0)
  }

  test("trigram Kneser-Ney backoff matches the hand-computed recursion exactly") {
    import spark.implicits._
    val dir = scratchDir("graft-kn3")
    // trigrams: (a,b,c)x2, (a,b,d)x1, (b,c,a)x1
    // ctx(a,b)=3 with 2 successor types; ctx(b,c)=1 with 1
    // type table N1+(·w2w3): (b,c)=1, (b,d)=1, (c,a)=1 → D=3;
    // mid-contexts: N1+(·b·)=2 (2 types), N1+(·c·)=1 (1 type);
    // predecessors: N1+(·c)=N1+(·d)=N1+(·a)=1
    Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b d"), (3L, "b c a"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.trigramKnProbs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9), r.getLong(10), r.getDouble(11)))).toMap
    def pc(tc: Long, tctx: Long, tsucc: Long, pred: Long, d: Long): Double =
      (tc.toDouble - 0.75) / tctx + (0.75 * tsucc / tctx) * (pred.toDouble / d)
    def kn(cnt: Long, ctx: Long, succ: Long, low: Double): Double =
      (cnt.toDouble - 0.75) / ctx + (0.75 * succ / ctx) * low
    assert(got(("a", "b", "c")) ===
      ((2L, 3L, 2L, 1L, 2L, 2L, 1L, 3L, kn(2, 3, 2, pc(1, 2, 2, 1, 3)))))
    assert(got(("a", "b", "d")) ===
      ((1L, 3L, 2L, 1L, 2L, 2L, 1L, 3L, kn(1, 3, 2, pc(1, 2, 2, 1, 3)))))
    assert(got(("b", "c", "a")) ===
      ((1L, 1L, 1L, 1L, 1L, 1L, 1L, 3L, kn(1, 1, 1, pc(1, 1, 1, 1, 3)))))
    // more mass on the twice-seen continuation, all probs in (0,1)
    assert(got(("a", "b", "c"))._9 > got(("a", "b", "d"))._9)
  }

  test("encode_tokens: position-ordered ids, OOV to -1, empty docs surface with []") {
    import spark.implicits._
    val dir = scratchDir("graft-encode")
    // corpus counts: b=3, c=3, a=2. topK=2 with the (cnt DESC,
    // token ASC) tie-break keeps b -> 0 and c -> 1; a is OOV
    Seq((0L, "b a c b"), (1L, "c c"), (2L, ""), (3L, "a b"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.encodeTokens(spark, dir, topK = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) === ((4L, 1L, "0,-1,1,0")))
    assert(got(1L) === ((2L, 0L, "1,1")))
    assert(got(2L) === ((0L, 0L, "")))
    assert(got(3L) === ((2L, 1L, "-1,0")))
  }

  test("sparse TF-IDF knn: identical copy ranks first, ties to lower id, disjoint docs absent") {
    val rows = operators.TextOps.docKnnTfidf(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    // doc 3 (x-words) shares no term with anyone: no candidates, no rows
    assert(byQ.keySet === Set(0L, 1L, 2L, 4L))
    def ranked(q: Long): Seq[Long] = byQ(q).sortBy(_._3).map(_._2).toSeq
    // docs 0, 1 (copies) and 4 (reversed text = same tf vector) share
    // all 40 w-terms and tie exactly; doc 2 misses w40 and scores
    // lower. Equal scores break toward the lower doc_id.
    assert(ranked(0L) === Seq(1L, 4L, 2L))
    assert(ranked(1L) === Seq(0L, 4L, 2L))
    assert(ranked(2L) === Seq(0L, 1L, 4L))
    assert(ranked(4L) === Seq(0L, 1L, 2L))
  }

  test("vocab coverage: top-20 vocab covers exactly the 20 smallest cnt-4 types") {
    // type counts: w1..w39 → 4 (docs 0,1,2,4), w40 → 3, zz/x1..x40 → 1.
    // (cnt desc, token asc) cutoff at 20 keeps the 20 lexicographically
    // smallest of w1..w39, each worth 4 occurrences → covered = 80 of
    // the 200 total; OOV types = 81 − 20 = 61.
    val got = operators.TextOps.vocabCoverage(spark, fixtureDir).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === (("en", 200L, 80L, 120L, 61L)))
  }

  test("frequent tokens: exactly the freq-4 types clear the N/64 bar, exact counts") {
    // N = 200 → threshold cnt > 3.125: w1..w39 (4 each) qualify; w40
    // (3) and all hapaxes fail. MG guarantees freq > 200/65 ≈ 3.08
    // survives the sketch, so the 39 winners cannot be missed.
    val got = operators.TextOps.frequentTokens(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === (1 to 39).map(i => s"w$i" -> 4L).toMap)
  }

  test("misra-gries state never exceeds k and retains a planted majority item") {
    val mg = new graft.functions.MisraGries(3)
    // 100 "hot" + 60 onesies across 60 distinct keys, interleaved
    val stream = (0 until 60).flatMap(i => Seq("hot", s"cold$i") ++
      (if (i % 3 == 0) Seq("hot") else Nil))
    val st = stream.foldLeft(mg.zero)(mg.reduce)
    assert(st.size <= 3)
    assert(st.contains("hot")) // freq 80 of 140 >> N/(k+1)=35
    // merge path: two halves merged equal-or-better retention
    val (l, r) = stream.splitAt(stream.length / 2)
    val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
    assert(merged.size <= 3 && merged.contains("hot"))
  }

  test("term frequency spectrum counts hapaxes and shared terms exactly") {
    val got = operators.TextOps.termFreqSpectrum(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // zz + x1..x40 are hapaxes; w40 is in docs 0/1/4; w1..w39 in 0/1/2/4
    assert(got === Map(1L -> 41L, 3L -> 1L, 4L -> 39L))
  }

  test("bm25 search matches an in-memory reference and ranks short docs above long ones") {
    import spark.implicits._
    val dir = scratchDir("graft-bm25")
    val corpus = Seq(
      1L -> "fast scan",                                     // short, two q0 terms
      2L -> ("fast fast fast scan scan table table " + (1 to 30).map(i => s"n$i").mkString(" ")),
      3L -> "table",
      4L -> "noise blah blah noise",                         // no query terms
      5L -> "window agg group window agg group",
      6L -> "stream join merge",
      7L -> "fast scan table")                               // all three q0 terms, short
    corpus.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent reference: same tokenization, same floor-div integer
    // formula, computed with plain Scala collections
    val queries = Seq(
      0L -> Seq("fast", "scan", "table"), 1L -> Seq("window", "agg", "group"),
      2L -> Seq("stream", "join", "merge"))
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val tf = toks.map { case (id, ts) => id -> ts.groupBy(identity).map { case (w, g) => w -> g.size.toLong } }
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }
    val nDocs = corpus.size.toLong; val total = dl.values.sum
    def score(qid: Long, docId: Long): Long =
      queries.toMap.apply(qid).flatMap { term =>
        tf(docId).get(term).map { f =>
          val idf = (nDocs * 100L) / df(term)
          val normM = 250L + (750L * dl(docId) * nDocs) / total
          (idf * f * 2200L * 1000L) / (f * 1000L + (1200L * normM) / 1000L)
        }
      }.sum
    val expected = queries.map(_._1).flatMap { qid =>
      corpus.map(_._1).filter(score(qid, _) > 0L)
        .sortBy(id => (-score(qid, id), id)).take(10).zipWithIndex
        .map { case (id, i) => (qid, id, i + 1L) }
    }.toSet

    val got = TextOps.bm25Search(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // no-query-term doc never surfaces
    assert(!got.exists(_._2 == 4L))
    // length normalization: doc 1 ("fast scan", dl 2) outranks doc 2
    // (more raw tf for the same terms, dl 37) for query 0
    val q0 = got.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    assert(q0(1L) < q0(2L))
  }

  test("bm25 search over a corpus with no query terms is empty") {
    // fixture docs only contain w*/x*/zz tokens — no standing-query term
    assert(TextOps.bm25Search(spark, fixtureDir).collect().isEmpty)
  }

  test("packing efficiency histogram reconciles with the per-batch rollup") {
    val batches = TextOps.packBatches(spark, fixtureDir).collect()
      .map(r => (r.getLong(3), r.getLong(1)))
      .groupBy(_._1).map { case (b, rows) => (b, rows.map(_._2).sum, rows.size.toLong) }
    val expected = batches.groupBy { case (_, toks, _) => toks * 10 / 8192 }
      .map { case (dec, bs) =>
        dec -> ((bs.size.toLong, bs.map(_._2).sum, bs.map(_._3).sum))
      }
    val got = TextOps.packingEfficiency(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // conservation: every doc and token lands in exactly one decile row
    assert(got.values.map(_._3).sum === 5L)
  }

  test("curriculum order reconciles with perplexity stages and the shuffle order") {
    val stages = TextOps.perplexityBuckets(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> (r.getString(3) match {
        case "head" => 0L; case "middle" => 1L; case _ => 2L
      })).toMap
    val order = TextOps.corpusShuffle(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = TextOps.curriculumOrder(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === stages.keySet) // scoreable docs only
    got.foreach { case (id, (stage, shard, pos)) =>
      assert(stage === stages(id))
      assert((shard, pos) === order(id))
    }
  }

  test("tokenizer fertility reconciles with the per-doc BPE encode counts") {
    val langOf = graft.Tables.documents(spark, fixtureDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = TextOps.bpeEncode(spark, fixtureDir).collect()
      .map(r => (langOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val expected = perDoc.groupBy(_._1).map { case (lang, rows) =>
      val words = rows.map(_._2).sum
      val pieces = rows.map(_._3).sum
      lang -> ((rows.size.toLong, words, pieces, pieces * 1000000L / words))
    }
    val got = TextOps.tokenizerFertility(spark, fixtureDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // pieces >= words always: every word is at least one piece
    got.values.foreach { case (_, words, pieces, f) =>
      assert(pieces >= words); assert(f >= 1000000L)
    }
  }

  test("token PMI: closed-form lift on a planted two-doc corpus") {
    import spark.implicits._
    val dir = scratchDir("graft-pmi")
    // doc1 "a b a b a b": bigrams a·b ×3, b·a ×2; doc2 "c c c c": c·c ×3
    // N = 10 tokens; pairs surviving minCount=3: a·b (3) and c·c (3) → n_pairs 6
    Seq((1L, "a b a b a b"), (2L, "c c c c"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.tokenPmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // lift(a,b) = 1e6·3·10² / (6·3·3) = 5555555 (floored)
    assert(got(("a", "b")) === ((3L, 3L, 3L, 5555555L)))
    // lift(c,c) = 1e6·3·10² / (6·4·4) = 3125000 exactly
    assert(got(("c", "c")) === ((3L, 4L, 4L, 3125000L)))
    assert(got.size === 2) // b·a (cnt 2) pruned by minCount
  }

  test("lexical diversity: all-distinct doc scores exactly 1e6, repeats floor down") {
    import spark.implicits._
    val dir = scratchDir("graft-ttr")
    Seq((1L, "a a b"), (2L, "x y z"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.lexicalDiversity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 2L, 666666L)))
    assert(got(2L) === ((3L, 3L, 1000000L)))
  }

  test("tokenZipfFit: negative slope over the fixture's skewed frequencies") {
    // fixture vocabulary: w1..w39 ×4, w40 ×3, zz + x1..x40 ×1 → 81
    // distinct tokens, frequencies strictly decreasing in rank
    val r = TextOps.tokenZipfFit(spark, fixtureDir).collect().head
    assert(r.getLong(0) === 81L)
    val slope = r.getDouble(1)
    assert(slope < 0.0 && slope > -5.0)
  }

  test("docTokenEntropy: all-distinct tokens give exactly ln(n) micro-nats; repeats reduce it") {
    // every fixture doc has 40 distinct tokens once → Σ c·lnMicro(c) = 0
    // and entropy = floor(ln(40)·10⁶) exactly
    val ln40 = math.floor(math.log(40.0) * 1e6).toLong
    val got = TextOps.docTokenEntropy(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === 5)
    got.values.foreach { case (n, h) => assert(n === 40L && h === ln40) }
  }

  test("stopwordCandidates: the >50% DF gate is strict and counts docs, not occurrences") {
    // fixture: w1..w39 appear in 4 of 5 docs (A, A-dup, C, E) → kept;
    // w40 in 3 of 5 → kept; zz and x* in 1 doc → dropped. Strictness:
    // a token in exactly half the docs must NOT pass (2·df = n_docs)
    val got = TextOps.stopwordCandidates(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("w1") === ((4L, 0.8)))
    assert(got("w40") === ((3L, 0.6)))
    assert(!got.contains("zz") && !got.contains("x1"))
    assert(got.size === 40)
  }

  test("langidNbConfusion: a single-class corpus predicts that class for every doc") {
    // fixture docs are all lang=en → one (en, en, 5) cell
    val got = TextOps.langidNbConfusion(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("en", "en") -> 5L))
    // planted two-class corpus with disjoint vocabularies: perfect diagonal
    import spark.implicits._
    val dir = scratchDir("graft-nb")
    Seq(
      (0L, "aa bb aa bb aa", "xx", "s", 14L), (1L, "bb aa aa bb bb", "xx", "s", 14L),
      (2L, "cc dd cc dd cc", "yy", "s", 14L), (3L, "dd cc cc dd dd", "yy", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextOps.langidNbConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("xx", "xx") -> 2L, ("yy", "yy") -> 2L))
  }

  test("langidHashedConfusion: disjoint character statistics give a perfect " +
    "diagonal; morphology generalizes where exact tokens cannot") {
    import spark.implicits._
    // single-class fixture corpus → one (en, en, 5) cell, like the
    // token model
    val got = TextOps.langidHashedConfusion(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("en", "en") -> 5L))
    // two-class corpus with disjoint character inventories: perfect
    // diagonal. Docs 4/5 hold UNSEEN token forms ("aab", "ccd") whose
    // character bigrams still match their class — the generalization
    // the token model is structurally blind to (its unseen tokens
    // score identically under every class).
    val dir = scratchDir("graft-nb-hashed")
    Seq(
      (0L, "aa bb aa bb aa", "xx", "s", 14L), (1L, "bb aa aa bb bb", "xx", "s", 14L),
      (2L, "cc dd cc dd cc", "yy", "s", 14L), (3L, "dd cc cc dd dd", "yy", "s", 14L),
      (4L, "aab baa aab", "xx", "s", 11L), (5L, "ccd dcc ccd", "yy", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextOps.langidHashedConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("xx", "xx") -> 3L, ("yy", "yy") -> 3L))
    // sub-2-char documents carry no bigram features and must drop,
    // not crash or emit an unscorable row
    val dir2 = scratchDir("graft-nb-short")
    Seq((0L, "a", "xx", "s", 1L), (1L, "bb bb", "yy", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val short = TextOps.langidHashedConfusion(spark, dir2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(short === Map(("yy", "yy") -> 1L))
  }

  test("fingerprintCollisions: exact duplicates collide at every width; widths refine") {
    // fixture: docs 0 and 1 share identical text → at least one
    // collision at every width; distinct counts can only grow (or
    // hold) as the fingerprint widens
    val got = TextOps.fingerprintCollisions(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === Set(24L, 32L, 48L))
    got.values.foreach { case (n, d, c) =>
      assert(n === 5L && c === n - d && c >= 1L)
    }
    assert(got(24L)._2 <= got(32L)._2 && got(32L)._2 <= got(48L)._2)
    // the two identical docs collide even at full width: 48-bit
    // distinct is at most 4 of 5
    assert(got(48L)._2 <= 4L)
  }

  test("boilerplatePrefixes: docs sharing an 8-token opening cluster; unique openings drop") {
    // docs 0, 1 (DocA) and 2 (DocC) all open with w1..w8; DocD and the
    // reversed DocE open differently and are singletons
    val got = TextOps.boilerplatePrefixes(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val prefix = (1 to 8).map(i => s"w$i").mkString(" ")
    assert(got === Map(prefix -> ((3L, 0.6))))
  }

  test("vocabGrowthCurve: all fixture docs fall inside every milestone") {
    // doc_ids 0..4 ≤ 16 → each milestone sees the whole corpus:
    // 5 docs, 200 tokens, 81 distinct
    val rows = TextOps.vocabGrowthCurve(spark, fixtureDir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getLong(1) === 5L)
      assert(r.getLong(2) === 200L)
      assert(r.getLong(3) === 81L)
    }
  }

  test("BPE training: hand-computed 3-merge corpus pins the merge table and vocab") {
    import spark.implicits._
    val dir = scratchDir("graft-bpetrain")
    // word counts: abab x3, abc x2, cc x1
    // round 1 pairs: (a,b)=2*3+1*2=8, (b,a)=3, (b,c)=2, (c,c)=1 -> merge (a,b) cnt 8
    //   rewrite: abab=[ab,ab], abc=[ab,c], cc=[c,c]
    // round 2 pairs: (ab,ab)=3, (ab,c)=2, (c,c)=1 -> merge (ab,ab) cnt 3
    //   rewrite: abab=[abab], abc=[ab,c], cc=[c,c]
    // round 3 pairs: (ab,c)=2, (c,c)=1 -> merge (ab,c) cnt 2
    //   rewrite: abc=[abc]; final vocab: abab:3, abc:2, c:2
    Seq((1L, "abab abc abab"), (2L, "abab abc cc"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = TextOps.bpeTrainTable(spark, dir, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(merges === Seq(
      (1L, "a", "b", 8L), (2L, "ab", "ab", 3L), (3L, "ab", "c", 2L)))
    val vocab = TextOps.bpeVocab(spark, dir, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("abab" -> 3L, "abc" -> 2L, "c" -> 2L))
    // a 4th round exhausts the pair supply gracefully: (c,c) is the
    // only pair left
    val m4 = TextOps.bpeTrainTable(spark, dir, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(m4.last === ((4L, "c", "c", 1L)))
  }
}
