package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Unigram-LM tokenizer (SentencePiece hard-EM): structural and
  * reconstruction invariants on the fixture corpus. The cross-engine
  * hash equality of the full training loop is the driver oracle's job;
  * these tests pin the properties that make that loop WELL-FORMED —
  * every word reconstructs from its pieces (a crossed or truncated
  * segmentation, the failure class of the DuckDB two-lambda
  * mis-alignment found during development, breaks this immediately),
  * the model is a valid probability table, and training is
  * deterministic across runs.
  */
class UnigramLmSpec extends AnyFunSuite with SparkFixture {

  test("trained model is a valid integer log-prob table over corpus substrings") {
    val m = TextOps.unigramLmTrain(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(m.nonEmpty)
    // every piece: used (freq > 0), at most maxPieceLen chars, a real
    // substring of some corpus word
    val words = Set(Fixtures.DocA, Fixtures.DocC, Fixtures.DocD, Fixtures.DocE)
      .flatMap(_.split("\\s+"))
    assert(m.forall(_._2 > 0))
    assert(m.forall(_._1.length <= 4))
    assert(m.forall { case (p, _, _) => words.exists(_.contains(p)) })
    // scores are negative micro-nat log-probs, monotone in freq
    assert(m.forall(_._3 < 0))
    val byFreq = m.sortBy(_._2)
    assert(byFreq.zip(byFreq.tail).forall { case (a, b) => a._3 <= b._3 })
    // model total probability is at most 1: scores are floor-quantized
    // ln(freq/total), so exp-summing stays under 1 + quantization slack
    val probSum = m.map(t => math.exp(t._3 / 1e6)).sum
    assert(probSum <= 1.0 + 1e-4, s"prob mass $probSum")
  }

  test("every document reconstructs exactly from its piece sequence") {
    val enc = TextOps.unigramEncode(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(enc.length === 5)
    val texts = Map(0L -> Fixtures.DocA, 1L -> Fixtures.DocA, 2L -> Fixtures.DocC,
      3L -> Fixtures.DocD, 4L -> Fixtures.DocE)
    enc.foreach { case (id, nTok, nPieces, pieces) =>
      val words = texts(id).split("\\s+")
      assert(nTok === words.length.toLong)
      // piece fertility: at least one piece per word, pieces are a
      // (possibly finer) cover — characters are conserved exactly
      assert(nPieces >= nTok)
      assert(pieces.replace(" ", "") === texts(id).replace(" ", ""))
      assert(pieces.split(" ").length.toLong === nPieces)
    }
    // exact-duplicate docs tokenize identically
    val byId = enc.map(e => e._1 -> e._4).toMap
    assert(byId(0L) === byId(1L))
  }

  test("tokenizer comparison reconciles with each encoder's own totals") {
    val cmp = TextOps.tokenizerCompare(spark, fixtureDir).collect()
    assert(cmp.length === 1) // fixture docs are all lang=en
    val r = cmp.head
    assert(r.getString(0) === "en")
    assert(r.getLong(1) === 5L) // n_docs
    val (bw, bp, uw, up) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    // cross-check against the per-doc encoders directly
    val bTot = TextOps.bpeEncode(spark, fixtureDir).collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    val uTot = TextOps.unigramEncode(spark, fixtureDir).collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert((bw, bp) === (bTot.map(_._1).sum, bTot.map(_._2).sum))
    assert((uw, up) === (uTot.map(_._1).sum, uTot.map(_._2).sum))
    // fertility is pieces-per-word in micro units, never below 1.0
    assert(r.getLong(6) === bp * 1000000L / bw)
    assert(r.getLong(7) === up * 1000000L / uw)
    assert(r.getLong(6) >= 1000000L && r.getLong(7) >= 1000000L)
  }

  test("SQL-fold training matches an independent in-memory reference on an adversarial corpus") {
    // crafted stress content: overlap-heavy repeats (abab/aaaa — tie
    // and self-overlap pressure on the DP), shared morphology
    // (prefix/suffix families), plus seeded pseudo-words; one doc per
    // group so word counts differ across docs
    val rng = new scala.util.Random(13)
    val docs = Seq(
      "abab abab aaaa aaab baba ab ba a b",
      "walker walked walking walks talker talked talking talks",
      "zzzz zzz zz z zzzzzz",
      (1 to 30).map(_ => Seq("mon", "ster", "monster", "stermon")(rng.nextInt(4))).mkString(" "),
      (1 to 40).map(_ => (1 to (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(4)).toChar).mkString).mkString(" "))
    val dir = scratchDir("graft-unigram-ref")
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent reference: same seed/score/DP/tie rules, plain Scala
    def refTrain(words: Map[String, Long], vMulti: Int, maxLen: Int,
                 rounds: Int): Map[String, Long] = {
      def lnMicro(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
      val occ = for {
        (w, c) <- words.toSeq; i <- 0 until w.length
        l <- 1 to maxLen if i + l <= w.length
      } yield (w.substring(i, i + l), c)
      val sf = occ.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val multi = sf.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, f) => (-f, p) }.take(vMulti)
      var vocab: Map[String, Long] = sf.filter(_._1.length == 1) ++ multi
      for (_ <- 1 to rounds) {
        val tot = lnMicro(vocab.values.sum)
        val s = vocab.map { case (p, f) => p -> (lnMicro(f) - tot) }
        val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for ((w, c) <- words) {
          val OFF = 16000000000L
          val key = Array.fill[Option[Long]](w.length + 1)(None)
          key(0) = Some(OFF * 256L)
          for (i <- 1 to w.length) {
            var best: Option[Long] = None
            for (j <- math.max(0, i - maxLen) until i) {
              (key(j), s.get(w.substring(j, i))) match {
                case (Some(kj), Some(sc)) =>
                  val cand = (kj / 256L + sc) * 256L + j
                  if (best.forall(_ < cand)) best = Some(cand)
                case _ =>
              }
            }
            key(i) = best
          }
          var pos = w.length
          while (pos > 0) {
            val j = (key(pos).get % 256L).toInt
            counts(w.substring(j, pos)) += c
            pos = j
          }
        }
        vocab = counts.toMap
      }
      vocab
    }

    val wordCounts = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val expected = refTrain(wordCounts, vMulti = 32, maxLen = 4, rounds = 2)
    val got = TextOps.unigramLmTrain(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("training is deterministic across runs") {
    def run(): Seq[(String, Long, Long)] =
      TextOps.unigramLmTrain(spark, fixtureDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run() === run())
  }
}
