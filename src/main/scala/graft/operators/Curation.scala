package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * before (or alongside) dedup: PII scrubbing, intra-document
  * repetition scoring, and benchmark decontamination.
  *
  * Scale posture (100 TB): PII redaction and repetition scoring are
  * purely narrow — per-row regex/array expressions inside whole-stage
  * codegen, no shuffle at all. Decontamination shuffles only n-gram
  * digests (8-byte keys), never document bodies, and the benchmark side
  * of its join is bounded (a benchmark suite is KBs–MBs), so Spark
  * broadcasts it and the corpus side never moves.
  */
object Curation {

  /** PII patterns, shared verbatim between the Spark side and the
    * DuckDB oracle (Java∩RE2 common subset: character classes,
    * bounded/unbounded repeats — no lookaround, no backrefs).
    * Replacement order matters (emails contain dot-runs a URL pattern
    * must not eat first): email → url → phone.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,4}" -> "<EMAIL>",
    "https?://[A-Za-z0-9./_%?=&-]+"                    -> "<URL>",
    "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"               -> "<PHONE>")

  private def redacted(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  private def piiCount(text: Column): Column =
    piiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    }.reduce(_ + _)

  /** C4-style PII scrub: redact emails, URLs, and phone numbers, and
    * count the redactions (the count drives drop-vs-keep policy
    * downstream — docs that are mostly PII get dropped, lightly-touched
    * docs keep the redacted text). Narrow, codegen'd, zero shuffle.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .select(
        col("doc_id"),
        redacted(col("text")).as("clean_text"),
        piiCount(col("text")).as("n_pii"))

  /** Gopher-style repetition quality signal: the fraction of word
    * trigrams that are duplicates of an earlier trigram in the same
    * document, plus the count of the most-repeated trigram. Documents
    * above the duplicate-fraction threshold are flagged for drop.
    * Purely narrow per-doc array math — no shuffle, no tokenized text
    * ever leaves the row.
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    val dupFracMax = 0.20
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(
        col("doc_id"),
        // i is transform's 0-based index; slice is 1-based, so the
        // trigram at i covers tokens i..i+2 = slice(ts, i + 1, 3)
        expr("transform(slice(ts, 1, size(ts) - 2), (x, i) -> concat_ws(' ', slice(ts, i + 1, 3)))")
          .as("tg"))
      .select(
        col("doc_id"),
        size(col("tg")).cast("long").as("n_trigrams"),
        size(array_distinct(col("tg"))).cast("long").as("n_distinct"))
      .withColumn("dup_frac",
        (col("n_trigrams") - col("n_distinct")).cast("double") / col("n_trigrams"))
      .withColumn("keep", col("dup_frac") <= dupFracMax)
  }

  /** Corpus composition report — the dashboard a curation run publishes:
    * per (source, lang), document and token volumes, within-group
    * exact-dup counts (docs minus distinct content hashes — the shuffle
    * key is the 64-char digest, never the text), and mean length as the
    * one int/int double both engines compute identically.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"),
        countDistinct(sha2(col("text"), 256)).as("n_distinct_texts"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("dup_docs", col("n_docs") - col("n_distinct_texts"))
      .withColumn("avg_chars", col("sum_chars").cast("double") / col("n_docs"))

  /** Per-source near-duplication report: how much of each source's
    * volume is redundant under the full near-dup clustering
    * ([[graft.operators.Dedup.dedupComponents]] — exact + jaccard
    * edges, transitive). THE curation dashboard table for crawl
    * triage: a source whose dup fraction spikes is a mirror, a
    * scraper loop, or a re-crawled dump, and gets its acquisition
    * budget cut. Joining the vertex-scale component table (doc_id,
    * keep) back to sources is one broadcast-or-shuffle join on ids;
    * the per-source rollup is partial-agg'd. Pure integer counts —
    * consumers derive the fraction.
    */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir).select(col("doc_id"), col("source"))
      .join(graft.operators.Dedup.componentLabels(spark, dir)
        .select(col("doc_id"), col("keep")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dup_docs"))

  /** Per-document n-gram novelty against the doc_id-ordered prefix
    * corpus: of a document's distinct 8-grams, how many does it
    * introduce (its doc_id is the gram's minimum owner)? A source whose
    * novelty collapses is re-crawling content the corpus already has —
    * the acquisition-ordering signal `dupRateBySource` gives per
    * source, here at per-document resolution and sensitive to PARTIAL
    * overlap (a doc that is 40% recycled boilerplate scores 0.6, which
    * no whole-document dedup notices).
    *
    * Scale shape: grams travel as md5 digests, never text, and are
    * computed ONCE — each gram's min owner comes from a window min over
    * the gram key (one gram-keyed exchange; a groupBy+self-join would
    * re-run the tokenize+md5 explode for the probe side), and the final
    * per-doc rollup is a doc-scale exchange. Zero/short docs surface
    * with zero counts via the left join, not a silent drop. Integer
    * micro-units for the fraction — floored, engine-exact.
    */
  def ngramNovelty(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir)
    val grams = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(ts) - ${n - 1}), " +
          s"i -> md5(array_join(slice(ts, i, $n), ' '))))")).as("g"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val perDoc = grams
      .withColumn("first_doc", min(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(expr("(n_novel * CAST(1000000 AS BIGINT)) DIV n_grams"), lit(0L))
          .as("novelty_micro"))
  }

  /** [[ngramNovelty]]'s standing-index shape: the existing corpus
    * (doc_id ≤ 80% cut, the same convention as
    * [[graft.operators.Dedup.dedupIncremental]]) materializes its
    * distinct gram-digest set once; an ingest batch scores its novelty
    * against THAT set only (batch-internal novelty is out of scope,
    * exactly as the standing index behaves in production — the index
    * updates after the batch is accepted). The acquisition use: score a
    * candidate crawl's marginal value BEFORE paying to ingest it.
    *
    * Scale shape: the standing side is a stored digest table (bucketed
    * by digest at 100 TB, making the probe exchange-free); per-batch
    * cost is the batch's gram explode plus one digest-keyed hash join —
    * batch-sized, never corpus-sized. Batch docs below the gram window
    * surface with zeros via the left join.
    */
  def ngramNoveltyIncremental(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir)
    val cut = docs.agg(expr("max(doc_id) * 8 div 10").as("c"))
    val grams = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(ts) - ${n - 1}), " +
          s"i -> md5(array_join(slice(ts, i, $n), ' '))))")).as("g"))
      .crossJoin(broadcast(cut))
    val standing = grams.filter(col("doc_id") <= col("c"))
      .select(col("g")).distinct().withColumn("seen", lit(1L))
    val scored = grams.filter(col("doc_id") > col("c"))
      .join(standing, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    docs.select(col("doc_id")).crossJoin(broadcast(cut))
      .filter(col("doc_id") > col("c"))
      .select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(expr("(n_novel * CAST(1000000 AS BIGINT)) DIV n_grams"), lit(0L))
          .as("novelty_micro"))
  }

  /** Cross-source near-duplicate matrix: verified minhash pairs
    * ([[graft.operators.Dedup.minhashPortable]]) attributed to their
    * (source, source) cell, symmetric via least/greatest ordering. The
    * off-diagonal cells are the acquisition findings `dupRateBySource`
    * cannot express: which two crawls are mirroring EACH OTHER (and
    * should be deduped jointly or one dropped), vs the diagonal's
    * within-source redundancy.
    *
    * Scale shape: everything downstream of the LSH-bounded pair set is
    * id-scale — two id→source joins (dimension-sized source map, a
    * candidate for broadcast at any real corpus/source ratio) and a
    * rollup to at most |sources|² cells.
    */
  def dupMatrixBySource(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documentsSpread(spark, dir).select(col("doc_id"), col("source"))
    graft.operators.Dedup.minhashPortable(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(
        least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * 8-token n-gram with a benchmark set (here: doc_id < 10 stands in
    * for the eval suite). The benchmark n-gram set is tiny by
    * construction, so Spark broadcasts it and the corpus side is a
    * narrow explode→semi-join-shaped aggregation — the full corpus
    * never shuffles. Output: contaminated docs with the number of
    * distinct shared 8-grams.
    */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val nGram = 8
    def grams(df: DataFrame): DataFrame =
      df.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= nGram)
        .select(col("doc_id"),
          explode(expr(
            s"array_distinct(transform(slice(ts, 1, size(ts) - ${nGram - 1}), " +
              s"(x, i) -> concat_ws(' ', slice(ts, i + 1, $nGram))))")).as("gram"))

    val docs = Tables.documentsSpread(spark, dir)
    val bench = grams(docs.filter(col("doc_id") < 10))
      .select(col("gram")).distinct()
    grams(docs.filter(col("doc_id") >= 10))
      .join(broadcast(bench), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Hashed-feature linear quality classifier (the fastText/CCNet
    * quality-filter shape): every token hashes into one of 1024 feature
    * buckets via an engine-portable md5 bucket, and the document score
    * is the trained bias plus the sum of per-bucket coefficients over
    * the token multiset. The coefficients are [[QualityWeights]] — a
    * logistic regression fit offline by `tools/train_quality.py`
    * against Gopher-rule labels on a deterministic prose-vs-junk
    * corpus, quantized to integers so the DuckDB oracle replays every
    * keep decision exactly (CurationSpec holds the model to AUC > 0.9
    * on a held-out corpus).
    *
    * Scale posture: purely narrow — one codegen'd HOF fold per row
    * against a literal weight array baked into the plan, the hashed
    * text never leaves the row, zero shuffle. At 100 TB this is the
    * cheapest possible full-corpus pass.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val arr = typedLit(QualityWeights.W.toSeq)
    def weightOf(t: Column): Column = {
      val b = conv(substring(md5(t.cast("binary")), 1, 7), 16, 10)
        .cast("long") % QualityWeights.Buckets.toLong
      element_at(arr, (b + 1L).cast("int"))
    }
    Tables.documentsSpread(spark, dir)
      .select(
        col("doc_id"),
        (lit(QualityWeights.Bias) +
          aggregate(TextOps.tokens(col("text")), lit(0L), (acc, t) => acc + weightOf(t)))
          .as("score"))
      .withColumn("keep", col("score") > 0L)
  }

  /** In-plan TRAINED quality classifier — closes the curation stack's
    * last offline artifact: [[qualityClassifier]] scores with weights
    * fit OFFLINE (`tools/train_quality.py`); this row trains the same
    * hashed-feature model shape IN THE ENGINE, end to end, using the
    * [[graft.operators.TextOps.langidHashedConfusion]] recipe — hashed
    * unigram features (1024 md5 buckets), binary Naive Bayes with
    * add-1 smoothing, integer micro-nat logs — against the corpus's
    * own [[gopherRules]] gate as the weak-supervision label (the
    * CCNet/Gopher-style classifier bootstrap: fit a cheap learned
    * scorer on heuristic labels, then gate with the smoother,
    * generalizing score). Output is [[qualityClassifier]]'s shape:
    * (doc_id, score = posterior log-odds in micro-nats, keep =
    * score > 0). Zero-token documents score prior-only (LEFT join,
    * never a silent drop).
    *
    * Integer-exact end to end: every log is floor(ln(int)·10⁶) of an
    * exact integer count, so the DuckDB oracle replays TRAINING and
    * scoring hash-for-hash — no offline artifact left in the loop.
    *
    * Scale shape: one tokenize+hash explode feeds both the per-doc
    * feature counts and the model (partial-agg'd groupBys); the model
    * is ≤ `buckets` slim rows and the class totals/prior are 1-row
    * aggregates — all broadcast BY CONSTRUCTION at any corpus size
    * (the bounded-feature-space property the hashed langid row
    * demonstrated). The only corpus-scale exchanges are the two
    * doc_id-keyed aggregations. QualitySpec pins that the trained
    * scorer reproduces its training gate better than the offline
    * baked weights, and that its calibration is monotone end-to-end.
    */
  def qualityClassifierTrained(spark: SparkSession, dir: String,
      buckets: Int = 1024): DataFrame = {
    def lnMicro(c: Column) =
      floor(log(c.cast("double")) * lit(1000000.0)).cast("long")
    val labels = gopherRules(spark, dir).select(col("doc_id"), col("keep").as("lab"))
    val feats = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        (conv(substring(md5(col("t").cast("binary")), 1, 7), 16, 10)
          .cast("long") % buckets).as("feat"))
      .join(labels, "doc_id")
    val docFeats = feats.groupBy(col("doc_id"), col("feat"))
      .agg(count(lit(1)).as("c_df"))
    val model = feats.groupBy(col("feat"))
      .agg(
        sum(when(col("lab"), 1L).otherwise(0L)).as("c_keep"),
        sum(when(!col("lab"), 1L).otherwise(0L)).as("c_drop"))
    val totals = feats.agg(
      sum(when(col("lab"), 1L).otherwise(0L)).as("n_keep"),
      sum(when(!col("lab"), 1L).otherwise(0L)).as("n_drop"),
      countDistinct(col("feat")).as("v"))
    val priors = labels.agg(
      sum(when(col("lab"), 1L).otherwise(0L)).as("d_keep"),
      sum(when(!col("lab"), 1L).otherwise(0L)).as("d_drop"))
    val evidence = docFeats
      .join(broadcast(model), "feat")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(sum(col("c_df") * (
        lnMicro(col("c_keep") + 1) - lnMicro(col("n_keep") + col("v"))
          - lnMicro(col("c_drop") + 1) + lnMicro(col("n_drop") + col("v"))))
        .as("evidence"))
    labels.select(col("doc_id"))
      .join(evidence, Seq("doc_id"), "left")
      .crossJoin(broadcast(priors))
      .select(col("doc_id"),
        (coalesce(col("evidence"), lit(0L))
          + lnMicro(col("d_keep") + 1) - lnMicro(col("d_drop") + 1)).as("score"))
      .withColumn("keep", col("score") > 0L)
  }

  /** Source-mix rebalancing sampler — the data-mixing step (Pile/Dolma
    * mixture weights, multilingual temperature sampling) that reshapes
    * a corpus toward a target per-source share. Targets are
    * temperature-smoothed (τ = 0.5): source s gets weight
    * ⌊√n_s⌋, a half-corpus token budget is split pro-rata by integer
    * division, and each document passes a deterministic md5 gate with
    * per-source rate quota_s / n_s (rates above 1 saturate to
    * keep-everything automatically). The kept row set is a pure
    * function of the data — identical across engines, runs, and
    * cluster layouts.
    *
    * Scale posture: one partial-agg groupBy bounded by the number of
    * sources (dozens, not rows), two broadcasts of that tiny table, and
    * a narrow hash-gate filter over the corpus scan. No per-source
    * window, no global sort — the 100 TB cost is one pass.
    */
  def sourceMixSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .withColumn("w_s", floor(sqrt(col("n_s").cast("double"))).cast("long"))
    val totals = counts.agg(sum(col("w_s")).as("w_tot"), sum(col("n_s")).as("n_tot"))
    val quotas = counts.crossJoin(broadcast(totals))
      .withColumn("quota", expr("((n_tot DIV 2) * w_s) DIV w_tot"))
      .select(col("source"), col("n_s"), col("quota"))
    val gate = conv(substring(md5(concat_ws(":", lit("mix"), col("doc_id").cast("string"))
      .cast("binary")), 1, 7), 16, 10).cast("long") % 1000000L
    docs.join(broadcast(quotas), "source")
      .filter(gate * col("n_s") < col("quota") * 1000000L)
      .select(col("doc_id"), col("source"))
  }

  /** Gopher quality rules (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A) —
    * the published heuristic filter suite most corpus pipelines start
    * from. The document-level subset that applies to an unstructured
    * token stream:
    *
    *  - word count in [50, 100_000]
    *  - mean word length in [3, 10] chars
    *  - ≥ 80% of words contain at least one alphabetic character
    *  - at least 2 distinct stopwords present, from the paper's own
    *    8-word list (the, be, to, of, and, that, have, with) — the
    *    gate that kills keyword-stuffing and non-prose
    *
    * Every threshold is an integer cross-multiplication (mean length
    * bounds become 3·n ≤ Σlen ≤ 10·n), so the rule bits — and the
    * final keep — replay exactly in the oracle. Purely narrow: one
    * scan, per-row HOFs, no shuffle at all.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    Tables.documentsSpread(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("sum_token_len"),
        size(filter(col("toks"), t => t.rlike("[a-zA-Z]"))).cast("long").as("n_alpha_words"),
        size(array_intersect(array_distinct(col("toks")),
          typedLit(stops))).cast("long").as("n_stop_distinct"))
      .withColumn("r_count", col("n_tokens") >= 50L && col("n_tokens") <= 100000L)
      .withColumn("r_len",
        lit(3L) * col("n_tokens") <= col("sum_token_len") &&
          col("sum_token_len") <= lit(10L) * col("n_tokens"))
      .withColumn("r_alpha", lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_tokens"))
      .withColumn("r_stop", col("n_stop_distinct") >= 2L)
      .withColumn("keep",
        col("r_count") && col("r_len") && col("r_alpha") && col("r_stop"))
  }

  /** The end-to-end keep-decision funnel a curation run publishes: how
    * many documents survive each gate applied in pipeline order —
    * language (anything but 'other'), Gopher heuristics, repetition
    * (duplicate-trigram fraction), the trained classifier, and finally
    * near-dup canonicalization. One row, integer counts; each column is
    * the CUMULATIVE survivor count, so consecutive differences are the
    * per-stage attrition the run reports. Documents too short for the
    * repetition gate (< 3 tokens) pass it vacuously rather than being
    * silently dropped (left join + coalesce true).
    *
    * Scale shape: every signal is the already-verified per-doc operator
    * joined id-to-id (narrow rows through the exchanges); the rollup is
    * a scalar aggregate with map-side partials. At 100 TB these signals
    * are materialized corpus columns and this query is the single scan
    * + one-row reduce it would be there.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir).select(col("doc_id"))
    val l = TextOps.langId(spark, dir)
      .select(col("doc_id"), (col("pred_lang") =!= "other").as("lang_ok"))
    val g = gopherRules(spark, dir).select(col("doc_id"), col("keep").as("gopher_ok"))
    val r = docRepetition(spark, dir).select(col("doc_id"), col("keep").as("rep_ok"))
    val q = qualityClassifier(spark, dir).select(col("doc_id"), col("keep").as("cls_ok"))
    val k = graft.operators.Dedup.componentLabels(spark, dir)
      .select(col("doc_id"), col("keep").as("dedup_ok"))
    docs.join(l, "doc_id").join(g, "doc_id")
      .join(r, Seq("doc_id"), "left").join(q, "doc_id").join(k, "doc_id")
      .withColumn("rep_ok", coalesce(col("rep_ok"), lit(true)))
      .select(
        col("lang_ok").as("s1"),
        (col("lang_ok") && col("gopher_ok")).as("s2"),
        (col("lang_ok") && col("gopher_ok") && col("rep_ok")).as("s3"),
        (col("lang_ok") && col("gopher_ok") && col("rep_ok") && col("cls_ok")).as("s4"),
        (col("lang_ok") && col("gopher_ok") && col("rep_ok") && col("cls_ok")
          && col("dedup_ok")).as("s5"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("n_after_lang"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n_after_gopher"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n_after_repetition"),
        sum(when(col("s4"), 1L).otherwise(0L)).as("n_after_classifier"),
        sum(when(col("s5"), 1L).otherwise(0L)).as("n_after_dedup"))
  }

  /** Per-source quality dashboard — the acquisition-triage table a
    * curation run publishes next to [[dupRateBySource]]: for each
    * source, how many documents pass the Gopher heuristics
    * ([[gopherRules]]), the trained classifier ([[qualityClassifier]]),
    * look English ([[graft.operators.TextOps.langId]]), and how much
    * PII was redacted ([[piiRedact]]). A source whose pass-rates crater
    * gets its crawl budget cut before dedup ever runs.
    *
    * Deliberately a COMPOSITION, not a re-derivation: each signal is
    * the already-verified per-doc operator, joined id-to-id — in
    * production these signals are materialized corpus columns, and
    * this report is exactly the join-and-rollup it would run there
    * (narrow id-keyed rows through the exchanges; Catalyst prunes the
    * unused redacted text off the [[piiRedact]] branch). Per-source
    * integer counts only — consumers derive the rates.
    */
  def sourceQualityReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir).select(col("doc_id"), col("source"))
    val g = gopherRules(spark, dir).select(col("doc_id"), col("keep").as("g_keep"))
    val q = qualityClassifier(spark, dir).select(col("doc_id"), col("keep").as("q_keep"))
    val l = TextOps.langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val p = piiRedact(spark, dir).select(col("doc_id"), col("n_pii"))
    docs.join(g, "doc_id").join(q, "doc_id").join(l, "doc_id").join(p, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("g_keep"), 1L).otherwise(0L)).as("n_gopher_keep"),
        sum(when(col("q_keep"), 1L).otherwise(0L)).as("n_quality_keep"),
        sum(when(col("pred_lang") === "en", 1L).otherwise(0L)).as("n_pred_en"),
        sum(col("n_pii")).as("n_pii"))
  }

  /** DSIR-style importance scoring (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): documents are scored
    * by how much their hashed-unigram distribution resembles a TARGET
    * domain (here the 'src0' source) relative to the raw corpus, and
    * kept when their per-token affinity beats the corpus average.
    *
    * Integer-exact formulation (no log-ratios — libm drift would break
    * cross-engine replay): tokens hash into 1024 md5 buckets; each
    * bucket's importance ratio is ⌊SCALE·(n_target+1)/(n_raw+1)⌋
    * (add-1 smoothed, SCALE = 10⁶, so r ≤ SCALE since target ⊆ raw);
    * a document's score is the sum of its tokens' bucket ratios, and
    * keep = ⌊score/n_tokens⌋ > ⌊SCALE·N_target/N_raw⌋ — both sides
    * floored integer division, identical in every engine. Zero-token
    * documents surface with score 0, keep = false (left join, not a
    * silent drop). Headroom: SCALE·N_target stays under 2⁶³ up to
    * ~9·10¹² target tokens; shard the threshold computation (or drop
    * SCALE to 10³) beyond that.
    *
    * Scale posture: one token-explode pass feeds BOTH the 1024-row
    * bucket-frequency table (partial-agg'd groupBy, bounded by the
    * bucket parameter) and the per-doc sum; the ratio table and the
    * 1-row totals are broadcast (model-scale, like the IVF codebook).
    * No window, no sort — two bounded shuffles over 8-byte keys.
    */
  /** Train→test split-leakage audit: for every TEST-split document, how
    * many of its distinct 8-grams also occur in any TRAIN-split
    * document — [[contaminationCheck]] pointed at the pipeline's OWN
    * split boundary instead of an external benchmark (near-dups that
    * straddle a random split silently inflate eval scores; this table
    * is the pre-training check that catches it). Same deterministic
    * md5 split gate as `train_test_split`, so the audited boundary is
    * exactly the one the training run will use.
    *
    * Scale shape: ONE tokenize+explode pass (grams as 32-char md5
    * digests, never text); train-membership is a window max over the
    * gram-keyed exchange that the per-doc rollup needs anyway — the
    * ngram_novelty window-owner trick, avoiding a second gram explode
    * for the probe side. No broadcast: the train gram set is
    * corpus-scale, unlike contamination_check's benchmark side.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val nGram = 8
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .withColumn("split", TextOps.splitExpr(col("doc_id")))
      .filter(size(col("ts")) >= nGram)
      .select(col("doc_id"), col("split"),
        explode(expr(
          s"array_distinct(transform(slice(ts, 1, size(ts) - ${nGram - 1}), " +
            s"(x, i) -> md5(concat_ws(' ', slice(ts, i + 1, $nGram)))))")).as("g"))
      .withColumn("in_train",
        max(when(col("split") === "train", 1L).otherwise(0L)).over(w))
      .filter(col("split") === "test")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("in_train")).as("n_leaked"))
      .withColumn("leak_micro", expr("(n_leaked * 1000000) div n_grams"))
  }

  /** Classifier reliability table: bucket the hashed-unigram quality
    * score ([[qualityClassifier]]) into fixed-width bands and measure,
    * per band, how often the INDEPENDENT Gopher heuristic gate
    * ([[gopherRules]]) agrees — the calibration check run before
    * trusting a learned quality score to gate a 100 TB corpus (a
    * well-calibrated scorer shows keep-rate rising monotonically with
    * score band). All integer: truncating `div` for the band, micro-
    * unit keep rate. One doc_id-keyed join of two id+flag projections
    * and one band-bounded rollup — document text stays in stage one of
    * each input operator.
    */
  def qualityCalibration(spark: SparkSession, dir: String, width: Long = 500L): DataFrame =
    qualityClassifier(spark, dir).select(col("doc_id"), col("score"))
      .join(gopherRules(spark, dir)
        .select(col("doc_id"), col("keep").cast("long").as("g_keep")), "doc_id")
      .withColumn("bucket", expr(s"score div ${width}L"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("g_keep")).as("n_gopher_keep"))
      .withColumn("keep_rate_micro", expr("(n_gopher_keep * 1000000) div n_docs"))

  /** C4-style blocklist gate: a document is dropped when ANY token hits
    * the banned list (C4 used the "List of Dirty, Naughty …" wordlist;
    * here the list is a 3-token stand-in over the synthetic
    * vocabulary). The list is baked as a literal into a `filter` HOF —
    * per-row codegen'd set membership, zero shuffles, zero joins; a
    * production list of ~10³ terms stays a literal array, and a
    * multi-million-entry list would flip to a broadcast join against
    * the exploded token stream without changing the output contract.
    */
  def blocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    val banned = Seq("dup", "slow", "drop")
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        size(filter(col("ts"), t => t.isInCollection(banned))).cast("long")
          .as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0L)
  }

  def dsirImportance(spark: SparkSession, dir: String): DataFrame = {
    val buckets = 1024L
    val scale = 1000000L
    val docs = Tables.documentsSpread(spark, dir)
    val toks = docs
      .select(col("doc_id"), col("source"), explode(TextOps.tokens(col("text"))).as("t"))
      .withColumn("b",
        conv(substring(md5(col("t").cast("binary")), 1, 7), 16, 10).cast("long") % buckets)
      .select(col("doc_id"), col("source"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bt = toks.groupBy(col("b")).agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n_tgt"))
    val ratio = bt.withColumn("r", expr(s"($scale * (n_tgt + 1)) DIV (n_raw + 1)"))
    val tot = bt.agg(sum(col("n_raw")).as("nr"), sum(col("n_tgt")).as("nt"))
    val perDoc = toks.join(broadcast(ratio.select(col("b"), col("r"))), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("score"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0L)).as("score"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(false))
          .otherwise(expr(s"score DIV n_tokens > ($scale * nt) DIV nr")).as("keep"))
  }

  /** Temperature-scaled source mixture (the multilingual-sampling rule
    * from Conneau et al., "Unsupervised Cross-lingual Representation
    * Learning at Scale" §3.1: sample source i with q_i ∝ p_i^α): given
    * per-source token counts, the sampling weight each source gets in
    * the training mixture at α = 0.25, plus the number of epochs over
    * that source a 1M-token budget implies (how much a small source is
    * up-sampled / a big one down-sampled).
    *
    * α = 0.25 is computed as sqrt(sqrt(n)) — IEEE-754 sqrt is
    * correctly rounded on every engine, so unlike pow(n, 0.25) the
    * per-source weight is bit-identical in Spark and the DuckDB
    * oracle. The weight is then quantized to integer micro-units
    * (floor(w·10⁶)) BEFORE the cross-source total: a double sum over
    * sources would be accumulation-order-dependent, a BIGINT sum is
    * exact in any order, and every emitted double is a single
    * division chain over those exact integers. Scale posture: one
    * partial-agg groupBy bounded by the source count (dozens of
    * rows), then a broadcast of that tiny aggregate — the corpus is
    * scanned once and only (source, count) pairs move.
    */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    val budget = 1000000.0
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), TextOps.tokens(col("text")).as("ts"))
      .select(col("source"), size(col("ts")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"))
      .withColumn("wq",
        floor(sqrt(sqrt(col("n_tokens").cast("double"))) * lit(1000000.0)).cast("long"))
    val tot = perSource.agg(
      sum(col("n_tokens")).as("corpus_tokens"), sum(col("wq")).as("w_tot"))
    perSource.crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("n_tokens"),
        (col("n_tokens").cast("double") / col("corpus_tokens").cast("double"))
          .as("natural_p"),
        (col("wq").cast("double") / col("w_tot").cast("double")).as("mix_q"),
        (col("wq").cast("double") / col("w_tot").cast("double") * lit(budget)
          / col("n_tokens").cast("double")).as("epochs_at_budget"))
  }

  /** Duplication × quality association: the 2×2 table crossing
    * near-dup cluster membership (component non-keepers) with the
    * Gopher quality gate, plus its odds ratio — the measured answer to
    * "are duplicates disproportionately junk", which decides whether
    * dedup should run before the quality gate (cheap filter first) or
    * after. Both signals are the already-verified operators joined
    * id-to-id; the 4 exact integer cells carry one guarded double
    * odds-ratio expression (any empty cell → NULL, not a blowup).
    */
  def dupQualityAssociation(spark: SparkSession, dir: String): DataFrame = {
    val dup = graft.operators.Dedup.componentLabels(spark, dir)
      .select(col("doc_id"), (!col("keep")).as("is_dup"))
    val q = gopherRules(spark, dir).select(col("doc_id"), col("keep").as("q_ok"))
    val cells = dup.join(q, "doc_id")
      .agg(
        sum(when(col("is_dup") && col("q_ok"), 1L).otherwise(0L)).as("a"),
        sum(when(col("is_dup") && !col("q_ok"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("is_dup") && col("q_ok"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("is_dup") && !col("q_ok"), 1L).otherwise(0L)).as("d"))
    cells.select(col("a").as("dup_quality"), col("b").as("dup_junk"),
      col("c").as("uniq_quality"), col("d").as("uniq_junk"),
      when(col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0,
        col("a").cast("double") * col("d").cast("double")
          / (col("b").cast("double") * col("c").cast("double")))
        .as("odds_ratio"))
  }

  /** Per-source language drift: KL divergence of each source's
    * language mix against the corpus mix, in exact micro-nats — the
    * acquisition alarm that fires when one crawl's composition slides
    * away from the corpus it feeds. Works over the labeled `lang`
    * column. All four marginals live on the ≤ sources×langs count
    * table: source and language totals are window sums over it, the
    * corpus total is a 1-row broadcast, and each cell's
    * ln((c_sl·c)/(c_s·c_l)) quantizes to micro-nats before the
    * per-source rollup (integer sums, integer final division).
    */
  def sourceLangKl(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c_sl"))
    val ws = Window.partitionBy(col("source"))
    val wl = Window.partitionBy(col("lang"))
    val total = cells.agg(sum(col("c_sl")).as("c_tot"))
    cells
      .withColumn("c_s", sum(col("c_sl")).over(ws))
      .withColumn("c_l", sum(col("c_sl")).over(wl))
      .crossJoin(broadcast(total))
      .withColumn("lr_micro",
        floor(log((col("c_sl") * col("c_tot")).cast("double")
          / (col("c_s") * col("c_l")).cast("double")) * lit(1000000.0))
          .cast("long"))
      .groupBy(col("source"))
      .agg(max(col("c_s")).as("n_docs"),
        sum(col("c_sl") * col("lr_micro")).as("weighted"))
      .select(col("source"), col("n_docs"),
        expr("weighted div n_docs").as("kl_micro"))
  }

  /** Exact-k deterministic reservoir per source: the k documents with
    * the smallest salted hash in each stratum — a fixed-size,
    * engine-reproducible eval/inspection sample (unlike
    * [[graft.operators.TextOps.stratifiedSample]]'s fixed-RATE gate).
    * Two-phase so no single stratum ever serializes a window over its
    * full membership: phase 1 ranks within (source, hash-bucket) — 16
    * buckets split each stratum's window across the cluster — and
    * keeps k per bucket; phase 2 re-ranks the surviving ≤ 16·k rows
    * per source. The second window's partitions are parameter-bounded
    * (16·k rows), so the classic per-group-window skew cliff never
    * materializes at 100 TB.
    */
  def groupReservoirSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val buckets = 16L
    val h = conv(substring(md5(concat_ws(":", lit("rsv"),
      col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10).cast("long")
    val w1 = Window.partitionBy(col("source"), col("b"))
      .orderBy(col("h"), col("doc_id"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("b", pmod(col("h"), lit(buckets)))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("doc_id"))
  }

  /** Mergeable per-source moments: the (n, Σ, Σx², min, max) tuple
    * over document length that any partial can fold into any other —
    * THE shape distributed telemetry must take, because mean/variance
    * of partials don't merge but raw power sums do. All five
    * accumulators are exact integers (n_chars ≤ ~10⁵ keeps Σx² far
    * under 2⁶³ through petabyte corpora at this row width); the
    * derived mean and variance are per-row divisions on the final
    * #sources-row result, computed from the exact sums so every
    * engine lands the same doubles.
    */
  def momentsBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_len"),
        sum(col("n_chars") * col("n_chars")).as("sum_len2"),
        min(col("n_chars")).as("min_len"), max(col("n_chars")).as("max_len"))
      .select(col("source"), col("n"), col("sum_len"), col("sum_len2"),
        col("min_len"), col("max_len"),
        (col("sum_len").cast("double") / col("n").cast("double")).as("mean_len"),
        ((col("n").cast("double") * col("sum_len2").cast("double")
          - col("sum_len").cast("double") * col("sum_len").cast("double"))
          / (col("n").cast("double") * col("n").cast("double"))).as("var_len"))
}
