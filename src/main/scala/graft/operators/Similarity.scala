package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Similarity search over the `embeddings` table (`embedding
  * ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - [[topKBrute]]: exact brute-force cosine top-k — the correctness
  *    baseline. Queries are broadcast, candidates stream; cost is
  *    k·N dot products, embarrassingly parallel, no N² pair blowup.
  *  - [[annLsh]]: random-hyperplane LSH — the scale path. Candidates
  *    come from banded signature buckets, so each query only scores a
  *    fraction of the corpus.
  *
  * Dot products use the codegen'd higher-order functions
  * (`zip_with` + `aggregate`) in double precision — no UDF
  * serialization in the hot path.
  */
object Similarity {

  /** Vector-norm pyramid: embeddings banded by log2 of their exact
    * quantized squared L2 norm — the pre-normalization audit that
    * catches near-zero vectors (cosine blows up) and magnitude
    * outliers (dot-product search silently favors them) before any
    * similarity run. Each coordinate quantizes to milli-units first
    * (floor — bit-identical everywhere), so the per-vector Σx² is an
    * exact BIGINT and the band an exact digit count. ≤ 64-row output.
    */
  def embeddingNormBands(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        aggregate(transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000.0)).cast("long")),
          lit(0L), (acc, q) => acc + q * q).as("norm2_milli2"))
      .groupBy((length(bin(col("norm2_milli2") + 1)) - 1).cast("long").as("band"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("norm2_milli2")).as("min_norm2"),
        max(col("norm2_milli2")).as("max_norm2"))

  /** Per-dimension embedding health: n, exact micro-quantized power
    * sums, min/max and the derived mean/variance for each of the
    * `dim` coordinates — the dead/saturated-dimension radar an
    * embedding pipeline checks before PCA or quantization assumes
    * every axis carries signal. Values quantize to exact integer
    * micro-units (floor(x·10⁶) — bit-identical on both engines)
    * BEFORE the posexplode rollup, so the sums are order-free; the
    * output is dim-bounded (64 rows) with derived doubles computed
    * from the exact sums.
    */
  def embeddingDimStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("x") * lit(1000000.0)).cast("long").as("xm"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("xm")).as("sum_micro"),
        sum(col("xm") * col("xm")).as("sum2_micro2"),
        min(col("xm")).as("min_micro"), max(col("xm")).as("max_micro"))
      .select(col("dim"), col("n"), col("sum_micro"), col("min_micro"),
        col("max_micro"),
        (col("sum_micro").cast("double") / col("n").cast("double") / lit(1e6))
          .as("mean"),
        ((col("n").cast("double") * col("sum2_micro2").cast("double")
          - col("sum_micro").cast("double") * col("sum_micro").cast("double"))
          / (col("n").cast("double") * col("n").cast("double")) / lit(1e12))
          .as("variance"))

  // Native codegen'd dot product (graft.functions.ArrayDotProduct):
  // same element-order IEEE accumulation as the HOF formulation
  // `aggregate(zip_with(a,b,x*y), 0.0, +)` it replaces, without the
  // per-element interpreted-lambda overhead.
  private def dot(a: Column, b: Column): Column =
    graft.functions.functions.dot_product(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Embeddings with double-cast vectors and precomputed norms (one pass,
    * per-row, before any join). Spread to full parallelism first — the
    * testdata ships as one row group = one scan partition, which would
    * serialize every downstream dot product — and persisted, because
    * every similarity query consumes this table at least twice (query
    * side + candidate side); the vectors should be cast and normed once,
    * not once per consumer.
    */
  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Exact cosine top-5 for query vectors (vec_id < 10) against the whole
    * corpus. The query side is tiny and explicitly broadcast; the
    * candidate side never shuffles until the per-query top-k reduction.
    * Output is rank-only (ints) so the oracle comparison never hashes a
    * floating-point score.
    *
    * The per-query top-k reduction is the [[graft.functions.TopKBySim]]
    * typed Aggregator: the k-bounded buffer folds map-side, so the one
    * exchange carries ≤k rows per (query, partition) instead of the
    * whole k·N scored stream a window-rank plan would shuffle and sort.
    */
  def topKBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    graft.functions.TopK.perQuery(scored, 5)
  }

  /** Exact embedding-cosine near-duplicate pairs: upper-triangle
    * all-pairs scoring, `sim >= threshold`. This is the correctness
    * baseline the oracle checks (at the registered 0.35 threshold the
    * synthetic corpus has matching pairs; real dedup runs 0.95). The
    * 100 TB path generates candidates with [[annLsh]]-style banding or
    * [[annIvf]] buckets instead of the N² cross join — both verify
    * against this exact scorer in the test suite.
    * Output is id pairs only: both engines compute the cosine with
    * sequential double accumulation, but no float crosses the hash
    * compare.
    */
  def dedupEmbedding(spark: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    val emb = withNorm(spark, dir)
    val a = emb.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** The registered driver-contract entry (threshold 0.35 — see
    * [[dedupEmbedding]]).
    */
  /** Cross-lingual bitext mining — margin-based parallel-pair
    * extraction, the operation a multilingual LLM pipeline runs to
    * harvest translation pairs from a crawl (the LASER/CCMatrix
    * recipe: Artetxe & Schwenk's "ratio" margin). For every
    * (English doc × same-language non-English doc) pair, cosine
    * similarity is normalized by the mean of the two endpoints'
    * top-k neighborhoods in the OTHER language:
    * `margin = sim / ((mx + my) * 0.5)` — raw cosine alone cannot
    * mine because hub vectors sit near everything; the margin
    * denominator cancels hubness. Each English doc keeps its best
    * per-language match when the margin clears `threshold`.
    *
    * Output is ID-ONLY (lang, src_id, tgt_id) — the similarity
    * family's house rule: selection and ranking are FP-stable across
    * engines (pinned left-to-right IEEE dot, ties broken by id);
    * hashed floating-point scores are not.
    *
    * Determinism/parity pins: the top-k neighborhood mean folds the
    * k sims in DESCENDING sorted order (`sort_array` then a
    * sequential `aggregate`), matching the oracle's
    * `list_sort('DESC')` + `list_reduce`; groups smaller than k
    * average what exists (division by the collected count, not k).
    *
    * Scale shape: this is the registered EXACT baseline, the mining
    * twin of [[dedupEmbedding]] — an all-pairs (en × lang) cross
    * score kept as ground truth. The 100 TB path is the REGISTERED
    * [[bitextMineAnn]] (`bitext_mine_ann`): the same margin —
    * literally the same [[marginSelect]] tail — over LSH bucket
    * candidates, with the denominators estimated from each
    * endpoint's candidate top-k; BitextRecallSpec measures its
    * recall against this exact row. Windows partition by
    * (lang, doc) — per-group state is one language slice's matches,
    * never the corpus.
    */
  def bitextMine(spark: SparkSession, dir: String, k: Int = 4,
                 threshold: Double = 1.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("lang"))
    val emb = withNorm(spark, dir)
      .join(langs, col("vec_id") === col("doc_id"))
    val src = emb.filter(col("lang") === "en")
      .select(col("vec_id").as("src_id"), col("v").as("sv"), col("nrm").as("snrm"))
    val tgt = emb.filter(col("lang") =!= "en")
      .select(col("lang"), col("vec_id").as("tgt_id"),
        col("v").as("tv"), col("nrm").as("tnrm"))
      // key the STREAMED side by the first margin window's partition
      // before the fan-out: the broadcast-NL join preserves streamed
      // partitioning, so the (lang, tgt) window over the |en|-times
      // larger scored relation then needs no exchange — the exchange
      // moves to the doc-scale input side where its bytes are trivial
      .repartition(col("lang"), col("tgt_id"))

    // all-pairs exact scores (the baseline's deliberate weakness);
    // persisted once — both direction windows and the margin join
    // consume this relation. The English side rides an explicit
    // broadcast so the planner can never pick a PARTITIONED cartesian
    // (PlanLint's invariant): the streamed target side scans in place.
    val scored = broadcast(src).crossJoin(tgt)
      .withColumn("sim", dot(col("sv"), col("tv")) / (col("snrm") * col("tnrm")))
      .select(col("lang"), col("src_id"), col("tgt_id"), col("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    marginSelect(scored, k, threshold)
  }

  /** The ratio-margin selection shared by [[bitextMine]] (all-pairs
    * scores) and [[bitextMineAnn]] (LSH-candidate scores): average the
    * top-k sims per endpoint in each direction (DESC-sorted sequential
    * fold — the FP-order pin the oracle replays; short groups divide
    * by what exists), and keep each (lang, src) group's best match
    * when `sim / mean(mx, my)` clears the threshold. Operating on
    * whatever `scored` relation the caller supplies is exactly what
    * makes the ANN twin "the SAME margin over ANN candidates": the
    * tail is this one function.
    *
    * Scale shape (rebuilt in r19): every stage is a k-bounded or
    * 1-bounded FOLD with map-side combine, never a corpus-wide window
    * — the old formulation exchanged the full candidate relation
    * three times (two neighborhood row_number windows + the final
    * margin-rank window) and was the dominant shuffle of all three
    * bitext rows (the exact baseline alone moved 48 MB at sf0.1).
    * Now: per-direction neighborhoods are native
    * [[graft.functions.TopSimsAgg]] folds (≤ k sims per endpoint per
    * upstream partition cross the exchange, computed inside the
    * ordinary hash-aggregate on unsafe rows — no object codec on the
    * candidate stream), the margin join's mean relations are
    * endpoint-scale slim (id + double) rows AQE broadcasts at bench
    * scale and sort-merges at corpus scale, and the per-(lang, src)
    * winner is a 1-bounded `max(struct(margin, −tgt, tgt))` fold —
    * higher margin wins, ties to the lower tgt_id, NaN-first double
    * ordering: the exact total order of the replaced `row_number()` —
    * so the pair set, and every oracle hash, is unchanged.
    */
  private def marginSelect(scored: DataFrame, k: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Each direction's top-k mean attaches as a WINDOW aggregate over
    // that endpoint's partition (whole-partition frame → the fold runs
    // once per endpoint and projects onto its rows): no mean relation
    // is ever built or joined back — the join formulation either
    // re-exchanged the candidate relation per mean (sort-merge) or
    // left AQE flapping between broadcast and shuffle on
    // threshold-adjacent sizes, sampling 29–54 MB run to run on the
    // sweep. This shape is exactly two exchanges of the candidate
    // relation — (lang, tgt) then (lang, src) — and the winner fold
    // reuses the second partitioning. Window state is bounded per
    // ENDPOINT (its LSH collision count), never corpus-wide.
    //
    // The neighborhood mean folds INSIDE the aggregate
    // ([[graft.functions.TopSimsMeanAgg]] — the buffer is already
    // DESC-ordered, so its sequential sum / count is the identical
    // IEEE sequence to the old per-row
    // `aggregate(sort_array(sims, DESC), 0.0, +) / size` HOF, which ran
    // interpreted once per candidate row per direction).
    scored
      .withColumn("my", graft.functions.functions
        .top_sims_mean(col("sim"), col("src_id"), k)
        .over(Window.partitionBy(col("lang"), col("tgt_id"))))
      .withColumn("mx", graft.functions.functions
        .top_sims_mean(col("sim"), col("tgt_id"), k)
        .over(Window.partitionBy(col("lang"), col("src_id"))))
      .withColumn("margin", col("sim") / ((col("mx") + col("my")) * lit(0.5)))
      .groupBy(col("lang"), col("src_id"))
      .agg(max(struct(col("margin"), (-col("tgt_id")).as("nt"),
        col("tgt_id").as("tgt"))).as("w"))
      .filter(col("w.margin") >= threshold)
      .select(col("lang"), col("src_id"), col("w.tgt").as("tgt_id"))
  }

  /** [[marginSelect]] for ALL probe levels of a `plevel`-tagged
    * candidate relation in ONE pass — the sweep's margin stage. The
    * per-level marginSelect formulation re-exchanged the (nested)
    * level subsets once per level (3 neighborhood passes + 3 margin
    * joins + 3 winner folds); here each direction's groupBy computes
    * every level's top-k mean as a conditional [[graft.functions
    * .TopSimsAgg]] fold in the same aggregate (a level-p neighborhood
    * is the fold over rows with plevel ≤ p — nested-hamming-ball
    * subsets need no separate scan), the two mean joins run once over
    * the deepest level's relation, and one winner fold emits every
    * level's best match as per-level max-struct columns. Per level
    * the kept k-sets, means, margins, winners and threshold decisions
    * are the EXACT per-level marginSelect values (a group with no
    * level-p rows folds an all-null column → null winner → filtered,
    * matching its absence from the per-level relation), so the sweep
    * rows — and their oracle hashes — are unchanged; only the number
    * of candidate-relation exchanges drops from 3× nested subsets to
    * the one deepest pass.
    */
  private def marginSelectLeveled(leveled: DataFrame, k: Int,
      levels: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.functions.top_sims_mean
    // window-attached per-level means, as in [[marginSelect]] — one
    // WindowExec per direction evaluates every level's conditional
    // fold over the same endpoint partition. The mean folds inside the
    // aggregate (TopSimsMeanAgg): an endpoint with no level-p
    // candidates folds an empty buffer → null — the same ANSI-safe
    // guard the old `when(size(sims) > 0, …)` spelled out — and any
    // ROW with plevel ≤ p puts itself in its own endpoints' level-p
    // folds, so a null mean can never reach a level-p margin.
    def withMeans(df: DataFrame, keyCol: String, otherCol: String,
        prefix: String): DataFrame = {
      val w = Window.partitionBy(col("lang"), col(keyCol))
      levels.foldLeft(df) { (d, p) =>
        d.withColumn(s"$prefix$p",
          top_sims_mean(when(col("plevel") <= p, col("sim")),
            col(otherCol), k).over(w))
      }
    }
    val winnerCols = levels.map { p =>
      max(when(col("plevel") <= p, struct(
        (col("sim") / ((col(s"mx$p") + col(s"my$p")) * lit(0.5))).as("margin"),
        (-col("tgt_id")).as("nt"), col("tgt_id").as("tgt")))).as(s"w$p")
    }
    withMeans(withMeans(leveled, "tgt_id", "src_id", "my"),
      "src_id", "tgt_id", "mx")
      .groupBy(col("lang"), col("src_id"))
      .agg(winnerCols.head, winnerCols.tail: _*)
  }

  /** [[bitextMine]]'s 100 TB path, registered: the SAME ratio-margin
    * selection ([[marginSelect]] — one shared function, not a
    * re-implementation) over LSH candidates instead of the cross
    * product. Candidates are [[lshBands]] bucket collisions between
    * the English side and each non-English language (equi-join on
    * `(band, band_val)` — shuffles by bucket key, never materializes
    * en × lang), each collision exact-cosine re-scored, then deduped
    * as slim (lang, src_id, tgt_id, sim) rows — the
    * [[dedupEmbeddingAnn]] bytes-over-flops trade: the dedupe
    * exchange carries ids + one double, not two 64-dim vectors.
    *
    * Both margin denominators are computed FROM the candidate set
    * (each endpoint's top-k among its collisions): at 100 TB the true
    * neighborhood is unobservable without the cross product, and the
    * margin only needs a hubness estimate — a hub vector collides
    * with many buckets precisely because it is near everything, so
    * its candidate top-k mean tracks its true top-k mean. Recall vs
    * the exact [[bitextMine]] is measured (not assumed) by
    * BitextRecallSpec, the `ann_recall`-style gate.
    *
    * Deterministic by construction (md5 planes, integer band values,
    * pinned FP fold order, id tie-breaks) → the whole pipeline
    * replays in the DuckDB oracle like [[annLsh]]/[[dedupEmbeddingAnn]].
    */
  def bitextMineAnn(spark: SparkSession, dir: String, k: Int = 4,
                    threshold: Double = 1.05,
                    nBits: Int = 0, bandBits: Int = 0,
                    probes: Int = 1): DataFrame = {
    val (banded, bb) = bitextBanded(spark, dir, nBits, bandBits)
    marginSelect(
      bitextScoredAnn(banded, withNorm(spark, dir), bb, probes), k, threshold)
  }

  /** The lang-tagged band relation the mining candidate stage joins
    * over — factored out so [[bitextRecallSweep]] computes the corpus
    * signature pass ONCE and shares it across its probe levels (at
    * 100 TB the nBits-dot-products-per-row pass is a corpus scan; the
    * levels differ only in probe fan-out, which applies on top).
    */
  private def bitextBanded(spark: SparkSession, dir: String,
                           nBits: Int, bandBits: Int): (DataFrame, Int) = {
    val bb = if (bandBits > 0) bandBits else corpusBandBits(spark, dir)
    val langs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("lang"))
    // SLIM rows — (lang, id, band, band_val) only: the probe fan-out
    // multiplies this relation by the hamming-ball size, so vectors
    // must not ride it (they re-join per unique pair downstream)
    (lshBands(spark, dir, nBits, bandBits)
      .join(langs, col("vec_id") === col("doc_id"))
      .select(col("lang"), col("vec_id"), col("band"), col("band_val")), bb)
  }

  /** The candidate stage [[bitextMineAnn]] feeds [[marginSelect]] —
    * the `plevel`-filtered view of [[bitextScoredLeveled]] at its own
    * probe setting.
    */
  private def bitextScoredAnn(banded: DataFrame, vecs: DataFrame, bb: Int,
                              probes: Int): DataFrame =
    bitextScoredLeveled(banded, vecs, bb, probes).drop("plevel")

  /** [[bitextScoredAnn]] with every candidate pair tagged by the
    * MINIMUM probe level that finds it (`plevel` = the smallest
    * popcount over all (band, mask) collisions of the pair). Because
    * probe levels are nested hamming balls, the level-`p` candidate
    * set is exactly `filter(plevel <= p)` of the max-level relation —
    * so [[bitextRecallSweep]] pays the collision join, the cosine
    * re-scores and the pair-dedup exchange ONCE at its top level
    * instead of once per level (the level-0/1 joins are strict
    * subsets of the level-2 one). Grouping by the pair with
    * `min(sim)` replaces the old `distinct`: `sim` is a pure function
    * of the two vectors, bit-identical across duplicate collisions,
    * so the min is exact and deterministic and the exchange still
    * moves slim id+double rows, never vectors.
    */
  private def bitextScoredLeveled(banded: DataFrame, vecs: DataFrame,
                                  bb: Int, maxLevel: Int): DataFrame = {
    // The fan-out rows are SLIM — (id, band, band_val [, mask]),
    // ~28 bytes: carrying 64-double vectors through the hamming-ball
    // expansion made this the registry's largest exchange (87 MB at
    // sf0.1). Vectors re-join ONCE PER UNIQUE PAIR after the dedup
    // group-by — the same bytes-over-flops trade as dedupEmbeddingAnn,
    // applied to the fan-out side: the collision join and pair dedup
    // move ids, the two id-keyed vector joins move each vector once
    // per surviving pair, and the cosine is computed per pair instead
    // of per collision.
    val en = banded.filter(col("lang") === "en")
      .select(col("vec_id").as("src_id"), col("band"), col("band_val"))
    val other = banded.filter(col("lang") =!= "en")
      .select(col("lang"), col("vec_id").as("tgt_id"),
        col("band"), col("band_val"))
    val collided =
      if (maxLevel == 2) {
        // TWO-SIDED split of the level-2 shell: ball(2) is the
        // Minkowski sum ball(1) ⊕ ball(1), so expanding BOTH sides by
        // radius ≤ 1 (1 + b rows each) covers every pair within
        // hamming distance 2 while exchanging 2·(1+b)·rows instead of
        // the one-sided (1 + b + C(b,2))·rows — at the derivation's
        // 45-bit ceiling that is 92× vs 1081× fan-out, and the C(b,2)
        // term that dominated this exchange never materializes. A
        // pair at distance d collides under every (srcMask, tgtMask)
        // split with srcMask⊕tgtMask = diff; the canonical-split
        // filter keeps exactly one per band — (0,0) for d=0, (diff,0)
        // for d=1, the srcMask<tgtMask orientation for d=2 — so the
        // join OUTPUT (and hence the pair set, plevel = popcount sum
        // = d, and every downstream hash) is identical to the
        // one-sided expansion, collision for collision.
        val src = probeExpandMasked(en, bb, "src_mask")
        val tgt = probeExpandMasked(other, bb, "tgt_mask")
        tgt.join(src, Seq("band", "band_val"))
          .filter(col("tgt_mask") === 0L ||
            (col("src_mask") =!= 0L && col("src_mask") < col("tgt_mask")))
          .withColumn("plevel",
            (bit_count(col("src_mask")) + bit_count(col("tgt_mask"))).cast("int"))
          .drop("src_mask", "tgt_mask")
      } else {
        // levels 0/1: the one-sided expansion is already minimal
        // (1 + b rows on the en side — the natural probe side, one
        // source language vs the union of targets); deeper-than-2
        // sweeps would need a radius-⌈L/2⌉ split filter and stay
        // one-sided until a consumer exists.
        other.join(probeExpandLeveled(en, bb, maxLevel), Seq("band", "band_val"))
      }
    collided
      .groupBy(col("lang"), col("src_id"), col("tgt_id"))
      .agg(min(col("plevel")).as("plevel"))
      .join(vecs.select(col("vec_id").as("src_id"),
        col("v").as("sv"), col("nrm").as("snrm")), "src_id")
      .join(vecs.select(col("vec_id").as("tgt_id"),
        col("v").as("tv"), col("nrm").as("tnrm")), "tgt_id")
      .withColumn("sim", dot(col("sv"), col("tv")) / (col("snrm") * col("tnrm")))
      .select(col("lang"), col("src_id"), col("tgt_id"), col("plevel"), col("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** The multi-probe accuracy-cost trade as a registered artifact:
    * for each hamming probe level, the candidate count the level pays
    * (the cost axis — one probed-side fan-out row per mask with
    * popcount ≤ level) against the recall@1 it buys vs the exact
    * all-pairs [[bitextMine]] (the BitextRecallSpec definition:
    * |ann ∩ exact| / |exact| over (lang, src, tgt) winners). One
    * 5-column row per level — the sweep table a deployment reads to
    * pick its probe setting, the LSH twin of the IVF nprobe sweep.
    *
    * Scale shape: the exact denominator is the registered all-pairs
    * baseline (broadcast-bounded like `bitext_mine` itself) and runs
    * ONCE — and so does the candidate stage: one
    * [[bitextScoredLeveled]] pass at the DEEPEST level (collision-
    * bounded by the corpus-derived banding), from which every
    * shallower level is a `plevel` filter, because probe levels are
    * nested hamming balls. The sweep therefore costs max(level
    * fan-outs), not Σ — only the per-level margin selections repeat.
    * Counts fold in-plan (1-row aggregates broadcast-crossJoined, the
    * taskH scalar shape); no data-scaled driver state.
    */
  def bitextRecallSweep(spark: SparkSession, dir: String, k: Int = 4,
                        threshold: Double = 1.05,
                        levels: Seq[Int] = Seq(0, 1, 2)): DataFrame = {
    val exact = bitextMine(spark, dir, k, threshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exactN = exact.agg(count(lit(1)).as("exact_total"))
    // ONE corpus signature pass shared by every level (the levels
    // differ only in the probe fan-out applied on top of it)
    val (banded0, bb) = bitextBanded(spark, dir, 0, 0)
    val banded = banded0.persist(StorageLevel.MEMORY_AND_DISK)
    // ONE collision-join + re-score + pair-dedup pass at the DEEPEST
    // level; each shallower level is a plevel filter of it (the
    // candidate sets are nested hamming balls — see
    // [[bitextScoredLeveled]])
    val leveled = bitextScoredLeveled(banded, withNorm(spark, dir), bb, levels.max)
    // ONE margin pass for every level (conditional folds over the
    // nested level subsets — see [[marginSelectLeveled]]); each
    // shallower level's selections are columns of the same aggregate
    val winners = marginSelectLeveled(leveled, k, levels)
    // Per-level counts FUSED into two single-pass aggregates instead
    // of 3 counts + 3 semi-joins + 3 more counts (§2.4 — the old loop
    // re-scanned the persisted candidate relation once per level and
    // the winner table twice per level, 12 aggregate subtrees in one
    // action):
    //  - candidates_p = one conditional count per level over ONE scan
    //    of the leveled relation (a level is `plevel <= p` of it);
    //  - matched_p / hits_p ride one left join of the winner table
    //    against the exact miner keyed (lang, src_id) — exact holds at
    //    most one row per key (it IS a per-(lang, src) argmax), so the
    //    join never duplicates a winner row, a null-margin level-p
    //    winner fails the threshold predicate exactly like its absence
    //    from the old per-level filter, and the old 3-column semi-join
    //    hit test is the tgt-equality predicate given the key match.
    // Values, rows and hashes are unchanged; the oracle replays the
    // same counts.
    val candCols = levels.map(p =>
      count(when(col("plevel") <= p, lit(1))).as(s"cand$p"))
    val cands = leveled.agg(candCols.head, candCols.tail: _*)
    val statCols = levels.flatMap { p =>
      val sel = col(s"w$p.margin") >= threshold
      Seq(count(when(sel, lit(1))).as(s"matched$p"),
        count(when(sel && col(s"w$p.tgt") === col("ex_tgt"), lit(1))).as(s"hits$p"))
    }
    val stats = winners
      .join(exact.select(col("lang"), col("src_id"), col("tgt_id").as("ex_tgt")),
        Seq("lang", "src_id"), "left")
      .agg(statCols.head, statCols.tail: _*)
    // one row per level EXPLODED from the single fused stat row — a
    // per-level `folded.select(...)` union looked equivalent but each
    // level's column pruning made the three aggregate subtrees
    // non-identical, defeating exchange reuse and re-running the
    // winner join per level (measured 39 → 81 MB sweep shuffle before
    // this explode)
    cands.crossJoin(stats).crossJoin(exactN)
      .select(explode(array(levels.map(p => struct(
        lit(p).as("probes"),
        col(s"cand$p").as("candidates"),
        col(s"matched$p").as("matched"),
        col(s"hits$p").as("hits"),
        // NULL when the exact miner found nothing (empty/degenerate
        // corpus) — ANSI mode would otherwise throw on the 0/0; the
        // oracle replays the same CASE guard
        when(col("exact_total") > 0,
          col(s"hits$p").cast("double") / col("exact_total").cast("double"))
          .as("recall"))): _*)).as("r"))
      .select(col("r.probes"), col("r.candidates"), col("r.matched"),
        col("r.hits"), col("r.recall"))
  }

  def dedupEmbeddingQuery(spark: SparkSession, dir: String): DataFrame =
    dedupEmbedding(spark, dir, threshold = 0.35)

  /** Symmetric int8 quantization of the embedding column — the storage
    * /bandwidth step of a large ANN index (4× smaller vectors, SIMD
    * int8 dot products downstream). Per-vector max-abs scaling,
    * `floor` rounding (exact in IEEE double, so the oracle replays it),
    * output exploded to scalar rows (vec_id, dim_idx, q) — int8 range
    * [-127, 127], zero-vector → all-zero codes. Purely narrow compute.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
    emb
      .select(col("vec_id"), col("ma"), posexplode(col("v")))
      .select(
        col("vec_id"),
        col("pos").cast("long").as("dim_idx"),
        when(col("ma") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(col("col") * 127.0 / col("ma")).cast("long"))))
          .as("q"))
  }

  /** Distance-to-centroid outlier screen over the int8-quantized
    * embedding codes — the per-class prototypicality prune (the
    * complement of [[prototypePrune]]: that drops the REDUNDANT
    * nearest-to-prototype vectors, this flags the SUSPECT farthest
    * ones — mislabeled examples, encoder failures, adversarial junk).
    * A vector is an outlier when its squared distance to its label's
    * centroid exceeds 1.5× the label's mean squared distance (the
    * tail of the observed max/mean ≈ 1.4–1.8 spread on the synthetic
    * clusters); both sides of that frontier are integer
    * cross-multiplied (`2·dist2·n > 3·sum_dist2`), so the flag
    * replays exactly in SQL.
    * Centroid codes are `sum(q) div n` — truncating integer division,
    * identical in Spark and DuckDB (`//`) including negatives.
    *
    * Scale shape: the quantized (vec_id, label, dim, q) stream is a
    * dim-bounded explode of the one embeddings scan; the centroid
    * table is labels×dim (model-scale) and joins back broadcast; the
    * per-vector rollup and the per-label stats are partial-agg'd
    * exchanges of slim integer rows. Headroom: dist2 ≤ dim·254², so
    * dist2·n stays under 2⁶³ beyond 10¹² vectors.
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
    val q = emb
      .select(col("vec_id"), col("label"), col("ma"), posexplode(col("v")))
      .select(col("vec_id"), col("label"), col("pos").cast("long").as("dim_idx"),
        when(col("ma") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(col("col") * 127.0 / col("ma")).cast("long"))))
          .as("q"))
    val cent = q.groupBy(col("label"), col("dim_idx"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))
      .select(col("label"), col("dim_idx"), expr("sum_q div n").as("c"))
    val d2 = q.join(broadcast(cent), Seq("label", "dim_idx"))
      .withColumn("dq", col("q") - col("c"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("dq") * col("dq")).as("dist2"))
    val stats = d2.groupBy(col("label"))
      .agg(count(lit(1)).as("n_label"), sum(col("dist2")).as("sum_dist2"))
    d2.join(broadcast(stats), "label")
      .select(col("vec_id"), col("label"), col("dist2"),
        (col("dist2") * col("n_label") * 2 > col("sum_dist2") * 3).as("is_outlier"))
  }

  /** Integer-exact covariance accumulation over the int8-quantized
    * embedding codes — the d×d Gram/moment matrix PCA, whitening, and
    * OPQ rotation training all start from. Output is the upper
    * triangle (d·(d+1)/2 = 2 080 rows at d = 64): per (dim_i, dim_j)
    * the raw product sum Σ qᵢ·qⱼ plus the per-dimension sums and the
    * vector count, so exact centered covariance assembles downstream as
    * `(sum_qq − sum_qi·sum_qj/n)/n` — model-scale, after the heavy
    * pass. Quantization is [[embeddingQuantize]]'s exact formula, so
    * every value is a BIGINT both engines agree on bit-for-bit
    * (|q| ≤ 127 → per-vector products ≤ 16 129; Σ over 10¹⁰ vectors
    * still ≪ 2⁶³).
    *
    * Scale shape: the upper-triangle pair expansion happens WITHIN each
    * row (nested codegen'd array transforms — no self-join, nothing
    * shuffles vectors), partial aggregation folds the d²-bounded keys
    * map-side, so the one exchange carries ≤ 2 080 rows per upstream
    * partition regardless of corpus size; the 64-row per-dimension sum
    * table joins back broadcast. This is the map-side-Gram pattern
    * distributed PCA uses (compute AᵀA in one pass, eigendecompose the
    * d×d result on the driver as model-scale work).
    */
  /** Dominant principal direction of the int8-quantized embedding
    * second-moment matrix, plus every vector's projection onto it —
    * the PCA step a curation pipeline runs for embedding whitening /
    * outlier screening, kept integer-exact end to end:
    *  - the dim×dim Gram accumulates from [[embeddingQuantize]]'s
    *    exact int8 codes (one doc-scale exchange, dim²-bounded output);
    *  - eight power iterations run on the collected Gram with BigInt
    *    arithmetic, rescaling to ±10⁶ micro-units each round with
    *    truncating division — the identical sequence DuckDB replays in
    *    HUGEINT (both engines truncate toward zero), so the eigenvector
    *    (sign fixed by the all-ones start) is a hash-exact artifact;
    *  - the projection broadcasts the 64-long eigenvector literal and
    *    folds it against each row's codes in one codegen'd pass.
    * Driver state is dim² Gram cells + the dim-length vector —
    * model-scale (like IVF centroids), never data-scale. A zero Gram
    * (all-zero embeddings) fixes the vector at zero in both engines.
    */
  def embeddingPcaProject(spark: SparkSession, dir: String, iters: Int = 8): DataFrame = {
    val quant = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qarr", transform(col("v"), x =>
        when(col("ma") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(x * 127.0 / col("ma")).cast("long"))))))
      .select(col("vec_id"), col("qarr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gram = quant
      .select(explode(flatten(transform(col("qarr"), (qi, i) =>
        transform(col("qarr"), (qj, j) => struct(
          i.cast("long").as("i"), j.cast("long").as("j"), (qi * qj).as("p")))))).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(sum(col("pr.p")).as("g"))
      .collect() // dim²-bounded (64² = 4096 rows): model-scale driver state
    val scale = BigInt(1000000)
    val vec: Array[Long] =
      if (gram.isEmpty) Array.empty
      else {
        val dim = (gram.map(_.getLong(0)).max + 1).toInt
        val g = Array.ofDim[Long](dim, dim)
        gram.foreach(r => g(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
        var v = Array.fill(dim)(scale)
        for (_ <- 1 to iters) {
          val w = Array.tabulate(dim)(i =>
            (0 until dim).map(j => BigInt(g(i)(j)) * v(j)).sum)
          val maxAbs = w.map(_.abs).max
          // BigInt / truncates toward zero — the same semantics as
          // DuckDB's integer // (verified), so the replay is exact
          v = if (maxAbs == 0) Array.fill(dim)(BigInt(0))
              else w.map(x => (x * scale) / maxAbs)
        }
        v.map(_.toLong)
      }
    if (vec.isEmpty)
      quant.select(col("vec_id"), lit(0L).as("proj_micro")).limit(0)
    else {
      val vLit = array(vec.map(lit(_)): _*)
      quant.select(col("vec_id"),
        aggregate(zip_with(col("qarr"), vLit, (q, vv) => q * vv),
          lit(0L), (acc, x) => acc + x).as("proj_micro"))
    }
  }

  def embeddingCovariance(spark: SparkSession, dir: String): DataFrame = {
    val quant = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qarr", transform(col("v"), x =>
        when(col("ma") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(x * 127.0 / col("ma")).cast("long"))))))
      // quant backs BOTH subtrees of the returned lazy plan (pairSums
      // and dims) — the cache must outlive this method, so no unpersist
      // here: freeing it eagerly would recompute the quantization per
      // subtree at action time. The ContextCleaner frees it once the
      // returned plan is dropped.
      .persist(StorageLevel.MEMORY_AND_DISK)
    // within-row upper-triangle expansion: for 0-based i, slice(arr,
    // i+1, d-i) is q_i..q_{d-1}, inner index k ⇒ j = i+k (diagonal in)
    val pairSums = quant
      .select(explode(flatten(transform(col("qarr"), (qi, i) =>
        transform(slice(col("qarr"), i + lit(1), size(col("qarr")) - i),
          (qj, kk) => struct(
            i.cast("long").as("dim_i"),
            (i + kk).cast("long").as("dim_j"),
            (qi * qj).as("p")))))).as("pr"))
      .groupBy(col("pr.dim_i").as("dim_i"), col("pr.dim_j").as("dim_j"))
      .agg(sum(col("pr.p")).as("sum_qq"))
    val dims = quant
      .select(posexplode(col("qarr")))
      .groupBy(col("pos").cast("long").as("dim_idx"))
      .agg(sum(col("col")).as("sum_q"), count(lit(1)).as("n"))
    pairSums
      .join(broadcast(dims.select(col("dim_idx").as("dim_i"),
        col("sum_q").as("sum_qi"), col("n").as("n_vecs"))), Seq("dim_i"))
      .join(broadcast(dims.select(col("dim_idx").as("dim_j"),
        col("sum_q").as("sum_qj"))), Seq("dim_j"))
      .select(col("dim_i"), col("dim_j"), col("sum_qq"),
        col("sum_qi"), col("sum_qj"), col("n_vecs"))
  }

  /** Approximate top-5 via IVF (inverted-file) coarse quantization:
    * vectors are assigned to their nearest of `nlist` centroids; a
    * query scores only vectors in its `nprobe` nearest cells. The
    * codebook is the TRAINED [[ivfCodebook]] (two integer-exact Lloyd
    * rounds, session-memoized); loading it is metadata-scale, like
    * loading a model, and the cell assignment itself is a per-row
    * broadcast computation with native dot products. Deterministic
    * end to end, so the DuckDB oracle replays training, assignment,
    * probe, and re-rank.
    *
    * SIZING at scale: `nlist` DERIVES from corpus cardinality by
    * default ([[derivedNlist]]: the smallest power of two ≥ 16 with
    * k²·8 ≥ N — the standard nlist ≈ √(N/target cell size) sizing,
    * made integer-exact so the oracle replays it). A fixed nlist
    * holds cell population ∝ N, so at 100× the corpus the probed-cell
    * scan reverts toward linear-in-N per query — the same cliff shape
    * the LSH band derivation closed; deriving k ∝ √N bounds the scan
    * at nprobe·8·√(N/8) = O(√N). `nprobe` stays a deployment knob —
    * it trades recall against scan fraction directly, the right
    * setting depends on the corpus's cluster structure and latency
    * budget, and the registered `ann_nprobe_sweep` row prices that
    * trade per corpus. Both thread through every variant here, and
    * the codebook trainer is k-agnostic (dedup_semantic already
    * trains at k=64 on the same machinery).
    */
  def annIvf(spark: SparkSession, dir: String, nlist: Int = 0, nprobe: Int = 4): DataFrame =
    annIvfWith(spark, dir,
      ivfCodebook(spark, dir, resolveNlist(spark, dir, nlist)), nprobe)

  /** [[annIvf]] against an explicit codebook and query set — the
    * codebook-comparison hook AnnCodebookSpec drives with the trained
    * book vs the first-N control over the same corpus and queries.
    */
  private[graft] def annIvfWith(spark: SparkSession, dir: String,
      codebook: Option[(Int, (Column, Column) => Column)], nprobe: Int,
      queryPred: Column = col("vec_id") < 10): DataFrame = {
    val emb = withNorm(spark, dir)
    val (nCells, cellSims) = codebook
      .getOrElse(return emptyProbeFrame(spark))

    val assigned = emb
      .withColumn("cs", cellSims(col("v"), col("nrm")))
      .withColumn("cell", array_position(col("cs"), array_max(col("cs"))).cast("int"))
      .drop("cs")
      // cell assignment (nlist dot products per row) feeds both the probe
      // side and the candidate side — compute it once
      .persist(StorageLevel.MEMORY_AND_DISK)

    // query → its nprobe highest-similarity cells
    val qProbes = assigned.filter(queryPred)
      .withColumn("cs", cellSims(col("v"), col("nrm")))
      .select(
        col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        explode(slice(
          transform(
            reverse(array_sort(zip_with(col("cs"), sequence(lit(1), lit(nCells)),
              (s, i) => struct(s.as("s"), i.as("i"))))),
            p => p.getField("i")),
          1, nprobe)).as("cell"))

    val scored = assigned
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    graft.functions.TopK.perQuery(scored, 5)
  }

  /** [[annIvf]] served from a STANDING index: the cell-assigned corpus
    * is written once, PARTITIONED BY cell, and the probe phase reads it
    * back touching only the queries' nprobe cells — the 100 TB ANN
    * serving shape, where index build is an offline batch job and each
    * query batch scans `nprobe/nlist` of the corpus instead of all of
    * it. The probed cell ids are collected to the driver first
    * (metadata-scale: ≤ queries×nprobe ints, same class as the codebook
    * loads in README's cache contract) so the `IN (…)` literal prunes
    * index partitions STATICALLY — `PartitionFilters` in the scan,
    * pinned by `StandingIndexSpec`; files in unprobed cells are never
    * opened, let alone read.
    *
    * Everything downstream of the pruned scan matches [[annIvf]]
    * operand-for-operand (same codebook, assignment and probe tie
    * rules, same exact-cosine re-rank through the k-bounded
    * [[graft.functions.TopKBySim]] fold), and array<double> survives a
    * parquet roundtrip bit-exactly, so the result is bit-identical to
    * the in-query variant and shares its DuckDB oracle.
    */
  def annIvfStanding(spark: SparkSession, dir: String, nlist: Int = 0, nprobe: Int = 4): DataFrame =
    annIvfStandingImpl(spark, dir, nlist, nprobe, appendEpoch = false)

  /** The IVF partition index's APPEND lifecycle, executed: epoch 1
    * writes the even-`vec_id` half of the corpus `partitionBy(cell)`,
    * epoch 2 `mode("append")`s the odd half into the same table — a
    * partitioned parquet append just adds files under each `cell=k`
    * directory, so the partition layout (which IS the index) survives
    * by construction and the probe's static partition pruning works
    * unchanged on the grown table. The union of the two epochs is the
    * full corpus, so this is bit-identical to [[annIvfStanding]] /
    * [[annIvf]] and shares their DuckDB oracle; `StandingIndexSpec`'s
    * partition-count pin runs against this variant too.
    */
  def annIvfStandingAppend(spark: SparkSession, dir: String, nlist: Int = 0, nprobe: Int = 4): DataFrame =
    annIvfStandingImpl(spark, dir, nlist, nprobe, appendEpoch = true)

  /** The centroid-load + cell-similarity prelude shared by the whole
    * IVF family (in-query, standing build, append, delete, soft-delete
    * probe, nprobe sweep): the TRAINED codebook —
    * [[sphericalCentroids]]'s two integer-exact Lloyd rounds at
    * k = `nlist`, session-memoized,
    * the same codebook `dedup_semantic` / `prototype_prune` share at
    * their own k — with norms precomputed and the per-row
    * cell-similarity expression closed over the literal centroids.
    * Earlier rounds used the deterministic first-`nlist` vectors as a
    * k-means-init stand-in; the trained centroids slot into the same
    * plumbing (the assignment/probe/ADC stages are codebook-agnostic)
    * and buy measurable recall at the same nprobe, because cells now
    * approximate the corpus's actual density modes instead of
    * whatever the first rows happened to be.
    *
    * Centroid components are integers (Lloyd in int8-quantized space,
    * trunc updates), so cosine similarities against them are as
    * deterministic as before and the DuckDB oracle replays the
    * training rounds with integer arithmetic
    * (`sphericalKmeansCtesDerived`). Cells
    * are ordered by ascending k-means label, so array_position's
    * first-max tie rule still means "lowest cell id". `None` on an
    * empty corpus, so every variant shares ONE empty-input guard.
    */
  private[graft] def ivfCodebook(spark: SparkSession, dir: String, nlist: Int)
      : Option[(Int, (Column, Column) => Column)] =
    cellSimsOf(sphericalCentroids(spark, dir, nlist).map(_._2))

  /** The retired first-`nlist` codebook, kept as AnnCodebookSpec's
    * untrained CONTROL: same cell-similarity machinery over the raw
    * leading vectors, so the spec isolates exactly what training
    * changes.
    */
  private[graft] def ivfCodebookFirstN(spark: SparkSession, dir: String,
      nlist: Int): Option[(Int, (Column, Column) => Column)] =
    cellSimsOf(withNorm(spark, dir).filter(col("vec_id") < nlist)
      .orderBy("vec_id").select("v").collect().toSeq.map(_.getSeq[Double](0)))

  private def cellSimsOf(cents: Seq[Seq[Double]])
      : Option[(Int, (Column, Column) => Column)] = {
    if (cents.isEmpty) None
    else {
      val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val centsLit = typedLit(cents)
      Some((cents.size, (v: Column, nrm: Column) => array(
        cents.indices.map(i =>
          // dead (all-zero) centroid → sentinel, never wins; the
          // oracle replays the same CASE guard
          if (centNorms(i) == 0.0) lit(-1e9)
          else dot(v, element_at(centsLit, i + 1)) / (nrm * centNorms(i))): _*)))
    }
  }

  private def emptyProbeFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("qid", "neighbor_id", "rnk")
  }

  private def annIvfStandingImpl(
      spark: SparkSession, dir: String, nlist0: Int, nprobe: Int,
      appendEpoch: Boolean): DataFrame = {
    val nlist = resolveNlist(spark, dir, nlist0)
    val emb = withNorm(spark, dir)
    val (nCells, cellSims) = ivfCodebook(spark, dir, nlist)
      .getOrElse(return emptyProbeFrame(spark))

    // Build — in production a once-then-append offline job; overwrite
    // keeps re-runs idempotent. Partition layout IS the index. Name
    // and path scoped per (application, data dir) — Tables.scopedIndex.
    val base =
      if (appendEpoch) "graft_ivf_cell_appended" else "graft_ivf_cell_index"
    val (table, idxPath) = Tables.scopedIndex(spark, base, dir)
    val cells = emb.withColumn("cs", cellSims(col("v"), col("nrm")))
      .withColumn("cell", array_position(col("cs"), array_max(col("cs"))).cast("int"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    // Cluster by the partition column BEFORE the partitioned write:
    // without it every upstream task opens a file in every cell
    // directory it touches (tasks × cells small files — measured 503
    // files / 16 cells on the sf0.1 build, ~8 KB each), which taxes
    // both the write commit and every later probe's scan. The
    // repartition shuffles only the slim (vec_id, v, nrm, cell) rows
    // and lands each cell in exactly one task → one file per cell.
    def writeEpoch(rows: DataFrame, mode: String): Unit =
      rows.repartition(col("cell")).write.partitionBy("cell")
        .option("path", idxPath)
        .mode(mode).saveAsTable(table)
    if (appendEpoch) {
      writeEpoch(cells.filter(pmod(col("vec_id"), lit(2)) === 0), "overwrite")
      writeEpoch(cells.filter(pmod(col("vec_id"), lit(2)) === 1), "append")
    } else {
      writeEpoch(cells, "overwrite")
    }

    // Probe — the shared standing-variant probe phase (ivfProbe).
    ivfProbe(spark, emb, cellSims, nCells, nprobe, table)
  }

  /** The IVF partition index's DELETE lifecycle, executed — the
    * takedown path an embedding index needs for PII/DMCA removals
    * without a full rebuild. A deterministic takedown set (corpus
    * vectors with `vec_id % 10 == 3`, excluding the first-`nlist`
    * codebook/query rows — deleting a vector does not retrain the
    * already-shipped codebook, so those ids stay out of the stand-in)
    * is removed in the two production steps, both run here:
    *  1. SOFT delete: an id-scale tombstone predicate the probe
    *     applies over the standing table — effective immediately,
    *     zero index-file rewrite, partition pruning untouched
    *     (tombstones broadcast at any corpus/takedown ratio);
    *  2. COMPACTION: the index rewrites without tombstoned rows under
    *     the SAME `partitionBy(cell)` spec, so post-compaction probes
    *     keep the static partition pruning. (A lakehouse-format
    *     deployment writes delete files and compacts lazily — the
    *     probe shape is identical either way.)
    * Returns the post-compaction probe's top-5; SimilaritySpec asserts
    * the soft-deleted probe emits the identical rows and that no
    * neighbor is tombstoned. Shares [[annIvf]]'s DuckDB oracle with
    * the takedown predicate applied on the candidate side.
    */
  def annIvfStandingDelete(spark: SparkSession, dir: String,
                           nlist0: Int = 0, nprobe: Int = 4): DataFrame = {
    val nlist = resolveNlist(spark, dir, nlist0)
    val emb = withNorm(spark, dir)
    val (nCells, cellSims) = ivfCodebook(spark, dir, nlist)
      .getOrElse(return emptyProbeFrame(spark))

    val (table, idxPath) = Tables.scopedIndex(spark, "graft_ivf_cell_del", dir)
    // same pre-write clustering as annIvfStandingImpl (one file per
    // cell instead of tasks × cells)
    def writeEpoch(rows: DataFrame, mode: String): Unit =
      rows.repartition(col("cell")).write.partitionBy("cell")
        .option("path", idxPath)
        .mode(mode).saveAsTable(table)
    writeEpoch(emb.withColumn("cs", cellSims(col("v"), col("nrm")))
      .withColumn("cell", array_position(col("cs"), array_max(col("cs"))).cast("int"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell")), "overwrite")

    // compaction: rewrite minus tombstones under the same partition
    // spec. Eager checkpoint first — the overwrite can't scan the very
    // table it is replacing.
    val compacted = spark.table(table)
      .filter(!tombstoned(col("vec_id"), nlist))
      .localCheckpoint(true)
    writeEpoch(compacted, "overwrite")

    ivfProbe(spark, emb, cellSims, nCells, nprobe, table)
  }

  /** The takedown predicate — deterministic so the oracle replays it. */
  private def tombstoned(id: Column, nlist: Int): Column =
    id % 10 === 3 && id >= nlist

  /** The soft-delete HALF of [[annIvfStandingDelete]], standalone for
    * the spec: probe the UNCOMPACTED index with the tombstone filter —
    * must emit exactly the post-compaction rows.
    */
  private[graft] def annIvfSoftDeleteProbe(
      spark: SparkSession, dir: String, table: String,
      nlist0: Int = 0, nprobe: Int = 4): DataFrame = {
    val nlist = resolveNlist(spark, dir, nlist0)
    val emb = withNorm(spark, dir)
    val (nCells, cellSims) = ivfCodebook(spark, dir, nlist)
      .getOrElse(return emptyProbeFrame(spark))
    ivfProbe(spark, emb, cellSims, nCells, nprobe, table,
      idxFilter = Some(!tombstoned(col("vec_id"), nlist)))
  }

  /** Shared probe phase for the standing-index variants: nprobe
    * highest-similarity cells per query (ties to the higher cell id —
    * annIvf's reverse-sort rule), probed cell ids collected to the
    * driver so the `isin` literal prunes index partitions statically,
    * exact-cosine re-rank through the k-bounded TopK fold.
    */
  private def ivfProbe(spark: SparkSession, emb: DataFrame,
                       cellSims: (Column, Column) => Column, nCells: Int,
                       nprobe: Int, table: String,
                       idxFilter: Option[Column] = None): DataFrame = {
    val qProbes = emb.filter(col("vec_id") < 10)
      .withColumn("cs", cellSims(col("v"), col("nrm")))
      .select(
        col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        explode(slice(
          transform(
            reverse(array_sort(zip_with(col("cs"), sequence(lit(1), lit(nCells)),
              (s, i) => struct(s.as("s"), i.as("i"))))),
            p => p.getField("i")),
          1, nprobe)).as("cell"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val probedCells = qProbes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

    val idx0 = spark.table(table)
      .filter(col("cell").isin(probedCells: _*))
    val idx = idxFilter.fold(idx0)(idx0.filter)
    val scored = idx
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    graft.functions.TopK.perQuery(scored, 5)
  }

  /** One k-means/IVF training step — the centroid UPDATE an embedding
    * pipeline runs to refine the codebook [[annIvf]] consumes: assign
    * every vector to its nearest centroid (same deterministic
    * first-`nlist` codebook and tie rule as annIvf), then aggregate the
    * per-cell, per-dimension mean. The aggregation runs over the int8
    * quantized codes ([[embeddingQuantize]]) so the sums are exact
    * integers — hash-stable across engines — with the mean emitted as
    * the one int/int double both engines compute identically.
    *
    * Scale shape: assignment is per-row math against a broadcast
    * codebook (metadata-scale, like loading a model); the one exchange
    * carries (cell, dim) partial sums — map-side partial aggregation
    * reduces each partition to ≤ nlist×dim rows regardless of corpus
    * size.
    */
  def centroidUpdate(spark: SparkSession, dir: String, nlist: Int = 16): DataFrame = {
    val emb = withNorm(spark, dir)
    val cents: Seq[Seq[Double]] = emb.filter(col("vec_id") < nlist)
      .orderBy("vec_id").select("v").collect().toSeq.map(_.getSeq[Double](0))
    if (cents.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long, Double)]
        .toDF("cell", "dim_idx", "n", "sum_q", "mean_q")
    }
    val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val centsLit = typedLit(cents)
    val cellSims = array(
      cents.indices.map(i =>
        dot(col("v"), element_at(centsLit, i + 1)) / (col("nrm") * centNorms(i))): _*)
    // array_position is 1-based and returns the FIRST max — ties break
    // toward the lower cell id, matching the oracle's (sim DESC, cid ASC).
    // Quantization (same formula as embeddingQuantize) is fused onto the
    // same persisted pass, so assignment + codes need ONE scan and no
    // vec_id join — the row explodes to (cell, dim, q) directly.
    emb
      .withColumn("cs", cellSims)
      .select(
        (array_position(col("cs"), array_max(col("cs"))) - 1L).as("cell"),
        col("v"),
        array_max(transform(col("v"), x => abs(x))).as("ma"))
      .select(col("cell"), col("ma"), posexplode(col("v")))
      .select(
        col("cell"),
        col("pos").cast("long").as("dim_idx"),
        when(col("ma") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(col("col") * 127.0 / col("ma")).cast("long"))))
          .as("q"))
      .groupBy(col("cell"), col("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
      .withColumn("mean_q", col("sum_q").cast("double") / col("n"))
  }

  /** Clustering quality (inertia): per cell, member count and the
    * EXACT integer within-cell squared L2 over int8-quantized codes —
    * the metric watched across Lloyd rounds ([[kmeansTrain]]) and the
    * termination signal of codebook refinement. Same assignment rule
    * and quantization as [[centroidUpdate]]; the centroid's own code
    * is the codebook vector quantized by the SAME per-vector formula
    * (centroids ARE corpus vectors here, so the oracle reads their
    * codes straight from its quantize CTE — no special case). Squared
    * diffs are ≤ 254² per dim; ×64 dims ×N members sits far under
    * 2⁶³.
    *
    * Scale shape: one persisted scan computes assignment + codes per
    * row; the per-row distance folds inside codegen (`zip_with` +
    * `aggregate` over the broadcast codebook literal); the only
    * exchange carries nlist partial (n, inertia) rows.
    */
  def kmeansInertia(spark: SparkSession, dir: String, nlist: Int = 16): DataFrame = {
    val emb = withNorm(spark, dir)
    val cents: Seq[Seq[Double]] = emb.filter(col("vec_id") < nlist)
      .orderBy("vec_id").select("v").collect().toSeq.map(_.getSeq[Double](0))
    if (cents.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("cell", "n", "inertia")
    }
    val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val centsLit = typedLit(cents)
    val cellSims = array(
      cents.indices.map(i =>
        dot(col("v"), element_at(centsLit, i + 1)) / (col("nrm") * centNorms(i))): _*)
    // driver-side replica of the Spark-side quantize (identical IEEE
    // op order: x * 127.0 / ma, floor) applied to the codebook
    def quant(v: Seq[Double]): Seq[Long] = {
      val ma = v.map(math.abs).max
      if (ma == 0.0) v.map(_ => 0L)
      else v.map(x =>
        math.max(-127L, math.min(127L, math.floor(x * 127.0 / ma).toLong)))
    }
    val centCodes = typedLit(cents.map(quant))
    emb
      .withColumn("cs", cellSims)
      .withColumn("cell", array_position(col("cs"), array_max(col("cs"))) - 1L)
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qv",
        when(col("ma") === 0.0, transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"), x =>
            greatest(lit(-127L),
              least(lit(127L), floor(x * 127.0 / col("ma")).cast("long"))))))
      .withColumn("cc", element_at(centCodes, (col("cell") + 1L).cast("int")))
      .withColumn("d2",
        aggregate(zip_with(col("qv"), col("cc"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("inertia"))
  }

  /** Distributed k-means training — Lloyd's algorithm, the canonical
    * iterative workload of a large-scale embedding pipeline (IVF
    * codebook training, semantic-dedup clustering). Two full
    * assign→update iterations over int8-quantized codes
    * (the [[embeddingQuantize]] formula), deterministic first-k init.
    *
    * Exactness across engines (what makes an ITERATIVE float algorithm
    * oracle-checkable at all): codes are integer-valued, the squared
    * L2 distance `q·q − 2·q·c + c·c` is computed in doubles whose
    * every term is an exact integer (bounded by dims·127² ≪ 2⁵³), and
    * the centroid update is `trunc(sum/n)` back to integers — so no
    * accumulation-order or libm drift can flip an argmin anywhere in
    * the chain, and DuckDB replays both iterations bit-for-bit.
    *
    * Scale shape: per-iteration cost is one narrow scan (distances to
    * k broadcast centroids via the native dot product) plus one
    * partial-agg'd groupBy on (cell, dim) — ≤ k·dim rows cross the
    * exchange per partition regardless of corpus size. The collected
    * intermediate centroids are k·dim longs (model-scale, exactly like
    * [[annIvf]]'s codebook). Empty cells drop out of the next round,
    * as in the SQL replay.
    */
  /** int8 codes (the [[embeddingQuantize]] formula, kept as
    * integer-valued doubles so the native dot product applies) plus the
    * precomputed self-dot — the working set of the Lloyd iterations.
    */
  private def quantizedCodes(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .select(col("vec_id"), expr(
        "transform(v, x -> CASE WHEN ma = 0.0D THEN 0.0D ELSE " +
          "CAST(greatest(-127L, least(127L, CAST(floor(x * 127.0D / ma) AS BIGINT))) AS BIGINT) END)")
        .cast("array<double>").as("q"))
      .withColumn("qq", dot(col("q"), col("q")))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Nearest-centroid assignment: squared L2 `q·q − 2·q·c + c·c` in
    * exact integer-valued doubles; ties break to the lowest cell id
    * (array order = ascending cell id).
    */
  private def cellAssign(qd: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val ccs = cents.map { case (_, v) => v.map(x => x * x).sum }
    val cl = typedLit(cents.map(_._2))
    val cellIds = typedLit(cents.map(_._1))
    val dists = array(cents.indices.map(i =>
      col("qq") - lit(2.0) * dot(col("q"), element_at(cl, i + 1)) + lit(ccs(i))): _*)
    qd
      .withColumn("ds", dists)
      .withColumn("cell",
        element_at(cellIds,
          array_position(col("ds"), array_min(col("ds"))).cast("int")))
      .withColumn("d2", array_min(col("ds"))) // winning squared distance (integer-exact)
      .drop("ds")
  }

  /** One assign→update Lloyd round: partial-agg'd (cell, dim) integer
    * sums, centroid value = trunc(sum/n) back to an integer code.
    */
  private def assignUpdate(qd: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    cellAssign(qd, cents)
      .select(col("cell"), posexplode(col("q")))
      .groupBy(col("cell"), col("pos").cast("long").as("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("col")).cast("long").as("sum_q"))
      .select(col("cell"), col("dim_idx"), col("n"),
        (col("sum_q").cast("double") / col("n")).cast("long").as("c_q"))

  /** Collect a round's (cell, dim, c_q) rows into the centroid seq for
    * the next round — k·dim longs, model-scale like [[annIvf]]'s
    * codebook. Cells that lost every member drop out.
    */
  private def centsOf(round: DataFrame): Seq[(Long, Seq[Double])] =
    round.select(col("cell"), col("dim_idx"), col("c_q")).collect().toSeq
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cell, rows) =>
        (cell, rows.sortBy(_.getLong(1)).map(_.getLong(2).toDouble)) }

  private def initCents(qd: DataFrame, k: Int): Seq[(Long, Seq[Double])] =
    qd.filter(col("vec_id") < k)
      .orderBy("vec_id").select(col("vec_id"), col("q")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  def kmeansTrain(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val qd = quantizedCodes(spark, dir)
    val init = initCents(qd, k)
    if (init.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)].toDF("cell", "dim_idx", "n", "c_q")
    assignUpdate(qd, centsOf(assignUpdate(qd, init)))
  }

  /** Semantic dedup (SemDeDup): embedding near-dup pairs found by
    * clustering first and scoring all pairs WITHIN each cluster cell —
    * never across the corpus. This is the production-scale shape for
    * embedding dedup: [[kmeansTrain]]'s two exact Lloyd rounds build
    * the codebook, a final assignment buckets every vector, and the
    * within-cell exact-cosine join is bounded by cell population
    * (k grows with the corpus, holding cells at ~√N·density, so the
    * candidate count is N·cellSize, not N²). Cross-cell near-dups are
    * missed by construction — the recall/cost trade every semantic
    * dedup run makes; the spec pins recall against the exact
    * [[dedupEmbedding]] baseline.
    *
    * Deterministic end to end (integer k-means + exact cosine), so the
    * DuckDB oracle replays the WHOLE pipeline including both Lloyd
    * rounds.
    */
  private val centroidCache = scala.collection.concurrent.TrieMap[
    (String, String, Int), Seq[(Long, Seq[Double])]]()
  private val centroidKeyLocks = scala.collection.concurrent.TrieMap[
    (String, String, Int), Object]()
  private val sphCentroidCache = scala.collection.concurrent.TrieMap[
    (String, String, Int), Seq[(Long, Seq[Double])]]()
  private val sphCentroidKeyLocks = scala.collection.concurrent.TrieMap[
    (String, String, Int), Object]()
  private val pqSampleCache = scala.collection.concurrent.TrieMap[
    (String, String, Int), Seq[(Long, Seq[Double])]]()
  private val pqSampleKeyLocks = scala.collection.concurrent.TrieMap[
    (String, String, Int), Object]()

  /** Drop all memoized k-means codebooks — the probe/test hook, same
    * contract as the corpus-count cache's [[clearCorpusCountCache]].
    */
  private[graft] def clearCentroidCache(): Unit = {
    centroidCache.clear()
    centroidKeyLocks.clear()
    sphCentroidCache.clear()
    sphCentroidKeyLocks.clear()
    pqSampleCache.clear()
    pqSampleKeyLocks.clear()
  }

  /** The PQ codebook sample — the `ksub` lowest (vec_id, q) rows by
    * md5(vec_id), re-sorted by vec_id — memoized per (application,
    * corpus, ksub) under the same model-state contract as
    * [[sphericalCentroids]]: the draw is fully deterministic, so the
    * memo can only change who pays the sort+limit collect (previously
    * one collect job per [[annPq]]/[[annIvfPq]] CALL — four inside
    * each recall scoreboard).
    */
  private def pqSample(spark: SparkSession, dir: String,
      ksub: Int): Seq[(Long, Seq[Double])] = {
    val key = (spark.sparkContext.applicationId, dir, ksub)
    pqSampleCache.get(key) match {
      case Some(v) => v
      case None =>
        pqSampleKeyLocks.getOrElseUpdate(key, new Object).synchronized {
          pqSampleCache.getOrElseUpdate(key,
            quantizedCodes(spark, dir)
              .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
              .limit(ksub)
              .select(col("vec_id"), col("q")).collect().toSeq
              .sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getSeq[Double](1))))
        }
    }
  }

  /** One SPHERICAL Lloyd assign→update round: rank by
    * `dot(q, c) / ‖c‖` (cosine up to the row's own norm, which is
    * constant per row and cannot flip its argmax), ties to the lowest
    * cell id (ascending-cell array order + array_position's first-max
    * rule), centroid update = per-dim trunc'd integer mean of the
    * members' int8 codes — the same integer-exact update as the L2
    * trainer, so centroids stay integer and the whole round replays
    * in DuckDB. Dot products of int8 codes are exact in doubles
    * (≤ 64·127² ≪ 2^53), so the only non-integer value, the
    * sim ratio, is a single well-defined double division on both
    * sides of the oracle.
    */
  private def assignUpdateCos(qd: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    cellAssignCos(qd, cents)
      .select(col("cell"), posexplode(col("q")))
      .groupBy(col("cell"), col("pos").cast("long").as("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("col")).cast("long").as("sum_q"))
      .select(col("cell"), col("dim_idx"), col("n"),
        (col("sum_q").cast("double") / col("n")).cast("long").as("c_q"))

  /** Cosine-rule nearest-centroid assignment over quantized codes:
    * rank by `dot(q, c) / ‖c‖` (the row's own norm is a constant
    * positive factor — dropped), first max in ascending-cell array
    * order = lowest cell id on ties. A dead centroid (all-zero trunc
    * mean) gets a −1e9 sentinel so it never wins an assignment and
    * division by zero never reaches the plan; the oracle replays the
    * same CASE guard.
    */
  private def cellAssignCos(qd: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val cellIds = typedLit(cents.map(_._1))
    val cl = typedLit(cents.map(_._2))
    val cnorms = cents.map { case (_, c) => math.sqrt(c.map(x => x * x).sum) }
    val sims = array(cents.indices.map(i =>
      if (cnorms(i) == 0.0) lit(-1e9)
      else dot(col("q"), element_at(cl, i + 1)) / lit(cnorms(i))): _*)
    qd
      .withColumn("ss", sims)
      .withColumn("cell",
        element_at(cellIds,
          array_position(col("ss"), array_max(col("ss"))).cast("int")))
      .drop("ss")
  }

  /** The IVF family's trained coarse codebook: two SPHERICAL Lloyd
    * rounds ([[assignUpdateCos]]) from the deterministic first-`k`
    * init, per (application, corpus, k), memoized with the same
    * per-key double-checked locking as [[finalCentroids]]. Spherical
    * (cosine-assignment) training is the right metric for a COSINE
    * ANN index: the L2 trainer in quantized space pulls centroids
    * toward the data mean, and routing a cosine query through
    * L2-trained cells measurably LOST recall on the registered corpus
    * (ann_recall 46→44, nprobe-1 sweep 45→34 when it was tried);
    * cosine-consistent training routes corpus and queries by the
    * identical rule the training optimized. AnnCodebookSpec proves
    * the training win in-operator on a shard-grouped clustered
    * corpus — the realistic 100 TB ordering, where a first-N codebook
    * is blind to every cluster past the first shard — and documents
    * why the registered synthetic corpus (isotropic unit vectors,
    * within-label cosine ≈ 0) can show parity at best.
    */
  private[graft] def sphericalCentroids(spark: SparkSession, dir: String,
      k: Int): Seq[(Long, Seq[Double])] = {
    val key = (spark.sparkContext.applicationId, dir, k)
    sphCentroidCache.get(key) match {
      case Some(v) => v
      case None =>
        sphCentroidKeyLocks.getOrElseUpdate(key, new Object).synchronized {
          sphCentroidCache.getOrElseUpdate(key, {
            val qd = quantizedCodes(spark, dir)
            val init = initCents(qd, k)
            if (init.isEmpty) Seq.empty
            else centsOf(assignUpdateCos(qd, centsOf(assignUpdateCos(qd, init))))
          })
        }
    }
  }

  /** The two-round Lloyd codebook per (application, corpus, k),
    * memoized: the centroids are MODEL state (k·dim integer codes, a
    * few KB on the driver — no DataFrame lifecycle to manage), and
    * every consumer that buckets the corpus by them (semantic dedup,
    * prototype pruning, cluster labeling) re-derives the identical
    * seq. One training per session under the immutable-corpus-dir
    * contract ([[corpusBandBits]]); consumers still run their own
    * final assignment scan against the cached literal. Per-key
    * double-checked locking (the `unigramStateShared` pattern) keeps
    * concurrent first callers — dedup_semantic / prototype_prune /
    * cluster_top_terms in a parallel sweep — from each running the
    * corpus-scale Lloyd rounds redundantly, while different
    * (corpus, k) keys still train in parallel.
    */
  private def finalCentroids(spark: SparkSession, dir: String,
      k: Int): Seq[(Long, Seq[Double])] = {
    val key = (spark.sparkContext.applicationId, dir, k)
    centroidCache.get(key) match {
      case Some(v) => v
      case None =>
        centroidKeyLocks.getOrElseUpdate(key, new Object).synchronized {
          centroidCache.getOrElseUpdate(key, {
            val qd = quantizedCodes(spark, dir)
            val init = initCents(qd, k)
            if (init.isEmpty) Seq.empty
            else centsOf(assignUpdate(qd, centsOf(assignUpdate(qd, init))))
          })
        }
    }
  }

  def dedupSemantic(spark: SparkSession, dir: String, k: Int = 64,
      threshold: Double = 0.35): DataFrame = {
    import spark.implicits._
    val qd = quantizedCodes(spark, dir)
    val finalCents = finalCentroids(spark, dir, k)
    if (finalCents.isEmpty) return Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val assigned = cellAssign(qd, finalCents).select(col("vec_id"), col("cell"))
    val e = withNorm(spark, dir)
      .join(assigned, "vec_id")
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val a = e.select(col("cell"), col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("cell"), col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Prototype pruning (SSL-prototypes / D4 shape): after
    * [[kmeansTrain]]'s two integer-exact Lloyd rounds and a final
    * assignment, the floor(n/4) vectors CLOSEST to their cell centroid
    * — the most prototypical, hence most redundant — are dropped; the
    * survivors (with their cell, exact squared distance, and
    * within-cell prototypicality rank) are the diversified corpus.
    * Complements [[dedupSemantic]]: SemDeDup removes pairwise
    * near-dups, prototype pruning thins dense cluster cores even where
    * no pair crosses the similarity threshold.
    *
    * Scale shape: identical to [[dedupSemantic]] up to assignment
    * (narrow distance scan against k broadcast centroids); the ranking
    * is a cell-partitioned window — state bounded by cell population,
    * which k is chosen to hold at ~√N. Integer distances + (d2, vec_id)
    * ordering make the kept set deterministic, so the DuckDB oracle
    * replays the whole pipeline including both Lloyd rounds.
    */
  def prototypePrune(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qd = quantizedCodes(spark, dir)
    val finalCents = finalCentroids(spark, dir, k)
    if (finalCents.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)].toDF("vec_id", "cell", "d2", "proto_rank")
    val w = Window.partitionBy(col("cell")).orderBy(col("d2").asc, col("vec_id").asc)
    cellAssign(qd, finalCents)
      .select(col("vec_id"), col("cell"), col("d2"))
      .withColumn("proto_rank", row_number().over(w).cast("long"))
      .withColumn("n_cell", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .filter(col("proto_rank") > expr("n_cell div 4"))
      .select(col("vec_id"), col("cell"), col("d2").cast("long").as("d2"), col("proto_rank"))
  }

  /** Embedding-space benchmark decontamination — the semantic twin of
    * `contamination_check` (Curation.scala): a training document is
    * flagged when its embedding is near ANY benchmark vector, catching
    * the paraphrased / reworded eval leakage that exact 8-gram overlap
    * misses by construction. Benchmark = the `vec_id < 10` slice
    * (contamination_check's id-range convention); the near threshold
    * is the embedding-dedup family's 0.35.
    *
    * Scale shape: the benchmark side of a decontamination run is
    * eval-suite-sized (thousands of vectors against a 100 TB corpus),
    * so the right plan is a BROADCAST of the benchmark against one
    * narrow corpus scan — the similarity_topk shape, no LSH index
    * needed and no shuffle of the corpus. Output is one row per
    * contaminated doc with its hit count and best similarity (exact
    * cosine, pinned fold order → oracle-exact).
    */
  def contaminationSemantic(spark: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    val e = withNorm(spark, dir)
    val bench = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("bid"), col("v").as("bv"), col("nrm").as("bnrm"))
    e.filter(col("vec_id") >= 10)
      .join(broadcast(bench))
      .withColumn("sim", dot(col("v"), col("bv")) / (col("nrm") * col("bnrm")))
      .filter(col("sim") >= threshold)
      .groupBy(col("vec_id").as("doc_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("sim")).as("best_sim"))
  }

  /** Cluster labeling (the BERTopic / c-TF-IDF readout): after the
    * same two integer-exact Lloyd rounds as [[dedupSemantic]], each
    * cluster cell is described by its most DISTINCTIVE terms — ranked
    * by the cell's share of the term's corpus occurrences
    * (`share_micro` = ⌊cnt_cell·10⁶ / cnt_corpus⌋, the integer-exact
    * stand-in for c-TF-IDF's tf·idf product: a term all of whose
    * occurrences sit in one cell scores 10⁶ there, a uniformly-spread
    * term scores ~10⁶/k everywhere). Terms with fewer than
    * `minCorpusCnt` corpus occurrences are dropped (a singleton term
    * trivially scores 10⁶ — noise, not signal), and each cell keeps
    * its `topn` by (share desc, count desc, term asc) — fully ordered,
    * so the kept set is deterministic and the DuckDB oracle replays
    * the WHOLE pipeline, Lloyd rounds included.
    *
    * This is the human-audit surface of embedding clustering: a
    * curation run that buckets 100 TB by k-means needs to know WHAT
    * each bucket is before deciding to up/down-sample it.
    *
    * Scale shape: assignment is the narrow k-broadcast distance scan;
    * the term stream is the one tokenize pass joined to the (vec_id,
    * cell) table (doc-scale, id-keyed); per-(cell, term) and per-term
    * counts partial-agg map-side; the final rank is a cell-partitioned
    * window over the ≥`minCorpusCnt` survivors — vocabulary-scale,
    * never corpus-scale.
    */
  def clusterTopTerms(spark: SparkSession, dir: String, k: Int = 64,
      topn: Int = 5, minCorpusCnt: Long = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qd = quantizedCodes(spark, dir)
    val finalCents = finalCentroids(spark, dir, k)
    if (finalCents.isEmpty)
      return Seq.empty[(Long, String, Long, Long, Long)]
        .toDF("cell", "term", "cnt", "share_micro", "rank")
    val assigned = cellAssign(qd, finalCents).select(col("vec_id"), col("cell"))
    val toks = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val perCell = toks
      .join(assigned, toks("doc_id") === assigned("vec_id"))
      .groupBy(col("cell"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val corpusTot = perCell.groupBy(col("term"))
      .agg(sum(col("cnt")).as("tot"))
      .filter(col("tot") >= minCorpusCnt)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("share_micro").desc, col("cnt").desc, col("term").asc)
    perCell
      .join(corpusTot, "term")
      .withColumn("share_micro", expr("cnt * 1000000 div tot"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topn)
      .select(col("cell"), col("term"), col("cnt"), col("share_micro"), col("rank"))
  }

  /** Approximate top-5 via Product Quantization with asymmetric
    * distance computation (ADC) — the memory-bound regime's ANN shape
    * (IVF-PQ / FAISS style): the 64-dim int8 vector is split into
    * `m` = 8 subspaces of 8 dims; each subvector is ENCODED as the id
    * of its nearest subspace centroid, so a stored candidate is m
    * one-byte codes (64× smaller than the float vector — at 100 TB the
    * candidate scan reads codes, never embeddings). A query is NOT
    * encoded (that's the "asymmetric" in ADC): it precomputes one
    * m×ksub lookup table of exact query-subvector→centroid squared
    * distances, and each candidate's distance is m table lookups + m
    * adds — no per-candidate dot products at all.
    *
    * The codebook is the `ksub` = 256 lowest vectors BY MD5 OF vec_id
    * — the layout-blind deterministic draw [[annIvfPq]]'s r20 rebuild
    * landed (a contiguous first-`ksub` window collapses under
    * shard-grouped ingest orderings, where adjacent ids share a
    * cluster: the old first-16 book scored 2/50 on the registered
    * clustered scoreboard) — re-sorted by vec_id so codebook position
    * order (the encode tie rule) is the oracle's pcid order. TRAINING
    * this codebook was measured and declined TWICE ((r18) two
    * per-subspace L2 Lloyd rounds moved recall 13→12/50 on the
    * registered corpus; (r19, RECALL.json) the same training LOST on
    * the planted clustered corpus at both sizes, 21→12 and 8→5/50 —
    * full-vector cluster structure does not survive 8-dim slicing), so
    * the scale answer is the one every production PQ deployment uses
    * instead: an exact-refine tail. ADC selects top `refineR` = 100
    * per query — k-bounded, so the exchange carries ≤ R ids — and
    * exact cosine over the fetched vectors re-ranks to 5 (FAISS
    * IndexRefine shape, the [[annIvfPq]] tail verbatim). PQ is a
    * candidate compressor, not a ranker: codes at any tested budget
    * cannot order same-cluster neighbors whose true ranks differ by
    * noise alignments below code resolution. Collecting the codebook
    * is model-scale (ksub×64 ints).
    *
    * Integer-exact end to end: codes and centroids are int8 values, so
    * every squared distance is an exact integer (≤ 64·254² ≪ 2⁵³) and
    * no accumulation order or libm call can flip an argmin or a rank —
    * the DuckDB oracle replays quantize → sample → encode → ADC →
    * refine → rank bit-for-bit. Approximation error (vs [[topKBrute]])
    * comes only from the quantization itself; the spec pins recall.
    */
  def annPq(spark: SparkSession, dir: String, m: Int = 8, ksub: Int = 256,
      refineR: Int = 100): DataFrame = {
    import spark.implicits._
    val qd = quantizedCodes(spark, dir)
    val cents: Seq[(Long, Seq[Double])] = pqSample(spark, dir, ksub)
    if (cents.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("qid", "neighbor_id", "rnk")
    val kAct = cents.size
    // codebook as a NATIVE-KERNEL reference object
    // (graft.functions.PqEncode/PqLut), not typedLit arrays folded by
    // higher-order functions: the HOF form ran m·ksub interpreted
    // lambda dot products per row (~16k boxed multiply-adds at the
    // registered m=8, ksub=256) and pinned ~370 KB of codebook
    // literals into every projection that Catalyst re-analyzed per
    // action. The kernels run one tight JVM loop per row inside the
    // whole-stage-codegen span and compute bit-identical values (all
    // inputs int8-valued ⇒ every distance an exact integer; same
    // first-min tie rule), so codes, LUTs, ranks and the oracle hash
    // are unchanged — see the r21 plan diff (plans/r21/).
    val cbArr: Array[Array[Double]] = cents.map(_._2.toArray).toArray

    // candidates: m codes per vector (1-based codebook positions); the
    // downstream scan carries ONLY (vec_id, codes).
    val encoded = qd.select(
      col("vec_id"),
      graft.functions.functions.pq_encode(col("q"), cbArr, m).as("codes"))

    // per-query ADC lookup table: lut[ms·kAct + (code−1)] = partial
    // distance from the query's ms-subvector to codebook entry `code` —
    // computed ONCE per query row, broadcast to the candidate scan.
    val qlut = qd.filter(col("vec_id") < 10).select(
      col("vec_id").as("qid"),
      graft.functions.functions.pq_lut(col("q"), cbArr, m, addSelf = false).as("lut"))

    val scored = encoded.crossJoin(broadcast(qlut))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("d", (0 until m).map { ms =>
        element_at(col("lut"),
          (lit(ms * kAct) + element_at(col("codes"), ms + 1)).cast("int"))
      }.reduce(_ + _))
      // TopK orders (sim DESC, id ASC); distances are exact integers so
      // negation is exact and the rank equals (d ASC, id ASC).
      .withColumn("sim", -col("d"))

    // REFINE tail (the annIvfPq r20 shape, verbatim): ADC is the
    // candidate generator, exact cosine over refineR fetched vectors
    // is the ranker.
    val topR = graft.functions.TopK.perQuery(scored, refineR)
      .select(col("qid"), col("neighbor_id").as("vec_id"))
    val qSide = qd.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv2"), col("qq").as("qq2"))
    val rerank = qd.select(col("vec_id"), col("q"), col("qq"))
      .join(broadcast(topR), "vec_id")
      .join(broadcast(qSide), "qid")
      .withColumn("sim",
        when(col("qq") === 0.0 || col("qq2") === 0.0, lit(-1e9))
          .otherwise(dot(col("qv2"), col("q")) / (sqrt(col("qq2")) * sqrt(col("qq")))))
    graft.functions.TopK.perQuery(rerank, 5)
  }

  /** Approximate top-5 via IVF-PQ — the composition [[annIvf]] ×
    * [[annPq]] that billion-vector indexes actually deploy: a coarse
    * quantizer routes each vector to a cell (inverted file), and PQ
    * encodes the RESIDUAL vector − cell-centroid (residuals are
    * centered near zero, so the same code budget quantizes them far
    * more finely than raw vectors). A query probes its `nprobe`
    * nearest cells and, PER PROBED CELL, builds the asymmetric lookup
    * table of its subvectors against the PQ codebook — candidate cost
    * is m lookups + m adds, exactly [[annPq]]'s scan shape, but over
    * only the probed cells' populations.
    *
    * Unlike [[annPq]]'s single-table scan, the per-cell LUTs must carry
    * the FULL squared distance (including the query-residual self-term):
    * the query's residual differs per probed cell, so the self-term is
    * not a constant shift across candidates from different cells and
    * cannot be dropped.
    *
    * Three r20 rebuilds, all forced by RECALL.json's clustered-corpus
    * collapse (recall 0.26 → 0.02 as N grew — the composed "scale
    * path" was the worst variant exactly where cluster structure
    * exists). Each was measured on the RecallProbe corpora before
    * landing (a cosine-decomposed ADC was also built and measured
    * WORSE at every codebook — quantization noise in q·r̂ hurts a
    * ratio more than a distance — so the residual-L2 ADC stays):
    *  1. LAYOUT-BLIND PQ SAMPLE. The codebook is residuals of `ksub`
    *     corpus vectors — now the ksub lowest by md5(vec_id) instead
    *     of the contiguous window after nlist: shard-grouped ingest
    *     puts contiguous ids in one cluster, so the old window drew
    *     every codebook entry from one or two cells' noise and
    *     mis-coded everyone else's residuals. (A stride rule was
    *     measured too: it fixes shard-grouped layouts but collapses on
    *     interleaved ones; the hash is immune to any id↔cluster
    *     correlation.)
    *  2. ksub 16 → 256 (codes are m·log₂(ksub) = 64 bits — the FAISS
    *     default shape). The codebook stays a sampled-residual
    *     collect; per-subspace Lloyd training was re-measured at 256
    *     entries and again bought nothing over the sample.
    *  3. REFINE stage: exact-cosine re-rank of the ADC top `refineR`
    *     (see the inline comment — PQ codes cannot rank same-cluster
    *     noise alignments; every production IVF-PQ deployment refines).
    * RecallProbe recall@5 on the clustered corpora, before → after:
    * N=16k/nlist=64 0.02 → 0.90; N=2k/nlist=16 0.26 → 0.98.
    *
    * The coarse codebook is the TRAINED [[sphericalCentroids]] at
    * k = `nlist` (two integer-exact cosine-assignment Lloyd rounds in
    * the quantized space — the same codebook [[annIvf]] routes by,
    * with nlist derived from corpus cardinality by default). Both
    * codebooks are model-scale collects. Integer-exact end to end
    * (int8 codes ⇒ integer centroids ⇒ integer residuals ⇒ integer
    * squared distances; the refine ratio is one IEEE divide both
    * engines spell identically), so the DuckDB oracle replays the
    * whole pipeline — training rounds, the md5 sample rule, and the
    * refine tail included — with every tie.
    */
  def annIvfPq(spark: SparkSession, dir: String, nlist0: Int = 0, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 256, refineR: Int = 100): DataFrame = {
    import spark.implicits._
    val nlist = resolveNlist(spark, dir, nlist0)
    val qd = quantizedCodes(spark, dir)
    val coarse = sphericalCentroids(spark, dir, nlist)
    // PQ sample: the ksub lowest vectors BY MD5 OF vec_id — a
    // layout-blind deterministic pseudo-random draw — NOT the first
    // ksub ids after nlist. Under the shard-grouped orderings real
    // ingest produces, contiguous ids share a cluster, so the old
    // window drew every codebook entry from one or two cells' residual
    // noise and mis-coded every other cell's residuals — RECALL.json's
    // r19 collapse (recall 0.26 → 0.02 as N grew). A stride (id ≡ c
    // mod N/ksub) fixes shard-grouped layouts but collapses on
    // interleaved ones (the round-robin fixture assigns clusters by
    // id mod 3); hashing ids is immune to ANY id↔cluster correlation.
    // The rows are re-sorted by vec_id so codebook position order (the
    // encode tie rule) stays the oracle's `pcid` order.
    val pqTrain: Seq[Seq[Double]] = pqSample(spark, dir, ksub).map(_._2)
    if (coarse.isEmpty || pqTrain.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("qid", "neighbor_id", "rnk")
    // PQ training residuals: assign each train vector to its coarse
    // cell by the SAME cosine rule as the plan (dot/‖c‖, ties to the
    // lowest cid; dead centroids sentineled out)
    val coarseNorms = coarse.map { case (_, c) => math.sqrt(c.map(x => x * x).sum) }
    def cosTo(v: Seq[Double], i: Int): Double =
      if (coarseNorms(i) == 0.0) -1e9
      else v.zip(coarse(i)._2).map { case (a, b) => a * b }.sum / coarseNorms(i)
    val pqRes: Seq[Seq[Double]] = pqTrain.map { v =>
      val best = coarse.indices.minBy(i => (-cosTo(v, i), coarse(i)._1))
      v.zip(coarse(best)._2).map { case (a, b) => a - b }
    }
    val kP = pqRes.size
    // codebook as a NATIVE-KERNEL reference object (see [[annPq]] —
    // the same PqEncode/PqLut swap: the HOF fold ran m·ksub
    // interpreted lambda dot products per row and pinned the ksub·dim
    // codebook into every projection as a literal; the kernels compute
    // bit-identical integer-exact distances with the same first-min
    // tie rule inside the codegen span). Per-entry values are
    // c·c − 2·x·c (the x·x self-term is constant per (vector,
    // subspace) so argmin is unaffected, and the LUT adds it back
    // where cross-cell comparability needs it — `addSelf = true`).
    val pqResArr: Array[Array[Double]] = pqRes.map(_.toArray).toArray
    val centMap = typedLit(coarse.toMap)
    def residual(v: Column): Column =
      zip_with(v, element_at(centMap, col("cell")), (a, b) => a - b)

    // encode every vector: residual vs its assigned cell, per-subspace
    // argmin code (1-based codebook positions, ties to the lowest)
    val encoded = cellAssignCos(qd, coarse)
      .select(col("vec_id"), col("cell"),
        graft.functions.functions.pq_encode(residual(col("q")), pqResArr, m)
          .as("codes"))

    // query → nprobe highest-cosine cells (negated sims so the
    // ascending struct sort means sim DESC with ties to the lowest
    // cid — negation of a double is exact), then one full-distance
    // LUT per (query, probed cell) over the query's residual THERE
    val cellIds = typedLit(coarse.map(_._1))
    val qdists = array(coarse.indices.map(i =>
      if (coarseNorms(i) == 0.0) lit(1e9)
      else -(dot(col("q"), typedLit(coarse(i)._2)) / lit(coarseNorms(i)))): _*)
    val probes = qd.filter(col("vec_id") < 10)
      .withColumn("ds", qdists)
      .select(col("vec_id").as("qid"), col("q").as("qv"),
        explode(slice(
          array_sort(zip_with(col("ds"), cellIds,
            (d, i) => struct(d.as("d"), i.as("i")))),
          1, nprobe)).as("p"))
      .select(col("qid"), col("qv"), col("p.i").as("cell"))
    // Residual-L2 ADC ranks the PQ CANDIDATE stage (measured better
    // than a cosine-decomposed ADC at every tested codebook — the
    // quantization noise in q·r̂ hurts a ratio more than a distance),
    // and the full squared distance (query-residual self-term
    // included) keeps candidates from different probed cells
    // comparable, exactly as before.
    val qlut = probes
      .select(col("qid"), col("cell"),
        graft.functions.functions.pq_lut(residual(col("qv")), pqResArr, m,
          addSelf = true).as("lut"))

    val pqScored = encoded.join(broadcast(qlut), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("d", (0 until m).map { ms =>
        element_at(col("lut"),
          (lit(ms * kP) + element_at(col("codes"), ms + 1)).cast("int"))
      }.reduce(_ + _))
      // distances are exact integers so negation is exact and the
      // TopK rank equals (d ASC, id ASC)
      .withColumn("sim", -col("d"))

    // REFINE stage (the r20 recall fix that actually worked): PQ codes
    // cannot rank same-cluster neighbors — inside one cell the true
    // top-k differ by noise alignments far below m·log₂(ksub) bits of
    // resolution, which is why the unrefined row collapsed exactly on
    // clustered corpora (RECALL.json r19: 0.26 → 0.02). Production
    // IVF-PQ answers with a refine pass (FAISS's IndexRefine shape):
    // ADC selects top `refineR` per query — k-bounded, so the exchange
    // carries ≤ R ids — and EXACT cosine over the fetched vectors
    // re-ranks those R down to 5. Candidate scan stays m lookups + m
    // adds per candidate; the exact work is R vectors per query, not a
    // cell population.
    val topR = graft.functions.TopK.perQuery(pqScored, refineR)
      .select(col("qid"), col("neighbor_id").as("vec_id"))
    val qSide = qd.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv2"), col("qq").as("qq2"))
    val rerank = qd.select(col("vec_id"), col("q"), col("qq"))
      .join(broadcast(topR), "vec_id")
      .join(broadcast(qSide), "qid")
      .withColumn("sim",
        when(col("qq") === 0.0 || col("qq2") === 0.0, lit(-1e9))
          .otherwise(dot(col("qv2"), col("q")) / (sqrt(col("qq2")) * sqrt(col("qq")))))
    graft.functions.TopK.perQuery(rerank, 5)
  }

  /** md5-derived hyperplane weight in [-1000, 1000] — deterministic,
    * seedless, and replayable in SQL (integer-valued, so the double is
    * exact), which is what lets the whole LSH pipeline be
    * oracle-checked end-to-end.
    */
  private[operators] def planeWeight(p: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 7), 16) % 2001 - 1000).toDouble
  }

  /** Corpus-derived band width: the smallest `b` in [4, 16] whose
    * `2^b` buckets/band hold expected occupancy ≤ 8 (`(1L << b)·8 ≥ N`).
    * Bucket count grows ∝ N, so expected random band collisions stay
    * ≤ 8·N — linear — instead of the fixture-constant Θ(N²/2^b) that
    * SCALE.json measured going quadratic at 10× under the old
    * hard-coded 16 buckets/band (516k → 51.6M collisions). The SAME
    * integer rule runs in every oracle replay's `params` CTE
    * (SparkEntry `lshBandCtes`), so derived parameters stay
    * hash-exact at any SF. Pure integers — no log2 ulp risk.
    *
    * Validity bound: b grows with N up to 45 bits — a 2^45-bucket
    * band space holds ~2.8·10^14 vectors at occupancy 8, far past any
    * 100 TB corpus — so the linear-collision guarantee never expires
    * at realistic scale. (Earlier rounds capped b at 16 because all
    * bands packed into ONE 64-bit signature column; [[lshBands]] now
    * computes each band's value directly from its own plane slice, so
    * band width is bounded only by BIGINT range, and the 45-bit
    * ceiling exists purely to keep `1L << b` and the oracle's integer
    * replay comfortably inside 64-bit range.) Recall lost to wider
    * bands past 16 bits is recovered by DERIVING THE BAND COUNT too
    * ([[derivedBandCount]]): one extra OR-band per extra bit of
    * width, holding the expected number of matching bands for a
    * fixed-similarity pair roughly flat as N grows (per extra bit a
    * θ≈0.28π pair keeps matching a band with probability ≈0.86 —
    * ≈1/1.16 — so +1 band per bit over-compensates slightly).
    */
  private[graft] def derivedBandBits(n: Long): Int = {
    var b = 4
    while (b < 45 && (1L << b) * 8L < n) b += 1
    b
  }

  /** Corpus-derived band COUNT: 4 OR-bands up to the 16-bit width
    * that served every corpus below N = 2^16·8 ≈ 524k, plus one band
    * per bit of extra width past that (see [[derivedBandBits]] for
    * the recall arithmetic). Total candidate volume stays
    * O(nBands · 8 · N) = O(N log N) worst case — each band is
    * occupancy-bounded, and the band count grows only with log N.
    * Replayed as the `nb` column of every oracle `params` CTE
    * (SparkEntry `lshBandCtes`) — same integer rule, hash-exact.
    */
  private[graft] def derivedBandCount(bandBits: Int): Int =
    4 + math.max(0, bandBits - 16)

  /** Corpus-derived IVF cell count — [[derivedBandBits]]'s analog for
    * the coarse quantizer: the smallest power of two k ≥ 16 with
    * k²·8 ≥ N, i.e. k ≈ √(N/8) rounded up to a power of two. Cell
    * population is then N/k ≤ 8k, so a query's probed-cell scan costs
    * nprobe·8k = O(√N) — the standard IVF sizing (nlist ∝ √N) — where
    * a FIXED nlist reverts the probe toward linear-in-N per query
    * (cell population ∝ N/const), the same cliff shape the LSH band
    * derivation closed in r18. Capped at 2^20 cells (valid to
    * N = 2^40·8 ≈ 8.8e12 vectors at occupancy ≤ 8·2^20; past that a
    * deployment trains on a sample anyway). Pure integer shifts, so
    * the SAME rule replays as the `nlparams` CTE in every IVF oracle
    * (SparkEntry `nlistParamsCte`) — derived parameters stay
    * hash-exact at any SF. At the registered corpora (500–2000
    * vectors) the rule lands on the floor k = 16, bit-identical to
    * the retired fixed knob; IvfScaleSpec drives planted corpora
    * across the 2048-vector boundary where the two rules diverge.
    */
  private[graft] def derivedNlist(n: Long): Int = {
    var b = 4
    while (b < 20 && (1L << b) * (1L << b) * 8L < n) b += 1
    1 << b
  }

  /** [[derivedNlist]] over the corpus cardinality — shares
    * [[corpusBandBits]]'s memoized count and immutable-dir contract.
    */
  private[graft] def corpusNlist(spark: SparkSession, dir: String): Int =
    derivedNlist(corpusCountCache.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir),
      Tables.embeddings(spark, dir).count()))

  /** The IVF family's knob resolution: explicit values (specs, stress
    * probes) pass through; the 0 sentinel derives from cardinality.
    */
  private def resolveNlist(spark: SparkSession, dir: String, nlist: Int): Int =
    if (nlist > 0) nlist else corpusNlist(spark, dir)

  private val corpusCountCache =
    scala.collection.concurrent.TrieMap[(String, String), Long]()

  /** Drop all memoized corpus counts — for harnesses (ScaleProbe) that
    * rewrite a corpus dir inside one application and need the banding
    * re-derived. Production reads never need this (see the
    * immutable-dir assumption on [[corpusBandBits]]).
    */
  private[graft] def clearCorpusCountCache(): Unit = corpusCountCache.clear()

  /** [[derivedBandBits]] over the corpus cardinality — one count()
    * per (application, corpus), cached: the scan is columnar count
    * pushdown (parquet row-group metadata), the cost CBO stats would
    * also pay once.
    *
    * ASSUMES the corpus dir is immutable for the application lifetime
    * (the lakehouse contract this whole library reads under: a corpus
    * version is a frozen dir; appends land as NEW dirs that the
    * standing-index `*Append` ops fold in). Rewriting `dir` in place
    * mid-application would leave the cached count — and therefore the
    * derived band width — stale, diverging from the oracle's live
    * recount; a harness that must do that calls
    * [[clearCorpusCountCache]] between legs.
    */
  private[graft] def corpusBandBits(spark: SparkSession, dir: String): Int =
    derivedBandBits(corpusCountCache.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir),
      Tables.embeddings(spark, dir).count()))

  /** Banded random-hyperplane LSH signatures for the whole corpus:
    * one row per (vector, band) with the band's `bandBits`-bit slice of
    * the signature. Shared candidate-generation machinery for
    * [[annLsh]] (query → neighbors) and [[dedupEmbeddingAnn]]
    * (all near-dup pairs): candidates come from bucket collisions on
    * `(band, band_val)`, never from an N² cross product.
    *
    * Scale knobs: `nBits`/`bandBits` set the bucket count
    * (`nBands × 2^bandBits` distinct join keys) and per-band collision
    * probability `(1 − θ/π)^bandBits`. By default (the 0 sentinel)
    * both DERIVE from corpus cardinality — [[derivedBandCount]] bands
    * of [[corpusBandBits]] bits — so bucket count scales ∝ N and the
    * registered consumers stay linear-in-N at ANY corpus size (band
    * width uncapped to 45 bits, band count growing one per extra bit
    * past 16 to hold recall; see [[derivedBandBits]]). Explicit
    * values remain for stress probes and specs. The recall a wider
    * band costs is additionally recovered on the probe side
    * ([[probeExpand]]), never by re-narrowing the buckets.
    *
    * Each band's value is computed DIRECTLY from its own slice of
    * hyperplane sign bits (band k, local bit i ← plane k·bandBits+i,
    * weight 2^i) rather than packed through one 64-bit signature and
    * re-sliced — bit-identical to the old packed form wherever
    * nBands·bandBits ≤ 63 (same plane indices, same local weights),
    * but free of the 64-bit budget that used to cap width at 16. The
    * per-row sign-bit pass (nBands·bandBits dot products) feeds every
    * band stream, so it is computed once and persisted pre-explode.
    */
  private val lshSigCache = scala.collection.concurrent.TrieMap[
    (String, String, Int, Int, Int), DataFrame]()
  private val lshSigLocks = scala.collection.concurrent.TrieMap[
    (String, String, Int, Int, Int), Object]()

  /** Drop the memoized LSH signature frames — the probe/test hook of
    * the family's session caches (same contract as
    * [[clearCorpusCountCache]] / [[clearCentroidCache]]). The frames
    * are EAGER localCheckpoints, so clearing the map alone would
    * orphan corpus-scale checkpoint blocks in the block manager until
    * GC/ContextCleaner happens to run — during exactly the
    * measurements ScaleProbe's per-run clears exist to isolate;
    * each frame's backing RDD is unpersisted explicitly first.
    */
  private[graft] def clearLshSigCache(): Unit = {
    lshSigCache.values.foreach { df =>
      org.apache.spark.sql.GraftGlue.analyzed(df) match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
    lshSigCache.clear()
    lshSigLocks.clear()
  }

  private[graft] def lshBands(spark: SparkSession, dir: String,
                              nBits0: Int = 0, bandBits0: Int = 0, dim: Int = 64): DataFrame = {
    val bandBits = if (bandBits0 > 0) bandBits0 else corpusBandBits(spark, dir)
    val nBands = if (nBits0 > 0) nBits0 / bandBits else derivedBandCount(bandBits)
    // The signature pass (nBands·bandBits dot products per row) is the
    // LSH family's corpus scan, and SEVEN registered consumers share
    // the default-parameter signature (annLsh, dedupEmbeddingAnn,
    // dedupThresholdSweep, contrastivePairs, the three bitext rows) —
    // so it is session-memoized per (application, corpus, params) as
    // an eager localCheckpoint, the same model-state pattern as the
    // BPE/unigram/Lloyd training caches. This also ends the one
    // cached-signature-frame-per-call accumulation the old per-call
    // persist leaked. Values are per-row deterministic (md5 planes,
    // sign thresholds), so the memo can never change a result — only
    // who pays the scan. The standing-table shape is no longer prose:
    // [[lshSigStandingTable]] materializes this same frame as a
    // versioned bucketed parquet table with a batch-shaped append
    // lifecycle (registered `similarity_ann_lsh_standing`/`_append`);
    // the memo remains the in-session fast path fronting it, under
    // the immutable-corpus-dir contract ([[corpusBandBits]]).
    val key = (spark.sparkContext.applicationId, dir, nBits0, bandBits0, dim)
    val sig = lshSigCache.get(key) match {
      case Some(s) => s
      case None =>
        lshSigLocks.getOrElseUpdate(key, new Object).synchronized {
          lshSigCache.getOrElseUpdate(key,
            lshSigPlan(spark, dir, nBands, bandBits, dim).localCheckpoint(true))
        }
    }
    explodeSigBands(sig, nBands)
  }

  /** Signature frame → per-(vector, band) rows: the explode every
    * banded consumer applies, whether the frame comes from the
    * in-session memo ([[lshBands]]) or the standing bucketed table
    * ([[lshSigStandingTable]]). Pure column shuffling — zero compute,
    * zero exchange — so both paths feed consumers bit-identical rows.
    */
  private[graft] def explodeSigBands(sig: DataFrame, nBands: Int): DataFrame =
    sig.select(
      col("vec_id"), col("v"), col("nrm"),
      posexplode(array((0 until nBands).map(k => col(s"bv$k")): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")

  /** The LSH signature frame as a PERSISTED bucketed table — the
    * deployment shape the [[lshBands]] memo's own comment promises:
    * at 100 TB the banded-signature corpus scan (nBands·bandBits dot
    * products per row, shared by seven registered consumers) is paid
    * ONCE at ingest and lands in a standing `bucketBy(vec_id)` parquet
    * table; sessions then READ signatures instead of recomputing them,
    * and the eager in-session `localCheckpoint` memo — corpus-sized
    * executor storage that dies with the session — becomes a cache in
    * front of this table rather than the only materialization. The
    * memo stays the in-session fast path for the existing consumers
    * (their plans and oracle hashes are untouched); the `*_standing` /
    * `*_append` rows run the SAME probe against this table.
    *
    * VERSIONED by derivation: the signature family is fully determined
    * by (nBands, bandBits, dim), so those parameters are folded into
    * the table name — a corpus growing past a banding breakpoint
    * (`derivedBandBits`) yields a NEW table version and the stale
    * version simply stops being addressed, the same
    * re-derive-don't-mutate posture as the IVF codebook. Bucketing by
    * `vec_id` makes the id-keyed reads (vector fetch-back, tombstone
    * anti-joins) exchange-free on the signature side and gives appends
    * a stable layout contract (Spark validates the incoming bucket
    * spec against the catalog's).
    *
    * `appendEpoch` executes the ingest lifecycle instead of a one-shot
    * build: epoch 1 writes signatures for the first 80% of vectors,
    * epoch 2 computes signatures ONLY over the remaining batch — the
    * `vec_id > cut` filter pushes into the embedding scan, so the
    * append's compute is batch-shaped, never corpus-shaped — and
    * `mode("append")`s them into the same table. Base ∪ batch is the
    * full corpus's signature set, so probes against the grown table
    * return bit-identical rows to the one-shot build (and to the memo
    * path), which is why all three share one DuckDB oracle.
    *
    * The 80% cut is a driver-side scalar (`max(vec_id)·8 div 10`) —
    * bounded model state like [[corpusBandBits]]'s cached count, and
    * deliberately NOT the in-plan `crossJoin(broadcast(cut))` form the
    * minhash family uses: a join predicate cannot push into the scan,
    * and the whole point of the append epoch is that the batch's
    * signature computation scans only batch row groups.
    */
  private[graft] def lshSigStandingTable(spark: SparkSession, dir: String,
      appendEpoch: Boolean, dim: Int = 64): (String, Int, Int) = {
    val bandBits = corpusBandBits(spark, dir)
    val nBands = derivedBandCount(bandBits)
    val (table, path) = Tables.scopedIndex(spark,
      s"graft_lsh_sig_v${nBands}x${bandBits}x$dim", dir)
    def write(rows: DataFrame, mode: String): Unit =
      // one partition per bucket (see Dedup.componentLabels): the
      // un-clustered build left 256 files on the sf0.1 table that all
      // seven signature consumers re-opened every probe
      rows.repartition(8, col("vec_id"))
        .write.bucketBy(8, "vec_id").sortBy("vec_id")
        .option("path", path).mode(mode).saveAsTable(table)
    val sig = lshSigPlan(spark, dir, nBands, bandBits, dim)
    if (!appendEpoch) write(sig, "overwrite")
    else {
      // coalesce: max over an EMPTY corpus is NULL (EmptyInputSpec);
      // -1 routes every (zero) row to the append epoch harmlessly
      val cut = Tables.embeddings(spark, dir)
        .agg(coalesce(expr("max(vec_id) * 8 div 10"), lit(-1L)))
        .head.getLong(0)
      write(sig.filter(col("vec_id") <= cut), "overwrite")
      write(sig.filter(col("vec_id") > cut), "append")
    }
    (table, nBands, bandBits)
  }

  /** [[annLsh]]'s probe run against the STANDING signature table
    * ([[lshSigStandingTable]]) instead of the in-session memo — the
    * 100 TB steady-state read path, registered so the
    * signatures-from-parquet claim is oracle-checked, not prose. Same
    * probe, same rows, same DuckDB oracle as `similarity_ann_lsh`.
    */
  def annLshStanding(spark: SparkSession, dir: String, probes: Int = 1): DataFrame = {
    val (table, nBands, bb) = lshSigStandingTable(spark, dir, appendEpoch = false)
    annLshFrom(explodeSigBands(spark.table(table), nBands), bb, probes)
  }

  /** The standing signature table's APPEND lifecycle, executed:
    * 80%-build, batch-only signature append, probe against the grown
    * table (see [[lshSigStandingTable]]). Returns rows bit-identical
    * to [[annLsh]], sharing its oracle — "per-ingest signature cost is
    * batch-shaped" as a registered, oracled query.
    */
  def annLshStandingAppend(spark: SparkSession, dir: String, probes: Int = 1): DataFrame = {
    val (table, nBands, bb) = lshSigStandingTable(spark, dir, appendEpoch = true)
    annLshFrom(explodeSigBands(spark.table(table), nBands), bb, probes)
  }

  /** The LAZY signature-frame plan the memo materializes — exposed
    * separately so PlanQualitySpec can pin the scan shape (pruned
    * embedding read, no label column) on the plan that actually pays
    * the corpus scan; consumer plans read the checkpoint.
    */
  private[graft] def lshSigPlan(spark: SparkSession, dir: String,
      nBands: Int, bandBits: Int, dim: Int): DataFrame = {
    val nBits = nBands * bandBits
    val planes: Seq[Seq[Double]] = (0 until nBits).map { p =>
      (0 until dim).map(j => planeWeight(p, j))
    }
    val planesLit = typedLit(planes)
    val emb = withNorm(spark, dir)
    val bandVals = (0 until nBands).map { k =>
      (0 until bandBits).map { i =>
        val p = k * bandBits + i
        when(dot(col("v"), element_at(planesLit, p + 1)) > 0, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _).as(s"bv$k")
    }
    emb.select(col("vec_id") +: col("v") +: col("nrm") +: bandVals: _*)
  }

  /** All `bandBits`-bit XOR masks with popcount ≤ `probes`, in
    * ascending numeric order — the hamming-ball enumeration
    * [[probeExpand]] fans out over and the oracle's mask CTE replays.
    * Generated combinatorially (bit-position combinations, then
    * sorted) rather than by scanning all 2^bandBits masks: the same
    * set in the same order for any width, but O(C(bandBits, probes))
    * work — a 45-bit band at probe level 2 enumerates 1,036 masks,
    * not 2^45.
    */
  private[graft] def probeMasks(bandBits: Int, probes: Int): Seq[Long] =
    (0 to math.min(probes, bandBits)).flatMap(k =>
      (0 until bandBits).combinations(k).map(_.map(1L << _).sum))
      .sorted

  /** Hamming-≤`probes` multi-probe over one side of a [[lshBands]]
    * relation: each band row fans out to its own bucket plus every
    * bucket within `probes` bit flips, so a pair shares a probed
    * bucket exactly when its band signatures differ by ≤ `probes`
    * bits. This is the recall knob that does NOT re-narrow the
    * buckets: corpus-derived banding keeps collisions Θ(N·load) and
    * multi-probe multiplies only the PROBED side by Σ C(bandBits, i)
    * for i ≤ probes — (1 + b) at the registered level 1, a log-N
    * factor; level 2 adds the C(b, 2) two-flip shell (the
    * accuracy-cost trade `bitext_recall_sweep` measures). Applied to
    * one side of the join, never a rehash of the corpus. `probes ≤ 0`
    * is the identity (exact-bucket lookup); levels ≥ bandBits would
    * enumerate the whole band space — callers keep probes ≪ bandBits.
    */
  private def probeExpand(bands: DataFrame, bandBits: Int, probes: Int): DataFrame =
    if (probes <= 0) bands
    else bands.withColumn("band_val",
      explode(array(probeMasks(bandBits, probes).map(m =>
        if (m == 0L) col("band_val")
        else col("band_val").bitwiseXOR(lit(m))): _*)))

  /** [[probeExpand]] carrying each fan-out row's probe level
    * (`plevel` = the mask's popcount): the same hamming-ball
    * enumeration, but downstream consumers can recover every
    * SHALLOWER level by filtering `plevel` — the nesting
    * [[bitextScoredLeveled]] exploits to run one sweep-wide pass.
    */
  private def probeExpandLeveled(bands: DataFrame, bandBits: Int,
                                 probes: Int): DataFrame =
    if (probes <= 0) bands.withColumn("plevel", lit(0))
    else bands
      .select(col("*"), explode(array(probeMasks(bandBits, probes).map(m =>
        struct(lit(java.lang.Long.bitCount(m)).as("pl"),
          (if (m == 0L) col("band_val")
           else col("band_val").bitwiseXOR(lit(m))).as("bv"))): _*)).as("pe"))
      .withColumn("band_val", col("pe.bv"))
      .withColumn("plevel", col("pe.pl"))
      .drop("pe")

  /** Radius-1 hamming expansion carrying the applied MASK in `maskCol`
    * — the per-side half of [[bitextScoredLeveled]]'s two-sided level-2
    * split, where the post-join canonical-split filter needs both
    * sides' masks (plevel then reassembles as the popcount sum).
    */
  private def probeExpandMasked(bands: DataFrame, bandBits: Int,
                                maskCol: String): DataFrame =
    bands
      .select(col("*"), explode(array(probeMasks(bandBits, 1).map(m =>
        struct(lit(m).as("m"),
          (if (m == 0L) col("band_val")
           else col("band_val").bitwiseXOR(lit(m))).as("bv"))): _*)).as("pe"))
      .withColumn("band_val", col("pe.bv"))
      .withColumn(maskCol, col("pe.m"))
      .drop("pe")

  /** Approximate top-5 via random-hyperplane LSH: corpus-derived
    * banding ([[derivedBandCount]] bands × [[corpusBandBits]] md5-derived hyperplane sign
    * bits) with hamming-≤1 multi-probe on the QUERY side. A candidate
    * is scored only if it lands in a probed bucket of the query, then
    * exact cosine ranks the survivors. Deterministic by construction →
    * the full pipeline (plane weights, sign bits, banding, probe
    * fan-out, dedupe, re-rank) replays in the DuckDB oracle; the
    * ScalaTest suite additionally checks recall against [[topKBrute]].
    */
  def annLsh(spark: SparkSession, dir: String, probes: Int = 1): DataFrame = {
    val bb = corpusBandBits(spark, dir)
    annLshFrom(lshBands(spark, dir), bb, probes)
  }

  /** The probe shared by the memo-backed [[annLsh]] and the
    * standing-table variants: `bands` is any per-(vector, band)
    * relation in [[lshBands]]'s shape — where the signatures came from
    * is the only difference between the three registered rows.
    */
  private def annLshFrom(bands: DataFrame, bb: Int, probes: Int): DataFrame = {
    val qBands = probeExpand(bands.filter(col("vec_id") < 10), bb, probes).select(
      col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
      col("band"), col("band_val"))

    val candidates = bands
      .join(broadcast(qBands), Seq("band", "band_val"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("qnrm"), col("vec_id"), col("v"), col("nrm"))
      .dropDuplicates("qid", "vec_id")

    val scored = candidates
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    graft.functions.TopK.perQuery(scored, 5)
  }

  /** Embedding near-duplicate pairs via LSH candidate generation — the
    * scale path [[dedupEmbedding]]'s doc comment promises. Candidate
    * pairs come from [[lshBands]] bucket collisions (equi-join on
    * `(band, band_val)`, upper-triangle, deduped across bands), then
    * EXACT cosine verifies each survivor at the threshold — so every
    * emitted pair is a true near-dup (precision 1 vs the all-pairs
    * baseline); only candidate recall is approximate, tuned by the
    * hamming-≤1 probe fan-out ([[probeExpand]]) rather than by
    * re-narrowing buckets. No N² join anywhere: banding derives from
    * corpus cardinality, so compute is O(Σ bucket²) = Θ(N·load·(1+b))
    * ≪ O(N²) throughout the derivation's ≈524k-vector validity range
    * ([[derivedBandBits]]).
    *
    * Deterministic by construction (md5 planes, integer band values,
    * exact-double cosine) → the whole pipeline replays in the DuckDB
    * oracle, exactly like [[annLsh]]. The ScalaTest suite additionally
    * pins precision = 1 and measured recall against the exact
    * [[dedupEmbedding]] scorer.
    */
  def dedupEmbeddingAnn(spark: SparkSession, dir: String, threshold: Double = 0.35,
                        probes: Int = 1): DataFrame = {
    val bb = corpusBandBits(spark, dir)
    val bands = lshBands(spark, dir)
    // hamming-≤1 probing on ONE side covers the symmetric pair
    // condition (the pair collides iff the band signatures differ by
    // ≤ 1 bit, whichever side fans out)
    val a = probeExpand(bands, bb, probes).select(
      col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"),
      col("band"), col("band_val"))
    val b = bands.select(
      col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      // verify each band collision BEFORE deduping: a pair colliding in
      // k≤nBands bands is scored k times (≈128 redundant flops each),
      // but the dedupe exchange then carries 16-byte id pairs instead
      // of both embedding vectors — at scale, moved bytes dominate
      // re-computed flops (deduping first was a SortAggregate over
      // vector-carrying rows)
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Near-dup threshold sweep: pair counts through the SAME LSH
    * candidate set at several cosine thresholds — the tuning table for
    * [[dedupEmbeddingAnn]]'s one free parameter (too low merges
    * unrelated docs, too high keeps mirror farms; the elbow in this
    * curve is where a corpus's duplicate mass sits). Candidates are
    * scored once, deduped as slim (id, id, cos) rows, and each pair
    * fans out to the ≤ 4 threshold rows it clears — no per-threshold
    * re-scan, no crossJoin. Thresholds ride as integer micro-units; the
    * double compare `cos ≥ t/10⁶` is the identical IEEE expression in
    * both engines.
    */
  def dedupThresholdSweep(spark: SparkSession, dir: String,
                          probes: Int = 1): DataFrame = {
    val ths = Seq(250000L, 350000L, 500000L, 700000L)
    val bb = corpusBandBits(spark, dir)
    val bands = lshBands(spark, dir)
    // identical candidate generator to dedupEmbeddingAnn (same derived
    // banding, same one-sided hamming-≤1 fan-out) — SimilaritySpec pins
    // the 0.35 row against its pair count
    val a = probeExpand(bands, bb, probes).select(
      col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"),
      col("band"), col("band_val"))
    val b = bands.select(
      col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .distinct()
      .select(col("cos"),
        explode(array(ths.map(lit): _*)).as("threshold_micro"))
      .filter(col("cos") >= col("threshold_micro").cast("double") / 1000000.0)
      .groupBy(col("threshold_micro"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Contrastive training triplets for embedding-model fine-tuning
    * (anchor, positive, hard negatives) — the data-construction pass a
    * retriever/bi-encoder pipeline runs over its corpus (in-batch
    * negatives are free; the HARD negatives — near-misses just below
    * the positive band — are what this op mines, the part that needs
    * the engine). Per anchor: the single best candidate at
    * cosine ≥ `tPos` becomes the positive; the top-`nNeg` candidates
    * in `[tNegLo, tPos)` become hard negatives. Anchors with no
    * positive emit nothing (no pair to contrast against).
    *
    * Scale shape: candidates come from [[lshBands]] bucket collisions
    * — the same sub-quadratic generator as [[dedupEmbeddingAnn]], here
    * DIRECTED (every vector is an anchor, a→b and b→a are distinct
    * training rows) — scored once with exact cosine, then the whole
    * role tail (has-positive gate, per-role ranking, both band
    * filters) runs over ONE anchor_id exchange; anchors without a
    * positive are pruned before ranking, so the contract ("negatives
    * only accompany a pair") holds in-plan with no semi-join. No N²
    * anywhere; output is ≤ (1 + nNeg) rows per anchor.
    *
    * Deterministic by construction (md5 planes, integer band values,
    * exact-double cosine, ties broken by pair_id) → full DuckDB
    * replay, like the rest of the LSH family. Ranks and ids only in
    * the output; the threshold compares are the identical IEEE
    * expressions both engines fold.
    */
  def contrastivePairs(spark: SparkSession, dir: String,
                       tPos: Double = 0.35, tNegLo: Double = 0.05,
                       nNeg: Int = 3,
                       nBits: Int = 0, bandBits: Int = 0,
                       probes: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bb = if (bandBits > 0) bandBits else corpusBandBits(spark, dir)
    val bands = lshBands(spark, dir, nBits, bandBits)
    // anchor side carries the hamming-≤1 fan-out (one-sided probe
    // covers the symmetric condition; candidates stay Θ(N·load·(1+b)))
    val a = probeExpand(bands, bb, probes).select(
      col("vec_id").as("anchor_id"), col("v").as("va"), col("nrm").as("na"),
      col("band"), col("band_val"))
    val b = bands.select(
      col("vec_id").as("pair_id"), col("v").as("vb"), col("nrm").as("nb"),
      col("band"), col("band_val"))
    // score each collision BEFORE deduping, then dedupe slim id rows —
    // same moved-bytes-over-flops call as dedupEmbeddingAnn
    val scored = a.join(b, Seq("band", "band_val"))
      .filter(col("anchor_id") =!= col("pair_id"))
      .select(col("anchor_id"), col("pair_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .distinct()
    // One exchange for the whole tail: the has-positive window hashes
    // by anchor_id, and the per-role rank window's ClusteredDistribution
    // on (anchor_id, role) is satisfied by that same partitioning
    // (partition keys ⊆ clustering keys) — so scored is evaluated ONCE
    // and anchors without a positive are pruned BEFORE ranking, instead
    // of the pos/neg/semi-join formulation's three scored replays over
    // two window exchanges.
    val wAnchor = Window.partitionBy(col("anchor_id"))
    val wRole = Window.partitionBy(col("anchor_id"), col("role"))
      .orderBy(col("sim").desc, col("pair_id").asc)
    scored
      .withColumn("role",
        when(col("sim") >= tPos, lit("pos"))
          .when(col("sim") >= tNegLo, lit("neg")))
      .filter(col("role").isNotNull)
      .withColumn("has_pos",
        max(when(col("role") === "pos", lit(1)).otherwise(lit(0))).over(wAnchor))
      .filter(col("has_pos") === 1)
      .withColumn("rnk", row_number().over(wRole))
      .filter(col("rnk") <= math.max(1, nNeg))
      .filter(col("role") === "neg" || col("rnk") === 1)
      .select(col("anchor_id"), col("pair_id"), col("role"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Recall@5 scoreboard for the ANN family: every approximate variant
    * ([[annLsh]], [[annIvf]], [[annPq]], [[annIvfPq]]) scored against
    * the exact [[topKBrute]] ground truth in one plan — the
    * quality/performance trade-off as an oracled artifact instead of a
    * ScalaTest-only assertion. Output is integer hit counts
    * `(variant, k, hits, possible)`; recall@5 = hits/possible. No
    * floats cross the hash compare, and every input relation is itself
    * independently oracled, so the DuckDB replay is a composition of
    * already-verified SQL.
    *
    * Plan shape: the four variant plans union (each keeps its own
    * candidate-bounded shape — band buckets, probed cells, ADC scans);
    * the exact top-k result (queries×k = 50 rows) is localCheckpoint'd
    * so the O(kN) brute-force scan runs exactly once, then broadcasts
    * into a hash left-join; hits reduce per variant via partial
    * aggregation; the 1-row `possible` total rides a broadcast
    * crossJoin. The final left join FROM the literal 4-row variant
    * list guarantees a variant whose ANN query regresses to zero rows
    * still surfaces as a `hits=0` scoreboard row instead of silently
    * vanishing from the output. At 100 TB the expensive sides are the
    * variants themselves — the scoreboard overhead on top is one
    * broadcast of a k-bounded relation.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame =
    annRecallOf(spark, dir, Seq(
      "ann_ivf"   -> annIvf(spark, dir),
      "ann_ivfpq" -> annIvfPq(spark, dir),
      "ann_lsh"   -> annLsh(spark, dir),
      "ann_pq"    -> annPq(spark, dir)))

  /** The shard-grouped CLUSTERED corpus scoreboard as a REGISTERED,
    * oracled row (the r19 verdict's item 5): RECALL.json's planted
    * corpus is probe output, re-recorded only when someone runs the
    * probe; this row generates an equivalent clustered corpus IN-PLAN
    * from integer md5 arithmetic ([[synthClusteredDir]] — the same
    * derivation the DuckDB oracle replays as a CTE shadowing the
    * `embeddings` view), runs the full four-variant scoreboard PLUS
    * the untrained first-nlist control at the same nprobe, and is
    * hash-checked against the oracle every round. The claim it pins:
    * on clustered data the TRAINED codebook's recall ≥ the untrained
    * control's (AnnCodebookSpec's measurement as a standing artifact),
    * and no variant silently collapses there again (the r19 IVF-PQ
    * failure mode — caught only because the probe happened to run).
    * The corpus is independent of `dir` by construction, so the row's
    * rows — and its oracle hashes — are identical at every SF.
    */
  def annRecallClustered(spark: SparkSession, dir: String): DataFrame = {
    val sd = synthClusteredDir(spark, dir)
    annRecallOf(spark, sd, Seq(
      "ann_ivf"   -> annIvf(spark, sd),
      "ann_ivfpq" -> annIvfPq(spark, sd),
      "ann_lsh"   -> annLsh(spark, sd),
      "ann_pq"    -> annPq(spark, sd),
      "ann_ivf_ctl" -> annIvfWith(spark, sd,
        ivfCodebookFirstN(spark, sd, corpusNlist(spark, sd)), nprobe = 4)))
  }

  /** In-plan clustered embedding corpus, written once per
    * (application, dir-scope) under the usual scoped-index contract:
    * 2000 vectors, 12 contiguous (shard-grouped) clusters, queries
    * 0–9 drawn from clusters 1–10 ([[RecallProbe]]'s convention).
    * Every coordinate is INTEGER md5 arithmetic — center(cluster, j)
    * in [-1000, 1000] plus noise(id, j) in [-120, 120] (12% relative,
    * the RecallProbe σ) — so the exact corpus regenerates in DuckDB
    * with the `('0x' || substr(md5(...), 1, 7))::BIGINT` idiom every
    * LSH oracle already uses, and floats carry the integers exactly.
    */
  private[graft] def synthClusteredDir(spark: SparkSession, dir: String): String =
    this.synchronized {
      val (_, path) = Tables.scopedIndex(spark, "graft_synth_clustered", dir)
      if (!new java.io.File(s"$path/embeddings.parquet/_SUCCESS").exists()) {
        spark.range(2000)
          .select(col("id").as("vec_id"),
            expr("""transform(sequence(0, 63), j -> CAST(
                CAST(conv(substring(md5(CAST(concat_ws(':', 'ctr',
                  CAST(CASE WHEN id < 10 THEN id + 1 ELSE id * 12 div 2000 END AS STRING),
                  CAST(j AS STRING)) AS BINARY)), 1, 7), 16, 10) AS BIGINT) % 2001 - 1000
                + CAST(conv(substring(md5(CAST(concat_ws(':', 'nz',
                  CAST(id AS STRING), CAST(j AS STRING)) AS BINARY)), 1, 7), 16, 10) AS BIGINT) % 241 - 120
              AS FLOAT))""").as("embedding"))
          .repartition(8)
          .write.mode("overwrite").parquet(s"$path/embeddings.parquet")
      }
      path
    }

  private def annRecallOf(spark: SparkSession, dir: String,
      variants: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    // eager localCheckpoint: 50 rows, evaluated once — the broadcast
    // join side and the `possible` scalar both read the materialized
    // leaf, not two replays of the exact scan
    val exact = topKBrute(spark, dir)
      .select(col("qid"), col("neighbor_id"), lit(1L).as("hit"))
      .localCheckpoint()
    val approx = variants.map { case (name, df) =>
      df.select(lit(name).as("variant"), col("qid"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val possible = exact.agg(count(lit(1)).as("possible"))
    val hits = approx
      .join(broadcast(exact), Seq("qid", "neighbor_id"), "left")
      .groupBy(col("variant"))
      // count(hit) counts non-nulls: rows the exact top-k also contains
      .agg(count(col("hit")).as("hits"))
    variants.map(_._1).toDF("variant")
      .join(hits, Seq("variant"), "left")
      .crossJoin(broadcast(possible))
      .select(col("variant"), lit(5L).as("k"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("possible"))
  }

  /** The IVF accuracy-cost trade as a registered artifact — the
    * [[annIvf]] twin of [[bitextRecallSweep]]: for each nprobe level,
    * the candidate count the probe pays (rows scanned from the probed
    * cells — the ADC-scan cost axis that at 100 TB is `nprobe/nlist`
    * of the corpus per query batch) against the recall@5 it buys vs
    * the exact brute-force [[topKBrute]]. One 5-column row per level;
    * assignment (the nlist-dot-products pass) and the exact
    * denominator are computed ONCE and shared across levels — the
    * sweep's marginal cost per level is its own probe join, which is
    * the quantity being measured.
    */
  def annNprobeSweep(spark: SparkSession, dir: String, nlist: Int = 0,
                     nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    import spark.implicits._
    val emb = withNorm(spark, dir)
    val (nCells, cellSims) = ivfCodebook(spark, dir,
      resolveNlist(spark, dir, nlist)).getOrElse(
      return Seq.empty[(Int, Long, Long, Long, Double)]
        .toDF("nprobe", "candidates", "hits", "possible", "recall"))
    val assigned = emb
      .withColumn("cs", cellSims(col("v"), col("nrm")))
      .withColumn("cell", array_position(col("cs"), array_max(col("cs"))).cast("int"))
      .drop("cs")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exact = topKBrute(spark, dir)
      .select(col("qid"), col("neighbor_id")).localCheckpoint()
    val possible = exact.agg(count(lit(1)).as("possible"))
    val qAll = assigned.filter(col("vec_id") < 10)
      .withColumn("cs", cellSims(col("v"), col("nrm")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nprobes.map { np =>
      // same probe expression (and cid-DESC tie rule) as annIvf, cut
      // at this level's np
      val qProbes = qAll.select(
        col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        explode(slice(
          transform(
            reverse(array_sort(zip_with(col("cs"), sequence(lit(1), lit(nCells)),
              (s, i) => struct(s.as("s"), i.as("i"))))),
            p => p.getField("i")),
          1, np)).as("cell"))
      val scored = assigned
        .join(broadcast(qProbes), Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cand = scored.agg(count(lit(1)).as("candidates"))
      val hits = graft.functions.TopK.perQuery(scored, 5)
        .join(exact, Seq("qid", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      cand.crossJoin(hits).crossJoin(possible)
        .select(lit(np).as("nprobe"), col("candidates"), col("hits"),
          col("possible"),
          // NULL when brute force has no pairs (single-vector corpus)
          // — ANSI-safe, same CASE guard in the oracle
          when(col("possible") > 0,
            col("hits").cast("double") / col("possible").cast("double"))
            .as("recall"))
    }.reduce(_ unionAll _)
  }

  /** Hybrid lexical+semantic retrieval via reciprocal-rank fusion
    * (Cormack et al., "Reciprocal Rank Fusion outperforms Condorcet
    * and individual rank learning methods", SIGIR'09): fuse
    * [[graft.operators.TextOps.docKnnTfidf]]'s tf-idf doc-to-doc
    * ranking with [[topKBrute]]'s embedding-cosine ranking by
    * RRF(d) = Σ_sys 1/(60 + rank_sys(d)) — the standard data-curation
    * combiner when neither signal alone suffices (lexical misses
    * paraphrase, semantic misses rare exact terms). House integer
    * discipline: each side contributes the micro-unit surrogate
    * `1000000 div (60 + rnk)` (monotone in the true 1/(60+r), values
    * distinct for every rank ≤ k), so the fused score is a BIGINT
    * both engines floor identically — no float crosses the hash
    * compare. Absent-from-one-list documents contribute 0 from that
    * side (the standard RRF convention).
    *
    * Scale shape: both inputs are k-bounded per query (each ≤ 10·k
    * rows — metadata scale), so the full-outer fusion join and the
    * per-qid re-rank window touch ≤ 2·10·k rows regardless of corpus
    * size; all corpus-scale work lives inside the two (independently
    * registered, independently scale-audited) rankers.
    */
  def hybridSearchRrf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = TextOps.docKnnTfidf(spark, dir, k)
      .select(col("qid"), col("neighbor_id"), col("rnk").as("rl"))
    val sem = topKBrute(spark, dir)
      .select(col("qid"), col("neighbor_id"), col("rnk").as("rs"))
    lex.join(sem, Seq("qid", "neighbor_id"), "full_outer")
      .select(col("qid"), col("neighbor_id"),
        (coalesce(expr("CAST(1000000 AS BIGINT) div (60 + rl)"), lit(0L)) +
          coalesce(expr("CAST(1000000 AS BIGINT) div (60 + rs)"), lit(0L)))
          .as("fused_micro"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("fused_micro").desc, col("neighbor_id").asc))
        .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas,
    * "Database-friendly random projections": Rademacher ±1 entries
    * preserve pairwise distances like Gaussian ones): each int8-
    * quantized embedding is projected to k = 16 dimensions,
    * y_j = Σᵢ qᵢ·s(i,j), with the sign matrix derived from md5 parity
    * of (i, j) — deterministic, shared by every row, and replayed
    * verbatim by the DuckDB oracle. Projections stay BIGINT-exact
    * (|q| ≤ 127, dim ≤ 10⁵ ⇒ |y| ≪ 2⁶³), so the output is
    * hash-comparable and safe to feed the ANN family as a cheaper
    * vector column.
    *
    * Scale shape: no collect anywhere — the sign matrix materializes
    * as a dim×k DataFrame (1 024 rows at d=64) built FROM the data's
    * own dimension ids and broadcast; the per-vector expansion
    * (posexplode → sign join → groupBy (vec, j)) partially aggregates
    * map-side back to n·k rows before the one exchange, so the
    * shuffled volume is the OUTPUT size, not the d×k intermediate.
    */
  def embeddingRandomProjection(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .select(col("vec_id"), expr(
        "transform(v, x -> CASE WHEN ma = 0.0D THEN 0L ELSE " +
          "greatest(-127L, least(127L, CAST(floor(x * 127.0D / ma) AS BIGINT))) END)")
        .as("qarr"))
    val dimIds = q.select(posexplode(col("qarr")).as(Seq("i", "qi")))
      .select(col("i")).distinct()
    val signs = dimIds
      .crossJoin(broadcast(spark.range(k.toLong).select(col("id").cast("int").as("j"))))
      .withColumn("s",
        when(conv(substring(md5(concat_ws(":", lit("jl"), col("i").cast("string"),
          col("j").cast("string")).cast("binary")), 1, 7), 16, 10)
          .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)))
    q.select(col("vec_id"), posexplode(col("qarr")).as(Seq("i", "qi")))
      .join(broadcast(signs), "i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("qi") * col("s")).as("y"))
  }
}
