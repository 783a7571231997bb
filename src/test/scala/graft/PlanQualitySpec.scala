package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventOps, Relational, TextOps}
import graft.plans.PlanChecks

/** Shuffle-budget regression gate: each query's intended exchange count
  * is pinned. A rewrite that silently adds a fact-scale shuffle (the
  * classic 100 TB regression) fails here, on fixture data, immediately.
  * Counts are upper bounds — fewer is always acceptable.
  */
class PlanQualitySpec extends AnyFunSuite with SparkFixture {

  test("taskA filter+project runs with zero shuffles") {
    assert(PlanChecks.shuffles(Relational.taskAFilterProject(spark, fixtureDir)) === 0)
  }

  test("taskF runs in at most 2 shuffles (keyed repartition+agg, distinct)") {
    assert(PlanChecks.shuffles(Relational.taskFAntiJoin(spark, fixtureDir)) <= 2)
  }

  test("as-of join: one fact-scale shuffle plus the order-dedupe exchange") {
    assert(PlanChecks.shuffles(EventOps.eventsAsofOrder(spark, fixtureDir)) <= 2)
  }

  test("window functions compute all four measures over ONE exchange") {
    assert(PlanChecks.shuffles(EventOps.eventsWindowFuncs(spark, fixtureDir)) === 1)
  }

  test("wordcount: the spread rebalance plus one aggregation shuffle") {
    assert(PlanChecks.shuffles(TextOps.wordcount(spark, fixtureDir)) <= 2)
  }

  test("column pruning reaches the scan: taskA reads only its 3 columns") {
    val plan = PlanChecks.executedPlanString(
      Relational.taskAFilterProject(spark, fixtureDir))
    // customer scan must read name/nationkey/mktsegment — nothing else
    val read = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(read.exists(s => s.contains("c_name") && s.contains("c_nationkey")
      && s.contains("c_mktsegment") && !s.contains("c_acctbal")), plan)
    // the nation-name filter is pushed into the parquet scan
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(n_name,NATION_7)"), plan)
  }

  test("contrastive pairs: pruned embedding scan, equi-join candidates, no nested loop") {
    val plan = PlanChecks.executedPlanString(
      graft.operators.Similarity.contrastivePairs(spark, fixtureDir))
    // candidates must come from the (band, band_val) equi-join — any
    // nested-loop/cartesian here means the LSH blocking fell out of
    // the plan and the op degraded to N²
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
    // the corpus scan lives in the memoized signature frame since r18
    // (consumer plans read the checkpoint) — pin the pruning on the
    // plan that actually pays the scan
    val sigPlan = PlanChecks.executedPlanString(
      graft.operators.Similarity.lshSigPlan(spark, fixtureDir, 4, 8, 64))
    val read = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(sigPlan).map(_.group(1)).toSeq
    assert(read.exists(s => s.contains("vec_id") && s.contains("embedding")
      && !s.contains("label")), sigPlan)
  }

  test("copurchase pairs: two exchanges (per-order sets, pair counts) — no self-join re-shuffle") {
    assert(PlanChecks.shuffles(Relational.copurchasePairs(spark, fixtureDir)) <= 2)
  }

  test("event rate anomaly: one fact-scale exchange, then the bounded (type,day) window") {
    // counts exchange + the types-partitioned window exchange; a third
    // would mean the lag runs over raw events — the scale regression
    assert(PlanChecks.shuffles(EventOps.eventRateAnomaly(spark, fixtureDir)) <= 2)
  }

  test("vocab coverage: the top-K vocab reaches the token stream as a broadcast") {
    val df = TextOps.vocabCoverage(spark, fixtureDir)
    val plan = PlanChecks.executedPlanString(df)
    assert(PlanChecks.broadcastCount(plan) >= 1, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("frequent tokens: the exact re-count pass shuffles candidates only") {
    // spread rebalance + MG global fold + candidate re-count; the full-
    // vocabulary groupBy this pattern replaces would add nothing — but
    // a rewrite that drops the isin prefilter shows up as extra volume
    // through the same count, so pin the ceiling
    assert(PlanChecks.shuffles(TextOps.frequentTokens(spark, fixtureDir)) <= 3)
  }

  test("contamination check broadcasts the benchmark grams; corpus side stays narrow") {
    // fixture docs are all doc_id < 10 (benchmark side) — plant a corpus
    // doc too, or AQE collapses the empty join to an EmptyRelation
    import spark.implicits._
    val dir = scratchDir("graft-contam")
    Seq((0L, (1 to 20).map(i => s"t$i").mkString(" ")),
        (10L, (5 to 16).map(i => s"t$i").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = PlanChecks.executedPlanString(
      graft.operators.Curation.contaminationCheck(spark, dir))
    assert(PlanChecks.broadcastCount(plan) >= 1, plan)
    // benchmark distinct + final per-doc agg + the two sides' spread
    // repartitions; the corpus n-grams themselves never shuffle
    assert(PlanChecks.shuffleCount(plan) <= 4, plan)
  }

  test("cohort retention shuffles only the (user, week) projection") {
    val plan = PlanChecks.executedPlanString(
      EventOps.cohortRetention(spark, fixtureDir))
    // cohort agg + join alignment + distinct-count agg; nothing fact-wide twice
    assert(PlanChecks.shuffleCount(plan) <= 4, plan)
    val read = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(read.exists(s => s.contains("user_id") && s.contains("ts")
      && !s.contains("props") && !s.contains("value")), plan)
  }

  test("pii_redact and doc_repetition run with zero shuffles (pure narrow)") {
    assert(PlanChecks.shuffles(graft.operators.Curation.piiRedact(spark, fixtureDir)) <= 1)
    assert(PlanChecks.shuffles(graft.operators.Curation.docRepetition(spark, fixtureDir)) <= 1)
  }

  test("q3 top-10 compiles to TakeOrderedAndProject — no global sort materialization") {
    // fixture customers carry no BUILDING segment → plant a q3-live dir
    import spark.implicits._
    val dir = scratchDir("graft-q3")
    val early = java.time.LocalDateTime.of(1997, 1, 1, 0, 0)
    val late = java.time.LocalDateTime.of(1999, 1, 1, 0, 0)
    Seq((1L, "c1", 0, 1.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((100L, 1L, "O", 1.0, early, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((100L, 10L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "N", "O", late))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val q3 = Relational.q3ShippingPriority(spark, dir)
    assert(q3.count() === 1L)
    val plan = PlanChecks.executedPlanString(q3)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("runtime bloom-filter pruning is available for selective joins") {
    // Spark's runtime row-level filtering injects a bloom filter built
    // from a selective join side into the probe side's scan — the
    // scale feature that turns a selective dim filter into fact-scan
    // pruning. Pin that the engine's sessions can enable it and the
    // rewrite fires on a representative shape.
    val conf = spark.conf
    val prev = conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // test tables are KBs; the production default (10GB) gates the
    // fact side — drop it so the rewrite fires at fixture scale
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // injection targets shuffle joins (a broadcast side already prunes)
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val dir = scratchDir("graft-bloom")
      (0L until 2000L).map(i => (i, i % 7)).toDF("id", "k")
        .write.mode("overwrite").parquet(s"$dir/fact")
      (0L until 100L).map(i => (i, s"d$i")).toDF("fk", "name")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"name" === "d1")
      val plan = fact.join(dim, $"id" === $"fk").queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom") || plan.contains("might_contain"), plan)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prev)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  private def finalSection(plan: String): String =
    plan.indexOf("== Initial Plan ==") match {
      case -1 => plan
      case i  => plan.substring(0, i)
    }

  test("vocab_build selects top-K via TakeOrderedAndProject; the id window runs over ≤K rows") {
    val plan = finalSection(PlanChecks.executedPlanString(
      TextOps.vocabBuild(spark, fixtureDir, topK = 10)))
    // per-partition k-heaps, never a global sort of the full term table
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the one (bounded) window sits ABOVE the limit — parents print
    // first, so its string offset must precede TakeOrderedAndProject's
    val w = plan.indexOf("Window")
    assert(w >= 0 && w < plan.indexOf("TakeOrderedAndProject"), plan)
  }

  test("ngram_lm_probs: context sum is a window over the grouped table — no broadcast, no second join") {
    val plan = PlanChecks.executedPlanString(TextOps.ngramLmProbs(spark, fixtureDir))
    assert(PlanChecks.broadcastCount(plan) === 0, plan)
    // spread rebalance + (w1,w2) agg + w1 window — all vocab²-bounded
    assert(PlanChecks.shuffleCount(plan) <= 3, plan)
    assert(!finalSection(plan).contains("Join"), plan)
  }

  test("dedup_embedding_ann: candidates from band-bucket equi-join — no N² nested-loop") {
    val plan = finalSection(PlanChecks.executedPlanString(
      graft.operators.Similarity.dedupEmbeddingAnn(spark, fixtureDir)))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("taskG keeps the global-max scalar in-plan as a broadcast, not a shuffle") {
    val plan = PlanChecks.executedPlanString(Relational.taskGInactive(spark, fixtureDir))
    assert(PlanChecks.broadcastCount(plan) >= 1) // 1-row ref-time aggregate
    assert(PlanChecks.shuffleCount(plan) <= 3)   // last-ts agg + join sides
  }

  // NOTE (both tests below): the executed plans embed a persisted
  // InMemoryRelation whose stored plan string carries its own
  // "== Initial Plan ==" marker, which defeats finalSection-based
  // counting (it truncates at the FIRST marker) — so these pins match
  // structural join facts over the full plan string instead.

  test("embedding covariance: within-row pair expansion — no self-join, no sort-merge") {
    val plan = PlanChecks.executedPlanString(
      graft.operators.Similarity.embeddingCovariance(spark, fixtureDir))
    // pairs expand inside the row: a regression to a vec_id self-join
    // would plan a vector-keyed exchange and a join wider than the two
    // broadcast dim-sum joins
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2) // dim_i + dim_j sums
    assert(raw"Exchange hashpartitioning\(vec_id".r.findAllIn(plan).isEmpty,
      "vector-keyed shuffle — pair expansion left the row")
  }

  test("bm25 search: query terms and idf broadcast into the posting scan") {
    import spark.implicits._
    // fixture docs carry none of the standing query terms (AQE would
    // collapse the whole plan to EmptyRelation) — pin on a corpus that
    // exercises the full posting path
    val dir = scratchDir("graft-bm25plan")
    Seq((1L, "fast scan table", "en", "s", 0L), (2L, "window agg group fast", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = PlanChecks.executedPlanString(
      graft.operators.TextOps.bm25Search(spark, dir))
    // literal query list + vocabulary-bounded idf join broadcast; the
    // only nested-loop is the whitelisted 1-row corpus-stats scalar
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
  }

  test("ngram novelty explodes the gram stream exactly once") {
    // the window-min formulation computes first owners inside the one
    // gram-keyed exchange; a regression to the groupBy+self-join shape
    // duplicates the tokenize+md5 Generate for the probe side
    val plan = PlanChecks.executedPlanString(
      graft.operators.Curation.ngramNovelty(spark, fixtureDir))
    // the executed adaptive plan prints final + initial trees; count
    // the explode in the final tree only
    val finalTree = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan; case i => plan.substring(0, i)
    }
    assert("Generate".r.findAllIn(finalTree).length === 1, plan)
    // spread rebalance + gram window exchange + doc rollup (+AQE reads)
    assert(PlanChecks.shuffles(graft.operators.Curation.ngramNovelty(spark, fixtureDir)) <= 4)
  }

  test("q21: ONE lineitem scan — the existence tests are a window, not a join-back") {
    // the decorrelated groupBy+join formulation re-evaluates the pair
    // subtree (two fact scans); the window formulation must keep one
    val plan = PlanChecks.executedPlanString(
      Relational.q21WaitingSuppliers(spark, fixtureDir))
    val finalTree = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan; case i => plan.substring(0, i)
    }
    // ≤, not ==: AQE may collapse the fixture's empty result to an
    // EmptyRelation with zero scans — the regression is TWO scans
    assert("lineitem\\.parquet".r.findAllIn(finalTree).length <= 1, plan)
    // fact exchange + pair-table order re-exchange + supplier rollup
    assert(PlanChecks.shuffles(Relational.q21WaitingSuppliers(spark, fixtureDir)) <= 3)
  }

  test("group_reservoir_sample: rank-limit pushes top-k heaps to BOTH sides of each exchange") {
    val plan = PlanChecks.executedPlanString(
      graft.operators.Curation.groupReservoirSample(spark, fixtureDir))
    val finalTree = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan; case i => plan.substring(0, i)
    }
    // two windows → four WindowGroupLimit heaps (partial + final each);
    // losing them means every stratum gets fully sorted and shipped
    assert("WindowGroupLimit".r.findAllIn(finalTree).length === 4, plan)
  }

  test("events_value_ecdf: probe fanout stays inside the scan stage (no join for membership)") {
    val plan = PlanChecks.executedPlanString(
      EventOps.eventsValueEcdf(spark, fixtureDir))
    // membership via filtered literal-array explode: exactly one
    // Generate, and no hash/sort-merge join anywhere (the only join is
    // the 1-row total's broadcast nested loop)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    assert(PlanChecks.shuffles(EventOps.eventsValueEcdf(spark, fixtureDir)) <= 2)
  }
}
