package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventOps, Relational}
import graft.plans.PlanChecks

/** 10×-sf0.1 scale stress for the relational/event headliners — the
  * same treatment the dedup family already gets from the synthetic
  * DSv2 source. The tables are generated deterministically (xxhash64
  * spreading, no RNG) at 6M lineitem / 1.5M orders / 150k customers /
  * 1M events, written as multi-file parquet so scans parallelize, and
  * the assertions are the 100 TB ones: the query COMPLETES, the dims
  * still broadcast when they are 10× larger, no nested-loop join
  * sneaks in, and the shuffle budget pinned at fixture scale holds.
  *
  * This is a plan-stability gate, not a correctness oracle (the
  * sf0.01 DuckDB compare owns correctness): what it catches is a
  * broadcast-threshold flip, an AQE strategy change, or an operator
  * whose memory footprint stops fitting when rows grow 10×.
  */
class ScaleStressSpec extends AnyFunSuite with SparkFixture {

  private val Orders = 1500000L
  private val LinesPerOrder = 4L
  private val Customers = 150000L
  private val Suppliers = 10000L
  private val Parts = 20000L
  private val Events = 1000000L
  private val Users = 15000L

  /** Deterministic pseudo-uniform spread of an id column into [0, mod). */
  private def spread(c: org.apache.spark.sql.Column, mod: Long, salt: Int) =
    pmod(xxhash64(c, lit(salt)), lit(mod))

  private lazy val scaleDir: String = {
    val dir = scratchDir("graft-scale")
    val s = spark
    import s.implicits._

    (0 until 5).map(i => (i, Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")(i)))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

    s.range(Customers).select(
      col("id").as("c_custkey"),
      concat(lit("c_"), col("id")).as("c_name"),
      (col("id") % 25).cast("int").as("c_nationkey"),
      ((col("id") % 1000) / lit(10.0)).as("c_acctbal"),
      concat(lit("SEG_"), col("id") % 5).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    s.range(Suppliers).select(
      col("id").as("s_suppkey"),
      concat(lit("s_"), col("id")).as("s_name"),
      (col("id") % 25).cast("int").as("s_nationkey"),
      ((col("id") % 100) / lit(10.0)).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    s.range(Orders).select(
      col("id").as("o_orderkey"),
      spread(col("id"), Customers, 1).as("o_custkey"),
      lit("O").as("o_orderstatus"),
      ((col("id") % 10000) / lit(100.0)).as("o_totalprice"),
      expr(s"cast(timestamp_micros(${Fixtures.RefTs / 1000}L - (id % 30) * 86400000000L) as timestamp_ntz)")
        .as("o_orderdate"),
      lit("3-MEDIUM").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    s.range(Orders * LinesPerOrder).select(
      expr(s"id div $LinesPerOrder").as("l_orderkey"),
      spread(col("id"), Parts, 2).as("l_partkey"),
      spread(col("id"), Suppliers, 3).as("l_suppkey"),
      (col("id") % LinesPerOrder + 1).cast("int").as("l_linenumber"),
      (col("id") % 50 + 1).cast("double").as("l_quantity"),
      ((col("id") % 1000 + 1) * lit(1.0)).as("l_extendedprice"),
      lit(0.05).as("l_discount"),
      lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"),
      lit("O").as("l_linestatus"),
      expr(s"cast(timestamp_micros(${Fixtures.RefTs / 1000}L) as timestamp_ntz)").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // ts is raw INT64 nanos — the testdata's physical shape under
    // nanosAsLong (Tables.events converts in-plan)
    s.range(Events).select(
      col("id").as("event_id"),
      (lit(Fixtures.RefTs) - spread(col("id"), 30L * 86400L, 4) * lit(1000000000L)).as("ts"),
      spread(col("id"), Users, 5).as("user_id"),
      element_at(typedLit(Seq("view", "click", "purchase", "signup", "error")),
        (spread(col("id"), 5, 6) + 1).cast("int")).as("event_type"),
      ((col("id") % 500) / lit(10.0)).as("value"),
      lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q5 at 10x sf0.1: dims still broadcast, no nested-loop, all 5 ASIA nations out") {
    val df = Relational.q5RegionalRevenue(spark, scaleDir)
    val rows = df.collect()
    // region ASIA = regionkey 2 → nations 2,7,12,17,22; customers and
    // suppliers cover every nation, so all 5 must produce revenue
    assert(rows.length === 5, rows.mkString(","))
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
    val plan = PlanChecks.executedPlanString(df)
    assert(PlanChecks.broadcastCount(plan) >= 2, plan) // nation + region at least
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("copurchase_pairs at 10x sf0.1: completes inside the 2-exchange budget") {
    val df = Relational.copurchasePairs(spark, scaleDir)
    val plan = PlanChecks.executedPlanString(df)
    assert(PlanChecks.shuffleCount(plan) <= 2, plan)
    // ~9M candidate pairs over C(20000,2) slots → birthday math says
    // repeated pairs must exist; zero would mean the pipeline dropped rows
    assert(df.limit(1).count() === 1L)
  }

  test("dedup_semantic at 10x sf0.1: pair count is exactly cell-bounded, no nested-loop") {
    // 20k vectors (10x the sf0.1 embeddings table) in 64 exactly-
    // orthogonal planted clusters: vector i = 100·e_{i%64} (one-hot,
    // dim 64). Same-cluster vectors are identical → every same-cluster
    // pair scores sim 1.0; cross-cluster pairs score exactly 0.0 < the
    // 0.35 threshold. So whatever cells k-means lands on, the output
    // must be EXACTLY the within-cluster pairs: 16 clusters of 313 and
    // 48 of 312 (20000 = 16·313 + 48·312) — the N·cellSize shape, not
    // N² (which would be 200M candidate pairs).
    val dir = scratchDir("graft-sem-scale")
    val n = 20000L
    spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), j -> cast(IF(j = id % 64, 100.0, 0.0) AS float)) AS embedding",
      "cast(id % 64 AS int) AS label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val df = graft.operators.Similarity.dedupSemantic(spark, dir)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val expected = (0 until 64).map { c =>
      val sz = n / 64 + (if (c < (n % 64)) 1 else 0)
      sz * (sz - 1) / 2
    }.sum
    assert(df.count() === expected)
  }

  test("prototype_prune at 10x sf0.1: per-cell window stays cell-bounded with forced kept counts") {
    // Same planted geometry as the dedup_semantic stress: 20k one-hot
    // vectors in 64 orthogonal clusters. All of a cell's members sit at
    // distance 0 from their centroid, so ranking is pure (d2, vec_id)
    // tie-break order and the kept count per cell is forced:
    // sz - sz/4 survivors, ranks exactly sz/4+1 .. sz.
    val dir = scratchDir("graft-proto-scale")
    val n = 20000L
    spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), j -> cast(IF(j = id % 64, 100.0, 0.0) AS float)) AS embedding",
      "cast(id % 64 AS int) AS label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val df = graft.operators.Similarity.prototypePrune(spark, dir)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan) // cell-partitioned, never global
    val perCell = df.groupBy("cell")
      .agg(count(lit(1)).as("kept"), min("proto_rank").as("lo"), max("proto_rank").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(perCell.length === 64)
    perCell.foreach { case (kept, lo, hi) =>
      val sz = hi // max rank = cell population
      assert(kept === sz - sz / 4)
      assert(lo === sz / 4 + 1)
    }
    assert(perCell.map(_._3).sum === n) // cells partition all 20k vectors
  }

  test("dedup_span_remove at 10x sf0.1: shared boilerplate excised exactly, unique text intact") {
    // 50k docs (100x the SF documents table), 32 tokens each: a
    // 16-token unique prefix plus either the SAME 16-token boilerplate
    // (even ids) or 16 more unique tokens (odd ids). The boilerplate's
    // 9 fully-interior 8-grams repeat 25k times — ONE df row each, the
    // stop-gram shape — while every prefix/boundary gram is unique. So
    // the exact output is forced: even docs keep exactly their 16
    // prefix tokens, odd docs keep all 32.
    val dir = scratchDir("graft-span-scale")
    val n = 50000L
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    spark.range(n).selectExpr(
      "id AS doc_id",
      s"""concat_ws(' ',
            concat_ws(' ', transform(sequence(1, 16), i -> concat('u', id, '_', i))),
            IF(id % 2 = 0, '$boiler',
               concat_ws(' ', transform(sequence(17, 32), i -> concat('u', id, '_', i)))))
         AS text""",
      "'en' AS lang", "'src' AS source", "cast(0 AS long) AS n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = graft.operators.Dedup.dedupSpanRemove(spark, dir)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val byPar = df.groupBy((col("doc_id") % 2).as("par"))
      .agg(count(lit(1)).as("docs"), sum(col("n_kept")).as("kept")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byPar(0L) === ((25000L, 25000L * 16)))
    assert(byPar(1L) === ((25000L, 25000L * 32)))
  }

  test("dedup_containment at 50k docs: exactly the planted quote pairs, no nested-loop") {
    // 25k "big" docs of 64 unique tokens (60 unique 5-grams each, no
    // gram shared across bigs) + 25k "quote" docs, each a verbatim
    // 20-token span of its big (16 5-grams, all inside it). The exact
    // containment relation is forced: one (big, quote, 16, 16) row per
    // pair and nothing else — so candidate generation provably did not
    // drop pairs at scale, and the posting join stayed collision-
    // bounded (every gram's df is 1 or 2 here).
    val dir = scratchDir("graft-contain-scale")
    val n = 25000L
    spark.range(2 * n).selectExpr(
      "id AS doc_id",
      s"""CASE WHEN id < $n
            THEN concat_ws(' ', transform(sequence(1, 64), i -> concat('d', id, '_', i)))
            ELSE concat_ws(' ', transform(sequence(21, 40), i -> concat('d', id - $n, '_', i)))
          END AS text""",
      "'en' AS lang", "'src' AS source", "cast(0 AS long) AS n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = graft.operators.Dedup.containment(spark, dir)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val agg = df.agg(
      count(lit(1)),
      sum(when(col("contained") - col("container") === n &&
        col("inter") === 16L && col("ns_contained") === 16L, 1L).otherwise(0L))
    ).collect().head
    assert(agg.getLong(0) === n)
    assert(agg.getLong(1) === n) // every row is its big's planted quote
  }

  test("containment under adversarial boilerplate: hot postings never probed, empty result") {
    // 50k docs, each 16 unique tokens + the SAME 16-token boilerplate:
    // every boilerplate-interior 5-gram has df = 50k (the posting-list
    // blowup case), while each doc's unique-prefix grams have df = 1.
    // The df-ascending prefix picks exactly those df=1 grams — prefix
    // size = 28 − ceil(0.9·28) + 1 = 3, all unique — so the candidate
    // join only ever touches df=1 posting lists and the result is
    // EMPTY (no doc has 90% of its grams inside another's). A naive
    // posting self-join here would produce 50k² pair rows via the hot
    // grams; completing in test time IS the assertion, plus the plan
    // lint.
    val dir = scratchDir("graft-contain-boiler")
    val n = 50000L
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    spark.range(n).selectExpr(
      "id AS doc_id",
      s"""concat_ws(' ',
            concat_ws(' ', transform(sequence(1, 16), i -> concat('u', id, '_', i))),
            '$boiler') AS text""",
      "'en' AS lang", "'src' AS source", "cast(0 AS long) AS n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = graft.operators.Dedup.containment(spark, dir)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(df.count() === 0L)
  }

  test("edit-distance duplicate bomb: 2k identical windows stay segment-bounded") {
    // The opposite regime from the shingle-disjoint 10x probe (web-
    // crawl growth): a HOT window — thousands of byte-identical copies
    // — where segment blocking degenerates toward a clique. That
    // clique is the TRUE answer (all C(h,2) pairs are real dist-0
    // duplicates; the output itself is quadratic in the hot group), so
    // the bound under test is the candidate MULTIPLICITY: identical
    // windows share exactly k+1=3 exact-segment keys, and only the
    // shift-0 probe of each matches, so the join emits ≤ 3 rows per
    // true pair — not the ≤75x worst-case probe fanout, and not a
    // cross-group leak. h=2000 keeps the ~2M-pair clique inside the
    // local[4] test budget; the multiplicity argument is independent
    // of h. Forced counts: a 48-distinct-char window (internal
    // repetition would let shifted probes alias exact segments and
    // multiply the join), a 5-doc near-dup group in a different
    // alphabet (3 exact + 2 one-edit — distance>0 discovery must
    // survive next to the bomb), and 2k background docs whose windows
    // are shorter than k (degenerate, excluded by design).
    val dir = scratchDir("graft-edj-bomb")
    val h = 2000L
    val pad = "p" * 100
    val hot = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKL"
    val w2 = "MNOPQRSTUVWXYZ!#$%&()*+,-./:;<=>?@[]^_`{|}~MNOPQ"
    val w2e = w2.updated(20, 'z')
    require(hot.length == 48 && w2.length == 48 && hot.toSet.size == 48)
    spark.range(2 * h + 5).selectExpr(
      "id AS doc_id",
      s"""CASE WHEN id < $h THEN concat('$pad', '$hot')
               WHEN id < $h + 3 THEN concat('$pad', '$w2')
               WHEN id < $h + 5 THEN concat('$pad', "$w2e")
               ELSE concat('$pad', 'ab') END AS text""",
      "'en' AS lang", "'src' AS source", "cast(148 AS long) AS n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = graft.operators.Dedup.editDistanceJoin(spark, dir)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val agg = df.agg(count(lit(1)), sum(col("dist")), max(col("dist"))).collect().head
    // exactly the hot clique + the planted near group, nothing else:
    // C(h,2) dist-0 pairs, plus 3+2 docs at pairwise dist {0,1}
    assert(agg.getLong(0) === h * (h - 1) / 2 + 10L)
    assert(agg.getLong(1) === 6L)  // the 3x2 cross-pairs at dist 1
    assert(agg.getLong(2) === 1L)
  }

  test("pagerank at 1.1M vertices: planted star-graph ranks exact, no nested-loop") {
    // 100k disjoint stars, 10 leaves each (1M edges, 1.1M vertices —
    // ~10x the sf0.1 co-purchase graph). Every vertex's two-round rank
    // is closed-form: hubs 2_147_500, leaves 885_250 micro-units
    // (floor-division recurrence, hand-computed). Exactly two distinct
    // rank values with forced counts proves no row was dropped,
    // duplicated, or mis-joined at scale.
    val s = spark
    import s.implicits._
    val stars = 100000L
    val edges = s.range(stars * 10).select(
      (col("id") / 10).cast("long").as("src"),          // hub: 0..99999
      (col("id") + stars).as("dst"))                     // leaf ids disjoint
    val df = Relational.pagerank(edges, iters = 2)
    val plan = PlanChecks.executedPlanString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val byRank = df.groupBy(col("r")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byRank === Map(2147500L -> stars, 885250L -> stars * 10))
  }

  test("frequent_tokens at 500k tokens: the planted heavy hitter survives MG merges exactly") {
    // 100k docs of 5 tokens: one shared "hh" + 4 doc-unique tokens.
    // N = 500k, threshold N/64 ≈ 7812 — only "hh" (freq 100k) clears
    // it, and MG(64) cannot evict an item at 20% frequency. The exact
    // re-count must return exactly one row with the exact count, after
    // real partial-fold + merge trees across 8 input partitions.
    val dir = scratchDir("graft-hh-scale")
    val n = 100000L
    spark.range(n).selectExpr(
      "id AS doc_id",
      "concat_ws(' ', 'hh', concat('a', id), concat('b', id), concat('c', id), concat('d', id)) AS text",
      "'en' AS lang", "'src' AS source", "cast(0 AS long) AS n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.operators.TextOps.frequentTokens(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === Seq("hh" -> 500000L * 1 / 5)) // 100k exactly
  }

  test("events_sessionize at 10x sf0.1: one fact exchange feeds window AND session agg") {
    val df = EventOps.eventsSessionize(spark, scaleDir)
    val plan = PlanChecks.executedPlanString(df)
    // window partitions by user_id; the (user_id, session_idx) agg
    // reuses that partitioning — a second fact exchange is a regression
    assert(PlanChecks.shuffleCount(plan) === 1, plan)
    assert(df.limit(1).count() === 1L)
  }
}
