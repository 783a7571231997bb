package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Semi-structured + distributional operators over the `events` table.
  *
  * The reference's data model is flat strings (SURVEY.md §1.3 — no
  * arrays/maps/JSON anywhere), but the harness's `events.props` column
  * is a JSON payload — the shape every real event pipeline carries.
  * These operators cover the semi-structured path: typed JSON
  * extraction, aggregation over extracted fields, and distribution
  * summaries (exact + approximate percentiles).
  */
object EventOps {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** Typed JSON extraction + aggregation: parse `props` with an explicit
    * schema (`from_json` is codegen-friendly and null-safe on malformed
    * input — a bad document yields NULL, the relational missing-value,
    * not an exception), then aggregate the extracted field per event
    * type. One narrow projection + one partial-agg shuffle; the JSON
    * string itself never crosses the exchange.
    */
  def eventsPropsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsSpread(spark, dir)
      .select(
        col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Exact value percentiles per event type (`percentile`, linear
    * interpolation between closest ranks — the same estimator DuckDB's
    * `quantile_cont` uses). Exact percentile requires the full sorted
    * group; it is the correctness baseline for [[eventsValueQuantilesApprox]],
    * which is what a 100 TB pipeline would actually run.
    */
  def eventsValueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsSpread(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))

  /** Analytic window functions per user session stream: row_number,
    * lag-based inter-event gap (exact integer microseconds — no float
    * time arithmetic), and a bounded moving sum over the last 3 events
    * (decimal-stable). One hash exchange on user_id feeds every window
    * in the same sort order — Catalyst computes all four functions in a
    * single Window operator, not one shuffle per function.
    */
  def eventsWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wm = w.rowsBetween(-2, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("event_id"), 1).over(w).as("prev_event"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        sum(col("value").cast("decimal(18,6)")).over(wm).cast("double").as("mv_sum3"))
  }

  /** As-of (temporal) join: each event matched to the user's most
    * recent order at or before the event time — the operator family
    * Spark lacks natively (financial tick joins, slowly-changing-dim
    * lookups). Composed as union + ordered window, the distributed
    * formulation: tag both streams, sort each user's merged timeline
    * once, and carry the latest order forward with
    * `last(..., ignoreNulls)`. ONE shuffle on user_id and one
    * partition-local sort — same cost shape as a sort-merge join, no
    * per-event probe. Equal-date order ties are pre-collapsed to
    * max(o_orderkey), and orders sort before events at the same
    * instant, giving exact `<=` as-of semantics (DuckDB's ASOF JOIN is
    * the oracle).
    */
  def eventsAsofOrder(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val ord = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val tagged = ord
      .select(
        col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
        lit(0).as("kind"), lit(null).cast("long").as("event_id"), col("o_orderkey"))
      .unionByName(ev.select(
        col("user_id"), col("ts").as("t"), lit(1).as("kind"), col("event_id"),
        lit(null).cast("long").as("o_orderkey")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_order", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id"), col("last_order"))
  }

  /** Point-in-time training-example assembly — the feature-store op
    * that prevents label leakage: each event (the label row) gets the
    * customer's order-history features computed STRICTLY as of the
    * event instant (orders at the same instant count, per standard
    * `<=` as-of semantics): prior order count, prior spend, days since
    * last order. Joining "current" dimension values instead would leak
    * future behavior into training features — the classic silent model
    * corruption at 100 TB, where no single example looks wrong.
    *
    * Same distributed shape as [[eventsAsofOrder]]: tag both streams,
    * ONE exchange on the user key, one partition-local sort, and all
    * three features are running aggregates over the merged timeline's
    * rows-frame — no per-event probe, no range join. Spend accumulates
    * in integer cents so the layout can't move a bit. The (t, kind,
    * tiebreak) sort is total per user, making the frame deterministic.
    */
  def trainingExamplesPit(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ord = Tables.orders(spark, dir).select(
      col("o_custkey").as("user_id"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
      lit(0).as("kind"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("tb"),
      floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
    val ev = Tables.events(spark, dir).select(
      col("user_id"),
      unix_micros(col("ts")).as("t_us"),
      lit(1).as("kind"),
      col("event_id"),
      col("event_id").as("tb"),
      lit(0L).as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("kind"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("n_orders_before",
        sum(when(col("kind") === 0, 1L).otherwise(0L)).over(w))
      .withColumn("spend_before_cents",
        sum(when(col("kind") === 0, col("cents")).otherwise(0L)).over(w))
      .withColumn("last_order_t", max(when(col("kind") === 0, col("t_us"))).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("n_orders_before"),
        col("spend_before_cents"),
        expr(s"(t_us - last_order_t) div ${dayUs}L").as("days_since_last_order"))
  }

  /** Pivot (long→wide reshape): events per user spread into one column
    * per event type. The type domain is pinned explicitly — at 100 TB a
    * domain-discovery pass (`pivot(col)` without values) is a full extra
    * scan-and-collect; a production pipeline pins its vocabulary.
    */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))

  /** Set operations over user segments: INTERSECT / EXCEPT between
    * "users who clicked" and "users who purchased", each branch tagged
    * and unioned. Spark plans these as aggregate/anti-join shapes over
    * the pre-deduped key sets, never materializing a cross product.
    */
  def userSegmentSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def usersOf(t: String): DataFrame =
      ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val clickers = usersOf("click")
    val buyers   = usersOf("purchase")
    clickers.intersect(buyers).select(lit("click_and_buy").as("segment"), col("user_id"))
      .unionAll(clickers.except(buyers).select(lit("click_no_buy").as("segment"), col("user_id")))
      .unionAll(buyers.except(clickers).select(lit("buy_no_click").as("segment"), col("user_id")))
  }

  /** Ordered funnel analysis: per user, did view → click → purchase
    * happen in strictly increasing event time? One aggregation pass
    * computes each stage's FIRST timestamp (conditional min — no
    * per-stage scans or joins), then the strict ordering predicate
    * labels the user's furthest funnel stage.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    def firstTs(t: String) =
      min(when(col("event_type") === t, col("ts"))).as(s"ts_$t")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
      .select(
        col("user_id"),
        when(col("ts_view").isNotNull &&
             col("ts_click") > col("ts_view") &&
             col("ts_purchase") > col("ts_click"), lit("purchased"))
          .when(col("ts_view").isNotNull && col("ts_click") > col("ts_view"), lit("clicked"))
          .when(col("ts_view").isNotNull, lit("viewed"))
          .otherwise(lit("none")).as("funnel_stage"))
  }

  /** Event-type affinity matrix: Jaccard overlap between the USER SETS
    * of each type pair — "do the people who error also purchase" as a
    * symmetric ≤ |types|²-row readout, the behavioral-segmentation
    * counterpart of [[partPairLift]]'s item affinity. The (user, type)
    * dedup collapses event volume first; per-user type pairs explode
    * from the sorted per-user type set (a < b canonical, ≤ C(|types|,2)
    * fanout per user); all three Jaccard components are exact integers
    * with one final double division.
    */
  def eventTypeAffinity(spark: SparkSession, dir: String): DataFrame = {
    val userTypes = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val perType = userTypes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val pairs = userTypes
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(expr(
        """flatten(transform(ts, (x, i) ->
           transform(slice(ts, i + 2, size(ts) - i - 1),
                     y -> struct(x AS type_a, y AS type_b))))""")).as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.withColumnRenamed("n_t", "n_a")),
        col("type_a") === col("event_type"))
      .drop("event_type")
      .join(broadcast(perType.withColumnRenamed("n_t", "n_b")),
        col("type_b") === col("event_type"))
      .drop("event_type")
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        (col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .as("jaccard"))
  }

  /** The ordered funnel cross-tabulated by A/B variant — the readout
    * an experiment actually ships: how far each arm's users get
    * through view → click → purchase, as stage counts per variant.
    * Composition of [[eventsFunnel]]'s conditional-min stage logic
    * with [[abTestChi2]]'s deterministic hash gate; one per-user
    * aggregate, one |variants|×|stages|-bounded rollup.
    */
  def eventsFunnelByVariant(spark: SparkSession, dir: String): DataFrame = {
    val variant = pmod(conv(substring(md5(concat_ws(":", lit("ab"),
      col("user_id").cast("string")).cast("binary")), 1, 7), 16, 10)
      .cast("long"), lit(2L))
    def firstTs(t: String) =
      min(when(col("event_type") === t, col("ts"))).as(s"ts_$t")
    Tables.events(spark, dir)
      .select(col("user_id"), variant.as("variant"), col("event_type"), col("ts"))
      .groupBy(col("user_id"), col("variant"))
      .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
      .select(col("variant"),
        when(col("ts_view").isNotNull &&
             col("ts_click") > col("ts_view") &&
             col("ts_purchase") > col("ts_click"), lit("purchased"))
          .when(col("ts_view").isNotNull && col("ts_click") > col("ts_view"),
            lit("clicked"))
          .when(col("ts_view").isNotNull, lit("viewed"))
          .otherwise(lit("none")).as("funnel_stage"))
      .groupBy(col("variant"), col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Exact distinct-user cardinality per event type — the correctness
    * baseline for [[userCardinalityApprox]]. Exact distinct is a full
    * shuffle of the (type, user) key space.
    */
  def userCardinality(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** HyperLogLog++ distinct-user cardinality: a fixed-size mergeable
    * sketch per group (map-side partial merge, no key-space shuffle) —
    * the 100 TB cardinality path. rsd 2% default. Sketch output is
    * implementation-defined → rows-only check + ScalaTest error bound
    * against [[userCardinality]].
    */
  def userCardinalityApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users"),
        count(lit(1)).as("n_events"))

  /** Exact weekly distinct users per event type — the oracled twin the
    * sketch-rollup ([[userCardinalityRollup]]) is error-bounded
    * against in ScalaTest. One fact-scale exchange: events collapse to
    * distinct (type, week, user) with map-side partial aggregation.
    */
  def userCardinalityWeekly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"), col("user_id"))
      .groupBy(col("event_type"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** Mergeable-summaries rollup — THE 100 TB pre-aggregation pattern:
    * per-(type, day) Datasketches HLL sketches are built ONCE over the
    * fact table, then weekly (or any coarser) cardinalities come from
    * merging the daily SKETCHES — the events are never rescanned. In a
    * warehouse this is the daily sketch table that answers every
    * "distinct users last N days" question at metadata cost; exact
    * distinct cannot re-aggregate this way (per-day distincts don't
    * sum), which is the whole point of the sketch column.
    *
    * Cross-engine caveat: the sketch binary is Spark-specific, so like
    * the other two sketch queries this is rows-only at the driver and
    * error-bounded against [[userCardinalityWeekly]] in EventOpsSpec.
    */
  def userCardinalityRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .groupBy(col("event_type"), expr("day div 7").as("week"))
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))

  /** Theta-sketch segment ALGEBRA — the set operation HLL cannot do.
    * [[userCardinalityRollup]]'s HLL sketches merge by UNION only;
    * audience/segment questions need INTERSECTION and DIFFERENCE
    * ("clicked AND bought", "clicked but never bought"), which at
    * 100 TB means Theta sketches (Datasketches): fixed-size, mergeable
    * under ∪/∩/minus, built in one pass with map-side partial merges —
    * the exact twin [[userSegmentSetOps]] pays a full key-space
    * shuffle plus an anti-join per segment instead. Both segment
    * sketches fill from the SAME single scan (conditional inputs), so
    * the whole three-segment readout is one pass over events and a
    * 1-row final merge.
    *
    * The final global aggregate is a partial-agg tree (sketches merge
    * associatively on the map side); the single reduce task touches
    * two 2^12-entry sketches, not data. Sketch binaries and estimate
    * rounding are implementation-defined → rows-only at the driver
    * (like the other three sketch rows), with EventOpsSpec
    * error-bounding every segment against the exact twin.
    */
  def userSegmentTheta(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END, 12)")
          .as("sk_click"),
        expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END, 12)")
          .as("sk_buy"))
      .selectExpr(
        """stack(3,
             'click_and_buy',
             cast(theta_sketch_estimate(theta_intersection(sk_click, sk_buy)) AS DOUBLE),
             'click_no_buy',
             cast(theta_sketch_estimate(theta_difference(sk_click, sk_buy)) AS DOUBLE),
             'buy_no_click',
             cast(theta_sketch_estimate(theta_difference(sk_buy, sk_click)) AS DOUBLE)
           ) AS (segment, approx_users)""")

  /** [[userSegmentTheta]]'s per-GROUP warehouse shape — the sketch
    * TABLE, not the one-shot readout: per-week click/buy Theta
    * sketches built in one pass over events (map-side partial merges,
    * one shuffle keyed by week), each week's segment algebra
    * (∩ / minus both ways) read from ITS OWN pair of sketches, and
    * the all-weeks level answered by MERGING the weekly sketches
    * (`theta_union_agg` — union distributes over the per-week
    * partition of the input, so the merged pair is set-equal to
    * sketching the whole corpus) rather than rescanning events. This
    * is the two-level rollup a deployment stores: the weekly sketch
    * table answers every per-week segment question, and any coarser
    * window (here: all weeks, week = −1) costs one sketch merge at
    * metadata scale. Exact distinct cannot re-aggregate this way —
    * per-week exact segment counts don't sum (a user active in two
    * weeks would double-count), which is the whole point of the
    * mergeable sketch column.
    *
    * Sketch binaries and estimate rounding are implementation-defined
    * → rows-only at the driver (like the other sketch rows), with
    * EventOpsSpec error-bounding every per-week segment AND the
    * merged level against the exact set-ops twin computed per week.
    */
  def userSegmentThetaWeekly(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000 div 7").as("week"),
        col("event_type"), col("user_id"))
      .groupBy(col("week"))
      .agg(
        expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END, 12)")
          .as("sk_click"),
        expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END, 12)")
          .as("sk_buy"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val readout =
      """stack(3,
           'click_and_buy',
           cast(theta_sketch_estimate(theta_intersection(sk_click, sk_buy)) AS DOUBLE),
           'click_no_buy',
           cast(theta_sketch_estimate(theta_difference(sk_click, sk_buy)) AS DOUBLE),
           'buy_no_click',
           cast(theta_sketch_estimate(theta_difference(sk_buy, sk_click)) AS DOUBLE)
         ) AS (segment, approx_users)"""
    val perWeek = weekly.selectExpr("week", readout)
    val merged = weekly
      .agg(expr("theta_union_agg(sk_click, 12)").as("sk_click"),
        expr("theta_union_agg(sk_buy, 12)").as("sk_buy"))
      .selectExpr("CAST(-1 AS BIGINT) AS week", readout)
    perWeek.unionAll(merged)
  }

  /** Fixed-width value histogram per event type — the distribution
    * profile pass (drift monitoring, binning for feature engineering).
    * Bin assignment is `floor(value / width)` — pure integer-exact
    * double arithmetic, so both engines bin identically; one partial-agg
    * shuffle keyed by (type, bin).
    */
  def eventsValueHistogram(spark: SparkSession, dir: String, width: Double = 10.0): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") / width).cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Tail-outlier flagging: events whose value exceeds their type's
    * exact p95 — the data-cleaning pass that precedes aggregation on a
    * noisy stream. The per-type threshold is a 5-row broadcast joined
    * back to the stream; no second full pass.
    */
  def eventsAboveP95(spark: SparkSession, dir: String): DataFrame = {
    val thresholds = eventsValueQuantiles(spark, dir)
      .select(col("event_type"), col("p95"))
    Tables.events(spark, dir)
      .join(broadcast(thresholds), "event_type")
      .filter(col("value") > col("p95"))
      .select(col("event_id"), col("user_id"), col("event_type"))
  }

  /** Approximate percentiles via `approx_percentile` (Greenwald-Khanna):
    * bounded-memory mergeable sketches — the scale path, since exact
    * percentiles need the whole group sorted while the sketch is
    * O(1/accuracy) per group regardless of group size. Sketch output is
    * implementation-defined → rows-only check + a ScalaTest error-bound
    * assertion against [[eventsValueQuantiles]].
    */
  /** Semi-structured key discovery: parse `props` as a full MAP (not a
    * pinned path like [[eventsPropsAgg]]) and profile every key that
    * occurs — the schema-inference pass run before promoting JSON
    * payloads to typed columns. Malformed JSON degrades to a NULL map
    * (dropped by the explode), matching the oracle's json_valid guard;
    * non-numeric values TRY_CAST to NULL on both engines.
    */
  def eventsPropsKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("key", "v")))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("v").cast("long")).as("sum_val"))

  /** SCD2 (slowly-changing-dimension type 2) history build: each
    * customer's order stream becomes validity-interval rows —
    * valid_from = the order's date, valid_to = the next order's date
    * (NULL while current). The standard warehouse pattern for
    * reconstructing "what did this dimension look like at time T";
    * one exchange on the customer key computes every interval with a
    * single `lead` window. Ties on (date) are broken by o_orderkey so
    * both engines emit identical intervals.
    */
  def ordersScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from_us"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Trailing-7-day distinct active users per day — the rolling-window
    * distinct count a naive formulation makes quadratic (per-day scans)
    * or unbounded (distinct over a sliding range frame, which Spark
    * windows can't do). Scale shape: dedupe events to (user, day) pairs
    * first (one exchange, partial agg map-side), explode each pair to
    * the ≤7 report days it contributes to — bounded fanout of slim int
    * pairs, not events — and distinct-count per report day. Day math is
    * integer epoch-days on both engines.
    */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("report_day"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("active_users"))

  /** Day-over-day ingest-rate deltas per event type with an anomaly
    * flag — the pipeline-monitoring table a 100 TB ingest runs daily:
    * a type whose volume jumps ≥ 1.5×, drops to ≤ ⅔×, or skips a day
    * entirely (collector outage) gets flagged. Thresholds are integer
    * cross-multiplied (`2·cnt ≥ 3·prev`, `3·cnt ≤ 2·prev`) so the
    * flag frontier replays exactly in SQL.
    *
    * Scale shape: the fact table collapses to (type, day) counts with
    * map-side partial aggregation BEFORE the one fact-scale exchange;
    * the lag window then runs over a types×days-bounded table — per-
    * partition state is one type's day series, metadata-scale
    * regardless of corpus size.
    */
  def eventRateAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
      .filter(col("prev_cnt").isNotNull)
      .select(col("event_type"), col("day"), col("cnt"), col("prev_day"), col("prev_cnt"),
        (col("prev_day") =!= col("day") - 1 ||
          col("cnt") * 2 >= col("prev_cnt") * 3 ||
          col("cnt") * 3 <= col("prev_cnt") * 2).as("is_anomaly"))
  }

  /** Batch sessionization: gap-based session assignment (new session
    * when >30 min elapses between a user's consecutive events) and
    * per-session rollup — the batch twin of the streaming
    * `session_window` aggregation, for when session ids must attach to
    * historical data. One exchange on user_id computes the lag and the
    * running session index in a single Window operator; the per-session
    * rollup groups on (user_id, session_idx) — a superset of the window
    * key, but re-partitioning what is now one row per event of three
    * longs, not full events. All time math is integer microseconds.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      // first event of a user has no lag → coalesce to "new session"
      .withColumn("new_s",
        coalesce((col("tus") - lag(col("tus"), 1).over(w)) > gapUs, lit(true))
          .cast("long"))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Session-duration pyramid: the [[eventsSessionize]] sessions banded
    * by log2 of their whole-second duration — the engagement-depth
    * readout (bounce / skim / engaged / marathon) that a raw duration
    * list can't publish at scale. The band is the binary digit count
    * of the exact integer seconds (+1 so zero-length single-event
    * sessions band at 0), never a floating log2; the rollup on top of
    * the session table is ≤ 64 groups.
    */
  def sessionDurationBands(spark: SparkSession, dir: String): DataFrame =
    eventsSessionize(spark, dir)
      .groupBy((length(bin(expr("duration_us div 1000000L") + 1)) - 1)
        .cast("long").as("band"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("sum_events"),
        max(expr("duration_us div 1000000L")).as("max_duration_s"))

  /** Weekly cohort retention — the product-analytics staple: users are
    * cohorted by the week of their first event, and each (cohort,
    * week-offset) cell counts the distinct users still active that many
    * weeks later. All time math is integer weeks since the epoch
    * (`epoch_us div week_us`), so Spark and the DuckDB oracle agree
    * bit-for-bit with no timezone/calendar surface.
    *
    * Scale shape: one groupBy(user) for first-event weeks (partial agg
    * does the heavy lifting map-side), one broadcast-friendly join back
    * on user_id, one distinct-count aggregation — the event table
    * shuffles only its (user, week) projection, never full rows.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      // `div`, not `/`: Column./ on longs is DOUBLE division in Spark
      .select(col("user_id"), expr(s"unix_micros(ts) div ${weekUs}L").as("week"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Per-user ordered event-type sequences, capped at `maxLen` — the
    * log-to-training-data conversion a behavioral sequence model
    * (next-event prediction, session embedding) ingests. The cap is
    * applied BEFORE the collect: a power user with 10⁶ events
    * contributes a bounded row, never an unbounded in-memory array —
    * the failure mode that kills naive `collect_list` pipelines at
    * scale. One exchange on user_id feeds both the ranking window and
    * the per-user fold; `array_sort` over (rn, type) structs makes the
    * collect order deterministic regardless of partial-aggregation
    * order, so the joined string replays exactly in SQL.
    */
  def eventsToSequences(spark: SparkSession, dir: String, maxLen: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxLen)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("seq_len"),
        array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")),
          ",").as("seq"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * (prev_type → next_type) counts plus the conditional probability in
    * integer micro-units (`1e6·cnt div ctx_cnt` — exact on both
    * engines, no float division in the hash). The training table for a
    * next-event baseline model and the drift monitor for behavioral
    * change. Scale shape: the lag runs inside the per-user exchange the
    * sequence extraction already needs, transitions collapse with
    * map-side partial aggregation to a types²-bounded table, and the
    * denominator is a window sum over that tiny table — no second scan,
    * no broadcast of a per-key context map.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"),
        col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ctx_cnt",
        sum(col("cnt")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("prob_micro", expr("(cnt * 1000000) div ctx_cnt"))
  }

  /** Out-of-order arrival audit: within each user's stream, an event is
    * "late" when some earlier-ARRIVING event (smaller event_id — the
    * ingest sequence) carries a LATER event time. The per-type lateness
    * profile is exactly what calibrates a streaming watermark delay
    * (`withWatermark`): max_late_us is the smallest delay that would
    * have dropped nothing. Scale shape: the running max is a window
    * over the per-user exchange (never a global order — a total
    * arrival order would serialize the table through one partition),
    * and the rollup collapses to a types-bounded result with map-side
    * partials.
    */
  def eventsLateArrivals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("late_us",
        when(max(col("tus")).over(w) > col("tus"),
          max(col("tus")).over(w) - col("tus")).otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum((col("late_us") > 0).cast("long")).as("n_late"),
        max(col("late_us")).as("max_late_us"))
  }

  /** K-anonymity suppression gate over an aggregate release: per
    * (event_type, day, value-band) cell, the exact distinct-user count
    * and a `suppressed` flag for cells below k=5 users — the privacy
    * pre-check run before publishing per-segment statistics from a
    * behavioral table (a cell backed by 2 users leaks those users'
    * activity; the release keeps only `suppressed = false` rows).
    * Complements `pii_redact`: that scrubs identifiers from CONTENT,
    * this bounds re-identification from AGGREGATES. Integer day / band
    * math; one partial-agg'd exchange on the cell key (the distinct
    * expands to (cell, user) first — still slim integer rows).
    */
  def kanonSuppression(spark: SparkSession, dir: String, k: Long = 5L): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") / 10.0).cast("long").as("vband"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"), col("vband"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .withColumn("suppressed", col("n_users") < k)

  def eventsValueQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsSpread(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(value, array(0.25, 0.5, 0.95), 10000)").as("qs"))
      .select(
        col("event_type"), col("n"),
        col("qs").getItem(0).as("p25"),
        col("qs").getItem(1).as("p50"),
        col("qs").getItem(2).as("p95"))

  /** Interval-overlap join: user sessions (the 30-min-gap rule of
    * [[eventsSessionize]]) × per-type "incident days" (days whose
    * event count is ≥ 1.15× that type's daily mean, cross-multiplied
    * in integers so the threshold is scale-free and engine-exact),
    * rolled up per (user, incident type). The generic time-interval
    * theta join — `a.start ≤ b.end AND b.start ≤ a.end` — is executed
    * as a DAY-BUCKET EQUI-JOIN: each session explodes to the days it
    * spans (bounded: a 30-min-gap session is hours long, so 1–2 rows)
    * and day buckets hash-join against the broadcast incident table.
    * With closed day-aligned incident intervals the bucket match is
    * EXACTLY the overlap predicate — no post-filter, no O(n·m) range
    * scan, no interval skew. At 100 TB the sessions side shuffles once
    * on user_id (the window), the incident side is type×day bounded
    * (KBs), and the join is broadcast: the canonical scalable
    * interval-join shape. All time math is integer microseconds.
    */
  def eventsIncidentOverlap(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("new_s",
        coalesce((col("tus") - lag(col("tus"), 1).over(w)) > gapUs, lit(true))
          .cast("long"))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("tus")).as("s0"), max(col("tus")).as("s1"))
    val perDay = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    val perType = perDay.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_days"))
    val incidents = perDay.join(perType, "event_type")
      .filter(col("cnt") * col("n_days") * lit(100L) >= col("tot") * lit(115L))
      .select(col("event_type"), col("day"),
        (col("day") * dayUs).as("i0"),
        ((col("day") + 1) * dayUs - 1).as("i1"))
    sessions
      .withColumn("day",
        explode(sequence(expr(s"s0 div ${dayUs}L"), expr(s"s1 div ${dayUs}L"))))
      .join(broadcast(incidents), "day")
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_session_day_pairs"),
        countDistinct(col("session_idx")).as("n_sessions"),
        sum(least(col("s1"), col("i1")) - greatest(col("s0"), col("i0")))
          .as("sum_overlap_us"))
  }

  /** Count–min sketch frequency estimation (Cormode & Muthukrishnan,
    * "An Improved Data Stream Summary: The Count-Min Sketch and its
    * Applications"): per-user event counts estimated from a 3×64
    * counter grid (md5 row hashes), scored against the exact counts
    * for every heavy user (≥ 1.2× the mean user volume,
    * cross-multiplied). The estimate is min over the 3 row counters —
    * ≥ exact by construction, so `overcount` is the per-key collision
    * error the sketch's ε·N bound caps. Every number is a BIGINT the
    * DuckDB oracle replays hash-for-hash.
    *
    * Scale shape: the counter grid aggregates 192 keys with map-side
    * partial aggregation (the sketch IS the mergeable per-partition
    * state — this is how a streaming topology keeps per-key counts in
    * O(w·d) memory), the probe side joins against the broadcast grid,
    * and the heavy-user gate needs only the exact per-user aggregate
    * this query already computes as its ground truth.
    */
  def userCmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val width = 64L
    val depths = Seq(0, 1, 2)
    val ev = Tables.events(spark, dir).select(col("user_id"))
    def bucket(r: Int) =
      conv(substring(md5(concat_ws(":", lit("cms"), lit(r.toString),
        col("user_id").cast("string")).cast("binary")), 1, 7), 16, 10)
        .cast("long") % width
    val counters = depths.map(r => ev.select(lit(r).as("r"), bucket(r).as("b")))
      .reduce(_ unionAll _)
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val tot = exact.agg(sum(col("exact_cnt")).as("n_tot"), count(lit(1)).as("n_users"))
    val heavy = exact.crossJoin(broadcast(tot))
      .filter(col("exact_cnt") * col("n_users") * lit(10L) >= col("n_tot") * lit(12L))
      .select(col("user_id"), col("exact_cnt"))
    depths.map(r => heavy.select(col("user_id"), col("exact_cnt"),
        lit(r).as("r"), bucket(r).as("b")))
      .reduce(_ unionAll _)
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy(col("user_id"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
  }

  /** User-lifespan histogram: how many users were active for exactly N
    * distinct calendar days between their first and last event. The
    * per-user rollup (first/last/active-day spread) is ONE hash
    * aggregate keyed on user_id — min, max and the distinct-day count
    * all ride the same exchange because days dedupe inside a collected
    * set bounded by the observation window (≤ a few hundred distinct
    * days), not by event volume. The outer histogram groups ≤ window
    * days' worth of keys. All integer day arithmetic; no timestamp
    * subtraction leaves the exact domain.
    */
  def eventsUserLifespan(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        size(collect_set(col("day"))).cast("long").as("active_days"))
      .groupBy((col("last_day") - col("first_day")).as("lifespan_days"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("active_days")).as("sum_active_days"))
  }

  /** Time-to-convert pyramid: for users whose first purchase follows
    * their first view, the view→purchase delay banded by log2 of whole
    * hours (+1) — the funnel-velocity readout behind "how long does
    * conversion take". Both firsts come from ONE conditional-min
    * aggregate per user (no per-stage scans), the delay is exact
    * integer microseconds, and the band is a binary digit count. The
    * histogram rollup is ≤ 64 groups.
    */
  def eventsTimeToConvert(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("v_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("p_us"))
      .filter(col("v_us").isNotNull && col("p_us") > col("v_us"))
      .select(expr("(p_us - v_us) div 3600000000L").as("hours"))
      .groupBy((length(bin(col("hours") + 1)) - 1).cast("long").as("band"))
      .agg(count(lit(1)).as("n_users"),
        min(col("hours")).as("min_hours"), max(col("hours")).as("max_hours"))

  /** Monthly stickiness (DAU/MAU): mean daily actives over monthly
    * actives — the engagement ratio every growth report leads with
    * (1.0 = everyone active every day). Exact integer formulation:
    * Σ daily-distinct over the month and 30.5-free month windows as
    * epoch months; the one division per output row runs over exact
    * BIGINTs. Distinct-day dedup happens in a (user, day) aggregate
    * BEFORE either rollup, so no count-distinct crosses month scope.
    */
  def userStickiness(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val userDays = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .distinct()
      .withColumn("month", expr("day div 30L"))
    val dau = userDays.groupBy(col("month"), col("day"))
      .agg(count(lit(1)).as("n_active"))
      .groupBy(col("month").as("m1"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_active")).as("sum_dau"))
    val mau = userDays.select(col("month"), col("user_id")).distinct()
      .groupBy(col("month"))
      .agg(count(lit(1)).as("mau"))
    mau.join(dau, col("month") === col("m1"))
      .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
        (col("sum_dau").cast("double")
          / (col("n_days") * col("mau")).cast("double")).as("stickiness"))
  }

  /** Discrete power-law exponent of the user-activity distribution
    * (continuous-MLE approximation, Clauset et al.):
    * α = 1 + n / Σ ln(cᵢ / (x_min − ½)) over users with cᵢ ≥ x_min —
    * the one-number answer to "how heavy is the heavy tail" that
    * decides salting and partition budgets. Per-user counts are
    * exact; each log quantizes to micro-nats before the sum, so the
    * estimate replays exactly. x_min = 2 (singleton users carry no
    * tail information).
    */
  def activityPowerlawAlpha(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(floor(log(col("c").cast("double") / lit(1.5)) * lit(1000000.0))
        .cast("long").as("lnr"))
      .agg(count(lit(1)).as("n_tail_users"), sum(col("lnr")).as("sum_ln_micro"))
      .select(col("n_tail_users"), col("sum_ln_micro"),
        when(col("sum_ln_micro") > 0,
          lit(1.0) + col("n_tail_users").cast("double") * lit(1e6)
            / col("sum_ln_micro").cast("double")).as("alpha"))

  /** Per-user behavioral entropy: Shannon entropy of each user's
    * event-type distribution in exact micro-nats — the third leg of
    * the bot-forensics triad next to [[eventsBurstiness]] (timing) and
    * [[activityPowerlawAlpha]] (volume): scripted traffic repeats one
    * action (entropy → 0), humans mix. Same decomposition as
    * [[graft.operators.TextOps.docTokenEntropy]]:
    * H = ln n − (Σ c·ln c)/n over the ≤ |types| per-user counts, logs
    * micro-quantized before any sum, integer final division.
    */
  def userBehaviorEntropy(spark: SparkSession, dir: String): DataFrame = {
    def lnMicro(c: Column) =
      floor(log(c.cast("double")) * lit(1000000.0)).cast("long")
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_events"),
        sum(col("c") * lnMicro(col("c"))).as("s"))
      .select(col("user_id"), col("n_types"), col("n_events"),
        (lnMicro(col("n_events")) - expr("s div n_events")).as("entropy_micro"))
  }

  /** Entropy rate of the event-type Markov chain,
    * H(next | current) = Σ p(c,n)·ln(c(c,·)/c(c,n)) in exact
    * micro-nats — how predictable the NEXT action is given the
    * current one, the single number that says whether
    * [[eventTransitions]]' matrix carries real sequential signal
    * (rate ≪ the stationary entropy) or the chain is i.i.d. (rate ≈
    * it). Transition counts come off one lag window; the row
    * marginals are window sums over the ≤ |types|² count table; the
    * weighted log-ratio sum divides once by the total transition
    * count.
    */
  def markovEntropyRate(spark: SparkSession, dir: String): DataFrame = {
    def lnMicro(c: Column) =
      floor(log(c.cast("double")) * lit(1000000.0)).cast("long")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("cur", lag(col("event_type"), 1).over(w))
      .filter(col("cur").isNotNull)
      .groupBy(col("cur"), col("event_type").as("nxt"))
      .agg(count(lit(1)).as("c_cn"))
    val wc = Window.partitionBy(col("cur"))
    trans
      .withColumn("c_c", sum(col("c_cn")).over(wc))
      .agg(sum(col("c_cn")).as("n_trans"),
        sum(col("c_cn") * (lnMicro(col("c_c")) - lnMicro(col("c_cn"))))
          .as("weighted"))
      .select(col("n_trans"),
        expr("weighted div n_trans").as("entropy_rate_micro"))
  }

  /** Population Stability Index of the value distribution between the
    * first and second half of the observation window — the standard
    * ML-monitoring drift score (PSI < 0.1 stable, > 0.25 retrain).
    * Bins are log2 bands of the exact milli-quantized value (no
    * quantile edges to drift with the data); the halves split at the
    * integer midpoint of the observed day range (1-row broadcast);
    * each bin's ln(p2/p1) evaluates on exact integer ratios with
    * Laplace +1 on both counts so empty bins stay finite. Output is
    * one row per bin with its PSI contribution; Σ is the headline.
    */
  def eventsValueDriftPsi(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(expr(s"unix_micros(ts) div ${dayUs}L").as("day"),
        floor(col("value") * lit(1000.0)).cast("long").as("vm"))
      .filter(col("vm") >= 0)
    val mid = ev.agg(((min(col("day")) + max(col("day"))) / 2).cast("long")
      .as("mid_day"))
    val binned = ev.crossJoin(broadcast(mid))
      .select((length(bin(col("vm") + 1)) - 1).cast("long").as("bin"),
        (col("day") <= col("mid_day")).as("first_half"))
      .groupBy(col("bin"))
      .agg(sum(when(col("first_half"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("first_half"), 0L).otherwise(1L)).as("n2"))
    val totals = binned.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"),
      count(lit(1)).as("n_bins"))
    binned.crossJoin(broadcast(totals))
      // Laplace-smoothed shares: p = (n+1)/(t+bins)
      .withColumn("p1", (col("n1") + 1).cast("double")
        / (col("t1") + col("n_bins")).cast("double"))
      .withColumn("p2", (col("n2") + 1).cast("double")
        / (col("t2") + col("n_bins")).cast("double"))
      // the one log quantizes to micro-nats (floor·10⁶) before the
      // product — raw ln can differ across engines in the last ulp
      .select(col("bin"), col("n1"), col("n2"),
        ((col("p2") - col("p1"))
          * floor(log(col("p2") / col("p1")) * lit(1000000.0)).cast("long")
            .cast("double") / lit(1e6)).as("psi_term"))
  }

  /** Benford first-digit audit of the value column — the
    * forensic-accounting screen: organically-generated magnitudes
    * follow P(d) = log10(1+1/d); fabricated or clipped feeds don't.
    * The first significant digit comes from the STRING of the exact
    * milli-quantized integer (regexp for the leading non-zero digit —
    * no log10 in the digit path, whose last-ulp could flip a power of
    * ten), and the expected shares are Scala-computed literals baked
    * identically into both engines. One 9-row rollup plus the 1-row
    * total; the per-digit χ² contribution is a double expression over
    * exact counts.
    */
  def valuesBenfordDigits(spark: SparkSession, dir: String): DataFrame = {
    // floor(log10(1+1/d)·10⁶), hardcoded (not recomputed via libm) so
    // the Spark plan and the oracle SQL carry the SAME literals
    val expectedMicro: Map[Int, Long] = Map(
      1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
      6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
    val expCol = expectedMicro.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((d, p), rest) => when(col("digit") === d.toLong, p).otherwise(rest)
    }
    val digits = Tables.events(spark, dir)
      .select(floor(col("value") * lit(1000.0)).cast("long").as("vm"))
      .filter(col("vm") > 0)
      .select(regexp_extract(col("vm").cast("string"), "^([1-9])", 1)
        .cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("n_total"))
    digits.crossJoin(broadcast(total))
      .withColumn("exp_micro", expCol)
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast("double") / col("n_total").cast("double"))
          .as("obs_share"),
        (col("exp_micro").cast("double") / lit(1e6)).as("exp_share"),
        ((col("n_obs").cast("double")
          - col("n_total").cast("double") * col("exp_micro").cast("double") / lit(1e6))
          * (col("n_obs").cast("double")
            - col("n_total").cast("double") * col("exp_micro").cast("double") / lit(1e6))
          / (col("n_total").cast("double") * col("exp_micro").cast("double") / lit(1e6)))
          .as("chi2_term"))
  }

  /** Weekday-adjusted rate residuals: each (type, day) count against
    * the mean of ITS OWN weekday for that type — the seasonal
    * adjustment that stops Monday-vs-Sunday variation from drowning
    * real anomalies in [[eventRateAnomaly]]'s flat z-score. The
    * weekday baseline is a window sum over the bounded (type, day)
    * count table; the residual is an exact cross-multiplied
    * basis-point integer ((c·n_wd − s_wd)·10⁴ div s_wd) — no float
    * in the flagging path.
    */
  def eventsSeasonalResiduals(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val w = Window.partitionBy(col("event_type"), col("weekday"))
    Tables.events(spark, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("weekday", pmod(col("day"), lit(7L)))
      .withColumn("n_wd", count(lit(1)).over(w))
      .withColumn("s_wd", sum(col("c")).over(w))
      .select(col("event_type"), col("day"), col("weekday"), col("c"),
        expr("((c * n_wd - s_wd) * 10000L) div s_wd").as("residual_bps"))
  }

  /** Welch's t statistic between purchase and non-purchase event
    * values — the unequal-variance two-sample test (never pooled:
    * group sizes and variances both differ here). Each group's
    * (n, Σ, Σx²) accumulates as exact micro-quantized BIGINTs inside
    * ONE conditional aggregate — no second scan, no join of two
    * filtered subqueries — and the t statistic is a single double
    * expression over the six integer sums (sqrt is IEEE-exact).
    * Degenerate groups (empty, or zero combined variance) yield NULL.
    */
  def valuesWelchT(spark: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = c.cast("double") / lit(1e3)
    val agg = Tables.events(spark, dir)
      .select((col("event_type") === "purchase").as("is_p"),
        floor(col("value") * lit(1000.0)).cast("long").as("vm"))
      .agg(
        sum(when(col("is_p"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("is_p"), col("vm")).otherwise(0L)).as("s1"),
        sum(when(col("is_p"), col("vm") * col("vm")).otherwise(0L)).as("q1"),
        sum(when(col("is_p"), 0L).otherwise(1L)).as("n2"),
        sum(when(col("is_p"), 0L).otherwise(col("vm"))).as("s2"),
        sum(when(col("is_p"), 0L).otherwise(col("vm") * col("vm"))).as("q2"))
    // sample-variance-over-n from the exact sums:
    // (n·Σx² − (Σx)²) / (n²·(n−1)), descaled from micro² units
    // n > 1 guard INSIDE the helper: ANSI division is eager under
    // non-short-circuiting And, so the n²(n−1) denominator must never
    // be zero even when the outer branch won't be taken
    def vOverN(n: Column, s: Column, q: Column): Column =
      when(n > 1,
        (n.cast("double") * q.cast("double") - s.cast("double") * s.cast("double")) /
          (n.cast("double") * n.cast("double") * (n.cast("double") - 1.0)) / lit(1e6))
    val se2 = vOverN(col("n1"), col("s1"), col("q1")) +
      vOverN(col("n2"), col("s2"), col("q2"))
    agg.select(col("n1"), col("n2"),
      when(col("n1") > 0, m(col("s1")) / col("n1").cast("double"))
        .as("mean_purchase"),
      when(col("n2") > 0, m(col("s2")) / col("n2").cast("double"))
        .as("mean_other"),
      when(col("n1") > 1 && col("n2") > 1 && se2 > 0.0,
        (m(col("s1")) / col("n1").cast("double")
          - m(col("s2")) / col("n2").cast("double")) / sqrt(se2))
        .as("welch_t"))
  }

  /** Diurnal profile: hour-of-day event histogram per type with each
    * hour's share of its type — the seasonality fingerprint that
    * separates human-driven types (daytime hump) from machine traffic
    * (flat). One ≤ types×24-group aggregate; the share normalizes
    * with a window sum over the type prefix of the finished rollup,
    * never a second scan.
    */
  def eventsHourProfile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
    Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("type_total", sum(col("cnt")).over(w))
      .select(col("event_type"), col("hr"), col("cnt"),
        (col("cnt").cast("double") / col("type_total").cast("double"))
          .as("share"))
  }

  /** Per-user burstiness (Fano factor of daily event counts, in exact
    * micro-units): dispersion index = variance/mean, > 1 flags users
    * whose activity clumps into bursts — bot/incident forensics a
    * plain rate can't see. Day counts are exact integers, the power
    * sums are one keyed aggregate over the (user, day) rollup, and
    * the factor is an integer cross-multiplication
    * ((n·Σc² − (Σc)²)·10⁶) div (n·Σc) — fully order-free. Users seen
    * on a single day carry no dispersion evidence and report NULL.
    */
  def eventsBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("user_id"), col("n_days"), col("n_events"),
        when(col("n_days") > 1,
          expr("((n_days * s2 - n_events * n_events) * 1000000L) div (n_days * n_events)"))
          .as("fano_micro"))
  }

  /** Lag-1 autocorrelation of each type's daily rate series — "does a
    * busy day predict a busy tomorrow": the cheapest time-series
    * memory diagnostic, and the statistic that decides whether naive
    * day-over-day alerting double-fires. Adjacent days pair up via a
    * lag window over the ≤ types × days count table (bounded, keyed by
    * type); every sum is an exact BIGINT over integer counts, and the
    * one non-exact step is the final Pearson ratio (sqrt is correctly
    * rounded per IEEE 754, so even that replays). Day gaps pair
    * whatever days are adjacent IN THE OBSERVED SERIES — both engines
    * see the identical series, so the pairing is identical.
    */
  def eventsAutocorrLag1(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("c_prev", lag(col("c"), 1).over(w))
      .filter(col("c_prev").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"),
        sum(col("c_prev")).as("sx"), sum(col("c")).as("sy"),
        sum(col("c_prev") * col("c")).as("sxy"),
        sum(col("c_prev") * col("c_prev")).as("sxx"),
        sum(col("c") * col("c")).as("syy"))
      .select(col("event_type"), col("m"),
        when((col("m") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("m") * col("syy") - col("sy") * col("sy")) > 0,
          (col("m").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / sqrt((col("m").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("m").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))))
          .as("autocorr_lag1"))
  }

  /** Exact empirical CDF of `value` at fixed probe points — the
    * distribution telemetry that needs NO sort and NO quantile state:
    * each event contributes to the probes it falls under via a
    * filtered literal-array explode (≤ |probes|× fanout inside
    * codegen, no join), and the ≤ |probes|-row rollup plus one
    * broadcast total turn into exact fractions. The scale-robust dual
    * of [[eventsValueQuantiles]]: quantiles ask "what value sits at
    * p?", the ECDF asks "what mass sits under v?" — only the latter
    * is embarrassingly parallel with exact results.
    */
  def eventsValueEcdf(spark: SparkSession, dir: String): DataFrame = {
    val probes = Seq(0.5, 1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0)
    val ev = Tables.events(spark, dir).select(col("value"))
    val total = ev.agg(count(lit(1)).as("n_total"))
    ev
      .select(explode(filter(typedLit(probes), p => col("value") <= p)).as("probe"))
      .groupBy(col("probe"))
      .agg(count(lit(1)).as("n_le"))
      .crossJoin(broadcast(total))
      .select(col("probe"), col("n_le"),
        (col("n_le").cast("double") / col("n_total").cast("double")).as("ecdf"))
  }

  /** Log2-banded user activity histogram: users bucketed by
    * floor(log2(event count)) — the scale-free engagement pyramid
    * (1, 2-3, 4-7, 8-15, … events). The band comes from the BINARY
    * DIGIT COUNT of the exact integer count (`length(bin(n)) - 1`),
    * never from a floating log2 — log2(2^k) can land a hair under k
    * in libm and misband every power of two. One keyed aggregate per
    * user, then a ≤ 64-row rollup.
    */
  def userActivityLog2Bands(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy((length(bin(col("n_events"))) - 1).cast("long").as("band"))
      .agg(count(lit(1)).as("n_users"),
        min(col("n_events")).as("min_events"),
        max(col("n_events")).as("max_events"))

  /** Robust per-type rate anomaly via median absolute deviation — the
    * outlier-resistant twin of [[eventRateAnomaly]]'s z-score (one bad
    * day inflates a stddev but barely moves the MAD). Daily counts per
    * type are the only corpus-sized aggregate; the median and MAD
    * passes run over the ≤ types × days summary (hundreds of rows).
    * Counts are exact integer doubles and 0.5 is exactly
    * representable, so the interpolated medians — and the 3·MAD
    * gate — replay bit-for-bit in the oracle's quantile_cont.
    */
  def eventRateMad(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val med = daily.groupBy(col("event_type").as("t1"))
      .agg(percentile(col("cnt"), lit(0.5)).as("med"))
    val withDev = daily.join(broadcast(med), col("event_type") === col("t1"))
      .withColumn("dev", abs(col("cnt").cast("double") - col("med")))
    val mad = withDev.groupBy(col("event_type").as("t2"))
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    withDev.join(broadcast(mad), col("event_type") === col("t2"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_anomalous_days"))
  }

  /** Two-variant A/B readout with a chi-square independence statistic:
    * users split by a deterministic hash gate, outcome = whether each
    * event is a purchase (event-level, not per-user conversion — on
    * this data every user eventually purchases, which would collapse
    * one margin of a per-user table to zero). The 2×2 cells are one
    * hash aggregate; the χ² is a single double expression over the
    * four exact integer cells (each < 2⁵³, so the int→double
    * conversions are exact — the products are computed IN double
    * because (ad−bc)² overflows BIGINT past ~10⁹ events). A
    * degenerate margin yields NULL, not a divide-by-zero abort.
    */
  def abTestChi2(spark: SparkSession, dir: String): DataFrame = {
    val variant = pmod(conv(substring(md5(concat_ws(":", lit("ab"),
      col("user_id").cast("string")).cast("binary")), 1, 7), 16, 10)
      .cast("long"), lit(2L))
    val denom =
      (col("a") + col("b")).cast("double") * (col("c") + col("d")).cast("double") *
        (col("a") + col("c")).cast("double") * (col("b") + col("d")).cast("double")
    val delta = col("a").cast("double") * col("d").cast("double") -
      col("b").cast("double") * col("c").cast("double")
    Tables.events(spark, dir)
      .select(variant.as("variant"),
        (col("event_type") === "purchase").cast("long").as("p"))
      .groupBy(col("variant"), col("p"))
      .agg(count(lit(1)).as("n"))
      .agg(
        sum(when(col("variant") === 0 && col("p") === 1, col("n"))
          .otherwise(0L)).as("a"),
        sum(when(col("variant") === 0 && col("p") === 0, col("n"))
          .otherwise(0L)).as("b"),
        sum(when(col("variant") === 1 && col("p") === 1, col("n"))
          .otherwise(0L)).as("c"),
        sum(when(col("variant") === 1 && col("p") === 0, col("n"))
          .otherwise(0L)).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        when(denom =!= 0.0,
          (col("a") + col("b") + col("c") + col("d")).cast("double")
            * delta * delta / denom).as("chi2"))
  }

  /** Third-order behavioral paths: every 3-step event-type sequence a
    * user walks, counted corpus-wide — the sequence-mining rollup one
    * order above [[eventTransitions]]' Markov matrix. Two lags over
    * the keyed per-user window produce each window in place (no
    * self-joins); the path vocabulary is ≤ |types|³, so the final
    * count-by-path aggregate is parameter-bounded regardless of
    * event volume.
    */
  def eventTrigramPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(concat_ws(">", col("t1"), col("t2"), col("event_type")).as("path"))
      .agg(count(lit(1)).as("n"))
  }

  /** Inter-event dwell time per event type: the gap (whole seconds)
    * between a user's consecutive events, rolled up by the type of the
    * LATER event. The lag window partitions by user_id — a keyed,
    * data-parallel window, not a global sort — and orders by
    * (ts, event_id) so same-timestamp rows break ties
    * deterministically. Gaps accumulate as exact integer seconds; the
    * mean is one int/int double division per 6-row output.
    */
  def eventsDwellTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) - prev_us) div 1000000L").as("gap_s"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("sum_gap_s"))
      .withColumn("avg_gap_s",
        col("sum_gap_s").cast("double") / col("n_gaps").cast("double"))
  }
}
