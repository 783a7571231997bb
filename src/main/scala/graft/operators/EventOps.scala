package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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

  /** Approximate percentiles via `approx_percentile` (Greenwald-Khanna):
    * bounded-memory mergeable sketches — the scale path, since exact
    * percentiles need the whole group sorted while the sketch is
    * O(1/accuracy) per group regardless of group size. Sketch output is
    * implementation-defined → rows-only check + a ScalaTest error-bound
    * assertion against [[eventsValueQuantiles]].
    */
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
}
