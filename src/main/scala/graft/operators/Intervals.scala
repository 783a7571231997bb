package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval (range) joins: fact value ∈ [lo, hi) band lookup.
  *
  * Spark has no native range-join optimization — a naive theta join
  * plans as BroadcastNestedLoopJoin (every fact row probes every band:
  * fine for 8 bands, catastrophic for 100k bands) and an un-broadcast
  * one degenerates to a cartesian product. The scale-safe composition
  * is bucket decomposition: replicate each band to the fixed-width
  * integer buckets it covers, equi-join fact rows on their bucket, then
  * refine with the exact lo/hi predicate. The join becomes a plain
  * hash join on an integer key — broadcastable when bands are small,
  * shuffle-partitionable when they aren't — and each fact row meets
  * only the bands overlapping its bucket, never the whole band table.
  */
object Intervals {

  /** (label, lo, hi) bands, hi exclusive; hi = Double.MaxValue for the
    * open tail. Deliberately uneven widths — the case floor-division
    * binning can't express.
    */
  val valueBands: Seq[(String, Double, Double)] = Seq(
    ("b0_lt1",      0.0,   1.0),
    ("b1_1_2p5",    1.0,   2.5),
    ("b2_2p5_5",    2.5,   5.0),
    ("b3_5_10",     5.0,  10.0),
    ("b4_10_25",   10.0,  25.0),
    ("b5_25_50",   25.0,  50.0),
    ("b6_50_100",  50.0, 100.0),
    ("b7_ge100",  100.0, Double.MaxValue))

  /** Events histogrammed into uneven value bands via the bucket
    * decomposition above (bucket width 1.0, band replication
    * precomputed — the band side stays rows × avg-covered-buckets,
    * bounded and broadcast-sized here). Money-style sums go through
    * DECIMAL so both engines agree bit-for-bit.
    */
  def eventsValueBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxBucket = 1000L // events.value ≪ 1000; clamp open tail
    val bandBuckets = valueBands.flatMap { case (band, lo, hi) =>
      val hiB = math.min(if (hi == math.floor(hi)) hi.toLong - 1 else math.floor(hi).toLong,
        maxBucket)
      (lo.toLong to hiB).map(b => (band, lo, hi, b))
    }.toDF("band", "lo", "hi", "bucket")

    Tables.events(spark, dir)
      // clamp the fact bucket too, so tail values beyond maxBucket
      // still meet the open tail band's replicated rows
      .select(col("value"),
        least(floor(col("value")).cast("long"), lit(maxBucket)).as("bucket"))
      .join(broadcast(bandBuckets), "bucket")
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }
}
