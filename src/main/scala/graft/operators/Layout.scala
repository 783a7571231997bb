package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-layout operators: multi-dimensional clustering keys for
  * write-time organization.
  *
  * At 100 TB the dominant read cost is scan pruning: a table sorted by
  * one column prunes row groups only for predicates on that column.
  * Z-ordering interleaves the bits of several columns into one sort
  * key, so min/max row-group statistics stay selective for EVERY
  * interleaved dimension at once — the standard layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. The key computation itself is
  * narrow integer bit math (codegen'd, shuffle-free); the layout write
  * is then a plain `sortWithinPartitions(z)` + parquet sink.
  */
object Layout {

  /** 16-bit × 2 Morton (Z-curve) interleave: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Static unroll of 16 OR terms —
    * stays inside whole-stage codegen, and replays as the identical
    * expression in the DuckDB oracle.
    */
  def zorder2(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Z-order clustering key over events (user_id × integer value):
    * the layout computation a write pipeline runs before
    * `sortWithinPartitions(z).write.parquet(...)`. Emitted as a query
    * so the key math itself is oracle-checked; the end-to-end
    * sort + write + pruning effect is pinned in LayoutSpec.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        floor(col("value")).cast("long").as("vbin"))
      .withColumn("z",
        zorder2(col("user_id").bitwiseAND(lit(65535L)),
          col("vbin").bitwiseAND(lit(65535L))))
}
