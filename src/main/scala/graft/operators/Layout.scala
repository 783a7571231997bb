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

  /** Hilbert-curve state machine as two packed 32-bit literals: entry
    * k = state·4 + xbit·2 + ybit holds the output digit / next state in
    * bits [2k, 2k+1]. Derived from the classic iterative xy→d rotation
    * algorithm (4 reachable sub-square orientations); HilbertSpec
    * re-verifies the table against a plain-loop reference
    * implementation over the full 8-bit domain.
    */
  val HilbertDigitLut: Long = 0x1e369cb4L
  val HilbertNextLut: Long  = 0xb7ca5c21L

  /** 16-bit × 2 Hilbert curve index: like [[zorder2]] a space-filling
    * clustering key, but with strictly better locality — the Hilbert
    * curve never jumps (consecutive indexes are always grid-adjacent,
    * while the Z-curve teleports across the square at every quadrant
    * boundary), so per-file min/max envelopes are tighter and data
    * skipping prunes more. The price is that the digit depends on the
    * path so far; the classic mutating-loop formulation is re-expressed
    * as a 16-step Mealy machine over two packed LUT literals — a static
    * unroll of pure integer shifts/masks that stays inside whole-stage
    * codegen and replays operator-for-operator in the DuckDB oracle.
    */
  def hilbert2(df: DataFrame, xc: String, yc: String, bits: Int = 16): DataFrame = {
    val d0 = df.withColumn("h_st", lit(0L)).withColumn("h", lit(0L))
    val stepped = ((bits - 1) to 0 by -1).foldLeft(d0) { (d, b) =>
      val k = s"(h_st * 4 + (shiftright($xc, $b) & 1) * 2 + (shiftright($yc, $b) & 1))"
      d.withColumn("h_new",
          expr(s"(h * 4) | (shiftright(${HilbertDigitLut}L, $k * 2) & 3)"))
        .withColumn("h_st", expr(s"shiftright(${HilbertNextLut}L, $k * 2) & 3"))
        .withColumn("h", col("h_new")).drop("h_new")
    }
    stepped.drop("h_st")
  }

  /** Hilbert clustering key over events — [[zorderLayout]]'s twin with
    * the stronger-locality curve; LayoutSpec compares the two layouts'
    * per-file envelope tightness head-to-head.
    */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame =
    hilbert2(
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          col("user_id"),
          floor(col("value")).cast("long").as("vbin")),
      "(user_id & 65535)", "(vbin & 65535)")

  /** Writer shard plan: deterministic size-based sharding of each
    * source's documents — the "target output file size" assignment a
    * 100 TB writer needs to avoid both the small-files problem (10⁶
    * tiny parquet files murder the name node and the scan planner) and
    * giant unsplittable files. Shard = cumulative bytes BEFORE the doc,
    * integer-divided by the target size, so every shard except the last
    * ends at or just past the target — the same first-fit contract as
    * `pack_batches`' token budgeting but at the storage layer. One
    * exchange on `source` feeds the running-sum window; a writer then
    * runs `repartition(source, shard)` + parquet to get one file per
    * shard row group.
    */
  /** Shard manifest — the reproducibility artifact a shard writer emits
    * next to its output: per (source, shard) of [[outputShardPlan]],
    * the row count, byte total, and an ORDER-INDEPENDENT content
    * checksum (bit_xor of a portable 60-bit md5 prefix per document),
    * so any re-run — different partitioning, different task order — can
    * be byte-verified against the manifest without sorting anything.
    * xor is the right fold: commutative/associative (layout-proof),
    * and any single changed/missing/extra document flips the checksum.
    *
    * Scale shape: the same single window as the shard plan, an id-keyed
    * join moving (id, 8-byte hash) pairs, and a map-side-partial
    * aggregate to |sources|·|shards| rows.
    */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val plan = outputShardPlan(spark, dir)
    val h = Tables.documents(spark, dir).select(col("doc_id"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
    plan.join(h, "doc_id")
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_bytes"),
        expr("bit_xor(h)").as("checksum"))
  }

  def outputShardPlan(spark: SparkSession, dir: String,
      targetChars: Long = 16384L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cum_before", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("shard", expr(s"cum_before div ${targetChars}L"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("shard"))
  }
}
