package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for fact⋈dim equi-joins.
  *
  * A hash-partitioned join sends every row of a hot key to ONE reducer;
  * at 100 TB a single viral key can hold a 1000-executor stage hostage.
  * AQE's skew-join handles sort-merge cases adaptively; this utility is
  * the explicit form for when the skew is known ahead of time (or the
  * join is not SMJ): the fact side scatters each key across `salts`
  * sub-partitions, the dimension side replicates `salts`× (dimension
  * rows are the small side by definition), and the join key becomes
  * (key, salt) — hot keys now spread over `salts` reducers.
  *
  * Join results are exactly those of the unsalted join: the salt is a
  * pure partitioning refinement, never part of the join semantics.
  */
object Skew {

  /** Inner equi-join `fact.key = dim.key` with `salts`-way salting.
    * The fact salt is derived from a hash of the whole fact row (cheap,
    * deterministic, uniform); any assignment works — correctness never
    * depends on it.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val factCols: Seq[Column] = fact.columns.map(fact(_)).toSeq
    val salted = fact.withColumn(
      "__salt", pmod(xxhash64(factCols: _*), lit(salts)).cast("int"))
    val replicated = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-stage salted aggregation — the hot-KEY aggregation pattern: a
    * viral user's events first reduce within `salts` independent
    * sub-groups (spreading the hot key over that many reducers), then
    * the tiny per-salt partials reduce to the final per-user row. The
    * result is exactly the direct groupBy's (sums/counts re-associate;
    * the DECIMAL value sum keeps re-association bit-exact), which is
    * what lets the driver oracle-check the salted plan against the
    * plain SQL aggregation.
    */
  def saltedUserCounts(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val salts = 8
    graft.Tables.events(spark, dir)
      .withColumn("__salt",
        pmod(xxhash64(col("event_id")), lit(salts)).cast("int"))
      .groupBy(col("user_id"), col("__salt"))
      .agg(
        count(lit(1)).as("pc"),
        sum(col("value").cast("decimal(18,6)")).as("pv"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("pc")).as("n_events"),
        sum(col("pv")).cast("double").as("total_value"))
  }
}
