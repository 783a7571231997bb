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

  /** Join-key skew diagnostic — the report run BEFORE deciding whether
    * [[saltedJoin]]/[[saltedUserCounts]]-style mitigation is needed:
    * which keys exceed a 1/k share of the fact table, each with its
    * exact share and the salt fan-out that would spread it across
    * `parallelism` reducers (`ceil(cnt·P/n)`, floor 1 — the number of
    * sub-keys that caps every sub-group at ~n/P rows).
    *
    * Two-pass heavy-hitter shape like `frequent_tokens`: a Misra-Gries
    * candidate sketch (≤ k counters per partition crossing one
    * single-partition exchange of metadata, run eagerly at plan
    * construction) followed by an exact re-count of candidates only —
    * the key space itself never shuffles, which is the point at 10⁹
    * distinct keys. The exact filter makes the composed result
    * deterministic despite the sketch's merge-order dependence.
    */
  def hotKeys(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 128, parallelism: Long = 32L): DataFrame = {
    val s = spark
    import s.implicits._
    val keys = graft.Tables.events(spark, dir)
      .select(col("user_id").cast("string").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mg = new graft.functions.MisraGries(k).toColumn
    val candidates: Seq[String] =
      keys.as[String].select(mg).collect().headOption.getOrElse(Nil)
    val n: Long = keys.count()
    keys
      .filter(col("key").isin(candidates: _*))
      .groupBy(col("key").cast("long").as("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .select(col("user_id"), col("cnt"),
        expr(s"(cnt * 1000000) div ${n}L").as("share_micro"),
        greatest(lit(1L), expr(s"(cnt * $parallelism + ${n}L - 1) div ${n}L"))
          .as("salt_fanout"))
  }
}
