package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join story for repeated fact-fact joins.
  *
  * At 100 TB, a customer⋈orders join that runs every hour should not
  * re-shuffle both fact tables every hour: writing both sides bucketed
  * by the join key makes the join exchange-free forever after — the
  * scan's output partitioning already satisfies the join requirement.
  * This spec pins that contract: same key, same bucket count → the
  * executed plan contains NO shuffle exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("equal-bucketed tables join with zero shuffle exchanges") {
    import org.apache.spark.sql.functions.col

    Tables.orders(spark, fixtureDir)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    Tables.customer(spark, fixtureDir)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() === 4L) // alice 3 + bob 1

      // inspect the FINAL adaptive plan, post-execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free, got:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("minhash standing index stored bucketed by band key: batch probe never re-shuffles it") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    import graft.operators.Dedup

    // The production shape behind dedup_minhash_incremental: the
    // standing corpus's band table is MATERIALIZED bucketed by a single
    // combined band key, so every future ingest batch probes it with an
    // exchange on the (small) batch side only. band:band_hash is one
    // key because bucketing clusters by exactly the join columns.
    val sh = Dedup.shingleSets(spark, fixtureDir)
    val withKey = Dedup.md5BandTable(sh)
      .withColumn("band_key", concat_ws(":", col("band"), col("band_hash")))
    withKey.filter(col("doc_id") <= 3)
      .select(col("doc_id").as("existing_id"), col("band_key"))
      .write.bucketBy(4, "band_key").sortBy("band_key")
      .mode("overwrite").saveAsTable("band_index")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = withKey.filter(col("doc_id") > 3)
        .select(col("doc_id"), col("band_key"))
      val cand = spark.table("band_index").join(probe, "band_key")
        .select(col("doc_id"), col("existing_id")).distinct()
      // doc 4 is a token PERMUTATION of 0/1 — disjoint bigram shingles,
      // so its minhash bands cannot collide with any standing doc
      assert(cand.count() === 0L)
      val plan = cand.queryExecution.executedPlan.toString
      // the join's index branch (join node → the band_index scan, the
      // FIRST child in the printed tree) must be exchange-free: the scan
      // reads pre-bucketed. Probe-side signature computation shuffles
      // (per-doc min agg) — that cost is the batch's, never the index's.
      val joinAt = plan.indexOf("Join [band_key")
      val scanAt = plan.indexOf("band_index", joinAt)
      assert(joinAt >= 0 && scanAt > joinAt, s"unexpected plan shape:\n$plan")
      assert(!plan.substring(joinAt, scanAt).contains("Exchange"),
        s"index side must not re-shuffle, got:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS band_index")
    }
  }

  test("mismatched bucket counts fall back to a shuffle on one side only") {
    import org.apache.spark.sql.functions.col

    Tables.orders(spark, fixtureDir)
      .write.bucketBy(4, "o_custkey").mode("overwrite").saveAsTable("orders_b4")
    Tables.customer(spark, fixtureDir)
      .write.bucketBy(2, "c_custkey").mode("overwrite").saveAsTable("customer_b2")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b4")
        .join(spark.table("customer_b2"), col("o_custkey") === col("c_custkey"))
      assert(joined.count() === 4L)
      val plan = joined.queryExecution.executedPlan.toString
      // the 4-bucket side is already partitioned; only the 2-bucket side
      // may need repartitioning — never both
      assert(plan.split("Exchange").length - 1 <= 1,
        s"at most one side should shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b4")
      spark.sql("DROP TABLE IF EXISTS customer_b2")
    }
  }
}
