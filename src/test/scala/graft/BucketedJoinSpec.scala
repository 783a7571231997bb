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
