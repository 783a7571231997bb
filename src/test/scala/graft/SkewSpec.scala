package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted-join semantics: the salt is a pure partitioning refinement —
  * results must be EXACTLY the unsalted join's, for any salt count.
  */
class SkewSpec extends AnyFunSuite with SparkFixture {

  test("salted join returns exactly the plain join's rows") {
    import org.apache.spark.sql.functions.col
    val events = Tables.events(spark, fixtureDir)
    val customer = Tables.customer(spark, fixtureDir)

    val plain = events
      .join(customer, events("user_id") === customer("c_custkey"))
      .select("event_id", "user_id", "c_name").collect().toSet

    for (salts <- Seq(1, 3, 8)) {
      val salted = Skew.saltedJoin(events, customer, "user_id", "c_custkey", salts)
        .select("event_id", "user_id", "c_name").collect().toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("dimension side is replicated salts-fold, fact side is not") {
    val customer = Tables.customer(spark, fixtureDir)
    val events = Tables.events(spark, fixtureDir)
    // each (fact row, matching dim row) joins exactly once despite the
    // dim replication — multiplicities preserved
    val out = Skew.saltedJoin(events, customer, "user_id", "c_custkey", 4)
    assert(out.count() === 4L) // 4 fixture events, all users matched
    assert(out.groupBy("event_id").count().collect()
      .forall(_.getAs[Long]("count") === 1L))
  }

  test("hot keys: only the planted heavy key surfaces, with exact share and fanout") {
    import spark.implicits._
    val dir = scratchDir("graft-hotkey")
    // user 7 holds 100 of 150 rows; 50 singleton users stay below the
    // 1/128 share threshold (cnt 1, n 150: 1·128 ≤ 150)
    val rows = (0 until 100).map(i => (i.toLong, Fixtures.RefTs + i, 7L, "view", 1.0, "{}")) ++
      (0 until 50).map(i => (1000L + i, Fixtures.RefTs + i, 100L + i, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Skew.hotKeys(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    // share = 100/150 → 666666 micro; fanout = ceil(100·32/150) = 22
    assert(got.toSeq === Seq(7L -> ((100L, 666666L, 22L))))
  }
}
