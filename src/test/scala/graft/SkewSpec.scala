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
}
