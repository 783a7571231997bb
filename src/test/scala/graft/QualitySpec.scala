package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

class QualitySpec extends AnyFunSuite with SparkFixture {

  test("observed metrics ride the consuming action, no extra pass") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, fixtureDir)
      .withColumn("maybe", when(col("user_id") === 1L, col("event_type")))
    val (df, obs) = Quality.observed(ev, "ev_quality", Seq("maybe", "event_id"))
    // the sink action is what materializes the metrics
    assert(df.count() === 4L)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_null_maybe") === 2L) // bob's 2 events have NULL maybe
    assert(m("n_null_event_id") === 0L)
  }

  test("testdata schema contract: loaders see the columns the engine assumes") {
    val expect = Map(
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
    expect.foreach { case (t, cols) =>
      val got = Tables.table(spark, fixtureDir, t).columns.toSet
      assert(cols.subsetOf(got), s"$t: missing ${cols -- got}")
    }
    // the events loader's contract column: ts must come out as TIMESTAMP
    assert(Tables.events(spark, fixtureDir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
