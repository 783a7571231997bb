package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every registered query must plan and
  * execute against EMPTY tables (correct schemas, zero rows) — the
  * day-one state of any new deployment and the per-partition state of
  * sparse date ranges. "Empty in, empty out" — never a crash.
  */
class EmptyInputSpec extends AnyFunSuite with SparkFixture {

  private lazy val emptyDir: String = {
    val dir = scratchDir("graft-empty")
    // write zero-row copies of every fixture table, schemas intact
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$fixtureDir/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on empty tables without error") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).collect() // rows may be 0 or (for pi) constant
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("aggregation queries return zero rows (not null rows) on empty input") {
    assert(graft.operators.TextOps.wordcount(spark, emptyDir).count() === 0L)
    assert(graft.operators.Dedup.dedupExact(spark, emptyDir).count() === 0L)
    assert(graft.operators.Relational.taskCGroupCount(spark, emptyDir).count() === 0L)
    // left-join queries keep (empty) left side semantics: no customers → no rows
    assert(graft.operators.Relational.taskDIndegreeLeftJoin(spark, emptyDir).count() === 0L)
  }
}
