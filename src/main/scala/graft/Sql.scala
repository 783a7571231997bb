package graft

import org.apache.spark.sql.SparkSession

/** Pure-SQL surface: register every testdata table as a temp view (and
  * the graft native functions via [[GraftExtensions.register]]), so the
  * whole engine is usable from `spark.sql(...)` alone — the interface a
  * reference user migrating hand-written jobs to SQL would reach for.
  */
object Sql {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Create/replace temp views over `dir` + install the native
    * functions and optimizer rules on the session.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case "events" =>
        Tables.events(spark, dir).createOrReplaceTempView("events")
      case t =>
        Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    GraftExtensions.register(spark)
  }
}
