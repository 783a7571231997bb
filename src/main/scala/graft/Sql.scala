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

  /** Additionally expose every registered query as a lazy temp view
    * (`graft_<name>`), so SQL users can compose over engine results:
    * `SELECT * FROM graft_dedup_exact WHERE n_dups > 1`. Views are
    * plans, not materializations — each reference re-optimizes into the
    * enclosing query. (Exceptions: the IVF/centroid queries load their
    * metadata-scale codebook eagerly at registration, like loading a
    * model, and the iterative dedup queries (components/curate) run
    * their label-propagation rounds eagerly — register selectively if
    * that cost matters.)
    */
  def registerQueryViews(spark: SparkSession, dir: String): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
}
