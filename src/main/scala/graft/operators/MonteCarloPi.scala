package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Monte-Carlo π estimation — the workload named by the reference repo
  * (MapReducer-**PI**; no PI code actually exists in the reference tree,
  * see SURVEY.md §0) and the classic Spark RDD example.
  *
  * Deterministic: each partition gets its own RNG seeded by
  * seed ⊕ partitionId, and the partition count is pinned — the result is
  * identical across runs and cluster sizes. The per-partition loop is
  * the one place imperative RDD code beats a DataFrame: no row objects,
  * just a counter.
  */
object MonteCarloPi {

  val Seed = 0xC0FFEEL
  val Samples = 4000000L
  val Partitions = 64

  def estimate(spark: SparkSession, n: Long = Samples, parts: Int = Partitions): (Long, Long) = {
    val per = n / parts
    val inside = spark.sparkContext
      .parallelize(0 until parts, parts)
      .map { pid =>
        val rng = new java.util.Random(Seed ^ pid.toLong)
        var in = 0L
        var i = 0L
        while (i < per) {
          val x = rng.nextDouble() * 2 - 1
          val y = rng.nextDouble() * 2 - 1
          if (x * x + y * y <= 1.0) in += 1
          i += 1
        }
        in
      }
      .reduce(_ + _)
    (per * parts, inside)
  }

  /** One-row result frame: (n_samples, n_inside, pi_estimate). Seeded →
    * no SQL oracle needed; determinism is asserted in the test suite.
    */
  def piMontecarlo(spark: SparkSession, dir: String): DataFrame = {
    val (n, inside) = estimate(spark)
    import spark.implicits._
    Seq((n, inside, 4.0 * inside / n)).toDF("n_samples", "n_inside", "pi_estimate")
  }
}
