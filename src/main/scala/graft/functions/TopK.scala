package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Bounded top-k as a typed [[Aggregator]] — the one fold in this engine
  * a built-in can't express efficiently.
  *
  * A `row_number() OVER (PARTITION BY qid ORDER BY sim DESC)` plan
  * shuffles EVERY scored candidate (k·N rows per query) and sorts each
  * partition before discarding all but k rows. This aggregator keeps a
  * k-bounded buffer per (query, input partition) instead, so the
  * exchange carries at most k rows per query per upstream partition and
  * nothing is ever globally sorted — the standard scale shape for ANN
  * re-ranking (at 100 TB the scored stream is billions of rows; the
  * merged state is k rows per query).
  *
  * Determinism: candidates are totally ordered by (sim DESC, id ASC)
  * over exact float scores, so the result is bit-identical to the
  * window formulation — the DuckDB oracles are unchanged.
  */
class TopKBySim(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[(Double, Long)], Seq[(Long, Long)]] {

  // best-first: higher sim wins, ties broken toward the lower id.
  // NaN sorts FIRST (greatest), matching Spark's descending sort, so a
  // zero-norm embedding (sim = 0/0) ranks identically to the window
  // row_number formulation and the DuckDB oracle. Scala's default
  // Ordering.by(-sim) would sort NaN last instead — hence the explicit
  // compare (Double.compare treats NaN as greater than everything).
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1) // DESC, NaN first
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)], a: (Long, Long, Double)): Seq[(Double, Long)] =
    ((a._3, a._2) +: b).sorted(ord).take(k)

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Long, Long)] =
    b.sorted(ord).zipWithIndex.map { case ((_, id), i) => (id, i + 1L) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** [[TopKBySim]]'s sibling for NEIGHBORHOOD STATS: the same k-bounded
  * (sim DESC, id ASC) fold, finishing as the kept sims in descending
  * order instead of ranked ids — the input to a margin denominator's
  * sequential mean fold. Replaces a
  * `row_number() OVER (PARTITION BY endpoint ORDER BY sim DESC)` +
  * `rn <= k` + collect_list pipeline that exchanged EVERY scored
  * candidate and sorted whole partitions to keep k rows: here the
  * exchange carries at most k sims per endpoint per upstream
  * partition (map-side combine), and nothing is globally sorted.
  * Same total order as TopKBySim (NaN first, ties to the lower id),
  * so the kept k-set — and therefore every downstream double — is
  * bit-identical to the window formulation the DuckDB oracles replay.
  */
class TopSims(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Double]] {

  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1) // DESC, NaN first
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    (a +: b).sorted(ord).take(k)

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[Double] =
    b.sorted(ord).map(_._1)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object TopK {

  /** `(qid, vec_id, sim)` rows → per-qid top-k `(qid, neighbor_id, rnk)`
    * with rank 1 = most similar. Partial aggregation (the k-bounded
    * buffer) happens map-side automatically.
    */
  def perQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("qid"), col("vec_id"), col("sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKBySim(k).toColumn.name("topk"))
      .flatMap { case (qid, ns) => ns.map(n => (qid, n._1, n._2)) }
      .toDF("qid", "neighbor_id", "rnk")
  }
}
