package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed [[Aggregator]] — the
  * candidate pass of the two-pass heavy-hitter pattern.
  *
  * State is a ≤ k-entry (item → counter) map per (partition, merge)
  * node, so the exchange carries k rows per upstream partition no
  * matter how large the vocabulary is — the point of the sketch: a
  * plain `groupBy(token)` shuffles the whole vocabulary to find the
  * handful of heavy keys.
  *
  * Guarantee (standard MG): any item with true frequency > N/(k+1)
  * survives in the final state; counters undercount by at most
  * N/(k+1). The candidate SET depends on merge order (Spark partial
  * aggregation is order-nondeterministic), so this sketch is never the
  * query answer by itself — the caller re-counts candidates EXACTLY
  * and filters on the true threshold, which makes the composed result
  * deterministic (supersets of the true heavy hitters differ only in
  * items the exact filter then drops).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None => // decrement-all step; drop zeros
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  /** Mergeable-summaries merge: sum counters, then restore the size
    * bound by subtracting the (k+1)-th largest counter from all (the
    * standard MG merge, Agarwal et al.) and dropping non-positives.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (item, c)) =>
      m.updated(item, m.getOrElse(item, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
