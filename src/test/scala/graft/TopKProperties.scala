package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.TopKBySim

/** Aggregator laws for the bounded top-k fold. Spark may split input
  * rows across ANY partitioning and merge buffers in ANY tree shape —
  * the result must not depend on it. These properties pin that: merge
  * is commutative/associative with `zero` as identity, and any split
  * of the input through reduce+merge equals a global sort's top-k.
  */
object TopKProperties extends Properties("TopKBySim") {

  private val k = 5
  private val agg = new TopKBySim(k)
  // NaN-aware model ordering: NaN first (greatest), matching Spark's
  // DESC sort — Double.compare, not Ordering.by(-sim).
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  private val rowGen: Gen[(Long, Long, Double)] = for {
    id <- Gen.choose(0L, 50L)
    sim <- Gen.frequency(
      9 -> Gen.choose(-1.0, 1.0),
      1 -> Gen.const(Double.NaN)) // zero-norm embedding: sim = 0/0
  } yield (0L, id, sim)

  private val rowsGen = Gen.listOf(rowGen)

  private def fold(rows: Seq[(Long, Long, Double)]): Seq[(Double, Long)] =
    rows.foldLeft(agg.zero)(agg.reduce)

  private def expected(rows: Seq[(Long, Long, Double)]): Seq[(Long, Long)] =
    rows.map(r => (r._3, r._2)).sorted(ord)
      .take(k).zipWithIndex.map { case ((_, id), i) => (id, i + 1L) }

  property("split+merge equals global top-k") =
    forAll(rowsGen, Gen.choose(0, 100)) { (rows, cut) =>
      val (l, r) = rows.splitAt(cut % (rows.length + 1))
      agg.finish(agg.merge(fold(l), fold(r))) == expected(rows)
    }

  // Scala's numeric == makes NaN != NaN even boxed in tuples — compare
  // buffers by bit pattern so identical NaN entries count as equal.
  private def bits(b: Seq[(Double, Long)]): Seq[(Long, Long)] =
    b.map { case (s, id) => (java.lang.Double.doubleToLongBits(s), id) }

  property("merge commutative, zero identity") =
    forAll(rowsGen, rowsGen) { (a, b) =>
      val (ba, bb) = (fold(a), fold(b))
      bits(agg.merge(ba, bb)) == bits(agg.merge(bb, ba)) &&
        bits(agg.merge(agg.zero, ba)) == bits(ba.sorted(ord))
    }

  property("merge associative") =
    forAll(rowsGen, rowsGen, rowsGen) { (a, b, c) =>
      val (ba, bb, bc) = (fold(a), fold(b), fold(c))
      bits(agg.merge(agg.merge(ba, bb), bc)) == bits(agg.merge(ba, agg.merge(bb, bc)))
    }
}
