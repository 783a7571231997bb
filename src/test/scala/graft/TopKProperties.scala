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
  private val ord = Ordering.by((t: (Double, Long)) => (-t._1, t._2))

  private val rowGen: Gen[(Long, Long, Double)] = for {
    id <- Gen.choose(0L, 50L)
    sim <- Gen.choose(-1.0, 1.0)
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

  property("merge commutative, zero identity") =
    forAll(rowsGen, rowsGen) { (a, b) =>
      val (ba, bb) = (fold(a), fold(b))
      agg.merge(ba, bb) == agg.merge(bb, ba) &&
        agg.merge(agg.zero, ba) == ba.sorted(ord)
    }

  property("merge associative") =
    forAll(rowsGen, rowsGen, rowsGen) { (a, b, c) =>
      val (ba, bb, bc) = (fold(a), fold(b), fold(c))
      agg.merge(agg.merge(ba, bb), bc) == agg.merge(ba, agg.merge(bb, bc))
    }
}
