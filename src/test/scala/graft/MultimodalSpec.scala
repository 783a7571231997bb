package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("multimodal metadata: stub decode is deterministic over the byte payload") {
    val rows = Multimodal.multimodalMeta(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val n = Fixtures.DocA.getBytes("UTF-8").length.toLong
    assert(rows(0L)._1 === n)
    assert(rows(0L) === rows(1L)) // identical payload → identical meta
    // checksum recomputed independently of the operator's code path
    val expect = Fixtures.DocA.getBytes("UTF-8")
      .foldLeft(1L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    assert(rows(0L)._5 === expect)
    assert(rows(0L)._5 !== rows(4L)._5) // permutation: different byte order
  }
}
