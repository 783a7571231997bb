package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions through their SQL surface. */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("graft functions are SQL-callable after registration") {
    GraftExtensions.register(spark)

    val sh = spark.sql(
      "SELECT bigram_shingles(array('a','b','c','b','c')) AS sh").collect().head
      .getSeq[String](0)
    assert(sh === Seq("a b", "b c", "c b")) // distinct, first-occurrence order

    val bands = spark.sql(
      "SELECT minhash_bands(array('x','y'), 64, 4) AS b").collect().head
      .getSeq[Long](0)
    assert(bands.length === 16)

    // identical sets intersect fully; simhash of equal token sets matches
    val r = spark.sql(
      """SELECT sorted_intersect_count(sorted_hashes(array('p','q','r')),
                                       sorted_hashes(array('r','q','p'))) AS i,
                simhash64(array('p','q')) = simhash64(array('q','p')) AS same
      """).collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getBoolean(1))
  }

  test("SQL results agree with the Column-API expressions") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql("SELECT simhash64(array('alpha','beta','gamma')) AS s")
      .collect().head.getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.functions.simhash64(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("alpha"),
          org.apache.spark.sql.functions.lit("beta"),
          org.apache.spark.sql.functions.lit("gamma"))).as("s"))
      .collect().head.getLong(0)
    assert(viaSql === viaCol)
  }
}
