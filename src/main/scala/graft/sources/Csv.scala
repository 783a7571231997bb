package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Reference-style CSV sources (SURVEY.md §2.1 S1, §2.2 P2/P3, §2.1 S4).
  *
  * The reference reads header-bearing CSV with three hand-rolled
  * per-mapper mechanisms: a stateful first-line skip (reference
  * TaskA.java:25-28), `startsWith(header)` prefix tests
  * (TaskD.java:35), and field-count / parse guards that silently drop
  * malformed rows (TaskA.java:34-36, TaskG.java:57-59). Here all three
  * collapse into the declarative reader contract: explicit schema (no
  * runtime inference — deterministic types at any scale),
  * `header=true`, and `DROPMALFORMED` (wrong arity, unparseable
  * numerics/timestamps → row dropped, exactly the reference's
  * behavior). Schema lives with the reader, so Catalyst still gets
  * column pruning + filter pushdown into the scan.
  */
object Csv {

  val pagesSchema: StructType = StructType(Seq(
    StructField("PersonID", LongType, nullable = false),
    StructField("Name", StringType),
    StructField("Nationality", StringType),
    StructField("CountryCode", StringType),
    StructField("Hobby", StringType)))

  val friendsSchema: StructType = StructType(Seq(
    StructField("FriendRel", LongType, nullable = false),
    StructField("PersonID", LongType, nullable = false),
    StructField("MyFriend", LongType, nullable = false),
    StructField("DateOfFriendship", DateType),
    StructField("Desc", StringType)))

  val accessLogsSchema: StructType = StructType(Seq(
    StructField("AccessID", LongType, nullable = false),
    StructField("ByWho", LongType, nullable = false),
    StructField("WhatPage", LongType, nullable = false),
    StructField("TypeOfAccess", StringType),
    StructField("AccessTime", TimestampType)))

  /** Header-skipping, malformed-dropping CSV read with an explicit
    * schema. Timestamp format matches the reference's
    * `yyyy-MM-dd HH:mm:ss` (reference TaskG.java:18).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)

  def pages(spark: SparkSession, path: String): DataFrame =
    read(spark, path, pagesSchema)

  def friends(spark: SparkSession, path: String): DataFrame =
    read(spark, path, friendsSchema)

  def accessLogs(spark: SparkSession, path: String): DataFrame =
    read(spark, path, accessLogsSchema)

  /** Reference-style text KV sink (`key \t value` lines, reference
    * TaskA.java:68 TextOutputFormat) — tab-separated CSV, no header.
    */
  def writeKv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)
}
