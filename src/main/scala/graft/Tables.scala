package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the harness testdata (TESTDATA.md).
  *
  * The reference engine (vivekisreddy/MapReducer-PI-cs4433) reads
  * line-oriented CSV with per-mapper header/malformed-row handling
  * (e.g. reference TaskA.java:25-36). Here the source of record is typed
  * parquet, so schema is carried by the files; Catalyst gets column
  * pruning + predicate pushdown into the scan for free.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
