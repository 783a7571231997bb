package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet/CSV: JSON lines, ORC, and raw
  * text. Readers take explicit schemas (no sampling pass, deterministic
  * types at any scale — schema inference over 100 TB is a full extra
  * scan).
  */
object Formats {

  /** Newline-delimited JSON with a pinned schema. Corrupt lines land in
    * NULL rows rather than failing the scan (PERMISSIVE), matching the
    * reference's drop-malformed posture when followed by a null filter.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC round-trip — columnar alternative with the same predicate
    * pushdown/pruning behavior as parquet.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Raw line-oriented text (the reference's WordCount input shape,
    * reference WordCount.java:24): one `value: STRING` column per line.
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Opaque binary files (images/audio/video) as rows — the multimodal
    * ingest path: `path`, `modificationTime`, `length`, `content
    * BINARY`, which [[graft.operators.Multimodal]] then decodes /
    * samples / resizes. `pathGlobFilter` keeps mixed directories
    * ingestable (e.g. `*.png` only); files over
    * `spark.sql.files.maxPartitionBytes` still land in ONE row, so
    * payloads must fit executor memory — exactly the contract a 100 TB
    * media pipeline shards its objects around.
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
}
