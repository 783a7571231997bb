package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Layout-aware parquet sinks — the write half of a 100 TB pipeline.
  *
  * Partition columns become directory levels (downstream readers prune
  * whole directories for free), and rows are clustered inside each file
  * by the sort key so min/max row-group statistics make point/range
  * scans skip pages. The repartition-on-partition-columns step bounds
  * the writer-task × partition fanout: without it every task holds an
  * open file per output partition (the classic small-files explosion).
  */
object Sinks {

  /** Partitioned + clustered parquet write. */
  def writePartitioned(
      df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Reference-style tab-separated KV text sink lives in [[Csv.writeKv]]. */
}
