package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality instrumentation via the Observation API:
  * metrics piggyback on whatever action consumes the frame — NO extra
  * pass over the data, which at 100 TB is the difference between
  * "quality metrics" and "double the bill". The returned Observation
  * yields its row/null/distinct-ish counts after the first action.
  */
object Quality {

  /** Attach row count + per-column null counts to a frame. */
  def observed(df: DataFrame, name: String, cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics =
      count(lit(1)).as("n_rows") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
