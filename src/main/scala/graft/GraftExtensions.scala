package graft

import org.apache.spark.sql.{GraftGlue, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** SQL-surface registration of the graft native expressions.
  *
  * Config-time (new sessions):
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * after which `SELECT simhash64(tokens), minhash_bands(sh, 64, 4) ...`
  * parse like built-ins. [[GraftExtensions.register]] installs the same
  * builders on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.HashOps", name),
        builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an INT literal, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (args => SimHash64(args.head)),
    "bigram_shingles" -> (args => BigramShingles(args.head)),
    "sorted_hashes" -> (args => SortedHashes(args.head)),
    "sorted_intersect_count" -> (args => SortedIntersectCount(args(0), args(1))),
    "dot_product" -> (args => ArrayDotProduct(args(0), args(1))),
    "minhash_bands" -> (args => MinHashBands(
      args.head,
      intLit(args(1), "minhash_bands", 1),
      intLit(args(2), "minhash_bands", 2))),
  )

  /** Install the graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      GraftGlue.registerRuntimeFunction(spark, name, builder)
    }
}
