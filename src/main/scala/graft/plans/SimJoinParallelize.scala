package graft.plans

import graft.functions.{DamerauLevenshtein, JaroWinklerGte, JaroWinklerSim}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Repartition}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: restore parallelism to a similarity theta-join over
  * a SMALL input.
  *
  * A join whose only condition is a similarity predicate (e.g.
  * `ON jaro_winkler(a.s, b.s) >= 0.94`) plans as a broadcast
  * nested-loop join, whose task count equals the STREAMED side's
  * partition count. That is exactly right at scale — a multi-TB scan
  * has thousands of file splits — but a small table is one parquet
  * file, one split, ONE task: the O(N·M) kernel evaluation runs on a
  * single core while the rest of the cluster idles (measured 81 s →
  * ~4 s at sf0.1 for the 12.5M-pair jw self-join). The fix is a
  * round-robin repartition of the streamed side to the default
  * parallelism — and it must be SIZE-GATED: the same shuffle on a
  * large input would move the whole table to win parallelism it
  * already has, so inputs past the size gate keep their natural
  * split-derived partitioning.
  *
  * Scope: inner, non-streaming joins whose condition contains one of
  * the library's similarity expressions and no cross-side equi
  * conjunct (those hash-join; no nested loop to fix). The larger side
  * (the one Spark will stream — it broadcasts the smaller) is wrapped
  * when its estimated size is under the gate; an already-repartitioned
  * child is left alone, which also makes the rule idempotent.
  */
object SimJoinParallelize extends Rule[LogicalPlan] with PredicateHelper {

  /** Small enough that a full round-robin shuffle is trivially cheap
    * and the input plausibly has too few splits to parallelize.
    */
  private val SizeGate = BigInt(256L * 1024 * 1024)

  private def hasSimPredicate(cond: Expression): Boolean = cond.exists {
    case _: JaroWinklerGte     => true
    case _: JaroWinklerSim     => true
    case _: DamerauLevenshtein => true
    case _                     => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.isStreaming && !right.isStreaming &&
          !left.isInstanceOf[Repartition] && !right.isInstanceOf[Repartition] &&
          hasSimPredicate(cond) && !hasCrossEqui(left, right, cond) =>
      val slots = SparkSession.active.sparkContext.defaultParallelism
      val (streamed, streamedIsLeft) =
        if (left.stats.sizeInBytes >= right.stats.sizeInBytes) (left, true)
        else (right, false)
      if (slots <= 1 || streamed.stats.sizeInBytes > SizeGate) j
      else {
        val wrapped = Repartition(slots, shuffle = true, streamed)
        if (streamedIsLeft) j.copy(left = wrapped) else j.copy(right = wrapped)
      }
  }

  private def hasCrossEqui(left: LogicalPlan, right: LogicalPlan,
                           cond: Expression): Boolean = {
    def crossSide(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
  }
}
