package graft.plans

import org.apache.spark.sql.{Column, GraftGlue, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Optimizer rule: rewrite a naive edit-distance similarity join
  *
  *   SELECT ... FROM a JOIN b ON levenshtein(a.s, b.s) <= k
  *
  * — which Spark can only plan as a (broadcast) nested-loop join, the
  * O(N·M) trap — into the PassJoin segment-blocked plan the library's
  * [[graft.operators.Dedup.editDistanceJoin]] uses: pigeonhole says any
  * string within edit distance k of `s` contains one of `s`'s k+1
  * contiguous segments exactly, starting within ±k of its source
  * position, so an equi-join on (target length, segment index, segment
  * text) with constant ≤(2k+1)²(k+1) per-row fanout finds every
  * candidate, and one exact `levenshtein` per distinct candidate pair
  * verifies. Same result multiset — including rows with NULL / empty /
  * shorter-than-k strings — at index-join cost.
  *
  * Scope: inner joins where some conjunct of the condition is
  * `levenshtein(l, r) <= k` (or `<`, or the flipped `>=`/`>` forms)
  * with 0 ≤ k ≤ 6 and one side's expression per input; remaining
  * conjuncts (`a.id < b.id`, predicates the optimizer pushed into the
  * join, ...) are re-applied as a filter directly on the candidate
  * join, below the pair dedup (they are deterministic functions of
  * the dedup's grouping keys, so the placement is equivalence-
  * preserving and prunes the heavy stages early). Anything else — the
  * 3-arg thresholded levenshtein, outer joins, streaming inputs, a
  * nondeterministic conjunct, map- or float-typed output columns
  * (see [[groupable]]), or a join that ALREADY has an equi conjunct
  * (hash-joinable as-is; also how the library's own PassJoin plans,
  * whose verify filter rides their segment equi-joins, stay
  * untouched) — keeps Spark's own plan. Re-trigger safety: the
  * rewritten subtree's join carries `__graft_edj_`-prefixed working
  * columns, and any join whose inputs expose that prefix is skipped,
  * so the rule cannot fire on its own output even after the optimizer
  * pushes the verify filter back into the blocked join's condition.
  *
  * Installed via `graft.GraftExtensions`
  * (`injectOptimizerRule` → Catalyst's operator-optimization batch, so
  * the rebuilt subtree still gets column pruning / pushdown), or
  * `GraftExtensions.register` on a running session.
  */
object EditDistanceJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Tag = "__graft_edj_"

  /** Extract (levenshtein, k) from the four comparison spellings,
    * normalized to `lev <= k`.
    */
  private def bound(cond: Expression): Option[(Levenshtein, Int)] = cond match {
    case LessThanOrEqual(l: Levenshtein, IntegerLiteral(k))    => Some((l, k))
    case LessThan(l: Levenshtein, IntegerLiteral(k))           => Some((l, k - 1))
    case GreaterThanOrEqual(IntegerLiteral(k), l: Levenshtein) => Some((l, k))
    case GreaterThan(IntegerLiteral(k), l: Levenshtein)        => Some((l, k - 1))
    case _                                                     => None
  }

  /** (left string expr, right string expr, k, remaining conjuncts) of
    * the first rewritable conjunct, if any. A join that already carries
    * an equi conjunct between the sides is NOT rewritten: Spark plans
    * it as a hash/sort-merge join with the levenshtein as an extra
    * condition — there is no nested-loop trap to fix, and rewriting
    * would re-block the library's own PassJoin plans (whose verify
    * filter the optimizer pushes back into their segment equi-joins).
    */
  private def plan(left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression]): Option[(Expression, Expression, Int, Seq[Expression])] = {
    def crossSide(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
    if (hasEqui) return None
    // every conjunct must be deterministic: the rewrite changes row
    // multiplicity mid-plan (segment fanout then dedup), so a
    // nondeterministic conjunct could evaluate on different rows than
    // the original join would have
    if (!conjuncts.forall(_.deterministic)) return None
    conjuncts.zipWithIndex.collectFirst(Function.unlift { case (c, idx) =>
      bound(c) match {
        case Some((Levenshtein(a, b, None), k)) if k >= 0 && k <= 6 =>
          val rest = conjuncts.patch(idx, Nil, 1)
          if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet))
            Some((a, b, k, rest))
          else if (b.references.subsetOf(left.outputSet) &&
                   a.references.subsetOf(right.outputSet))
            Some((b, a, k, rest))
          else None
        case _ => None
      }
    })
  }

  override def apply(plan0: LogicalPlan): LogicalPlan = plan0.transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.isStreaming && !right.isStreaming &&
          groupable(left) && groupable(right) &&
          !left.output.exists(_.name.startsWith(Tag)) &&
          !right.output.exists(_.name.startsWith(Tag)) =>
      plan(left, right, splitConjunctivePredicates(cond)) match {
        case Some((ls, rs, k, rest)) => rewrite(left, right, ls, rs, k, rest)
        case None                    => j
      }
  }

  /** The dedup stages carry every row column through a max() aggregate
    * (see [[SimJoinSupport.dedupOn]]), so every output type must be
    * ORDERABLE — a map-typed (or other unorderable) column keeps
    * Spark's own plan. Note float/double columns are fine: they ride
    * as aggregate INPUTS, not grouping keys, so
    * NormalizeFloatingNumbers never touches them and the rewrite stays
    * bit-exact on -0.0.
    */
  private def groupable(plan: LogicalPlan): Boolean =
    SimJoinSupport.orderableOutput(plan)

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      ls: Expression, rs: Expression, k: Int,
                      rest: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    // segment layout for a window of length L (same convention as
    // Dedup.editDistanceJoin: the first L % (k+1) segments get the
    // extra char)
    def segLen(l: Column, i: Column): Column =
      (floor(l / (k + 1)) + when(i < l % (k + 1), 1).otherwise(0)).cast("int")
    def segStart(l: Column, i: Column): Column =
      (i * floor(l / (k + 1)) + least(i, l % (k + 1))).cast("int")

    // working columns are __graft-prefixed so user schemas can't
    // collide; the pair ids exist only to dedupe multi-segment matches
    // of the same row pair and never reach the output
    val segs = GraftGlue.ofRows(spark, left)
      .withColumn("__graft_edj_idl", monotonically_increasing_id())
      .withColumn("__graft_edj_sl", GraftGlue.column(ls))
      .withColumn("__graft_edj_la",
        length(col("__graft_edj_sl")).cast("int"))
      .withColumn("__graft_edj_i", explode(sequence(lit(0), lit(k))))
      .withColumn("__graft_edj_seg", col("__graft_edj_sl").substr(
        segStart(col("__graft_edj_la"), col("__graft_edj_i")) + 1,
        segLen(col("__graft_edj_la"), col("__graft_edj_i"))))

    val probes = GraftGlue.ofRows(spark, right)
      .withColumn("__graft_edj_idr", monotonically_increasing_id())
      .withColumn("__graft_edj_sr", GraftGlue.column(rs))
      .withColumn("__graft_edj_lr",
        length(col("__graft_edj_sr")).cast("int"))
      .withColumn("__graft_edj_la",
        explode(sequence(col("__graft_edj_lr") - k, col("__graft_edj_lr") + k)))
      .filter(col("__graft_edj_la") >= 0)
      .withColumn("__graft_edj_i", explode(sequence(lit(0), lit(k))))
      .withColumn("__graft_edj_shift", explode(sequence(lit(-k), lit(k))))
      .withColumn("__graft_edj_pos",
        segStart(col("__graft_edj_la"), col("__graft_edj_i")) + col("__graft_edj_shift"))
      .withColumn("__graft_edj_len",
        segLen(col("__graft_edj_la"), col("__graft_edj_i")))
      .filter(col("__graft_edj_pos") >= 0 &&
        col("__graft_edj_pos") + col("__graft_edj_len") <= col("__graft_edj_lr"))
      .withColumn("__graft_edj_seg",
        col("__graft_edj_sr").substr(col("__graft_edj_pos") + 1, col("__graft_edj_len")))

    // ONE dedup stage, at the pair level, via an explicit Aggregate (a
    // Deduplicate node emitted this late in optimization would never
    // be lowered); grouping keys are ONLY the narrow pair identity —
    // the two row ids — duplicates differ only in the segment
    // machinery, so the exprId-pinned max() payload carry is
    // value-deterministic and float-bit-exact; see [[SimJoinSupport]]
    // for why the tail is raw un-reanalyzed Catalyst. Probe-side
    // duplicates (a row's ±shift substrings coinciding, ~75 raw vs
    // ~45 distinct keys) are NOT pre-deduped: that aggregate's groups
    // are near-unique, so its map-side partial collapses nothing and
    // the whole payload-carrying probe frame would cross one EXTRA
    // exchange — measured 28.8 MB vs 8 MB shuffled and +0.5 s at
    // sf0.1 for the wide-payload self-join — while the pair dedup
    // absorbs the extra join multiplicity in its map-side partial.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import SimJoinSupport.{dedupOn, nameAttr, outAttr}

    val joined = segs
      .join(probes, Seq("__graft_edj_la", "__graft_edj_i", "__graft_edj_seg"))
    val joinedPlan = GraftGlue.analyzed(joined)
    // remaining original conjuncts run BELOW the pair dedup: they are
    // deterministic functions of columns the dedup preserves, so
    // filter-then-dedup ≡ dedup-then-filter — and for the canonical
    // self-join shape (`... AND a.id < b.id`) the early filter halves
    // the pair-dedup input and the exact levenshtein verifies only the
    // kept orientation
    val withRest =
      if (rest.isEmpty) joinedPlan else Filter(rest.reduce(And), joinedPlan)
    val slA = nameAttr(joinedPlan, "__graft_edj_sl")
    val srA = nameAttr(joinedPlan, "__graft_edj_sr")
    val deduped = dedupOn(withRest,
      Seq(nameAttr(joinedPlan, "__graft_edj_idl"), nameAttr(joinedPlan, "__graft_edj_idr")),
      Seq(slA, srA) ++ (left.output ++ right.output).map(outAttr(joinedPlan, _)))
    // banded verify: the 3-arg thresholded levenshtein early-exits at
    // k+1 (O(k·n) per pair instead of O(n·m)); result is the distance
    // when ≤ k, -1 otherwise, so `>= 0` is exactly `distance <= k`
    val verified = Filter(
      GreaterThanOrEqual(Levenshtein(slA, srA, Some(Literal(k))), Literal(0)),
      deduped)
    Project(left.output ++ right.output, verified)
  }
}
