package graft.plans

import graft.functions.{JaroWinklerGte, JaroWinklerSim}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType}

/** Optimizer rule: fuse a Jaro-Winkler threshold predicate
  *
  *   ... WHERE / ON  jaro_winkler(a, b) >= t
  *
  * into the single boolean [[JaroWinklerGte]] kernel, which rejects
  * infeasible pairs from the two length fields in O(1) and aborts the
  * O(n·window) matching phase as soon as the remaining characters
  * cannot reach the match count t requires — the decision is
  * bit-identical to scoring then comparing (both short-circuits carry
  * slack so floating error only widens them; survivors run the exact
  * arithmetic). Null semantics are unchanged: score-null (either input
  * null) and comparison-null coincide with the fused kernel's null.
  *
  * This — not join blocking — is the honest optimization for jw
  * predicates. A SOUND candidate generator for jw ≥ t can use only
  * what the score bounds: length ratio and character-multiset overlap
  * (Jaro's matching window spans half the string, so no positional or
  * substring structure survives adversarial-but-valid inputs like
  * rotations, which defeat first-character blocking, or heavily
  * transposed anagrams, which defeat PassJoin-style segment blocking —
  * jw ≥ 0.94 still admits edit distance ≈ 0.6·n). Measured on the
  * documents corpus at sf0.1, a k-extended PPJoin prefix filter over
  * (codepoint, occurrence) tokens — provably sound — generated 285M
  * candidate join rows for 12.5M total pairs, because any two English
  * 64-char windows already share ≥ 70% of their character multiset:
  * the blocked plan ran 70× SLOWER than the codegen'd nested loop it
  * replaced. Character content does not discriminate natural text;
  * position does, and jaro's window discards it. So the nested loop
  * (linear scans, no shuffle, perfectly parallel) plus this fused
  * kernel is the right plan for a jw-only theta join, and sub-quadratic
  * JW entity resolution belongs to candidates-from-LSH + jw scoring —
  * the shipped `er_jaro_winkler` path.
  *
  * Installed via `graft.GraftExtensions`.
  */
object JaroWinklerThresholdRewrite extends Rule[LogicalPlan] {

  private object Thresh {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType)      => Some(v)
      case Literal(d: Decimal, _: DecimalType) => Some(d.toDouble)
      case _                                   => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(j: JaroWinklerSim, Thresh(t)) =>
        JaroWinklerGte(j.left, j.right, t, strict = false)
      case GreaterThan(j: JaroWinklerSim, Thresh(t)) =>
        JaroWinklerGte(j.left, j.right, t, strict = true)
      case LessThanOrEqual(Thresh(t), j: JaroWinklerSim) =>
        JaroWinklerGte(j.left, j.right, t, strict = false)
      case LessThan(Thresh(t), j: JaroWinklerSim) =>
        JaroWinklerGte(j.left, j.right, t, strict = true)
    }
}
