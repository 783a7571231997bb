package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import graft.functions.WsTokens

/** Optimizer rule: rewrite the declarative whitespace-tokenize idiom
  *
  *   filter(split(text, '\s+'), t -> t != '')
  *
  * into the native [[WsTokens]] expression — same result (see its
  * scaladoc for the byte-level equivalence argument), one codegen'd
  * scan instead of a regex pass plus an interpreted per-element lambda.
  * Installed via `graft.GraftExtensions`, so USER-written SQL/DataFrame
  * code gets the fast path without knowing the native function exists —
  * the pattern Catalyst extension rules are for.
  */
object TokenRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayFilter(
            StringSplit(text, Literal(re, StringType), Literal(-1, _)),
            LambdaFunction(
              Not(EqualTo(v: NamedLambdaVariable, Literal(empty, StringType))),
              Seq(v2: NamedLambdaVariable), _))
          if re != null && re.toString == "\\s+" &&
            empty != null && empty.toString == "" && v.exprId == v2.exprId =>
        WsTokens(text)
    }
}
