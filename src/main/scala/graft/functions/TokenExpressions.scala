package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer.
  *
  * The declarative form — `filter(split(text, "\\s+"), t -> t != "")` —
  * pays a regex engine pass PLUS an interpreted lambda eval per array
  * element (array higher-order functions are CodegenFallback). This
  * expression is one codegen'd byte scan per row emitting the non-empty
  * tokens directly.
  *
  * Semantics are BIT-IDENTICAL to the declarative form: Java's `\s`
  * (no UNICODE_CHARACTER_CLASS) matches exactly the six ASCII bytes
  * {space, 0x09..0x0d}, none of which can occur inside a
  * UTF-8 multi-byte sequence — so a byte-level scan splits at exactly
  * the same boundaries, and skipping empty runs reproduces the
  * `t != ""` filter (including Java split's leading-empty artifact).
  */
object TokenizeOps {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def wsTokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}

/** `ws_tokens(text)` → ARRAY<STRING> of non-empty whitespace-separated
  * tokens.
  */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"
  override protected def nullSafeEval(input: Any): Any =
    TokenizeOps.wsTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizeOps.wsTokens($c);")
  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object TokenFunctions {
  def ws_tokens(c: Column): Column = GraftGlue.column(WsTokens(GraftGlue.expression(c)))
}
