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

/** BPE-ish pre-tokenizer counting: one scan computing the number of
  * `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]` matches (n_bpeish) and of `[0-9]+`
  * matches (n_numeric) — replaces three regexp_extract_all passes.
  * Symbol matches count per CODEPOINT (lead bytes; continuation bytes
  * skipped), which is the regex oracle's RE2 semantics.
  */
object BpeishOps {
  /** Packed counts: (n_bpeish << 32) | n_numeric — both fit 32 bits for
    * any realistic document.
    */
  def count(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    var bpeish = 0L
    var numeric = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
        while (i < n && ((b(i) >= 'a' && b(i) <= 'z') || (b(i) >= 'A' && b(i) <= 'Z'))) i += 1
        bpeish += 1
      } else if (c >= '0' && c <= '9') {
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
        bpeish += 1
        numeric += 1
      } else if (c == 0x20 || (c >= 0x09 && c <= 0x0d)) {
        i += 1
      } else {
        // one symbol per codepoint: skip the lead byte + continuations
        i += 1
        while (i < n && (b(i) & 0xc0) == 0x80) i += 1
        bpeish += 1
      }
    }
    (bpeish << 32) | numeric
  }
}

/** `bpeish_counts(text)` → BIGINT packing (n_bpeish << 32) | n_numeric. */
case class BpeishCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpeish_counts"
  override protected def nullSafeEval(input: Any): Any =
    BpeishOps.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeishOps.count($c);")
  override protected def withNewChildInternal(newChild: Expression): BpeishCounts =
    copy(child = newChild)
}

object TokenFunctions {
  def ws_tokens(c: Column): Column = GraftGlue.column(WsTokens(GraftGlue.expression(c)))
  def bpeish_counts(c: Column): Column = GraftGlue.column(BpeishCounts(GraftGlue.expression(c)))
}
