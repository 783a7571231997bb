package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TokenizeOps

/** ws_tokens must be BIT-EQUAL to the declarative
  * `split(text, "\\s+") filtered non-empty` on arbitrary input — that
  * equivalence is what licenses the TokenRewrite optimizer rule and the
  * oracle parity of every tokenizing query.
  */
object TokenizeProperties extends Properties("TokenizeOps") {

  // strings mixing words, all six Java-\s whitespace chars, and
  // multi-byte unicode (including non-ASCII spaces that \s must NOT split)
  private val piece: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
    Gen.oneOf("héllo", "日本語", "a b", "emoji🙂", ""))
  private val textGen: Gen[String] = Gen.listOf(piece).map(_.mkString)

  private def viaSplit(s: String): Seq[String] =
    s.split("\\s+").toSeq.filter(_ != "")

  private def viaNative(s: String): Seq[String] = {
    val arr = TokenizeOps.wsTokens(UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("equals split+filter on arbitrary text") =
    forAll(textGen) { s => viaNative(s) == viaSplit(s) }

  property("idempotent: tokens of a joined token list are the tokens") =
    forAll(textGen) { s =>
      val t = viaNative(s)
      viaNative(t.mkString(" ")) == t
    }

  property("bpeish_counts equals the regex formulation") =
    forAll(textGen) { s =>
      val packed = graft.functions.BpeishOps.count(UTF8String.fromString(s))
      val viaRegex =
        "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r.findAllIn(s).length
      val numericViaRegex = "[0-9]+".r.findAllIn(s).length
      // NOTE: supplementary-plane chars count 2 under Java regex (code
      // units) but 1 natively (codepoints, = the RE2 oracle); the
      // generator stays in the BMP so both agree here.
      (packed >>> 32) == viaRegex && (packed & 0xffffffffL) == numericViaRegex
    }
}
