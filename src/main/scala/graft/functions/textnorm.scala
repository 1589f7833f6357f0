package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization expressions. Spark has no built-in
  * normalization function, yet corpus dedup NEEDS one: the same word in
  * composed (é = U+00E9) and decomposed (e + U+0301) form hashes to two
  * different fingerprints, so visually identical documents survive exact
  * dedup. Both expressions are deterministic per-row string maps —
  * shuffle-free, linear, and safe anywhere a built-in string function is.
  * (CodegenFallback: the JDK Normalizer call dominates; ASCII fast paths
  * below skip it entirely for the overwhelmingly common case.)
  */

/** Canonical composition (Unicode NFC) of a string — the canonical form
  * to fingerprint/dedup on. ASCII input (the bulk of an English corpus)
  * short-circuits without allocating.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    // ASCII (all bytes < 0x80) is already NFC — skip the JDK round-trip.
    if (isAscii(s)) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** Accent folding: canonical decomposition (NFD), then drop combining
  * marks (Unicode categories Mn, Mc, Me — the full Mark class, matching
  * utf8proc's STRIPMARK that DuckDB's `strip_accents` is built on) —
  * é→e, ç→c, ñ→n. Iterates by code point so supplementary-plane marks
  * are stripped too.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var hasHigh = false
    val n = s.numBytes()
    var i = 0
    while (i < n && !hasHigh) {
      if ((s.getByte(i) & 0x80) != 0) hasHigh = true
      i += 1
    }
    if (!hasHigh) s // ASCII carries no accents
    else {
      val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var j = 0
      while (j < nfd.length) {
        val cp = nfd.codePointAt(j)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
        j += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
  override def prettyName: String = "strip_accents"
}

/** Column-level wrappers. */
object textnorm {
  def nfc_normalize(s: Column): Column = bridge.column(NfcNormalize(bridge.expression(s)))
  def strip_accents(s: Column): Column = bridge.column(StripAccents(bridge.expression(s)))
}
