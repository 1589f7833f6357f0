package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.unsafe.types.UTF8String

/** Domain-suffix blocklist membership: true iff the host equals a blocked
  * domain or is a subdomain of one (label-boundary suffixes only —
  * `ads.example.com` matches a block on `example.com`, `notexample.com`
  * does not). The per-row cost is one hash lookup per host label (≤ ~8),
  * independent of blocklist size, versus the O(|blocklist|) scan an
  * `array_contains` over a literal list would pay — the difference between
  * a usable and unusable filter at a 10^6-entry blocklist.
  *
  * The blocklist rides the expression as a reference object (broadcast
  * semantics, like the centroid tables in [[TopCentroids]]): curation
  * blocklists are a few MB — driver-collected metadata, not data. Past
  * broadcast scale, compose the bloom-prefilter + exact-confirm shape of
  * `Dedup.novelAgainst` instead.
  *
  * Contract: the probed host must already be lowercase — `WebText.urlHost`
  * emits it that way; only the blocklist side is normalized here.
  */
case class DomainBlocked(child: Expression, domains: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  // built once on the driver, shipped with the (serializable) expression
  private val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, domains.length * 2))
    domains.foreach(d => s.add(d.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[UTF8String].toString
    var blocked = set.contains(h)
    var idx = h.indexOf('.')
    while (!blocked && idx >= 0) {
      blocked = set.contains(h.substring(idx + 1))
      idx = h.indexOf('.', idx + 1)
    }
    java.lang.Boolean.valueOf(blocked)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, host => {
      val setRef = ctx.addReferenceObj("blockset", set, "java.util.HashSet")
      val h = ctx.freshName("h")
      val idx = ctx.freshName("idx")
      s"""
         |String $h = $host.toString();
         |${ev.value} = $setRef.contains($h);
         |int $idx = $h.indexOf('.');
         |while (!${ev.value} && $idx >= 0) {
         |  ${ev.value} = $setRef.contains($h.substring($idx + 1));
         |  $idx = $h.indexOf('.', $idx + 1);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DomainBlocked = copy(child = c)
  override def prettyName: String = "domain_blocked"
}

/** Content-term blocklist membership: true iff any whitespace-delimited
  * token of the text, lowercased, is in the blocked-word set — the
  * C4/Dolma-style "bad words" content filter. Same cost shape as
  * [[DomainBlocked]]: one hash probe per token, independent of list size,
  * with the list riding as a broadcast-class reference object. The walk
  * is a single char scan of the text with one substring + lowercase per
  * token probed (no regex, no split array) — short-circuiting on the
  * first hit.
  */
case class TokenBlocked(child: Expression, words: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  private val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, words.length * 2))
    words.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(TokenBlocked.anyBlocked(
      input.asInstanceOf[UTF8String].toString, set))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val setRef = ctx.addReferenceObj("wordset", set, "java.util.HashSet")
      s"${ev.value} = graft.functions.TokenBlocked.anyBlocked($text.toString(), $setRef);"
    })

  override protected def withNewChildInternal(c: Expression): TokenBlocked = copy(child = c)
  override def prettyName: String = "token_blocked"
}

object TokenBlocked {
  /** Single pass over the text: walk whitespace-delimited tokens, probe
    * the set with each token lowercased. Shared by eval and codegen.
    *
    * Token boundaries: the Java-regex `\s` class (so the ASCII range
    * behaves EXACTLY like the pipeline's `\s+` tokenization and the q101
    * oracle -- note `Character.isWhitespace` would NOT: it also accepts
    * U+001C-U+001F, which `\s` and DuckDB keep inside tokens) PLUS the
    * Unicode space/line/paragraph separators (`Character.isSpaceChar`:
    * U+00A0, U+2000-200A, U+2028/29, U+202F, U+3000, ... = the Z*
    * categories, which the q101 oracle mirrors as RE2 `[\s\p{Z}]+` so
    * both engines tokenize identically even on exotic fixtures). For a
    * blocklist, extra boundaries only ADD probe tokens, closing the
    * hide-a-bad-word-behind-a-Unicode-space evasion. Documented trade:
    * a blocklist ENTRY containing such a separator can never match --
    * entries are single tokens by contract.
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' ||
      c == '\r' || Character.isSpaceChar(c)

  def anyBlocked(text: String, set: java.util.HashSet[String]): Boolean = {
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(text.charAt(i))) i += 1
      if (i > start &&
          set.contains(text.substring(start, i).toLowerCase(java.util.Locale.ROOT)))
        return true
    }
    false
  }
}

object domains {
  def domain_blocked(host: Column, blocklist: Seq[String]): Column =
    bridge.column(DomainBlocked(bridge.expression(host), blocklist.toArray))
  def token_blocked(text: Column, blocklist: Seq[String]): Column =
    bridge.column(TokenBlocked(bridge.expression(text), blocklist.toArray))
}
