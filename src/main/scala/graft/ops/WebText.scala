package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text extraction and normalization — the stage between a raw
  * crawl and the document table every other curation operator consumes
  * (reference analog: payload interpretation of the opaque `Data []byte`
  * blobs, `internal/broker/queue/queue.go:15-19`, lifted to typed columns
  * per SURVEY §1.3).
  *
  * Scale shape: every operator here is a per-row projection built from
  * codegen'd string built-ins (`regexp_replace`/`split`/`lower`) — zero
  * shuffles, pushdown-transparent, and linear in corpus bytes. At 100 TB
  * these run in the same scan pass as quality filtering; nothing is
  * collected or broadcast.
  */
object WebText {

  /** Extract readable text from an HTML payload:
    *   1. drop non-content element BODIES (script/style) and comments —
    *      their text is code, not prose;
    *   2. strip every remaining tag to a space (so `<p>a</p><p>b</p>`
    *      keeps a word boundary between a and b);
    *   3. unescape the HTML entities that survive in running text
    *      (`&nbsp; &lt; &gt; &quot; &#39;` first, `&amp;` LAST so
    *      double-escaped text unescapes exactly one level);
    *   4. collapse whitespace runs and trim.
    *
    * Regex subset is deliberately RE2-safe (no lookaround, no
    * backreferences in patterns) so the same patterns run on any engine.
    */
  def htmlExtract(html: Column): Column = {
    // (?i): legacy pages upper-case tags — a case-sensitive match would
    // leave '<SCRIPT>' bodies in the "readable text"
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val unescaped = entities.foldLeft(noTags) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Canonicalize a URL for dedup/grouping: two crawls of the same page
    * under cosmetically different URLs must collapse to one key.
    *   - drop the fragment (`#…` — client-side only);
    *   - lowercase scheme+host (path/query stay case-sensitive per RFC);
    *   - drop default ports (`:80`, `:443`) and a leading `www.`;
    *   - drop tracking params (`utm_*`), sort the survivors (param order
    *     is not semantic), drop an empty query and a trailing slash.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme://host[:port] — lowercased; path and query preserved
    val prefix = lower(regexp_extract(noFrag, "^([^/?]*//[^/?]*)", 1))
    val rest = regexp_replace(noFrag, "^[^/?]*//[^/?]*", "")
    // default-port stripping is scheme-conditional: http://host:443 is a
    // REAL non-default origin and must keep its port
    val prefixNoPort = regexp_replace(
      regexp_replace(prefix, "^(https://[^:/?]*):443$", "$1"),
      "^(http://[^:/?]*):80$", "$1")
    val prefixNoWww = regexp_replace(prefixNoPort, "^(https?://)www\\.", "$1")
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/$", "")
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    // strip utm_* pairs: two passes cover adjacent params (a consumed
    // separator can't also start the next match in one pass)
    val q1 = regexp_replace(query, "(^|&)utm_[^&]*", "$1")
    val q2 = regexp_replace(q1, "(^|&)utm_[^&]*", "$1")
    val qTrim = regexp_replace(regexp_replace(q2, "&&+", "&"), "^&+|&+$", "")
    val qSorted = array_join(array_sort(split(qTrim, "&")), "&")
    concat(prefixNoWww, path,
      when(qSorted === "", lit("")).otherwise(concat(lit("?"), qSorted)))
  }

  /** Host of a URL: the authority component, lowercased, with userinfo
    * and port stripped — the key domain-level curation rules match on.
    */
  def urlHost(url: Column): Column = {
    val auth = regexp_extract(url, "^[^/?#]*//([^/?#]*)", 1)
    // Scheme-less crawl URLs ("example.com/page") carry the host as the
    // prefix up to the first /, ? or #. Without this fallback the extracted
    // host is empty and filterBlockedDomains silently KEEPS the row — a
    // quiet blocklist bypass in a safety-critical filter.
    val bare = regexp_extract(url, "^([^/?#]*)", 1)
    val host = when(auth === "", bare).otherwise(auth)
    lower(regexp_replace(regexp_replace(host, "^[^@]*@", ""), ":[0-9]+$", ""))
  }

  /** True iff `host` is a blocked domain or a subdomain of one (label
    * boundaries only). One hash probe per host label via
    * [[graft.functions.DomainBlocked]] — per-row cost independent of
    * blocklist size; the list itself is broadcast-class metadata.
    */
  def isBlockedDomain(host: Column, blocklist: Seq[String]): Column =
    graft.functions.domains.domain_blocked(host, blocklist)

  /** Drop every row whose URL's host falls under a blocked domain — the
    * crawl-hygiene filter (spam/adult/malware domain lists) that runs in
    * the same scan pass as the other per-row quality rules: a pure
    * codegen'd predicate, zero shuffles, pushdown-transparent.
    */
  def filterBlockedDomains(df: org.apache.spark.sql.DataFrame, urlCol: Column,
      blocklist: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(!isBlockedDomain(urlHost(urlCol), blocklist))

  /** True iff any whitespace token of `text`, lowercased, is in the
    * blocked-term list — the C4/Dolma "bad words" content filter. One
    * hash probe per token via [[graft.functions.TokenBlocked]]; per-row,
    * zero shuffles, cost independent of list size.
    */
  def hasBlockedTerm(text: Column, blocklist: Seq[String]): Column =
    graft.functions.domains.token_blocked(text, blocklist)

  /** Drop every row whose text contains a blocked term — runs in the same
    * scan pass as the other per-row quality rules.
    */
  def filterBlockedTerms(df: org.apache.spark.sql.DataFrame, textCol: Column,
      blocklist: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(!hasBlockedTerm(textCol, blocklist))

  /** Fraction of whitespace tokens that are on the blocklist
    * (case-insensitive whole-token match) — the SCORE form of the binary
    * [[hasBlockedTerm]] filter: C4 dropped pages on any hit, Dolma-style
    * pipelines publish the fraction as a tagger and let the mix decide
    * the threshold. Empty/whitespace-only text scores 0. Built entirely
    * from codegen'd array HOFs (`filter` + `lower` + `IN`), so the
    * whole-token semantics replay verbatim in the q150 oracle —
    * tokenization is the pipeline's standard `\s+` split, NOT
    * [[hasBlockedTerm]]'s extended Unicode-separator walk (the filter
    * hunts evasion; the score describes the corpus).
    */
  def blockedTermScore(text: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "blockedTermScore needs a non-empty blocklist")
    val lc = blocklist.map(_.toLowerCase(java.util.Locale.ROOT))
    val ws = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    val flagged = size(filter(ws, w => lower(w).isInCollection(lc)))
    flagged.cast("double") / greatest(size(ws), lit(1)).cast("double")
  }

  /** Keep the FIRST occurrence of each distinct paragraph within a
    * document, preserving order — the intra-document repetition removal
    * (boilerplate headers, repeated nav blocks) that runs before
    * corpus-level dedup. Element i survives iff it is its paragraph's
    * first position (`array_position` = first 1-based index).
    */
  def dedupParagraphs(text: Column): Column = {
    val paras = split(text, "\n\n")
    val kept = filter(paras, (p: Column, i: Column) =>
      array_position(paras, p) === i.cast("long") + 1L)
    array_join(kept, "\n\n")
  }

  /** Paragraph count of a text (split on blank-line boundaries). */
  def paragraphCount(text: Column): Column =
    size(split(text, "\n\n")).cast("long")

  /** PII patterns for [[maskPii]]/[[piiCount]]: (kind, regex, replacement).
    * The regexes live in the Java-regex ∩ RE2 shared subset (no
    * lookaround, no backreferences — the file's standing discipline), so
    * the q149 oracle replays masking and counting verbatim in DuckDB.
    * Deliberately CONSERVATIVE (the curation convention: mask what is
    * unambiguously PII-shaped, don't chase recall with fragile patterns):
    * emails need a word-char local part and an alphabetic TLD; phones
    * need an international `+` prefix (unprefixed digit runs are years,
    * ids, quantities far more often than phone numbers); IPs are dotted
    * quads with word boundaries. Masking order is the list order — email
    * first, so an address's digits are never half-eaten by the phone or
    * IP pass.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\+\\d[\\d\\- ]{7,}\\d", "[PHONE]"),
    ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"))

  private def piiPattern(kind: String): String =
    PiiPatterns.find(_._1 == kind).map(_._2).getOrElse(
      throw new IllegalArgumentException(
        s"unknown PII kind '$kind'; known: ${PiiPatterns.map(_._1).mkString(", ")}"))

  /** Replace PII occurrences with typed placeholder tokens — the
    * RefinedWeb/Dolma-style scrub that runs between extraction and
    * everything downstream (a near-dup or n-gram pass over unmasked
    * emails would happily treat them as high-signal rare tokens). Pure
    * per-row `regexp_replace` chain: codegen'd, zero shuffles, linear in
    * corpus bytes — rides the same scan pass as the quality rules.
    */
  def maskPii(text: Column,
      kinds: Seq[String] = PiiPatterns.map(_._1)): Column = {
    kinds.foreach(piiPattern) // validate every kind loudly up front
    // canonical PiiPatterns order regardless of how the caller lists
    // kinds — masking order is part of the operator's contract
    PiiPatterns.filter(p => kinds.contains(p._1)).foldLeft(text) {
      case (c, (_, re, tok)) => regexp_replace(c, re, tok)
    }
  }

  /** Number of matches of one PII kind in `text` (counted on the UNMASKED
    * text — the dataset-card statistic published next to the scrub).
    */
  def piiCount(text: Column, kind: String): Column =
    size(regexp_extract_all(text, lit(piiPattern(kind)), lit(0))).cast("long")
}
