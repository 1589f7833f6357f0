package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: train a merge table on a corpus, encode
  * documents into subword tokens — the real tokenization pass of an LLM
  * data pipeline (token counting, length bucketing, and sequence packing
  * all consume its output).
  *
  * Scale split (the standard trainer architecture, e.g. fastBPE / HF
  * tokenizers): the CORPUS-SIZED work is exactly one distributed
  * word-frequency aggregation (explode + groupBy, map-side combined,
  * output bounded by distinct-word vocabulary, optionally `minCount`-
  * pruned). Merge learning then runs on that bounded frequency table —
  * in-memory on the driver, because a frequency table the merge loop can
  * hold is ~1e6–1e7 (word, count) rows no matter how many petabytes
  * produced it; a 50-round distributed loop over a vocab-sized table
  * would pay 50 shuffles + 50 driver round-trips to process kilobytes.
  * Encoding is embarrassingly parallel: merges broadcast with the task
  * closure (a few KB), applied per word with a per-partition memo cache
  * (natural-text word frequency is Zipfian, so the cache hit rate is
  * ~99% and amortized cost is a hash lookup per word).
  */
object Bpe {

  /** End-of-word marker — a separate terminal symbol, so "low" in
    * "lowest" and "low" as a word learn different merges (the original
    * Sennrich et al. formulation).
    */
  val EndOfWord = "</w>"

  /** One learned merge: at `rank`, adjacent (left, right) become
    * left+right. Lower rank = learned earlier = applied first.
    */
  case class Merge(rank: Int, left: String, right: String)

  case class Vocab(merges: Seq[Merge])

  /** Distributed word-frequency table: the ONLY corpus-sized pass.
    * `minCount` prunes hapax noise (typos, ids) before merge learning —
    * at web scale this cuts the table 10×+ without moving any merge
    * decision that matters.
    */
  def wordCounts(corpus: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame =
    corpus.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Learn `numMerges` merges from a (word, cnt) frequency table.
    * Deterministic: ties on pair count break lexicographically on
    * (left, right), so the same corpus always yields the same vocab on
    * any engine or partitioning.
    *
    * `maxTableRows` is a loud guard, not a silent cap: a frequency table
    * past it means the caller skipped `minCount` pruning.
    */
  def trainFromCounts(counts: DataFrame, numMerges: Int,
      maxTableRows: Long = 10000000L): Vocab = {
    // take(max+1), not collect(): bounds driver memory to the guard even
    // when the caller hands an unpruned web-scale table
    val rows = counts.select(col("word"), col("cnt").cast("long"))
      .take(math.min(maxTableRows + 1, Int.MaxValue.toLong).toInt)
    require(rows.length <= maxTableRows,
      s"word-frequency table exceeds $maxTableRows rows: " +
        "prune with minCount before merge learning")
    // segmentations: word -> (symbols, count); symbols start as characters
    // + the end-of-word terminal
    var segs: Array[(Array[String], Long)] = rows.map { r =>
      (codePointSymbols(r.getString(0)), r.getLong(1))
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties broken lexicographically — deterministic
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += Merge(rank, best._1, best._2)
        segs = segs.map { case (syms, cnt) => (applyMerge(syms, best), cnt) }
        rank += 1
      }
    }
    Vocab(merges.result())
  }

  /** Train end-to-end: one distributed counting pass, then in-memory
    * merge learning.
    */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L): Vocab =
    trainFromCounts(wordCounts(corpus, textCol, minCount), numMerges)

  private def applyMerge(syms: Array[String], m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Initial symbols of a word: one per CODE POINT (not UTF-16 char), so
    * supplementary-plane characters (emoji, CJK-Ext) never split into
    * lone surrogates — a lone-surrogate token is invalid Unicode and
    * breaks the encode-concat identity the moment it hits UTF-8 storage.
    */
  private def codePointSymbols(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length) + 1)
    var i = 0; var j = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      i += Character.charCount(cp); j += 1
    }
    out(j) = EndOfWord
    out
  }

  /** Encode one word: start from characters + terminal, then REPLAY the
    * merge table in rank order, each merge applied with the same greedy
    * left-to-right pass the trainer used ([[applyMerge]]). For any word in
    * the training corpus this reproduces its final training segmentation
    * symbol-for-symbol (encode literally re-runs training on the word),
    * which is what makes the tokenizer a FULL cross-engine oracle: the
    * q90 gate's DuckDB SQL replays the same deterministic
    * (count DESC, pair ASC) merge learning and the same greedy
    * application round by round, and must match bit-for-bit. (The
    * alternative lowest-rank-first application order used by some
    * runtime tokenizers agrees on training-corpus words and differs only
    * on out-of-vocabulary symbol collisions.)
    */
  def encodeWord(word: String, vocab: Vocab): Array[String] = {
    var syms = codePointSymbols(word)
    val it = vocab.merges.iterator
    while (it.hasNext && syms.length > 1) {
      val m = it.next()
      syms = applyMerge(syms, (m.left, m.right))
    }
    syms
  }

  case class Encoded(id: Long, n_words: Long, n_bpe_tokens: Long,
      tokens_head: Array[String])

  /** Encode a document table: per-partition loop with a word→tokens memo
    * (Zipfian word reuse makes encode amortize to a map lookup). Output
    * keeps the full token count and a bounded token prefix rather than
    * the full token array — the count is what length-bucketing/packing
    * consume, and a 100 TB encode writes tokens columnar anyway.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String, vocab: Vocab,
      headTokens: Int = 5): Dataset[Encoded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        rows.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.trim.split("\\s+").filter(_.nonEmpty)
          var nTok = 0L
          val head = scala.collection.mutable.ArrayBuffer.empty[String]
          words.foreach { w =>
            val toks = memo.getOrElseUpdate(w, encodeWord(w, vocab))
            nTok += toks.length
            var i = 0
            while (i < toks.length && head.length < headTokens) {
              head += toks(i); i += 1
            }
          }
          Encoded(id, words.length.toLong, nTok, head.toArray)
        }
      }
  }

  case class EncodedContract(id: Long, n_words: Long, roundtrip_ok: Boolean,
      bounds_ok: Boolean)

  /** Oracle-checkable BPE encode invariants (the q12 contract trick for
    * the one operator whose learned state is inherently engine-internal):
    * per document, (a) decode∘encode is the identity — every word's
    * tokens concatenate back to the word (plus the [[EndOfWord]] marker
    * the symbolizer appends); (b) the token count is bounded by n_words
    * below (≥1 token per word) and the total symbol count above
    * (code points + one EOW per word — merges only ever shrink).
    * n_words itself is exact and recomputed by the oracle, pinning the
    * word-splitting convention.
    */
  def encodeContract(docs: DataFrame, idCol: String, textCol: String,
      vocab: Vocab): Dataset[EncodedContract] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        rows.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.trim.split("\\s+").filter(_.nonEmpty)
          var nTok = 0L
          var nCp = 0L
          var roundtrip = true
          words.foreach { w =>
            val toks = memo.getOrElseUpdate(w, encodeWord(w, vocab))
            nTok += toks.length
            nCp += w.codePointCount(0, w.length).toLong + 1L // + EOW
            if (toks.mkString != w + EndOfWord) roundtrip = false
          }
          EncodedContract(id, words.length.toLong, roundtrip,
            nTok >= words.length && nTok <= math.max(nCp, words.length))
        }
      }
  }
}
