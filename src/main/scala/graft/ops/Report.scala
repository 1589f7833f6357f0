package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus reporting — the "dataset card" numbers a curation run publishes
  * alongside its output: per-source volume, token budget, duplication
  * rate, and quality pass-rate in one DataFrame.
  *
  * Scale shape: one pass, one shuffle. Every signal is computed per-row
  * inside the scan (token count, fingerprint, quality flag) and reduced by
  * a single per-source aggregation; the distinct-fingerprint count uses
  * the aggregation's own map-side partials. All outputs are integers —
  * exact, engine-portable, and safe to diff between runs (a float mean
  * would make two identical corpora report "differently" across engines).
  */
object Report {

  /** Per-source corpus statistics:
    * (source, n_docs, total_tokens, max_tokens, n_unique_fp, n_dup_docs,
    * n_quality_keep).
    *
    *   - `n_unique_fp` counts distinct whitespace-normalized content
    *     fingerprints — `n_docs - n_unique_fp` is the exact-dup overhang;
    *   - `n_quality_keep` applies the same length/diversity/token-length
    *     rules as the q71 quality filter, so the report's pass-rate is THE
    *     pipeline's pass-rate, not a reimplementation that can drift.
    */
  def perSource(docs: DataFrame, sourceCol: Column, textCol: Column): DataFrame =
    docs.select(sourceCol.as("source"),
        TextAnalysis.tokenCount(textCol).cast("long").as("nt"),
        TextAnalysis.fingerprint(textCol).as("fp"),
        when(TextAnalysis.qualityKeep(textCol), 1L).otherwise(0L).as("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        max(col("nt")).as("max_tokens"),
        countDistinct(col("fp")).as("n_unique_fp"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"),
        sum(col("keep")).as("n_quality_keep"))

  /** Snapshot delta between two corpus versions — the dataset-versioning
    * diff a recurring crawl publishes with each release ("what changed
    * since v1"): every id is classified `added` (new), `removed` (gone),
    * `changed` (same id, different content) or `same`. Content identity
    * is md5 of the RAW text — whitespace-normalization is a curation
    * decision, a diff must not paper over it.
    *
    * Scale shape: ids + 128-bit digests only (text never leaves the scan
    * stage), one full-outer equi-join on the id — at 100 TB per side
    * this is the minimal shuffle any exact diff pays; both sides prune
    * to (id, hash) at the scan.
    *
    * Output: (idCol, status). Roll up with a groupBy("status") count for
    * the release-note headline.
    */
  def corpusDiff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val a = before.select(col(idCol), md5(col(textCol)).as("__ha"))
    val b = after.select(col(idCol), md5(col(textCol)).as("__hb"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") === col("__hb"), "same")
          .otherwise("changed").as("status"))
  }
}
