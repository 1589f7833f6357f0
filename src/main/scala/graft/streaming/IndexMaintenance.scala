package graft.streaming

import graft.ops.{Dedup, Retrieval}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the persisted retrieval/near-dup indexes: keep
  * a MinHash-LSH index ([[Dedup.saveMinhashIndex]] lifecycle) and a BM25
  * index ([[Retrieval.saveBm25Index]] lifecycle) current from a crawl
  * stream via `foreachBatch`, with the same epoch-marker exactly-once
  * discipline the ripple connector's sink uses
  * ([[graft.connector.RipplePublish]]): a replayed epoch must be a no-op,
  * and a crashed mid-append epoch must heal to exactly-once on replay —
  * never double-append (which would break the append ≡ rebuild gate both
  * index families carry).
  *
  * Protocol (per index directory; SINGLE MAINTAINING STREAM per index —
  * the same single-writer contract every index maintenance pass already
  * has):
  *
  *   1. `_last_epoch` holds the highest fully-applied foreachBatch epoch.
  *      An arriving epoch <= it is a replay of a committed epoch: no-op.
  *   2. `_epoch_intent` is written (tmp + atomic rename) BEFORE the
  *      append. An arriving epoch that matches a live intent is the
  *      replay of a CRASHED attempt — the batch's rows may be partially
  *      present — so the epoch first SCRUBS its own ids via the index's
  *      delete path (delete ≡ rebuild is already gated, and deleting ids
  *      the crash never wrote is a no-op), then appends fresh.
  *   3. After the append, `_last_epoch` advances and the intent clears.
  *
  * Structured Streaming re-executes at most the one uncommitted epoch
  * (same epochId, same data — the source is replayable), so the expensive
  * scrub runs only on the first epoch after a crash, never steady-state.
  * Both markers live INSIDE the index directory: the index is
  * self-describing about its maintenance position, and a separate batch
  * writer cannot accidentally share the epoch sequence.
  *
  * SHARP EDGE, stated: epoch ids are per-QUERY (foreachBatch batchIds
  * restart at 0 under a NEW checkpoint), and the markers cannot
  * distinguish "replay of my committed epoch" from "fresh query
  * re-reading the same source". The maintaining stream must therefore
  * keep ONE checkpoint for the index's lifetime — after an intentional
  * checkpoint reset, delete `_last_epoch`/`_epoch_intent` (and accept
  * that the new query must not re-deliver already-appended ids, e.g. by
  * resuming the source from the broker-side consumer cursor). A fresh
  * checkpoint WITHOUT the reset silently no-ops until the new query's
  * epoch counter passes the old one — the failure mode is skipped
  * appends, never duplicates, matching the append contract (batch ids
  * must be new) this helper inherits.
  */
object IndexMaintenance {

  /** foreachBatch function appending each micro-batch to a persisted
    * MinHash-LSH index at `path` (exactly-once; see class doc):
    * {{{
    *   stream.writeStream
    *     .foreachBatch(IndexMaintenance.minhashAppendSink(path, "id", "text"))
    *     .option("checkpointLocation", ckpt).start()
    * }}}
    * Batch ids must be new to the index (the append contract); the crawl
    * dedup shape that guarantees it is filtering each batch through
    * [[Dedup.novelAgainstMinhashIndex]] first.
    */
  def minhashAppendSink(path: String, idCol: String, textCol: String,
      hash64: Column => Column = xxhash64(_), numFiles: Int = 8)
      : (DataFrame, Long) => Unit = (batch, epochId) =>
    applyEpoch(batch, path, epochId)(
      append = Dedup.appendToMinhashIndex(batch, idCol, textCol, path,
        hash64, numFiles),
      scrub = Dedup.deleteFromMinhashIndex(batch.select(col(idCol)), idCol,
        path))

  /** foreachBatch function appending each micro-batch to a persisted BM25
    * index at `path` (exactly-once; see class doc). The scrub path also
    * repairs the stats pair from the postings ([[Retrieval.repairBm25Stats]])
    * because a crash can land anywhere between the postings append and the
    * stats bump — recomputing from the postings is exact either way.
    */
  def bm25AppendSink(path: String, idCol: String, textCol: String,
      numFiles: Int = 8): (DataFrame, Long) => Unit = (batch, epochId) =>
    applyEpoch(batch, path, epochId)(
      append = Retrieval.appendToBm25Index(batch, idCol, textCol, path,
        numFiles),
      scrub = {
        Retrieval.deleteFromBm25Index(batch.select(col(idCol)), idCol, path)
        Retrieval.repairBm25Stats(batch.sparkSession, path)
      })

  /** The crawl-ADMISSION composition — the deployment shape streaming
    * index maintenance exists for: per micro-batch, keep only the
    * documents with NO verified near-dup in the persisted index
    * ([[Dedup.novelAgainstMinhashIndex]]), append EXACTLY the kept ones to
    * the index (so later batches dedup against them), and hand the kept
    * batch to `sink` — all under the same exactly-once epoch guard. A
    * crashed epoch heals correctly BY CONSTRUCTION: the scrub deletes the
    * whole batch's ids (novel-subset appends are removed, unknown ids
    * no-op), so the replay recomputes the SAME novel set against the same
    * pre-batch index state.
    *
    * Contracts, stated: `sink` re-runs when a crashed epoch replays —
    * give it an idempotent-per-epoch target (a parquet epoch partition
    * overwrite, or the ripple sink through its own writeStream, whose
    * epoch markers already no-op replays; a blind batch append is NOT
    * idempotent). Intra-batch near-dups are both admitted (the index is
    * probed as it stood BEFORE the batch); drop them first via the
    * stream's own near-dup stage ([[TopicStreams.dropNearDups]]) when a
    * single micro-batch can carry near-copies.
    */
  def minhashAdmitSink(path: String, idCol: String, textCol: String,
      threshold: Double, sink: (DataFrame, Long) => Unit,
      hash64: Column => Column = xxhash64(_), numFiles: Int = 8)
      : (DataFrame, Long) => Unit = (batch, epochId) =>
    applyEpoch(batch, path, epochId)(
      append = {
        val idx = Dedup.loadMinhashIndex(batch.sparkSession, path)
        val novel = Dedup.novelAgainstMinhashIndex(idx, batch, idCol,
          textCol, threshold, hash64)
        Dedup.appendToMinhashIndex(novel, idCol, textCol, path, hash64,
          numFiles)
        sink(novel, epochId)
      },
      scrub = Dedup.deleteFromMinhashIndex(batch.select(col(idCol)), idCol,
        path))

  /** The exactly-once epoch wrapper (package-visible for direct testing).
    * Runs `scrub` only when `epochId` matches a live intent marker — the
    * one ambiguous epoch after a crash — then `append`, then commits the
    * epoch.
    */
  private[graft] def applyEpoch(batch: DataFrame, path: String,
      epochId: Long)(append: => Unit, scrub: => Unit): Unit = {
    val spark = batch.sparkSession
    val dir = new HPath(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lastP = new HPath(dir, "_last_epoch")
    val intentP = new HPath(dir, "_epoch_intent")

    def readLong(p: HPath): Option[Long] =
      try {
        val in = fs.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](256)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some(new String(buf.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        } finally in.close()
      } catch { case _: java.io.IOException | _: NumberFormatException => None }

    def writeAtomic(p: HPath, v: Long): Unit = {
      val tmp = new HPath(dir, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, p)) { // replace semantics on HDFS-style refusal
        fs.delete(p, false)
        if (!fs.rename(tmp, p)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(s"marker swap $tmp -> $p failed twice")
        }
      }
    }

    val last = readLong(lastP).getOrElse(-1L)
    if (epochId <= last) return // committed epoch replayed: no-op
    if (readLong(intentP).contains(epochId)) scrub // crashed attempt: heal
    writeAtomic(intentP, epochId)
    append
    writeAtomic(lastP, epochId)
    try fs.delete(intentP, false) catch { case _: java.io.IOException => () }
  }
}
