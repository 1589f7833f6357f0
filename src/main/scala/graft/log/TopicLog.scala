package graft.log

import graft.model.{LogRecord, Payload, TopicBucket}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, InputStream, OutputStream}
import scala.collection.mutable

/** Append-only per-bucket message log.
  *
  * Semantics mirror the reference's in-memory queue
  * (`internal/broker/queue/queue.go:32-61` in ripple-mq/ripple-server):
  * `append` pushes records at the tail, `range(from, until)` reads a slice
  * by offset with a clamped upper bound
  * (`pkg/utils/collection/concurrent_list.go:63-73`), and per-bucket order
  * is total. Unlike the reference the log is durable and bounded only by
  * storage — the reference keeps everything in RAM forever (TTL TODO at
  * `internal/broker/consumer/server/core.go:45`), which does not survive a
  * restart and cannot scale; replication comes from the storage layer
  * rather than a leader/follower gossip push
  * (`internal/broker/producer/server/core.go:68-103`).
  *
  * Single-writer-per-bucket is assumed, exactly as in the reference, where
  * the elected leader is the sole appender for its bucket
  * (`internal/lighthouse/election/election.go:50-79`).
  */
trait TopicLog {

  /** Append records; returns the offset of the first appended record.
    * Records become readable atomically and in order.
    */
  def append(tb: TopicBucket, rows: Seq[Payload]): Long

  /** Read offsets `[from, until)`; `until` is clamped to `size` — the
    * semantics of `Queue.SubArray` (`queue.go:58-61`).
    */
  def range(tb: TopicBucket, from: Long, until: Long): Seq[LogRecord]

  /** Current end offset (== number of records ever appended). */
  def size(tb: TopicBucket): Long

  def buckets(topic: String): Seq[TopicBucket]
}

/** Pure in-memory log for unit tests and property checks — the closest
  * analog of the reference's `ConcurrentList`-backed queue
  * (`pkg/utils/collection/concurrent_list.go:39-73`).
  */
final class InMemoryLog extends TopicLog {
  private val store = mutable.Map.empty[TopicBucket, mutable.ArrayBuffer[LogRecord]]

  private def buf(tb: TopicBucket) = synchronized {
    store.getOrElseUpdate(tb, mutable.ArrayBuffer.empty)
  }

  override def append(tb: TopicBucket, rows: Seq[Payload]): Long = synchronized {
    val b = buf(tb)
    val start = b.size.toLong
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    rows.zipWithIndex.foreach { case (p, i) =>
      b += LogRecord(tb.topic, tb.bucket, start + i, p.id, p.data, now)
    }
    start
  }

  override def range(tb: TopicBucket, from: Long, until: Long): Seq[LogRecord] = synchronized {
    val b = buf(tb)
    val lo = math.max(0L, from)
    val hi = math.min(until, b.size.toLong)
    if (hi <= lo) Seq.empty else b.slice(lo.toInt, hi.toInt).toSeq
  }

  override def size(tb: TopicBucket): Long = synchronized(buf(tb).size.toLong)

  override def buckets(topic: String): Seq[TopicBucket] = synchronized {
    store.keys.filter(_.topic == topic).toSeq.sortBy(_.bucket)
  }
}

/** Segment file layout + frame codec for the durable log.
  *
  * A segment file `seg-<start20>-<count10>.log` holds `count` records
  * beginning at offset `start`. Frames are length-prefixed, the same wire
  * discipline as the reference's transport
  * (`pkg/server/asynctcp/transport.go:114-145` — 4-byte big-endian length
  * prefix), but with a fixed header instead of GOB (which the reference
  * itself flags as non-portable, `internal/broker/consumer/server/core.go:14`):
  *
  * {{{ [len:int32][id:int32][tsMillis:int64][data:len-12 bytes] }}}
  *
  * A NEGATIVE length prefix marks the extended (v2) frame layout carrying a
  * compressed payload and/or an explicit record offset — see [[writeFrame]]
  * for the exact shape and [[Codecs]] for the compression design. Frames
  * are self-describing PER FRAME, so one file (and one bucket) can mix
  * raw/compressed/sparse frames freely: compaction stays a plain byte
  * concatenation, and a topic whose `compression` config changes mid-life
  * keeps reading correctly.
  *
  * Segments are immutable once published (write-temp + atomic rename), so a
  * retried epoch that re-appends the same segment name is a no-op — this is
  * what makes the streaming sink idempotent/exactly-once, replacing the
  * reference's ack-counting (`internal/broker/ack/ack.go:68-117`).
  *
  * All I/O is stream-based so segments read/write identically through
  * `org.apache.hadoop.fs.FileSystem` (the storage plane, [[LogFs]]) and
  * plain `java.nio` (unit tests).
  */
object SegmentCodec {
  val SegmentPrefix = "seg-"
  val SegmentSuffix = ".log"
  val ManifestName = ".manifest"

  def segmentName(start: Long, count: Long): String =
    f"$SegmentPrefix$start%020d-$count%010d$SegmentSuffix"

  /** Name of a SPARSE segment — the product of key-based compaction
    * ([[FileTopicLog.compactKeyed]]): it covers the offset SPAN
    * `[start, start+span)` but holds only `rows` retained records, each
    * frame carrying its original offset explicitly. The span keeps every
    * offset-arithmetic invariant (end offset, range pruning, overlap
    * checks) working unchanged; the `k<rows>` field carries the EXACT
    * retained count for planners that otherwise assume count == rows
    * (LIMIT planning, statistics, the metadata COUNT(*) pushdown guard).
    */
  def segmentNameSparse(start: Long, span: Long, rows: Long): String =
    f"$SegmentPrefix$start%020d-$span%010d-k$rows%010d$SegmentSuffix"

  /** (startOffset, span) parsed from a segment file name. For a dense
    * segment span == record count; a sparse one holds [[sparseRows]]
    * records inside the span.
    */
  def parse(name: String): Option[(Long, Long)] =
    if (!name.startsWith(SegmentPrefix) || !name.endsWith(SegmentSuffix)) None
    else name.stripPrefix(SegmentPrefix).stripSuffix(SegmentSuffix).split('-') match {
      case Array(s, c)                  => Some((s.toLong, c.toLong))
      case Array(s, c, k) if isKField(k) => Some((s.toLong, c.toLong))
      case _                            => None
    }

  private def isKField(f: String): Boolean =
    f.length > 1 && f.charAt(0) == 'k' && f.drop(1).forall(_.isDigit)

  /** Retained-record count of a SPARSE segment, None when unrecorded (a
    * manifest-mode sparse data file carries the flag only — its name is
    * fixed before the rewrite knows the count) or dense. Works on both
    * name families: rename-mode `seg-…-k<rows>.log` and manifest-mode
    * `data-…-k[<rows>]-<uuid>.log` (the `k` marker cannot collide with a
    * UUID field — hex has no 'k').
    */
  def sparseRows(name: String): Option[Long] =
    name.stripSuffix(SegmentSuffix).split('-').collectFirst {
      case f if isKField(f) => f.drop(1).toLong
    }

  /** Is this segment/data file SPARSE (key-compacted: frames carry
    * explicit offsets; retained records <= the name's span)?
    */
  def isSparse(name: String): Boolean =
    name.stripSuffix(SegmentSuffix).split('-')
      .exists(f => f == "k" || isKField(f))

  /** Extended-frame flag bits (see the class doc's v2 layout). Bit 5
    * marks a DICT frame: a payload-less-RECORD frame whose body is a
    * zstd dictionary for the [[Codecs.ZstdDict]] record frames that
    * FOLLOW it in the same byte stream. Dict frames are not records —
    * they consume no offset, carry no id/ts, and every iterator skips
    * them transparently — which is what keeps the whole protocol
    * (byte-concat compaction, heal, stats, republish verification)
    * unaware of dictionaries: a concatenated file is a sequence of
    * (dict, records...) runs, each self-describing in order.
    */
  private val CodecMask = 0x07
  private val HasOffsetFlag = 0x08
  private val TombstoneFlag = 0x10
  private val DictFrameFlag = 0x20
  private val HeadersFlag = 0x40
  private val KnownFlags =
    CodecMask | HasOffsetFlag | TombstoneFlag | DictFrameFlag | HeadersFlag

  /** One record's headers: ordered (key, value) pairs, duplicate keys
    * legal, value nullable — Kafka record-header parity (KIP-82: trace
    * ids, content types, schema hints that must not live inside the
    * payload). `null` headers = the record carries none (flag bit 6
    * unset — zero wire cost for the overwhelmingly common no-header
    * record); an EMPTY array is normalized to none on write.
    */
  type Headers = Array[(String, Array[Byte])]

  /** Size in bytes of the encoded header block (excluding the 4-byte
    * block-length prefix): `[count:int32]` then per header
    * `[keyLen:int32][key utf8][valLen:int32, -1 = null][val]`. Headers
    * stay RAW in a compressed frame — pruned scans and the keyed-
    * compaction header walk must read them without a codec context.
    */
  private def headerBlockSize(hs: Headers): Int = {
    var n = 4
    var i = 0
    while (i < hs.length) {
      val (k, v) = hs(i)
      n += 4 + k.getBytes(java.nio.charset.StandardCharsets.UTF_8).length +
        4 + (if (v == null) 0 else v.length)
      i += 1
    }
    n
  }

  private def writeHeaderBlock(out: DataOutputStream, hs: Headers): Unit = {
    out.writeInt(headerBlockSize(hs))
    out.writeInt(hs.length)
    var i = 0
    while (i < hs.length) {
      val (k, v) = hs(i)
      if (k == null) throw new IllegalArgumentException(
        "record header with a NULL key — every header needs a key")
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      if (v == null) out.writeInt(-1)
      else { out.writeInt(v.length); out.write(v) }
      i += 1
    }
  }

  /** True when `hs` names at least one header (the write-side gate for
    * flag bit 6).
    */
  private def hasHeaders(hs: Headers): Boolean = hs != null && hs.length > 0

  /** Write ONE frame. The classic positional layout is kept verbatim for
    * raw frames (wire-stable — every pre-compression segment remains a
    * byte-identical valid stream); a frame that carries a compressed
    * payload and/or an explicit offset uses the self-describing EXTENDED
    * layout, marked by a NEGATIVE length prefix:
    *
    * {{{
    *   v1: [len:int32>=12][id:int32][ts:int64][data: len-12 bytes]
    *   v2: [-len:int32][flags:uint8][offset:int64 if flags&8]
    *       [id:int32][ts:int64]
    *       [hdrBlockLen:int32][headers block if flags&64]
    *       [rawLen:int32 if codec!=0][payload]
    * }}}
    *
    * `flags` bits 0–2 carry the codec id ([[Codecs]]), bit 3 marks an
    * explicit record offset (sparse segments — key compaction), bit 6 a
    * record-HEADERS block (KIP-82 parity, see [[Headers]] — kept RAW even
    * when the payload compresses, and length-prefixed so a pruned scan
    * skips it in one seek); unknown
    * bits are refused at read (a frame written by a newer engine must not
    * decode as garbage). Self-description is PER FRAME, which is what lets
    * compaction keep concatenating segments bytewise across codec/config
    * changes, and mixed frames coexist in one file.
    *
    * Compression policy: payloads under [[Codecs.MinCompressBytes]] and
    * payloads the codec fails to shrink stay raw — so a compressed frame
    * is always strictly smaller than its raw form, and pathological inputs
    * never regress.
    *
    * `offset < 0` means positional (the reader's cursor assigns it).
    *
    * TOMBSTONE convention (Kafka null-value parity, flag bit 4): a NULL
    * `data` writes a payload-less tombstone frame — "this key is
    * deleted". An EMPTY array stays a legal value (the two are distinct
    * on the wire and on read: tombstones read back as null). Key
    * compaction retains a latest-per-key tombstone until it ages past
    * the topic's `tombstoneRetentionMs`, then drops the key entirely.
    */
  def writeFrame(out: DataOutputStream, id: Int, tsMillis: Long,
      data: Array[Byte], codec0: Int = Codecs.None, offset: Long = -1L,
      headers: Headers = null): Unit = {
    // the DICT protocol needs writer state (train, emit the dict frame,
    // then reference it) — that lives in [[FrameWriter]], which the
    // sink, writeFrames and the keyed rewrite all use; a DIRECT
    // writeFrame under zstd-dict degrades to plain zstd, a legal mix
    val codec = if (codec0 == Codecs.ZstdDict) Codecs.Zstd else codec0
    val hdrs = hasHeaders(headers)
    val hdrLen = if (hdrs) 4 + headerBlockSize(headers) else 0
    if (data == null) { // tombstone: v2 frame, no payload, codec irrelevant
      // tombstones MAY carry headers (Kafka parity — a delete's trace id)
      val flags = TombstoneFlag | (if (offset >= 0) HasOffsetFlag else 0) |
        (if (hdrs) HeadersFlag else 0)
      val len = 1 + (if (offset >= 0) 8 else 0) + 12 + hdrLen
      out.writeInt(-len)
      out.writeByte(flags)
      if (offset >= 0) out.writeLong(offset)
      out.writeInt(id)
      out.writeLong(tsMillis)
      if (hdrs) writeHeaderBlock(out, headers)
      return
    }
    val d = data
    val comp =
      if (codec == Codecs.None || d.length < Codecs.MinCompressBytes) null
      else {
        val c = Codecs.compress(codec, d)
        if (c.length + 5 < d.length) c else null // 5 = flags + rawLen overhead
      }
    if (comp == null && offset < 0 && !hdrs) {
      out.writeInt(4 + 8 + d.length)
      out.writeInt(id)
      out.writeLong(tsMillis)
      out.write(d)
    } else {
      val effCodec = if (comp == null) Codecs.None else codec
      val flags = effCodec | (if (offset >= 0) HasOffsetFlag else 0) |
        (if (hdrs) HeadersFlag else 0)
      val body = if (comp == null) d else comp
      val len = 1 + (if (offset >= 0) 8 else 0) + 12 + hdrLen +
        (if (effCodec != Codecs.None) 4 else 0) + body.length
      out.writeInt(-len)
      out.writeByte(flags)
      if (offset >= 0) out.writeLong(offset)
      out.writeInt(id)
      out.writeLong(tsMillis)
      if (hdrs) writeHeaderBlock(out, headers)
      if (effCodec != Codecs.None) out.writeInt(d.length)
      out.write(body)
    }
  }

  /** Emit a DICT frame: `[-len][flags=DictFrameFlag][dict bytes]` — the
    * zstd dictionary for the [[Codecs.ZstdDict]] record frames that
    * follow in this stream. Not a record: no id/ts/offset, consumes no
    * cursor position.
    */
  def writeDictFrame(out: DataOutputStream, dict: Array[Byte]): Unit = {
    out.writeInt(-(1 + dict.length))
    out.writeByte(DictFrameFlag)
    out.write(dict)
  }

  /** One [[Codecs.ZstdDict]] record frame against an emitted dict; falls
    * back to a raw frame when the dictionary does not pay on this payload.
    */
  private[log] def writeFrameWithDict(out: DataOutputStream, id: Int,
      tsMillis: Long, data: Array[Byte],
      dict: com.github.luben.zstd.ZstdCompressCtx, offset: Long,
      headers: Headers = null): Unit = {
    if (data == null || data.length < Codecs.DictMinCompressBytes) {
      writeFrame(out, id, tsMillis, data, Codecs.None, offset, headers)
      return
    }
    val comp = Codecs.compressWithDict(dict, data)
    if (comp.length + 5 >= data.length) {
      writeFrame(out, id, tsMillis, data, Codecs.None, offset, headers)
      return
    }
    val hdrs = hasHeaders(headers)
    val hdrLen = if (hdrs) 4 + headerBlockSize(headers) else 0
    val flags = Codecs.ZstdDict | (if (offset >= 0) HasOffsetFlag else 0) |
      (if (hdrs) HeadersFlag else 0)
    val len = 1 + (if (offset >= 0) 8 else 0) + 12 + hdrLen + 4 + comp.length
    out.writeInt(-len)
    out.writeByte(flags)
    if (offset >= 0) out.writeLong(offset)
    out.writeInt(id)
    out.writeLong(tsMillis)
    if (hdrs) writeHeaderBlock(out, headers)
    out.writeInt(data.length)
    out.write(comp)
  }

  /** Stateful frame emitter — the one place the [[Codecs.ZstdDict]]
    * protocol lives. Non-dict codecs pass straight through to
    * [[writeFrame]]. Under zstd-dict, the first `trainRecords` payloads
    * buffer in memory (bounded: records per staged file batch), a
    * dictionary trains on them, a DICT frame is emitted, and every
    * record (buffered + subsequent) compresses against it; when the file
    * closes under the threshold, or training fails (too small/uniform a
    * sample), records flush as plain zstd frames — a legal mix the
    * reader handles per frame. Call [[finish]] before closing the
    * stream: it flushes a sub-threshold buffer and releases the
    * dictionary's native memory.
    */
  final class FrameWriter(out: DataOutputStream, codec: Int,
      trainRecords: Int = 256) {
    private val buf =
      if (codec == Codecs.ZstdDict)
        scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Array[Byte], Long, Headers)]
      else null
    private var dict: com.github.luben.zstd.ZstdCompressCtx = null
    private var trained = false

    def write(id: Int, tsMillis: Long, data: Array[Byte],
        offset: Long = -1L, headers: Headers = null): Unit =
      if (codec != Codecs.ZstdDict)
        writeFrame(out, id, tsMillis, data, codec, offset, headers)
      else if (trained) emit(id, tsMillis, data, offset, headers)
      else {
        buf += ((id, tsMillis, data, offset, headers))
        if (buf.size >= trainRecords) train()
      }

    private def emit(id: Int, tsMillis: Long, data: Array[Byte],
        offset: Long, headers: Headers): Unit =
      if (dict == null)
        writeFrame(out, id, tsMillis, data, Codecs.Zstd, offset, headers)
      else writeFrameWithDict(out, id, tsMillis, data, dict, offset, headers)

    private def train(): Unit = {
      trained = true
      val samples = buf.iterator.map(_._3)
        .filter(d => d != null && d.length > 0).toSeq
      Codecs.trainDict(samples).foreach { d =>
        writeDictFrame(out, d)
        dict = Codecs.dictCompressCtx(d)
      }
      buf.foreach { case (id, ts, data, off, hs) => emit(id, ts, data, off, hs) }
      buf.clear()
    }

    /** Flush a sub-threshold buffer (plain zstd — no dict is worth a
      * handful of records) and free the trained dictionary.
      */
    def finish(): Unit = {
      if (codec == Codecs.ZstdDict && !trained) {
        trained = true
        buf.foreach { case (id, ts, data, off, hs) =>
          writeFrame(out, id, ts, data, Codecs.Zstd, off, hs) }
        buf.clear()
      }
      dispose()
    }

    /** Free the compression context WITHOUT flushing — the abort path
      * (the output file is being discarded, but the trained ctx's native
      * zstd memory is invisible to GC and would leak across task
      * retries). Idempotent; [[finish]] calls it too.
      */
    def dispose(): Unit =
      if (dict != null) { dict.close(); dict = null }
  }

  /** Frame-encode `rows` onto `out` (closed by the caller's wrapper). */
  def writeFrames(raw: OutputStream, rows: Seq[(Payload, Long)],
      codec: Int = Codecs.None): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(raw, 1 << 16))
    val fw = new FrameWriter(out, codec)
    try {
      rows.foreach { case (p, tsMillis) => fw.write(p.id, tsMillis, p.data) }
      fw.finish()
    } finally { fw.dispose(); out.close() }
  }

  def write(file: java.nio.file.Path, rows: Seq[(Payload, Long)]): Unit =
    writeFrames(java.nio.file.Files.newOutputStream(file), rows)

  def write(fs: FileSystem, file: HPath, rows: Seq[(Payload, Long)],
      codec: Int = Codecs.None): Unit =
    writeFrames(fs.create(file, true), rows, codec)

  /** Frame iterator with an explicit `close()`: an offset-pruned read that
    * stops mid-segment releases the stream WITHOUT decoding the remaining
    * frames (round 1 drained the iterator to close — O(segment) wasted I/O
    * per pruned scan). `skipData = true` walks headers only — payload
    * bytes are SKIPPED (a stream seek, never allocated), the column-pruned
    * read path for projections that drop `data`: a metadata-only scan of a
    * 100 TB topic should pay header bytes, not payload bytes.
    */
  final class FrameIterator(raw: InputStream, skipData: Boolean = false,
      parseHeaders: Boolean = true)
      extends Iterator[(Int, Long, Array[Byte])] with AutoCloseable {
    private val in = new DataInputStream(new BufferedInputStream(raw, 1 << 16))
    private var eof = false
    private var nextLen = readLen()
    private def readLen(): Int = {
      val len = try in.readInt()
                catch { case _: java.io.EOFException => in.close(); eof = true; 0 }
      if (!eof && len >= 0 && len < 12) throw new java.io.IOException(
        s"corrupt frame: length prefix $len < 12-byte header")
      len
    }

    /** The just-returned frame's EXPLICIT offset, or -1 for a positional
      * frame (the caller's cursor assigns it). Explicit offsets appear in
      * sparse segments — key compaction retains the latest record per key
      * AT ITS ORIGINAL OFFSET, so positional assignment no longer holds
      * there; a reader's cursor rule is: explicit sets the cursor,
      * positional is cursor++ (sparse writers stamp EVERY frame explicit,
      * so a dense tail concatenated after a sparse run can never inherit
      * a mid-gap cursor).
      */
    var explicitOffset: Long = -1L

    /** True iff the just-returned frame is a TOMBSTONE ("key deleted" —
      * Kafka null-value parity). Tombstones return `data = null` (an
      * empty array stays a distinct legal value).
      */
    var tombstone: Boolean = false

    /** The just-returned frame's record HEADERS ([[Headers]] — ordered
      * (key, value) pairs, KIP-82 parity), or null when the frame carries
      * none, or when this iterator was opened with `parseHeaders = false`
      * (metadata walks skip the block in one seek, zero allocation).
      */
    var headers: Headers = null

    /** The stream's CURRENT zstd dictionary — set by the most recent
      * DICT frame, referenced by [[Codecs.ZstdDict]] record frames.
      */
    private var curDict: com.github.luben.zstd.ZstdDecompressCtx = null
    private def setDict(bytes: Array[Byte]): Unit = {
      if (curDict != null) curDict.close()
      curDict = Codecs.dictDecompressCtx(bytes)
    }

    override def hasNext: Boolean = !eof
    override def next(): (Int, Long, Array[Byte]) = {
      while (true) {
        if (nextLen >= 0) { // v1 positional frame
          explicitOffset = -1L
          tombstone = false
          headers = null
          val id = in.readInt()
          val ts = in.readLong()
          val data =
            if (skipData) { skipFully(nextLen - 12L); Array.emptyByteArray }
            else { val d = new Array[Byte](nextLen - 12); in.readFully(d); d }
          nextLen = readLen()
          return (id, ts, data)
        }
        // v2 extended frame (compressed payload / explicit offset / dict)
        val absLen = -nextLen
        val flags = in.readUnsignedByte()
        if ((flags & ~KnownFlags) != 0) throw new java.io.IOException(
          f"corrupt or future frame: unknown flag bits 0x$flags%02x — " +
            "written by a newer engine?")
        if ((flags & DictFrameFlag) != 0) {
          // a DICT frame is not a record: install (or skip) the
          // dictionary and continue to the next frame
          if (flags != DictFrameFlag) throw new java.io.IOException(
            f"corrupt frame: dict frame with extra flag bits 0x$flags%02x")
          val dictLen = absLen - 1
          if (dictLen < 0) throw new java.io.IOException(
            s"corrupt frame: dict length $dictLen")
          if (skipData) skipFully(dictLen.toLong)
          else { val d = new Array[Byte](dictLen); in.readFully(d); setDict(d) }
          nextLen = readLen()
          if (eof) throw new java.io.IOException(
            "segment ends with a dangling dict frame — torn write")
        } else {
          val codec = flags & CodecMask
          val hasOff = (flags & HasOffsetFlag) != 0
          tombstone = (flags & TombstoneFlag) != 0
          val hasHdrs = (flags & HeadersFlag) != 0
          explicitOffset = if (hasOff) in.readLong() else -1L
          val id = in.readInt()
          val ts = in.readLong()
          // fixed prefix consumed so far: flags + offset? + id + ts
          val fixedLen = 1 + (if (hasOff) 8 else 0) + 12
          headers = null
          var hdrTotal = 0
          if (hasHdrs) {
            val blockLen = in.readInt()
            hdrTotal = 4 + blockLen
            if (blockLen < 4 || fixedLen + hdrTotal > absLen)
              throw new java.io.IOException(
                s"corrupt frame: header block length $blockLen out of " +
                  s"bounds (frame $absLen)")
            if (parseHeaders) {
              val count = in.readInt()
              // each header costs >= 8 bytes (two length prefixes), so a
              // corrupt count can't drive an over-allocation past the
              // already-validated block length
              if (count < 0 || 4 + count.toLong * 8 > blockLen)
                throw new java.io.IOException(
                  s"corrupt frame: header count $count exceeds block $blockLen")
              val hs = new Array[(String, Array[Byte])](count)
              var consumed = 4
              var i = 0
              while (i < count) {
                val kl = in.readInt()
                if (kl < 0 || consumed + 8 + kl > blockLen)
                  throw new java.io.IOException(
                    s"corrupt frame: header key length $kl overruns block")
                val kb = new Array[Byte](kl)
                in.readFully(kb)
                val vl = in.readInt()
                consumed += 8 + kl
                val v = if (vl < 0) null else {
                  if (consumed + vl > blockLen)
                    throw new java.io.IOException(
                      s"corrupt frame: header value length $vl overruns block")
                  val vb = new Array[Byte](vl)
                  in.readFully(vb)
                  consumed += vl
                  vb
                }
                hs(i) = (new String(kb, java.nio.charset.StandardCharsets.UTF_8), v)
                i += 1
              }
              if (consumed != blockLen) throw new java.io.IOException(
                s"corrupt frame: header block declares $blockLen bytes, " +
                  s"entries consume $consumed")
              headers = hs
            } else skipFully(blockLen.toLong)
          }
          val headerLen = fixedLen + hdrTotal +
            (if (codec != Codecs.None) 4 else 0)
          if (absLen < headerLen) throw new java.io.IOException(
            s"corrupt frame: extended length $absLen < header $headerLen")
          if (tombstone && (absLen != headerLen || codec != Codecs.None))
            throw new java.io.IOException(
              s"corrupt frame: tombstone carries a payload (len $absLen)")
          val data =
            if (tombstone) null
            else if (skipData) {
              // everything after ts/headers (the rawLen field, if any,
              // plus the payload) is skipped in one seek — flags/offset/
              // id/ts/headers are already consumed, so absLen minus those
              // is what remains
              skipFully((absLen - fixedLen - hdrTotal).toLong)
              Array.emptyByteArray
            } else if (codec == Codecs.None) {
              val d = new Array[Byte](absLen - headerLen)
              in.readFully(d); d
            } else {
              val rawLen = in.readInt()
              if (rawLen < 0) throw new java.io.IOException(
                s"corrupt frame: negative raw length $rawLen")
              val comp = new Array[Byte](absLen - headerLen)
              in.readFully(comp)
              if (codec == Codecs.ZstdDict) {
                if (curDict == null) throw new java.io.IOException(
                  "corrupt stream: zstd-dict frame before any dict frame")
                Codecs.decompressWithDict(curDict, comp, rawLen)
              } else Codecs.decompress(codec, comp, rawLen)
            }
          nextLen = readLen()
          return (id, ts, data)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def skipFully(n: Long): Unit = {
      var toSkip = n
      while (toSkip > 0) {
        val s = in.skip(toSkip)
        if (s > 0) toSkip -= s
        else { in.readByte(); toSkip -= 1 }
      }
    }

    override def close(): Unit = {
      eof = true
      if (curDict != null) { try curDict.close() catch { case _: Throwable => () }; curDict = null }
      try in.close() catch { case _: Throwable => () }
    }
  }

  /** Iterate all frames of a segment: (id, tsMillis, data). */
  def read(file: java.nio.file.Path): FrameIterator =
    new FrameIterator(java.nio.file.Files.newInputStream(file))

  def read(fs: FileSystem, file: HPath): FrameIterator =
    new FrameIterator(fs.open(file))

  /** Header-only iterate: (id, tsMillis, empty) with payload bytes
    * skipped, for `data`-pruned scans. Record-header blocks are skipped
    * too (metadata walks don't pay their allocation); pass
    * `withRecordHeaders = true` for a scan that projects `headers` but
    * not `data` — payload bytes stay skipped, header blocks parse.
    */
  def readHeaders(fs: FileSystem, file: HPath,
      withRecordHeaders: Boolean = false): FrameIterator =
    new FrameIterator(fs.open(file), skipData = true,
      parseHeaders = withRecordHeaders)

  /** Hard per-task budget for keyed compaction's id → last-offset state,
    * in ENTRIES — the Kafka `log.cleaner.dedupe.buffer.size` analog, but
    * a cap on the FAST path rather than on coverage: where Kafka's
    * cleaner does a partial pass when the dedupe buffer fills, this
    * rewrite falls over to a sort-based external path and still compacts
    * the WHOLE bucket in one pass with O(budget) heap (sorted spill runs
    * on task-local disk, k-way merged). The default is the 128 MB-class
    * budget Kafka ships (peak task heap ≈ 48 bytes/entry across the map
    * and the spill buffers it hands off to). Loudly configurable per
    * topic (`compactionKeyHeap`) — a 10^9-key bucket compacts in bounded
    * memory either way; raising the budget just avoids the spill I/O.
    */
  val DefaultKeyHeapEntries: Int = 4 << 20

  /** Result of one [[rewriteLatestPerKey]] call. `spillRuns` counts the
    * sorted runs THIS call wrote on its budget fallover (0 = the in-heap
    * path carried it) — per-call observability for specs and the bench's
    * high-cardinality probe cell (proof the bounded path actually
    * engaged for the rewrite under test, not merely that some concurrent
    * compaction in the JVM spilled).
    */
  final case class KeyedRewrite(rows: Long, minTs: Long, maxTs: Long,
      spillRuns: Long)

  /** Scratch file for a keyed-compaction spill run: Spark's provisioned
    * local dirs when running inside a Spark JVM (driver or executor),
    * `java.io.tmpdir` only for bare-JVM callers — a 10^9-key bucket
    * spills ~12 GB of runs, which must land on the cluster's scratch
    * disks, not a root-volume `/tmp`.
    */
  private[graft] def spillFile(suffix: String): java.io.File =
    java.io.File.createTempFile("graft-keyed-", suffix,
      org.apache.spark.sql.graft.bridge.sparkLocalDir().orNull)

  /** Two-pass latest-per-key rewrite — the frame-level worker of key-based
    * log compaction (`cleanup.policy=compact` parity; the envelope's
    * `id INT` is the key). Pass 1 walks HEADERS only (payloads seeked
    * past, never decompressed) building id → last offset; pass 2 decodes
    * and re-frames exactly the records whose offset is their key's last,
    * each with an EXPLICIT offset (the segment becomes sparse: retained
    * records keep their original positions) and re-encoded under `codec`.
    * `members` are (path, startOffset) in offset order — last write wins
    * across files exactly as within one. Returns the retained row count.
    *
    * Memory bound: the id → offset state is capped at `maxKeys` entries
    * ([[DefaultKeyHeapEntries]]). Under the cap it is one in-heap LongMap
    * (the common case: a bucket's distinct keys fit Kafka's dedupe-buffer
    * class). The moment the cap trips, the state spills to SORTED RUNS on
    * task-local disk — (id, offset) pairs sorted by id, latest offset per
    * id per run — which a k-way merge reduces to the retained-offset set,
    * itself spilled as offset-sorted runs and stream-merged against the
    * offset-ascending frame walk of pass 2. Task heap stays O(maxKeys)
    * REGARDLESS of key cardinality; the output is byte-identical to the
    * in-heap path (same retained set, same offset-order emission), so
    * crashed-attempt republish verification ([[sameFrames]]) and the
    * deterministic-sidecar discipline hold across the fallover.
    */
  /** Default tombstone horizon for key compaction — Kafka's
    * `delete.retention.ms` default (24 h): a latest-per-key tombstone
    * that has been OBSERVABLE in a compacted product for less than this
    * is retained (lagging readers must observe the delete); an older one
    * drops with its key.
    */
  val DefaultTombstoneRetentionMs: Long = 86400000L

  /** Tombstone aging is by CLEAN time, not record time (Kafka
    * `delete.retention.ms` ages from the cleaner pass, KIP-534): a
    * tombstone is droppable only when (a) it already SURVIVED a prior
    * compaction — it sits in a SPARSE member — so one pass always leaves
    * the delete visible, and (b) that product landed (file modification
    * time) before `tombstoneFloorMs`. The record's own `ts` is
    * producer/event time and is never consulted: a delete written NOW
    * with an old event-time stamp must still be observable for the full
    * horizon. Member mtimes are immutable once published, so duplicate
    * and speculative attempts of one task still emit byte-identical
    * products.
    */
  def rewriteLatestPerKey(fs: FileSystem, members: Seq[(HPath, Long)],
      out: HPath, codec: Int = Codecs.None,
      maxKeys: Int = DefaultKeyHeapEntries,
      tombstoneFloorMs: Long = Long.MinValue): KeyedRewrite = {
    require(maxKeys >= 8, s"keyed-compaction key budget too small: $maxKeys")
    var spillRuns = 0L
    val runs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    try {
      // ---- pass 1: id -> last offset, in heap until the budget trips ----
      var map: scala.collection.mutable.LongMap[Long] =
        new scala.collection.mutable.LongMap[Long](1 << 10)
      var ids: Array[Int] = null // spill buffers, allocated on first trip
      var offs: Array[Long] = null
      var n = 0
      // One sorted spill run from the buffered (id, offset) pairs. Buffer
      // arrival order is offset-ascending (the walk is), so per id the
      // max arrival seq carries the latest offset: pack (unsigned id <<
      // 32 | seq), sort, keep each id group's last entry. Map-dump chunks
      // have distinct ids, so the group-collapse is a no-op there.
      def flushRun(): Unit = if (n > 0) {
        // sign-flip for an UNSIGNED primitive sort: uids >= 2^31 (negative
        // ids) would otherwise set the packed sign bit and sort FIRST in
        // the run while the k-way merge compares uids unsigned — the
        // misordered runs would stop the cross-run collapse for those ids
        val packed = new Array[Long](n)
        var i = 0
        while (i < n) {
          packed(i) = ((ids(i) & 0xffffffffL) << 32 | i.toLong) ^ Long.MinValue
          i += 1
        }
        java.util.Arrays.sort(packed)
        spillRuns += 1
        val f = spillFile(".run")
        runs += f
        val o = new DataOutputStream(new BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        try {
          i = 0
          while (i < n) {
            val uid = (packed(i) ^ Long.MinValue) >>> 32
            while (i + 1 < n && ((packed(i + 1) ^ Long.MinValue) >>> 32) == uid)
              i += 1
            o.writeInt(uid.toInt)
            o.writeLong(offs(((packed(i) ^ Long.MinValue) & 0xffffffffL).toInt))
            i += 1
          }
        } finally o.close()
        n = 0
      }
      def tripToSpill(): Unit = {
        ids = new Array[Int](maxKeys)
        offs = new Array[Long](maxKeys)
        val m = map; map = null
        m.foreach { case (k, v) =>
          ids(n) = k.toInt; offs(n) = v; n += 1
          if (n == maxKeys) flushRun()
        }
        flushRun()
      }
      members.foreach { case (p, start) =>
        val it = readHeaders(fs, p)
        try {
          var cur = start - 1
          while (it.hasNext) {
            val (id, _, _) = it.next()
            cur = if (it.explicitOffset >= 0) it.explicitOffset else cur + 1
            if (map != null) {
              map(id.toLong) = cur
              if (map.size > maxKeys) tripToSpill()
            } else {
              ids(n) = id; offs(n) = cur; n += 1
              if (n == maxKeys) flushRun()
            }
          }
        } finally it.close()
      }
      val retained: RetainedOffsets =
        if (map != null) new MapRetained(map)
        else {
          flushRun()
          // merge the id-sorted runs: latest offset per id -> the
          // retained-offset set, spilled as offset-sorted runs (reusing
          // the pair buffers — the map is long freed)
          val offRuns = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
          var bn = 0
          def flushOffRun(): Unit = if (bn > 0) {
            java.util.Arrays.sort(offs, 0, bn)
            val f = spillFile(".off")
            offRuns += f
            val o = new DataOutputStream(new BufferedOutputStream(
              new java.io.FileOutputStream(f), 1 << 16))
            try { var i = 0; while (i < bn) { o.writeLong(offs(i)); i += 1 } }
            finally o.close()
            bn = 0
          }
          val merge = new RunMerge(
            consolidateRuns(runs.toSeq, pair = true, runs), pair = true)
          try {
            while (merge.hasNext) {
              offs(bn) = merge.nextLatestOffset(); bn += 1
              if (bn == offs.length) flushOffRun()
            }
          } finally merge.close()
          flushOffRun()
          runs.foreach(f => { f.delete(); () })
          runs.clear()
          runs ++= offRuns // cleanup path owns them now
          new StreamRetained(new RunMerge(
            consolidateRuns(offRuns.toSeq, pair = false, runs), pair = false))
        }
      // ---- pass 2: decode + re-frame exactly the retained offsets ----
      // Through a FrameWriter, so a zstd-dict topic's compacted product
      // RETAINS dictionary compression (trained on the retained rows —
      // deterministic given the retained sequence, so duplicate attempts
      // stay byte-identical); other codecs pass straight through.
      val o = new DataOutputStream(new BufferedOutputStream(fs.create(out, true), 1 << 16))
      val fw = new FrameWriter(o, codec)
      var rows = 0L
      var minTs = Long.MaxValue
      var maxTs = Long.MinValue
      try {
        members.foreach { case (p, start) =>
          // CLEAN-TIME tombstone aging (class doc above): this member's
          // tombstones are droppable only if the member is itself a
          // compaction product (sparse — the delete already survived one
          // pass) that landed before the floor. Raw members NEVER drop
          // their tombstones here, whatever the record ts says.
          val tombDroppable = tombstoneFloorMs != Long.MinValue &&
            SegmentCodec.isSparse(p.getName) &&
            fs.getFileStatus(p).getModificationTime < tombstoneFloorMs
          val it = read(fs, p)
          try {
            var cur = start - 1
            while (it.hasNext) {
              val (id, ts, data) = it.next()
              cur = if (it.explicitOffset >= 0) it.explicitOffset else cur + 1
              // a latest-per-key TOMBSTONE is kept while young (lagging
              // readers must see the delete) and dropped with its key
              // once aged past the floor — Kafka delete.retention.ms.
              // isRetained runs FIRST either way: the streamed retained-
              // offset cursor must advance past dropped tombstones too.
              if (retained.isRetained(id, cur) &&
                  !(it.tombstone && tombDroppable)) {
                // record headers ride along byte-preserved — compaction
                // keeps the retained record WHOLE (KIP-82 parity)
                fw.write(id, ts, data, offset = cur, headers = it.headers)
                rows += 1
                if (ts < minTs) minTs = ts
                if (ts > maxTs) maxTs = ts
              }
            }
          } finally it.close()
        }
        fw.finish()
        o.close()
      } catch {
        case e: Throwable =>
          try o.close() catch { case _: Throwable => () }
          throw e
      } finally { fw.dispose(); retained.close() }
      KeyedRewrite(rows, minTs, maxTs, spillRuns)
    } finally runs.foreach(f => { f.delete(); () })
  }

  /** Pass-2 membership test for [[rewriteLatestPerKey]], consumed in
    * strictly ascending offset order.
    */
  private sealed trait RetainedOffsets extends AutoCloseable {
    def isRetained(id: Int, offset: Long): Boolean
  }

  private final class MapRetained(last: scala.collection.mutable.LongMap[Long])
      extends RetainedOffsets {
    def isRetained(id: Int, offset: Long): Boolean =
      last.getOrElse(id.toLong, -1L) == offset
    def close(): Unit = ()
  }

  /** Stream-merge of the offset-sorted retained runs against the
    * offset-ascending frame walk: offsets are unique, both sides ascend,
    * so membership is a two-pointer advance.
    */
  private final class StreamRetained(merge: RunMerge) extends RetainedOffsets {
    private var want: Long = advance()
    private def advance(): Long =
      if (merge.hasNext) merge.nextOffset() else Long.MinValue
    def isRetained(id: Int, offset: Long): Boolean =
      if (want != Long.MinValue && offset == want) { want = advance(); true }
      else false
    def close(): Unit = merge.close()
  }

  /** Merge fan-in cap: each open run costs a buffered stream (~16 KB) +
    * a heap head, so a pathological budget-to-frames ratio (10^10 frames
    * against a tiny cap) must not hold thousands of streams — groups of
    * this many runs consolidate into one before the final merge.
    */
  private val MaxMergeFanIn = 256

  /** Consolidate `files` down to at most [[MaxMergeFanIn]] runs by
    * merging groups into single runs (latest-per-id collapse for pair
    * runs — associative, so group-wise is exact; plain ascending merge
    * for offset runs). New files register in `cleanup`; consumed group
    * members are deleted eagerly.
    */
  private def consolidateRuns(files: Seq[java.io.File], pair: Boolean,
      cleanup: scala.collection.mutable.ArrayBuffer[java.io.File]): Seq[java.io.File] =
    if (files.size <= MaxMergeFanIn) files
    else {
      val merged = files.grouped(MaxMergeFanIn).map { group =>
        val f = spillFile(".m")
        cleanup += f
        val o = new DataOutputStream(new BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        val m = new RunMerge(group, pair)
        try {
          if (pair) while (m.hasNext) {
            val (uid, off) = m.nextLatestPair()
            o.writeInt(uid.toInt); o.writeLong(off)
          }
          else while (m.hasNext) o.writeLong(m.nextOffset())
        } finally { m.close(); o.close() }
        group.foreach(g => { g.delete(); () })
        f
      }.toSeq
      consolidateRuns(merged, pair, cleanup)
    }

  /** K-way merge over spill-run files. `pair = true` reads (id: int,
    * offset: long) entries ordered by unsigned id and
    * [[nextLatestOffset]] collapses each id's entries across runs to its
    * MAX offset (offsets are globally unique, so max = latest); `pair =
    * false` reads plain ascending offsets and [[nextOffset]] yields the
    * global ascending merge. Heap: one buffered stream + one head entry
    * per run.
    */
  private final class RunMerge(files: Seq[java.io.File], pair: Boolean)
      extends AutoCloseable {
    private final class Head(val in: DataInputStream) {
      var key = 0L // unsigned id (pair) or the offset itself (plain)
      var off = 0L
      var alive = advance()
      def advance(): Boolean =
        try {
          if (pair) { key = in.readInt() & 0xffffffffL; off = in.readLong() }
          else { off = in.readLong(); key = off }
          true
        } catch { case _: java.io.EOFException => in.close(); false }
    }
    private val pq = new java.util.PriorityQueue[Head](
      math.max(1, files.size),
      (a: Head, b: Head) => java.lang.Long.compare(a.key, b.key))
    files.foreach { f =>
      val h = new Head(new DataInputStream(new BufferedInputStream(
        new java.io.FileInputStream(f), 1 << 14)))
      if (h.alive) pq.add(h)
    }
    def hasNext: Boolean = !pq.isEmpty
    def nextLatestOffset(): Long = nextLatestPair()._2
    def nextLatestPair(): (Long, Long) = {
      val uid = pq.peek().key
      var best = Long.MinValue
      while (!pq.isEmpty && pq.peek().key == uid) {
        val h = pq.poll()
        if (h.off > best) best = h.off
        if (h.advance()) pq.add(h)
      }
      (uid, best)
    }
    def nextOffset(): Long = {
      val h = pq.poll()
      val v = h.off
      if (h.advance()) pq.add(h)
      v
    }
    def close(): Unit = {
      pq.forEach(h => try h.in.close() catch { case _: Throwable => () })
      pq.clear()
    }
  }

  /** The keyed rewrite's stats sidecar: the TASK that produced a compacted
    * segment already knows (rows, minTs, maxTs); shipping them in a tiny
    * dot-temp next to the output spares the commit phase a DRIVER-side
    * header walk over the whole product — O(live keys) driver I/O per
    * bucket at changelog scale, exactly the byte-relay class the driver
    * must not own. Deterministic rewrites make duplicate attempts'
    * sidecars identical (overwrite-safe); the `.tmp-` prefix keeps
    * orphans invisible to readers and inside vacuum's sweep; a missing
    * or torn sidecar falls back to [[statFrames]] — the sidecar is an
    * optimization, never a correctness dependency.
    */
  def statSidecar(out: HPath): HPath =
    new HPath(out.getParent, ".tmp-stat-" + out.getName)

  def writeStatSidecar(fs: FileSystem, out: HPath, rows: Long,
      minTs: Long, maxTs: Long): Unit = {
    val o = fs.create(statSidecar(out), true)
    try { o.write(s"$rows $minTs $maxTs".getBytes("UTF-8")); o.close() }
    catch { case e: Throwable =>
      try o.close() catch { case _: Throwable => () }
      throw e }
  }

  def readStatSidecar(fs: FileSystem, out: HPath): Option[(Long, Long, Long)] =
    try {
      val in = fs.open(statSidecar(out))
      val text = try {
        val buf = new Array[Byte](128)
        val n = in.read(buf)
        if (n <= 0) return None
        new String(buf, 0, n, "UTF-8")
      } finally in.close()
      text.trim.split(' ') match {
        case Array(r, mn, mx) => Some((r.toLong, mn.toLong, mx.toLong))
        case _ => None
      }
    } catch {
      case _: java.io.IOException => None
      case _: NumberFormatException => None
    }

  /** One header-only pass over a frame file: (rows, minTs, maxTs) —
    * what the keyed-compaction commit needs to name and stat the sparse
    * product. (MaxValue, MinValue) ts sentinels when empty.
    */
  def statFrames(fs: FileSystem, p: HPath): (Long, Long, Long) = {
    val it = readHeaders(fs, p)
    try {
      var rows = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      while (it.hasNext) {
        val ts = it.next()._2
        rows += 1
        if (ts < mn) mn = ts
        if (ts > mx) mx = ts
      }
      (rows, mn, mx)
    } finally it.close()
  }

  /** Frame-level identity IGNORING timestamps: same (id, data) sequence.
    * The replay-idempotency check must use this, not raw byte equality —
    * a writer stamps wall-clock `ts` into frames when the input has no ts
    * column, so a replayed (byte-wise different) epoch still carries the
    * same logical records. Frame layout is fixed-width outside `data`, so
    * equal logical content implies equal file size (cheap prefilter).
    */
  def sameFrames(a: java.nio.file.Path, b: java.nio.file.Path): Boolean = {
    import java.nio.file.Files
    if (!Files.exists(a) || !Files.exists(b)) return false
    if (Files.size(a) != Files.size(b)) return false
    sameFrameStreams(read(a), read(b))
  }

  def sameFrames(fs: FileSystem, a: HPath, b: HPath): Boolean = {
    val (la, lb) =
      try (fs.getFileStatus(a).getLen, fs.getFileStatus(b).getLen)
      catch { case _: java.io.FileNotFoundException => return false }
    if (la != lb) return false
    sameFrameStreams(read(fs, a), read(fs, b))
  }

  private def sameHeaders(a: Headers, b: Headers): Boolean = {
    val la = if (a == null) 0 else a.length
    val lb = if (b == null) 0 else b.length
    if (la != lb) return false
    var i = 0
    while (i < la) {
      if (a(i)._1 != b(i)._1 ||
          !java.util.Arrays.equals(a(i)._2, b(i)._2)) return false
      i += 1
    }
    true
  }

  private def sameFrameStreams(ia: FrameIterator, ib: FrameIterator): Boolean =
    try {
      while (ia.hasNext && ib.hasNext) {
        val (idA, _, dataA) = ia.next()
        val (idB, _, dataB) = ib.next()
        if (idA != idB || !java.util.Arrays.equals(dataA, dataB) ||
            !sameHeaders(ia.headers, ib.headers)) return false
      }
      !ia.hasNext && !ib.hasNext
    } finally { ia.close(); ib.close() }
}

/** Durable file-backed log: one directory per topic/bucket containing
  * immutable offset-named segment files. Directory layout doubles as the
  * metadata registry the reference keeps in ZooKeeper
  * (`/<topic>/<bucket>/...` znode tree, `internal/lighthouse/io/io.go:55-156`).
  *
  * The `root` is a Hadoop filesystem URI (`file:/...`, `hdfs://nn/...`,
  * a bare POSIX path resolving against `fs.defaultFS`, …) — every metadata
  * and data operation goes through [[LogFs]], so a 1000-executor cluster
  * addresses one shared log over HDFS exactly as `local[32]` addresses a
  * temp directory. Per-filesystem semantics the protocol depends on:
  *
  *   - '''Atomic single-file rename''' — segment publish, manifest swap,
  *     intent/marker writes in RENAME mode. Real filesystems (local POSIX,
  *     HDFS) have it. Object stores that implement rename as copy+delete
  *     (S3A, GCS, …) do NOT — those schemes automatically run MANIFEST
  *     mode instead (see `manifestCommitMode`): data files land under
  *     unique names (an object PUT is atomic-visible at close, never torn)
  *     and become live only via a sequenced put-if-absent commit in the
  *     bucket's [[CommitLog]] — the public Delta/Iceberg commit pattern —
  *     so nothing there depends on rename atomicity.
  *   - '''Create-exclusive''' (the bucket `.lock`; every manifest-mode
  *     commit) — atomic on local (`O_EXCL` via `java.nio`, used whenever
  *     the scheme is `file`), on HDFS (namenode-serialized create), and on
  *     modern object stores (S3 conditional PUT `If-None-Match`, GCS
  *     generation preconditions, ABFS conditional create — all surfaced
  *     through `FileSystem.create(path, overwrite = false)`, refusing at
  *     create or at close). Manifest mode rests exclusion on the COMMIT
  *     create-exclusive, so the `.lock` there is only a contention
  *     throttle.
  *   - '''Rename-onto-existing''' — HDFS `rename` FAILS when the target
  *     exists, POSIX rename REPLACES it. Rename-mode segment publishes
  *     therefore go through [[FileTopicLog.publishNoReplace]], which is
  *     atomic fail-if-exists on BOTH (local: `java.nio` hard link; HDFS:
  *     the rename refusal itself) — never check-then-act. Replace-semantics
  *     writes (manifest, cursor, marker) go through [[renameOverwrite]],
  *     whose transient missing-target window is safe at every call site
  *     (a missing manifest/cursor only falls back to the authoritative
  *     listing / an earlier lower bound); manifest mode writes them as
  *     direct overwriting PUTs, which are already atomic-visible.
  */
/** One planned compaction merge, in plain strings so a distributed
  * strategy can ship it to an executor task: stream-concatenate `members`
  * (absolute segment paths, offset order) into `out`. `bytes` is the
  * total member payload — the routing input for a local-vs-distributed
  * threshold. Frames are length-prefixed with no file header/footer, so
  * the merge is a plain byte concatenation wherever it runs.
  */
case class ConcatTask(members: Seq[String], out: String, bytes: Long)

/** One planned KEY compaction rewrite, shippable to an executor task:
  * decode `members` ((absolute path, start offset), offset order), keep
  * the latest record per key, write the sparse product to `out` under
  * `codec` ([[SegmentCodec.rewriteLatestPerKey]]). `bytes` is total member
  * bytes — the local-vs-distributed routing input, same as [[ConcatTask]].
  */
case class KeyedTask(members: Seq[(String, Long)], out: String, bytes: Long,
  codec: Int, maxKeys: Int = SegmentCodec.DefaultKeyHeapEntries,
  tombstoneFloorMs: Long = Long.MinValue)

/** Weight-bounded string-keyed LRU for driver-side parsed metadata: total
  * weight (caller-defined, e.g. parsed entries held) is capped and the
  * least-recently-ACCESSED entries evict first. All operations are
  * synchronized on the map — these caches sit behind one small-file read
  * per miss, so lock cost is noise next to what a hit saves. A single
  * entry heavier than the whole cap is still served (and retained until
  * the next insert) — refusing it would just re-parse every call.
  */
private[log] final class BoundedLru[V <: AnyRef](maxWeight: Long, weigh: V => Long) {
  private var total = 0L
  private val m = new java.util.LinkedHashMap[String, (V, Long)](64, 0.75f, true)

  def get(k: String): Option[V] = m.synchronized(Option(m.get(k)).map(_._1))

  def put(k: String, v: V): Unit = m.synchronized {
    val w = math.max(1L, weigh(v))
    val old = m.put(k, (v, w))
    total += w - (if (old == null) 0L else old._2)
    val it = m.entrySet().iterator() // access order: eldest first
    while (total > maxWeight && it.hasNext) {
      val e = it.next()
      if (e.getKey != k) { total -= e.getValue._2; it.remove() }
    }
  }

  def remove(k: String): Unit = m.synchronized {
    val old = m.remove(k)
    if (old != null) total -= old._2
  }

  def removeIf(p: String => Boolean): Unit = m.synchronized {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (p(e.getKey)) { total -= e.getValue._2; it.remove() }
    }
  }

  def size: Int = m.synchronized(m.size)
  def weight: Long = m.synchronized(total)
}

object FileTopicLog {
  private val cache = scala.collection.concurrent.TrieMap.empty[String, FileTopicLog]

  /** Instrumentation: data bytes stream-copied by THIS JVM's local concat
    * path during segment compaction ([[FileTopicLog.localConcat]]). A
    * distributed compaction's executor-side copies never pass through
    * here, so a spec — and an operator reading driver metrics — can
    * assert a large merge moved ZERO data bytes through the driver (the
    * 100 TB contract for the `autoCompactSegments` sink option: the
    * driver owns manifests, never the byte relay).
    */
  val localConcatBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Shared instance per root URI. The log object is STATELESS — every
    * append/read/lock consults the filesystem — so sharing is safe, and
    * construction does real filesystem work (scheme guard, qualification,
    * root mkdirs) that connector planning would otherwise repeat dozens
    * of times per micro-batch trigger (measured: the capped-drain epoch
    * average grew ~80 ms when every `conf.log` call re-constructed).
    * Hadoop-conf sensitivity follows the [[LogFs]] cache discipline: the
    * first configuration for a root wins for the JVM's lifetime.
    */
  def cached(rootUri: String, hadoopConf: Configuration): FileTopicLog =
    cache.getOrElseUpdate(rootUri, new FileTopicLog(rootUri, hadoopConf))

  /** Pure half of [[FileTopicLog.byteFloors]] (size-based retention):
    * given one bucket's start-sorted `(startOffset, fileBytes)` segments,
    * the earliest retained offset such that the retained TRAILING whole
    * segments total at most `maxBytes` — None when nothing would expire.
    * Tail-first walk with the contiguous-prefix rule: the newest segment
    * always survives, and once a segment overflows the budget every OLDER
    * segment expires with it (a kept hole would violate the floor
    * contract). Property-tested against the brute-force suffix choice.
    */
  private[graft] def byteFloorWalk(segs: Seq[(Long, Long)],
      maxBytes: Long): Option[Long] = {
    if (segs.size <= 1) return None
    var acc = 0L
    var floor = segs.last._1
    var stopped = false
    segs.reverseIterator.zipWithIndex.foreach { case ((start, len), i) =>
      if (!stopped) {
        if (i == 0 || acc + len <= maxBytes) { acc += len; floor = start }
        else stopped = true
      }
    }
    if (floor == segs.head._1) None else Some(floor)
  }
}

// not final: tests subclass the nioCreateLink seam to drive the
// link-unsupported fallback (no FAT/exFAT mount exists in CI)
class FileTopicLog(rootUri: String, hadoopConf: Configuration) extends TopicLog {

  /** Local-path constructor (tests, single-node tools). */
  def this(root: java.nio.file.Path) = this(root.toString, new Configuration())

  private val scheme: String = {
    val u = new HPath(rootUri).toUri
    Option(u.getScheme).getOrElse(FileSystem.getDefaultUri(hadoopConf).getScheme)
  }

  /** Commit-protocol selection. Filesystems with atomic single-file rename
    * (local POSIX, HDFS) publish segments by rename under the bucket lock
    * ("rename" mode — the historical protocol below). Object stores that
    * rename by copy+delete (S3A, GCS, OSS, Azure blob drivers) instead run
    * "manifest" mode: data files land under unique names (atomic-visible
    * at close — an object PUT never appears torn) and become live only via
    * a sequenced put-if-absent commit in the bucket's [[CommitLog]], so no
    * step ever depends on rename atomicity or on lock soundness. Override
    * auto-detection with `graft.log.commitProtocol` = `rename` | `manifest`
    * (forcing `rename` onto an object store re-accepts the torn-write risk
    * the removed `graft.log.allowNonAtomicRename` flag used to label).
    */
  val manifestCommitMode: Boolean =
    hadoopConf.get("graft.log.commitProtocol", "auto") match {
      case "manifest" => true
      case "rename"   => false
      case "auto" =>
        // Azure included: wasb/wasbs rename is not atomic, and abfs/abfss
        // only on hierarchical-namespace accounts — HNS operators who want
        // rename mode set graft.log.commitProtocol=rename explicitly.
        hadoopConf.getTrimmedStrings(
          "graft.log.nonAtomicRenameSchemes", "s3", "s3a", "s3n", "gs", "oss",
          "cos", "swift", "wasb", "wasbs", "abfs", "abfss").contains(scheme)
      case other => throw new IllegalArgumentException(
        s"graft.log.commitProtocol must be auto|rename|manifest, got '$other'")
    }

  val fs: FileSystem = LogFs.get(new HPath(rootUri), hadoopConf)
  val root: HPath = fs.makeQualified(new HPath(rootUri))
  private val isLocal = scheme == "file"
  fs.mkdirs(root)

  private def toNio(p: HPath): java.nio.file.Path = java.nio.file.Paths.get(p.toUri)

  def bucketDir(tb: TopicBucket): HPath = new HPath(new HPath(root, tb.topic), tb.bucket)

  private def manifestPath(tb: TopicBucket): HPath =
    new HPath(bucketDir(tb), SegmentCodec.ManifestName)

  /** Manifest mode: the bucket's sequenced commit log (authoritative
    * segment view). Instances are stateless beyond config; cached to avoid
    * re-allocating per planning call.
    */
  private val commitLogs = scala.collection.concurrent.TrieMap.empty[TopicBucket, CommitLog]
  private val ckInterval = hadoopConf.getInt("graft.log.commitCheckpointInterval", 64)
  private[graft] def commitLog(tb: TopicBucket): CommitLog =
    commitLogs.getOrElseUpdate(tb,
      new CommitLog(fs, new HPath(bucketDir(tb), ".commitlog"), ckInterval))

  /** Unique data-file name for a manifest-mode segment: self-describing for
    * operators, but NOT `seg-`-parsable — uncommitted files must stay
    * invisible to any listing-based view (a misconfigured rename-mode
    * reader on the same root would otherwise double-count). The embedded
    * start offset is ADVISORY only — [[SegMeta]] carries (start, count)
    * authoritatively, which is what lets a lost commit race re-commit the
    * already-written file under a fresh start instead of rewriting it
    * ([[append]]). The FULL UUID is deliberate: two appenders racing the
    * same start must never collide on the name, or the commit winner would
    * publish a segment whose bytes are the loser's rows.
    */
  private def uniqueDataName(start: Long, count: Long): String =
    f"data-$start%020d-$count%010d-${java.util.UUID.randomUUID()}.log"

  def fileLen(p: HPath): Long =
    try fs.getFileStatus(p).getLen catch { case _: java.io.IOException => 0L }

  /** tmp + rename with replace semantics on every filesystem: POSIX rename
    * replaces natively; HDFS rename refuses an existing target, so the
    * target is deleted first — a transient not-there window each call site
    * explicitly tolerates (see class scaladoc).
    */
  private def renameOverwrite(src: HPath, dst: HPath): Unit =
    if (!fs.rename(src, dst)) {
      fs.delete(dst, false)
      if (!fs.rename(src, dst)) {
        fs.delete(src, false)
        throw new java.io.IOException(s"rename $src -> $dst failed twice")
      }
    }

  private[graft] def writeFileAtomic(path: HPath, bytes: Array[Byte]): Unit = {
    val parent = path.getParent
    fs.mkdirs(parent)
    if (manifestCommitMode) {
      // object-store PUT is atomic-visible at close (never torn), so a
      // direct overwrite IS the atomic replace — tmp+rename would add a
      // copy+delete and a non-atomic window
      val out = fs.create(path, true)
      try { out.write(bytes); out.close() }
      catch { case e: Throwable => try out.close() catch { case _: Throwable => () }; throw e }
      return
    }
    val tmp = new HPath(parent, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try { out.write(bytes); out.close() }
    catch { case e: Throwable => try fs.delete(tmp, false) catch { case _: Throwable => () }; throw e }
    try renameOverwrite(tmp, path)
    catch { case e: Throwable =>
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      throw e
    }
  }

  private[graft] def readFileUtf8(path: HPath): String =
    new String(readFileBytes(path), java.nio.charset.StandardCharsets.UTF_8)

  private def readFileBytes(path: HPath): Array[Byte] = {
    val in = fs.open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  private def readLines(path: HPath): Seq[String] =
    new String(readFileBytes(path), java.nio.charset.StandardCharsets.UTF_8)
      .split('\n').toSeq

  /** Parsed-metadata cache (round-14): the warm timestamp seek — and every
    * other metadata read on a hot planning path — was O(segments) PARSE
    * per call, because each call re-read and re-split the manifest and
    * `.tsidx` lines (the q154w probe honestly measured ~10× at 10×
    * segments). Both files are replaced ATOMICALLY by every mutation
    * (tmp+rename, or whole-object PUT in manifest mode), so
    * (modificationTime, length) identifies a snapshot: a matching stat
    * serves the parsed form, any mismatch re-reads and re-parses — one
    * getFileStatus per call instead of a full read+parse. The cache is
    * correctness-neutral: it only skips re-parsing byte-identical
    * content; missing/torn-file read-repair takes the uncached path
    * exactly as before, and a parse failure is never cached.
    *
    * BOUNDED (round-15): weight = parsed entries held (one per segment
    * line), capped at [[metaCacheMaxWeight]] with LRU eviction — a
    * long-lived driver planning over 10^4 buckets × 10^3+ segments must
    * not accumulate the parsed metadata plane of the whole deployment on
    * its heap. Eviction is correctness-free by construction: a miss
    * re-reads and re-parses exactly like a cold call. Entries for a
    * deleted topic are dropped eagerly via [[invalidateTopicCaches]].
    *
    * Stamp identity assumption: (mtime, length) distinguishes rewrites
    * only down to the filesystem's mtime granularity (1 s on ext3/some
    * object stores, 1 ms through Hadoop's RawLocalFileSystem, ns on
    * ext4/XFS native). Two atomic same-length rewrites inside one tick
    * could alias; the post-read re-stat below narrows the torn window to
    * exactly that granularity, and every cached file here is a derived
    * cache (.tsidx) or carries a same-content invariant (manifest rewrites
    * under the bucket lock), so an alias serves bytes one tick stale at
    * worst — never an uncommitted view.
    */
  private[graft] def metaCacheMaxWeight: Long = 1L << 20 // def: test seam
  private val parsedMetaCache =
    new BoundedLru[(Long, Long, AnyRef)](metaCacheMaxWeight, _._3 match {
      case s: Seq[_]                    => s.size.toLong
      case m: scala.collection.Map[_, _] => m.size.toLong
      case _                            => 1L
    })

  /** Drop every cached parse and seek index belonging to `topic` — called
    * by topic deletion so a long-lived driver does not pin dead metadata
    * until LRU pressure happens to reach it.
    */
  def invalidateTopicCaches(topic: String): Unit = {
    val prefix = new HPath(root, topic).toString + "/"
    parsedMetaCache.removeIf(_.startsWith(prefix))
    seekIndexCache.removeIf(_.startsWith(topic + "/"))
  }

  /** Cache introspection for specs: (entries, weight) over both caches. */
  private[graft] def metaCacheEntries: Int =
    parsedMetaCache.size + seekIndexCache.size
  private[graft] def metaCacheWeight: Long =
    parsedMetaCache.weight + seekIndexCache.weight

  /** None when `path` does not exist (callers keep their fallback);
    * parse failures propagate uncached.
    */
  private def cachedParse[A <: AnyRef](path: HPath)(parse: Array[Byte] => A): Option[A] = {
    val key = path.toString
    val st =
      try fs.getFileStatus(path)
      catch { case _: java.io.FileNotFoundException =>
        parsedMetaCache.remove(key); return None }
    parsedMetaCache.get(key) match {
      case Some((mt, len, v)) if mt == st.getModificationTime && len == st.getLen =>
        Some(v.asInstanceOf[A])
      case _ =>
        val bytes =
          try readFileBytes(path)
          catch { case _: java.io.FileNotFoundException =>
            parsedMetaCache.remove(key); return None }
        val parsed = parse(bytes)
        // cache only when the stamp is UNCHANGED after the read: a rewrite
        // landing in the stat→read window would otherwise pair the old
        // stamp with new content and serve it until the next mutation
        val unchanged =
          try {
            val st2 = fs.getFileStatus(path)
            st2.getModificationTime == st.getModificationTime && st2.getLen == st.getLen
          } catch { case _: java.io.FileNotFoundException => false }
        if (unchanged)
          parsedMetaCache.put(key, (st.getModificationTime, st.getLen, parsed))
        else parsedMetaCache.remove(key)
        Some(parsed)
    }
  }

  private def listStatus(dir: HPath): Array[FileStatus] =
    try fs.listStatus(dir)
    catch { case _: java.io.FileNotFoundException => Array.empty }

  private def checkNoOverlap(tb: TopicBucket, segs: Seq[(HPath, Long, Long)]): Seq[(HPath, Long, Long)] = {
    segs.sliding(2).foreach {
      case Seq((_, s1, c1), (p2, s2, _)) if s1 + c1 > s2 =>
        throw new IllegalStateException(
          s"overlapping segments in ${tb.path}: [$s1,+$c1) overlaps $p2 " +
            "(single-writer-per-bucket contract violated)")
      case _ =>
    }
    segs
  }

  /** AUTHORITATIVE segment view: a directory listing. The write path (offset
    * assignment) and manifest refresh use this; the read-planning path goes
    * through [[segments]], which prefers the per-bucket manifest — at 100 TB
    * a bucket holds millions of segment files and listing it per micro-batch
    * trigger is the planning bottleneck (the reference keeps this metadata
    * in its ZK tree, `internal/lighthouse/io/io.go:55-156`, for the same
    * reason).
    */
  def segmentsListed(tb: TopicBucket): Seq[(HPath, Long, Long)] =
    checkNoOverlap(tb, segmentsRaw(tb))

  /** Authoritative segment view WITHOUT the overlap check — for the publish
    * path's overlap arbitration, which must be able to observe a transient
    * overlap in order to resolve it (the checked views throw on one).
    * Rename mode: a directory listing. Manifest mode: the committed state
    * (the listing would see uncommitted data files, which are by definition
    * not part of the log).
    */
  def segmentsRaw(tb: TopicBucket): Seq[(HPath, Long, Long)] =
    if (manifestCommitMode) {
      val dir = bucketDir(tb)
      commitLog(tb).read().segs.map(s => (new HPath(dir, s.name), s.start, s.count))
    } else segmentStatusRaw(tb).map { case (st, s, c) => (st.getPath, s, c) }

  private def segmentStatusRaw(tb: TopicBucket): Seq[(FileStatus, Long, Long)] =
    listStatus(bucketDir(tb)).iterator.flatMap { st =>
      SegmentCodec.parse(st.getPath.getName).map { case (s, c) => (st, s, c) }
    }.toSeq.sortBy(_._2)

  /** Published segments, sorted by start offset: (path, start, count).
    * Gaps are legal (retention); OVERLAPS are not — they mean the
    * single-writer-per-bucket contract was violated and reads would
    * double-count, so fail loudly instead.
    *
    * Reads the bucket manifest when present (one small-file read instead of
    * a directory listing); every publish/retention path rewrites the
    * manifest atomically, so a missing or torn manifest only ever falls
    * back to the authoritative listing.
    */
  def segments(tb: TopicBucket): Seq[(HPath, Long, Long)] = {
    if (manifestCommitMode) return segmentsListed(tb) // commit log IS the manifest
    val m = manifestPath(tb)
    val dir = bucketDir(tb)
    try {
      // parsed + overlap-checked form cached by (mtime, length) — a hot
      // planner (seek per trigger, describe, pruning) stops re-splitting
      // O(segments) lines per call; any manifest rewrite re-parses
      cachedParse[Seq[(HPath, Long, Long)]](m) { bytes =>
        val names = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .split('\n').toSeq
        val segs = new mutable.ArrayBuffer[(HPath, Long, Long)](names.size)
        names.foreach { name =>
          if (name.nonEmpty) SegmentCodec.parse(name) match {
            case Some((s, c)) => segs += ((new HPath(dir, name), s, c))
            case None         => // torn/garbage line → distrust the whole file
              throw new java.io.IOException(s"bad manifest line: $name")
          }
        }
        checkNoOverlap(tb, segs.sortBy(_._2).toSeq)
      }.getOrElse(segmentsListed(tb))
    } catch {
      // any read/parse failure (missing manifest, torn write, bit rot,
      // NumberFormatException from a seg-prefixed-but-garbled name) →
      // authoritative listing; overlap violations must still propagate
      case e: IllegalStateException => throw e
      case scala.util.control.NonFatal(_) => segmentsListed(tb)
    }
  }

  /** Crashed-holder takeover threshold. Bucket critical sections are
    * metadata-only (directory listing + renames); the bound must cover the
    * slowest listing, not typical cost. A section that somehow outlives
    * this loses exclusion — the owner-token release below at least keeps a
    * late finisher from unlocking the NEW holder.
    */
  private val LockStaleMs = 300000L

  /** Atomically create the lock file carrying `token`, failing if it
    * exists. Local filesystems go through `java.nio` `Files.createFile`
    * (true `O_EXCL` — Hadoop's `RawLocalFileSystem.create(overwrite=false)`
    * is check-then-act, which would let two same-host drivers both take the
    * lock); HDFS relies on the namenode-serialized exclusive create.
    */
  private def createLockExclusive(lock: HPath, token: Array[Byte]): Unit =
    if (isLocal) {
      val nioLock = toNio(lock)
      java.nio.file.Files.createFile(nioLock) // atomic create-exclusive
      // token write is a second step: if it fails (disk full, interrupt)
      // release the just-created lock instead of orphaning an ownerless
      // one for the whole staleness window. A process death BETWEEN the
      // two calls still orphans it — the stale steal is the backstop.
      try java.nio.file.Files.write(nioLock, token)
      catch { case e: Throwable => java.nio.file.Files.deleteIfExists(nioLock); throw e }
    } else {
      val out = fs.create(lock, false)
      try { out.write(token); out.close() }
      catch {
        // conditional-PUT stores surface the exclusivity refusal at CLOSE,
        // not create — that loss must NOT delete the winner's lock
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          try { out.close() } catch { case _: Throwable => () }
          throw e
        case e: Throwable =>
          try { out.close() } catch { case _: Throwable => () }
          try fs.delete(lock, false) catch { case _: Throwable => () }
          throw e
      }
    }

  /** Exclusive cross-driver mutation lock for one bucket: atomic
    * create-exclusive of `.lock` in the bucket directory, stolen if the
    * holder crashed (mtime older than `LockStaleMs`). The filesystem
    * rendering of the reference's per-bucket single-writer election
    * (`internal/lighthouse/election/election.go:50-79`, ZK ephemeral
    * nodes): offset assignment + segment rename (publish) and
    * manifest-rewrite + delete (retention) must each be one critical
    * section per bucket — a check-after-publish arbitration has an
    * unfixable hole, because a writer that verified-then-returned cannot
    * yield retroactively when a second writer publishes an overlapping
    * segment a moment later.
    *
    * Steal is ATOMIC: the stale lock is renamed to a unique name first, so
    * of N waiters that all observed staleness exactly one wins the rename;
    * the losers' decisions die with the failed rename — a plain
    * delete-then-create steal lets a slow loser delete the winner's FRESH
    * lock (check-then-act). Release deletes the lock only if it still
    * holds our owner token, which NARROWS (a filesystem has no
    * compare-and-delete, so it cannot fully close) the window where a
    * section that outlived LockStaleMs unlocks its usurper; long holders
    * should call [[touchBucketLock]] between sub-steps to refresh the
    * staleness clock.
    */
  def withBucketLock[A](tb: TopicBucket)(body: => A): A = {
    val dir = bucketDir(tb)
    val lock = new HPath(dir, ".lock")
    val token = java.util.UUID.randomUUID().toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
    var held = false
    while (!held) {
      try {
        createLockExclusive(lock, token)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          try {
            if (System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime > LockStaleMs) {
              val claimed = new HPath(dir, s".lock-stale-${java.util.UUID.randomUUID()}")
              if (fs.rename(lock, claimed)) // one winner
                fs.delete(claimed, false)
            }
          } catch { case _: java.io.FileNotFoundException => () } // lost or released
          Thread.sleep(5 + scala.util.Random.nextInt(20).toLong)
      }
    }
    try body finally {
      try {
        if (java.util.Arrays.equals(readFileBytes(lock), token))
          fs.delete(lock, false)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Heartbeat for a held bucket lock: refresh its staleness clock. Call
    * between the sub-steps of a long critical section (directory listings
    * at large segment counts) so a live holder is not mistaken for a
    * crashed one.
    */
  def touchBucketLock(tb: TopicBucket): Unit =
    try fs.setTimes(new HPath(bucketDir(tb), ".lock"), System.currentTimeMillis(), -1L)
    catch { case _: java.io.IOException => () }

  /** Atomically rewrite the bucket manifest from the directory listing.
    * Called after every publish/retention mutation; concurrent refreshes
    * are safe (each writes a full self-consistent snapshot via tmp +
    * atomic rename, and a lost update is re-healed by the next mutation).
    */
  def refreshManifest(tb: TopicBucket): Unit = {
    if (manifestCommitMode) return // the commit log is authoritative; no snapshot file
    if (!dirExists(bucketDir(tb))) return
    // raw listing: a transient overlap (another writer mid-arbitration) must
    // not abort THIS writer's refresh; readers still get the checked view.
    val names = segmentsRaw(tb).map(_._1.getName)
    // best-effort: a lost refresh is re-healed by the next mutation, and
    // readers fall back to the authoritative listing on a missing manifest
    try writeFileAtomic(manifestPath(tb),
      names.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () }
  }

  private def dirExists(p: HPath): Boolean =
    try fs.getFileStatus(p).isDirectory catch { case _: java.io.FileNotFoundException => false }

  override def size(tb: TopicBucket): Long = {
    val segs = segments(tb)
    if (segs.isEmpty) 0L else segs.map { case (_, s, c) => s + c }.max
  }

  /** Earliest RETAINED offset: the start of the first surviving segment
    * (retention deletes whole head segments, so everything below this is
    * gone), 0 for a never-written bucket. The read-side truncation floor the
    * connector's data-loss guard compares resume offsets against — the
    * analog of Kafka's per-partition `earliest`, which the reference cannot
    * express at all (it retains forever in RAM, `core.go:45` TODO).
    */
  def firstOffset(tb: TopicBucket): Long =
    segments(tb).headOption.map(_._2).getOrElse(0L)

  /** End offset from the authoritative listing — what offset assignment on
    * the write path must use (a lagging manifest must never cause a writer
    * to hand out overlapping offsets).
    */
  def endOffsetListed(tb: TopicBucket): Long = {
    val segs = segmentsRaw(tb) // max() needs no overlap check
    if (segs.isEmpty) 0L else segs.map { case (_, s, c) => s + c }.max
  }

  // --- timestamp seek ------------------------------------------------------

  private def tsIndexPath(tb: TopicBucket): HPath =
    new HPath(bucketDir(tb), ".tsidx")

  /** `.tsidx` cache: one `<segmentName> <minTsMillis> <maxTsMillis>` line
    * per segment. Pure read-repair cache — correctness never depends on it
    * (a missing, stale, or torn file only costs a bounded frame re-scan),
    * so it is written best-effort with overwrite semantics and parsed
    * tolerantly (malformed lines are recomputed). Keyed by segment NAME:
    * retention deletes and in-place compaction both produce new names, so
    * stale entries simply stop matching and are dropped at the next
    * rewrite.
    */
  private def readTsIndex(tb: TopicBucket): Map[String, (Long, Long)] =
    try cachedParse[Map[String, (Long, Long)]](tsIndexPath(tb)) { bytes =>
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').iterator.flatMap { ln =>
          ln.split(' ') match {
            case Array(name, mn, mx) =>
              try Some(name -> (mn.toLong, mx.toLong))
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap
    }.getOrElse(Map.empty)
    catch { case _: java.io.IOException => Map.empty }

  /** (min, max) frame timestamp of one segment, skipping payload bytes
    * (frames must be walked — the format has no footer — but the data
    * bytes are never materialized).
    */
  private def segTsRange(path: HPath): (Long, Long) = {
    // the shared header-only walk (payload bytes seeked past, extended/
    // compressed frames handled) — not a hand-rolled v1 parser
    val it = SegmentCodec.readHeaders(fs, path)
    try {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      while (it.hasNext) {
        val ts = it.next()._2
        if (ts < mn) mn = ts
        if (ts > mx) mx = ts
      }
      (mn, mx)
    } finally it.close()
  }

  /** Record publish-time (min, max) frame-ts stats for freshly published
    * segments, sparing readers the one-time backfill frame scan — the
    * writer already has every timestamp in hand, so this is free. Same
    * cache discipline as [[tsStats]]' rewrite: best-effort read-modify-
    * write with overwrite semantics (a lost race or failed write only
    * re-opens the read-repair path); stale names are pruned by the next
    * [[tsStats]] rewrite, not here.
    */
  def recordTsStats(tb: TopicBucket, entries: Map[String, (Long, Long)]): Unit = {
    if (entries.isEmpty) return
    val merged = readTsIndex(tb) ++ entries
    try writeFileAtomic(tsIndexPath(tb),
      merged.toSeq.sortBy(_._1)
        .map { case (n, (mn, mx)) => s"$n $mn $mx" }.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () } // cache only
  }

  /** Per-segment (minTsMillis, maxTsMillis) for `segs`, served from the
    * `.tsidx` read-repair cache — the topic-log analog of parquet footer
    * stats. Segments the cache has not seen are frame-scanned once and
    * the cache rewritten (amortized O(new segments)); consumers are the
    * timestamp seek, the connector's ts-predicate segment pruning, and
    * the metadata MIN/MAX(ts) aggregate pushdown.
    */
  def tsStats(tb: TopicBucket,
      segs: Seq[(HPath, Long, Long)]): Map[String, (Long, Long)] = {
    if (segs.isEmpty) return Map.empty
    val cached = readTsIndex(tb)
    var repaired = Map.empty[String, (Long, Long)]
    val out = segs.map { case (p, _, _) =>
      val n = p.getName
      n -> cached.getOrElse(n, {
        val r = segTsRange(p)
        repaired += (n -> r)
        r
      })
    }.toMap
    if (repaired.nonEmpty) {
      val names = segs.map(_._1.getName).toSet
      val all = cached.filter { case (n, _) => names.contains(n) } ++ repaired
      try writeFileAtomic(tsIndexPath(tb),
        all.toSeq.sortBy(_._1)
          .map { case (n, (mn, mx)) => s"$n $mn $mx" }.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case scala.util.control.NonFatal(_) => () } // cache only
    }
    out
  }

  /** Earliest offset whose record timestamp is `>= tsMillis` — the analog
    * of Kafka's `offsetsForTimes` seek, which the reference cannot express
    * (its replay cursor is offset-only, `core.go:46-64`). Returns the
    * bucket END offset when no record qualifies, and never resolves below
    * the retention floor (only surviving segments are searched), so a
    * timestamp predating retention means "earliest retained" — the same
    * contract as Kafka's `earliest` resolution.
    *
    * Correct for OUT-OF-ORDER record timestamps: the search runs over the
    * running max of per-segment max timestamps, which is monotone by
    * construction — the first offset where the running max reaches
    * `tsMillis` IS the first record with `ts >= tsMillis`, whatever the
    * ordering (Kafka's time-index argument). Cost at scale: per-segment
    * max-ts values come from the `.tsidx` read-repair cache, so a seek
    * over a 10^4-segment bucket reads one small cache file plus the frames
    * of the ONE boundary segment (plus a one-time backfill scan of
    * segments the cache has not seen — amortized O(new segments)).
    */
  /** Derived seek structure: the bucket's sorted segments plus the running
    * max of per-segment max timestamps, cached against the (mtime, length)
    * stamps of the manifest and `.tsidx` — any mutation replaces one of
    * the two files atomically, so a matching pair of stamps means the
    * index is current. Makes the WARM seek O(log segments) + one boundary
    * segment walk (two getFileStatus calls, a binary search, no O(N)
    * re-parse or map build per call) — the round-13 q154w probe measured
    * the previous per-call O(segments) parse at ~10× cost per 10×
    * segments, real planner overhead under a seek-per-trigger pattern at
    * 10^5 segments.
    */
  private case class SeekIndex(manifestStamp: (Long, Long),
      tsidxStamp: (Long, Long), segs: Seq[(HPath, Long, Long)],
      runMax: Array[Long])

  private val seekIndexCache =
    new BoundedLru[SeekIndex](metaCacheMaxWeight, _.segs.size.toLong)

  private def metaStamp(p: HPath): (Long, Long) =
    try { val st = fs.getFileStatus(p); (st.getModificationTime, st.getLen) }
    catch { case _: java.io.FileNotFoundException => (-1L, -1L) }

  def offsetForTimestamp(tb: TopicBucket, tsMillis: Long): Long =
    offsetForTimestamp(tb, tsMillis, retriesLeft = 3)

  private def offsetForTimestamp(tb: TopicBucket, tsMillis: Long,
      retriesLeft: Int): Long = {
    // stamps taken BEFORE any data is read: a mutation landing between
    // these stats and the reads below makes the built entry look stale on
    // its next lookup (the stamp predates the mutation) instead of
    // freshly-stamping a stale segment list over it
    val mStamp = metaStamp(manifestPath(tb))
    val tStamp = metaStamp(tsIndexPath(tb))
    val idx = seekIndexCache.get(tb.path) match {
      // cache only when BOTH stamps are live (a rename-mode bucket with a
      // manifest and a populated .tsidx — the steady state; manifest mode
      // and legacy listing-backed buckets rebuild per call as before)
      case Some(i) if mStamp._1 >= 0 && tStamp._1 >= 0 &&
          i.manifestStamp == mStamp && i.tsidxStamp == tStamp => i
      case _ =>
        val segs = segments(tb)
        if (segs.isEmpty) return 0L
        val stats = tsStats(tb, segs) // may backfill + rewrite .tsidx
        val runMax = new Array[Long](segs.size)
        var mx = Long.MinValue
        var i = 0
        segs.foreach { case (p, _, _) =>
          val m = stats(p.getName)._2
          if (m > mx) mx = m
          runMax(i) = mx
          i += 1
        }
        // the .tsidx alone is re-statted (tsStats' repair path legitimately
        // rewrote it just now); the MANIFEST stamp must still equal the
        // pre-read one — if it moved, a concurrent append/compaction/
        // retention mutated the segment list mid-build, so serve the built
        // index once but do NOT cache it
        val tStamp2 = metaStamp(tsIndexPath(tb))
        val built = SeekIndex(mStamp, tStamp2, segs, runMax)
        if (mStamp._1 >= 0 && tStamp2._1 >= 0 &&
            metaStamp(manifestPath(tb)) == mStamp)
          seekIndexCache.put(tb.path, built)
        built
    }
    // Binary search the running max (monotone by construction): the first
    // segment where it reaches tsMillis holds the globally-first frame
    // with ts >= tsMillis, whatever the record-timestamp ordering
    // (Kafka's time-index argument; see the running-max note above).
    var lo = 0
    var hi = idx.runMax.length - 1
    if (idx.runMax(hi) < tsMillis) // nothing qualifies → bucket end
      return idx.segs.map { case (_, s, c) => s + c }.max
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (idx.runMax(mid) >= tsMillis) hi = mid else lo = mid + 1
    }
    val (p, start, _) = idx.segs(lo)
    var answer = -1L
    val fit = // headers only: the walk needs ts, never payload bytes
      try SegmentCodec.readHeaders(fs, p)
      catch {
        case e: java.io.FileNotFoundException =>
          // the boundary segment vanished under a stale cached index
          // (compaction/retention replaced it after the entry was built):
          // invalidate and re-resolve from fresh metadata
          seekIndexCache.remove(tb.path)
          if (retriesLeft <= 0) throw new java.io.IOException(
            s"seek in ${tb.path} kept resolving to vanished segments — " +
              "metadata churn outran 3 retries", e)
          return offsetForTimestamp(tb, tsMillis, retriesLeft - 1)
      }
    try {
      var cur = start - 1
      while (answer < 0 && fit.hasNext) {
        val (_, ts, _) = fit.next()
        // sparse-aware cursor rule: an explicit frame offset (key-compacted
        // segment) sets the cursor, a positional frame increments it
        cur = if (fit.explicitOffset >= 0) fit.explicitOffset else cur + 1
        if (ts >= tsMillis) answer = cur
      }
    } finally fit.close()
    // the boundary segment's cached maxTs promised a qualifying frame; a
    // vanished promise means the stats lied (torn cache) — re-repair
    if (answer >= 0) answer
    else {
      seekIndexCache.remove(tb.path)
      val segs = segments(tb)
      val stats = tsStats(tb, segs.filter(_._1.getName == p.getName))
      if (stats.get(p.getName).exists(_._2 >= tsMillis))
        throw new IllegalStateException(
          s"seek invariant violated in ${tb.path}: segment ${p.getName} " +
            s"stats promise ts >= $tsMillis but no frame qualifies")
      if (retriesLeft <= 0) throw new java.io.IOException(
        s"seek in ${tb.path} kept hitting lying segment stats — " +
          "metadata churn outran 3 retries")
      offsetForTimestamp(tb, tsMillis, retriesLeft - 1)
    }
  }

  /** Frame timestamp of the record at `offset` — one bounded segment
    * walk; None when the offset sits below the retention floor or at/after
    * the end. Powers consumer TIME lag (`now − ts(first unconsumed)`,
    * Kafka's consumer time-lag definition) in
    * [[graft.api.Ripple.consumerStatus]].
    */
  def timestampAt(tb: TopicBucket, offset: Long): Option[Long] =
    segments(tb).find { case (_, s, c) => offset >= s && offset < s + c }
      .flatMap { case (p, s, _) =>
        // headers only (no payload/decompress cost); sparse-aware: the
        // answer is the first record AT-OR-AFTER `offset` — identical for
        // dense segments, and for a key-compacted one it is the first
        // record the consumer would actually read next. A sparse tail gap
        // (all retained offsets < `offset`) reads as None, same as "no
        // stamp available".
        val it = SegmentCodec.readHeaders(fs, p)
        try {
          var cur = s - 1
          var found: Option[Long] = None
          while (found.isEmpty && it.hasNext) {
            val (_, t, _) = it.next()
            cur = if (it.explicitOffset >= 0) it.explicitOffset else cur + 1
            if (cur >= offset) found = Some(t)
          }
          found
        } finally it.close()
      }

  override def append(tb: TopicBucket, rows: Seq[Payload]): Long = {
    val now = System.currentTimeMillis()
    val stamped = rows.map(p => (p, now))
    fs.mkdirs(bucketDir(tb))
    if (manifestCommitMode) {
      // tail append by optimistic commit: losing the put-if-absent race
      // just means re-reading the new end offset and retrying — no lock
      // needed (and none trusted: object-store locks are advisory). The
      // data file is PUT exactly once: its name's embedded start offset is
      // advisory ([[uniqueDataName]]) while SegMeta carries (start, count)
      // authoritatively, so a lost race costs one small manifest PUT — a
      // metadata-only re-commit under the fresh start — never a segment
      // DELETE + rewrite (which under the multi-appender pattern would
      // make contention cost O(segment bytes) per retry).
      if (rows.isEmpty) return commitLog(tb).read().endOffset
      val cl = commitLog(tb)
      var attempt = 0
      var data: HPath = null
      while (true) {
        val st = cl.read()
        val start = st.endOffset
        if (data == null) {
          data = new HPath(bucketDir(tb), uniqueDataName(start, rows.size.toLong))
          SegmentCodec.write(fs, data, stamped)
        }
        if (cl.tryCommit(st, Seq(SegMeta(data.getName, start, rows.size.toLong)), Set.empty).isDefined) {
          recordTsStats(tb, Map(data.getName -> (now, now)))
          return start
        }
        attempt += 1
        if (attempt > 200) {
          // giving up: remove the never-committed data file (vacuum would
          // sweep it eventually, but a loud failure should not leak)
          try fs.delete(data, false) catch { case _: java.io.IOException => () }
          throw new java.io.IOException(
            s"append to ${tb.path} lost the commit race $attempt times — " +
              "pathological contention; shard the topic or batch the writes")
        }
        Thread.sleep(scala.util.Random.nextInt(1 << math.min(attempt, 6)).toLong)
      }
      throw new IllegalStateException("unreachable")
    } else withBucketLock(tb) {
      // lock: two concurrent appenders must not read the same end offset
      appendAt(tb, endOffsetListed(tb), stamped)
    }
  }

  /** Idempotent positional append: publish a segment starting at `start`.
    * If that segment already exists WITH THE SAME RECORDS (epoch retry),
    * the call is a no-op; an existing segment with DIFFERENT content means
    * the single-writer contract was violated (two holders assigned the
    * same offsets — e.g. a stalled holder resuming after a stale-lock
    * steal) and fails loudly — a silent no-op there would VANISH this
    * call's rows. The identity check is frame-level and
    * timestamp-insensitive ([[SegmentCodec.sameFrames]] semantics) and
    * costs a segment read only on the exists path (crash retries and
    * violations), never on the publish fast path. Returns `start`.
    */
  def appendAt(tb: TopicBucket, start: Long, rows: Seq[(Payload, Long)]): Long = {
    if (rows.isEmpty) return start
    val dir = bucketDir(tb)
    fs.mkdirs(dir)
    // publish-time ts stats: the rows are in hand, so the read side never
    // pays the .tsidx backfill scan for this segment
    def stamp(name: String): Unit =
      recordTsStats(tb, Map(name -> (rows.iterator.map(_._2).min,
        rows.iterator.map(_._2).max)))
    if (manifestCommitMode) {
      var published: Option[String] = None
      val used = manifestPublish(tb, start, rows.size.toLong)(
        materialize = q => {
          SegmentCodec.write(fs, q, rows); published = Some(q.getName) })(
        sameAs = committed => sameAsRows(committed, rows))
      if (used) published.foreach(stamp)
      return start
    }
    val target = new HPath(dir, SegmentCodec.segmentName(start, rows.size.toLong))
    def requireSameContent(): Unit =
      if (!sameAsRows(target, rows))
        throw new IllegalStateException(
          s"segment $target already exists with DIFFERENT records — two " +
            "writers assigned the same offsets (single-writer-per-bucket " +
            "contract violated); refusing the silent row loss")
    if (!fs.exists(target)) {
      val tmp = new HPath(dir, s".tmp-${java.util.UUID.randomUUID()}")
      SegmentCodec.write(fs, tmp, rows)
      // no-replace publish on EVERY scheme (see publishNoReplace); a
      // refusal means a concurrent winner holds the name — benign only
      // when it carries the same records.
      if (!publishNoReplace(tmp, target)) {
        try requireSameContent() finally fs.delete(tmp, false)
      } else stamp(target.getName)
    } else requireSameContent()
    refreshManifest(tb)
    start
  }

  /** Frame-level identity of an existing segment against in-memory rows:
    * same (id, data) sequence, timestamps ignored (the
    * [[SegmentCodec.sameFrames]] discipline — a replayed epoch re-stamps
    * wall-clock ts). A missing/unreadable target compares unequal.
    */
  private def sameAsRows(target: HPath, rows: Seq[(Payload, Long)]): Boolean =
    try {
      val it = SegmentCodec.read(fs, target)
      try {
        var i = 0
        while (it.hasNext && i < rows.size) {
          val (id, _, data) = it.next()
          val p = rows(i)._1
          // null == tombstone on both sides; Arrays.equals(null, null) holds
          if (id != p.id || !java.util.Arrays.equals(data, p.data)) return false
          i += 1
        }
        !it.hasNext && i == rows.size
      } finally it.close()
    } catch { case _: java.io.IOException => false }

  /** Manifest-mode positional publish: make a segment covering
    * `[start, start+count)` live via a sequenced put-if-absent commit.
    * `materialize(p)` must produce the frame file at the unique path `p`
    * (direct write or a move of a staged file — the path is invisible to
    * readers until committed, so neither needs atomicity); `sameAs(c)`
    * frame-compares the candidate content against an already-committed
    * segment file `c`. Returns true when OUR file became the segment,
    * false when a committed twin already carried the same records (epoch
    * replay — the materialized file, if any, is cleaned up). Same-range
    * different-content and overlap violations fail loudly, exactly as the
    * rename protocol's `appendAt`.
    */
  private def manifestPublish(tb: TopicBucket, start: Long, count: Long)(
      materialize: HPath => Unit)(sameAs: HPath => Boolean): Boolean = {
    val cl = commitLog(tb)
    val dir = bucketDir(tb)
    var data: Option[HPath] = None
    def dropData(): Unit =
      data.foreach(p => try fs.delete(p, false) catch { case _: java.io.IOException => () })
    var attempt = 0
    while (true) {
      val st = cl.read()
      st.at(start, count) match {
        case Some(seg) =>
          val committed = new HPath(dir, seg.name)
          if (!sameAs(committed)) {
            dropData()
            throw new IllegalStateException(
              s"segment [$start,+$count) in ${tb.path} is committed with " +
                "DIFFERENT records — two writers assigned the same offsets " +
                "(single-writer contract violated); refusing the silent row loss")
          }
          dropData() // replayed epoch: the committed twin wins
          return false
        case None =>
          st.overlapping(start, count).foreach { seg =>
            dropData()
            throw new IllegalStateException(
              s"range [$start,+$count) for ${tb.path} overlaps committed " +
                s"segment ${seg.name} [${seg.start},+${seg.count}) — another " +
                "writer took these offsets; refusing the overlap")
          }
          val p = data.getOrElse {
            val q = new HPath(dir, uniqueDataName(start, count))
            materialize(q)
            data = Some(q)
            q
          }
          if (cl.tryCommit(st, Seq(SegMeta(p.getName, start, count)), Set.empty).isDefined)
            return true
          attempt += 1
          if (attempt > 200) {
            dropData()
            throw new java.io.IOException(
              s"publish [$start,+$count) to ${tb.path} lost the commit race " +
                s"$attempt times — pathological contention")
          }
          Thread.sleep(scala.util.Random.nextInt(1 << math.min(attempt, 6)).toLong)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Publish a staged frame file as the segment `[start, start+count)` of
    * `tb` — the connector's driver-side commit step, mode-dispatched:
    *
    *   - '''rename mode''': exists-check + atomic no-replace publish under
    *     the caller-held bucket lock (the historical protocol: an existing
    *     same-name segment is frame-compared — idempotent epoch replay is a
    *     no-op, a foreign writer fails loudly).
    *   - '''manifest mode''': the staged file is moved (copy-rename is fine;
    *     the unique name is invisible until committed) into the bucket and
    *     made live by a put-if-absent [[CommitLog]] commit; replay identity
    *     and foreign-writer refusal come from the committed state instead
    *     of file names.
    *
    * The staged file is always consumed: linked/renamed into the log,
    * or deleted when a committed twin already carries the records.
    */
  def publishStaged(tb: TopicBucket, start: Long, count: Long,
      staged: HPath): Option[String] = {
    if (manifestCommitMode) {
      var src = staged
      var moved = false
      var published: Option[String] = None
      val used = manifestPublish(tb, start, count)(
        materialize = q => {
          if (!fs.rename(src, q))
            throw new java.io.IOException(s"stage move $src -> $q failed")
          src = q; moved = true; published = Some(q.getName)
        })(
        sameAs = committed => SegmentCodec.sameFrames(fs, committed, src))
      if (!used && !moved) // never materialized: original staged file remains
        try fs.delete(staged, false) catch { case _: java.io.IOException => () }
      return if (used) published else None
    }
    val target = new HPath(bucketDir(tb), SegmentCodec.segmentName(start, count))
    // Exists-check + ATOMIC no-replace publish under the bucket lock. An
    // existing target is either this epoch's own earlier (crashed) publish
    // — frame identity proves it, no-op — or a foreign writer outside the
    // lock protocol: fail loudly. The publish itself refuses an existing
    // target on EVERY rename-mode scheme (local: fail-if-exists hard link;
    // HDFS: namenode-serialized rename refusal), so even the
    // two-live-holders corner the stale-steal lock protocol admits
    // surfaces as a loud refusal, never a silent overwrite.
    if (fs.exists(target)) {
      if (SegmentCodec.sameFrames(fs, target, staged))
        fs.delete(staged, false) // idempotent re-publish
      else throw new IllegalStateException(
        s"segment $target exists with different content — " +
          "a writer is publishing outside the bucket lock")
    } else if (!publishNoReplace(staged, target)) {
      // no-replace refusal: target appeared between check and publish
      if (fs.exists(target) && SegmentCodec.sameFrames(fs, target, staged))
        fs.delete(staged, false)
      else throw new IllegalStateException(
        s"publish $staged -> $target refused — " +
          "a writer is publishing outside the bucket lock")
    }
    Some(target.getName)
  }

  /** Publish `staged` at `target` with ATOMIC NO-REPLACE semantics on every
    * filesystem. Local goes through `java.nio` `Files.createLink` — an
    * atomic fail-if-exists hard link (POSIX `rename` REPLACES an existing
    * target, which would let the one unavoidable two-live-holders corner of
    * the stale-steal lock protocol — a holder stalled past LockStaleMs
    * resuming after its lock was stolen — silently overwrite the new
    * holder's already-committed segment; the link instead refuses, and the
    * caller fails loudly or no-ops on frame identity). HDFS relies on
    * rename's namenode-serialized refusal of an existing target. Mirrors
    * the local/nio split of [[createLockExclusive]].
    *
    * Returns false when the target already exists (or appeared
    * concurrently) — the CALLER decides, via frame identity, whether that
    * is an idempotent re-publish or a foreign writer.
    *
    * Portability: local mounts WITHOUT hard-link support (FAT/exFAT, some
    * network/container mounts) fall back to exists-check + rename — the
    * pre-hard-link protocol, whose check-then-act window is covered by the
    * bucket lock everywhere except the stale-steal two-holders corner (see
    * above). The fallback decision is sticky per log instance (the mount
    * doesn't change under us) so the failed-link probe costs once.
    */
  @volatile private var localLinksUnsupported = false

  /** The raw hard-link syscall — a seam so tests can inject the
    * link-unsupported failures real FAT/exFAT/CIFS mounts produce.
    */
  protected def nioCreateLink(target: java.nio.file.Path,
      source: java.nio.file.Path): Unit =
    java.nio.file.Files.createLink(target, source)

  /** Does this failure mean "the mount cannot hard-link" (FAT/exFAT/CIFS)?
    * The JDK surfaces that as `UnsupportedOperationException` only when the
    * PROVIDER lacks links; a POSIX provider over a link-less mount throws
    * `FileSystemException` with the errno text (EPERM / EOPNOTSUPP /
    * ENOTSUP) instead — both must trip the sticky rename fallback, or the
    * documented target mounts would fail every publish forever.
    */
  private def linkUnsupported(e: Throwable): Boolean = e match {
    case _: UnsupportedOperationException => true
    case fse: java.nio.file.FileSystemException =>
      val reason = (Option(fse.getReason) ++ Option(fse.getMessage))
        .mkString(" ").toLowerCase(java.util.Locale.ROOT)
      reason.contains("not permitted") || reason.contains("not supported") ||
        reason.contains("unsupported") || reason.contains("eperm") ||
        reason.contains("eopnotsupp") || reason.contains("enotsup")
    case _ => false
  }
  def publishNoReplace(staged: HPath, target: HPath): Boolean =
    if (isLocal) {
      // qualify first: connector-staged paths arrive as bare strings
      val s = toNio(fs.makeQualified(staged))
      val t = toNio(fs.makeQualified(target))
      def renameFallback(): Boolean =
        if (java.nio.file.Files.exists(t)) false
        else
          try { java.nio.file.Files.move(s, t); true } // no REPLACE_EXISTING
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (localLinksUnsupported) renameFallback()
      else try {
        nioCreateLink(t, s)
        // staged copy is now redundant; a failed cleanup must not fail the
        // already-atomic publish (dot-prefixed leftovers are invisible to
        // segment listing)
        try java.nio.file.Files.deleteIfExists(s)
        catch { case _: java.io.IOException => () }
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case e @ (_: UnsupportedOperationException | _: java.nio.file.FileSystemException)
            if linkUnsupported(e) =>
          localLinksUnsupported = true
          log.warn("hard links unsupported on this local mount " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); segment " +
            "publish degrades to exists-check + rename (the stale-steal " +
            "two-live-holders corner loses its atomic refusal — see " +
            "publishNoReplace scaladoc)")
          renameFallback()
      }
    } else fs.rename(staged, target)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  override def range(tb: TopicBucket, from: Long, until: Long): Seq[LogRecord] = {
    val hi = math.min(until, size(tb))
    val lo = math.max(0L, from)
    if (hi <= lo) return Seq.empty
    val out = Seq.newBuilder[LogRecord]
    segments(tb).foreach { case (path, start, count) =>
      if (start < hi && start + count > lo) {
        var off = start - 1
        val it = SegmentCodec.read(fs, path)
        try {
          while (it.hasNext && off < hi - 1) {
            val (id, ts, data) = it.next()
            off = if (it.explicitOffset >= 0) it.explicitOffset else off + 1
            if (off >= lo && off < hi)
              out += LogRecord(tb.topic, tb.bucket, off, id, data, new java.sql.Timestamp(ts))
          }
        } finally it.close()
      }
    }
    out.result()
  }

  override def buckets(topic: String): Seq[TopicBucket] =
    listStatus(new HPath(root, topic)).iterator
      // dot-dirs (.staging, .commits) are connector workspace, not buckets
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(st => TopicBucket(topic, st.getPath.getName))
      .toSeq.sortBy(_.bucket)

  def topics(): Seq[String] =
    listStatus(root).iterator
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName).toSeq.sorted

  /** Retention: delete whole segments entirely below `floorOffset` in every
    * bucket (offsets are preserved — names carry absolute starts, so reads
    * from >= floorOffset are unaffected). The reference retains forever
    * in RAM (TTL TODO at `internal/broker/consumer/server/core.go:45`);
    * here retention is a pure metadata op. Returns deleted segment count.
    */
  def truncateBefore(topic: String, floorOffset: Long): Int =
    truncateWhere(topic)((_, seg) => seg match {
      case (_, start, count) => start + count <= floorOffset })

  /** Per-bucket retention floors (bucket name → floor); buckets absent
    * from the map are untouched. The consumer-protecting facade
    * ([[graft.api.Ripple.truncateBefore]]) computes its clamped floors
    * per bucket, which a single global floor cannot express.
    */
  def truncateBefore(topic: String, floors: Map[String, Long]): Int =
    truncateWhere(topic)((tb, seg) => seg match {
      case (_, start, count) =>
        floors.get(tb.bucket).exists(f => start + count <= f) })

  /** Time-based retention: delete whole segments older than `maxAgeMillis`
    * (by segment file mtime — set at publish, so always >= the newest
    * record's event time) in every bucket. Offsets are preserved exactly as
    * in [[truncateBefore]]; the reference never implemented its retention
    * TTL (`internal/broker/consumer/server/core.go:45` TODO). Returns the
    * deleted segment count.
    */
  def truncateOlderThan(topic: String, maxAgeMillis: Long,
      nowMillis: Long = System.currentTimeMillis(),
      protectedFloors: Map[String, Long] = Map.empty): Int = {
    val cutoff = nowMillis - maxAgeMillis
    // protectedFloors (bucket → floor): segments whose range reaches the
    // floor survive regardless of age — the clamp the snapshot-pin /
    // consumer-protection facades pass down (graft.api.Ripple); absent
    // buckets are unconstrained
    truncateWhere(topic)((tb, seg) => seg._1.getModificationTime < cutoff &&
      (seg match { case (_, start, count) =>
        protectedFloors.get(tb.bucket).forall(f => start + count <= f) }))
  }

  /** Size-based retention (Kafka `retention.bytes`): per bucket, keep the
    * largest TRAILING run of whole segments whose file bytes total at most
    * `maxBytes` and drop everything older — the missing twin of the
    * time/offset policies, without which a runaway producer fills the
    * store until a time horizon passes. The newest segment always
    * survives, even alone over budget (an emptied bucket would restart
    * offsets at 0 and break monotonicity — same rule as every other
    * truncate). Offsets preserved; returns deleted segment count.
    */
  def truncateToBytes(topic: String, maxBytes: Long): Int =
    truncateBefore(topic, byteFloors(topic, maxBytes))

  /** The per-bucket floors [[truncateToBytes]] would enforce (bucket →
    * earliest retained offset; buckets already within budget are absent).
    * Exposed separately so the consumer-protecting facade
    * ([[graft.api.Ripple.truncateToBytes]]) can clamp them to committed
    * cursors before executing. The walk is tail-first: once a segment
    * overflows the budget, every OLDER segment expires with it (retention
    * is a contiguous prefix drop — a kept hole would violate the floor
    * contract).
    */
  def byteFloors(topic: String, maxBytes: Long): Map[String, Long] = {
    require(maxBytes >= 0, s"maxBytes must be >= 0, got $maxBytes")
    buckets(topic).flatMap { tb =>
      val segs = segments(tb)
      FileTopicLog.byteFloorWalk(
        segs.map { case (p, start, _) => (start, fileLen(p)) }, maxBytes)
        .map(tb.bucket -> _)
    }.toMap
  }

  /** Shared retention walk: drop segments matching `expired`, never the
    * newest segment of a bucket (size() derives from segment names, so an
    * empty bucket would restart offsets at 0 and break monotonicity). The
    * manifest is rewritten WITHOUT the expired segments before any file is
    * deleted, so manifest-backed readers never plan a ghost segment.
    */
  private def truncateWhere(topic: String)(
      expired: (TopicBucket, (FileStatus, Long, Long)) => Boolean): Int = {
    if (manifestCommitMode) return truncateWhereManifest(topic)(expired)
    var deleted = 0
    // Per-bucket lock: serializes with publishes, whose refreshManifest
    // would otherwise snapshot the directory between our manifest rewrite
    // and the deletes and reinstate ghost entries.
    buckets(topic).foreach { tb =>
      withBucketLock(tb) {
        val segs = segmentStatusRaw(tb)
        checkNoOverlap(tb, segs.map { case (st, s, c) => (st.getPath, s, c) })
        val toDelete = segs.dropRight(1).filter(expired(tb, _))
        if (toDelete.nonEmpty) {
          val keep = segs.filterNot(toDelete.contains)
          writeFileAtomic(manifestPath(tb), keep.map(_._1.getPath.getName)
            .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
          toDelete.foreach { case (st, _, _) =>
            if (fs.delete(st.getPath, false)) deleted += 1
          }
        }
      }
    }
    deleted
  }

  /** Manifest-mode retention: commit the removal (put-if-absent sequenced,
    * so it can never race a publish into a lost update), THEN delete the
    * data files — readers resolve the committed state first and never plan
    * a ghost segment. No lock is needed or trusted; a lost commit race
    * (concurrent publish advanced the version) re-reads and retries.
    */
  private def truncateWhereManifest(topic: String)(
      expired: (TopicBucket, (FileStatus, Long, Long)) => Boolean): Int = {
    var deleted = 0
    buckets(topic).foreach { tb =>
      val cl = commitLog(tb)
      val dir = bucketDir(tb)
      var done = false
      var attempt = 0
      while (!done) {
        val st = cl.read()
        if (st.segs.isEmpty) done = true
        else {
          try {
            val withStatus = st.segs.map { s =>
              (s, (fs.getFileStatus(new HPath(dir, s.name)), s.start, s.count))
            }
            // never the newest segment: an emptied bucket would restart
            // offsets at 0 and break monotonicity (same rule as rename mode)
            val toDelete = withStatus.dropRight(1).filter { case (_, view) => expired(tb, view) }
            if (toDelete.isEmpty) done = true
            else if (cl.tryCommit(st, Seq.empty, toDelete.map(_._1.name).toSet).isDefined) {
              toDelete.foreach { case (s, _) =>
                if (try fs.delete(new HPath(dir, s.name), false)
                    catch { case _: java.io.IOException => false }) deleted += 1
              }
              done = true
            }
          } catch {
            // committed file vanished mid-walk: stale state vs a concurrent
            // retention commit — re-read and re-decide
            case _: java.io.FileNotFoundException => ()
          }
          if (!done) {
            attempt += 1
            if (attempt > 50) throw new java.io.IOException(
              s"retention on ${tb.path} lost the commit race $attempt times")
          }
        }
      }
    }
    deleted
  }

  /** Offset-preserving in-place segment compaction: merge runs of ADJACENT
    * (offset-contiguous) segments into single files of up to `targetBytes`,
    * leaving offsets, the retention floor, and consumer cursors untouched —
    * the cure for streaming-sink segment proliferation (one segment per
    * epoch per bucket ≈ 10^4 tiny files/bucket/hour at high trigger rates,
    * which keeps PLANNING cheap via the manifest but proliferates one
    * input partition per tiny segment). Returns the number of segments
    * merged away.
    *
    * Frames are length-prefixed with no file header/footer, so a merged
    * segment is the plain byte concatenation of its members — the merge
    * streams bytes, never decoding frames or holding a segment in memory.
    *
    * Protocol per bucket:
    *   - '''rename mode''' (under the bucket lock): heal any crashed prior
    *     compaction (a segment fully covered by a larger one is a
    *     pre-merge member — drop it from the manifest, then delete);
    *     stage each merged file, publish it no-replace (an existing
    *     same-name target from a crashed attempt is byte-identical by
    *     construction), rewrite the manifest atomically WITHOUT the
    *     members, then delete the member files. Readers plan from the
    *     manifest, so they see either the old set or the new set, never a
    *     mix; the listing's transient overlap is confined to the window
    *     before the manifest swap and healed on the next pass.
    *   - '''manifest mode''': write merged data files under unique names
    *     (invisible until committed), then ONE put-if-absent commit swaps
    *     members for merged atomically; member files are deleted after
    *     the commit. A lost commit race retries on fresh state.
    *
    * A reader that planned input partitions against the OLD segment files
    * re-resolves by OFFSET RANGE when the planned file is gone
    * ([[graft.connector.RipplePartitionReader]]) — offsets are the stable
    * identity; file names are not.
    *
    * '''Where the bytes move''' (round 14): both modes are split into
    * plan (metadata, locked) → concat (data, UNLOCKED) → commit
    * (metadata, locked/put-if-absent), and the concat step is a strategy:
    * the default [[localConcat]] streams in the calling JVM (counted in
    * [[FileTopicLog.localConcatBytes]]); the connector passes a runner
    * that executes every merge above a byte threshold as ONE Spark job —
    * tasks read members and write the merged file, the driver touches
    * only manifests ([[graft.connector.DistributedConcat]]). At the
    * 100 TB design point this is the difference between a driver that
    * re-copies the stream's whole byte throughput once per merge
    * generation and one that does O(segments) metadata work.
    */
  def compactSegments(topic: String, targetBytes: Long = 128L << 20,
      minSegments: Int = 2,
      onlyBuckets: Option[Set[String]] = None,
      concat: Seq[ConcatTask] => Unit = null): Int = {
    require(minSegments >= 2, "minSegments < 2 would rewrite single segments")
    val mover = if (concat == null) localConcat _ else concat
    val tbs = buckets(topic).filter(tb => onlyBuckets.forall(_.contains(tb.bucket)))
    if (manifestCommitMode) compactManifestAll(tbs, targetBytes, minSegments, mover)
    else compactRenameAll(tbs, targetBytes, minSegments, mover)
  }

  /** Default byte-mover for [[compactSegments]]: stream-concatenate in the
    * CALLING JVM. Every byte routed here is counted in
    * [[FileTopicLog.localConcatBytes]], so a spec (and an operator) can
    * prove a distributed compaction moved zero data bytes through the
    * driver.
    */
  def localConcat(tasks: Seq[ConcatTask]): Unit = tasks.foreach { t =>
    FileTopicLog.localConcatBytes.addAndGet(t.bytes)
    try concatSegments(t.members.map(new HPath(_)), new HPath(t.out))
    catch {
      case _: java.io.FileNotFoundException =>
        // a member vanished mid-copy — the concat phase holds NO bucket
        // lock, so retention or a foreign compactor can legitimately
        // delete one under us. Drop THIS merge (the commit phase's
        // membership/length validation discards it) instead of failing
        // every other bucket's merge with it.
        try fs.delete(new HPath(t.out), false)
        catch { case _: java.io.IOException => () }
    }
  }

  /** Key-based log compaction — Kafka `cleanup.policy=compact` parity:
    * retain the LATEST record per `id` per bucket, at its ORIGINAL offset
    * (the changelog-topic use case: the log becomes a keyed table whose
    * history below each key's last write is reclaimable). Produces one
    * SPARSE segment per bucket covering the compacted span — frames carry
    * explicit offsets ([[SegmentCodec]] v2), so every reader resolves
    * retained records at their true positions and every offset invariant
    * (end offset, floors, pruning, gaps) holds unchanged. The reference
    * cannot express compaction at all (retention itself is an unimplemented
    * TODO, `internal/broker/consumer/server/core.go:45`).
    *
    * Same 3-phase shape as [[compactSegments]] — plan under the bucket
    * lock (metadata only), REWRITE the bytes with no lock held (`rewrite`
    * strategy: driver-local default, or a Spark job via the connector's
    * distributed runner), validate + publish + manifest-swap under the
    * lock. A member vanishing mid-rewrite (racing retention) drops that
    * bucket's plan; a crash after publish heals forward deterministically
    * ([[healCovered]] keeps the sparse product).
    *
    * `minStartByBucket` clamps the compaction to offsets AT OR ABOVE the
    * given floor per bucket — the snapshot-pin composition: a live pin
    * needs its captured range byte-stable, so the facade passes each
    * bucket's max live pinned ceiling and only the unpinned SUFFIX
    * compacts (exactly how retention clamps to pinned floors).
    *
    * TOMBSTONES (key deletion, round 17; clean-time aging round 18): a
    * NULL `data` write is the delete marker (Kafka null-value parity; an
    * empty array stays a value). Aging is by CLEAN time — a tombstone
    * drops only once it has SURVIVED a prior compaction (it sits in a
    * sparse product) whose product is older than `tombstoneRetentionMs`
    * (Kafka `delete.retention.ms` / KIP-534 delete horizon). The first
    * pass always leaves the delete visible, and a producer-stamped
    * event-time `ts` can never age a fresh delete out early. The horizon
    * is resolved to an absolute floor ONCE at plan time and shipped in
    * each [[KeyedTask]]; a plan whose members do NOT start at the
    * bucket's retained floor (a snapshot pin clamped the prefix away)
    * ships a DISABLED floor — aging a delete out while an older value
    * generation survives below the clamp would resurrect the key when
    * the pin releases. Returns segments compacted away (members replaced
    * by sparse products + healed).
    */
  def compactKeyed(topic: String, onlyBuckets: Option[Set[String]] = None,
      rewrite: Seq[KeyedTask] => Unit = null, codec: Int = Codecs.None,
      minStartByBucket: Map[String, Long] = Map.empty,
      keyHeap: Int = SegmentCodec.DefaultKeyHeapEntries,
      tombstoneRetentionMs: Long = SegmentCodec.DefaultTombstoneRetentionMs): Int = {
    val mover = if (rewrite == null) localKeyed _ else rewrite
    val tbs = buckets(topic).filter(tb => onlyBuckets.forall(_.contains(tb.bucket)))
    // the floor is resolved ONCE here (plan time) and shipped inside every
    // KeyedTask: duplicate/speculative attempts of one task must emit
    // byte-identical products for the deterministic-republish discipline
    require(tombstoneRetentionMs >= 0,
      s"ripple: tombstoneRetentionMs must be >= 0, got $tombstoneRetentionMs")
    val floor = System.currentTimeMillis() - tombstoneRetentionMs
    if (manifestCommitMode)
      compactKeyedManifest(tbs, mover, codec, minStartByBucket, keyHeap, floor)
    else compactKeyedRename(tbs, mover, codec, minStartByBucket, keyHeap, floor)
  }

  /** Default rewrite strategy for [[compactKeyed]]: decode in the calling
    * JVM. Member-vanished tolerance mirrors [[localConcat]].
    */
  def localKeyed(tasks: Seq[KeyedTask]): Unit = { localKeyedCounted(tasks); () }

  /** [[localKeyed]], returning the number of spill runs the tasks wrote —
    * per-call proof for callers asserting the bounded path engaged for
    * THEIR rewrite (the probe cell, specs), exact even when concurrent
    * compactions share the JVM.
    */
  def localKeyedCounted(tasks: Seq[KeyedTask]): Long = tasks.map { t =>
    try {
      val out = new HPath(t.out)
      val r = SegmentCodec.rewriteLatestPerKey(fs,
        t.members.map { case (p, s) => (new HPath(p), s) }, out, t.codec,
        t.maxKeys, t.tombstoneFloorMs)
      SegmentCodec.writeStatSidecar(fs, out, r.rows, r.minTs, r.maxTs)
      r.spillRuns
    } catch {
      case _: java.io.FileNotFoundException =>
        try fs.delete(new HPath(t.out), false)
        catch { case _: java.io.IOException => () }
        0L
    }
  }.sum

  private case class KeyedPlan(tb: TopicBucket, healed: Int,
      members: Seq[(HPath, Long, Long, Long)], staged: HPath,
      start: Long, span: Long, agingOk: Boolean)

  /** Eligible members of one bucket's keyed compaction: the healed,
    * clamp-filtered suffix. None when there is nothing to do (empty, or a
    * single already-sparse segment — its keys are unique by construction).
    */
  private def keyedMembers(segs: Seq[(HPath, Long, Long, Long)],
      clamp: Long): Option[Seq[(HPath, Long, Long, Long)]] = {
    val elig = segs.filter(_._2 >= clamp)
    if (elig.isEmpty ||
        (elig.size == 1 && SegmentCodec.isSparse(elig.head._1.getName))) None
    else Some(elig)
  }

  private def compactKeyedRename(tbs: Seq[TopicBucket],
      rewrite: Seq[KeyedTask] => Unit, codec: Int,
      clamps: Map[String, Long], keyHeap: Int, tombFloor: Long): Int = {
    val plans = tbs.map { tb =>
      withBucketLock(tb) {
        val (raw, healed) = healCovered(tb)
        val clamp = clamps.getOrElse(tb.bucket, Long.MinValue)
        val members = keyedMembers(raw, clamp)
        KeyedPlan(tb, healed, members.getOrElse(Seq.empty),
          new HPath(bucketDir(tb), s".tmp-${java.util.UUID.randomUUID()}"),
          members.map(_.head._2).getOrElse(0L),
          members.map(m => m.last._2 + m.last._3 - m.head._2).getOrElse(0L),
          agingOk = raw.forall(_._2 >= clamp))
      }
    }
    val work = plans.filter(_.members.nonEmpty)
    // tombstone aging only when the plan covers the bucket's WHOLE
    // retained range: a pin-clamped (suffix-only) compaction that aged a
    // delete out could expose a stale pre-pin value as latest-per-key
    // once the pin releases — the delete would be silently lost. Clamped
    // plans ship a disabled floor; the tombstone waits for a full pass.
    rewrite(work.map(p => KeyedTask(
      p.members.map(m => (m._1.toString, m._2)), p.staged.toString,
      p.members.map(_._4).sum, codec, keyHeap,
      if (p.agingOk) tombFloor else Long.MinValue)))
    plans.map { p =>
      if (p.members.isEmpty) p.healed else p.healed + commitKeyedRename(p)
    }.sum
  }

  private def commitKeyedRename(plan: KeyedPlan): Int = withBucketLock(plan.tb) {
    val dir = bucketDir(plan.tb)
    def dropStaged(): Unit = {
      try fs.delete(plan.staged, false) catch { case _: java.io.IOException => () }
      try fs.delete(SegmentCodec.statSidecar(plan.staged), false)
      catch { case _: java.io.IOException => () }
    }
    val currentNames = segmentStatusRaw(plan.tb).map(_._1.getPath.getName).toSet
    // the unlocked rewrite drops its output when a member vanishes under
    // it; a vanished member with output present means retention ran AFTER
    // the rewrite finished — committing would resurrect truncated rows.
    // The staged file itself must also exist: a sidecar without its
    // product (partial crash cleanup) must discard, not publish a ghost.
    if (!plan.members.forall(m => currentNames.contains(m._1.getName)) ||
        !(try fs.exists(plan.staged) catch { case _: java.io.IOException => false })) {
      dropStaged(); return 0
    }
    // the rewrite task shipped (rows, minTs, maxTs) in a sidecar so the
    // driver never header-walks the compacted product; fall back to the
    // walk when it is missing/torn (the sidecar is never load-bearing)
    val (rows, minTs, maxTs) =
      SegmentCodec.readStatSidecar(fs, plan.staged).getOrElse {
        try SegmentCodec.statFrames(fs, plan.staged)
        catch { case _: java.io.IOException => dropStaged(); return 0 }
      }
    try fs.delete(SegmentCodec.statSidecar(plan.staged), false)
    catch { case _: java.io.IOException => () }
    val target = new HPath(dir,
      SegmentCodec.segmentNameSparse(plan.start, plan.span, rows))
    if (!publishNoReplace(plan.staged, target)) {
      // a crashed attempt already published this exact product: verify
      if (!SegmentCodec.sameFrames(fs, target, plan.staged))
        throw new IllegalStateException(
          s"keyed-compaction target $target exists with foreign content")
      dropStaged()
    }
    val memberNames = plan.members.map(_._1.getName).toSet
    val names = (currentNames -- memberNames + target.getName).toSeq.sorted
    writeFileAtomic(manifestPath(plan.tb),
      names.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (minTs <= maxTs)
      recordTsStats(plan.tb, Map(target.getName -> (minTs, maxTs)))
    memberNames.foreach { n =>
      try fs.delete(new HPath(dir, n), false)
      catch { case _: java.io.IOException => () } }
    memberNames.size
  }

  private def compactKeyedManifest(tbs: Seq[TopicBucket],
      rewrite: Seq[KeyedTask] => Unit, codec: Int,
      clamps: Map[String, Long], keyHeap: Int, tombFloor: Long): Int = {
    var total = 0
    case class MPlan(tb: TopicBucket, st: CommitState,
        members: Seq[(HPath, Long, Long, Long)], add: SegMeta,
        agingOk: Boolean)
    def plan(tb: TopicBucket): Option[MPlan] = {
      val dir = bucketDir(tb)
      val st = commitLog(tb).read()
      val segs = st.segs.map { s =>
        val p = new HPath(dir, s.name)
        (p, s.start, s.count,
          try fs.getFileStatus(p).getLen
          catch { case _: java.io.FileNotFoundException => return None })
      }
      val clamp = clamps.getOrElse(tb.bucket, Long.MinValue)
      keyedMembers(segs, clamp).map { ms =>
        val start = ms.head._2
        val span = ms.last._2 + ms.last._3 - start
        // flag-only sparse marker: the data name is fixed before the
        // rewrite knows the retained count (a rename would be an
        // object-store copy); read planners treat unknown-rows sparse
        // segments conservatively
        MPlan(tb, st, ms, SegMeta(
          f"data-$start%020d-$span%010d-k-${java.util.UUID.randomUUID()}.log",
          start, span), agingOk = segs.forall(_._2 >= clamp))
      }
    }
    var pending = tbs.flatMap(plan)
    val attempts = mutable.Map.empty[String, Int].withDefaultValue(0)
    while (pending.nonEmpty) {
      // same aging guard as the rename mode: clamped (suffix-only) plans
      // must not age deletes out while older generations survive below
      rewrite(pending.map(p => KeyedTask(
        p.members.map(m => (m._1.toString, m._2)),
        new HPath(bucketDir(p.tb), p.add.name).toString,
        p.members.map(_._4).sum, codec, keyHeap,
        if (p.agingOk) tombFloor else Long.MinValue)))
      val results = pending.map { p =>
        val dir = bucketDir(p.tb)
        val out = new HPath(dir, p.add.name)
        val staged =
          try { fs.getFileStatus(out); true }
          catch { case _: java.io.FileNotFoundException => false }
        val removes = p.members.map(_._1.getName).toSet
        if (staged &&
            commitLog(p.tb).tryCommit(p.st, Seq(p.add), removes).isDefined) {
          val (_, minTs, maxTs) =
            SegmentCodec.readStatSidecar(fs, out).getOrElse(
              SegmentCodec.statFrames(fs, out))
          try fs.delete(SegmentCodec.statSidecar(out), false)
          catch { case _: java.io.IOException => () }
          if (minTs <= maxTs)
            recordTsStats(p.tb, Map(p.add.name -> (minTs, maxTs)))
          removes.foreach { n =>
            try fs.delete(new HPath(dir, n), false)
            catch { case _: java.io.IOException => () } }
          p -> Some(removes.size)
        } else {
          try fs.delete(out, false) catch { case _: java.io.IOException => () }
          try fs.delete(SegmentCodec.statSidecar(out), false)
          catch { case _: java.io.IOException => () }
          p -> None
        }
      }
      total += results.flatMap(_._2).sum
      val lost = results.collect { case (p, None) => p.tb }
      if (lost.isEmpty) pending = Seq.empty
      else {
        lost.foreach(tb => attempts(tb.path) += 1)
        val over = lost.filter(tb => attempts(tb.path) > 20)
        if (over.nonEmpty) throw new java.io.IOException(
          s"keyed compaction on ${over.map(_.path).mkString(", ")} lost the " +
            s"commit race ${over.map(tb => attempts(tb.path)).max} times")
        val worst = lost.map(tb => attempts(tb.path)).max
        Thread.sleep(scala.util.Random.nextInt(1 << math.min(worst, 6)).toLong)
        pending = lost.flatMap(plan)
      }
    }
    total
  }

  /** Contiguous runs of at least `minSegments` segments whose combined
    * bytes fit `targetBytes`. Input must be start-sorted and overlap-free.
    */
  private def compactionGroups(segs: Seq[(HPath, Long, Long, Long)],
      targetBytes: Long, minSegments: Int): Seq[Seq[(HPath, Long, Long, Long)]] = {
    val groups = Seq.newBuilder[Seq[(HPath, Long, Long, Long)]]
    var cur = List.empty[(HPath, Long, Long, Long)] // reversed
    var curBytes = 0L
    def flush(): Unit = {
      if (cur.size >= minSegments) groups += cur.reverse
      cur = Nil; curBytes = 0L
    }
    segs.foreach { case seg @ (path, start, _, len) =>
      // a SPARSE member (key compaction product) never joins a byte-concat
      // group: a dense member concatenated AFTER it would inherit a
      // mid-gap positional cursor. compactKeyed itself re-merges
      // sparse+dense runs (it decodes anyway).
      if (SegmentCodec.isSparse(path.getName)) flush()
      else cur match {
        case (_, pStart, pCount, _) :: _
            if pStart + pCount == start && curBytes + len <= targetBytes =>
          cur ::= seg; curBytes += len
        case _ =>
          flush()
          if (len < targetBytes) { cur = List(seg); curBytes = len }
      }
    }
    flush()
    groups.result()
  }

  /** Stream-concatenate `members` (in offset order) into `out`. */
  private def concatSegments(members: Seq[HPath], out: HPath): Unit = {
    val o = fs.create(out, true)
    try members.foreach { m =>
      val in = fs.open(m)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, o, 1 << 16, false)
      finally in.close()
    } finally o.close()
  }

  /** A planned rename-mode bucket compaction: the metadata halves run
    * under the bucket lock; the byte movement runs BETWEEN them with no
    * lock held.
    */
  private case class RenamePlan(tb: TopicBucket, healed: Int,
      groups: Seq[Seq[(HPath, Long, Long, Long)]], staged: Seq[HPath])

  private def compactRenameAll(tbs: Seq[TopicBucket], targetBytes: Long,
      minSegments: Int, concat: Seq[ConcatTask] => Unit): Int = {
    // Phase 1 (per bucket, under its lock): heal + plan — metadata only.
    val plans = tbs.map(planRename(_, targetBytes, minSegments))
    // Phase 2 (NO lock held): move the data bytes — ALL buckets' merges in
    // one call, so a distributed strategy runs them as one Spark job
    // instead of a driver-sequential per-bucket loop. No lock is held, so
    // a slow merge can never let the bucket lock's TTL lapse mid-
    // critical-section (the old inline concat needed touchBucketLock for
    // exactly that).
    concat(plans.flatMap { p =>
      p.groups.zip(p.staged).map { case (g, out) =>
        ConcatTask(g.map(_._1.toString), out.toString, g.map(_._4).sum) }
    })
    // Phase 3 (per bucket, under its lock): validate against CURRENT
    // state, publish, swap the manifest — metadata only.
    plans.map(commitRename).sum
  }

  /** Heal a crashed prior compaction (caller holds the bucket lock): a
    * segment whose range sits fully inside a LARGER one is a pre-merge
    * member (only compaction creates covering segments — publishes refuse
    * overlaps); byte identity over the shared range holds by construction
    * for byte-concat merges, and a key-compacted covering segment is the
    * compaction's intended result. Manifest first, then delete. Returns
    * (surviving segments, healed count).
    *
    * One sorted sweep, not all-pairs: in (start asc, count desc) order a
    * segment is covered iff some EARLIER-sorted segment's end reaches its
    * end (earlier starts are <= its start, and strictly-larger follows).
    * Identical ranges CAN coexist in exactly one shape since key
    * compaction landed: a crashed single-member compactKeyed leaves the
    * sparse product next to its dense member under a DIFFERENT name
    * (same-name publish is still refused) — the tie-break keeps the
    * SPARSE one, deterministically completing the crashed compaction
    * (keeping the dense one would roll it back; both are consistent log
    * states, but determinism beats listing-order luck). The all-pairs
    * form was the probe-measured super-linear term of the
    * 2×10^4-segment compaction cell (round 13): 4×10^8 predicate
    * evaluations before a single byte moved.
    */
  private def healCovered(tb: TopicBucket): (Seq[(HPath, Long, Long, Long)], Int) = {
    var raw = segmentStatusRaw(tb).map { case (st, s, c) => (st.getPath, s, c, st.getLen) }
    val coveredSet = {
      val b = Set.newBuilder[HPath]
      var maxEnd = Long.MinValue
      raw.sortBy { case (p, s, c, _) =>
        (s, -c, if (SegmentCodec.isSparse(p.getName)) 0 else 1)
      }.foreach { case (p, s, c, _) =>
        val end = s + c
        if (maxEnd >= end) b += p
        else maxEnd = end
      }
      b.result()
    }
    var healed = 0
    if (coveredSet.nonEmpty) {
      val keep = raw.filterNot { case (p, _, _, _) => coveredSet.contains(p) }
      writeFileAtomic(manifestPath(tb), keep.map(_._1.getName)
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      coveredSet.foreach { p =>
        try fs.delete(p, false) catch { case _: java.io.IOException => () } }
      raw = keep
      healed = coveredSet.size
    }
    checkNoOverlap(tb, raw.map { case (p, s, c, _) => (p, s, c) })
    (raw, healed)
  }

  private def planRename(tb: TopicBucket, targetBytes: Long,
      minSegments: Int): RenamePlan = withBucketLock(tb) {
    val dir = bucketDir(tb)
    val (raw, healed) = healCovered(tb)
    val groups = compactionGroups(raw, targetBytes, minSegments)
    RenamePlan(tb, healed, groups,
      groups.map(_ => new HPath(dir, s".tmp-${java.util.UUID.randomUUID()}")))
  }

  private def commitRename(plan: RenamePlan): Int = {
    if (plan.groups.isEmpty) plan.healed
    else withBucketLock(plan.tb) {
      val dir = bucketDir(plan.tb)
      // The concat ran without the lock, so the bucket may have moved:
      // appends added segments (harmless), retention or a foreign
      // compactor may have removed a member. A group is publishable only
      // when EVERY member is still committed — segment names encode
      // (start, count) and segments are immutable once published, so
      // name-presence is range- and byte-identity.
      val currentNames = segmentStatusRaw(plan.tb).map(_._1.getPath.getName).toSet
      val valid = Seq.newBuilder[(Seq[(HPath, Long, Long, Long)], HPath)]
      plan.groups.zip(plan.staged).foreach { case (g, staged) =>
        // staged must exist with EXACTLY the members' combined bytes — the
        // unlocked concat phase drops a merge whose member vanished under
        // it (racing retention), leaving the staging name absent or short
        val stagedOk =
          try fs.getFileStatus(staged).getLen == g.map(_._4).sum
          catch { case _: java.io.FileNotFoundException => false }
        if (!stagedOk || !g.forall(m => currentNames.contains(m._1.getName))) {
          try fs.delete(staged, false) catch { case _: java.io.IOException => () }
        } else {
          val target = new HPath(dir,
            SegmentCodec.segmentName(g.head._2, g.map(_._3).sum))
          if (!publishNoReplace(staged, target)) {
            // a crashed attempt already published this exact merge: verify
            if (!SegmentCodec.sameFrames(fs, target, staged))
              throw new IllegalStateException(
                s"compaction target $target exists with foreign content")
            fs.delete(staged, false)
          }
          valid += ((g, target))
        }
      }
      val validated = valid.result()
      if (validated.isEmpty) plan.healed
      else {
        // atomic manifest swap: members out, merged in — the commit point
        val memberNames = validated.flatMap(_._1.map(_._1.getName)).toSet
        val names =
          (currentNames -- memberNames ++ validated.map(_._2.getName)).toSeq.sorted
        writeFileAtomic(manifestPath(plan.tb),
          names.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        carryTsStats(plan.tb, validated.map { case (g, target) =>
          g.map(_._1.getName) -> target.getName })
        memberNames.foreach { n =>
          try fs.delete(new HPath(dir, n), false)
          catch { case _: java.io.IOException => () } }
        plan.healed + memberNames.size
      }
    }
  }

  /** Carry `.tsidx` stats across a compaction: a merged segment's (min,
    * max) is the combine of its members' — but only when EVERY member had
    * a cached entry (a partial combine would understate the range);
    * otherwise the merged file falls back to read-repair.
    */
  private def carryTsStats(tb: TopicBucket,
      groups: Seq[(Seq[String], String)]): Unit = {
    val cached = readTsIndex(tb)
    val entries = groups.flatMap { case (members, merged) =>
      val stats = members.flatMap(cached.get)
      if (stats.nonEmpty && stats.size == members.size)
        Some(merged -> (stats.map(_._1).min, stats.map(_._2).max))
      else None
    }.toMap
    recordTsStats(tb, entries)
  }

  /** A planned manifest-mode bucket compaction: merged files land under
    * unique names (invisible until their commit), so the byte movement
    * needs no lock at all — only the put-if-absent commit serializes.
    */
  private case class ManifestPlan(tb: TopicBucket, st: CommitState,
      groups: Seq[Seq[(HPath, Long, Long, Long)]], adds: Seq[SegMeta])

  private def compactManifestAll(tbs: Seq[TopicBucket], targetBytes: Long,
      minSegments: Int, concat: Seq[ConcatTask] => Unit): Int = {
    var total = 0
    var pending = tbs.flatMap(planManifest(_, targetBytes, minSegments))
    // retry budget is PER BUCKET: one hot contended bucket must exhaust
    // only its own 20 attempts, not starve every other bucket's (a global
    // counter made a wide contended topic spuriously throw)
    val attempts = mutable.Map.empty[String, Int].withDefaultValue(0)
    while (pending.nonEmpty) {
      // data plane: ALL buckets' merges in one call (one Spark job under a
      // distributed strategy); files are invisible until committed
      concat(pending.flatMap { p =>
        p.groups.zip(p.adds).map { case (g, a) =>
          ConcatTask(g.map(_._1.toString),
            new HPath(bucketDir(p.tb), a.name).toString, g.map(_._4).sum) }
      })
      val results = pending.map(p => p -> commitManifest(p))
      total += results.flatMap(_._2).sum
      val lost = results.collect { case (p, None) => p.tb }
      if (lost.isEmpty) pending = Seq.empty
      else {
        lost.foreach(tb => attempts(tb.path) += 1)
        val over = lost.filter(tb => attempts(tb.path) > 20)
        if (over.nonEmpty) throw new java.io.IOException(
          s"compaction on ${over.map(_.path).mkString(", ")} lost the " +
            s"commit race ${over.map(tb => attempts(tb.path)).max} times")
        val worst = lost.map(tb => attempts(tb.path)).max
        Thread.sleep(scala.util.Random.nextInt(1 << math.min(worst, 6)).toLong)
        pending = lost.flatMap(planManifest(_, targetBytes, minSegments))
      }
    }
    total
  }

  private def planManifest(tb: TopicBucket, targetBytes: Long,
      minSegments: Int): Option[ManifestPlan] = {
    val dir = bucketDir(tb)
    val st = commitLog(tb).read()
    val segs = st.segs.map { s =>
      val p = new HPath(dir, s.name)
      (p, s.start, s.count, try fs.getFileStatus(p).getLen
        catch { case _: java.io.FileNotFoundException => return None }) // racing retention: skip this pass
    }
    val groups = compactionGroups(segs, targetBytes, minSegments)
    if (groups.isEmpty) None
    else Some(ManifestPlan(tb, st, groups, groups.map { g =>
      SegMeta(uniqueDataName(g.head._2, g.map(_._3).sum), g.head._2,
        g.map(_._3).sum) }))
  }

  /** Commit one planned merge: Some(segments merged away) on a won commit;
    * None on a lost race — the staged merged files are deleted and the
    * caller replans from fresh state.
    */
  private def commitManifest(plan: ManifestPlan): Option[Int] = {
    val dir = bucketDir(plan.tb)
    val removes = plan.groups.flatten.map(_._1.getName).toSet
    // every staged merge must exist with EXACTLY its members' combined
    // bytes before the swap is committed: the unlocked concat phase drops
    // a merge whose member vanished under it (racing retention), and an
    // out-of-band member delete with no commit must never publish a short
    // file. Treat like a lost race — clean the adds and replan from fresh
    // state (a genuinely-vanished member makes the replanner skip it).
    val allStaged = plan.groups.zip(plan.adds).forall { case (g, a) =>
      try fs.getFileStatus(new HPath(dir, a.name)).getLen == g.map(_._4).sum
      catch { case _: java.io.FileNotFoundException => false }
    }
    if (allStaged &&
        commitLog(plan.tb).tryCommit(plan.st, plan.adds, removes).isDefined) {
      carryTsStats(plan.tb, plan.groups.zip(plan.adds).map { case (g, a) =>
        g.map(_._1.getName) -> a.name })
      removes.foreach { n =>
        try fs.delete(new HPath(dir, n), false)
        catch { case _: java.io.IOException => () } }
      Some(removes.size)
    } else {
      plan.adds.foreach { a =>
        try fs.delete(new HPath(dir, a.name), false)
        catch { case _: java.io.IOException => () } }
      None
    }
  }

  /** Storage-hygiene sweep (the VACUUM analog of the public Delta/Iceberg
    * pattern): delete files a crash left UNREFERENCED — invisible to
    * readers by protocol, but occupying storage forever at 10^4
    * epochs/bucket/hour scale. Swept, per bucket, when older than
    * `graceMs` (default 1 h — an in-flight writer's file is always
    * younger; it commits or fails within its publish attempt):
    *
    *   - manifest mode: `data-*` files absent from the committed state
    *     (crashed appends/compactions stage under unique names that only
    *     a commit makes live);
    *   - both modes: `.tmp-*` / `.staged-*` staging leftovers in bucket
    *     dirs and the topic's `.staging/` workspace;
    *   - the epoch-marker namespace: non-newest `epoch-N` markers per
    *     query dir (only the newest can still no-op a replay — older
    *     epochs are behind every checkpoint); live `*.intent` files are
    *     KEPT (deleting one would break a crashed epoch's heal).
    *
    * Never touches committed segments, manifests, commit logs, locks, or
    * consumer cursors. Returns the number of files deleted.
    */
  def vacuum(topic: String, graceMs: Long = 3600000L,
      nowMillis: Long = System.currentTimeMillis()): Int = {
    val cutoff = nowMillis - graceMs
    var deleted = 0
    def rm(p: HPath): Unit =
      if (try fs.delete(p, false) catch { case _: java.io.IOException => false })
        deleted += 1
    buckets(topic).foreach { tb =>
      val live = segments(tb).map(_._1.getName).toSet
      listStatus(bucketDir(tb)).foreach { st =>
        val name = st.getPath.getName
        val orphanData = manifestCommitMode && st.isFile &&
          name.startsWith("data-") && !live.contains(name)
        val staging = st.isFile &&
          (name.startsWith(".tmp-") || name.startsWith(".staged-"))
        if ((orphanData || staging) && st.getModificationTime < cutoff)
          rm(st.getPath)
      }
    }
    val topicDir = new HPath(root, topic)
    listStatus(new HPath(topicDir, ".staging")).foreach { st =>
      if (st.isFile && st.getModificationTime < cutoff) rm(st.getPath)
    }
    listStatus(new HPath(topicDir, ".commits")).filter(_.isDirectory).foreach { qdir =>
      val markers = listStatus(qdir.getPath).filter { st =>
        st.isFile && st.getPath.getName.matches("epoch-\\d+")
      }
      if (markers.nonEmpty) {
        val newest = markers.maxBy(st =>
          st.getPath.getName.stripPrefix("epoch-").toLong).getPath.getName
        markers.foreach { st =>
          if (st.getPath.getName != newest && st.getModificationTime < cutoff)
            rm(st.getPath)
        }
      }
    }
    deleted
  }

  /** Create a topic with `numBuckets` buckets — the control-plane op the
    * reference exposes as gRPC `CreateBucket`
    * (`server/exposed/create.go:15-27`). Here it is a pure metadata op:
    * bucket placement/replication is the storage layer's job, so the
    * reference's random-with-replacement replica choice
    * (`internal/broker/broker.go:93-99`) has no equivalent.
    */
  def createTopic(topic: String, numBuckets: Int): Seq[TopicBucket] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // Kafka's legal-name alphabet. A comma would collide with the
    // connector's multi-topic subscription syntax, '/' with its
    // qualified streaming offset keys, and a leading '.' with the
    // topic-level metadata dirs (.staging/.commits) — refuse at create
    // (the write path auto-creates through here) instead of failing
    // strangely at read time.
    require(topic.nonEmpty && !topic.startsWith(".") &&
      topic.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'),
      s"illegal topic name '$topic': use [A-Za-z0-9._-]+ without a " +
        "leading dot")
    (0 until numBuckets).map { i =>
      val tb = TopicBucket(topic, f"b$i%04d")
      fs.mkdirs(bucketDir(tb))
      tb
    }
  }
}
