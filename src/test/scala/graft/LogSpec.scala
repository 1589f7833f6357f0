package graft

import graft.log.{FileTopicLog, InMemoryLog, SegmentCodec, TopicLog}
import graft.model.{Payload, TopicBucket}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Invariants of the append-only bucket log, derived from the reference's
  * queue semantics (`internal/broker/queue/queue.go:49-61`,
  * `pkg/utils/collection/concurrent_list.go:63-73`): range reads are
  * clamped slices, append order is preserved per bucket, offsets are dense,
  * and replay from offset k yields exactly the suffix. FIXTURES.md §A lists
  * these as the property-test contract.
  */
class LogSpec extends AnyFunSuite {

  private val tb = TopicBucket("t", "b0")
  private def payloads(n: Int, tag: Byte = 0): Seq[Payload] =
    (0 until n).map(i => Payload(i, Array(tag, i.toByte)))

  private def fileLog(): FileTopicLog =
    new FileTopicLog(Files.createTempDirectory("graftlog"))

  // storage-plane paths are Hadoop paths; tests poke them via java.nio
  private def nio(p: org.apache.hadoop.fs.Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri)

  private def logs(): Seq[(String, TopicLog)] =
    Seq("mem" -> new InMemoryLog, "file" -> fileLog())

  test("append then range == clamped slice (queue.go:58-61 semantics)") {
    for ((name, log) <- logs()) {
      val xs = payloads(10)
      log.append(tb, xs)
      assert(log.range(tb, 0, 5).map(_.id) == (0 until 5), name)
      assert(log.range(tb, 7, 100).map(_.id) == (7 until 10), name)
      assert(log.range(tb, 10, 20).isEmpty, name)
      assert(log.range(tb, 5, 3).isEmpty, name)
      assert(log.size(tb) == 10, name)
    }
  }

  test("multi-append preserves order and dense offsets") {
    for ((name, log) <- logs()) {
      log.append(tb, payloads(3, 1))
      log.append(tb, payloads(4, 2))
      val all = log.range(tb, 0, Long.MaxValue)
      assert(all.map(_.offset) == (0L until 7L), name)
      assert(all.map(r => r.data(0)) == Seq[Byte](1, 1, 1, 2, 2, 2, 2), name)
    }
  }

  test("fan-out: two readers each observe the full log independently") {
    for ((name, log) <- logs()) {
      log.append(tb, payloads(6))
      // Consumers are just offsets; both replay everything (SURVEY §2
      // delivery-semantics note, core.go:46-64).
      val c1 = log.range(tb, 0, log.size(tb))
      val c2 = log.range(tb, 0, log.size(tb))
      assert(c1.map(_.id) == c2.map(_.id), name)
      assert(c1.size == 6, name)
    }
  }

  test("idempotent positional append (exactly-once epoch retry)") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    val rows = payloads(5).map(p => (p, now))
    log.appendAt(tb, 0L, rows)
    log.appendAt(tb, 0L, rows) // retried epoch: no-op
    assert(log.size(tb) == 5)
    assert(log.range(tb, 0, 99).size == 5)
    // a later-timestamped replay of the SAME records is still the no-op
    // (frame identity is timestamp-insensitive)
    log.appendAt(tb, 0L, payloads(5).map(p => (p, now + 9999)))
    assert(log.size(tb) == 5)
    // same offsets, DIFFERENT records = a second writer took these offsets
    // (single-writer contract violated): loud failure, never silent loss
    val e = intercept[IllegalStateException] {
      log.appendAt(tb, 0L, payloads(5, tag = 7).map(p => (p, now)))
    }
    assert(e.getMessage.contains("DIFFERENT records"), e.getMessage)
    assert(log.range(tb, 0, 99).map(_.data(0)) == Seq[Byte](0, 0, 0, 0, 0),
      "committed records untouched by the refused append")
  }

  test("publishNoReplace is atomic fail-if-exists: an existing segment is NEVER overwritten") {
    // the two-live-holders corner: a stalled holder resumes after its lock
    // was stolen and re-publishes the same offsets the new holder already
    // committed — on POSIX a plain rename would silently REPLACE the
    // committed segment; the hard-link publish must refuse instead
    val log = fileLog()
    val now = System.currentTimeMillis()
    log.appendAt(tb, 0L, payloads(3, tag = 1).map(p => (p, now)))
    val target = log.segmentsListed(tb).head._1
    val before = Files.readAllBytes(nio(target)).toSeq

    // a "resumed holder" staging DIFFERENT content for the same name
    val staged = new org.apache.hadoop.fs.Path(log.bucketDir(tb), ".tmp-usurped")
    SegmentCodec.write(log.fs, staged, payloads(3, tag = 9).map(p => (p, now)))
    assert(!log.publishNoReplace(staged, target), "existing target must refuse")
    assert(Files.readAllBytes(nio(target)).toSeq == before,
      "committed segment bytes must be untouched")
    assert(Files.exists(nio(staged)), "refused publish leaves the staged copy")
    Files.delete(nio(staged))

    // and a successful publish really removes the staged file (no leak)
    val tgt2 = new org.apache.hadoop.fs.Path(log.bucketDir(tb),
      SegmentCodec.segmentName(3L, 2L))
    val staged2 = new org.apache.hadoop.fs.Path(log.bucketDir(tb), ".tmp-fresh")
    SegmentCodec.write(log.fs, staged2, payloads(2, tag = 2).map(p => (p, now)))
    assert(log.publishNoReplace(staged2, tgt2))
    assert(!Files.exists(nio(staged2)) && Files.exists(nio(tgt2)))
    log.refreshManifest(tb)
    assert(log.size(tb) == 5)
  }

  test("segment name round-trip") {
    val n = SegmentCodec.segmentName(42L, 7L)
    assert(SegmentCodec.parse(n).contains((42L, 7L)))
    assert(SegmentCodec.parse("garbage.log").isEmpty)
    assert(SegmentCodec.parse("seg-1-2-3.log").isEmpty)
  }

  test("property: range(i,j) == slice for arbitrary appends (seeded, 200 cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val log = new InMemoryLog
      var expected = Vector.empty[Int]
      (1 to rnd.nextInt(4)).foreach { _ =>
        val n = rnd.nextInt(21)
        val xs = (0 until n).map(k => Payload(expected.size + k, Array[Byte]()))
        log.append(TopicBucket("p", "b"), xs)
        expected = expected ++ xs.map(_.id)
      }
      val i = rnd.nextInt(71)
      val j = rnd.nextInt(71)
      val got = log.range(TopicBucket("p", "b"), i.toLong, j.toLong).map(_.id)
      val want = expected.slice(i, math.min(j, expected.size))
      assert(got == want, s"i=$i j=$j size=${expected.size}")
    }
  }

  test("truncateBefore drops old segments, preserves offsets, keeps newest") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 4).foreach { i =>
      log.appendAt(tb, i * 5L, payloads(5).map(p => (p, now)))
    }
    assert(log.size(tb) == 20)
    val deleted = log.truncateBefore(tb.topic, 12L)
    assert(deleted == 2) // segments [0,5) and [5,10); [10,15) straddles → kept
    assert(log.size(tb) == 20) // end offset unchanged
    assert(log.range(tb, 0, 100).map(_.offset) == (10L until 20L))
    // truncating everything still keeps the newest segment
    log.truncateBefore(tb.topic, 999L)
    assert(log.size(tb) == 20)
    assert(log.range(tb, 0, 100).map(_.offset) == (15L until 20L))
    // appends continue from the preserved end offset
    log.append(tb, payloads(2))
    assert(log.range(tb, 20, 100).map(_.offset) == (20L until 22L))
  }

  test("manifest tracks the directory listing through appends and retention") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 6).foreach { i => log.appendAt(tb, i * 4L, payloads(4).map(p => (p, now))) }
    // manifest-backed view == authoritative listing
    assert(log.segments(tb) == log.segmentsListed(tb))
    assert(java.nio.file.Files.exists(nio(new org.apache.hadoop.fs.Path(
      log.bucketDir(tb), graft.log.SegmentCodec.ManifestName))))
    log.truncateBefore(tb.topic, 9L)
    assert(log.segments(tb) == log.segmentsListed(tb))
    // reads go through the manifest and still see exactly the retained rows
    assert(log.range(tb, 0, 100).map(_.offset) == (8L until 24L))
    // a deleted manifest only falls back to the listing
    java.nio.file.Files.delete(nio(new org.apache.hadoop.fs.Path(
      log.bucketDir(tb), graft.log.SegmentCodec.ManifestName)))
    assert(log.segments(tb) == log.segmentsListed(tb))
    // a corrupt manifest is distrusted, not half-applied
    java.nio.file.Files.write(
      nio(new org.apache.hadoop.fs.Path(log.bucketDir(tb), graft.log.SegmentCodec.ManifestName)),
      "garbage-line\n".getBytes)
    assert(log.segments(tb) == log.segmentsListed(tb))
  }

  test("truncateOlderThan drops aged segments, replay from retained offset exact") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 4).foreach { i => log.appendAt(tb, i * 5L, payloads(5).map(p => (p, now))) }
    // age the first two segments' files by an hour
    log.segmentsListed(tb).take(2).foreach { case (p, _, _) =>
      java.nio.file.Files.setLastModifiedTime(nio(p),
        java.nio.file.attribute.FileTime.fromMillis(now - 3600 * 1000L))
    }
    val deleted = log.truncateOlderThan(tb.topic, maxAgeMillis = 60 * 1000L, nowMillis = now)
    assert(deleted == 2)
    assert(log.size(tb) == 20) // end offset unchanged
    assert(log.range(tb, 10, 100).map(_.offset) == (10L until 20L))
    assert(log.range(tb, 10, 100).map(_.id) == payloads(5).map(_.id) ++ payloads(5).map(_.id))
    // everything aged: newest segment survives regardless
    log.segmentsListed(tb).foreach { case (p, _, _) =>
      java.nio.file.Files.setLastModifiedTime(nio(p),
        java.nio.file.attribute.FileTime.fromMillis(now - 3600 * 1000L))
    }
    log.truncateOlderThan(tb.topic, maxAgeMillis = 60 * 1000L, nowMillis = now)
    assert(log.size(tb) == 20)
    assert(log.range(tb, 0, 100).map(_.offset) == (15L until 20L))
  }

  test("truncateToBytes keeps the trailing byte budget, preserves offsets, keeps newest") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 4).foreach { i =>
      log.appendAt(tb, i * 5L, payloads(5).map(p => (p, now)))
    }
    val segs = log.segments(tb)
    assert(segs.size == 4)
    val segBytes = segs.map { case (p, _, _) => log.fileLen(p) }
    assert(segBytes.forall(_ > 0))
    // budget = the last two segments exactly → first two expire
    val floors2 = log.byteFloors(tb.topic, segBytes.drop(2).sum)
    assert(floors2 == Map(tb.bucket -> 10L), floors2.toString)
    assert(log.truncateToBytes(tb.topic, segBytes.drop(2).sum) == 2)
    assert(log.size(tb) == 20) // end offset unchanged
    assert(log.range(tb, 0, 100).map(_.offset) == (10L until 20L))
    // within budget now: a second run is a no-op
    assert(log.truncateToBytes(tb.topic, segBytes.drop(2).sum) == 0)
    // budget smaller than the newest segment alone: newest still survives
    assert(log.truncateToBytes(tb.topic, 1L) == 1)
    assert(log.size(tb) == 20)
    assert(log.range(tb, 0, 100).map(_.offset) == (15L until 20L))
    // the contiguous-prefix rule: once a segment overflows, OLDER tiny
    // segments expire with it (no kept holes). Build small-BIG-small:
    val tb2 = graft.model.TopicBucket(tb.topic, "b1")
    log.appendAt(tb2, 0L, payloads(1).map(p => (p, now)))            // small
    log.appendAt(tb2, 1L, (0 until 40).map(i =>
      (graft.model.Payload(i, Array.fill(64)(7: Byte)), now)))       // big
    log.appendAt(tb2, 41L, payloads(1).map(p => (p, now)))           // small
    val s2 = log.segments(tb2).map { case (p, _, _) => log.fileLen(p) }
    // budget covers newest + NOT the big middle → floor lands at the big
    // segment's end; the tiny head expires despite fitting by itself
    assert(log.byteFloors(tb.topic, s2.last + 1).get("b1").contains(41L))
  }

  test("sameFrames: timestamp-insensitive, payload/id-sensitive") {
    val dir = Files.createTempDirectory("frames")
    val a = dir.resolve("a"); val b = dir.resolve("b"); val c = dir.resolve("c")
    val rows = payloads(5)
    SegmentCodec.write(a, rows.map(r => (r, 1000L)))
    SegmentCodec.write(b, rows.map(r => (r, 2000L))) // same records, new clock
    SegmentCodec.write(c, payloads(5, tag = 9).map(r => (r, 1000L)))
    assert(SegmentCodec.sameFrames(a, b))
    assert(!SegmentCodec.sameFrames(a, c))
    assert(!SegmentCodec.sameFrames(a, dir.resolve("missing")))
  }

  test("createTopic registers buckets; topics/buckets enumerable") {
    val log = fileLog()
    val tbs = log.createTopic("orders", 4)
    assert(tbs.size == 4)
    assert(log.buckets("orders").map(_.bucket) == Seq("b0000", "b0001", "b0002", "b0003"))
    assert(log.topics() == Seq("orders"))
  }

  test("hard-link-less mount: publish falls back to rename, stickily; refusal contract survives") {
    // VERDICT r11 task #7 + ADVICE: FAT/exFAT/CIFS mounts fail createLink
    // with FileSystemException (EPERM/EOPNOTSUPP), not
    // UnsupportedOperationException — inject exactly that through the
    // nioCreateLink seam and drive the sticky fallback branch for real.
    val linkCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    val log = new FileTopicLog(Files.createTempDirectory("linkless").toString,
        new org.apache.hadoop.conf.Configuration()) {
      override protected def nioCreateLink(target: java.nio.file.Path,
          source: java.nio.file.Path): Unit = {
        linkCalls.incrementAndGet()
        throw new java.nio.file.FileSystemException(
          target.toString, source.toString, "Operation not permitted")
      }
    }
    val now = System.currentTimeMillis()
    // first publish: link fails EPERM → warn once → rename fallback lands it
    log.appendAt(tb, 0L, payloads(3, 1).map(p => (p, now)))
    assert(log.range(tb, 0, 3).map(_.data(0)) == Seq[Byte](1, 1, 1))
    assert(linkCalls.get == 1)
    // the decision sticks: the second publish never re-probes the link
    log.appendAt(tb, 3L, payloads(3, 2).map(p => (p, now)))
    assert(linkCalls.get == 1, "fallback must be sticky per log instance")
    assert(log.size(tb) == 6)
    // the no-replace CONTRACT survives on the fallback path: a foreign
    // same-name publish is refused by the exists-check, never overwrites
    val target = log.segmentsListed(tb).head._1
    val staged = new org.apache.hadoop.fs.Path(log.bucketDir(tb), ".tmp-foreign")
    SegmentCodec.write(log.fs, staged, payloads(3, 9).map(p => (p, now)))
    assert(!log.publishNoReplace(staged, target), "existing target must refuse")
    assert(log.range(tb, 0, 3).map(_.data(0)) == Seq[Byte](1, 1, 1),
      "committed segment untouched after the refusal")
    // and appendAt's same-offset different-content path still fails loudly
    intercept[IllegalStateException] {
      log.appendAt(tb, 0L, payloads(3, 7).map(p => (p, now)))
    }
  }

  test("vacuum sweeps staging leftovers and superseded epoch markers, keeps the newest + intents") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    log.appendAt(tb, 0L, payloads(3, 1).map(p => (p, now)))
    val fs = log.fs
    val topicDir = new org.apache.hadoop.fs.Path(log.root, "t")
    def touch(p: org.apache.hadoop.fs.Path): Unit = {
      fs.mkdirs(p.getParent); val o = fs.create(p, true); o.close()
    }
    // crashed-publish leftovers + epoch-marker namespace of two queries
    touch(new org.apache.hadoop.fs.Path(log.bucketDir(tb), ".tmp-crashed"))
    touch(new org.apache.hadoop.fs.Path(topicDir, ".staging/stage-1-2-b0-dead"))
    val q = new org.apache.hadoop.fs.Path(topicDir, ".commits/query-1")
    Seq("epoch-1", "epoch-2", "epoch-9", "epoch-5.intent").foreach(m =>
      touch(new org.apache.hadoop.fs.Path(q, m)))
    val swept = log.vacuum("t", graceMs = 0L, nowMillis = now + 60000)
    // .tmp + staging + epoch-1 + epoch-2 (epoch-9 is newest; intent kept)
    assert(swept == 4, s"swept $swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(q, "epoch-9")), "newest marker kept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(q, "epoch-5.intent")), "intent kept")
    assert(log.range(tb, 0, 3).map(_.data(0)) == Seq[Byte](1, 1, 1), "segments untouched")
    assert(log.segments(tb).size == 1)
  }

  test("compactSegments: read ≡ identity, offsets/floor/size unchanged, groups bounded") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    // 10 tiny epoch-shaped segments (3 rows each)
    (0 until 10).foreach { e =>
      log.appendAt(tb, e * 3L, payloads(3, e.toByte).map(p => (p, now)))
    }
    val before = log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq))
    assert(log.segments(tb).size == 10)
    // target sized for ~5 tiny segments per merged file → two groups
    val segBytes = log.fileLen(log.segments(tb).head._1)
    val merged = log.compactSegments("t", targetBytes = segBytes * 5)
    assert(merged == 10, s"all 10 tiny segments merge away, got $merged")
    val segsAfter = log.segments(tb)
    assert(segsAfter.size == 2, s"two bounded groups, got ${segsAfter.map(_._1.getName)}")
    assert(segsAfter.map(s => (s._2, s._3)) == Seq((0L, 15L), (15L, 15L)))
    assert(log.size(tb) == 30 && log.firstOffset(tb) == 0L)
    val after = log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq))
    assert(after == before, "compaction must be invisible to reads")
    // idempotent: nothing left to merge
    assert(log.compactSegments("t", targetBytes = segBytes * 5) == 0)
  }

  test("compactSegments respects retention gaps and the contiguity rule") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 6).foreach { e =>
      log.appendAt(tb, e * 2L, payloads(2, e.toByte).map(p => (p, now)))
    }
    assert(log.truncateBefore("t", 4L) == 2) // head gone: floor now 4
    val before = log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id))
    assert(log.compactSegments("t") == 4)
    assert(log.segments(tb).map(s => (s._2, s._3)) == Seq((4L, 8L)),
      "merge starts at the retained floor, never bridges into the gap")
    assert(log.firstOffset(tb) == 4L, "floor preserved")
    assert(log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id)) == before)
  }

  test("compactSegments heals a crashed prior attempt (merged published, manifest not swapped)") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 4).foreach { e =>
      log.appendAt(tb, e * 2L, payloads(2, e.toByte).map(p => (p, now)))
    }
    val before = log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq))
    // simulate the crash window: the merged segment file exists (byte
    // concat of all four members) but the manifest still lists the members
    val members = log.segments(tb).map(_._1)
    val mergedPath = new org.apache.hadoop.fs.Path(log.bucketDir(tb),
      SegmentCodec.segmentName(0L, 8L))
    val out = java.nio.file.Files.newOutputStream(nio(mergedPath))
    members.foreach(m => out.write(java.nio.file.Files.readAllBytes(nio(m))))
    out.close()
    // manifest-backed readers are unaffected by the orphan
    assert(log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq)) == before)
    // the next compaction pass heals: members dropped, merged file live
    assert(log.compactSegments("t") == 4)
    assert(log.segments(tb).map(s => (s._2, s._3)) == Seq((0L, 8L)))
    assert(log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq)) == before)
  }

  test("offsetForTimestamp: boundaries, out-of-order stamps, .tsidx repair, compaction, retention") {
    val dir = Files.createTempDirectory("tsseek")
    val log = new FileTopicLog(dir)
    def rows(tag: Byte, tss: Seq[Long], base: Int) =
      tss.zipWithIndex.map { case (t, i) => (Payload(base + i, Array(tag)), t) }
    // seg0 ts [10,20,30]; seg1 [40,25,50] (25 is LATE data); seg2 [60,70]
    log.appendAt(tb, 0L, rows(1, Seq(10L, 20L, 30L), 0))
    log.appendAt(tb, 3L, rows(2, Seq(40L, 25L, 50L), 3))
    log.appendAt(tb, 6L, rows(3, Seq(60L, 70L), 6))

    def seeks(): Seq[Long] =
      Seq(Long.MinValue, 10L, 11L, 30L, 31L, 25L, 45L, 70L, 71L)
        .map(log.offsetForTimestamp(tb, _))
    // 25 → offset 2 (ts 30 is the FIRST record >= 25; the late ts-25 frame
    // at offset 4 sits behind it, as Kafka's running-max time index gives);
    // 45 → offset 5 (seg1's late frame skipped: 40,25 < 45, 50 >= 45);
    // 71 → 8 = end (nothing qualifies)
    val expect = Seq(0L, 0L, 1L, 2L, 3L, 2L, 5L, 7L, 8L)
    assert(seeks() == expect)

    // appendAt stamped the per-bucket cache at publish (and the seeks
    // above TRUSTED it — wrong stamped values would have failed them);
    // corrupting it must not change any answer (tolerant parse + frame
    // re-scan + rewrite)
    val idx = dir.resolve("t").resolve("b0").resolve(".tsidx")
    assert(Files.exists(idx), ".tsidx cache stamped at publish")
    Files.write(idx, "garbage\nseg-junk notanumber\n".getBytes("UTF-8"))
    assert(seeks() == expect, "corrupt cache must self-heal")
    assert(new String(Files.readAllBytes(idx), "UTF-8").contains("seg-"),
      "cache rewritten after repair")

    // in-place compaction carries the stats: the merged segment's entry
    // is the combine of its members' — no re-scan needed
    assert(log.compactSegments("t") == 3)
    val carried = new String(Files.readAllBytes(idx), "UTF-8")
    assert(carried.contains(
      s"${SegmentCodec.segmentName(0L, 8L)} 10 70"), carried)
    assert(seeks() == expect, "seek invariant under compaction")

    // retention: a timestamp predating every retained record resolves to
    // the floor (earliest retained), never below it
    val log2 = new FileTopicLog(Files.createTempDirectory("tsseek2"))
    log2.appendAt(tb, 0L, rows(1, Seq(10L, 20L), 0))
    log2.appendAt(tb, 2L, rows(2, Seq(30L, 40L), 2))
    log2.truncateBefore("t", 2L)
    assert(log2.offsetForTimestamp(tb, Long.MinValue) == 2L)
    assert(log2.offsetForTimestamp(tb, 35L) == 3L)

    // empty bucket
    val log3 = new FileTopicLog(Files.createTempDirectory("tsseek3"))
    assert(log3.offsetForTimestamp(TopicBucket("t", "b9"), 0L) == 0L)
  }

  test("createTopic refuses names that collide with subscription syntax or metadata dirs") {
    val log = fileLog()
    log.createTopic("ok.name_1-x", 1) // the full legal alphabet
    for (bad <- Seq("a,b", "a/b", ".hidden", "", "sp ace", "unicodé"))
      intercept[IllegalArgumentException] { log.createTopic(bad, 1) }
  }

  test("metadata caches: append, compaction and retention each bust the cached view") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    def stamped(tag: Byte, base: Int, tss: Seq[Long]) =
      tss.zipWithIndex.map { case (t, i) => (Payload(base + i, Array(tag)), t) }
    log.appendAt(tb, 0L, stamped(1, 0, Seq(10L, 20L)))
    log.appendAt(tb, 2L, stamped(2, 2, Seq(30L, 40L)))
    // warm every cache: manifest parse, .tsidx parse, seek index
    assert(log.offsetForTimestamp(tb, 25L) == 2L)
    assert(log.offsetForTimestamp(tb, 25L) == 2L) // warm hit
    assert(log.metaCacheEntries > 0, "caches populated")
    // APPEND moves the manifest → the cached seek view must see new rows
    log.appendAt(tb, 4L, stamped(3, 4, Seq(50L, 60L)))
    assert(log.offsetForTimestamp(tb, 55L) == 5L, "append busts the cache")
    assert(log.segments(tb).size == 3)
    // COMPACTION replaces segments → cached boundary resolution must follow
    assert(log.compactSegments("t") == 3)
    assert(log.segments(tb).map(s => (s._2, s._3)) == Seq((0L, 6L)))
    assert(log.offsetForTimestamp(tb, 25L) == 2L, "compaction busts the cache")
    assert(log.offsetForTimestamp(tb, 55L) == 5L)
    // RETENTION drops head segments → seek floor must move
    log.appendAt(tb, 6L, stamped(4, 6, Seq(70L)))
    log.truncateBefore("t", 6L)
    assert(log.offsetForTimestamp(tb, Long.MinValue) == 6L,
      "retention busts the cache: floor is the earliest retained offset")
    // explicit topic invalidation drops every entry
    log.invalidateTopicCaches("t")
    assert(log.metaCacheEntries == 0, "invalidateTopicCaches clears the topic")
    assert(log.offsetForTimestamp(tb, 70L) == 6L, "cold reread still correct")
  }

  test("metadata caches are BOUNDED: a tiny cap evicts, eviction never changes results") {
    // the seam: cap the cache at ~nothing, so every put evicts the rest
    def tiny() = new FileTopicLog(Files.createTempDirectory("graftlru")) {
      override private[graft] def metaCacheMaxWeight: Long = 1L
    }
    val capped = tiny()
    val reference = fileLog()
    val now = System.currentTimeMillis()
    for (log <- Seq(capped, reference); b <- 0 until 4) {
      val tbx = TopicBucket("t", s"b$b")
      log.appendAt(tbx, 0L, (0 until 3).map(i => (Payload(i, Array(b.toByte)), 10L * (i + 1))))
      log.appendAt(tbx, 3L, (0 until 2).map(i => (Payload(3 + i, Array(b.toByte)), 40L + 10L * i)))
    }
    // interleave seeks across buckets so the capped instance thrashes
    val probes = for (b <- 0 until 4; ts <- Seq(Long.MinValue, 15L, 45L, 99L)) yield (b, ts)
    val fromCapped = probes.map { case (b, ts) =>
      capped.offsetForTimestamp(TopicBucket("t", s"b$b"), ts) }
    val fromRef = probes.map { case (b, ts) =>
      reference.offsetForTimestamp(TopicBucket("t", s"b$b"), ts) }
    assert(fromCapped == fromRef, "eviction is invisible to results")
    assert(capped.metaCacheWeight <= 2L + 2L, // one over-cap survivor per cache
      s"cap enforced, weight=${capped.metaCacheWeight}")
    assert(reference.metaCacheEntries >= 4, "uncapped instance retains entries")
  }

  test("compaction tolerates a member vanishing mid-concat (racing retention)") {
    val log = fileLog()
    val now = System.currentTimeMillis()
    (0 until 6).foreach { e =>
      log.appendAt(tb, e * 2L, payloads(2, e.toByte).map(p => (p, now)))
    }
    val before = log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq))
    val segBytes = log.fileLen(log.segments(tb).head._1)
    // two groups of 3; a "retention job" deletes a member of group 1
    // between plan and concat — exactly the unlocked phase-2 window
    var sabotaged = false
    val racingConcat: Seq[graft.log.ConcatTask] => Unit = { tasks =>
      assert(tasks.size == 2, s"two planned merges, got ${tasks.size}")
      if (!sabotaged) {
        sabotaged = true
        val victim = new org.apache.hadoop.fs.Path(tasks.head.members.head)
        assert(log.fs.delete(victim, false))
      }
      log.localConcat(tasks)
    }
    // the call SUCCEEDS: group 1 is dropped (its member vanished), group 2
    // merges — one racing truncate must not fail the whole compaction
    val merged = log.compactSegments("t", targetBytes = segBytes * 3,
      concat = racingConcat)
    assert(merged == 3, s"the surviving group still merges, got $merged")
    val segs = log.segments(tb).map(s => (s._2, s._3))
    assert(segs.contains((6L, 6L)), s"group 2 merged: $segs")
    // the vanished member's rows are gone (retention deleted them); the
    // rest of group 1 is intact and unmerged
    val after = log.range(tb, 0, Long.MaxValue).map(r => (r.offset, r.id, r.data.toSeq))
    assert(after == before.filterNot { case (o, _, _) => o < 2L },
      "only the deleted member's rows are missing")
  }

  test("frame codec: per-codec round-trip, skip walk, raw fallback for tiny/incompressible payloads") {
    import graft.log.Codecs
    val dir = Files.createTempDirectory("codec")
    val text = ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8")
    val tiny = "id:7".getBytes("UTF-8")
    val rnd = new scala.util.Random(7)
    val noise = Array.fill[Byte](2048)(rnd.nextInt().toByte) // incompressible
    val rows = Seq(
      (Payload(1, text), 1000L),
      (Payload(2, tiny), 2000L),
      (Payload(3, noise), 3000L),
      (Payload(4, Array.emptyByteArray), 4000L))
    for (codec <- Seq(Codecs.Deflate, Codecs.Lz4, Codecs.Zstd)) {
      val f = dir.resolve(s"c$codec")
      SegmentCodec.writeFrames(Files.newOutputStream(f), rows, codec)
      // full decode round-trips exactly
      val back = { val it = SegmentCodec.read(f); try it.toList finally it.close() }
      assert(back.map(_._1) == Seq(1, 2, 3, 4), s"codec $codec ids")
      assert(back.map(_._2) == Seq(1000L, 2000L, 3000L, 4000L), s"codec $codec ts")
      assert(back.zip(rows).forall { case ((_, _, d), (p, _)) =>
        java.util.Arrays.equals(d, p.data) }, s"codec $codec payloads")
      // header-only walk sees the same ids/ts without touching payloads
      val heads = {
        val it = new SegmentCodec.FrameIterator(Files.newInputStream(f), skipData = true)
        try it.toList finally it.close()
      }
      assert(heads.map(h => (h._1, h._2)) == back.map(b => (b._1, b._2)),
        s"codec $codec header walk")
      assert(heads.forall(_._3.isEmpty))
      // the compressible payload actually shrank the file vs raw
      val raw = dir.resolve(s"raw$codec")
      SegmentCodec.writeFrames(Files.newOutputStream(raw), rows, Codecs.None)
      assert(Files.size(f) < Files.size(raw),
        s"codec $codec: ${Files.size(f)} !< ${Files.size(raw)}")
      // determinism: a replayed write produces identical bytes (the
      // sameFrames size prefilter and segment replay identity rely on it)
      val f2 = dir.resolve(s"c$codec-replay")
      SegmentCodec.writeFrames(Files.newOutputStream(f2), rows, codec)
      assert(java.util.Arrays.equals(Files.readAllBytes(f), Files.readAllBytes(f2)))
      assert(SegmentCodec.sameFrames(f, f2))
    }
    // mixed frames in ONE stream (codec config changed mid-topic, segments
    // byte-concatenated): raw + deflate + zstd frames read seamlessly
    val mixed = dir.resolve("mixed")
    val out = Files.newOutputStream(mixed)
    SegmentCodec.writeFrames(out, rows.take(2), Codecs.None) // closes out
    val out2 = Files.newOutputStream(mixed, java.nio.file.StandardOpenOption.APPEND)
    SegmentCodec.writeFrames(out2, rows.drop(2), Codecs.Zstd)
    val mixedBack = { val it = SegmentCodec.read(mixed); try it.toList finally it.close() }
    assert(mixedBack.map(_._1) == Seq(1, 2, 3, 4))
    assert(mixedBack.zip(rows).forall { case ((_, _, d), (p, _)) =>
      java.util.Arrays.equals(d, p.data) })
    // unknown flag bits (a future engine's frame) are loud, not garbage
    // (0x80 is the last unassigned bit — 0x40 became record headers in r18)
    val future = dir.resolve("future")
    val dos = new java.io.DataOutputStream(Files.newOutputStream(future))
    dos.writeInt(-(1 + 12)); dos.writeByte(0x80); dos.writeInt(1); dos.writeLong(0L)
    dos.close()
    val it = SegmentCodec.read(future)
    val e = intercept[java.io.IOException] { it.next() }
    assert(e.getMessage.contains("unknown flag"), e.getMessage)
    it.close()
  }

  test("compactKeyed: latest record per key at original offsets; floor/end unchanged; heal completes a crash") {
    val log = fileLog()
    log.createTopic("kc", 1)
    val tbk = TopicBucket("kc", "b0000")
    def put(id: Int, v: String, ts: Long): Unit =
      log.appendAt(tbk, log.size(tbk), Seq((Payload(id, v.getBytes), ts)))
    // key-update stream: keys 1..3 written multiple times across segments
    put(1, "a1", 10); put(2, "b1", 20); put(1, "a2", 30) // offsets 0,1,2
    put(3, "c1", 40); put(2, "b2", 50)                   // offsets 3,4
    put(1, "a3", 60)                                     // offset 5
    val endBefore = log.size(tbk)
    assert(log.compactKeyed("kc") == 6, "all six single-record segments replaced")
    // the log is now one sparse segment holding the latest per key at
    // ORIGINAL offsets: 1->5(a3), 2->4(b2), 3->3(c1)
    val segs = log.segments(tbk)
    assert(segs.size == 1 && SegmentCodec.isSparse(segs.head._1.getName))
    assert(SegmentCodec.sparseRows(segs.head._1.getName).contains(3L))
    assert(segs.head._2 == 0L && segs.head._3 == 6L, "span covers [0,6)")
    assert(log.size(tbk) == endBefore, "end offset unchanged")
    val got = log.range(tbk, 0, 10).map(r => (r.offset, r.id, new String(r.data)))
    assert(got == Seq((3L, 3, "c1"), (4L, 2, "b2"), (5L, 1, "a3")))
    // the rewrite's stats sidecar was consumed by the commit — no
    // .tmp-stat leftovers (and the driver never header-walked the product)
    assert(!log.fs.listStatus(log.bucketDir(tbk))
      .exists(_.getPath.getName.startsWith(".tmp-stat-")),
      "stat sidecar must be consumed at commit")
    // sidecar round-trip + torn-document fallback (None, never a throw)
    val sc = new org.apache.hadoop.fs.Path(log.bucketDir(tbk), "probe")
    SegmentCodec.writeStatSidecar(log.fs, sc, 7L, 100L, 900L)
    assert(SegmentCodec.readStatSidecar(log.fs, sc).contains((7L, 100L, 900L)))
    val torn = log.fs.create(SegmentCodec.statSidecar(sc), true)
    torn.write("gar bage".getBytes); torn.close()
    assert(SegmentCodec.readStatSidecar(log.fs, sc).isEmpty)
    log.fs.delete(SegmentCodec.statSidecar(sc), false)
    // re-compaction of a lone sparse segment is a no-op
    assert(log.compactKeyed("kc") == 0)
    // new updates append after; keyed compaction merges sparse + dense
    put(3, "c2", 70); put(4, "d1", 80) // offsets 6,7
    assert(log.compactKeyed("kc") == 3)
    val got2 = log.range(tbk, 0, 10).map(r => (r.offset, r.id, new String(r.data)))
    assert(got2 == Seq((4L, 2, "b2"), (5L, 1, "a3"), (6L, 3, "c2"), (7L, 4, "d1")))
    assert(log.size(tbk) == 8L)
    // crash heal: plant the sparse product of a crashed keyed compaction
    // (published, manifest NOT swapped) — the next compaction pass keeps
    // the SPARSE one deterministically and completes the swap
    log.createTopic("kh", 1)
    val tbh = TopicBucket("kh", "b0000")
    log.appendAt(tbh, 0L, Seq((Payload(1, "x1".getBytes), 10L),
      (Payload(1, "x2".getBytes), 20L)))
    val dir = log.bucketDir(tbh)
    val sparse = new org.apache.hadoop.fs.Path(dir,
      SegmentCodec.segmentNameSparse(0L, 2L, 1L))
    val out = new java.io.DataOutputStream(log.fs.create(sparse, true))
    SegmentCodec.writeFrame(out, 1, 20L, "x2".getBytes, offset = 1L)
    out.close()
    assert(log.compactKeyed("kh") == 1, "heal removes the covered dense member")
    assert(log.segments(tbh).map(_._1.getName) == Seq(sparse.getName))
    assert(log.range(tbh, 0, 2).map(r => (r.offset, new String(r.data))) ==
      Seq((1L, "x2")))
    // clamp (the pin composition): only the suffix at/above the clamp
    // rewrites; pinned prefix segments stay byte-identical
    log.createTopic("kp", 1)
    val tbp = TopicBucket("kp", "b0000")
    (0 until 4).foreach(i => log.appendAt(tbp, i.toLong,
      Seq((Payload(7, s"v$i".getBytes), 10L * (i + 1)))))
    val prefixNames = log.segments(tbp).take(2).map(_._1.getName)
    assert(log.compactKeyed("kp", minStartByBucket = Map("b0000" -> 2L)) == 2)
    val after = log.segments(tbp)
    assert(after.take(2).map(_._1.getName) == prefixNames, "pinned prefix untouched")
    assert(log.range(tbp, 0, 4).map(r => (r.offset, new String(r.data))) ==
      Seq((0L, "v0"), (1L, "v1"), (3L, "v3")), "suffix compacted, prefix intact")
  }

  test("byte-concat compaction never groups across a sparse member") {
    val log = fileLog()
    log.createTopic("kb", 1)
    val tbk = TopicBucket("kb", "b0000")
    (0 until 3).foreach(i => log.appendAt(tbk, i.toLong,
      Seq((Payload(i, Array(i.toByte)), 10L))))
    assert(log.compactKeyed("kb") == 3)
    // dense segments appended after the sparse product
    (3 until 6).foreach(i => log.appendAt(tbk, i.toLong,
      Seq((Payload(i, Array(i.toByte)), 20L))))
    val before = log.range(tbk, 0, 10).map(r => (r.offset, r.id))
    // size-based compaction may merge the dense RUN but must not absorb
    // the sparse segment into a byte-concat group
    log.compactSegments("kb")
    val segs = log.segments(tbk)
    assert(segs.exists(s => SegmentCodec.isSparse(s._1.getName)),
      "sparse product survives byte-concat compaction")
    assert(log.range(tbk, 0, 10).map(r => (r.offset, r.id)) == before)
  }

  test("explicit-offset frames: cursor rule in range/timestampAt, sparse tail gap") {
    import graft.log.Codecs
    val log = fileLog()
    log.createTopic("sparse", 1)
    // hand-build a sparse segment [0, 10) retaining offsets 2, 5, 9 —
    // exactly what key compaction produces — via the extended frame writer
    val dir = log.bucketDir(TopicBucket("sparse", "b0000"))
    log.fs.mkdirs(dir)
    val seg = new org.apache.hadoop.fs.Path(dir, SegmentCodec.segmentName(0L, 10L))
    val out = new java.io.DataOutputStream(log.fs.create(seg, true))
    SegmentCodec.writeFrame(out, 2, 2000L, "v2".getBytes, Codecs.None, offset = 2L)
    SegmentCodec.writeFrame(out, 5, 5000L, ("v5" * 100).getBytes, Codecs.Zstd, offset = 5L)
    SegmentCodec.writeFrame(out, 9, 9000L, "v9".getBytes, Codecs.None, offset = 9L)
    out.close()
    val tbs = TopicBucket("sparse", "b0000")
    // range: retained records surface at their ORIGINAL offsets; gaps skip
    val all = log.range(tbs, 0, 10)
    assert(all.map(r => (r.offset, r.id)) == Seq((2L, 2), (5L, 5), (9L, 9)))
    assert(new String(all(1).data) == "v5" * 100, "compressed sparse payload decodes")
    // sub-range pruning over the sparse map
    assert(log.range(tbs, 3, 9).map(_.offset) == Seq(5L))
    assert(log.range(tbs, 6, 9).isEmpty, "a gap-only sub-range reads empty")
    // timestampAt: first record AT-OR-AFTER the asked offset
    assert(log.timestampAt(tbs, 2) == Some(2000L))
    assert(log.timestampAt(tbs, 3) == Some(5000L), "gap resolves forward")
    assert(log.timestampAt(tbs, 9) == Some(9000L))
    // offsetForTimestamp walks explicit offsets correctly
    assert(log.offsetForTimestamp(tbs, 5000L) == 5L)
    assert(log.offsetForTimestamp(tbs, 5001L) == 9L)
  }

  test("keyed rewrite under a tiny key budget spills to sorted runs and stays byte-identical") {
    import graft.log.Codecs
    val log = fileLog()
    log.createTopic("cap", 1)
    val tbc = TopicBucket("cap", "b0000")
    val dir = log.bucketDir(tbc)
    // three members, 4000 frames, 997 distinct keys (coprime stride so
    // every key repeats across members), negative ids included to pin the
    // unsigned run ordering; payloads vary per offset so a wrong retained
    // offset would change bytes, not just counts
    val nKeys = 997
    def keyAt(off: Long): Int = {
      val k = ((off * 31) % nKeys).toInt
      if (k % 5 == 0) -k - 1 else k // mix negative ids in
    }
    var off = 0L
    val memberPaths = (0 until 3).map { m =>
      val count = if (m == 2) 2000L else 1000L
      val p = new org.apache.hadoop.fs.Path(dir, SegmentCodec.segmentName(off, count))
      val o = new java.io.DataOutputStream(log.fs.create(p, true))
      (0L until count).foreach { i =>
        SegmentCodec.writeFrame(o, keyAt(off + i), 1000L + off + i,
          s"payload-${off + i}".getBytes("UTF-8"))
      }
      o.close()
      val start = off
      off += count
      (p, start)
    }
    val fast = new org.apache.hadoop.fs.Path(dir, ".out-fast")
    val slow = new org.apache.hadoop.fs.Path(dir, ".out-spill")
    val rFast = SegmentCodec.rewriteLatestPerKey(log.fs, memberPaths, fast,
      Codecs.Zstd) // in-heap path (default budget)
    assert(rFast.spillRuns == 0,
      "the default budget must stay on the in-heap path here")
    // budget of 64 entries over 997 distinct keys: the spill path runs,
    // with many runs and many offset-runs — the per-call count is THIS
    // call's, exact under concurrent compactions in the JVM
    val rSlow = SegmentCodec.rewriteLatestPerKey(log.fs, memberPaths, slow,
      Codecs.Zstd, maxKeys = 64)
    assert(rSlow.spillRuns > 10,
      "the tiny budget must actually take the sorted-spill path")
    // budget 8 over 4000 frames => ~500 runs: past the 256 merge fan-in
    // cap, so the group-wise consolidation pass engages — output must
    // STILL be byte-identical (latest-per-id collapse is associative)
    val slower = new org.apache.hadoop.fs.Path(dir, ".out-spill8")
    val rSlower = SegmentCodec.rewriteLatestPerKey(log.fs, memberPaths, slower,
      Codecs.Zstd, maxKeys = 8)
    def stats(r: SegmentCodec.KeyedRewrite) = (r.rows, r.minTs, r.maxTs)
    assert(stats(rSlower) == stats(rFast))
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(nio(fast)),
      java.nio.file.Files.readAllBytes(nio(slower))),
      "consolidated-merge output must stay byte-identical")
    assert(stats(rFast) == stats(rSlow), s"stats must match: $rFast vs $rSlow")
    assert(rFast.rows == nKeys.toLong, "one retained record per distinct key")
    val bFast = java.nio.file.Files.readAllBytes(nio(fast))
    val bSlow = java.nio.file.Files.readAllBytes(nio(slow))
    assert(java.util.Arrays.equals(bFast, bSlow),
      "spill path must emit byte-identical output (deterministic republish)")
    // and the retained set really is latest-per-key at original offsets
    val it = SegmentCodec.read(log.fs, slow)
    val got = try {
      val b = Seq.newBuilder[(Long, Int)]
      while (it.hasNext) { val (id, _, _) = it.next(); b += ((it.explicitOffset, id)) }
      b.result()
    } finally it.close()
    val want = (0L until off).map(o => (o, keyAt(o)))
      .groupBy(_._2).map(_._2.last).toSeq.sortBy(_._1)
    assert(got == want)
    // no spill litter left behind in the task's temp dir
    val tmpDir = new java.io.File(System.getProperty("java.io.tmpdir"))
    val litter = tmpDir.listFiles((_, n) => n.startsWith("graft-keyed-"))
    assert(litter == null || litter.isEmpty,
      s"spill runs must be deleted, found ${Option(litter).map(_.toSeq)}")
  }

  test("tombstone payloads (null data) round-trip both log planes; empty stays distinct") {
    for ((name, log) <- logs()) {
      log.append(tb, Seq(Payload(1, "v1".getBytes),
        Payload(2, null), Payload(3, Array.emptyByteArray)))
      val got = log.range(tb, 0, 3).map(r => (r.id, r.data == null,
        r.data != null && r.data.isEmpty))
      assert(got == Seq((1, false, false), (2, true, false), (3, false, true)),
        s"$name: $got")
    }
  }

  test("tombstones: null data frames round-trip, compact away after retention, spill-path parity") {
    import graft.log.Codecs
    val log = fileLog()
    log.createTopic("ts", 1)
    val tbt = TopicBucket("ts", "b0000")
    val dir = log.bucketDir(tbt)
    log.fs.mkdirs(dir)
    // seg1 [0,3): values for keys 1,2,3; seg2 [3,5): tombstone key 2
    // (OLD ts), update key 3; an EMPTY payload for key 1 would be a
    // VALUE, not a delete — pin the distinction
    val s1 = new org.apache.hadoop.fs.Path(dir, SegmentCodec.segmentName(0L, 3L))
    val o1 = new java.io.DataOutputStream(log.fs.create(s1, true))
    SegmentCodec.writeFrame(o1, 1, 1000L, Array.emptyByteArray) // empty VALUE
    SegmentCodec.writeFrame(o1, 2, 1001L, "v2".getBytes)
    SegmentCodec.writeFrame(o1, 3, 1002L, "v3".getBytes)
    o1.close()
    val s2 = new org.apache.hadoop.fs.Path(dir, SegmentCodec.segmentName(3L, 2L))
    val o2 = new java.io.DataOutputStream(log.fs.create(s2, true))
    SegmentCodec.writeFrame(o2, 2, 2000L, null) // tombstone, ts 2000
    SegmentCodec.writeFrame(o2, 3, 2001L, "v3b".getBytes)
    o2.close()
    // raw read: the tombstone surfaces as a null-data frame
    val it0 = SegmentCodec.read(log.fs, s2)
    val (id0, _, d0) = it0.next()
    assert(id0 == 2 && d0 == null && it0.tombstone)
    val (_, _, d1) = it0.next()
    assert(d1 != null && !it0.tombstone)
    it0.close()
    val members = Seq((s1, 0L), (s2, 3L))
    // PASS 1 over RAW members: the delete is retained even under a
    // MAXIMAL floor — aging is by CLEAN time, a raw member never drops
    // its tombstones (one pass must leave the delete visible), and the
    // record's own event-time ts (2000, 'old') is never consulted —
    // latest-per-key = {1@0 empty, 2@3 tomb, 3@4}. The product name is
    // sparse-marked like a real publish, so the aging arms below see it
    // as a compaction product.
    val keep = new org.apache.hadoop.fs.Path(dir, ".out-keep-k3.log")
    val rKeep = SegmentCodec.rewriteLatestPerKey(log.fs, members, keep,
      tombstoneFloorMs = Long.MaxValue)
    assert(rKeep.rows == 3L, s"first-pass tombstone retained, got $rKeep")
    val kit = SegmentCodec.read(log.fs, keep)
    val kept = Iterator.continually {
      val (id, _, d) = kit.next()
      (kit.explicitOffset, id, d == null, kit.tombstone)
    }.take(3).toSeq
    kit.close()
    assert(kept == Seq((0L, 1, false, false), (3L, 2, true, true),
      (4L, 3, false, false)), s"got $kept")
    assert(new String(SegmentCodec.read(log.fs, keep).next()._3) == "",
      "the empty-array VALUE survives as a value, not a delete")
    // the product is sparse but FRESH: a second pass whose floor sits
    // 24 h in the past still retains the delete (the clean-time window
    // has not elapsed) and stays byte-stable — a tombstone re-frames as
    // a tombstone, not as an empty value
    val dayAgo = System.currentTimeMillis() - 86400000L
    val young = new org.apache.hadoop.fs.Path(dir, ".out-young")
    val rYoung = SegmentCodec.rewriteLatestPerKey(log.fs, Seq((keep, 0L)),
      young, tombstoneFloorMs = dayAgo)
    assert(rYoung.rows == 3L, s"young product keeps the delete, got $rYoung")
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(nio(keep)),
      java.nio.file.Files.readAllBytes(nio(young))))
    // backdate the product past the horizon (2 days): the delete has now
    // been observable in a compacted product for a full window — the key
    // drops entirely
    log.fs.setTimes(keep, System.currentTimeMillis() - 2 * 86400000L, -1)
    val drop = new org.apache.hadoop.fs.Path(dir, ".out-drop")
    val rDrop = SegmentCodec.rewriteLatestPerKey(log.fs, Seq((keep, 0L)),
      drop, tombstoneFloorMs = dayAgo)
    assert(rDrop.rows == 2L, s"aged tombstone drops its key, got $rDrop")
    val dit = SegmentCodec.read(log.fs, drop)
    val ids = Iterator.continually(dit.next()._1).take(2).toSeq
    dit.close()
    assert(ids == Seq(1, 3))
    // spill path parity under tombstone aging (budget floor is 8)
    val spill = new org.apache.hadoop.fs.Path(dir, ".out-spill")
    SegmentCodec.rewriteLatestPerKey(log.fs, Seq((keep, 0L)), spill,
      maxKeys = 8, tombstoneFloorMs = dayAgo)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(nio(drop)),
      java.nio.file.Files.readAllBytes(nio(spill))))
  }

  test("zstd-dict: small-record ratio win, round-trip, skip walk, mixed concat, loud corruption") {
    import graft.log.Codecs
    val dir = Files.createTempDirectory("graftdict")
    // 2000 small JSON-ish records sharing structure — the shape per-frame
    // zstd can't touch (most are under MinCompressBytes=64 and each
    // compresses in isolation)
    val rows = (0 until 2000).map { i =>
      (Payload(i, s"""{"user":"u$i","event":"click","page":"/home","n":$i}"""
        .getBytes("UTF-8")), 1000L + i)
    }
    def writeAs(codec: Int, name: String): java.nio.file.Path = {
      val p = dir.resolve(name)
      SegmentCodec.writeFrames(Files.newOutputStream(p), rows, codec)
      p
    }
    val plain = writeAs(Codecs.Zstd, "plain")
    val dicted = writeAs(Codecs.ZstdDict, "dict")
    val rawLen = rows.map(_._1.data.length + 16).sum
    assert(Files.size(dicted) * 10 < rawLen.toLong * 8,
      s"dict must cut >=20% vs raw: ${Files.size(dicted)} vs $rawLen")
    assert(Files.size(dicted) < Files.size(plain),
      s"dict must beat plain zstd on small records: " +
        s"${Files.size(dicted)} vs ${Files.size(plain)}")
    // exact round-trip, dict frames invisible to record iteration
    val it = SegmentCodec.read(dicted)
    val got = Iterator.continually(it.next()).takeWhile(_ => true)
      .take(2000).map { case (id, ts, d) => (id, ts, new String(d, "UTF-8")) }.toSeq
    assert(!it.hasNext); it.close()
    assert(got == rows.map { case (p, ts) => (p.id, ts, new String(p.data, "UTF-8")) })
    // header-only walk skips dict and payload bytes alike
    val hit = new SegmentCodec.FrameIterator(Files.newInputStream(dicted), skipData = true)
    var n = 0
    while (hit.hasNext) { hit.next(); n += 1 }
    hit.close()
    assert(n == 2000, s"skip walk must count records only, got $n")
    // sub-threshold file: too few records to train — plain zstd fallback
    val tiny = dir.resolve("tiny")
    SegmentCodec.writeFrames(Files.newOutputStream(tiny), rows.take(5), Codecs.ZstdDict)
    val tit = SegmentCodec.read(tiny)
    assert(Iterator.continually(tit.next()).take(5).map(_._1).toSeq == (0 until 5))
    tit.close()
    // byte-concat of dict + v1-raw + dict files reads seamlessly in order
    val other = dir.resolve("other")
    SegmentCodec.writeFrames(Files.newOutputStream(other),
      rows.take(10).map { case (p, ts) => (Payload(p.id + 1000, p.data), ts) },
      Codecs.None)
    val cat = dir.resolve("cat")
    Files.write(cat, Files.readAllBytes(dicted) ++ Files.readAllBytes(other)
      ++ Files.readAllBytes(dicted))
    val cit = SegmentCodec.read(cat)
    val ids = Iterator.continually(cit.next()).take(4010).map(_._1).toSeq
    assert(!cit.hasNext); cit.close()
    assert(ids == (0 until 2000) ++ (1000 until 1010) ++ (0 until 2000))
    // corruption loudness: a dict-compressed frame with NO preceding dict
    val bytes = Files.readAllBytes(dicted)
    // find the dict frame length to cut it out: first frame is the dict
    val dl = -java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt()
    val headless = bytes.drop(4 + dl)
    val bad = dir.resolve("bad")
    Files.write(bad, headless)
    val bit = SegmentCodec.read(bad)
    val e = intercept[java.io.IOException] {
      while (bit.hasNext) bit.next()
    }
    bit.close()
    assert(e.getMessage.contains("before any dict frame"), e.getMessage)
    // a dangling trailing dict frame (torn write) is loud, not silent
    val dang = dir.resolve("dang")
    Files.write(dang, bytes ++ bytes.take(4 + dl))
    val dit = SegmentCodec.read(dang)
    val e2 = intercept[java.io.IOException] { while (dit.hasNext) dit.next() }
    dit.close()
    assert(e2.getMessage.contains("dangling dict frame"), e2.getMessage)
  }

  test("deflate decompress is loud on trailing bytes past the stream end") {
    import graft.log.Codecs
    val raw = ("the quick brown fox " * 20).getBytes("UTF-8")
    val comp = Codecs.compress(Codecs.Deflate, raw)
    // the honest stream round-trips
    assert(Codecs.decompress(Codecs.Deflate, comp, raw.length).sameElements(raw))
    // a torn/overwritten frame body whose prefix still inflates to rawLen
    // must take the loud-corruption path, not a silent accept
    val torn = comp ++ Array[Byte](1, 2, 3, 4)
    val e = intercept[java.io.IOException] {
      Codecs.decompress(Codecs.Deflate, torn, raw.length)
    }
    assert(e.getMessage.contains("torn or overwritten"))
  }

  test("record headers (KIP-82): round-trip per codec, tombstone headers, skip walk, keyed rewrite, loud corruption") {
    import graft.log.Codecs
    val dir = Files.createTempDirectory("hdrs")
    def hs(kvs: (String, Array[Byte])*): Array[(String, Array[Byte])] =
      kvs.toArray
    def hview(h: Array[(String, Array[Byte])]): Seq[(String, Option[String])] =
      if (h == null) null
      else h.toSeq.map { case (k, v) =>
        (k, Option(v).map(new String(_, "UTF-8"))) }
    val big = ("lorem ipsum dolor sit amet " * 40).getBytes("UTF-8")
    for (codec <- Seq(Codecs.None, Codecs.Zstd, Codecs.ZstdDict)) {
      val f = dir.resolve(s"h$codec")
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(Files.newOutputStream(f)))
      val fw = new SegmentCodec.FrameWriter(out, codec, trainRecords = 3)
      // duplicate keys + a null value + non-ASCII: all legal, order kept
      fw.write(1, 1000L, big, headers =
        hs("trace" -> "t-1".getBytes("UTF-8"), "trace" -> "t-2".getBytes("UTF-8"),
          "schéma" -> null))
      fw.write(2, 2000L, big) // no headers: flag unset, zero wire cost
      fw.write(3, 3000L, null, headers = hs("why" -> "gdpr".getBytes("UTF-8"))) // tombstone + headers
      fw.write(4, 4000L, big, headers = Array.empty) // empty normalizes to none
      fw.write(5, 5000L, "tiny".getBytes("UTF-8"), offset = 41L,
        headers = hs("k" -> "v".getBytes("UTF-8"))) // explicit offset + headers
      fw.finish(); out.close()

      val it = SegmentCodec.read(f)
      try {
        val r1 = it.next()
        assert(r1._1 == 1 && java.util.Arrays.equals(r1._3, big))
        assert(hview(it.headers) == Seq(("trace", Some("t-1")),
          ("trace", Some("t-2")), ("schéma", None)), s"codec $codec r1")
        val r2 = it.next()
        assert(r2._1 == 2 && it.headers == null, s"codec $codec r2")
        val r3 = it.next()
        assert(r3._1 == 3 && r3._3 == null && it.tombstone)
        assert(hview(it.headers) == Seq(("why", Some("gdpr"))),
          s"codec $codec tombstone headers")
        val r4 = it.next()
        assert(r4._1 == 4 && it.headers == null, s"codec $codec empty→none")
        val r5 = it.next()
        assert(r5._1 == 5 && it.explicitOffset == 41L &&
          hview(it.headers) == Seq(("k", Some("v"))), s"codec $codec r5")
        assert(!it.hasNext)
      } finally it.close()

      // metadata walk (readHeaders default): header blocks SKIPPED, not
      // parsed — ids/ts exact, zero header allocation
      val mit = new SegmentCodec.FrameIterator(Files.newInputStream(f),
        skipData = true, parseHeaders = false)
      try {
        val meta = mit.toList
        assert(meta.map(_._1) == Seq(1, 2, 3, 4, 5), s"codec $codec meta ids")
        assert(mit.headers == null)
      } finally mit.close()

      // headers-projected, payload-pruned walk: headers parse, payloads seek
      val hit = new SegmentCodec.FrameIterator(Files.newInputStream(f),
        skipData = true, parseHeaders = true)
      try {
        val h1 = hit.next()
        assert(h1._3.isEmpty && hview(hit.headers).size == 3,
          s"codec $codec pruned+headers")
      } finally hit.close()
    }

    // sameFrames is headers-sensitive: same (id, data), different headers
    // must compare UNEQUAL (a replayed epoch must not lose its headers)
    val a = dir.resolve("same-a"); val b = dir.resolve("same-b"); val c = dir.resolve("same-c")
    for ((f, tag) <- Seq((a, "x"), (b, "x"), (c, "y"))) {
      val o = new java.io.DataOutputStream(Files.newOutputStream(f))
      SegmentCodec.writeFrame(o, 1, 1L, "d".getBytes("UTF-8"),
        headers = hs("h" -> tag.getBytes("UTF-8")))
      o.close()
    }
    assert(SegmentCodec.sameFrames(a, b))
    assert(!SegmentCodec.sameFrames(a, c))

    // keyed rewrite keeps the retained record's headers (and only the
    // retained one's) — across the dict re-train path too
    val log = fileLog()
    log.createTopic("h", 1)
    val tbh = TopicBucket("h", "b0000")
    val bdir = log.bucketDir(tbh)
    val member = new org.apache.hadoop.fs.Path(bdir, SegmentCodec.segmentName(0L, 4L))
    val mo = new java.io.DataOutputStream(log.fs.create(member, true))
    SegmentCodec.writeFrame(mo, 7, 1L, "old".getBytes("UTF-8"),
      headers = hs("v" -> "old".getBytes("UTF-8")))
    SegmentCodec.writeFrame(mo, 8, 2L, "only".getBytes("UTF-8"))
    SegmentCodec.writeFrame(mo, 7, 3L, "new".getBytes("UTF-8"),
      headers = hs("v" -> "new".getBytes("UTF-8"), "n" -> null))
    SegmentCodec.writeFrame(mo, 9, 4L, "last".getBytes("UTF-8"),
      headers = hs("z" -> "9".getBytes("UTF-8")))
    mo.close()
    val outp = new org.apache.hadoop.fs.Path(bdir, ".out-h")
    val r = SegmentCodec.rewriteLatestPerKey(log.fs, Seq((member, 0L)), outp,
      Codecs.Zstd)
    assert(r.rows == 3)
    val rit = SegmentCodec.read(log.fs, outp)
    try {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Seq[(String, Option[String])])]
      while (rit.hasNext) {
        val (id, _, d) = rit.next()
        got += ((id, new String(d, "UTF-8"), Option(hview(rit.headers)).getOrElse(Seq.empty)))
      }
      assert(got.toSeq == Seq(
        (8, "only", Seq.empty),
        (7, "new", Seq(("v", Some("new")), ("n", None))),
        (9, "last", Seq(("z", Some("9"))))))
    } finally rit.close()

    // corruption is loud: a header block length past the frame bound, and
    // a header count that can't fit the block
    val badLen = dir.resolve("bad-len")
    val d1 = new java.io.DataOutputStream(Files.newOutputStream(badLen))
    d1.writeInt(-(1 + 12 + 4)); d1.writeByte(0x40); d1.writeInt(1)
    d1.writeLong(0L); d1.writeInt(999) // blockLen 999 > frame
    d1.close()
    val bit = SegmentCodec.read(badLen)
    val e1 = intercept[java.io.IOException] { bit.next() }
    assert(e1.getMessage.contains("header block length"), e1.getMessage)
    bit.close()
    val badCount = dir.resolve("bad-count")
    val d2 = new java.io.DataOutputStream(Files.newOutputStream(badCount))
    d2.writeInt(-(1 + 12 + 4 + 8)); d2.writeByte(0x40); d2.writeInt(1)
    d2.writeLong(0L); d2.writeInt(8); d2.writeInt(7) // count 7 in an 8-byte block
    d2.close()
    val cit = SegmentCodec.read(badCount)
    val e2 = intercept[java.io.IOException] { cit.next() }
    assert(e2.getMessage.contains("header count"), e2.getMessage)
    cit.close()
  }
}
