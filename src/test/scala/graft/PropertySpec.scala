package graft

import graft.log.{FileTopicLog, InMemoryLog, SegmentCodec}
import graft.model.{Payload, TopicBucket}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ScalaCheck property tests for the log contract (FIXTURES.md §A
  * invariants), driven through scalacheck's own runner inside scalatest.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }

  private val genPayloads: Gen[List[Payload]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.choose(Int.MinValue, Int.MaxValue)
        data <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
      } yield Payload(id, data))
    }

  test("segment codec round-trips arbitrary payload batches") {
    check(Prop.forAll(genPayloads, Gen.choose(0L, Long.MaxValue / 2)) { (xs, ts) =>
      val f = Files.createTempFile("seg", ".log")
      SegmentCodec.write(f, xs.map(p => (p, ts)))
      val back = SegmentCodec.read(f).toList
      Files.deleteIfExists(f)
      back.size == xs.size && back.zip(xs).forall { case ((id, t, d), p) =>
        id == p.id && t == ts && java.util.Arrays.equals(d, p.data)
      }
    })
  }

  test("file log range(i,j) == in-memory slice semantics for arbitrary appends") {
    val tb = TopicBucket("t", "b")
    check(Prop.forAll(Gen.listOfN(3, genPayloads),
      Gen.choose(0, 130), Gen.choose(0, 130)) { (batches, i, j) =>
      val log = new FileTopicLog(Files.createTempDirectory("proplog"))
      val ref = new InMemoryLog
      batches.foreach { b => log.append(tb, b); ref.append(tb, b) }
      val got = log.range(tb, i.toLong, j.toLong).map(r => (r.offset, r.id))
      val want = ref.range(tb, i.toLong, j.toLong).map(r => (r.offset, r.id))
      got == want
    }, n = 40)
  }

  test("offsets are dense and monotone regardless of append batching") {
    val tb = TopicBucket("t", "b")
    check(Prop.forAll(Gen.listOfN(4, genPayloads)) { batches =>
      val log = new FileTopicLog(Files.createTempDirectory("proplog2"))
      batches.foreach(b => log.append(tb, b))
      val all = log.range(tb, 0, Long.MaxValue)
      all.map(_.offset) == (0L until all.size.toLong) &&
        log.size(tb) == all.size.toLong
    }, n = 30)
  }

  private val genBacklog: Gen[Map[String, Long]] =
    Gen.choose(0, 12).flatMap { n =>
      // mix everyday sizes with 100 TB-scale backlogs (1e10+ rows/bucket):
      // rest × backlog must not overflow Long inside the allocator
      Gen.listOfN(n, Gen.oneOf(Gen.choose(0L, 10000L), Gen.choose(0L, 50_000_000_000L)))
        .map(_.zipWithIndex.map { case (v, i) => f"b$i%04d" -> v }.toMap)
    }

  test("token blocklist walk == split-based reference on arbitrary word soup") {
    val vocab = Gen.oneOf("alpha", "beta", "Gamma", "BLOCKED", "blocked",
      "spam", "x", "list", "spammy", "blockedx")
    val genText = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, vocab)
      // separators include the Unicode Z* class TokenBlocked.isWs accepts
      // (NBSP, en-space, line/para separators, ideographic space) — the
      // q101 oracle mirrors them as RE2 [\s\p{Z}]+
      sep <- Gen.listOfN(math.max(n - 1, 0) + 2, Gen.oneOf(" ", "  ", "\t",
        "\n", "\u00a0", "\u2003", "\u2028", "\u2029", "\u3000"))
    } yield sep.head + ws.zip(sep.tail).map { case (w, s) => w + s }.mkString
    val set = new java.util.HashSet[String]()
    Seq("blocked", "spam").foreach(set.add)
    check(Prop.forAll(genText) { text =>
      // independent reference: the regex engine's \s + \p{javaSpaceChar}
      // (== Character.isSpaceChar) vs TokenBlocked's hand-rolled walk
      val naive = text.split("[\\s\\p{javaSpaceChar}]+").filter(_.nonEmpty)
        .exists(t => set.contains(t.toLowerCase(java.util.Locale.ROOT)))
      graft.functions.TokenBlocked.anyBlocked(text, set) == naive
    })
  }

  test("domain suffix match == naive label-suffix reference on arbitrary hosts") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val blocklist = Array("example.com", "ads.tracker.net", "org")
    val expr = (h: String) => graft.functions.DomainBlocked(
      Literal.create(UTF8String.fromString(h),
        org.apache.spark.sql.types.StringType), blocklist)
      .eval(null).asInstanceOf[Boolean]
    val label = Gen.oneOf("example", "com", "ads", "tracker", "net", "org",
      "www", "x", "notexample", "example.com") // incl. a dotted "label"
    val genHost = for {
      n <- Gen.choose(1, 5)
      ls <- Gen.listOfN(n, label)
    } yield ls.mkString(".")
    check(Prop.forAll(genHost) { host =>
      val suffixes = host +:
        host.indices.filter(host(_) == '.').map(i => host.substring(i + 1))
      val naive = suffixes.exists(blocklist.contains)
      expr(host) == naive
    })
  }

  test("image dHash: deterministic and exactly brightness-shift invariant") {
    import graft.ops.Multimodal.MediaCodec
    val genSeed = for {
      n <- Gen.choose(1, 60)
      bs <- Gen.listOfN(n, Gen.choose(32, 126)) // printable ASCII: +8 never clamps
    } yield bs.map(_.toByte).toArray
    val genDims = for {
      w <- Gen.choose(9, 40)
      h <- Gen.choose(8, 30)
    } yield (w, h)
    check(Prop.forAll(genSeed, genDims) { case (seed, (w, h)) =>
      val base = MediaCodec.dHash(MediaCodec.encodePng(seed, w, h))
      val again = MediaCodec.dHash(MediaCodec.encodePng(seed, w, h))
      val shifted = MediaCodec.dHash(MediaCodec.encodePng(seed, w, h, bias = 8))
      base.isDefined && base == again && base == shifted
    }, n = 40)
  }

  test("LSH parameter choice: valid factorization, midpoint tracks threshold") {
    check(Prop.forAll(Gen.oneOf(32, 64, 128, 256), Gen.choose(0.2, 0.9)) {
      (numHashes: Int, threshold: Double) =>
        val (b, r) = graft.ops.Dedup.lshParams(numHashes, threshold)
        val midpoint = math.pow(1.0 / b, 1.0 / r)
        // collision probability for a pair AT the midpoint:
        // 1 - (1 - midpoint^r)^b ≈ 1 - 1/e when b, r > 1
        val pAtMid = 1.0 - math.pow(1.0 - math.pow(midpoint, r), b)
        // tolerance: b=2 lands on exactly 0.75 and float rounding can
        // overshoot by an ulp
        b * r == numHashes &&
          math.abs(midpoint - threshold) <= 0.25 &&
          (b == 1 || r == 1 || (pAtMid > 0.5 - 1e-9 && pAtMid < 0.75 + 1e-9))
    })
  }

  test("RippleOffset json round-trips arbitrary legal keys (incl. topic/bucket-qualified)") {
    val genName = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
    val genKey = for {
      t <- genName; b <- genName; qualified <- Gen.oneOf(true, false)
    } yield if (qualified) s"$t/$b" else b
    check(Prop.forAll(Gen.mapOf(Gen.zip(genKey, Gen.choose(0L, Long.MaxValue)))) { m =>
      graft.connector.RippleOffset.fromJson(
        graft.connector.RippleOffset(m).json()).ends == m
    })
  }

  test("TopicSnapshot token round-trips ranges and the schema version") {
    val genName = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
    val genRange = for {
      lo <- Gen.choose(0L, 1L << 40); n <- Gen.choose(0L, 1L << 20)
    } yield (lo, lo + n)
    check(Prop.forAll(genName, Gen.mapOf(Gen.zip(genName, genRange)),
        Gen.option(Gen.choose(1, 10000))) { (topic, ranges, sv) =>
      val (t2, r2, sv2) = graft.connector.TopicSnapshot.decode(
        graft.connector.TopicSnapshot.encode(topic, ranges, sv))
      t2 == topic && r2 == ranges && sv2 == sv
    })
  }

  test("byteFloorWalk == brute-force trailing-suffix choice; monotone in budget") {
    val genSegs: Gen[List[(Long, Long)]] =
      Gen.choose(0, 12).flatMap { n =>
        Gen.listOfN(n, Gen.choose(1L, 50L)).map { counts =>
          // dense start offsets from accumulated counts, random byte sizes
          val starts = counts.scanLeft(0L)(_ + _).init
          starts.zip(counts.map(_ * 7 % 40 + 1))
        }
      }
    // reference: smallest trailing suffix (always incl. the newest) whose
    // bytes fit maxBytes — or just the newest when even it alone overflows
    def brute(segs: List[(Long, Long)], maxBytes: Long): Option[Long] = {
      if (segs.size <= 1) return None
      val keep = (1 to segs.size).reverse // suffix lengths, longest first
        .map(k => segs.takeRight(k))
        .find(sfx => sfx.map(_._2).sum <= maxBytes)
        .getOrElse(segs.takeRight(1))
      if (keep.head._1 == segs.head._1) None else Some(keep.head._1)
    }
    check(Prop.forAll(genSegs, Gen.choose(0L, 300L)) { (segs, budget) =>
      graft.log.FileTopicLog.byteFloorWalk(segs, budget) == brute(segs, budget)
    })
    // a larger budget never advances the floor further
    check(Prop.forAll(genSegs, Gen.choose(0L, 300L), Gen.choose(0L, 300L)) {
      (segs, a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val fLo = graft.log.FileTopicLog.byteFloorWalk(segs, lo).getOrElse(0L)
        val fHi = graft.log.FileTopicLog.byteFloorWalk(segs, hi).getOrElse(0L)
        fHi <= fLo
    })
  }

  test("rate-cap allocation: sums to min(cap,total), bounded, starvation-free") {
    check(Prop.forAll(genBacklog,
        Gen.oneOf(Gen.choose(0L, 5000L), Gen.choose(0L, 2_000_000_000L))) { (backlog, cap) =>
      val takes = graft.connector.RippleAdmission.allocate(backlog, cap)
      val total = backlog.values.sum
      val nonEmpty = backlog.count(_._2 > 0)
      val sumOk = takes.values.sum == math.min(cap, total)
      val boundedOk = takes.forall { case (b, t) =>
        t >= 0 && t <= backlog.getOrElse(b, 0L)
      }
      // min-1 fairness whenever the cap covers the non-empty bucket count
      val fairnessOk = cap < nonEmpty ||
        backlog.forall { case (b, n) => n == 0 || takes.getOrElse(b, 0L) >= 1 }
      // determinism: same inputs, same answer
      val deterministicOk = takes == graft.connector.RippleAdmission.allocate(backlog, cap)
      sumOk && boundedOk && fairnessOk && deterministicOk
    }, n = 300)
  }
}
