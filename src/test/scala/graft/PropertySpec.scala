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
}
