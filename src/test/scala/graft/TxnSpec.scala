package graft

import graft.api.Ripple
import graft.connector.TxnMarkers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Cross-topic transactions (the Kafka-transactions analog): pending
  * markers from `transactional` routed writes, `readCommitted` isolation
  * (stable-end caps + aborted-range subtraction), admin abort with replay
  * fencing, and marker vacuum. See [[graft.connector.TxnMarkers]].
  */
class TxnSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-txn-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("grafttxn").toString
  private def log(root: String) =
    graft.log.FileTopicLog.cached(root, graft.log.LogFs.activeHadoopConf)

  private def chain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  /** Routed transactional fixture: stream (id, payload, target) into
    * topics ta/tb with a crash injected between the two topics' publishes
    * — the torn-epoch window the markers exist for. Returns (root,
    * checkpoint, memory stream, start()).
    */
  private def tornEpoch(): (String, String,
      MemoryStream[(Int, String, String)],
      () => org.apache.spark.sql.streaming.StreamingQuery) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = tmp()
    Ripple.createTopic(root, "ta", numBuckets = 1)
    Ripple.createTopic(root, "tb", numBuckets = 1)
    val mem = MemoryStream[(Int, String, String)]
    def df = mem.toDF().toDF("id", "payload", "target")
      .select(col("id"), col("payload").cast("binary").as("data"), col("target"))
    val cp = tmp()
    val start = () => df.writeStream.format("ripple")
      .option("path", root).option("topicColumn", "target")
      .option("transactional", "true")
      .option("checkpointLocation", cp).start()
    mem.addData((1, "a1", "ta"), (2, "b1", "tb"), (3, "a2", "ta"))
    @volatile var crashed = false
    graft.connector.RipplePublish.interTopicSeam = t =>
      if (t == "ta" && !crashed) { crashed = true; sys.error("injected crash between topics") }
    val q1 = start()
    try intercept[Exception] { q1.processAllAvailable() }
    finally { q1.stop(); graft.connector.RipplePublish.interTopicSeam = _ => () }
    assert(crashed, "the seam must have fired")
    (root, cp, mem, start)
  }

  test("readCommitted hides a torn transactional epoch; plain read sees it; replay commits atomically") {
    val (root, _, _, start) = tornEpoch()
    // plain read = read_uncommitted: ta's half of the epoch is visible
    assert(Ripple.read(spark, root, "ta").count() == 2)
    assert(Ripple.read(spark, root, "tb").count() == 0)
    // readCommitted: the whole epoch is in flight — NOTHING visible
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
    assert(Ripple.readCommitted(spark, root, "tb").count() == 0)
    // both participants hold a pending marker; ta's was upgraded to the
    // exact published range before its segments landed
    val pa = TxnMarkers.listPending(log(root), "ta")
    val pb = TxnMarkers.listPending(log(root), "tb")
    assert(pa.size == 1 && pb.size == 1)
    assert(pa.head.ranges == Map("b0000" -> (0L, 2L)), pa.head.ranges.toString)
    assert(pb.head.ranges.values.forall(_._2 == -1L), "tb never published: floor form")
    // LSO stall: an innocent writer's rows beyond the pending floor are
    // withheld with the in-flight epoch's (Kafka read_committed semantics)
    import spark.implicits._
    Ripple.write(Seq((9, "late".getBytes)).toDF("id", "data"), root, "ta", 1)
    assert(Ripple.read(spark, root, "ta").count() == 3)
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
    // replay completes the transaction: pendings clear, everything stable
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(TxnMarkers.listPending(log(root), "ta").isEmpty)
    assert(TxnMarkers.listPending(log(root), "tb").isEmpty)
    assert(Ripple.readCommitted(spark, root, "ta").count() == 3)
    assert(Ripple.readCommitted(spark, root, "tb").count() == 1)
    // exactly-once held through the replay
    assert(Ripple.read(spark, root, "ta")
      .select("offset", "id").collect().map(r => (r.getLong(0), r.getInt(1)))
      .toSet == Set((0L, 1), (1L, 3), (2L, 9)))
  }

  test("abort fences the dead epoch, records published ranges, and readCommitted subtracts them") {
    val (root, _, mem, start) = tornEpoch()
    // abort both participants (threshold 0: everything pending is stale)
    val aa = Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    val ab = Ripple.abortStaleTxns(root, "tb", olderThanMs = 0L)
    assert(aa.size == 1 && aa.head.ranges == Map("b0000" -> (0L, 2L)))
    assert(ab.size == 1 && ab.head.ranges.isEmpty, "tb published nothing")
    assert(TxnMarkers.listPending(log(root), "ta").isEmpty)
    assert(TxnMarkers.listPending(log(root), "tb").isEmpty)
    // the rows stay in the log (read_uncommitted parity) but are
    // subtracted from readCommitted; the cap is gone
    assert(Ripple.read(spark, root, "ta").count() == 2)
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
    import spark.implicits._
    Ripple.write(Seq((9, "new".getBytes)).toDF("id", "data"), root, "ta", 1)
    assert(Ripple.readCommitted(spark, root, "ta")
      .select("offset").as[Long].collect().toSeq == Seq(2L))
    assert(Ripple.read(spark, root, "ta").count() == 3)
    // replayed epoch is FENCED: the restart completes quietly, tb never
    // gets the aborted rows, and later epochs flow normally
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(Ripple.read(spark, root, "tb").count() == 0)
    mem.addData((4, "b2", "tb"))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(Ripple.read(spark, root, "tb")
      .select("id").as[Int].collect().toSeq == Seq(4))
    assert(Ripple.readCommitted(spark, root, "tb").count() == 1)
    // segment compaction can merge an aborted range INTO a surviving
    // segment — subtraction must then split mid-segment
    Ripple.compactSegments(root, "ta")
    val segs = log(root).segments(graft.model.TopicBucket("ta", "b0000"))
    assert(segs.size == 1, s"expected one merged segment, got $segs")
    assert(Ripple.readCommitted(spark, root, "ta")
      .select("offset").as[Long].collect().toSeq == Seq(2L))
    assert(Ripple.read(spark, root, "ta").count() == 3)
  }

  test("readCommitted streaming stalls at the stable end and resumes when the transaction commits") {
    val (root, _, _, start) = tornEpoch()
    import spark.implicits._
    // innocent rows beyond the pending floor — stalled too
    Ripple.write(Seq((9, "late".getBytes)).toDF("id", "data"), root, "ta", 1)
    def drain(name: String): Long = {
      val q = spark.readStream.format("ripple")
        .option("path", root).option("topic", "ta")
        .option("readCommitted", "true").load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmp())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(30000)
      spark.table(name).count()
    }
    assert(drain("txn_stall") == 0, "everything above the LSO must stall")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(drain("txn_flow") == 3)
  }

  test("vacuum removes aborted markers only once retention has destroyed their ranges") {
    val (root, _, _, _) = tornEpoch()
    Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    Ripple.abortStaleTxns(root, "tb", olderThanMs = 0L)
    import spark.implicits._
    Ripple.write(Seq((9, "new".getBytes)).toDF("id", "data"), root, "ta", 1)
    // ta's marker still hides retained rows [0,2): vacuum must keep it
    assert(Ripple.vacuumTxnMarkers(root, "ta", graceMs = 0L).isEmpty)
    assert(TxnMarkers.listAborted(log(root), "ta").size == 1)
    // tb's marker is a pure fence (no ranges): grace alone ages it out
    assert(Ripple.vacuumTxnMarkers(root, "tb", graceMs = 0L).size == 1)
    assert(Ripple.vacuumTxnMarkers(root, "tb", graceMs = Long.MaxValue).isEmpty)
    // truncate ta to its newest segment: the aborted range falls below
    // the floor — now the marker is collectible
    Ripple.truncateToBytes(root, "ta", 1L)
    val floor = log(root).segments(graft.model.TopicBucket("ta", "b0000")).head._2
    assert(floor >= 2L, s"truncation must advance past the aborted range, floor=$floor")
    assert(Ripple.vacuumTxnMarkers(root, "ta", graceMs = 0L).size == 1)
    assert(TxnMarkers.listAborted(log(root), "ta").isEmpty)
    assert(Ripple.readCommitted(spark, root, "ta")
      .select("offset").as[Long].collect().toSeq == Seq(2L))
  }

  test("single-topic transactional stream works end-to-end; batch transactional refuses loudly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = tmp()
    Ripple.createTopic(root, "solo", numBuckets = 2)
    val mem = MemoryStream[(Int, String)]
    mem.addData((1, "x"), (2, "y"), (3, "z"))
    val q = mem.toDF().toDF("id", "payload")
      .select(col("id"), col("payload").cast("binary").as("data"))
      .writeStream.format("ripple")
      .option("path", root).option("topic", "solo")
      .option("transactional", "true")
      .option("checkpointLocation", tmp()).start()
    try q.processAllAvailable() finally q.stop()
    assert(TxnMarkers.listPending(log(root), "solo").isEmpty)
    assert(Ripple.readCommitted(spark, root, "solo").count() == 3)
    assert(Ripple.read(spark, root, "solo").count() == 3)
    // batch append has no epoch identity to resolve a pending against
    val e = intercept[Exception] {
      Seq((9, "b".getBytes)).toDF("id", "data")
        .write.format("ripple").option("path", root).option("topic", "solo")
        .option("transactional", "true").mode("append").save()
    }
    assert(chain(e).exists(_.contains("epoch identity")), chain(e).mkString("|"))
  }

  test("SQL: ABORT TRANSACTIONS / VACUUM TRANSACTIONS / READ TOPIC COMMITTED") {
    val (root, _, _, _) = tornEpoch()
    // drive the parser directly — in a full test run the singleton
    // session may predate this suite's extensions config
    val parser = new graft.GraftSqlParser(spark.sessionState.sqlParser)
    def sql(stmt: String) = org.apache.spark.sql.graft.bridge.ofRows(
      spark, parser.parsePlan(stmt))
    spark.conf.set("spark.graft.root", root)
    try {
      // loud refusals first
      val e1 = intercept[Exception] { sql("ABORT TRANSACTIONS ON ta ()") }
      assert(chain(e1).exists(_.contains("olderThanMs")), chain(e1).mkString("|"))
      val e2 = intercept[Exception] {
        sql("VACUUM TRANSACTIONS ON ta (bogus = 1)") }
      assert(chain(e2).exists(_.contains("unknown VACUUM TRANSACTIONS key")),
        chain(e2).mkString("|"))
      // READ TOPIC ... COMMITTED: capped while the transaction is pending
      assert(sql("READ TOPIC ta COMMITTED").count() == 0)
      assert(sql("READ TOPIC ta").count() == 2)
      // SHOW TRANSACTIONS: the in-flight epoch is visible with its
      // published range BEFORE the abort, the fence with the same range
      // AFTER it
      val pend = sql("SHOW TRANSACTIONS FOR ta").collect()
      assert(pend.length == 1 && pend(0).getString(2) == "pending" &&
        pend(0).getString(3) == "b0000:[0,2)" && pend(0).getLong(4) >= 0,
        pend.toSeq.toString)
      val aborted = sql("ABORT TRANSACTIONS ON ta (olderThanMs = 0)").collect()
      assert(aborted.length == 1 && aborted(0).getString(3) == "b0000:[0,2)",
        aborted.toSeq.toString)
      sql("ABORT TRANSACTIONS ON tb (olderThanMs = 0)").collect()
      assert(sql("READ TOPIC ta COMMITTED").count() == 0)
      assert(sql("READ TOPIC ta").count() == 2)
      val shown = sql("SHOW TRANSACTIONS FOR ta").collect()
      assert(shown.length == 1 && shown(0).getString(2) == "aborted" &&
        shown(0).getString(3) == "b0000:[0,2)", shown.toSeq.toString)
      // COMMITTED composes with AS TABLE: the view reduces over the
      // committed scan only
      import spark.implicits._
      Ripple.write(Seq((7, "live".getBytes)).toDF("id", "data"), root, "ta", 1)
      val viaTable = sql("READ TOPIC ta COMMITTED AS TABLE")
        .select("id").as[Int].collect().toSeq
      assert(viaTable == Seq(7), viaTable.toString)
      assert(sql("READ TOPIC ta AS TABLE").count() == 3)
      // vacuum: ta's marker still guards retained rows
      val kept = sql("VACUUM TRANSACTIONS ON ta").collect()(0)
      assert(kept.getInt(2) == 0, kept.toString)
      Ripple.truncateToBytes(root, "ta", 1L)
      val gone = sql("VACUUM TRANSACTIONS ON ta (graceMs = 0)").collect()(0)
      assert(gone.getInt(2) == 1, gone.toString)
      assert(sql("SHOW TRANSACTIONS FOR ta").collect().isEmpty,
        "a vacuumed marker plane shows empty")
    } finally spark.conf.unset("spark.graft.root")
  }

  test("abort races a replay that COMMITS: abort loses, nothing is hidden") {
    val (root, _, _, start) = tornEpoch()
    // interleave a full replay between the abort's fence write and its
    // lock acquisition: the transaction commits under the abort
    @volatile var fired = false
    TxnMarkers.abortLockSeam = (_, _) =>
      if (!fired) {
        fired = true
        val q = start()
        try q.processAllAvailable() finally q.stop()
      }
    val aborted =
      try Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
      finally TxnMarkers.abortLockSeam = (_, _) => ()
    assert(fired, "the seam must have run the replay")
    assert(aborted.isEmpty, "a committed-under-us transaction must not abort")
    assert(TxnMarkers.listAborted(log(root), "ta").isEmpty,
      "the losing abort's fence must be withdrawn")
    // the committed rows are NOT hidden
    assert(Ripple.readCommitted(spark, root, "ta").count() == 2)
    assert(Ripple.readCommitted(spark, root, "tb").count() == 1)
    assert(TxnMarkers.listPending(log(root), "ta").isEmpty &&
      TxnMarkers.listPending(log(root), "tb").isEmpty)
  }

  test("abort races a replay its own fence ABANDONS: fence stays, siblings stay capped") {
    val (root, _, _, start) = tornEpoch()
    // abort tb (the topic the crash never reached); the seam replays the
    // whole query: ta no-ops on its marker, tb abandons on the fresh
    // fence — and the transaction clear must NOT run on that outcome
    @volatile var fired = false
    TxnMarkers.abortLockSeam = (_, _) =>
      if (!fired) {
        fired = true
        val q = start()
        try q.processAllAvailable() finally q.stop()
      }
    val aborted =
      try Ripple.abortStaleTxns(root, "tb", olderThanMs = 0L)
      finally TxnMarkers.abortLockSeam = (_, _) => ()
    assert(fired, "the seam must have run the replay")
    assert(aborted.size == 1 && aborted.head.ranges.isEmpty,
      s"the abandoned participant aborts with no published ranges, got $aborted")
    assert(TxnMarkers.listAborted(log(root), "tb").size == 1,
      "the fence must survive — a later replay would otherwise publish tb")
    // ta's half is STILL pending (the abandoned outcome must not clear
    // the transaction): its rows stay capped until ta is aborted too
    assert(TxnMarkers.listPending(log(root), "ta").size == 1,
      "a fence-abandoned transaction must keep its siblings pending")
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
    assert(Ripple.read(spark, root, "ta").count() == 2)
    assert(Ripple.read(spark, root, "tb").count() == 0)
    // the admin finishes the job: aborting ta records its torn half
    val a2 = Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    assert(a2.size == 1 && a2.head.ranges == Map("b0000" -> (0L, 2L)))
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
    // a second replay is fenced on both topics and commits nothing
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(Ripple.read(spark, root, "tb").count() == 0)
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
  }

  test("subtract: aborted-range arithmetic") {
    import TxnMarkers.subtract
    assert(subtract(0, 10, Seq.empty) == Seq((0L, 10L)))
    assert(subtract(0, 10, Seq((3L, 5L))) == Seq((0L, 3L), (5L, 10L)))
    assert(subtract(0, 10, Seq((0L, 10L))) == Seq.empty)
    assert(subtract(4, 6, Seq((0L, 5L))) == Seq((5L, 6L)))
    assert(subtract(4, 6, Seq((5L, 20L))) == Seq((4L, 5L)))
    assert(subtract(0, 10, Seq((1L, 2L), (2L, 3L), (8L, 9L))) ==
      Seq((0L, 1L), (3L, 8L), (9L, 10L)))
    assert(subtract(5, 5, Seq.empty) == Seq.empty)
    assert(subtract(0, 10, Seq((10L, 12L))) == Seq((0L, 10L)))
  }

  test("readCommitted composes with snapshot refusal and leaves untouched topics identical") {
    import spark.implicits._
    val root = tmp()
    Ripple.createTopic(root, "plain", numBuckets = 2)
    Ripple.write((1 to 10).map(i => (i, s"p$i".getBytes)).toDF("id", "data"),
      root, "plain", 2)
    // no transactional writer ever touched it: identical results, and the
    // read pays no marker listing beyond one missing-directory probe
    assert(Ripple.readCommitted(spark, root, "plain").count() == 10)
    val tok = Ripple.pinSnapshot(root, "plain", "pin1")
    val e = intercept[Exception] {
      spark.read.format("ripple").option("path", root).option("topic", "plain")
        .option("snapshot", tok).option("readCommitted", "true").load().count()
    }
    assert(chain(e).exists(_.contains("cannot compose with 'readCommitted'")),
      chain(e).mkString("|"))
  }
}
