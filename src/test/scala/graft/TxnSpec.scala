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
    // aborting by ANY ONE participant resolves the whole transaction
    // (round 19: every pending records its sibling set) — one marker per
    // participant comes back, and the sibling has nothing left to abort
    val aa = Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    assert(aa.size == 2, s"whole-transaction abort resolves every participant, got $aa")
    assert(aa.map(_.participants).distinct == Seq(Seq("ta", "tb")),
      "markers carry the participant set")
    assert(aa.find(_.topic == "ta").get.ranges == Map("b0000" -> (0L, 2L)))
    assert(aa.find(_.topic == "tb").get.ranges.isEmpty, "tb published nothing")
    val ab = Ripple.abortStaleTxns(root, "tb", olderThanMs = 0L)
    assert(ab.isEmpty, "the sibling was already resolved by ta's abort")
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
    val (root, _, mem, start) = tornEpoch()
    Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    import spark.implicits._
    Ripple.write(Seq((9, "new".getBytes)).toDF("id", "data"), root, "ta", 1)
    // ta's marker still hides retained rows [0,2): vacuum must keep it
    assert(Ripple.vacuumTxnMarkers(root, "ta", graceMs = 0L).isEmpty)
    assert(TxnMarkers.listAborted(log(root), "ta").size == 1)
    // tb's marker is a pure fence (no ranges): grace alone must NOT
    // collect it (r18 ADVICE #2) — if the crashed query has not yet
    // replayed, deleting the fence would let a later restart publish the
    // dead epoch's rows, un-aborting half the transaction
    assert(Ripple.vacuumTxnMarkers(root, "tb", graceMs = 0L).isEmpty,
      "a pure fence with no replay evidence must survive vacuum")
    // a NEWER epoch committing through the same checkpoint is the
    // evidence the fenced epoch can never replay: the fenced epoch 0
    // replays as an abandon, then epoch 1 commits normally
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    mem.addData((4, "b2", "tb"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(Ripple.read(spark, root, "tb").select("id").as[Int].collect()
      .toSeq == Seq(4), "epoch 1 must commit normally after the fence")
    assert(Ripple.vacuumTxnMarkers(root, "tb", graceMs = Long.MaxValue).isEmpty,
      "grace is still respected with evidence present")
    assert(Ripple.vacuumTxnMarkers(root, "tb", graceMs = 0L).size == 1,
      "a newer committed epoch in the same query dir collects the fence")
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
        pend(0).getString(3) == "b0000:[0,2)" && pend(0).getLong(4) >= 0 &&
        pend(0).getString(5) == "ta,tb", pend.toSeq.toString)
      val aborted = sql("ABORT TRANSACTIONS ON ta (olderThanMs = 0)").collect()
      assert(aborted.length == 2, aborted.toSeq.toString)
      assert(aborted.find(_.getString(2) == "ta").get.getString(3) == "b0000:[0,2)",
        aborted.toSeq.toString)
      assert(aborted.find(_.getString(2) == "tb").get.getString(3) == "",
        aborted.toSeq.toString)
      assert(sql("ABORT TRANSACTIONS ON tb (olderThanMs = 0)").collect().isEmpty,
        "the whole-transaction abort already resolved tb")
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
    // interleave a full replay between the abort's stale-pending listing
    // and its fence writes: the transaction commits under the abort and
    // the committed pre-check must withdraw the whole abort
    @volatile var fired = false
    TxnMarkers.abortPreFenceSeam = (_, _) =>
      if (!fired) {
        fired = true
        val q = start()
        try q.processAllAvailable() finally q.stop()
      }
    val aborted =
      try Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
      finally TxnMarkers.abortPreFenceSeam = (_, _) => ()
    assert(fired, "the seam must have run the replay")
    assert(aborted.isEmpty, "a committed-under-us transaction must not abort")
    assert(TxnMarkers.listAborted(log(root), "ta").isEmpty &&
      TxnMarkers.listAborted(log(root), "tb").isEmpty,
      "the losing abort must leave no fence on any participant")
    // the committed rows are NOT hidden
    assert(Ripple.readCommitted(spark, root, "ta").count() == 2)
    assert(Ripple.readCommitted(spark, root, "tb").count() == 1)
    assert(TxnMarkers.listPending(log(root), "ta").isEmpty &&
      TxnMarkers.listPending(log(root), "tb").isEmpty)
  }

  test("abort finishes the clear of a fully-committed transaction instead of hiding it") {
    // r18 ADVICE #3: the window between the last participant's publish
    // and clearPendingTxn (or a clear whose deletes failed) leaves every
    // commit marker in place WITH the pendings still standing — an abort
    // must recognize the committed transaction, withdraw, and finish the
    // clear, never clamp committed rows into aborted ranges
    val (root, _, _, start) = tornEpoch()
    val q = start() // replay commits the transaction; pendings clear
    try q.processAllAvailable() finally q.stop()
    val l = log(root)
    // simulate the failed clear: re-create both pendings exactly as the
    // epoch left them before clearPendingTxn ran
    val qdir = l.fs.listStatus(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(l.root, "ta"), ".commits"))
      .filter(_.isDirectory).head.getPath.getName
    l.writeFileAtomic(TxnMarkers.pendingPath(l, "ta", qdir, 0L),
      "!participants ta,tb\nb0000 0 2".getBytes("UTF-8"))
    l.writeFileAtomic(TxnMarkers.pendingPath(l, "tb", qdir, 0L),
      "!participants ta,tb\nb0000 0 1".getBytes("UTF-8"))
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0,
      "standing pendings cap readCommitted — the stuck state under test")
    val aborted = Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    assert(aborted.isEmpty, "a fully-committed transaction must not abort")
    assert(TxnMarkers.listPending(log(root), "ta").isEmpty &&
      TxnMarkers.listPending(log(root), "tb").isEmpty,
      "the abort must finish the interrupted clear")
    assert(TxnMarkers.listAborted(log(root), "ta").isEmpty &&
      TxnMarkers.listAborted(log(root), "tb").isEmpty, "no fence survives")
    assert(Ripple.readCommitted(spark, root, "ta").count() == 2)
    assert(Ripple.readCommitted(spark, root, "tb").count() == 1)
  }

  test("abort races a replay its own fences ABANDON: whole transaction dies, no split") {
    val (root, _, _, start) = tornEpoch()
    // abort by tb (the topic the crash never reached); the fences land on
    // BOTH participants first, then the seam replays the whole query:
    // ta's replay abandons on its fence EVEN THOUGH its commit marker
    // exists (the fence outranks it — r18 ADVICE #1), tb abandons too,
    // and the clear never runs — the abort then records ta's published
    // half from the pending the abandon left standing
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
    assert(aborted.size == 2, s"both participants resolve, got $aborted")
    assert(aborted.find(_.topic == "ta").get.ranges == Map("b0000" -> (0L, 2L)),
      "ta's published half must be recorded even after the racing abandon")
    assert(aborted.find(_.topic == "tb").get.ranges.isEmpty)
    assert(TxnMarkers.listAborted(log(root), "ta").size == 1 &&
      TxnMarkers.listAborted(log(root), "tb").size == 1,
      "the fences must survive — a later replay would otherwise publish")
    assert(TxnMarkers.listPending(log(root), "ta").isEmpty &&
      TxnMarkers.listPending(log(root), "tb").isEmpty)
    // no half-committed split anywhere: plain reads keep the torn half,
    // readCommitted sees none of the epoch
    assert(Ripple.read(spark, root, "ta").count() == 2)
    assert(Ripple.read(spark, root, "tb").count() == 0)
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
    assert(Ripple.readCommitted(spark, root, "tb").count() == 0)
    // a second replay is fenced on both topics and commits nothing
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(Ripple.read(spark, root, "tb").count() == 0)
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0)
  }

  test("partial-abort-then-replay cannot split the transaction (r18 ADVICE #1 scenario)") {
    // The exact reported failure: crash between topics, admin abort
    // naming ONLY ta, then a checkpoint replay. Before round 19 the
    // replay found ta's pre-crash commit marker (true), published tb,
    // and cleared every pending — ending half aborted-subtracted (ta)
    // and half committed-visible (tb). With participant sets the abort
    // fences tb too, the replay abandons everywhere, and readCommitted
    // sees NONE of the dead epoch.
    val (root, _, _, start) = tornEpoch()
    val aborted = Ripple.abortStaleTxns(root, "ta", olderThanMs = 0L)
    assert(aborted.map(_.topic).sorted == Seq("ta", "tb"),
      "aborting one participant must fence every sibling")
    val q = start() // the replay the advice crashes on
    try q.processAllAvailable() finally q.stop()
    assert(Ripple.read(spark, root, "tb").count() == 0,
      "the fenced replay must not publish the sibling")
    assert(Ripple.readCommitted(spark, root, "ta").count() == 0 &&
      Ripple.readCommitted(spark, root, "tb").count() == 0,
      "no committed-visible half of an aborted transaction")
    assert(Ripple.read(spark, root, "ta").count() == 2,
      "aborted rows stay for plain reads (read_uncommitted parity)")
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
