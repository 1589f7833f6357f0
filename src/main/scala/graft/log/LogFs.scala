package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import java.io.{ObjectInputStream, ObjectOutputStream}
import scala.collection.concurrent.TrieMap

/** Java-serializable wrapper for a Hadoop [[Configuration]] — the standard
  * Hadoop pattern (`Configuration` implements `Writable`, not
  * `Serializable`) that lets connector conf objects carry the cluster's
  * filesystem configuration from the driver to executor-side readers and
  * writers.
  */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = {
    if (conf == null) conf = new Configuration() // defensive: post-deser default
    conf
  }
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** Filesystem access for the topic-log storage plane.
  *
  * Every path the log touches (segments, manifests, locks, staging,
  * commit markers, consumer cursors) goes through
  * `org.apache.hadoop.fs.FileSystem`, so the log `root` may be any Hadoop
  * filesystem URI — `file:/...` (or a bare POSIX path), `hdfs://nn/...`,
  * or an object store the deployment has a connector for. This is what
  * makes the "the filesystem IS the bootstrap server" multi-tenant mapping
  * of the reference's gRPC bootstrap plane
  * (`proto/bootstrap_service.proto:7-11`, `server/exposed/create.go:15-27`
  * in ripple-mq/ripple-server) actually runnable off a shared cluster
  * filesystem instead of only a shared POSIX mount.
  *
  * Instances are created with `FileSystem.newInstance` (NOT the global
  * Hadoop FS cache) so that disabling checksums for the log's own I/O —
  * segment frames carry length-prefixed records and publishes are
  * whole-file atomic renames, so the local-FS `.crc` side files would only
  * double the metadata ops — cannot leak into Spark's shared `FileSystem`
  * instances. One instance per (scheme, authority) for the JVM's lifetime,
  * mirroring Hadoop's own cache discipline.
  */
object LogFs {
  private val cache = TrieMap.empty[String, FileSystem]

  /** The active session's Hadoop configuration (driver side), or a vanilla
    * one when no session exists (bare tools/tests).
    */
  def activeHadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def activeSerializable: SerializableHadoopConf =
    new SerializableHadoopConf(activeHadoopConf)

  /** One BROADCAST of the active session's Hadoop configuration, cached
    * per application: a `SerializableHadoopConf` embedded directly in a
    * task closure re-parses the full property set (`readFields`, ~ms) on
    * EVERY task deserialization — measurable against the streaming
    * connector's per-epoch budget — while a broadcast value materializes
    * once per executor and is a handle afterwards (the same reason Spark
    * ships its own hadoopConf broadcast to file-source readers).
    */
  @volatile private var cachedBc: (String, org.apache.spark.broadcast.Broadcast[SerializableHadoopConf]) = _
  def activeBroadcast: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf] = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val cur = cachedBc
    if (cur != null && cur._1 == sc.applicationId && !sc.isStopped) cur._2
    else synchronized {
      val again = cachedBc
      if (again != null && again._1 == sc.applicationId && !sc.isStopped) again._2
      else {
        val b = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
        cachedBc = (sc.applicationId, b)
        b
      }
    }
  }

  // First-conf-wins detection: the cache ignores the Configuration on later
  // calls, so a SECOND session in one JVM with different settings for the
  // same scheme/authority silently shares the first instance. Fingerprint
  // every distinct Configuration OBJECT once (weak identity memo — the
  // same broadcast conf arrives at every executor task) and warn loudly the
  // first time a materially different conf hits a cached key.
  private val cacheFp = TrieMap.empty[String, Int]
  private val warnedKeys = TrieMap.empty[String, Unit]
  private val fpMemo = new java.util.WeakHashMap[Configuration, Integer]()
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def fingerprint(conf: Configuration): Int = {
    val memo = fpMemo.synchronized(fpMemo.get(conf))
    if (memo != null) return memo.intValue()
    var h = 0
    val it = conf.iterator()
    while (it.hasNext) {
      val e = it.next()
      h ^= (e.getKey.hashCode * 31) ^ e.getValue.hashCode
    }
    fpMemo.synchronized(fpMemo.put(conf, Integer.valueOf(h)))
    h
  }

  /** Resolve `p`'s filesystem with log-plane settings (private instance,
    * checksums off). Cached per (scheme, authority) for the JVM lifetime —
    * first configuration wins; a later call with a materially different
    * Configuration logs a one-shot warning naming the key (it cannot be
    * honored without breaking the one-instance discipline).
    */
  def get(p: HPath, conf: Configuration): FileSystem = {
    val uri = p.toUri
    val defaultUri = FileSystem.getDefaultUri(conf)
    val scheme = Option(uri.getScheme).getOrElse(defaultUri.getScheme)
    val auth = Option(uri.getAuthority)
      .orElse(if (uri.getScheme == null) Option(defaultUri.getAuthority) else None)
      .getOrElse("")
    val key = s"$scheme://$auth"

    def warnIfDifferent(): Unit =
      if (cacheFp.get(key).exists(_ != fingerprint(conf)) &&
          warnedKeys.putIfAbsent(key, ()).isEmpty)
        log.warn(s"LogFs: filesystem for $key was initialized with a " +
          "different Hadoop configuration; the FIRST configuration wins " +
          "for the JVM lifetime (per-root conf changes — credentials, " +
          "timeouts — in a later session are ignored)")

    cache.get(key) match {
      case Some(fs) =>
        warnIfDifferent()
        fs
      case None =>
        // Build OUTSIDE the map insert so the race loser can close its
        // instance (getOrElseUpdate may run racing thunks and leak the
        // losers), and so only the thread whose instance actually won the
        // cache records the fingerprint — a loser must never overwrite the
        // winner's baseline or later warnings compare against the wrong
        // configuration.
        val fs = FileSystem.newInstance(
          if (uri.getScheme == null) defaultUri else uri, conf)
        fs.setWriteChecksum(false)
        fs.setVerifyChecksum(false)
        cache.putIfAbsent(key, fs) match {
          case None =>
            cacheFp.put(key, fingerprint(conf))
            fs
          case Some(winner) =>
            try fs.close() catch { case _: java.io.IOException => () }
            warnIfDifferent()
            winner
        }
    }
  }
}
