package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lineage-truncation policy for operator hot paths.
  *
  * Iterative operators (connected components, PageRank, saved-index
  * builds) and self-join inputs (LSH band tables, BM25 stats) must pin an
  * intermediate result: without it Spark either re-executes the whole
  * upstream pipeline per reuse or grows an unbounded lineage across
  * iterations. `localCheckpoint` is the fast default — but its blocks live
  * in NON-REPLICATED executor memory/disk, so on a real cluster an
  * executor loss mid-pipeline kills the job with no lineage left to
  * recompute. At 100 TB that trade-off must be the caller's choice, not
  * hard-coded.
  *
  * Every hot-path pin in this library routes through here. The mode is a
  * session conf (so a production job can flip it without code changes):
  *
  *   - `graft.materialize.mode = local` (default): `localCheckpoint` —
  *     fastest, non-fault-tolerant; the right choice for local[*] and for
  *     clusters where re-running the job beats paying replication.
  *   - `reliable`: `Dataset.checkpoint` to the SparkContext checkpoint
  *     directory (HDFS/S3/DBFS in production) — survives executor loss;
  *     pays one write+read of the materialized data. If no checkpoint dir
  *     is set, `graft.materialize.dir` is consulted, else this throws
  *     (silently falling back to `local` would defeat the point).
  *   - `persist`: `MEMORY_AND_DISK` persist (+ `count()` when eager) —
  *     keeps lineage intact (recompute on loss) while still caching;
  *     cheapest durable-ish option when upstream is itself cheap to replay.
  */
object Materialize {
  val ModeKey = "graft.materialize.mode"
  val DirKey = "graft.materialize.dir"

  def apply[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => ds.localCheckpoint(eager)
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty) {
          val dir = spark.conf.getOption(DirKey).getOrElse(throw new IllegalStateException(
            s"$ModeKey=reliable needs sparkContext.setCheckpointDir(...) or $DirKey"))
          spark.sparkContext.setCheckpointDir(dir)
        }
        ds.checkpoint(eager)
      case "persist" =>
        val pinned = ds.persist(StorageLevel.MEMORY_AND_DISK)
        if (eager) pinned.count()
        pinned
      case other =>
        throw new IllegalArgumentException(s"$ModeKey: unknown mode '$other' (local|reliable|persist)")
    }
  }

  /** `ds.materialized(...)` sugar so call sites keep their method-chain shape. */
  implicit class MaterializeOps[T](private val ds: Dataset[T]) extends AnyVal {
    def materialized(eager: Boolean = true): Dataset[T] = Materialize(ds, eager)
  }
}
