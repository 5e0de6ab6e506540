package graft.operators

import scala.util.Try

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Durable driver control-plane state — parity with the reference's
  * Convex-table persistence (reference: src/component/schema.ts:1-72,
  * lib.ts:1073-1119). The reference's accumulator batches and
  * iterator jobs live in database tables, so a process restart
  * resumes pause/resume/cursor state from storage; the in-memory maps
  * of [[BatchAccumulator]]/[[TableIterator]] lose that on a driver
  * bounce — a real operational gap for a multi-hour 100 TB iterator
  * job. These stores persist the O(#jobs)/O(#batches) control rows
  * (and, for the accumulator, the buffered items themselves — the
  * reference parks items in tables too) to parquet on every
  * checkpoint-able transition, with load-on-construct.
  *
  * The writes are tiny (control rows; item chunks are whatever the
  * caller buffered) and happen at batch boundaries — the same cadence
  * the reference commits its mutations at. A cluster deploy points
  * `dir` at durable shared storage; the default [[IterStateStore.none]]
  * / [[AccStore.none]] keep the previous in-memory-only behavior. */

/** Persistable iterator-job row ([[TableIterator]] internal state;
  * mirrors the reference iteratorJobs table, schema.ts:34-55). */
final case class IterJobRow(
  jobId: String, status: String, processedCount: Long, cursor: Option[Long],
  batchesDone: Long, retries: Long, lastRunAt: Long, boundaries: Seq[Long])

/** Path-existence probe shared by the parquet stores (Hadoop FS, so
  * it answers for whatever durable storage `dir` points at). */
private[operators] object ControlPlaneFs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

trait IterStateStore {
  /** Overwrite the full job snapshot (O(#jobs × #chunks) longs). */
  def save(rows: Seq[IterJobRow]): Unit
  /** The persisted snapshot, if any (None on first run). */
  def load(): Option[Seq[IterJobRow]]
}

object IterStateStore {
  /** In-memory only — the pre-durability behavior. */
  val none: IterStateStore = new IterStateStore {
    def save(rows: Seq[IterJobRow]): Unit = ()
    def load(): Option[Seq[IterJobRow]] = None
  }

  /** Parquet-backed job state at `dir` (a durable shared path on a
    * cluster). Each save overwrites the snapshot — last committed
    * transition wins, exactly the reference's row-update semantics. */
  def parquet(spark: SparkSession, dir: String): IterStateStore = new IterStateStore {
    import spark.implicits._
    private val path = s"$dir/iter_jobs"
    def save(rows: Seq[IterJobRow]): Unit =
      spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(path)
    // Absent snapshot = fresh run → None. An UNREADABLE snapshot must
    // propagate: swallowing it would silently restart every
    // multi-hour job from cursor 0, re-running all process() side
    // effects — the worst possible answer to a corrupt checkpoint.
    def load(): Option[Seq[IterJobRow]] =
      if (!ControlPlaneFs.exists(spark, path)) None
      else Some(spark.read.parquet(path).as[IterJobRow].collect().toSeq)
  }
}

/** Persistable accumulator-batch row (mirrors the reference batches
  * table, schema.ts:1-33). Buffered items are persisted separately as
  * chunks; `bufferHandles`/`inFlightHandles` name them in add order. */
final case class AccBatchRow(
  batchId: String, seq: Long, status: String, count: Long, openedAt: Long,
  lastError: Option[String], inFlightCount: Long,
  bufferHandles: Seq[String], inFlightHandles: Seq[String])

final case class AccSnapshot(
  batches: Seq[AccBatchRow], completed: Seq[AccBatchStatus],
  history: Seq[FlushRecord], nextChunk: Long)

trait AccStore[T] {
  /** Persist an added item chunk under `handle`; returns the frame a
    * restarted process would read — so the live buffers and the
    * recovered buffers are THE SAME data by construction. */
  def writeChunk(handle: String, items: Dataset[T]): Dataset[T]
  def readChunk(handle: String): Dataset[T]
  def deleteChunks(handles: Seq[String]): Unit
  def save(snap: AccSnapshot): Unit
  def load(): Option[AccSnapshot]
}

object AccStore {
  /** In-memory only — items stay lazy Dataset lineage. */
  def none[T]: AccStore[T] = new AccStore[T] {
    def writeChunk(handle: String, items: Dataset[T]): Dataset[T] = items
    def readChunk(handle: String): Dataset[T] =
      throw new IllegalStateException("in-memory store has no chunks")
    def deleteChunks(handles: Seq[String]): Unit = ()
    def save(snap: AccSnapshot): Unit = ()
    def load(): Option[AccSnapshot] = None
  }

  /** Parquet-backed accumulator state at `dir`: control rows under
    * `control/`, item chunks under `chunks/<handle>`. Items are
    * persisted because durability REQUIRES it — a lazy Dataset's
    * lineage dies with the driver; the reference stores items in its
    * batches table for the same reason (lib.ts:24-109). */
  def parquet[T](spark: SparkSession, dir: String)(implicit enc: Encoder[T]): AccStore[T] =
    new AccStore[T] {
      import spark.implicits._
      private def chunkPath(h: String) = s"$dir/chunks/$h"
      def writeChunk(handle: String, items: Dataset[T]): Dataset[T] = {
        items.write.mode("overwrite").parquet(chunkPath(handle))
        readChunk(handle)
      }
      def readChunk(handle: String): Dataset[T] =
        spark.read.parquet(chunkPath(handle)).as[T]
      def deleteChunks(handles: Seq[String]): Unit = {
        val conf = spark.sparkContext.hadoopConfiguration
        handles.foreach { h =>
          val p = new org.apache.hadoop.fs.Path(chunkPath(h))
          Try(p.getFileSystem(conf).delete(p, true))
        }
      }
      def save(snap: AccSnapshot): Unit = {
        // next_chunk FIRST: it only ever increases, and it is the
        // chunk-handle allocator. A crash between the writes then
        // leaves a recovered nextChunk ≥ the true one — fresh handles
        // are SKIPPED, never reused, so a torn snapshot can orphan a
        // chunk but can never overwrite one a persisted batch row
        // still references (writing it last inverted that: stale-low
        // nextChunk + newer batches = silent chunk clobbering inside
        // the crash-recovery feature itself).
        spark.createDataset(Seq(snap.nextChunk)).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/control/next_chunk")
        spark.createDataset(snap.batches).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/control/batches")
        spark.createDataset(snap.completed).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/control/completed")
        spark.createDataset(snap.history).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/control/history")
      }
      // Absent control dir = fresh run. Unreadable state PROPAGATES
      // (see IterStateStore.load — a corrupt checkpoint must fail
      // loudly, not masquerade as a first run); an absent subtable
      // with next_chunk present is the documented torn-save window
      // and rolls back to the previous committed rows.
      def load(): Option[AccSnapshot] =
        if (!ControlPlaneFs.exists(spark, s"$dir/control/next_chunk")) None
        else {
          val next = spark.read.parquet(s"$dir/control/next_chunk").as[Long].head()
          def tbl[A: Encoder](p: String): Seq[A] = {
            val full = s"$dir/control/$p"
            if (!ControlPlaneFs.exists(spark, full)) Seq.empty
            else spark.read.parquet(full).as[A].collect().toSeq
          }
          Some(AccSnapshot(
            tbl[AccBatchRow]("batches"), tbl[AccBatchStatus]("completed"),
            tbl[FlushRecord]("history"), next))
        }
    }
}
