package graft

import graft.operators.Accumulator
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {

  test("streaming session_window equals the batch session_window result") {
    val s = spark; import s.implicits._
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getDouble(4))).toSet
    val streamed = key(StreamOps.runSessionsToCompletion(s, sfDir, sink = "sess_parity"))
    val batch = key(operators.Relational.qSessionWindow(s, sfDir)
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value"))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"diff=${(streamed -- batch).take(2)} / ${(batch -- streamed).take(2)}")
  }

  test("streaming quality filter equals the batch filter exactly") {
    val s = spark
    val streamed = StreamOps.runQualityFilterToCompletion(s, sfDir,
      sink = "quality_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    val batch = graft.operators.Pipeline.qualityFilter(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming exact dedup equals the batch hash-groupBy exactly") {
    val s = spark
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = key(StreamOps.runDedupExactToCompletion(s, sfDir,
      sink = "dedup_parity"))
    val batch = key(graft.operators.Dedup.dedupExact(s, sfDir))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"diff=${(streamed -- batch).take(2)} / ${(batch -- streamed).take(2)}")
  }

  test("stream-stream attribution join equals the batch interval join") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.expr
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = key(StreamOps.runAttributionToCompletion(s, sfDir,
      sink = "attrib_parity"))
    val ev = graft.sources.Tables.events(s, sfDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("pts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"), $"ts".as("cts"))
    val batch = key(p.join(c, $"user_id" === $"cu" &&
        $"cts" <= $"pts" && $"cts" >= $"pts" - expr("INTERVAL 30 minutes"))
      .select($"user_id", $"purchase_id", $"click_id"))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"diff=${(streamed -- batch).take(2)} / ${(batch -- streamed).take(2)}")
  }

  test("stateful size-threshold flushes equal the batch accumulator's completed batches") {
    val s = spark; import s.implicits._
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getTimestamp(3), r.getTimestamp(4))).toSet
    val thresh = 50 // sf0.001 has ~200 events per type — several flushes at 50
    val streamed = key(StreamOps.runSizeFlushesToCompletion(s, sfDir,
      sink = "size_parity", threshold = thresh))
    val batch = key(Accumulator.accSizeFlush(s, sfDir, thresh)
      .filter($"item_count" === thresh)
      .select($"batch_id", $"seq", $"item_count", $"created_at", $"last_updated_at"))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"diff=${(streamed -- batch).take(2)} / ${(batch -- streamed).take(2)}")
  }
}
