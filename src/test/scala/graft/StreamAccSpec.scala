package graft

import graft.operators.Accumulator
import graft.streaming.StreamAcc

class StreamAccSpec extends SparkSpec {

  test("streaming tumbling-window flushes equal the batch accumulator result") {
    val s = spark; import s.implicits._
    val streamed = StreamAcc.runToCompletion(s, sfDir, sink = "parity_sink")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getTimestamp(4), r.getTimestamp(5)))
      .toSet
    val batch = Accumulator.accTimeFlush(s, sfDir)
      .select($"batch_id", $"window_start", $"window_end",
              $"item_count", $"first_ts", $"last_ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getTimestamp(4), r.getTimestamp(5)))
      .toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed ${streamed.size} windows, batch ${batch.size}; " +
        s"only-streamed=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
  }
}
