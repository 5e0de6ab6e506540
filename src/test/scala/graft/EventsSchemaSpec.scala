package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Guards the events `ts` normalization at the source. The test-data
  * generator has shipped three physical shapes across rounds
  * (TIMESTAMP(NANOS) read as LONG, TIMESTAMP_NTZ µs, TIMESTAMP µs);
  * a drift that Tables.normalizeEventTs doesn't cover must fail HERE,
  * in one obvious place, not as dozens of scattered analysis errors. */
class EventsSchemaSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d, "events.parquet").exists())

  test("at least the spec's default SF dir is present") {
    assert(sfDirs.nonEmpty, "no testdata events.parquet found")
  }

  for (dir <- sfDirs) {
    test(s"events.ts normalizes to TIMESTAMP and unix_micros analyzes: $dir") {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"normalized ts is ${ev.schema("ts").dataType}")
      // The exact expression 28 operators lean on — must pass analysis
      // and produce sane values.
      val row = ev.select(min(unix_micros(col("ts"))).as("lo"),
                          max(unix_micros(col("ts"))).as("hi")).head()
      assert(!row.isNullAt(0) && row.getLong(0) <= row.getLong(1))
    }
  }

  test("normalizer handles all three historical shapes and rejects others") {
    import spark.implicits._
    val base = Seq(1704067200000000L).toDF("us") // 2024-01-01T00:00:00Z in µs

    val fromLong = Tables.normalizeEventTs(
      base.select(($"us" * 1000L).as("ts"))) // legacy nanos-as-long
    val fromNtz = Tables.normalizeEventTs(
      base.select(timestamp_micros($"us").cast(TimestampNTZType).as("ts")))
    val fromTs = Tables.normalizeEventTs(
      base.select(timestamp_micros($"us").as("ts")))

    for (df <- Seq(fromLong, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros($"ts")).as[Long].head() == 1704067200000000L)
    }
    assert(base.select($"us".cast("long").as("ts"))
      .schema("ts").dataType == LongType) // sanity on the fixture itself
    intercept[IllegalStateException] {
      Tables.normalizeEventTs(base.select($"us".cast("string").as("ts")))
    }
  }

  test("streaming events source normalizes identically") {
    val dir = sfDirs.head
    val st = graft.streaming.StreamAcc.eventsStream(spark, dir)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType)
  }
}
