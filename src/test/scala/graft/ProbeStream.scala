package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.streaming.{StreamAcc, StreamOps}

/** Scratch profiler (dev tool): where do the streaming gates' per-run
  * seconds go — stream machinery (query start + micro-batches +
  * commit) vs batch tail (read-back, rebuild, sort)? Prints one line
  * per component so OPTIMIZATION_r14.md can record the floor. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm everything once (JIT + staged artifacts)
    for (k <- Seq("stream_unigram_encode", "stream_dedup_span", "stream_hh_windowed", "stream_embed_dedup"))
      SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 2) {
      // ---- baseline: an EMPTY stateless stream over one tiny file —
      // pure streaming-machinery cost (start, 1 micro-batch, commit)
      t(s"empty-stream machinery pass$pass") {
        val out = java.nio.file.Files.createTempDirectory("probe_empty").toString
        val q = StreamAcc.fileStream(spark, dir, "documents")
          .select($"doc_id").filter($"doc_id" < 0)
          .writeStream.format("parquet")
          .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // ---- stream_unigram_encode split: stream+sink vs read-back+sort
      t(s"unigram stream-to-parquet pass$pass") {
        val out = java.nio.file.Files.createTempDirectory("probe_uni").toString
        val q = StreamOps.unigramEncodeStream(spark, dir).writeStream
          .format("parquet")
          .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        sys.props.put("probe.uni.out", out)
      }
      t(s"unigram read-back+sort+noop pass$pass") {
        spark.read.parquet(s"${sys.props("probe.uni.out")}/data")
          .orderBy(col("doc_id"), col("pos"), col("piece_pos"))
          .write.format("noop").mode("overwrite").save()
      }
      // batch sibling for the same computation, no streaming machinery
      t(s"unigram batch sibling pass$pass") {
        graft.operators.Unigram.tokenIdsUnigram(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      // ---- stream_dedup_span split: index build memo + stream + tail
      t(s"span buildSpanIndex pass$pass") {
        graft.operators.Dedup.buildSpanIndex(spark, dir)
      }
      t(s"span probe-stream-to-parquet pass$pass") {
        val out = java.nio.file.Files.createTempDirectory("probe_span").toString
        val q = StreamOps.spanRemovalProbeStream(spark, dir).writeStream
          .format("parquet")
          .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        sys.props.put("probe.span.out", out)
      }
      t(s"span tail (dedup+ckpt+removal) pass$pass") {
        val covered = spark.read.parquet(s"${sys.props("probe.span.out")}/data")
          .dropDuplicates("doc_id", "off").localCheckpoint(true)
        graft.operators.Dedup.spanRemovalFromCovered(spark, dir, covered)
          .write.format("noop").mode("overwrite").save()
      }
      // ---- full keys for reference
      for (k <- Seq("stream_unigram_encode", "stream_dedup_span",
                    "stream_hh_windowed", "stream_embed_dedup"))
        t(s"$k full pass$pass") {
          SparkEntry.queries(k)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
    }
    spark.stop()
  }
}
