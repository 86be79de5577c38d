package graft

import graft.streaming.GraftStreaming
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** File streams read directories; stage the single parquet into one. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("windowed counts over the event stream match the batch aggregation") {
    val stream = GraftStreaming.eventsStream(spark, streamDir)
    val agg = GraftStreaming.windowedCounts(stream, "1 day", "2 days")
    val got = GraftStreaming.runToMemorySink(agg, "win_counts", "append")
    // Batch equivalent over the same file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    // Append mode emits only windows closed by the watermark; every emitted
    // window must match its batch counterpart.
    val gotRows = got.collect().map(r =>
      (r.getStruct(0).toString, r.getString(1), r.getLong(2))).toSet
    val batchRows = batch.collect().map(r =>
      (r.getStruct(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(gotRows.nonEmpty)
    assert(gotRows.subsetOf(batchRows))
  }

  test("streaming dedup drops duplicate event ids") {
    val stream = GraftStreaming.eventsStream(spark, streamDir)
    val deduped = GraftStreaming.dedupStream(stream, "1 day")
    val got = GraftStreaming.runToMemorySink(deduped, "dedup_events", "append")
    val n = got.count()
    val distinctIds = got.select("event_id").distinct().count()
    assert(n === distinctIds)
  }

  test("sessionization produces closed sessions with event counts") {
    val stream = GraftStreaming.eventsStream(spark, streamDir)
    val sessions = GraftStreaming.sessionize(stream, gapMs = 60 * 60 * 1000L)
    val got = GraftStreaming.runToMemorySink(sessions.toDF(), "sessions",
      "append")
    assert(got.count() > 0)
    assert(got.filter(col("n_events") <= 0).count() === 0)
    assert(got.filter(col("endTs") < col("startTs")).count() === 0)
  }
}
