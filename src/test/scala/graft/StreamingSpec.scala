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

  private lazy val docStreamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_docstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("streaming document curation equals the batch pass") {
    val stream = GraftStreaming.documentsStream(spark, docStreamDir)
    val curatedStream = GraftStreaming.curateDocuments(stream)
    val got = GraftStreaming.runToMemorySink(curatedStream, "curated_docs")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val batch = GraftStreaming.curateDocuments(
      spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.length > 0, "curation filtered everything out")
    assert(got.toSeq === batch.toSeq)
    // the filter actually drops something (short/punct-heavy docs exist)
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got.length <= total)
  }

  test("dedupIngest appends only never-seen docs across micro-batches") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_ingest_in")
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_out")
    val ledger = out.resolve("ledger").toString
    val outP = out.resolve("docs").toString
    // batch 1: two distinct docs + an intra-batch duplicate
    Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(in.resolve("f1").toString)
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in.toString + "/*")
    val q1 = GraftStreaming.dedupIngest(stream, "doc_id", "text",
      ledger, outP)
    q1.processAllAvailable(); q1.stop()
    // batch 2 arrives later: one cross-batch duplicate, one new doc
    Seq((4L, "beta"), (5L, "gamma")).toDF("doc_id", "text").coalesce(1)
      .write.parquet(in.resolve("f2").toString)
    val q2 = GraftStreaming.dedupIngest(stream, "doc_id", "text",
      ledger, outP)
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(outP)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
  }

  test("streaming PII scrub equals the batch scrub (stateless column ops)") {
    // Plant deterministic PII on the stream side with the same expression
    // the batch fixture uses; the scrub is pure column regexps, so the
    // streaming plan needs zero state and the equivalence is exact.
    def plant(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), concat(col("text"),
        lit(" mail u"), col("doc_id"), lit("@example.com ip 10.1.2.3")).as("text"))
    val scrubbedStream = graft.pipeline.Scrub.scrubPii(
      plant(GraftStreaming.documentsStream(spark, docStreamDir)),
      "doc_id", "text")
    val got = GraftStreaming.runToMemorySink(scrubbedStream, "scrubbed_docs")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batch = graft.pipeline.Scrub.scrubPii(
      plant(spark.read.parquet(s"$dir/documents.parquet")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === batch.toSeq)
    assert(got.forall(!_._2.contains("@example.com")), "emails must be redacted")
  }

  test("windowed counts over the event stream match the batch aggregation") {
    val stream = GraftStreaming.eventsStream(spark, streamDir)
    val agg = GraftStreaming.windowedCounts(stream, "1 day", "2 days")
    val got = GraftStreaming.runToMemorySink(agg, "win_counts", "append")
    // Batch equivalent over the same file.
    val batch = GraftStreaming.eventsBatch(spark, s"$dir/events.parquet")
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

  test("watermark drops late data across micro-batches") {
    import spark.implicits._
    // Three files = three micro-batches (maxFilesPerTrigger=1, modTime
    // order). Spark's late-record filter uses the PREVIOUS batch's
    // committed watermark (dual-watermark model, Spark 3.4+), so a late
    // row only drops from the second batch after the advancing data:
    // batch 1 (10:00, 10:30) advances the watermark to 09:30; batch 2 is
    // a buffer that commits it for filtering; batch 3 delivers one late
    // row (06:00 — MUST be discarded) and one on-time row (10:15 — must
    // update its window).
    val d = java.nio.file.Files.createTempDirectory("graft_late")
    def write(name: String, mtime: Long,
        rows: Seq[(Long, String, Long, String, Double, String)]): Unit = {
      val df = rows.toDF("event_id", "ts_s", "user_id", "event_type",
          "value", "props")
        .withColumn("ts", col("ts_s").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = d.resolve(s"_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val s0 = java.nio.file.Files.list(tmp)
      val part = try {
        import scala.jdk.CollectionConverters._
        s0.iterator().asScala.toSeq.find(_.toString.endsWith(".parquet")).get
      } finally s0.close()
      val dst = d.resolve(name)
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(mtime)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    val t0 = System.currentTimeMillis() - 600000L
    write("b1.parquet", t0, Seq(
      (1L, "2024-03-01 10:00:00", 7L, "view", 1.0, "{}"),
      (2L, "2024-03-01 10:30:00", 7L, "view", 1.0, "{}")))
    write("b2.parquet", t0 + 120000L, Seq(
      (3L, "2024-03-01 08:30:00", 7L, "view", 1.0, "{}")))
    write("b3.parquet", t0 + 240000L, Seq(
      (5L, "2024-03-01 06:00:00", 7L, "view", 1.0, "{}"), // late: < 09:30
      (6L, "2024-03-01 10:15:00", 7L, "view", 1.0, "{}"))) // on time
    try {
      val stream = GraftStreaming.eventsStream(spark, d.toString,
        maxFilesPerTrigger = 1)
      val agg = GraftStreaming.windowedCounts(stream, "1 hour", "1 hour")
      val got = GraftStreaming.runToMemorySink(agg, "late_drop", "update")
        .select(col("window.start").cast("string").as("ws"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // The late row's window must never surface; the on-time row must.
      assert(!got.exists(_._1.startsWith("2024-03-01 06")),
        s"late row was aggregated: ${got.toSeq}")
      val w10 = got.filter(_._1.startsWith("2024-03-01 10")).map(_._2)
      assert(w10.max === 3L, // 2 from batch 1, +1 on-time from batch 3
        s"on-time batch-3 row missing: ${got.toSeq}")
      // The buffer batch's row rode the lagging late filter in on purpose.
      assert(got.exists(_._1.startsWith("2024-03-01 08")), got.toSeq.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
  }

  test("streaming dedup drops duplicate event ids") {
    val stream = GraftStreaming.eventsStream(spark, streamDir)
    val deduped = GraftStreaming.dedupStream(stream, "1 day")
    val got = GraftStreaming.runToMemorySink(deduped, "dedup_events", "append")
    val n = got.count()
    val distinctIds = got.select("event_id").distinct().count()
    assert(n === distinctIds)
  }

  test("stream-static dedup drops documents already in the corpus") {
    import spark.implicits._
    // stage a tiny documents stream: 2 seen (in corpus), 2 new
    val d = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    val corpus = Seq((1L, "seen one"), (2L, "seen two"), (9L, "other"))
      .toDF("doc_id", "text")
    Seq((10L, "seen one"), (11L, "brand new"), (12L, "seen two"),
      (13L, "also new")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(d.resolve("in").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(d.resolve("in").toString)
    val fresh = GraftStreaming.dedupAgainstCorpus(stream, corpus, "text")
    val got = GraftStreaming.runToMemorySink(fresh, "fresh_docs", "append")
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(11L, 13L))
  }

  test("stream-static enrichment equals the batch join and broadcasts the dimension") {
    val stream = GraftStreaming.eventsStream(spark, streamDir)
    val batch = GraftStreaming.eventsBatch(spark, streamDir)
    val dim = batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events"))
    val enriched = GraftStreaming.enrich(
      stream.select("event_id", "user_id", "value"), dim, "user_id")
    val got = GraftStreaming.runToMemorySink(enriched, "enriched", "append")
    val want = batch.select("event_id", "user_id", "value")
      .join(dim, Seq("user_id"), "left")
    assert(got.count() === batch.count())
    assert(got.select("event_id", "user_events").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      === want.select("event_id", "user_events").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("stream-stream interval join matches the batch interval join") {
    val l = GraftStreaming.eventsStream(spark, streamDir)
      .select("event_id", "ts", "user_id")
    val r = GraftStreaming.eventsStream(spark, streamDir)
      .select("event_id", "ts", "user_id")
    val joined = GraftStreaming.intervalJoin(l, r, "user_id",
      maxDelay = "30 minutes", watermark = "1 day")
      .select(col("event_id"), col("r_event_id"))
    val got = GraftStreaming.runToMemorySink(joined, "ij", "append")
    // Batch equivalent over the same file.
    val ev = GraftStreaming.eventsBatch(spark, s"$dir/events.parquet")
      .select("event_id", "ts", "user_id")
    val evR = ev.select(col("event_id").as("r_event_id"),
      col("ts").as("r_ts"), col("user_id").as("r_user_id"))
    val batch = ev.join(evR,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("ts") &&
        col("r_ts") <= col("ts") + expr("INTERVAL 30 minutes"))
      .select(col("event_id"), col("r_event_id"))
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchSet = batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet.nonEmpty)
    // Append mode may withhold pairs near the watermark frontier; everything
    // emitted must be correct.
    assert(gotSet.subsetOf(batchSet))
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

  test("session_window MERGES on an EXACT-gap boundary (end-inclusive)") {
    // ADVICE r13: pin the boundary rule so the q_stream_session_window
    // DuckDB replay provably matches Spark. Measured (Spark 4.1): an
    // event at exactly prev_ts + gap MERGES into the previous session —
    // Spark treats the [ts, ts + gap] closure as overlapping — so the
    // replay's gaps-and-islands split must use STRICT `diff > gap`
    // (ties merge), which is exactly what the oracle SQL does.
    import spark.implicits._
    val gapUs = 12L * 3600 * 1000000
    val df = Seq(
      (1L, 0L, 1.0),
      (1L, gapUs, 2.0),            // exactly 12 h later -> MERGES
      (1L, 2 * gapUs + 1000000L, 3.0), // 12 h + 1 s after -> NEW session
      (2L, 0L, 4.0),
      (2L, gapUs - 1000000L, 5.0)) // 1 s short of the gap -> merges
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    // session_window is a plain grouping expression — batch mode needs no
    // watermark machinery and pins the same merge rule the stream uses.
    val sessions = df
      .groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._3))
    assert(sessions.toSeq === Seq((1L, 2L, 3.0), (1L, 1L, 3.0),
      (2L, 2L, 9.0)).sortBy(t => (t._1, t._3)))
  }

  test("withStatePartitions honors the conf override and restores the old value") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val seen = GraftStreaming.withStatePartitions(spark, 4) { spark.conf.get(key) }
    assert(seen === "4")
    assert(spark.conf.get(key) === before)
    spark.conf.set("spark.graft.stream.statePartitions", "7")
    try {
      val overridden =
        GraftStreaming.withStatePartitions(spark, 4) { spark.conf.get(key) }
      assert(overridden === "7")
      assert(spark.conf.get(key) === before)
    } finally spark.conf.unset("spark.graft.stream.statePartitions")
  }
}
