package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming operators for the event/ingest side of a
  * training-data pipeline. The reference is batch-only (SURVEY §2.8) —
  * this module is the beyond-parity streaming surface: watermarked window
  * aggregation, in-stream exact dedup, and stateful sessionization via
  * flatMapGroupsWithState.
  *
  * All entry points take a streaming DataFrame (`spark.readStream...`);
  * for tests the same parquet that backs the batch tables drives the
  * stream through a memory sink.
  */
object GraftStreaming {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Batch read of an events parquet file/dir with the same ts-dtype
    * normalization [[eventsStream]] applies — the batch comparison side of
    * every stream-vs-batch equivalence check must normalize identically. */
  def eventsBatch(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Read the events table as a file stream (one-file-per-trigger locally;
    * on a cluster this is a directory being appended to).
    *
    * events.ts has shipped as both parquet TIMESTAMP(NANOS) (unrepresentable
    * in Spark — read nanos-as-long, convert) and TIMESTAMP(MICROS)/ntz;
    * readStream needs the schema up front, so probe the footer with a batch
    * read and pick the stream schema + conversion to match. */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDiskTs = spark.read.parquet(dir).schema("ts").dataType
    val readAs = onDiskTs match {
      case LongType => LongType
      case TimestampNTZType => TimestampNTZType
      case _ => TimestampType
    }
    val reader0 = spark.readStream
      .schema(StructType(eventSchema.fields.map(f =>
        if (f.name == "ts") f.copy(dataType = readAs) else f)))
    // One file per micro-batch (oldest modTime first) lets a test replay
    // a watermark advance deterministically: file A's max event time sets
    // the watermark that file B's rows are judged late against.
    val reader = if (maxFilesPerTrigger > 0)
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader0
    val raw = reader.parquet(dir)
    readAs match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
      case TimestampNTZType =>
        // Session TZ is UTC in every graft entry point, so NTZ wall time
        // and LTZ instant coincide.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregation per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** In-stream exact dedup on (event_id): state bounded by the watermark —
    * the streaming form of Dedup.exactIds. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static dedup against an already-ingested corpus: drop incoming
    * documents whose content hash exists in the (batch) corpus — the
    * ingest-side decontamination/dedup step of a training-data pipeline.
    * The corpus side is a static DataFrame joined per micro-batch; Spark
    * re-plans it each batch, so a broadcast-sized hash set stays broadcast
    * and a large one is a shuffled left_anti — no streaming state at all,
    * which is what keeps this viable when the corpus is the 100-TB side. */
  def dedupAgainstCorpus(stream: DataFrame, corpus: DataFrame,
      textCol: String): DataFrame = {
    val corpusHashes = corpus
      .select(xxhash64(col(textCol)).as("_corpus_h")).distinct()
    stream.join(corpusHashes,
      xxhash64(col(textCol)) === col("_corpus_h"), "left_anti")
  }

  /** Stream-static enrichment: join each incoming row to a STATIC
    * dimension table by key, keeping unmatched rows (left join). The
    * dimension side is marked for broadcast — per micro-batch Spark plans
    * a broadcast hash join, so the stream side never shuffles and there
    * is no streaming state. This is the ingest-side "attach user/source
    * metadata" step; at 100 TB the dimension is the small side by
    * construction (users, sources, licenses — not documents). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  case class UserSession(user_id: Long, startTs: java.sql.Timestamp,
      endTs: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Stateful sessionization: events within `gapMs` of each other belong to
    * one session; a session closes after inactivity (processing-time
    * timeout locally; event-time watermark on a cluster). Demonstrates the
    * KeyValueGroupedDataset.flatMapGroupsWithState custom-state path. */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L)
      : Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    // MICROSECOND precision throughout: Timestamp.getTime is
    // millisecond-truncating, which silently shaved the sub-ms part off
    // session boundaries (caught by the q_stream_sessionize oracle).
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    def tsOf(u: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(u, 1000000L), Math.floorMod(u, 1000000L) * 1000L))
    val gapUs = gapMs * 1000L
    events.select(col("user_id"), col("ts"), col("value")).as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => us(e.ts))
          var cur = state.getOption
          val closed = Seq.newBuilder[UserSession]
          sorted.foreach { ev =>
            val t = us(ev.ts)
            cur match {
              case Some(s) if t - s.lastTs <= gapUs =>
                cur = Some(s.copy(lastTs = t, n = s.n + 1,
                  total = s.total + ev.value))
              case Some(s) =>
                closed += UserSession(userId, tsOf(s.start), tsOf(s.lastTs),
                  s.n, s.total)
                cur = Some(SessionState(t, t, 1, ev.value))
              case None =>
                cur = Some(SessionState(t, t, 1, ev.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Stream-stream interval join: pair each left event with right events
    * that share `key` and arrive within [0, maxDelay] of it in event time —
    * the impression↔click / prompt↔response attribution shape. Both sides
    * are watermarked so join state is bounded; at cluster scale the state
    * store holds only `maxDelay + watermark` of data per key. Right-side
    * columns come back `r_`-prefixed. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String = "ts", maxDelay: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val r = r0.withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(tsCol) &&
        col(s"r_$tsCol") <= col(tsCol) + expr(s"INTERVAL $maxDelay"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[intervalJoin]], but a
    * left event with NO matching right event within [0, maxDelay] is
    * emitted null-padded — and that verdict can only be reached once the
    * watermark has provably passed `left.ts + maxDelay` (the row's join
    * state expires un-matched). Semantically the hardest stream-stream
    * shape: the null is a statement about event time having run out, not
    * about the current micro-batch. State stays bounded exactly as in the
    * inner variant; the only addition is the null-padding emission on
    * state expiry, which Spark performs in the (possibly no-data)
    * micro-batch after the watermark advances. */
  def leftOuterIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String = "ts", maxDelay: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val r = r0.withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(tsCol) &&
        col(s"r_$tsCol") <= col(tsCol) + expr(s"INTERVAL $maxDelay"),
      "left_outer")
  }

  /** Native session-window aggregation (Spark `session_window`): events
    * within `gap` of each other merge into one growing window per key;
    * a closed session emits in append mode once the watermark passes its
    * end + gap. Complements [[sessionize]] (the flatMapGroupsWithState
    * custom-state formulation) with the built-in operator — at scale the
    * built-in merges session state inside the state store with no
    * user-code shuffle, which is the preferred form when the per-session
    * aggregate is expressible as Spark aggregates. */
  def sessionWindowAgg(events: DataFrame, gap: String = "12 hours",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Read the documents table as a file stream (ingest-side of the text
    * pipeline; on a cluster, a landing directory being appended to). */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
      .parquet(dir)

  /** In-flight document curation: per-document language id, token count,
    * quality stats, and fingerprint, plus the standard quality filter
    * (min tokens, max punctuation ratio). Every column is a pure
    * expression over the row — ZERO streaming state, so this runs at
    * ingest rate regardless of history size; stream-vs-batch equivalence
    * is exact (StreamingSpec). */
  def curateDocuments(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minTokens: Long = 5,
      maxPunctRatio: Double = 0.3): DataFrame = {
    import graft.pipeline.TextAnalysis
    val t = col(textCol)
    docs
      .withColumn("lang_id", TextAnalysis.languageId(t))
      .withColumn("n_tokens", TextAnalysis.tokenCount(t))
      .withColumn("punct_ratio",
        round(length(regexp_replace(t, "[\\w\\s]", "")).cast(DoubleType) /
          greatest(length(t).cast(DoubleType), lit(1.0)), 4))
      .withColumn("fp", TextAnalysis.fingerprint(t))
      .filter(col("n_tokens") >= minTokens &&
        col("punct_ratio") <= maxPunctRatio)
      .select(col(idCol), col("lang_id"), col("n_tokens"),
        col("punct_ratio"), col("fp"))
  }

  /** Incremental exact-dedup ingest: appends only NEVER-SEEN documents to
    * `outPath`, tracking seen content hashes in a parquet ledger at
    * `ledgerPath`. Each micro-batch: hash the text, keep the min-id row
    * per within-batch hash (deterministic), anti-join the on-disk ledger,
    * append survivors to the output and their hashes to the ledger.
    *
    * Why foreachBatch instead of dropDuplicates-on-stream: the streaming
    * state store holds dedup keys in executor state FOREVER (no watermark
    * can bound ingest dedup — an old duplicate must still drop), which at
    * corpus scale is unbounded memory. The ledger is disk-bounded and the
    * per-batch anti-join is one keyed shuffle against a hash-only column
    * (partition-prunable, broadcastable while small). Batches run
    * sequentially, so the read-ledger/append-ledger cycle is race-free.
    * Caller stops the returned query (or uses processAllAvailable in
    * tests). */
  def dedupIngest(docs: DataFrame, idCol: String, textCol: String,
      ledgerPath: String, outPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val hashed = batch.withColumn("_dh", xxhash64(col(textCol)))
      val firstPerHash = hashed
        .groupBy(col("_dh"))
        .agg(min(struct(col(idCol) +: batch.columns.filterNot(_ == idCol)
          .map(col): _*)).as("_row"))
        .select(col("_dh") +: batch.columns.map(c => col(s"_row.$c").as(c)): _*)
      val seen =
        if (new java.io.File(ledgerPath).exists)
          spark.read.parquet(ledgerPath).select(col("_dh"))
        else spark.emptyDataFrame.select(lit(0L).as("_dh")).limit(0)
      val fresh = firstPerHash.join(seen, Seq("_dh"), "left_anti")
        .persist() // read twice below; tiny (one batch's survivors)
      fresh.count()
      fresh.drop("_dh").write.mode("append").parquet(outPath)
      fresh.select(col("_dh")).write.mode("append").parquet(ledgerPath)
      fresh.unpersist()
      ()
    }.start()
  }

  /** Run `f` with spark.sql.shuffle.partitions temporarily lowered: a
    * stateful streaming query materializes one state-store instance per
    * shuffle partition per operator, and on a bounded local replay that
    * fixed cost dominates (32 stores x checkpoint round-trips per
    * micro-batch). State partitioning is a per-workload knob — a cluster
    * ingesting at scale sizes it to throughput; a bounded oracle replay
    * sizes it small. Restores the previous value even on failure. */
  def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    // Per-workload knob (r15): `spark.graft.stream.statePartitions`
    // overrides the caller's bounded-replay default — a cluster ingesting
    // at scale sizes state partitions to throughput, and the r15 A/B
    // sweep (OPTIMIZATION_r15.md §6) measures the local floor with it.
    val eff = spark.conf.getOption("spark.graft.stream.statePartitions")
      .map(_.toInt).getOrElse(n)
    spark.conf.set(key, eff.toString)
    try f finally spark.conf.set(key, old)
  }

  /** Run a streaming query to completion against a bounded source and
    * return the collected sink table (test/bench harness). */
  def runToMemorySink(df: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
