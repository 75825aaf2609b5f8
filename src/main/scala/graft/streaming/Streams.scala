package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Lake

/** Structured Streaming surface (SURVEY §2.C streaming row; the
  * reference only wishes for streaming ingestion, README.md:192).
  *
  * The canonical shape: file-source readStream → event-time transform
  * with watermark → stateful operator → sink. For the correctness gate
  * every query drives the stream to completion over the static events
  * table, so results are deterministic and oracle-checkable against
  * the equivalent batch query — the semantics Structured Streaming
  * guarantees. Two sink harnesses:
  *  - [[runToMemorySink]]: in-memory table, the oracle harness;
  *  - [[runToParquetSink]]: append mode into a checkpointed parquet
  *    file sink with Trigger.AvailableNow — the production shape
  *    (exactly-once, resumable, no driver-side state); AvailableNow
  *    processes everything and then runs the trailing no-data batch
  *    that lets the watermark flush completed state.
  */
object Streams {

  private type Q = (SparkSession, String) => DataFrame

  private def rmDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Raw-file event stream: explicit on-disk schema (ts is raw
    * nanos-as-long), converted after read exactly like the batch path;
    * pathGlobFilter selects the events file out of the sf directory.
    */
  private def rawEventStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(Lake.rawSchema(spark, sfDir, "events"))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Event stream over the micros-normalized copy (real TimestampType
    * schema on disk).
    */
  private def microsEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val micros = Lake.ensureMicrosEvents(spark, sfDir)
    spark.readStream.schema(spark.read.parquet(micros).schema).parquet(micros)
  }

  /** Drive a streaming DataFrame to completion into a named memory
    * sink; returns the sink table.
    */
  private def runToMemorySink(df: DataFrame, sinkName: String,
      mode: String): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(sinkName).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(sinkName)
  }

  /** Drive an append-mode streaming DataFrame through a checkpointed
    * parquet file sink with Trigger.AvailableNow; returns a batch read
    * of the sink. Fresh sink + checkpoint per invocation so re-runs
    * are deterministic.
    */
  private def runToParquetSink(spark: SparkSession, agg: DataFrame,
      id: String): DataFrame = {
    val outDir = s"/tmp/graft-stream/${id}_out"
    val ckDir = s"/tmp/graft-stream/${id}_ck"
    rmDir(spark, outDir); rmDir(spark, ckDir)
    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  private def tag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  /** s01: tumbling 1-day windowed count per event_type with a 1-day
    * watermark, complete-mode memory sink.
    */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame =
    runToMemorySink(
      rawEventStream(spark, sfDir)
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      s"graft_stream_${tag(sfDir)}", "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"))
      .orderBy(col("day"), col("event_type"))

  /** s02: append-mode watermarked aggregation into the checkpointed
    * file sink. Append mode can only ever emit windows the watermark
    * has passed, so the query reports the fixed day range
    * [01-01, 01-25] — fully inside watermark reach for every
    * provisioned scale factor (events span Jan 1-30) — and the oracle
    * states the same range.
    */
  def appendFileSink(spark: SparkSession, sfDir: String): DataFrame =
    runToParquetSink(spark,
      microsEventStream(spark, sfDir)
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n")),
      s"s02_${tag(sfDir)}")
      .filter(col("day") >= "2024-01-01" && col("day") <= "2024-01-25")
      .orderBy(col("day"), col("event_type"))

  /** s03: sliding windows (2-day window, 1-day slide) — each event
    * lands in two overlapping windows; complete-mode memory sink.
    */
  def slidingCounts(spark: SparkSession, sfDir: String): DataFrame =
    runToMemorySink(
      rawEventStream(spark, sfDir)
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      s"graft_stream_s03_${tag(sfDir)}", "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("wstart"),
        col("event_type"), col("n"))
      .orderBy(col("wstart"), col("event_type"))

  /** s04: per-user session windows with a 30-minute inactivity gap
    * (session_window — Spark's built-in merging-state aggregation),
    * append mode so only watermark-closed sessions are emitted; same
    * watermark-safe day range as s02. Oracle: the equivalent batch
    * gaps-and-islands query.
    */
  def sessionCounts(spark: SparkSession, sfDir: String): DataFrame =
    runToParquetSink(spark,
      microsEventStream(spark, sfDir)
        .withWatermark("ts", "1 day")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events")),
      s"s04_${tag(sfDir)}")
      .filter(col("session_start") >= "2024-01-01" &&
        col("session_start") < "2024-01-26")
      .orderBy(col("user_id"), col("session_start"))

  /** s05: streaming deduplication — dropDuplicates emits only the
    * first-seen row per (user_id, event_type), the streaming-ingest
    * dedup step of a training-data pipeline. Which duplicate arrives
    * first is arrival-order dependent, so the deterministic (and
    * oracle-checked) output is the per-type count of distinct users,
    * aggregated from the deduplicated sink. Global-state dedup by
    * choice: the watermark-scoped variant (dropDuplicatesWithinWatermark)
    * only dedups near-in-time arrivals, a different contract.
    */
  def streamDedupCounts(spark: SparkSession, sfDir: String): DataFrame =
    runToMemorySink(
      microsEventStream(spark, sfDir)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type"),
      s"graft_stream_s05_${tag(sfDir)}", "append")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("distinct_users"))
      .orderBy(col("event_type"))

  /** s06: stream-stream interval join — each purchase joins the same
    * user's clicks from the preceding hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state on either side is evictable — the scalable shape for stream
    * joins. Inner joins emit eagerly on match, so the finite-input
    * output set is exactly the batch join's (the oracle), independent
    * of arrival order once aggregated per purchase day.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = microsEventStream(spark, sfDir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 day")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 day")
    runToMemorySink(
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts")),
      s"graft_stream_s06_${tag(sfDir)}", "append")
      .groupBy(date_format(col("p_ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("day"))
  }

  /** s07: streaming ingestion into the partitioned lake — the
    * reference's run_me_first.py ELT step (derive `date`, write
    * hive-partitioned) as a continuous pipeline: raw stream →
    * partitionBy(date) parquet sink with checkpointing. Verified by
    * re-reading the ingested lake and counting per partition against
    * the batch oracle.
    */
  def streamIngestPartitioned(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = s"/tmp/graft-stream/s07_lake_${tag(sfDir)}_out"
    val ckDir = s"/tmp/graft-stream/s07_lake_${tag(sfDir)}_ck"
    rmDir(spark, outDir); rmDir(spark, ckDir)
    val q = microsEventStream(spark, sfDir)
      .withColumn("date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .partitionBy("date")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .groupBy(date_format(col("date"), "yyyy-MM-dd").as("date"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("date"))
  }

  val queries: Map[String, Q] = Map(
    "s01_stream_window" -> ((spark, sfDir) => windowedCounts(spark, sfDir)),
    "s07_stream_ingest_partitioned" ->
      ((spark, sfDir) => streamIngestPartitioned(spark, sfDir)),
    "s02_stream_append_sink" -> ((spark, sfDir) => appendFileSink(spark, sfDir)),
    "s03_stream_sliding" -> ((spark, sfDir) => slidingCounts(spark, sfDir)),
    "s04_stream_session" -> ((spark, sfDir) => sessionCounts(spark, sfDir)),
    "s05_stream_dedup" -> ((spark, sfDir) => streamDedupCounts(spark, sfDir)),
    "s06_stream_stream_join" -> ((spark, sfDir) => streamStreamJoin(spark, sfDir))
  )

  val oracles: Map[String, String] = Map(
    "s07_stream_ingest_partitioned" ->
      ("SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date, COUNT(*) AS n " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "s01_stream_window" ->
      ("SELECT STRFTIME(CAST(DATE_TRUNC('day', ts) AS DATE), '%Y-%m-%d') AS day, " +
        "event_type, COUNT(*) AS n FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "s02_stream_append_sink" ->
      ("SELECT STRFTIME(CAST(DATE_TRUNC('day', ts) AS DATE), '%Y-%m-%d') AS day, " +
        "event_type, COUNT(*) AS n FROM events " +
        "WHERE CAST(DATE_TRUNC('day', ts) AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-25' " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // every event is a member of exactly two 2-day sliding windows:
    // the one starting on its day and the one starting the day before
    "s03_stream_sliding" ->
      ("WITH ev AS (SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d, event_type FROM events), " +
        "slides AS (SELECT d AS wstart, event_type FROM ev " +
        "UNION ALL SELECT d - 1 AS wstart, event_type FROM ev) " +
        "SELECT STRFTIME(wstart, '%Y-%m-%d') AS wstart, event_type, COUNT(*) AS n " +
        "FROM slides GROUP BY 1, 2 ORDER BY 1, 2"),
    // gaps-and-islands: a session breaks where the inactivity gap is
    // >= 30 minutes (session_window semantics: an event at exactly
    // start+gap opens a new session)
    "s04_stream_session" ->
      ("WITH o AS (SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev " +
        "FROM events), " +
        "f AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s FROM o), " +
        "g AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM f), " +
        "s AS (SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start, " +
        "COUNT(*) AS n_events FROM g GROUP BY user_id, sid) " +
        "SELECT user_id, session_start, n_events FROM s " +
        "WHERE session_start >= '2024-01-01' AND session_start < '2024-01-26' " +
        "ORDER BY user_id, session_start"),
    "s05_stream_dedup" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "s06_stream_stream_join" ->
      ("SELECT STRFTIME(CAST(p.ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS n_pairs " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts " +
        "GROUP BY 1 ORDER BY 1")
  )
}
