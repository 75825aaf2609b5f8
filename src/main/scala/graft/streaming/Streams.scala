package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Structured Streaming surface (SURVEY §2.C streaming row; the
  * reference only wishes for streaming ingestion, README.md:192).
  *
  * The canonical shape: file-source readStream → event-time tumbling
  * window + watermark → stateful aggregation → sink. For the
  * correctness gate we drive the stream to completion over the static
  * events table (processAllAvailable on a memory sink), so the result
  * is deterministic and oracle-checkable against the equivalent batch
  * aggregation — the semantics Structured Streaming guarantees.
  */
object Streams {

  private type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-day windowed count per event_type with a 1-day
    * watermark, run to completion over the parquet events table.
    */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // File streams need an explicit schema — the on-disk one (ts is
    // raw nanos-as-long, see Lake.table), converted after read exactly
    // like the batch path.
    val schema = Lake.rawSchema(spark, sfDir, "events")
    val sinkName = "graft_stream_" + Integer.toHexString(sfDir.hashCode)
    // File streams need a directory base path; select just the events
    // file out of the sf directory with a glob filter.
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(sinkName)
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"))
      .orderBy(col("day"), col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "s01_stream_window" -> ((spark, sfDir) => windowedCounts(spark, sfDir))
  )

  val oracles: Map[String, String] = Map(
    "s01_stream_window" ->
      ("SELECT STRFTIME(CAST(DATE_TRUNC('day', ts) AS DATE), '%Y-%m-%d') AS day, " +
        "event_type, COUNT(*) AS n FROM events GROUP BY 1, 2 ORDER BY 1, 2")
  )
}
