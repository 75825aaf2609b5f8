package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Path-addressed data-lake readers and writers.
  *
  * The reference engine addresses tables by physical parquet path on
  * object storage with no catalog (quack.py:145, README.md:100); hive
  * partitioning is produced by deriving a `date` column from an event
  * timestamp and writing `partition_cols=['date']`
  * (run_me_first.py:95-98) and consumed with partition-pruned scans
  * (benchmark.py:237-238). Spark-first equivalents: `spark.read.parquet`
  * with native partition discovery, `write.partitionBy`, and Catalyst
  * `PruneFileSourcePartitions` doing the pruning the reference does by
  * constructing per-partition paths manually.
  *
  * At 100 TB the same layout holds: one directory per table, hive
  * partitioning on a low-cardinality derived key (date), file sizes
  * governed by `spark.sql.files.maxPartitionBytes` on read and
  * `repartition(n, key)` before write.
  */
object Lake {

  /** All driver-provisioned testdata tables (TESTDATA.md + FIXTURES.md §2). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** B1: path-addressed parquet scan.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. We read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond TimestampType with integer division — the same
    * truncation DuckDB applies when it narrows ns → µs, so both
    * engines see identical values. DIV keeps the arithmetic in 64-bit
    * integers (a double round-trip would lose precision at 1e18 ns).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Raw (unconverted) schema of a table as stored — for readStream,
    * which must declare the on-disk schema before any conversion.
    */
  def rawSchema(spark: SparkSession, sfDir: String, name: String) = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet").schema
  }

  /** B13 / dbt-`ref` analog: name -> temp view over the physical path,
    * so `spark.sql` can address tables by name like the oracle does.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** A16 + A17: derive `date` from the event timestamp and write a
    * hive-partitioned copy (mirror of run_me_first.py:95-98, with
    * `events.ts` standing in for `pickup_at`). Idempotent per sfDir;
    * the _SUCCESS marker gates rewrite.
    *
    * We deliberately keep Spark's native partition-column type
    * inference ON: the partition key reads back as DateType (the
    * reference's embedded engine read it as VARCHAR — a quirk of
    * DuckDB 0.7's hive reader, not a semantic we want). Oracle queries
    * are phrased against the unpartitioned source so this choice is
    * invisible to the correctness gate.
    */
  def ensurePartitionedEvents(
      spark: SparkSession, sfDir: String,
      targetRoot: String = "/tmp/graft-lake"): String = {
    // Collision-free cache key: a readable slug plus a hash of the full
    // path, so distinct sfDirs can never alias each other's copy.
    val slug = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val hash = Integer.toHexString(sfDir.hashCode)
    val target = s"$targetRoot/events_by_date_${slug}_$hash"
    this.synchronized {
      // Hadoop FileSystem (not java.io.File) so the idempotence gate works
      // on any supported filesystem (local, HDFS, s3a), per the
      // object-storage framing of the layout.
      val conf = spark.sparkContext.hadoopConfiguration
      val path = new org.apache.hadoop.fs.Path(target, "_SUCCESS")
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path)) {
        table(spark, sfDir, "events")
          .withColumn("date", to_date(col("ts")))
          // Bounded shuffle: hash dates into a fixed number of tasks
          // instead of one task per date (a hot date would otherwise be a
          // single straggler task at scale); maxRecordsPerFile keeps any
          // one output file bounded regardless of date skew.
          .repartition(32, col("date"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", 5000000)
          .partitionBy("date").parquet(target)
      }
    }
    target
  }

  /** B2/B3: scan of the hive-partitioned copy; a filter on `date`
    * becomes partition pruning (the reference's manual per-day path
    * construction, benchmark.py:227-240, done by Catalyst instead).
    */
  def partitionedEvents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(ensurePartitionedEvents(spark, sfDir))
}
