package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.SparkEngine
import graft.sources.Lake

/** The tested core: one named query per SURVEY §2.B row plus the flagship
  * (§7.2) and the engine-routed entry (§2.A A1). Every entry here has a
  * DuckDB oracle in [[Core.oracles]] with identically-aliased columns and
  * a total ORDER BY (tiebreakers per SURVEY §7.4.4) so the driver's
  * hash-compare is deterministic.
  *
  * The reference's canonical query shape (reference README.md:100,
  * benchmark.py:133-145) is scan → timestamp-range filter → GROUP BY →
  * COUNT → ORDER BY count DESC — `events.ts`/`event_type` stand in for
  * `pickup_at`/`pickup_location_id`.
  */
object Core {

  private type Q = (SparkSession, String) => DataFrame

  /** Registers the name→path views (B13) then runs SQL — the engine's
    * query path (reference app.py:51 runs SQL against path-addressed
    * parquet; we address by registered view name).
    */
  private def sql(q: String): Q = (spark, sfDir) => {
    Lake.registerAll(spark, sfDir)
    spark.sql(q)
  }

  /** §7.2 flagship: the canonical scan→filter→agg→sort slice. */
  val flagshipSql: String =
    """SELECT event_type, COUNT(*) AS counts FROM events
      |WHERE ts >= '2024-01-05' AND ts < '2024-01-15'
      |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "flagship" -> sql(flagshipSql),

    // A1/A7: the same query routed through the engine service wrapper —
    // proves SparkEngine.sql is the library's real entry point.
    "a01_engine_sql" -> ((spark, sfDir) => {
      Lake.registerAll(spark, sfDir)
      SparkEngine.wrap(spark).sql(
        "SELECT user_id, COUNT(*) AS counts FROM events " +
          "GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20")
    }),

    // B1: explicit-path parquet scan, projection, total order.
    "b01_scan_explicit" -> ((spark, sfDir) =>
      Lake.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(500)),

    // B2: glob/partition-discovery scan over the hive-partitioned copy.
    "b02_glob_scan" -> ((spark, sfDir) =>
      Lake.partitionedEvents(spark, sfDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // B3: single-partition pruned scan — the filter on the partition key
    // becomes PartitionFilters, Catalyst's version of the reference's
    // manual per-day path construction (benchmark.py:237-238).
    "b03_pruned_scan" -> ((spark, sfDir) =>
      Lake.partitionedEvents(spark, sfDir)
        .filter(col("date") === lit("2024-01-05"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // B4: projection + aliasing.
    "b04_projection_alias" -> ((spark, sfDir) =>
      Lake.table(spark, sfDir, "events")
        .select(col("event_id").as("id"), col("user_id").as("uid"),
          col("event_type").as("etype"))
        .orderBy(col("id"))
        .limit(100)),

    // B5: timestamp-range filter with string-literal coercion.
    "b05_ts_filter" -> ((spark, sfDir) =>
      Lake.table(spark, sfDir, "events")
        .filter(col("ts") >= lit("2024-01-10") && col("ts") < lit("2024-01-12"))
        .agg(count(lit(1)).as("counts"))),

    // B6: partition-column range filter → multi-partition pruning.
    // Output the partition key as a yyyy-MM-dd string: date-typed
    // columns round-trip differently through result serializers
    // (date32 vs datetime64), so the comparable form is the string.
    "b06_partition_range" -> ((spark, sfDir) =>
      Lake.partitionedEvents(spark, sfDir)
        .filter(col("date") >= lit("2024-01-03") && col("date") < lit("2024-01-07"))
        .groupBy(date_format(col("date"), "yyyy-MM-dd").as("date"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("date"))),

    // B7: COUNT(*) with no grouping.
    "b07_count_star" -> ((spark, sfDir) =>
      Lake.table(spark, sfDir, "lineitem").agg(count(lit(1)).as("counts"))),

    // B8: GROUP BY ordinal (spark.sql.groupByOrdinal, default on).
    "b08_groupby_ordinal" -> sql(
      "SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem " +
        "GROUP BY 1 ORDER BY 1"),

    // B9: partial/final COUNT decomposition — Spark's automatic
    // map-side partial + shuffle + final agg is the reference's whole
    // hand-rolled map-reduce (benchmark.py:185-224).
    "b09_partial_final" -> ((spark, sfDir) =>
      Lake.table(spark, sfDir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("user_id"))
        .limit(100)),

    // B10: ORDER BY ordinal DESC (spark.sql.orderByOrdinal, default on).
    "b10_orderby_ordinal" -> sql(
      "SELECT event_type, COUNT(*) AS counts FROM events " +
        "GROUP BY 1 ORDER BY 2 DESC, 1"),

    // B11: top-k = sort + limit (TakeOrderedAndProject physically).
    "b11_topk_limit" -> ((spark, sfDir) =>
      Lake.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(50)),

    // B12: session-config statement through the SQL surface (reference
    // `SET s3_region=…`, app.py:17-22). Rows-only check: the value is
    // environment-dependent by nature.
    "b12_set_conf" -> ((spark, _) =>
      spark.sql("SET spark.sql.shuffle.partitions")),

    // B14: multi-path scan — the reference's canonical entry takes a
    // LIST of parquet paths (`read_parquet([...])`, quack.py:145-146);
    // Spark-first: varargs `spark.read.parquet(p1, p2)` over two
    // explicit partition leaf directories of the hive layout, unioned
    // into one scan relation (one file index, not a UNION plan).
    "b14_multipath_scan" -> ((spark, sfDir) => {
      val root = Lake.ensurePartitionedEvents(spark, sfDir)
      spark.read.parquet(s"$root/date=2024-01-03", s"$root/date=2024-01-04")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // B13: view reference / name→path registration (dbt `ref` analog).
    "b13_view_ref" -> ((spark, sfDir) => {
      Lake.registerAll(spark, sfDir)
      spark.sql(
        "SELECT user_id, COUNT(*) AS counts FROM events GROUP BY user_id")
        .createOrReplaceTempView("trips_by_user")
      spark.sql(
        "SELECT user_id, counts FROM trips_by_user " +
          "ORDER BY counts DESC, user_id LIMIT 10")
    })
  )

  val oracles: Map[String, String] = Map(
    "flagship" ->
      ("SELECT event_type, COUNT(*) AS counts FROM events " +
        "WHERE ts >= '2024-01-05' AND ts < '2024-01-15' " +
        "GROUP BY 1 ORDER BY 2 DESC, 1"),
    "a01_engine_sql" ->
      ("SELECT user_id, COUNT(*) AS counts FROM events " +
        "GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20"),
    "b01_scan_explicit" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500"),
    "b02_glob_scan" ->
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "b03_pruned_scan" ->
      ("SELECT event_type, COUNT(*) AS n FROM events " +
        "WHERE CAST(ts AS DATE) = DATE '2024-01-05' " +
        "GROUP BY event_type ORDER BY event_type"),
    "b04_projection_alias" ->
      ("SELECT event_id AS id, user_id AS uid, event_type AS etype " +
        "FROM events ORDER BY id LIMIT 100"),
    "b05_ts_filter" ->
      ("SELECT COUNT(*) AS counts FROM events " +
        "WHERE ts >= '2024-01-10' AND ts < '2024-01-12'"),
    "b06_partition_range" ->
      ("SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date, COUNT(*) AS n FROM events " +
        "WHERE CAST(ts AS DATE) >= DATE '2024-01-03' AND CAST(ts AS DATE) < DATE '2024-01-07' " +
        "GROUP BY 1 ORDER BY 1"),
    "b07_count_star" -> "SELECT COUNT(*) AS counts FROM lineitem",
    "b08_groupby_ordinal" ->
      "SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1",
    "b09_partial_final" ->
      ("SELECT user_id, COUNT(*) AS n FROM events " +
        "GROUP BY user_id ORDER BY n DESC, user_id LIMIT 100"),
    "b10_orderby_ordinal" ->
      ("SELECT event_type, COUNT(*) AS counts FROM events " +
        "GROUP BY 1 ORDER BY 2 DESC, 1"),
    "b11_topk_limit" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"),
    "b13_view_ref" ->
      ("SELECT user_id, counts FROM " +
        "(SELECT user_id, COUNT(*) AS counts FROM events GROUP BY user_id) t " +
        "ORDER BY counts DESC, user_id LIMIT 10"),
    // OR-equality, not IN: DuckDB coerces `CAST(ts AS DATE) IN (DATE
    // ...)` back to timestamp comparison and matches nothing.
    "b14_multipath_scan" ->
      ("SELECT event_id, user_id, event_type FROM events " +
        "WHERE CAST(ts AS DATE) = DATE '2024-01-03' " +
        "OR CAST(ts AS DATE) = DATE '2024-01-04' " +
        "ORDER BY event_id")
  )
}
