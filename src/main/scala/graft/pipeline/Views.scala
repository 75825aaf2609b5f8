package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** ELT view-materialization pipeline — the Spark-native re-expression
  * of the reference's two dbt models (SURVEY §2.A A18/B13):
  * an aggregate view (`trips_by_pickup_location.sql:1-6`) feeding a
  * top-k external parquet artifact (`top_pickup_locations.sql:1-9`)
  * that downstream queries re-read (`dashboard.py:37-52`).
  *
  * `events.user_id` stands in for `pickup_location_id`; the artifact
  * is a manual materialized view: compute → write.parquet → re-read.
  */
object Views {

  private type Q = (SparkSession, String) => DataFrame

  /** Model 1 (view): trips per key. */
  def tripsByUser(spark: SparkSession, sfDir: String): DataFrame =
    Lake.table(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("counts"))

  /** Model 2 (external): top-200 of model 1, materialized to parquet
    * and re-read — the artifact downstream dashboards query.
    * Deterministic tiebreak on user_id (SURVEY §7.4.4; the reference's
    * own `ORDER BY 2 DESC LIMIT 200` is tie-unstable — fixed, not
    * replicated).
    */
  def materializeTopUsers(spark: SparkSession, sfDir: String,
      targetRoot: String = "/tmp/graft-views"): String = {
    val hash = Integer.toHexString(sfDir.hashCode)
    val target = s"$targetRoot/top_users_$hash"
    tripsByUser(spark, sfDir)
      .orderBy(desc("counts"), col("user_id"))
      .limit(200)
      // ≤200 rows: a single-file artifact is the right layout.
      .coalesce(1)
      .write.mode("overwrite").parquet(target)
    target
  }

  val queries: Map[String, Q] = Map(
    // The full pipeline as a query: materialize, re-read the artifact,
    // serve the dashboard's projection off it (sink + re-read + view
    // reference in one verified path).
    "p01_pipeline_topk" -> ((spark, sfDir) => {
      val artifact = materializeTopUsers(spark, sfDir)
      spark.read.parquet(artifact)
        .select(col("user_id").as("pickup_location_id"), col("counts").as("trips"))
        .orderBy(desc("trips"), col("pickup_location_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "p01_pipeline_topk" ->
      ("SELECT user_id AS pickup_location_id, counts AS trips FROM (" +
        "SELECT user_id, COUNT(*) AS counts FROM events GROUP BY user_id " +
        "ORDER BY counts DESC, user_id LIMIT 200) t " +
        "ORDER BY trips DESC, pickup_location_id")
  )
}
