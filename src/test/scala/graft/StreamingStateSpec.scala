package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Stateful Structured Streaming coverage (SURVEY §2.C streaming row):
  * custom per-key state with mapGroupsWithState, driven batch-by-batch
  * through a MemoryStream so the state transitions are observable and
  * deterministic.
  */
class StreamingStateSpec extends SparkSpec {

  test("mapGroupsWithState keeps running per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)] // (user_id, event_type)
    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }

    val q = counted.writeStream
      .format("memory").queryName("graft_state_test").outputMode("update")
      .start()
    try {
      input.addData((1L, "click"), (1L, "view"), (2L, "click"))
      q.processAllAvailable()
      input.addData((1L, "purchase"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("graft_state_test")
      .as[(Long, Long)].collect().toSet
    // batch 1 emits (1,2),(2,1); batch 2 emits (1,3) — state carried over
    assert(out.contains((1L, 2L)))
    assert(out.contains((2L, 1L)))
    assert(out.contains((1L, 3L)))
  }

  test("windowed streaming agg equals the batch aggregation (s01 semantics)") {
    import org.apache.spark.sql.functions._
    import graft.sources.Lake
    val streamed = graft.streaming.Streams.windowedCounts(spark, SfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = Lake.table(spark, SfDir, "events")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
