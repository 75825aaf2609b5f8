package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total) over (group, order) — the
  * scan primitive a `Window.partitionBy(group)` running sum does NOT
  * give you at scale: Spark's WindowExec materializes each window
  * partition in ONE task, so a running sum over a 10 TB group is a
  * 10 TB straggler. This operator is the classic two-pass scan
  * instead:
  *
  *  1. range-partition by (group, order) — each group's rows are
  *     contiguous across partitions and globally ordered;
  *  2. pass 1: per-partition local running sums + one (partition,
  *     group, total) row per group-span — the spine, bounded by
  *     #partitions, not by data;
  *  3. offsets: per (partition, group), the sum of earlier partitions'
  *     totals for the same group — a window over the tiny spine;
  *  4. pass 2: local running + broadcast offset = global running.
  *
  * Two passes over the data by design (the standard work-efficient
  * scan); no group ever occupies more than one partition's worth of
  * memory in a single task. Input rows are (id, group, value).
  */
object Prefix {

  /** One input row: an ordering id, a grouping key, and the value to
    * accumulate. (Top-level for encoder derivation.)
    */
  final case class ScanRow(id: Long, group: String, value: Long)

  /** One output row: the input plus its global running total within
    * the group (ordered by id).
    */
  final case class ScanOut(id: Long, group: String, value: Long, running: Long)

  /** Pass-1 intermediate row. Public (not `private`) deliberately:
    * whole-stage codegen compiles generated Java that calls this
    * class's accessors, and Janino cannot resolve methods on a
    * non-public class — a `private` marker here silently downgrades
    * every consumer (x21/x27/x37) to interpreted execution with a
    * CompileException in the logs.
    */
  final case class LocalRun(
      id: Long, group: String, value: Long, pid: Int, local_run: Long)

  /** Running sum of `value` per `group` in `id` order, computed with
    * the two-pass scan above. `numPartitions` bounds per-task data; at
    * cluster scale set it to the usual shuffle parallelism.
    */
  def runningSum(ds: Dataset[ScanRow], numPartitions: Int): Dataset[ScanOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    // `local` is consumed twice below (spine + final join). Correct pid
    // alignment between the two consumers holds by two mechanisms:
    // (a) Catalyst's exchange reuse deduplicates the range exchange —
    // the spine reads a ReusedExchange, so both passes see the SAME
    // shuffle files (PrefixSpec asserts exactly one materialized
    // shuffle); (b) as a backstop (map-task retry after executor
    // loss), RangePartitioner's boundary sampling is seeded by
    // partition index, so identical deterministic input re-yields
    // identical boundaries. Disabling reuse would strip (a) AND double
    // the shuffle cost — fail loudly instead of running degraded.
    require(spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "Prefix.runningSum requires spark.sql.exchange.reuse=true: the " +
        "range exchange feeds both the spine and the final join; " +
        "without reuse the data is shuffled twice and pid alignment " +
        "rests solely on deterministic re-sampling")
    val ranged = ds
      .repartitionByRange(numPartitions, col("group"), col("id"))
      .sortWithinPartitions(col("group"), col("id"))
      .as[ScanRow]
    // pass 1 (also re-executed as pass 2's input): local running sums,
    // tagged with the physical partition id so the spine lines up
    val local = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var cur: String = null
      var run = 0L
      it.map { r =>
        if (r.group != cur) { cur = r.group; run = 0L }
        run += r.value
        LocalRun(r.id, r.group, r.value, pid, run)
      }
    }
    // spine: the last local running per (partition, group) IS that
    // span's total (rows are contiguous and ordered within a partition).
    // "Last" means at the max id — NOT max(local_run), which only
    // coincides with the span total when every value is non-negative;
    // signed deltas (balances, inventory) need the true last row.
    val spine = local.groupBy(col("pid"), col("group"))
      .agg(max_by(col("local_run"), col("id")).as("ptotal"))
    val ow = Window.partitionBy(col("group")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = spine
      .withColumn("offset", coalesce(sum(col("ptotal")).over(ow), lit(0L)))
      .select(col("pid"), col("group"), col("offset"))
    // the spine is O(numPartitions) rows — broadcast, never shuffled
    local.join(broadcast(offsets), Seq("pid", "group"))
      .select(col("id"), col("group"), col("value"),
        (col("local_run") + col("offset")).as("running"))
      .as[ScanOut]
  }
}
