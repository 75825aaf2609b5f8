package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Prefix
import graft.operators.Prefix.ScanRow

/** The distributed two-pass scan must agree exactly with the
  * single-task window running sum on every partitioning — including
  * partition counts that split groups across many partitions, the
  * case the operator exists for.
  */
class PrefixSpec extends SparkSpec {

  test("runningSum matches the window running sum across partition counts") {
    import spark.implicits._
    // 3 groups of very different sizes, interleaved ids, values that
    // make per-group sums distinctive; deterministic pseudo-random
    val rows = (0 until 3000).map { i =>
      val g = if (i % 7 == 0) "small" else if (i % 3 == 0) "mid" else "big"
      ScanRow(id = i.toLong, group = g, value = (i * 2654435761L % 97) + 1)
    }
    val ds = rows.toDS()
    val w = Window.partitionBy(col("group")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = ds.toDF()
      .withColumn("running", sum(col("value")).over(w))
      .select(col("id"), col("running"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 partition (degenerate), 8 (groups split), 64 (many empty)
    Seq(1, 8, 64).foreach { n =>
      val got = Prefix.runningSum(ds, n)
        .collect().map(o => o.id -> o.running).toMap
      assert(got == expected, s"numPartitions=$n diverged")
    }
  }

  test("runningSum is exact for signed values across partition counts") {
    import spark.implicits._
    // Signed deltas whose local running sums peak MID-span: a spine
    // computed as max(local_run) instead of the value at the last id
    // gets these wrong whenever a group crosses a partition boundary.
    val rows = (0 until 2000).map { i =>
      val g = if (i % 5 == 0) "a" else "b"
      val v = ((i * 2654435761L % 41) - 20) // range [-20, 20], mixed sign
      ScanRow(id = i.toLong, group = g, value = v)
    }
    val ds = rows.toDS()
    val w = Window.partitionBy(col("group")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = ds.toDF()
      .withColumn("running", sum(col("value")).over(w))
      .select(col("id"), col("running"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 7, 32).foreach { n =>
      val got = Prefix.runningSum(ds, n)
        .collect().map(o => o.id -> o.running).toMap
      assert(got == expected, s"numPartitions=$n diverged on signed input")
    }
  }

  test("runningSum over a lake table shuffles the data once (ReusedExchange)") {
    import spark.implicits._
    // The FINAL adaptive plan materializes exactly ONE (group, id)
    // range exchange; the spine branch consumes a ReusedExchange of it
    // — the two-pass scan pays the shuffle once, and pid alignment
    // between the passes is structural, not re-sampled.
    val dir = "/tmp/graft-prefix-reuse"
    (0 until 1000).map(i => ScanRow(i.toLong, s"g${i % 3}", (i % 7).toLong))
      .toDS().write.mode("overwrite").parquet(dir)
    val ds = spark.read.parquet(dir).as[ScanRow]
    val plan = Prefix.runningSum(ds, 4).queryExecution.executedPlan
    plan.execute().count()
    val s = plan.toString
    val cut = s.indexOf("== Initial Plan ==")
    val fin = if (cut > 0) s.substring(0, cut) else s
    assert("ReusedExchange".r.findAllIn(fin).nonEmpty,
      s"spine did not reuse the range exchange:\n$fin")
    // count MATERIALIZED range exchanges only — the ReusedExchange line
    // restates the exchange it points at, so exclude it
    val materialized = fin.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning(group") && !l.contains("ReusedExchange"))
    assert(materialized == 1,
      s"expected exactly one materialized (group, id) range exchange, got $materialized:\n$fin")
  }

  test("runningSum refuses to run without exchange reuse") {
    import spark.implicits._
    // pid alignment between the spine and the final join depends on
    // ReuseExchange deduplicating the range exchange; with reuse off
    // the operator must fail loudly instead of silently misaligning
    val ds = Seq(ScanRow(1L, "g", 1L)).toDS()
    graft.sources.Lake.withConf(spark, "spark.sql.exchange.reuse" -> "false") {
      val e = intercept[IllegalArgumentException](Prefix.runningSum(ds, 4))
      assert(e.getMessage.contains("exchange.reuse"))
    }
  }

  test("runningSum stays inside whole-stage codegen (no interpreted fallback)") {
    import spark.implicits._
    // LocalRun was once `private`, which Janino cannot compile against
    // — every consumer silently fell back to interpreted execution
    // (CompileException in the logs, 2x wall time on x27/x37). With
    // fallback disabled, any regression of that kind throws instead of
    // degrading.
    val rows = (0 until 200).map(i =>
      ScanRow(i.toLong, if (i % 2 == 0) "a" else "b", (i % 5).toLong))
    graft.sources.Lake.withConf(spark,
      "spark.sql.codegen.fallback" -> "false") {
      val out = Prefix.runningSum(rows.toDS(), 4).collect()
      assert(out.length == 200)
    }
  }
}
