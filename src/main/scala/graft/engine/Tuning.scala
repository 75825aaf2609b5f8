package graft.engine

import org.apache.spark.sql.SparkSession

/** Shared session tuning applied by every entry point that builds a
  * SparkSession (Bench, Verify, the serving engine, the probe tools)
  * — one definition so the measured surface and the served surface
  * can never drift.
  *
  * PARTITION RIGHT-SIZING (guide §2.2, VERDICT r17 #3): with the
  * stock AQE defaults (`coalescePartitions.parallelismFirst=true`)
  * every shuffle keeps ~one partition per core even when the whole
  * shuffle is a few KB, so sub-second queries pay 32-way task
  * scheduling per exchange — the r17 8-vs-32-core block measured
  * b09 at 0.37, c32 at 0.56, b02 at 0.62 (FASTER on 8 cores than
  * 32: the tracked set was measuring the scheduler, not the engine).
  * Setting `parallelismFirst=false` makes AQE honor the advisory
  * partition size instead, which is SIZE-ADAPTIVE in both
  * directions: a 40 KB shuffle coalesces to one task, a corpus-grain
  * shuffle keeps its parallelism (coalescing can only merge the
  * `spark.sql.shuffle.partitions` initial partitions, never split
  * them, so no plan loses parallelism it needs at the decades —
  * partitions above the advisory size are left alone).
  *
  * The advisory default (4m) is a LOCAL default, env-overridable,
  * picked from an interleaved off/4m/16m/off A/B at sf0.1 (r18):
  * 4m halves the scheduling-bound class (flagship 0.51→0.34,
  * b09 0.86→0.54, c02 0.91→0.47, c31 0.29→0.23, x69 2.83→2.41 in
  * the matched series) while leaving the mid-shuffle heavies flat
  * (x199 2.29→2.18, x285 3.06→2.56); 16m additionally coalesced
  * THEIR shuffles below useful parallelism and regressed them
  * (x199 3.03, x285 3.81) — too coarse for a 32-core box at sf0.1.
  * In production (real cluster, 100 TB inputs) the right value is
  * the guide §9 range — 256m — set via the same env/conf; the
  * mechanism (size-adaptive coalescing) is what scales, the constant
  * is deployment-sized like `spark.sql.shuffle.partitions` itself.
  */
object Tuning {
  /** "off" disables the right-sizing entirely (A/B harness — the same
    * binary can run the stock-AQE shape for before/after probes).
    */
  val AdvisoryPartitionBytes: String =
    sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "4m")

  def rightSize(b: SparkSession.Builder): SparkSession.Builder = {
    val base = b.config("spark.sql.adaptive.enabled", "true")
    if (AdvisoryPartitionBytes == "off") base
    else base
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        AdvisoryPartitionBytes)
  }
}
