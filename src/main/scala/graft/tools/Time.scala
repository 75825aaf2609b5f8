package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Targeted wall-clock probe for individual registered queries — the
  * iterate-on-one-operator loop Bench is too heavy for (Bench prewarm
  * runs the whole headline set; this warms and times only what you
  * name, with the same local[32]/AQE session shape Bench uses).
  *
  * Usage: runMain graft.tools.Time [sfDir] <query names...>
  * Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 3)
  */
object Time {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail.toSeq)
      else (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"), args.toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3)
    val spark = graft.engine.Tuning.rightSize(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          // warm rep (artifact builds, codegen) then timed reps
          val w0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val warm = (System.nanoTime() - w0) / 1e9
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[time] $name rows=$n warm=$warm%.3f reps=" +
            times.map(t => f"$t%.3f").mkString(",") +
            f" median=${times.sorted.apply(times.size / 2)}%.3f")
        case None => println(s"[time] unknown query: $name")
      }
    }
    spark.stop()
  }
}
