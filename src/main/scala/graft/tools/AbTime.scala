package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** In-session A/B prober: times queries ALTERNATING a runtime SQL
  * conf between two values rep by rep, inside ONE session — the only
  * protocol on this box that separates a config effect from window
  * drift (cross-session walls for sub-2 s queries vary up to ±2×;
  * see OPTIMIZATION_r18.md "Measurement protocol").
  *
  * Usage: runMain graft.tools.AbTime <sfDir> <confKey> <valA> <valB>
  *          <query names...>
  * Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_AB_ROUNDS
  *        (default 4 — each round times valA once and valB once,
  *        interleaved, after one untimed warm rep per query).
  */
object AbTime {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, key, valA, valB, names @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.get("SPARK_GRAFT_AB_ROUNDS")
      .flatMap(_.toIntOption).getOrElse(4)
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
          def run(v: String): Double = {
            spark.conf.set(key, v)
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          run(valA) // warm (artifact builds, codegen)
          val (as, bs) = (1 to rounds).map(_ => (run(valA), run(valB))).unzip
          def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
          println(f"[ab] $name $key A=$valA medians ${med(as)}%.3f " +
            f"(${as.map(t => f"$t%.3f").mkString(",")}) | B=$valB ${med(bs)}%.3f " +
            f"(${bs.map(t => f"$t%.3f").mkString(",")})")
        case None => println(s"[ab] unknown query: $name")
      }
    }
    spark.stop()
  }
}
