package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join primitives (the 100 TB rules: a hot join key
  * concentrates one shuffle partition onto one task; salting splits it
  * deterministically; bucketing removes the shuffle entirely).
  *
  * When to salt vs when AQE suffices: modern Spark's
  * `spark.sql.adaptive.skewJoin` splits an oversized shuffle PARTITION
  * at runtime (PlanSpec asserts it fires on a planted hot key), and is
  * the right default — zero code, reacts to observed sizes. Manual
  * salting still wins when (a) ONE key's rows exceed what a single
  * split should own downstream of the join (AQE splits by partition
  * bytes, the post-join explosion of a hot key it cannot see), (b) the
  * skewed join feeds an aggregation keyed on the same column, where
  * AQE's split would be re-merged by the shuffle anyway and salted
  * two-phase aggregation is needed, or (c) AQE is unavailable
  * (streaming micro-batches, non-adaptive plans).
  */
object Skew {

  /** Salted equi-join for skewed fact keys: every fact row gets a
    * deterministic salt in [0, nSalts) hashed from `saltSrc` (any
    * column that spreads rows — typically the row's unique id), and
    * the dimension side is exploded nSalts× so each (key, salt) bucket
    * finds its dim row. One hot key becomes nSalts shuffle keys, at
    * the cost of replicating the (small) dim side nSalts times —
    * result rows are identical to the unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: Column, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSrc), lit(nSalts.toLong)))
    val dimExploded = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }
}
