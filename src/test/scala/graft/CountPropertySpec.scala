package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property for the algebraic law the reference's whole
  * map-reduce rewrite rests on (SURVEY §5, A10-A12 invariant): a
  * partial COUNT per partition merged by SUM equals the global COUNT,
  * for ANY partitioning of the data. (Gen driven directly — the
  * scalatest/scalacheck bridge isn't in the offline dependency set.)
  */
class CountPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("partial count + final merge ≡ global count for any partitioning") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.choose(0, 5))
      slices <- Gen.choose(1, 8)
    } yield (keys, slices)
    for ((keys, slices) <- samples(gen, 25)) {
      import spark.implicits._
      val df = spark.sparkContext.parallelize(keys, slices).toDF("k")
      val distributed = df.groupBy($"k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val local = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(distributed == local, s"keys=$keys slices=$slices")
    }
  }

  test("limit-in-plan ≡ limit-after-collect on sorted output (A3)") {
    import spark.implicits._
    val df = (1 to 100).toDF("v").orderBy($"v")
    val planned = df.limit(7).collect().map(_.getInt(0)).toSeq
    val after = df.collect().take(7).map(_.getInt(0)).toSeq
    assert(planned == after)
  }
}
