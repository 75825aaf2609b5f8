package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.VectorExpressions
import graft.sources.Lake

/** Native Catalyst expression semantics: the fused cosine must be
  * bit-identical to the composed-built-ins form, in both whole-stage
  * codegen and interpreted (eval) execution.
  */
class FunctionsSpec extends SparkSpec {

  private def toD(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  test("native cosine == HOF cosine bit-for-bit on real embeddings (codegen path)") {
    val e = Lake.table(spark, SfDir, "embeddings")
    val q = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv")))
    val both = e.filter(col("vec_id") =!= 0).join(q)
      .select(
        VectorExpressions.cosineNative(col("embedding"), col("qv")).as("native"),
        Similarity.cosineHof(toD(col("embedding")), toD(col("qv"))).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("native cosine agrees between codegen and interpreted eval") {
    val e = Lake.table(spark, SfDir, "embeddings").limit(50)
    val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
    def run(): Seq[Double] =
      e.join(q)
        .select(VectorExpressions.cosineNative(col("embedding"), col("qv")))
        .collect().map(_.getDouble(0)).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = run()
      assert(withCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("native cosine rejects non-array inputs at analysis time") {
    val e = Lake.table(spark, SfDir, "embeddings")
    intercept[Exception] {
      e.select(VectorExpressions.cosineNative(col("vec_id"), col("embedding"))).collect()
    }
  }
}
