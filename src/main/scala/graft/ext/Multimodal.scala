package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[FakeDecoder]]); everything
  * Spark-side — the binary column, the metadata struct schema, the
  * partition-parallel batch processing shape, and the downstream
  * feature columns — is real and tested. Swapping [[FakeDecoder]] for
  * a JNI/codec call changes no plan shape.
  */
/** Decoded-asset features. In a real pipeline: decoded dims +
  * extracted feature vector. Here: deterministic functions of the
  * bytes so tests are stable. (Top-level: nested/private case classes
  * break the generated encoder projections.)
  */
final case class AssetFeatures(
    doc_id: Long, n_bytes: Int, width: Int, height: Int, mean_byte: Double)

final case class Asset(doc_id: Long, blob: Array[Byte])

object Multimodal {

  private type Q = (SparkSession, String) => DataFrame

  /** STUB decoder: stands in for image/audio decode + feature
    * extraction (libs not present in this container). Deterministic:
    * derives "dimensions" from the payload length and a byte-mean
    * "feature". Replace with a real codec at the call site —
    * signature (bytes → features) is the real contract.
    */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): AssetFeatures = {
      val n = bytes.length
      val mean = if (n == 0) 0.0 else bytes.iterator.map(b => (b & 0xff).toDouble).sum / n
      AssetFeatures(id, n, width = 16 + (n % 64), height = 16 + (n % 48),
        mean_byte = math.rint(mean * 10000) / 10000)
    }
  }

  val queries: Map[String, Q] = Map(
    // Binary-column pipeline: text bytes stand in for media payloads
    // (UTF-8 encode = the "read file" step). The decode runs as a
    // typed mapPartitions — batch-per-partition, the same execution
    // shape a vectorized decode UDF would have; everything before and
    // after stays columnar/codegen.
    "x14_multimodal_decode" -> ((spark, sfDir) => {
      import spark.implicits._
      val assets = Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
      assets
        .mapPartitions(_.map(a => FakeDecoder.decode(a.doc_id, a.blob)))
        .toDF()
        .orderBy(col("doc_id"))
    })
  )

  // Deterministic but byte-level — oracle via octet_length for the
  // sizes; the stubbed feature columns are covered by unit tests.
  val oracles: Map[String, String] = Map()
}
