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

/** One sampled frame of a media payload: where it sits in the blob.
  * Structural fields only — integer byte math — so the sampling logic
  * is fully oracle-checkable; per-frame feature extraction (the codec
  * part) stays in the stubbed decode path.
  */
final case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Int, frame_len: Int)

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

  /** Deterministic frame sampling: up to `maxFrames` windows of
    * `window` bytes at evenly-strided offsets (integer math only, so
    * the DuckDB oracle can reproduce it from the byte length alone).
    * This is the video-frame-sample batch shape: per-asset fan-out to
    * per-frame rows inside one partition pass, no shuffle.
    */
  def sampleFrames(a: Asset, maxFrames: Int, window: Int): Seq[Frame] = {
    val n = a.blob.length
    val frames = math.min(maxFrames, math.max(1, n / window))
    (0 until frames).map { i =>
      val off = i * (n / frames)
      Frame(a.doc_id, i, off, math.min(window, n - off))
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
    }),

    // Frame sampling over the binary payload (video frame-sample
    // plumbing): per-asset flatMap fan-out to frame rows, structural
    // columns only — fully oracle-checked against integer byte math
    // on the payload length.
    "x17_frame_sample" -> ((spark, sfDir) => {
      import spark.implicits._
      Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .flatMap(a => sampleFrames(a, maxFrames = 4, window = 256))
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    })
  )

  // x14 is byte-level stub output (unit-tested); x17's structural
  // sampling is exactly reproducible from octet lengths in SQL.
  val oracles: Map[String, String] = Map(
    "x17_frame_sample" ->
      ("WITH a AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents), " +
        "f AS (SELECT doc_id, n, LEAST(4, GREATEST(1, n // 256)) AS frames FROM a), " +
        "u AS (SELECT doc_id, n, frames, unnest(range(frames)) AS i FROM f) " +
        "SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, " +
        "CAST(i * (n // frames) AS INTEGER) AS frame_offset, " +
        "CAST(LEAST(256, n - i * (n // frames)) AS INTEGER) AS frame_len " +
        "FROM u ORDER BY doc_id, frame_idx")
  )
}
