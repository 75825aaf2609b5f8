package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The image path is REAL end-to-end: payloads are rendered into 8-bit
  * grayscale PNGs and decoded with the JDK's bundled ImageIO codec
  * (`javax.imageio` is part of Java SE — no external libraries), so
  * x14 exercises an actual compressed-image decode on executors, not a
  * stub. Gray PNG is lossless, which makes every decoded feature an
  * exact function of the source bytes — hence a full DuckDB oracle.
  * Audio/video feature extraction would slot into the same typed
  * mapPartitions shape; x17 keeps the structural frame-sampling path
  * for the video case.
  */
/** Features extracted from a decoded image: real dimensions from the
  * codec plus the mean gray sample. (Top-level: nested/private case
  * classes break the generated encoder projections.)
  */
final case class ImageFeatures(
    doc_id: Long, width: Int, height: Int, mean_byte: Double)

final case class Asset(doc_id: Long, blob: Array[Byte])

/** Features extracted from a decoded audio payload: sample count from
  * the container, exact integer energy (sum |sample|), zero-crossing
  * count, and the mean magnitude (one exact-int division — the only
  * float, deterministic on both engines).
  */
final case class AudioFeatures(doc_id: Long, n_samples: Int, abs_sum: Long,
    zero_crossings: Int, mean_abs: Double)

/** One sampled frame of a media payload: where it sits in the blob.
  * Structural fields only — integer byte math — so the sampling logic
  * is fully oracle-checkable; per-frame feature extraction plugs into
  * the same decode path as x14.
  */
final case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Int, frame_len: Int)

/** One PCM analysis window's exact integer energy (x110): position,
  * sample count (the tail window may be partial) and Σ|sample|.
  */
final case class AudioWindow(doc_id: Long, wi: Int, n_samples: Int, abs_sum: Long)

/** One decoded frame's intensity feature: the exact integer byte sum
  * over its window — the per-frame statistic the scene-cut detector
  * (x89) differences.
  */
final case class FrameFeature(doc_id: Long, frame_idx: Int, frame_sum: Long)

object Multimodal {

  private type Q = (SparkSession, String) => DataFrame

  /** The x14/x23 oracles index CHARACTERS (`ord(substr(text, ...))`)
    * while the Spark side encodes UTF-8 BYTES — equivalent only for
    * non-empty, single-byte (ASCII) text. True at every provisioned
    * scale factor, but a testdata change must fail HERE, loudly, not
    * surface as silent oracle drift (or a % 0 on the DuckDB side for an
    * empty document). Asserted once per (process, sfDir) at query
    * build time.
    */
  private val asciiChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def assertAsciiCorpus(spark: SparkSession, sfDir: String): Unit =
    if (!asciiChecked.contains(sfDir)) {
      // < 2 chars (not just empty): x41's oracle computes len DIV 2
      // samples with no wraparound, so a 1-char doc would emit a Spark
      // row (encodeWav's max(1, ·) path) that the oracle never groups
      val bad = Lake.table(spark, sfDir, "documents")
        .filter(length(col("text")) < 2 ||
          octet_length(col("text")) =!= length(col("text")))
        .count()
      require(bad == 0,
        s"$bad documents at $sfDir are shorter than 2 chars or non-ASCII; " +
          "the x14/x23/x41 oracles assume >=2-char single-byte text " +
          "(character index == byte index; at least one PCM sample) — " +
          "rephrase them over bytes before relaxing this assert")
      asciiChecked.add(sfDir)
    }

  /** Real JDK image codec (javax.imageio, bundled with Java SE).
    * 16×16 8-bit grayscale PNG: small enough that the encode side of
    * the pipeline stays cheap, lossless so the decode features are
    * exact.
    */
  object ImageCodec {
    val Side = 16

    // ImageIO's default stream cache is DISK-backed — every encode and
    // decode call creates and deletes a temp file, which at corpus
    // scale is pure filesystem churn per row. In-memory streams only.
    javax.imageio.ImageIO.setUseCache(false)

    /** Ingest side: render payload bytes into a REAL PNG — pixel p
      * (row-major) = byte[p mod n] — standing in for lake-resident
      * image files. Deterministic, so the decode step downstream is
      * fully oracle-checkable from the source bytes alone.
      */
    def encodePng(bytes: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        Side, Side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var p = 0
      while (p < Side * Side) {
        val v = if (bytes.isEmpty) 0 else bytes(p % bytes.length) & 0xff
        raster.setSample(p % Side, p / Side, 0, v)
        p += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode side: actual ImageIO PNG decode + feature extraction —
      * dimensions from the codec, mean over the raw raster samples
      * (raster access, not getRGB, so no color-space conversion).
      * The mean of w·h integer samples is sum/2^k with an exact
      * integer sum — bit-exact in double on any summation order, so
      * no rounding is needed for cross-engine comparison.
      */
    def decode(id: Long, png: Array[Byte]): ImageFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      ImageFeatures(id, w, h, s.toDouble / (w * h))
    }

    /** Perceptual average-hash (aHash) from a REAL PNG decode: 2×2
      * block sums over the 16×16 raster, each block's bit set iff its
      * mean clears the whole-image mean — compared in exact integers
      * (block_sum·64 ≥ total, since 4·64 = 256 pixels), so the hash
      * is bit-reproducible from the source bytes. Returned as the
      * 64-char '0'/'1' string in (by, bx) row-major bit order — a
      * string key sidesteps the sign of a 64-bit literal and shuffles
      * at constant width. The property that makes this PERCEPTUAL:
      * adding a constant c to every pixel shifts block_sum·64 and
      * total by the same 256·c, so global brightness/exposure changes
      * leave the hash EXACTLY invariant while byte-level hashes all
      * move.
      */
    def aHashBits(png: Array[Byte]): String = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val raster = img.getRaster
      var total = 0L
      var y = 0
      while (y < Side) {
        var x = 0
        while (x < Side) { total += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val bits = new java.lang.StringBuilder(64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          val bs = raster.getSample(2 * bx, 2 * by, 0).toLong +
            raster.getSample(2 * bx + 1, 2 * by, 0) +
            raster.getSample(2 * bx, 2 * by + 1, 0) +
            raster.getSample(2 * bx + 1, 2 * by + 1, 0)
          bits.append(if (bs * 64L >= total) '1' else '0')
          bx += 1
        }
        by += 1
      }
      bits.toString
    }

    /** Decode + nearest-neighbor resize to outSide×outSide, features
      * of the RESIZED image. The nearest kernel is the explicit index
      * map src = dst·W/out (floor) — hand-rolled rather than
      * AffineTransformOp because that op's nearest rounding is
      * implementation-defined, and the mapping here must be exact for
      * the cross-engine oracle. outSide a power of two keeps the mean
      * (integer sum / 2^k) bit-exact in double.
      */
    def decodeAndResize(id: Long, png: Array[Byte], outSide: Int): ImageFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      var s = 0L
      var y = 0
      while (y < outSide) {
        var x = 0
        while (x < outSide) {
          s += raster.getSample(x * w / outSide, y * h / outSide, 0)
          x += 1
        }
        y += 1
      }
      ImageFeatures(id, outSide, outSide, s.toDouble / (outSide * outSide))
    }
  }

  /** Real JDK audio codec (javax.sound.sampled, bundled with Java SE —
    * the audio twin of [[ImageCodec]]): payload bytes become 16-bit
    * mono PCM samples inside an actual WAV container, and the decode
    * side parses that container back through AudioSystem. PCM-in-WAV
    * is lossless, so every decoded feature is an exact function of
    * the source bytes — hence a full DuckDB oracle.
    */
  object AudioCodec {
    val SampleRate = 8000f

    /** Ingest side: sample i = (byte[2i] − 109)·256 + byte[2i+1],
      * signed 16-bit little-endian PCM in a WAV container. Centering
      * on 109 ('m') puts ASCII text on both sides of zero, so the
      * zero-crossing feature is non-vacuous (an unshifted mapping
      * leaves every ASCII-built sample on one side).
      */
    def encodeWav(bytes: Array[Byte]): Array[Byte] = {
      import javax.sound.sampled._
      val n = math.max(1, bytes.length / 2)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val hi = if (bytes.isEmpty) 0 else bytes((2 * i) % bytes.length) & 0xff
        val lo = if (bytes.isEmpty) 0 else bytes((2 * i + 1) % bytes.length) & 0xff
        val s = (hi - 109) * 256 + lo
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode side: a REAL WAV parse (AudioSystem reads the RIFF
      * header and yields the PCM body), then sample-level features:
      * exact |sample| sum, sign-change count, mean magnitude.
      */
    def decode(id: Long, wav: Array[Byte]): AudioFeatures = {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(wav))
      require(ais.getFormat.getSampleSizeInBits == 16 &&
        !ais.getFormat.isBigEndian, s"unexpected decoded format: ${ais.getFormat}")
      val data = ais.readAllBytes()
      val n = data.length / 2
      var absSum = 0L
      var zc = 0
      var prev = 0
      var i = 0
      while (i < n) {
        val s = (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
        absSum += math.abs(s)
        if (i > 0 && (s < 0) != (prev < 0)) zc += 1
        prev = s
        i += 1
      }
      AudioFeatures(id, n, absSum, zc, absSum.toDouble / n)
    }

    /** Per-window exact energies from a REAL WAV parse (x110): the
      * decoded PCM body split into `win`-sample analysis windows,
      * each with its exact Σ|sample| — the imperative half of the
      * silence segmenter; everything downstream is declarative.
      */
    def windowEnergies(id: Long, wav: Array[Byte], win: Int): Seq[AudioWindow] = {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(wav))
      require(ais.getFormat.getSampleSizeInBits == 16 &&
        !ais.getFormat.isBigEndian, s"unexpected decoded format: ${ais.getFormat}")
      val data = ais.readAllBytes()
      val n = data.length / 2
      val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindow]
      var wi = 0
      var i = 0
      while (i < n) {
        val end = math.min(i + win, n)
        var s = 0L
        var j = i
        while (j < end) {
          s += math.abs((data(2 * j + 1) << 8) | (data(2 * j) & 0xff))
          j += 1
        }
        out += AudioWindow(id, wi, end - i, s)
        wi += 1
        i = end
      }
      out.toSeq
    }
  }

  /** Deterministic frame sampling: up to `maxFrames` windows of
    * `window` bytes at evenly-strided offsets (integer math only, so
    * the DuckDB oracle can reproduce it from the byte length alone).
    * This is the video-frame-sample batch shape: per-asset fan-out to
    * per-frame rows inside one partition pass, no shuffle.
    */
  /** Contiguous fixed-width frames with their exact intensity sums:
    * frame i covers bytes [window·i, window·(i+1)) (one short frame
    * when the payload is under a window; the sub-window tail is
    * dropped, the codec convention). An EMPTY payload yields zero
    * frames — matching the x89/x90 oracles, whose frame spine
    * (range WHERE j < flen) vanishes for a zero-length doc; the old
    * max(n/window, 1) emitted a phantom sum-0 frame that would
    * hash-fail the gate on an empty document. Partition-local
    * imperative work over the blob — the multimodal execution shape —
    * with integer output, so the whole feature is oracle-exact.
    */
  def frameSums(a: Asset, window: Int): Seq[FrameFeature] = {
    val n = a.blob.length
    val frames = if (n == 0) 0 else math.max(n / window, 1)
    (0 until frames).map { i =>
      val off = i * window
      val len = math.min(window, n - off)
      var s = 0L
      var p = off
      while (p < off + len) { s += (a.blob(p) & 0xff); p += 1 }
      FrameFeature(a.doc_id, i, s)
    }
  }

  def sampleFrames(a: Asset, maxFrames: Int, window: Int): Seq[Frame] = {
    val n = a.blob.length
    val frames = math.min(maxFrames, math.max(1, n / window))
    (0 until frames).map { i =>
      val off = i * (n / frames)
      Frame(a.doc_id, i, off, math.min(window, n - off))
    }
  }

  val queries: Map[String, Q] = Map(
    // Binary-column pipeline with a REAL codec: text bytes are the
    // payload (UTF-8 encode = the "read file" step), rendered to PNG
    // and decoded back with JDK ImageIO. Two typed mapPartitions
    // passes — media-ingest producing the binary image column, then
    // decode + feature extraction — the batch-per-partition execution
    // shape a production image pipeline has; no shuffle anywhere.
    "x14_multimodal_decode" -> ((spark, sfDir) => {
      import spark.implicits._
      assertAsciiCorpus(spark, sfDir)
      val pngs = Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .mapPartitions(_.map(a => Asset(a.doc_id, ImageCodec.encodePng(a.blob))))
      pngs
        .mapPartitions(_.map(a => ImageCodec.decode(a.doc_id, a.blob)))
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Image RESIZE over the real binary pipeline: PNG-encode, decode
    // with the real codec, nearest-neighbor downsample 16×16 → 8×8,
    // features of the resized image — the thumbnail/preprocess step of
    // an image-training pipeline, same shuffle-free mapPartitions
    // shape as x14.
    "x23_image_resize" -> ((spark, sfDir) => {
      import spark.implicits._
      assertAsciiCorpus(spark, sfDir)
      Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .mapPartitions(_.map(a => Asset(a.doc_id, ImageCodec.encodePng(a.blob))))
        .mapPartitions(_.map(a => ImageCodec.decodeAndResize(a.doc_id, a.blob, 8)))
        .toDF()
        .select(col("doc_id"), col("width").as("out_w"),
          col("height").as("out_h"), col("mean_byte"))
        .orderBy(col("doc_id"))
    }),

    // AUDIO pipeline with the real JDK WAV codec — the audio twin of
    // x14: payload bytes → PCM-in-WAV (media ingest), then an actual
    // AudioSystem container parse + sample-level feature extraction
    // (energy, zero crossings) — same shuffle-free typed
    // mapPartitions shape as the image path.
    "x41_audio_features" -> ((spark, sfDir) => {
      import spark.implicits._
      assertAsciiCorpus(spark, sfDir)
      Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .mapPartitions(_.map(a => Asset(a.doc_id, AudioCodec.encodeWav(a.blob))))
        .mapPartitions(_.map(a => AudioCodec.decode(a.doc_id, a.blob)))
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
    }),

    // SCENE-CUT DETECTION — the clip-boundary step of a video
    // curation pipeline: per-frame intensity (exact byte sum over
    // contiguous 64-byte frames, partition-local typed work like
    // x14's decode), then a per-asset lag window flags frames whose
    // intensity jumps more than 300 from their predecessor (the p99
    // of the provisioned corpus — cuts are rare by construction, as
    // in real footage). Integer feature + integer threshold ⇒ fully
    // oracled; the declarative cut layer stays in Catalyst, only the
    // codec-shaped byte scan is imperative.
    "x89_scene_cuts" -> ((spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      assertAsciiCorpus(spark, sfDir)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .flatMap(a => frameSums(a, window = 64))
        .toDF()
        .withColumn("prev", lag(col("frame_sum"), 1).over(w))
        .withColumn("is_cut", when(col("prev").isNull, lit(false))
          .otherwise(abs(col("frame_sum") - col("prev")) > 300))
        .select(col("doc_id"), col("frame_idx"), col("frame_sum"), col("is_cut"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // SCENE SEGMENTATION — the clip table x89's boundary signal
    // exists to produce: a running sum over the cut flags assigns each
    // frame its scene id (gaps-and-islands, the c53 pattern on a
    // multimodal signal), then one agg rolls frames up to scenes with
    // start/length and the window-normalized mean intensity (one
    // division on exact integer sums, 4 dp; normalized per 64-byte
    // slot — the sub-window single-frame case normalizes by the
    // nominal window too, a documented codec convention, not a float
    // hazard). This is the unit a video pipeline dedups, captions,
    // and samples — per-asset windows only, never a global sort.
    "x90_scene_segments" -> ((spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      assertAsciiCorpus(spark, sfDir)
      val byFrame = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .flatMap(a => frameSums(a, window = 64))
        .toDF()
        .withColumn("prev", lag(col("frame_sum"), 1).over(byFrame))
        .withColumn("cut", when(col("prev").isNull, lit(0))
          .otherwise((abs(col("frame_sum") - col("prev")) > 300).cast("int")))
        .withColumn("scene_id", sum(col("cut")).over(
          byFrame.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("scene_id"))
        .agg(min(col("frame_idx")).as("start_frame"),
          count(lit(1)).as("n_frames"),
          round(sum(col("frame_sum")).cast("double") /
            (count(lit(1)) * 64).cast("double"), 4).as("mean_intensity"))
        .orderBy(col("doc_id"), col("scene_id"))
    }),

    // AUDIO SILENCE SEGMENTATION — the VAD-shaped step of an audio
    // curation pipeline (x89/x90's scene machinery, on sound): the
    // REAL WAV decode yields 16-sample window energies (typed
    // partition-local work), a window is "quiet" iff its energy is
    // below its asset's mean — compared in exact integers
    // (abs_sum·n_windows < total, no division) — and consecutive
    // quiet windows merge into segments by gaps-and-islands. The
    // output is the silence map an audio pipeline cuts and trims by.
    "x110_audio_silence_segments" -> ((spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      assertAsciiCorpus(spark, sfDir)
      val w = Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
        .mapPartitions(_.flatMap(a =>
          AudioCodec.windowEnergies(a.doc_id, AudioCodec.encodeWav(a.blob), 16)))
        .toDF()
      val byAsset = Window.partitionBy(col("doc_id"))
      val byWi = Window.partitionBy(col("doc_id")).orderBy(col("wi"))
      w.withColumn("tw", sum(col("abs_sum")).over(byAsset))
        .withColumn("nw", count(lit(1)).over(byAsset))
        .filter(col("abs_sum") * col("nw") < col("tw"))
        .withColumn("ni",
          when(col("wi") - lag(col("wi"), 1).over(byWi) === 1, 0).otherwise(1))
        .withColumn("seg", sum(col("ni")).over(
          byWi.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("seg"))
        .agg(min(col("wi")).as("start_window"),
          count(lit(1)).as("n_windows"),
          sum(col("abs_sum")).as("quiet_energy"))
        .select(col("doc_id"), col("seg").as("segment_id"),
          col("start_window"), col("n_windows"), col("quiet_energy"))
        .orderBy(col("doc_id"), col("segment_id"))
    }),

    // PERCEPTUAL-HASH DEDUP — near-dup detection for IMAGES, the
    // multimodal sibling of x01/x91: each payload renders to a real
    // PNG, decodes through ImageIO, and hashes to the 64-bit aHash
    // (2×2 block means vs the global mean, exact integers); images
    // sharing a hash form a perceptual-dup cluster keyed by a
    // constant-width string — one hash-groupBy shuffle, image bytes
    // never shuffle. Non-vacuity: a brightness-shifted twin
    // (every byte +10, id +5·10⁶) re-encodes to a DIFFERENT PNG —
    // byte-exact dedup sees two files — but aHash is exactly
    // invariant under a global shift (block_sum·64 and total move by
    // the same 256·c), so every twin must collapse with its original.
    "x94_phash_dedup" -> ((spark, sfDir) => {
      import spark.implicits._
      assertAsciiCorpus(spark, sfDir)
      val assets = Lake.table(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[Asset]
      val twins = assets.mapPartitions(_.map(a =>
        Asset(a.doc_id + 5000000L, a.blob.map(b => ((b & 0xff) + 10).toByte))))
      assets.union(twins)
        .mapPartitions(_.map(a =>
          (a.doc_id, ImageCodec.aHashBits(ImageCodec.encodePng(a.blob)))))
        .toDF("doc_id", "ahash")
        .groupBy(col("ahash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_members"))
        .select(col("keep_id"), col("n_members"), col("ahash"))
        .orderBy(col("keep_id"))
    })
  )

  // x14: the PNG roundtrip is lossless and the text is single-byte
  // (ASCII) at every provisioned SF, so pixel p = byte[p mod n] is
  // reproducible in SQL as ord(substr(text, (p % n) + 1, 1)); the
  // decoded dims are the encode-side constants and the mean is the
  // exact sum/256. x17's structural sampling likewise reproduces from
  // octet lengths.
  val oracles: Map[String, String] = Map(
    // x23: resized pixel (x, y) samples source pixel (2x, 2y) = byte
    // index 32y + 2x (row-major, 16 wide) — reproducible in SQL the
    // same way as x14's full-image mean
    "x23_image_resize" ->
      ("WITH a AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "g AS (SELECT doc_id, text, n, (32*y.i + 2*x.i) AS p " +
        "FROM a, range(8) y(i), range(8) x(i)) " +
        "SELECT doc_id, CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h, " +
        "AVG(ord(substr(text, CAST(p % n AS INTEGER) + 1, 1))) AS mean_byte " +
        "FROM g GROUP BY doc_id ORDER BY doc_id"),
    "x14_multimodal_decode" ->
      ("WITH a AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "u AS (SELECT doc_id, text, n, unnest(range(256)) AS p FROM a) " +
        "SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, " +
        "AVG(ord(substr(text, CAST(p % n AS INTEGER) + 1, 1))) AS mean_byte " +
        "FROM u GROUP BY doc_id ORDER BY doc_id"),
    // x41: lossless PCM-in-WAV roundtrip — sample i reproduces from
    // the text bytes as (ord(c[2i+1]) - 109)*256 + ord(c[2i+2]);
    // n_samples = len DIV 2 (the corpus has no 0/1-char docs, which
    // the ascii/non-empty assert pins); zero crossings via LAG in
    // sample order; the mean is ONE exact-int division on both sides
    "x41_audio_features" ->
      ("WITH a AS (SELECT doc_id, text, length(text) // 2 AS ns FROM documents), " +
        "u AS (SELECT doc_id, unnest(range(ns)) AS i FROM a), " +
        "s AS (SELECT u.doc_id, a.ns, i, " +
        "(ord(substr(text, CAST(2*i+1 AS INTEGER), 1)) - 109) * 256 + " +
        "ord(substr(text, CAST(2*i+2 AS INTEGER), 1)) AS v " +
        "FROM u JOIN a USING (doc_id)), " +
        "z AS (SELECT doc_id, ns, v, CASE WHEN " +
        "LAG(v) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL AND " +
        "(v < 0) <> (LAG(v) OVER (PARTITION BY doc_id ORDER BY i) < 0) " +
        "THEN 1 ELSE 0 END AS zc FROM s) " +
        "SELECT doc_id, CAST(MIN(ns) AS INTEGER) AS n_samples, " +
        "CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum, " +
        "CAST(SUM(zc) AS INTEGER) AS zero_crossings, " +
        "CAST(SUM(ABS(v)) AS DOUBLE) / MIN(ns) AS mean_abs " +
        "FROM z GROUP BY doc_id ORDER BY doc_id"),
    "x17_frame_sample" ->
      ("WITH a AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents), " +
        "f AS (SELECT doc_id, n, LEAST(4, GREATEST(1, n // 256)) AS frames FROM a), " +
        "u AS (SELECT doc_id, n, frames, unnest(range(frames)) AS i FROM f) " +
        "SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, " +
        "CAST(i * (n // frames) AS INTEGER) AS frame_offset, " +
        "CAST(LEAST(256, n - i * (n // frames)) AS INTEGER) AS frame_len " +
        "FROM u ORDER BY doc_id, frame_idx"),
    // x89: frame sums reproduce from character ordinals (ASCII
    // contract asserted on the Spark side); the cut layer is the same
    // lag-window arithmetic
    "x89_scene_cuts" ->
      ("WITH a AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "f AS (SELECT doc_id, text, n, GREATEST(n // 64, 1) AS nf FROM a), " +
        "fr AS (SELECT doc_id, text, n, unnest(range(CAST(nf AS INTEGER))) AS i FROM f), " +
        "b AS (SELECT doc_id, CAST(i AS INTEGER) AS i, 64 * i AS fo, " +
        "CASE WHEN n < 64 THEN n ELSE 64 END AS flen, text FROM fr), " +
        "s AS (SELECT doc_id, i AS frame_idx, " +
        "CAST(SUM(ord(substr(text, CAST(fo + j.j + 1 AS INTEGER), 1))) AS BIGINT) AS frame_sum " +
        "FROM b, range(64) j(j) WHERE j.j < flen GROUP BY 1, 2), " +
        "d AS (SELECT doc_id, frame_idx, frame_sum, " +
        "LAG(frame_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev FROM s) " +
        "SELECT doc_id, frame_idx, frame_sum, " +
        "CASE WHEN prev IS NULL THEN false ELSE ABS(frame_sum - prev) > 300 END AS is_cut " +
        "FROM d ORDER BY doc_id, frame_idx"),
    // x90: x89's frame/cut arithmetic + the c53 gaps-and-islands
    // rollup; mean normalized per nominal 64-byte slot on both sides
    "x90_scene_segments" ->
      ("WITH a AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "f AS (SELECT doc_id, text, n, GREATEST(n // 64, 1) AS nf FROM a), " +
        "fr AS (SELECT doc_id, text, n, unnest(range(CAST(nf AS INTEGER))) AS i FROM f), " +
        "b AS (SELECT doc_id, CAST(i AS INTEGER) AS i, 64 * i AS fo, " +
        "CASE WHEN n < 64 THEN n ELSE 64 END AS flen, text FROM fr), " +
        "s AS (SELECT doc_id, i AS frame_idx, " +
        "CAST(SUM(ord(substr(text, CAST(fo + j.j + 1 AS INTEGER), 1))) AS BIGINT) AS frame_sum " +
        "FROM b, range(64) j(j) WHERE j.j < flen GROUP BY 1, 2), " +
        "d AS (SELECT doc_id, frame_idx, frame_sum, " +
        "LAG(frame_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev FROM s), " +
        "c AS (SELECT doc_id, frame_idx, frame_sum, " +
        "CASE WHEN prev IS NULL THEN 0 " +
        "WHEN ABS(frame_sum - prev) > 300 THEN 1 ELSE 0 END AS cut FROM d), " +
        "g AS (SELECT doc_id, frame_idx, frame_sum, " +
        "SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx " +
        "ROWS UNBOUNDED PRECEDING) AS scene_id FROM c) " +
        "SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id, " +
        "CAST(MIN(frame_idx) AS INTEGER) AS start_frame, " +
        "CAST(COUNT(*) AS BIGINT) AS n_frames, " +
        "ROUND(CAST(SUM(frame_sum) AS DOUBLE) / CAST(COUNT(*) * 64 AS DOUBLE), 4) " +
        "AS mean_intensity " +
        "FROM g GROUP BY doc_id, scene_id ORDER BY doc_id, scene_id"),
    // x110: x41's ordinal sample reconstruction windowed 16-wide
    // (i DIV 16), per-asset integer mean compare, the shared
    // gaps-and-islands rollup; CASTs pin HUGEINT sums
    "x110_audio_silence_segments" ->
      ("WITH a AS (SELECT doc_id, text, length(text) // 2 AS ns FROM documents), " +
        "u AS (SELECT doc_id, text, unnest(range(ns)) AS i FROM a), " +
        "s AS (SELECT doc_id, CAST(i // 16 AS INTEGER) AS wi, " +
        "ABS((ord(substr(text, CAST(2 * i + 1 AS INTEGER), 1)) - 109) * 256 + " +
        "ord(substr(text, CAST(2 * i + 2 AS INTEGER), 1))) AS av FROM u), " +
        "w AS (SELECT doc_id, wi, COUNT(*) AS n_samples, " +
        "CAST(SUM(av) AS BIGINT) AS abs_sum FROM s GROUP BY 1, 2), " +
        "t AS (SELECT doc_id, CAST(SUM(abs_sum) AS BIGINT) AS tw, " +
        "COUNT(*) AS nw FROM w GROUP BY 1), " +
        "q AS (SELECT w.doc_id, w.wi, w.abs_sum FROM w JOIN t USING (doc_id) " +
        "WHERE abs_sum * nw < tw), " +
        "m AS (SELECT *, CASE WHEN wi - LAG(wi) OVER (" +
        "PARTITION BY doc_id ORDER BY wi) = 1 THEN 0 ELSE 1 END AS ni FROM q), " +
        "g AS (SELECT *, SUM(ni) OVER (PARTITION BY doc_id ORDER BY wi) AS seg FROM m) " +
        "SELECT doc_id, CAST(seg AS BIGINT) AS segment_id, " +
        "CAST(MIN(wi) AS INTEGER) AS start_window, " +
        "CAST(COUNT(*) AS BIGINT) AS n_windows, " +
        "CAST(SUM(abs_sum) AS BIGINT) AS quiet_energy " +
        "FROM g GROUP BY doc_id, seg ORDER BY doc_id, segment_id"),
    // x94: pixel p = byte[p mod n] (+10 for the shifted twin), block
    // b = (p÷16÷2)·8 + (p mod 16)÷2 — the same (by,bx) bit order the
    // codec emits; exact-integer threshold block_sum·64 ≥ total
    "x94_phash_dedup" ->
      ("WITH d0 AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "u AS (SELECT doc_id, text, n, 0 AS shift FROM d0 " +
        "UNION ALL SELECT doc_id + 5000000, text, n, 10 FROM d0), " +
        "px AS (SELECT doc_id, CAST(p AS INTEGER) AS p, " +
        "ord(substr(text, CAST(p % n AS INTEGER) + 1, 1)) + shift AS v " +
        "FROM (SELECT doc_id, text, n, shift, unnest(range(256)) AS p FROM u)), " +
        "tot AS (SELECT doc_id, SUM(v) AS t FROM px GROUP BY 1), " +
        "blk AS (SELECT doc_id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS b, " +
        "SUM(v) AS bs FROM px GROUP BY 1, 2), " +
        "bits AS (SELECT blk.doc_id, b, " +
        "CASE WHEN bs * 64 >= t THEN '1' ELSE '0' END AS bit " +
        "FROM blk JOIN tot USING (doc_id)), " +
        "h AS (SELECT doc_id, string_agg(bit, '' ORDER BY b) AS ahash " +
        "FROM bits GROUP BY 1) " +
        "SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_members, " +
        "ahash FROM h GROUP BY ahash ORDER BY keep_id")
  )
}
