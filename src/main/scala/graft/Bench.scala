package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Benchmark harness — the reference's protocol (SURVEY §2.A A13/A14,
  * benchmark.py:34-124): n=3 repetitions per query, mean/std/median, a
  * pruned-partition-scan vs full-scan contrast (the repo's namesake
  * comparison, README.md:164-174), and a cross-mode probe-key equality
  * assert before any timing is trusted.
  *
  * Measurement-trust rules (hard-learned from the r6/r7 artifacts):
  *   - Every derived headline ratio (pruned_vs_full, scaling
  *     time_ratio) is computed from MEDIANS. A single loaded-machine
  *     rep moves a 3-rep mean by a third of the spike but the median
  *     not at all — BENCH_r07 printed a fake flagship 4.64× scaling
  *     from one contaminated mean that its own medians refuted. Means
  *     and stds stay in the raw dump for contention diagnosis.
  *   - A rep that throws is EXCLUDED from the timing stats and the
  *     query is flagged in a top-level "errors" object. Averaging a
  *     near-zero failed-rep wall time silently converts a broken
  *     query into a fast one.
  *   - Both sides of the scaling contrast run the same protocol: a
  *     global prewarm pass over the query set at that sf dir, then
  *     timed reps with no per-query warm rep. Mixing a
  *     globally-prewarmed big side with a per-query-warmed small side
  *     compares two different measurement protocols.
  *
  * Prints exactly ONE JSON line to stdout and writes the identical
  * line to /tmp/graft-bench.json (sbt log capture truncates long
  * lines behind [info] noise; the file is the machine-readable copy).
  */
object Bench {

  /** Per-query timing result. `err` carries the first failure message
    * when any rep (or the prewarm) threw; stats are over the
    * successful reps only. A query whose every rep failed has
    * okReps == 0 and zeroed stats — callers must treat it as broken,
    * never as fast.
    */
  final case class QueryStats(name: String, mean: Double, std: Double,
      median: Double, okReps: Int, err: Option[String])

  /** Bound a captured error message: newlines flattened (the artifact
    * is one line) and truncated to 200 chars of RAW text. No JSON
    * escaping here — `QueryStats.err` stores the raw message and
    * [[jsonEscape]] escapes exactly once at emission time. The old
    * scheme escaped in both places AND truncated after escaping, so the
    * cut could split a two-char escape pair and leave a lone trailing
    * backslash that ate the JSON closing quote — the exact
    * 'parsed: null' failure the artifact file exists to prevent.
    */
  private def clip(msg: String): String =
    Option(msg).getOrElse("null")
      .replace("\n", " ").replace("\r", " ").take(200)

  /** The single JSON-escape point for error text. */
  private def jsonEscape(s: String): String =
    clip(s).replace("\\", "\\\\").replace("\"", "\\\"")

  /** Time `run` for `reps` repetitions, excluding failed reps from the
    * stats and capturing the first error. Public and Spark-free so the
    * failure contract is unit-testable with a deliberately-throwing
    * thunk (BenchSpec).
    */
  def measure(name: String, reps: Int)(run: () => Unit): QueryStats = {
    val results = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val err =
        try { run(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name: ${e.getMessage}")
          Some(s"${e.getClass.getSimpleName}: ${clip(e.getMessage)}")
        }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val ok = results.collect { case (t, None) => t }
    val firstErr = results.flatMap(_._2).headOption
    if (ok.isEmpty)
      QueryStats(name, 0.0, 0.0, 0.0, 0, firstErr.orElse(Some("all reps failed")))
    else {
      val mean = ok.sum / ok.size
      val std = math.sqrt(ok.map(t => (t - mean) * (t - mean)).sum / ok.size)
      val sorted = ok.sorted
      val median =
        if (ok.size % 2 == 1) sorted(ok.size / 2)
        else (sorted(ok.size / 2 - 1) + sorted(ok.size / 2)) / 2
      QueryStats(name, mean, std, median, ok.size, firstErr)
    }
  }

  /** JSON object mapping each failed query to its first error — empty
    * when everything ran clean. Split out so BenchSpec can pin the
    * "a broken query surfaces in the artifact" contract.
    */
  def errorsJson(stats: Seq[QueryStats]): String =
    stats.collect { case QueryStats(n, _, _, _, _, Some(e)) =>
      s""""$n":"${jsonEscape(e)}""""
    }.mkString("{", ",", "}")

  /** Files actually read by the plan's parquet scans, counted AFTER
    * partition pruning. `DataFrame.inputFiles` resolves the listing
    * before pruning (it reports the full table), so the real evidence
    * is the executed plan's `numFiles` metric, populated when the scan
    * runs. AQE wraps the plan in AdaptiveSparkPlanExec; unwrap to reach
    * the final physical scans.
    */
  def scanFileCount(df: DataFrame): Long = {
    // Execute THIS plan instance (df.count() would build and run a
    // separate QueryExecution whose metrics we couldn't read back).
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec    => Seq(s)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    scans(plan).map(_.metrics("numFiles").value).sum
  }

  /** Headline set: engine flagship, the pruned/full contrast pair, a
    * large join, a wide aggregate, a window, the temporal joins, the
    * iterative components operator, a streaming ingest, and the
    * LLM-pipeline representatives.
    *
    * Label note: p01 is an end-to-end ELT pipeline and s07 a streaming
    * ingest — each rep times write + re-read by design, not a read-only
    * query. x03/x18 reps read their lake-checkpointed artifacts (built
    * on the untimed prewarm pass) — the amortized repeat-invocation
    * path a warm engine serves.
    */
  private val headline = Seq(
    "flagship", "b02_glob_scan", "b03_pruned_scan", "b09_partial_final",
    "c02_join_large", "c07_agg_tpch_q1", "c12_window_rownum",
    "c31_asof_join", "c32_range_join", "c50_range_pairs",
    "c44_bucketed_join", "p01_pipeline_topk", "s07_stream_ingest_partitioned",
    "x03_dedup_minhash", "x07_cosine_topk", "x10_text_stats",
    "x12_token_count", "x14_multimodal_decode", "x15_tfidf",
    "x18_dedup_components", "x19_curation",
    "x25_contamination_screen", "x27_sequence_pack", "x31_passage_dedup",
    "x32_bloom_contamination", "x33_incremental_dedup",
    "x37_training_shuffle", "x39_embed_centroids",
    "x40_quality_survivor", "x43_source_overlap", "x45_snm_neardup",
    "x46_bigram_logprob", "x50_novelty", "x51_quality_tiles",
    "x52_vocab_coverage")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize the partitioned copy once so rep 1 of the pruned/full
    // pair times the query, not the one-off write (benchmark.py times
    // queries against a pre-built layout too).
    Lake.ensurePartitionedEvents(spark, sfDir)

    // A13 probe: the pruned-path count and the full-scan count of one
    // probe key must agree across modes (benchmark.py:41,:116). Also
    // serves as the session warm-up (codegen/JIT, file listing) so the
    // timed reps measure queries, not first-query initialization — the
    // reference benchmarks a warm Lambda the same way.
    val probeKey = "signup"
    val viaFull = Lake.table(spark, sfDir, "events")
      .filter(col("event_type") === probeKey).count()
    val viaPartitioned = Lake.partitionedEvents(spark, sfDir)
      .filter(col("event_type") === probeKey).count()
    val probeOk = viaFull == viaPartitioned && viaFull > 0

    // Structural pruning evidence, independent of wall-clock: the file
    // count a pruned scan touches vs the full glob (README.md:164-174
    // contrast; at 100 TB this ratio, not latency on 100k rows, is
    // what pruning buys).
    val fullFiles = scanFileCount(
      Lake.partitionedEvents(spark, sfDir).select(col("event_id")))
    val prunedFiles = scanFileCount(
      Lake.partitionedEvents(spark, sfDir)
        .filter(col("date") === lit("2024-01-05"))
        .select(col("event_id")))

    // One protocol for every timed number: global prewarm over the
    // query set at that dir (plan codegen, JIT, file listing,
    // lake-artifact builds — observed: the flagship timed first in a
    // fresh JVM records ~2× its steady state), then timed reps with no
    // per-query warm rep. The reference's published numbers are
    // warm-Lambda runs (its cold/warm flag exists to tell them apart).
    def prewarm(queryNames: Seq[String], dir: String): Unit =
      queryNames.foreach { n =>
        try SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $n prewarm@$dir: ${e.getMessage}") }
      }
    def timeQuery(name: String, dir: String): QueryStats =
      measure(name, reps)(() => { SparkEntry.queries(name)(spark, dir).count(); () })

    val names = headline.filter(SparkEntry.queries.contains)
    prewarm(names, sfDir)
    // x31 warm-path evidence for the headline point (VERDICT r8 #1):
    // the prewarm pass must have left the passage checkpoint built, so
    // the timed reps below measure checkpoint reads, not rebuilds.
    val headlineX31Warm =
      try Lake.isBuilt(spark, sfDir, "x31_passages")
      catch { case _: Throwable => false }
    val stats = names.map(timeQuery(_, sfDir))

    def fmt(d: Double) = f"$d%.4f"
    val usable = stats.filter(_.okReps > 0)
    val means = usable.map(s => s""""${s.name}":${fmt(s.mean)}""").mkString("{", ",", "}")
    val stds = usable.map(s => s""""${s.name}":${fmt(s.std)}""").mkString("{", ",", "}")
    val medians = usable.map(s => s""""${s.name}":${fmt(s.median)}""").mkString("{", ",", "}")
    val errors = errorsJson(stats)
    val total = usable.map(_.mean).sum
    // Median-based: one spiked rep must not move the artifact's
    // headline pruning ratio (see object scaladoc).
    val prunedVsFull = (for {
      full <- usable.find(_.name == "b02_glob_scan")
      pruned <- usable.find(_.name == "b03_pruned_scan")
      if pruned.median > 0
    } yield full.median / pruned.median).getOrElse(0.0)

    // Scaling-curve evidence: the same queries at THREE scale factors
    // in ONE run — sf0.01 ("small"), the driver's sfDir ("mid", the
    // already-timed headline stats), and a derived ~10×-sfDir lake
    // ("big", Lake.ensureScaledDir — re-keyed unions, never touching
    // the read-only testdata). Two decades with the same sublinear
    // slope is the direct "would it survive 100×" evidence next to
    // the structural file-count metric, and the big point exercises
    // constants that hide at 600k rows. Per-query ratios at-or-below
    // the data ratio are the pass band; superlinear growth is a
    // shuffle/skew/driver-bottleneck smell. The set includes every
    // risk shape where superlinearity would first show: the range
    // join (quadratic candidate volume), streaming ingest, iterative
    // components, the passage/shingle joins (x31/x43/x50), and the
    // percentile/top-k corpus stats (x51/x52). All compared numbers
    // are medians; means ride along for the raw dump.
    val scalingNames = Seq(
      "flagship", "c02_join_large", "c32_range_join",
      "s07_stream_ingest_partitioned", "x03_dedup_minhash",
      "x07_cosine_topk", "x18_dedup_components", "x27_sequence_pack",
      "x31_passage_dedup", "x33_incremental_dedup",
      "x37_training_shuffle", "x40_quality_survivor",
      "x43_source_overlap", "x46_bigram_logprob", "x50_novelty",
      "x51_quality_tiles", "x52_vocab_coverage").filter(names.contains)
    def sfOf(dir: String): Double =
      "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.0)
    // x31's cross-round regression question (VERDICT r8 #1): record
    // whether its lake checkpoint was already built when the timed
    // reps started — the timed path must be the warm
    // read-the-checkpoint path, not a rebuild inside the reps.
    def x31Warm(dir: String): Boolean =
      try Lake.isBuilt(spark, dir, "x31_passages")
      catch { case _: Throwable => false }
    // One protocol per point: partitioned-events copy ensured, global
    // prewarm over the scaling set (builds every lake checkpoint
    // untimed), then timed reps. Identical to the headline protocol.
    def timePoint(dir: String): (Map[String, QueryStats], Boolean) = {
      Lake.ensurePartitionedEvents(spark, dir)
      prewarm(scalingNames, dir)
      val warm = x31Warm(dir)
      (scalingNames.map(n => n -> timeQuery(n, dir)).toMap, warm)
    }
    // Derive the comparison dir from the PARSED sf token (not a literal
    // string match on "sf0.1") so a run at any scale factor still
    // produces — or visibly skips — the scaling evidence.
    val smallDir = "sf[0-9.]+".r.replaceFirstIn(sfDir, "sf0.01")
    val bigFactor = sys.env.getOrElse("SPARK_GRAFT_SCALE_BIG", "10").toInt
    val scalingJson =
      if (smallDir != sfDir && new java.io.File(smallDir).isDirectory) {
        val (smallStats, smallWarm) = timePoint(smallDir)
        val midStats = stats.map(s => s.name -> s).toMap
        // big point: derived scaled lake; a build/run failure degrades
        // to a two-point curve with the reason in the artifact, never
        // a crashed bench.
        val (bigDirOpt, bigStats, bigWarm) =
          if (bigFactor <= 1) (None, Map.empty[String, QueryStats], false)
          else try {
            val d = Lake.ensureScaledDir(spark, sfDir, bigFactor)
            val (bs, bw) = timePoint(d)
            (Some(d), bs, bw)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] scaled lake: ${e.getMessage}")
            (Some(s"FAILED: ${clip(e.getMessage)}"), Map.empty[String, QueryStats], false)
          }
        def med(m: Map[String, QueryStats], n: String): Option[Double] =
          m.get(n).filter(s => s.okReps > 0 && s.median > 0).map(_.median)
        val entries = scalingNames.map { name =>
          (med(smallStats, name), med(midStats, name), med(bigStats, name)) match {
            case (Some(s), Some(m), b) =>
              val base = s""""small":${fmt(s)},"mid":${fmt(m)},"ratio_mid_over_small":${fmt(m / s)}"""
              val bigPart = b.map(t =>
                s""","big":${fmt(t)},"ratio_big_over_mid":${fmt(t / m)}""").getOrElse("")
              s""""$name":{$base$bigPart}"""
            case _ =>
              val why = Seq(smallStats.get(name), midStats.get(name), bigStats.get(name))
                .flatten.flatMap(_.err).headOption.getOrElse("unmeasured")
              s""""$name":{"err":"${jsonEscape(why)}"}"""
          }
        }.mkString("{", ",", "}")
        val dataRatioMid =
          if (sfOf(smallDir) > 0) sfOf(sfDir) / sfOf(smallDir) else 0.0
        val bigMeta = bigDirOpt.map(d =>
          s""","big_dir":"${jsonEscape(d)}","data_ratio_big_over_mid":$bigFactor""").getOrElse("")
        s""","scaling":{"data_ratio_mid_over_small":${fmt(dataRatioMid)},"small_sf":"$smallDir"$bigMeta,"x31_ckpt_warm":{"small":$smallWarm,"mid":$headlineX31Warm,"big":$bigWarm},"queries":$entries}"""
      } else {
        val why =
          if (sfOf(sfDir) == 0.0) s"no_sf_token_in:$sfDir"
          else if (smallDir == sfDir) "already_at_smallest_sf"
          else s"missing_small_dir:$smallDir"
        s""","scaling":{"skipped":"$why"}"""
      }

    // Serving-path latency (the reference's actual product surface is
    // the HTTP query endpoint, app.py:27-58): 100 sequential POSTs of
    // the flagship SQL against an in-process HttpFront on an ephemeral
    // loopback port, after 5 warm requests. p50/p99 are client-side
    // wall times over the full round trip (serialize → engine.execute
    // → JSON envelope), so the serving path has a tracked number like
    // every query does.
    val httpJson = try {
      val engine = new graft.engine.SparkEngine(() => spark)
      val server = graft.server.HttpFront.start(engine, spark, sfDir, port = 0)
      try {
        val port = server.getAddress.getPort
        val url = java.net.URI.create(s"http://127.0.0.1:$port/query").toURL
        val sqlEsc = graft.queries.Core.flagshipSql
          .replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", " ").replace("\r", " ")
        val body = s"""{"q":"$sqlEsc","limit":20}""".getBytes("UTF-8")
        def fire(): Double = {
          val t0 = System.nanoTime()
          val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
          c.setRequestMethod("POST"); c.setDoOutput(true)
          c.getOutputStream.write(body)
          val code = c.getResponseCode
          val resp = new String(c.getInputStream.readAllBytes(), "UTF-8")
          require(code == 200 && resp.contains("\"records\""),
            s"http $code: ${clip(resp)}")
          (System.nanoTime() - t0) / 1e9
        }
        (1 to 5).foreach(_ => fire())
        val times = (1 to 100).map(_ => fire()).sorted
        s""","http":{"n":100,"p50":${fmt(times(49))},"p99":${fmt(times(98))},"query":"flagship"}"""
      } finally server.stop(0)
    } catch { case e: Throwable =>
      s""","http":{"err":"${jsonEscape(String.valueOf(e.getMessage))}"}""" }

    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$means,"sf":"$sfDir","std":$stds,"median":$medians,"errors":$errors,"reps":$reps,"probe_ok":$probeOk,"pruned_vs_full":${fmt(prunedVsFull)},"full_scan_files":$fullFiles,"pruned_scan_files":$prunedFiles$httpJson$scalingJson}"""
    println(line)
    // Machine-readable copies: BENCH_r06..r08 all carried
    // "parsed": null because driver-side log capture truncated the
    // single long line — so the authoritative artifact is a FILE, and
    // it lives in the REPO (committed per round), not just /tmp,
    // which does not survive the round boundary.
    val outs = Seq(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/bench_latest.json"),
      "/tmp/graft-bench.json")
    outs.foreach { out =>
      try {
        val p = java.nio.file.Paths.get(out)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] file write $out: ${e.getMessage}") }
    }
    spark.stop()
  }
}
