package graft

import org.apache.spark.sql.functions._

import graft.sources.{Lake, Layout}

/** Layout-maintenance evidence the oracle cannot see: compaction must
  * actually reduce file counts while preserving range-cluster
  * disjointness, and Z-order must actually narrow per-file stat spans
  * on BOTH dimensions (the property that makes footer-stat skipping
  * work on either predicate).
  */
class LayoutSpec extends SparkSpec {

  private def fileSpans(dir: String, c: String): Seq[(Long, Long)] =
    Layout.partFiles(dir).map(_.getPath).flatMap { f =>
      val df = spark.read.parquet(f)
      // timestamps in exact integer MICROS — cast("long") truncates to
      // seconds, so two distinct-micros events in one shared second
      // would alias and fail a strict disjointness check spuriously
      val v =
        if (df.schema(c).dataType ==
          org.apache.spark.sql.types.TimestampType) expr(s"unix_micros($c)")
        else col(c).cast("long")
      val r = df.agg(min(v), max(v)).collect()(0)
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else Some((r.getLong(0), r.getLong(1)))
    }

  test("compaction merges small files into size-targeted ts-disjoint files, losslessly") {
    val src = Layout.fragmentedEvents(spark, SfDir)
    val before = Layout.partFiles(src)
    assert(before.size >= 32, s"fragmented copy should be many small files, got ${before.size}")
    val target = "/tmp/graft-views/layoutspec_compacted"
    Layout.compact(spark, src, target, "ts", targetFileBytes = 4L * 1024 * 1024)
    val after = Layout.partFiles(target)
    assert(after.nonEmpty && after.size < before.size / 4,
      s"compaction left ${after.size} files from ${before.size}")
    // lossless: same rows
    assert(spark.read.parquet(target).count() == spark.read.parquet(src).count())
    // re-clustered: per-file ts ranges pairwise disjoint (naive
    // fragment concatenation would give every file the full span)
    val spans = fileSpans(target, "ts").sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        // >= not >: the range partitioner may legitimately split rows
        // sharing one exact timestamp across a file boundary
        assert(loB >= hiA, s"compacted files overlap on ts: $hiA > $loB")
      case _ =>
    }
    // the fragmented source is the degenerate contrast: every file
    // spans most of the table, so nothing is skippable. Assert the
    // MEAN coverage, not a count over a 0.9 cut: with ~15 random rows
    // per fragment the per-file span concentrates at (n-1)/(n+1)≈0.87,
    // so a per-file >0.9 test is a coin flip while the mean over 64
    // files is tightly ≈0.87
    val srcSpans = fileSpans(src, "ts")
    val (gLo, gHi) = (srcSpans.map(_._1).min, srcSpans.map(_._2).max)
    val meanCov = srcSpans.map { case (lo, hi) =>
      (hi - lo).toDouble / math.max(1L, gHi - gLo) }.sum / srcSpans.size
    assert(meanCov > 0.6,
      f"expected wide-span fragments in the source, mean coverage $meanCov%.2f")
  }

  test("zValue interleaves bits monotonically within each dimension slice") {
    import spark.implicits._
    val df = (for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Layout.zValue(col("x"), col("y"), 3).as("z")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // spot-check the Morton pattern: z(1,0)=1, z(0,1)=2, z(1,1)=3,
    // z(2,2)=12, z(7,7)=63
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L && got((2L, 2L)) == 12L && got((7L, 7L)) == 63L)
    // all 64 z-values distinct (bijection on the 8×8 grid)
    assert(got.values.toSet.size == 64)
  }

  test("bucketed stays in [0, 2^bits) and ordered on a near-full-range long domain (no overflow)") {
    import spark.implicits._
    val mn = Long.MinValue / 2
    val mx = Long.MaxValue / 2           // span ≈ Long.MaxValue: multiply path would overflow
    val vals = Seq(mn, mn / 2, -1L, 0L, 1L, mx / 2, mx)
    val got = vals.toDF("v")
      .select(Layout.bucketed(col("v"), mn, mx, 10).as("b"))
      .collect().map(_.getLong(0))
    assert(got.forall(b => b >= 0 && b < 1024), s"bucket out of range: ${got.toSeq}")
    assert(got.toSeq == got.sorted.toSeq, s"ordering broken: ${got.toSeq}")
    assert(got.distinct.length > 3, s"degenerate bucketing: ${got.toSeq}")
  }

  test("z-ordered copy narrows per-file user_id spans; the ts-sorted copy cannot") {
    val e = Lake.table(spark, SfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("us", expr("unix_micros(ts)"))
    // 16 files ⇒ the 4-bit z-prefix gives TWO bits of discrimination
    // per dimension (expected per-file coverage ≈ 0.25 each); 8 files
    // would leave user_id at a single bit, right at the 0.5 boundary
    val target = "/tmp/graft-views/layoutspec_zorder"
    Layout.zorderWrite(spark, e, "user_id", "us", target, nFiles = 16)
    assert(spark.read.parquet(target).count() == e.count(), "rewrite lost rows")
    val files = Layout.partFiles(target)
    assert(files.size > 2, s"need multiple files for span evidence, got ${files.size}")

    def coverage(spans: Seq[(Long, Long)]): Double = {
      val (gLo, gHi) = (spans.map(_._1).min, spans.map(_._2).max)
      spans.map { case (lo, hi) =>
        (hi - lo).toDouble / math.max(1L, gHi - gLo) }.sum / spans.size
    }
    // Z-order: BOTH dimensions' average per-file span is a fraction of
    // the domain — predicates on either column skip most files via
    // footer stats
    val zUser = coverage(fileSpans(target, "user_id"))
    val zTs = coverage(fileSpans(target, "us"))
    assert(zUser < 0.6, f"z-order user_id coverage $zUser%.2f — no skipping possible")
    assert(zTs < 0.6, f"z-order ts coverage $zTs%.2f — no skipping possible")
    // the 1-D contrast: the ts-range-clustered micros copy is perfect
    // on ts but blind on user_id (every file spans ~the full domain)
    val micros = Lake.ensureMicrosEvents(spark, SfDir)
    val sortedUser = coverage(fileSpans(micros, "user_id"))
    assert(sortedUser > 0.9,
      f"expected ~full user_id span per ts-sorted file, got $sortedUser%.2f")
    assert(zUser < sortedUser / 2,
      f"z-order should at least halve the user_id span: $zUser%.2f vs $sortedUser%.2f")
  }

  test("tableDiff classifies added/removed/changed, drops identical rows, treats NULL as a change (p06)") {
    import spark.implicits._
    val old = Seq((1L, Option(10L)), (2L, Option(20L)), (3L, Option(30L)),
      (4L, None: Option[Long])).toDF("k", "v")
    val neu = Seq((2L, Option(20L)), (3L, Option(31L)), (4L, Option(40L)),
      (5L, Option(50L))).toDF("k", "v")
    val got = Layout.tableDiff(old, neu, "k", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got == Map(
      1L -> (("removed", Some(10L), None)),
      3L -> (("changed", Some(30L), Some(31L))),
      4L -> (("changed", None, Some(40L))), // NULL -> value IS a change
      5L -> (("added", None, Some(50L)))
    ), s"got $got")
    // row 2 (identical) must not appear: the diff is the delta only
    assert(!got.contains(2L))
  }

  test("keyed delete rewrites only the victim's partitions, leaves the rest byte-identical (p11)") {
    import spark.implicits._
    val base = "/tmp/graft-test-keyed-delete"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // victim 7 lives in partitions a and b; partition c is untouched;
    // a NULL key shares partition a and must survive (null-safe)
    Seq((Option(7L), "a", "x1"), (Option(1L), "a", "x2"),
      (Option.empty[Long], "a", "x3"), (Option(7L), "b", "x4"),
      (Option(2L), "c", "x5"), (Option(3L), "c", "x6"))
      .toDF("user_id", "pt", "payload")
      .repartition(col("pt"))
      .write.partitionBy("pt").parquet(base)
    def files(pt: String) =
      Layout.partFiles(s"$base/pt=$pt")
        .map(f => (f.getName, f.length(), f.lastModified()))
    val cBefore = files("c")
    val affected = Layout.deleteKey(spark, base, "user_id", 7L, "pt")
    assert(affected == Seq("a", "b"), s"got $affected")
    assert(files("c") == cBefore, "untouched partition was rewritten")
    val rows = spark.read.parquet(base)
      .select("user_id", "pt", "payload").collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      (Some(1L), "a", "x2"), (None, "a", "x3"),
      (Some(2L), "c", "x5"), (Some(3L), "c", "x6")), s"got $rows")
  }

  test("snapshot retention deletes exactly the aged generations at directory grain (p10)") {
    import spark.implicits._
    val base = "/tmp/graft-test-snapshots"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    for (v <- 1 to 4)
      Seq.range(0, v * 10).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .coalesce(1).write.parquet(s"$base/v=$v")
    def files(v: Int) = Layout.partFiles(s"$base/v=$v").map(f => (f.getName, f.length()))
    val keptBefore = Map(3 -> files(3), 4 -> files(4))
    // keep > present is a no-op
    assert(Layout.retainSnapshots(base, keep = 9) == Seq.empty)
    // keep=2 removes exactly v1, v2 and reports them in order
    assert(Layout.retainSnapshots(base, keep = 2) == Seq(1, 2))
    assert(!new java.io.File(s"$base/v=1").exists())
    assert(!new java.io.File(s"$base/v=2").exists())
    // survivors are byte-identical — GC never touches live data
    assert(files(3) == keptBefore(3) && files(4) == keptBefore(4))
    // the partitioned read sees only the survivors
    val vs = spark.read.parquet(base).select("v").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(vs == Set(3, 4), s"got $vs")
  }

  test("write-audit-publish: passing snapshot swaps in atomically, failing audit cannot touch the published data (p13)") {
    import spark.implicits._
    import graft.sources.Layout
    val base = "/tmp/graft-views/wap_spec"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
    val audit = (staged: org.apache.spark.sql.DataFrame) =>
      staged.agg((count(lit(1)) > 0 &&
        sum(when(col("day").isNull, 1L).otherwise(0L)) === 0).as("ok"))
    // generation 1: healthy snapshot publishes
    val good = Seq(("2024-01-01", 10L), ("2024-01-02", 20L)).toDF("day", "n")
    assert(Layout.writeAuditPublish(spark, good, base, audit), "healthy must publish")
    val pub1 = spark.read.parquet(s"$base/published")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pub1 == Set(("2024-01-01", 10L), ("2024-01-02", 20L)))
    // generation 2: poisoned snapshot (null day) — audit must refuse,
    // and generation 1 must remain byte-visible to readers
    val bad = Seq((null: String, 99L)).toDF("day", "n")
    assert(!Layout.writeAuditPublish(spark, bad, base, audit), "poisoned must not publish")
    val pubAfter = spark.read.parquet(s"$base/published")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pubAfter == pub1, "failed audit must leave the published snapshot untouched")
    // the staging residue is cleaned up either way
    assert(!new java.io.File(s"$base/_staging").exists(), "staging must not linger")
    // generation 3: publish OVER a live snapshot with a stale
    // .retired_ leftover planted (a prior crashed swap) — the
    // retire-then-swap must clean the leftover, replace generation 1,
    // and leave no retired copy behind
    new java.io.File(s"$base/.retired_published").mkdirs()
    val next = Seq(("2024-01-03", 30L)).toDF("day", "n")
    assert(Layout.writeAuditPublish(spark, next, base, audit), "gen-3 must publish")
    val pub3 = spark.read.parquet(s"$base/published")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pub3 == Set(("2024-01-03", 30L)), s"got $pub3")
    assert(!new java.io.File(s"$base/.retired_published").exists(),
      "retired copy must be dropped after a clean swap")
  }

  test("partition audit conserves total mass and reads skew >= 1 (p15)") {
    val r = graft.sources.Layout.queries("p15_partition_audit")(spark, SfDir)
      .collect()(0)
    val total = graft.sources.Lake.table(spark, SfDir, "events").count()
    assert(r.getLong(1) == total, s"mass conservation: $r vs $total")
    assert(r.getLong(0) > 1L, s"multiple partitions expected: $r")
    assert(r.getLong(2) >= r.getLong(3), s"max >= min: $r")
    assert(r.getDouble(4) >= 1.0, s"skew ratio is bounded below by 1: $r")
  }

  test("time-travel read opens only the requested snapshot's files (p14)") {
    // run the registered query once to (re)build the generations
    val out = graft.sources.Layout.queries("p14_time_travel")(spark, SfDir)
    assert(out.count() > 0)
    val hash = Integer.toHexString(SfDir.hashCode)
    val base = s"/tmp/graft-views/timetravel_$hash"
    // the as-of filter must reach the scan as PARTITION PRUNING:
    // executed-plan file count for v=2 < the full-history count
    // (inputFiles would lie here — it reports the pre-pruning
    // relation, so the assert reads the FileSourceScan metrics)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val plan = df.queryExecution.executedPlan
      plan.execute().count()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other =>
          other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
      }
      scans(plan).map(_.metrics("numFiles").value).sum
    }
    val asOf = scannedFiles(spark.read.parquet(base).filter(col("v") === 2))
    val all = scannedFiles(spark.read.parquet(base))
    assert(asOf > 0 && asOf < all,
      s"as-of read must prune to one snapshot's files: $asOf vs $all")
    // and v=1 (a strict subset of v=2 by construction) differs
    val n1 = spark.read.parquet(base).filter(col("v") === 1).count()
    val n2 = spark.read.parquet(base).filter(col("v") === 2).count()
    assert(n1 < n2, "historical snapshots must actually differ")
  }
}
