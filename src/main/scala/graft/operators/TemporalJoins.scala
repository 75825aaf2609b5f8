package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no single built-in for — composed
  * from built-ins per the preference order (compose > custom plan):
  *
  *  - [[asofJoin]]: the union + ordered-window + last(ignoreNulls)
  *    carry-forward rewrite. One shuffle on the key, one sort within
  *    partitions — the classic scalable as-of; no range/theta join, no
  *    nested loop, so it survives arbitrarily large sides.
  *  - [[rangeSelfJoin]]: time-binned candidate generation — the probe
  *    side fans out to the (at most two) bins a match can live in and
  *    the join is an equi-join on the bin, so Catalyst plans a hash
  *    join instead of a nested-loop inequality join. Candidate volume
  *    scales with events-per-bin, never n².
  */
object TemporalJoins {

  /** Hard cap on the dense bin-domain cardinality (span/binSeconds + k)
    * the count decomposition may build: 8M rows of three longs is a
    * comfortably-broadcastable ~200 MB upper bound; anything larger
    * means `binSeconds` is mis-sized for the span (a 3-year span at
    * 30 s bins is ~3.2M — fine; a multi-decade span at 1 s bins is
    * billions and must fail loudly, not OOM opaquely).
    */
  val MaxDomainBins: Long = 8L * 1000 * 1000

  /** Internal column names each operator claims on its inputs. A
    * caller column with one of these names would be silently
    * overwritten by withColumn (corrupting output), so the operators
    * reject it up front. Part of the scaladoc contract alongside
    * idCol-uniqueness.
    */
  private def requireNoReserved(df: DataFrame, op: String,
      reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$op: input column(s) ${clash.mkString(", ")} collide with " +
        s"reserved internal names (${reserved.mkString(", ")}); " +
        "rename them before calling")
  }

  /** TRUE floor division as a SQL expression: SQL DIV truncates toward
    * zero, so for negative operands (pre-1970 micros, negative bin
    * numbers) the two "bins" around zero would merge into one
    * double-width bin — breaking the uniform-bin arithmetic both range
    * operators rest on. Subtracting pmod (always >= 0) makes the
    * numerator an exact multiple, so DIV is exact floor for any sign.
    */
  private def floorDiv(x: String, m: Long): Column =
    expr(s"(($x) - pmod($x, $m)) DIV $m")

  /** For each left row, attach the most recent right row with the same
    * key and rightTs <= leftTs (left-join semantics: nulls when no
    * prior right row).
    *
    * @param left      probe side
    * @param right     reference side (the "as-of" lookup)
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param carry     columns of `right` to carry onto matches,
    *                  emitted as `asof_<name>`
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    requireNoReserved(left, "asofJoin", Seq("_ts", "_side"))
    requireNoReserved(right, "asofJoin", Seq("_ts", "_side"))
    val passThrough = left.columns.filterNot(c => c == key || c == leftTs).toSeq
    // Tag and union: right rows sort BEFORE left rows at equal
    // timestamps so an exactly-simultaneous right row is visible to
    // the left row (ts <= semantics, matching SQL ASOF JOIN).
    val taggedRight = right.select(
      col(key) +: col(rightTs).as("_ts") +: lit(0).as("_side") +:
        (carry.map(c => col(c).as(s"asof_$c")) ++
          passThrough.map(c => lit(null).as(c))): _*)
    val taggedLeft = left.select(
      col(key) +: col(leftTs).as("_ts") +: lit(1).as("_side") +:
        (carry.map(c => lit(null).as(s"asof_$c")) ++
          passThrough.map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .select(col(key) +: col("_ts") +: col("_side") +:
        (passThrough.map(col) ++
          carry.map(c => last(col(s"asof_$c"), ignoreNulls = true).over(w)
            .as(s"asof_$c"))): _*)
    carried.filter(col("_side") === 1)
      .drop("_side")
      .withColumnRenamed("_ts", leftTs)
  }

  /** All pairs (a, b) of `df` rows with 0 < b.tsCol - a.tsCol <=
    * windowSeconds, generated via bin buckets: with bin width w, a
    * match's b-bin is within windowSeconds/w bins above a's bin, so
    * the probe side fans out to those k+1 bins and the join is an
    * equi-join on the bin.
    *
    * This ENUMERATES pairs, so its cost is inherently the output
    * volume: ≈ W·n²/T pairs at uniform density (n rows over span T).
    * Callers that only need pair COUNTS must use
    * [[rangeSuccessorCount]] instead, which never materializes the
    * quadratic pair set.
    *
    * Candidate volume at uniform density is ≈ (W + w)·n²/T (W = the
    * window, T = the time span): bins NARROWER than the window trade a
    * larger probe fan-out (k+1 rows per a-row — cheap, id-width) for
    * proportionally fewer false candidates in the verify filter (the
    * expensive part). w = W/4 cuts candidates ~37% vs w = W; below
    * ~W/8 the fan-out overhead wins. `binSeconds` must divide
    * `windowSeconds`.
    * Output: all `a.*` prefixed `a_`, all `b.*` prefixed `b_`.
    */
  def rangeSelfJoin(df: DataFrame, tsCol: String, windowSeconds: Long,
      binSeconds: Long = 0L): DataFrame =
    rangeJoin(df, df, tsCol, tsCol, windowSeconds, binSeconds)

  /** Two-relation form (the general interval join, cf. Flink's
    * interval join / the streaming s06 shape in batch): all pairs
    * (x ∈ left, y ∈ right) with 0 < y.rightTs - x.leftTs <=
    * windowSeconds. Same bin-bucket candidate generation — the left
    * side fans out to the k+1 bins a match can live in, the join is
    * an equi-join on the bin, candidate volume ≈ (W+w)·|L|·|R|/T.
    * Output: all `left.*` prefixed `a_`, all `right.*` prefixed `b_`.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, windowSeconds: Long,
      binSeconds: Long = 0L): DataFrame = {
    requireNoReserved(left, "rangeJoin", Seq("_bin", "_probe"))
    requireNoReserved(right, "rangeJoin", Seq("_bin", "_probe"))
    val w = if (binSeconds > 0) binSeconds else windowSeconds
    require(windowSeconds > 0 && windowSeconds % w == 0,
      s"binSeconds $w must divide windowSeconds $windowSeconds (both > 0)")
    val k = (windowSeconds / w).toInt
    val binMicros = w * 1000000L
    // floorDiv keeps bins uniform across the 1970 epoch — truncation
    // would still be correct for enumeration (the probe range covers
    // the merged bin) but with avoidable false candidates
    val a = left
      .withColumn("_bin", floorDiv(s"unix_micros($leftTs)", binMicros))
      .select(
        (left.columns.map(c => col(c).as(s"a_$c")) :+ col("_bin")): _*)
      .withColumn("_probe",
        explode(sequence(col("_bin"), col("_bin") + k)))
      .drop("_bin")
    val b = right
      .withColumn("_bin", floorDiv(s"unix_micros($rightTs)", binMicros))
      .select(
        (right.columns.map(c => col(c).as(s"b_$c")) :+
          col("_bin").as("_probe")): _*)
    a.join(b, "_probe")
      .filter(col(s"b_$rightTs") > col(s"a_$leftTs") &&
        col(s"b_$rightTs") <= col(s"a_$leftTs") + expr(s"INTERVAL $windowSeconds SECOND"))
      .drop("_probe")
  }

  /** For each row, the COUNT of rows within its forward window —
    * |{b : 0 < b.ts - a.ts <= windowSeconds}| — WITHOUT enumerating
    * the pairs. Output: all of `df`'s columns plus `n_within` (Long).
    *
    * Decomposition: with bin width w = binSeconds and k = W/w, a row
    * at time t in bin i has its window (t, t+W] spanning
    *
    *   - bin i partially (b.ts > t),
    *   - bins i+1 .. i+k-1 FULLY (every row in them matches),
    *   - bin i+k partially (b.ts <= t+W).
    *
    * The full middle bins need no join at all: their total is
    * cum(i+k-1) - cum(i) against a cumulative per-bin count table of
    * O(span/w) rows — broadcast-bounded BY CONTRACT, which is what
    * makes its single-partition running-sum window safe (the one
    * place a global window is correct; an unbounded scan would use
    * [[graft.operators.Prefix.runningSum]]). Only the two partial
    * edge bins need a real self-join, and that candidate volume is
    * ≈ 2·w·n²/T — shrinking w cuts it linearly, vs
    * [[rangeSelfJoin]]'s irreducible W·n²/T output. At 10× density
    * this is the difference between ~100× more pair rows and ~100×
    * more *narrow edge candidates on a 10× smaller w*.
    *
    * The dense bin domain extends to hi+k with zero counts (cum stays
    * flat), so the high-bin lookup never needs clamping. Empty bins
    * inside the span are densified for the same reason.
    *
    * Requirements: `idCol` values are unique (the per-row counts are
    * re-joined on it); input columns must not use the reserved
    * internal names (enforced); pick `binSeconds` so span/binSeconds
    * stays broadcast-friendly (a 3-year span at 30 s bins is ~3.2M
    * rows of two longs — fine) and so w·n/T rows per bin keeps the
    * edge join small. The broadcast contract is ENFORCED: a dense
    * domain over [[MaxDomainBins]] bins fails at execution time with
    * a message pointing at `binSeconds`, before any densify work.
    */
  def rangeSuccessorCount(df: DataFrame, idCol: String, tsCol: String,
      windowSeconds: Long, binSeconds: Long): DataFrame =
    rangeCountImpl(df, df, idCol, tsCol, tsCol, windowSeconds, binSeconds,
      sameRelation = true)

  /** Two-relation form: for each `left` row, the COUNT of `right`
    * rows within its forward window — the unbounded-scale companion
    * of [[rangeJoin]] exactly as the single-relation overload is to
    * [[rangeSelfJoin]]. Same decomposition; the per-bin count table
    * is built from `right`, and the dense domain spans BOTH
    * relations' bin ranges (a left row binned before the first or
    * after the last right row must still find its cum entries — with
    * a right-only domain the prefix lookup would go NULL and silently
    * undercount). Output: all of `left`'s columns plus `n_within`.
    */
  def rangeSuccessorCount(left: DataFrame, right: DataFrame,
      idCol: String, leftTs: String, rightTs: String,
      windowSeconds: Long, binSeconds: Long): DataFrame =
    rangeCountImpl(left, right, idCol, leftTs, rightTs,
      windowSeconds, binSeconds, sameRelation = false)

  private def rangeCountImpl(left: DataFrame, right: DataFrame,
      idCol: String, leftTs: String, rightTs: String,
      windowSeconds: Long, binSeconds: Long,
      sameRelation: Boolean): DataFrame = {
    require(windowSeconds > 0,
      s"windowSeconds must be positive, got $windowSeconds (k = 0 would " +
        "turn the lead(k-1) high lookup into a lag and produce negative counts)")
    require(binSeconds > 0 && windowSeconds % binSeconds == 0,
      s"binSeconds $binSeconds must divide windowSeconds $windowSeconds")
    requireNoReserved(left, "rangeSuccessorCount", Seq(
      "_bin", "_us", "_cum_lo", "_cum_hi", "_a_id", "_n_edge", "n_within"))
    requireNoReserved(right, "rangeSuccessorCount", Seq("_bin", "_us"))
    val k = (windowSeconds / binSeconds).toInt
    val binMicros = binSeconds * 1000000L
    val winMicros = windowSeconds * 1000000L

    val withBin = left
      .withColumn("_us", expr(s"unix_micros($leftTs)"))
      .withColumn("_bin", floorDiv(s"unix_micros($leftTs)", binMicros))
    val rightBin = right
      .withColumn("_us", expr(s"unix_micros($rightTs)"))
      .withColumn("_bin", floorDiv(s"unix_micros($rightTs)", binMicros))
    // one n-sized reduce (map-side partial) — everything downstream of
    // it is span-bounded, not data-bounded
    val binCounts = rightBin.groupBy(col("_bin")).agg(count(lit(1)).as("_cnt"))

    // Dense domain [lo, hi+k] over BOTH relations' bins: zero-count
    // rows for empty bins so every lookup hits, and k trailing zero
    // bins so the lead(k-1) below never runs off the end for a real
    // left bin. Chunked double-explode bounds any one generated array
    // at CHUNK elements regardless of span. The 1-row aggregate input
    // keeps this whole chain — densify, broadcast-join the counts,
    // running sum, lead — in a single task over span/w rows, which
    // the broadcast contract already bounds.
    val CHUNK = 4096L
    val ord = Window.orderBy(col("_bin"))
    // chunk indices need the same floorDiv as the bins: DIV would
    // round negative _lo UP, skip the negative chunks, and leave
    // pre-1970 bins out of the dense domain entirely
    // Extent from the span-bounded binCounts table, NOT a re-scan of
    // the raw relations; the left relation contributes its own 1-row
    // min/max aggregate only when it is a different relation (the
    // diagonal/self case is fully covered by binCounts).
    val rightExtent = binCounts
      .agg(min(col("_bin")).as("_lo"), max(col("_bin")).as("_hi"))
    val extent =
      if (sameRelation) rightExtent
      else rightExtent
        .unionByName(withBin
          .agg(min(col("_bin")).as("_lo"), max(col("_bin")).as("_hi")))
        .agg(min(col("_lo")).as("_lo"), max(col("_hi")).as("_hi"))
    // Enforce the broadcast contract ON the 1-row extent, inside the
    // plan: assert_true in a filter (not an unused projected column,
    // which pruning would drop) evaluates once, before the densify
    // explode can generate a single row, and fails the job with an
    // actionable message instead of building a billions-row
    // "broadcast" table and dying opaquely. Same loud-contract style
    // as Prefix.runningSum's exchange-reuse guard.
    val domainBins = col("_hi") + k - col("_lo") + 1
    // An EMPTY right relation has no bins: _lo/_hi are NULL, domainBins
    // is NULL, and assert_true(NULL) raises its (misleading) broadcast
    // message. Drop the null extent instead — the cum table comes out
    // empty and every left row keeps n_within = 0 through the LEFT
    // join + coalesce below, which is the documented contract.
    val checkedExtent = extent.filter(col("_lo").isNotNull).filter(assert_true(
      domainBins <= MaxDomainBins,
      format_string(
        "rangeSuccessorCount: dense bin domain of %d bins (span/binSeconds + k) " +
          s"exceeds the broadcast bound $MaxDomainBins; increase binSeconds " +
          s"(currently $binSeconds s) so the span divides into fewer bins",
        domainBins)).isNull)
    val cumPair = checkedExtent
      .select(col("_lo"), (col("_hi") + k).as("_hi"))
      .select(col("_lo"), col("_hi"),
        explode(sequence(floorDiv("_lo", CHUNK), floorDiv("_hi", CHUNK))).as("_c"))
      .select(col("_lo"), col("_hi"),
        explode(sequence(
          greatest(col("_lo"), col("_c") * CHUNK),
          least(col("_hi"), col("_c") * CHUNK + (CHUNK - 1)))).as("_bin"))
      .join(broadcast(binCounts), Seq("_bin"), "left")
      .withColumn("_cum_lo", sum(coalesce(col("_cnt"), lit(0L)))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_cum_hi", lead(col("_cum_lo"), k - 1).over(ord))
      .select(col("_bin"), col("_cum_lo"), col("_cum_hi"))

    // Partial edge bins i and i+k: one equi-join on the probe bin.
    // Same-bin rows satisfy b.ts <= t+W structurally and far-bin rows
    // satisfy b.ts > t structurally, so one symmetric predicate serves
    // both probes.
    val aProbe = withBin.select(col(idCol).as("_a_id"), col("_us").as("_a_us"),
      explode(array(col("_bin"), col("_bin") + k)).as("_pb"))
    val bSide = rightBin.select(col("_us").as("_b_us"), col("_bin").as("_pb"))
    val edgeCounts = aProbe.join(bSide, "_pb")
      .filter(col("_b_us") > col("_a_us") &&
        col("_b_us") <= col("_a_us") + winMicros)
      .groupBy(col("_a_id")).agg(count(lit(1)).as("_n_edge"))

    // Middle bins i+1..i+k-1 = cum(i+k-1) - cum(i): one broadcast
    // lookup per row, zero fan-out (k=1 degenerates to 0 via
    // lead(..., 0) — no middle bins exist). The payload rides along,
    // so no re-join with `df`. LEFT join + coalesced difference: a
    // NULL-ts row has a NULL bin that matches nothing, and the output
    // contract is "all of df's rows plus n_within" — such a row keeps
    // n_within = 0 (it has no window; it also never matches any
    // predicate as a successor) instead of silently vanishing.
    withBin
      .join(broadcast(cumPair), Seq("_bin"), "left")
      .join(edgeCounts, col(idCol) === col("_a_id"), "left")
      .withColumn("n_within",
        coalesce(col("_cum_hi") - col("_cum_lo"), lit(0L)) +
          coalesce(col("_n_edge"), lit(0L)))
      .drop("_bin", "_us", "_cum_lo", "_cum_hi", "_a_id", "_n_edge")
  }
}
