package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.sources.Lake

/** SURVEY §2.C — the "arbitrary SQL" capability surface (reference
  * app.py:44-51: the engine accepts any SQL the dialect supports). One
  * named, oracle-checked query per category: joins (broadcast,
  * shuffle, left/semi/anti, multi-way), aggregations (multi-metric,
  * DISTINCT, ROLLUP, HAVING, approx), window functions (row_number,
  * running, lag), set ops, scalar-function batteries (string, date,
  * conditional, predicate, JSON, math), subqueries, CTEs, UDF/UDAF,
  * and a generator (explode).
  *
  * Determinism rules per SURVEY §7.4: total ORDER BY with unique
  * tiebreakers; double aggregates ROUNDed identically on both sides;
  * BIGINT casts where DuckDB would widen to HUGEINT; explicit NULLS
  * FIRST where grouping nulls reach an ORDER BY.
  */
object Surface {

  private type Q = (SparkSession, String) => DataFrame

  private def t(spark: SparkSession, sfDir: String, name: String) =
    Lake.table(spark, sfDir, name)

  private def sql(q: String): Q = (spark, sfDir) => {
    Lake.registerAll(spark, sfDir)
    spark.sql(q)
  }

  /** The (stratum, arm, conv) per-user experiment frame c86 and c88
    * share: strata = activity quartile (x51's discrete-percentile
    * convention) × dominant event type (max(struct) plurality,
    * type-desc tiebreak); c80's arm hash and conversion rule
    * verbatim, so every causal estimator reads the same experiment.
    */
  private def cemUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val perUser = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
    val cuts = broadcast(perUser.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_ev)").as("q1"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_ev)").as("q2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY n_ev)").as("q3")))
    val dom = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("cnt"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("dom_type"))
    val conv = ev.filter(col("event_type") === "purchase" &&
        col("value") >= 95.0)
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(1L))
    perUser.crossJoin(cuts)
      .withColumn("bucket", when(col("n_ev") <= col("q1"), 1)
        .when(col("n_ev") <= col("q2"), 2)
        .when(col("n_ev") <= col("q3"), 3).otherwise(4))
      .join(dom, "user_id")
      .join(conv, Seq("user_id"), "left")
      .select(
        concat(col("bucket").cast("string"), lit("|"), col("dom_type"))
          .as("stratum"),
        when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
          Sampling.HashMod / 2, "A").otherwise("B").as("arm"),
        coalesce(col("converted"), lit(0L)).as("conv"))
  }

  /** c88's estimation stage over the same (stratum, arm, conv) frame
    * — exposed so tests can plant designs where IPS and CEM differ.
    * Per-stratum term = n_s·(convT·nC − convC·nT)/(nT·nC) on the
    * 10⁻⁶ grid (c86's D scaled by stratum size), ATE = Σ term_fp / N
    * with one division; positivity-violating strata pruned.
    */
  def ipsAte(users: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy(lit(1))
    users.groupBy(col("stratum"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0L))
          .as("conv_t"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0L))
          .as("conv_c"))
      .filter(col("n_treat") > 0L && col("n_ctrl") > 0L)
      .withColumn("n_s", col("n_treat") + col("n_ctrl"))
      .withColumn("term_fp",
        round((col("n_s") * (col("conv_t") * col("n_ctrl") -
          col("conv_c") * col("n_treat"))).cast("double") /
          (col("n_treat") * col("n_ctrl")).cast("double") *
          lit(1000000.0), 0).cast("long"))
      .withColumn("n_total", sum(col("n_s")).over(whole))
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        round(col("n_treat").cast("double") / col("n_s").cast("double"), 4)
          .as("propensity"),
        round(col("term_fp").cast("double") /
          (col("n_s").cast("double") * lit(1000000.0)), 4).as("effect"),
        round(sum(col("term_fp")).over(whole).cast("double") /
          (col("n_total").cast("double") * lit(1000000.0)), 4).as("ate"))
  }

  /** c92's affinity stage over a DISTINCT (user_id, event_type)
    * frame — the set table is exactly what the s31 streaming monitor
    * maintains by per-batch union-distinct (s13's set-semantics IVM
    * case), so batch and streamed readouts share this stage.
    */
  def typeAffinityFromPairs(ut: DataFrame): DataFrame = {
    val n1 = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(n1.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(n1.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"), 4)
          .as("jaccard"))
  }

  /** c86's matching/estimation stage over a (stratum, arm, conv)
    * per-user frame — exposed so tests can plant confounded
    * compositions (the whole point of CEM is that the within-stratum
    * estimate differs from raw lift under confounding). Off-support
    * strata pruned, per-stratum effect on the 10⁻⁶ grid, ATT = the
    * exact-integer treated-weighted sum with one division at 4 dp.
    */
  def cemAtt(users: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whole = Window.partitionBy(lit(1))
    users.groupBy(col("stratum"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0L))
          .as("conv_t"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0L))
          .as("conv_c"))
      .filter(col("n_treat") > 0L && col("n_ctrl") > 0L)
      .withColumn("effect_fp",
        round((col("conv_t") * col("n_ctrl") -
          col("conv_c") * col("n_treat")).cast("double") /
          (col("n_treat") * col("n_ctrl")).cast("double") *
          lit(1000000.0), 0).cast("long"))
      .withColumn("nt_total", sum(col("n_treat")).over(whole))
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        col("conv_t"), col("conv_c"),
        round(col("effect_fp").cast("double") / lit(1000000.0), 4)
          .as("effect"),
        round(sum(col("n_treat") * col("effect_fp")).over(whole)
          .cast("double") /
          (col("nt_total").cast("double") * lit(1000000.0)), 4).as("att"))
  }

  /** c87's Shapley multi-touch attribution over an (user_id, ts,
    * event_id, event_type) frame — exposed so tests can plant touch
    * paths with closed-form splits. Characteristic function: each
    * purchase is the unanimity game over its set of DISTINCT prior
    * channels, so the Shapley value credits each touched channel
    * exactly 1/|set| per purchase (the sum-of-unanimity-games
    * identity — this IS Shapley, not an ad-hoc "linear" rule);
    * no-prior purchases credit `direct`. Credits land on a 10⁻⁶
    * floor grid (10⁶ DIV k — x69's leak-only-loses-mass DIV
    * discipline). One user-shuffle window pass (c78's shape) builds
    * the per-purchase distinct-channel set; everything after is
    * channel-grain.
    */
  def shapleyAttribution(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val purchases = ev
      .withColumn("chs", collect_set(
        when(col("event_type") =!= "purchase", col("event_type"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("chs"), size(col("chs")).as("k"))
    val credits = purchases
      .select(
        explode(when(col("k") > 0, col("chs"))
          .otherwise(array(lit("direct")))).as("channel"),
        when(col("k") > 0, expr("1000000 DIV k"))
          .otherwise(lit(1000000L)).as("credit_fp"))
    val byCh = credits.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("credit_fp")).as("credit_fp"))
    val tot = broadcast(byCh.agg(sum(col("credit_fp")).as("tot")))
    byCh.crossJoin(tot)
      .select(col("channel"), col("n_purchases"),
        round(col("credit_fp").cast("double") / lit(1000000.0), 4)
          .as("credit"),
        round(col("credit_fp").cast("double") / col("tot").cast("double"), 4)
          .as("share"))
  }

  /** c74's retention triangle over an explicit (user_id, wk) frame —
    * exposed so tests can plant churn patterns the dense provisioned
    * corpus doesn't exhibit.
    */
  def retentionTriangle(ev: DataFrame): DataFrame = {
    val active = ev.distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("wk")).as("c0"))
    val sizes = cohort.groupBy(col("c0")).agg(count(lit(1)).as("cohort_size"))
    active.join(cohort, "user_id")
      .groupBy(col("c0"), (col("wk") - col("c0")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "c0")
      .select(col("c0").as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        round(lit(100.0) * col("n_active").cast("double") /
          col("cohort_size"), 4).as("retention_pct"))
  }

  /** c84's Kaplan–Meier product-limit estimator over a generic
    * subject frame (t_day, died): died=true is an observed event at
    * t, died=false a right-censored subject (left the risk set at t
    * without the event). Estimator: S(t) = Π(1 − dᵢ/nᵢ) over event
    * times, computed as exp(Σ ln((nᵢ−dᵢ)/nᵢ)) with each per-time ln
    * term FLOORED onto a 10⁻⁹ fixed-point grid before the cumulative
    * integer window sum — float running products/sums are
    * association-order-sensitive, integer sums are exact, and the
    * ≤ horizon·10⁻⁹ floor bias vanishes at the 4 dp readout. A time
    * where everyone at risk dies takes the −80·10⁹ sentinel
    * (e⁻⁸⁰ → 0.0000) instead of ln(0). Scale shape: the subject frame
    * is population-grain; all window work runs on the ≤ horizon-row
    * time frame with 1-row broadcast scalars (x106's bounded-frame
    * rule).
    */
  def kaplanMeier(subj: DataFrame): DataFrame = {
    val n = broadcast(subj.agg(count(lit(1)).as("n_subj")))
    val byT = subj.groupBy(col("t_day"))
      .agg(sum(when(col("died"), 1L).otherwise(0L)).as("d"),
        sum(when(col("died"), 0L).otherwise(1L)).as("c"))
    val prior = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(n)
      .withColumn("n_risk",
        col("n_subj") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
      .withColumn("term_fp",
        when(col("n_risk") > col("d"),
          floor(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")) * lit(1000000000.0)).cast("long"))
          .otherwise(lit(-80000000000L)))
      .withColumn("cum_fp", sum(col("term_fp")).over(cum))
      .filter(col("d") > 0)
      .select(col("t_day"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"),
        round(exp(col("cum_fp").cast("double") / lit(1000000000.0)), 4)
          .as("surv"))
  }

  /** c94's Nelson–Aalen estimator over the same (t_day, died) subject
    * frame as [[kaplanMeier]]: cumulative hazard H(t) = Σ_{tᵢ≤t}
    * dᵢ/nᵢ — the additive view of the same counting process (KM
    * multiplies survival factors; NA sums hazard increments, the
    * better-behaved estimate when per-time event counts are small,
    * and the natural input for hazard-rate comparisons). Same
    * fixed-point discipline: each dᵢ/nᵢ is an exact rational
    * regridded once to 10⁻⁹ (one double division per EVENT TIME), the
    * cumulative sum is BIGINT, and the Breslow survival readout
    * exp(−H) rides the frozen grid exactly like KM's exp-of-ln-sum.
    * Identical scale shape: one subject-grain groupBy, windows over
    * the ≤|distinct event times| frame.
    */
  def nelsonAalen(subj: DataFrame): DataFrame = {
    val n = broadcast(subj.agg(count(lit(1)).as("n_subj")))
    val byT = subj.groupBy(col("t_day"))
      .agg(sum(when(col("died"), 1L).otherwise(0L)).as("d"),
        sum(when(col("died"), 0L).otherwise(1L)).as("c"))
    val prior = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(n)
      .withColumn("n_risk",
        col("n_subj") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
      .withColumn("term_fp",
        round(col("d").cast("double") * lit(1000000000.0) /
          col("n_risk").cast("double"), 0).cast("long"))
      .withColumn("h_fp", sum(col("term_fp")).over(cum))
      .filter(col("d") > 0)
      .select(col("t_day"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"),
        round(col("h_fp").cast("double") / lit(1000000000.0), 6)
          .as("cum_hazard"),
        round(exp(-col("h_fp").cast("double") / lit(1000000000.0)), 4)
          .as("surv_breslow"))
  }

  /** Dense-grid extents for [[cIndexFromSubjects]] — frozen into both
    * engines' plans. t_day ∈ [0, 365] by construction (the event
    * fixture spans one calendar year, and t_day is a within-window
    * day difference); score ∈ [0, 63] by the caller's cap.
    */
  val CIndexDays = 366L
  val CIndexScoreSlots = 64L

  /** c98's Harrell c-index over a (t_day: long, died: boolean,
    * s: long) subject frame with s already on the [0,
    * [[CIndexScoreSlots]]) axis. Pair semantics (the standard
    * "permissible pairs"): (i, j) is comparable iff died_i and
    * t_i < t_j — strict, so a subject censored AT an event time is
    * (correctly) not claimed to have outlived it; concordant iff
    * s_i > s_j (higher score ⇒ earlier event), score ties ½.
    *
    * The quadratic pair set collapses onto a [[CIndexDays]]×
    * [[CIndexScoreSlots]] dense cell grid: with St(t,s) = Σ_{t'>t}
    * n_all(t',s) (suffix window over t within s), the later-time mass
    * splits by score relation via one prefix window over s within t
    * (A = Σ_{s'<s} St) and the per-t total (L = Σ_s' St), so
    * concordant = Σ n_died·A, tied = Σ n_died·St, discordant =
    * Σ n_died·(L − A − St) — three windows over the constant-size
    * grid, everything BIGINT until the one double division at 6 dp
    * (exact to n ≈ 4·10⁹ subjects; past that the pair counts move to
    * DECIMAL(38,0)). No comparable pairs ⇒ c_index = NULL.
    */
  def cIndexFromSubjects(subj: DataFrame): DataFrame = {
    val spark = subj.sparkSession
    val cells = subj.groupBy(col("t_day").as("t"), col("s"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("died"), 1L).otherwise(0L)).as("n_died"))
    val grid = spark.range(0, CIndexDays).select(col("id").as("t"))
      .crossJoin(spark.range(0, CIndexScoreSlots).select(col("id").as("s")))
      .join(cells, Seq("t", "s"), "left")
      .select(col("t"), col("s"),
        coalesce(col("n_all"), lit(0L)).as("n_all"),
        coalesce(col("n_died"), lit(0L)).as("n_died"))
    val laterInS = Window.partitionBy(col("s")).orderBy(col("t"))
      .rowsBetween(1, Window.unboundedFollowing)
    val lowerInT = Window.partitionBy(col("t")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allInT = Window.partitionBy(col("t"))
    grid
      .withColumn("st", coalesce(sum(col("n_all")).over(laterInS), lit(0L)))
      .withColumn("aw", coalesce(sum(col("st")).over(lowerInT), lit(0L)))
      .withColumn("lt", sum(col("st")).over(allInT))
      .agg(coalesce(sum(col("n_all")), lit(0L)).as("n_subjects"),
        coalesce(sum(col("n_died") * col("aw")), lit(0L)).as("n_conc"),
        coalesce(sum(col("n_died") *
          (col("lt") - col("aw") - col("st"))), lit(0L)).as("n_disc"),
        coalesce(sum(col("n_died") * col("st")), lit(0L)).as("n_tied"))
      .select(col("n_subjects"), col("n_conc"), col("n_disc"), col("n_tied"),
        when(col("n_conc") + col("n_disc") + col("n_tied") > 0,
          round((col("n_conc").cast("double") +
            lit(0.5) * col("n_tied").cast("double")) /
            (col("n_conc") + col("n_disc") + col("n_tied")).cast("double"), 6))
          .as("c_index"))
  }

  /** c95's 2×2 cell build over an explicit events frame: (grp, period,
    * n, Σcents) — one partial-aggregatable fact pass, and the ADDITIVE
    * sufficient statistic s33 merges per microbatch.
    */
  def didCellsOf(events: DataFrame): DataFrame =
    events
      .select(
        when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
          Sampling.HashMod / 2, "treat").otherwise("control").as("grp"),
        when(expr("datediff(to_date(ts), date'2024-01-01')") < 13,
          "pre").otherwise("post").as("period"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("grp"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  /** c95's readout over a prebuilt 2×2 cell frame — shared with s33,
    * which MAINTAINS the cells incrementally (count/sum adds per
    * microbatch) and reads the contrast out through this exact stage,
    * so streamed ≡ batch by construction. Each cell mean is one double
    * division; the DiD contrast is a fixed four-term expression over
    * those scalars; windows run over the 4-row frame.
    */
  /** The shared two-arm survival risk table under c97/c99: per pooled
    * event day, arm event counts (d_A, d_B), exact at-risk counts
    * from cumulative-prior windows over the bounded time spine,
    * nt/dt totals, and the arm sizes — everything a censoring-correct
    * two-arm comparison reads. One fact pass; every window runs at
    * the ≤|distinct event times| grain.
    */
  private def survivalRiskSpine(spark: SparkSession,
      sfDir: String): DataFrame = {
    val a = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
    val life = a.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("dl"))
    val conv = a
      .filter(col("event_type") === "purchase" && col("value") > 90)
      .groupBy(col("user_id")).agg(min(col("d")).as("dp"))
    val subj = life.join(conv, Seq("user_id"), "left")
      .select(
        when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
          Sampling.HashMod / 2, "A").otherwise("B").as("arm"),
        when(col("dp").isNotNull, col("dp") - col("d0"))
          .otherwise(col("dl") - col("d0")).as("t_day"),
        col("dp").isNotNull.as("died"))
    def byT(arm: String) = subj.filter(col("arm") === arm)
      .groupBy(col("t_day"))
      .agg(sum(when(col("died"), 1L).otherwise(0L)).as(s"d_$arm"),
        sum(when(col("died"), 0L).otherwise(1L)).as(s"c_$arm"))
    val nArm = broadcast(subj.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"))
      .groupBy().pivot("arm", Seq("A", "B")).agg(first(col("n")))
      .select(col("A").as("n_a0"), col("B").as("n_b0")))
    val prior = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byT("A").join(byT("B"), Seq("t_day"), "full_outer")
      .na.fill(0L, Seq("d_A", "c_A", "d_B", "c_B"))
      .crossJoin(nArm)
      .withColumn("risk_a", col("n_a0") -
        coalesce(sum(col("d_A") + col("c_A")).over(prior), lit(0L)))
      .withColumn("risk_b", col("n_b0") -
        coalesce(sum(col("d_B") + col("c_B")).over(prior), lit(0L)))
      .filter(col("d_A") + col("d_B") > 0)
      .withColumn("nt", col("risk_a") + col("risk_b"))
      .withColumn("dt", col("d_A") + col("d_B"))
  }

  def didFromCells(cell: DataFrame): DataFrame = {
    val whole = Window.partitionBy(lit(1))
    def m(g: String, p: String) =
      max(when(col("grp") === g && col("period") === p,
        col("sum_cents").cast("double") / col("n").cast("double")))
        .over(whole)
    cell.select(col("grp"), col("period"), col("n"),
      round(col("sum_cents").cast("double") / col("n").cast("double"), 4)
        .as("mean_cents"),
      round((m("treat", "post") - m("treat", "pre")) -
        (m("control", "post") - m("control", "pre")), 4).as("did_cents"))
      .orderBy(col("grp"), col("period"))
  }

  /** c79's segmentation stage over the user-grain frame (user_id, f,
    * last_d, m_cents) — shared with s19, which MAINTAINS that frame
    * incrementally (count-add / max / sum-add merges) and reads the
    * segments out through this exact stage, so streaming ≡ batch by
    * construction. Horizon is the frame's own max day (1-row
    * broadcast); boundaries via the x51 broadcast-percentile pattern.
    */
  def rfmSegments(users: DataFrame): DataFrame = {
    val horizon = broadcast(users.agg(max(col("last_d")).as("h")))
    val rfm = users.crossJoin(horizon)
      .select(col("user_id"), (col("h") - col("last_d")).cast("long").as("r"),
        col("f"), col("m_cents").as("m"))
    val bCols = Seq("r", "f", "m").flatMap { c =>
      Seq(0.25, 0.5, 0.75).zipWithIndex.map { case (q, i) =>
        expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY $c)")
          .cast("long").as(s"${c}${i + 1}")
      }
    }
    val bounds = broadcast(rfm.agg(bCols.head, bCols.tail: _*))
    def tile(c: String) =
      when(col(c) <= col(s"${c}1"), 1).when(col(c) <= col(s"${c}2"), 2)
        .when(col(c) <= col(s"${c}3"), 3).otherwise(4)
    rfm.crossJoin(bounds)
      .select(col("user_id"), tile("r").as("r_tile"),
        tile("f").as("f_tile"), tile("m").as("m_tile"))
      .groupBy((col("r_tile") * 100 + col("f_tile") * 10 + col("m_tile"))
        .as("segment"), col("r_tile"), col("f_tile"), col("m_tile"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** c83's attribution body over an explicit (user_id, ts, event_id,
    * event_type, value) frame — exposed so tests can plant the four
    * attribution cases (in-window touch, no prior touch, expired
    * touch, latest-of-several touches). A purchase attributes to the
    * LAST non-purchase event within `windowUs` before it; otherwise
    * 'direct'.
    */
  def lastTouchAttribution(ev: DataFrame, windowUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = ev
      .withColumn("lnt", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .withColumn("lts", last(
        when(col("event_type") =!= "purchase", col("ts")),
        ignoreNulls = true).over(w))
    val attributed = touched.filter(col("event_type") === "purchase")
      .select(
        when(col("lts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("lts")) <= windowUs,
          col("lnt")).otherwise("direct").as("channel"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
    val tot = attributed.agg(sum(col("n_purchases")).as("tot"))
    attributed.crossJoin(broadcast(tot))
      .select(col("channel"), col("n_purchases"), col("revenue_cents"),
        round(col("n_purchases").cast("double") / col("tot"), 4).as("share"))
  }

  /** c73's ordered stage chain over an explicit (user_id, event_type,
    * ts) frame — min ts of each stage AFTER the previous stage's ts,
    * so out-of-order events never advance the funnel. Exposed so
    * tests can plant drop-off and out-of-order users.
    */
  def funnelStages(ev: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    (s1, s2, s3)
  }

  /** Typed UDAF (Aggregator): root-mean-square of a double column —
    * partial-aggregatable (sum of squares + count merge), so it keeps
    * map-side combine at scale, unlike a collect-based implementation.
    */
  private val rmsAgg: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: Double): (Double, Long) =
        (b._1 + x * x, b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(r: (Double, Long)): Double =
        if (r._2 == 0) 0.0 else math.sqrt(r._1 / r._2)
      def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder = Encoders.scalaDouble
    }

  val queries: Map[String, Q] = Map(

    // --- joins ---------------------------------------------------------
    // Broadcast-hash join: the dimension side is explicitly broadcast —
    // at 100 TB the fact side never shuffles for this join.
    "c01_join_broadcast" -> ((spark, sfDir) =>
      t(spark, sfDir, "orders")
        .join(broadcast(t(spark, sfDir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("segment"))),

    // Fact-to-fact equi-join on the natural key; planner picks
    // sort-merge/shuffled-hash when both sides are large.
    "c02_join_large" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .join(t(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("priority"))),

    "c03_join_left" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer")
        .join(t(spark, sfDir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
        .limit(200)),

    "c04_join_semi" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer")
        .join(t(spark, sfDir, "orders"), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .limit(100)),

    "c05_join_anti" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer")
        .join(t(spark, sfDir, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .limit(100)),

    // Multi-way star join: two broadcast dims chained onto the fact.
    "c06_join_multiway" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer")
        .join(broadcast(t(spark, sfDir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(spark, sfDir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("region"), col("nation"))),

    // --- aggregations --------------------------------------------------
    // TPC-H Q1-shaped multi-metric aggregate (SUM/AVG/COUNT per group).
    "c07_agg_tpch_q1" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-01"))
        .groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .orderBy(col("flag"), col("status"))),

    "c08_agg_distinct" -> ((spark, sfDir) =>
      t(spark, sfDir, "orders")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))),

    "c09_agg_rollup" -> sql(
      "SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST"),

    "c10_agg_having" -> sql(
      "SELECT user_id, COUNT(*) AS n FROM events " +
        "GROUP BY user_id HAVING COUNT(*) > 15 ORDER BY user_id"),

    // HLL sketch — approximate by construction, so no oracle (rows-only).
    "c11_agg_approx" -> ((spark, sfDir) =>
      t(spark, sfDir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy(col("event_type"))),

    // --- window functions ----------------------------------------------
    "c12_window_rownum" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(spark, sfDir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
        .limit(300)
    }),

    "c13_window_running" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(spark, sfDir, "events")
        .withColumn("running_value", round(sum(col("value")).over(w), 2))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(500)
    }),

    "c14_window_lag" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(spark, sfDir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"), col("prev_value"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(500)
    }),

    // --- set operations -------------------------------------------------
    "c15_setop_union" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer").select(col("c_nationkey").as("key"))
        .union(t(spark, sfDir, "supplier").select(col("s_nationkey").as("key")))
        .distinct()
        .orderBy(col("key"))),

    "c16_setop_intersect" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer").select(col("c_nationkey").as("key"))
        .intersect(t(spark, sfDir, "supplier").select(col("s_nationkey").as("key")))
        .orderBy(col("key"))),

    "c17_setop_except" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer").select(col("c_nationkey").as("key"))
        .except(t(spark, sfDir, "supplier").select(col("s_nationkey").as("key")))
        .orderBy(col("key"))),

    // --- scalar function batteries --------------------------------------
    "c18_scalar_string" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("name_len"),
          concat(col("c_mktsegment"), lit("-"), col("c_custkey").cast("string")).as("tag"))
        .orderBy(col("c_custkey"))
        .limit(100)),

    // Dates rendered as yyyy-MM-dd strings: the comparable form across
    // result serializers (see b06).
    "c19_scalar_date" -> ((spark, sfDir) =>
      t(spark, sfDir, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))
        .limit(100)),

    // TIMESTAMP INTERVAL arithmetic (c19 covers DATE-grain functions):
    // interval shift, field extraction, anchored second diffs and the
    // integer 15-minute bucket (DIV on non-negative seconds — both
    // engines truncate identically there; the anchor predates the
    // whole event range by construction).
    "c71_interval_arith" -> ((spark, sfDir) =>
      t(spark, sfDir, "events")
        .select(
          col("event_id"),
          date_format(col("ts") + expr("INTERVAL 90 MINUTE"),
            "yyyy-MM-dd HH:mm:ss").as("ts_plus90"),
          hour(col("ts")).as("hh"),
          minute(col("ts")).as("mi"),
          expr("timestampdiff(SECOND, TIMESTAMP'2024-01-01 00:00:00', ts)")
            .as("sec_since"),
          expr("timestampdiff(SECOND, TIMESTAMP'2024-01-01 00:00:00', ts) DIV 900")
            .as("bucket15"))
        .orderBy(col("event_id"))
        .limit(100)),

    "c20_scalar_cond" -> ((spark, sfDir) =>
      t(spark, sfDir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status"))
        .orderBy(col("o_orderkey"))
        .limit(200)),

    "c21_predicates" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 20) &&
          col("l_linestatus").like("F%"))
        .agg(count(lit(1)).as("n"))),

    "c22_scalar_json" -> ((spark, sfDir) =>
      t(spark, sfDir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
        .limit(200)),

    "c23_scalar_math" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")), 2).as("net"),
          floor(col("l_quantity")).cast("bigint").as("qty_floor"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(300)),

    // --- subquery / CTE ---------------------------------------------------
    "c24_subquery_scalar" -> sql(
      "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > (SELECT 2 * MIN(o_totalprice) FROM orders) " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),

    "c25_cte" -> sql(
      "WITH per_cust AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1) " +
        "SELECT c_mktsegment AS segment, CAST(SUM(n) AS BIGINT) AS orders_total " +
        "FROM per_cust JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1 ORDER BY 1"),

    "c26_union_all" -> sql(
      "SELECT 'customer' AS src, COUNT(*) AS n FROM customer " +
        "UNION ALL SELECT 'supplier' AS src, COUNT(*) AS n FROM supplier " +
        "ORDER BY src"),

    "c27_distinct" -> ((spark, sfDir) =>
      t(spark, sfDir, "events").select(col("event_type")).distinct()
        .orderBy(col("event_type"))),

    // --- UDF / UDAF / generator -----------------------------------------
    // Typed Aggregator UDAF (partial-merge-able: sum-of-squares + count).
    "c28_udaf_rms" -> ((spark, sfDir) =>
      t(spark, sfDir, "events")
        .groupBy(col("event_type"))
        .agg(round(udaf(rmsAgg).apply(col("value")), 4).as("rms"))
        .orderBy(col("event_type"))),

    // Scalar Scala UDF (coverage for the UDF category; everywhere else we
    // deliberately stay on codegen'd built-ins per the scale rules).
    "c29_udf_severity" -> ((spark, sfDir) => {
      val severity = udf((t: String) => t match {
        case "error" => 3; case "purchase" => 2; case "signup" => 1; case _ => 0
      })
      t(spark, sfDir, "events")
        .groupBy(severity(col("event_type")).as("severity"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("severity"))
    }),

    // Generator / UDTF category: explode a split column into rows.
    "c30_explode_tokens" -> ((spark, sfDir) =>
      t(spark, sfDir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("token"))
        .limit(500)),

    // --- temporal joins (operators/TemporalJoins) -----------------------
    // As-of join: each purchase gets the user's most recent click at or
    // before it — union + window carry-forward, one shuffle on user_id.
    "c31_asof_join" -> ((spark, sfDir) => {
      val e = t(spark, sfDir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.operators.TemporalJoins
        .asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("asof_click_id").as("last_click_id"))
        .orderBy(col("purchase_id"))
    }),

    // Pairs of events within a 10-minute window, COUNTED per day. The
    // count never materializes the quadratic pair set: full middle
    // bins come from a broadcast cumulative bin-count table (built
    // with the distributed prefix scan) and only the two partial edge
    // bins (30 s each, vs the 600 s window) pay a real self-join —
    // ~2·w/W of the enumeration's candidate volume, and w shrinks
    // with scale while W is fixed by the query.
    "c32_range_join" -> ((spark, sfDir) => {
      val e = t(spark, sfDir, "events").select(col("event_id"), col("ts"))
      graft.operators.TemporalJoins
        .rangeSuccessorCount(e, "event_id", "ts", 600L, binSeconds = 30L)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(col("n_within")).as("n_pairs"))
        .filter(col("n_pairs") > 0) // pair-join semantics: zero-pair days absent
        .orderBy(col("day"))
    }),

    // Range pair ENUMERATION (the operator c32's counter decomposes
    // around) on a bounded slice — output volume is the cost floor of
    // any enumeration, so the registered query bounds it by filtering
    // to one event class first.
    "c50_range_pairs" -> ((spark, sfDir) => {
      val e = t(spark, sfDir, "events")
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      graft.operators.TemporalJoins.rangeSelfJoin(e, "ts", 600L, binSeconds = 150L)
        .select(col("a_event_id").as("a_id"), col("b_event_id").as("b_id"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Two-relation interval join (the batch form of s06's
    // stream-stream shape): every purchase within 10 minutes AFTER an
    // error — bin-bucketed candidate generation between two DIFFERENT
    // relations, completing the temporal matrix next to the as-of
    // (c31) and self-range (c32/c50) forms.
    "c51_range_join_2rel" -> ((spark, sfDir) => {
      val e = t(spark, sfDir, "events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"))
      graft.operators.TemporalJoins
        .rangeJoin(errors, purchases, "ts", "ts", 600L, binSeconds = 150L)
        .select(col("a_event_id").as("error_id"),
          col("b_event_id").as("purchase_id"))
        .orderBy(col("error_id"), col("purchase_id"))
    }),

    // The COUNTING form of c51 at unbounded scale: per day, how many
    // (error, purchase-within-10-min) pairs exist — same prefix
    // decomposition as c32 but across two relations, so the answer
    // never materializes the |errors|x|purchases-in-window| pair set.
    "c52_range_count_2rel" -> ((spark, sfDir) => {
      val e = t(spark, sfDir, "events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"))
      graft.operators.TemporalJoins
        .rangeSuccessorCount(errors, purchases, "event_id", "ts", "ts",
          600L, binSeconds = 30L)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(col("n_within")).as("n_pairs"))
        .filter(col("n_pairs") > 0) // join-group semantics: zero-pair days absent
        .orderBy(col("day"))
    }),

    // BATCH SESSIONIZATION (gaps-and-islands) — the batch twin of
    // s04's streaming session_window, same 30-minute gap rule: a new
    // session starts where the gap from the previous event exceeds the
    // threshold; session id = running count of starts. Two stacked
    // windows over ONE shuffle on user_id (lag and the running sum
    // share the partitioning; Catalyst reuses the exchange), then the
    // per-session aggregate — the plan a 100 TB sessionization wants.
    "c53_sessionize" -> ((spark, sfDir) => {
      // gap compared in exact integer MICROS on both engines — a
      // seconds cast truncates and a double epoch rounds, either of
      // which can flip a boundary row near exactly-30-minutes
      val gapMicros = 1800L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      t(spark, sfDir, "events")
        .select(col("user_id"), col("ts"))
        .withColumn("new_session",
          when(expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(w)
            > gapMicros, 1).otherwise(lit(0)))
        .withColumn("session_seq",
          sum(col("new_session"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("session_start"), col("session_end"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE): the dense calendar
    // spine — every day between the table's min and max date, zero
    // rows included — the reporting shape a bare GROUP BY day cannot
    // produce (it drops empty days). The recursion generates only the
    // tiny spine (one row per day, bounds carried through to
    // terminate); the data-sized work is the ordinary grouped scan it
    // left-joins, so the shape is scale-safe by construction.
    "c54_recursive_spine" -> sql(
      "WITH RECURSIVE bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, " +
        "MAX(CAST(ts AS DATE)) AS hi FROM events), " +
        "days AS (SELECT lo AS day, hi FROM bounds " +
        "UNION ALL SELECT date_add(day, 1), hi FROM days WHERE day < hi) " +
        "SELECT date_format(day, 'yyyy-MM-dd') AS day, COALESCE(n, 0) AS n " +
        "FROM days LEFT JOIN (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n " +
        "FROM events GROUP BY 1) c ON days.day = c.d ORDER BY day"),

    // LATERAL correlated subquery — top-N-per-group phrased the SQL
    // way (each customer's 2 highest-value orders). Catalyst
    // decorrelates the LIMITed lateral into a ranked window join, so
    // the executed plan is the same one-shuffle shape as a manual
    // row_number ≤ 2 — the surface feature is the point (DuckDB
    // accepts the identical text). Deterministic tiebreak on
    // o_orderkey; customers with no orders drop out (inner lateral),
    // matching both engines' default.
    "c55_lateral_topn" -> sql(
      "SELECT c_custkey, o.o_orderkey, o.o_totalprice " +
        "FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o " +
        "ORDER BY c_custkey, o_orderkey"),

    // Correlated EXISTS / NOT EXISTS — the quantified-subquery surface
    // (c24 covers the scalar form, c55 the LATERAL form). Catalyst
    // decorrelates both predicates into join operators (semi + anti,
    // plan-asserted in PlanSpec), so execution is the same one-pass
    // shape as c04/c05 — never a per-outer-row re-scan of orders.
    "c56_exists_correlated" -> sql(
      "SELECT c_custkey, c_name FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 250000) " +
        "AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey " +
        "AND o2.o_orderstatus = 'F') " +
        "ORDER BY c_custkey"),

    // Array-function battery over a real array column (token arrays):
    // distinct/sort/slice/intersect/join — the list-manipulation
    // surface beyond c40's HOF lambdas. All shuffle-free map work;
    // outputs are scalars so the oracle comparison is
    // representation-independent.
    "c57_array_funcs" -> ((spark, sfDir) => {
      val toks = split(col("text"), " ")
      val uniq = array_sort(array_distinct(toks))
      val stop = array(lit("a"), lit("the"), lit("of"), lit("and"), lit("to"))
      t(spark, sfDir, "documents")
        .select(col("doc_id"),
          size(uniq).as("n_uniq"),
          array_min(toks).as("min_tok"),
          size(array_intersect(uniq, stop)).as("n_stop_kinds"),
          array_join(slice(uniq, 1, 3), "-").as("first3"))
        .orderBy(col("doc_id"))
    }),

    // Ordered string aggregation (LISTAGG/STRING_AGG): collect_list is
    // order-nondeterministic by contract, so the deterministic Spark
    // form is sort-the-array-then-join — one ordinary
    // partial-aggregatable hash agg, no window, no driver collect.
    "c58_listagg" -> ((spark, sfDir) =>
      t(spark, sfDir, "nation")
        .join(broadcast(t(spark, sfDir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("region"))),

    // UNPIVOT — wide-to-long reshaping (the inverse of c41's PIVOT).
    // The relational rewrite is a constant-width expand over the
    // aggregated (tiny) side, never over the raw scan.
    "c59_unpivot" -> sql(
      "SELECT flag, metric, val FROM (SELECT l_returnflag AS flag, " +
        "ROUND(SUM(l_quantity), 2) AS qty, ROUND(SUM(l_extendedprice), 2) AS price " +
        "FROM lineitem GROUP BY 1) " +
        "UNPIVOT (val FOR metric IN (qty, price)) ORDER BY flag, metric"),

    // NULL-semantics surface: a null-safe equi-join (<=> / IS NOT
    // DISTINCT FROM) must MATCH the NULL group a plain equi-join
    // drops. Keys are made nullable with NULLIF; the dim side is tiny
    // (distinct event types) so AQE broadcasts it.
    "c60_nullsafe_join" -> ((spark, sfDir) => {
      val facts = t(spark, sfDir, "events")
        .select(expr("nullif(event_type, 'click')").as("k"))
      val dim = facts.distinct()
        .select(col("k").as("dk"), coalesce(col("k"), lit("was_click")).as("label"))
      facts.join(dim, col("k") <=> col("dk"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }),

    // Time-based trailing RANGE frame: per event, count/sum over the
    // preceding hour of the SAME user — the per-row sliding-window
    // analytic (fraud velocity checks, rate limiting). The frame is a
    // numeric RANGE over exact integer micros (an interval frame on a
    // float epoch would round near boundaries); one shuffle on
    // user_id like any per-user window.
    "c61_window_timerange" -> ((spark, sfDir) => {
      val hourMicros = 3600L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("unix_micros(ts)"))
        .rangeBetween(-hourMicros, 0)
      t(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("sum_last_hour", round(sum(col("value")).over(w), 2))
        .select(col("event_id"), col("user_id"), col("n_last_hour"),
          col("sum_last_hour"))
        .orderBy(col("event_id"))
    }),

    // Rank-distribution window functions (PERCENT_RANK / CUME_DIST):
    // exact rational arithmetic over a unique total order, so the
    // doubles are bit-identical across engines.
    "c62_window_pctrank" -> sql(
      "SELECT event_id, event_type, " +
        "PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pct_rank, " +
        "CUME_DIST() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cume " +
        "FROM events ORDER BY event_id LIMIT 500"),

    // GROUP BY ALL — group keys inferred from the non-aggregate
    // select items; identical text runs on both engines.
    "c63_group_by_all" -> sql(
      "SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n " +
        "FROM lineitem GROUP BY ALL ORDER BY 1, 2"),

    // TRY_CAST — error-safe ANSI casts: malformed input → NULL, never
    // a task failure (the ingest-hardening primitive; ANSI-mode CAST
    // would kill the job on the first bad row). Inputs chosen so both
    // engines agree: alpha strings and JSON text are invalid in both,
    // digit prefixes valid in both.
    "c64_try_cast" -> sql(
      "SELECT event_id, TRY_CAST(event_type AS INTEGER) AS et_int, " +
        "TRY_CAST(SUBSTR(CAST(event_id AS VARCHAR(20)), 1, 2) AS INTEGER) AS id_prefix, " +
        "TRY_CAST(props AS DOUBLE) AS props_num " +
        "FROM events ORDER BY event_id LIMIT 200"),

    // FILTER clause on aggregates — per-group conditional aggregation
    // without a self-join or CASE pyramid; stays one hash agg with
    // map-side partials (the conditions evaluate per-row pre-shuffle).
    "c66_agg_filter" -> sql(
      "SELECT event_type, COUNT(*) AS n, " +
        "COUNT(*) FILTER (WHERE value > 50) AS n_big, " +
        "ROUND(SUM(value) FILTER (WHERE value > 50), 4) AS sum_big, " +
        "COUNT(DISTINCT user_id) FILTER (WHERE value <= 50) AS users_small " +
        "FROM events GROUP BY 1 ORDER BY 1"),

    // Explicit NULLS FIRST/LAST — engine DEFAULTS differ (Spark sorts
    // NULL first ascending, DuckDB last), so portable SQL must spell
    // the placement out; both slices pin one non-default direction.
    "c67_null_ordering" -> sql(
      "SELECT * FROM (" +
        "SELECT 'first' AS mode, event_id, v FROM (" +
        "SELECT event_id, CASE WHEN value > 50 THEN ROUND(value, 4) END AS v " +
        "FROM events) t ORDER BY v ASC NULLS FIRST, event_id LIMIT 30) a " +
        "UNION ALL SELECT * FROM (" +
        "SELECT 'last' AS mode, event_id, v FROM (" +
        "SELECT event_id, CASE WHEN value > 50 THEN ROUND(value, 4) END AS v " +
        "FROM events) t ORDER BY v ASC NULLS LAST, event_id LIMIT 30) b " +
        "ORDER BY mode, event_id"),

    // Inline VALUES relation — the literal lookup-table join (weights,
    // rename maps) without a physical table; the optimizer folds it to
    // a broadcast local relation.
    "c65_values_join" -> sql(
      "SELECT e.event_type, v.weight, COUNT(*) AS n, " +
        "ROUND(SUM(e.value * v.weight), 4) AS wsum " +
        "FROM events e JOIN (VALUES ('click', CAST(2.0 AS DOUBLE)), " +
        "('view', CAST(1.0 AS DOUBLE)), ('purchase', CAST(5.0 AS DOUBLE))) " +
        "AS v(event_type, weight) " +
        "ON e.event_type = v.event_type GROUP BY 1, 2 ORDER BY 1"),

    // CUBE grouping sets (c09 covers ROLLUP).
    "c33_agg_cube" -> sql(
      "SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST"),

    // --- source/sink format breadth -------------------------------------
    // CSV sink + re-read (schema declared, not inferred) — the format
    // surface beyond parquet; aggregation proves the round-trip.
    "c34_csv_roundtrip" -> ((spark, sfDir) => {
      val target = s"/tmp/graft-formats/csv_${Integer.toHexString(sfDir.hashCode)}"
      t(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"))
        .write.mode("overwrite").option("header", "true").csv(target)
      spark.read
        .schema("event_id BIGINT, event_type STRING, user_id BIGINT")
        .option("header", "true").csv(target)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("uid_sum"))
        .orderBy(col("event_type"))
    }),

    // JSON-lines sink + re-read.
    "c35_json_roundtrip" -> ((spark, sfDir) => {
      val target = s"/tmp/graft-formats/json_${Integer.toHexString(sfDir.hashCode)}"
      t(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"))
        .write.mode("overwrite").json(target)
      spark.read
        .schema("event_id BIGINT, event_type STRING, user_id BIGINT")
        .json(target)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("uid_sum"))
        .orderBy(col("event_type"))
    }),

    // part ⋈ lineitem revenue rollup (completes coverage of every
    // provisioned table).
    "c36_join_part" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .join(t(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("brand"))),

    // Constructor battery: from_json with a declared schema (c22 covers
    // path extraction), struct/map/array constructors and element
    // access — flattened back to scalars so the result is
    // serializer-comparable.
    "c37_json_struct" -> ((spark, sfDir) =>
      t(spark, sfDir, "events")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .as("parsed"),
          struct(col("user_id").as("uid"), col("event_type").as("etype")).as("meta"),
          map(lit("type"), col("event_type")).as("m"),
          array(col("user_id"), col("event_id")).as("arr"))
        .select(col("event_id"),
          col("parsed.k").as("k"),
          col("meta.uid").as("uid"),
          col("meta.etype").as("etype"),
          element_at(col("m"), "type").as("mtype"),
          element_at(col("arr"), 2).as("arr_second"))
        .orderBy(col("event_id"))
        .limit(200)),

    // ORC sink + re-read — the remaining format of the scans/sources
    // row (parquet is core; CSV/JSON are c34/c35).
    "c38_orc_roundtrip" -> ((spark, sfDir) => {
      val target = s"/tmp/graft-formats/orc_${Integer.toHexString(sfDir.hashCode)}"
      t(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"))
        .write.mode("overwrite").orc(target)
      spark.read.orc(target)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("uid_sum"))
        .orderBy(col("event_type"))
    }),

    // CORRUPT-RECORD-TOLERANT INGEST — the PERMISSIVE-mode contract
    // real crawled JSONL demands: a deterministic corpus dump where
    // every 50th record is replaced by a broken line, read back with
    // `_corrupt_record` capture; the report proves (a) no corrupt
    // line poisons a typed column, (b) no valid line is dropped,
    // (c) the corrupt lines are COUNTED, not silently skipped —
    // silent-drop ingest is how a pipeline loses 2% of its corpus
    // without noticing. The oracle recomputes all three numbers from
    // the injection rule over the source table — the file never
    // enters the oracle's world.
    "c72_corrupt_records" -> ((spark, sfDir) => {
      val target = s"/tmp/graft-formats/cjson_${Integer.toHexString(sfDir.hashCode)}"
      t(spark, sfDir, "documents")
        .select(when(col("doc_id") % 50 === 0,
            concat(lit("{\"doc_id\": "), col("doc_id"), lit(", BROKEN")))
          .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
          .as("value"))
        .write.mode("overwrite").text(target)
      spark.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(target)
        .agg(
          count(when(col("_corrupt_record").isNull, 1)).as("n_valid"),
          count(when(col("_corrupt_record").isNotNull, 1)).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("n_chars")))
            .cast("long").as("chars_valid"))
    }),

    // FUNNEL ANALYSIS — the ordered-sequence product-analytics
    // workload (signup → first click AFTER it → first purchase after
    // THAT): each stage is min-ts-after-previous, so out-of-order
    // events don't count — the semantics a naive per-type count
    // gets wrong. Three stage frames chain by equi-join on user
    // (each one user-sized, monotonically shrinking); the report is
    // stage populations with step conversion. All timestamps exact;
    // the conversions are single divisions at 4 dp.
    "c73_funnel" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val (s1, s2, s3) = funnelStages(ev)
      val n0 = ev.agg(countDistinct(col("user_id")).as("n")).select(col("n"))
      def cnt(df: DataFrame) = df.agg(count(lit(1)).as("n")).select(col("n"))
      val Seq(c0, c1, c2, c3) = Seq(n0, cnt(s1), cnt(s2), cnt(s3))
        .zipWithIndex.map { case (d, i) => d.select(col("n").as(s"n$i")) }
      c0.crossJoin(broadcast(c1)).crossJoin(broadcast(c2)).crossJoin(broadcast(c3))
        .selectExpr(
          "stack(3, " +
            "1, 'signup', n1, round(100.0 * cast(n1 as double) / n0, 4), " +
            "2, 'click_after_signup', n2, round(100.0 * cast(n2 as double) / n1, 4), " +
            "3, 'purchase_after_click', n3, round(100.0 * cast(n3 as double) / n2, 4)" +
            ") AS (stage, stage_name, n_users, conversion_pct)")
        .orderBy(col("stage"))
    }),

    // COHORT RETENTION — the second product-analytics flagship
    // (c73's funnel is the first): users cohort by first-activity
    // week, and each (cohort, week-offset) cell counts the cohort
    // members still active — the classic retention triangle. Weeks
    // are exact integer day-offsets DIV 7 from the epoch start, so
    // cohort assignment is deterministic; the percentages divide the
    // COHORT size (not the population). Two user-sized aggregates +
    // one distinct-activity frame, joined on user.
    "c74_retention" -> ((spark, sfDir) =>
      retentionTriangle(t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01') DIV 7").as("wk")))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // COHORT LTV CURVES — the revenue read of c74's retention
    // triangle (retention counts who CAME BACK; LTV accumulates what
    // each signup cohort has SPENT by week offset — the payback-
    // period readout an acquisition budget hangs on): c74's week
    // grid and min-week cohorts verbatim, purchase value in exact
    // FLOOR-cents (c79's money convention), per-(cohort, offset)
    // sums cumulated by a window over the weeks²-bounded cohort
    // frame, and LTV/user = cum_cents/(size·100) — one division at
    // 4 dp. Corpus-scale work = two events aggregates.
    "c90_cohort_ltv" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01') DIV 7").as("wk"),
          when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)
            .as("cents"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("c0"))
      val sizes = cohort.groupBy(col("c0"))
        .agg(count(lit(1)).as("cohort_size"))
      val cum = Window.partitionBy(col("c0")).orderBy(col("week_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.join(cohort, "user_id")
        .groupBy(col("c0"), (col("wk") - col("c0")).as("week_offset"))
        .agg(sum(col("cents")).as("wk_cents"))
        .withColumn("cum_cents", sum(col("wk_cents")).over(cum))
        .join(broadcast(sizes), "c0")
        .select(col("c0").as("cohort_week"), col("week_offset"),
          col("cohort_size"), col("wk_cents"), col("cum_cents"),
          round(col("cum_cents").cast("double") /
            (col("cohort_size") * lit(100L)).cast("double"), 4)
            .as("ltv_per_user"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // POWER-USER CONCENTRATION — the Pareto question ("what share of
    // traffic do the heaviest users carry"): top-15 users by event
    // count with exact per-user and cumulative shares. Scale shape:
    // the top slice comes from TakeOrderedAndProject over the
    // user-sized count frame (b11's machinery — a global NTILE/rank
    // window over billions of users would be a one-task straggler,
    // x51's argument), and the cumulative window runs over the
    // 15-row result only; the total is a broadcast scalar.
    "c77_power_users" -> ((spark, sfDir) => {
      val counts = t(spark, sfDir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val total = counts.agg(sum(col("n_events")).as("total"))
      val top = counts.orderBy(desc("n_events"), col("user_id")).limit(15)
      val w = Window.orderBy(desc("n_events"), col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("n_events"), col("user_id"))))
        .withColumn("cum_events", sum(col("n_events")).over(w))
        .select(col("rank"), col("user_id"), col("n_events"),
          round(lit(100.0) * col("n_events").cast("double") / col("total"), 4)
            .as("share_pct"),
          round(lit(100.0) * col("cum_events").cast("double") / col("total"), 4)
            .as("cum_share_pct"))
        .orderBy(col("rank"))
    }),

    // USER FEATURE SNAPSHOT — the feature-extraction rollup a churn
    // model trains on: per user, lifetime activity (events, distinct
    // active days, first/last day), recency (days idle at the
    // horizon) and momentum (events in the last 7 days) — ALL from
    // one partial-aggregated pass with conditional sums; the
    // distinct-day count rides a pre-collapsed (user, day) frame.
    // Integer features only — reproducible to the row, the property
    // that makes training snapshots auditable (x20's argument).
    "c76_user_features" -> ((spark, sfDir) => {
      val horizon = 24L // the last provisioned day (2024-01-25)
      val ev = t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
      val days = ev.distinct().groupBy(col("user_id"))
        .agg(count(lit(1)).as("active_days"))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("d")).as("first_day"), max(col("d")).as("last_day"),
          sum(when(col("d") >= horizon - 6, 1L).otherwise(0L))
            .as("events_last7"))
        .join(days, "user_id")
        .select(col("user_id"), col("n_events"), col("active_days"),
          col("first_day"), col("last_day"),
          (lit(horizon.toInt) - col("last_day")).as("days_idle"),
          col("events_last7"))
        .orderBy(col("user_id"))
    }),

    // DAU/WAU STICKINESS — the third product-analytics staple after
    // c73/c74: per day, distinct daily actives over distinct
    // trailing-7-day actives. Trailing DISTINCT does not decompose
    // additively (the same user on two days counts once), so the
    // trailing set rebuilds from the (user, day) distinct frame — a
    // day-spine × 7-day range join over a frame bounded by
    // users·days, never raw events; at 100 TB the distinct frame is
    // the small artifact and events are touched once.
    "c75_stickiness" -> ((spark, sfDir) => {
      val dau = t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
        .distinct()
      val days = dau.select(col("d")).distinct()
      val dauN = dau.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      val wauN = days.select(col("d").as("day"))
        .join(dau, col("d").between(col("day") - 6, col("day")))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dauN.select(col("d").as("day"), col("dau"))
        .join(wauN, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
        .orderBy(col("day"))
    }),

    // EVENT-SEQUENCE TRANSITION MATRIX — the Markov path analysis
    // behind "what happens next": for every consecutive event pair in
    // a user's timeline, the (from, to) transition count and its
    // row-normalized probability. c73's funnel checks ONE prescribed
    // path; the transition matrix surfaces every path at once (the
    // error→error self-loop a reliability review hunts, the
    // view→purchase edge a merchandiser tunes). Scale shape: one
    // shuffle on user_id for the lag window (events are user-local,
    // no global order), then the matrix itself is |event_types|² rows
    // — bounded regardless of corpus size — so the normalizing totals
    // broadcast. Counts are exact BIGINTs; probability is one
    // division at 4 dp.
    // SEQUENTIAL PATTERNS — the order-3 extension of c78's transition
    // matrix (PrefixSpan's shortest useful case): top ordered
    // event-type TRIPLES within a user's timeline, the "what path do
    // users actually take" read that pairwise transitions compose
    // incorrectly (Markov assumes memorylessness; the triple counts
    // measure where that assumption breaks). Two lead() columns over
    // c78's (ts, event_id) total order — still ONE user_id shuffle —
    // then an |alphabet|³-bounded exact count frame and a
    // TakeOrdered top-20.
    "c85_sequential_patterns" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(col("event_type").as("e1"), col("e2"), col("e3"))
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("e1"), col("e2"), col("e3"))
        .limit(20)
    }),

    "c78_markov_paths" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val steps = t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
      val counts = steps.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("from_type"))
        .agg(sum(col("n")).as("tot"))
      counts.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 4).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // RFM SEGMENTATION — the classic customer-value grid: each user
    // scored 1-4 on Recency (days idle at the data horizon),
    // Frequency (lifetime events) and Monetary (purchase value in
    // exact integer cents — FLOOR(value·100), because a float SUM's
    // accumulation order is engine-dependent but an integer SUM is
    // not), quartile boundaries via the x51 broadcast-percentile
    // pattern (never a global NTILE window over billions of users),
    // rolled up to segment populations. The horizon is the data's
    // own max day — a 1-row broadcast, not a hardcoded clock. At
    // 100 TB the user frame is the small artifact; swap the exact
    // percentile for approx_percentile and nothing else changes.
    "c79_rfm_segments" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"),
          col("event_type"), col("value"))
      val money = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("m_cents"))
      val users = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("f"), max(col("d")).as("last_d"))
        .join(money, Seq("user_id"), "left")
        .select(col("user_id"), col("f"), col("last_d"),
          coalesce(col("m_cents"), lit(0L)).as("m_cents"))
      rfmSegments(users).orderBy(col("segment"))
    }),

    // A/B EXPERIMENT READOUT — deterministic hash-bucketed arm
    // assignment (x53's Weyl multiplier on user_id: membership never
    // drifts across runs or engines — the property randomized
    // assignment can't give an audit) with the two-proportion
    // conversion report: per-arm converted-user rates, relative
    // lift, and the pooled two-proportion z statistic. Every input
    // to the float chain is an exact integer, and the chain itself
    // is division/multiply/sqrt only — each IEEE-correctly-rounded,
    // so both engines produce bit-identical doubles (ln/exp would
    // not be safe here; sqrt is). Two user-sized distinct frames,
    // a 5-row aggregate, and a 1×1 broadcast cross — nothing in
    // this plan grows with event volume except the first scan.
    // Conversion = a HIGH-VALUE purchase (value ≥ 95): on this dense
    // corpus every user purchases SOMETHING, which would pool p to
    // 1.0 and zero the z denominator — the same degeneracy a real
    // experiment hits when it measures a universal behavior.
    "c80_ab_lift" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
      val arm = ev.select(col("user_id")).distinct()
        .select(col("user_id"),
          when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
            Sampling.HashMod / 2, "A").otherwise("B").as("arm"))
      val conv = ev.filter(col("event_type") === "purchase" &&
          col("value") >= 95.0)
        .select(col("user_id")).distinct()
        .withColumn("converted", lit(1L))
      val byArm = arm.join(conv, Seq("user_id"), "left")
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("converted"), lit(0L))).as("c"))
      val a = byArm.filter(col("arm") === "A")
        .select(col("n").as("n_a"), col("c").as("conv_a"))
      val b = byArm.filter(col("arm") === "B")
        .select(col("n").as("n_b"), col("c").as("conv_b"))
      val pa = col("conv_a").cast("double") / col("n_a")
      val pb = col("conv_b").cast("double") / col("n_b")
      val pp = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b"))
      a.crossJoin(broadcast(b))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          round(pa, 4).as("p_a"), round(pb, 4).as("p_b"),
          round((pa - pb) / pb * 100, 4).as("lift_pct"),
          round((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)
            .as("z_score"))
    }),

    // COARSENED EXACT MATCHING — the observational-causal estimator
    // beside c80's randomized z-test and c82's CUPED (when arms are
    // NOT randomized, raw lift confounds with user composition; CEM
    // compares arms only WITHIN strata of coarsened covariates and
    // reports the treated-weighted ATT — Iacus/King/Porro's method,
    // the workhorse of quasi-experiments). Strata = activity
    // quartile (x51's broadcast discrete-percentile convention) ×
    // dominant event type (max(struct) plurality, type-desc
    // tiebreak); c80's arm hash and conversion rule verbatim, so the
    // three estimators read the same experiment. Off-support strata
    // (one arm empty) are pruned — THE defining CEM step. Per-
    // stratum effect = (convT·nC − convC·nT)/(nT·nC) — one exact
    // rational onto the 10⁻⁶ grid — and ATT = Σ nT·effect_fp /
    // (NT·10⁶) is x158's exact-integer weighted sum with one
    // division. Corpus-scale work: two events aggregates; everything
    // after is user- then strata-grain.
    "c86_cem_matching" -> ((spark, sfDir) =>
      cemAtt(cemUsers(spark, sfDir)).orderBy(col("stratum"))),

    // INVERSE-PROPENSITY WEIGHTING — the third observational
    // estimator beside c86's matching and c82's CUPED (CEM discards
    // off-support strata entirely; IPS reweights every on-support
    // user by 1/P(their arm | their stratum), recovering the ATE
    // when matching's pruning would bias the estimand): propensity
    // p_s = nT/(nT+nC) is an exact stratum rational, the per-stratum
    // IPS term collapses to n_s·(convT·nC − convC·nT)/(nT·nC) — the
    // same cross-multiplied D as c86 scaled by the stratum size —
    // on the 10⁻⁶ grid, and ATE = Σ term_fp / N with one division.
    // Positivity violations (one-arm strata, p ∈ {0,1} → infinite
    // weights) are pruned exactly like CEM's off-support rule, and
    // the readout carries the propensity so a reviewer sees how far
    // from 0.5 the design drifted. Same corpus-scale work as c86.
    "c88_ips_weighting" -> ((spark, sfDir) =>
      ipsAte(cemUsers(spark, sfDir)).orderBy(col("stratum"))),

    // CONVERSION-LAG HISTOGRAM — the uncensored complement of c84's
    // survival curve (KM estimates the time-to-event FUNCTION under
    // censoring; among users who DID convert, this is the simple
    // log₂-bucketed "how long did it take" histogram a funnel review
    // reads first): per converting user, µs from first activity to
    // first high-value purchase (c80's shared conversion rule), x181's
    // floor-log₂ buckets (zero lag → −1), shares and cumulative over
    // the ≤~50-row bucket frame. Two partial-agg'able user-grain
    // aggregates; nothing event-sized shuffles twice.
    "c93_conversion_lag" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val whole = Window.partitionBy(lit(1))
      val cum = Window.partitionBy(lit(1)).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = t(spark, sfDir, "events")
      val first = ev.groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("t0"))
      val conv = ev.filter(col("event_type") === "purchase" &&
          col("value") >= 95.0)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("tc"))
      conv.join(first, "user_id")
        .withColumn("lag", col("tc") - col("t0"))
        .withColumn("bucket", when(col("lag") <= 0L, lit(-1L))
          .otherwise(floor(log2(col("lag").cast("double")))))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .withColumn("_t", sum(col("n")).over(whole))
        .select(col("bucket"),
          pow(lit(2.0), col("bucket").cast("double")).cast("long")
            .as("lo_us"),
          col("n"),
          round(col("n").cast("double") / col("_t").cast("double"), 4)
            .as("share"),
          round(sum(col("n")).over(cum).cast("double") /
            col("_t").cast("double"), 4).as("cum_share"))
        .orderBy(col("bucket"))
    }),

    // EVENT-TYPE AFFINITY — the behavioral co-occurrence matrix
    // (c78 reads SEQUENCE: what follows what; this reads OVERLAP:
    // which behaviors live in the same users regardless of order —
    // the audience-overlap readout a feature-bundling or cross-sell
    // decision wants): per unordered type pair, Jaccard of the two
    // user sets, n12/(n1+n2−n12) as one exact rational at 4 dp. The
    // (user, type) distinct frame self-joins on user_id with t1 < t2
    // — per-user fan-out is C(|types|,2)-bounded (x81's basket
    // argument), and everything after is a \|types\|²-row frame.
    "c92_type_affinity" -> ((spark, sfDir) =>
      typeAffinityFromPairs(t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type")).distinct())
        .orderBy(col("type_a"), col("type_b"))),

    // OUTLIER USERS — x175's 3σ verdict at USER grain (the chart
    // flags anomalous DAYS; this flags the bot/scraper-shaped
    // ACCOUNTS whose volume sits outside the population — the abuse
    // screen an events pipeline runs before any per-user statistic
    // is trusted): population mean/variance as ONE broadcast scalar
    // aggregate — never a window over the user frame, which at
    // 100 TB is a one-task straggler (c77's objection) — then the
    // per-user verdict is map-side: the DECIMAL(38,0) cross-
    // multiplied compare d² > 9·(n·Σc² − T²) with d = c·n − T, and
    // z one division+sqrt at 4 dp. Top-20 via TakeOrdered.
    "c91_outlier_users" -> ((spark, sfDir) => {
      val perUser = t(spark, sfDir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val stats = broadcast(perUser.agg(
        count(lit(1)).as("n"), sum(col("c")).as("t"),
        sum(col("c") * col("c")).as("sxx")))
      perUser.crossJoin(stats)
        .withColumn("_d", col("c") * col("n") - col("t"))
        .withColumn("_v", col("n") * col("sxx") - col("t") * col("t"))
        .filter(col("_d").cast("decimal(38,0)") *
          col("_d").cast("decimal(38,0)") >
          lit(9L).cast("decimal(38,0)") * col("_v").cast("decimal(38,0)"))
        .select(col("user_id"), col("c").as("n_events"),
          round(col("_d").cast("double") / sqrt(col("_v").cast("double")), 4)
            .as("z"))
        .orderBy(desc("z"), col("user_id"))
        .limit(20)
    }),

    // POWER / MINIMUM DETECTABLE EFFECT — the experiment-design
    // readout beside c80's after-the-fact z-test ("with these arm
    // sizes and this base rate, what lift COULD this experiment even
    // see at α=0.05, power=0.8"): MDE = (z_{α/2} + z_{power}) ·
    // √(p(1−p)(1/n_A + 1/n_B)) with the 2.8016 constant fixed and
    // the pooled rate off c80's exact arm/conversion counts; one
    // division→sqrt→multiply chain per readout (c80's IEEE-
    // deterministic ops). The rel readout divides by the same
    // unrounded p so the two columns can't drift. Two events
    // aggregates; 1-row output.
    "c89_power_mde" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
      val arm = ev.select(col("user_id")).distinct()
        .select(col("user_id"),
          when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
            Sampling.HashMod / 2, "A").otherwise("B").as("arm"))
      val conv = ev.filter(col("event_type") === "purchase" &&
          col("value") >= 95.0)
        .select(col("user_id")).distinct()
        .withColumn("converted", lit(1L))
      val agg = arm.join(conv, Seq("user_id"), "left")
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
          sum(coalesce(col("converted"), lit(0L))).as("conv_pool"))
      val p = col("conv_pool").cast("double") / (col("n_a") + col("n_b"))
      val mde = lit(2.8016) * sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      agg.select(col("n_a"), col("n_b"), col("conv_pool"),
        round(p, 4).as("p_pool"),
        round(mde, 4).as("mde_abs"),
        round(mde / p, 4).as("mde_rel"))
    }),

    // SHAPLEY MULTI-TOUCH ATTRIBUTION — the game-theoretic split
    // beside c83's last-touch (last-touch hands the whole conversion
    // to the final channel; Shapley splits it fairly over every
    // channel that participated — the two bracket marketing's
    // attribution argument): each purchase is the unanimity game
    // over its distinct prior channels, whose Shapley value is
    // exactly 1/|set| per member (see shapleyAttribution — the
    // sum-of-unanimity-games identity makes the equal split THE
    // Shapley value, not a heuristic). Credits on the 10⁻⁶ DIV grid;
    // one user-shuffle window pass, channel-grain everything after.
    "c87_shapley_attribution" -> ((spark, sfDir) =>
      shapleyAttribution(
        t(spark, sfDir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")))
        .orderBy(col("channel"))),

    // TIME-WEIGHTED AVERAGE — the metrics/sensor staple a plain AVG
    // gets wrong on irregular samples: each reading holds until the
    // next one, so it weighs by its holding interval. The entire
    // aggregation is exact integers — values as FLOOR(value·100)
    // cents, intervals as exact µs from the lag window — because
    // Σ v·Δt telescopes to ≤ v_max · span, the weighted sum stays
    // under 2⁶³ at ANY event count (bounded by time, not volume —
    // the property that makes this safe at 100 TB where a float SUM's
    // accumulation order would already have diverged). One user
    // shuffle for the lead window, one partial-aggregated sum, two
    // correctly-rounded divisions at the end. Single-reading users
    // have no holding interval and are excluded (span = 0).
    "c81_time_weighted_avg" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(spark, sfDir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("v_cents"))
        .withColumn("dt",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("span_us"),
          sum(col("v_cents") * col("dt")).as("vw"))
        .filter(col("span_us") > 0)
        .select(col("user_id"), col("n_intervals"), col("span_us"),
          round(col("vw").cast("double") / col("span_us") / 100, 4)
            .as("twa"))
        .orderBy(col("user_id"))
    }),

    // CUPED VARIANCE REDUCTION — the adjustment an experimentation
    // platform applies before reading c80's lift: a user's
    // pre-experiment activity X (events in days ≤ 14) predicts their
    // experiment-period outcome Y (purchase cents in days 15-24), so
    // y_adj = y − θ(x − x̄) with θ = cov(X,Y)/var(X) removes the
    // predictable variance and shrinks the confidence interval at
    // the same sample size. Every sufficient statistic (n, Σx, Σy,
    // Σxy, Σx², Σy², per-arm n/Σx/Σy) is an exact integer from one
    // partial-aggregated pass; θ, the adjusted means and the
    // variance-reduction ratio ρ² = cov²/(varX·varY) are then a
    // division/multiply-only IEEE chain over those integers (the c80
    // argument: correctly-rounded ops on identical inputs are
    // bit-identical across engines — the Σy² products are cast to
    // double BEFORE the n· multiply so no 2⁶³ bound is ever at
    // risk). X uses the PRE-period only — the same point-in-time
    // discipline as x123, here so the covariate cannot absorb the
    // treatment effect itself.
    "c82_cuped_adjust" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"),
          col("event_type"), col("value"))
      val x = ev.filter(col("d") <= 14)
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      val y = ev.filter(col("d") > 14 && col("d") <= 24 &&
          col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      val users = ev.select(col("user_id")).distinct()
        .join(x, Seq("user_id"), "left").join(y, Seq("user_id"), "left")
        .select(col("user_id"),
          when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
            Sampling.HashMod / 2, "A").otherwise("B").as("arm"),
          coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val g = users.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      def arm(v: String) = users.filter(col("arm") === v)
        .agg(count(lit(1)).as(s"n_$v"), sum(col("x")).as(s"sx_$v"),
          sum(col("y")).as(s"sy_$v"))
      def d(c: Column) = c.cast("double")
      val covN = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
      val varX = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
      val varY = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
      val theta = covN / varX
      val xbar = d(col("sx")) / col("n")
      def meanY(v: String) = d(col(s"sy_$v")) / col(s"n_$v")
      def adj(v: String) =
        meanY(v) - theta * (d(col(s"sx_$v")) / col(s"n_$v") - xbar)
      g.crossJoin(broadcast(arm("A"))).crossJoin(broadcast(arm("B")))
        .select(col("n_A").as("n_a"), col("n_B").as("n_b"),
          round(meanY("A"), 4).as("mean_y_a"),
          round(meanY("B"), 4).as("mean_y_b"),
          round(adj("A"), 4).as("adj_y_a"),
          round(adj("B"), 4).as("adj_y_b"),
          round(theta, 6).as("theta"),
          round(lit(100.0) * covN * covN / (varX * varY), 4)
            .as("var_reduction_pct"),
          round(adj("A") - adj("B"), 4).as("adjusted_lift_cents"))
    }),

    // LAST-TOUCH ATTRIBUTION — the marketing-analytics read of the
    // event stream (c73 asks "did the path complete"; attribution
    // asks "which touchpoint gets credit for the money"): each
    // purchase credits the LAST non-purchase event within 30 minutes
    // before it, else 'direct'. The carry-forward is c68's
    // IGNORE-NULLS last_value over the per-user (ts, event_id)
    // order — one user shuffle, no self-join — and the 30-minute
    // freshness gate compares exact µs. Revenue rides integer cents
    // (c79's float-sum argument); the channel report is
    // |event_types|-bounded with a broadcast total for shares.
    "c83_attribution" -> ((spark, sfDir) =>
      lastTouchAttribution(
        t(spark, sfDir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value")),
        windowUs = 1800000000L)
        .orderBy(col("channel"))),

    // KAPLAN–MEIER SURVIVAL — time-to-conversion beside c74's
    // retention triangle (retention reports cohort shares at fixed
    // offsets; KM estimates the time-to-event FUNCTION while
    // correctly using right-censored subjects — dropping them biases
    // the curve down, counting them as non-events biases it up; the
    // product-limit estimator is the standard answer). Subject: one
    // per user, t = days from first activity to first HIGH-VALUE
    // purchase (value > 90 — c80's shared conversion definition);
    // never-converters are censored at their last active day. Report:
    // per-event-time at-risk count, events, censored, S(t) at 4 dp.
    // See [[kaplanMeier]] for the fixed-point ln-sum discipline that
    // makes an inherently multiplicative estimator hash-oracle-able.
    "c84_kaplan_meier" -> ((spark, sfDir) => {
      val a = t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
      val life = a.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("dl"))
      val conv = a
        .filter(col("event_type") === "purchase" && col("value") > 90)
        .groupBy(col("user_id")).agg(min(col("d")).as("dp"))
      val subj = life.join(conv, Seq("user_id"), "left")
        .select(
          when(col("dp").isNotNull, col("dp") - col("d0"))
            .otherwise(col("dl") - col("d0")).as("t_day"),
          col("dp").isNotNull.as("died"))
      kaplanMeier(subj).orderBy(col("t_day"))
    }),

    // NELSON–AALEN CUMULATIVE HAZARD — c84's counting process through
    // the additive estimator (see [[nelsonAalen]]): same subjects,
    // same censoring, hazard increments instead of survival factors,
    // with the Breslow S̃(t) = exp(−H) readout beside KM's
    // product-limit S(t) for direct comparison.
    "c94_nelson_aalen" -> ((spark, sfDir) => {
      val a = t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
      val life = a.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("dl"))
      val conv = a
        .filter(col("event_type") === "purchase" && col("value") > 90)
        .groupBy(col("user_id")).agg(min(col("d")).as("dp"))
      val subj = life.join(conv, Seq("user_id"), "left")
        .select(
          when(col("dp").isNotNull, col("dp") - col("d0"))
            .otherwise(col("dl") - col("d0")).as("t_day"),
          col("dp").isNotNull.as("died"))
      nelsonAalen(subj).orderBy(col("t_day"))
    }),

    // HARRELL'S C-INDEX — does a BASELINE risk score rank
    // time-to-conversion correctly? (c84/c94 estimate the curve, c97
    // compares two arms; the c-index grades a continuous scorer the
    // way x186's AUC grades a classifier, but censoring-correct: only
    // pairs whose ordering the data actually reveals count.) Score:
    // first-active-day event count (known at baseline — no
    // post-baseline leakage), capped to a 64-slot axis. A pair is
    // comparable iff the earlier subject CONVERTED strictly before
    // the other's observed time; concordant iff that earlier
    // converter carried the higher score, score ties count ½. The
    // quadratic pair set is never materialized: subjects collapse to
    // (t_day, score) cells on a 366×64 dense grid (t_day is bounded
    // by the one-year event window), suffix sums over t within score
    // give the later-time mass, prefix sums over score within t split
    // it by score relation — three windows over the CONSTANT-size
    // grid, so the whole statistic costs one subject aggregation
    // regardless of corpus size, all BIGINT until one double division.
    "c98_c_index" -> ((spark, sfDir) => {
      val a = t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
      val life = a.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("dl"))
      val conv = a
        .filter(col("event_type") === "purchase" && col("value") > 90)
        .groupBy(col("user_id")).agg(min(col("d")).as("dp"))
      val risk = a.join(life.select(col("user_id"), col("d0")), "user_id")
        .filter(col("d") === col("d0"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("s_cnt"))
      val subj = life.join(conv, Seq("user_id"), "left")
        .join(risk, Seq("user_id"))
        .select(
          when(col("dp").isNotNull, col("dp") - col("d0"))
            .otherwise(col("dl") - col("d0")).as("t_day"),
          col("dp").isNotNull.as("died"),
          least(col("s_cnt"), lit(63L)).as("s"))
      cIndexFromSubjects(subj)
    }),

    // DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator
    // beside c80's randomized lift and c82's CUPED (when assignment
    // is NOT randomized over time, the pre-period difference is the
    // confound; DiD nets it out under the parallel-trends
    // assumption): 2×2 cells over (c80's hash arm as the treated/
    // control split) × (pre/post day 13), spend in integer cents
    // (c79's float-sum rule). Four exact (n, Σcents) cells from ONE
    // partial-aggregatable fact pass; each cell mean is one double
    // division, and the DiD contrast is a fixed four-term expression
    // over those scalars — windows run over the 4-row cell frame.
    "c95_diff_in_diff" -> ((spark, sfDir) =>
      didFromCells(didCellsOf(t(spark, sfDir, "events")))),

    // LOG-RANK TEST — does time-to-conversion DIFFER between the two
    // arms? (c84/c94 estimate one curve; the log-rank test is the
    // standard censoring-correct comparison of two): at every pooled
    // event time, observed arm-A events vs the hypergeometric
    // expectation d·n_A/n, with the matching variance term; χ²₁ =
    // (ΣO−E)²/ΣV. The at-risk bookkeeping is exact integer windows
    // over the ≤|distinct event times| frame (per-arm daily (d, c)
    // tables full-outer-joined onto one time spine, cumulative-prior
    // sums for the at-risk counts); each time contributes ONE O−E and
    // ONE V double expression regridded to 10⁻⁹, so the statistic is
    // a fixed expression over two BIGINT sums. One fact pass total.
    "c97_logrank" -> ((spark, sfDir) => {
      val spine = survivalRiskSpine(spark, sfDir)
        .withColumn("oe_fp", round(
          (col("d_A") * col("nt") - col("dt") * col("risk_a"))
            .cast("double") / col("nt").cast("double") *
            1000000000.0, 0).cast("long"))
        .withColumn("v_fp", when(col("nt") > 1, round(
          col("dt").cast("double") * col("risk_a").cast("double") *
            (col("nt") - col("risk_a")).cast("double") *
            (col("nt") - col("dt")).cast("double") /
            (col("nt").cast("double") * col("nt").cast("double") *
              (col("nt") - 1).cast("double")) * 1000000000.0, 0)
          .cast("long")).otherwise(0L))
      spine.agg(
        max(col("n_a0")).as("n_a"), max(col("n_b0")).as("n_b"),
        sum(col("d_A")).as("events_a"), sum(col("d_B")).as("events_b"),
        sum(col("oe_fp")).as("oe_sum_fp"), sum(col("v_fp")).as("v_sum_fp"))
        .select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
          round(col("oe_sum_fp").cast("double") / 1000000000.0, 4)
            .as("o_minus_e"),
          when(col("v_sum_fp") > 0, round(
            col("oe_sum_fp").cast("double") * col("oe_sum_fp").cast("double") /
              (lit(1000000000.0) * col("v_sum_fp").cast("double")), 6))
            .as("chi2"))
    }),

    // MANTEL–HAENSZEL HAZARD RATIO — c97 answers "DO the arms
    // differ"; this estimates BY HOW MUCH, without fitting a Cox
    // model: over the SAME risk spine, HR_MH = Σ(d_A·riskB/n_t) /
    // Σ(d_B·riskA/n_t) — the closed-form stratified odds estimator
    // that equals the Cox MLE to first order. Each per-time term
    // regrids to 10⁻⁹ (c97's discipline), the ratio is ONE division
    // over two exact sums, and ln HR rides along for CI work.
    "c99_mantel_haenszel_hr" -> ((spark, sfDir) => {
      val spine = survivalRiskSpine(spark, sfDir)
        .withColumn("num_fp", round(
          (col("d_A") * col("risk_b")).cast("double") /
            col("nt").cast("double") * 1000000000.0, 0).cast("long"))
        .withColumn("den_fp", round(
          (col("d_B") * col("risk_a")).cast("double") /
            col("nt").cast("double") * 1000000000.0, 0).cast("long"))
      spine.agg(
        max(col("n_a0")).as("n_a"), max(col("n_b0")).as("n_b"),
        sum(col("d_A")).as("events_a"), sum(col("d_B")).as("events_b"),
        sum(col("num_fp")).as("num_sum_fp"), sum(col("den_fp")).as("den_sum_fp"))
        .select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
          when(col("den_sum_fp") > 0L,
            round(col("num_sum_fp").cast("double") /
              col("den_sum_fp").cast("double"), 6)).as("hr_mh"),
          when(col("den_sum_fp") > 0L && col("num_sum_fp") > 0L,
            round(log(col("num_sum_fp").cast("double") /
              col("den_sum_fp").cast("double")), 6)).as("ln_hr"))
    }),

    // QINI UPLIFT CURVE — the causal twin of x169's gain curve:
    // x169 ranks by score and reads captured POSITIVES; Qini ranks
    // by score and reads INCREMENTAL conversions of the treated arm
    // over the control at each decile — the targeting readout an
    // uplift model ships with. Users get c82's pre-period activity
    // as the score (leakage-free by construction), c80's hash arm,
    // and the survival family's post-period conversion outcome;
    // deciles are one deterministic ntile window (score desc, id
    // tiebreak), each decile's LOCAL increment is conv_t −
    // conv_c·n_t/n_c in ONE division, and the cumulative curve is
    // the canonical Q(φ) = conv_t(≤φ) − conv_c(≤φ)·N_t(≤φ)/N_c(≤φ)
    // derived from cumulative arm totals (NOT a sum of per-decile
    // increments, which would drift when hash-arm shares fluctuate
    // across deciles) — four 10-row prefix windows, one division.
    "c100_qini_curve" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
        .select(col("user_id"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"),
          col("event_type"), col("value"))
      val score = ev.filter(col("d") <= 14)
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      val conv = ev.filter(col("d") > 14 && col("d") <= 24 &&
          col("event_type") === "purchase" && col("value") > 90)
        .groupBy(col("user_id")).agg(max(lit(1L)).as("conv"))
      val users = ev.select(col("user_id")).distinct()
        .join(score, Seq("user_id"), "left")
        .join(conv, Seq("user_id"), "left")
        .select(col("user_id"),
          when((col("user_id") * Sampling.HashMul) % Sampling.HashMod <
            Sampling.HashMod / 2, "A").otherwise("B").as("arm"),
          coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("conv"), lit(0L)).as("conv"))
      val dec = users.withColumn("decile",
        ntile(10).over(Window.orderBy(desc("x"), col("user_id"))))
      def dd(c: Column) = c.cast("double")
      val cum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec.groupBy(col("decile"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_t"),
          sum(when(col("arm") === "A", col("conv")).otherwise(0L))
            .as("conv_t"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_c"),
          sum(when(col("arm") === "B", col("conv")).otherwise(0L))
            .as("conv_c"))
        .withColumn("qini",
          when(col("n_c") > 0L,
            round(dd(col("conv_t")) -
              dd(col("conv_c")) * dd(col("n_t")) / dd(col("n_c")), 4)))
        .withColumn("c_n_t", sum(col("n_t")).over(cum))
        .withColumn("c_conv_t", sum(col("conv_t")).over(cum))
        .withColumn("c_n_c", sum(col("n_c")).over(cum))
        .withColumn("c_conv_c", sum(col("conv_c")).over(cum))
        .withColumn("cum_qini",
          when(col("c_n_c") > 0L,
            round(dd(col("c_conv_t")) -
              dd(col("c_conv_c")) * dd(col("c_n_t")) / dd(col("c_n_c")), 4)))
        .select(col("decile"), col("n_t"), col("conv_t"), col("n_c"),
          col("conv_c"), col("qini"), col("cum_qini"))
        .orderBy(col("decile"))
    }),

    // RESTRICTED MEAN SURVIVAL TIME — the effect-size completion of
    // the survival family (c97 tests, c99 estimates a RATIO; RMST
    // reads the absolute "mean conversion-free days within the first
    // τ = 20" per arm and their difference — the number a hazard
    // ratio can't give when hazards cross): per-arm KM products as
    // exp(Σ ln((risk−d)/risk)) over the bounded time spine
    // (cumulative ln-sum window in day order — deterministic
    // sequential accumulation), RMST = Σ S(t_i)·clip(gap, τ) with
    // the leading [0, t₁) interval at S = 1. A risk set ever hitting
    // zero reads NULL (the guard, not a crash).
    "c101_rmst" -> ((spark, sfDir) => {
      val tau = 20.0
      def dd(c: Column) = c.cast("double")
      val byT = Window.orderBy(col("t_day"))
      val cumIncl = byT.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val spine = survivalRiskSpine(spark, sfDir)
        .withColumn("ln_a", when(col("risk_a") > col("d_A"),
          log((dd(col("risk_a")) - dd(col("d_A"))) / dd(col("risk_a")))))
        .withColumn("ln_b", when(col("risk_b") > col("d_B"),
          log((dd(col("risk_b")) - dd(col("d_B"))) / dd(col("risk_b")))))
        .withColumn("s_a", exp(sum(col("ln_a")).over(cumIncl)))
        .withColumn("s_b", exp(sum(col("ln_b")).over(cumIncl)))
        .withColumn("zero_risk", max(when(col("risk_a") <= col("d_A") ||
          col("risk_b") <= col("d_B"), 1L).otherwise(0L))
          .over(Window.partitionBy(lit(1))))
        .withColumn("t_next",
          coalesce(lead(col("t_day"), 1).over(byT), lit(Int.MaxValue)))
        // interval [t_i, t_{i+1}) clipped to [0, tau]
        .withColumn("gap", greatest(lit(0.0),
          least(dd(col("t_next")), lit(tau)) - dd(col("t_day"))))
      val head = spine.agg(min(col("t_day")).as("t1"))
        .select(least(dd(col("t1")), lit(tau)).as("head_gap"))
      spine.agg(max(col("zero_risk")).as("zr"),
          sum(col("s_a") * col("gap")).as("area_a"),
          sum(col("s_b") * col("gap")).as("area_b"))
        .crossJoin(broadcast(head))
        .select(lit(20).as("tau"),
          when(col("zr") === 0L,
            round(col("head_gap") + col("area_a"), 4)).as("rmst_a"),
          when(col("zr") === 0L,
            round(col("head_gap") + col("area_b"), 4)).as("rmst_b"),
          when(col("zr") === 0L,
            round(col("area_a") - col("area_b"), 4)).as("rmst_diff"))
    }),

    // GEHAN–WILCOXON WEIGHTED LOG-RANK — the early-difference test of
    // the survival family (c97's log-rank weights every event time
    // equally, so late-time noise dilutes an early separation; Gehan
    // weights each time by the at-risk total n_t, the censoring-aware
    // generalization of Wilcoxon): over the SAME risk spine, the
    // weighted O−E term n_t·(d_A − d_t·r_A/n_t) collapses to the
    // EXACT INTEGER n_t·d_A − d_t·r_A (no fixed-point grid needed —
    // the weight cancels the one division c97 must round), and the
    // weighted variance term d_t·r_A·r_B·(n_t−d_t)/(n_t−1) lands in
    // DECIMAL(38,0) via the x225 subtract-remainder floor division
    // (exact in both engines; floor error ≤ 1 per spine row against
    // ~10¹²-scale terms). χ² = W²/Var in ONE final division.
    "c102_gehan_wilcoxon" -> ((spark, sfDir) => {
      val spine = survivalRiskSpine(spark, sfDir)
        .withColumn("w_t",
          col("nt") * col("d_A") - col("dt") * col("risk_a"))
        .withColumn("v_num", expr(
          "CAST(dt AS DECIMAL(38,0)) * risk_a * risk_b * (nt - dt)"))
        .withColumn("v_t", when(col("nt") > 1L, expr(
          "CAST((v_num - v_num % CAST(nt - 1 AS DECIMAL(38,0))) / " +
            "CAST(nt - 1 AS DECIMAL(38,0)) AS DECIMAL(38,0))"))
          .otherwise(lit(0).cast("decimal(38,0)")))
      spine.agg(count(lit(1)).as("n_times"),
          sum(col("d_A")).as("events_a"), sum(col("d_B")).as("events_b"),
          sum(col("w_t")).as("w_stat"), sum(col("v_t")).as("var_w"))
        .select(col("n_times"), col("events_a"), col("events_b"),
          col("w_stat"),
          when(col("var_w") > 0,
            round((col("w_stat").cast("decimal(38,0)") * col("w_stat"))
              .cast("double") / col("var_w").cast("double"), 6))
            .as("chi2"))
    }),

    // E-VALUE — VanderWeele & Ding's sensitivity readout for c99's
    // hazard ratio: the minimum strength of association an UNMEASURED
    // confounder would need with both arm and outcome to explain the
    // observed HR away (the modern observational-causal reporting
    // standard; a hash-arm split is randomized, making this the
    // calibration example). RR* = max(HR, 1/HR) on c99's readout,
    // E = RR* + √(RR*·(RR*−1)) — pure scalar algebra on the 1-row
    // MH frame, no new fact pass.
    "c103_evalue" -> ((spark, sfDir) => {
      def dd(c: Column) = c.cast("double")
      queries("c99_mantel_haenszel_hr")(spark, sfDir)
        .select(col("hr_mh"),
          when(col("hr_mh").isNotNull && col("hr_mh") > 0.0,
            greatest(col("hr_mh"), lit(1.0) / dd(col("hr_mh"))))
            .as("rr_star"))
        .select(col("hr_mh"), round(col("rr_star"), 6).as("rr_star"),
          when(col("rr_star") >= 1.0,
            round(col("rr_star") +
              sqrt(col("rr_star") * (col("rr_star") - 1.0)), 6))
            .as("evalue"))
    }),

    // CUMULATIVE INCIDENCE (AALEN–JOHANSEN) — competing risks done
    // right (c84's KM treats "the other event" as censoring, which
    // OVERSTATES each cause's incidence — the 1−KM bias every
    // competing-risks paper opens with): first qualifying purchase
    // (cause 1) competes with first error (cause 2), ties break to
    // purchase (documented priority); CIF_k(t) = Σ_{u≤t}
    // S(u⁻)·d_k(u)/r(u) with S the ALL-CAUSE KM via c101's
    // deterministic ln-sum windows, the risk set from exact
    // cumulative-prior counts (censored drops included), and the
    // readout per event day. Bounded time-spine rows; one fact pass.
    "c104_cumulative_incidence" -> ((spark, sfDir) => {
      def dd(c: Column) = c.cast("double")
      val a = t(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("d"))
      val life = a.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("dl"))
      val conv = a
        .filter(col("event_type") === "purchase" && col("value") > 90)
        .groupBy(col("user_id")).agg(min(col("d")).as("dc"))
      val err = a.filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(min(col("d")).as("de"))
      val firstConv = col("dc").isNotNull &&
        (col("de").isNull || col("dc") <= col("de"))
      val subj = life.join(conv, Seq("user_id"), "left")
        .join(err, Seq("user_id"), "left")
        .select(
          when(firstConv, col("dc") - col("d0"))
            .when(col("de").isNotNull, col("de") - col("d0"))
            .otherwise(col("dl") - col("d0")).as("t_day"),
          when(firstConv, 1).when(col("de").isNotNull, 2)
            .otherwise(0).as("cause"))
      val nTot = broadcast(subj.agg(count(lit(1)).as("n0")))
      val prior = Window.orderBy(col("t_day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cumIncl = Window.orderBy(col("t_day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      subj.groupBy(col("t_day"))
        .agg(sum(when(col("cause") === 1, 1L).otherwise(0L)).as("d1"),
          sum(when(col("cause") === 2, 1L).otherwise(0L)).as("d2"),
          sum(when(col("cause") === 0, 1L).otherwise(0L)).as("cns"))
        .crossJoin(nTot)
        .withColumn("risk", col("n0") - coalesce(
          sum(col("d1") + col("d2") + col("cns")).over(prior), lit(0L)))
        .filter(col("d1") + col("d2") > 0)
        .withColumn("dt", col("d1") + col("d2"))
        .withColumn("zero_risk",
          max(when(col("risk") <= col("dt"), 1L).otherwise(0L))
            .over(Window.partitionBy(lit(1))))
        .withColumn("ln_s", when(col("risk") > col("dt"),
          log((dd(col("risk")) - dd(col("dt"))) / dd(col("risk")))))
        .withColumn("s_minus",
          exp(coalesce(sum(col("ln_s")).over(prior), lit(0.0))))
        .withColumn("cif1", sum(col("s_minus") * dd(col("d1")) /
          dd(col("risk"))).over(cumIncl))
        .withColumn("cif2", sum(col("s_minus") * dd(col("d2")) /
          dd(col("risk"))).over(cumIncl))
        .select(col("t_day"), col("risk"), col("d1"), col("d2"),
          when(col("zero_risk") === 0L, round(col("cif1"), 4))
            .as("cif_conv"),
          when(col("zero_risk") === 0L, round(col("cif2"), 4))
            .as("cif_err"))
        .orderBy(col("t_day"))
    }),

    // INTERRUPTED TIME SERIES — the single-group causal design beside
    // c95's two-group DiD (no control group? fit the trend before and
    // after the intervention and read the LEVEL CHANGE at the break):
    // one-feature OLS of spend cents on day index per segment (pre /
    // post day 13), each fit from four exact BIGINT sums (x196's
    // sufficient-statistic discipline at k=1), slopes/intercepts/the
    // two fits at the breakpoint as fixed double expressions, and the
    // level change as a 2-row window contrast. One fact pass total.
    "c96_interrupted_ts" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
        .select(expr("datediff(to_date(ts), date'2024-01-01')")
          .cast("long").as("x"),
          round(col("value") * 100, 0).cast("long").as("y"))
        .withColumn("segment", when(col("x") < 13, "pre").otherwise("post"))
      val s = ev.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
      def dd(c: String) = col(c).cast("double")
      val den = dd("n") * dd("sxx") - dd("sx") * dd("sx")
      val slope = (dd("n") * dd("sxy") - dd("sx") * dd("sy")) / den
      val icept = (dd("sy") - slope * dd("sx")) / dd("n")
      val fitBreak = icept + slope * 13.0
      val whole = Window.partitionBy(lit(1))
      s.select(col("segment"), col("n"),
        when(den =!= 0.0, round(slope, 6)).as("slope_cents_per_day"),
        when(den =!= 0.0, round(icept, 4)).as("intercept_cents"),
        when(den =!= 0.0, round(fitBreak, 4)).as("fit_at_break"),
        round(max(when(col("segment") === "post" && den =!= 0.0, fitBreak))
          .over(whole) -
          max(when(col("segment") === "pre" && den =!= 0.0, fitBreak))
            .over(whole), 4).as("level_change_cents"))
        .orderBy(col("segment"))
    }),

    // TPC-H Q3 (shipping priority) — the canonical 3-way
    // customer⋈orders⋈lineitem revenue top-k, the published join
    // benchmark shape §2.C's join row should carry verbatim: filters
    // push into all three scans, the dimension side broadcasts, and
    // revenue Σ price·(1−discount) is carried as the EXACT integer
    // cents·(10⁴−discount_bp) so the group sums (and the top-10
    // ordering) are engine-identical — no float accumulation order
    // anywhere near the LIMIT cut. Ordering ties break by date, key.
    "c105_tpch_q3" -> ((spark, sfDir) => {
      val cust = t(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(spark, sfDir, "orders")
        .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
      val li = t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
        .select(col("l_orderkey"), expr(
          "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
          .as("rev_fp"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("rev_fp")).as("rev_fp"))
        .orderBy(desc("rev_fp"), col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          round(col("rev_fp").cast("double") / 1000000.0, 2).as("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
    }),

    // TPC-H Q5 (local supplier volume) — the 6-way
    // region⋈nation⋈customer⋈orders⋈lineitem⋈supplier star join with
    // the c_nationkey = s_nationkey locality constraint: three
    // dimension legs broadcast, the two fact legs equi-join, and the
    // same exact-integer revenue discipline as c105 keeps the
    // per-nation sums and DESC ordering engine-identical.
    "c106_tpch_q5" -> ((spark, sfDir) => {
      val asia = t(spark, sfDir, "region")
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      val nat = t(spark, sfDir, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(spark, sfDir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = t(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = t(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), expr(
          "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
          .as("rev_fp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_fp")).as("rev_fp"))
        .orderBy(desc("rev_fp"), col("n_name"))
        .select(col("n_name"),
          round(col("rev_fp").cast("double") / 1000000.0, 2).as("revenue"))
    }),

    // TPC-H Q17 (small-quantity-order revenue) — the per-group
    // CORRELATED SCALAR-AVERAGE plan class: the canonical correlated
    // subquery (l_quantity < 0.2·avg(l_quantity) over the same part)
    // decorrelates into a per-part aggregate joined back onto the
    // fact scan — the part filter bounds that aggregate to dimension
    // size, so it broadcasts. The 0.2·avg threshold is carried
    // EXACTLY as the integer cross-multiplication 5·qty·cnt < Σqty
    // (quantities are integral), so the qualifying-line set — and
    // with it the cents-summed revenue — is engine-identical with no
    // float threshold anywhere. The synthetic part table carries no
    // p_container; p_type stands in for the second filter leg.
    "c107_tpch_q17" -> ((spark, sfDir) => {
      val pq = t(spark, sfDir, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
        .select(col("p_partkey"))
      val li = t(spark, sfDir, "lineitem")
        .select(col("l_partkey"),
          expr("CAST(ROUND(l_quantity) AS BIGINT)").as("qty"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
            .as("price_c"))
      val pa = li.join(broadcast(pq), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("cnt"))
      li.join(broadcast(pa), Seq("l_partkey"))
        .filter(lit(5L) * col("qty") * col("cnt") < col("sq"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("price_c")).cast("double") / 100.0 / 7.0, 2)
            .as("avg_yearly"))
    }),

    // TPC-H Q18 (large-volume customers) — HAVING-over-subquery
    // top-k: the IN (GROUP BY … HAVING Σqty > 300) subquery becomes
    // a semi-join against the rare big-order key set (AQE broadcasts
    // it), then the 3-way join re-aggregates per order for the
    // top-100 cut. Quantities stay integral BIGINTs end to end; the
    // ordering key is the 2-dec totalprice with date+key tiebreaks.
    "c108_tpch_q18" -> ((spark, sfDir) => {
      val li = t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"),
          expr("CAST(ROUND(l_quantity) AS BIGINT)").as("qty"))
      val big = li.groupBy(col("l_orderkey")).agg(sum(col("qty")).as("oq"))
        .filter(col("oq") > 300L).select(col("l_orderkey").as("bk"))
      val ord = t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      val cust = t(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_name"))
      li.join(big, col("l_orderkey") === col("bk"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("qty")).as("total_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q21 (suppliers who kept orders waiting) — the CHAINED
    // EXISTS / NOT EXISTS existential plan class: per faulty line l1
    // of a finished order, EXISTS another supplier's line in the
    // same order (left-semi with the non-equi suppkey<>) and NOT
    // EXISTS another supplier's FAULTY line (left-anti, same shape).
    // Both probes shuffle on the same l_orderkey the driving join
    // already used. The synthetic lineitem has no commit/receipt
    // dates, so the canonical "received late" marker is replaced by
    // the lineitem-local fault predicate l_tax > l_discount — same
    // correlation structure, same decorrelated semi/anti plans.
    "c109_tpch_q21" -> ((spark, sfDir) => {
      val f = t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_tax") > col("l_discount")).as("fault"))
      val l1 = f.filter(col("fault"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = t(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val nat = t(spark, sfDir, "nation")
        .filter(col("n_name") === "NATION_7").select(col("n_nationkey"))
      val sup = t(spark, sfDir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val l2 = f.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = f.filter(col("fault"))
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      l1.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(l2, col("k2") === col("l_orderkey") &&
          col("s2") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("k3") === col("l_orderkey") &&
          col("s3") =!= col("l_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(100)
    }),

    // TPC-H Q22 (global sales opportunity) — NOT EXISTS plus a
    // substring-code IN list plus a scalar-average subquery, all in
    // one shape: the average-balance threshold is a 1-row broadcast
    // compared EXACTLY by integer cross-multiplication
    // (bal·n > Σbal in cents — no float average), and the "has no
    // orders" anti-join is adapted to "no orders since 2001-01-01"
    // (lapsed customers) because the synthetic lake gives every
    // customer at least one order — same decorrelated anti-join
    // plan, live result at every scale. The country code is the
    // fixed-width tail of c_name (the synthetic schema has no
    // c_phone).
    "c110_tpch_q22" -> ((spark, sfDir) => {
      val c = t(spark, sfDir, "customer")
        .select(substring(col("c_name"), 17, 2).as("cntrycode"),
          col("c_custkey"),
          expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("bal_c"))
        .filter(col("cntrycode").isin(
          "13", "31", "23", "29", "30", "18", "17"))
      val avgpos = c.filter(col("bal_c") > 0L)
        .agg(sum(col("bal_c")).as("s"), count(lit(1)).as("n"))
      val recent = t(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgpos))
        .filter(col("bal_c").cast("decimal(38,0)") * col("n") > col("s"))
        .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("bal_c")).cast("double") / 100.0, 2)
            .as("totacctbal"))
        .orderBy(col("cntrycode"))
    }),

    // TPC-H Q4 (order priority checking) — the correlated EXISTS
    // whose predicate references BOTH relations: the canonical
    // "commitdate < receiptdate" marker isn't in the synthetic
    // schema, so the late-line predicate l_shipdate > o_orderdate
    // + 30 days stands in — and because it correlates on o_orderdate
    // it decorrelates to a left-semi join with an equi leg
    // (orderkey) plus a non-equi leg touching both sides, a plan
    // class none of c24/c56/c109 pin. Quarter filter pushes into the
    // orders scan; the count is exact.
    "c111_tpch_q4" -> ((spark, sfDir) => {
      val ord = t(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q6 (forecasting revenue change) — the pure predicate-
    // pushdown scan-aggregate: every filter (date range, discount
    // band, quantity cap) reaches the parquet scan, no join at all,
    // and revenue Σ price·discount is the exact integer
    // cents·discount_bp so the one output row hash-matches.
    "c112_tpch_q6" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
          round(sum(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "CAST(ROUND(l_discount * 10000) AS BIGINT)")).cast("double") /
            1000000.0, 2).as("revenue"))),

    // TPC-H Q7 (volume shipping) — the two-nation symmetric join
    // with a DISJUNCTIVE cross-relation predicate ((n1,n2) OR
    // (n2,n1)): both nation legs broadcast, the disjunction runs as
    // a residual over the broadcast pair, and revenue groups by
    // (supp_nation, cust_nation, ship year) in exact integers.
    "c113_tpch_q7" -> ((spark, sfDir) => {
      val li = t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
            .as("rev_fp"))
      val n1 = t(spark, sfDir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(spark, sfDir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      li.join(t(spark, sfDir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(t(spark, sfDir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(spark, sfDir, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(round(sum(col("rev_fp")).cast("double") / 1000000.0, 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q8 (national market share) — the 7-relation star with a
    // conditional-share readout: Σ(case nation)/Σ(all) per order
    // year, both sums exact integers so the ONE division per year is
    // engine-identical. Region/nation/part legs broadcast.
    "c114_tpch_q8" -> ((spark, sfDir) => {
      val pt = t(spark, sfDir, "part")
        .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
      val asia = t(spark, sfDir, "region")
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      val custNat = t(spark, sfDir, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("ck"))
      val suppNat = t(spark, sfDir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val li = t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
            .as("rev_fp"))
      li.join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .join(t(spark, sfDir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(spark, sfDir, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(custNat), col("c_nationkey") === col("ck"))
        .join(t(spark, sfDir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(suppNat), col("s_nationkey") === col("sk"))
        .groupBy(col("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("rev_fp"))
            .otherwise(0L)).cast("double") /
            sum(col("rev_fp")).cast("double"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q10 (returned items) — the revenue top-20 over a flag-
    // filtered fact join: returnflag pushes into the lineitem scan,
    // the quarter filter into orders, nation broadcasts, and the
    // top-20 cut orders by the EXACT integer revenue (the published
    // column is its rounded readout) with the key tiebreak.
    "c115_tpch_q10" -> ((spark, sfDir) => {
      val li = t(spark, sfDir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
            .as("rev_fp"))
      val ord = t(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = t(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
      val nat = t(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"))
        .agg(sum(col("rev_fp")).as("rev_fp"))
        .orderBy(desc("rev_fp"), col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          round(col("rev_fp").cast("double") / 1000000.0, 2).as("revenue"),
          col("c_acctbal"))
    }),

    // TPC-H Q13 (customer order-count distribution) — the OUTER-join
    // grouped twice: left join with the join-side filter in the ON
    // clause (customers with zero qualifying orders must survive as
    // count 0), then the count-of-counts rollup. Pins the
    // filter-in-ON outer-join semantics no inner-join query can.
    "c116_tpch_q13" -> ((spark, sfDir) => {
      val ord = t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select(col("o_orderkey"), col("o_custkey"))
      t(spark, sfDir, "customer").select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q14 (promotion effect) — conditional-share over one
    // month's part⋈lineitem join: the part leg broadcasts, both
    // revenue sums are exact integers, ONE division at readout.
    "c117_tpch_q14" -> ((spark, sfDir) => {
      val pt = t(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_type"))
      t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .select(col("l_partkey"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
            .as("rev_fp"))
        .join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("rev_fp")).otherwise(0L))
            .cast("double") /
          sum(col("rev_fp")).cast("double"), 6).as("promo_revenue"))
    }),

    // TPC-H Q15 (top supplier) — the scalar-max subquery closed by
    // an equality join back onto the aggregate: per-supplier quarter
    // revenue (exact integer), its 1-row max broadcast, and the
    // argmax row(s) selected by exact equality — no float compare
    // anywhere near the cut, so ties are engine-identical.
    "c118_tpch_q15" -> ((spark, sfDir) => {
      val rev = t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
          "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))"))
          .as("total_fp"))
      val mx = rev.agg(max(col("total_fp")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_fp") === col("mx"))
        .join(t(spark, sfDir, "supplier")
            .select(col("s_suppkey"), col("s_name")),
          col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_fp").cast("double") / 1000000.0, 2)
            .as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q19 (discounted revenue) — the DISJUNCTIVE join: three
    // OR'd (brand, size-band, quantity-band) conjunctions spanning
    // both relations run as a residual over the partkey equi-join
    // (the equi leg is what keeps this a hash join, not a cartesian
    // — the plan class the OR-heavy reporting queries exercise).
    "c119_tpch_q19" -> ((spark, sfDir) => {
      val pt = t(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
            .as("rev_fp"))
        .join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 30))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("rev_fp")).cast("double") / 1000000.0, 2)
            .as("revenue"))
    }),

    // TPC-DS Q67's plan class — RANK-PER-GROUPING-LEVEL over a
    // ROLLUP: the Expand→HashAggregate→Window→Filter chain no other
    // registered query exercises (c09/c33/c46 stop at the aggregate;
    // the window queries never sit on an Expand). Top-3 quantity
    // shapes at EVERY level of the (returnflag, linestatus,
    // ship-month) hierarchy, ranked within the level: the window
    // partitions by grouping_id over ≤ 3·2·12 leaf rows + rollup
    // margins — support grain. Integral quantities keep the sums and
    // the rank cut exact; the (flag, status, mon) tiebreak makes
    // rank() deterministic because the nulled-out columns of a
    // rollup level are CONSTANT within its gid partition, so Spark's
    // nulls-first vs DuckDB's nulls-last ASC convention cannot
    // reorder anything.
    "c120_rollup_window_topk" -> ((spark, sfDir) => {
      val agg = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"),
          month(col("l_shipdate")).as("m"),
          expr("CAST(ROUND(l_quantity) AS BIGINT)").as("qty"))
        .rollup(col("flag"), col("status"), col("m"))
        .agg(grouping_id().as("gid"), sum(col("qty")).as("sum_qty"))
      val w = Window.partitionBy(col("gid"))
        .orderBy(desc("sum_qty"), col("flag"), col("status"), col("m"))
      agg.withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .select(col("gid"), coalesce(col("flag"), lit("ALL")).as("flag"),
          coalesce(col("status"), lit("ALL")).as("status"),
          coalesce(col("m").cast("string"), lit("ALL")).as("mon"),
          col("sum_qty"), col("rk"))
        .orderBy(col("gid"), col("rk"), col("flag"), col("status"),
          col("mon"))
    }),

    // TPC-DS Q51's plan class — the FULL OUTER join of two
    // cumulative series with a carried-forward running max on top:
    // per user-bucket daily purchase and view counts cumulate
    // independently (each side its own Window), full-outer join on
    // (bucket, day) — either side can have days the other lacks —
    // then MAX OVER rows-unbounded-preceding carries each side's
    // last seen cumulate across the join's null gaps, and the filter
    // keeps the crossover days where cumulative purchases exceed
    // cumulative views. Days before BOTH series have started carry a
    // NULL running value and drop out of the comparison (Q51's own
    // semantics). Three stacked Window nodes around a FullOuter
    // join, all partitioned by bucket over day-grain rows — support
    // grain, exact integer counts end to end.
    "c121_cumulative_crossover" -> ((spark, sfDir) => {
      val ev = t(spark, sfDir, "events")
        .select(pmod(col("user_id"), lit(8)).as("bucket"),
          expr("datediff(to_date(ts), date'2024-01-01')").as("day"),
          col("event_type"))
      def cum(tp: String, out: String) = {
        val byDay = Window.partitionBy(col("bucket")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.filter(col("event_type") === tp)
          .groupBy(col("bucket"), col("day"))
          .agg(count(lit(1)).as("n"))
          .select(col("bucket"), col("day"),
            sum(col("n")).over(byDay).as(out))
      }
      val j = cum("purchase", "cum_p")
        .join(cum("view", "cum_v"), Seq("bucket", "day"), "full_outer")
      val byDay = Window.partitionBy(col("bucket")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      j.select(col("bucket"), col("day").cast("long").as("day"),
          max(col("cum_p")).over(byDay).as("run_p"),
          max(col("cum_v")).over(byDay).as("run_v"))
        .filter(col("run_p") > col("run_v"))
        .orderBy(col("bucket"), col("day"))
    }),

    // TPC-DS Q36's plan class — RANK-WITHIN-PARENT over a ROLLUP,
    // with GROUPING() markers inside the WINDOW PARTITION KEYS (c120
    // partitions by the whole grouping_id; Q36's partition is
    // (lochierarchy, CASE WHEN grouping(class) = 0 THEN category
    // END): leaf rows rank within their parent flag, level-1
    // subtotals rank against each other). The margin ordering key is
    // the EXACT 10⁶ fixed-point floor of Σrev_fp/Σqty computed in
    // DECIMAL(38,0)/HUGEINT (the x296 subtract-the-modulo idiom), so
    // the rank — and the published margin_fp — are engine-identical
    // with no float ratio anywhere. margin_fp is a per-unit AVERAGE:
    // it stays BIGINT-sized at any corpus scale; Σrev_fp itself
    // outgrows 64 bits one decade above the gated lakes, so the sum
    // ACCUMULATES in DECIMAL(38,0) (matching the oracle's HUGEINT)
    // rather than summing BIGINT and casting the wrapped result.
    "c122_rollup_lochierarchy" -> ((spark, sfDir) => {
      val agg = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
            "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))")
            .as("rev_fp"),
          expr("CAST(ROUND(l_quantity) AS BIGINT)").as("qty"))
        .rollup(col("flag"), col("status"))
        .agg(sum(col("rev_fp").cast("decimal(38,0)")).as("srev"),
          sum(col("qty")).as("sqty"),
          grouping(col("flag")).as("gf"), grouping(col("status")).as("gs"))
        .withColumn("loch", (col("gf") + col("gs")).cast("int"))
        .withColumn("m_fp", expr(
          "CAST((CAST(srev AS DECIMAL(38,0)) * 1000000 - " +
            "CAST(srev AS DECIMAL(38,0)) * 1000000 % sqty) / sqty " +
            "AS DECIMAL(38,0))"))
      val w = Window
        .partitionBy(col("loch"), when(col("gs") === 0, col("flag")))
        .orderBy(col("m_fp"), col("flag"), col("status"))
      agg.withColumn("rk", rank().over(w))
        .select(coalesce(col("flag"), lit("ALL")).as("flag"),
          coalesce(col("status"), lit("ALL")).as("status"),
          col("loch"), col("m_fp").cast("long").as("margin_fp"),
          col("rk"))
        .orderBy(desc("loch"), col("flag"), col("status"))
    }),

    // Window-function breadth beyond c12-c14: dense_rank, lead, ntile,
    // and a RANGE frame running aggregate.
    "c39_window_breadth" -> ((spark, sfDir) => {
      val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byValue = Window.partitionBy(col("user_id")).orderBy(col("value"))
      t(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          dense_rank().over(byValue).as("dr"),
          lead(col("value"), 1).over(byTime).as("next_value"),
          ntile(4).over(byTime).as("quartile"),
          round(sum(col("value")).over(
            byValue.rangeBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("run_by_value"))
        .select(col("user_id"), col("event_id"), col("dr"),
          col("next_value"), col("quartile"), col("run_by_value"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(500)
    }),

    // Higher-order-function battery: lambda transform/filter/exists and
    // an aggregate fold over an array column — all codegen'd built-ins,
    // the idiom this library uses instead of UDFs.
    "c40_hof_lambdas" -> ((spark, sfDir) =>
      t(spark, sfDir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(filter(col("toks"), t => length(t) > 4)).as("n_long"),
          aggregate(transform(col("toks"), t => length(t)),
            lit(0L), (a, x) => a + x).as("total_chars"),
          array_max(transform(col("toks"), t => length(t))).as("max_tok"),
          exists(col("toks"), t => t === "the").as("has_the"))
        .orderBy(col("doc_id"))),

    // PIVOT: long-to-wide conditional aggregation (DataFrame pivot with
    // explicit values, so no extra values-discovery job at scale).
    // Pivot cells with no rows come back NULL; COUNT semantics (and the
    // oracle's COUNT(CASE ...)) say 0 — fill so absent combinations
    // don't diverge on other datasets.
    "c41_pivot" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O"))
        .orderBy(col("flag"))),

    // Exact percentiles (interpolated) + sample stddev per group.
    "c42_percentiles" -> ((spark, sfDir) =>
      t(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"))
        .orderBy(col("flag"))),

    // Explicit GROUPING SETS + GROUPING() marker (c09/c33 cover the
    // ROLLUP/CUBE shorthands).
    "c46_grouping_sets" -> sql(
      "SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n, " +
        "CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag " +
        "FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ()) " +
        "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 4"),

    // Multiset set ops (c15-c17 cover the distinct forms); aggregated
    // to (key, multiplicity) so the compare is order-insensitive.
    "c47_setop_all" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer").select(col("c_nationkey").as("key"))
        .intersectAll(t(spark, sfDir, "supplier").select(col("s_nationkey").as("key")))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("key"))),

    // Salted join (operators/Skew): a hot fact key is split into 16
    // deterministic salt buckets; result is identical to the plain
    // join, which is exactly what the oracle checks.
    "c43_salted_join" -> ((spark, sfDir) =>
      graft.operators.Skew.saltedJoin(
        t(spark, sfDir, "events").withColumnRenamed("user_id", "c_custkey"),
        t(spark, sfDir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        key = "c_custkey", saltSrc = col("event_id"), nSalts = 16)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("segment"))),

    // Full-outer join (completes the join-type matrix with c01-c06,
    // c31/c32, c43/c44): unmatched sides surface as nulls, counted
    // into match/left-only/right-only buckets.
    "c45_join_full" -> ((spark, sfDir) =>
      t(spark, sfDir, "customer").select(col("c_custkey"))
        .join(t(spark, sfDir, "orders").select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
            .when(col("o_custkey").isNull, "customer_only")
            .otherwise("order_only").as("side"))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("side"))),

    // Bucketed co-located join: both fact tables are written once as
    // 8-bucket tables on the join key, so the sort-merge join needs NO
    // shuffle exchange (plan-asserted in PlanSpec) — the "pre-shuffle
    // at ingest, join for free forever" layout a 100 TB lake uses for
    // its highest-traffic join.
    "c44_bucketed_join" -> ((spark, sfDir) => {
      val tag = Integer.toHexString(sfDir.hashCode)
      val li = s"li_bucketed_$tag"
      val ord = s"ord_bucketed_$tag"
      // The in-memory catalog starts empty each session, but the
      // warehouse directory persists — drop an orphaned location before
      // re-creating the table, or CTAS fails with LOCATION_ALREADY_EXISTS.
      def ensureBucketed(name: String, df: => DataFrame, key: String): Unit =
        if (!spark.catalog.tableExists(name)) {
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), name)
          val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) fs.delete(loc, true)
          df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
        }
      ensureBucketed(li,
        t(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
        "l_orderkey")
      ensureBucketed(ord,
        t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderkey")
      spark.table(li)
        .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty_sum"))
        .orderBy(col("priority"))
    }),

    // Right-outer join (the c03 mirror — completes the join-type
    // matrix's right row): every customer is preserved from the right
    // side; order counts are 0 where no orders matched.
    "c48_join_right" -> ((spark, sfDir) =>
      t(spark, sfDir, "orders")
        .join(t(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
        .limit(200)),

    // Cross join (explicit, tiny×tiny): region × nation — the one
    // legitimate cartesian in the library. Bounded by construction
    // (5 × 25); large-side cartesians are banned and plan-asserted
    // (PlanSpec's no-cartesian guard covers the dedup/ANN operators).
    "c49_join_cross" -> ((spark, sfDir) =>
      t(spark, sfDir, "region").select(col("r_name"))
        .crossJoin(t(spark, sfDir, "nation").select(col("n_name")))
        .orderBy(col("r_name"), col("n_name"))),

    // GAP-FILL / RESAMPLE — the time-series densification op feature
    // pipelines need: per-user daily totals re-gridded onto each
    // user's full calendar span (sequence() spine, a GENERATED
    // dimension — no calendar table scan) with missing days carried
    // forward via last(..., ignoreNulls) — the IGNORE NULLS window
    // form, which Catalyst evaluates in one pass over the frame.
    // Distribution story (plan-asserted): the upfront
    // repartition(user_id) satisfies the (user_id, day) daily
    // aggregate (superset grouping keys), the span aggregate, the
    // spine⋈daily equi-join (both sides identically partitioned on
    // the key prefix) and the fill window — p08's distribution-reuse
    // pattern stretched across four operators, so NO operator
    // introduces its own differently-keyed exchange. The self-
    // referencing DAG (spine derives from daily, then joins it) makes
    // Spark recompute the daily branch, so the user_id exchange
    // appears once per branch; at 100 TB you'd lake-checkpoint the
    // daily grid (x31's pattern) to also collapse the double scan.
    // Spine rows = Σ per-user day spans, never users ×
    // global-calendar. The daily sum rides the exact-decimal
    // accumulation (p07's pattern) so the 4 dp round is
    // order-independent on both engines.
    "c68_gap_fill" -> ((spark, sfDir) => {
      val daily = t(spark, sfDir, "events")
        .filter(col("user_id") < 100)
        .repartition(col("user_id"))
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value").cast("decimal(30,10)")).cast("double"), 4)
          .as("v"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("value_filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("v").as("value_raw"), col("value_filled"))
        .orderBy(col("user_id"), col("day"))
    }),

    // CONTENT-ADDRESSED HASHING — the cryptographic-digest scalar
    // surface (md5/sha2 are bit-standardized, so unlike xxhash64 the
    // digests oracle exactly): per-doc content ids plus a digest-keyed
    // dup count proving hash-equality ≡ text-equality on this corpus
    // (the content-addressed ledger key an x01-style dedup persists).
    // Stateless codegen'd map + one hash-groupBy.
    "c69_content_hash" -> ((spark, sfDir) => {
      val d = t(spark, sfDir, "documents")
        .select(col("doc_id"), md5(col("text")).as("md5_hex"),
          sha2(col("text"), 256).as("sha256_hex"))
      val dupes = d.groupBy(col("sha256_hex"))
        .agg(count(lit(1)).as("n_same_content"))
      d.join(dupes, "sha256_hex")
        .select(col("doc_id"), col("md5_hex"), col("sha256_hex"),
          col("n_same_content"))
        .orderBy(col("doc_id"))
    }),

    // PAGINATION — ORDER BY … LIMIT … OFFSET (the keyless page-2
    // fetch a result API serves; deterministic only over a total
    // order, hence the unique-key sort). Spark plans the offset into
    // the limit operator (CollectLimit with skip) — no full
    // materialization of the skipped prefix on the driver.
    "c70_offset_pagination" -> ((spark, sfDir) =>
      t(spark, sfDir, "orders")
        .orderBy(col("o_orderkey"))
        .offset(50)
        .limit(25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")))
  )

  val oracles: Map[String, String] = Map(
    "c01_join_broadcast" ->
      ("SELECT c_mktsegment AS segment, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    "c02_join_large" ->
      ("SELECT o_orderpriority AS priority, COUNT(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1"),
    "c03_join_left" ->
      ("SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer " +
        "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1 LIMIT 200"),
    "c48_join_right" ->
      ("SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM orders " +
        "RIGHT JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1 LIMIT 200"),
    "c49_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY 1, 2",
    "c04_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey LIMIT 100"),
    "c05_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey) " +
        "ORDER BY c_custkey LIMIT 100"),
    "c06_join_multiway" ->
      ("SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2 ORDER BY 1, 2"),
    "c07_agg_tpch_q1" ->
      ("SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n, " +
        "ROUND(SUM(l_quantity), 2) AS sum_qty, ROUND(SUM(l_extendedprice), 2) AS sum_price, " +
        "ROUND(AVG(l_discount), 6) AS avg_disc FROM lineitem " +
        "WHERE l_shipdate < '1998-09-01' GROUP BY 1, 2 ORDER BY 1, 2"),
    "c08_agg_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders FROM orders",
    "c09_agg_rollup" ->
      ("SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST"),
    "c10_agg_having" ->
      ("SELECT user_id, COUNT(*) AS n FROM events " +
        "GROUP BY user_id HAVING COUNT(*) > 15 ORDER BY user_id"),
    "c12_window_rownum" ->
      ("SELECT o_custkey, o_orderkey, rn FROM (" +
        "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (" +
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t " +
        "WHERE rn <= 2 ORDER BY o_custkey, rn LIMIT 300"),
    "c13_window_running" ->
      ("SELECT user_id, event_id, ROUND(SUM(value) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id), 2) AS running_value " +
        "FROM events ORDER BY user_id, event_id LIMIT 500"),
    "c14_window_lag" ->
      ("SELECT user_id, event_id, value, LAG(value, 1) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev_value " +
        "FROM events ORDER BY user_id, event_id LIMIT 500"),
    "c15_setop_union" ->
      ("SELECT c_nationkey AS key FROM customer " +
        "UNION SELECT s_nationkey AS key FROM supplier ORDER BY key"),
    "c16_setop_intersect" ->
      ("SELECT c_nationkey AS key FROM customer " +
        "INTERSECT SELECT s_nationkey AS key FROM supplier ORDER BY key"),
    "c17_setop_except" ->
      ("SELECT c_nationkey AS key FROM customer " +
        "EXCEPT SELECT s_nationkey AS key FROM supplier ORDER BY key"),
    "c18_scalar_string" ->
      ("SELECT c_custkey, UPPER(c_name) AS uname, SUBSTRING(c_name, 1, 8) AS prefix, " +
        "CAST(LENGTH(c_name) AS INTEGER) AS name_len, " +
        "c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS tag " +
        "FROM customer ORDER BY c_custkey LIMIT 100"),
    "c19_scalar_date" ->
      ("SELECT o_orderkey, STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate, " +
        "CAST(YEAR(o_orderdate) AS INTEGER) AS yr, CAST(MONTH(o_orderdate) AS INTEGER) AS mo, " +
        "STRFTIME(CAST(DATE_TRUNC('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start, " +
        "CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since " +
        "FROM orders ORDER BY o_orderkey LIMIT 100"),
    "c71_interval_arith" ->
      ("SELECT event_id, " +
        "STRFTIME(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS ts_plus90, " +
        "CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hh, " +
        "CAST(EXTRACT(minute FROM ts) AS INTEGER) AS mi, " +
        "CAST(DATE_DIFF('second', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS sec_since, " +
        "CAST(DATE_DIFF('second', TIMESTAMP '2024-01-01', ts) // 900 AS BIGINT) AS bucket15 " +
        "FROM events ORDER BY event_id LIMIT 100"),
    "c20_scalar_cond" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice > 300000 THEN 'big' " +
        "WHEN o_totalprice > 150000 THEN 'mid' ELSE 'small' END AS bucket, " +
        "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status " +
        "FROM orders ORDER BY o_orderkey LIMIT 200"),
    "c21_predicates" ->
      ("SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag IN ('A', 'R') " +
        "AND l_quantity BETWEEN 10 AND 20 AND l_linestatus LIKE 'F%'"),
    "c22_scalar_json" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id LIMIT 200"),
    "c23_scalar_math" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS net, " +
        "CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor, " +
        "ROUND(ABS(l_discount - 0.05), 4) AS disc_dev " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300"),
    "c24_subquery_scalar" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > (SELECT 2 * MIN(o_totalprice) FROM orders) " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
    "c25_cte" ->
      ("WITH per_cust AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1) " +
        "SELECT c_mktsegment AS segment, CAST(SUM(n) AS BIGINT) AS orders_total " +
        "FROM per_cust JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    "c26_union_all" ->
      ("SELECT 'customer' AS src, COUNT(*) AS n FROM customer " +
        "UNION ALL SELECT 'supplier' AS src, COUNT(*) AS n FROM supplier ORDER BY src"),
    "c27_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "c28_udaf_rms" ->
      ("SELECT event_type, ROUND(SQRT(SUM(value * value) / COUNT(*)), 4) AS rms " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c29_udf_severity" ->
      ("SELECT CASE WHEN event_type = 'error' THEN 3 WHEN event_type = 'purchase' THEN 2 " +
        "WHEN event_type = 'signup' THEN 1 ELSE 0 END AS severity, COUNT(*) AS n " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "c30_explode_tokens" ->
      ("SELECT doc_id, token, COUNT(*) AS n FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t " +
        "GROUP BY doc_id, token ORDER BY doc_id, token LIMIT 500"),
    "c31_asof_join" ->
      ("SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS last_click_id " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND c.ts <= p.ts ORDER BY purchase_id"),
    "c32_range_join" ->
      ("SELECT STRFTIME(CAST(a.ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS n_pairs " +
        "FROM events a JOIN events b " +
        "ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE " +
        "GROUP BY 1 ORDER BY 1"),
    "c50_range_pairs" ->
      ("SELECT a.event_id AS a_id, b.event_id AS b_id " +
        "FROM events a JOIN events b " +
        "ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE " +
        "WHERE a.event_type = 'error' AND b.event_type = 'error' " +
        "ORDER BY a_id, b_id"),
    "c51_range_join_2rel" ->
      ("SELECT a.event_id AS error_id, b.event_id AS purchase_id " +
        "FROM events a JOIN events b " +
        "ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE " +
        "WHERE a.event_type = 'error' AND b.event_type = 'purchase' " +
        "ORDER BY error_id, purchase_id"),
    "c52_range_count_2rel" ->
      ("SELECT STRFTIME(CAST(a.ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS n_pairs " +
        "FROM events a JOIN events b " +
        "ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE " +
        "WHERE a.event_type = 'error' AND b.event_type = 'purchase' " +
        "GROUP BY 1 ORDER BY 1"),
    // gaps-and-islands in exact integer micros; explicit ROWS frame
    // (DuckDB's ORDER BY default is RANGE, which groups ts ties —
    // same result here, but the frames should match by construction)
    "c53_sessionize" ->
      ("WITH l AS (SELECT user_id, ts, CASE WHEN epoch_us(ts) - " +
        "LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) " +
        "> 1800000000 THEN 1 ELSE 0 END AS ns FROM events), " +
        "s AS (SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id " +
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq FROM l) " +
        "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, " +
        "COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end " +
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2"),
    // identical text runs on both engines
    "c55_lateral_topn" ->
      ("SELECT c_custkey, o.o_orderkey, o.o_totalprice " +
        "FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o " +
        "ORDER BY c_custkey, o_orderkey"),
    // same recursion; DuckDB's DATE + INTERVAL needs the cast back
    "c54_recursive_spine" ->
      ("WITH RECURSIVE bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, " +
        "MAX(CAST(ts AS DATE)) AS hi FROM events), " +
        "days(day, hi) AS (SELECT lo, hi FROM bounds " +
        "UNION ALL SELECT CAST(day + INTERVAL 1 DAY AS DATE), hi FROM days WHERE day < hi) " +
        "SELECT STRFTIME(day, '%Y-%m-%d') AS day, COALESCE(n, 0) AS n " +
        "FROM days LEFT JOIN (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n " +
        "FROM events GROUP BY 1) c ON days.day = c.d ORDER BY day"),
    // identical text runs on both engines
    "c56_exists_correlated" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 250000) " +
        "AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey " +
        "AND o2.o_orderstatus = 'F') " +
        "ORDER BY c_custkey"),
    // list_* are DuckDB's names for the array_* family; both
    // intersections run over the already-distinct sorted list so the
    // count is representation- and order-independent
    "c57_array_funcs" ->
      ("SELECT doc_id, " +
        "CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq, " +
        "list_min(string_split(text, ' ')) AS min_tok, " +
        "CAST(len(list_intersect(list_sort(list_distinct(string_split(text, ' '))), " +
        "['a', 'the', 'of', 'and', 'to'])) AS INTEGER) AS n_stop_kinds, " +
        "array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '-') AS first3 " +
        "FROM documents ORDER BY doc_id"),
    "c58_listagg" ->
      ("SELECT r_name AS region, " +
        "string_agg(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n_nations " +
        "FROM nation JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY 1 ORDER BY 1"),
    // semantically UNPIVOT; spelled as UNION ALL so the oracle does
    // not depend on the oracle engine's UNPIVOT dialect
    "c59_unpivot" ->
      ("WITH a AS (SELECT l_returnflag AS flag, ROUND(SUM(l_quantity), 2) AS qty, " +
        "ROUND(SUM(l_extendedprice), 2) AS price FROM lineitem GROUP BY 1) " +
        "SELECT flag, 'qty' AS metric, qty AS val FROM a " +
        "UNION ALL SELECT flag, 'price' AS metric, price AS val FROM a " +
        "ORDER BY flag, metric"),
    "c60_nullsafe_join" ->
      ("WITH f AS (SELECT NULLIF(event_type, 'click') AS k FROM events), " +
        "d AS (SELECT DISTINCT k AS dk, COALESCE(k, 'was_click') AS label FROM f) " +
        "SELECT label, COUNT(*) AS n FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.dk " +
        "GROUP BY 1 ORDER BY 1"),
    // numeric RANGE frame over the same integer-micros key
    "c61_window_timerange" ->
      ("SELECT event_id, user_id, " +
        "COUNT(*) OVER w AS n_last_hour, " +
        "ROUND(SUM(value) OVER w, 2) AS sum_last_hour " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    "c62_window_pctrank" ->
      ("SELECT event_id, event_type, " +
        "PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pct_rank, " +
        "CUME_DIST() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cume " +
        "FROM events ORDER BY event_id LIMIT 500"),
    "c63_group_by_all" ->
      ("SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n " +
        "FROM lineitem GROUP BY ALL ORDER BY 1, 2"),
    "c64_try_cast" ->
      ("SELECT event_id, TRY_CAST(event_type AS INTEGER) AS et_int, " +
        "TRY_CAST(SUBSTR(CAST(event_id AS VARCHAR(20)), 1, 2) AS INTEGER) AS id_prefix, " +
        "TRY_CAST(props AS DOUBLE) AS props_num " +
        "FROM events ORDER BY event_id LIMIT 200"),
    "c65_values_join" ->
      ("SELECT e.event_type, v.weight, COUNT(*) AS n, " +
        "ROUND(SUM(e.value * v.weight), 4) AS wsum " +
        "FROM events e JOIN (VALUES ('click', CAST(2.0 AS DOUBLE)), " +
        "('view', CAST(1.0 AS DOUBLE)), ('purchase', CAST(5.0 AS DOUBLE))) " +
        "AS v(event_type, weight) " +
        "ON e.event_type = v.event_type GROUP BY 1, 2 ORDER BY 1"),
    "c66_agg_filter" ->
      ("SELECT event_type, COUNT(*) AS n, " +
        "COUNT(*) FILTER (WHERE value > 50) AS n_big, " +
        "ROUND(SUM(value) FILTER (WHERE value > 50), 4) AS sum_big, " +
        "COUNT(DISTINCT user_id) FILTER (WHERE value <= 50) AS users_small " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "c67_null_ordering" ->
      ("SELECT * FROM (" +
        "SELECT 'first' AS mode, event_id, v FROM (" +
        "SELECT event_id, CASE WHEN value > 50 THEN ROUND(value, 4) END AS v " +
        "FROM events) t ORDER BY v ASC NULLS FIRST, event_id LIMIT 30) a " +
        "UNION ALL SELECT * FROM (" +
        "SELECT 'last' AS mode, event_id, v FROM (" +
        "SELECT event_id, CASE WHEN value > 50 THEN ROUND(value, 4) END AS v " +
        "FROM events) t ORDER BY v ASC NULLS LAST, event_id LIMIT 30) b " +
        "ORDER BY mode, event_id"),
    "c33_agg_cube" ->
      ("SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST"),
    "c34_csv_roundtrip" ->
      ("SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS uid_sum " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c35_json_roundtrip" ->
      ("SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS uid_sum " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c36_join_part" ->
      ("SELECT p_brand AS brand, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1 ORDER BY 1"),
    // same top slice, tiebreak and bounded cumulative window
    "c77_power_users" ->
      ("WITH c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM c), " +
        "top AS (SELECT user_id, n_events, ROW_NUMBER() OVER (" +
        "ORDER BY n_events DESC, user_id) AS rank FROM c " +
        "ORDER BY n_events DESC, user_id LIMIT 15) " +
        "SELECT CAST(rank AS INTEGER) AS rank, user_id, " +
        "CAST(n_events AS BIGINT) AS n_events, " +
        "ROUND(100.0 * CAST(n_events AS DOUBLE) / total, 4) AS share_pct, " +
        "ROUND(100.0 * CAST(SUM(n_events) OVER (ORDER BY rank " +
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total, 4) AS cum_share_pct " +
        "FROM top, t ORDER BY rank"),
    // same conversion/censoring split, the same floored 1e-9 ln grid
    // into an exact cumulative window sum, one exp at readout
    "c84_kaplan_meier" ->
      ("WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        "subj AS (SELECT CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subj FROM subj), " +
        "byt AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c " +
        "FROM subj GROUP BY 1), " +
        "r AS (SELECT t_day, d, c, n_subj - COALESCE(SUM(d + c) OVER (" +
        "ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk " +
        "FROM byt, nn), " +
        "tm AS (SELECT t_day, d, c, n_risk, CASE WHEN n_risk > d THEN " +
        "CAST(FLOOR(LN(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) " +
        "* 1000000000.0) AS BIGINT) ELSE -80000000000 END AS term_fp FROM r), " +
        "cm AS (SELECT t_day, d, c, n_risk, " +
        "CAST(SUM(term_fp) OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_fp " +
        "FROM tm) " +
        "SELECT CAST(t_day AS BIGINT) AS t_day, CAST(n_risk AS BIGINT) AS n_risk, " +
        "d AS n_events, c AS n_censored, " +
        "ROUND(EXP(CAST(cum_fp AS DOUBLE) / 1000000000.0), 4) AS surv " +
        "FROM cm WHERE d > 0 ORDER BY t_day"),
    // same subject frame as c84; hazard terms on the same 10^-9 grid
    "c94_nelson_aalen" ->
      ("WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        "subj AS (SELECT CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subj FROM subj), " +
        "byt AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c " +
        "FROM subj GROUP BY 1), " +
        "r AS (SELECT t_day, d, c, n_subj - COALESCE(SUM(d + c) OVER (" +
        "ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk " +
        "FROM byt, nn), " +
        "tm AS (SELECT t_day, d, c, n_risk, " +
        "CAST(ROUND(CAST(d AS DOUBLE) * 1000000000.0 / CAST(n_risk AS DOUBLE)) AS BIGINT) AS term_fp FROM r), " +
        "cm AS (SELECT t_day, d, c, n_risk, " +
        "CAST(SUM(term_fp) OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h_fp " +
        "FROM tm) " +
        "SELECT CAST(t_day AS BIGINT) AS t_day, CAST(n_risk AS BIGINT) AS n_risk, " +
        "d AS n_events, c AS n_censored, " +
        "ROUND(CAST(h_fp AS DOUBLE) / 1000000000.0, 6) AS cum_hazard, " +
        "ROUND(EXP(-(CAST(h_fp AS DOUBLE) / 1000000000.0)), 4) AS surv_breslow " +
        "FROM cm WHERE d > 0 ORDER BY t_day"),
    // same subject frame as c84 plus the first-day risk score; same
    // dense grid, same three windows, same exact pair algebra
    "c98_c_index" ->
      ("WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        "risk AS (SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS s_cnt " +
        "FROM a JOIN life ON a.user_id = life.user_id AND a.d = life.d0 GROUP BY 1), " +
        "subj AS (SELECT CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died, LEAST(s_cnt, 63) AS s " +
        "FROM life LEFT JOIN conv USING (user_id) JOIN risk USING (user_id)), " +
        "cells AS (SELECT t_day AS t, s, CAST(COUNT(*) AS BIGINT) AS n_all, " +
        "CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS n_died " +
        "FROM subj GROUP BY 1, 2), " +
        s"grid AS (SELECT gt.range AS t, gs.range AS s " +
        s"FROM range(0, $CIndexDays) gt, range(0, $CIndexScoreSlots) gs), " +
        "g0 AS (SELECT grid.t, grid.s, COALESCE(n_all, 0) AS n_all, " +
        "COALESCE(n_died, 0) AS n_died " +
        "FROM grid LEFT JOIN cells ON grid.t = cells.t AND grid.s = cells.s), " +
        "g1 AS (SELECT t, s, n_all, n_died, COALESCE(CAST(SUM(n_all) OVER (" +
        "PARTITION BY s ORDER BY t ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) " +
        "AS BIGINT), 0) AS st FROM g0), " +
        "g2 AS (SELECT t, s, n_all, n_died, st, COALESCE(CAST(SUM(st) OVER (" +
        "PARTITION BY t ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "AS BIGINT), 0) AS aw, CAST(SUM(st) OVER (PARTITION BY t) AS BIGINT) AS lt FROM g1), " +
        "agg AS (SELECT COALESCE(CAST(SUM(n_all) AS BIGINT), 0) AS n_subjects, " +
        "COALESCE(CAST(SUM(n_died * aw) AS BIGINT), 0) AS n_conc, " +
        "COALESCE(CAST(SUM(n_died * (lt - aw - st)) AS BIGINT), 0) AS n_disc, " +
        "COALESCE(CAST(SUM(n_died * st) AS BIGINT), 0) AS n_tied FROM g2) " +
        "SELECT n_subjects, n_conc, n_disc, n_tied, " +
        "CASE WHEN n_conc + n_disc + n_tied > 0 THEN " +
        "ROUND((CAST(n_conc AS DOUBLE) + 0.5 * CAST(n_tied AS DOUBLE)) / " +
        "CAST(n_conc + n_disc + n_tied AS DOUBLE), 6) END AS c_index " +
        "FROM agg"),
    // c84's subject frame with the c80 arm split; same spine/at-risk
    // windows, same per-time 10^-9 regrids, same closing expression
    "c97_logrank" ->
      (s"WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        s"subj AS (SELECT CASE WHEN ((user_id * ${Sampling.HashMul}) % ${Sampling.HashMod}) " +
        s"< ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "na AS (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a0, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b0 FROM subj), " +
        "ta AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_a, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_a " +
        "FROM subj WHERE arm = 'A' GROUP BY 1), " +
        "tb AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_b, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_b " +
        "FROM subj WHERE arm = 'B' GROUP BY 1), " +
        "sp AS (SELECT COALESCE(ta.t_day, tb.t_day) AS t_day, " +
        "COALESCE(d_a, 0) AS d_a, COALESCE(c_a, 0) AS c_a, " +
        "COALESCE(d_b, 0) AS d_b, COALESCE(c_b, 0) AS c_b " +
        "FROM ta FULL OUTER JOIN tb ON ta.t_day = tb.t_day), " +
        "r AS (SELECT sp.*, n_a0, n_b0, " +
        "n_a0 - COALESCE(CAST(SUM(d_a + c_a) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_a, " +
        "n_b0 - COALESCE(CAST(SUM(d_b + c_b) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_b " +
        "FROM sp, na), " +
        "f AS (SELECT *, risk_a + risk_b AS nt, d_a + d_b AS dt FROM r " +
        "WHERE d_a + d_b > 0), " +
        "g3 AS (SELECT *, " +
        "CAST(ROUND(CAST(d_a * nt - dt * risk_a AS DOUBLE) / CAST(nt AS DOUBLE) " +
        "* 1000000000.0) AS BIGINT) AS oe_fp, " +
        "CASE WHEN nt > 1 THEN CAST(ROUND(CAST(dt AS DOUBLE) * CAST(risk_a AS DOUBLE) * " +
        "CAST(nt - risk_a AS DOUBLE) * CAST(nt - dt AS DOUBLE) / " +
        "(CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE)) " +
        "* 1000000000.0) AS BIGINT) ELSE 0 END AS v_fp FROM f) " +
        "SELECT MAX(n_a0) AS n_a, MAX(n_b0) AS n_b, " +
        "CAST(SUM(d_a) AS BIGINT) AS events_a, CAST(SUM(d_b) AS BIGINT) AS events_b, " +
        "ROUND(CAST(SUM(oe_fp) AS DOUBLE) / 1000000000.0, 4) AS o_minus_e, " +
        "CASE WHEN SUM(v_fp) > 0 THEN " +
        "ROUND(CAST(SUM(oe_fp) AS DOUBLE) * CAST(SUM(oe_fp) AS DOUBLE) / " +
        "(1000000000.0 * CAST(SUM(v_fp) AS DOUBLE)), 6) END AS chi2 FROM g3"),
    // c97's risk-table CTEs with the per-time MH terms on the same
    // 10^-9 grid, one ratio
    "c99_mantel_haenszel_hr" ->
      (s"WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        s"subj AS (SELECT CASE WHEN ((user_id * ${Sampling.HashMul}) % ${Sampling.HashMod}) " +
        s"< ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "na AS (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a0, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b0 FROM subj), " +
        "ta AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_a, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_a " +
        "FROM subj WHERE arm = 'A' GROUP BY 1), " +
        "tb AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_b, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_b " +
        "FROM subj WHERE arm = 'B' GROUP BY 1), " +
        "sp AS (SELECT COALESCE(ta.t_day, tb.t_day) AS t_day, " +
        "COALESCE(d_a, 0) AS d_a, COALESCE(c_a, 0) AS c_a, " +
        "COALESCE(d_b, 0) AS d_b, COALESCE(c_b, 0) AS c_b " +
        "FROM ta FULL OUTER JOIN tb ON ta.t_day = tb.t_day), " +
        "r AS (SELECT sp.*, n_a0, n_b0, " +
        "n_a0 - COALESCE(CAST(SUM(d_a + c_a) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_a, " +
        "n_b0 - COALESCE(CAST(SUM(d_b + c_b) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_b " +
        "FROM sp, na), " +
        "f AS (SELECT *, risk_a + risk_b AS nt, d_a + d_b AS dt FROM r " +
        "WHERE d_a + d_b > 0), " +
        "g3 AS (SELECT *, " +
        "CAST(ROUND(CAST(d_a * risk_b AS DOUBLE) / CAST(nt AS DOUBLE) " +
        "* 1000000000.0) AS BIGINT) AS num_fp, " +
        "CAST(ROUND(CAST(d_b * risk_a AS DOUBLE) / CAST(nt AS DOUBLE) " +
        "* 1000000000.0) AS BIGINT) AS den_fp FROM f) " +
        "SELECT MAX(n_a0) AS n_a, MAX(n_b0) AS n_b, " +
        "CAST(SUM(d_a) AS BIGINT) AS events_a, CAST(SUM(d_b) AS BIGINT) AS events_b, " +
        "CASE WHEN SUM(den_fp) > 0 THEN " +
        "ROUND(CAST(SUM(num_fp) AS DOUBLE) / CAST(SUM(den_fp) AS DOUBLE), 6) END AS hr_mh, " +
        "CASE WHEN SUM(den_fp) > 0 AND SUM(num_fp) > 0 THEN " +
        "ROUND(LN(CAST(SUM(num_fp) AS DOUBLE) / CAST(SUM(den_fp) AS DOUBLE)), 6) END AS ln_hr " +
        "FROM g3"),
    // same leakage-free score/arm/outcome frame, same deterministic
    // ntile deciles, same one-division increments and running curve
    "c100_qini_curve" ->
      (s"WITH ev AS (SELECT user_id, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d, " +
        "event_type, value FROM events), " +
        "sc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x FROM ev " +
        "WHERE d <= 14 GROUP BY 1), " +
        "cv AS (SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS conv FROM ev " +
        "WHERE d > 14 AND d <= 24 AND event_type = 'purchase' AND value > 90), " +
        s"u AS (SELECT t.user_id, CASE WHEN ((t.user_id * ${Sampling.HashMul}) % " +
        s"${Sampling.HashMod}) < ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "COALESCE(sc.x, 0) AS x, COALESCE(cv.conv, 0) AS conv " +
        "FROM (SELECT DISTINCT user_id FROM ev) t " +
        "LEFT JOIN sc ON sc.user_id = t.user_id " +
        "LEFT JOIN cv ON cv.user_id = t.user_id), " +
        "dc AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY x DESC, user_id) AS INTEGER) AS decile FROM u), " +
        "g AS (SELECT decile, " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_t, " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_t, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_c, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_c " +
        "FROM dc GROUP BY 1), " +
        "q AS (SELECT decile, n_t, conv_t, n_c, conv_c, " +
        "CASE WHEN n_c > 0 THEN ROUND(CAST(conv_t AS DOUBLE) - " +
        "CAST(conv_c AS DOUBLE) * CAST(n_t AS DOUBLE) / CAST(n_c AS DOUBLE), 4) " +
        "END AS qini, " +
        "CAST(SUM(n_t) OVER w AS BIGINT) AS c_n_t, " +
        "CAST(SUM(conv_t) OVER w AS BIGINT) AS c_conv_t, " +
        "CAST(SUM(n_c) OVER w AS BIGINT) AS c_n_c, " +
        "CAST(SUM(conv_c) OVER w AS BIGINT) AS c_conv_c " +
        "FROM g WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)) " +
        "SELECT decile, n_t, conv_t, n_c, conv_c, qini, " +
        "CASE WHEN c_n_c > 0 THEN ROUND(CAST(c_conv_t AS DOUBLE) - " +
        "CAST(c_conv_c AS DOUBLE) * CAST(c_n_t AS DOUBLE) / CAST(c_n_c AS DOUBLE), 4) " +
        "END AS cum_qini FROM q ORDER BY decile"),
    // c97's risk-table CTEs, per-arm ln-sum KM products, the same
    // clipped-interval integral
    "c101_rmst" ->
      (s"WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        s"subj AS (SELECT CASE WHEN ((user_id * ${Sampling.HashMul}) % ${Sampling.HashMod}) " +
        s"< ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "na AS (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a0, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b0 FROM subj), " +
        "ta AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_a, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_a " +
        "FROM subj WHERE arm = 'A' GROUP BY 1), " +
        "tb AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_b, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_b " +
        "FROM subj WHERE arm = 'B' GROUP BY 1), " +
        "sp AS (SELECT COALESCE(ta.t_day, tb.t_day) AS t_day, " +
        "COALESCE(d_a, 0) AS d_a, COALESCE(c_a, 0) AS c_a, " +
        "COALESCE(d_b, 0) AS d_b, COALESCE(c_b, 0) AS c_b " +
        "FROM ta FULL OUTER JOIN tb ON ta.t_day = tb.t_day), " +
        "r AS (SELECT sp.*, n_a0, n_b0, " +
        "n_a0 - COALESCE(CAST(SUM(d_a + c_a) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_a, " +
        "n_b0 - COALESCE(CAST(SUM(d_b + c_b) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_b " +
        "FROM sp, na), " +
        "f AS (SELECT * FROM r WHERE d_a + d_b > 0), " +
        "w AS (SELECT t_day, risk_a, d_a, risk_b, d_b, " +
        "CASE WHEN risk_a > d_a THEN LN((CAST(risk_a AS DOUBLE) - CAST(d_a AS DOUBLE)) / " +
        "CAST(risk_a AS DOUBLE)) END AS ln_a, " +
        "CASE WHEN risk_b > d_b THEN LN((CAST(risk_b AS DOUBLE) - CAST(d_b AS DOUBLE)) / " +
        "CAST(risk_b AS DOUBLE)) END AS ln_b FROM f), " +
        "s AS (SELECT t_day, risk_a, d_a, risk_b, d_b, " +
        "EXP(SUM(ln_a) OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING)) AS s_a, " +
        "EXP(SUM(ln_b) OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING)) AS s_b, " +
        "MAX(CASE WHEN risk_a <= d_a OR risk_b <= d_b THEN 1 ELSE 0 END) OVER () AS zr, " +
        "COALESCE(LEAD(t_day) OVER (ORDER BY t_day), 2147483647) AS t_next FROM w), " +
        "g AS (SELECT zr, s_a, s_b, GREATEST(0.0, " +
        "LEAST(CAST(t_next AS DOUBLE), 20.0) - CAST(t_day AS DOUBLE)) AS gap FROM s), " +
        "hd AS (SELECT LEAST(CAST(MIN(t_day) AS DOUBLE), 20.0) AS head_gap FROM f), " +
        "z AS (SELECT MAX(zr) AS zr, SUM(s_a * gap) AS area_a, " +
        "SUM(s_b * gap) AS area_b FROM g) " +
        "SELECT 20 AS tau, " +
        "CASE WHEN zr = 0 THEN ROUND(head_gap + area_a, 4) END AS rmst_a, " +
        "CASE WHEN zr = 0 THEN ROUND(head_gap + area_b, 4) END AS rmst_b, " +
        "CASE WHEN zr = 0 THEN ROUND(area_a - area_b, 4) END AS rmst_diff " +
        "FROM z, hd"),
    // c97's risk-table CTEs; the n_t weight cancels the division so
    // W is an exact BIGINT, variance terms in HUGEINT floor division
    "c102_gehan_wilcoxon" ->
      (s"WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        s"subj AS (SELECT CASE WHEN ((user_id * ${Sampling.HashMul}) % ${Sampling.HashMod}) " +
        s"< ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "na AS (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a0, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b0 FROM subj), " +
        "ta AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_a, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_a " +
        "FROM subj WHERE arm = 'A' GROUP BY 1), " +
        "tb AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_b, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_b " +
        "FROM subj WHERE arm = 'B' GROUP BY 1), " +
        "sp AS (SELECT COALESCE(ta.t_day, tb.t_day) AS t_day, " +
        "COALESCE(d_a, 0) AS d_a, COALESCE(c_a, 0) AS c_a, " +
        "COALESCE(d_b, 0) AS d_b, COALESCE(c_b, 0) AS c_b " +
        "FROM ta FULL OUTER JOIN tb ON ta.t_day = tb.t_day), " +
        "r AS (SELECT sp.*, n_a0, n_b0, " +
        "n_a0 - COALESCE(CAST(SUM(d_a + c_a) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_a, " +
        "n_b0 - COALESCE(CAST(SUM(d_b + c_b) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_b " +
        "FROM sp, na), " +
        "f AS (SELECT *, risk_a + risk_b AS nt, d_a + d_b AS dt FROM r " +
        "WHERE d_a + d_b > 0), " +
        "g AS (SELECT *, nt * d_a - dt * risk_a AS w_t, " +
        "CASE WHEN nt > 1 THEN " +
        "(CAST(dt AS HUGEINT) * risk_a * risk_b * (nt - dt)) // CAST(nt - 1 AS HUGEINT) " +
        "ELSE CAST(0 AS HUGEINT) END AS v_t FROM f) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_times, " +
        "CAST(SUM(d_a) AS BIGINT) AS events_a, CAST(SUM(d_b) AS BIGINT) AS events_b, " +
        "CAST(SUM(w_t) AS BIGINT) AS w_stat, " +
        "CASE WHEN SUM(v_t) > 0 THEN " +
        "ROUND(CAST(CAST(SUM(w_t) AS HUGEINT) * SUM(w_t) AS DOUBLE) / " +
        "CAST(SUM(v_t) AS DOUBLE), 6) END AS chi2 FROM g"),
    // c99's MH chain wrapped; E-value off the 6-dp hr_mh readout in
    // both engines (same rounding point, same scalar algebra)
    "c103_evalue" ->
      (s"WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dp FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        s"subj AS (SELECT CASE WHEN ((user_id * ${Sampling.HashMul}) % ${Sampling.HashMod}) " +
        s"< ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t_day, " +
        "dp IS NOT NULL AS died FROM life LEFT JOIN conv USING (user_id)), " +
        "na AS (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a0, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b0 FROM subj), " +
        "ta AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_a, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_a " +
        "FROM subj WHERE arm = 'A' GROUP BY 1), " +
        "tb AS (SELECT t_day, CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_b, " +
        "CAST(SUM(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS c_b " +
        "FROM subj WHERE arm = 'B' GROUP BY 1), " +
        "sp AS (SELECT COALESCE(ta.t_day, tb.t_day) AS t_day, " +
        "COALESCE(d_a, 0) AS d_a, COALESCE(c_a, 0) AS c_a, " +
        "COALESCE(d_b, 0) AS d_b, COALESCE(c_b, 0) AS c_b " +
        "FROM ta FULL OUTER JOIN tb ON ta.t_day = tb.t_day), " +
        "r AS (SELECT sp.*, n_a0, n_b0, " +
        "n_a0 - COALESCE(CAST(SUM(d_a + c_a) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_a, " +
        "n_b0 - COALESCE(CAST(SUM(d_b + c_b) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS risk_b " +
        "FROM sp, na), " +
        "f AS (SELECT *, risk_a + risk_b AS nt, d_a + d_b AS dt FROM r " +
        "WHERE d_a + d_b > 0), " +
        "g3 AS (SELECT *, " +
        "CAST(ROUND(CAST(d_a * risk_b AS DOUBLE) / CAST(nt AS DOUBLE) " +
        "* 1000000000.0) AS BIGINT) AS num_fp, " +
        "CAST(ROUND(CAST(d_b * risk_a AS DOUBLE) / CAST(nt AS DOUBLE) " +
        "* 1000000000.0) AS BIGINT) AS den_fp FROM f), " +
        "base AS (SELECT CASE WHEN SUM(den_fp) > 0 THEN " +
        "ROUND(CAST(SUM(num_fp) AS DOUBLE) / CAST(SUM(den_fp) AS DOUBLE), 6) END AS hr_mh " +
        "FROM g3), " +
        "e AS (SELECT hr_mh, CASE WHEN hr_mh IS NOT NULL AND hr_mh > 0.0 THEN " +
        "GREATEST(hr_mh, 1.0 / hr_mh) END AS rr FROM base) " +
        "SELECT hr_mh, ROUND(rr, 6) AS rr_star, " +
        "CASE WHEN rr >= 1.0 THEN ROUND(rr + SQRT(rr * (rr - 1.0)), 6) END AS evalue " +
        "FROM e"),
    // same exact-integer cents·(10^4 − bp) revenue, same tiebreak
    "c105_tpch_q3" ->
      ("WITH li AS (SELECT l_orderkey, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_fp " +
        "FROM lineitem WHERE l_shipdate > TIMESTAMP '1996-03-15'), " +
        "g AS (SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, " +
        "o_orderpriority, CAST(SUM(rev_fp) AS BIGINT) AS rev_fp " +
        "FROM customer JOIN orders ON o_custkey = c_custkey " +
        "JOIN li ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-03-15' " +
        "GROUP BY 1, 2, 3) " +
        "SELECT l_orderkey, ROUND(CAST(rev_fp AS DOUBLE) / 1000000.0, 2) AS revenue, " +
        "o_orderdate, o_orderpriority " +
        "FROM g ORDER BY rev_fp DESC, o_orderdate, l_orderkey LIMIT 10"),
    // same star joins and locality constraint, same exact revenue
    "c106_tpch_q5" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_fp " +
        "FROM lineitem), " +
        "g AS (SELECT n_name, CAST(SUM(rev_fp) AS BIGINT) AS rev_fp " +
        "FROM region JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN supplier ON s_nationkey = n_nationkey " +
        "JOIN li ON l_suppkey = s_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1) " +
        "SELECT n_name, ROUND(CAST(rev_fp AS DOUBLE) / 1000000.0, 2) AS revenue " +
        "FROM g ORDER BY rev_fp DESC, n_name"),
    // same decorrelated per-part aggregate, same exact integer
    // cross-multiplied 0.2·avg threshold, same cents revenue
    "c107_tpch_q17" ->
      ("WITH pq AS (SELECT p_partkey FROM part " +
        "WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'), " +
        "li AS (SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c FROM lineitem), " +
        "pa AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sq, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM li JOIN pq ON l_partkey = p_partkey GROUP BY 1) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, " +
        "ROUND(CAST(SUM(price_c) AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly " +
        "FROM li JOIN pa USING (l_partkey) WHERE 5 * qty * cnt < sq"),
    // same big-order semi-join reduction, same integral quantities,
    // same totalprice/date/key ordering
    "c108_tpch_q18" ->
      ("WITH li AS (SELECT l_orderkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty " +
        "FROM lineitem), " +
        "big AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING SUM(qty) > 300), " +
        "s AS (SELECT c_name, c_custkey, o_orderkey, " +
        "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, " +
        "ROUND(o_totalprice, 2) AS o_totalprice, " +
        "CAST(SUM(qty) AS BIGINT) AS total_qty " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN li ON o_orderkey = li.l_orderkey " +
        "JOIN big ON big.l_orderkey = o_orderkey GROUP BY 1, 2, 3, 4, 5) " +
        "SELECT * FROM s ORDER BY o_totalprice DESC, o_orderdate, o_orderkey " +
        "LIMIT 100"),
    // same chained EXISTS / NOT EXISTS correlation on (orderkey,
    // suppkey<>), same lineitem-local fault predicate
    "c109_tpch_q21" ->
      ("WITH f AS (SELECT l_orderkey, l_suppkey, l_tax > l_discount AS fault " +
        "FROM lineitem), " +
        "l1 AS (SELECT l_orderkey, l_suppkey FROM f WHERE fault), " +
        "ord AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'), " +
        "sup AS (SELECT s_suppkey, s_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7') " +
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait " +
        "FROM l1 JOIN ord ON l1.l_orderkey = o_orderkey " +
        "JOIN sup ON s_suppkey = l1.l_suppkey " +
        "WHERE EXISTS (SELECT 1 FROM f l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM f l3 WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.fault) " +
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"),
    // same substring-code IN list, same exact cross-multiplied
    // balance threshold, same lapsed-customer anti-join
    "c110_tpch_q22" ->
      ("WITH c AS (SELECT substring(c_name, 17, 2) AS cntrycode, c_custkey, " +
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer), " +
        "sel AS (SELECT * FROM c WHERE cntrycode IN " +
        "('13', '31', '23', '29', '30', '18', '17')), " +
        "avgpos AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS s, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM sel WHERE bal_c > 0), " +
        "q AS (SELECT cntrycode, bal_c FROM sel, avgpos " +
        "WHERE CAST(bal_c AS HUGEINT) * n > s " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2001-01-01')) " +
        "SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, " +
        "ROUND(CAST(SUM(bal_c) AS DOUBLE) / 100.0, 2) AS totacctbal " +
        "FROM q GROUP BY 1 ORDER BY 1"),
    // same late-line EXISTS correlating on o_orderdate
    "c111_tpch_q4" ->
      ("SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count " +
        "FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01' " +
        "AND o_orderdate < TIMESTAMP '1996-10-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) " +
        "GROUP BY 1 ORDER BY 1"),
    // same pushdown filters, same exact cents·bp revenue
    "c112_tpch_q6" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, " +
        "ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 1000000.0, 2) AS revenue " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    // same symmetric nation disjunction, same exact revenue by year
    "c113_tpch_q7" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey, " +
        "CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS l_year, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_fp " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01') " +
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, l_year, " +
        "ROUND(CAST(SUM(rev_fp) AS DOUBLE) / 1000000.0, 2) AS revenue " +
        "FROM supplier JOIN li ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1') " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    // same 7-relation star, same exact conditional share per year
    "c114_tpch_q8" ->
      ("WITH alln AS (SELECT " +
        "CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS o_year, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_fp, " +
        "n2.n_name AS supp_nation " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
        "JOIN region ON n1.n_regionkey = r_regionkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE r_name = 'ASIA' AND p_type = 'STANDARD' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01') " +
        "SELECT o_year, " +
        "ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_fp " +
        "ELSE 0 END) AS DOUBLE) / CAST(SUM(rev_fp) AS DOUBLE), 6) AS mkt_share " +
        "FROM alln GROUP BY 1 ORDER BY 1"),
    // same flag/quarter pushdown, same exact-revenue top-20 cut
    "c115_tpch_q10" ->
      ("WITH li AS (SELECT l_orderkey, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_fp " +
        "FROM lineitem WHERE l_returnflag = 'R'), " +
        "g AS (SELECT c_custkey, c_name, n_name, " +
        "ROUND(c_acctbal, 2) AS c_acctbal, " +
        "CAST(SUM(rev_fp) AS BIGINT) AS rev_fp " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN li ON l_orderkey = o_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE o_orderdate >= TIMESTAMP '1996-10-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT c_custkey, c_name, n_name, " +
        "ROUND(CAST(rev_fp AS DOUBLE) / 1000000.0, 2) AS revenue, c_acctbal " +
        "FROM g ORDER BY rev_fp DESC, c_custkey LIMIT 20"),
    // same filter-in-ON left join, same count-of-counts rollup
    "c116_tpch_q13" ->
      ("WITH co AS (SELECT c_custkey, " +
        "CAST(COUNT(o_orderkey) AS BIGINT) AS c_count " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "AND o_orderpriority <> '5-LOW' GROUP BY 1) " +
        "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist " +
        "FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC"),
    // same month join, same exact conditional share
    "c117_tpch_q14" ->
      ("WITH j AS (SELECT p_type, " +
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_fp " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' " +
        "AND l_shipdate < TIMESTAMP '1996-10-01') " +
        "SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' " +
        "THEN rev_fp ELSE 0 END) AS DOUBLE) / " +
        "CAST(SUM(rev_fp) AS DOUBLE), 6) AS promo_revenue FROM j"),
    // same exact per-supplier quarter revenue, same exact-equality
    // argmax cut
    "c118_tpch_q15" ->
      ("WITH rev AS (SELECT l_suppkey AS supplier_no, " +
        "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS BIGINT) AS total_fp " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1), " +
        "m AS (SELECT MAX(total_fp) AS mx FROM rev) " +
        "SELECT s_suppkey, s_name, " +
        "ROUND(CAST(total_fp AS DOUBLE) / 1000000.0, 2) AS total_revenue " +
        "FROM supplier JOIN rev ON s_suppkey = supplier_no " +
        "JOIN m ON total_fp = mx ORDER BY s_suppkey"),
    // same three OR'd conjunctions as a residual over the equi-join
    "c119_tpch_q19" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, " +
        "ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE) " +
        "/ 1000000.0, 2) AS revenue " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 " +
        "AND l_quantity >= 1 AND l_quantity <= 11) " +
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 " +
        "AND l_quantity >= 10 AND l_quantity <= 20) " +
        "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 " +
        "AND l_quantity >= 20 AND l_quantity <= 30)"),
    // same rollup hierarchy, same GROUPING bitmask (first argument
    // most significant in both engines — verified), same integral
    // sums and deterministic tiebreaks
    "c120_rollup_window_topk" ->
      ("WITH a AS (SELECT l_returnflag AS flag, l_linestatus AS status, " +
        "MONTH(l_shipdate) AS m, " +
        "GROUPING(l_returnflag, l_linestatus, MONTH(l_shipdate)) AS gid, " +
        "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus, MONTH(l_shipdate))), " +
        "r AS (SELECT *, RANK() OVER (PARTITION BY gid " +
        "ORDER BY sum_qty DESC, flag, status, m) AS rk FROM a) " +
        "SELECT CAST(gid AS BIGINT) AS gid, " +
        "COALESCE(flag, 'ALL') AS flag, COALESCE(status, 'ALL') AS status, " +
        "COALESCE(CAST(m AS VARCHAR), 'ALL') AS mon, sum_qty, " +
        "CAST(rk AS INT) AS rk " +
        "FROM r WHERE rk <= 3 ORDER BY gid, rk, flag, status, mon"),
    // same per-side cumulates, same coalesced full-outer keys, same
    // carried-forward running max and crossover filter
    "c121_cumulative_crossover" ->
      ("WITH e AS (SELECT user_id % 8 AS bucket, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day, " +
        "event_type FROM events), " +
        "p AS (SELECT bucket, day, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM e WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "pc AS (SELECT bucket, day, CAST(SUM(n) OVER (PARTITION BY bucket " +
        "ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_p FROM p), " +
        "v AS (SELECT bucket, day, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM e WHERE event_type = 'view' GROUP BY 1, 2), " +
        "vc AS (SELECT bucket, day, CAST(SUM(n) OVER (PARTITION BY bucket " +
        "ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_v FROM v), " +
        "j AS (SELECT COALESCE(pc.bucket, vc.bucket) AS bucket, " +
        "COALESCE(pc.day, vc.day) AS day, cum_p, cum_v " +
        "FROM pc FULL OUTER JOIN vc " +
        "ON pc.bucket = vc.bucket AND pc.day = vc.day), " +
        "r AS (SELECT bucket, day, " +
        "MAX(cum_p) OVER (PARTITION BY bucket ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS run_p, " +
        "MAX(cum_v) OVER (PARTITION BY bucket ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS run_v FROM j) " +
        "SELECT bucket, day, run_p, run_v FROM r " +
        "WHERE run_p > run_v ORDER BY bucket, day"),
    // same grouping()-keyed window partitions, same exact HUGEINT
    // floor-division margin grid, same tiebreaks
    "c122_rollup_lochierarchy" ->
      ("WITH a AS (SELECT l_returnflag AS flag, l_linestatus AS status, " +
        "GROUPING(l_returnflag) AS gf, GROUPING(l_linestatus) AS gs, " +
        "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
        "(10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS HUGEINT) " +
        "AS srev, " +
        "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sqty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)), " +
        "m AS (SELECT *, gf + gs AS loch, " +
        "(srev * 1000000) // sqty AS m_fp FROM a), " +
        "r AS (SELECT *, RANK() OVER (PARTITION BY loch, " +
        "CASE WHEN gs = 0 THEN flag END " +
        "ORDER BY m_fp, flag, status) AS rk FROM m) " +
        "SELECT COALESCE(flag, 'ALL') AS flag, " +
        "COALESCE(status, 'ALL') AS status, CAST(loch AS INT) AS loch, " +
        "CAST(m_fp AS BIGINT) AS margin_fp, CAST(rk AS INT) AS rk " +
        "FROM r ORDER BY loch DESC, flag, status"),
    // the c97 lifetime CTEs with cause classification (purchase
    // priority on ties), all-cause ln-sum KM left limits, exact
    // cumulative-prior risk sets, sequential window sums
    "c104_cumulative_incidence" ->
      ("WITH a AS (SELECT user_id, event_type, value, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "life AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS dl FROM a GROUP BY 1), " +
        "conv AS (SELECT user_id, MIN(d) AS dc FROM a " +
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1), " +
        "err AS (SELECT user_id, MIN(d) AS de FROM a " +
        "WHERE event_type = 'error' GROUP BY 1), " +
        "subj AS (SELECT " +
        "CASE WHEN dc IS NOT NULL AND (de IS NULL OR dc <= de) THEN dc - d0 " +
        "WHEN de IS NOT NULL THEN de - d0 ELSE dl - d0 END AS t_day, " +
        "CASE WHEN dc IS NOT NULL AND (de IS NULL OR dc <= de) THEN 1 " +
        "WHEN de IS NOT NULL THEN 2 ELSE 0 END AS cause " +
        "FROM life LEFT JOIN conv USING (user_id) LEFT JOIN err USING (user_id)), " +
        "n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM subj), " +
        "bt AS (SELECT t_day, " +
        "CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1, " +
        "CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2, " +
        "CAST(SUM(CASE WHEN cause = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cns " +
        "FROM subj GROUP BY 1), " +
        "r AS (SELECT bt.*, n0, n0 - COALESCE(CAST(SUM(d1 + d2 + cns) OVER " +
        "(ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "AS BIGINT), 0) AS risk FROM bt, n0), " +
        "e AS (SELECT *, d1 + d2 AS dt FROM r WHERE d1 + d2 > 0), " +
        "w AS (SELECT *, MAX(CASE WHEN risk <= dt THEN 1 ELSE 0 END) OVER () AS zr, " +
        "CASE WHEN risk > dt THEN LN((CAST(risk AS DOUBLE) - CAST(dt AS DOUBLE)) / " +
        "CAST(risk AS DOUBLE)) END AS ln_s FROM e), " +
        "s AS (SELECT *, EXP(COALESCE(SUM(ln_s) OVER (ORDER BY t_day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)) AS s_minus FROM w), " +
        "cc AS (SELECT *, " +
        "SUM(s_minus * CAST(d1 AS DOUBLE) / CAST(risk AS DOUBLE)) OVER " +
        "(ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS cif1, " +
        "SUM(s_minus * CAST(d2 AS DOUBLE) / CAST(risk AS DOUBLE)) OVER " +
        "(ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS cif2 FROM s) " +
        "SELECT t_day, risk, d1, d2, " +
        "CASE WHEN zr = 0 THEN ROUND(cif1, 4) END AS cif_conv, " +
        "CASE WHEN zr = 0 THEN ROUND(cif2, 4) END AS cif_err " +
        "FROM cc ORDER BY t_day"),
    // same per-segment four-sum OLS, same fixed double fit/contrast
    // expressions at the break
    "c96_interrupted_ts" ->
      ("WITH e AS (SELECT CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x, " +
        "CAST(ROUND(value * 100) AS BIGINT) AS y FROM events), " +
        "seg AS (SELECT CASE WHEN x < 13 THEN 'pre' ELSE 'post' END AS segment, x, y FROM e), " +
        "s AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, " +
        "CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy " +
        "FROM seg GROUP BY 1), " +
        "f AS (SELECT segment, n, " +
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den, " +
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope, " +
        "sx, sy FROM s), " +
        "g AS (SELECT segment, n, den, slope, " +
        "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS icept FROM f), " +
        "h AS (SELECT segment, n, den, slope, icept, icept + slope * 13.0 AS fitb FROM g) " +
        "SELECT segment, n, " +
        "CASE WHEN den <> 0.0 THEN ROUND(slope, 6) END AS slope_cents_per_day, " +
        "CASE WHEN den <> 0.0 THEN ROUND(icept, 4) END AS intercept_cents, " +
        "CASE WHEN den <> 0.0 THEN ROUND(fitb, 4) END AS fit_at_break, " +
        "ROUND(MAX(CASE WHEN segment = 'post' AND den <> 0.0 THEN fitb END) OVER () - " +
        "MAX(CASE WHEN segment = 'pre' AND den <> 0.0 THEN fitb END) OVER (), 4) AS level_change_cents " +
        "FROM h ORDER BY segment"),
    // same 2x2 exact cells, same cell-mean divisions, same four-term
    // contrast expression
    "c95_diff_in_diff" ->
      (s"WITH e AS (SELECT CASE WHEN ((user_id * ${Sampling.HashMul}) % ${Sampling.HashMod}) " +
        s"< ${Sampling.HashMod / 2} THEN 'treat' ELSE 'control' END AS grp, " +
        "CASE WHEN DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) < 13 " +
        "THEN 'pre' ELSE 'post' END AS period, " +
        "CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events), " +
        "cell AS (SELECT grp, period, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(cents) AS BIGINT) AS sum_cents FROM e GROUP BY 1, 2), " +
        "mm AS (SELECT *, " +
        "MAX(CASE WHEN grp = 'treat' AND period = 'post' THEN " +
        "CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) END) OVER () AS m_tp, " +
        "MAX(CASE WHEN grp = 'treat' AND period = 'pre' THEN " +
        "CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) END) OVER () AS m_tr, " +
        "MAX(CASE WHEN grp = 'control' AND period = 'post' THEN " +
        "CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) END) OVER () AS m_cp, " +
        "MAX(CASE WHEN grp = 'control' AND period = 'pre' THEN " +
        "CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) END) OVER () AS m_cr " +
        "FROM cell) " +
        "SELECT grp, period, n, " +
        "ROUND(CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_cents, " +
        "ROUND((m_tp - m_tr) - (m_cp - m_cr), 4) AS did_cents " +
        "FROM mm ORDER BY grp, period"),
    // same IGNORE-NULLS carry-forward under the same total order,
    // same µs freshness gate and integer-cents revenue
    "c83_attribution" ->
      ("WITH e AS (SELECT user_id, ts, event_id, event_type, value, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lnt, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lts " +
        "FROM events), " +
        "p AS (SELECT CASE WHEN lts IS NOT NULL AND " +
        "epoch_us(ts) - epoch_us(lts) <= 1800000000 THEN lnt " +
        "ELSE 'direct' END AS channel, " +
        "CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM e " +
        "WHERE event_type = 'purchase'), " +
        "a AS (SELECT channel, COUNT(*) AS n_purchases, " +
        "CAST(SUM(cents) AS BIGINT) AS revenue_cents FROM p GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n_purchases) AS BIGINT) AS tot FROM a) " +
        "SELECT channel, n_purchases, revenue_cents, " +
        "ROUND(CAST(n_purchases AS DOUBLE) / tot, 4) AS share " +
        "FROM a, t ORDER BY channel"),
    // same integer sufficient statistics, same double-cast points and
    // left-associative multiply/divide chains — bit-identical floats
    "c82_cuped_adjust" ->
      (s"WITH e AS (SELECT user_id, " +
        "CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS d, " +
        "event_type, value FROM events), " +
        "xs AS (SELECT user_id, COUNT(*) AS x FROM e WHERE d <= 14 GROUP BY 1), " +
        "ys AS (SELECT user_id, CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS y " +
        "FROM e WHERE d > 14 AND d <= 24 AND event_type = 'purchase' GROUP BY 1), " +
        "u AS (SELECT du.user_id, " +
        s"CASE WHEN (du.user_id * ${Sampling.HashMul}) % ${Sampling.HashMod} < " +
        s"${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm, " +
        "CAST(COALESCE(xs.x, 0) AS BIGINT) AS x, CAST(COALESCE(ys.y, 0) AS BIGINT) AS y " +
        "FROM (SELECT DISTINCT user_id FROM e) du " +
        "LEFT JOIN xs USING (user_id) LEFT JOIN ys USING (user_id)), " +
        "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx, " +
        "CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy, " +
        "CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy FROM u), " +
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a, CAST(SUM(x) AS BIGINT) AS sx_a, " +
        "CAST(SUM(y) AS BIGINT) AS sy_a FROM u WHERE arm = 'A'), " +
        "b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(x) AS BIGINT) AS sx_b, " +
        "CAST(SUM(y) AS BIGINT) AS sy_b FROM u WHERE arm = 'B'), " +
        "t AS (SELECT n_a, n_b, sx_a, sy_a, sx_b, sy_b, n, sx, " +
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn, " +
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx, " +
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary " +
        "FROM g, a, b) " +
        "SELECT n_a, n_b, " +
        "ROUND(CAST(sy_a AS DOUBLE) / n_a, 4) AS mean_y_a, " +
        "ROUND(CAST(sy_b AS DOUBLE) / n_b, 4) AS mean_y_b, " +
        "ROUND(CAST(sy_a AS DOUBLE) / n_a - (covn / varx) * " +
        "(CAST(sx_a AS DOUBLE) / n_a - CAST(sx AS DOUBLE) / n), 4) AS adj_y_a, " +
        "ROUND(CAST(sy_b AS DOUBLE) / n_b - (covn / varx) * " +
        "(CAST(sx_b AS DOUBLE) / n_b - CAST(sx AS DOUBLE) / n), 4) AS adj_y_b, " +
        "ROUND(covn / varx, 6) AS theta, " +
        "ROUND(CAST(100 AS DOUBLE) * covn * covn / (varx * vary), 4) AS var_reduction_pct, " +
        "ROUND((CAST(sy_a AS DOUBLE) / n_a - (covn / varx) * " +
        "(CAST(sx_a AS DOUBLE) / n_a - CAST(sx AS DOUBLE) / n)) - " +
        "(CAST(sy_b AS DOUBLE) / n_b - (covn / varx) * " +
        "(CAST(sx_b AS DOUBLE) / n_b - CAST(sx AS DOUBLE) / n)), 4) AS adjusted_lift_cents " +
        "FROM t"),
    // same µs lead window and integer-cents weighting; BIGINT casts
    // pin the HUGEINT widening, the two divisions mirror exactly
    "c81_time_weighted_avg" ->
      ("WITH s AS (SELECT user_id, ts, event_id, " +
        "CAST(FLOOR(value * 100) AS BIGINT) AS v_cents, " +
        "epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "- epoch_us(ts) AS dt FROM events) " +
        "SELECT user_id, COUNT(*) AS n_intervals, " +
        "CAST(SUM(dt) AS BIGINT) AS span_us, " +
        "ROUND(CAST(SUM(v_cents * dt) AS DOUBLE) / CAST(SUM(dt) AS BIGINT) / 100, 4) AS twa " +
        "FROM s WHERE dt IS NOT NULL GROUP BY 1 " +
        "HAVING SUM(dt) > 0 ORDER BY user_id"),
    // c78's total order with two LEADs; exact triple counts, the
    // deterministic (n desc, triple) top-20
    "c85_sequential_patterns" ->
      ("WITH s AS (SELECT user_id, event_type AS e1, " +
        "LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2, " +
        "LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3 " +
        "FROM events) " +
        "SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n FROM s " +
        "WHERE e3 IS NOT NULL GROUP BY 1, 2, 3 " +
        "ORDER BY n DESC, e1, e2, e3 LIMIT 20"),
    // same lag window (ts, event_id total order), BIGINT-cast totals
    // (DuckDB widens SUM to HUGEINT), one 4 dp division
    "c78_markov_paths" ->
      ("WITH s AS (SELECT user_id, event_type AS from_type, " +
        "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type " +
        "FROM events), " +
        "c AS (SELECT from_type, to_type, COUNT(*) AS n FROM s " +
        "WHERE to_type IS NOT NULL GROUP BY 1, 2), " +
        "t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1) " +
        "SELECT c.from_type, c.to_type, c.n, " +
        "ROUND(CAST(c.n AS DOUBLE) / tot, 4) AS p " +
        "FROM c JOIN t USING (from_type) ORDER BY from_type, to_type"),
    // same integer-cents monetary sum, quantile_disc boundaries (the
    // x51 convention argument: both engines' discrete quantile picks
    // the same element), same segment code rollup
    "c79_rfm_segments" ->
      ("WITH e AS (SELECT user_id, " +
        "CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d, " +
        "event_type, value FROM events), " +
        "h AS (SELECT MAX(d) AS h FROM e), " +
        "mny AS (SELECT user_id, CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) " +
        "AS m_cents FROM e WHERE event_type = 'purchase' GROUP BY 1), " +
        "rfm AS (SELECT e.user_id, CAST(h.h - MAX(e.d) AS BIGINT) AS r, " +
        "COUNT(*) AS f, CAST(COALESCE(ANY_VALUE(mny.m_cents), 0) AS BIGINT) AS m " +
        "FROM e LEFT JOIN mny ON e.user_id = mny.user_id, h " +
        "GROUP BY e.user_id, h.h), " +
        "b AS (SELECT quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.5) AS r2, " +
        "quantile_disc(r, 0.75) AS r3, quantile_disc(f, 0.25) AS f1, " +
        "quantile_disc(f, 0.5) AS f2, quantile_disc(f, 0.75) AS f3, " +
        "quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2, " +
        "quantile_disc(m, 0.75) AS m3 FROM rfm), " +
        "tl AS (SELECT user_id, " +
        "CASE WHEN r <= r1 THEN 1 WHEN r <= r2 THEN 2 WHEN r <= r3 THEN 3 ELSE 4 END AS r_tile, " +
        "CASE WHEN f <= f1 THEN 1 WHEN f <= f2 THEN 2 WHEN f <= f3 THEN 3 ELSE 4 END AS f_tile, " +
        "CASE WHEN m <= m1 THEN 1 WHEN m <= m2 THEN 2 WHEN m <= m3 THEN 3 ELSE 4 END AS m_tile " +
        "FROM rfm, b) " +
        "SELECT CAST(r_tile * 100 + f_tile * 10 + m_tile AS INTEGER) AS segment, " +
        "CAST(r_tile AS INTEGER) AS r_tile, CAST(f_tile AS INTEGER) AS f_tile, " +
        "CAST(m_tile AS INTEGER) AS m_tile, COUNT(*) AS n_users " +
        "FROM tl GROUP BY 1, 2, 3, 4 ORDER BY segment"),
    // same Weyl threshold, same division/multiply/sqrt-only chain
    // over exact integers — bit-identical IEEE doubles on both sides
    "c80_ab_lift" ->
      (s"WITH u AS (SELECT DISTINCT user_id FROM events), " +
        s"arm AS (SELECT user_id, CASE WHEN (user_id * ${Sampling.HashMul}) % " +
        s"${Sampling.HashMod} < ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END AS arm FROM u), " +
        "conv AS (SELECT DISTINCT user_id FROM events " +
        "WHERE event_type = 'purchase' AND value >= 95.0), " +
        "g AS (SELECT arm.arm, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(conv.user_id) AS BIGINT) AS c " +
        "FROM arm LEFT JOIN conv ON arm.user_id = conv.user_id GROUP BY 1), " +
        "a AS (SELECT n AS n_a, c AS conv_a FROM g WHERE arm = 'A'), " +
        "b AS (SELECT n AS n_b, c AS conv_b FROM g WHERE arm = 'B') " +
        "SELECT n_a, conv_a, n_b, conv_b, " +
        "ROUND(CAST(conv_a AS DOUBLE) / n_a, 4) AS p_a, " +
        "ROUND(CAST(conv_b AS DOUBLE) / n_b, 4) AS p_b, " +
        "ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / " +
        "(CAST(conv_b AS DOUBLE) / n_b) * 100, 4) AS lift_pct, " +
        "ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / " +
        "SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * " +
        "(CAST(1 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * " +
        "(CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 4) AS z_score FROM a, b"),
    // same first/conversion aggregates (c80's rule), x181's log2
    // buckets and pow-cast bounds
    "c93_conversion_lag" ->
      ("WITH f AS (SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS t0 " +
        "FROM events GROUP BY 1), " +
        "c AS (SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS tc " +
        "FROM events WHERE event_type = 'purchase' AND value >= 95.0 " +
        "GROUP BY 1), " +
        "l AS (SELECT c.tc - f.t0 AS lag FROM c JOIN f USING (user_id)), " +
        "b AS (SELECT CASE WHEN lag <= 0 THEN -1 " +
        "ELSE CAST(FLOOR(LOG2(CAST(lag AS DOUBLE))) AS BIGINT) END AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM l GROUP BY 1), " +
        "w AS (SELECT bucket, n, CAST(SUM(n) OVER () AS BIGINT) AS t, " +
        "CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) " +
        "AS BIGINT) AS cum FROM b) " +
        "SELECT bucket, CAST(POW(2.0, bucket) AS BIGINT) AS lo_us, n, " +
        "ROUND(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 4) AS share, " +
        "ROUND(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 4) AS cum_share " +
        "FROM w ORDER BY bucket"),
    // same distinct frame, user self-join with the t1 < t2 order and
    // one exact Jaccard division per pair
    "c92_type_affinity" ->
      ("WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), " +
        "n1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM ut GROUP BY 1), " +
        "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "CAST(COUNT(*) AS BIGINT) AS n_both FROM ut a JOIN ut b " +
        "ON a.user_id = b.user_id AND a.event_type < b.event_type " +
        "GROUP BY 1, 2) " +
        "SELECT type_a, type_b, na.n AS n_a, nb.n AS n_b, n_both, " +
        "ROUND(CAST(n_both AS DOUBLE) / " +
        "CAST(na.n + nb.n - n_both AS DOUBLE), 4) AS jaccard " +
        "FROM p JOIN n1 na ON p.type_a = na.event_type " +
        "JOIN n1 nb ON p.type_b = nb.event_type " +
        "ORDER BY type_a, type_b"),
    // same broadcast scalar stats and the HUGEINT cross-multiplied
    // 3-sigma filter vs Spark's DECIMAL(38,0)
    "c91_outlier_users" ->
      ("WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c " +
        "FROM events GROUP BY 1), " +
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(c) AS BIGINT) AS t, " +
        "CAST(SUM(c * c) AS BIGINT) AS sxx FROM pu), " +
        "f AS (SELECT user_id, c, c * n - t AS d, " +
        "n * sxx - t * t AS v FROM pu, s) " +
        "SELECT user_id, c AS n_events, " +
        "ROUND(CAST(d AS DOUBLE) / SQRT(CAST(v AS DOUBLE)), 4) AS z " +
        "FROM f WHERE CAST(d AS HUGEINT) * CAST(d AS HUGEINT) > " +
        "9 * CAST(v AS HUGEINT) " +
        "ORDER BY z DESC, user_id LIMIT 20"),
    // c74's week/cohort CTEs with floor-cents value, the cumulative
    // window over the bounded cohort frame and one 4 dp division
    "c90_cohort_ltv" ->
      ("WITH ev AS (SELECT user_id, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk, " +
        "CASE WHEN event_type = 'purchase' THEN " +
        "CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END AS cents FROM events), " +
        "c AS (SELECT user_id, MIN(wk) AS c0 FROM ev GROUP BY 1), " +
        "s AS (SELECT c0, CAST(COUNT(*) AS BIGINT) AS cohort_size " +
        "FROM c GROUP BY 1), " +
        "g AS (SELECT c.c0, ev.wk - c.c0 AS week_offset, " +
        "CAST(SUM(cents) AS BIGINT) AS wk_cents " +
        "FROM ev JOIN c ON ev.user_id = c.user_id GROUP BY 1, 2), " +
        "w AS (SELECT c0, week_offset, wk_cents, " +
        "CAST(SUM(wk_cents) OVER (PARTITION BY c0 ORDER BY week_offset " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents FROM g) " +
        "SELECT w.c0 AS cohort_week, week_offset, cohort_size, " +
        "wk_cents, cum_cents, " +
        "ROUND(CAST(cum_cents AS DOUBLE) / " +
        "CAST(cohort_size * 100 AS DOUBLE), 4) AS ltv_per_user " +
        "FROM w JOIN s ON w.c0 = s.c0 ORDER BY cohort_week, week_offset"),
    // c80's arm/conversion counts, the fixed 2.8016 constant and the
    // identical division→sqrt→multiply chain off the unrounded p
    "c89_power_mde" ->
      (s"WITH u AS (SELECT DISTINCT user_id FROM events), " +
        s"arm AS (SELECT user_id, CASE WHEN (user_id * ${Sampling.HashMul}) % " +
        s"${Sampling.HashMod} < ${Sampling.HashMod / 2} THEN 'A' ELSE 'B' END " +
        "AS arm FROM u), " +
        "conv AS (SELECT DISTINCT user_id FROM events " +
        "WHERE event_type = 'purchase' AND value >= 95.0), " +
        "g AS (SELECT " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b, " +
        "CAST(COUNT(conv.user_id) AS BIGINT) AS conv_pool " +
        "FROM arm LEFT JOIN conv ON arm.user_id = conv.user_id) " +
        "SELECT n_a, n_b, conv_pool, " +
        "ROUND(CAST(conv_pool AS DOUBLE) / (n_a + n_b), 4) AS p_pool, " +
        "ROUND(2.8016 * SQRT(CAST(conv_pool AS DOUBLE) / (n_a + n_b) * " +
        "(1.0 - CAST(conv_pool AS DOUBLE) / (n_a + n_b)) * " +
        "(1.0 / n_a + 1.0 / n_b)), 4) AS mde_abs, " +
        "ROUND(2.8016 * SQRT(CAST(conv_pool AS DOUBLE) / (n_a + n_b) * " +
        "(1.0 - CAST(conv_pool AS DOUBLE) / (n_a + n_b)) * " +
        "(1.0 / n_a + 1.0 / n_b)) / " +
        "(CAST(conv_pool AS DOUBLE) / (n_a + n_b)), 4) AS mde_rel " +
        "FROM g"),
    // the per-purchase prior-channel set built relationally (the
    // grouped EXISTS join ≡ the window's strict (ts, event_id)
    // prefix), same DIV grid and one division per readout column
    "c87_shapley_attribution" ->
      ("WITH p AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "pt AS (SELECT p.event_id AS pid, t.event_type AS ch " +
        "FROM p JOIN events t ON t.user_id = p.user_id " +
        "AND t.event_type <> 'purchase' " +
        "AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id)) " +
        "GROUP BY 1, 2), " +
        "k AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS k FROM pt GROUP BY 1), " +
        "cr AS (SELECT pt.ch AS channel, 1000000 // k.k AS credit_fp " +
        "FROM pt JOIN k ON pt.pid = k.pid " +
        "UNION ALL SELECT 'direct', 1000000 FROM p " +
        "LEFT JOIN k ON p.event_id = k.pid WHERE k.pid IS NULL), " +
        "b AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases, " +
        "CAST(SUM(credit_fp) AS BIGINT) AS credit_fp FROM cr GROUP BY 1), " +
        "t2 AS (SELECT CAST(SUM(credit_fp) AS BIGINT) AS tot FROM b) " +
        "SELECT channel, n_purchases, " +
        "ROUND(CAST(credit_fp AS DOUBLE) / 1000000.0, 4) AS credit, " +
        "ROUND(CAST(credit_fp AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS share " +
        "FROM b, t2 ORDER BY channel"),
    // c86's stratum CTEs verbatim through the positivity prune, then
    // the IPS term (c86's D scaled by stratum size) on the same grid
    "c88_ips_weighting" ->
      (s"WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev " +
        "FROM events GROUP BY 1), " +
        "q AS (SELECT quantile_disc(n_ev, 0.25) AS q1, " +
        "quantile_disc(n_ev, 0.5) AS q2, " +
        "quantile_disc(n_ev, 0.75) AS q3 FROM pu), " +
        "tc AS (SELECT user_id, event_type, COUNT(*) AS cnt " +
        "FROM events GROUP BY 1, 2), " +
        "dom AS (SELECT user_id, event_type AS dom_type FROM " +
        "(SELECT user_id, event_type, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY cnt DESC, event_type DESC) AS rn " +
        "FROM tc) WHERE rn = 1), " +
        "cv AS (SELECT DISTINCT user_id FROM events " +
        "WHERE event_type = 'purchase' AND value >= 95.0), " +
        "u AS (SELECT CAST(CASE WHEN n_ev <= q1 THEN 1 " +
        "WHEN n_ev <= q2 THEN 2 WHEN n_ev <= q3 THEN 3 ELSE 4 END " +
        "AS VARCHAR) || '|' || dom_type AS stratum, " +
        s"CASE WHEN (pu.user_id * ${Sampling.HashMul}) % " +
        s"${Sampling.HashMod} < ${Sampling.HashMod / 2} " +
        "THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END AS conv " +
        "FROM pu CROSS JOIN q JOIN dom ON pu.user_id = dom.user_id " +
        "LEFT JOIN cv ON pu.user_id = cv.user_id), " +
        "st AS (SELECT stratum, " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_treat, " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_t, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_c " +
        "FROM u GROUP BY 1 HAVING n_treat > 0 AND n_ctrl > 0), " +
        "f AS (SELECT stratum, n_treat, n_ctrl, " +
        "n_treat + n_ctrl AS n_s, " +
        "CAST(ROUND(CAST((n_treat + n_ctrl) * " +
        "(conv_t * n_ctrl - conv_c * n_treat) AS DOUBLE) / " +
        "CAST(n_treat * n_ctrl AS DOUBLE) * 1000000.0) AS BIGINT) AS term_fp " +
        "FROM st) " +
        "SELECT stratum, n_treat, n_ctrl, " +
        "ROUND(CAST(n_treat AS DOUBLE) / CAST(n_s AS DOUBLE), 4) AS propensity, " +
        "ROUND(CAST(term_fp AS DOUBLE) / " +
        "(CAST(n_s AS DOUBLE) * 1000000.0), 4) AS effect, " +
        "ROUND(CAST(SUM(term_fp) OVER () AS DOUBLE) / " +
        "(CAST(SUM(n_s) OVER () AS DOUBLE) * 1000000.0), 4) AS ate " +
        "FROM f ORDER BY stratum"),
    // same quartile cuts (quantile_disc ≡ percentile_disc), same
    // max(struct) plurality via the (cnt DESC, type DESC) window,
    // c80's arm hash verbatim, same off-support prune and 10^-6
    // effect grid with the weighted-integer ATT sum
    "c86_cem_matching" ->
      (s"WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev " +
        "FROM events GROUP BY 1), " +
        "q AS (SELECT quantile_disc(n_ev, 0.25) AS q1, " +
        "quantile_disc(n_ev, 0.5) AS q2, " +
        "quantile_disc(n_ev, 0.75) AS q3 FROM pu), " +
        "tc AS (SELECT user_id, event_type, COUNT(*) AS cnt " +
        "FROM events GROUP BY 1, 2), " +
        "dom AS (SELECT user_id, event_type AS dom_type FROM " +
        "(SELECT user_id, event_type, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY cnt DESC, event_type DESC) AS rn " +
        "FROM tc) WHERE rn = 1), " +
        "cv AS (SELECT DISTINCT user_id FROM events " +
        "WHERE event_type = 'purchase' AND value >= 95.0), " +
        "u AS (SELECT CAST(CASE WHEN n_ev <= q1 THEN 1 " +
        "WHEN n_ev <= q2 THEN 2 WHEN n_ev <= q3 THEN 3 ELSE 4 END " +
        "AS VARCHAR) || '|' || dom_type AS stratum, " +
        s"CASE WHEN (pu.user_id * ${Sampling.HashMul}) % " +
        s"${Sampling.HashMod} < ${Sampling.HashMod / 2} " +
        "THEN 'A' ELSE 'B' END AS arm, " +
        "CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END AS conv " +
        "FROM pu CROSS JOIN q JOIN dom ON pu.user_id = dom.user_id " +
        "LEFT JOIN cv ON pu.user_id = cv.user_id), " +
        "st AS (SELECT stratum, " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_treat, " +
        "CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_t, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl, " +
        "CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_c " +
        "FROM u GROUP BY 1 HAVING n_treat > 0 AND n_ctrl > 0), " +
        "f AS (SELECT stratum, n_treat, n_ctrl, conv_t, conv_c, " +
        "CAST(ROUND(CAST(conv_t * n_ctrl - conv_c * n_treat AS DOUBLE) / " +
        "CAST(n_treat * n_ctrl AS DOUBLE) * 1000000.0) AS BIGINT) AS effect_fp " +
        "FROM st) " +
        "SELECT stratum, n_treat, n_ctrl, conv_t, conv_c, " +
        "ROUND(CAST(effect_fp AS DOUBLE) / 1000000.0, 4) AS effect, " +
        "ROUND(CAST(SUM(n_treat * effect_fp) OVER () AS DOUBLE) / " +
        "(CAST(SUM(n_treat) OVER () AS DOUBLE) * 1000000.0), 4) AS att " +
        "FROM f ORDER BY stratum"),
    // same day grid, conditional sums and the pre-collapsed
    // distinct-day frame; INTEGER casts pin the day dtypes
    "c76_user_features" ->
      ("WITH e AS (SELECT user_id, " +
        "CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS d " +
        "FROM events), " +
        "ad AS (SELECT user_id, COUNT(*) AS active_days FROM " +
        "(SELECT DISTINCT user_id, d FROM e) GROUP BY 1) " +
        "SELECT e.user_id, COUNT(*) AS n_events, " +
        "CAST(ANY_VALUE(ad.active_days) AS BIGINT) AS active_days, " +
        "MIN(d) AS first_day, MAX(d) AS last_day, " +
        "CAST(24 - MAX(d) AS INTEGER) AS days_idle, " +
        "CAST(SUM(CASE WHEN d >= 18 THEN 1 ELSE 0 END) AS BIGINT) AS events_last7 " +
        "FROM e JOIN ad USING (user_id) GROUP BY e.user_id ORDER BY user_id"),
    // same distinct day-grid frame, 7-day trailing window rebuilt by
    // the identical range join
    "c75_stickiness" ->
      ("WITH dau AS (SELECT DISTINCT user_id, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d FROM events), " +
        "days AS (SELECT DISTINCT d AS day FROM dau), " +
        "dn AS (SELECT d AS day, COUNT(*) AS dau FROM dau GROUP BY 1), " +
        "wn AS (SELECT days.day, COUNT(DISTINCT dau.user_id) AS wau " +
        "FROM days JOIN dau ON dau.d BETWEEN days.day - 6 AND days.day GROUP BY 1) " +
        "SELECT CAST(dn.day AS INTEGER) AS day, CAST(dau AS BIGINT) AS dau, " +
        "CAST(wau AS BIGINT) AS wau, " +
        "ROUND(CAST(dau AS DOUBLE) / wau, 4) AS stickiness " +
        "FROM dn JOIN wn USING (day) ORDER BY day"),
    // same integer week grid, cohort = min week, offsets vs cohort
    // size
    "c74_retention" ->
      ("WITH a AS (SELECT DISTINCT user_id, " +
        "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk " +
        "FROM events), " +
        "c AS (SELECT user_id, MIN(wk) AS c0 FROM a GROUP BY 1), " +
        "s AS (SELECT c0, COUNT(*) AS cohort_size FROM c GROUP BY 1), " +
        "g AS (SELECT c.c0, a.wk - c.c0 AS week_offset, COUNT(*) AS n_active " +
        "FROM a JOIN c USING (user_id) GROUP BY 1, 2) " +
        "SELECT g.c0 AS cohort_week, week_offset, n_active, cohort_size, " +
        "ROUND(100.0 * CAST(n_active AS DOUBLE) / cohort_size, 4) AS retention_pct " +
        "FROM g JOIN s USING (c0) ORDER BY cohort_week, week_offset"),
    // same min-ts-after-previous stage chain; conversions divide the
    // PREVIOUS stage, the funnel contract
    "c73_funnel" ->
      ("WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events " +
        "WHERE event_type = 'signup' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e " +
        "JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1 " +
        "WHERE e.event_type = 'click' GROUP BY 1), " +
        "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e " +
        "JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2 " +
        "WHERE e.event_type = 'purchase' GROUP BY 1), " +
        "n AS (SELECT COUNT(DISTINCT user_id) AS n0, " +
        "(SELECT COUNT(*) FROM s1) AS n1, (SELECT COUNT(*) FROM s2) AS n2, " +
        "(SELECT COUNT(*) FROM s3) AS n3 FROM events) " +
        "SELECT 1 AS stage, 'signup' AS stage_name, CAST(n1 AS BIGINT) AS n_users, " +
        "ROUND(100.0 * CAST(n1 AS DOUBLE) / n0, 4) AS conversion_pct FROM n " +
        "UNION ALL SELECT 2, 'click_after_signup', CAST(n2 AS BIGINT), " +
        "ROUND(100.0 * CAST(n2 AS DOUBLE) / n1, 4) FROM n " +
        "UNION ALL SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT), " +
        "ROUND(100.0 * CAST(n3 AS DOUBLE) / n2, 4) FROM n ORDER BY stage"),
    // the injection rule recomputed over the source table — every
    // 50th record was corrupted, the rest must survive typed
    "c72_corrupt_records" ->
      ("SELECT CAST(COUNT(CASE WHEN doc_id % 50 <> 0 THEN 1 END) AS BIGINT) AS n_valid, " +
        "CAST(COUNT(CASE WHEN doc_id % 50 = 0 THEN 1 END) AS BIGINT) AS n_corrupt, " +
        "CAST(SUM(CASE WHEN doc_id % 50 <> 0 THEN n_chars END) AS BIGINT) AS chars_valid " +
        "FROM documents"),
    // The constructors flatten back to base columns, so the oracle is
    // their scalar equivalent.
    "c37_json_struct" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, " +
        "user_id AS uid, event_type AS etype, event_type AS mtype, event_id AS arr_second " +
        "FROM events ORDER BY event_id LIMIT 200"),
    "c38_orc_roundtrip" ->
      ("SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS uid_sum " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c39_window_breadth" ->
      ("SELECT user_id, event_id, " +
        "CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value) AS INTEGER) AS dr, " +
        "LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value, " +
        "CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS quartile, " +
        "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY value " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_by_value " +
        "FROM events ORDER BY user_id, event_id LIMIT 500"),
    "c40_hof_lambdas" ->
      ("SELECT doc_id, " +
        "CAST(len(list_filter(string_split(text, ' '), t -> LENGTH(t) > 4)) AS INTEGER) AS n_long, " +
        "CAST(list_sum(list_transform(string_split(text, ' '), t -> LENGTH(t))) AS BIGINT) AS total_chars, " +
        "CAST(list_max(list_transform(string_split(text, ' '), t -> LENGTH(t))) AS INTEGER) AS max_tok, " +
        "len(list_filter(string_split(text, ' '), t -> t = 'the')) > 0 AS has_the " +
        "FROM documents ORDER BY doc_id"),
    // wide-format conditional aggregation — the engine-agnostic PIVOT
    "c41_pivot" ->
      ("SELECT l_returnflag AS flag, " +
        "COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F, " +
        "COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "c42_percentiles" ->
      ("SELECT l_returnflag AS flag, " +
        "ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty, " +
        "ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty, " +
        "ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "c46_grouping_sets" ->
      ("SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n, " +
        "CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag " +
        "FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ()) " +
        "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 4"),
    "c47_setop_all" ->
      ("SELECT key, COUNT(*) AS n FROM (" +
        "SELECT c_nationkey AS key FROM customer " +
        "INTERSECT ALL SELECT s_nationkey AS key FROM supplier) t " +
        "GROUP BY 1 ORDER BY 1"),
    "c45_join_full" ->
      ("SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both' " +
        "WHEN o_custkey IS NULL THEN 'customer_only' ELSE 'order_only' END AS side, " +
        "COUNT(*) AS n FROM customer " +
        "FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c_custkey = o_custkey " +
        "GROUP BY 1 ORDER BY 1"),
    // the salted join must be indistinguishable from the plain join
    "c43_salted_join" ->
      ("SELECT c_mktsegment AS segment, COUNT(*) AS n, " +
        "ROUND(SUM(value), 2) AS value_sum " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1 ORDER BY 1"),
    "c44_bucketed_join" ->
      ("SELECT o_orderpriority AS priority, COUNT(*) AS n, " +
        "ROUND(SUM(l_quantity), 2) AS qty_sum " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    // same spine + IGNORE NULLS carry-forward; the daily sum mirrors
    // the exact-decimal accumulation
    "c68_gap_fill" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 4) AS v " +
        "FROM events WHERE user_id < 100 GROUP BY 1, 2), " +
        "span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 " +
        "FROM daily GROUP BY 1), " +
        "spine AS (SELECT user_id, CAST(unnest(generate_series(" +
        "CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day " +
        "FROM span), " +
        "j AS (SELECT s.user_id, s.day, d.v FROM spine s " +
        "LEFT JOIN daily d USING (user_id, day)) " +
        "SELECT user_id, STRFTIME(day, '%Y-%m-%d') AS day, v AS value_raw, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS value_filled " +
        "FROM j ORDER BY user_id, day"),
    // md5/sha256 are bit-standardized; both engines emit lowercase hex
    "c69_content_hash" ->
      ("WITH d AS (SELECT doc_id, md5(text) AS md5_hex, " +
        "sha256(text) AS sha256_hex FROM documents), " +
        "g AS (SELECT sha256_hex, COUNT(*) AS n_same_content FROM d GROUP BY 1) " +
        "SELECT doc_id, md5_hex, d.sha256_hex, n_same_content " +
        "FROM d JOIN g ON d.sha256_hex = g.sha256_hex ORDER BY doc_id"),
    // unique-key total order makes the page engine-independent
    "c70_offset_pagination" ->
      ("SELECT o_orderkey, o_custkey, o_orderpriority FROM orders " +
        "ORDER BY o_orderkey LIMIT 25 OFFSET 50")
  )
}
