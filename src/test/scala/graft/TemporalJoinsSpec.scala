package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Exactness of the bin-bucketed range join (c32's operator) across
  * bin widths: narrowing the bins changes only candidate volume, never
  * the result set — verified against an all-pairs reference on a
  * deterministic corpus that includes exact window-boundary pairs.
  */
class TemporalJoinsSpec extends SparkSpec {

  test("rangeSelfJoin returns identical pairs for every valid bin width") {
    import spark.implicits._
    // 500 distinct timestamps spread over 2 hours (7919 is coprime with
    // 7200, so i*7919 mod 7200 never collides for i < 7200)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ts = (0 until 500).map(i =>
      new java.sql.Timestamp(base + (i * 7919L % 7200L) * 1000L)) ++
      // crafted boundary pair exactly window-width apart, at half-second
      // offsets so they collide with none of the whole-second values
      Seq(new java.sql.Timestamp(base + 3600500L),
        new java.sql.Timestamp(base + 4200500L))
    val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("event_id", "ts")

    val expected = (for {
      (ta, ia) <- ts.zipWithIndex
      (tb, ib) <- ts.zipWithIndex
      d = tb.getTime - ta.getTime
      if d > 0 && d <= 600000L
    } yield (ia.toLong, ib.toLong)).toSet
    // the reference must exercise the inclusive boundary (d == window)
    assert(ts.combinations(2).exists(p =>
      math.abs(p(0).getTime - p(1).getTime) == 600000L))

    Seq(600L, 150L, 75L).foreach { bin =>
      val got = TemporalJoins.rangeSelfJoin(df, "ts", 600L, binSeconds = bin)
        .select(col("a_event_id"), col("b_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binSeconds=$bin diverged")
    }
    // a bin width that does not divide the window is a usage error
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeSelfJoin(df, "ts", 600L, binSeconds = 7L)
    }
  }

  test("rangeSuccessorCount matches brute force: ties, empty bins, k=1, window edge, trailing rows") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // deliberately nasty corpus: duplicate timestamps (strict-> ties),
    // a dense burst, a long gap (empty bins inside the span), an exact
    // window-width pair, and trailing rows whose forward window runs
    // past the last bin (exercises the hi+k domain extension)
    val offsetsMs: Seq[Long] = Seq(
      0L, 0L, 500L, 1500L, 1500L, 30000L, 59999L, 60000L, 600500L,
      600500L + 600000L, // exactly window-width after the previous
      3600000L, 3600001L, 7200000L) ++
      (0 until 200).map(i => 10000000L + (i * 7919L % 600000L))
    val ts = offsetsMs.map(o => new java.sql.Timestamp(base + o))
    val df = ts.zipWithIndex.map { case (t0, i) => (i.toLong, t0) }
      .toDF("event_id", "ts")

    val expected = ts.zipWithIndex.map { case (ta, ia) =>
      ia.toLong -> ts.count(tb => {
        val d = tb.getTime - ta.getTime; d > 0 && d <= 600000L
      }).toLong
    }.toMap

    // several bin widths, including k=1 (binSeconds == window)
    Seq(600L, 150L, 30L).foreach { bin =>
      val got = TemporalJoins
        .rangeSuccessorCount(df, "event_id", "ts", 600L, binSeconds = bin)
        .select(col("event_id"), col("n_within"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"binSeconds=$bin diverged: " +
        (expected.keySet ++ got.keySet).filter(k0 =>
          expected.get(k0) != got.get(k0)).take(5)
          .map(k0 => s"$k0: want ${expected.get(k0)} got ${got.get(k0)}")
          .mkString("; "))
    }
    // per-day pair totals agree with the enumeration operator
    val viaCount = TemporalJoins
      .rangeSuccessorCount(df, "event_id", "ts", 600L, binSeconds = 30L)
      .agg(sum(col("n_within"))).collect()(0).getLong(0)
    val viaPairs = TemporalJoins.rangeSelfJoin(df, "ts", 600L, binSeconds = 150L)
      .count()
    assert(viaCount == viaPairs,
      s"count decomposition $viaCount != enumeration $viaPairs")
  }

  test("rangeSuccessorCount is exact across the 1970 epoch (negative-micros bins)") {
    import spark.implicits._
    // timestamps straddling epoch zero: SQL DIV truncates toward zero,
    // which would merge the two bins around t=0 into one double-width
    // bin and overcount the middle-bin prefix sums — the operator must
    // floor-divide instead
    val offsetsMs = Seq(-900000L, -600000L, -599999L, -450000L, -300500L,
      -150000L, -30000L, -1L, 0L, 1L, 29999L, 150000L, 300500L,
      599999L, 600000L, 600001L, 900000L)
    val ts = offsetsMs.map(new java.sql.Timestamp(_))
    val df = ts.zipWithIndex.map { case (t0, i) => (i.toLong, t0) }
      .toDF("event_id", "ts")
    val expected = ts.zipWithIndex.map { case (ta, ia) =>
      ia.toLong -> ts.count(tb => {
        val d = tb.getTime - ta.getTime; d > 0 && d <= 600000L
      }).toLong
    }.toMap
    Seq(600L, 150L, 30L).foreach { bin =>
      val got = TemporalJoins
        .rangeSuccessorCount(df, "event_id", "ts", 600L, binSeconds = bin)
        .select(col("event_id"), col("n_within"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"binSeconds=$bin diverged around the epoch: " +
        (expected.keySet ++ got.keySet).filter(k0 =>
          expected.get(k0) != got.get(k0)).take(5)
          .map(k0 => s"$k0: want ${expected.get(k0)} got ${got.get(k0)}")
          .mkString("; "))
    }
  }

  test("rangeJoin (two relations) matches brute force and rangeSelfJoin is its diagonal case") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // left rows at both extremes sit OUTSIDE the right relation's bin
    // range entirely (before-first and after-last) — they must still
    // count zero successors rather than fail a domain lookup
    val lts = (0 until 80).map(i => base + (i * 7919L % 7200L) * 1000L) ++
      Seq(base - 900000L, base + 20000000L)
    val rts = (0 until 90).map(i => base + (i * 6007L % 7200L) * 1000L + 250L)
    val left = lts.zipWithIndex.map { case (t0, i) =>
      (i.toLong, new java.sql.Timestamp(t0)) }.toDF("lid", "lts")
    val right = rts.zipWithIndex.map { case (t0, i) =>
      (i.toLong, new java.sql.Timestamp(t0)) }.toDF("rid", "rts")
    val expected = (for {
      (lt, li) <- lts.zipWithIndex
      (rt, ri) <- rts.zipWithIndex
      d = rt - lt
      if d > 0 && d <= 600000L
    } yield (li.toLong, ri.toLong)).toSet
    Seq(600L, 150L).foreach { bin =>
      val got = TemporalJoins
        .rangeJoin(left, right, "lts", "rts", 600L, binSeconds = bin)
        .select(col("a_lid"), col("b_rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binSeconds=$bin two-relation diverged")
    }
    // the two-relation COUNTING form agrees per left row, including
    // left rows binned outside the right relation's bin range (the
    // dense domain must span both relations)
    val expectedCounts = lts.zipWithIndex.map { case (lt, li) =>
      li.toLong -> rts.count(rt => {
        val d = rt - lt; d > 0 && d <= 600000L
      }).toLong
    }.toMap
    Seq(600L, 30L).foreach { bin =>
      val gotCounts = TemporalJoins
        .rangeSuccessorCount(left, right, "lid", "lts", "rts", 600L, bin)
        .select(col("lid"), col("n_within"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotCounts == expectedCounts,
        s"binSeconds=$bin two-relation counting diverged: " +
          expectedCounts.keySet.filter(k0 =>
            expectedCounts.get(k0) != gotCounts.get(k0)).take(5)
            .map(k0 => s"$k0: want ${expectedCounts(k0)} got ${gotCounts.get(k0)}")
            .mkString("; "))
    }
  }

  test("rangeSuccessorCount keeps NULL-ts rows with n_within = 0 and rejects non-positive windows") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val df = Seq(
      (0L, Some(new java.sql.Timestamp(base))),
      (1L, Some(new java.sql.Timestamp(base + 1000L))),
      (2L, None) // NULL ts: no window, not a successor of anything
    ).toDF("event_id", "ts")
    val got = TemporalJoins
      .rangeSuccessorCount(df, "event_id", "ts", 600L, binSeconds = 30L)
      .select(col("event_id"), col("n_within"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // output contract: ALL input rows survive, the NULL-ts row at 0
    assert(got == Map(0L -> 1L, 1L -> 0L, 2L -> 0L), s"got $got")
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeSuccessorCount(df, "event_id", "ts", 0L, binSeconds = 30L)
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeSuccessorCount(df, "event_id", "ts", -600L, binSeconds = 30L)
    }
  }

  test("rangeSuccessorCount handles empty relations: empty self input and empty right side") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val empty = Seq.empty[(Long, java.sql.Timestamp)].toDF("event_id", "ts")
    // empty self form: empty output, NOT the broadcast-bound assert
    // firing on a NULL extent with its misleading binSeconds message
    assert(TemporalJoins
      .rangeSuccessorCount(empty, "event_id", "ts", 600L, binSeconds = 30L)
      .count() == 0)
    // two-relation form with an empty right side: every left row
    // survives with n_within = 0 (the documented contract)
    val left = Seq((0L, base), (1L, base)).toDF("event_id", "ts")
    val got = TemporalJoins
      .rangeSuccessorCount(left, empty, "event_id", "ts", "ts",
        600L, binSeconds = 30L)
      .select(col("event_id"), col("n_within"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L), s"got $got")
    // and both empty: empty output
    assert(TemporalJoins
      .rangeSuccessorCount(empty, empty, "event_id", "ts", "ts",
        600L, binSeconds = 30L)
      .count() == 0)
  }

  test("rangeSuccessorCount enforces the broadcast bin-domain bound with an actionable message") {
    import spark.implicits._
    // Two rows ~50 years apart at 1 s bins: a ~1.6e9-bin dense domain.
    // The in-plan assert must fire on the 1-row extent BEFORE the
    // densify explode can build anything, and point at binSeconds.
    val df = Seq(
      (0L, java.sql.Timestamp.valueOf("1970-06-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2020-06-01 00:00:00"))
    ).toDF("event_id", "ts")
    val e = intercept[Throwable] {
      TemporalJoins.rangeSuccessorCount(df, "event_id", "ts", 10L, binSeconds = 1L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val msg = messages(e).mkString(" | ")
    assert(msg.contains("binSeconds"), s"expected actionable message, got: $msg")
    assert(msg.contains("bin domain"), s"expected bin-domain diagnosis, got: $msg")
    // The registered c32/c52 shape (30 s bins, ~1-month span) stays
    // far inside the bound and must be unaffected.
    val ok = Seq(
      (0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-31 00:00:00"))
    ).toDF("event_id", "ts")
    assert(TemporalJoins
      .rangeSuccessorCount(ok, "event_id", "ts", 600L, binSeconds = 30L)
      .count() == 2)
  }

  test("temporal operators reject caller columns that collide with reserved internal names") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val withBin = Seq((1L, t0, "x")).toDF("event_id", "ts", "_bin")
    val withUs = Seq((1L, t0, 7L)).toDF("event_id", "ts", "_us")
    val withNWithin = Seq((1L, t0, 7L)).toDF("event_id", "ts", "n_within")
    val withSide = Seq((1L, t0, 0)).toDF("user_id", "ts", "_side")
    val clean = Seq((1L, t0)).toDF("event_id", "ts")

    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeSelfJoin(withBin, "ts", 600L, 30L)
    }
    assert(e1.getMessage.contains("_bin") && e1.getMessage.contains("reserved"))
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeSuccessorCount(withUs, "event_id", "ts", 600L, 30L)
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeSuccessorCount(withNWithin, "event_id", "ts", 600L, 30L)
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeSuccessorCount(clean, withUs, "event_id", "ts", "ts", 600L, 30L)
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(withSide, withSide.drop("_side"), "user_id", "ts", "ts", Nil)
    }
  }

  test("asofJoin: simultaneous right row is visible, later rows are not, no-match is null") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val left = Seq(
      (1L, t("10:00:00"), "p1"), // exactly-simultaneous click: ts <= semantics
      (1L, t("11:00:00"), "p2"), // most recent of two prior clicks wins
      (2L, t("09:00:00"), "p3")  // user 2 has no click at or before -> null
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("10:00:00"), 100L),
      (1L, t("10:30:00"), 101L),
      (2L, t("09:30:00"), 102L)  // later than p3: must NOT match
    ).toDF("user_id", "ts", "click_id")
    val got = TemporalJoins.asofJoin(left, right, "user_id", "ts", "ts", Seq("click_id"))
      .select(col("tag"), col("asof_click_id"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map("p1" -> 100L, "p2" -> 101L, "p3" -> -1L), s"got $got")
  }
}
