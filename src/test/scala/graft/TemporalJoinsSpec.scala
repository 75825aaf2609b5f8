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
