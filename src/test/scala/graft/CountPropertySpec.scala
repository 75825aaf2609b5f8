package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property for the algebraic law the reference's whole
  * map-reduce rewrite rests on (SURVEY §5, A10-A12 invariant): a
  * partial COUNT per partition merged by SUM equals the global COUNT,
  * for ANY partitioning of the data. (Gen driven directly — the
  * scalatest/scalacheck bridge isn't in the offline dependency set.)
  */
class CountPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("partial count + final merge ≡ global count for any partitioning") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.choose(0, 5))
      slices <- Gen.choose(1, 8)
    } yield (keys, slices)
    for ((keys, slices) <- samples(gen, 25)) {
      import spark.implicits._
      val df = spark.sparkContext.parallelize(keys, slices).toDF("k")
      val distributed = df.groupBy($"k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val local = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(distributed == local, s"keys=$keys slices=$slices")
    }
  }

  test("limit-in-plan ≡ limit-after-collect on sorted output (A3)") {
    import spark.implicits._
    val df = (1 to 100).toDF("v").orderBy($"v")
    val planned = df.limit(7).collect().map(_.getInt(0)).toSeq
    val after = df.collect().take(7).map(_.getInt(0)).toSeq
    assert(planned == after)
  }

  test("fixed-point PageRank is partitioning-invariant and conserves mass on random graphs (x69)") {
    import spark.implicits._
    // random connected-ish undirected graphs: node set 0..n-1, each
    // edge list closed under reversal so every node appears as src
    val gen = for {
      n <- Gen.choose(2, 12)
      extra <- Gen.listOfN(2 * n, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
      slices <- Gen.choose(1, 6)
    } yield (n, extra.filter(p => p._1 != p._2), slices)
    for ((n, pairs0, slices) <- samples(gen, 12) if pairs0.nonEmpty) {
      // spine path 0-1-...-k over the touched nodes keeps everything reachable
      val touched = pairs0.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      val spine = touched.zip(touched.drop(1))
      val und = (pairs0 ++ spine).flatMap(p => Seq(p, p.swap)).distinct
      val ranks = graft.ext.Graph.pageRankFp(
        spark.sparkContext.parallelize(
          und.map(p => (p._1.toLong, p._2.toLong)), slices).toDF("src", "dst"),
        iters = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every src-appearing node ranked exactly once
      assert(ranks.keySet == und.map(_._1.toLong).toSet)
      // integer mass conservation: total ≤ scale, leak bounded by the
      // per-division floor loss (≤ 1 unit per edge/node per round)
      val total = ranks.values.sum
      // per round: < outdeg units lost per node at the contribution
      // division (Σ = E), < 1 at the damping division per node, plus
      // < n at init and < n at the teleport base — 4·(E + n) is a
      // comfortable envelope for 2 rounds
      val leakBound = 4L * (und.size + ranks.size + 2)
      assert(total <= graft.ext.Graph.RankScale, s"mass exceeds scale: $total")
      assert(total > graft.ext.Graph.RankScale - leakBound,
        s"leak ${graft.ext.Graph.RankScale - total} exceeds bound $leakBound (graph $und)")
      // determinism across partitionings: a different slice count must
      // reproduce the identical rank map (integer sums are associative)
      val ranks2 = graft.ext.Graph.pageRankFp(
        spark.sparkContext.parallelize(
          und.map(p => (p._1.toLong, p._2.toLong)), math.max(1, slices - 1) % 6 + 1)
          .toDF("src", "dst"), iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ranks == ranks2, "rank map depends on partitioning")
    }
  }

  test("span dedup is shift-invariant on random corpora: an embedded excerpt is found at its exact offsets (x92)") {
    import spark.implicits._
    // random host docs over a tiny alphabet (so natural gram noise
    // exists), a random excerpt window, a random re-embedding offset:
    // the diagonal-island merge must report the planted span with the
    // exact (a_start, b_start) geometry, wherever the copy landed
    val gen = for {
      hostLen <- Gen.choose(16, 40)
      host <- Gen.listOfN(hostLen, Gen.oneOf("aa", "bb", "cc", "dd"))
      exStart <- Gen.choose(1, hostLen - 12)        // 1-based, ≥12 left
      exLen <- Gen.choose(10, math.min(16, hostLen - exStart + 1))
      padLen <- Gen.choose(0, 6)
      pad <- Gen.listOfN(padLen, Gen.oneOf("zz", "yy", "xx"))
    } yield (host, exStart, exLen, pad)
    for ((host, exStart, exLen, pad0) <- samples(gen, 15)) {
      val excerpt = host.slice(exStart - 1, exStart - 1 + exLen)
      // exact-collapse guard: a full-copy excerpt with no pad would be
      // byte-identical to the host and (correctly) collapse into it —
      // force a pad token so the twin is a genuine NEAR-dup
      val pad = if (pad0.isEmpty && excerpt == host) Seq("zz") else pad0
      val twinText = (pad ++ excerpt).mkString(" ")
      val corpus = Seq((1L, host.mkString(" ")), (2L, twinText))
        .toDF("doc_id", "text")
      val spans = graft.ext.Dedup.spanDupPairs(corpus, cap = 1000, minGrams = 3)
        .collect().map(r => (r.getInt(2), r.getInt(3), r.getLong(4)))
      // the planted copy: host position exStart aligns with twin
      // position padLen+1 for exLen tokens. Random repetition can
      // extend or merge spans, so the pinned property is COVERAGE on
      // the right diagonal, not uniqueness: some reported span on
      // diagonal (exStart − padLen − 1) must contain the excerpt.
      val diag = exStart - (pad.length + 1)
      val covering = spans.exists { case (as, bs, n) =>
        as - bs == diag && as <= exStart && as + n >= exStart + exLen
      }
      assert(covering,
        s"planted span (a=$exStart, b=${pad.length + 1}, len=$exLen) uncovered in ${spans.toSeq}")
    }
  }

  test("greedy k-center is row-order- and partitioning-invariant on random point sets (x130)") {
    import spark.implicits._
    // random integer-grid points (round-4 distances are exact, so the
    // argmax order is a pure function of the set) under random row
    // orders and slice counts: the selection sequence must not move
    val gen = for {
      n <- Gen.choose(3, 14)
      pts <- Gen.listOfN(n, Gen.zip(Gen.choose(-8, 8), Gen.choose(-8, 8)))
      perm <- Gen.choose(0, 5)
      slices <- Gen.choose(1, 5)
    } yield (pts.distinct, perm, slices)
    for ((pts, perm, slices) <- samples(gen, 10) if pts.size >= 3) {
      val rows = pts.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, Array(x.toDouble, y.toDouble)) }
      val k = math.min(4, rows.size)
      def run(rs: Seq[(Long, Array[Double])], sl: Int) =
        graft.ext.Similarity.kCenterGreedy(
          spark.sparkContext.parallelize(rs, sl).toDF("vec_id", "v"), k)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      val base = run(rows, slices)
      val shuffled = new scala.util.Random(perm).shuffle(rows)
      assert(run(shuffled, math.max(1, (slices % 5) + 1)) == base,
        s"selection depends on row order/partitioning (pts $pts)")
      // the seed is always the lowest vec_id at distance 0
      assert(base.contains((1, 0L, 0.0)))
    }
  }

  test("HITS two-round authority map is partitioning-invariant, matches the reference recurrence, conserves normalized mass (x129)") {
    import spark.implicits._
    // random bipartite edge sets driven through the real Spark
    // machinery (hitsTwoRounds) at random slice counts, compared to
    // the in-process integer recurrence (integer sums associative →
    // partitioning cannot move the map)
    val gen = for {
      es <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0, 4)))
      slices <- Gen.choose(1, 5)
    } yield (es.distinct, slices)
    for ((es, slices) <- samples(gen, 8)) {
      val S = graft.ext.Graph.HitsScale
      // h0 = 1: the uniform start is normalized away immediately, so
      // round-1 authority is the exact in-degree (no scale cliff)
      val h0 = 1L
      def norm(m: Map[Int, Long]): Map[Int, Long] = {
        // BigInt: v * S leaves Long once scores carry degree x scale
        val t = m.values.sum
        m.map { case (k, v) => k -> (BigInt(v) * S / t).toLong }
      }
      val a1n = norm(es.groupBy(_._2).map { case (s, e) => s -> e.size * h0 })
      val h1n = norm(es.groupBy(_._1).map { case (p, e) =>
        p -> e.map(x => a1n(x._2)).sum })
      val a2n = norm(es.groupBy(_._2).map { case (s, e) =>
        s -> e.map(x => h1n(x._1)).sum })
      def run(sl: Int): Map[Int, Long] =
        graft.ext.Graph.hitsTwoRounds(
          spark.sparkContext.parallelize(
            es.map(e => (e._1.toLong, e._2.toLong)), sl).toDF("p", "s"))
          .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      val got = run(slices)
      assert(got == a2n, s"spark $got vs reference $a2n for $es")
      assert(run(math.max(1, (slices % 5) + 1)) == got,
        "authority map depends on partitioning")
      val total = got.values.sum
      assert(total <= S && total > S - got.size,
        s"normalized mass $total outside ($S - ${got.size}, $S] for $es")
    }
  }

  test("bm25 scores are partitioning- and row-order-invariant on random corpora (x119)") {
    import spark.implicits._
    // random word-soup corpora over a tiny alphabet so query terms
    // collide with document terms often
    val word = Gen.oneOf("q", "r", "a", "b", "c")
    val gen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(word).map(_.take(12)))
      slices <- Gen.choose(1, 6)
    } yield (docs, slices)
    var ref: Option[Map[Long, Double]] = None
    for ((docs, slices) <- samples(gen, 10)) {
      val rows = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      def score(input: Seq[(Long, String)], sl: Int): Map[Long, Double] =
        graft.ext.TextAnalysis.bm25Scores(
          spark.sparkContext.parallelize(input, sl).toDF("doc_id", "text"),
          Seq("q", "r"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val base = score(rows, 1)
      // any partitioning, any row order — the 4 dp score is identical
      // (the partition-independence a 1000-executor run relies on)
      assert(score(rows, slices) == base, s"partitioning changed scores: $docs")
      assert(score(rows.reverse, slices) == base, s"row order changed scores: $docs")
      ref = Some(base)
    }
    assert(ref.exists(_.nonEmpty), "generator never produced a scoring corpus")
  }
}
