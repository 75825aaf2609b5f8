package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Two paths, per the scale brief:
  *  - brute-force cosine top-k against a query vector — the exactness
  *    baseline; a broadcast of the (tiny) query side, so the big side
  *    is a single codegen'd map + TakeOrdered, no shuffle of the corpus;
  *  - LSH-bucketed ANN (random-hyperplane signatures) — the 100 TB
  *    path. Scale shape:
  *      * signature width grows with the corpus ([[chooseBits]] ≈
  *        log2 n, clamped to [8, 24]) so expected bucket size — and
  *        with it per-bucket candidate volume — stays O(1) instead of
  *        O(n/2^const);
  *      * L independent hash tables OR-combined (candidate = collision
  *        in ANY table) recover the recall that wider signatures cost;
  *      * bucket rows carry only (table, signature, vec_id) — the
  *        candidate equi-join shuffles 3 longs per row, never the
  *        vector payload; vectors are fetched once per *deduplicated*
  *        candidate, not once per bucket collision.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd higher-order
  * functions) on double-cast arrays — no UDFs.
  */
object Similarity {

  private type Q = (SparkSession, String) => DataFrame

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    Lake.table(spark, sfDir, "embeddings")

  private def toDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Σ aᵢ·bᵢ over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Composed-built-ins cosine (three traversals + a zip_with
    * allocation per row) — kept as the differential baseline for the
    * fused native expression.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine on the hot path: the fused single-pass native Catalyst
    * expression (identical accumulation order → bit-identical results,
    * asserted in FunctionsSpec).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineNative(a, b)

  /** x112's exact-integer power iteration over a (vec_id,
    * qv: array<long>) frame — exposed so tests can plant an
    * anisotropic cloud and assert the dominant axis wins. See the
    * x112 registry comment for the overflow/normalization argument.
    */
  def principalDirection(q: DataFrame, nRows: Long, dims: Int): DataFrame = {
    val spark = q.sparkSession
    val cells = q.select(col("vec_id"), posexplode(col("qv")))
      .select(col("vec_id"), col("pos").as("i"), col("col").as("qi"))
    val gbar = cells
      .join(cells.select(col("vec_id"), col("i").as("j"), col("qi").as("qj")),
        "vec_id")
      .groupBy(col("i"), col("j"))
      .agg(expr(s"sum(qi * qj) DIV $nRows").as("g"))
    def step(v: DataFrame): DataFrame = {
      val u = gbar.join(v, "j").groupBy(col("i"))
        .agg(sum(col("g") * col("v")).as("u"))
      u.crossJoin(broadcast(u.agg(max(col("u")).as("m"))))
        .select(col("i").as("j"), expr("u * 1000 DIV m").as("v"))
    }
    val v0 = spark.range(0, dims).select(col("id").cast("int").as("j"),
      lit(1000L).as("v"))
    val v2 = step(step(v0))
    val num = gbar.join(v2, "j")
      .join(v2.select(col("j").as("i"), col("v").as("vi")), "i")
      .agg(sum(col("g") * col("v") * col("vi")).as("num"))
    val den = v2.agg(sum(col("v") * col("v")).as("den"))
    v2.select(col("j").as("dim"), col("v").as("loading"))
      .crossJoin(broadcast(num)).crossJoin(broadcast(den))
      .select(col("dim"), col("loading"),
        round(col("num").cast("double") / col("den"), 4).as("rayleigh"))
  }

  /** Number of hash tables in the OR-construction. More tables buy
    * recall at the target (high) similarity; candidate volume grows
    * linearly with L but stays bucket-bounded per table.
    */
  val DefaultTables = 16

  /** Signature width for a corpus of n vectors: ~log2 n keeps expected
    * bucket occupancy constant as the corpus grows (the round-2 16-
    * bucket variant was O(n²/16) — a cartesian split 16 ways).
    */
  def chooseBits(n: Long): Int =
    math.max(8, math.min(24, math.ceil(math.log(math.max(n, 2).toDouble) / math.log(2.0)).toInt))

  /** nBits-bit random-hyperplane signature of the array<double> column
    * named `vecCol` under hash table `table`: bit p = sign of
    * Σ_d v[d] · plane(table, p, d), where the hyperplane components are
    * deterministic pseudo-random xxhash64(table, p, d) folded into
    * [-1, 1] — a pure function of the indices, identical on every
    * executor, no RNG state to ship.
    */
  def lshSignature(vecCol: String, nBits: Int, table: Int): Column =
    expr(s"aggregate(sequence(0, ${nBits - 1}), 0, (acc, p) -> acc | " +
      s"CASE WHEN aggregate(sequence(0, size($vecCol) - 1), CAST(0 AS DOUBLE), " +
      s"(s, d) -> s + element_at($vecCol, d + 1) * " +
      s"((CAST(pmod(xxhash64($table, p, d), 1000003) AS DOUBLE) / 500001.5) - 1.0)) > 0 " +
      s"THEN shiftleft(1, p) ELSE 0 END)")

  /** Engine-reproducible variant of [[lshSignature]] for the x75
    * oracle gate: the vector quantizes to integers (round(v·1000) —
    * one exact-rounded IEEE multiply, identical in both engines) and
    * the hyperplane components come from pure modular arithmetic on
    * (table, bit, dim), so every bit is the sign of an EXACT integer
    * dot product — no float accumulation anywhere in the signature.
    */
  def intPlaneSignature(vecCol: String, nBits: Int, table: Int): Column =
    expr(s"aggregate(sequence(0, ${nBits - 1}), 0L, (acc, p) -> acc | " +
      s"CASE WHEN aggregate(sequence(0, size($vecCol) - 1), 0L, " +
      s"(s, d) -> s + CAST(round(element_at($vecCol, d + 1) * 1000) AS BIGINT) * " +
      s"((($table * 7919 + p * 104729 + d * 1000003) % 2003) - 1001)) > 0 " +
      s"THEN shiftleft(1L, p) ELSE 0L END)")

  /** Narrow bucket rows (tbl, sig, vec_id) — one per hash table per
    * vector. Input must have `vec_id` and an array<double> `vec`.
    */
  def lshBuckets(df: DataFrame, nBits: Int, nTables: Int): DataFrame =
    df.select(col("vec_id"),
      posexplode(array((0 until nTables).map(t =>
        lshSignature("vec", nBits, t)): _*)).as(Seq("tbl", "sig")))

  /** Deduplicated unordered candidate pairs (vec_a < vec_b) colliding
    * in at least one hash table. The equi-join key is (tbl, sig) — the
    * shuffle that replaces the n² comparison; both sides are id-only.
    * Takes the bucket table directly: it feeds BOTH join sides, so
    * callers should materialize it once (registered queries checkpoint
    * it to the lake) rather than recompute the signatures per branch.
    *
    * Hot-bucket guard (same rationale as Dedup.minhashCandidates): a
    * bucket of s members is s² join rows in ONE task; buckets above
    * `maxBucket` — a degenerate duplicate-class all hashing alike —
    * are excluded from candidate generation and belong to exact dedup
    * upstream. No provisioned bucket reaches the default cap.
    */
  def candidatesFromBuckets(buckets: DataFrame,
      maxBucket: Long = 100000L): DataFrame = {
    val hot = buckets.groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") > maxBucket)
      .select(col("tbl"), col("sig"))
    val ok = buckets.join(hot, Seq("tbl", "sig"), "left_anti")
    val a = ok.select(col("tbl"), col("sig"), col("vec_id").as("vec_a"))
    val b = ok.select(col("tbl"), col("sig"), col("vec_id").as("vec_b"))
    a.join(b, Seq("tbl", "sig"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
  }

  /** Convenience form for in-process corpora (tests): builds the
    * buckets inline.
    */
  def annCandidatePairs(df: DataFrame, nBits: Int, nTables: Int): DataFrame =
    candidatesFromBuckets(lshBuckets(df, nBits, nTables))

  /** x137's approximate kNN graph over a (vec_id, vec) frame: x75's
    * engine-constructible int-plane buckets generate collision
    * candidates, pairs expand to both directions (kNN is per-node),
    * exact 4 dp-rounded cosine ranks them, and the per-src window
    * runs over collision-bounded candidate lists — never the corpus.
    */
  /** x241's skewness-of-k-occurrence readout over a zero-filled
    * in-degree frame (one `d` column): four exact BIGINT moments,
    * one fixed double g₁ = m₃/m₂^1.5 expression at 6 dp. Exposed for
    * the hand-moment unit fixture.
    */
  def hubnessFromInDegrees(ind: DataFrame): DataFrame = {
    def dd(c: String) = col(c).cast("double")
    val mu = dd("s1") / dd("n")
    val m2 = dd("s2") / dd("n") - mu * mu
    val m3 = dd("s3") / dd("n") -
      lit(3.0) * mu * dd("s2") / dd("n") + lit(2.0) * mu * mu * mu
    ind.agg(count(lit(1)).as("n"), sum(col("d")).as("s1"),
        sum(col("d") * col("d")).as("s2"),
        sum(col("d") * col("d") * col("d")).as("s3"),
        max(col("d")).as("max_in_deg"),
        sum(when(col("d") === 0L, 1L).otherwise(0L)).as("n_antihubs"))
      .select(col("n").as("n_nodes"), col("n_antihubs"),
        col("max_in_deg"),
        when(col("n") > 0L && m2 > 0.0,
          round(m3 / (m2 * sqrt(m2)), 6)).as("skew_g1"))
  }

  def knnGraph(e: DataFrame, k: Int, nBits: Int, nTables: Int): DataFrame = {
    val buckets = e.select(col("vec_id"),
      posexplode(array((0 until nTables).map(t =>
        intPlaneSignature("vec", nBits, t)): _*))
        .as(Seq("tbl", "sig")))
    val pairs = candidatesFromBuckets(buckets)
    val arcs = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .unionAll(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst")))
    val scored = arcs
      .join(e.select(col("vec_id").as("src"), col("vec").as("vs")), "src")
      .join(e.select(col("vec_id").as("dst"), col("vec").as("vd")), "dst")
      .select(col("src"), col("dst"),
        round(cosine(col("vs"), col("vd")), 4).as("cos"))
    val w = Window.partitionBy(col("src")).orderBy(desc("cos"), col("dst"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("src"), col("rk"), col("dst"), col("cos"))
  }

  /** Near-dup pairs by exact cosine over the LSH candidates: fetch the
    * two vectors per deduplicated pair, verify cosine ≥ threshold.
    * `df` must have `vec_id` and array<double> `vec`.
    */
  def neardupPairsFrom(buckets: DataFrame, df: DataFrame,
      threshold: Double): DataFrame = {
    val va = df.select(col("vec_id").as("vec_a"), col("vec").as("va"))
    val vb = df.select(col("vec_id").as("vec_b"), col("vec").as("vb"))
    candidatesFromBuckets(buckets)
      .join(va, "vec_a").join(vb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  def neardupPairs(df: DataFrame, nBits: Int, nTables: Int,
      threshold: Double): DataFrame =
    neardupPairsFrom(lshBuckets(df, nBits, nTables), df, threshold)

  /** Sorted-neighborhood (SNM) embedding near-dup — the DETERMINISTIC
    * blocking method next to the seeded LSH/SimHash family, and
    * therefore the one whose full output an external engine can
    * reproduce: sort each label partition by a data-derived key (the
    * raw first embedding component — exact float pass-through, no
    * arithmetic), slide a `window`-row neighborhood over that order,
    * and verify candidates by exact cosine. Near-identical vectors
    * have near-identical sort keys, so they land adjacent; candidate
    * volume is exactly n·window by construction (vs LSH's
    * collision-bound), at the cost of recall for pairs whose first
    * component disagrees.
    *
    * Scale shape: the rank is one window over the label partition;
    * neighbor pairing is a pure equi-join on (label, rank) against
    * the exploded forward window — no range-predicate join, no
    * quadratic label-group blowup. `checkpoint` snapshots the ranked
    * table once for both join sides.
    */
  def snmNeardup(df: DataFrame, window: Int, threshold: Double,
      checkpoint: DataFrame => DataFrame = identity): DataFrame = {
    val byKey = Window.partitionBy(col("label"))
      .orderBy(element_at(col("embedding"), 1), col("vec_id"))
    val ranked = checkpoint(df
      .select(col("vec_id"), col("label"), col("embedding"),
        row_number().over(byKey).as("rk")))
    val probes = ranked.select(col("label"), col("vec_id").as("_va"),
      col("embedding").as("_ea"),
      explode(sequence(col("rk") + 1, col("rk") + window)).as("_rk2"))
    val partners = ranked.select(col("label"), col("rk").as("_rk2"),
      col("vec_id").as("_vb"), col("embedding").as("_eb"))
    probes.join(partners, Seq("label", "_rk2"))
      .withColumn("_cos", cosine(col("_ea"), col("_eb")))
      .filter(col("_cos") >= threshold)
      .select(least(col("_va"), col("_vb")).as("vec_a"),
        greatest(col("_va"), col("_vb")).as("vec_b"),
        round(col("_cos"), 4).as("cos"))
  }

  /** SemDeDup — cluster-bounded embedding-cosine near-dedup (Abbas et
    * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): within each cluster, drop a vector iff
    * some LOWER-id member sits within cosine `threshold` of it. The
    * rule is engine-reproducible because it carries no sequential
    * greedy state — whether the lower-id witness itself survives is
    * irrelevant — so the survivor set is a pure function of the
    * pairwise similarity graph, not of iteration order.
    *
    * Scale shape: the pairwise compare is an equi-join on the cluster
    * key, so the quadratic term is bounded by the LARGEST CLUSTER, not
    * the corpus — the paper's own design, where clusters come from a
    * k-means coarse quantizer ([[ivfFit]] here) sized so cells stay
    * O(corpus/k). The dropped set is id-only (no vector payload
    * shuffled twice) and applied with a broadcast-able left-anti join.
    */
  def semanticDedup(df: DataFrame, clusterCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(clusterCol).as("_cl"), col("vec_id").as("_va"),
      col("embedding").as("_ea"))
    val b = df.select(col(clusterCol).as("_cl"), col("vec_id").as("_vb"),
      col("embedding").as("_eb"))
    val dropped = a.join(b, "_cl")
      .filter(col("_va") < col("_vb") &&
        cosine(col("_ea"), col("_eb")) >= threshold)
      .select(col("_vb").as("vec_id")).distinct()
    df.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** IVF (inverted-file) ANN — the other classic scale path next to
    * LSH: a seeded k-means coarse quantizer partitions the corpus into
    * k disjoint cells; a query probes only its `nprobe` nearest cells
    * and reranks those candidates by exact cosine. Work per query is
    * ~(nprobe/k) of the corpus instead of all of it, and the cells are
    * disjoint so no candidate dedup is needed.
    *
    * @param df corpus with `vec_id` and array<double> `vec`
    */
  /** INDEX BUILD (the amortized step): seeded k-means cell assignment
    * of the corpus — (vec_id, vec, cell). Registered queries checkpoint
    * this via Lake.materialize so the ML fit runs once per (corpus
    * fingerprint, k), never per query invocation.
    */
  def ivfFit(df: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = df.withColumn("features", array_to_vector(col("vec")))
    val model = new KMeans().setK(k).setSeed(7L)
      .setFeaturesCol("features").fit(feat)
    model.transform(feat)
      .select(col("vec_id"), col("vec"), col("prediction").as("cell"))
  }

  /** Centroids derived FROM the (materialized) assignments — the mean
    * vector per cell — so loading the index never re-runs the fit. One
    * aggregation over (cell, dim), k·dim rows out.
    */
  def ivfCentroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("vec")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d")).agg(avg(col("x")).as("x"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("x")))),
        s => s.getField("x")).as("centroid"))

  /** Σ (aᵢ−bᵢ)² over two array<double> columns (codegen'd HOF). */
  /** Composed-built-ins squared L2 — the differential baseline for the
    * fused native expression (FunctionsSpec asserts bit-identity).
    */
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 on the hot path (IVF/PQ probe ranking): the fused
    * single-pass native expression — no zip_with allocation, no lambda
    * dispatch, identical accumulation order.
    */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.sqL2Native(a, b)

  /** PROBE (the per-query step): each query vector probes its `nprobe`
    * nearest cells and reranks those candidates by exact cosine.
    * Work per query is ~(nprobe/k) of the corpus instead of all of it,
    * and cells are disjoint so no candidate dedup is needed.
    *
    * Probe selection stays in EXECUTORS: the k-row centroid table is
    * broadcast against the query batch (|Q|·k intermediate rows) and
    * each query keeps its nprobe nearest cells via a per-query
    * row_number window — neither the query table nor the centroids is
    * ever collected to the driver, so an arbitrarily large query batch
    * scales with the cluster. (The probe table itself is still hinted
    * broadcast into the corpus join: |Q|·nprobe rows is the small side
    * by construction; at extreme |Q| Spark/AQE would fall back to a
    * shuffle join on `cell`.)
    */
  def ivfTopKFrom(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist"), col("cell"))
    val probes = queries.select(col("query_id"), col("qvec"))
      .join(broadcast(centroids.select(col("cell"), col("centroid"))))
      .withColumn("cdist", sqDist(col("qvec"), col("centroid")))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cell"), col("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("neighbor_id"))
    broadcast(probes).join(assigned, "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qvec"), col("vec")), 4).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Convenience form for in-process corpora (tests): fit + probe in
    * one call, no lake. Registered queries use the materialized path.
    */
  def ivfTopK(df: DataFrame, queriesFilter: Column, k: Int, nprobe: Int,
      topK: Int): DataFrame = {
    val assigned = ivfFit(df, k)
    ivfTopKFrom(assigned, ivfCentroidsOf(assigned),
      df.filter(queriesFilter)
        .select(col("vec_id").as("query_id"), col("vec").as("qvec")),
      nprobe, topK)
  }

  /** PQ (product quantization) — the MEMORY-bound ANN scale path next
    * to LSH (hash pruning) and IVF (coarse partitioning): each vector
    * is compressed to m small codes, one per contiguous subspace, each
    * subspace quantized by its own seeded k-means codebook; search
    * scans the CODES with a per-query additive distance table (ADC)
    * instead of the raw vectors. At 100 TB the search reads m small
    * ints per vector instead of 4·dim bytes, and both the codebooks
    * (m·ksub rows) and the per-query distance tables (|Q|·m·ksub rows)
    * are broadcast-small by construction.
    */
  /** CODEBOOKS (the amortized fit): seeded k-means per contiguous
    * subspace. Output (sub, code, centroid) — m·ksub rows. Registered
    * queries lake-materialize this per (corpus fingerprint, m, ksub).
    */
  def pqFit(df: DataFrame, m: Int, ksub: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = df.sparkSession
    import spark.implicits._
    val dim = df.select(size(col("vec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val sd = dim / m
    (0 until m).map { s =>
      val feat = df.select(
        array_to_vector(slice(col("vec"), s * sd + 1, sd)).as("features"))
      val model = new KMeans().setK(ksub).setSeed(7L + s)
        .setFeaturesCol("features").fit(feat)
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (v, c) => (s, c, v.toArray.toSeq) }
        .toDF("sub", "code", "centroid")
    }.reduce(_ unionByName _)
  }

  /** ENCODE (amortized): nearest codebook entry per (vector, subspace)
    * → (vec_id, sub, code), the compressed representation the search
    * scans. The argmin is a partial-aggregatable `min` over
    * (distance, code) structs — lexicographic struct ordering makes
    * the tie-break deterministic with no window shuffle.
    */
  def pqEncode(df: DataFrame, codebooks: DataFrame, m: Int,
      subDim: Int): DataFrame = {
    val subs = df.select(col("vec_id"), posexplode(
      array((0 until m).map(s =>
        slice(col("vec"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "sv")))
    subs.join(broadcast(codebooks), "sub")
      .select(col("vec_id"), col("sub"),
        struct(sqDist(col("sv"), col("centroid")).as("d2"),
          col("code").as("code")).as("sc"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(col("sc")).getField("code").as("code"))
  }

  /** ADC SEARCH (the per-query step): distance table dt(query, sub,
    * code) = ‖q_sub − centroid‖², broadcast against the code scan;
    * candidate distance = Σ_sub dt[sub, code_sub] via a
    * partial-aggregated sum — raw corpus vectors are never touched.
    */
  def pqTopKFrom(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      m: Int, subDim: Int, topK: Int): DataFrame = {
    val qsubs = queries.select(col("query_id"), posexplode(
      array((0 until m).map(s =>
        slice(col("qvec"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "qsv")))
    val dt = qsubs.join(broadcast(codebooks), "sub")
      .select(col("query_id"), col("sub"), col("code"),
        sqDist(col("qsv"), col("centroid")).as("pd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    codes.join(broadcast(dt), Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adc"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-(corpus, m, ksub) subspace width — saves a driver job on the
    * warm repeat-invocation path of the registered query.
    */
  private val pqSubDimCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** LSH ANN top-k per query from a (materialized) bucket table:
    * candidates are bucket collisions in any hash table, deduplicated,
    * then reranked by exact cosine. Shared by the x08 registered query
    * (topK=3) and the x54 recall report (topK=10).
    */
  def lshTopKFrom(buckets: DataFrame, e: DataFrame, queryPred: Column,
      topK: Int): DataFrame = {
    val qb = buckets.filter(queryPred)
      .select(col("tbl"), col("sig"), col("vec_id").as("query_id"))
    val cands = qb.join(buckets, Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    // query vectors: bounded tiny side -> broadcast; neighbor fetch
    // shuffles the corpus vectors once, keyed by id.
    val qv = broadcast(e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec")))
    val nv = e.select(col("vec_id").as("neighbor_id"), col("vec").as("nvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("neighbor_id"))
    cands.join(qv, "query_id").join(nv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("nvec")), 4).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact-cosine ground truth: top-k neighbors per query by brute
    * force — x07's shape generalized to a query batch. The query side
    * is broadcast (|Q| tiny by construction); the corpus side is one
    * scan, so computing the truth costs one pass regardless of |Q|.
    */
  def bruteTopK(e: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val qv = broadcast(e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("neighbor_id"))
    e.select(col("vec_id").as("neighbor_id"), col("vec").as("nvec"))
      .join(qv)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("nvec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Recall@k report: per query, how many of the exact top-k the ANN
    * result recovered. This is the ANN QUALITY REGRESSION GATE as a
    * first-class query: the planted-recall unit tests pin guarantees
    * at toy scale, and this row makes a recall drop on the provisioned
    * corpus visible in the driver's correctness artifact (counts are
    * deterministic — seeded hyperplanes / seeded k-means, materialized
    * index). Join shape: truth and ANN are both |Q|·k rows — model-
    * sized at any corpus scale.
    */
  def recallAtK(truth: DataFrame, ann: DataFrame, k: Int): DataFrame = {
    val hits = truth
      .join(ann.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_recalled"))
    truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(k).as("k"),
        coalesce(col("n_recalled"), lit(0L)).as("n_recalled"),
        round(coalesce(col("n_recalled"), lit(0L)).cast("double") /
          col("n_true"), 4).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Convenience form for in-process corpora (tests). */
  def pqTopK(df: DataFrame, queriesFilter: Column, m: Int, ksub: Int,
      topK: Int): DataFrame = {
    val codebooks = pqFit(df, m, ksub)
    val sd = codebooks.select(size(col("centroid"))).head().getInt(0)
    pqTopKFrom(pqEncode(df, codebooks, m, sd), codebooks,
      df.filter(queriesFilter)
        .select(col("vec_id").as("query_id"), col("vec").as("qvec")),
      m, sd, topK)
  }

  /** x147's isotropy report over a (vec_id, qv: Array[Long]) frame:
    * the mean pairwise dot product computed by the SUM-VECTOR
    * identity Σ_{i≠j}⟨qᵢ,qⱼ⟩ = ‖Σqᵢ‖² − Σ‖qᵢ‖² — the N²/2 pairs
    * collapse to two linear passes and never materialize. Exact
    * BIGINTs until the two final divisions: ‖Σq‖² from per-dim sums
    * (a d-row frame after map-side combine), Σ‖q‖² from a per-row
    * lambda fold. Anisotropy = mean pair dot / mean sq norm — the
    * "how much of the space is one cone" diagnostic (≈ the average
    * pairwise cosine when norms concentrate; ≈ 1 = collapsed,
    * ≈ 0 would need centered components).
    */
  def isotropyReport(q: DataFrame): DataFrame = {
    val dimSums = q.select(posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x")).as("s"))
    val s2 = dimSums.agg(sum(col("s") * col("s")).as("sum_sq"))
    q.select(aggregate(col("qv"), lit(0L),
        (acc, v) => acc + v * v).as("nsq"))
      .agg(sum(col("nsq")).as("total_sq"), count(lit(1)).as("n"))
      .crossJoin(broadcast(s2))
      .select(col("n"), col("sum_sq"), col("total_sq"),
        round((col("sum_sq") - col("total_sq")).cast("double") /
          (col("n") * (col("n") - lit(1L))).cast("double"), 4)
          .as("mean_pair_dot"),
        round((col("sum_sq") - col("total_sq")).cast("double") /
          ((col("n") - lit(1L)) * col("total_sq")).cast("double"), 6)
          .as("anisotropy"))
  }

  /** x166's clustering stage over a (cx, cy, n) cell-count frame —
    * exposed so tests can plant lattices with known components.
    * Dense cells (n ≥ minPts) get id = cx·16 + cy; each emits its 9
    * neighbor keys (self included, so the min always sees the own
    * label) and the equi-join on the key yields the 8-neighborhood
    * edge list; `rounds` rounds of min-label propagation give every
    * cell the smallest id within its `rounds`-hop neighborhood — a
    * component labeling whenever cluster grid-diameter ≤ rounds
    * (true for blob-shaped density; a worst-case snake on the 16×16
    * lattice needs 30 — callers crank `rounds`; each round is one
    * cell-grain join). Integer minima are order-free, so the output
    * is engine-exact whether or not propagation has converged.
    */
  def gridClusterReport(cells: DataFrame, minPts: Long, rounds: Int): DataFrame = {
    val dense = cells.filter(col("n") >= minPts)
      .withColumn("id", col("cx") * 16 + col("cy"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probes = dense.select(col("id"),
        explode(array(offs.map { case (dx, dy) =>
          struct((col("cx") + dx).as("nx"), (col("cy") + dy).as("ny"))
        }: _*)).as("p"))
      .select(col("id"), col("p.nx").as("cx"), col("p.ny").as("cy"))
    val edges = probes
      .join(dense.select(col("cx"), col("cy"), col("id").as("nid")),
        Seq("cx", "cy"))
      .select(col("id"), col("nid"))
    val labels = (1 to rounds).foldLeft(
      dense.select(col("id"), col("id").as("label"))) { (l, _) =>
      edges.join(l.withColumnRenamed("id", "nid"), "nid")
        .groupBy(col("id")).agg(min(col("label")).as("label"))
    }
    dense.join(labels, "id")
      .select(col("cx"), col("cy"), col("n").as("n_points"),
        col("label").as("cluster"))
  }

  /** The shared K×L contingency under x251/x252: x64's argmin
    * k-means assignment crossed with the corpus `label` column —
    * one bounded cell frame (u = cluster, v = label, n_uv) off the
    * same broadcast-centroid scan as x64.
    */
  private def kmeansLabelContingency(spark: SparkSession,
      sfDir: String): DataFrame = {
    val K = 8
    val e = emb(spark, sfDir)
      .select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("v"))
    val cents = broadcast(e.orderBy(col("vec_id")).limit(K)
      .select(col("vec_id").as("k"), col("v").as("c")))
    e.crossJoin(cents)
      .select(col("vec_id"), col("label"), col("k"),
        round(sqDist(col("v"), col("c")), 4).as("d"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("d"), col("k"))).as("m"))
      .select(col("m.k").as("u"), col("label").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_uv"))
  }

  /** x251's adjusted Rand index over a (u, v, n_uv) contingency-cell
    * frame between two labelings — the chance-corrected pair-counting
    * agreement (the raw Rand index rewards any split; ARI subtracts
    * the expected agreement of independent labelings): with
    * sumC = Σ_uv C(n_uv,2), sumA/sumB the margin pair counts, and
    * E = sumA·sumB/C(n,2), ARI = (sumC − E)/((sumA+sumB)/2 − E).
    * All pair counts are exact BIGINTs off the bounded cell frame;
    * the one overflow risk — sumA·sumB ≈ n⁴/4 — accumulates in
    * DECIMAL(38,0) (safe past n = 10⁹) before the one double
    * division. Degenerate den = 0 (both labelings trivial) reads
    * NULL.
    */
  def ariFromContingency(ct: DataFrame): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val cellStats = ct.agg(sum(col("n_uv")).as("n"),
      sum(expr("n_uv * (n_uv - 1) DIV 2")).as("sum_c"))
    val rowStats = ct.groupBy(col("u")).agg(sum(col("n_uv")).as("a_u"))
      .agg(count(lit(1)).as("k_u"),
        sum(expr("a_u * (a_u - 1) DIV 2")).as("sum_a"))
    val colStats = ct.groupBy(col("v")).agg(sum(col("n_uv")).as("b_v"))
      .agg(count(lit(1)).as("k_v"),
        sum(expr("b_v * (b_v - 1) DIV 2")).as("sum_b"))
    cellStats.crossJoin(rowStats).crossJoin(colStats)
      .withColumn("e_pairs",
        (col("sum_a").cast("decimal(38,0)") *
          col("sum_b").cast("decimal(38,0)")).cast("double") /
          dd(expr("n * (n - 1) DIV 2")))
      .withColumn("den",
        (dd(col("sum_a")) + dd(col("sum_b"))) / 2.0 - col("e_pairs"))
      .select(col("n"), col("k_u"), col("k_v"),
        when(abs(col("den")) > 0.0,
          round((dd(col("sum_c")) - col("e_pairs")) / col("den"), 6))
          .as("ari"))
  }

  /** x252's normalized mutual information over the same contingency
    * cells — the information-theoretic agreement beside x251's
    * pair-counting one: I = Σ_uv (n_uv/n)·ln(n·n_uv/(a_u·b_v)),
    * H_U = ln n − Σ_u a_u·ln a_u / n (and H_V alike),
    * NMI = 2I/(H_U + H_V) — the arithmetic-mean normalization.
    * Margins join back to the bounded cell frame; every ln runs at
    * cell grain, exact integers underneath.
    */
  def nmiFromContingency(ct: DataFrame): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val n1 = ct.agg(sum(col("n_uv")).as("n"))
    val rows = ct.groupBy(col("u")).agg(sum(col("n_uv")).as("a_u"))
    val cols = ct.groupBy(col("v")).agg(sum(col("n_uv")).as("b_v"))
    val iSum = ct.join(broadcast(rows), "u").join(broadcast(cols), "v")
      .crossJoin(broadcast(n1))
      .agg(sum(dd(col("n_uv")) *
        log(dd(col("n")) * dd(col("n_uv")) /
          (dd(col("a_u")) * dd(col("b_v"))))).as("i_raw"))
    val hu = rows.agg(sum(dd(col("a_u")) * log(dd(col("a_u")))).as("su"),
      count(lit(1)).as("k_u"))
    val hv = cols.agg(sum(dd(col("b_v")) * log(dd(col("b_v")))).as("sv"),
      count(lit(1)).as("k_v"))
    n1.crossJoin(iSum).crossJoin(hu).crossJoin(hv)
      .withColumn("i_val", col("i_raw") / dd(col("n")))
      .withColumn("h_u", log(dd(col("n"))) - col("su") / dd(col("n")))
      .withColumn("h_v", log(dd(col("n"))) - col("sv") / dd(col("n")))
      .select(col("n"), col("k_u"), col("k_v"),
        round(col("i_val"), 6).as("mutual_info"),
        when(col("h_u") + col("h_v") > 0.0,
          round(lit(2.0) * col("i_val") / (col("h_u") + col("h_v")), 6))
          .as("nmi"))
  }

  val queries: Map[String, Q] = Map(

    // EMBEDDING ISOTROPY — the anisotropy/representation-collapse
    // diagnostic (Ethayarajh's "how contextual are embeddings"
    // readout; Mu & Viswanath's all-but-the-top motivation) as a
    // corpus-card number: the mean pairwise dot of all N² vector
    // pairs — WITHOUT the pairwise join. The sum-vector identity
    // (see [[isotropyReport]]) does the quadratic work in two linear
    // passes: per-dim component sums (d-row shuffle after map-side
    // combine) and a per-row norm fold. The contrast is the point at
    // 100 TB: x07/x137 bound pairwise work by candidates; this one
    // ELIMINATES it algebraically — the strongest scale shape in the
    // similarity family. Components ride x112's shared 0..255
    // integer grid, so everything to the two final divisions is an
    // exact BIGINT (overflow headroom: per-dim sums < 255·N — at
    // N > ~10⁹ the d-row sum frame swaps to DECIMAL(38,0)
    // accumulation unchanged).
    "x147_isotropy" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val q = e.crossJoin(bounds)
        .select(col("vec_id"),
          transform(toDouble(col("embedding")),
            v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("long")).as("qv"))
      isotropyReport(q)
    }),

    // PARTICIPATION RATIO — the effective dimensionality of the
    // embedding cloud from per-coordinate variances (x147 reads the
    // MEAN of the cloud — anisotropy of the center; x262's LID reads
    // local neighborhood growth; PR_diag = (Σ var_d)²/Σ var_d² reads
    // how many coordinates CARRY the variance — d means perfectly
    // spread, ≪ d means a few dominant axes, the "is my embedding
    // collapsed" card number): on x112's shared 0..255 grid each
    // per-dim variance numerator v_d = n·Σq² − (Σq)² is exact, and
    // the n² denominators CANCEL in the ratio, so
    // PR = (Σ v_d)²/(Σ v_d²) is exact integers to ONE division.
    // Overflow discipline (the Hoover/x247 fix pattern): the n·Σq²
    // product is widened to DECIMAL(38,0)/HUGEINT BEFORE the
    // multiply — as a BIGINT it would wrap silently on Spark (and
    // raise on DuckDB) at worst-case n ≈ 1.2×10⁷ vectors
    // (n·Σq² ≤ n²·255²). Post-widening the binding term is the
    // Σv_d² readout square, inside 38 digits to worst-case
    // n ≈ 7×10⁶ on a maximally-spread grid (v_d ≤ n²·(255/2)²) and
    // var-dependently far beyond for real clouds (var ≈ 100 →
    // n ≈ 1.7×10⁸); past that, decimal overflow is LOUD (NULL pr on
    // Spark, raise on DuckDB — never a silent wrong number) and the
    // family's documented swap is a coarser grid or double readout.
    // d-row frame after one map-side-combined scan — x147's linear
    // scale shape.
    "x287_participation_ratio" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val dims = e.crossJoin(bounds)
        .select(posexplode(transform(toDouble(col("embedding")),
          v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
            .cast("long"))).as(Seq("dim", "q")))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
          sum(col("q") * col("q")).as("ss"))
        .withColumn("v", col("n").cast("decimal(38,0)") * col("ss") -
          col("s").cast("decimal(38,0)") * col("s"))
      dims.agg(count(lit(1)).as("n_dims"), max(col("n")).as("n_vecs"),
          sum(col("v")).as("sv"),
          sum(col("v") * col("v")).as("svv"))
        .select(col("n_vecs"), col("n_dims"),
          when(col("svv") > 0,
            round((col("sv") * col("sv")).cast("double") /
              col("svv").cast("double"), 4)).as("pr"),
          when(col("svv") > 0 && col("n_dims") > 0,
            round((col("sv") * col("sv")).cast("double") /
              (col("svv").cast("double") * col("n_dims").cast("double")),
              6)).as("pr_norm"))
    }),

    // EMBEDDING DRIFT — the representation-space member of the drift
    // family (x98/x133 watch scalar values; this asks whether a NEW
    // corpus half occupies the same region of embedding space — the
    // "did the new crawl batch shift my feature distribution" ops
    // check a retrain decision hangs on): halves by vec_id parity
    // (deterministic), per-(dim, half) component sums on x112's
    // shared 0..255 integer grid (exact BIGINT, d-row shuffle after
    // map-side combine), per-dim mean shift as the exact rational
    // (s_a·n_b − s_b·n_a)/(n_a·n_b) onto a 10⁻⁴ grid, and the
    // overall L2 shift = √(Σ shift_fp²)/10⁴ — the squared grid
    // integers sum exactly, ONE sqrt+division at readout. Top-10
    // dims by |shift|. x147's linear-pass scale shape: nothing
    // pairwise, nothing corpus-sized after the one scan.
    "x177_embedding_drift" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val dims = e.crossJoin(bounds)
        .select((col("vec_id") % 2 === 0).as("h"),
          posexplode(transform(toDouble(col("embedding")),
            v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("long"))).as(Seq("dim", "q")))
        .groupBy(col("dim"))
        .agg(sum(when(col("h"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("h"), col("q")).otherwise(0L)).as("s_a"),
          sum(when(!col("h"), 1L).otherwise(0L)).as("n_b"),
          sum(when(!col("h"), col("q")).otherwise(0L)).as("s_b"))
      val whole = Window.partitionBy(lit(1))
      dims
        .withColumn("shift_fp",
          round((col("s_a") * col("n_b") - col("s_b") * col("n_a"))
            .cast("double") /
            (col("n_a") * col("n_b")).cast("double") * lit(10000.0), 0)
            .cast("long"))
        .withColumn("_l2fp", sum(col("shift_fp") * col("shift_fp"))
          .over(whole))
        .select(col("dim"), col("n_a"), col("n_b"),
          round(col("shift_fp").cast("double") / lit(10000.0), 4)
            .as("mean_shift"),
          round(sqrt(col("_l2fp").cast("double")) / lit(10000.0), 4)
            .as("l2_shift"))
        .orderBy(abs(col("mean_shift")).desc, col("dim"))
        .limit(10)
    }),

    // GRID-DENSITY CLUSTERING — the DBSCAN idea made distributed-
    // native (x64's k-means needs k up front and splits elongated
    // blobs; density clustering finds the blob count itself):
    // project to the first two embedding dims on x112's shared
    // global grid, quantize to a 16×16 cell lattice, keep cells with
    // ≥ 5 points (the minPts core-cell rule), and label connected
    // dense cells by bounded min-label propagation over the
    // 8-neighborhood. The 100 TB shape is the whole point: points
    // reduce to cells in ONE partial-agg'able pass, the neighbor
    // join is an EXPLODED-PROBE equi-join (each dense cell emits its
    // 9 neighbor keys — banding discipline, never an inequality
    // join), and every propagation round is a cell-grain join on a
    // ≤256-row frame. Labels are exact integer minima — engine-
    // reproducible regardless of convergence — and 8 rounds cover
    // any blob of grid diameter ≤ 8 (see gridClusterReport).
    "x166_grid_cluster" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      // The ≤256-row cell frame feeds gridClusterReport's dense/
      // probes/edges branches AND all 8 label-propagation rounds —
      // without a checkpoint each plan reference re-runs the
      // corpus-grain bounds + cell aggregation (VERDICT r17 #6: the
      // grid spine re-derived per branch). One eager localCheckpoint
      // of the bounded lattice (never more than 16×16 rows at ANY
      // corpus size) pins the corpus scan to exactly one pass per
      // invocation; every propagation round then joins cell-grain
      // frames only. Same rows either way — x127's shared-frame
      // treatment on a provably bounded frame.
      val cells = e.crossJoin(bounds)
        .select(
          round((element_at(toDouble(col("embedding")), 1) - col("mn")) /
            (col("mx") - col("mn")) * 15, 0).cast("long").as("cx"),
          round((element_at(toDouble(col("embedding")), 2) - col("mn")) /
            (col("mx") - col("mn")) * 15, 0).cast("long").as("cy"))
        .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      gridClusterReport(cells, minPts = 5, rounds = 8)
        .orderBy(col("cx"), col("cy"))
    }),

    // ArrayType surface + exactness anchor: dimension and first
    // component pass through untouched (float-exact vs the oracle).
    "x06_embed_stats" -> ((spark, sfDir) =>
      emb(spark, sfDir)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_component"))
        .orderBy(col("vec_id"))
        .limit(100)),

    // PER-LABEL CENTROIDS — the k-means/IVF building block as a
    // first-class operator: element-wise mean of the embedding
    // vectors per label, in long form (label, dim, centroid). Scale
    // shape: posexplode to (label, dim, v) then ONE hash aggregation
    // — n·d rows but partial-aggregatable map-side down to
    // labels·d, so the shuffle is model-sized, not corpus-sized.
    // The mean is made ORDER-INDEPENDENT: each float casts to an
    // exact decimal(20,10) (a deterministic function of the value —
    // no boundary cases, float expansions never terminate at the
    // scale-10 digit), the decimal SUM is exact under any
    // accumulation order, and only then does ONE double division +
    // round happen — a double-avg rounded at 4 dp hash-mismatched at
    // sf0.1 exactly at a rounding boundary. `+ 0.0` folds -0.0000.
    "x39_embed_centroids" -> ((spark, sfDir) =>
      emb(spark, sfDir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(
          (round(sum(col("v").cast("decimal(20,10)")).cast("double") /
            count(lit(1)), 4) + lit(0.0)).as("centroid"),
          count(lit(1)).as("n_vectors"))
        .orderBy(col("label"), col("dim"))),

    // CLUSTER-SEPARATION REPORT: pairwise Euclidean distances between
    // the per-label centroids — the diagnostic that says whether the
    // clustering behind IVF/SemDeDup actually separated the corpus
    // (centroids closer than intra-cluster spread → merge the cells).
    // Composes x39's registered centroid query (same arithmetic, so
    // the 4 dp-rounded centroid grid is the deterministic input); the
    // pairwise join is labels²·dims rows — model-sized at any corpus
    // scale. The squared terms are exact-grid doubles, so the summed
    // distance is stable to far beyond the 4 dp output rounding.
    "x49_centroid_separation" -> ((spark, sfDir) => {
      val cent = queries("x39_embed_centroids")(spark, sfDir)
        .select(col("label"), col("dim"), col("centroid"))
      val a = cent.select(col("label").as("label_a"), col("dim"),
        col("centroid").as("_ca"))
      val b = cent.select(col("label").as("label_b"), col("dim"),
        col("centroid").as("_cb"))
      a.join(b, "dim")
        .filter(col("label_a") < col("label_b"))
        .groupBy(col("label_a"), col("label_b"))
        .agg(round(sqrt(sum(pow(col("_ca") - col("_cb"), 2))), 4).as("dist"))
        .orderBy(col("label_a"), col("label_b"))
    }),

    // Brute-force cosine top-k: query = vec_id 0, k = 10. The 1-row
    // query side is broadcast; the corpus side is one scan + TakeOrdered.
    // The native expression consumes the float arrays directly — no
    // per-row cast/copy to array<double> on the hot path.
    "x07_cosine_topk" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val query = broadcast(
        e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec")))
      e.filter(col("vec_id") =!= 0)
        .join(query)
        .select(col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("qvec")), 4).as("cos"))
        .orderBy(desc("cos"), col("vec_id"))
        .limit(10)
    }),

    // QUANTIZED RERANK — exact-integer scoring over GLOBALLY
    // quantized codes (x22 quantizes per-vector for storage stats;
    // comparable dot products need one corpus-wide grid): vectors
    // snap to 0..255 ints on a broadcast (min, max) grid, and the
    // [[graft.functions.IntDotProduct]] native expression scores
    // candidates against 3 broadcast query codes in pure long
    // arithmetic — the ONE vector kernel whose scores hash-oracle
    // with no rounding contract, because integer sums are
    // accumulation-order independent (the float kernels all carry a
    // 4 dp tolerance argument). Top-5 per query via a |Q|-partition
    // window (x07's determinism contract, vec_id tiebreak). This is
    // the memory-bound rerank step an int8 ANN deployment runs: 4×
    // less bandwidth than float32, scan + broadcast join + bounded
    // window at any corpus size.
    "x100_quantized_rerank" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val qe = e.crossJoin(bounds)
        .select(col("vec_id"), col("label"),
          transform(toDouble(col("embedding")),
            v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("int")).as("q"))
      val queries = broadcast(qe.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("q").as("qq")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("score"), col("vec_id"))
      qe.filter(col("vec_id") >= 3)
        .join(queries)
        .select(col("query_id"), col("vec_id"), col("label"),
          graft.functions.VectorExpressions.dotIntNative(col("q"), col("qq"))
            .as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id"), col("label"), col("score"))
        .orderBy(col("query_id"), desc("score"), col("vec_id"))
    }),

    // MATRYOSHKA TRUNCATION EVAL — the dimension-budget report an
    // MRL-style embedding deployment reads before shipping truncated
    // vectors: for each query, recall@10 of the top-10 ranked by the
    // FIRST-D-dims cosine against the full-dim top-10, at D = 8, 16,
    // 64. Each decade is x07's exact machinery (broadcast query,
    // rounded-cosine + vec_id tiebreak, WindowGroupLimit top-k) over
    // `slice(embedding, 1, D)` — a zero-copy projection of the same
    // scan; the three decades are a static union (x69's
    // bounded-rounds discipline). recall = overlap/10: one exact
    // integer count and one correctly-rounded division. The report
    // quantifies exactly what 8× less similarity bandwidth costs.
    "x105_matryoshka_eval" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      def ranked(dim: Int): DataFrame = {
        val vcol = slice(col("embedding"), 1, dim)
        val q = broadcast(e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"),
            slice(col("embedding"), 1, dim).as("qvec")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(desc("cos"), col("vec_id"))
        e.filter(col("vec_id") >= 3).join(q)
          .select(col("query_id"), col("vec_id"),
            round(cosine(vcol, col("qvec")), 4).as("cos"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("vec_id"))
      }
      val full = ranked(64)
      // a zero-overlap decade must REPORT 0.0, not vanish — the spine
      // left-join keeps every (query, dim) cell defined
      val spine = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"))
      Seq(8, 16, 64).map { d =>
        val ov = ranked(d).join(full, Seq("query_id", "vec_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("ov"))
        spine.join(ov, Seq("query_id"), "left")
          .select(col("query_id"), lit(d).as("dim"),
            (coalesce(col("ov"), lit(0L)) / 10.0).as("recall10"))
      }.reduce(_ unionByName _)
        .orderBy(col("query_id"), col("dim"))
    }),

    // HYBRID-SEARCH RRF FUSION — the reciprocal-rank-fusion merge of
    // a lexical and a dense retrieval leg, the standard hybrid-search
    // serving pattern (rank-based fusion needs no score calibration
    // between BM25's unbounded scores and cosine's [−1, 1]). Leg 1:
    // x119's BM25 top-20 for "join filter vector" over the shared
    // lake-checkpointed tf artifact. Leg 2: x07's exact cosine top-20
    // for the doc-0 query embedding. Fusion: rrf = Σ 1/(60 + rank) —
    // each term ONE correctly-rounded division over exact integers at
    // 6 dp, the two-term sum a single deterministic IEEE add — with a
    // doc absent from a leg contributing 0 (full-outer join, the
    // no-silent-holes rule). Scale shape: both legs end in bounded
    // top-20 frames BEFORE any window runs (c77's rule — rank windows
    // only ever see ≤20 rows), so fusion cost is independent of
    // corpus size; the report is the top-10 with both leg ranks
    // exposed (0 = not retrieved by that leg).
    "x122_hybrid_rrf" -> ((spark, sfDir) => {
      val tf = Lake.materialize(spark, sfDir, "tfidf_tf") {
        Lake.table(spark, sfDir, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
      }
      val lex = graft.ext.TextAnalysis
        .bm25FromTf(tf, Seq("join", "filter", "vector"))
        .filter(col("doc_id") >= 3)
        .orderBy(desc("bm25"), col("doc_id")).limit(20)
        .withColumn("r_lex", row_number().over(
          Window.orderBy(desc("bm25"), col("doc_id"))))
        .select(col("doc_id"), col("r_lex"))
      val e = emb(spark, sfDir)
      val qv = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec")))
      val dense = e.filter(col("vec_id") >= 3).crossJoin(qv)
        .select(col("vec_id").as("doc_id"),
          round(cosine(col("embedding"), col("qvec")), 4).as("cos"))
        .orderBy(desc("cos"), col("doc_id")).limit(20)
        .withColumn("r_dense", row_number().over(
          Window.orderBy(desc("cos"), col("doc_id"))))
        .select(col("doc_id"), col("r_dense"))
      lex.join(dense, Seq("doc_id"), "outer")
        .select(col("doc_id"),
          coalesce(col("r_lex"), lit(0)).as("r_lex"),
          coalesce(col("r_dense"), lit(0)).as("r_dense"),
          round(
            coalesce(round(lit(1.0) / (col("r_lex") + 60), 6), lit(0.0)) +
              coalesce(round(lit(1.0) / (col("r_dense") + 60), 6), lit(0.0)),
            6).as("rrf"))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(10)
    }),

    // RANKED-RETRIEVAL QUALITY METRICS — MRR and nDCG@10 of the
    // dim-16 truncated ranking against the full-dim top-10 ground
    // truth: the metrics an embedding-serving review actually quotes
    // (x105's recall@10 counts set overlap; MRR/nDCG grade WHERE in
    // the ranking the relevant items landed). Rankings are x07/x105's
    // exact machinery (rounded cosine + vec_id tiebreak, per-query
    // WindowGroupLimit over 3 broadcast queries). MRR is an exact
    // rational (1/first-relevant-rank, one 4 dp division). The DCG
    // discount 1/log₂(rk+1) = ln2/ln(rk+1) takes only ranks 2..11 as
    // ln arguments — exact integers through ONE ln each (x34's
    // pattern), rounded at 6 dp before the ≤10-term sum; IDCG runs
    // the SAME engine ops over the ideal ranks 1..10, so the final
    // division normalizes engine-identically at 4 dp. The spine
    // left-join keeps a zero-overlap query reporting 0s, not
    // vanishing (x105's rule).
    "x120_retrieval_metrics" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      def ranked(dim: Int): DataFrame = {
        val q = broadcast(e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"),
            slice(col("embedding"), 1, dim).as("qvec")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(desc("cos"), col("vec_id"))
        e.filter(col("vec_id") >= 3).join(q)
          .select(col("query_id"), col("vec_id"),
            round(cosine(slice(col("embedding"), 1, dim), col("qvec")), 4)
              .as("cos"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("vec_id"), col("rk"))
      }
      val truth = ranked(64).select(col("query_id"), col("vec_id"))
      val hits = ranked(16).join(truth, Seq("query_id", "vec_id"))
      val byQ = hits.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"), min(col("rk")).as("first_rank"),
          sum(round(log(lit(2.0)) / log(col("rk") + 1), 6)).as("dcg_raw"))
      val idcg = broadcast(spark.range(1, 11)
        .select(round(log(lit(2.0)) / log(col("id") + 1), 6).as("t"))
        .agg(sum(col("t")).as("idcg")))
      val spine = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"))
      spine.join(byQ, Seq("query_id"), "left").crossJoin(idcg)
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("first_rank"), lit(0)).cast("int").as("first_rank"),
          round(when(col("first_rank").isNull, lit(0.0))
            .otherwise(lit(1.0) / col("first_rank")), 4).as("mrr"),
          round(coalesce(col("dcg_raw"), lit(0.0)) / col("idcg"), 4)
            .as("ndcg10"))
        .orderBy(col("query_id"))
    }),

    // PRINCIPAL DIRECTION — the dominant axis of the quantized
    // embedding cloud by exact-integer POWER ITERATION (x69's
    // fixed-point discipline applied to linear algebra): the
    // anisotropy/mean-direction diagnostic behind "are these
    // embeddings collapsing onto one axis". The Gram matrix
    // accumulates as Σ qᵢ·qⱼ per (i, j) — d² = 4096 keys with
    // map-side partial aggregation, so the corpus-sized work is ONE
    // self-join on the row id and a hash agg, never a d²×n blowup on
    // the shuffle — then normalizes to Ḡ = G DIV n (entries ≤ 255²
    // REGARDLESS of corpus size — the integer rescale that makes two
    // power steps overflow-free at any n). Two unrolled iterations
    // u = Ḡ·v, v' = u·1000 DIV max(u) re-quantize the iterate to
    // 0..1000 exactly; the Rayleigh quotient vᵀḠv / vᵀv is an exact
    // integer ratio with ONE double division at 4 dp. Every number
    // here is deterministic integer arithmetic — the only float in
    // the operator is that final division.
    "x112_principal_direction" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val q = e.crossJoin(bounds)
        .select(col("vec_id"),
          transform(toDouble(col("embedding")),
            v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("long")).as("qv"))
      principalDirection(q, Lake.rowCount(spark, sfDir, "embeddings"), dims = 64)
        .orderBy(col("dim"))
    }),

    // MMR DIVERSIFIED RETRIEVAL — the redundancy-aware rerank on top
    // of x100's exact-integer kernel: greedy maximal-marginal-
    // relevance picks 3 of the query's top-6 candidates, each round
    // maximizing 2·MMR = rel − max_sim_to_already_picked (λ = ½
    // folded into the 2× scale, so every comparison stays in exact
    // long arithmetic — no float MMR tie ambiguity). Greedy is
    // inherently sequential, but each round runs over the BOUNDED
    // candidate frame (top-6 by construction) with the previous
    // picks broadcast — three unrolled rounds, a static job graph
    // (x69's discipline), nothing corpus-sized past the first top-k.
    // The unit this buys a RAG/labeling pipeline: the #2-by-score
    // near-duplicate of #1 is skipped for something that covers new
    // ground — visible here as pick ranks ≠ score ranks.
    "x102_mmr_rerank" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val qe = e.crossJoin(bounds)
        .select(col("vec_id"),
          transform(toDouble(col("embedding")),
            v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("int")).as("q"))
      val dotI = graft.functions.VectorExpressions.dotIntNative _
      val query = broadcast(qe.filter(col("vec_id") === 0)
        .select(col("q").as("qq")))
      val cands = broadcast(qe.filter(col("vec_id") > 0)
        .join(query)
        .select(col("vec_id"), col("q"), dotI(col("q"), col("qq")).as("rel"))
        .orderBy(desc("rel"), col("vec_id")).limit(6))
      val p1full = cands.orderBy(desc("rel"), col("vec_id")).limit(1)
      val p1 = broadcast(p1full
        .select(col("vec_id").as("p1_id"), col("q").as("p1q")))
      val r2 = cands.crossJoin(p1).filter(col("vec_id") =!= col("p1_id"))
        .select(col("vec_id"), col("q"), col("rel"),
          dotI(col("q"), col("p1q")).as("pen"))
      val p2full = r2.orderBy((col("rel") - col("pen")).desc, col("vec_id")).limit(1)
      val p2 = broadcast(p2full
        .select(col("vec_id").as("p2_id"), col("q").as("p2q")))
      val r3 = cands.crossJoin(p1).crossJoin(p2)
        .filter(col("vec_id") =!= col("p1_id") && col("vec_id") =!= col("p2_id"))
        .select(col("vec_id"), col("rel"),
          greatest(dotI(col("q"), col("p1q")),
            dotI(col("q"), col("p2q"))).as("pen"))
      val p3full = r3.orderBy((col("rel") - col("pen")).desc, col("vec_id")).limit(1)
      p1full.select(lit(1).as("pick"), col("vec_id"), col("rel"), lit(0L).as("penalty"))
        .unionByName(p2full.select(lit(2).as("pick"), col("vec_id"),
          col("rel"), col("pen").as("penalty")))
        .unionByName(p3full.select(lit(3).as("pick"), col("vec_id"),
          col("rel"), col("pen").as("penalty")))
        .orderBy(col("pick"))
    }),

    // HARD-NEGATIVE MINING — the contrastive-training sibling of x07:
    // for each anchor (vec_id < 5), the top-3 most-cosine-similar
    // vectors carrying a DIFFERENT label (confusable-but-wrong
    // examples; the batch that makes an embedding model's margins).
    // The 5-row anchor side broadcasts; the corpus side is one scan
    // through the native cosine expression; per-anchor top-k is a
    // |Q|-partition window over rounded scores (x07's determinism
    // contract). At 100 TB the anchor batch stays model-sized, so the
    // shape is scan + broadcast join + bounded window at any corpus.
    "x83_hard_negatives" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val q = broadcast(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
          col("embedding").as("qvec")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("cos"), col("vec_id"))
      e.join(q, col("label") =!= col("qlabel"))
        .select(col("query_id"), col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("qvec")), 4).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("query_id"), col("vec_id"), col("label"), col("cos"))
        .orderBy(col("query_id"), desc("cos"), col("vec_id"))
    }),

    // ANN via multi-table random-hyperplane LSH: corpus-adaptive
    // signature width, 16 OR-combined tables; queries (vec_id < 5)
    // join candidates through the narrow bucket rows, then rank by
    // exact cosine within the deduplicated candidates — top-3 each.
    "x08_ann_lsh" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir).withColumn("vec", toDouble(col("embedding")))
      // n from parquet footer metadata (cached) — sizing the signature
      // must not cost a full corpus scan per query invocation.
      val bits = chooseBits(Lake.rowCount(spark, sfDir, "embeddings"))
      // the bucket table feeds both candidate-join sides: checkpoint it
      // to the lake once per dataset instead of recomputing the
      // signature aggregation per plan branch
      val buckets = Lake.materialize(spark, sfDir,
        s"lsh_buckets_${bits}_$DefaultTables") {
        lshBuckets(e, bits, DefaultTables)
      }
      lshTopKFrom(buckets, e, col("vec_id") < 5, topK = 3)
    }),

    // SEMANTIC DEDUP (SemDeDup): drop vectors with a lower-id
    // in-cluster neighbor at cosine ≥ 0.3. The deterministic `label`
    // column stands in for the paper's k-means cells so — unlike the
    // seeded-LSH x09 — the full survivor set carries a DuckDB oracle;
    // at 100 TB the cluster key swaps to ivfFit's cells and the same
    // plan holds (quadratic only within a bounded cell).
    "x58_semantic_dedup" -> ((spark, sfDir) =>
      semanticDedup(emb(spark, sfDir), "label", threshold = 0.3)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))),

    // Embedding near-dup self-join: same multi-table banding, both
    // sides the full corpus — candidates are bucket collisions only,
    // verified by exact cosine ≥ threshold.
    "x09_embed_neardup" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir).withColumn("vec", toDouble(col("embedding")))
      val bits = chooseBits(Lake.rowCount(spark, sfDir, "embeddings"))
      val buckets = Lake.materialize(spark, sfDir,
        s"lsh_buckets_${bits}_$DefaultTables") {
        lshBuckets(e, bits, DefaultTables)
      }
      neardupPairsFrom(buckets, e, threshold = 0.2)
        .orderBy(desc("cos"), col("vec_a"), col("vec_b"))
        .limit(100)
    }),

    // HYPERPLANE-LSH MACHINERY under a full oracle — x57's pattern
    // applied to the random-hyperplane family: the production planes
    // are xxhash64-folded (engine-specific, so x08/x09 stay
    // no-oracle), but the banding/candidate/verify MACHINERY runs
    // here on engine-constructible signatures — vectors quantized to
    // integers (round(v·1000)), planes drawn from pure modular
    // arithmetic on (table, bit, dim), sign of an exact integer dot
    // product. The same candidatesFromBuckets → neardupPairsFrom
    // path x09 runs, now with a DuckDB hash-match oracle end-to-end:
    // a drift in the banding join, the hot-bucket guard, the pair
    // dedup or the cosine verify fails the gate.
    "x75_hyperplane_verify_exact" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir).filter(col("vec_id") < 300)
        .withColumn("vec", toDouble(col("embedding")))
      val buckets = e.select(col("vec_id"),
        posexplode(array((0 until 2).map(t =>
          intPlaneSignature("vec", nBits = 8, table = t)): _*))
          .as(Seq("tbl", "sig")))
      neardupPairsFrom(buckets, e, threshold = 0.2)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // APPROXIMATE kNN GRAPH — every node's top-3 cosine neighbors
    // among its LSH collision candidates: the all-pairs backbone that
    // graph-based curation consumes (kNN-graph components for
    // cluster dedup, degree for density weighting, x102/x130-style
    // diversity seeds) where x07/x08 answer only a fixed query set.
    // Brute force is O(n²) at any scale; here candidate generation is
    // x75's engine-constructible int-plane bucketing (so unlike
    // x08/x09 the whole graph takes a full hash oracle), pairs expand
    // to both directions (kNN is per-node, not unordered), exact
    // 4 dp-rounded cosine ranks them, and the per-src window runs
    // over collision-bounded candidate lists — never the corpus.
    // Nodes with zero collisions are absent by design (the report is
    // the graph, not a spine); raising tables/bits buys recall, the
    // hot-bucket cap keeps degenerate duplicate classes from
    // quadratic blowup.
    "x137_knn_graph" -> ((spark, sfDir) =>
      knnGraph(emb(spark, sfDir).filter(col("vec_id") < 300)
          .withColumn("vec", toDouble(col("embedding"))),
        k = 3, nBits = 8, nTables = 2)
        .orderBy(col("src"), col("rk"))),

    // kNN HUBNESS — the high-dimensional pathology audit over x137's
    // graph: in high dimensions the k-occurrence (in-degree)
    // distribution of a kNN graph skews right — a few "hub" vectors
    // appear in everyone's neighbor list while antihubs appear in
    // none — and hub-dominated neighborhoods silently degrade every
    // kNN-based pipeline stage (x58 SemDeDup, x83 hard negatives,
    // x143's mutual filter exists precisely to cut hubs out). The
    // report is the standard skewness-of-k-occurrence diagnostic
    // (Radovanović et al.): zero-filled in-degrees over ALL nodes,
    // four exact BIGINT moments, one fixed double g₁ expression.
    // Inherits x137's full hash oracle; nothing touches the corpus
    // beyond the graph build.
    "x241_hubness" -> ((spark, sfDir) => {
      val nodes = emb(spark, sfDir).filter(col("vec_id") < 300)
        .select(col("vec_id"))
      val g = knnGraph(emb(spark, sfDir).filter(col("vec_id") < 300)
          .withColumn("vec", toDouble(col("embedding"))),
        k = 3, nBits = 8, nTables = 2)
      hubnessFromInDegrees(nodes.join(
        g.groupBy(col("dst").as("vec_id")).agg(count(lit(1)).as("d0")),
        Seq("vec_id"), "left")
        .select(coalesce(col("d0"), lit(0L)).as("d")))
    }),

    // LOCAL INTRINSIC DIMENSIONALITY — the Levina–Bickel/Amsaleg MLE
    // over x137's kNN graph: per point LID = −k/Σ ln(d_i/d_k) with
    // angular distance d = 1 − cos off the 4 dp cosine grid (zero
    // distances drop from the sum; flat neighborhoods — Σ = 0 — read
    // NULL). High LID marks the points where ANN recall and dedup
    // thresholds degrade first (the x241 hubness pathology's local
    // twin). Per-label summary on the 10⁻⁶ grid; nothing beyond the
    // existing bounded graph build.
    "x262_intrinsic_dim" -> ((spark, sfDir) => {
      val g = knnGraph(emb(spark, sfDir).filter(col("vec_id") < 300)
          .withColumn("vec", toDouble(col("embedding"))),
        k = 3, nBits = 8, nTables = 2)
      val w = Window.partitionBy(col("src"))
      val lid = g.select(col("src"), (lit(1.0) - col("cos")).as("dist"))
        .withColumn("dmax", max(col("dist")).over(w))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("kk"), max(col("dmax")).as("dmax"),
          sum(when(col("dist") > 0.0, log(col("dist") / col("dmax"))))
            .as("slog"))
        .select(col("src"),
          when(col("dmax") > 0.0 && col("slog") < 0.0,
            round(-col("kk").cast("double") / col("slog") * lit(1000000.0),
              0).cast("long")).as("lid_fp"))
        .filter(col("lid_fp").isNotNull)
      lid.join(emb(spark, sfDir).select(col("vec_id").as("src"),
          col("label")), "src")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pts"),
          round(sum(col("lid_fp")).cast("double") /
            (count(lit(1)) * lit(1000000.0)), 4).as("mean_lid"),
          round(min(col("lid_fp")).cast("double") / lit(1000000.0), 4)
            .as("min_lid"),
          round(max(col("lid_fp")).cast("double") / lit(1000000.0), 4)
            .as("max_lid"))
        .orderBy(col("label"))
    }),

    // MUTUAL kNN PAIRS (x143) — reciprocal nearest neighbors over
    // x137's graph: (u, v) kept only when v is in u's top-k AND u is
    // in v's top-k. One-directional kNN edges are asymmetric-by-crowding (a
    // hub can be "nearest" to everything without anything being
    // nearest to it); the mutual filter is the standard
    // high-precision pairing heuristic (RNN clustering, margin-based
    // bitext mining). One self-join of the ≤ k·N-row graph on the
    // reversed key — linear in the graph, nothing touches the corpus
    // again. Inherits x137's full hash oracle.
    "x143_mutual_knn" -> ((spark, sfDir) => {
      val g = knnGraph(emb(spark, sfDir).filter(col("vec_id") < 300)
          .withColumn("vec", toDouble(col("embedding"))),
        k = 3, nBits = 8, nTables = 2)
      g.as("x")
        .join(g.as("y"), col("x.src") === col("y.dst") &&
          col("x.dst") === col("y.src"))
        .filter(col("x.src") < col("x.dst"))
        .select(col("x.src").as("vec_a"), col("x.dst").as("vec_b"),
          col("x.cos").as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Sorted-neighborhood near-dup: deterministic blocking (first
    // embedding component within each label), so unlike x08/x09 the
    // candidate SET is engine-reproducible and the query carries a
    // full DuckDB oracle. The ranked table is lake-checkpointed for
    // its two join sides.
    "x45_snm_neardup" -> ((spark, sfDir) =>
      snmNeardup(emb(spark, sfDir), window = 10, threshold = 0.2,
        checkpoint = r => Lake.materialize(spark, sfDir, "x45_snm_ranked")(r))
        .orderBy(col("vec_a"), col("vec_b"))),

    // LINEAR CKA — does quantization preserve the embedding GEOMETRY?
    // (x22 shrinks the bytes, x105 grades truncation by per-query
    // rank agreement; centered-kernel-alignment grades the whole
    // similarity STRUCTURE in one number — the standard
    // representation-comparison statistic, here between the fp
    // embeddings and their coarse-grid twin.) Linear CKA =
    // ‖Cxy‖²_F / (‖Cxx‖_F·‖Cyy‖_F) over d×d centered cross-
    // covariances — never the n×n Gram: features grid to exact ints
    // (x on the 10⁻³ grid, the quantized twin y on 10⁻²), the three
    // moment matrices come from ONE vec_id-co-partitioned self-join
    // of the feature table partial-aggregated to d² cells (at 100 TB
    // a typed per-partition outer-product aggregator produces the
    // same d² frame in one pass; the join form is the declarative
    // twin), centering is the exact integer identity n·S − s·sᵀ, and
    // the three squared Frobenius norms accumulate as DECIMAL(38,0)
    // (x208's discipline — the squares leave BIGINT). One double
    // division + sqrt at 6 dp; degenerate constant features read
    // NULL. CKA = 1 ⇔ the quantized space is a rotation/scale of the
    // original; the readout quantifies what the 10× coarser grid
    // costs.
    "x224_linear_cka" -> ((spark, sfDir) => {
      val feats = emb(spark, sfDir)
        .select(col("vec_id"),
          posexplode(toDouble(col("embedding"))).as(Seq("i", "v")))
        .select(col("vec_id"), col("i"),
          round(col("v") * 1000, 0).cast("long").as("x"),
          round(col("v") * 100, 0).cast("long").as("y"))
      val marg = marginFor(feats)
      val meta = broadcast(emb(spark, sfDir)
        .agg(count(lit(1)).as("n"),
          max(size(col("embedding"))).cast("long").as("dim")))
      val cross = feats.as("a")
        .join(feats.as("b"), col("a.vec_id") === col("b.vec_id"))
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(col("a.x") * col("b.x")).as("sxx"),
          sum(col("a.x") * col("b.y")).as("sxy"),
          sum(col("a.y") * col("b.y")).as("syy"))
      def sq(c: Column) = c.cast("decimal(38,0)") * c.cast("decimal(38,0)")
      val norms = cross
        .join(broadcast(marg.select(col("i"), col("sx").as("sx_i"),
          col("sy").as("sy_i"))), "i")
        .join(broadcast(marg.select(col("i").as("j"), col("sx").as("sx_j"),
          col("sy").as("sy_j"))), "j")
        .crossJoin(meta)
        .select(
          (col("n") * col("sxx") - col("sx_i") * col("sx_j")).as("cxx"),
          (col("n") * col("sxy") - col("sx_i") * col("sy_j")).as("cxy"),
          (col("n") * col("syy") - col("sy_i") * col("sy_j")).as("cyy"))
        .agg(sum(sq(col("cxx"))).as("nxx"), sum(sq(col("cxy"))).as("nxy"),
          sum(sq(col("cyy"))).as("nyy"))
      norms.crossJoin(meta)
        .select(col("n").as("n_vectors"), col("dim"),
          when(col("nxx") > 0 && col("nyy") > 0,
            round(col("nxy").cast("double") /
              sqrt(col("nxx").cast("double") * col("nyy").cast("double")),
              6)).as("cka"))
    }),

    // Embedding int8 quantization — the storage-reduction step of an
    // embedding lake (4 bytes/dim fp32 → 1 byte/dim + 2 scale floats).
    // Per-vector min-max scale to [0, 255]; shuffle-free map work.
    // Integer outputs (first quantized component + integer checksum of
    // the whole quantized vector — order-independent) make the oracle
    // exact; both engines compute the scale in double precision.
    "x22_embed_quantize" -> ((spark, sfDir) => {
      val vec = toDouble(col("embedding"))
      val mn = array_min(vec)
      val mx = array_max(vec)
      def quant(v: Column): Column =
        when(mx === mn, lit(0))
          .otherwise(round((v - mn) / (mx - mn) * 255, 0).cast("int"))
      val q = transform(vec, v => quant(v))
      emb(spark, sfDir)
        .select(col("vec_id"),
          element_at(q, 1).as("q_first"),
          aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"))
        .orderBy(col("vec_id"))
    }),

    // ANN via IVF coarse quantization: 16 k-means cells, probe the 4
    // nearest per query — ~1/4 of the corpus scanned per query instead
    // of all of it, top-3 by exact cosine within the probed cells.
    // Index (assignments + centroids) is lake-checkpointed: the k-means
    // fit runs once per corpus fingerprint, and repeat invocations load
    // two parquet tables — no ML training job on the query path.
    "x16_ann_ivf" -> ((spark, sfDir) => {
      val k = 16
      val assigned = Lake.materialize(spark, sfDir, s"ivf_cells_$k") {
        val e = emb(spark, sfDir).withColumn("vec", toDouble(col("embedding")))
        ivfFit(e, k)
      }
      val centroids = Lake.materialize(spark, sfDir, s"ivf_centroids_$k") {
        ivfCentroidsOf(assigned)
      }
      val queries = emb(spark, sfDir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          toDouble(col("embedding")).as("qvec"))
      ivfTopKFrom(assigned, centroids, queries, nprobe = 4, topK = 3)
    }),

    // ANN via product quantization: 4 subspaces × 16 codes over the
    // 64-dim embeddings = 4 codes/vector (64× smaller than the raw
    // floats); codebooks and codes are lake-materialized once per
    // corpus fingerprint, search is the ADC code scan. Sketch-based
    // (k-means codebooks) — rows-only check + planted-cluster and
    // recall unit tests, like x16.
    "x29_ann_pq" -> ((spark, sfDir) => {
      val (m, ksub) = (4, 16)
      val codebooks = Lake.materialize(spark, sfDir, s"pq_codebooks_${m}_$ksub") {
        pqFit(emb(spark, sfDir).withColumn("vec", toDouble(col("embedding"))), m, ksub)
      }
      // subDim is a constant of the (corpus, m) pair — probe it once
      // per process, not with a driver job per warm invocation
      val sd = pqSubDimCache.computeIfAbsent(s"$sfDir/$m/$ksub",
        _ => codebooks.select(size(col("centroid"))).head().getInt(0))
      val codes = Lake.materialize(spark, sfDir, s"pq_codes_${m}_$ksub") {
        pqEncode(emb(spark, sfDir).withColumn("vec", toDouble(col("embedding"))),
          codebooks, m, sd)
      }
      val queries = emb(spark, sfDir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          toDouble(col("embedding")).as("qvec"))
      pqTopKFrom(codes, codebooks, queries, m, sd, topK = 3)
    }),

    // IVF PROBE MECHANICS, EXACT TWIN (VERDICT r13 #6) — x16's
    // probe-then-rerank machinery promoted from rows-only to a full
    // cross-engine hash oracle by swapping the trained k-means
    // quantizer for the deterministic first-K seed (x64's
    // discipline): cell assignment, probe selection, and rerank are
    // then pure rounded-grid arithmetic DuckDB recomputes verbatim.
    // The plan shape IS x16's: K-row broadcast for the assignment
    // argmin (one corpus scan, partial-agg'able min(struct)), a
    // |Q|·K broadcast probe selection (nprobe=2 of 8 cells — real
    // pruning: ~3/4 of the corpus never reranked), the candidate
    // equi-join on the disjoint cell key, and a |Q|-partition
    // bounded window for the top-3. Distances round 4 dp BEFORE
    // every argmin/rank (ties break on cell/neighbor id), so the
    // probe SET — not just the scores — is engine-identical.
    "x212_ivf_probe_exact" -> ((spark, sfDir) => {
      val (k, nprobe) = (8, 2)
      val e = emb(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val cents = broadcast(e.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").as("k"), col("v").as("cv")))
      val assigned = e.crossJoin(cents)
        .select(col("vec_id"), col("v"), col("k"),
          round(sqDist(col("v"), col("cv")), 4).as("d"))
        .groupBy(col("vec_id"))
        // all rows of a group carry the same v, so first() is
        // deterministic here — it saves re-joining the corpus for
        // the vector payload
        .agg(min(struct(col("d"), col("k"))).getField("k").as("cell"),
          first(col("v")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qvec"))
      val cw = Window.partitionBy(col("query_id"))
        .orderBy(col("cd"), col("k"))
      val probes = q.crossJoin(cents)
        .select(col("query_id"), col("qvec"), col("k"),
          round(sqDist(col("qvec"), col("cv")), 4).as("cd"))
        .withColumn("crank", row_number().over(cw))
        .filter(col("crank") <= nprobe)
        .select(col("query_id"), col("qvec"), col("k").as("cell"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("cos"), col("neighbor_id"))
      broadcast(probes).join(assigned, "cell")
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(cosine(col("qvec"), col("v")), 4).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // PQ ADC MECHANICS, EXACT TWIN (VERDICT r13 #6) — x29's
    // encode-then-ADC machinery under the same seed-quantizer
    // promotion: per-subspace codebooks are the first-8 vectors'
    // slices, so encoding (argmin over the 10⁻⁴-grid sub-distances)
    // and the per-query additive distance table are exact integer
    // arithmetic on both engines. The ADC sum runs over FIXED-POINT
    // longs (sum order across the m=4 subspace terms is then
    // irrelevant — double addition would be order-sensitive), which
    // is also the production trick: int distance tables are what a
    // SIMD ADC kernel scans. Plan shape IS x29's: broadcast
    // codebooks into the subspace explode, partial-agg argmin
    // encode, broadcast distance table into the code scan, bounded
    // top-3 window.
    "x213_pq_adc_exact" -> ((spark, sfDir) => {
      val m = 4
      val e = emb(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val sd = pqSubDimCache.computeIfAbsent(s"$sfDir/exact/$m",
        _ => e.select(size(col("v"))).head().getInt(0) / m).toInt
      val subs = e.select(col("vec_id"), posexplode(
        array((0 until m).map(s =>
          slice(col("v"), s * sd + 1, sd)): _*)).as(Seq("sub", "sv")))
      val cb = broadcast(e.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("code"), posexplode(
          array((0 until m).map(s =>
            slice(col("v"), s * sd + 1, sd)): _*)).as(Seq("sub", "centroid"))))
      def gridDist(a: Column, b: Column): Column =
        round(sqDist(a, b) * 10000, 0).cast("long")
      val enc = subs.join(cb, "sub")
        .select(col("vec_id"), col("sub"),
          struct(gridDist(col("sv"), col("centroid")).as("d_fp"),
            col("code").as("code")).as("sc"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(col("sc")).getField("code").as("code"))
      val dt = subs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("sub"), col("sv"))
        .join(cb, "sub")
        .select(col("query_id"), col("sub"), col("code"),
          gridDist(col("sv"), col("centroid")).as("pd_fp"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_fp"), col("neighbor_id"))
      enc.join(broadcast(dt), Seq("sub", "code"))
        .filter(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("pd_fp")).as("adc_fp"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("adc_fp"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"),
          round(col("adc_fp").cast("double") / 10000.0, 4).as("adc"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // RECALL@10 REPORTS for the three ANN paths — the quality side of
    // the speed/quality trade each index makes, tracked per round in
    // the driver's artifact. Each reuses the SAME materialized index
    // as its top-k query (identical Lake.materialize name), so the
    // recall row never triggers a second fit. Ground truth is the
    // brute-force exact-cosine top-10 (x07's shape over the 5-query
    // batch). ORACLED against committed id-set fixtures
    // (RecallFixtures, regenerable via tools.RecallFixture): the ANN
    // sets are engine-specific (seeded hyperplanes / k-means), so
    // DuckDB can't recompute them — instead it recomputes the recall
    // ARITHMETIC from the pinned sets, and the hash compare fires
    // whenever the live sets drift from the pins (x57's pattern; this
    // is the regression gate the report exists for).
    "x54_ann_lsh_recall" -> ((spark, sfDir) =>
      recallAtK(recallTruth10(spark, sfDir), lshAnn10(spark, sfDir), 10)),

    "x55_ann_ivf_recall" -> ((spark, sfDir) =>
      recallAtK(recallTruth10(spark, sfDir), ivfAnn10(spark, sfDir), 10)),

    "x56_ann_pq_recall" -> ((spark, sfDir) =>
      recallAtK(recallTruth10(spark, sfDir), pqAnn10(spark, sfDir), 10)),

    // K-MEANS LLOYD STEP — the clustering primitive under SemDeDup /
    // corpus bucketing, exposed as its own verified operator: one
    // assignment iteration from a deterministic seed (the first K
    // vectors by vec_id) reporting per-cluster membership and inertia.
    // Scale shape: the K-row centroid side is BROADCAST, so the corpus
    // side is one scan → N×K fused native sq-L2 evaluations (no
    // vector shuffle); the argmin is a partial-aggregatable
    // min(struct(d, k)) hash agg — NOT a window over the N×K
    // expansion — and the per-cluster rollup aggregates K rows. Per
    // -vec distance rounds at 4 dp BEFORE the argmin so a float
    // accumulation-order wobble on a near-tie resolves to the same
    // (d, k) choice on both engines (x07's tolerance argument).
    "x64_kmeans_assign" -> ((spark, sfDir) => {
      val K = 8
      val e = emb(spark, sfDir)
      val cents = broadcast(
        e.orderBy(col("vec_id")).limit(K)
          .select(col("vec_id").as("k"), col("embedding").as("c")))
      e.crossJoin(cents)
        .select(col("vec_id"), col("k"),
          round(sqDist(col("embedding"), col("c")), 4).as("d"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d"), col("k"))).as("m"))
        .select(col("m.k").as("k"), col("m.d").as("d"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_assigned"),
          round(sum(col("d")), 4).as("inertia"))
        .orderBy(col("k"))
    }),

    // K-MEANS TRAINING LOOP — x64's single Lloyd step iterated: two
    // full assign→recenter rounds from the deterministic seed,
    // reporting (iter, cluster, membership, inertia) so the Lloyd
    // monotonicity (total inertia non-increasing) is itself the
    // verified output. Per-iteration scale shape is x64's (broadcast
    // centroids, aggregate argmin); the recenter step joins the
    // N-row assignment to the dim-grain explode on vec_id (one
    // shuffle) and re-aggregates to a model-sized (K×dims) table
    // through x39's exact-decimal mean, whose 4 dp-rounded grid makes
    // the iteration-2 centroids — and hence its distances — identical
    // on both engines. At 100 TB each further iteration is the same
    // two-shuffle pass with the new K-row model re-broadcast;
    // iterations are data-independent of each other's ordering, so a
    // driver loop with lake-checkpointed assignments runs it to
    // convergence.
    "x65_kmeans_train" -> ((spark, sfDir) => {
      val K = 8
      val e = emb(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      def assign(cents: DataFrame): DataFrame =
        e.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("k"),
            round(sqDist(col("v"), col("c")), 4).as("d"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("d"), col("k"))).as("m"))
          .select(col("vec_id"), col("m.k").as("k"), col("m.d").as("d"))
      def stats(a: DataFrame, iter: Int): DataFrame =
        a.groupBy(col("k"))
          .agg(count(lit(1)).as("n_assigned"),
            round(sum(col("d")), 4).as("inertia"))
          .select(lit(iter).cast("int").as("iter"), col("k"),
            col("n_assigned"), col("inertia"))
      val seed = e.orderBy(col("vec_id")).limit(K)
        .select(col("vec_id").as("k"), col("v").as("c"))
      val a1 = assign(seed)
      val dims = e.select(col("vec_id"),
        posexplode(col("v")).as(Seq("dim", "x")))
      val c2 = a1.join(dims, "vec_id")
        .groupBy(col("k"), col("dim"))
        .agg((round(sum(col("x").cast("decimal(20,10)")).cast("double") /
          count(lit(1)), 4) + lit(0.0)).as("m"))
        .groupBy(col("k"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("s"))
        .select(col("k"), expr("transform(s, p -> p.m)").as("c"))
      stats(a1, 1).unionAll(stats(assign(c2), 2))
        .orderBy(col("iter"), col("k"))
    }),

    // SIMPLIFIED SILHOUETTE — the cluster-quality readout over x64's
    // assignment ("did k-means find real structure, and which
    // clusters are mushy"): per vector a = distance to its own
    // centroid, b = distance to the nearest OTHER centroid,
    // s = (b−a)/max(a,b) — the centroid-based simplification
    // (Rousseeuw's full silhouette needs all N² point-pair
    // distances; the simplified form is the standard corpus-scale
    // substitute and, with argmin assignment, sits in [0, 1) since
    // b ≥ a by construction). Scale shape is x64's exactly: K-row
    // broadcast, one corpus scan of fused sq-L2 evaluations, and the
    // two smallest distances come from an array_sort over the
    // K-bounded collect_list — never a window over the N×K
    // expansion. Distances round 4 dp before the sort (x64's
    // tie discipline), per-vec scores land on a 10⁻⁶ integer grid,
    // per-cluster means are exact grid sums with ONE division.
    "x162_silhouette" -> ((spark, sfDir) => {
      val K = 8
      val e = emb(spark, sfDir)
      val cents = broadcast(
        e.orderBy(col("vec_id")).limit(K)
          .select(col("vec_id").as("k"), col("embedding").as("c")))
      e.crossJoin(cents)
        .select(col("vec_id"), col("k"),
          round(sqDist(col("embedding"), col("c")), 4).as("d"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("d"), col("k")))).as("s"))
        .select(col("vec_id"), col("s")(0)("k").as("k"),
          col("s")(0)("d").as("a"), col("s")(1)("d").as("b"))
        .withColumn("s_fp", when(col("b") > 0.0,
          round((col("b") - col("a")) / col("b") * lit(1000000.0), 0)
            .cast("long")).otherwise(0L))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_assigned"),
          round(sum(col("s_fp")).cast("double") /
            (count(lit(1)) * lit(1000000.0)), 4).as("mean_sil"),
          round(min(col("s_fp")).cast("double") / lit(1000000.0), 4)
            .as("min_sil"),
          round(max(col("s_fp")).cast("double") / lit(1000000.0), 4)
            .as("max_sil"))
        .orderBy(col("k"))
    }),

    // CALINSKI–HARABASZ INDEX — the variance-ratio cluster validity
    // readout over x64's assignment, beside x162's silhouette (CH
    // reads the GLOBAL between/within variance ratio; silhouette
    // reads per-point margin): the ANOVA decomposition per
    // dimension, summed — B = Σ_kd S²/n_k − Σ_d G_d²/N,
    // W = ΣΣx² − Σ_kd S²/n_k, CH = (B/(k−1))/(W/(N−k)). Per-(k,dim)
    // sums accumulate in exact DECIMAL (x65's order-independent
    // discipline) and become doubles only at the bounded K×dims cell
    // grain; no vector shuffle beyond the one dim-grain aggregation.
    "x249_ch_index" -> ((spark, sfDir) => {
      val K = 8
      val e = emb(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val cents = broadcast(e.orderBy(col("vec_id")).limit(K)
        .select(col("vec_id").as("k"), col("v").as("c")))
      val a1 = e.crossJoin(cents)
        .select(col("vec_id"), col("k"),
          round(sqDist(col("v"), col("c")), 4).as("d"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d"), col("k"))).as("m"))
        .select(col("vec_id"), col("m.k").as("k"))
      val dims = e.select(col("vec_id"),
        posexplode(col("v")).as(Seq("dim", "x")))
      val cells = a1.join(dims, "vec_id")
        .groupBy(col("k"), col("dim"))
        .agg(sum(col("x").cast("decimal(20,10)")).cast("double").as("s"),
          count(lit(1)).as("n_k"))
      val bh = cells.agg(
        sum(col("s") * col("s") / col("n_k").cast("double")).as("b_hit"))
      val gq = cells.groupBy(col("dim")).agg(sum(col("s")).as("g"))
        .agg(sum(col("g") * col("g")).as("gsq"))
      val tot = dims.agg(
        sum(col("x").cast("decimal(18,9)") * col("x").cast("decimal(18,9)"))
          .cast("double").as("totss"))
      val nr = a1.agg(count(lit(1)).as("n"),
        countDistinct(col("k")).as("k_clusters"))
      def dd(c: Column) = c.cast("double")
      nr.crossJoin(bh).crossJoin(gq).crossJoin(tot)
        .withColumn("between_raw", col("b_hit") - col("gsq") / dd(col("n")))
        .withColumn("within_raw", col("totss") - col("b_hit"))
        .select(col("n"), col("k_clusters"),
          round(col("between_raw"), 4).as("between_ss"),
          round(col("within_raw"), 4).as("within_ss"),
          when(col("k_clusters") > 1L && col("n") > col("k_clusters") &&
              col("within_raw") > 0.0,
            round((col("between_raw") / (dd(col("k_clusters")) - 1.0)) /
              (col("within_raw") / (dd(col("n")) - dd(col("k_clusters")))),
              6)).as("ch"))
    }),

    // DAVIES–BOULDIN INDEX — the worst-neighbor cluster validity
    // readout over the same assignment (CH is a global ratio; DB
    // charges each cluster its most-confusable peer): σ_k = RMS
    // distance to the 4 dp-gridded recentered mean (the x65 m2
    // grid, so every downstream double is deterministic),
    // R_ij = (σ_i + σ_j)/‖m̃_i − m̃_j‖ over the K² pair grain,
    // DB = mean_i max_j R_ij. Ratios land on the 10⁻⁶ integer grid
    // before the max/mean (x162's discipline) so the index is an
    // exact integer sum until its one final division.
    "x250_davies_bouldin" -> ((spark, sfDir) => {
      val K = 8
      val e = emb(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val cents = broadcast(e.orderBy(col("vec_id")).limit(K)
        .select(col("vec_id").as("k"), col("v").as("c")))
      val a1 = e.crossJoin(cents)
        .select(col("vec_id"), col("k"),
          round(sqDist(col("v"), col("c")), 4).as("d"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d"), col("k"))).as("m"))
        .select(col("vec_id"), col("m.k").as("k"))
      val dims = e.select(col("vec_id"),
        posexplode(col("v")).as(Seq("dim", "x")))
      val m2 = a1.join(dims, "vec_id")
        .groupBy(col("k"), col("dim"))
        .agg((round(sum(col("x").cast("decimal(20,10)")).cast("double") /
          count(lit(1)), 4) + lit(0.0)).as("m"),
          sum(col("x").cast("decimal(20,10)")).cast("double").as("s"))
      val c2 = m2.groupBy(col("k"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pm"),
          array_sort(collect_list(struct(col("dim"), col("s")))).as("ps"))
        .select(col("k"), expr("transform(pm, p -> p.m)").as("cv"),
          expr("transform(ps, p -> p.s)").as("sv"))
      val ssk = a1.join(dims, "vec_id")
        .groupBy(col("k"))
        .agg(sum(col("x").cast("decimal(18,9)") * col("x").cast("decimal(18,9)"))
          .cast("double").as("ss"))
      val nk = a1.groupBy(col("k")).agg(count(lit(1)).as("n_assigned"))
      def dd(c: Column) = c.cast("double")
      val sig = c2.join(ssk, "k").join(nk, "k")
        .select(col("k"), col("n_assigned"), col("cv"),
          round(sqrt(greatest(lit(0.0),
            (col("ss") - lit(2.0) * dot(col("cv"), col("sv")) +
              dd(col("n_assigned")) * dot(col("cv"), col("cv"))) /
              dd(col("n_assigned")))), 4).as("sigma"))
      val whole = Window.partitionBy(lit(1))
      sig.as("i").join(sig.as("j"), col("i.k") =!= col("j.k"))
        .withColumn("d2", sqDist(col("i.cv"), col("j.cv")))
        .filter(col("d2") > 0.0)
        .select(col("i.k").as("k"), col("i.n_assigned").as("n_assigned"),
          col("i.sigma").as("sigma"),
          (round((col("i.sigma") + col("j.sigma")) /
            sqrt(col("d2")) * lit(1000000.0), 0))
            .cast("long").as("r_fp"))
        .groupBy(col("k"))
        .agg(max(col("n_assigned")).as("n_assigned"),
          max(col("sigma")).as("sigma"), max(col("r_fp")).as("r_max_fp"))
        .withColumn("r_max",
          col("r_max_fp").cast("double") / lit(1000000.0))
        .withColumn("db_index",
          round(sum(col("r_max_fp")).over(whole).cast("double") /
            (count(lit(1)).over(whole) * lit(1000000.0)), 6))
        .select(col("k"), col("n_assigned"), col("sigma"), col("r_max"),
          col("db_index"))
        .orderBy(col("k"))
    }),

    // ADJUSTED RAND INDEX — did k-means recover the label classes?
    // The chance-corrected pair-counting agreement between x64's
    // argmin assignment and the `label` column, off the bounded
    // K×L contingency cells — see [[ariFromContingency]].
    "x251_adjusted_rand" -> ((spark, sfDir) =>
      ariFromContingency(kmeansLabelContingency(spark, sfDir))),

    // NORMALIZED MUTUAL INFORMATION — the information-theoretic
    // reading of the same K×L contingency (ARI counts pairs; NMI
    // reads shared bits, the measure robust to cluster-count
    // mismatch) — see [[nmiFromContingency]].
    "x252_nmi" -> ((spark, sfDir) =>
      nmiFromContingency(kmeansLabelContingency(spark, sfDir))),

    // WEIGHTED-JACCARD TOP-K — the min/max-ratio similarity over
    // x112's shared 0..255 integer grid (the measure consistent-
    // weighted-sampling sketches estimate; for non-negative feature
    // vectors it is often the better dedup kernel than cosine, which
    // hub-heavy magnitudes dominate): WJ(a,b) = Σmin(aᵢ,bᵢ)/Σmax —
    // both sums EXACT BIGINTs off one fused zip pass, so the score
    // is one division and the whole top-3 readout hash-matches with
    // no grid rounding at all. Scale shape: 5 broadcast query rows ×
    // one corpus scan, row_number over the per-query candidate set.
    "x271_weighted_jaccard_topk" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val bounds = broadcast(e.agg(
        min(array_min(toDouble(col("embedding")))).as("mn"),
        max(array_max(toDouble(col("embedding")))).as("mx")))
      val q = e.crossJoin(bounds)
        .select(col("vec_id"),
          transform(toDouble(col("embedding")),
            v => round((v - col("mn")) / (col("mx") - col("mn")) * 255, 0)
              .cast("long")).as("qv"))
      val queries = broadcast(q.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("qv").as("a")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("wj"), col("neighbor_id"))
      queries.join(q.select(col("vec_id").as("neighbor_id"),
          col("qv").as("b")), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => least(x, y)),
            lit(0L), (acc, v) => acc + v).as("mins"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => greatest(x, y)),
            lit(0L), (acc, v) => acc + v).as("maxs"))
        .withColumn("wj", when(col("maxs") > 0L,
          round(col("mins").cast("double") / col("maxs").cast("double"), 6))
          .otherwise(lit(0.0)))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("mins"),
          col("maxs"), col("wj"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // GREEDY k-CENTER CORESET — farthest-point diversity selection
    // (the Gonzalez 2-approximation behind coreset/active-learning
    // data picks, and the maximal-spread complement of x102's
    // relevance-tradeoff MMR): seed = lowest vec_id, then k−1 rounds
    // of "add the point farthest from the selected set". Deterministic
    // and hash-oracle-able via x64's discipline — per-point distances
    // round 4 dp BEFORE the argmax and ties break on vec_id. Scale
    // shape: each round is ONE stateless map over the corpus (least
    // of the running min-distance and the distance to the newest
    // 1-row broadcast center) + a TakeOrdered(1) — k bounded passes,
    // no window over an N×k expansion, no shuffle beyond the top-1
    // reductions; the running-min column is the standard trick that
    // keeps round r at O(N) instead of O(N·r).
    "x130_kcenter_coreset" -> ((spark, sfDir) =>
      kCenterGreedy(emb(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v")), k = 5)
        .orderBy(col("sel_round")))
  )

  /** Greedy k-center over a (vec_id, v: array<double>) frame — see
    * the x130 registration for semantics and scale shape. Exposed so
    * tests can plant geometries with known farthest-point orders.
    */
  def kCenterGreedy(e: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val seed = broadcast(e.orderBy(col("vec_id")).limit(1))
    var cur = e.crossJoin(seed.select(col("v").as("_c")))
      .select(col("vec_id"), col("v"),
        round(sqDist(col("v"), col("_c")), 4).as("d"))
    var out = seed.select(lit(1).cast("int").as("sel_round"),
      col("vec_id"), lit(0.0).as("d_sel"))
    for (r <- 2 to k) {
      val pick = broadcast(cur.orderBy(desc("d"), col("vec_id")).limit(1))
      out = out.unionByName(pick.select(lit(r).cast("int").as("sel_round"),
        col("vec_id"), col("d").as("d_sel")))
      if (r < k)
        cur = cur.crossJoin(pick.select(col("v").as("_c")))
          .select(col("vec_id"), col("v"),
            least(col("d"), round(sqDist(col("v"), col("_c")), 4)).as("d"))
    }
    out
  }

  /** The embeddings table with `vec` widened to double — the input
    * every ANN path shares.
    */
  private def vecTable(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir).withColumn("vec", toDouble(col("embedding")))

  /** Brute-force exact top-10 ground truth for the 5-query recall
    * batch. Package-visible (with the three ANN sets below) so
    * tools.RecallFixture can dump the committed oracle fixtures from
    * exactly the frames the registered queries consume.
    */
  private[graft] def recallTruth10(spark: SparkSession, sfDir: String): DataFrame =
    bruteTopK(vecTable(spark, sfDir), col("vec_id") < 5, 10)

  private[graft] def lshAnn10(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecTable(spark, sfDir)
    val bits = chooseBits(Lake.rowCount(spark, sfDir, "embeddings"))
    val buckets = Lake.materialize(spark, sfDir,
      s"lsh_buckets_${bits}_$DefaultTables") {
      lshBuckets(e, bits, DefaultTables)
    }
    lshTopKFrom(buckets, e, col("vec_id") < 5, topK = 10)
  }

  private[graft] def ivfAnn10(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 16
    val e = vecTable(spark, sfDir)
    val assigned = Lake.materialize(spark, sfDir, s"ivf_cells_$k") {
      ivfFit(e, k)
    }
    val centroids = Lake.materialize(spark, sfDir, s"ivf_centroids_$k") {
      ivfCentroidsOf(assigned)
    }
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    ivfTopKFrom(assigned, centroids, queries, nprobe = 4, topK = 10)
  }

  private[graft] def pqAnn10(spark: SparkSession, sfDir: String): DataFrame = {
    val (m, ksub) = (4, 16)
    val e = vecTable(spark, sfDir)
    val codebooks = Lake.materialize(spark, sfDir, s"pq_codebooks_${m}_$ksub") {
      pqFit(e, m, ksub)
    }
    val sd = pqSubDimCache.computeIfAbsent(s"$sfDir/$m/$ksub",
      _ => codebooks.select(size(col("centroid"))).head().getInt(0))
    val codes = Lake.materialize(spark, sfDir, s"pq_codes_${m}_$ksub") {
      pqEncode(e, codebooks, m, sd)
    }
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    pqTopKFrom(codes, codebooks, queries, m, sd, topK = 10)
  }

  /** x224's per-feature marginal sums (exact BIGINTs) — factored so
    * the unit test can drive planted feature frames through the same
    * stage.
    */
  private[graft] def marginFor(feats: DataFrame): DataFrame =
    feats.groupBy(col("i"))
      .agg(sum(col("x")).as("sx"), sum(col("y")).as("sy"))

  val oracles: Map[String, String] = Map(
    // same 10^-3 / 10^-2 feature grids, same vec_id self-join moment
    // matrices, same integer centering and HUGEINT Frobenius norms
    "x224_linear_cka" ->
      ("WITH f AS (SELECT vec_id, i, " +
        "CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS x, " +
        "CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 100, 0) AS BIGINT) AS y " +
        "FROM (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i " +
        "FROM embeddings)), " +
        "marg AS (SELECT i, CAST(SUM(x) AS BIGINT) AS sx, " +
        "CAST(SUM(y) AS BIGINT) AS sy FROM f GROUP BY 1), " +
        "meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(MAX(len(embedding)) AS BIGINT) AS dim FROM embeddings), " +
        "cr AS (SELECT a.i AS i, b.i AS j, " +
        "CAST(SUM(a.x * b.x) AS BIGINT) AS sxx, " +
        "CAST(SUM(a.x * b.y) AS BIGINT) AS sxy, " +
        "CAST(SUM(a.y * b.y) AS BIGINT) AS syy " +
        "FROM f a JOIN f b ON a.vec_id = b.vec_id GROUP BY 1, 2), " +
        "c AS (SELECT CAST(n * sxx - ma.sx * mb.sx AS HUGEINT) AS cxx, " +
        "CAST(n * sxy - ma.sx * mb.sy AS HUGEINT) AS cxy, " +
        "CAST(n * syy - ma.sy * mb.sy AS HUGEINT) AS cyy " +
        "FROM cr JOIN marg ma ON cr.i = ma.i JOIN marg mb ON cr.j = mb.i, meta), " +
        "s AS (SELECT SUM(cxx * cxx) AS nxx, SUM(cxy * cxy) AS nxy, " +
        "SUM(cyy * cyy) AS nyy FROM c) " +
        "SELECT (SELECT n FROM meta) AS n_vectors, (SELECT dim FROM meta) AS dim, " +
        "CASE WHEN nxx > 0 AND nyy > 0 THEN " +
        "ROUND(CAST(nxy AS DOUBLE) / SQRT(CAST(nxx AS DOUBLE) * CAST(nyy AS DOUBLE)), 6) END AS cka " +
        "FROM s"),
    // x112's shared quant grid; the sum-vector identity evaluated as
    // two plain aggregates — the oracle never builds the pair join
    // either, so both engines prove the algebra, not a sample of it
    // same parity halves, x112's grid, the exact cross-multiplied
    // mean-shift rational on the 10^-4 grid and one sqrt at readout
    // same 0..255 grid; n² cancels so PR is exact integers to one
    // division (HUGEINT squares)
    "x287_participation_ratio" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, list_transform(v, " +
        "x -> CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv FROM e, b), " +
        "cells AS (SELECT CAST(p AS INTEGER) AS dim, qv[p + 1] AS q " +
        "FROM (SELECT vec_id, qv, unnest(range(0, len(qv))) AS p FROM q) t), " +
        "d AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q * q) AS BIGINT) AS ss " +
        "FROM cells GROUP BY 1), " +
        "v AS (SELECT dim, n, CAST(n AS HUGEINT) * ss - " +
        "CAST(s AS HUGEINT) * s AS v FROM d), " +
        "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims, " +
        "CAST(MAX(n) AS BIGINT) AS n_vecs, " +
        "CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sv, " +
        "CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv FROM v) " +
        "SELECT n_vecs, n_dims, " +
        "CASE WHEN svv > 0 THEN " +
        "ROUND(CAST(sv * sv AS DOUBLE) / CAST(svv AS DOUBLE), 4) END AS pr, " +
        "CASE WHEN svv > 0 AND n_dims > 0 THEN " +
        "ROUND(CAST(sv * sv AS DOUBLE) / " +
        "(CAST(svv AS DOUBLE) * CAST(n_dims AS DOUBLE)), 6) END AS pr_norm " +
        "FROM g"),
    "x177_embedding_drift" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, list_transform(v, " +
        "x -> CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv FROM e, b), " +
        "cells AS (SELECT vec_id % 2 = 0 AS h, CAST(p AS INTEGER) AS dim, " +
        "qv[p + 1] AS q FROM (SELECT vec_id, qv, " +
        "unnest(range(0, len(qv))) AS p FROM q) t), " +
        "d AS (SELECT dim, " +
        "CAST(SUM(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(SUM(CASE WHEN h THEN q ELSE 0 END) AS BIGINT) AS s_a, " +
        "CAST(SUM(CASE WHEN h THEN 0 ELSE 1 END) AS BIGINT) AS n_b, " +
        "CAST(SUM(CASE WHEN h THEN 0 ELSE q END) AS BIGINT) AS s_b " +
        "FROM cells GROUP BY 1), " +
        "f AS (SELECT dim, n_a, n_b, " +
        "CAST(ROUND(CAST(s_a * n_b - s_b * n_a AS DOUBLE) / " +
        "CAST(n_a * n_b AS DOUBLE) * 10000.0) AS BIGINT) AS shift_fp FROM d), " +
        "w AS (SELECT dim, n_a, n_b, shift_fp, " +
        "CAST(SUM(shift_fp * shift_fp) OVER () AS BIGINT) AS l2fp FROM f) " +
        "SELECT dim, n_a, n_b, " +
        "ROUND(CAST(shift_fp AS DOUBLE) / 10000.0, 4) AS mean_shift, " +
        "ROUND(SQRT(CAST(l2fp AS DOUBLE)) / 10000.0, 4) AS l2_shift " +
        "FROM w ORDER BY ABS(ROUND(CAST(shift_fp AS DOUBLE) / 10000.0, 4)) " +
        "DESC, dim LIMIT 10"),
    // same global grid, same 16x16 quantization and minPts rule,
    // exploded 9-key neighbor probes as a VALUES offset table, and
    // the identical unrolled min-label rounds (integer minima are
    // order-free, so non-convergence cannot split the engines)
    "x166_grid_cluster" -> {
      def round(prev: Int, out: Int): String =
        s"l$out AS (SELECT ed.id, MIN(l$prev.label) AS label " +
          s"FROM ed JOIN l$prev ON ed.nid = l$prev.id GROUP BY 1)"
      "WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "c AS (SELECT CAST(ROUND((v[1] - mn) / (mx - mn) * 15) AS BIGINT) AS cx, " +
        "CAST(ROUND((v[2] - mn) / (mx - mn) * 15) AS BIGINT) AS cy, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM e, b GROUP BY 1, 2), " +
        "d AS (SELECT cx, cy, n, cx * 16 + cy AS id FROM c WHERE n >= 5), " +
        "o AS (SELECT dx, dy FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1)," +
        "(0,0),(0,1),(1,-1),(1,0),(1,1)) t(dx, dy)), " +
        "ed AS (SELECT p.id AS id, q.id AS nid FROM " +
        "(SELECT id, cx + dx AS nx, cy + dy AS ny FROM d, o) p " +
        "JOIN d q ON p.nx = q.cx AND p.ny = q.cy), " +
        "l0 AS (SELECT id, id AS label FROM d), " +
        (0 until 8).map(i => round(i, i + 1)).mkString(", ") + " " +
        "SELECT d.cx, d.cy, d.n AS n_points, " +
        "CAST(l8.label AS BIGINT) AS cluster " +
        "FROM d JOIN l8 ON d.id = l8.id ORDER BY cx, cy"
    },
    "x147_isotropy" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, list_transform(v, " +
        "x -> CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv FROM e, b), " +
        "cells AS (SELECT CAST(p AS INTEGER) AS d, qv[p + 1] AS x " +
        "FROM q, (SELECT unnest(range(64)) AS p)), " +
        "ds AS (SELECT d, CAST(SUM(x) AS BIGINT) AS s FROM cells GROUP BY 1), " +
        "s2 AS (SELECT CAST(SUM(s * s) AS BIGINT) AS sum_sq FROM ds), " +
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(list_sum(list_transform(qv, x -> x * x))) AS BIGINT) AS total_sq " +
        "FROM q) " +
        "SELECT n, sum_sq, total_sq, " +
        "ROUND(CAST(sum_sq - total_sq AS DOUBLE) / " +
        "CAST(n * (n - 1) AS DOUBLE), 4) AS mean_pair_dot, " +
        "ROUND(CAST(sum_sq - total_sq AS DOUBLE) / " +
        "CAST((n - 1) * total_sq AS DOUBLE), 6) AS anisotropy " +
        "FROM t, s2"),
    // x54-x56: recall arithmetic over the committed id-set fixtures
    // (RecallFixtures scaladoc has the full design; x57's pattern).
    // Table-free VALUES SQL, pinned to the sf0.01 correctness-gate
    // corpus — a live-set drift OR a corpus-generator change
    // hash-mismatches these, which is the gate firing as designed.
    "x54_ann_lsh_recall" -> RecallFixtures.oracleSql(RecallFixtures.lsh),
    "x55_ann_ivf_recall" -> RecallFixtures.oracleSql(RecallFixtures.ivf),
    "x56_ann_pq_recall" -> RecallFixtures.oracleSql(RecallFixtures.pq),
    // same seed, same 4 dp-rounded squared-L2 grid (x64's list
    // arithmetic — identical accumulation order), same LEAST running
    // min and (d desc, vec_id) argmax, four unrolled rounds
    "x130_kcenter_coreset" -> {
      def sq(src: String, c: String): String =
        s"ROUND(list_sum(list_transform(range(1, len($src.v) + 1), " +
          s"i -> ($src.v[i] - $c.v[i]) * ($src.v[i] - $c.v[i]))), 4)"
      def pStep(src: String, out: String): String =
        s"$out AS (SELECT vec_id, v, d FROM $src ORDER BY d DESC, vec_id LIMIT 1)"
      def dStep(prev: String, pick: String, out: String): String =
        s"$out AS (SELECT $prev.vec_id, $prev.v, " +
          s"LEAST($prev.d, ${sq(prev, pick)}) AS d FROM $prev, $pick)"
      "WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1), " +
        s"d1 AS (SELECT e.vec_id, e.v, ${sq("e", "c1")} AS d FROM e, c1), " +
        pStep("d1", "p2") + ", " + dStep("d1", "p2", "d2") + ", " +
        pStep("d2", "p3") + ", " + dStep("d2", "p3", "d3") + ", " +
        pStep("d3", "p4") + ", " + dStep("d3", "p4", "d4") + ", " +
        pStep("d4", "p5") + " " +
        "SELECT CAST(1 AS INTEGER) AS sel_round, vec_id, 0.0 AS d_sel FROM c1 " +
        "UNION ALL SELECT 2, vec_id, d FROM p2 " +
        "UNION ALL SELECT 3, vec_id, d FROM p3 " +
        "UNION ALL SELECT 4, vec_id, d FROM p4 " +
        "UNION ALL SELECT 5, vec_id, d FROM p5 " +
        "ORDER BY sel_round"
    },
    // x07 mirrors the native expression's arithmetic exactly — floats
    // widened to double, per-element double products, sqrt(na)*sqrt(nb)
    // denominator — and both engines round to 4 dp before the compared
    // ordering (deterministic vec_id tiebreak), so the residual
    // accumulation-order risk is a score sitting within 1e-12 of a
    // rounding boundary: negligible, and the dual-scale sweep would
    // catch it. x08/x09/x16/x29 stay rows-only: their candidate SETS
    // depend on engine-specific hash/random projections, not just
    // float rounding.
    // same quantization grid, normalized integer Gram, two unrolled
    // power steps with the 1000-grid re-quantization, and the exact
    // Rayleigh ratio — the only float op on either side is the final
    // division
    "x112_principal_direction" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, list_transform(v, " +
        "x -> CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv FROM e, b), " +
        "nn AS (SELECT COUNT(*) AS n FROM q), " +
        "cells AS (SELECT vec_id, CAST(p AS INTEGER) AS i, qv[p + 1] AS qi " +
        "FROM q, (SELECT unnest(range(64)) AS p)), " +
        "gb AS (SELECT a.i, c2.i AS j, " +
        "CAST(SUM(a.qi * c2.qi) // (SELECT n FROM nn) AS BIGINT) AS g " +
        "FROM cells a JOIN cells c2 USING (vec_id) GROUP BY 1, 2), " +
        "u1 AS (SELECT i, CAST(SUM(g * 1000) AS BIGINT) AS u FROM gb GROUP BY 1), " +
        "v1 AS (SELECT i AS j, CAST(u * 1000 // (SELECT MAX(u) FROM u1) AS BIGINT) AS v FROM u1), " +
        "u2 AS (SELECT gb.i, CAST(SUM(g * v) AS BIGINT) AS u " +
        "FROM gb JOIN v1 ON v1.j = gb.j GROUP BY 1), " +
        "v2 AS (SELECT i AS j, CAST(u * 1000 // (SELECT MAX(u) FROM u2) AS BIGINT) AS v FROM u2), " +
        "num AS (SELECT CAST(SUM(g * va.v * vb.v) AS BIGINT) AS num " +
        "FROM gb JOIN v2 va ON va.j = gb.j JOIN v2 vb ON vb.j = gb.i), " +
        "den AS (SELECT CAST(SUM(v * v) AS BIGINT) AS den FROM v2) " +
        "SELECT j AS dim, v AS loading, " +
        "ROUND(CAST(num AS DOUBLE) / den, 4) AS rayleigh " +
        "FROM v2, num, den ORDER BY dim"),
    // one rank CTE per decade (generated below — identical float-op
    // sequence to the fused native cosine over the same slices),
    // joined against the full-dim decade for the overlap count
    "x105_matryoshka_eval" -> {
      def rkCte(d: Int): String =
        s"rk$d AS (SELECT query_id, vec_id FROM (" +
          "SELECT q.vec_id AS query_id, c.vec_id, " +
          "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY " +
          s"ROUND(list_sum(list_transform(range(1, ${d + 1}), i -> c.v[i] * q.v[i])) / " +
          s"(sqrt(list_sum(list_transform(c.v[1:$d], x -> x * x))) * " +
          s"sqrt(list_sum(list_transform(q.v[1:$d], x -> x * x)))), 4) DESC, c.vec_id) AS rk " +
          "FROM e c, e q WHERE q.vec_id < 3 AND c.vec_id >= 3) WHERE rk <= 10)"
      def recallRow(d: Int): String =
        s"SELECT s.query_id, CAST($d AS INTEGER) AS dim, " +
          "CAST(COALESCE(o.ov, 0) AS DOUBLE) / 10.0 AS recall10 " +
          "FROM (SELECT vec_id AS query_id FROM e WHERE vec_id < 3) s " +
          s"LEFT JOIN (SELECT a.query_id, COUNT(*) AS ov FROM rk$d a " +
          "JOIN rk64 f USING (query_id, vec_id) GROUP BY 1) o USING (query_id)"
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        Seq(8, 16, 64).map(rkCte).mkString(", ") + " " +
        Seq(8, 16, 64).map(recallRow).mkString(" UNION ALL ") +
        " ORDER BY query_id, dim"
    },
    // the x119 BM25 chain and the x105-form cosine chain rebuilt
    // verbatim, bounded to top-20 each, fused by the same rounded
    // reciprocal ranks
    "x122_hybrid_rrf" ->
      ("WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) " +
        "GROUP BY 1, 2), " +
        "lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1), " +
        "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS l FROM lens), " +
        "qt AS (SELECT doc_id, term, tf FROM tf " +
        "WHERE term IN ('join', 'filter', 'vector')), " +
        "d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qt GROUP BY 1), " +
        "sc AS (SELECT qt.doc_id, " +
        "ROUND(LN(CAST(2 * g.n + 2 AS DOUBLE) / (2 * d.df + 1)), 6) * " +
        "ROUND(CAST(qt.tf * g.l * 22 AS DOUBLE) / " +
        "(g.l * qt.tf * 10 + g.l * 3 + lens.len * g.n * 9), 6) AS s " +
        "FROM qt JOIN d USING (term) JOIN lens USING (doc_id), g), " +
        "bm AS (SELECT doc_id, ROUND(SUM(s), 4) AS bm25 FROM sc GROUP BY 1), " +
        "lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_lex FROM " +
        "(SELECT * FROM bm WHERE doc_id >= 3 ORDER BY bm25 DESC, doc_id LIMIT 20)), " +
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        "qv AS (SELECT v FROM e WHERE vec_id = 0), " +
        "cosr AS (SELECT c.vec_id AS doc_id, " +
        "ROUND(list_sum(list_transform(range(1, 65), i -> c.v[i] * q.v[i])) / " +
        "(sqrt(list_sum(list_transform(c.v[1:64], x -> x * x))) * " +
        "sqrt(list_sum(list_transform(q.v[1:64], x -> x * x)))), 4) AS cos " +
        "FROM e c, qv q WHERE c.vec_id >= 3), " +
        "dense AS (SELECT doc_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY cos DESC, doc_id) AS INTEGER) AS r_dense FROM " +
        "(SELECT * FROM cosr ORDER BY cos DESC, doc_id LIMIT 20)), " +
        "f AS (SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id, r_lex, r_dense, " +
        "COALESCE(ROUND(CAST(1 AS DOUBLE) / (r_lex + 60), 6), 0) + " +
        "COALESCE(ROUND(CAST(1 AS DOUBLE) / (r_dense + 60), 6), 0) AS rrf " +
        "FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id) " +
        "SELECT doc_id, CAST(COALESCE(r_lex, 0) AS INTEGER) AS r_lex, " +
        "CAST(COALESCE(r_dense, 0) AS INTEGER) AS r_dense, " +
        "ROUND(rrf, 6) AS rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 10"),
    // same ranking CTEs as x105 (identical float-op sequence), the
    // same ln2/ln(rk+1) 6 dp discount summed per query, IDCG over the
    // ideal ranks through the same ops
    "x120_retrieval_metrics" -> {
      def rkCte(name: String, d: Int): String =
        s"$name AS (SELECT query_id, vec_id, rk FROM (" +
          "SELECT q.vec_id AS query_id, c.vec_id, " +
          "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY " +
          s"ROUND(list_sum(list_transform(range(1, ${d + 1}), i -> c.v[i] * q.v[i])) / " +
          s"(sqrt(list_sum(list_transform(c.v[1:$d], x -> x * x))) * " +
          s"sqrt(list_sum(list_transform(q.v[1:$d], x -> x * x)))), 4) DESC, c.vec_id) AS rk " +
          "FROM e c, e q WHERE q.vec_id < 3 AND c.vec_id >= 3) WHERE rk <= 10)"
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings), " +
        rkCte("rk16", 16) + ", " + rkCte("rk64", 64) + ", " +
        "h AS (SELECT a.query_id, a.rk FROM rk16 a " +
        "JOIN rk64 f USING (query_id, vec_id)), " +
        "bq AS (SELECT query_id, COUNT(*) AS n_hits, MIN(rk) AS first_rank, " +
        "SUM(ROUND(LN(2) / LN(rk + 1), 6)) AS dcg_raw FROM h GROUP BY 1), " +
        "idcg AS (SELECT SUM(ROUND(LN(2) / LN(i + 1), 6)) AS idcg FROM " +
        "(SELECT unnest(range(1, 11)) AS i)), " +
        "s AS (SELECT vec_id AS query_id FROM e WHERE vec_id < 3) " +
        "SELECT s.query_id, CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits, " +
        "CAST(COALESCE(first_rank, 0) AS INTEGER) AS first_rank, " +
        "ROUND(CASE WHEN first_rank IS NULL THEN CAST(0 AS DOUBLE) " +
        "ELSE CAST(1 AS DOUBLE) / first_rank END, 4) AS mrr, " +
        "ROUND(CAST(COALESCE(dcg_raw, 0) AS DOUBLE) / idcg, 4) AS ndcg10 " +
        "FROM s LEFT JOIN bq USING (query_id), idcg ORDER BY query_id"
    },
    // same three unrolled greedy rounds over exact BIGINT scores —
    // argmax ties break on vec_id identically, so the PICKS match,
    // not just the score arithmetic
    "x102_mmr_rerank" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, list_transform(v, " +
        "x -> CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv FROM e, b), " +
        "qry AS (SELECT qv AS qq FROM q WHERE vec_id = 0), " +
        "c0 AS (SELECT q.vec_id, qv, CAST(list_sum(list_transform(" +
        "range(1, len(qv) + 1), i -> qv[i] * qq[i])) AS BIGINT) AS rel " +
        "FROM q, qry WHERE vec_id > 0), " +
        "cands AS (SELECT * FROM c0 ORDER BY rel DESC, vec_id LIMIT 6), " +
        "p1 AS (SELECT * FROM cands ORDER BY rel DESC, vec_id LIMIT 1), " +
        "r2 AS (SELECT c.vec_id, c.qv, c.rel, CAST(list_sum(list_transform(" +
        "range(1, len(c.qv) + 1), i -> c.qv[i] * p.qv[i])) AS BIGINT) AS pen " +
        "FROM cands c, p1 p WHERE c.vec_id <> p.vec_id), " +
        "p2 AS (SELECT * FROM r2 ORDER BY rel - pen DESC, vec_id LIMIT 1), " +
        "r3 AS (SELECT c.vec_id, c.rel, GREATEST(" +
        "CAST(list_sum(list_transform(range(1, len(c.qv) + 1), i -> c.qv[i] * p1.qv[i])) AS BIGINT), " +
        "CAST(list_sum(list_transform(range(1, len(c.qv) + 1), i -> c.qv[i] * p2.qv[i])) AS BIGINT)) AS pen " +
        "FROM cands c, p1, p2 WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id), " +
        "p3 AS (SELECT * FROM r3 ORDER BY rel - pen DESC, vec_id LIMIT 1) " +
        "SELECT 1 AS pick, vec_id, rel, CAST(0 AS BIGINT) AS penalty FROM p1 " +
        "UNION ALL SELECT 2, vec_id, rel, pen FROM p2 " +
        "UNION ALL SELECT 3, vec_id, rel, pen FROM p3 ORDER BY pick"),
    // exact integer scores — no rounding contract at all: the global
    // grid is two scalar aggregates, per-element quantization is the
    // same short IEEE chain both engines evaluate identically (x22's
    // precedent), and every score is a BIGINT sum of int products
    "x100_quantized_rerank" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "b AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, label, list_transform(v, " +
        "x -> CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv FROM e, b), " +
        "qq AS (SELECT vec_id AS query_id, qv AS qvec FROM q WHERE vec_id < 3), " +
        "s AS (SELECT query_id, q.vec_id, q.label, " +
        "CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * qvec[i])) AS BIGINT) AS score " +
        "FROM q, qq WHERE q.vec_id >= 3), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY score DESC, vec_id) AS rk FROM s) " +
        "SELECT query_id, vec_id, label, score FROM r WHERE rk <= 5 " +
        "ORDER BY query_id, score DESC, vec_id"),
    "x07_cosine_topk" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0) " +
        "SELECT e.vec_id, e.label, ROUND(" +
        "list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])) / " +
        "(sqrt(list_sum(list_transform(v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(qv, x -> x * x)))), 4) AS cos " +
        "FROM e, q WHERE e.vec_id <> 0 " +
        "ORDER BY cos DESC, e.vec_id LIMIT 10"),
    // x07's list arithmetic generalized to the 5-anchor batch; the
    // label<>label join predicate also excludes self-pairs
    "x83_hard_negatives" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv " +
        "FROM e WHERE vec_id < 5), " +
        "sel AS (SELECT q.query_id, e.vec_id, e.label, ROUND(" +
        "list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])) / " +
        "(sqrt(list_sum(list_transform(v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(qv, x -> x * x)))), 4) AS cos " +
        "FROM e JOIN q ON e.label <> q.qlabel) " +
        "SELECT query_id, vec_id, label, cos FROM sel " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, vec_id) <= 3 " +
        "ORDER BY query_id, cos DESC, vec_id"),
    "x06_embed_stats" ->
      ("SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim, " +
        "embedding[1] AS first_component FROM embeddings ORDER BY vec_id LIMIT 100"),
    // deterministic clustering (label) → reproducible survivor set;
    // the cosine mirrors x07's arithmetic (double widening), and the
    // threshold compares the unrounded double on both engines (x45's
    // proven pattern)
    "x58_semantic_dedup" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "d AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b " +
        "ON a.label = b.label AND a.vec_id < b.vec_id WHERE " +
        "list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / " +
        "(sqrt(list_sum(list_transform(a.v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.3) " +
        "SELECT e.vec_id, e.label FROM e " +
        "WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.vec_id = e.vec_id) " +
        "ORDER BY e.vec_id"),
    // x57's gap-closing move for the hyperplane family: integer
    // quantization + modular planes make every signature bit the sign
    // of an exact integer dot product, reproducible in SQL; the
    // cosine verify reuses x07's list arithmetic under ROUND 4
    "x75_hyperplane_verify_exact" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300), " +
        "q AS (SELECT vec_id, v, list_transform(v, " +
        "x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM e), " +
        "sig AS (SELECT vec_id, t.tbl AS tbl, " +
        "CAST(list_sum(list_transform(range(0, 8), p -> " +
        "CASE WHEN list_sum(list_transform(range(1, len(qv) + 1), d -> " +
        "qv[d] * (((t.tbl * 7919 + p * 104729 + (d - 1) * 1000003) % 2003) - 1001))) > 0 " +
        "THEN (1 << p) ELSE 0 END)) AS BIGINT) AS sig " +
        "FROM q, (SELECT unnest(range(0, 2)) AS tbl) t), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig " +
        "AND a.vec_id < b.vec_id), " +
        "vv AS (SELECT c.vec_a, c.vec_b, ea.v AS va, eb.v AS vb FROM cand c " +
        "JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b) " +
        "SELECT * FROM (SELECT vec_a, vec_b, ROUND(" +
        "list_sum(list_transform(range(1, len(va) + 1), i -> va[i] * vb[i])) / " +
        "(sqrt(list_sum(list_transform(va, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(vb, x -> x * x)))), 4) AS cos FROM vv) s " +
        "WHERE cos >= 0.2 ORDER BY vec_a, vec_b"),
    // x75's signature/candidate CTEs verbatim, then both-direction
    // expansion, the same cosine arithmetic and per-src rank window
    "x137_knn_graph" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300), " +
        "q AS (SELECT vec_id, v, list_transform(v, " +
        "x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM e), " +
        "sig AS (SELECT vec_id, t.tbl AS tbl, " +
        "CAST(list_sum(list_transform(range(0, 8), p -> " +
        "CASE WHEN list_sum(list_transform(range(1, len(qv) + 1), d -> " +
        "qv[d] * (((t.tbl * 7919 + p * 104729 + (d - 1) * 1000003) % 2003) - 1001))) > 0 " +
        "THEN (1 << p) ELSE 0 END)) AS BIGINT) AS sig " +
        "FROM q, (SELECT unnest(range(0, 2)) AS tbl) t), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig " +
        "AND a.vec_id < b.vec_id), " +
        "arcs AS (SELECT vec_a AS src, vec_b AS dst FROM cand " +
        "UNION ALL SELECT vec_b AS src, vec_a AS dst FROM cand), " +
        "sc AS (SELECT a.src, a.dst, ROUND(" +
        "list_sum(list_transform(range(1, len(es.v) + 1), i -> es.v[i] * ed.v[i])) / " +
        "(sqrt(list_sum(list_transform(es.v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(ed.v, x -> x * x)))), 4) AS cos " +
        "FROM arcs a JOIN e es ON es.vec_id = a.src " +
        "JOIN e ed ON ed.vec_id = a.dst) " +
        "SELECT src, CAST(rk AS INTEGER) AS rk, dst, cos FROM (" +
        "SELECT src, dst, cos, ROW_NUMBER() OVER (PARTITION BY src " +
        "ORDER BY cos DESC, dst) AS rk FROM sc) r " +
        "WHERE rk <= 3 ORDER BY src, rk"),
    // x137's full rank chain as a CTE, then the per-point MLE and
    // the 10^-6-grid per-label summary
    "x262_intrinsic_dim" ->
      ("WITH e AS (SELECT vec_id, label, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300), " +
        "q AS (SELECT vec_id, v, list_transform(v, " +
        "x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM e), " +
        "sig AS (SELECT vec_id, t.tbl AS tbl, " +
        "CAST(list_sum(list_transform(range(0, 8), p -> " +
        "CASE WHEN list_sum(list_transform(range(1, len(qv) + 1), d -> " +
        "qv[d] * (((t.tbl * 7919 + p * 104729 + (d - 1) * 1000003) % 2003) - 1001))) > 0 " +
        "THEN (1 << p) ELSE 0 END)) AS BIGINT) AS sig " +
        "FROM q, (SELECT unnest(range(0, 2)) AS tbl) t), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig " +
        "AND a.vec_id < b.vec_id), " +
        "arcs AS (SELECT vec_a AS src, vec_b AS dst FROM cand " +
        "UNION ALL SELECT vec_b AS src, vec_a AS dst FROM cand), " +
        "sc AS (SELECT a.src, a.dst, ROUND(" +
        "list_sum(list_transform(range(1, len(es.v) + 1), i -> es.v[i] * ed.v[i])) / " +
        "(sqrt(list_sum(list_transform(es.v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(ed.v, x -> x * x)))), 4) AS cos " +
        "FROM arcs a JOIN e es ON es.vec_id = a.src " +
        "JOIN e ed ON ed.vec_id = a.dst), " +
        "g AS (SELECT src, 1.0 - cos AS dist FROM (" +
        "SELECT src, dst, cos, ROW_NUMBER() OVER (PARTITION BY src " +
        "ORDER BY cos DESC, dst) AS rk FROM sc) r WHERE rk <= 3), " +
        "dm AS (SELECT src, dist, MAX(dist) OVER (PARTITION BY src) AS dmax FROM g), " +
        "pl AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS kk, MAX(dmax) AS dmax, " +
        "SUM(CASE WHEN dist > 0.0 THEN LN(dist / dmax) END) AS slog FROM dm GROUP BY 1), " +
        "lid AS (SELECT src, CAST(ROUND(-CAST(kk AS DOUBLE) / slog * 1000000.0, 0) AS BIGINT) AS lid_fp " +
        "FROM pl WHERE dmax > 0.0 AND slog < 0.0) " +
        "SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_pts, " +
        "ROUND(CAST(SUM(lid_fp) AS DOUBLE) / (COUNT(*) * 1000000.0), 4) AS mean_lid, " +
        "ROUND(CAST(MIN(lid_fp) AS DOUBLE) / 1000000.0, 4) AS min_lid, " +
        "ROUND(CAST(MAX(lid_fp) AS DOUBLE) / 1000000.0, 4) AS max_lid " +
        "FROM lid JOIN e ON e.vec_id = lid.src GROUP BY 1 ORDER BY 1"),
    // x137's full rank chain as a CTE, then zero-filled in-degrees
    // and one fixed skewness expression over four exact moments
    "x241_hubness" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300), " +
        "q AS (SELECT vec_id, v, list_transform(v, " +
        "x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM e), " +
        "sig AS (SELECT vec_id, t.tbl AS tbl, " +
        "CAST(list_sum(list_transform(range(0, 8), p -> " +
        "CASE WHEN list_sum(list_transform(range(1, len(qv) + 1), d -> " +
        "qv[d] * (((t.tbl * 7919 + p * 104729 + (d - 1) * 1000003) % 2003) - 1001))) > 0 " +
        "THEN (1 << p) ELSE 0 END)) AS BIGINT) AS sig " +
        "FROM q, (SELECT unnest(range(0, 2)) AS tbl) t), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig " +
        "AND a.vec_id < b.vec_id), " +
        "arcs AS (SELECT vec_a AS src, vec_b AS dst FROM cand " +
        "UNION ALL SELECT vec_b AS src, vec_a AS dst FROM cand), " +
        "sc AS (SELECT a.src, a.dst, ROUND(" +
        "list_sum(list_transform(range(1, len(es.v) + 1), i -> es.v[i] * ed.v[i])) / " +
        "(sqrt(list_sum(list_transform(es.v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(ed.v, x -> x * x)))), 4) AS cos " +
        "FROM arcs a JOIN e es ON es.vec_id = a.src " +
        "JOIN e ed ON ed.vec_id = a.dst), " +
        "g AS (SELECT src, dst FROM (" +
        "SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src " +
        "ORDER BY cos DESC, dst) AS rk FROM sc) r WHERE rk <= 3), " +
        "ind AS (SELECT e.vec_id, COALESCE(gd.d0, 0) AS d FROM e " +
        "LEFT JOIN (SELECT dst AS vec_id, CAST(COUNT(*) AS BIGINT) AS d0 " +
        "FROM g GROUP BY 1) gd USING (vec_id)), " +
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d) AS BIGINT) AS s1, " +
        "CAST(SUM(d * d) AS BIGINT) AS s2, CAST(SUM(d * d * d) AS BIGINT) AS s3, " +
        "CAST(MAX(d) AS BIGINT) AS max_in_deg, " +
        "CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_antihubs FROM ind), " +
        "m AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu, " +
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m2, " +
        "CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) + " +
        "2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m3 FROM s) " +
        "SELECT n AS n_nodes, n_antihubs, max_in_deg, " +
        "CASE WHEN n > 0 AND m2 > 0.0 THEN ROUND(m3 / (m2 * SQRT(m2)), 6) END AS skew_g1 " +
        "FROM m"),
    // x137's full rank chain as a CTE, then the reciprocal self-join
    "x143_mutual_knn" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300), " +
        "q AS (SELECT vec_id, v, list_transform(v, " +
        "x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM e), " +
        "sig AS (SELECT vec_id, t.tbl AS tbl, " +
        "CAST(list_sum(list_transform(range(0, 8), p -> " +
        "CASE WHEN list_sum(list_transform(range(1, len(qv) + 1), d -> " +
        "qv[d] * (((t.tbl * 7919 + p * 104729 + (d - 1) * 1000003) % 2003) - 1001))) > 0 " +
        "THEN (1 << p) ELSE 0 END)) AS BIGINT) AS sig " +
        "FROM q, (SELECT unnest(range(0, 2)) AS tbl) t), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b " +
        "FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig " +
        "AND a.vec_id < b.vec_id), " +
        "arcs AS (SELECT vec_a AS src, vec_b AS dst FROM cand " +
        "UNION ALL SELECT vec_b AS src, vec_a AS dst FROM cand), " +
        "sc AS (SELECT a.src, a.dst, ROUND(" +
        "list_sum(list_transform(range(1, len(es.v) + 1), i -> es.v[i] * ed.v[i])) / " +
        "(sqrt(list_sum(list_transform(es.v, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(ed.v, x -> x * x)))), 4) AS cos " +
        "FROM arcs a JOIN e es ON es.vec_id = a.src " +
        "JOIN e ed ON ed.vec_id = a.dst), " +
        "g AS (SELECT src, dst, cos FROM (" +
        "SELECT src, dst, cos, ROW_NUMBER() OVER (PARTITION BY src " +
        "ORDER BY cos DESC, dst) AS rk FROM sc) r WHERE rk <= 3) " +
        "SELECT x.src AS vec_a, x.dst AS vec_b, x.cos " +
        "FROM g x JOIN g y ON x.src = y.dst AND x.dst = y.src " +
        "WHERE x.src < x.dst ORDER BY vec_a, vec_b"),
    // deterministic blocking → reproducible candidate set; the cosine
    // mirrors x07's arithmetic (double widening, 4 dp round)
    "x45_snm_neardup" ->
      ("WITH e AS (SELECT vec_id, label, embedding[1] AS k, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "r AS (SELECT vec_id, label, v, ROW_NUMBER() OVER " +
        "(PARTITION BY label ORDER BY k, vec_id) AS rk FROM e), " +
        "p AS (SELECT a.vec_id AS va, b.vec_id AS vb, a.v AS av, b.v AS bv " +
        "FROM r a JOIN r b ON a.label = b.label " +
        "AND b.rk > a.rk AND b.rk <= a.rk + 10), " +
        "c AS (SELECT va, vb, " +
        "list_sum(list_transform(range(1, len(av) + 1), i -> av[i] * bv[i])) / " +
        "(sqrt(list_sum(list_transform(av, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(bv, x -> x * x)))) AS cos FROM p) " +
        "SELECT LEAST(va, vb) AS vec_a, GREATEST(va, vb) AS vec_b, " +
        "ROUND(cos, 4) AS cos FROM c WHERE cos >= 0.2 ORDER BY vec_a, vec_b"),
    // order-independent mean: exact decimal sum, ONE double division
    // (mirrors the Spark arithmetic); 0-based dim matches posexplode
    "x39_embed_centroids" ->
      ("SELECT label, CAST(i AS INTEGER) AS dim, " +
        "ROUND(CAST(SUM(CAST(embedding[i+1] AS DECIMAL(20,10))) AS DOUBLE) " +
        "/ COUNT(*), 4) + 0 AS centroid, " +
        "COUNT(*) AS n_vectors FROM (" +
        "SELECT label, embedding, unnest(range(len(embedding))) AS i FROM embeddings) t " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // x39's centroid CTE feeds the pairwise distance; the 4 dp-rounded
    // centroid grid makes the input deterministic on both engines
    "x49_centroid_separation" ->
      ("WITH cent AS (SELECT label, CAST(i AS INTEGER) AS dim, " +
        "ROUND(CAST(SUM(CAST(embedding[i+1] AS DECIMAL(20,10))) AS DOUBLE) " +
        "/ COUNT(*), 4) + 0 AS centroid FROM (" +
        "SELECT label, embedding, unnest(range(len(embedding))) AS i FROM embeddings) t " +
        "GROUP BY 1, 2) " +
        "SELECT a.label AS label_a, b.label AS label_b, " +
        "ROUND(SQRT(SUM((a.centroid - b.centroid) * (a.centroid - b.centroid))), 4) AS dist " +
        "FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // the scale math runs in DOUBLE on both engines (the raw elements
    // are FLOAT — float-precision intermediates would round differently)
    "x22_embed_quantize" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d " +
        "FROM embeddings), " +
        "m AS (SELECT vec_id, d, list_min(d) AS mn, list_max(d) AS mx FROM e) " +
        "SELECT vec_id, " +
        "CASE WHEN mx = mn THEN 0 ELSE " +
        "CAST(ROUND((d[1] - mn) / (mx - mn) * 255) AS INTEGER) END AS q_first, " +
        "CAST(list_sum(list_transform(d, v -> CASE WHEN mx = mn THEN 0 ELSE " +
        "CAST(ROUND((v - mn) / (mx - mn) * 255) AS INTEGER) END)) AS BIGINT) AS q_sum " +
        "FROM m ORDER BY vec_id"),
    // seeds = first 8 vec_ids (deterministic on both engines); per-vec
    // distance rounds at 4 dp BEFORE the argmin, with k as tiebreak,
    // mirroring the Spark side (x07's tolerance argument); the inertia
    // sums already-rounded values so its own 4 dp round is stable
    // x64's distance/tiebreak chain with the two smallest kept per
    // vector (rn <= 2 pivoted), same (b-a)/b grid and one division
    // per cluster; b >= a by argmin so max(a,b) = b on both engines
    "x162_silhouette" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "t AS (SELECT vec_id, k, d, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn FROM d " +
        "QUALIFY rn <= 2), " +
        "p AS (SELECT vec_id, MAX(CASE WHEN rn = 1 THEN k END) AS k, " +
        "MAX(CASE WHEN rn = 1 THEN d END) AS a, " +
        "MAX(CASE WHEN rn = 2 THEN d END) AS b FROM t GROUP BY 1), " +
        "s AS (SELECT vec_id, k, CASE WHEN b > 0.0 THEN " +
        "CAST(ROUND((b - a) / b * 1000000.0) AS BIGINT) ELSE 0 END AS s_fp " +
        "FROM p) " +
        "SELECT k, COUNT(*) AS n_assigned, " +
        "ROUND(CAST(SUM(s_fp) AS DOUBLE) / (COUNT(*) * 1000000.0), 4) AS mean_sil, " +
        "ROUND(CAST(MIN(s_fp) AS DOUBLE) / 1000000.0, 4) AS min_sil, " +
        "ROUND(CAST(MAX(s_fp) AS DOUBLE) / 1000000.0, 4) AS max_sil " +
        "FROM s GROUP BY k ORDER BY k"),
    "x64_kmeans_assign" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "a AS (SELECT vec_id, k, d FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1) " +
        "SELECT k, COUNT(*) AS n_assigned, ROUND(SUM(d), 4) AS inertia " +
        "FROM a GROUP BY k ORDER BY k"),
    // two Lloyd rounds: iteration 1 is x64's oracle; the recentered
    // model goes through x39's exact-decimal mean (order-independent
    // accumulation + one double division + 4 dp round + 0 to kill
    // -0.0), so both engines feed iteration 2 the same centroid grid
    "x65_kmeans_train" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c1 AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d1 AS (SELECT e.vec_id, c1.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c1), " +
        "a1 AS (SELECT vec_id, k, d FROM d1 " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "s1 AS (SELECT CAST(1 AS INTEGER) AS iter, k, COUNT(*) AS n_assigned, " +
        "ROUND(SUM(d), 4) AS inertia FROM a1 GROUP BY k), " +
        "ed AS (SELECT vec_id, i AS dim, v[i] AS x FROM (" +
        "SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM e) t), " +
        "m2 AS (SELECT a1.k, ed.dim, " +
        "ROUND(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 4) + 0 AS m " +
        "FROM a1 JOIN ed USING (vec_id) GROUP BY 1, 2), " +
        "c2 AS (SELECT k, list(m ORDER BY dim) AS cv FROM m2 GROUP BY k), " +
        "d2 AS (SELECT e.vec_id, c2.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c2), " +
        "a2 AS (SELECT vec_id, k, d FROM d2 " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "s2 AS (SELECT CAST(2 AS INTEGER) AS iter, k, COUNT(*) AS n_assigned, " +
        "ROUND(SUM(d), 4) AS inertia FROM a2 GROUP BY k) " +
        "SELECT iter, k, n_assigned, inertia FROM (" +
        "SELECT * FROM s1 UNION ALL SELECT * FROM s2) u ORDER BY iter, k"),
    // same argmin assignment, same exact-decimal per-(k,dim) sums,
    // same per-dimension ANOVA decomposition and variance ratio
    "x249_ch_index" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "a1 AS (SELECT vec_id, k FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "ed AS (SELECT vec_id, i AS dim, v[i] AS x FROM (" +
        "SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM e) t), " +
        "cells AS (SELECT a1.k, ed.dim, " +
        "CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) AS s, " +
        "CAST(COUNT(*) AS BIGINT) AS n_k FROM a1 JOIN ed USING (vec_id) GROUP BY 1, 2), " +
        "bh AS (SELECT SUM(s * s / CAST(n_k AS DOUBLE)) AS b_hit FROM cells), " +
        "gq AS (SELECT SUM(g * g) AS gsq FROM (" +
        "SELECT dim, SUM(s) AS g FROM cells GROUP BY 1) t), " +
        "tot AS (SELECT CAST(SUM(CAST(x AS DECIMAL(18,9)) * CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS totss FROM ed), " +
        "nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(DISTINCT k) AS BIGINT) AS k_clusters FROM a1), " +
        "f AS (SELECT n, k_clusters, b_hit - gsq / CAST(n AS DOUBLE) AS between_raw, " +
        "totss - b_hit AS within_raw FROM nr, bh, gq, tot) " +
        "SELECT n, k_clusters, ROUND(between_raw, 4) AS between_ss, " +
        "ROUND(within_raw, 4) AS within_ss, " +
        "CASE WHEN k_clusters > 1 AND n > k_clusters AND within_raw > 0.0 THEN " +
        "ROUND((between_raw / (CAST(k_clusters AS DOUBLE) - 1.0)) / " +
        "(within_raw / (CAST(n AS DOUBLE) - CAST(k_clusters AS DOUBLE))), 6) END AS ch " +
        "FROM f"),
    // same 4 dp-gridded recentered means, same RMS sigma, same
    // 10^-6-grid worst-neighbor ratios
    "x250_davies_bouldin" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "a1 AS (SELECT vec_id, k FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "ed AS (SELECT vec_id, i AS dim, v[i] AS x FROM (" +
        "SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM e) t), " +
        "m2 AS (SELECT a1.k, ed.dim, " +
        "ROUND(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 4) + 0 AS m, " +
        "CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) AS s " +
        "FROM a1 JOIN ed USING (vec_id) GROUP BY 1, 2), " +
        "c2 AS (SELECT k, list(m ORDER BY dim) AS cv, list(s ORDER BY dim) AS sv FROM m2 GROUP BY k), " +
        "ssk AS (SELECT a1.k, " +
        "CAST(SUM(CAST(x AS DECIMAL(18,9)) * CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS ss " +
        "FROM a1 JOIN ed USING (vec_id) GROUP BY 1), " +
        "nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_assigned FROM a1 GROUP BY 1), " +
        "sg AS (SELECT c2.k, nk.n_assigned, cv, " +
        "ROUND(SQRT(GREATEST(0.0, (ss - 2.0 * list_sum(list_transform(" +
        "range(1, len(cv) + 1), i -> cv[i] * sv[i])) + " +
        "CAST(n_assigned AS DOUBLE) * list_sum(list_transform(cv, x -> x * x))) / " +
        "CAST(n_assigned AS DOUBLE))), 4) AS sigma " +
        "FROM c2 JOIN ssk ON ssk.k = c2.k JOIN nk ON nk.k = c2.k), " +
        "p AS (SELECT k, n_assigned, sigma, " +
        "CAST(ROUND(sig_sum / SQRT(d2) * 1000000.0, 0) AS BIGINT) AS r_fp " +
        "FROM (SELECT i.k, i.n_assigned, i.sigma, i.sigma + j.sigma AS sig_sum, " +
        "list_sum(list_transform(" +
        "range(1, len(i.cv) + 1), q -> (i.cv[q] - j.cv[q]) * (i.cv[q] - j.cv[q]))) AS d2 " +
        "FROM sg i, sg j WHERE i.k <> j.k) t WHERE d2 > 0.0), " +
        "g AS (SELECT k, MAX(n_assigned) AS n_assigned, MAX(sigma) AS sigma, " +
        "MAX(r_fp) AS r_max_fp FROM p GROUP BY 1) " +
        "SELECT k, n_assigned, sigma, CAST(r_max_fp AS DOUBLE) / 1000000.0 AS r_max, " +
        "ROUND(CAST(SUM(r_max_fp) OVER () AS DOUBLE) / " +
        "(COUNT(*) OVER () * 1000000.0), 6) AS db_index " +
        "FROM g ORDER BY k"),
    // same argmin-vs-label contingency, same exact pair counts with
    // the HUGEINT margin product, same one double division
    "x251_adjusted_rand" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, e.label, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "a1 AS (SELECT vec_id, label, k FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "ct AS (SELECT k AS u, label AS vl, CAST(COUNT(*) AS BIGINT) AS n_uv " +
        "FROM a1 GROUP BY 1, 2), " +
        "cs AS (SELECT CAST(SUM(n_uv) AS BIGINT) AS n, " +
        "CAST(SUM(n_uv * (n_uv - 1) // 2) AS BIGINT) AS sum_c FROM ct), " +
        "rs AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_u, " +
        "CAST(SUM(a_u * (a_u - 1) // 2) AS BIGINT) AS sum_a FROM (" +
        "SELECT u, CAST(SUM(n_uv) AS BIGINT) AS a_u FROM ct GROUP BY 1) t), " +
        "ks AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_v, " +
        "CAST(SUM(b_v * (b_v - 1) // 2) AS BIGINT) AS sum_b FROM (" +
        "SELECT vl, CAST(SUM(n_uv) AS BIGINT) AS b_v FROM ct GROUP BY 1) t), " +
        "f AS (SELECT n, k_u, k_v, sum_c, sum_a, sum_b, " +
        "CAST(CAST(sum_a AS HUGEINT) * CAST(sum_b AS HUGEINT) AS DOUBLE) / " +
        "CAST(n * (n - 1) // 2 AS DOUBLE) AS e_pairs FROM cs, rs, ks), " +
        "g AS (SELECT n, k_u, k_v, sum_c, e_pairs, " +
        "(CAST(sum_a AS DOUBLE) + CAST(sum_b AS DOUBLE)) / 2.0 - e_pairs AS den FROM f) " +
        "SELECT n, k_u, k_v, CASE WHEN ABS(den) > 0.0 THEN " +
        "ROUND((CAST(sum_c AS DOUBLE) - e_pairs) / den, 6) END AS ari FROM g"),
    // same contingency, same cell-grain ln terms, same arithmetic-
    // mean normalization
    "x252_nmi" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, e.label, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "a1 AS (SELECT vec_id, label, k FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "ct AS (SELECT k AS u, label AS vl, CAST(COUNT(*) AS BIGINT) AS n_uv " +
        "FROM a1 GROUP BY 1, 2), " +
        "n1 AS (SELECT CAST(SUM(n_uv) AS BIGINT) AS n FROM ct), " +
        "r AS (SELECT u, CAST(SUM(n_uv) AS BIGINT) AS a_u FROM ct GROUP BY 1), " +
        "cl AS (SELECT vl, CAST(SUM(n_uv) AS BIGINT) AS b_v FROM ct GROUP BY 1), " +
        "im AS (SELECT SUM(CAST(n_uv AS DOUBLE) * LN(CAST(n AS DOUBLE) * " +
        "CAST(n_uv AS DOUBLE) / (CAST(a_u AS DOUBLE) * CAST(b_v AS DOUBLE)))) AS i_raw " +
        "FROM ct JOIN r USING (u) JOIN cl USING (vl), n1), " +
        "hu AS (SELECT SUM(CAST(a_u AS DOUBLE) * LN(CAST(a_u AS DOUBLE))) AS su, " +
        "CAST(COUNT(*) AS BIGINT) AS k_u FROM r), " +
        "hv AS (SELECT SUM(CAST(b_v AS DOUBLE) * LN(CAST(b_v AS DOUBLE))) AS sv, " +
        "CAST(COUNT(*) AS BIGINT) AS k_v FROM cl), " +
        "f AS (SELECT n, k_u, k_v, i_raw / CAST(n AS DOUBLE) AS i_val, " +
        "LN(CAST(n AS DOUBLE)) - su / CAST(n AS DOUBLE) AS h_u, " +
        "LN(CAST(n AS DOUBLE)) - sv / CAST(n AS DOUBLE) AS h_v FROM n1, im, hu, hv) " +
        "SELECT n, k_u, k_v, ROUND(i_val, 6) AS mutual_info, " +
        "CASE WHEN h_u + h_v > 0.0 THEN " +
        "ROUND(2.0 * i_val / (h_u + h_v), 6) END AS nmi FROM f"),
    // same 0..255 grid, same exact min/max integer sums, same
    // rank/tiebreak chain
    "x271_weighted_jaccard_topk" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "bounds AS (SELECT MIN(list_min(v)) AS mn, MAX(list_max(v)) AS mx FROM e), " +
        "q AS (SELECT vec_id, list_transform(v, " +
        "x -> CAST(round((x - mn) / (mx - mn) * 255) AS BIGINT)) AS qv " +
        "FROM e, bounds), " +
        "qq AS (SELECT vec_id AS query_id, qv AS a FROM q WHERE vec_id < 5), " +
        "s AS (SELECT qq.query_id, q.vec_id AS neighbor_id, " +
        "CAST(list_sum(list_transform(range(1, len(a) + 1), " +
        "i -> LEAST(a[i], qv[i]))) AS BIGINT) AS mins, " +
        "CAST(list_sum(list_transform(range(1, len(a) + 1), " +
        "i -> GREATEST(a[i], qv[i]))) AS BIGINT) AS maxs " +
        "FROM qq, q WHERE qq.query_id <> q.vec_id), " +
        "r AS (SELECT query_id, neighbor_id, mins, maxs, " +
        "CASE WHEN maxs > 0 THEN ROUND(CAST(mins AS DOUBLE) / CAST(maxs AS DOUBLE), 6) " +
        "ELSE 0.0 END AS wj FROM s), " +
        "k AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY wj DESC, neighbor_id) AS INTEGER) AS rank FROM r) " +
        "SELECT query_id, neighbor_id, mins, maxs, wj, rank FROM k " +
        "WHERE rank <= 3 ORDER BY query_id, rank"),
    // x16's probe/rerank chain on the first-8 seed quantizer: same
    // 4 dp-rounded distances before every argmin/rank, same
    // cell/neighbor tiebreaks, nprobe=2 QUALIFY probe selection
    "x212_ivf_probe_exact" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS k, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
        "d AS (SELECT e.vec_id, e.v, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(v) + 1), i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 4) AS d " +
        "FROM e, c), " +
        "a AS (SELECT vec_id, v, k AS cell FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, k) = 1), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "pd AS (SELECT q.query_id, q.qv, c.k, ROUND(list_sum(list_transform(" +
        "range(1, len(qv) + 1), i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), 4) AS cd " +
        "FROM q, c), " +
        "p AS (SELECT query_id, qv, k AS cell FROM pd " +
        "QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cd, k) <= 2), " +
        "s AS (SELECT p.query_id, a.vec_id AS neighbor_id, ROUND(" +
        "list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) / " +
        "(sqrt(list_sum(list_transform(qv, x -> x * x))) * " +
        "sqrt(list_sum(list_transform(v, x -> x * x)))), 4) AS cos " +
        "FROM p JOIN a USING (cell) WHERE p.query_id <> a.vec_id), " +
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank FROM s) " +
        "SELECT query_id, neighbor_id, cos, rank FROM r " +
        "WHERE rank <= 3 ORDER BY query_id, rank"),
    // x29's encode/ADC chain on the first-8 seed codebooks: the
    // 10⁻⁴-grid fixed-point sub-distances make the encode argmin and
    // the additive per-query sums exact integers on both engines
    "x213_pq_adc_exact" ->
      ("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "p AS (SELECT vec_id, s, list_slice(v, s * sd + 1, (s + 1) * sd) AS sv " +
        "FROM (SELECT vec_id, v, len(v) // 4 AS sd, " +
        "unnest(range(0, 4)) AS s FROM e) t), " +
        "cb AS (SELECT p.vec_id AS code, p.s AS sub, p.sv AS centroid FROM p " +
        "WHERE p.vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)), " +
        "d AS (SELECT p.vec_id, p.s AS sub, cb.code, " +
        "CAST(ROUND(list_sum(list_transform(range(1, len(sv) + 1), " +
        "i -> (sv[i] - centroid[i]) * (sv[i] - centroid[i]))) * 10000) AS BIGINT) AS d_fp " +
        "FROM p JOIN cb ON p.s = cb.sub), " +
        "enc AS (SELECT vec_id, sub, code FROM d " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d_fp, code) = 1), " +
        "qd AS (SELECT vec_id AS query_id, sub, code, d_fp AS pd_fp FROM d " +
        "WHERE vec_id < 5), " +
        "adc AS (SELECT qd.query_id, enc.vec_id AS neighbor_id, " +
        "CAST(SUM(qd.pd_fp) AS BIGINT) AS adc_fp " +
        "FROM enc JOIN qd ON enc.sub = qd.sub AND enc.code = qd.code " +
        "WHERE qd.query_id <> enc.vec_id GROUP BY 1, 2), " +
        "r AS (SELECT query_id, neighbor_id, adc_fp, " +
        "CAST(row_number() OVER (PARTITION BY query_id " +
        "ORDER BY adc_fp, neighbor_id) AS INTEGER) AS rank FROM adc) " +
        "SELECT query_id, neighbor_id, " +
        "ROUND(CAST(adc_fp AS DOUBLE) / 10000.0, 4) AS adc, rank FROM r " +
        "WHERE rank <= 3 ORDER BY query_id, rank")
  )
}
