package graft.ext

/** Committed id-set fixtures backing the x54-x56 ANN-recall oracles.
  *
  * The ANN candidate sets are engine-specific (seeded hyperplanes /
  * seeded k-means over float vectors), so DuckDB cannot recompute
  * them from the parquet tables. What it CAN independently recompute
  * is the recall ARITHMETIC — per-query hit counts, the division, the
  * rounding — from pinned id sets, which is exactly x57's pattern for
  * the minhash verify machinery. The sets below are the brute-force
  * exact top-10 ground truth and each ANN path's top-10 at the
  * correctness-gate corpus (sf0.01; the testdata generator is
  * seed-pinned, TESTDATA.md, so the sets are stable across
  * re-provisions). The hash compare therefore fires whenever the LIVE
  * Spark-side sets drift from these pins — a recall regression, an
  * index change, or a corpus-generator change — which is precisely
  * the regression gate the recall reports exist to be.
  *
  * Regenerate (and re-commit) when the corpus or an ANN path
  * legitimately changes:
  *   sbt "runMain graft.tools.RecallFixture /root/testdata/sf0.01"
  */
object RecallFixtures {

  /** Corpus the fixtures were dumped from — the driver's correctness
    * gate runs Verify + DuckDB at this sf (task contract); a dump at
    * any other sf will (correctly) hash-mismatch these three entries.
    */
  val FixtureSf = "sf0.01"

  val truth = "(0,7),(0,73),(0,190),(0,320),(0,334),(0,365),(0,387),(0,388),(0,423),(0,464),(1,27),(1,64),(1,124),(1,195),(1,203),(1,220),(1,386),(1,402),(1,407),(1,472),(2,112),(2,117),(2,145),(2,172),(2,188),(2,320),(2,350),(2,418),(2,450),(2,471),(3,130),(3,149),(3,174),(3,192),(3,207),(3,231),(3,315),(3,343),(3,437),(3,474),(4,89),(4,114),(4,249),(4,257),(4,280),(4,384),(4,408),(4,470),(4,482),(4,496)"

  val lsh = "(0,24),(0,36),(0,56),(0,174),(0,292),(0,344),(0,377),(0,391),(0,420),(0,461),(1,13),(1,31),(1,165),(1,203),(1,217),(1,243),(1,285),(1,347),(1,402),(1,495),(2,33),(2,107),(2,125),(2,128),(2,149),(2,188),(2,226),(2,307),(2,339),(2,459),(3,111),(3,125),(3,172),(3,205),(3,224),(3,237),(3,419),(3,444),(3,468),(3,495),(4,13),(4,33),(4,274),(4,305),(4,307),(4,403),(4,417),(4,459)"

  val ivf = "(0,73),(0,190),(0,323),(0,334),(0,344),(0,365),(0,387),(0,388),(0,423),(0,498),(1,27),(1,64),(1,124),(1,195),(1,203),(1,363),(1,386),(1,402),(1,407),(1,472),(2,109),(2,117),(2,128),(2,197),(2,202),(2,239),(2,440),(2,450),(2,459),(2,471),(3,130),(3,174),(3,192),(3,231),(3,315),(3,343),(3,349),(3,363),(3,463),(3,474),(4,89),(4,114),(4,257),(4,280),(4,288),(4,346),(4,353),(4,384),(4,408),(4,482)"

  val pq = "(0,7),(0,36),(0,73),(0,229),(0,388),(0,398),(0,405),(0,423),(0,464),(0,498),(1,42),(1,64),(1,134),(1,271),(1,353),(1,370),(1,386),(1,477),(1,486),(1,495),(2,182),(2,187),(2,264),(2,320),(2,341),(2,351),(2,391),(2,410),(2,418),(2,449),(3,85),(3,98),(3,130),(3,132),(3,250),(3,287),(3,335),(3,396),(3,463),(3,477),(4,6),(4,81),(4,123),(4,181),(4,201),(4,219),(4,254),(4,276),(4,408),(4,423)"

  /** DuckDB SQL recomputing the recallAtK report (query_id, k,
    * n_recalled, recall) from the pinned truth set and one pinned ANN
    * set — the same hit-count / coalesce / round arithmetic as the
    * Spark side, over VALUES instead of engine-specific indexes.
    */
  def oracleSql(annValues: String): String =
    s"WITH truth(query_id, neighbor_id) AS (VALUES $truth), " +
      s"ann(query_id, neighbor_id) AS (VALUES $annValues), " +
      "hits AS (SELECT t.query_id, COUNT(*) AS n_recalled FROM truth t " +
      "JOIN ann a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id " +
      "GROUP BY 1), " +
      "base AS (SELECT query_id, COUNT(*) AS n_true FROM truth GROUP BY 1) " +
      "SELECT CAST(b.query_id AS BIGINT) AS query_id, 10 AS k, " +
      "CAST(COALESCE(h.n_recalled, 0) AS BIGINT) AS n_recalled, " +
      "ROUND(CAST(COALESCE(h.n_recalled, 0) AS DOUBLE) / b.n_true, 4) AS recall " +
      "FROM base b LEFT JOIN hits h ON b.query_id = h.query_id " +
      "ORDER BY query_id"
}
