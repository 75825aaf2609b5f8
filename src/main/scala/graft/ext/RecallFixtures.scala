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
  * Fixtures are keyed BY SCALE FACTOR (VERDICT r11 §5): the gate
  * corpus sf0.01 pins the driver contract, and an sf0.1 dump backs
  * the dual-scale sweep so x54-x56 verify there too instead of
  * reporting by-design mismatches. Verify picks the right set via
  * [[oracleOverridesFor]].
  *
  * Regenerate (and re-commit) when the corpus or an ANN path
  * legitimately changes:
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.RecallFixture /root/testdata/sf0.01"
  * (and again at sf0.1; the session parallelism must match the gate
  * session's — see the tool's scaladoc).
  */
object RecallFixtures {

  /** Corpus the DEFAULT (driver-contract) fixtures were dumped from —
    * the driver's correctness gate runs Verify + DuckDB at this sf; a
    * dump at an sf with no committed fixture set will (correctly)
    * hash-mismatch these three entries.
    */
  val FixtureSf = "sf0.01"

  val truth = "(0,7),(0,73),(0,190),(0,320),(0,334),(0,365),(0,387),(0,388),(0,423),(0,464),(1,27),(1,64),(1,124),(1,195),(1,203),(1,220),(1,386),(1,402),(1,407),(1,472),(2,112),(2,117),(2,145),(2,172),(2,188),(2,320),(2,350),(2,418),(2,450),(2,471),(3,130),(3,149),(3,174),(3,192),(3,207),(3,231),(3,315),(3,343),(3,437),(3,474),(4,89),(4,114),(4,249),(4,257),(4,280),(4,384),(4,408),(4,470),(4,482),(4,496)"

  val lsh = "(0,24),(0,36),(0,56),(0,174),(0,292),(0,344),(0,377),(0,391),(0,420),(0,461),(1,13),(1,31),(1,165),(1,203),(1,217),(1,243),(1,285),(1,347),(1,402),(1,495),(2,33),(2,107),(2,125),(2,128),(2,149),(2,188),(2,226),(2,307),(2,339),(2,459),(3,111),(3,125),(3,172),(3,205),(3,224),(3,237),(3,419),(3,444),(3,468),(3,495),(4,13),(4,33),(4,274),(4,305),(4,307),(4,403),(4,417),(4,459)"

  val ivf = "(0,73),(0,190),(0,323),(0,334),(0,344),(0,365),(0,387),(0,388),(0,423),(0,498),(1,27),(1,64),(1,124),(1,195),(1,203),(1,363),(1,386),(1,402),(1,407),(1,472),(2,109),(2,117),(2,128),(2,197),(2,202),(2,239),(2,440),(2,450),(2,459),(2,471),(3,130),(3,174),(3,192),(3,231),(3,315),(3,343),(3,349),(3,363),(3,463),(3,474),(4,89),(4,114),(4,257),(4,280),(4,288),(4,346),(4,353),(4,384),(4,408),(4,482)"

  val pq = "(0,7),(0,36),(0,73),(0,229),(0,388),(0,398),(0,405),(0,423),(0,464),(0,498),(1,42),(1,64),(1,134),(1,271),(1,353),(1,370),(1,386),(1,477),(1,486),(1,495),(2,182),(2,187),(2,264),(2,320),(2,341),(2,351),(2,391),(2,410),(2,418),(2,449),(3,85),(3,98),(3,130),(3,132),(3,250),(3,287),(3,335),(3,396),(3,463),(3,477),(4,6),(4,81),(4,123),(4,181),(4,201),(4,219),(4,254),(4,276),(4,408),(4,423)"

  // sf0.1 sets (the dual-scale sweep corpus), dumped by the same tool
  // at SPARK_GRAFT_CPUS=16 — the sweep's session shape.
  val truth01 = "(0,142),(0,144),(0,291),(0,510),(0,794),(0,1020),(0,1204),(0,1407),(0,1511),(0,1978),(1,134),(1,173),(1,260),(1,665),(1,986),(1,1175),(1,1580),(1,1832),(1,1843),(1,1950),(2,123),(2,315),(2,337),(2,798),(2,953),(2,990),(2,1053),(2,1196),(2,1303),(2,1912),(3,263),(3,650),(3,720),(3,859),(3,930),(3,965),(3,1542),(3,1567),(3,1617),(3,1701),(4,76),(4,524),(4,660),(4,825),(4,913),(4,995),(4,1166),(4,1423),(4,1645),(4,1653)"

  val lsh01 = "(0,66),(0,178),(0,198),(0,602),(0,701),(0,999),(0,1097),(0,1590),(0,1883),(0,1978),(1,177),(1,276),(1,546),(1,590),(1,727),(1,1040),(1,1387),(1,1501),(1,1915),(1,1953),(2,235),(2,255),(2,462),(2,594),(2,673),(2,798),(2,925),(2,961),(2,1282),(2,1601),(3,29),(3,100),(3,148),(3,561),(3,842),(3,859),(3,921),(3,1281),(3,1478),(3,1913),(4,112),(4,207),(4,215),(4,430),(4,866),(4,1297),(4,1368),(4,1384),(4,1403),(4,1874)"

  val ivf01 = "(0,144),(0,291),(0,510),(0,1020),(0,1186),(0,1204),(0,1407),(0,1511),(0,1841),(0,1978),(1,134),(1,173),(1,260),(1,810),(1,986),(1,1159),(1,1580),(1,1711),(1,1843),(1,1950),(2,123),(2,315),(2,337),(2,848),(2,953),(2,990),(2,1053),(2,1196),(2,1303),(2,1912),(3,100),(3,173),(3,263),(3,551),(3,715),(3,937),(3,1062),(3,1542),(3,1567),(3,1617),(4,55),(4,76),(4,374),(4,524),(4,685),(4,913),(4,921),(4,1653),(4,1812),(4,1866)"

  val pq01 = "(0,84),(0,105),(0,464),(0,529),(0,597),(0,923),(0,1079),(0,1290),(0,1633),(0,1880),(1,135),(1,293),(1,299),(1,468),(1,953),(1,1176),(1,1308),(1,1453),(1,1630),(1,1879),(2,337),(2,340),(2,357),(2,378),(2,653),(2,700),(2,754),(2,903),(2,1738),(2,1972),(3,121),(3,173),(3,263),(3,466),(3,585),(3,763),(3,898),(3,930),(3,1046),(3,1725),(4,55),(4,641),(4,660),(4,1106),(4,1205),(4,1338),(4,1641),(4,1807),(4,1828),(4,1863)"

  /** The committed fixture sets, keyed by sf tag → set name. */
  val bySf: Map[String, Map[String, String]] = Map(
    "sf0.01" -> Map("truth" -> truth, "lsh" -> lsh, "ivf" -> ivf, "pq" -> pq),
    "sf0.1" -> Map("truth" -> truth01, "lsh" -> lsh01, "ivf" -> ivf01,
      "pq" -> pq01))

  /** x54-x56 oracle entries for the sf embedded in `sfDir`, or empty
    * when no fixture set is committed for it (the default sf0.01
    * entries then apply and an off-sf run mismatches — visibly, not
    * silently). Verify merges this over the static oracle map, so the
    * dual-scale sweep at sf0.1 hash-verifies the recall reports
    * against their own-scale pins.
    */
  def oracleOverridesFor(sfDir: String): Map[String, String] =
    "sf[0-9.]+".r.findAllIn(sfDir).toSeq.lastOption
      .flatMap(bySf.get).map { s =>
        Map(
          "x54_ann_lsh_recall" -> oracleSql(s("lsh"), s("truth")),
          "x55_ann_ivf_recall" -> oracleSql(s("ivf"), s("truth")),
          "x56_ann_pq_recall" -> oracleSql(s("pq"), s("truth")))
      }.getOrElse(Map.empty)

  /** DuckDB SQL recomputing the recallAtK report (query_id, k,
    * n_recalled, recall) from a pinned truth set and one pinned ANN
    * set — the same hit-count / coalesce / round arithmetic as the
    * Spark side, over VALUES instead of engine-specific indexes.
    */
  def oracleSql(annValues: String, truthValues: String = truth): String =
    s"WITH truth(query_id, neighbor_id) AS (VALUES $truthValues), " +
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
