package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The PPJoin candidate-filter predicates — the positional (first shared
  * prefix token) bound and the PPJoin+-style suffix-slot bound
  * (cnt shared prefix tokens + remaining slots after the LAST one) —
  * exercised directly on crafted (size, prefix-position) layouts: the
  * fixture corpora rarely trigger them (their qualifying pairs share
  * EARLY prefix tokens — the dd_prefix_stats audit measures each stage),
  * so this spec is the evidence each bound FIRES when a shared token
  * layout leaves too little remaining overlap to reach α = ⌈(n+m)/3⌉,
  * and never fires when the overlap can still reach it. Over-pruning is
  * separately excluded by the oracle equality of dd_prefix_jaccard
  * against the naive all-pairs definition at both SFs. */
class PrefixJaccardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("prefix-jaccard")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Run the exact cand-CTE shape over a hand-built prefix relation. */
  private def surviving(rows: Seq[(Long, String, Long, Long)]): Set[(Long, Long)] = {
    val ss = spark; import ss.implicits._
    rows.toDF("doc_id", "g", "rn", "n").createOrReplaceTempView("prefix_t")
    spark.sql(
      """SELECT a.doc_id AS d1, b.doc_id AS d2
        |FROM prefix_t a JOIN prefix_t b
        |  ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n, b.n
        |HAVING least(max(least(a.n - a.rn, b.n - b.rn)) + 1,
        |             count(*) + least(a.n - max(a.rn), b.n - max(b.rn)))
        |       >= (a.n + b.n + 2) div 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("a late-prefix-only match is pruned; an early match at the same sizes is not") {
    // Sets of 40 tokens: α = ceil(80/3) = 27.
    // Pair (1,2): only common token at position 20 in both — remaining
    // overlap bound min(20,20)+1 = 21 < 27 → PRUNE.
    // Pair (3,4): common token at position 1 — bound min(39,39)+1 = 40
    // ≥ 27 → keep for verification.
    val rows = Seq(
      (1L, "late", 20L, 40L), (2L, "late", 20L, 40L),
      (3L, "early", 1L, 40L), (4L, "early", 1L, 40L))
    assert(surviving(rows) === Set((3L, 4L)))
  }

  test("the suffix-slot bound prunes what the positional bound alone would keep") {
    // Pair (1,2) shares two tokens at ranks 1 and 20 (n = 40 each,
    // α = 27). Positional (first-token) bound: min(39,39)+1 = 40 ≥ 27 —
    // kept by PPJoin alone. Suffix-slot bound: every OTHER common token
    // must rank after the last shared prefix token on both sides, so
    // overlap ≤ 2 + min(40−20, 40−20) = 22 < 27 → prune, and the prune
    // is provably safe (22 is a true upper bound on the overlap).
    // Pair (3,4) shares two EARLY tokens (ranks 1, 2): suffix-slot bound
    // 2 + 38 = 40 ≥ 27 — two witnesses must tighten only when the last
    // one sits deep.
    val rows = Seq(
      (1L, "late", 20L, 40L), (2L, "late", 20L, 40L),
      (1L, "early", 1L, 40L), (2L, "early", 1L, 40L),
      (3L, "e1", 1L, 40L), (4L, "e1", 1L, 40L),
      (3L, "e2", 2L, 40L), (4L, "e2", 2L, 40L))
    assert(surviving(rows) === Set((3L, 4L)))
  }

  test("asymmetric sizes: the smaller remaining side bounds the overlap") {
    // n=40, m=10: α = ceil(50/3) = 17. Common token at rn 1 in both:
    // bound min(39, 9)+1 = 10 < 17 → prune (a 10-set can never reach
    // overlap 17 anyway — the size filter folded into the position math).
    val rows = Seq((1L, "t", 1L, 40L), (2L, "t", 1L, 10L))
    assert(surviving(rows) === Set.empty[(Long, Long)])
  }

  /** Run the depth-1 suffix-probe CTEs (the exact text dd_prefix_jaccard
    * executes) over a hand-built ranked relation + cand0 pair list. */
  private def probeSurvivors(ranked: Seq[(Long, String, Long, Long)],
      cand0: Seq[(Long, Long, Long, Long, Long, Long, Long, Long)]): Set[(Long, Long)] = {
    val ss = spark; import ss.implicits._
    ranked.toDF("doc_id", "g", "df", "rn").createOrReplaceTempView("ranked_probe_t")
    cand0.toDF("d1", "d2", "n1", "n2", "cnt", "px", "py", "alpha")
      .createOrReplaceTempView("cand0_probe_t")
    spark.sql(
      s"""WITH ranked AS (SELECT * FROM ranked_probe_t),
         |cand0 AS (SELECT * FROM cand0_probe_t),
         |${graft.queries.DedupQueries.suffixProbe("div")}
         |SELECT d1, d2 FROM cand""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("the suffix probe prunes order-disjoint tails the slot bound keeps") {
    // Both pairs: n = 11 each, shared token at rn 1, cnt = 1,
    // α = ⌈22/3⌉ = 8, slot bound cnt + min(10, 10) = 11 ≥ 8 — the
    // pre-probe cascade keeps BOTH. Pair (1,2): x's tail is a01..a10,
    // y's tail is z01..z10 (same df, disjoint, all a.. < all z.. in the
    // (df, g) order) → median z05, xl=10, xr=0, m∉x →
    // H₁ = |10−4| + |0−5| + 1 = 12, bound 1 + (20−12)/2 = 5 < 8 →
    // PRUNED, and provably safely (true overlap is 1). Pair (3,4):
    // identical tails c01..c10 → H₁ = 0, bound 1 + 10 = 11 ≥ 8 → kept
    // (true overlap 11 — a genuine duplicate).
    def tail(doc: Long, p: String) =
      (1 to 10).map(i => (doc, f"$p$i%02d", 5L, 1L + i))
    val ranked =
      Seq((1L, "s", 2L, 1L), (2L, "s", 2L, 1L),
        (3L, "t", 2L, 1L), (4L, "t", 2L, 1L)) ++
        tail(1L, "a") ++ tail(2L, "z") ++ tail(3L, "c") ++ tail(4L, "c")
    val cand0 = Seq(
      (1L, 2L, 11L, 11L, 1L, 1L, 1L, 8L),
      (3L, 4L, 11L, 11L, 1L, 1L, 1L, 8L))
    assert(probeSurvivors(ranked, cand0) === Set((3L, 4L)))
  }

  test("a fully-consumed y side skips the probe and survives on its slot bound") {
    // py = n2: y has no unseen tokens, so overlap is already exactly cnt
    // and the pair reached cand0 only because cnt ≥ α held — the probe
    // must pass it through unchanged, not drop it for lack of a median.
    val ranked = Seq((5L, "u", 2L, 1L), (6L, "u", 2L, 1L))
    val cand0 = Seq((5L, 6L, 4L, 3L, 2L, 2L, 3L, 2L))
    assert(probeSurvivors(ranked, cand0) === Set((5L, 6L)))
  }

  test("an empty x tail bounds the after-overlap at zero") {
    // x fully consumed (px = n1), y has 6 unseen tokens: xl = xr = xm =
    // 0, H₁ = yl + yr + 1 = uy → after-bound (ux + uy − uy)/2 = 0, so
    // the pair survives iff cnt ≥ α. cnt = 3, α = 4 → pruned even
    // though the slot bound cnt + min(0, 6) = 3... is also < α; raise
    // the slot entry artificially (cand0 is fed directly) to prove the
    // PROBE itself computes 3 + 0 < 4.
    val ranked = Seq((7L, "v", 2L, 1L)) ++
      (1 to 6).map(i => (8L, f"w$i%02d", 5L, i.toLong + 1))
    val cand0 = Seq((7L, 8L, 3L, 7L, 3L, 3L, 1L, 4L))
    assert(probeSurvivors(ranked, cand0) === Set.empty[(Long, Long)])
  }
}
