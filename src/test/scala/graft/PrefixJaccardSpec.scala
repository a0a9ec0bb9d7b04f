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
}
