package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The PPJoin positional filter's predicate, exercised directly on
  * crafted (size, prefix-position) layouts: the fixture corpora never
  * trigger it (their qualifying pairs share EARLY prefix tokens — the
  * dd_prefix_stats audit shows prefix_pairs == positional_pairs ==
  * qualifying_pairs), so this spec is the evidence the filter FIRES when
  * a common prefix token leaves too little remaining overlap, and never
  * fires when the remaining overlap can still reach the α = ⌈(n+m)/3⌉
  * threshold. Over-pruning is separately excluded by the oracle equality
  * of dd_prefix_jaccard against the naive all-pairs definition at both
  * SFs. */
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
        |HAVING max(least(a.n - a.rn, b.n - b.rn) + 1)
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

  test("the BEST common token's bound decides, not the worst") {
    // Pair shares two tokens: one late (bound 21 < 27) and one early
    // (bound 40 ≥ 27) — the max-over-witnesses semantics must keep it.
    val rows = Seq(
      (1L, "late", 20L, 40L), (2L, "late", 20L, 40L),
      (1L, "early", 1L, 40L), (2L, "early", 1L, 40L))
    assert(surviving(rows) === Set((1L, 2L)))
  }

  test("asymmetric sizes: the smaller remaining side bounds the overlap") {
    // n=40, m=10: α = ceil(50/3) = 17. Common token at rn 1 in both:
    // bound min(39, 9)+1 = 10 < 17 → prune (a 10-set can never reach
    // overlap 17 anyway — the size filter folded into the position math).
    val rows = Seq((1L, "t", 1L, 40L), (2L, "t", 1L, 10L))
    assert(surviving(rows) === Set.empty[(Long, Long)])
  }
}
