package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.TokenizerQueries
import graft.queries.TokenizerQueries.Merge

/** Persisted-model form of the `text_bpe_train` tokenizer — the
  * production loop where training and encoding are separate jobs (the
  * `QualityModelTrainer` / `KMeansTrainer` → `AnnIndex` discipline,
  * applied to tokenization): fit the merge table once on a corpus,
  * persist it beside the data, and encode any later shard by loading it.
  *
  * The merge list is bounded metadata (≤ maxMerges rows) and the encode
  * is a pure expression — a merge-deep codegen'd `replace` chain over the
  * space-joined word stream — so a loaded tokenizer embeds in any plan
  * (batch or streaming micro-batch) as literals, with no join and no
  * state. `expansions` maps each learned token symbol back to its
  * human-readable string; concatenating a word's expanded tokens
  * reconstructs the word exactly (the round-trip `BpeTokenizerSpec`
  * pins).
  */
object BpeTokenizer {

  /** Train on `docs` (doc_id: Long, text: String). The merge loop runs
    * on the vocab-sized word-frequency table; see TokenizerQueries. */
  def train(spark: SparkSession, docs: DataFrame,
            maxMerges: Int = TokenizerQueries.Merges): Seq[Merge] = {
    docs.createOrReplaceTempView("documents")
    TokenizerQueries.trainMergesOnView(spark, maxMerges)
  }

  /** Persist the merge table (ordered; merge_idx is the application
    * order and is part of the model — applying merges in any other
    * order is a different tokenizer). */
  def save(spark: SparkSession, merges: Seq[Merge], dir: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.idx, m.pair, m.merged, m.count))
      .toDF("merge_idx", "pair", "merged", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
  }

  def load(spark: SparkSession, dir: String): Seq[Merge] =
    spark.read.parquet(s"$dir/merges")
      .collect()
      .map(r => Merge(r.getAs[Int]("merge_idx"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .sortBy(_.idx).toSeq

  /** The encode chain as a SQL expression over a column holding the
    * space-joined lowercase word stream — a direct delegation to the
    * catalog query's one shared spelling (TokenizerQueries.encodeExpr),
    * so tool and query cannot drift. */
  def encodeExpr(merges: Seq[Merge], joinedCol: String): String =
    TokenizerQueries.encodeExpr(merges, joinedCol)

  /** Human-readable expansion of every token symbol the model can emit:
    * merged symbols expand through their pair, recursively; base
    * characters expand to themselves (and are omitted here). */
  def expansions(merges: Seq[Merge]): Map[String, String] =
    merges.foldLeft(Map.empty[String, String]) { (acc, m) =>
      val expanded = m.pair.map(c => acc.getOrElse(c.toString, c.toString)).mkString
      acc + (m.merged -> expanded)
    }

  /** Encode (doc_id, text) rows: (doc_id, tokens ARRAY<STRING> — each
    * token EXPANDED to its surface string — and n_tokens). One narrow
    * map; the merge chain and the expansion map ride the plan as
    * literals. */
  def encode(spark: SparkSession, docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    docs.createOrReplaceTempView("bpe_encode_in")
    val exp = expansions(merges)
    val expandChar =
      if (exp.isEmpty) "c"
      else {
        val mapLit = exp.toSeq.sortBy(_._1)
          .map { case (k, v) => s"'$k', '$v'" }.mkString("map(", ", ", ")")
        s"coalesce(element_at($mapLit, c), c)"
      }
    spark.sql(
      s"""SELECT doc_id,
         |       filter(flatten(transform(split(enc, ' '), w ->
         |         transform(split(w, ''), c -> $expandChar))), t -> t != '') AS tokens,
         |       CAST(length(replace(enc, ' ', '')) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id,
         |             ${encodeExpr(merges, "concat_ws(' ', regexp_extract_all(lower(text), '[a-z]+', 0))")} AS enc
         |      FROM bpe_encode_in)""".stripMargin)
  }
}
