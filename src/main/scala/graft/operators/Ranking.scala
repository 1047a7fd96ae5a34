package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lexical relevance ranking over a document corpus — BM25 (Okapi, with
 * the Lucene-style always-positive idf): the standard retrieval score
 * for search, RAG candidate generation and query-based corpus
 * curation ("find training documents about X").
 *
 * Scale design: the corpus NEVER shuffles. Tokenization and document
 * length are per-row expressions computed in the same scan that
 * explodes tokens; the explode is immediately filtered to the query's
 * terms, so the only corpus-sized work is that one scan — what
 * survives (the query-term postings) is a tiny fraction of the data,
 * and every aggregate/join after it runs on postings: tf per
 * (doc, term), document frequencies (≤ |query| rows, broadcast back),
 * and the final per-doc sum. Corpus statistics (N, average length)
 * are one scalar aggregate. No UDFs — tokenization is
 * `split`/`filter` HOFs, the score is arithmetic on columns, all
 * codegen'd.
 */
object Ranking {

  /** The one tokenization boundary — shared by the corpus column path
    * and the driver-side query normalization so the two can never
    * drift apart. */
  private val TokenSeparator = "[^a-z0-9]+"

  /** Lower-cased alphanumeric tokens as an array column (empty strings
    * from consecutive separators filtered out). */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenSeparator), t => t =!= "")

  /**
   * BM25 scores of every document containing at least one query term:
   * (idCol, bm25). k1 tunes term-frequency saturation, b the
   * length normalization — the universal defaults 1.2 / 0.75.
   *
   *   idf(t)     = ln(1 + (N − df + 0.5) / (df + 0.5))
   *   score(d,q) = Σₜ idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the query rides the SAME normalization as the corpus — a raw
    // "Vector-Search" must match the tokens it would produce, not
    // silently compare unequal against lowercased corpus tokens.
    // Locale.ROOT: Spark's lower() is locale-independent; a tr-TR
    // default locale would dotless-i "INDEX" into a never-matching term
    val terms = queryTerms
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split(TokenSeparator))
      .filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("_t"))
      .select(col(idCol), size(col("_t")).as("_dl"), col("_t"))
    // corpus stats: one scalar aggregate (exact integer sums on both
    // engines, so the division is bit-identical to the oracle's avg)
    val stats = base.agg(count(lit(1)).as("n"), avg(col("_dl")).as("avgdl")).head()
    val n = stats.getLong(0)
    // empty corpus: avg is null — the natural result is no scores
    if (n == 0L)
      return docs.select(col(idCol), lit(0.0d).as("bm25")).where(lit(false))
    val avgdl = stats.getDouble(1)
    // postings: explode filtered to the query terms BEFORE any
    // aggregation — the groupBy shuffles only matching (id, dl, term)
    // rows, never the corpus
    val postings = base
      .select(col(idCol), col("_dl"), explode(col("_t")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("_dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df per query term: ≤ |query| rows, broadcast back onto postings
    val dfs = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0d) + (lit(n.toDouble) - col("df") + 0.5d) / (col("df") + 0.5d))
    val tfNorm = (col("tf") * (k1 + 1.0d)) /
      (col("tf") + lit(k1) * (lit(1.0d - b) + lit(b) * col("_dl") / avgdl))
    postings.join(broadcast(dfs), "term")
      .select(col(idCol), (idf * tfNorm).as("_s"))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("bm25"))
  }

  /** Top-k documents for a query: bounded TakeOrdered, deterministic
    * tie-break on id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
}
