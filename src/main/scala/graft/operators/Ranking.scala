package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lexical relevance ranking over a document corpus — BM25 (Okapi, with
 * the Lucene-style always-positive idf): the standard retrieval score
 * for search, RAG candidate generation and query-based corpus
 * curation ("find training documents about X").
 *
 * Scale design: the corpus NEVER shuffles, and the whole frame is
 * LAZY — constructing it launches no Spark job. Term frequency is a
 * per-document count, so it is computed ROW-LOCALLY in the scan
 * (counting each query term inside the token array with HOFs); what
 * leaves the scan is one row per (doc, matching term) — tf copies
 * fewer rows than exploding every occurrence. Those postings flow
 * through ONE shared shuffle: the same exchange feeds both the final
 * score and the per-term document frequencies (AQE shuffle-stage
 * reuse — the df subtree would otherwise re-scan the corpus), dfs
 * broadcast back onto postings, and the only other postings-sized
 * shuffle is the final per-doc sum. Corpus stats (N, avgdl) are a
 * lazy scalar aggregate attached via a broadcast one-row crossJoin —
 * a second (column-pruned) pass over the corpus. At real scale
 * N/avgdl are pipeline bookkeeping, not something to re-derive per
 * query: pass `corpusStats` and the plan is a strict single scan.
 * No UDFs — tokenization is `split`/`filter` HOFs, the score is
 * arithmetic on columns, all codegen'd.
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
   *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
   *   score(d,q) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
   *
   * `corpusStats` = Some((N, avgdl)) skips the stats pass entirely —
   * at 100 TB the corpus cardinality and average document length come
   * from pipeline bookkeeping (the same contract as Decontaminate's
   * `expectedShingles`), and the plan becomes a strict single scan.
   * `idCol` is assumed unique per document.
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           corpusStats: Option[(Long, Double)] = None): DataFrame = {
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
    // corpus stats: a LAZY one-row aggregate (exact integer sums on
    // both engines, so the division is bit-identical to the oracle's
    // avg) broadcast onto the postings below — or the caller's
    // bookkeeping numbers, which drop this subtree (and its
    // column-pruned second corpus pass) from the plan altogether.
    // An empty corpus yields empty postings, hence an empty result,
    // without any eager count.
    val stats = corpusStats match {
      case Some((n, avgdl)) =>
        // bad bookkeeping numbers (empty-corpus zeros, sign bugs) would
        // flow into the score arithmetic as Infinity/NaN — silently
        // wrong bm25, not an error. Fail here instead.
        require(n > 0 && avgdl > 0,
          s"corpusStats must have n > 0 and avgdl > 0, got (n=$n, avgdl=$avgdl)")
        docs.sparkSession.range(1).select(lit(n).as("_n"), lit(avgdl).as("_avgdl"))
      case None =>
        base.agg(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl"))
    }
    // postings with tf computed ROW-LOCALLY: term frequency is a
    // per-document count, so each doc counts every query term inside
    // its own token array (O(|query|*dl) inside codegen) — nothing
    // corpus-sized ever shuffles, and docs without any query term
    // emit nothing
    val matched = base
      .select(col(idCol), col("_dl"),
        explode(filter(
          transform(typedlit(terms),
            term => struct(term.as("term"),
              size(filter(col("_t"), x => x === term)).as("tf"))),
          e => e("tf") > 0)).as("_e"))
      .select(col(idCol), col("_dl"),
        col("_e")("term").as("term"), col("_e")("tf").as("tf"))
    // one postings-sized shuffle, shared: the no-op aggregate puts an
    // Exchange over the matched rows, and `dfs` below hangs off the
    // SAME exchange subtree, so AQE's shuffle-stage reuse computes the
    // scan once for both consumers (without it, the broadcast df
    // subtree would re-scan the corpus — measured, and pinned by the
    // single-scan spec)
    val postings = matched
      .groupBy(col(idCol), col("_dl"), col("term"))
      .agg(max(col("tf")).as("tf"))
    // df per query term: one row per term after a map-side-combined
    // tiny aggregate, broadcast back onto postings. The count
    // deliberately references tf — count(tf > 0) ≡ count(*) on rows
    // whose tf is always positive — so column pruning cannot rewrite
    // the shared aggregate differently under this branch, which would
    // break the exchange reuse above.
    val dfs = postings.groupBy(col("term"))
      .agg(count(when(col("tf") > 0, 1)).as("df"))
    // stale caller-supplied corpusStats hazard: the log argument
    // 1 + (n − df + 0.5)/(df + 0.5) = (n + 1)/(df + 0.5) is always
    // positive (no null-idf path exists), but df > n makes idf
    // NEGATIVE — the term silently SUBTRACTS from every score holding
    // it. df cannot exceed n when stats come from the scored corpus,
    // so a violation means the caller's stats are stale: fail loudly,
    // naming both numbers (r17 review, corrected by the meta-review)
    val idfArg = lit(1.0d) + (col("_n") - col("df") + 0.5d) / (col("df") + 0.5d)
    val idf = when(col("df") > col("_n"),
        raise_error(concat(lit("bm25: term df exceeds corpus n (stale corpusStats?): df="),
          col("df").cast("string"), lit(" n="), col("_n").cast("string"))))
      .otherwise(log(idfArg))
    val tfNorm = (col("tf") * (k1 + 1.0d)) /
      (col("tf") + lit(k1) * (lit(1.0d - b) + lit(b) * col("_dl") / col("_avgdl")))
    postings.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
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
