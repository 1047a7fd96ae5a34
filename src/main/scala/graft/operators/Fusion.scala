package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid-retrieval rank fusion — Reciprocal Rank Fusion (Cormack et
 * al. 2009), the standard way to combine BM25 and embedding-similarity
 * rankings without score calibration: each list contributes
 * 1/(c + rank) per document, so agreement across retrievers dominates
 * any single retriever's score scale. RRF is rank-only, which is what
 * makes it robust — BM25 scores and cosines live on incomparable
 * scales.
 *
 * Inputs are (id, score) frames from top-k-bounded retrievers
 * ([[Bm25Index.topK]], [[AnnSearch]] probes) — the ranking window is
 * deliberately global (unpartitioned) because fused lists are k-sized
 * BY CONTRACT; fusing unbounded corpus-wide score frames would funnel
 * the corpus through one reducer, and at that point the retriever,
 * not the fusion, is the bug. Ties rank deterministically
 * (score desc, id asc); callers fuse ROUNDED scores when the inputs
 * come from float arithmetic that must stay engine-reproducible.
 */
object Fusion {

  /** Fuse rankings: per-list rank → Σ 1/(c + rank), descending;
    * `n_lists` carries how many retrievers surfaced each doc. */
  def rrf(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
          k: Int, c: Double = 60.0): DataFrame = {
    require(rankings.nonEmpty, "rrf: at least one ranking")
    require(k > 0, s"rrf: k must be positive, got $k")
    val ranked = rankings.map { df =>
      df.select(col(idCol),
        row_number().over(
          Window.orderBy(col(scoreCol).desc, col(idCol).asc)).as("_rank"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(lit(1.0d) / (lit(c) + col("_rank"))).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
