package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted BM25 search index — the retrieval counterpart of
 * [[MinHashIndex]]: pay the corpus scan ONCE at build time, then
 * serve every query from term-bucketed postings without touching the
 * text again. Postings (`term, doc, tf, dl`) are partitioned by
 * `term_bucket = hash(term) % numBuckets`, so a query reads only its
 * terms' buckets (static partition pruning, ≤ |query| of numBuckets
 * directories) and the pushed `term IN (...)` filter trims inside
 * them; document frequencies and the final scores derive from the
 * pruned postings alone — a 3-term query over a 100 TB corpus reads
 * megabytes.
 *
 * The index is APPEND-ABLE by construction: new documents' postings
 * append into the same bucket dirs, and the stats table stores
 * additive (n, total_dl) rows — df and avgdl are derived at query
 * time, so appended docs are immediately searchable with correct
 * global statistics. Scores are exactly [[Ranking.bm25]]'s (same
 * formula, same Lucene-style idf; equality pinned in spec).
 */
object Bm25Index {

  private def normalize(queryTerms: Seq[String]): Seq[String] =
    queryTerms.flatMap(_.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+"))
      .filter(_.nonEmpty).distinct

  private def postingsOf(docs: DataFrame, idCol: String, textCol: String,
                         numBuckets: Int): DataFrame =
    docs
      .select(col(idCol), Ranking.tokens(col(textCol)).as("_t"))
      .select(col(idCol), size(col("_t")).as("dl"), explode(col("_t")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(numBuckets.toLong)))

  private def statsOf(docs: DataFrame, textCol: String, numBuckets: Int): DataFrame =
    docs.select(size(Ranking.tokens(col(textCol))).as("_dl"))
      .agg(count(lit(1)).as("n"), sum(col("_dl")).as("total_dl"))
      .withColumn("num_buckets", lit(numBuckets))

  /** Build the index at `path` (one corpus scan + one postings
    * shuffle — the indexing cost, paid once). */
  def write(docs: DataFrame, idCol: String, textCol: String, path: String,
            numBuckets: Int = 256): Unit = {
    postingsOf(docs, idCol, textCol, numBuckets)
      .write.partitionBy("term_bucket").mode(SaveMode.Overwrite)
      .parquet(s"$path/postings")
    statsOf(docs, textCol, numBuckets)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Append new documents (caller guarantees ids not already indexed —
    * the MinHashIndex/appendNewDocs composition is the dedup gate).
    * Postings land in the same bucket dirs; a new additive stats row
    * keeps n/total_dl correct for the next query. */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val numBuckets = readStats(docs.sparkSession, path)._3
    postingsOf(docs, idCol, textCol, numBuckets)
      .write.partitionBy("term_bucket").mode(SaveMode.Append)
      .parquet(s"$path/postings")
    statsOf(docs, textCol, numBuckets)
      .write.mode(SaveMode.Append).parquet(s"$path/stats")
  }

  private def readStats(spark: SparkSession, path: String): (Long, Long, Int) = {
    val rows = spark.read.parquet(s"$path/stats")
      .agg(sum("n"), sum("total_dl"), collect_set("num_buckets")).head()
    val buckets = rows.getSeq[Int](2)
    require(buckets.size == 1,
      s"bm25 index at $path has inconsistent num_buckets: $buckets")
    (rows.getLong(0), rows.getLong(1), buckets.head)
  }

  /** BM25 scores of every indexed document matching ≥ 1 query term —
    * identical to `Ranking.bm25(corpus, ...)` without reading the
    * corpus: the scan is pruned to the query terms' bucket dirs. */
  def scores(spark: SparkSession, path: String, queryTerms: Seq[String],
             idCol: String = "doc_id",
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = normalize(queryTerms)
    require(terms.nonEmpty, "bm25 index query needs at least one term")
    val (n, totalDl, numBuckets) = readStats(spark, path)
    require(n > 0, s"bm25 index at $path is empty")
    val avgdl = totalDl.toDouble / n
    // bucket ids through the same engine hash the writer used (one
    // local job for the whole term list)
    import spark.implicits._
    val buckets = terms.toDF("_t")
      .select(pmod(xxhash64(col("_t")), lit(numBuckets.toLong)))
      .collect().map(_.getLong(0)).toSeq.distinct
    val post = spark.read.parquet(s"$path/postings")
      .where(col("term_bucket").isInCollection(buckets) &&
        col("term").isInCollection(terms))
    val dfs = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0d) + (lit(n) - col("df") + 0.5d) / (col("df") + 0.5d))
    val tfNorm = (col("tf") * (k1 + 1.0d)) /
      (col("tf") + lit(k1) * (lit(1.0d) - b + lit(b) * col("dl") / avgdl))
    post.join(broadcast(dfs), "term")
      .select(col(idCol), (idf * tfNorm).as("_s"))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("bm25"))
  }

  /** Exact top-k (TakeOrdered — k-bounded on the driver). */
  def topK(spark: SparkSession, path: String, queryTerms: Seq[String], k: Int,
           idCol: String = "doc_id",
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scores(spark, path, queryTerms, idCol, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
}
