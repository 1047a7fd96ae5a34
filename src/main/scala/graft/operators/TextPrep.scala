package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-sequence preparation operators: PII scrubbing and
 * fixed-token-window document chunking. Both are pure compositions of
 * built-in (codegen'd) Spark SQL functions — no UDFs, no shuffle
 * beyond the explode in chunking — so they run per-row at scan speed
 * on any cluster size.
 */
object TextPrep {

  // ── PII scrubbing ─────────────────────────────────────────────────

  /** RE2-compatible patterns (no lookaround) for the common PII
    * classes a pre-training pipeline masks. Deliberately simple —
    * production pipelines layer NER on top; these catch the
    * high-volume mechanical classes. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** International-ish phone numbers: 7+ digits with separators, optional +CC. */
  val PhonePattern = "\\+?\\d[\\d\\s().-]{6,}\\d"
  /** 13–19 digit card-like runs with optional spaces/dashes between
    * digits (first/last char anchored as digits so no separator is
    * consumed around the match). */
  val CardPattern = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Mask emails/IPs/phones/card-like runs with typed placeholder tokens. */
  def scrubPii(text: Column,
               emailToken: String = "<EMAIL>",
               ipToken: String = "<IP>",
               phoneToken: String = "<PHONE>",
               cardToken: String = "<CARD>"): Column = {
    // order matters: cards before phones (a card number is also 13+
    // digits with separators), emails before phones (digits in
    // local parts must not be half-masked)
    val noEmail = regexp_replace(text, EmailPattern, emailToken)
    val noIp = regexp_replace(noEmail, Ipv4Pattern, ipToken)
    val noCard = regexp_replace(noIp, CardPattern, cardToken)
    regexp_replace(noCard, PhonePattern, phoneToken)
  }

  /** Count of PII matches per class (for corpus auditing/reporting). */
  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(EmailPattern), lit(0))).as("emails"),
      size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).as("ips"),
      size(regexp_extract_all(text, lit(PhonePattern), lit(0))).as("phones"),
      size(regexp_extract_all(text, lit(CardPattern), lit(0))).as("cards"))

  // ── fixed-token-window chunking ───────────────────────────────────

  /**
   * Split each document into whitespace-token windows of `maxTokens`
   * with `overlap` tokens of context carried between consecutive
   * chunks — the standard shape for packing long documents into
   * bounded training sequences. Output: one row per chunk with
   * `chunk_id` (0-based), `chunk_text`, `n_chunk_tokens`; empty/
   * whitespace-only docs produce zero chunks.
   *
   * Plan shape: tokens materialize once per doc, chunk starts come
   * from `sequence()`, and the explode is the only row multiplier —
   * no shuffle, no UDF; a 100 TB corpus chunks in one scan.
   */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
            maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap vs $maxTokens")
    val stride = maxTokens - overlap
    val withToks = docs
      .withColumn("_toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("_n", when(length(trim(col(textCol))) === 0, 0).otherwise(size(col("_toks"))))
    // chunk start positions (1-based for slice): 1, 1+stride, 1+2*stride, …
    val starts = when(col("_n") === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(1), greatest(col("_n") - overlap, lit(1)), lit(stride)))
    withToks
      .select(col("*"), posexplode(starts).as(Seq("chunk_id", "_start")))
      .withColumn("chunk_text", array_join(slice(col("_toks"), col("_start"), lit(maxTokens)), " "))
      .withColumn("n_chunk_tokens",
        least(col("_n") - col("_start") + 1, lit(maxTokens)).cast("int"))
      .drop("_toks", "_n", "_start")
  }
}
