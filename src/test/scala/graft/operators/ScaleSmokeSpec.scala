package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Slow-suite tag: exclude with `sbt "testOnly -- -l graft.Slow"`. */
object Slow extends Tag("graft.Slow")

/**
 * 10× scale smoke: the sf0.001 documents corpus replicated 10× (the
 * mass-duplication regime of an uncurated crawl) through the dedup
 * family, pinning the ADAPTIVE plan choices so they can't silently
 * regress — the thresholds are unit-pinned via `DupPlan.choose` and
 * the heavy branch is exercised end-to-end with a transitive-
 * completeness check on its star pairs.
 */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  /** 10 bit-identical copies of every document, disjoint id ranges. */
  private lazy val docs10x = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
    .reduce(_ unionByName _)
    .cache()

  test("DupPlan thresholds: none / broadcast-stars / pre-group regimes") {
    import Dedup.DupPlan
    assert(DupPlan.choose(0, 0, 1000000) == DupPlan.NoDups)
    // 1% duplicate rows, few groups: bands run on the full corpus
    assert(DupPlan.choose(10000, 5000, 1000000) == DupPlan.BroadcastStars)
    // 90% duplicate rows: buckets would flood -> pre-group
    assert(DupPlan.choose(900000, 90000, 1000000) == DupPlan.PreGroup)
    // few dup rows but an un-broadcastable group count -> pre-group
    assert(DupPlan.choose(200001, Dedup.MaxBroadcastDupGroups + 1, 100000000) == DupPlan.PreGroup)
    // boundary: exactly 5% dup rows is NOT light anymore
    assert(DupPlan.choose(50000, 1000, 1000000) == DupPlan.PreGroup)
  }

  test("10x corpus lands in the pre-group regime", Slow) {
    val keyed = docs10x.select(col("doc_id"), xxhash64(col("text")).as("_k"))
    val (dupRows, nGroups, totalRows, _) = Dedup.dupGroupsOf(keyed)
    assert(totalRows == docs10x.count())
    assert(dupRows >= totalRows * 8 / 10, s"expected ~90% dup rows, got $dupRows/$totalRows")
    assert(Dedup.DupPlan.choose(dupRows, nGroups, totalRows) == Dedup.DupPlan.PreGroup)
  }

  test("minhash at 10x: star pairs keep dup groups transitively complete", Slow) {
    val pairs = Dedup.minhashCandidates(docs10x, "text", "doc_id").cache()
    // every replica pairs (directly or via its group rep) with the
    // group's minimum id: reps are the base ids, so each base doc
    // yields >= 9 star pairs — spot-check a sample of groups
    val sample = docs.select("doc_id").as[Long].head(20)
    val byRep = pairs.where(col("id_a").isin(sample: _*))
      .groupBy("id_a").agg(countDistinct("id_b").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { id =>
      assert(byRep.getOrElse(id, 0L) >= 9L,
        s"doc $id: expected >= 9 star partners for 10 copies, got ${byRep.getOrElse(id, 0L)}")
    }
    pairs.unpersist()
  }

  test("exact dedup at 10x keeps exactly one copy per distinct text", Slow) {
    val deduped = Dedup.exact(docs10x, "text", "doc_id")
    val base = docs.count()
    assert(deduped.count() == base,
      s"10x corpus must dedup back to the $base distinct texts")
    // and the kept ids are the group minima (deterministic winner)
    val kept = deduped.select("doc_id").as[Long].collect().toSet
    val want = docs.select("doc_id").as[Long].collect().toSet
    assert(kept == want, "exact dedup must keep the minimum id of each group")
  }

  test("substring dedup at 10x: every replica span cut, keep-first survives, bounded state", Slow) {
    // the mass-duplication worst case for the occurrence shuffle:
    // EVERY window of every doc repeats >= 10 times, so the flagged
    // set is the whole window universe and every non-first replica
    // rebuilds to empty — the per-window aggregation state must stay
    // O(1) (count + one (id,pos) struct) for this to finish at all
    val out = TextPrep.dedupTokenWindows(docs10x, "doc_id", "text", windowSize = 8)
      .cache()
    assert(out.count() == docs10x.count(), "every input doc gets an output row")
    // base docs (lowest ids) keep their text; replicas lose all
    // windows they share with the first occurrence
    val base = out.where(col("doc_id") < 1000000)
    val replicas = out.where(col("doc_id") >= 1000000)
    val baseDropped = base.agg(sum("n_dropped")).head().getLong(0)
    val repKept = replicas.where(length(col("text_clean")) > 0).count()
    // base docs may still lose spans they share with OTHER base docs
    // (accidental near-dups) and sub-window docs pass through by
    // contract, but replicas of real docs must lose essentially
    // everything: >= 80% of replica docs rebuild empty
    assert(repKept <= replicas.count() / 5,
      s"replicas must be gutted by keep-first: $repKept of ${replicas.count()} kept text")
    assert(baseDropped < docs10x.agg(sum(size(split(col("text"), " ")))).head().getLong(0) / 10,
      "base docs keep the bulk of their tokens")
    out.unpersist()
  }

  test("embedding dedup at 10x picks the pre-group path and stars carry cosine 1", Slow) {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val emb10x = (0 until 10).map(i =>
        emb.select((col("vec_id") + lit(i * 1000000)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val pairs = EmbedDedup.nearDupPairs(emb10x, "embedding", "vec_id", threshold = 0.99)
    // each base vector's 10 bit-identical copies produce 9 star pairs
    // at cosine exactly 1.0
    val zero = pairs.where(col("id_a") === 0).collect()
    assert(zero.length >= 9, s"expected >= 9 partners for vec 0, got ${zero.length}")
    assert(zero.forall(_.getDouble(2) == 1.0d), "identical-vector stars must carry cosine 1")
  }

  test("domain cap at 10x mega-domain skew: minority path, exact cap, tail untouched", Slow) {
    // crawl shape: ONE domain holds half the corpus, a long tail holds
    // the rest — the regime the two-pass cap exists for
    val withUrl = docs10x.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit("https://megafarm.com/p/"))
        .otherwise(concat(lit("https://site"), col("doc_id") % 5000, lit(".org/p/")))
        .as("_u"))
      .select(col("doc_id"), concat(col("_u"), col("doc_id")).as("url"))
    val total = withUrl.count()
    val capped = UrlCuration.capPerDomain(withUrl, "url", "doc_id", maxPerDomain = 100)
    val byDom = capped
      .withColumn("d", UrlCuration.registeredDomain(UrlCuration.urlHost(col("url"))))
      .groupBy("d").count()
    val mega = byDom.where(col("d") === "megafarm.com").head().getLong(1)
    assert(mega == 100L, s"mega-domain trimmed to exactly the cap: $mega")
    // the tail (odd ids -> 2500 distinct site<k>.org domains, each far
    // under the cap) passes whole
    val megaTotal = withUrl.where(col("doc_id") % 2 === 0).count()
    val tailDocs = byDom.where(col("d") =!= "megafarm.com")
      .agg(sum("count")).head().getLong(0)
    assert(tailDocs == total - megaTotal,
      s"under-cap tail must pass untouched: $tailDocs of ${total - megaTotal}")
  }
}
