package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L34: SemDeDup — hand-built geometry pins the cluster-local pair
  * contract, the keep-farthest-from-centroid representative rule, and
  * the sub-bucket guard for oversized clusters. */
class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal clusters in dim 4
  private val centroids = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0))

  private def emb(rows: (Long, Array[Float])*) = rows.toSeq.toDF("vec_id", "embedding")

  test("keeps the duplicate farthest from the centroid; distinct and other-cluster rows survive") {
    // ids 1,2,3 are colinear (cosine exactly 1) at growing distance
    // from centroid 0 — one group, keep id 3 (farthest). id 4 points
    // elsewhere in cluster 0; id 5 lives in cluster 1.
    val e = emb(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(2f, 0f, 0f, 0f),
      3L -> Array(3f, 0f, 0f, 0f),
      4L -> Array(0.8f, 0.1f, 0.6f, 0f),
      5L -> Array(0f, 1f, 0f, 0f))
    val kept = SemDeDup.dedup(e, "embedding", "vec_id", centroids, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L), s"kept $kept")
  }

  test("dropList is the exact complement of dedup survivors") {
    val e = emb(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(2f, 0f, 0f, 0f),
      3L -> Array(3f, 0f, 0f, 0f),
      4L -> Array(0.8f, 0.1f, 0.6f, 0f),
      5L -> Array(0f, 1f, 0f, 0f))
    val dropped = SemDeDup.dropList(e, "embedding", "vec_id", centroids, threshold = 0.99)
      .as[Long].collect().toSet
    val kept = SemDeDup.dedup(e, "embedding", "vec_id", centroids, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(dropped == Set(1L, 2L), s"dropped $dropped")
    assert((dropped & kept).isEmpty && (dropped | kept) == Set(1L, 2L, 3L, 4L, 5L),
      s"dropList must partition the corpus: dropped=$dropped kept=$kept")
  }

  test("pairs are cluster-local and carry exact cosine; cross-cluster near-pairs are NOT compared") {
    // ids 1 and 2 are nearly identical but straddle the two centroids —
    // SemDeDup's contract is cluster-local comparison, so no pair
    val e = emb(
      1L -> Array(0.71f, 0.70f, 0f, 0f),
      2L -> Array(0.70f, 0.71f, 0f, 0f),
      3L -> Array(1f, 0f, 0f, 0f))
    val assigned = Clustering.assign(e, "embedding", centroids)
    val pairs = SemDeDup.dupPairs(assigned, "embedding", "vec_id", threshold = 0.9)
      .collect()
    assert(pairs.isEmpty, s"cross-cluster members must not pair: ${pairs.mkString(",")}")
    // and within a cluster the cosine is the exact rounded value
    val e2 = emb(1L -> Array(1f, 0f, 0f, 0f), 2L -> Array(1f, 1f, 0f, 0f))
    val p2 = SemDeDup.dupPairs(Clustering.assign(e2, "embedding", centroids),
      "embedding", "vec_id", threshold = 0.5).collect()
    assert(p2.length == 1)
    assert(math.abs(p2.head.getAs[Double]("cosine") - 0.707107) < 1e-6)
  }

  test("oversized clusters sub-split without ever separating identical embeddings") {
    // 40 bit-identical vectors + maxClusterSize = 1 forces maximal
    // sub-bucketing; identical vectors share every LSH bucket, so all
    // still collapse to ONE survivor
    val e = emb((1L to 40L).map(i => i -> Array(1f, 0f, 0f, 0f)): _*)
    val kept = SemDeDup.dedup(e, "embedding", "vec_id", centroids,
      threshold = 0.999, maxClusterSize = 1)
      .select("vec_id").as[Long].collect().toSeq
    // equal dist2 everywhere -> tie-break keeps the lowest id
    assert(kept == Seq(1L), s"identical embeddings must collapse to one survivor: $kept")
  }

  test("replicated corpus: identity copies collapse pre-join; semantic rule runs on representatives") {
    // 5 copies each of two colinear vectors: identity pre-grouping
    // must feed only the 2 representatives to the pair join (1 pair,
    // not 45), and the semantic keep-farthest rule then picks the
    // b-representative (dist2 1 vs 0)
    val e = emb(
      ((1L to 5L).map(i => i -> Array(1f, 0f, 0f, 0f)) ++
        (6L to 10L).map(i => i -> Array(2f, 0f, 0f, 0f))): _*)
    val kept = SemDeDup.dedup(e, "embedding", "vec_id", centroids, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSeq
    assert(kept == Seq(6L), s"one survivor, the far representative: $kept")
  }

  test("empty corpus: no pairs, no crash, empty result") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val assigned = Clustering.assign(empty, "embedding", centroids)
    assert(SemDeDup.dupPairs(assigned, "embedding", "vec_id", threshold = 0.9).count() == 0)
    assert(SemDeDup.dedup(empty, "embedding", "vec_id", centroids).count() == 0)
  }

  test("string document ids survive the representative tie-break") {
    // equal dist2 everywhere — the tie-break must order the STRING ids
    // themselves (negating them would cast to null and drop nothing)
    val e = Seq(
      "a" -> Array(1f, 0f, 0f, 0f),
      "b" -> Array(1f, 0f, 0f, 0f),
      "c" -> Array(1f, 0f, 0f, 0f)).toDF("doc", "embedding")
    val kept = SemDeDup.dedup(e, "embedding", "doc", centroids, threshold = 0.999)
      .select("doc").as[String].collect().toSeq
    assert(kept == Seq("a"), s"lowest string id must win the tie: $kept")
  }

  test("broadcast gate: above the cap the drop list takes the shuffle path with identical survivors") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    // the mass-replicated fixture: 10 ids, 2 identity groups → drop
    // bound = 8 copies + 2 reps = 10
    val e = emb(
      ((1L to 5L).map(i => i -> Array(1f, 0f, 0f, 0f)) ++
        (6L to 10L).map(i => i -> Array(2f, 0f, 0f, 0f))): _*)
    def antiHint(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftAnti => j.hint.rightHint
      }
    val over = SemDeDup.dedup(e, "embedding", "vec_id", centroids,
      threshold = 0.99, maxBroadcastIds = 9L) // bound 10 > 9 → fallback
    assert(antiHint(over).forall(_.forall(_.strategy.isEmpty)),
      "above the cap the anti join must not force a broadcast")
    assert(over.select("vec_id").as[Long].collect().toSeq == Seq(6L),
      "fallback plan must keep the same survivors")
    val under = SemDeDup.dedup(e, "embedding", "vec_id", centroids,
      threshold = 0.99, maxBroadcastIds = 10L) // bound 10 <= 10 → broadcast
    assert(antiHint(under).exists(_.exists(_.strategy.isDefined)),
      "within the cap the drop list must carry the broadcast hint")
    assert(under.select("vec_id").as[Long].collect().toSeq == Seq(6L))
  }

  test("laziness: dupPairs with known dim launches ZERO jobs; the gate aggregate only runs when enabled") {
    val e = emb(1L -> Array(1f, 0f, 0f, 0f), 2L -> Array(2f, 0f, 0f, 0f))
    val assigned = Clustering.assign(e, "embedding", centroids)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def countJobs(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      try { jobs.set(0); body; Thread.sleep(500); jobs.get() }
      finally spark.sparkContext.removeSparkListener(listener)
    }
    // the r9 verdict's ask: no dim probe when the caller knows dim
    val pairJobs = countJobs {
      SemDeDup.dupPairs(assigned, "embedding", "vec_id", threshold = 0.9, dim = 4)
    }
    assert(pairJobs == 0, s"dupPairs with known dim must be lazy; launched $pairJobs job(s)")
    // dedup construction necessarily runs the connected-components
    // rounds (iterative, documented); the gate must be the ONLY
    // difference between the skip paths and the gated path
    val skipJobs = countJobs {
      SemDeDup.dedup(e, "embedding", "vec_id", centroids, threshold = 0.9,
        maxBroadcastIds = Long.MaxValue)
    }
    val shuffleJobs = countJobs {
      SemDeDup.dedup(e, "embedding", "vec_id", centroids, threshold = 0.9,
        maxBroadcastIds = 0L)
    }
    val gatedJobs = countJobs {
      SemDeDup.dedup(e, "embedding", "vec_id", centroids, threshold = 0.9,
        maxBroadcastIds = 5L)
    }
    assert(skipJobs == shuffleJobs,
      s"both gate-skip paths must cost the same: $skipJobs vs $shuffleJobs")
    assert(gatedJobs > skipJobs,
      s"the enabled gate must add its aggregate job: gated=$gatedJobs skip=$skipJobs")
  }

  test("real embeddings: dedup is idempotent and only removes grouped members") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Clustering.fit(e, "embedding", k = 4, iters = 3)
    val once = SemDeDup.dedup(e, "embedding", "vec_id", cents, threshold = 0.995)
    val n0 = e.count(); val n1 = once.count()
    assert(n1 > 0 && n1 <= n0)
    val twice = SemDeDup.dedup(once, "embedding", "vec_id", cents, threshold = 0.995)
    assert(twice.count() == n1, "second pass must remove nothing new")
  }

  test("fitAndDropList: overlapped fit+identity composes to the sequential result (r21)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Clustering.fit(e, "embedding", k = 4, iters = 3)
    val seqDrop = SemDeDup.dropList(e, "embedding", "vec_id", cents, threshold = 0.995)
      .as[Long].collect().toSet
    val (cents2, drop2) = SemDeDup.fitAndDropList(e, "embedding", "vec_id",
      k = 4, iters = 3, threshold = 0.995)
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq,
      "the overlapped fit must produce bit-identical centroids")
    assert(drop2.as[Long].collect().toSet == seqDrop,
      "the overlapped drop list must equal the sequential one")
    val kept = SemDeDup.dedupWithFit(e, "embedding", "vec_id",
      k = 4, iters = 3, threshold = 0.995).count()
    assert(kept == e.count() - seqDrop.size,
      "dedupWithFit must prune exactly the drop list")
  }
}
