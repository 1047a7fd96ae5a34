package graft.expr

import graft.SparkSpec
import graft.operators.VectorMath
import org.apache.spark.sql.functions._

/** Native CosineSimilarity expression: parity with the HOF
  * formulation, codegen, SQL registration, null/edge handling. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { GraftFunctions.ensure(spark); () }

  test("matches driver-side double ground truth; close to the HOF formulation") {
    registered()
    val rnd = new scala.util.Random(3)
    val vecs = (1 to 50).map(i => (i,
      Array.fill(32)(rnd.nextGaussian().toFloat),
      Array.fill(32)(rnd.nextGaussian().toFloat)))
    def truth(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val df = vecs.toDF("i", "a", "b")
    val got = df.select(col("i"), VectorMath.cosineFast(col("a"), col("b")).as("c"))
      .as[(Int, Double)].collect().toMap
    vecs.foreach { case (i, a, b) =>
      assert(math.abs(got(i) - truth(a, b)) < 1e-12, s"vec $i diverges from ground truth")
    }
    // the HOF version accumulates in float for the products — it is the
    // LESS precise one; they agree to float precision
    val hofDiff = df.select(abs(VectorMath.cosine(col("a"), col("b")) -
        VectorMath.cosineFast(col("a"), col("b"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(hofDiff < 1e-6, s"HOF divergence $hofDiff")
  }

  test("mixed float/double inputs (query literals) work") {
    registered()
    val df = Seq(Array(1.0f, 2.0f, 2.0f)).toDF("v")
    val q = VectorMath.vecLit(Array(2.0, 4.0, 4.0))
    val c = df.select(VectorMath.cosineFast(col("v"), q)).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("zero vector -> 0.0; null -> null") {
    registered()
    val df = Seq(
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f))),
      (None, Some(Array(1.0f, 1.0f)))
    ).toDF("a", "b")
    val rows = df.select(VectorMath.cosineFast(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
  }

  test("usable from SQL after registration; rejects bad arity/types") {
    registered()
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b").createOrReplaceTempView("vt")
    assert(spark.sql("SELECT cosine_sim(a, b) FROM vt").head().getDouble(0) == 1.0)
    assertThrows[Exception](spark.sql("SELECT cosine_sim(a) FROM vt").collect())
    assertThrows[Exception](spark.sql("SELECT cosine_sim(1, 2) FROM vt").collect())
  }

  test("expression participates in whole-stage codegen") {
    registered()
    // a local relation constant-folds; derive vectors from range so a
    // real projection is planned
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(VectorMath.cosineFast(col("a"), col("b")).as("c"))
    val codegenNodes = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty,
      s"no codegen span:\n${df.queryExecution.executedPlan}")
    assert(df.count() == 100)
  }

  test("bloom_might_contain: equal filter CONTENT means equal expressions (canonicalization)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def bytes(): Array[Byte] = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (0L until 100L).foreach(bf.putLong)
      BloomMightContain.serialize(bf)
    }
    val (b1, b2) = (bytes(), bytes())
    assert(!(b1 eq b2) && java.util.Arrays.equals(b1, b2), "distinct arrays, same content")
    val e1 = BloomMightContain(Literal(42L), b1)
    val e2 = BloomMightContain(Literal(42L), b2)
    // default case-class equality compares the byte array by reference;
    // plan canonicalization, subexpression elimination and cached-plan
    // matching all rely on equals/hashCode being value-based
    assert(e1 == e2, "identical probes must compare equal")
    assert(e1.hashCode == e2.hashCode, "equal probes must hash equal")
    assert(e1.semanticEquals(e2), "canonicalized forms must unify")
    val other = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (100L until 200L).foreach(bf.putLong)
      BloomMightContain(Literal(42L), BloomMightContain.serialize(bf))
    }
    assert(e1 != other, "different filter content must not compare equal")
  }

  test("max_cosine_sim: matches the per-vector cosine max; child evaluated once; codegen") {
    registered()
    val rnd = new scala.util.Random(9)
    val bench: Seq[Seq[Float]] = (1 to 20).map(_ =>
      Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    val rows = (1 to 30).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"), GraftFunctions.maxCosineSim(col("v"), bench).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    rows.foreach { case (id, v) =>
      val want = bench.map(b => cos(v.toSeq, b)).max
      assert(math.abs(got(id) - want) < 1e-9, s"id $id: ${got(id)} vs $want")
    }
    // a COMPUTED vector child must evaluate once per row, not once per
    // bench vector: time the probe over an expensive derived column —
    // the HOF formulation was measured in MINUTES on this shape
    val big: Seq[Seq[Float]] = (1 to 400).map(_ =>
      Array.fill(64)(rnd.nextGaussian().toFloat).toSeq)
    val derived = spark.range(2000).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        i => sin(col("id") * 131 + i * 17).cast("float")).as("v"))
    val t0 = System.nanoTime()
    val n = derived.select(GraftFunctions.maxCosineSim(col("v"), big).as("m"))
      .where(col("m") > -2).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n == 2000)
    assert(sec < 30, s"computed-child probe took $sec s — per-element re-evaluation regression?")
    // empty matrix → null, null vector → null
    val edge = Seq((1L, Array(1f, 0f)), (2L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    val e = edge.select(col("id"), GraftFunctions.maxCosineSim(col("v"), Nil).as("m"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(e == Map(1L -> true, 2L -> true))
  }

  test("token_window_hashes: rolling equals direct, equal windows iff equal sequences") {
    registered()
    // overlapping repeats: windows [a b c] at positions 0 and 4 must
    // hash equal; every other pair of distinct windows must differ
    val toks = Seq("a", "b", "c", "x", "a", "b", "c", "b", "a")
    val hs = Seq(Tuple1(toks)).toDF("t")
      .select(GraftFunctions.tokenWindowHashes(col("t"), 3).as("h"))
      .head().getSeq[Long](0)
    assert(hs.length == toks.length - 2)
    val windows = toks.sliding(3).toSeq
    windows.indices.foreach { i =>
      windows.indices.foreach { j =>
        if (windows(i) == windows(j)) assert(hs(i) == hs(j), s"equal windows $i,$j must hash equal")
        else assert(hs(i) != hs(j), s"distinct windows $i,$j must not collide here")
      }
    }
    // rolling path equals the direct (non-rolling) polynomial: the
    // first window's hash recomputed from scratch at every offset via
    // single-window calls
    windows.indices.foreach { i =>
      val one = Seq(Tuple1(windows(i))).toDF("t")
        .select(GraftFunctions.tokenWindowHashes(col("t"), 3).as("h"))
        .head().getSeq[Long](0)
      assert(one == Seq(hs(i)), s"rolling hash at offset $i must equal the direct hash")
    }
    // token-boundary sensitivity: ["ab","c"] must differ from ["a","bc"]
    val amb = Seq(Tuple1(Seq("ab", "c")), Tuple1(Seq("a", "bc"))).toDF("t")
      .select(GraftFunctions.tokenWindowHashes(col("t"), 2).as("h"))
      .collect().map(_.getSeq[Long](0).head)
    assert(amb(0) != amb(1), "per-token pre-hashing must keep boundaries distinct")
    // sub-window docs have no windows
    val short = Seq(Tuple1(Seq("only", "two"))).toDF("t")
      .select(GraftFunctions.tokenWindowHashes(col("t"), 3).as("h"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("SparkSessionExtensions injector exposes the same builders") {
    assert(GraftFunctions.all.map(_._1) ==
      Seq("cosine_sim", "simhash64", "minhash_sig", "word_shingles", "top_k_rows",
        "vector_sum", "mat_vec_mul", "kll_sketch_agg", "kll_merge_agg", "kll_quantile",
        "approx_top_items", "normalize_text", "unigram_ppl", "bigram_ppl",
        "deflate_ratio", "canonicalize_url", "pq_encode", "pq_adc_cosine", "token_window_hashes",
        "max_cosine_sim", "bpe_encode",
        "bloom_might_contain", "lsh_buckets", "sniff_charset", "decode_charset",
        "sniff_mime", "robots_compile", "robots_allowed", "nearest_centroid",
        "mih_pairs", "mih_cross_pairs", "bounded_min_k"))
    // injector is exercised end-to-end only with a fresh session
    // (spark.sql.extensions); here we assert it wires without error
    new GraftExtensions // constructible
  }
}
