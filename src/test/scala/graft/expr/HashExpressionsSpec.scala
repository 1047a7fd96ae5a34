package graft.expr

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Native simhash64/minhash_sig: bit parity with the HOF formulations
  * and with Spark's own xxhash64 builtin. */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the sleepy dog",
    "Hello, World! Mixed CASE and   spacing",
    "单一 中文 标记 也 应该 工作",
    "")

  test("simhash64 is bit-identical to the HOF simhash") {
    GraftFunctions.ensure(spark)
    val df = texts.toDF("t")
    val rows = df.select(
      Dedup.simhash(col("t")).as("hof"),
      GraftFunctions.simhash64(TextFunctions.tokens(col("t"))).as("native"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"mismatch: hof=${r.getLong(0)} native=${r.getLong(1)}"))
  }

  test("minhash_sig is element-identical to the HOF signature") {
    GraftFunctions.ensure(spark)
    val df = texts.toDF("t")
      .withColumn("_toks", TextFunctions.tokens(col("t")))
      .withColumn("sh", TextFunctions.wordShinglesFromTokens(col("_toks"), 3))
    val rows = df.select(
      Dedup.minhashSignatureFromShingles(col("sh"), 16).as("hof"),
      GraftFunctions.minhashSig(col("sh"), 16).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch:\n hof=${r.getSeq[Long](0)}\n nat=${r.getSeq[Long](1)}")
    }
  }

  test("per-shingle hash agrees with the xxhash64 builtin (hash-compat contract)") {
    GraftFunctions.ensure(spark)
    // minhash_sig(sh, 1) over a single shingle == xxhash64(0, shingle)
    val df = Seq("only one entry").toDF("s")
      .select(array(col("s")).as("sh"), xxhash64(lit(0), col("s")).as("builtin"))
      .select(element_at(GraftFunctions.minhashSig(col("sh"), 1), 1).as("native"), col("builtin"))
    val r = df.head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("null tokens: native simhash64/word_shingles match the HOF null semantics") {
    GraftFunctions.ensure(spark)
    // xxhash64 skips null children (hash stays at the seed); array_join
    // skips null elements — the native loops must do the same
    val df = Seq(1).toDF("i").select(
      typedlit(Seq[Option[String]](Some("a"), None, Some("b"), Some("c"))).as("toks"))
    val r = df.select(
      GraftFunctions.simhash64(col("toks")).as("native_sh"),
      Dedup.simhashOfTokens(col("toks")).as("hof_sh"),
      GraftFunctions.wordShingles(col("toks"), 3).as("native_ws"),
      TextFunctions.wordShinglesFromTokens(col("toks"), 3).as("hof_ws")).head()
    assert(r.getLong(0) == r.getLong(1),
      s"null simhash diverges: ${r.getLong(0)} vs ${r.getLong(1)}")
    assert(r.getSeq[String](2) == r.getSeq[String](3),
      s"null shingles diverge: ${r.getSeq[String](2)} vs ${r.getSeq[String](3)}")
  }

  test("word_shingles matches the HOF formulation on varied inputs") {
    GraftFunctions.ensure(spark)
    val rows = (texts :+ "one two" :+ "single").toDF("t")
      .withColumn("toks", TextFunctions.tokens(col("t")))
      .select(
        TextFunctions.wordShinglesFromTokens(col("toks"), 3).as("hof"),
        GraftFunctions.wordShingles(col("toks"), 3).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch:\n hof=${r.getSeq[String](0)}\n nat=${r.getSeq[String](1)}")
    }
  }

  test("lsh_buckets matches the driver-side bucket computation") {
    GraftFunctions.ensure(spark)
    import graft.operators.AnnSearch
    val dim = 8; val bits = 4; val tables = 3
    val planeSets = Array.tabulate(tables)(t => AnnSearch.hyperplanes(dim, bits, 42L + t))
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val got = vecs.toDF("id", "v")
      .select(col("id"), AnnSearch.lshBucketsAll(col("v"), planeSets).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = AnnSearch.queryBuckets(v.map(_.toDouble), planeSets)
      assert(got(id) == want, s"vec $id: got ${got(id)} want $want")
    }
  }

  test("generated code actually compiles (no silent interpreted fallback)") {
    GraftFunctions.ensure(spark)
    // with fallback disabled a codegen compile failure throws instead
    // of silently degrading to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import graft.operators.AnnSearch
      val planes = Array.tabulate(2)(t => AnnSearch.hyperplanes(4, 4, 42L + t))
      val df = spark.range(50)
        .select(concat(lit("w"), col("id")).as("w"), col("id"))
        .select(array(col("w"), lit("x")).as("toks"),
          array(col("id").cast("float"), lit(1.0f), lit(2.0f), lit(0.5f)).as("vec"))
        .select(
          GraftFunctions.simhash64(col("toks")).as("sh"),
          GraftFunctions.minhashSig(col("toks"), 8).as("sig"),
          AnnSearch.lshBucketsAll(col("vec"), planes).as("buckets"))
      assert(df.count() == 50)
      assert(df.head().getSeq[Long](2).length == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("empty array sentinels and SQL registration") {
    GraftFunctions.ensure(spark)
    val r = Seq(Seq.empty[String]).toDF("sh")
      .select(GraftFunctions.minhashSig(col("sh"), 4), GraftFunctions.simhash64(col("sh"))).head()
    assert(r.getSeq[Long](0) == Seq(0L, 1L, 2L, 3L))
    assert(r.getLong(1) == 0L)
    assert(spark.sql("SELECT simhash64(array('a','b'))").head().getLong(0) ==
      Seq(("x")).toDF("t").select(GraftFunctions.simhash64(typedlit(Seq("a", "b")))).head().getLong(0))
  }
}
