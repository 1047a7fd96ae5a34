package graft.sources

import graft.SparkSpec
import graft.pipeline.PipelineConfig

/** Ingestion column-name sanitization (reference: SparkUtils
  * sanitizeDfColumns + the special.characters.in.column.names key). */
class ColumnSanitizerSpec extends SparkSpec {
  import spark.implicits._

  test("special characters become underscores; originals kept in metadata") {
    val df = Seq((1, "a", 2.0)).toDF("First Name", "price(usd)", "net<amt>")
    val out = ColumnSanitizer.sanitize(df)
    assert(out.columns.toSeq == Seq("First_Name", "price_usd_", "net_amt_"))
    val meta = out.schema.fields.map(f =>
      f.name -> f.metadata.getString(ColumnSanitizer.OriginalNameKey)).toMap
    assert(meta("First_Name") == "First Name")
    assert(meta("price_usd_") == "price(usd)")
    // values ride along untouched
    assert(out.head().getInt(0) == 1 && out.head().getDouble(2) == 2.0)
  }

  test("a uniform dotted table prefix is stripped (JDBC single-table SELECT shape)") {
    val df = Seq((1, 2)).toDF("t1.amount", "t1.qty")
    val out = ColumnSanitizer.sanitize(df)
    assert(out.columns.toSeq == Seq("amount", "qty"))
  }

  test("mixed prefixes are NOT stripped (a join's disambiguation must survive)") {
    val df = Seq((1, 2)).toDF("t1.amount", "t2.amount")
    val out = ColumnSanitizer.sanitize(df)
    // '.' is not in the special set; names stay distinct
    assert(out.columns.toSeq == Seq("t1.amount", "t2.amount"))
  }

  test("sanitized names stay unique case-insensitively via numeric suffixes") {
    val df = Seq((1, 2, 3)).toDF("a b", "a_b", "A(b")
    val out = ColumnSanitizer.sanitize(df)
    assert(out.columns.toSeq.map(_.toLowerCase).distinct.size == 3)
    assert(out.columns.contains("a_b")) // the already-clean column keeps its name
    val renamed = out.columns.filterNot(_ == "a_b")
    assert(renamed.forall(_.toLowerCase.startsWith("a_b")))
  }

  test("degenerate dotted names neither crash nor strip to empty") {
    // "." has no non-empty first segment (Java split would return an
    // EMPTY array); "t1." would strip to the empty string
    val df = Seq((1, 2)).toDF("t1.", "t1.a")
    val out = ColumnSanitizer.sanitize(df)
    assert(out.columns.length == 2)
    assert(out.columns.forall(_.nonEmpty), s"no empty names: ${out.columns.toSeq}")
    val dot = Seq(Tuple1(1)).toDF(".")
    assert(ColumnSanitizer.sanitize(dot).columns.length == 1)
  }

  test("empty character set disables the pass entirely") {
    val df = Seq((1, 2)).toDF("a b", "t.c")
    assert(ColumnSanitizer.sanitize(df, "").columns.toSeq == Seq("a b", "t.c"))
  }

  test("config-run ingestion sanitizes source columns into the metastore") {
    val dir = tmpDir("sanitize-e2e")
    // CSV with header names no columnar store would accept
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,First Name,Net Amount\n1,ada,10.5\n2,grace,11.0\n")
    val conf =
      s"""pipeline.name = sanitize_e2e
         |table.people.path = $dir/ms/people
         |source.src.type = spark
         |source.src.path = $dir/in.csv
         |source.src.format = csv
         |source.src.option.header = true
         |job.1.type = ingestion
         |job.1.source = src
         |job.1.output = people
         |""".stripMargin
    val parsed = PipelineConfig.parse(conf)
    val results = PipelineConfig.runParams(spark, parsed,
      graft.pipeline.RunParams.Normal(java.time.LocalDate.of(2026, 8, 13)))
    assert(results.forall(_.isInstanceOf[graft.pipeline.TaskResult.Succeeded]), s"results: $results")
    val saved = spark.read.parquet(s"$dir/ms/people")
    assert(saved.columns.toSet == Set("id", "First_Name", "Net_Amount", "info_date"))
    assert(saved.count() == 2)
  }

  test("per-source key overrides the global one") {
    val df = Seq((1, 2)).toDF("a b", "a-b")
    // only space is special here: "a-b" must survive while "a b" renames
    val out = ColumnSanitizer.sanitize(df, " ")
    assert(out.columns.toSeq.contains("a-b"))
    assert(out.columns.exists(_.startsWith("a_b")))
  }
}
