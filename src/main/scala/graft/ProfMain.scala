package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling main — deleted before commit
object ProfMain {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = LocalDate.parse("2024-05-01")

    def runVariant(label: String, extra: Map[String, String],
                   base: Map[String, String]): Unit = {
      val ms = new graft.meta.Metastore(s)
      val suffix = label.replaceAll("[^a-z0-9]", "_")
      val src = java.nio.file.Files.createTempDirectory(s"pv_src_$suffix").toString
      val emb = java.nio.file.Files.createTempDirectory(s"pv_emb_$suffix").toString
      val out = java.nio.file.Files.createTempDirectory(s"pv_out_$suffix").toString
      ms.register(graft.meta.MetaTable("docs_raw_v2", src))
      ms.register(graft.meta.MetaTable("emb_v2", emb))
      ms.register(graft.meta.MetaTable("docs_cur_v2", out))
      ms.saveTable("docs_raw_v2", d, s.read.parquet(s"$dir/documents.parquet"))
      ms.saveTable("emb_v2", d, SparkEntry.withPlantedNearDups(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding"))
      // warm once then time
      for (i <- 0 to 1) {
        val t0 = System.nanoTime()
        new graft.pipeline.Orchestrator(ms, rerunSucceeded = true).run(Seq(graft.pipeline.JobDef(
          "curate_v2", "docs_cur_v2", new graft.pipeline.CurationTransformer,
          Seq("docs_raw_v2", "emb_v2"), infoDateExpr = "@runDate",
          options = base ++ extra)), d)
        ms.getTable("docs_cur_v2", Some(d), Some(d))
          .groupBy("split").count().write.format("noop").mode("overwrite").save()
        if (i == 1) println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val full = Map(
      "input.table" -> "docs_raw_v2", "quality.min" -> "0.2",
      "semdedup.enabled" -> "true", "semdedup.table" -> "emb_v2",
      "semdedup.id.column" -> "vec_id", "semdedup.threshold" -> "0.92",
      "perplexity.enabled" -> "true",
      "split.group.safe" -> "true")
    runVariant("full", Map.empty, full)
    runVariant("no-semdedup", Map("semdedup.enabled" -> "false"), full)
    runVariant("no-groupsafe", Map("split.group.safe" -> "false"), full)
    runVariant("no-ppl", Map("perplexity.enabled" -> "false"), full)
    runVariant("minimal", Map("semdedup.enabled" -> "false",
      "split.group.safe" -> "false", "perplexity.enabled" -> "false"), full)
    s.stop()
  }
}
