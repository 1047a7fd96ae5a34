package graft.sinks

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, ZoneId}

/**
 * `_INFO` metadata file generation for exported partitions
 * (reference: pramen/extras .../extras/infofile/InfoFileGeneration.scala
 * — an Atum-style control-measurements document written next to the
 * data so downstream reconciliation can verify record counts per
 * processing stage without re-scanning the export).
 *
 * The document is `metadata` (application, country, history type,
 * info date, record count, version) + ordered `checkpoints`, each
 * carrying a `recordCount` control. Rendering is pure — timestamps
 * come in as arguments — so specs pin the exact bytes. The leading
 * underscore keeps the file invisible to Spark/Hadoop readers of the
 * same directory (same convention as `_SUCCESS`).
 */
object InfoFile {

  final case class Checkpoint(name: String, workflowName: String, order: Int,
                              startMs: Long, endMs: Long, recordCount: Long)

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss Z")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def render(application: String, country: String, historyType: String,
             tableName: String, infoDate: LocalDate, recordCount: Long,
             version: Int, zone: ZoneId, checkpoints: Seq[Checkpoint]): String = {
    def ts(ms: Long): String = Instant.ofEpochMilli(ms).atZone(zone).format(TsFmt)
    val cps = checkpoints.sortBy(_.order).map { c =>
      s"""  {
         |    "name" : "${esc(c.name)}",
         |    "software" : "graft",
         |    "processStartTime" : "${ts(c.startMs)}",
         |    "processEndTime" : "${ts(c.endMs)}",
         |    "workflowName" : "${esc(c.workflowName)}",
         |    "order" : ${c.order},
         |    "controls" : [ {
         |      "controlName" : "recordCount",
         |      "controlType" : "count",
         |      "controlCol" : "*",
         |      "controlValue" : "${c.recordCount}"
         |    } ]
         |  }""".stripMargin
    }.mkString("[\n", ", ", " ]")
    s"""{
       |  "metadata" : {
       |    "sourceApplication" : "${esc(application)}",
       |    "country" : "${esc(country)}",
       |    "historyType" : "${esc(historyType)}",
       |    "dataFilename" : "${esc(tableName)}",
       |    "sourceType" : "Source",
       |    "version" : $version,
       |    "informationDate" : "$infoDate",
       |    "additionalInfo" : { }
       |  },
       |  "checkpoints" : ${cps}
       |}
       |""".stripMargin
  }

  /** Write `_INFO` into the partition directory via hidden-temp +
    * atomic rename (a reader listing the export mid-write must never
    * see a partial document). Works through the Hadoop FS API so the
    * export target (HDFS/S3A/local) doesn't matter. */
  def write(partitionDir: String, content: String,
            hadoopConf: org.apache.hadoop.conf.Configuration =
              new org.apache.hadoop.conf.Configuration()): Unit = {
    val dir = new org.apache.hadoop.fs.Path(partitionDir)
    val fs = dir.getFileSystem(hadoopConf)
    val tmp = new org.apache.hadoop.fs.Path(dir, "._INFO.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val target = new org.apache.hadoop.fs.Path(dir, "_INFO")
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"could not move $tmp to $target")
  }
}
