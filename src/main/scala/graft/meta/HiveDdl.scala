package graft.meta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/**
 * Hive DDL generation + execution for exposing metastore tables in an
 * EXTERNAL Hive metastore (reference: pramen/core
 * .../core/utils/hive/HiveHelperSql.scala, HiveQueryTemplates.scala,
 * QueryExecutor{Spark,Jdbc}.scala). `Metastore.syncCatalog` covers
 * the same-session Spark-catalog strategy; this covers the other
 * production deployment, where the warehouse catalog lives in a Hive
 * metastore reached by SQL (HiveServer2 over JDBC, or Spark with Hive
 * support) and site conventions demand custom DDL — hence templates.
 *
 * Templates substitute `@fullTableName`, `@schema`, `@partitionedBy`,
 * `@path`, `@partitionClause` and `@partitionPath` in ONE pass over
 * the original template (a data value containing an `@token` is never
 * re-substituted). Defaults render classic parquet EXTERNAL TABLE
 * DDL, the reference's defaults re-expressed.
 */
object HiveDdl {

  /** Where generated DDL runs: Spark's SQL engine or any JDBC
    * connection ([[graft.rdb.SqlExecutor]] fits the JDBC side). */
  trait QueryExecutor {
    def execute(sql: String): Unit
    def tableExists(fullTableName: String): Boolean
  }

  final class SparkQueryExecutor(spark: SparkSession) extends QueryExecutor {
    override def execute(sql: String): Unit = { spark.sql(sql); () }
    override def tableExists(fullTableName: String): Boolean =
      spark.catalog.tableExists(fullTableName)
  }

  /** JDBC executor — existence probed with a zero-row SELECT, the one
    * shape every HiveServer2-compatible engine answers (reference:
    * QueryExecutorJdbc.doesTableExist).
    *
    * `healthProbeSql` must be a statement that succeeds on a HEALTHY
    * connection regardless of which tables exist. `SELECT 1` covers
    * HiveServer2/Impala/Spark Thrift and most RDBMSes; engines that
    * require a FROM clause need their own (Oracle `SELECT 1 FROM
    * DUAL`, DB2 `SELECT 1 FROM SYSIBM.SYSDUMMY1`). */
  final class JdbcQueryExecutor(ex: graft.rdb.SqlExecutor,
                                healthProbeSql: String = "SELECT 1") extends QueryExecutor {
    override def execute(sql: String): Unit = { ex.executeUpdate(sql); () }
    // missing table vs database outage: error codes/SQLStates differ
    // per engine, so discriminate with a table-INDEPENDENT probe (the
    // TokenLockJdbc idiom) — if the connection still answers the
    // health probe, the failure was about the table (absent); if it
    // does not, the warehouse is unreachable, and reporting that as
    // "absent" would send the caller into CREATE-on-outage DDL.
    override def tableExists(fullTableName: String): Boolean =
      try { ex.query(s"SELECT 1 FROM $fullTableName WHERE 0 = 1"); true }
      catch {
        case e: Exception =>
          try { ex.query(healthProbeSql); false }
          catch { case _: Exception => throw e }
      }
  }

  final case class Templates(
      createTable: String = DefaultCreateTable,
      repairTable: String = DefaultRepairTable,
      addPartition: String = DefaultAddPartition,
      replaceSchema: String = DefaultReplaceSchema,
      dropTable: String = DefaultDropTable)

  val DefaultCreateTable: String =
    """CREATE EXTERNAL TABLE IF NOT EXISTS @fullTableName ( @schema )
      |@partitionedBy
      |STORED AS PARQUET
      |LOCATION '@path'""".stripMargin
  val DefaultRepairTable = "MSCK REPAIR TABLE @fullTableName"
  val DefaultAddPartition =
    "ALTER TABLE @fullTableName ADD IF NOT EXISTS PARTITION (@partitionClause) " +
      "LOCATION '@partitionPath'"
  val DefaultReplaceSchema =
    "ALTER TABLE @fullTableName REPLACE COLUMNS ( @schema )"
  val DefaultDropTable = "DROP TABLE IF EXISTS @fullTableName"

  private val Token = "@([A-Za-z][A-Za-z0-9_]*)".r

  /** Single-pass `@token` substitution; unknown tokens stay verbatim. */
  private[meta] def render(template: String, vars: Map[String, String]): String =
    Token.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(
        vars.getOrElse(m.group(1), m.matched)))

  def fullTableName(database: Option[String], table: String): String =
    database.fold(table)(db => s"$db.$table")

  /** `name type` column list in Hive syntax, partition columns
    * excluded (they go to `@partitionedBy`), names backtick-escaped. */
  private[meta] def columnsDdl(schema: StructType, partitionBy: Seq[String]): String = {
    val partitionSet = partitionBy.map(_.toLowerCase).toSet
    schema.fields
      .filterNot(f => partitionSet.contains(f.name.toLowerCase))
      .map(f => s"`${f.name}` ${f.dataType.catalogString}")
      .mkString(", ")
  }

  private[meta] def partitionedByDdl(schema: StructType, partitionBy: Seq[String]): String =
    if (partitionBy.isEmpty) ""
    else {
      val byName = schema.fields.map(f => f.name.toLowerCase -> f).toMap
      "PARTITIONED BY (" + partitionBy.map { p =>
        val tpe = byName.get(p.toLowerCase).map(_.dataType.catalogString).getOrElse("string")
        s"`$p` $tpe"
      }.mkString(", ") + ")"
    }

  private def baseVars(fullName: String, path: String,
                       schema: StructType, partitionBy: Seq[String]): Map[String, String] =
    Map(
      "fullTableName" -> fullName,
      "path" -> path,
      "schema" -> columnsDdl(schema, partitionBy),
      "partitionedBy" -> partitionedByDdl(schema, partitionBy))

  /** Create the external table (idempotent via the template's IF NOT
    * EXISTS) and register partitions when asked — one MSCK, exactly
    * the reference's createHiveTable + autoRepairPartitions. */
  def createTable(executor: QueryExecutor, templates: Templates,
                  fullName: String, path: String, schema: StructType,
                  partitionBy: Seq[String] = Nil,
                  repairPartitions: Boolean = true): Unit = {
    executor.execute(render(templates.createTable,
      baseVars(fullName, path, schema, partitionBy)))
    if (partitionBy.nonEmpty && repairPartitions)
      executor.execute(render(templates.repairTable, Map("fullTableName" -> fullName)))
  }

  /** Drop + recreate — schema changes that REPLACE COLUMNS cannot
    * express (column type narrowing, reordering) go through here
    * (reference: createOrUpdateHiveTable). */
  def createOrUpdateTable(executor: QueryExecutor, templates: Templates,
                          fullName: String, path: String, schema: StructType,
                          partitionBy: Seq[String] = Nil,
                          repairPartitions: Boolean = true): Unit = {
    executor.execute(render(templates.dropTable, Map("fullTableName" -> fullName)))
    createTable(executor, templates, fullName, path, schema, partitionBy, repairPartitions)
  }

  /** O(1) registration of one partition — the scale path: MSCK lists
    * EVERY partition directory, a decade of daily partitions = a
    * 3,650-dir listing per save. */
  def addPartition(executor: QueryExecutor, templates: Templates, fullName: String,
                   partitionSpec: Seq[(String, String)], partitionPath: String): Unit = {
    val clause = partitionSpec
      .map { case (k, v) => s"`$k` = '${v.replace("'", "''")}'" }.mkString(", ")
    executor.execute(render(templates.addPartition, Map(
      "fullTableName" -> fullName,
      "partitionClause" -> clause,
      "partitionPath" -> partitionPath)))
  }

  /** Widen/extend the exposed schema in place (reference:
    * repairHiveTableSchema via REPLACE COLUMNS). */
  def replaceSchema(executor: QueryExecutor, templates: Templates, fullName: String,
                    schema: StructType, partitionBy: Seq[String] = Nil): Unit =
    executor.execute(render(templates.replaceSchema, Map(
      "fullTableName" -> fullName,
      "schema" -> columnsDdl(schema, partitionBy))))

  def dropTable(executor: QueryExecutor, templates: Templates, fullName: String): Unit =
    executor.execute(render(templates.dropTable, Map("fullTableName" -> fullName)))
}
