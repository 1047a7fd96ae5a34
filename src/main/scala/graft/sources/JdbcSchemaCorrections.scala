package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, DecimalType, MetadataBuilder, StructType, TimestampType}

/**
 * Read-time schema corrections for JDBC sources (reference:
 * pramen/core .../core/utils/JdbcSparkUtils.scala:236,273):
 * relational engines and Spark disagree about numeric metadata often
 * enough that production ingestion toggles these constantly.
 *
 *  - Oracle/DB2 report NUMBER-ish types with scale 0 (or no scale at
 *    all): Spark maps them to wasteful or lossy decimals, when an
 *    int/long is the faithful type — and a decimal with scale > 18
 *    must round down to Spark's decimal(38, 18) ceiling explicitly or
 *    the read fails.
 *  - Some engines report precision as the INTEGRAL digit count rather
 *    than total digits (precision 5 / scale 8): `fixPrecision` adds
 *    the scale back so values are not truncated.
 *
 * The corrections render as a Spark JDBC `customSchema` option string
 * so the fix applies inside the datasource (values are read with the
 * corrected types), not as an after-the-fact cast.
 */
object JdbcSchemaCorrections {

  private def escape(name: String): String = s"`${name.replace("`", "``")}`"

  /**
   * The `customSchema` string correcting every problematic decimal in
   * `schema`, or None when nothing needs correcting. Rules (the
   * reference's, re-expressed):
   *   scale 0, precision <= 9  -> integer
   *   scale 0, precision <= 18 -> long
   *   scale > 18               -> decimal(38, 18)
   *   fixPrecision && scale > 0 -> decimal(min(precision + scale, 38), scale)
   *                                when that widens the precision
   */
  def correctedDecimalsSchema(schema: StructType, fixPrecision: Boolean = false): Option[String] = {
    val corrected = schema.fields.flatMap { f =>
      f.dataType match {
        case t: DecimalType if t.scale == 0 && t.precision <= 9 =>
          Some(s"${escape(f.name)} integer")
        case t: DecimalType if t.scale == 0 && t.precision <= 18 =>
          Some(s"${escape(f.name)} long")
        case t: DecimalType if t.scale > 18 =>
          Some(s"${escape(f.name)} decimal(38, 18)")
        case t: DecimalType if fixPrecision && t.scale > 0 =>
          val fixed = math.min(t.precision + t.scale, 38)
          if (fixed > t.precision) Some(s"${escape(f.name)} decimal($fixed, ${t.scale})")
          else None
        case _ => None
      }
    }
    if (corrected.isEmpty) None else Some(corrected.mkString(", "))
  }

  /** Column descriptions from JDBC metadata REMARKS (reference:
    * JdbcSparkUtils.addColumnDescriptionsFromJdbc): most warehouses
    * carry column comments, and losing them on ingestion means the
    * lake's catalog shows bare names. Failure to READ the metadata is
    * never fatal — descriptions are best-effort decoration. */
  def columnRemarks(connection: java.sql.Connection, table: String): Map[String, String] =
    try {
      // "table", "schema.table" or "catalog.schema.table"
      val parts = table.split('.')
      val (catalog, schemaName, tableName) = parts.length match {
        case 3 => (parts(0), parts(1), parts(2))
        case 2 => (null, parts(0), parts(1))
        case _ => (null, null, table)
      }
      val meta = connection.getMetaData
      // getColumns treats schema/table as SEARCH PATTERNS: an
      // unescaped '_' in "dim_customer" would also match
      // "dimXcustomer" and stamp another table's comments onto this
      // one — escape pattern metacharacters with the driver's escape
      val esc = Option(meta.getSearchStringEscape).getOrElse("\\")
      def pattern(s: String): String =
        if (s == null) null
        else s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      val rs = meta.getColumns(catalog, pattern(schemaName), pattern(tableName), null)
      val out = Map.newBuilder[String, String]
      while (rs.next()) {
        (Option(rs.getString("COLUMN_NAME")), Option(rs.getString("REMARKS"))) match {
          case (Some(name), Some(remark)) if remark.nonEmpty =>
            out += name.toLowerCase -> remark
          case _ => ()
        }
      }
      rs.close()
      out.result()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] no column metadata for '$table': ${e.getMessage}")
        Map.empty
    }

  /** The schema with `comment` metadata added for every field that has
    * a remark (case-insensitive match); existing metadata survives. */
  def withColumnDescriptions(schema: StructType, remarks: Map[String, String]): StructType =
    if (remarks.isEmpty) schema
    else StructType(schema.fields.map { f =>
      remarks.get(f.name.toLowerCase) match {
        case Some(remark) =>
          f.copy(metadata = new MetadataBuilder()
            .withMetadata(f.metadata).putString("comment", remark).build())
        case None => f
      }
    })

  /** Cast every timestamp column to date (reference:
    * convertTimestampToDates) — for engines whose DATE type surfaces
    * through JDBC as a timestamp (Oracle), where a date-partitioned
    * pipeline wants dates back. */
  def convertTimestampsToDates(df: DataFrame): DataFrame = {
    // backtick-quote so a dotted JDBC label ("t.loaded_at") resolves
    // as a literal column name, not a nested-field path
    def byName(name: String) = col(s"`${name.replace("`", "``")}`")
    val fields = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => byName(f.name).cast(DateType).as(f.name)
        case _ => byName(f.name)
      }
    }
    if (df.schema.fields.exists(_.dataType == TimestampType)) df.select(fields.toIndexedSeq: _*)
    else df
  }
}
