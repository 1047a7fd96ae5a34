package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/**
 * Ingestion-side column-name sanitization
 * (reference: pramen/core .../core/utils/SparkUtils.scala:112
 * `sanitizeDfColumns`, wired into IngestionJob/IncrementalIngestionJob
 * under the `special.characters.in.column.names` key, global default in
 * core reference.conf:205).
 *
 * External systems routinely deliver column names a columnar store
 * can't accept — `"First Name"`, `"price(usd)"`, `"t1.amount"` from a
 * JDBC join — and parquet rejects several of these outright. On
 * ingestion graft therefore:
 *
 *  - replaces every configured special character with `_`;
 *  - when EVERY column shares one dotted table prefix (`t1.a`, `t1.b`
 *    — the typical JDBC single-table SELECT), strips that prefix;
 *  - keeps renamed names unique case-insensitively by appending
 *    `_1`, `_2`, … (two source columns must never silently merge);
 *  - records the original name in column metadata so lineage back to
 *    the source schema survives the rename.
 *
 * Pure DataFrame → DataFrame; an empty character set disables the
 * whole pass (the reference's contract).
 */
object ColumnSanitizer {

  /** The reference's default special-character set. */
  val DefaultSpecialCharacters: String = "' :+-=<>()[]{}*?/\\\""

  /** Metadata key carrying the pre-sanitization column name. */
  val OriginalNameKey = "graft.original.name"

  def sanitize(df: DataFrame, specialCharacters: String = DefaultSpecialCharacters): DataFrame = {
    if (specialCharacters.isEmpty || df.schema.isEmpty) return df

    val names = df.schema.fields.map(_.name)
    // indexOf, not split: Java split drops trailing empty segments, so
    // a degenerate name like "." yields an EMPTY array and .head throws
    def firstSegment(n: String): String = {
      val i = n.indexOf('.')
      if (i < 0) n else n.substring(0, i)
    }
    // uniform dotted prefix: compare on the first segment so a prefix-
    // less name equal to the prefix itself ("t" among "t.a") still
    // counts as uniform, like the reference
    val uniformPrefix = names.map(firstSegment).distinct.length == 1 &&
      names.exists(_.contains('.'))

    def stripPrefix(n: String): String =
      if (uniformPrefix && n.contains('.')) {
        val stripped = n.substring(n.indexOf('.') + 1)
        // "t1." would strip to the empty string — an even worse name
        // than the input; keep the original and let the special-char
        // pass handle it
        if (stripped.isEmpty) n else stripped
      } else n

    // seeded with every ORIGINAL name: a sanitized name may not collide
    // with a column that keeps its name either
    val taken = scala.collection.mutable.Set(names.map(_.toLowerCase): _*)

    val cols = df.schema.fields.map { field =>
      val src = field.name
      val target = stripPrefix(src.trim).map(c => if (specialCharacters.contains(c)) '_' else c)
      if (target == src) col(s"`$src`")
      else {
        taken.remove(src.toLowerCase)
        val unique = Iterator.single(target)
          .concat(Iterator.from(1).map(i => s"${target}_$i"))
          .find(n => !taken.contains(n.toLowerCase)).get
        taken.add(unique.toLowerCase)
        val meta = new MetadataBuilder().withMetadata(field.metadata)
          .putString(OriginalNameKey, src).build()
        col(s"`$src`").as(unique, meta)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
