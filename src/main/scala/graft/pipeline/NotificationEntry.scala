package graft.pipeline

/**
 * Typed notification entries (reference: pramen/api
 * .../api/notification/NotificationEntry.scala, TextElement.scala,
 * Style.scala): user code attaches structured content to the end-of-run
 * report — styled paragraphs, tables, lists, raw HTML blocks and file
 * attachments — which the HTML report renders natively and the text
 * report flattens. Plain strings remain [[NotificationEntry.Unformatted]],
 * rendering exactly as before (the HTML golden files pin that).
 */
sealed trait NotificationEntry

object NotificationEntry {

  /** Visual style of a text span (reference: Style.scala — the same
    * palette the per-task status column uses). */
  sealed trait Style
  object Style {
    case object Normal extends Style
    case object Bold extends Style
    case object Success extends Style
    case object Warning extends Style
    case object Error extends Style
  }

  final case class TextElement(text: String, style: Style = Style.Normal)

  /** Pre-formatted text, rendered in `<pre>` (the historical string
    * entry shape). */
  final case class Unformatted(text: String) extends NotificationEntry

  /** One paragraph of styled spans. */
  final case class Paragraph(spans: Seq[TextElement]) extends NotificationEntry

  /** A small table (headers + string cells); `description` renders as
    * a caption when non-empty. */
  final case class Table(headers: Seq[String], rows: Seq[Seq[String]],
                         description: String = "") extends NotificationEntry

  final case class UnorderedList(items: Seq[String]) extends NotificationEntry

  /** Raw HTML passed through untouched into the HTML report (the
    * caller vouches for it — same trust contract as the reference);
    * the text report carries it verbatim. */
  final case class Html(content: String) extends NotificationEntry

  /** A file delivered alongside the report (reference:
    * NotificationEntry.AttachedFile + Sendable's MIME attachments):
    * the HTML report lists it, and transports that can carry files
    * (the file transport) write it next to the report. */
  final case class AttachedFile(fileName: String, contents: Array[Byte])
    extends NotificationEntry

  /** Flatten one entry for the TEXT report. */
  def toText(e: NotificationEntry): String = e match {
    case Unformatted(t) => t
    case Paragraph(spans) => spans.map(_.text).mkString
    case Table(headers, rows, desc) =>
      // widths over the WIDEST row, not just the header — ragged rows
      // must still align, and a header-less table must not emit a
      // stray blank line
      val all = headers +: rows
      val ncols = all.map(_.length).max
      val widths = (0 until ncols).map(i => all.map(r =>
        if (i < r.length) r(i).length else 0).max)
      def line(vals: Seq[String]) = vals.zipAll(widths, "", 0)
        .map { case (v, w) => v.padTo(w, ' ') }.mkString("  ")
      val body = ((if (headers.nonEmpty) Seq(line(headers)) else Nil) ++ rows.map(line))
        .mkString("\n")
      if (desc.isEmpty) body else s"$desc\n$body"
    case UnorderedList(items) => items.map("- " + _).mkString("\n")
    case Html(content) => content
    case AttachedFile(name, contents) => s"[attachment: $name, ${contents.length} bytes]"
  }
}
