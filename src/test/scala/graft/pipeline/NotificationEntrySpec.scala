package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

/** M29b: typed notification entries — styled HTML rendering, text
  * flattening, attachment delivery (reference:
  * api/notification/NotificationEntry.scala + Sendable attachments). */
class NotificationEntrySpec extends AnyFunSuite {
  import NotificationEntry._

  private val pinfo = PipelineInfo("p", "test", LocalDate.parse("2024-06-15"),
    0L, 1L, None, "succeeded", None)

  test("typed entries render natively in the HTML report") {
    val html = HtmlReport.renderTyped(pinfo, Nil, Seq(
      Paragraph(Seq(TextElement("all good ", Style.Normal),
        TextElement("3 warnings", Style.Warning))),
      Table(Seq("table", "rows"), Seq(Seq("docs", "500"), Seq("embeddings", "<200>")),
        description = "Loaded"),
      UnorderedList(Seq("first", "second")),
      Html("<div id=\"raw\">verbatim</div>"),
      AttachedFile("counts.csv", "a,b\n1,2\n".getBytes("UTF-8"))))
    assert(html.contains("""<span style="color:#b26a00;font-weight:bold">3 warnings</span>"""))
    assert(html.contains("<caption>Loaded</caption>"))
    assert(html.contains("<td>&lt;200&gt;</td>"), "cells must be escaped")
    assert(html.contains("<li>second</li>"))
    assert(html.contains("""<div id="raw">verbatim</div>"""), "Html passes through raw")
    assert(html.contains("<b>counts.csv</b> (8 bytes)"))
  }

  test("legacy string entries render byte-identically through both paths") {
    val viaStrings = HtmlReport.render(pinfo, Nil, Seq("plain <entry>"))
    val viaTyped = HtmlReport.renderTyped(pinfo, Nil, Seq(Unformatted("plain <entry>")))
    assert(viaStrings == viaTyped)
    assert(viaStrings.contains("<pre>plain &lt;entry&gt;</pre>"))
  }

  test("text flattening keeps content for the plain-text report") {
    assert(toText(Paragraph(Seq(TextElement("a"), TextElement("b", Style.Bold)))) == "ab")
    assert(toText(Table(Seq("h1", "h2"), Seq(Seq("x", "y")))) == "h1  h2\nx   y ")
    assert(toText(UnorderedList(Seq("i1", "i2"))) == "- i1\n- i2")
    assert(toText(AttachedFile("f.bin", Array[Byte](1, 2))) == "[attachment: f.bin, 2 bytes]")
    // builder drain() flattens typed entries for the text report
    val b = new NotificationBuilder
    b.addEntries("plain")
    b.addTypedEntries(UnorderedList(Seq("typed")))
    assert(b.drain() == Seq("plain", "- typed"))
    assert(b.drain().isEmpty, "drained once")
  }

  test("ragged and header-less tables flatten without misalignment or stray lines") {
    // a row wider than the header still aligns on the widest row
    val ragged = toText(Table(Seq("h"), Seq(Seq("a", "extra"), Seq("bb"))))
    val lines = ragged.linesIterator.toSeq
    assert(lines.length == 3)
    assert(lines(1).startsWith("a ") && lines(1).contains("extra"))
    // the second column begins at one offset in every line
    val col2 = lines(1).indexOf("extra")
    assert(lines.forall(_.length >= col2), s"rows padded to the widest row:\n$ragged")
    // header-less: no leading blank line
    val noHeader = toText(Table(Seq(), Seq(Seq("x"))))
    assert(noHeader == "x")
  }

  test("degenerate attachment names are neither path escapes nor dotfiles") {
    val dir = java.nio.file.Files.createTempDirectory("attach2_").toString
    val t = new FileHtmlTransport(dir)
    t.sendAttachment("..", Array[Byte](1))
    t.sendAttachment(".env", Array[Byte](2))
    t.sendAttachment("", Array[Byte](3))
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.forall(f => !f.startsWith(".")), s"no dotfiles/path escapes: $files")
    assert(files.size == 3, s"all three delivered under safe names: $files")
    // nothing escaped the directory
    assert(new java.io.File(dir).getParentFile.listFiles()
      .forall(f => !f.getName.startsWith("attachment_")))
  }

  test("file transport writes attachments next to the report, atomically named") {
    val dir = java.nio.file.Files.createTempDirectory("attach_").toString
    val builder = new NotificationBuilder
    builder.addTypedEntries(
      Paragraph(Seq(TextElement("see attachment"))),
      AttachedFile("rows per table.csv", "t,5\n".getBytes("UTF-8")))
    new HtmlReportingNotifier(new FileHtmlTransport(dir), builder)
      .onPipelineCompletedInfo(pinfo, Nil)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.exists(_.endsWith(".html")), s"report present: $files")
    assert(files.contains("rows_per_table.csv"), s"attachment written: $files")
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "rows_per_table.csv")), "UTF-8")
    assert(content == "t,5\n")
  }
}
