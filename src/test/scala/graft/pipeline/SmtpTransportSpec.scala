package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets

/** One-connection scripted SMTP server on a loopback ephemeral port —
  * records the whole client exchange so the spec can pin protocol
  * order, envelope, headers and body encoding. */
final class FakeSmtpServer(multilineEhlo: Boolean = false,
                           rejectRcpt: Set[String] = Set.empty) {
  private val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  val commands = new java.util.concurrent.CopyOnWriteArrayList[String]()
  @volatile var data: String = ""

  private val thread = new Thread(() => {
    val sock = server.accept()
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
    val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.ISO_8859_1)
    def reply(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
    reply("220 fake.smtp ESMTP ready")
    var open = true
    while (open) {
      val line = in.readLine()
      if (line == null) open = false
      else {
        commands.add(line)
        val upper = line.toUpperCase
        if (upper.startsWith("EHLO")) {
          if (multilineEhlo) { reply("250-fake.smtp greets you"); reply("250-SIZE 35882577") }
          reply("250 OK")
        } else if (upper.startsWith("MAIL FROM")) reply("250 OK")
        else if (upper.startsWith("RCPT TO")) {
          val addr = line.substring(line.indexOf('<') + 1, line.lastIndexOf('>'))
          if (rejectRcpt.contains(addr)) reply(s"550 no such user: $addr")
          else reply("250 OK")
        } else if (upper.startsWith("DATA")) {
          reply("354 end with <CRLF>.<CRLF>")
          val sb = new StringBuilder
          var l = in.readLine()
          while (l != null && l != ".") { sb.append(l).append("\r\n"); l = in.readLine() }
          data = sb.toString
          reply("250 queued")
        } else if (upper.startsWith("QUIT")) { reply("221 bye"); open = false }
        else reply("500 what")
      }
    }
    sock.close(); server.close()
  }, "fake-smtp")
  thread.setDaemon(true)
  thread.start()

  def awaitDone(ms: Long = 5000): Unit = thread.join(ms)
}

/** Raw-socket SMTP client behind the HtmlTransport seam (no mail
  * library in this environment — the protocol subset is spec'd against
  * an in-process server instead). */
class SmtpTransportSpec extends AnyFunSuite {

  test("delivers the report: protocol order, envelope, headers, base64 body") {
    val srv = new FakeSmtpServer(multilineEhlo = true)
    val html = "<html><body>report &amp; summary — line1\r\n.\r\nline2</body></html>"
    new SmtpHtmlTransport("127.0.0.1", srv.port, "graft@acme.com",
      Seq("ops@acme.com", "oncall@acme.com"))
      .send("graft: pipeline 'daily' — FAILED", html)
    srv.awaitDone()
    val cmds = scala.jdk.CollectionConverters.ListHasAsScala(srv.commands).asScala.toSeq
    // protocol order, with one RCPT per recipient
    assert(cmds.head.startsWith("EHLO "), cmds.head)
    assert(cmds(1) == "MAIL FROM:<graft@acme.com>")
    assert(cmds(2) == "RCPT TO:<ops@acme.com>" && cmds(3) == "RCPT TO:<oncall@acme.com>")
    assert(cmds(4) == "DATA" && cmds.last == "QUIT")
    // headers
    assert(srv.data.contains("From: graft@acme.com"))
    assert(srv.data.contains("To: ops@acme.com, oncall@acme.com"))
    assert(srv.data.contains("Content-Type: text/html; charset=UTF-8"))
    assert(srv.data.contains("Content-Transfer-Encoding: base64"))
    // non-ASCII subject travels as an RFC 2047 encoded word
    val subjectLine = srv.data.linesIterator.find(_.startsWith("Subject: ")).get
    assert(subjectLine.startsWith("Subject: =?UTF-8?B?"), subjectLine)
    // body round-trips through base64 — including the lone "." line
    // that raw transmission would have eaten as end-of-data
    val b64 = srv.data.split("\r\n\r\n", 2)(1).replace("\r\n", "")
    val decoded = new String(java.util.Base64.getMimeDecoder.decode(b64), "UTF-8")
    assert(decoded == html, decoded)
  }

  test("a rejected recipient fails the send with the server's reply") {
    val srv = new FakeSmtpServer(rejectRcpt = Set("gone@acme.com"))
    val e = intercept[RuntimeException] {
      new SmtpHtmlTransport("127.0.0.1", srv.port, "graft@acme.com", Seq("gone@acme.com"))
        .send("s", "<p>x</p>")
    }
    assert(e.getMessage.contains("550") && e.getMessage.contains("gone@acme.com"), e.getMessage)
  }

  test("ASCII subjects stay readable; header encoder is deterministic") {
    assert(SmtpHtmlTransport.encodeHeader("plain report OK") == "plain report OK")
    val enc = SmtpHtmlTransport.encodeHeader("résumé")
    assert(enc.startsWith("=?UTF-8?B?") && enc.endsWith("?="))
    assert(new String(java.util.Base64.getDecoder.decode(
      enc.stripPrefix("=?UTF-8?B?").stripSuffix("?=")), "UTF-8") == "résumé")
  }

  test("failed runs route to failures.to; routine completions to email.to") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], String)]
    def fakeTransport(rcpts: Seq[String]): HtmlTransport =
      (subject, _) => sent += ((rcpts, subject))
    val notifier = new StatusRoutedSmtpNotifier(fakeTransport,
      to = Seq("team@acme.com"), failuresTo = Seq("oncall@acme.com"))
    def info(status: String) = PipelineInfo("p", "test", java.time.LocalDate.parse("2024-06-15"),
      0L, 1L, None, status, None)
    notifier.onPipelineCompletedInfo(info("succeeded"), Nil)
    notifier.onPipelineCompletedInfo(info("failed"), Nil)
    notifier.onPipelineCompletedInfo(info("warning"), Nil)
    assert(sent.map(_._1) == Seq(Seq("team@acme.com"), Seq("oncall@acme.com"), Seq("team@acme.com")))
    // no failure list configured: failures fall back to the team list
    sent.clear()
    new StatusRoutedSmtpNotifier(fakeTransport, Seq("team@acme.com"), Nil)
      .onPipelineCompletedInfo(info("failed"), Nil)
    assert(sent.map(_._1) == Seq(Seq("team@acme.com")))
    // failures.to parses + validates like email.to
    val p = PipelineConfig.parse(
      """notification.email.to = team@acme.com
        |notification.email.failures.to = oncall@acme.com
        |notification.email.allowed.domains = acme.com
        |""".stripMargin)
    assert(p.notifyFailureEmails == Seq("oncall@acme.com"))
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      "notification.email.failures.to = bad@other.io\n" +
        "notification.email.allowed.domains = acme.com\n"))
    assert(e.getMessage.contains("notification.email.failures.to"), e.getMessage)
  }

  test("fanout report notifier drains custom entries once and feeds every transport") {
    import graft.pipeline.{FanoutHtmlReportNotifier, HtmlTransport, NotificationBuilder, NotificationEntry}
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val attached = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def transport(name: String): HtmlTransport = new HtmlTransport {
      override def send(subject: String, html: String): Unit = sent += ((name, subject, html))
      override def sendAttachment(fileName: String, contents: Array[Byte]): Unit =
        attached += ((name, fileName))
    }
    val broken: HtmlTransport = new HtmlTransport {
      override def send(subject: String, html: String): Unit = sys.error("relay down")
      override def sendAttachment(fileName: String, contents: Array[Byte]): Unit =
        fail("a transport whose report send failed must not receive attachments")
    }
    val builder = new NotificationBuilder
    builder.addEntries("custom-entry-alpha")
    builder.addTypedEntries(NotificationEntry.AttachedFile("extra.csv", "a,b\n".getBytes))
    val info = PipelineInfo("p", "test", java.time.LocalDate.parse("2024-06-15"),
      0L, 1L, None, "succeeded", None)
    new FanoutHtmlReportNotifier(
      (_, _) => Seq(transport("file"), broken, transport("smtp")), builder)
      .onPipelineCompletedInfo(info, Nil)
    assert(sent.map(_._1) == Seq("file", "smtp"), "broken transport must not stop the rest")
    assert(sent.forall(_._3.contains("custom-entry-alpha")),
      "BOTH outputs must carry the drained custom entries (single drain, single render)")
    assert(sent.map(_._3).distinct.size == 1, "one render shared by all transports")
    assert(attached.toSeq == Seq(("file", "extra.csv"), ("smtp", "extra.csv")),
      "attachments go only to transports whose report send succeeded")
  }

  test("notification.smtp.* config builds the transport; from is required with host") {
    val p = PipelineConfig.parse(
      """pipeline.name = p
        |notification.email.to = ops@acme.com
        |notification.smtp.host = mail.acme.com
        |notification.smtp.port = 2525
        |notification.smtp.from = graft@acme.com
        |""".stripMargin)
    assert(p.smtp.contains(PipelineConfig.SmtpSettings("mail.acme.com", 2525, "graft@acme.com")))
    assert(p.notifyEmails == Seq("ops@acme.com"))
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      "notification.smtp.host = mail.acme.com\n"))
    assert(e.getMessage.contains("notification.smtp.from"), e.getMessage)
  }
}
