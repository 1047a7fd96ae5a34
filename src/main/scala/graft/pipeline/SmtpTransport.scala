package graft.pipeline

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/**
 * SMTP delivery for the HTML end-of-run report (reference: pramen/core
 * .../core/notify/Sendable.scala:33 — the reference builds a
 * MimeMessage and hands it to javax.mail `Transport.send`). No mail
 * library ships in this environment, so graft speaks the client side
 * of RFC 5321 directly over a socket: the subset a report mail needs
 * (EHLO, MAIL FROM, RCPT TO, DATA, QUIT) is small, and a scripted
 * in-process server can exercise the whole exchange in tests.
 *
 * The body travels base64-encoded (`Content-Transfer-Encoding:
 * base64`), which sidesteps SMTP transparency entirely — no base64
 * character is `.`, so a report line can never be eaten as the
 * end-of-data marker. Non-ASCII subjects are RFC 2047 encoded-words.
 *
 * Plain SMTP (port 25 relay inside the perimeter, the reference's
 * default posture); auth/TLS belong to a side-car relay.
 */
final class SmtpHtmlTransport(
    host: String,
    port: Int,
    from: String,
    to: Seq[String],
    timeoutMs: Int = 60000,
    heloName: String = "graft.local") extends HtmlTransport {
  require(to.nonEmpty, "SMTP transport needs at least one recipient")

  override def send(subject: String, html: String): Unit = {
    val socket = new Socket()
    try {
      socket.connect(new InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.ISO_8859_1))
      val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.ISO_8859_1)

      def expect(codes: Set[Int]): String = {
        // replies can be multiline: "250-..." continues, "250 ..." ends
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        if (line == null)
          throw new RuntimeException(s"SMTP server closed the connection (last: $first)")
        val code = line.take(3).toIntOption.getOrElse(-1)
        if (!codes.contains(code))
          throw new RuntimeException(s"SMTP error from $host:$port: $line")
        line
      }
      def command(cmd: String, ok: Set[Int]): Unit = {
        out.write(cmd + "\r\n"); out.flush(); expect(ok)
      }

      expect(Set(220))
      command(s"EHLO $heloName", Set(250))
      command(s"MAIL FROM:<$from>", Set(250))
      // 251 = "user not local; will forward" — still accepted
      to.foreach(rcpt => command(s"RCPT TO:<$rcpt>", Set(250, 251)))
      command("DATA", Set(354))
      out.write(message(subject, html))
      out.write("\r\n.\r\n"); out.flush()
      expect(Set(250))
      command("QUIT", Set(221))
    } finally socket.close()
  }

  private def message(subject: String, html: String): String = {
    val b64 = java.util.Base64.getMimeEncoder(76, "\r\n".getBytes)
      .encodeToString(html.getBytes(StandardCharsets.UTF_8))
    Seq(
      s"From: $from",
      s"To: ${to.mkString(", ")}",
      s"Subject: ${SmtpHtmlTransport.encodeHeader(subject)}",
      s"Date: ${java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
        .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))}",
      "MIME-Version: 1.0",
      "Content-Type: text/html; charset=UTF-8",
      "Content-Transfer-Encoding: base64",
      "",
      b64).mkString("\r\n")
  }
}

/** Routes the HTML report to the recipient list matching the run's
  * final status (reference: core/config/Keys MAIL_FAILURES_TO —
  * failed runs page the on-call list, routine completions go to the
  * team list). Falls back to `to` when no failure list is set. */
final class StatusRoutedSmtpNotifier(
    transportFor: Seq[String] => HtmlTransport,
    to: Seq[String],
    failuresTo: Seq[String]) extends PipelineNotificationTarget {
  override def onPipelineCompletedInfo(info: PipelineInfo, results: Seq[TaskResult]): Unit = {
    val recipients = if (info.status == "failed" && failuresTo.nonEmpty) failuresTo else to
    if (recipients.nonEmpty)
      new HtmlReportingNotifier(transportFor(recipients)).onPipelineCompletedInfo(info, results)
  }
}

object SmtpHtmlTransport {
  /** RFC 2047 encoded-word for non-ASCII header values; plain ASCII
    * passes through readable. */
  def encodeHeader(value: String): String =
    if (value.forall(c => c >= ' ' && c < 127)) value
    else "=?UTF-8?B?" + java.util.Base64.getEncoder
      .encodeToString(value.getBytes(StandardCharsets.UTF_8)) + "?="
}
