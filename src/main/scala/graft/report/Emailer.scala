package graft.report

import graft.config.EmailConfig
import graft.exec.TableResult

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import scala.util.{Failure, Success, Try}

/** Email delivery of the run report (reference Emailer.scala:32-198).
  *
  * The reference uses javax.mail; that dependency is unavailable here, so
  * this is a minimal RFC 5321/5322 implementation: message assembly as a
  * plain MIME text and a socket SMTP dialogue (HELO → MAIL FROM → RCPT
  * TO → DATA → QUIT). Only sent on failure unless `emailOnPass`
  * (reference Main.scala:105-108). */
object Emailer {

  /** Full RFC822 message text: headers + HTML body. */
  def buildMessage(cfg: EmailConfig, statusWord: String, htmlBody: String): String = {
    val crlf = "\r\n"
    // dot-stuffing per RFC 5321 §4.5.2: a leading '.' on a line would
    // otherwise terminate DATA early
    val stuffed = htmlBody.linesIterator.map(l =>
      if (l.startsWith(".")) "." + l else l).mkString(crlf)
    s"From: ${cfg.from}$crlf" +
      s"To: ${cfg.to.mkString(", ")}$crlf" +
      s"Subject: ${cfg.subject} - $statusWord$crlf" +
      s"MIME-Version: 1.0$crlf" +
      s"Content-Type: text/html; charset=utf-8$crlf" +
      crlf + stuffed
  }

  /** One SMTP conversation; Left(error) on any unexpected reply. Connect
    * and read timeouts bound the whole exchange — a black-holed SMTP host
    * must never hang the validator run past its report. */
  def send(host: String, port: Int, from: String, to: Seq[String],
      message: String, timeoutMs: Int = 10000): Either[String, Unit] =
    Try {
      val socket = new Socket()
      socket.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      try {
        val in = new BufferedReader(new InputStreamReader(socket.getInputStream))
        val out = new PrintWriter(socket.getOutputStream, true)
        def expect(code: Int): Unit = {
          var line = in.readLine()
          // multi-line replies: "250-..." continues, "250 ..." ends
          while (line != null && line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
          require(line != null && line.startsWith(code.toString),
            s"SMTP expected $code, got '$line'")
        }
        def cmd(c: String, code: Int): Unit = { out.print(c + "\r\n"); out.flush(); expect(code) }
        expect(220)
        cmd("HELO graft-validator", 250)
        cmd(s"MAIL FROM:<$from>", 250)
        to.foreach(r => cmd(s"RCPT TO:<$r>", 250))
        cmd("DATA", 354)
        out.print(message + "\r\n.\r\n"); out.flush(); expect(250)
        cmd("QUIT", 221)
      } finally socket.close()
    } match {
      case Success(_) => Right(())
      case Failure(t) => Left(s"SMTP to $host:$port failed: ${t.getMessage}")
    }

  /** Send the HTML report per the reference's policy: on failure always,
    * on pass only with `emailOnPass`. Returns None when no send was due. */
  def sendReport(cfg: EmailConfig, tables: Seq[TableResult],
      emailOnPass: Boolean = false, port: Int = 25): Option[Either[String, Unit]] = {
    val failed = tables.exists(_.failed)
    if (!failed && !emailOnPass) None
    else {
      val status = if (failed) "FAIL" else "PASS"
      val msg = buildMessage(cfg, status, HtmlReport.report(tables))
      Some(send(cfg.smtpHost, port, cfg.from, cfg.to, msg))
    }
  }
}
