package graft

import graft.config.EmailConfig
import graft.exec.Runner
import graft.model.{NegativeCheck, TableSpec}
import graft.report.Emailer

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket

/** SMTP delivery against an in-JVM mock server (the reference tests the
  * same way — EmailerSpec with a local mock). */
class EmailerSpec extends SparkSuite {
  import spark.implicits._

  /** Single-connection mock SMTP server; returns (port, future of the
    * DATA payload it captured). */
  private def mockSmtp(): (Int, java.util.concurrent.CompletableFuture[String]) = {
    val server = new ServerSocket(0)
    val captured = new java.util.concurrent.CompletableFuture[String]()
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
        val out = new PrintWriter(sock.getOutputStream, true)
        def reply(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
        reply("220 mock ESMTP")
        val data = new StringBuilder
        var inData = false
        var line = in.readLine()
        while (line != null) {
          if (inData) {
            if (line == ".") { inData = false; reply("250 ok: queued") }
            else data.append(line).append('\n')
          } else line.split(" ").head.toUpperCase match {
            case "HELO" | "EHLO" => reply("250 mock")
            case "MAIL" | "RCPT" => reply("250 ok")
            case "DATA" => inData = true; reply("354 go ahead")
            case "QUIT" => reply("221 bye"); sock.close(); line = null
            case _ => reply("250 ok")
          }
          if (line != null) line = in.readLine()
        }
        captured.complete(data.toString)
      } catch { case e: Throwable => captured.completeExceptionally(e) }
      finally server.close()
    })
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, captured)
  }

  test("message assembly: headers, subject status, dot-stuffing") {
    val cfg = EmailConfig("h", "validator run", "me@x", Seq("a@x", "b@x"))
    val msg = Emailer.buildMessage(cfg, "FAIL", "<html>\n.leading dot line\nbody</html>")
    assert(msg.contains("From: me@x\r\n"))
    assert(msg.contains("To: a@x, b@x\r\n"))
    assert(msg.contains("Subject: validator run - FAIL\r\n"))
    assert(msg.contains("\r\n..leading dot line\r\n")) // RFC 5321 dot-stuffing
  }

  test("sendReport delivers the HTML report through a real SMTP dialogue") {
    val (port, captured) = mockSmtp()
    val df = Seq(("k", -1)).toDF("key", "v")
    val result = Runner.run(spark, TableSpec("t", _ => df,
      checks = Seq(NegativeCheck("v", None, "neg"))))
    assert(result.failed)
    val cfg = EmailConfig("localhost", "graft report", "noreply@graft", Seq("oncall@graft"))
    val sent = Emailer.sendReport(cfg, Seq(result), port = port)
    assert(sent.contains(Right(())), s"send failed: $sent")
    val payload = captured.get(10, java.util.concurrent.TimeUnit.SECONDS)
    assert(payload.contains("Subject: graft report - FAIL"))
    assert(payload.contains("Validator Report"))
  }

  test("sendReport honors the on-failure-only policy") {
    val df = Seq(("k", 1)).toDF("key", "v")
    val passing = Runner.run(spark, TableSpec("t", _ => df,
      checks = Seq(NegativeCheck("v", None, "neg"))))
    assert(!passing.failed)
    val cfg = EmailConfig("localhost", "s", "f@x", Seq("t@x"))
    assert(Emailer.sendReport(cfg, Seq(passing)).isEmpty) // pass, no emailOnPass
    // emailOnPass forces a send attempt (fails fast: nothing listening)
    val attempted = Emailer.sendReport(cfg, Seq(passing), emailOnPass = true, port = 1)
    assert(attempted.exists(_.isLeft))
  }
}
