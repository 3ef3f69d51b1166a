package graft.sinks

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket

/** Minimal SMTP transport for the `mail` sink — the send half of the
  * reference's mail verb (/root/reference/pybabe/mail.py:80-87: EHLO,
  * optional AUTH, MAIL FROM/RCPT TO/DATA, QUIT). Plain-socket client, no
  * libraries; STARTTLS is out of scope in this zero-egress environment
  * (the reference gates it behind a flag too). `Sinks.mailString` composes
  * the MIME message; this delivers it.
  */
object Smtp {

  /** Send a composed MIME message. AUTH PLAIN when a login is given. */
  def send(host: String, port: Int, from: String, to: Seq[String],
           mimeMessage: String, login: String = "", password: String = ""): Unit = {
    val socket = new Socket(host, port)
    try {
      socket.setSoTimeout(30000)
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream, "UTF-8"))
      val out = new OutputStreamWriter(socket.getOutputStream, "UTF-8")

      def expect(codes: Int*): String = {
        var line = in.readLine()
        if (line == null) sys.error("smtp: connection closed")
        // multi-line replies: "250-..." continues, "250 ..." ends
        while (line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        val code = line.take(3).toIntOption.getOrElse(-1)
        require(codes.contains(code), s"smtp: expected ${codes.mkString("/")}, got '$line'")
        line
      }
      def cmd(s: String, codes: Int*): Unit = {
        out.write(s + "\r\n"); out.flush()
        expect(codes: _*)
      }

      expect(220)
      cmd(s"EHLO graft", 250)
      if (login.nonEmpty) {
        val token = java.util.Base64.getEncoder.encodeToString(
          ("\u0000" + login + "\u0000" + password).getBytes("UTF-8"))
        cmd(s"AUTH PLAIN $token", 235)
      }
      cmd(s"MAIL FROM:<$from>", 250)
      to.foreach(r => cmd(s"RCPT TO:<$r>", 250, 251))
      cmd("DATA", 354)
      // dot-stuffing per RFC 5321 §4.5.2
      val stuffed = mimeMessage.linesWithSeparators.map { l =>
        if (l.startsWith(".")) "." + l else l
      }.mkString
      out.write(stuffed)
      if (!stuffed.endsWith("\r\n") && !stuffed.endsWith("\n")) out.write("\r\n")
      cmd(".", 250)
      cmd("QUIT", 221)
    } finally socket.close()
  }

  /** Compose-and-send in one call — the reference's `mail` verb surface. */
  def mail(df: org.apache.spark.sql.DataFrame, host: String, port: Int,
           from: String, to: Seq[String], subject: String,
           name: String = "stream", login: String = "", password: String = ""): Unit =
    send(host, port, from, to,
      Sinks.mailString(df, from, to, subject, name), login, password)
}
