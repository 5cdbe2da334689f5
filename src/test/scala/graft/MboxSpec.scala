package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mbox

/** mbox/RFC-5322/MIME conformance. The independent pin is Python's
  * reference `email` package + `mailbox` module (live-gated, both
  * directions): our synth mboxes parse identically there, and a
  * Python-generated multipart mbox parses identically here.
  */
class MboxSpec extends AnyFunSuite {

  private def py(script: String, stdin: Array[Byte] = null): (Int, String) = {
    val pb = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true)
    val p = pb.start()
    if (stdin != null) p.getOutputStream.write(stdin)
    p.getOutputStream.close()
    (p.waitFor(), new String(p.getInputStream.readAllBytes(), "UTF-8"))
  }

  test("structural: splitting, unfolding, encodings, multipart") {
    val mbox = Mbox.synthMbox(Seq(
      ("plain subject", "a@x.test", Seq("hello body\nline two\n")),
      ("Grüße ünïcode", "b@x.test", Seq(
        "first part with =equals= and ünïcode\n",
        "second part\nFrom the start of a line\n",
        "third part\n")),
      ("qp subject", "c@x.test", Seq("soft wrap " + "x" * 100 + "\n"))))
    val msgs = Mbox.split(mbox)
    assert(msgs != null && msgs.length == 3)
    val m0 = Mbox.message(msgs(0))
    assert(m0 != null && m0.subject == "plain subject")
    assert(m0.parts.length == 1 &&
      m0.parts(0).text == "hello body\nline two\n")
    val m1 = Mbox.message(msgs(1))
    assert(m1 != null && m1.subject == "Grüße ünïcode") // B-encoded word
    assert(m1.parts.length == 3)
    assert(m1.parts(0).text == "first part with =equals= and ünïcode\n")
    assert(m1.parts(1).text == "second part\nFrom the start of a line\n")
    val m2 = Mbox.message(msgs(2))
    assert(m2 != null &&
      m2.parts(0).text == "soft wrap " + "x" * 100 + "\n")
    // folded headers unfold
    val folded = ("From x\nSubject: one\n two\n\nbody\n").getBytes("ISO-8859-1")
    val fm = Mbox.message(Mbox.split(folded)(0))
    assert(fm.subject == "one two")
    // Q-encoded word with underscore-as-space
    assert(Mbox.decodeWords("=?utf-8?Q?hello=20w=C3=B6rld_x?=") ==
      "hello wörld x")
    // UPPERCASE boundary (the Outlook/JavaMail shape) with trailing
    // transport padding on the delimiter line (RFC 2046 §5.1.1)
    val upper = ("From x\n" +
      "Content-Type: multipart/mixed; boundary=\"----=_Part_ABC\"\n\n" +
      "------=_Part_ABC  \n" +
      "Content-Type: text/plain; charset=us-ascii\n\npart one\n\n" +
      "------=_Part_ABC--\t\n").getBytes("ISO-8859-1")
    val um = Mbox.message(Mbox.split(upper)(0))
    assert(um != null && um.parts.length == 1 &&
      um.parts(0).text == "part one\n")
    // adjacent encoded words: separating whitespace is DELETED
    assert(Mbox.decodeWords("=?utf-8?B?Zm9v?= =?utf-8?B?YmFy?=") == "foobar")
    // damage: unterminated multipart, broken QP
    assert(Mbox.qpDecode("ab=zz") == null)
    assert(Mbox.qpDecode("ab=4") == null)
    val unterminated = ("From x\nContent-Type: multipart/mixed; " +
      "boundary=\"b\"\n\n--b\n\npart\n").getBytes("ISO-8859-1")
    assert(Mbox.message(Mbox.split(unterminated)(0)) == null)
    assert(Mbox.split("not an mbox".getBytes("US-ASCII")) == null)
  }

  test("python email parses our synth mbox identically (gated)") {
    val mbox = Mbox.synthMbox(Seq(
      ("subject one", "a@x.test", Seq("body one\n")),
      ("Grüße zwei", "b@x.test", Seq("part eins\n", "part zwei\n"))))
    val dir = java.nio.file.Files.createTempDirectory("mbox")
    val f = dir.resolve("t.mbox")
    try {
      java.nio.file.Files.write(f, mbox)
      val (rc, out) = py(
        s"""
           |import mailbox
           |mb = mailbox.mbox(r'${f.toString}')
           |msgs = list(mb)
           |assert len(msgs) == 2, len(msgs)
           |assert msgs[0]['Subject'] == 'subject one'
           |assert msgs[0].get_payload(decode=True) == b'body one\\n'
           |import email.header
           |s = str(email.header.make_header(
           |    email.header.decode_header(msgs[1]['Subject'])))
           |assert s == 'Gr\\u00fc\\u00dfe zwei', s
           |parts = msgs[1].get_payload()
           |assert len(parts) == 2
           |assert parts[0].get_payload(decode=True).decode() == 'part eins\\n'
           |assert parts[1].get_payload(decode=True).decode() == 'part zwei\\n'
           |print('OK')
           |""".stripMargin)
      assert(rc == 0 && out.trim == "OK", out)
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("python-generated multipart mbox parses here (gated)") {
    val (rc, hex) = py(
      """
        |import email.mime.multipart, email.mime.text, mailbox, sys
        |import tempfile, os, binascii
        |d = tempfile.mkdtemp()
        |path = os.path.join(d, 'g.mbox')
        |mb = mailbox.mbox(path)
        |m = email.mime.multipart.MIMEMultipart()
        |m['Subject'] = 'from python'
        |m['From'] = 'py@x.test'
        |# chr() escapes: non-ASCII process ARGS are mangled under the
        |# POSIX locale (the mbox itself travels back as hex bytes)
        |m.attach(email.mime.text.MIMEText(
        |    'erster Teil ' + chr(0xe4) + chr(0xf6) + chr(0xfc) + '\n',
        |    'plain', 'utf-8'))
        |m.attach(email.mime.text.MIMEText('second part\n', 'plain'))
        |mb.add(m)
        |m2 = email.mime.text.MIMEText('single body\n', 'plain', 'utf-8')
        |m2['Subject'] = 'zweite'
        |mb.add(m2)
        |mb.flush()
        |print(binascii.hexlify(open(path,'rb').read()).decode())
        |""".stripMargin)
    assume(rc == 0, s"python unavailable: $hex")
    val mbox = hex.trim.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val msgs = Mbox.split(mbox)
    assert(msgs != null && msgs.length == 2)
    val m0 = Mbox.message(msgs(0))
    assert(m0 != null && m0.subject == "from python")
    assert(m0.parts.length == 2)
    assert(m0.parts(0).text == "erster Teil äöü\n")
    assert(m0.parts(1).text == "second part\n")
    val m1 = Mbox.message(msgs(1))
    assert(m1 != null && m1.subject == "zweite")
    assert(m1.parts(0).text == "single body\n")
  }
}
