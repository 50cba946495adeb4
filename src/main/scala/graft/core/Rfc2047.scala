package graft.core

import java.nio.charset.Charset
import java.util.Base64

/** Minimal RFC 2047 encoded-word decoder — replaces the reference's use of
  * Python's `email.header.decode_header` (parse.py:324-326). Only the FIRST
  * encoded word of the token is decoded, exactly like the reference's
  * `decode_header(tokens[3])[0]`.
  *
  * Built from the public RFC 2047 spec; no Spark dependency so it can back
  * either a plain UDF or a Catalyst expression.
  */
object Rfc2047 {

  private val EncodedWord = "(?s)^=\\?([^?]+)\\?([bBqQ])\\?(.*?)\\?=".r

  /** Decode the first encoded word of `token`.
    * Throws (→ fault channel) on malformed input or unknown charset, which
    * is what the reference's `str.decode(None)` AttributeError /
    * LookupError paths do. */
  def decodeFirstWord(token: String): String = EncodedWord.findFirstMatchIn(token) match {
    case Some(m) =>
      val charset = Charset.forName(m.group(1))
      val payload = m.group(3)
      val bytes = m.group(2).toUpperCase match {
        case "B" => Base64.getMimeDecoder.decode(payload)
        case _   => decodeQ(payload)
      }
      new String(bytes, charset)
    case None =>
      // decode_header returns the raw str with charset None; the reference
      // then calls .decode(...) on a str → AttributeError → on_fault.
      throw new IllegalArgumentException(
        s"not an RFC 2047 encoded word: $token")
  }

  /** Q-encoding: '_' → space, =XX → byte. */
  private def decodeQ(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '_' => out.write(' '); i += 1
        case '=' if i + 2 < s.length =>
          out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
        case c => out.write(c.toByte.toInt); i += 1
      }
    }
    out.toByteArray
  }
}
