package graft.ingest

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

/** CSV charset transcode with ordered fallback (reference:
  * document_converter/utils.py:107-120 `handle_csv_file`; encodings list
  * :63): try utf-8 → cp1252 → latin1 → iso-8859-1, re-encode as UTF-8;
  * error string (not an exception) if none decodes.
  *
  * Error-as-column convention: the result carries `error`, the caller never
  * sees a throw (SURVEY.md O7/O16).
  */
object Transcode {

  val SupportedCsvEncodings: Seq[String] = Seq("utf-8", "cp1252", "latin1", "iso-8859-1")

  private val charsets: Seq[Charset] = Seq(
    StandardCharsets.UTF_8,
    Charset.forName("windows-1252"),
    StandardCharsets.ISO_8859_1,
    StandardCharsets.ISO_8859_1)

  final case class Result(utf8Bytes: Array[Byte], error: Option[String])

  /** Strict decode (malformed input reports, not replaces) then UTF-8
    * re-encode. */
  def transcodeCsv(content: Array[Byte]): Result = {
    charsets.foreach { cs =>
      try {
        val decoder = cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        val decoded = decoder.decode(ByteBuffer.wrap(content)).toString
        return Result(decoded.getBytes(StandardCharsets.UTF_8), None)
      } catch { case _: CharacterCodingException => () }
    }
    Result(content,
      Some(s"Could not decode CSV file. Supported encodings: ${SupportedCsvEncodings.mkString(", ")}"))
  }
}
