package graft.ops

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Charset detection + transcoding — the mojibake gate: crawl bytes
  * arrive in whatever encoding the origin server chose, and feeding
  * mis-decoded text downstream silently corrupts every operator after
  * it. Real detection, JDK-only:
  *
  *  1. BOM sniff: UTF-8 (EF BB BF) and UTF-16LE/BE (FF FE / FE FF);
  *  2. strict UTF-8 validation (`CharsetDecoder` with REPORT — the
  *     property that makes this sound: valid UTF-8 is self-escaping,
  *     a Latin-1 byte ≥ 0x80 is never a valid continuation start);
  *  3. fallback to Latin-1 (ISO-8859-1), which decodes any byte.
  *
  * Fixture protocol: each document's payload is its text plus a
  * non-ASCII suffix, encoded per `doc_id % 4` — UTF-8 bare, UTF-8
  * with BOM, UTF-16LE with BOM, Latin-1 — and the engine must
  * recover the identical string through detection, never the branch
  * formula. The DuckDB oracle states byte counts closed-form
  * (2-byte é in UTF-8, 2 bytes/char + BOM in UTF-16LE, 1 byte/char
  * in Latin-1) and hashes the expected decoded text directly.
  *
  * Shape at scale: row-local (zero exchanges), one scan, per-row
  * decoder CPU — the codec-query plan shape.
  */
object Encoding {

  /** Detected charset + decoded text. */
  final case class Detected(charset: String, hadBom: Boolean, text: String)

  private val Utf8Bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)

  /** Detect and decode. Detection order: BOMs, strict UTF-8,
    * Latin-1 fallback.
    */
  def detect(bytes: Array[Byte]): Detected = {
    if (bytes.length >= 3 && bytes(0) == Utf8Bom(0) &&
      bytes(1) == Utf8Bom(1) && bytes(2) == Utf8Bom(2))
      Detected("utf-8", hadBom = true,
        new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8))
    else if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      Detected("utf-16le", hadBom = true,
        new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE))
    else if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      Detected("utf-16be", hadBom = true,
        new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE))
    else strictUtf8(bytes) match {
      case Some(s) => Detected("utf-8", hadBom = false, s)
      case None => Detected("latin-1", hadBom = false,
        new String(bytes, StandardCharsets.ISO_8859_1))
    }
  }

  /** Decode as UTF-8 with malformed/unmappable input REPORTed (the
    * JDK default silently replaces with U+FFFD, which would make
    * Latin-1 bytes "valid"): None on any violation.
    */
  def strictUtf8(bytes: Array[Byte]): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(ByteBuffer.wrap(bytes)).toString)
    } catch { case _: CharacterCodingException => None }

  // -------------------------------------------------------------------
  // fixture + query

  private[graft] val Suffix = " café" // " café": é forces non-ASCII

  /** The per-branch encoded payload (mirrored closed-form by the
    * oracle).
    */
  private[graft] def synthPayload(docId: Long, text: String): Array[Byte] = {
    val s = text + Suffix
    (docId % 4) match {
      case 0 => s.getBytes(StandardCharsets.UTF_8)
      case 1 => Utf8Bom ++ s.getBytes(StandardCharsets.UTF_8)
      case 2 => Array[Byte](0xff.toByte, 0xfe.toByte) ++
        s.getBytes(StandardCharsets.UTF_16LE)
      case _ => s.getBytes(StandardCharsets.ISO_8859_1)
    }
  }

  final case class CharsetRow(
      doc_id: Long, detected: String, had_bom: Boolean, n_bytes: Int,
      n_chars: Int, decoded_fp: String)

  /** Per-document verdict: detected charset, BOM flag, byte/char
    * counts, and the md5 of the decoded text re-encoded as UTF-8 —
    * equality with the oracle pins the transcode lossless.
    */
  def charsetDetect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, text) =>
          val bytes = synthPayload(docId, text)
          val d = detect(bytes)
          md.reset()
          val fp = md.digest(d.text.getBytes(StandardCharsets.UTF_8))
            .map(b => f"$b%02x").mkString
          CharsetRow(docId, d.charset, d.hadBom, bytes.length,
            d.text.length, fp)
        }
      }
      .toDF()
  }
}
