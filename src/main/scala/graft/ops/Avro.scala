package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Avro Object Container Files, from scratch (JDK-only) — the
  * remaining big-data interchange format next to parquet/ORC/CSV/
  * JSONL: `Obj\1` magic, a file-metadata MAP (schema JSON + codec)
  * in Avro binary map encoding, a random 16-byte sync marker, then
  * data blocks of `count, byteLength, payload, sync` with the
  * payload deflated when `avro.codec` says so.
  *
  * The binary layer is the real one: longs are ZIGZAG-folded
  * VARINTs (7-bit little-endian groups, continuation high bit),
  * strings/bytes are length-prefixed, doubles are 8-byte
  * little-endian IEEE. The reader verifies every block's sync marker
  * against the header's — a torn or spliced file desyncs loudly —
  * and checks the declared record schema matches the subset it
  * decodes (a record of `long`/`string`/`double` fields, in order).
  * Unknown codecs, schema mismatches, varint overruns, and trailing
  * garbage decline to None.
  *
  * The `avro_records` query rides the shared zero-exchange codec
  * plan: synthesize rows → encode an OCF per document (even docs
  * null codec, odd deflate) → real parse; DuckDB recomputes every
  * field closed-form.
  */
object Avro {

  final case class Rec(id: Long, tag: String, score: Double)

  /** The record schema the subset reads/writes (field order fixed). */
  val SchemaJson: String =
    """{"type":"record","name":"doc","fields":[""" +
      """{"name":"id","type":"long"},""" +
      """{"name":"tag","type":"string"},""" +
      """{"name":"score","type":"double"}]}"""

  // --------------- binary primitives ---------------

  private def writeVarLong(out: ArrayBuffer[Byte], n: Long): Unit = {
    var z = (n << 1) ^ (n >> 63) // zigzag
    while ((z & ~0x7fL) != 0) {
      out += ((z & 0x7f) | 0x80).toByte
      z >>>= 7
    }
    out += (z & 0x7f).toByte
  }

  private final class Reader(b: Array[Byte], var p: Int) {
    var failed = false
    def u8(): Int =
      if (p >= b.length) { failed = true; 0 }
      else { val v = b(p) & 0xff; p += 1; v }
    def varLong(): Long = {
      var z = 0L
      var shift = 0
      var c = u8()
      while ((c & 0x80) != 0 && !failed) {
        z |= (c & 0x7fL) << shift
        shift += 7
        if (shift > 63) { failed = true; return 0L }
        c = u8()
      }
      z |= (c & 0x7fL) << shift
      (z >>> 1) ^ -(z & 1L) // un-zigzag
    }
    def bytes(n: Int): Array[Byte] =
      if (n < 0 || p + n > b.length) { failed = true; Array.empty }
      else { val v = java.util.Arrays.copyOfRange(b, p, p + n); p += n; v }
    def string(): String = {
      val n = varLong()
      if (n < 0 || n > Int.MaxValue) { failed = true; "" }
      else new String(bytes(n.toInt), "UTF-8")
    }
    def doubleLe(): Double = {
      val v = bytes(8)
      if (failed) 0.0
      else java.lang.Double.longBitsToDouble(
        java.nio.ByteBuffer.wrap(v)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    }
  }

  private def writeString(out: ArrayBuffer[Byte], s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeVarLong(out, b.length.toLong)
    out ++= b
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateRaw(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return None
        } else out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  // --------------- container ---------------

  /** Write an OCF holding `recs`, split into blocks of `blockRecords`
    * records; `deflate` selects the `deflate` codec, else `null`.
    * The sync marker derives deterministically from `syncSeed`.
    */
  def encode(recs: Seq[Rec], deflate: Boolean,
      blockRecords: Int = 2, syncSeed: Long = 0x5eed): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    out ++= Array[Byte]('O', 'b', 'j', 1)
    // metadata map: one block of 2 entries, then end-of-map 0
    writeVarLong(out, 2L)
    writeString(out, "avro.schema"); writeString(out, SchemaJson)
    writeString(out, "avro.codec")
    writeString(out, if (deflate) "deflate" else "null")
    writeVarLong(out, 0L)
    val sync = new Array[Byte](16)
    val rnd = new java.util.Random(syncSeed)
    rnd.nextBytes(sync)
    out ++= sync
    recs.grouped(blockRecords).foreach { group =>
      val body = ArrayBuffer.empty[Byte]
      group.foreach { r =>
        writeVarLong(body, r.id)
        writeString(body, r.tag)
        val bits = java.lang.Double.doubleToLongBits(r.score)
        val bb = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(bits)
        body ++= bb.array()
      }
      val payload =
        if (deflate) deflateRaw(body.toArray) else body.toArray
      writeVarLong(out, group.length.toLong)
      writeVarLong(out, payload.length.toLong)
      out ++= payload
      out ++= sync
    }
    out.toArray
  }

  /** Read an OCF of the subset schema; returns (codec, records).
    * None on bad magic, unknown codec, schema mismatch, sync-marker
    * mismatch, varint/length overruns, or trailing garbage.
    */
  def decode(b: Array[Byte]): Option[(String, Seq[Rec])] = {
    if (b.length < 20 || b(0) != 'O' || b(1) != 'b' || b(2) != 'j' ||
      b(3) != 1) return None
    val r = new Reader(b, 4)
    var schema: String = null
    var codec = "null"
    var n = r.varLong()
    while (n != 0L && !r.failed) {
      if (n < 0) { // negative count form: abs count then byte size
        n = -n; r.varLong()
      }
      var i = 0L
      while (i < n && !r.failed) {
        val k = r.string(); val v = r.string()
        if (k == "avro.schema") schema = v
        if (k == "avro.codec") codec = v
        i += 1
      }
      n = r.varLong()
    }
    if (r.failed || schema == null) return None
    // schema check: whitespace-insensitive equality with the subset
    if (schema.replaceAll("\\s", "") != SchemaJson) return None
    if (codec != "null" && codec != "deflate") return None
    val sync = r.bytes(16)
    if (r.failed) return None
    val recs = ArrayBuffer.empty[Rec]
    while (r.p < b.length) {
      val count = r.varLong()
      val size = r.varLong()
      if (r.failed || count <= 0 || size < 0) return None
      val raw = r.bytes(size.toInt)
      if (r.failed) return None
      val blockSync = r.bytes(16)
      if (r.failed || !java.util.Arrays.equals(sync, blockSync))
        return None
      val body =
        if (codec == "null") raw
        else inflateRaw(raw).getOrElse(return None)
      val br = new Reader(body, 0)
      var i = 0L
      while (i < count) {
        val id = br.varLong()
        val tag = br.string()
        val score = br.doubleLe()
        if (br.failed) return None
        recs += Rec(id, tag, score)
        i += 1
      }
      if (br.p != body.length) return None // trailing bytes in block
    }
    Some((codec, recs.toSeq))
  }

  // --------------- corpus query ---------------

  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Per-document OCF inventory: three records per doc through the
    * real container (even docs `null` codec, odd `deflate`), decoded
    * back and emitted with the codec AS PARSED from the metadata map.
    * Scores are integer-derived doubles, so the IEEE bytes round-trip
    * bit-exactly and DuckDB recomputes them closed-form.
    */
  def avroRecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 8).as("t0"),
        substring(col("text"), 9, 8).as("t1"),
        substring(col("text"), 17, 8).as("t2"))
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, t0, t1, t2) =>
          val recs = Seq(t0, t1, t2).zipWithIndex.map { case (t, j) =>
            Rec(id * 3 + j, t, (id % 97).toDouble / 4.0 + j)
          }
          val ocf = encode(recs, deflate = id % 2 == 1,
            syncSeed = id)
          val (codec, parsed) = decode(ocf).getOrElse(
            throw new IllegalStateException(s"ocf fixture failed for $id"))
          parsed.zipWithIndex.map { case (rr, j) =>
            (id, j, rr.id, rr.tag, rr.score, codec)
          }
        }
      }
      .toDF("doc_id", "ordinal", "rec_id", "tag", "score", "codec")
  }
}
