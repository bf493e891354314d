package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Protocol-buffers WIRE FORMAT, from scratch — the RPC-side
  * serialization sibling of [[Avro]]'s file-side container. The
  * decoder is a real tag-dispatch walk: each key is
  * `(field << 3) | wireType`, with varint (0), fixed64 (1),
  * length-delimited (2), and fixed32 (5) wire types, zigzag `sint64`
  * fields, packed repeated varints, and a NESTED message parsed
  * recursively from its length-delimited payload.
  *
  * Forward compatibility is load-bearing, not incidental: fields the
  * schema does not know are SKIPPED BY WIRE TYPE (the behavior that
  * lets a v1 reader survive a v2 writer), and the corpus fixture
  * injects an unknown field on odd documents — a decoder that
  * doesn't implement skipping desyncs and fails the oracle on half
  * the corpus. Declines (None) on: reserved/unknown wire types,
  * varint overruns, truncated length-delimited payloads, and
  * trailing garbage inside a nested payload.
  */
object Proto {

  final case class Meta(lang: String, n: Long)
  final case class Doc(
      id: Long, name: String, weight: Double, checksum: Long,
      vals: Seq[Long], meta: Meta)

  private def writeVarint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += (v & 0x7f).toByte
  }

  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)

  private def key(field: Int, wire: Int): Long =
    ((field.toLong << 3) | wire)

  private def writeLenDelim(out: ArrayBuffer[Byte], field: Int,
      payload: Array[Byte]): Unit = {
    writeVarint(out, key(field, 2))
    writeVarint(out, payload.length.toLong)
    out ++= payload
  }

  /** Encode a [[Doc]]; `unknownField` additionally injects a
    * varint field 15 and a length-delimited field 16 the schema
    * doesn't know — decoders must skip both.
    */
  def encode(d: Doc, unknownField: Boolean = false): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    writeVarint(out, key(1, 0)); writeVarint(out, zigzag(d.id))
    if (unknownField) {
      writeVarint(out, key(15, 0)); writeVarint(out, 0xdeadL)
    }
    writeLenDelim(out, 2, d.name.getBytes("UTF-8"))
    writeVarint(out, key(3, 1))
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(java.lang.Double.doubleToLongBits(d.weight))
    out ++= bb.array()
    writeVarint(out, key(4, 5))
    val b4 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(d.checksum.toInt)
    out ++= b4.array()
    val packed = ArrayBuffer.empty[Byte]
    d.vals.foreach(v => writeVarint(packed, v))
    writeLenDelim(out, 5, packed.toArray)
    if (unknownField)
      writeLenDelim(out, 16, "future-bytes".getBytes("UTF-8"))
    val meta = ArrayBuffer.empty[Byte]
    writeLenDelim(meta, 1, d.meta.lang.getBytes("UTF-8"))
    writeVarint(meta, key(2, 0)); writeVarint(meta, d.meta.n)
    writeLenDelim(out, 6, meta.toArray)
    out.toArray
  }

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    var failed = false
    def done: Boolean = p >= end
    def u8(): Int =
      if (p >= end) { failed = true; 0 }
      else { val v = b(p) & 0xff; p += 1; v }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var c = u8()
      while ((c & 0x80) != 0 && !failed) {
        v |= (c & 0x7fL) << shift
        shift += 7
        if (shift > 63) { failed = true; return 0L }
        c = u8()
      }
      v | ((c & 0x7fL) << shift)
    }
    def fixed(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def slice(len: Long): Option[(Int, Int)] = {
      if (len < 0 || p + len > end) { failed = true; None }
      else { val r = (p, p + len.toInt); p += len.toInt; Some(r) }
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => fixed(8)
      case 2 => slice(varint())
      case 5 => fixed(4)
      case _ => failed = true
    }
  }

  /** Decode a [[Doc]] message; None on any malformed structure. */
  def decode(b: Array[Byte]): Option[Doc] = {
    var id = 0L; var name = ""; var weight = 0.0; var checksum = 0L
    var vals = Seq.empty[Long]; var meta = Meta("", 0L)
    val r = new Reader(b, 0, b.length)
    while (!r.done && !r.failed) {
      val k = r.varint()
      val field = (k >>> 3).toInt
      val wire = (k & 7).toInt
      (field, wire) match {
        case (1, 0) =>
          val z = r.varint()
          id = (z >>> 1) ^ -(z & 1L)
        case (2, 2) =>
          r.slice(r.varint()).foreach { case (a, e) =>
            name = new String(b, a, e - a, "UTF-8")
          }
        case (3, 1) =>
          weight = java.lang.Double.longBitsToDouble(r.fixed(8))
        case (4, 5) =>
          checksum = r.fixed(4) & 0xffffffffL
        case (5, 2) =>
          r.slice(r.varint()).foreach { case (a, e) =>
            val pr = new Reader(b, a, e)
            val vs = ArrayBuffer.empty[Long]
            while (!pr.done && !pr.failed) vs += pr.varint()
            if (pr.failed) r.failed = true else vals = vs.toSeq
          }
        case (6, 2) =>
          r.slice(r.varint()).foreach { case (a, e) =>
            val mr = new Reader(b, a, e)
            var lang = ""; var n = 0L
            while (!mr.done && !mr.failed) {
              val mk = mr.varint()
              ((mk >>> 3).toInt, (mk & 7).toInt) match {
                case (1, 2) =>
                  mr.slice(mr.varint()).foreach { case (ma, me) =>
                    lang = new String(b, ma, me - ma, "UTF-8")
                  }
                case (2, 0) => n = mr.varint()
                case (_, w) => mr.skip(w)
              }
            }
            if (mr.failed) r.failed = true else meta = Meta(lang, n)
          }
        case (_, w) => r.skip(w) // forward compatibility
      }
    }
    if (r.failed) None
    else Some(Doc(id, name, weight, checksum, vals, meta))
  }

  // --------------- corpus query ---------------

  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Per-document protobuf round-trip: every field derived
    * closed-form, odd docs carrying injected UNKNOWN fields the
    * decoder must skip to stay in sync — forward compatibility as an
    * oracle-checked behavior, not a comment. Zero-exchange codec
    * plan; scores/weights are integer-derived doubles.
    */
  def protoRecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 12).as("nm"),
        col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, nm, lang, nChars) =>
          val d = Doc(
            id = id - 500, // negatives exercise zigzag
            name = nm,
            weight = (id % 89).toDouble / 8.0,
            checksum = (id * 2654435761L) & 0xffffffffL,
            vals = Seq(id % 7, id % 11, id % 13, nChars),
            meta = Meta(lang, nChars))
          val wire = encode(d, unknownField = id % 2 == 1)
          val back = decode(wire).getOrElse(
            throw new IllegalStateException(s"proto fixture failed: $id"))
          (id, back.id, back.name, back.weight, back.checksum,
            back.vals.length, back.vals.sum, back.meta.lang,
            back.meta.n)
        }
      }
      .toDF("doc_id", "rec_id", "name", "weight", "checksum",
        "n_vals", "sum_vals", "lang", "meta_n")
  }
}
