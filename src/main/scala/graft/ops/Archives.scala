package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Archive containers — the shapes bulk corpus drops actually arrive
  * in (a crawl dump is a tarball of WARCs; a dataset mirror is a zip).
  * Both readers are from-scratch walks of the real on-disk structure:
  *
  * TAR (POSIX ustar): 512-byte blocks; each header carries NUL-padded
  * name/prefix, OCTAL size/mtime, a checksum computed over the header
  * with the checksum field blanked to spaces, the `ustar` magic, and
  * a typeflag; payloads pad to block boundaries and the archive ends
  * with two zero blocks. The checksum is verified per entry — a
  * corrupted header declines the archive rather than desyncing the
  * block walk.
  *
  * ZIP: members are located through the CENTRAL DIRECTORY, found via
  * the end-of-central-directory record scanned BACKWARD from EOF
  * (the comment makes the EOCD position variable) — the streaming
  * local-header walk misreads archives with overwritten or deleted
  * members, which is why every correct unzip is directory-driven.
  * Stored (method 0) and raw-deflate (method 8, RFC 1951 via
  * `Inflater(nowrap)`) members are supported; every payload is
  * CRC-32-verified against the directory entry. Anything else —
  * encrypted flags, other methods, size mismatches — declines.
  *
  * Both `tar_members` / `zip_members` queries share the zero-exchange
  * codec plan: synthesize → encode → real parse, row-local, with the
  * DuckDB oracle recomputing names/sizes/content-md5 closed-form.
  */
object Archives {

  /** One archive member: path, type flag ('0' file / '5' dir), size,
    * payload bytes, and (zip) the compression method it was stored
    * with — 0 stored, 8 deflate — as read from the central directory.
    */
  final case class Member(
      name: String, typeflag: Char, size: Long, data: Array[Byte],
      method: Int = 0)

  // ---------------------------------------------------------------
  // TAR (ustar)
  // ---------------------------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') { v = (v << 3) | (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { if (seen) return v }
      else return -1L
      i += 1
    }
    if (seen) v else -1L
  }

  /** Write a ustar archive of the given members (regular files and
    * directories), trailing with the required two zero blocks.
    */
  def encodeTar(members: Seq[Member]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      val h = new Array[Byte](512)
      val name = m.name.getBytes("US-ASCII")
      require(name.length <= 100, "long names need the prefix field")
      System.arraycopy(name, 0, h, 0, name.length)
      System.arraycopy(octal(420, 8), 0, h, 100, 8)  // mode 0644
      System.arraycopy(octal(0, 8), 0, h, 108, 8)    // uid
      System.arraycopy(octal(0, 8), 0, h, 116, 8)    // gid
      System.arraycopy(octal(m.data.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(0, 12), 0, h, 136, 12)  // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum blanks
      h(156) = m.typeflag.toByte
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
      h(262) = 0; h(263) = '0'.toByte; h(264) = '0'.toByte // POSIX v00
      var sum = 0L
      h.foreach(b => sum += b & 0xff)
      // checksum: 6 octal digits, NUL, space
      val cs = java.lang.Long.toOctalString(sum)
      val padded = "0" * (6 - cs.length) + cs
      System.arraycopy(padded.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '.toByte
      out.write(h)
      out.write(m.data)
      val rem = m.data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Walk a ustar archive; None on a bad checksum, bad octal, missing
    * magic, or truncation — never a partial member list.
    */
  def tarMembers(b: Array[Byte]): Option[Seq[Member]] = {
    val out = ArrayBuffer.empty[Member]
    var p = 0
    while (p + 512 <= b.length) {
      if ((0 until 512).forall(i => b(p + i) == 0)) {
        // first zero block: require the second, then end
        return if (p + 1024 <= b.length &&
          (0 until 512).forall(i => b(p + 512 + i) == 0)) Some(out.toSeq)
        else None
      }
      // ustar magic ("ustar" NUL or "ustar " variants both start so)
      if (!(b(p + 257) == 'u' && b(p + 258) == 's' && b(p + 259) == 't' &&
        b(p + 260) == 'a' && b(p + 261) == 'r')) return None
      val stored = parseOctal(b, p + 148, 8)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else b(p + i) & 0xff)
        i += 1
      }
      if (stored != sum) return None
      val size = parseOctal(b, p + 124, 12)
      if (size < 0) return None
      var end = 0
      while (end < 100 && b(p + end) != 0) end += 1
      val name = new String(b, p, end, "US-ASCII")
      val typeflag = if (b(p + 156) == 0) '0' else (b(p + 156) & 0xff).toChar
      val dataStart = p + 512
      if (dataStart + size > b.length) return None
      val data = java.util.Arrays.copyOfRange(
        b, dataStart, dataStart + size.toInt)
      out += Member(name, typeflag, size, data)
      val padded = ((size + 511) / 512) * 512
      p = dataStart + padded.toInt
    }
    None // ran off the end without the terminator
  }

  // ---------------------------------------------------------------
  // corpus queries (both the shared zero-exchange codec plan)
  // ---------------------------------------------------------------

  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  /** Per-document ustar inventory: one directory entry + three file
    * members whose contents are text slices; the engine earns every
    * row through encode → checksum-verified block walk, the oracle
    * recomputes names/sizes/content-md5 closed-form.
    */
  def tarInventory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select((col("doc_id") +: (0 until 3).map(j =>
        substring(col("text"), 1 + 16 * j, 16).as(s"c$j"))): _*)
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, c0, c1, c2) =>
          val files = Seq(c0, c1, c2).zipWithIndex.map { case (c, j) =>
            Member(s"docs/part$j.txt", '0', 0,
              c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          val tar = encodeTar(Member("docs/", '5', 0, Array.empty) +: files)
          val parsed = tarMembers(tar).getOrElse(
            throw new IllegalStateException(s"tar fixture failed for $id"))
          parsed.zipWithIndex.map { case (m, i) =>
            (id, i, m.name, m.typeflag.toString, m.size, md5hex(m.data))
          }
        }
      }
      .toDF("doc_id", "ordinal", "name", "flag", "size", "payload_md5")
  }

  /** Per-document zip inventory: three members alternating stored and
    * deflate, read back through the central directory with CRC-32
    * verification; the method column comes from the PARSED directory
    * entry, not the writer's convention.
    */
  def zipInventory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select((col("doc_id") +: (0 until 3).map(j =>
        substring(col("text"), 1 + 20 * j, 20).as(s"c$j"))): _*)
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, c0, c1, c2) =>
          val members = Seq(c0, c1, c2).zipWithIndex.map { case (c, j) =>
            s"m$j.dat" ->
              c.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          val zip = encodeZip(members)
          val parsed = zipMembers(zip).getOrElse(
            throw new IllegalStateException(s"zip fixture failed for $id"))
          parsed.zipWithIndex.map { case (m, i) =>
            (id, i, m.name,
              if (m.method == 0) "stored" else "deflate",
              m.size, md5hex(m.data))
          }
        }
      }
      .toDF("doc_id", "ordinal", "name", "method", "size", "payload_md5")
  }

  // ---------------------------------------------------------------
  // ZIP
  // ---------------------------------------------------------------

  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def w32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(data)
    c.getValue
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

  private def inflateRaw(data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(data)
    val out = new Array[Byte](expected)
    try {
      var got = 0
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(out, got, expected - got)
        if (n == 0 && inf.needsInput()) return None
        got += n
      }
      if (got != expected) None
      else if (!inf.finished() && inf.inflate(new Array[Byte](1)) != 0) None
      else Some(out)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Write a zip whose members alternate stored/deflate, with a
    * comment on the end-of-central-directory record (so readers that
    * assume EOCD sits at a fixed offset from EOF fail).
    */
  def encodeZip(members: Seq[(String, Array[Byte])],
      comment: String = "graft"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dir = new java.io.ByteArrayOutputStream()
    members.zipWithIndex.foreach { case ((name, data), i) =>
      val method = if (i % 2 == 0) 0 else 8
      val payload = if (method == 0) data else deflateRaw(data)
      val crc = crc32(data)
      val nameB = name.getBytes("US-ASCII")
      val offset = out.size()
      w32(out, 0x04034b50L); w16(out, 20); w16(out, 0); w16(out, method)
      w16(out, 0); w16(out, 0x2921) // time, date (fixed)
      w32(out, crc); w32(out, payload.length.toLong)
      w32(out, data.length.toLong)
      w16(out, nameB.length); w16(out, 0)
      out.write(nameB); out.write(payload)
      w32(dir, 0x02014b50L); w16(dir, 20); w16(dir, 20); w16(dir, 0)
      w16(dir, method); w16(dir, 0); w16(dir, 0x2921)
      w32(dir, crc); w32(dir, payload.length.toLong)
      w32(dir, data.length.toLong)
      w16(dir, nameB.length); w16(dir, 0); w16(dir, 0)
      w16(dir, 0); w16(dir, 0); w32(dir, 0L)
      w32(dir, offset.toLong)
      dir.write(nameB)
    }
    val dirOff = out.size()
    val dirBytes = dir.toByteArray
    out.write(dirBytes)
    w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
    w16(out, members.length); w16(out, members.length)
    w32(out, dirBytes.length.toLong); w32(out, dirOff.toLong)
    val cb = comment.getBytes("US-ASCII")
    w16(out, cb.length); out.write(cb)
    out.toByteArray
  }

  /** Read a zip through its central directory (EOCD found by backward
    * scan). Every member is CRC-verified; None on encryption flags,
    * unknown methods, size/CRC mismatches, or structural corruption.
    */
  def zipMembers(b: Array[Byte]): Option[Seq[Member]] = {
    if (b.length < 22) return None
    // EOCD: scan back over the (≤ 64 KB) comment for the signature
    var e = b.length - 22
    val stop = math.max(0, b.length - 22 - 0xffff)
    while (e >= stop && u32(b, e) != 0x06054b50L) e -= 1
    if (e < stop) return None
    val n = u16(b, e + 10)
    val dirOff = u32(b, e + 16)
    if (u16(b, e + 8) != n) return None // single-disk only
    var p = dirOff.toInt
    if (p < 0 || p > b.length) return None
    val out = ArrayBuffer.empty[Member]
    var k = 0
    while (k < n) {
      if (p + 46 > b.length || u32(b, p) != 0x02014b50L) return None
      val flags = u16(b, p + 8)
      val method = u16(b, p + 10)
      if ((flags & 0x1) != 0) return None // encrypted
      if (method != 0 && method != 8) return None
      val crc = u32(b, p + 16)
      val csize = u32(b, p + 20)
      val usize = u32(b, p + 24)
      val nameLen = u16(b, p + 28)
      val extraLen = u16(b, p + 30)
      val commentLen = u16(b, p + 32)
      val lho = u32(b, p + 42).toInt
      if (p + 46 + nameLen > b.length) return None
      val name = new String(b, p + 46, nameLen, "US-ASCII")
      // local header: signature + its own name/extra sizes
      if (lho < 0 || lho + 30 > b.length || u32(b, lho) != 0x04034b50L)
        return None
      val lNameLen = u16(b, lho + 26)
      val lExtraLen = u16(b, lho + 28)
      val dataOff = lho + 30 + lNameLen + lExtraLen
      if (dataOff + csize > b.length) return None
      val payload = java.util.Arrays.copyOfRange(
        b, dataOff, dataOff + csize.toInt)
      val data =
        if (method == 0) {
          if (csize != usize) return None
          payload
        } else inflateRaw(payload, usize.toInt).getOrElse(return None)
      if (crc32(data) != crc) return None
      out += Member(name, if (name.endsWith("/")) '5' else '0',
        usize, data, method)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.toSeq)
  }
}
