package graft.mongo

/**
 * Minimal BSON codec — the subset the bookkeeping documents need
 * (string, int32/int64, double, boolean, null, embedded document,
 * array), implemented from the public BSON specification
 * (bsonspec.org). Documents encode as ordered (insertion-order)
 * little-endian element streams; the spec pins the canonical
 * `{"hello": "world"}` byte vector in the test suite so an encoding
 * drift fails against EXTERNAL ground truth, not a round-trip of
 * itself.
 */
object Bson {

  /** Explicit embedded-document wrapper for ENCODING — a bare List
    * encodes as a BSON array, a `Doc` as an embedded document (the
    * two are ambiguous as plain Scala collections: an empty List
    * could be either). */
  final case class Doc(fields: Seq[(String, Any)])

  def encode(doc: Seq[(String, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: Seq[(String, Any)]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (k, v) => writeElement(body, k, v) }
    val total = 4 + body.size() + 1
    writeInt32(out, total)
    body.writeTo(out)
    out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, key: String, v: Any): Unit = {
    def name(): Unit = { out.write(key.getBytes("UTF-8")); out.write(0) }
    v match {
      case s: String =>
        out.write(0x02); name()
        val b = s.getBytes("UTF-8")
        writeInt32(out, b.length + 1); out.write(b); out.write(0)
      case d: Double => out.write(0x01); name(); writeInt64(out, java.lang.Double.doubleToLongBits(d))
      case i: Int => out.write(0x10); name(); writeInt32(out, i)
      case l: Long => out.write(0x12); name(); writeInt64(out, l)
      case b: Boolean => out.write(0x08); name(); out.write(if (b) 1 else 0)
      case null => out.write(0x0A); name()
      case Doc(fields) =>
        out.write(0x03); name()
        writeDoc(out, fields)
      case arr: List[_] =>
        out.write(0x04); name()
        writeDoc(out, arr.zipWithIndex.map { case (e, i) => i.toString -> e })
      case other => throw new IllegalArgumentException(
        s"Bson.encode: unsupported type ${other.getClass} for key '$key'")
    }
  }

  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  /** Decode one document starting at `off`; returns (fields, end).
    * Arrays come back as List[Any], embedded docs as
    * Map[String, Any] (insertion order is not semantic on reads). */
  def decode(bytes: Array[Byte], off: Int = 0): (Map[String, Any], Int) = {
    val len = readInt32(bytes, off)
    var i = off + 4
    val end = off + len - 1 // position of the trailing 0x00
    val b = Map.newBuilder[String, Any]
    while (i < end) {
      val tpe = bytes(i) & 0xFF; i += 1
      val nameEnd = bytes.indexOf(0, i)
      val key = new String(bytes, i, nameEnd - i, "UTF-8")
      i = nameEnd + 1
      tpe match {
        case 0x01 => b += key -> java.lang.Double.longBitsToDouble(readInt64(bytes, i)); i += 8
        case 0x02 =>
          val slen = readInt32(bytes, i)
          b += key -> new String(bytes, i + 4, slen - 1, "UTF-8"); i += 4 + slen
        case 0x03 =>
          val (sub, ni) = decode(bytes, i); b += key -> sub; i = ni
        case 0x04 =>
          val (sub, ni) = decode(bytes, i)
          // array documents key by "0","1",...: restore order numerically
          b += key -> sub.toList.sortBy(_._1.toInt).map(_._2); i = ni
        case 0x08 => b += key -> (bytes(i) != 0); i += 1
        case 0x0A => b += key -> null
        case 0x10 => b += key -> readInt32(bytes, i); i += 4
        case 0x12 => b += key -> readInt64(bytes, i); i += 8
        case other => throw new IllegalArgumentException(
          s"Bson.decode: unsupported element type 0x${other.toHexString} for key '$key'")
      }
    }
    (b.result(), off + len)
  }

  def readInt32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  def readInt64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xFFL); k -= 1 }
    v
  }
}
