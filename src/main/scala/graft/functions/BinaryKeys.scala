package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary row-key arithmetic (reference `api/splitter/TableSplitter.java:95-112`
  * midpoint via `Bytes.split`, `api/common/KeyGenerator.java:20-25`
  * printable escaping, `api/analyze/HBaseHealthAnalyzeService.java:168-175`
  * probe keys).
  *
  * Keys are unsigned big-endian byte strings ordered lexicographically
  * (Spark BinaryType ordering matches HBase `Bytes.compareTo`). The empty
  * end-key sentinel means "+infinity" and is padded to 0xFF*8 before
  * arithmetic, as the reference does.
  */
object BinaryKeys {

  val PadWidth = 8

  /** Right-pad to `width` with 0x00 (start keys) — lexicographic order is
    * preserved for prefixes. */
  private def pad(b: Array[Byte], width: Int, fill: Byte): Array[Byte] = {
    if (b.length >= width) b
    else b ++ Array.fill(width - b.length)(fill)
  }

  /** Byte-string midpoint of [start, end): the key halfway between the two
    * unsigned big-endian values, at the padded width.
    *
    * Padding is asymmetric on purpose: the start key (inclusive bound) pads
    * with 0x00 — `"ab"` admits everything from `"ab\x00..."` up — while the
    * end key (exclusive bound) pads with 0xFF, because every key with prefix
    * `"ab"` sorts above the bare 2-byte `"ab"`; 0x00-padding the end would
    * underestimate it and skew split points low for variable-length keys.
    * Empty end = +infinity = 0xFF*width. */
  def midpoint(start: Array[Byte], end: Array[Byte]): Array[Byte] = {
    val width = math.max(PadWidth, math.max(start.length, end.length))
    val s = pad(start, width, 0x00)
    val e = if (end.isEmpty) Array.fill(width)(0xff.toByte) else pad(end, width, 0xff.toByte)
    val a = new BigInteger(1, s)
    val b = new BigInteger(1, e)
    val mid = a.add(b).shiftRight(1)
    val raw = mid.toByteArray.dropWhile(_ == 0) // strip sign/leading zeros
    pad(Array.fill(math.max(0, width - raw.length))(0x00.toByte) ++ raw, width, 0x00)
  }

  /** Numeric views for fixtures whose keys are longs: midpoint over the
    * 8-byte big-endian encodings, decoded back — equals (s + e) / 2 for
    * non-negative longs, which is how the oracle checks the byte surgery. */
  def midpointLong(s: Long, e: Long): Long = {
    val mid = midpoint(longBytes(s), longBytes(e))
    new BigInteger(1, mid).longValueExact()
  }

  def longBytes(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> ((7 - i) * 8)) & 0xff).toByte).toArray

  /** Printable escaping of binary keys (reference `Bytes.toStringBinary`):
    * ASCII 32..126 as-is, everything else as \xNN. */
  def toStringBinary(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length)
    b.foreach { x =>
      val c = x & 0xff
      if (c >= 32 && c < 127) sb.append(c.toChar)
      else sb.append(f"\\x$c%02X")
    }
    sb.toString
  }

  /** Deterministic probe key for a region: start_key ++ 4 pseudo-random
    * bytes derived from the key itself (the reference uses Random; a
    * distributed health probe wants reproducibility). */
  def probeKey(start: Array[Byte]): Array[Byte] = {
    val crc = new CRC32Like(start)
    start ++ crc.fourBytes
  }

  private class CRC32Like(seed: Array[Byte]) {
    private val crc = new java.util.zip.CRC32()
    crc.update(seed, 0, seed.length)
    crc.update(0x9e)
    def fourBytes: Array[Byte] = {
      val v = crc.getValue
      Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    }
  }

  // UDF wrappers (used post-filter on small candidate sets; the hot-path
  // scalar is the codegen'd SaltedKey expression instead)
  val midpointLongUdf = udf((s: Long, e: Long) => midpointLong(s, e))
  val toStringBinaryUdf = udf((b: Array[Byte]) => toStringBinary(b))
  val probeKeyUdf = udf((b: Array[Byte]) => probeKey(b))

  def midpoint_key(s: Column, e: Column): Column = midpointLongUdf(s, e)
}
