package graft

import java.util.zip.CRC32

import graft.functions.{BinaryKeys, SaltedKeyImpl}
import graft.functions.SaltedKey.salted_key
import org.apache.spark.sql.functions._

class KeyFunctionsSpec extends SparkSpec {

  private def crcBytes(s: String): Array[Byte] = {
    val c = new CRC32()
    val b = s.getBytes("UTF-8")
    c.update(b, 0, b.length)
    val v = c.getValue
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  }

  test("salted key: length and crc-prefix properties (reference KeyGenerator.java:27-49)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(12)
      val s = rnd.alphanumeric.take(len).mkString
      val out = SaltedKeyImpl.compute(s.getBytes("UTF-8"))
      val expectedLen = if (s.getBytes("UTF-8").length < 4) s.getBytes("UTF-8").length + 4 else s.getBytes("UTF-8").length + 8
      assert(out.length == expectedLen, s"key=$s")
      assert(out.take(4).toSeq == crcBytes(s).toSeq, s"key=$s")
    }
  }

  test("salted key: tail scramble layout for len>=4") {
    val out = SaltedKeyImpl.compute("abcdef".getBytes("UTF-8"))
    // salt(4) ++ ef ++ cd ++ abcdef
    assert(new String(out.drop(4), "UTF-8") == "efcdabcdef")
  }

  test("salted key expression: codegen path agrees with direct computation, null-safe") {
    val s = spark
    import s.implicits._
    val df = Seq("x", "abc", "abcd", "hello-world", null.asInstanceOf[String]).toDF("k")
    val got = df.select(col("k"), salted_key(col("k")).as("sk")).collect()
    got.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getAs[Array[Byte]]("sk").toSeq ==
        SaltedKeyImpl.compute(r.getString(0).getBytes("UTF-8")).toSeq)
    }
  }

  test("salted key SQL registration") {
    graft.functions.SaltedKey.register(spark)
    val r = spark.sql("SELECT salted_key('abcd') AS k").collect()(0).getAs[Array[Byte]](0)
    assert(r.length == 12)
  }

  test("midpoint: numeric equivalence and ordering for random long ranges") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val a = rnd.nextLong().abs % 1000000
      val b = a + 1 + rnd.nextLong().abs % 1000000
      assert(BinaryKeys.midpointLong(a, b) == (a + b) / 2, s"a=$a b=$b")
    }
  }

  test("midpoint: empty end key means +infinity (0xFF*8 pad), reference TableSplitter.java:100-102") {
    val start = BinaryKeys.longBytes(10L)
    val mid = BinaryKeys.midpoint(start, Array.emptyByteArray)
    val asNum = new java.math.BigInteger(1, mid)
    val expected = new java.math.BigInteger(1, start)
      .add(new java.math.BigInteger(1, Array.fill(8)(0xff.toByte))).shiftRight(1)
    assert(asNum == expected)
  }

  test("midpoint: short end key pads 0xFF (exclusive bound covers all 'ab'-prefixed keys)") {
    // region ["a", "ab"): end is an exclusive bound, so keys "ab\x01..."
    // belong to the NEXT region; the midpoint must treat "ab" as the top of
    // its prefix range, not as "ab\x00*" (which sorts below "ab\x01")
    val start = "a".getBytes("UTF-8")
    val end = "ab".getBytes("UTF-8")
    val mid = BinaryKeys.midpoint(start, end)
    val a = new java.math.BigInteger(1, start ++ Array.fill(7)(0x00.toByte))
    val b = new java.math.BigInteger(1, end ++ Array.fill(6)(0xff.toByte))
    assert(new java.math.BigInteger(1, mid) == a.add(b).shiftRight(1))
    // and the midpoint sits strictly inside the padded bounds
    assert(a.compareTo(new java.math.BigInteger(1, mid)) < 0)
    assert(b.compareTo(new java.math.BigInteger(1, mid)) > 0)
  }

  test("midpoint: property over random variable-length key pairs") {
    // property: for any start/end of any lengths with padded-start <
    // padded-end, the midpoint sits inside [start-bound, end-bound] at the
    // common width, where the inclusive start pads 0x00 and the exclusive
    // end pads 0xFF (prefix-range semantics) — i.e. variable-length keys
    // never skew the split point below the start or above the end bound
    val rnd = new scala.util.Random(13)
    var checked = 0
    while (checked < 300) {
      val start = Array.fill(rnd.nextInt(10))(rnd.nextInt(256).toByte)
      val end = Array.fill(rnd.nextInt(10))(rnd.nextInt(256).toByte)
      val width = math.max(BinaryKeys.PadWidth, math.max(start.length, end.length))
      val a = new java.math.BigInteger(1, start ++ Array.fill(width - start.length)(0x00.toByte))
      val b =
        if (end.isEmpty) new java.math.BigInteger(1, Array.fill(width)(0xff.toByte))
        else new java.math.BigInteger(1, end ++ Array.fill(width - end.length)(0xff.toByte))
      if (a.compareTo(b) < 0) {
        val mid = new java.math.BigInteger(1, BinaryKeys.midpoint(start, end))
        assert(mid == a.add(b).shiftRight(1),
          s"start=${start.map("%02x".format(_)).mkString} end=${end.map("%02x".format(_)).mkString}")
        assert(a.compareTo(mid) <= 0 && mid.compareTo(b) <= 0)
        checked += 1
      }
    }
  }

  test("toStringBinary escapes non-printables") {
    assert(BinaryKeys.toStringBinary("ab".getBytes) == "ab")
    assert(BinaryKeys.toStringBinary(Array(0x00.toByte, 0x41.toByte, 0xff.toByte)) == "\\x00A\\xFF")
  }

  test("probe key: deterministic, start-key prefix preserved") {
    val k = BinaryKeys.longBytes(42L)
    val p1 = BinaryKeys.probeKey(k)
    val p2 = BinaryKeys.probeKey(k)
    assert(p1.toSeq == p2.toSeq)
    assert(p1.take(8).toSeq == k.toSeq)
    assert(p1.length == 12)
  }
}
