package graft.functions

/** SpookyHash V2 (Bob Jenkins, 2012 — public domain), the 128-bit
  * non-cryptographic hash the reference exposes as `spooky_hash_v2_32` /
  * `spooky_hash_v2_64` (`core/trino-main/.../scalar/VarbinaryFunctions.java:318,328`
  * via io.airlift.slice.SpookyHashV2, seed 0). Ported from the published
  * public-domain algorithm; byte parity with the reference is pinned by
  * the reference's own test vectors
  * (`TestVarbinaryFunctions.java:341-344`) in `FunctionsSpec` — the
  * short-input path (< 16 bytes) is vector-verified, the ShortMix and
  * long-message paths follow the same published constants.
  */
object SpookyHashV2 {
  private final val ScConst = 0xdeadbeefdeadbeefL
  private final val NumVars = 12
  private final val BlockSize = NumVars * 8 // 96
  private final val BufSize = 2 * BlockSize // 192

  @inline private def rot(x: Long, k: Int): Long = (x << k) | (x >>> (64 - k))

  @inline private def le64(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) |
      ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) |
      ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) |
      ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)

  @inline private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) |
      ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24)

  /** 128-bit hash; returns (hash1, hash2). */
  def hash128(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) =
    if (data.length < BufSize) shortHash(data, seed1, seed2)
    else longHash(data, seed1, seed2)

  def hash64(data: Array[Byte], seed: Long): Long = hash128(data, seed, seed)._1

  def hash32(data: Array[Byte], seed: Int): Int =
    hash64(data, seed.toLong & 0xffffffffL).toInt

  // --- short-message path (< 192 bytes) ---
  private def shortHash(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val len = data.length
    var remainder = len % 32
    var a = seed1; var b = seed2; var c = ScConst; var d = ScConst
    var off = 0
    if (len > 15) {
      val end = (len / 32) * 32
      while (off < end) {
        c += le64(data, off); d += le64(data, off + 8)
        // ShortMix
        c = rot(c, 50); c += d; a ^= c
        d = rot(d, 52); d += a; b ^= d
        a = rot(a, 30); a += b; c ^= a
        b = rot(b, 41); b += c; d ^= b
        c = rot(c, 54); c += d; a ^= c
        d = rot(d, 48); d += a; b ^= d
        a = rot(a, 38); a += b; c ^= a
        b = rot(b, 37); b += c; d ^= b
        c = rot(c, 62); c += d; a ^= c
        d = rot(d, 34); d += a; b ^= d
        a = rot(a, 5); a += b; c ^= a
        b = rot(b, 36); b += c; d ^= b
        a += le64(data, off + 16); b += le64(data, off + 24)
        off += 32
      }
      if (remainder >= 16) {
        c += le64(data, off); d += le64(data, off + 8)
        c = rot(c, 50); c += d; a ^= c
        d = rot(d, 52); d += a; b ^= d
        a = rot(a, 30); a += b; c ^= a
        b = rot(b, 41); b += c; d ^= b
        c = rot(c, 54); c += d; a ^= c
        d = rot(d, 48); d += a; b ^= d
        a = rot(a, 38); a += b; c ^= a
        b = rot(b, 37); b += c; d ^= b
        c = rot(c, 62); c += d; a ^= c
        d = rot(d, 34); d += a; b ^= d
        a = rot(a, 5); a += b; c ^= a
        b = rot(b, 36); b += c; d ^= b
        off += 16
        remainder -= 16
      }
    }
    // tail (mimics the C switch fallthrough on remainder)
    @inline def u8(i: Int): Long = data(off + i) & 0xffL
    d += len.toLong << 56
    if (remainder >= 12) {
      if (remainder == 15) d += u8(14) << 48
      if (remainder >= 14) d += u8(13) << 40
      if (remainder >= 13) d += u8(12) << 32
      d += le32(data, off + 8)
      c += le64(data, off)
    } else if (remainder >= 8) {
      if (remainder == 11) d += u8(10) << 16
      if (remainder >= 10) d += u8(9) << 8
      if (remainder >= 9) d += u8(8)
      c += le64(data, off)
    } else if (remainder >= 4) {
      if (remainder == 7) c += u8(6) << 48
      if (remainder >= 6) c += u8(5) << 40
      if (remainder >= 5) c += u8(4) << 32
      c += le32(data, off)
    } else if (remainder >= 1) {
      if (remainder == 3) c += u8(2) << 16
      if (remainder >= 2) c += u8(1) << 8
      c += u8(0)
    } else {
      c += ScConst; d += ScConst
    }
    // ShortEnd
    d ^= c; c = rot(c, 15); d += c
    a ^= d; d = rot(d, 52); a += d
    b ^= a; a = rot(a, 26); b += a
    c ^= b; b = rot(b, 51); c += b
    d ^= c; c = rot(c, 28); d += c
    a ^= d; d = rot(d, 9); a += d
    b ^= a; a = rot(a, 47); b += a
    c ^= b; b = rot(b, 54); c += b
    d ^= c; c = rot(c, 32); d += c
    a ^= d; d = rot(d, 25); a += d
    b ^= a; a = rot(a, 63); b += a
    (a, b)
  }

  // --- long-message path (>= 192 bytes): 12-variable state ---
  private def longHash(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val len = data.length
    val h = new Array[Long](NumVars)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = ScConst; h(5) = ScConst; h(8) = ScConst; h(11) = ScConst

    var off = 0
    val end = (len / BlockSize) * BlockSize
    while (off < end) {
      mix(data, off, h)
      off += BlockSize
    }
    // last partial block, zero-padded, length byte in the final slot
    val remainder = len - off
    val buf = new Array[Byte](BlockSize)
    System.arraycopy(data, off, buf, 0, remainder)
    buf(BlockSize - 1) = remainder.toByte
    endMix(buf, h)
    (h(0), h(1))
  }

  private def mix(data: Array[Byte], off: Int, h: Array[Long]): Unit = {
    h(0) += le64(data, off); h(2) ^= h(10); h(11) ^= h(0); h(0) = rot(h(0), 11); h(11) += h(1)
    h(1) += le64(data, off + 8); h(3) ^= h(11); h(0) ^= h(1); h(1) = rot(h(1), 32); h(0) += h(2)
    h(2) += le64(data, off + 16); h(4) ^= h(0); h(1) ^= h(2); h(2) = rot(h(2), 43); h(1) += h(3)
    h(3) += le64(data, off + 24); h(5) ^= h(1); h(2) ^= h(3); h(3) = rot(h(3), 31); h(2) += h(4)
    h(4) += le64(data, off + 32); h(6) ^= h(2); h(3) ^= h(4); h(4) = rot(h(4), 17); h(3) += h(5)
    h(5) += le64(data, off + 40); h(7) ^= h(3); h(4) ^= h(5); h(5) = rot(h(5), 28); h(4) += h(6)
    h(6) += le64(data, off + 48); h(8) ^= h(4); h(5) ^= h(6); h(6) = rot(h(6), 39); h(5) += h(7)
    h(7) += le64(data, off + 56); h(9) ^= h(5); h(6) ^= h(7); h(7) = rot(h(7), 57); h(6) += h(8)
    h(8) += le64(data, off + 64); h(10) ^= h(6); h(7) ^= h(8); h(8) = rot(h(8), 55); h(7) += h(9)
    h(9) += le64(data, off + 72); h(11) ^= h(7); h(8) ^= h(9); h(9) = rot(h(9), 54); h(8) += h(10)
    h(10) += le64(data, off + 80); h(0) ^= h(8); h(9) ^= h(10); h(10) = rot(h(10), 22); h(9) += h(11)
    h(11) += le64(data, off + 88); h(1) ^= h(9); h(10) ^= h(11); h(11) = rot(h(11), 46); h(10) += h(0)
  }

  private def endPartial(h: Array[Long]): Unit = {
    h(11) += h(1); h(2) ^= h(11); h(1) = rot(h(1), 44)
    h(0) += h(2); h(3) ^= h(0); h(2) = rot(h(2), 15)
    h(1) += h(3); h(4) ^= h(1); h(3) = rot(h(3), 34)
    h(2) += h(4); h(5) ^= h(2); h(4) = rot(h(4), 21)
    h(3) += h(5); h(6) ^= h(3); h(5) = rot(h(5), 38)
    h(4) += h(6); h(7) ^= h(4); h(6) = rot(h(6), 33)
    h(5) += h(7); h(8) ^= h(5); h(7) = rot(h(7), 10)
    h(6) += h(8); h(9) ^= h(6); h(8) = rot(h(8), 13)
    h(7) += h(9); h(10) ^= h(7); h(9) = rot(h(9), 38)
    h(8) += h(10); h(11) ^= h(8); h(10) = rot(h(10), 53)
    h(9) += h(11); h(0) ^= h(9); h(11) = rot(h(11), 42)
    h(10) += h(0); h(1) ^= h(10); h(0) = rot(h(0), 54)
  }

  private def endMix(buf: Array[Byte], h: Array[Long]): Unit = {
    var i = 0
    while (i < NumVars) { h(i) += le64(buf, i * 8); i += 1 }
    endPartial(h)
    endPartial(h)
    endPartial(h)
  }
}
