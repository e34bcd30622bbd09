package graft.functions

import java.security.MessageDigest

/** The single home of the md5 bit-layout contract shared with the DuckDB
  * oracles — every portable-hash expression extracts bits HERE, so the
  * layout can never drift between tiers:
  *
  *  - `top28(d)`  = first 7 hex chars  ≡ `('0x'||substr(md5(s),1,7))::BIGINT`
  *  - `half(d,0)` = hex chars 1..8     ≡ `('0x'||substr(md5(s),1,8))::BIGINT`
  *  - `half(d,1)` = hex chars 9..16    ≡ `('0x'||substr(md5(s),9,8))::BIGINT`
  *
  * Also owns the per-thread digest (JCA getInstance is a provider lookup —
  * not something to pay per row in a codegen'd hot loop). */
object Md5Bits {
  private val local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** md5 digest of the bytes, via the thread's reused instance. */
  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = local.get()
    md.reset()
    md.digest(bytes)
  }

  /** Top 28 bits of the digest (first 7 hex chars). */
  def top28(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)

  /** 32-bit half `i` (0 → bytes 0..3, 1 → bytes 4..7) as an unsigned long. */
  def half(d: Array[Byte], i: Int): Long = {
    val o = i * 4
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  }
}
