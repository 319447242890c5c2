package graft.core

/** Version-pinned reimplementation of DuckDB's internal `hash()` function,
  * independent of any DuckDB code: the algorithm is replicated from the
  * reference's standalone description (reference:
  * src/bitfilters_duckdb_bloom_filter.cpp:79-178) so that filters built here
  * are bit-compatible with filters built inside DuckDB v1.4.0 - v1.6.0.
  *
  * All supported versions share one algorithm on little-endian hardware
  * (reference src/bitfilters_duckdb_bloom_filter.cpp:26-39), so the version
  * string is validated but does not change the computation.
  *
  * Inputs are interpreted exactly like DuckDB physical types:
  *  - BOOL/INT8/INT16/INT32 and UINT8/16 -> value cast to uint32, zero-extended
  *    to u64 (negative ints therefore hash via their 32-bit two's complement).
  *  - INT64/UINT64/UINT32 -> full 64-bit value.
  *  - FLOAT -> -0.0 normalized to +0.0, NaN canonicalized, 32 raw bits as u64.
  *  - DOUBLE -> same normalization, 64 raw bits.
  *  - VARCHAR/BLOB -> length-seeded 8-byte-chunk mix.
  */
object DuckDbHash {

  final val MurmurConstant = 0xd6e8feb86659fd93L

  val SupportedVersions: Set[String] = {
    val base = Seq("1.4.0", "1.4.1", "1.4.2", "1.4.3", "1.4.4", "1.5.0", "1.5.1", "1.6.0")
    (base ++ base.map("v" + _)).toSet
  }

  def requireSupported(version: String): Unit =
    if (!SupportedVersions.contains(version)) {
      throw new IllegalArgumentException(
        s"Unsupported DuckDB version '$version' for duckdb hash/bloom filter. " +
          "Supported versions: v1.4.0-v1.4.4, v1.5.0, v1.5.1, v1.6.0")
    }

  /** MurmurHash64 with DuckDB's constant; reference cpp:81-88. */
  @inline def murmur(x0: Long): Long = {
    var x = x0
    x ^= x >>> 32
    x *= MurmurConstant
    x ^= x >>> 32
    x *= MurmurConstant
    x ^= x >>> 32
    x
  }

  /** int8/int16/int32/bool path: cast through uint32 (sign-extend to 32 bits,
    * then zero-extend to 64); reference cpp:90-100.
    */
  @inline def hashInt32Like(v: Int): Long = murmur(v.toLong & 0xffffffffL)

  /** int64/uint64 path; reference cpp:101-103,113-115. */
  @inline def hashLong(v: Long): Long = murmur(v)

  @inline def hashBoolean(b: Boolean): Long = hashInt32Like(if (b) 1 else 0)

  /** FLOAT path; reference cpp:117-126. floatToIntBits canonicalizes NaN to
    * 0x7fc00000 which equals C++ std::numeric_limits<float>::quiet_NaN().
    */
  @inline def hashFloat(f0: Float): Long = {
    val f = if (f0 == 0.0f) 0.0f else f0 // collapses -0.0f; NaN falls through
    murmur(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
  }

  /** DOUBLE path; reference cpp:128-137. */
  @inline def hashDouble(d0: Double): Long = {
    val d = if (d0 == 0.0) 0.0 else d0
    murmur(java.lang.Double.doubleToLongBits(d))
  }

  /** VARCHAR/BLOB path; reference cpp:146-171. Little-endian 8-byte chunks. */
  def hashBytes(data: Array[Byte]): Long = {
    val len = data.length
    var h = 0xe17a1465L ^ (len.toLong * 0xc6a4a7935bd1e995L)
    val full = len & ~7
    var i = 0
    while (i < full) {
      var chunk = 0L
      // little-endian 64-bit load
      chunk |= (data(i) & 0xffL)
      chunk |= (data(i + 1) & 0xffL) << 8
      chunk |= (data(i + 2) & 0xffL) << 16
      chunk |= (data(i + 3) & 0xffL) << 24
      chunk |= (data(i + 4) & 0xffL) << 32
      chunk |= (data(i + 5) & 0xffL) << 40
      chunk |= (data(i + 6) & 0xffL) << 48
      chunk |= (data(i + 7) & 0xffL) << 56
      h ^= chunk
      h *= MurmurConstant
      i += 8
    }
    if (full != len) {
      var rem = 0L
      var shift = 0
      while (i < len) {
        rem |= (data(i) & 0xffL) << shift
        shift += 8
        i += 1
      }
      h ^= rem
      h *= MurmurConstant
    }
    murmur(h)
  }

  /** UBIGINT interop path (reference cpp:113-115): DuckDB writes UBIGINT to
    * parquet as the UINT64 logical type, which Spark surfaces as
    * DECIMAL(20,0); the hash is murmur over the raw 64-bit value, so the
    * exact integer is reduced mod 2^64 (BigInteger.longValue keeps the low
    * 64 bits) after a range check — a DECIMAL(20,0) holding >= 2^64 was
    * never a UBIGINT and must not silently alias one.
    */
  def hashUnsigned64(bi: java.math.BigInteger): Long = {
    if (bi.signum < 0 || bi.bitLength > 64)
      throw new IllegalArgumentException(
        s"bitfilters_duckdb_hash: DECIMAL value $bi is outside the UBIGINT range [0, 2^64)")
    murmur(bi.longValue)
  }

  /** CombineHash for multi-argument hashing; reference cpp:174-178. */
  @inline def combine(a0: Long, b: Long): Long = {
    var a = a0
    a ^= a >>> 32
    a *= MurmurConstant
    a ^ b
  }
}
