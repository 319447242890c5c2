package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** DuckDB-compatible cache-sectorized bloom filter.
  *
  * Semantics replicated from the reference (src/bitfilters_duckdb_bloom_filter.cpp):
  *  - state: `num_sectors` (power of two) u64 sectors (cpp:492-530)
  *  - insert: sector = h & (n-1); set 4 bits derived from hash bytes 4-7
  *    (GetMask, cpp:252-260; insert cpp:503-507)
  *  - merge: bitwise OR (cpp:518-529)
  *  - wire format (little-endian): [u64 num_sectors][u64 * num_sectors]
  *    (cpp:509-516)
  *
  * Keys are pre-hashed u64 values (produce them with [[DuckDbHash]]).
  */
final class DuckDbBloomFilter(val sectors: Array[Long]) {
  require(sectors.length > 0 && (sectors.length & (sectors.length - 1)) == 0,
    s"num_sectors must be a power of 2, got ${sectors.length}")

  @inline def insert(hash: Long): Unit = {
    val idx = (hash & (sectors.length - 1)).toInt
    sectors(idx) |= DuckDbBloomFilter.getMask(hash)
  }

  @inline def mightContain(hash: Long): Boolean = {
    val idx = (hash & (sectors.length - 1)).toInt
    val mask = DuckDbBloomFilter.getMask(hash)
    (sectors(idx) & mask) == mask
  }

  /** In-place bitwise-OR merge; both sides must have equal sector counts. */
  def orMerge(other: DuckDbBloomFilter): Unit = {
    require(other.sectors.length == sectors.length,
      s"cannot merge bloom filters with different num_sectors: ${sectors.length} vs ${other.sectors.length}")
    var i = 0
    while (i < sectors.length) { sectors(i) |= other.sectors(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val out = ByteBuffer.allocate(8 * (sectors.length + 1)).order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(sectors.length.toLong)
    var i = 0
    while (i < sectors.length) { out.putLong(sectors(i)); i += 1 }
    out.array()
  }
}

object DuckDbBloomFilter {

  /** 4-bit mask from hash bytes 4-7, each byte mod 64 selecting a bit position;
    * reference cpp:252-260.
    */
  @inline def getMask(hash: Long): Long = {
    var mask = 0L
    var byteIdx = 4
    while (byteIdx < 8) {
      val bitPos = ((hash >>> (byteIdx * 8)) & 0x3f).toInt
      mask |= 1L << bitPos
      byteIdx += 1
    }
    mask
  }

  def create(numSectors: Int): DuckDbBloomFilter = {
    require(numSectors > 0 && (numSectors & (numSectors - 1)) == 0,
      s"num_sectors must be a power of 2, got $numSectors")
    new DuckDbBloomFilter(new Array[Long](numSectors))
  }

  def deserialize(blob: Array[Byte]): DuckDbBloomFilter = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    if (blob.length < 8) throw new IllegalArgumentException("bloom filter blob too short")
    val n = bb.getLong
    if (n <= 0 || (n & (n - 1)) != 0 || n > (1L << 28))
      throw new IllegalArgumentException(s"num_sectors must be a power of 2 (and sane), got $n")
    if (blob.length < 8 * (n + 1))
      throw new IllegalArgumentException(s"bloom filter blob too short for $n sectors")
    val sectors = new Array[Long](n.toInt)
    var i = 0
    while (i < sectors.length) { sectors(i) = bb.getLong; i += 1 }
    new DuckDbBloomFilter(sectors)
  }

  /** Zero-copy probe directly against a serialized blob (avoids materializing
    * the sector array per row when the filter column is not constant).
    */
  def probeBlob(blob: Array[Byte], hash: Long): Boolean = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong(0)
    val idx = (hash & (n - 1)).toInt
    val mask = getMask(hash)
    (bb.getLong(8 + idx * 8) & mask) == mask
  }
}
