package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM golden tests for the filter cores — no SparkSession needed.
  *
  * Hash golden values are the certified vectors generated against real DuckDB
  * wheels (reference test/generate/hash_values_v1.5.1.json); FP-count goldens
  * come from reference test/sql/bitfilters.test:45-117.
  */
class CoreFilterSpec extends AnyFunSuite {

  private def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)

  // --- DuckDbHash: certified vectors -------------------------------------

  test("duckdb hash: integer vectors") {
    assert(DuckDbHash.hashLong(42L) == u("7199933130570745587"))
    assert(DuckDbHash.hashInt32Like(42) == u("7199933130570745587"))
    assert(DuckDbHash.hashInt32Like(-1) == u("4739667815145166545")) // tinyint/smallint/integer -1
    assert(DuckDbHash.hashLong(-1L) == u("4939931809569846361"))
    assert(DuckDbHash.hashInt32Like(-128) == u("17192691921624903227"))
  }

  test("duckdb hash: float/double vectors") {
    assert(DuckDbHash.hashFloat(42.0f) == u("15290891319722589465"))
    assert(DuckDbHash.hashDouble(42.0) == u("870828535671730594"))
    assert(DuckDbHash.hashFloat(0.0f) == 0L)
    assert(DuckDbHash.hashDouble(0.0) == 0L)
    assert(DuckDbHash.hashFloat(-0.0f) == 0L)
    assert(DuckDbHash.hashDouble(-0.0) == 0L)
  }

  test("duckdb hash: string/blob vectors") {
    assert(DuckDbHash.hashBytes("hello".getBytes("UTF-8")) == u("8628213525773890682"))
    assert(DuckDbHash.hashBytes(Array.emptyByteArray) == u("5104928228550385088"))
    // '\xDEAD'::BLOB is byte 0xDE followed by the literal characters "AD"
    assert(DuckDbHash.hashBytes(Array[Byte](0xde.toByte, 'A'.toByte, 'D'.toByte)) == u("5774709339516911511"))
  }

  test("duckdb hash: combine (multi-value) vectors") {
    val h42hello = DuckDbHash.combine(DuckDbHash.hashLong(42L),
      DuckDbHash.hashBytes("hello".getBytes("UTF-8")))
    assert(h42hello == u("17001236256828606196"))
    val h123 = DuckDbHash.combine(DuckDbHash.combine(
      DuckDbHash.hashLong(1L), DuckDbHash.hashLong(2L)), DuckDbHash.hashLong(3L))
    assert(h123 == u("12722334483198565868"))
  }

  // --- DuckDB bloom filter ------------------------------------------------

  test("duckdb bloom: roundtrip, no false negatives, FPR bound, serialized size") {
    val bf = DuckDbBloomFilter.create(16384)
    val hashes = (1L to 1000L).map(DuckDbHash.hashLong).toArray
    hashes.foreach(bf.insert)
    assert(hashes.forall(bf.mightContain))
    val blob = bf.serialize()
    assert(blob.length == 8 * (16384 + 1))
    val back = DuckDbBloomFilter.deserialize(blob)
    assert(hashes.forall(back.mightContain))
    assert(hashes.forall(h => DuckDbBloomFilter.probeBlob(blob, h)))
    // FP bound from reference test/sql/duckdb_bloom_filter.test:364-370
    val fps = (100001L to 110000L).map(DuckDbHash.hashLong).count(back.mightContain)
    assert(fps < 200, s"expected <200 false positives of 10000, got $fps")
  }

  test("duckdb bloom: or-merge equals bulk build") {
    val a = DuckDbBloomFilter.create(1024)
    val b = DuckDbBloomFilter.create(1024)
    val all = DuckDbBloomFilter.create(1024)
    (1L to 500L).map(DuckDbHash.hashLong).foreach { h => a.insert(h); all.insert(h) }
    (501L to 1000L).map(DuckDbHash.hashLong).foreach { h => b.insert(h); all.insert(h) }
    a.orMerge(b)
    assert(a.serialize().sameElements(all.serialize()))
  }

  // --- Quotient filter ----------------------------------------------------

  private def seriesHashes(parity: Int): Array[Long] =
    (1 to 100000).filter(_ % 2 == parity).map(i => DuckDbHash.hashLong(i.toLong)).toArray

  test("quotient: golden FP counts (reference test/sql/bitfilters.test:45-53)") {
    val members0 = seriesHashes(0)
    val members1 = seriesHashes(1)
    val qf0 = QuotientFilter.create(16, 4)
    members0.foreach(h => assert(qf0.insert(h)))
    val qf1 = QuotientFilter.create(16, 4)
    members1.foreach(h => assert(qf1.insert(h)))
    // no false negatives
    assert(members0.forall(qf0.mayContain))
    assert(members1.forall(qf1.mayContain))
    // golden false-positive counts: probe filter with the opposite parity
    val fp0 = members1.count(qf0.mayContain)
    val fp1 = members0.count(qf1.mayContain)
    assert(fp0 == 2264, s"quotient filter (remainder 0) FPs: expected 2264, got $fp0")
    assert(fp1 == 2273, s"quotient filter (remainder 1) FPs: expected 2273, got $fp1")
  }

  test("quotient: serialize/deserialize roundtrip and size formula") {
    val qf = QuotientFilter.create(10, 6)
    val hs = (1L to 500L).map(DuckDbHash.hashLong)
    hs.foreach(qf.insert)
    val blob = qf.serialize()
    assert(blob.length == 40 + QuotientFilter.tableSizeBytes(10, 6))
    val back = QuotientFilter.deserialize(blob)
    assert(back.entries == qf.entries)
    assert(hs.forall(back.mayContain))
    assert(back.serialize().sameElements(blob))
  }

  test("quotient: merge is a union") {
    val a = QuotientFilter.create(12, 6)
    val b = QuotientFilter.create(12, 6)
    val ha = (1L to 300L).map(DuckDbHash.hashLong)
    val hb = (301L to 600L).map(DuckDbHash.hashLong)
    ha.foreach(a.insert)
    hb.foreach(b.insert)
    val m = a.merge(b)
    assert((ha ++ hb).forall(m.mayContain))
  }

  test("quotient: strict merge raises on overflow; default merge drops silently (parity)") {
    // fill two same-geometry 16-slot filters from disjoint key ranges
    def fullFilter(seed: Long): QuotientFilter = {
      val f = QuotientFilter.create(4, 8)
      var i = seed
      while (f.entries < f.maxSize) { f.insert(DuckDbHash.hashLong(i)); i += 1 }
      f
    }
    val a = fullFilter(0L)
    val b = fullFilter(1000000L)
    // parity default: merge of two full filters completes, silently
    // dropping b's keys (reference quotient_filter.cpp:399,403)
    val dropped = QuotientFilter.deserialize(a.serialize()).merge(b)
    assert(dropped.entries == a.maxSize)
    // strict: the same merge raises instead of losing keys
    val ex = intercept[IllegalStateException] {
      QuotientFilter.deserialize(a.serialize()).merge(b, strict = true)
    }
    assert(ex.getMessage.contains("strict merge overflow"))
    // strict does NOT raise when nothing is lost: full filter merged with
    // itself re-inserts only already-present fingerprints
    val self = QuotientFilter.deserialize(a.serialize())
      .merge(QuotientFilter.deserialize(a.serialize()), strict = true)
    assert(self.entries == a.maxSize)
  }

  test("quotient: full filter rejects inserts") {
    val qf = QuotientFilter.create(2, 4) // 4 slots
    var inserted = 0
    var i = 0L
    while (inserted < 4) {
      if (qf.insert(DuckDbHash.hashLong(i))) inserted += 1
      i += 1
    }
    assert(!qf.insert(DuckDbHash.hashLong(999999L)))
  }

  // --- Binary fuse filters ------------------------------------------------

  test("binary fuse: golden FP counts (reference test/sql/bitfilters.test:110-117)") {
    val members0 = seriesHashes(0)
    val members1 = seriesHashes(1)
    for ((bits, exp0, exp1) <- Seq((16, 1, 1), (8, 171, 199))) {
      val f0 = BinaryFuseFilter.build(bits, members0.clone(), members0.length)
      val f1 = BinaryFuseFilter.build(bits, members1.clone(), members1.length)
      assert(members0.forall(f0.mightContain), s"fuse$bits false negative in group 0")
      assert(members1.forall(f1.mightContain), s"fuse$bits false negative in group 1")
      val fp0 = members1.count(f0.mightContain)
      val fp1 = members0.count(f1.mightContain)
      assert(fp0 == exp0, s"fuse$bits group-0 FPs: expected $exp0, got $fp0")
      assert(fp1 == exp1, s"fuse$bits group-1 FPs: expected $exp1, got $fp1")
    }
  }

  test("binary fuse: serialized size formula and blob roundtrip") {
    val keys = (1L to 50000L).map(DuckDbHash.hashLong).toArray
    for (bits <- Seq(8, 16)) {
      val f = BinaryFuseFilter.build(bits, keys.clone(), keys.length)
      val blob = f.serialize()
      assert(blob.length == 28 + (bits / 8) * f.arrayLength + (if (bits == 16) 4 else 0))
      val back = BinaryFuseFilter.deserialize(bits, blob)
      assert(keys.forall(back.mightContain))
      assert(keys.forall(k => BinaryFuseFilter.probeBlob(bits, blob, k)))
      assert(back.serialize().sameElements(blob))
    }
  }

  test("binary fuse: 1M-key serialized sizes match published figures (BASELINE.md)") {
    val keys = (1L to 1000000L).map(i => DuckDbHash.hashLong(i)).toArray
    val f8 = BinaryFuseFilter.build(8, keys.clone(), keys.length)
    assert(f8.serializedBytes == 1130524, s"fuse8 1M size: ${f8.serializedBytes}")
    val f16 = BinaryFuseFilter.build(16, keys.clone(), keys.length)
    assert(f16.serializedBytes == 2261024, s"fuse16 1M size: ${f16.serializedBytes}")
  }

  test("binary fuse: duplicates tolerated") {
    val keys = Array.fill(1000)(DuckDbHash.hashLong(7L)) ++ (1L to 1000L).map(DuckDbHash.hashLong)
    val f = BinaryFuseFilter.build(8, keys.clone(), keys.length)
    assert(keys.forall(f.mightContain))
  }

  // --- Xor filters --------------------------------------------------------

  test("xor: no false negatives, FPR sanity, sizes match published figures") {
    val keys = (1L to 50000L).map(DuckDbHash.hashLong).toArray
    for ((bits, maxFpr, expSize) <- Seq((8, 0.01, 61546), (16, 0.001, 123076))) {
      val f = XorFilter.build(bits, keys.clone(), keys.length)
      assert(f.serializedBytes == expSize, s"xor$bits 50k size: ${f.serializedBytes}")
      assert(keys.forall(f.mightContain), s"xor$bits false negative")
      val blob = f.serialize()
      val back = XorFilter.deserialize(bits, blob)
      assert(keys.forall(back.mightContain))
      assert(keys.forall(k => XorFilter.probeBlob(bits, blob, k)))
      val probes = (1000001L to 1050000L).map(DuckDbHash.hashLong)
      val fpr = probes.count(f.mightContain).toDouble / probes.size
      assert(fpr < maxFpr, s"xor$bits FPR $fpr above bound $maxFpr")
    }
  }

  test("xor: 1M-key serialized sizes match published figures") {
    val keys = (1L to 1000000L).map(DuckDbHash.hashLong).toArray
    assert(XorFilter.build(8, keys.clone(), keys.length).serializedBytes == 1230046)
    assert(XorFilter.build(16, keys.clone(), keys.length).serializedBytes == 2460076)
  }
}
