package graft.tools

import graft.core._

/** Library-surface smoke driver: build -> serialize -> deserialize -> probe
  * for every filter family, plus error paths. Run: sbt "runMain graft.tools.SmokeCore"
  */
object SmokeCore {
  def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)

  def main(args: Array[String]): Unit = {
    // 1) cross-engine hash check vs live DuckDB 1.0 (freshly generated values)
    val oracle = Seq(
      2671521945691753783L -> "15610132216258790398",
      -3720958657989204912L -> "80955607330571406",
      -2875293200062377941L -> "18114528437098465506",
      -651203574895259915L -> "6855432294921172226",
      -3026239342489546536L -> "4901432840579259285")
    val hashOk = oracle.forall { case (v, exp) => DuckDbHash.hashLong(v) == u(exp) }
    println(s"[1] cross-engine hash vs live duckdb: ${if (hashOk) "MATCH" else "MISMATCH"}")

    // 2) end-to-end: build -> serialize -> deserialize -> probe
    val keys = (1L to 20000L).map(k => DuckDbHash.hashLong(k)).toArray
    val bloom = DuckDbBloomFilter.create(4096); keys.foreach(bloom.insert)
    val bblob = bloom.serialize()
    val qf = QuotientFilter.create(16, 8); keys.foreach(qf.insert)
    val qblob = qf.serialize()
    val xor8 = XorFilter.build(8, keys.clone(), keys.length).serialize()
    val fuse16 = BinaryFuseFilter.build(16, keys.clone(), keys.length).serialize()
    val members = (1L to 20000L).map(DuckDbHash.hashLong)
    val nonMembers = (500001L to 520000L).map(DuckDbHash.hashLong)
    println(s"[2] blob sizes: bloom=${bblob.length} quotient=${qblob.length} xor8=${xor8.length} fuse16=${fuse16.length}")
    val fnB = members.count(h => !DuckDbBloomFilter.probeBlob(bblob, h))
    val qfDes = QuotientFilter.deserialize(qblob)
    val fnQ = members.count(h => !qfDes.mayContain(h))
    val fnX = members.count(h => !XorFilter.probeBlob(8, xor8, h))
    val fnF = members.count(h => !BinaryFuseFilter.probeBlob(16, fuse16, h))
    println(s"[3] false negatives (must all be 0): bloom=$fnB quotient=$fnQ xor8=$fnX fuse16=$fnF")
    println(f"[4] FP rates on 20k non-members: bloom=${nonMembers.count(DuckDbBloomFilter.probeBlob(bblob, _)) / 20000.0}%.4f " +
      f"quotient=${nonMembers.count(qfDes.mayContain) / 20000.0}%.4f " +
      f"xor8=${nonMembers.count(XorFilter.probeBlob(8, xor8, _)) / 20000.0}%.4f " +
      f"fuse16=${nonMembers.count(BinaryFuseFilter.probeBlob(16, fuse16, _)) / 20000.0}%.4f")

    // 5) probes off the happy path
    def tryIt(label: String)(f: => Any): Unit =
      try { f; println(s"[5] $label: NO ERROR (unexpected?)") }
      catch { case e: Exception => println(s"[5] $label -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}") }
    tryIt("garbage blob to quotient deserialize")(QuotientFilter.deserialize(Array[Byte](1, 2, 3)))
    tryIt("garbage blob to bloom deserialize")(DuckDbBloomFilter.deserialize(Array.fill[Byte](40)(7)))
    tryIt("bad version string")(DuckDbHash.requireSupported("v9.9.9"))
    tryIt("xor build over zero keys")(XorFilter.build(8, Array.empty[Long], 0))
    tryIt("quotient q+r > 64")(QuotientFilter.create(40, 30))

    // 6) merge across the serialize boundary
    val qa = QuotientFilter.create(14, 6); (1L to 5000L).map(DuckDbHash.hashLong).foreach(qa.insert)
    val qb = QuotientFilter.create(14, 6); (5001L to 10000L).map(DuckDbHash.hashLong).foreach(qb.insert)
    val merged = QuotientFilter.deserialize(qa.serialize()).merge(QuotientFilter.deserialize(qb.serialize()))
    println(s"[6] merged quotient covers both halves: ${(1L to 10000L).map(DuckDbHash.hashLong).forall(merged.mayContain)}")
  }
}
