package graft.tools

import graft.core._

/** Single-node filter-core microbenchmark filling BASELINE.md's "to be
  * measured" table: build and probe throughput per family, serialized sizes
  * and FP counts at n in {50k, 600k}. Run: sbt "runMain graft.tools.FilterBench"
  */
object FilterBench {
  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    for (n <- Seq(50000, 600000)) {
      val keys = (1 to n).map(i => DuckDbHash.hashLong(i.toLong)).toArray
      val probesNeg = ((n + 1) to (2 * n)).map(i => DuckDbHash.hashLong(i.toLong)).toArray
      println(s"=== n=$n")

      def report(name: String, buildSec: Double, blob: Array[Byte], probe: Long => Boolean): Unit = {
        // warm + measure probes (members + non-members)
        keys.take(1000).foreach(probe)
        val (fn, tProbeM) = timeIt(keys.count(k => !probe(k)))
        val (fp, tProbeN) = timeIt(probesNeg.count(probe))
        println(f"$name%-22s build ${n / buildSec / 1e6}%6.1f Mkeys/s  " +
          f"probe ${(n / tProbeM + n / tProbeN) / 2 / 1e6}%6.1f Mprobes/s  " +
          f"size ${blob.length}%9d B (${blob.length * 8.0 / n}%5.2f bits/key)  fn=$fn fp=$fp (${fp * 100.0 / n}%.3f%%)")
      }

      for (bits <- Seq(8, 16)) {
        val (xf, t) = timeIt(XorFilter.build(bits, keys.clone(), n).serialize())
        report(s"xor$bits", t, xf, XorFilter.probeBlob(bits, xf, _))
        val (ff, t2) = timeIt(BinaryFuseFilter.build(bits, keys.clone(), n).serialize())
        report(s"binary_fuse$bits", t2, ff, BinaryFuseFilter.probeBlob(bits, ff, _))
      }
      val q = if (n <= 65536) 16 else 20
      val (qf, tq) = timeIt { val f = QuotientFilter.create(q, 8); keys.foreach(f.insert); f.serialize() }
      report(s"quotient(q=$q,r=8)", tq, qf, QuotientFilter.probeBlob(qf, _))
      val sectors = Integer.highestOneBit(n / 2)
      val (bf, tb) = timeIt { val f = DuckDbBloomFilter.create(sectors); keys.foreach(f.insert); f.serialize() }
      report(s"duckdb_bloom($sectors)", tb, bf, DuckDbBloomFilter.probeBlob(bf, _))
      val (cb, tc) = timeIt { val f = ClassicBloomFilter.create(n, 0.01); keys.foreach(f.insert); f.serialize() }
      report("classic_bloom(1%)", tc, cb, ClassicBloomFilter.probeBlob(cb, _))
      val (hashes, th) = timeIt((1 to n).map(i => DuckDbHash.hashLong(i.toLong)).toArray)
      println(f"hash throughput: ${n / th / 1e6}%6.1f Mhashes/s (${hashes.length} keys)")
    }
  }
}
