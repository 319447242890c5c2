package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests per SURVEY par.5: no false negatives, serialization
  * roundtrips, merge-is-union, and partition-split invariance (the property
  * Spark's partial aggregation relies on).
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling loop standing in for the scalatestplus bridge
    * (not on the offline classpath): 40 seeded samples per property.
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 40)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach { i =>
      gen.apply(params, Seed(i.toLong)).foreach(body)
    }
  }

  private val keySets: Gen[List[Long]] =
    Gen.chooseNum(1, 400).flatMap(n => Gen.listOfN(n, Gen.long)).map(_.distinct)

  test("no false negatives after serialize/deserialize, all families") {
    forAllSeeded(keySets) { keys0 =>
      if (keys0.nonEmpty) {
        val keys = keys0.map(DuckDbHash.hashLong)
        val arr = keys.toArray

        val bloom = DuckDbBloomFilter.create(256)
        keys.foreach(bloom.insert)
        val bloomBlob = bloom.serialize()
        assert(keys.forall(DuckDbBloomFilter.probeBlob(bloomBlob, _)))

        val qf = QuotientFilter.create(12, 8)
        keys.foreach(qf.insert)
        val qfBlob = qf.serialize()
        assert(keys.forall(QuotientFilter.probeBlob(qfBlob, _)))

        val cb = ClassicBloomFilter.create(1000, 0.01)
        keys.foreach(cb.insert)
        val cbBlob = cb.serialize()
        assert(keys.forall(ClassicBloomFilter.probeBlob(cbBlob, _)))

        for (bits <- Seq(8, 16)) {
          val xf = XorFilter.build(bits, arr.clone(), arr.length).serialize()
          assert(keys.forall(XorFilter.probeBlob(bits, xf, _)))
          val ff = BinaryFuseFilter.build(bits, arr.clone(), arr.length).serialize()
          assert(keys.forall(BinaryFuseFilter.probeBlob(bits, ff, _)))
        }
      }
    }
  }

  test("quotient merge is a union (superset of both inputs)") {
    forAllSeeded(Gen.zip(keySets, keySets)) { case (a0, b0) =>
      if (a0.nonEmpty && b0.nonEmpty) {
        val a = a0.map(DuckDbHash.hashLong)
        val b = b0.map(DuckDbHash.hashLong)
        val qa = QuotientFilter.create(12, 8); a.foreach(qa.insert)
        val qb = QuotientFilter.create(12, 8); b.foreach(qb.insert)
        val m = qa.merge(qb)
        assert((a ++ b).forall(m.mayContain))
      }
    }
  }

  test("partition-split invariance: any split + merge equals bulk build (deterministic families)") {
    forAllSeeded(Gen.zip(keySets, Gen.chooseNum(1, 7))) { case (keys0, splitSeed) =>
      if (keys0.size >= 2) {
        val keys = keys0.map(DuckDbHash.hashLong)
        // simulate Spark's partial aggregation: arbitrary split + arbitrary order
        val parts = keys.zipWithIndex.groupMap(_._2 % splitSeed)(_._1).values.toList

        // duckdb bloom: OR-merge of per-part filters == bulk filter, byte-equal
        val bulk = DuckDbBloomFilter.create(128); keys.foreach(bulk.insert)
        val merged = DuckDbBloomFilter.create(128)
        parts.foreach { p => val f = DuckDbBloomFilter.create(128); p.foreach(f.insert); merged.orMerge(f) }
        assert(merged.serialize().sameElements(bulk.serialize()))

        // xor/fuse: key-buffer concat in any part order -> identical blob to
        // any other concat order (construction is key-set-deterministic)
        for (bits <- Seq(8, 16)) {
          val o1 = parts.flatten.toArray
          val o2 = parts.reverse.flatten.toArray
          assert(BinaryFuseFilter.build(bits, o1.clone(), o1.length).serialize()
            .sameElements(BinaryFuseFilter.build(bits, o2, o2.length).serialize()))
          assert(XorFilter.build(bits, o1.clone(), o1.length).serialize()
            .sameElements(XorFilter.build(bits, o1.reverse, o1.length).serialize()))
        }
      }
    }
  }

  test("hash combine is left-fold (not associative by design) and stable") {
    forAllSeeded(Gen.zip(Gen.long, Gen.long, Gen.long)) { case (a, b, c) =>
      val ab = DuckDbHash.combine(DuckDbHash.hashLong(a), DuckDbHash.hashLong(b))
      val abc = DuckDbHash.combine(ab, DuckDbHash.hashLong(c))
      assert(abc == DuckDbHash.combine(
        DuckDbHash.combine(DuckDbHash.hashLong(a), DuckDbHash.hashLong(b)), DuckDbHash.hashLong(c)))
    }
  }
}
