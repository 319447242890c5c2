package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Hashing

/** Pure-JVM tests for the SQL-portable text/hash primitives (no Spark). */
class TextNativeSpec extends AnyFunSuite {

  test("mulMod61/affineMod61 match DuckDB HUGEINT arithmetic (certified vectors)") {
    // vectors generated with duckdb: (a * h + b) % (2^61 - 1) in HUGEINT
    val vectors = Seq(
      (2305843009213693950L, 1152921504606846975L, 7L, 1152921504606846983L),
      (123456789012345678L, 987654321098765432L, 55555L, 1974130249480715175L),
      (2305843009213693950L, 2305843009213693950L, 2305843009213693950L, 0L),
      (1L, 0L, 0L, 0L),
      (1152921504606846975L, 773738358679819896L, 42L, 1918973829873784045L))
    for ((a, h, b, expect) <- vectors)
      assert(Hashing.affineMod61(a, h, b) == expect, s"affine($a, $h, $b)")
  }

  test("minhash affine params are deterministic and in range") {
    val (a1, b1) = MinHashPerm.params(128)
    val (a2, b2) = MinHashPerm.params(128)
    assert(a1.toSeq == a2.toSeq && b1.toSeq == b2.toSeq)
    // pinned: these constants are baked into shipped oracle SQL — a
    // generator change would silently invalidate cross-engine parity
    assert(a1.take(3).toSeq == Seq(854141560392487381L, 1097364413940080703L, 1628658309122418813L))
    assert(a1.forall(x => x >= 1 && x < Hashing.Mersenne61))
    assert(b1.forall(x => x >= 0 && x < Hashing.Mersenne61))
    assert(a1.distinct.length == 128, "params must be distinct (collision would correlate permutations)")
  }

  test("lang_id detects, ties toward larger code, und on no hits") {
    def d(s: String) = LangId.detect(UTF8String.fromString(s)).toString
    assert(d("the cat and the hat is on it") == "en")
    assert(d("der hund und die katze ist auf") == "de")
    assert(d("el perro y la casa de los gatos") == "es")
    assert(d("le chien et la maison est dans") == "fr")
    assert(d("zxcvb qwerty 12345") == "und")
    assert(d("") == "und")
    assert(d("la") == "fr", "la is in both es and fr lists; tie goes to larger code")
    assert(d("THE AND OF") == "en", "case-insensitive")
    assert(d("  the\t and\nof  ") == "en", "whitespace runs")
  }

  test("rolling_hash: Horner over code points mod 1e9+7") {
    def rh(s: String): Long = RollingHash.hash(UTF8String.fromString(s))
    assert(rh("") == 0L)
    assert(rh("a") == 97L)
    assert(rh("abc") == ((97L * 257 + 98) * 257 + 99) % 1000000007L)
    // multi-byte code point: U+00E9 (e-acute) is one code point, 233
    assert(rh("abé") == ((97L * 257 + 98) * 257 + 233) % 1000000007L)
    // supplementary plane: one code point despite two UTF-16 units
    assert(rh(new String(Character.toChars(0x1F600))) == 0x1F600 % 1000000007L)
    assert(rh("abc") != rh("acb"), "order-sensitive (rolling, not bag-of-chars)")
  }

  test("vec_dot / vec_norm match sequential HOF semantics") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Double*) = ArrayData.toArrayData(xs.toArray)
    assert(VectorOps.dot(arr(1, 2, 3), arr(4, 5, 6), false, false) == 32.0)
    assert(VectorOps.dot(arr(), arr(), false, false) == 0.0)
    // ragged: min-length semantics
    assert(VectorOps.dot(arr(1, 2, 3), arr(10), false, false) == 10.0)
    assert(VectorOps.norm(arr(3, 4), false) == 5.0)
    assert(VectorOps.norm(arr(), false) == 0.0)
    // sequential (not pairwise/tree) accumulation: (a+b)+c exactly
    val xs = Seq(1e16, 1.0, -1e16)
    val expected = xs.foldLeft(0.0)((acc, x) => acc + x * 1.0)
    assert(VectorOps.dot(ArrayData.toArrayData(xs.toArray),
      ArrayData.toArrayData(Array(1.0, 1.0, 1.0)), false, false) == expected)
  }

  test("token_count / text_metrics match regex semantics on random strings") {
    import java.util.regex.Pattern
    val tokenPat = Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    val rnd = new scala.util.Random(42)
    val alphabet = "ab z\t\n12.,!\u00e9\u4e2d  the and"
    def randomString(): String =
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 2000) {
      val s = randomString()
      val u = UTF8String.fromString(s)
      // token_count == number of regex matches
      val m = tokenPat.matcher(s)
      var expected = 0L
      while (m.find()) expected += 1
      assert(TextMetrics.tokenCount(u) == expected, s"tokenCount('$s')")
      // text_metrics words/toks == split sizes with limit=-1 (Spark semantics)
      val row = TextMetrics.computeRow(u)
      assert(row.getLong(0) == s.codePointCount(0, s.length).toLong, s"chars('$s')")
      assert(row.getLong(1) == Pattern.compile(" ", Pattern.LITERAL).split(s, -1).length.toLong, s"words('$s')")
      assert(row.getLong(2) == s.codePoints().toArray.count(cp =>
        !Character.toString(cp).matches("[A-Za-z0-9\\s]")).toLong, s"punct('$s')")
      assert(row.getLong(4) == Pattern.compile("\\s+").split(s.toLowerCase, -1).length.toLong, s"toks('$s')")
    }
  }

  test("md5_prefix64 equals the composed hex-prefix construction") {
    import java.security.MessageDigest
    for (str <- Seq("", "a", "hello", "the cat sat", "\u00e9\u4e2d multi byte", "x" * 1000)) {
      val hex = MessageDigest.getInstance("MD5").digest(str.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val expected = java.lang.Long.parseLong(hex.take(15), 16)
      assert(PortableHash.md5Prefix64(UTF8String.fromString(str)) == expected, str.take(20))
    }
  }
}
