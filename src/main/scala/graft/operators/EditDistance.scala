package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — ALL pairs within Levenshtein distance
  * `maxDist`, no length exclusions — via partition-based candidate
  * generation (the PassJoin scheme: Li/Deng/Wang/Feng, "PassJoin: A
  * Partition-based Method for Similarity Joins", PVLDB 5(3), 2011). The
  * reference engine has no such operator (its joins delegate to the host,
  * SURVEY §2b); this is a pipeline addition for record linkage / fuzzy key
  * dedup.
  *
  * Pigeonhole: split every INDEXED string into `maxDist + 1` contiguous
  * segments. If ed(s, t) <= maxDist, the edits touch at most `maxDist`
  * segments, so at least one segment of s survives EXACTLY as a substring
  * of t, displaced by at most `maxDist` positions. Candidates are
  * therefore an EQUI-join: the index side emits its k+1
  * (length, segIdx, segText) keys; the probe side emits the substrings
  * that could match a segment of any indexed length within +-k — at most
  * (2k+1) lengths x (k+1) segments x (2k+1) shifts keys per row, all
  * computed by codegen'd higher-order functions (no UDFs).
  *
  * Indexing needs k+1 nonempty segments, so only strings of length >= k+1
  * are indexed. Completeness for shorter strings: (short, long) pairs are
  * caught by probing the short side against the long side's index (the
  * reverse direction), and (short, short) pairs — where BOTH lengths are
  * <= k, hence trivially ed <= k — by a bounded cross join of the short
  * slivers (at 100 TB the <= k-char strings are a degenerate sliver; the
  * cross join is explicitly bounded by that sliver's size squared).
  *
  * Scale shape: explode -> shuffle equi-join on (len, segIdx, segText) ->
  * distinct pair ids -> verify. Segment texts are ~len/(k+1) characters,
  * far more selective than q-grams on short strings; the shuffle carries
  * (key, id) only — strings are joined back per DISTINCT candidate pair,
  * and the verify is Spark's builtin bounded `levenshtein(a, b, k)`
  * (early-exits past k, codegen'd). Skewed segment texts (shared prefixes
  * like "Customer#00") bound fan-in by (segment frequency)^2 per key; the
  * mitigation knob at extreme scale is indexing the rarest segment first
  * (prefix filtering) — documented, not needed at gate scale.
  */
object EditDistance {

  /** Candidate (index-id, probe-id) pairs sharing a surviving segment.
    * Both frames must carry (__id, __s, __l).
    */
  private def candidatePairs(index: DataFrame, probe: DataFrame, k: Int): DataFrame = {
    val k1 = k + 1
    val idx = index
      .where(col("__l") >= k1)
      .select(col("__id").as("__ida"), explode(expr(
        s"""transform(sequence(0, $k), i -> named_struct(
           |  'l', __l, 'i', i,
           |  'seg', substring(__s,
           |            i * (__l div $k1) + least(i, __l % $k1) + 1,
           |            (__l div $k1) + IF(i < __l % $k1, 1, 0))))""".stripMargin)).as("__k"))
      .select(col("__ida"), col("__k.l").as("__jl"), col("__k.i").as("__ji"),
        col("__k.seg").as("__seg"))
    // lp >= k1 guards both the nonempty-segment invariant and the
    // ascending-sequence requirement (m >= 1 ==> m + k >= k1)
    val prb = probe
      .select(col("__id").as("__idb"), col("__s"), col("__l"), explode(expr(
        s"""flatten(flatten(
           |  transform(sequence(greatest(__l - $k, $k1), __l + $k), lp ->
           |    transform(sequence(0, $k), i ->
           |      filter(
           |        transform(sequence(-$k, $k), d -> named_struct(
           |          'l', lp, 'i', i,
           |          'st', i * (lp div $k1) + least(i, lp % $k1) + d,
           |          'ln', (lp div $k1) + IF(i < lp % $k1, 1, 0))),
           |        x -> x.st >= 0 AND x.st + x.ln <= __l)))))""".stripMargin)).as("__k"))
      .select(col("__idb"), col("__k.l").as("__jl"), col("__k.i").as("__ji"),
        expr("substring(__s, __k.st + 1, __k.ln)").as("__seg"))
    idx.join(prb, Seq("__jl", "__ji", "__seg")).select("__ida", "__idb")
  }

  /** All (left.id, right.id, dist) pairs with ed <= maxDist between
    * `left.strCol` and `right.strCol`, as (`id_a`, `id_b`, `dist`).
    */
  def join(left: DataFrame, right: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist
    val a = left.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__l"))
    val b = right.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__l"))

    // forward: left indexed, right probes (covers left length >= k+1);
    // reverse: the left-short sliver probes right's index;
    // short x short: both lengths <= k ==> ed <= k holds trivially
    val forward = candidatePairs(a, b, k)
    val reverse = candidatePairs(b, a.where(col("__l") <= k), k)
      .select(col("__idb").as("__ida"), col("__ida").as("__idb"))
    val shorts = a.where(col("__l") <= k).select(col("__id").as("__ida"))
      .crossJoin(b.where(col("__l") <= k).select(col("__id").as("__idb")))

    forward.union(reverse).union(shorts)
      .where(col("__ida").isNotNull && col("__idb").isNotNull)
      .distinct()
      .join(left.select(col(idCol).as("__ida"), col(strCol).as("__sa")), "__ida")
      .join(right.select(col(idCol).as("__idb"), col(strCol).as("__sb")), "__idb")
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        levenshtein(col("__sa"), col("__sb"), k).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }

  /** Self-join form for fuzzy-key dedup: unordered pairs (id_a < id_b)
    * within `maxDist`. Every true pair is found in at least one probe
    * direction; the canonical ordering + distinct dedupes the other.
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame =
    join(df, df, idCol, strCol, maxDist)
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
      .distinct()
}
