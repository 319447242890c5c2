package graft

/** The certified hash-vector table: every entry is (name, Spark SQL value
  * arguments, expected unsigned-decimal value) with expectations taken from
  * the reference's oracle goldens generated against real DuckDB wheels
  * (test/generate/hash_values_v1.5.1.json, generate_hash_values.py).
  * One definition generates both the Spark query and the DuckDB oracle so
  * names and coverage can never drift apart.
  *
  * `X'DE4144'` is DuckDB's `'\xDEAD'::BLOB`: byte 0xDE followed by the
  * literal characters "AD".
  */
object HashVectors {

  // (name, version string, value-args SQL, expected unsigned decimal)
  private val vectors: Seq[(String, String, String)] = Seq(
    // single values, all int widths hash alike (sign/zero extension paths)
    ("i42", "'v1.5.1', 42", "7199933130570745587"),
    ("l42", "'v1.5.1', CAST(42 AS BIGINT)", "7199933130570745587"),
    ("t42", "'v1.5.1', CAST(42 AS TINYINT)", "7199933130570745587"),
    ("s42", "'v1.5.1', CAST(42 AS SMALLINT)", "7199933130570745587"),
    ("f42", "'v1.5.1', CAST(42 AS FLOAT)", "15290891319722589465"),
    ("d42", "'v1.5.1', CAST(42 AS DOUBLE)", "870828535671730594"),
    ("zero_f", "'v1.5.1', CAST(0.0 AS FLOAT)", "0"),
    ("zero_d", "'v1.5.1', CAST(0.0 AS DOUBLE)", "0"),
    ("hello", "'v1.5.1', 'hello'", "8628213525773890682"),
    ("empty_s", "'v1.5.1', ''", "5104928228550385088"),
    ("long_s", "'v1.5.1', 'a longer string for testing'", "8858858695776456214"),
    ("dead_blob", "'v1.5.1', X'DE4144'", "5774709339516911511"),
    ("neg1_t", "'v1.5.1', CAST(-1 AS TINYINT)", "4739667815145166545"),
    ("neg1_s", "'v1.5.1', CAST(-1 AS SMALLINT)", "4739667815145166545"),
    ("neg1_i", "'v1.5.1', -1", "4739667815145166545"),
    ("neg1_l", "'v1.5.1', CAST(-1 AS BIGINT)", "4939931809569846361"),
    ("neg128_t", "'v1.5.1', CAST(-128 AS TINYINT)", "17192691921624903227"),
    // multi-value CombineHash
    ("m_42_hello", "'v1.5.1', 42, 'hello'", "17001236256828606196"),
    ("m_1_2_3", "'v1.5.1', 1, 2, 3", "12722334483198565868"),
    ("m_int_double_varchar", "'v1.5.1', 42, CAST(3.14 AS DOUBLE), 'test'", "15395057542793400417"),
    ("m_42_test", "'v1.5.1', 42, 'test'", "15366605421718712891"),
    // 4x4 type cartesian of CombineHash pairs
    ("c_hi_x_hi", "'v1.5.1', 'hi', 'hi'", "18426546973343814012"),
    ("c_hi_x_7", "'v1.5.1', 'hi', 7", "2364305356417260015"),
    ("c_hi_x_25d", "'v1.5.1', 'hi', CAST(2.5 AS DOUBLE)", "9722775345991724238"),
    ("c_hi_x_dead", "'v1.5.1', 'hi', X'DE4144'", "708133225528548914"),
    ("c_7_x_hi", "'v1.5.1', 7, 'hi'", "9085399987862564094"),
    ("c_7_x_7", "'v1.5.1', 7, 7", "11628961430775669869"),
    ("c_7_x_25d", "'v1.5.1', 7, CAST(2.5 AS DOUBLE)", "523492153047175500"),
    ("c_7_x_dead", "'v1.5.1', 7, X'DE4144'", "9835341060443743152"),
    ("c_25d_x_hi", "'v1.5.1', CAST(2.5 AS DOUBLE), 'hi'", "10795019162334376821"),
    ("c_25d_x_7", "'v1.5.1', CAST(2.5 AS DOUBLE), 7", "5384072398951775206"),
    ("c_25d_x_25d", "'v1.5.1', CAST(2.5 AS DOUBLE), CAST(2.5 AS DOUBLE)", "17048832455438470855"),
    ("c_25d_x_dead", "'v1.5.1', CAST(2.5 AS DOUBLE), X'DE4144'", "7179979195392162875"),
    ("c_dead_x_hi", "'v1.5.1', X'DE4144', 'hi'", "15518098955802894936"),
    ("c_dead_x_7", "'v1.5.1', X'DE4144', 7", "589075594617367243"),
    ("c_dead_x_25d", "'v1.5.1', X'DE4144', CAST(2.5 AS DOUBLE)", "12541784689683980266"),
    ("c_dead_x_dead", "'v1.5.1', X'DE4144', X'DE4144'", "2391597745859144982"),
    // cross-version equality on little-endian (v1.4.0-v1.6.0 identical)
    ("v144_42", "'v1.4.4', 42", "7199933130570745587"),
    ("v160_42", "'v1.6.0', 42", "7199933130570745587"),
    ("valias_42", "'1.5.1', 42", "7199933130570745587"),
    ("v140_hello", "'v1.4.0', 'hello'", "8628213525773890682"))

  /** Spark query computing every vector as an unsigned decimal string.
    * One `stack` generator over a single projection instead of a 41-way
    * UNION ALL of one-row scans: the union shape cost ~4s of plan/codegen
    * work on a cold JVM for 41 rows of output.
    */
  val sparkSql: String = {
    val pairs = vectors.map { case (name, args, _) =>
      s"'$name', conv(hex(bitfilters_duckdb_hash($args)), 16, 10)"
    }
    s"SELECT stack(${vectors.size},\n  ${pairs.mkString(",\n  ")}) AS (name, h)\nORDER BY name"
  }

  /** DuckDB oracle with the certified expected values. */
  val oracleSqlText: String =
    "SELECT name, h FROM (VALUES " +
      vectors.map { case (name, _, exp) => s"('$name', '$exp')" }.mkString(",\n") +
      ") t(name, h) ORDER BY name"
}
