package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of [[SparkEntry]] that nothing else
  * pins: every gate must carry a live DuckDB oracle (a `queries` entry
  * without an `oracleSql` entry silently degrades the driver's check to
  * rows-only — exactly the regression class round-11 retired the last
  * golden pin to prevent), and no oracle may name a gate that does not
  * exist (a renamed gate would otherwise leave its oracle checking
  * nothing). Pure map comparisons — no Spark session.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every gate has an oracle and every oracle has a gate (1:1)") {
    val gates = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missingOracle = gates -- oracles
    val orphanOracle = oracles -- gates
    assert(missingOracle.isEmpty,
      s"gates without a DuckDB oracle (driver falls back to rows-only): " +
        missingOracle.toSeq.sorted.mkString(", "))
    assert(orphanOracle.isEmpty,
      s"oracles naming no gate: ${orphanOracle.toSeq.sorted.mkString(", ")}")
  }

  test("oracle SQL bodies are non-empty") {
    // (no semicolon/single-statement heuristic: several oracles carry
    // literal ';' inside HTML-entity test strings)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
    }
  }
}
