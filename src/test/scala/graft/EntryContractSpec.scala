package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants on [[SparkEntry]] that don't need data:
  * every query has a full value oracle and vice versa. Round-4 verdict #2
  * eliminated the last rows-only (`err: no_oracle`) entries, and this guard
  * keeps the sets from drifting apart again — a new `queries` entry without
  * its oracle (or a stale oracle row) fails here, not in the driver's
  * CORRECTNESS artifact.
  */
class EntryContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"stale oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are well-formed and unique by construction") {
    assert(SparkEntry.queries.keySet.forall(_.startsWith("q_")))
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }
}
