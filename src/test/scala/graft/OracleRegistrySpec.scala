package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the per-family oracle split (graft/oracle): the family maps
  * must stay key-disjoint (a `++` collision would silently shadow one
  * family's twin with another's) and exactly aligned with the query
  * registry — every registered query has a twin except the documented
  * rows-only set. */
class OracleRegistrySpec extends AnyFunSuite {
  private val families = Seq(
    "GraphOracles" -> graft.oracle.GraphOracles.sql,
    "SnapshotOracles" -> graft.oracle.SnapshotOracles.sql,
    "CorpusOracles" -> graft.oracle.CorpusOracles.sql,
    "VectorOracles" -> graft.oracle.VectorOracles.sql,
    "CurationOracles" -> graft.oracle.CurationOracles.sql,
    "EventOracles" -> graft.oracle.EventOracles.sql)

  test("family maps are pairwise disjoint") {
    val merged = SparkEntry.oracleSql
    assert(families.map(_._2.size).sum == merged.size,
      "key collision across family oracle maps")
  }

  test("every registered query has a twin, except the rows-only set") {
    val rowsOnly = Set("heavy_hitters_sketch")
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == rowsOnly)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle twins without a query: $orphans")
  }

  test("no family is empty and none dominates accidentally") {
    families.foreach { case (name, m) =>
      assert(m.nonEmpty, s"$name is empty")
    }
  }
}
