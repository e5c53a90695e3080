package graft.route

import graft.model.TableId
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's `SelectorsTest.testTableSelector`
  * (flink-cdc-common/src/test/java/.../schema/SelectorsTest.java:28-134):
  * the escaped-dot grammar and part-count-sensitive matching, replayed
  * assertion-for-assertion against graft's Selectors.
  */
class SelectorsParitySpec extends AnyFunSuite {

  private def id(ns: String, sc: String, t: String) =
    TableId(Option(ns), Option(sc), t)

  private def allowed(s: Selectors, ns: String, sc: String, t: String): Unit =
    assert(s.isMatch(id(ns, sc, t)), s"expected match: $ns.$sc.$t")
  private def notAllowed(s: Selectors, ns: String, sc: String, t: String): Unit =
    assert(!s.isMatch(id(ns, sc, t)), s"expected NO match: $ns.$sc.$t")

  test("three-part selectors: namespace.schema.table") {
    val s = Selectors.includeTables("db.sc1.A[0-9]+,db.sc2.B[0-1]+,db.sc1.sc1")
    allowed(s, "db", "sc1", "sc1")
    allowed(s, "db", "sc1", "A1")
    allowed(s, "db", "sc1", "A2")
    allowed(s, "db", "sc2", "B0")
    allowed(s, "db", "sc2", "B1")
    notAllowed(s, "db", "sc1", "A")
    notAllowed(s, "db", "sc1a", "B")
    notAllowed(s, "db", "sc1", "AA")
    notAllowed(s, "db", "sc2", "B2")
    notAllowed(s, "db2", "sc1", "A1")
    notAllowed(s, "db2", "sc1", "A2")
    notAllowed(s, "db", "sc11", "A1")
    notAllowed(s, "db", "sc1A", "A1")
  }

  test("escaped dot inside the namespace part is a regex any-char") {
    val s = Selectors.includeTables(
      "db\\..sc1.A[0-9]+,db.sc2.B[0-1]+,db\\..sc1.sc1,db.sc1.sc1")
    allowed(s, "db", "sc1", "sc1")
    allowed(s, "db1", "sc1", "sc1")
    allowed(s, "dba", "sc1", "sc1")
    allowed(s, "db1", "sc1", "A1")
    allowed(s, "dba", "sc1", "A2")
    allowed(s, "db", "sc2", "B0")
    allowed(s, "db", "sc2", "B1")
    notAllowed(s, "db", "sc1", "A")
    notAllowed(s, "db", "sc1a", "B")
    notAllowed(s, "db", "sc1", "AA")
    notAllowed(s, "db", "sc2", "B2")
    notAllowed(s, "dba1", "sc1", "A1")
    notAllowed(s, "dba2", "sc1", "A2")
    notAllowed(s, "db", "sc11", "A1")
    notAllowed(s, "db", "sc1A", "A1")
  }

  test("two-part selectors match schema.table ids only") {
    val s = Selectors.includeTables("sc1.A[0-9]+,sc2.B[0-1]+,sc1.sc1")
    allowed(s, null, "sc1", "sc1")
    allowed(s, null, "sc1", "A1")
    allowed(s, null, "sc1", "A2")
    allowed(s, null, "sc2", "B0")
    allowed(s, null, "sc2", "B1")
    notAllowed(s, "db", "sc1", "A1") // a 3-part id needs a 3-part selector
    notAllowed(s, null, "sc1", "A")
    notAllowed(s, null, "sc2", "B")
    notAllowed(s, null, "sc1", "AA")
    notAllowed(s, null, "sc11", "A1")
    notAllowed(s, null, "sc1A", "A1")
    notAllowed(s, null, "sc2", "B2")
  }

  test("one-part selectors match bare table names only") {
    val s = Selectors.includeTables("\\.A[0-9]+,B[0-1]+,sc1")
    allowed(s, null, null, "sc1")
    notAllowed(s, "db", "sc1", "sc1")
    notAllowed(s, null, "sc1", "sc1")
    allowed(s, null, null, "1A1") // \. is any char before A[0-9]+
    allowed(s, null, null, "AA2")
    allowed(s, null, null, "B0")
    allowed(s, null, null, "B1")
    notAllowed(s, "db", "sc1", "A1")
    notAllowed(s, null, null, "A")
    notAllowed(s, null, null, "B")
    notAllowed(s, null, null, "2B")
  }

  test("single-pattern selectors") {
    allowed(Selectors.includeTables("sc1.sc1"), null, "sc1", "sc1")
    allowed(Selectors.includeTables("sc1.sc[0-9]+"), null, "sc1", "sc1")
    allowed(Selectors.includeTables("sc1.\\.*"), null, "sc1", "sc1")
  }
}
