package graft

import graft.api.GraftSession
import graft.values._

/** Collect-boundary value API: construction from Scala values, recursive
  * unwrap, safe casting, TCK-format rendering, and round-trips through
  * `GraftSession.cypherValues` (reference surface:
  * okapi-api/.../api/value/CypherValue.scala:139-535). */
class CypherValueSpec extends SparkTestBase {
  import TckFixtures._

  lazy val session = new GraftSession(spark)
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b"))),
    Seq(R(10, 1, 2, "KNOWS", Map("since" -> 2010))))

  test("apply converts Scala primitives") {
    assert(CypherValue(1) == CypherInteger(1L))
    assert(CypherValue(1.5) == CypherFloat(1.5))
    assert(CypherValue("x") == CypherString("x"))
    assert(CypherValue(true) == CypherBoolean(true))
    assert(CypherValue(null) == CypherNull)
    assert(CypherValue(BigDecimal(2)) == CypherBigDecimal(BigDecimal(2)))
  }

  test("apply converts nested collections recursively") {
    val v = CypherValue(Seq(1, Map("a" -> 2)))
    assert(v == CypherList(Seq(CypherInteger(1),
      CypherMap(Map("a" -> CypherInteger(2))))))
  }

  test("unwrap recurses through lists and maps") {
    val v = CypherList(Seq(CypherInteger(1),
      CypherMap(Map("a" -> CypherString("x")))))
    assert(v.unwrap == Seq(1L, Map("a" -> "x")))
  }

  test("getValue is null-safe") {
    assert(CypherNull.getValue.isEmpty)
    assert(CypherInteger(3).getValue.contains(3L))
  }

  test("as and cast") {
    assert(CypherInteger(3).as[Long].contains(3L))
    assert(CypherInteger(3).as[String].isEmpty)
    assert(CypherString("s").cast[String] == "s")
    intercept[IllegalArgumentException](CypherString("s").cast[java.lang.Long])
  }

  test("isOrContainsNull finds nested nulls") {
    assert(CypherList(Seq(CypherInteger(1), CypherNull)).isOrContainsNull)
    assert(!CypherList(Seq(CypherInteger(1))).isOrContainsNull)
    assert(CypherMap(Map("a" -> CypherNull)).isOrContainsNull)
  }

  test("toCypherString TCK format") {
    assert(CypherString("it's").toCypherString == "'it\\'s'")
    assert(CypherList(Seq(CypherInteger(1), CypherNull)).toCypherString
      == "[1, null]")
    assert(CypherMap(Map("b" -> CypherInteger(1), "a" -> CypherBoolean(true)))
      .toCypherString == "{a: true, b: 1}")
    assert(CypherFloat(2.0).toCypherString == "2.0")
    val n = CypherNode(1, Set("B", "A"), CypherMap("k" -> 5))
    assert(n.toCypherString == "(:A:B {k: 5})")
    val r = CypherRelationship(10, 1, 2, "KNOWS", CypherMap.empty)
    assert(r.toCypherString == "[:KNOWS]")
  }

  test("toCypherString renders durations in ISO-8601 and BigDecimal plainly") {
    assert(CypherDuration(1, 2, 0).toCypherString == "P1M2D")
    assert(CypherDuration(0, 0, 3723000000L).toCypherString == "PT1H2M3S")
    assert(CypherDuration(14, 1, 500000L).toCypherString == "P14M1DT0.5S")
    assert(CypherDuration(0, 0, 0).toCypherString == "PT0S")
    assert(CypherDuration(0, -1, -3600000000L).toCypherString == "P-1DT-1H")
    assert(CypherDuration(0, 0, -90500000L).toCypherString == "PT-1M-30.5S")
    assert(CypherBigDecimal(BigDecimal("1.50")).toCypherString == "1.50")
  }

  test("cypherValues returns nodes with labels and properties") {
    val vs = session.cypherValues(g, "MATCH (n:A) RETURN n")
    assert(vs.size == 1)
    val node = vs.head("n").cast[CypherNode]
    assert(node.labels == Set("A"))
    assert(node.properties("name") == CypherString("a"))
    assert(node.properties("num") == CypherInteger(1))
  }

  test("cypherValues returns relationships with type and endpoints") {
    val vs = session.cypherValues(g, "MATCH ()-[r:KNOWS]->() RETURN r")
    val rel = vs.head("r").cast[CypherRelationship]
    assert(rel.relType == "KNOWS")
    assert(rel.start != rel.end)
    assert(rel.properties("since") == CypherInteger(2010))
  }

  test("cypherValues maps missing keys to CypherNull") {
    val vs = session.cypherValues(g, "MATCH (n:B) RETURN n.name AS name")
    assert(vs.head("nope") == CypherNull)
    assert(vs.head("name") == CypherString("b"))
  }

  test("cypherValues returns paths with node and rel ids") {
    val vs = session.cypherValues(g,
      "MATCH p = (a:A)-[:KNOWS]->(b) RETURN p")
    val path = vs.head("p").cast[CypherPath]
    assert(path.length == 1)
    assert(path.nodeIds.size == 2)
    assert(path.relIds.size == 1)
  }

  test("duration values surface as CypherDuration") {
    val vs = session.cypherValues(g, "RETURN duration('P1M2D') AS d")
    val d = vs.head("d").cast[CypherDuration]
    assert(d.months == 1 && d.days == 2 && d.micros == 0)
  }
}
