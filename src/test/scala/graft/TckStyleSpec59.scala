package graft

import graft.api.CypherError._

/** TCK-style conformance, part 59 — boolean-context type discipline.
  * A statically non-boolean expression in a boolean position (WHERE,
  * AND/OR/XOR/NOT operands, CASE WHEN conditions) raises a classified
  * SyntaxError:InvalidArgumentType (the TCK coordinate for statically
  * detected type violations, same as part 24's NOT-on-a-number) at compile time — Neo4j's "expected
  * Boolean" — never a leaked Spark DATATYPE_MISMATCH / FILTER_NOT_BOOLEAN
  * analysis error (the same stance as part 57's implicit-grouping
  * classification). Null conditions stay legal (three-valued: never
  * taken); statically-unknown types (dynamic property reads) fall through
  * to runtime. */
class TckStyleSpec59 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "flag" -> true, "num" -> 7)),
      N(2, Set("A"), Map("name" -> "b", "flag" -> false, "num" -> 2))),
    Seq(R(10, 1, 2, "KNOWS")))

  // ---- classified errors
  errorScenario("CASE WHEN with an integer condition", g,
    "WITH 5 AS x RETURN CASE WHEN x THEN 1 ELSE 2 END AS r",
    SyntaxError, InvalidArgumentType)
  errorScenario("CASE WHEN with a string condition", g,
    "RETURN CASE WHEN 'yes' THEN 1 ELSE 2 END AS r",
    SyntaxError, InvalidArgumentType)
  errorScenario("WHERE with an integer predicate", g,
    "WITH 5 AS x MATCH (n:A) WHERE x RETURN count(*) AS c",
    SyntaxError, InvalidArgumentType)
  errorScenario("AND with an integer operand", g,
    "WITH 5 AS x RETURN (x AND true) AS r",
    SyntaxError, InvalidArgumentType)
  errorScenario("OR with a string operand", g,
    "RETURN ('nope' OR false) AS r",
    SyntaxError, InvalidArgumentType)
  errorScenario("NOT with an integer operand", g,
    "WITH 5 AS x RETURN NOT x AS r",
    SyntaxError, InvalidArgumentType)
  errorScenario("XOR with a list operand", g,
    "RETURN ([1] XOR true) AS r",
    SyntaxError, InvalidArgumentType)

  // ---- the legal boundary next to each error
  scenario("boolean property in WHERE is legal", g,
    "MATCH (n:A) WHERE n.flag RETURN n.name AS x", rows(Map("x" -> "a")))
  scenario("null condition in CASE WHEN is never taken", g,
    "RETURN CASE WHEN null THEN 1 ELSE 2 END AS r", rows(Map("r" -> 2)))
  scenario("WHERE null keeps no rows", g,
    "MATCH (n:A) WHERE null RETURN count(*) AS c", rows(Map("c" -> 0)))
  scenario("boolean-typed comparison chains stay legal", g,
    "MATCH (n:A) WHERE n.num > 3 AND NOT (n.num > 10) " +
      "RETURN n.name AS x", rows(Map("x" -> "a")))
  scenario("dynamically-typed condition falls through to runtime", g,
    // n['flag'] has no static type; the filter applies at runtime.
    "MATCH (n:A) WHERE n['flag'] RETURN n.name AS x", rows(Map("x" -> "a")))

  // ---- DELETE of a bound path variable (round 12): every node and
  // relationship on the path deletes; rel deletions apply before the
  // connected-node check, so a path covering all of its nodes' rels
  // deletes plainly, while an uncovered extra rel still raises.
  scenario("DELETE p removes the path's nodes and relationships", g,
    "CREATE p = (x:P1)-[:R]->(y:P2) DELETE p " +
      "WITH 1 AS one MATCH (z:P1) RETURN count(*) AS n", rows(Map("n" -> 0)))
  scenario("DETACH DELETE p with an extra incident relationship", g,
    "CREATE (x:Q1)-[:R]->(y:Q2) WITH x, y CREATE (y)-[:R2]->(:Q3) " +
      "WITH x, y MATCH p = (x)-[:R]->(y) DETACH DELETE p " +
      "WITH 1 AS one MATCH (z:Q2) RETURN count(*) AS n", rows(Map("n" -> 0)))
  errorScenario("plain DELETE p with an uncovered incident relationship", g,
    "CREATE (x:Q1)-[:R]->(y:Q2) WITH x, y CREATE (y)-[:R2]->(:Q3) " +
      "WITH x, y MATCH p = (x)-[:R]->(y) DELETE p RETURN 1 AS ok",
    ConstraintValidationFailed, DeleteConnectedNode, Runtime)
  scenario("DELETE p over a var-length path deletes every hop", g,
    "CREATE (x:V1)-[:R]->(:V2)-[:R]->(:V3) WITH x " +
      "MATCH p = (x)-[:R*2]->(e) DETACH DELETE p " +
      "WITH 1 AS one MATCH (z:V2) RETURN count(*) AS n", rows(Map("n" -> 0)))
}
