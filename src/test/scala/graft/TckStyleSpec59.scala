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

  // ---- MERGE p = (...) binds the path on CREATED rows too (round 12:
  // the inner optional-match used to consume the bind while ids were
  // still null, freezing the struct as null).
  scenario("MERGE path variable binds on creation", g,
    "MERGE p = (x:MP1 {k:1})-[:R]->(y:MP2 {k:2}) " +
      "RETURN length(p) AS l, size(nodes(p)) AS ns", rows(Map("l" -> 1, "ns" -> 2)))
  scenario("MERGE path variable binds on match", g,
    "CREATE (:MP3 {k:1})-[:R]->(:MP4 {k:2}) WITH 1 AS one " +
      "MERGE p = (x:MP3 {k:1})-[:R]->(y:MP4 {k:2}) " +
      "RETURN length(p) AS l", rows(Map("l" -> 1)))

  // ---- FOREACH binders over element-id lists are writable entities
  // (round 12): nodes(p)/relationships(p) and GROUP-list vars bind as
  // NODE/REL, with the element's stored properties readable in the body.
  scenario("FOREACH over nodes(p) SETs every path node", g,
    "CREATE (x:FE1)-[:R]->(:FE2)-[:R]->(:FE3) WITH x " +
      "MATCH p = (x)-[:R*]->(e) FOREACH (nd IN nodes(p) | SET nd.seen = 1) " +
      "WITH 1 AS one MATCH (m {seen: 1}) RETURN count(DISTINCT m) AS n",
    rows(Map("n" -> 3)))
  scenario("FOREACH body reads the binder's stored properties", g,
    "CREATE (x:FE4 {v: 10})-[:R]->(:FE5 {v: 20}) WITH x " +
      "MATCH p = (x)-[:R*1..1]->(e) " +
      "FOREACH (nd IN nodes(p) | SET nd.dbl = nd.v * 2) " +
      "WITH 1 AS one MATCH (m:FE5) RETURN m.dbl AS d", rows(Map("d" -> 40)))
  scenario("FOREACH over relationships(p) SETs rel properties", g,
    "CREATE (x:FE6)-[:R {w: 1}]->(:FE7) WITH x " +
      "MATCH p = (x)-[:R*]->(e) FOREACH (r IN relationships(p) | SET r.w = 9) " +
      "WITH 1 AS one MATCH ()-[r2:R {w: 9}]->(:FE7) RETURN count(r2) AS n",
    rows(Map("n" -> 1)))
  scenario("conditional-update idiom: FOREACH over CASE-guarded [a]", g,
    "CREATE (a:CU1 {flag: true}) WITH a " +
      "FOREACH (x IN CASE WHEN a.flag THEN [a] ELSE [] END | SET x.hit = 1) " +
      "RETURN a.hit AS h", rows(Map("h" -> 1)))
  scenario("conditional-update idiom: false guard leaves the node alone", g,
    "CREATE (a:CU2 {flag: false}) WITH a " +
      "FOREACH (x IN CASE WHEN a.flag THEN [a] ELSE [] END | SET x.hit = 1) " +
      "RETURN a.hit AS h", rows(Map("h" -> null)))
  scenario("FOREACH over a literal rel list writes through the alias", g,
    "CREATE (a:CU3)-[r:R {w: 1}]->(:CU4) WITH a, r " +
      "FOREACH (x IN [r] | SET x.w = 7) RETURN r.w AS w", rows(Map("w" -> 7)))
  scenario("plain value FOREACH binder still works", g,
    "FOREACH (i IN [1, 2] | CREATE (:FEPlain {v: i})) " +
      "WITH 1 AS one MATCH (m:FEPlain) RETURN count(*) AS n",
    rows(Map("n" -> 2)))
}
