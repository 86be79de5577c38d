package graft

/** TCK-style conformance, part 33 — Cypher 5 LABEL EXPRESSIONS
  * (beyond-reference surface): disjunction `:A|B`, negation `:!A`,
  * grouping `:(A|B)&!C`, legacy conjunction chains, interaction with
  * properties / expands / rebound variables / QPP inner nodes. The
  * closed-world schema makes evaluation exact: a label combination
  * either satisfies the expression (its table joins the scan union) or
  * is excluded outright — no per-row label checks on unbound scans. */
class TckStyleSpec33 extends TckScenarioBase {
  import TckFixtures._

  /** a:A, b:B, ab:A:B, c:C {all with num}, plus edges a->b, ab->c. */
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("num" -> 1)),
      N(2, Set("B"), Map("num" -> 2)),
      N(3, Set("A", "B"), Map("num" -> 3)),
      N(4, Set("C"), Map("num" -> 4))),
    Seq(R(10, 1, 2, "T"), R(11, 3, 4, "T")))

  scenario("disjunction unions the label scans", g,
    "MATCH (n:A|B) RETURN n.num AS x ORDER BY x",
    rows(Map("x" -> 1L), Map("x" -> 2L), Map("x" -> 3L)), ordered = true)
  scenario("negation selects the complement", g,
    "MATCH (n:!A) RETURN n.num AS x ORDER BY x",
    rows(Map("x" -> 2L), Map("x" -> 4L)), ordered = true)
  scenario("conjunction via & equals the legacy chain", g,
    "MATCH (n:A&B) RETURN n.num AS x", value(3L))
  scenario("legacy :A:B chain still parses as conjunction", g,
    "MATCH (n:A:B) RETURN n.num AS x", value(3L))
  scenario("grouping and mixed operators", g,
    "MATCH (n:(A|B)&!A) RETURN n.num AS x", value(2L))
  scenario("double negation", g,
    "MATCH (n:!!C) RETURN n.num AS x", value(4L))
  scenario("negated disjunction (De Morgan)", g,
    "MATCH (n:!(A|B)) RETURN n.num AS x", value(4L))
  scenario("expression endpoints in an expand", g,
    "MATCH (n:A|B)-[:T]->(m) RETURN count(*) AS x", value(2L))
  scenario("expression on the expand target", g,
    "MATCH (n)-[:T]->(m:!C) RETURN m.num AS x", value(2L))
  scenario("label expression with an inline property map", g,
    "MATCH (n:A|C {num: 4}) RETURN n.num AS x", value(4L))
  scenario("rebound variable re-constrained by an expression", g,
    "MATCH (x) WITH x MATCH (x:A|C) RETURN count(*) AS x", value(3L))
  scenario("rebound negation", g,
    "MATCH (x) WITH x MATCH (x:!B) RETURN count(*) AS x", value(2L))
  scenario("label expression inside a QPP group", g,
    "MATCH (s) ((u:A|B)-[:T]->(v:!A)){1,1} (t) RETURN t.num AS x ORDER BY x",
    rows(Map("x" -> 2L), Map("x" -> 4L)), ordered = true)
  scenario("expression never matches: empty scan, not an error", g,
    "MATCH (n:A&C) RETURN count(*) AS x", value(0L))
  scenario("unknown label in a disjunction is just false", g,
    "MATCH (n:Zebra|C) RETURN n.num AS x", value(4L))
  scenario("negation of an unknown label matches everything", g,
    "MATCH (n:!Zebra) RETURN count(*) AS x", value(4L))
  scenario("labels() still reports the combination under expressions", g,
    "MATCH (n:A&B) RETURN size(labels(n)) AS x", value(2L))
  scenario("OPTIONAL MATCH with a non-matching expression null-pads", g,
    "MATCH (c:C) OPTIONAL MATCH (c)-[:T]->(m:A&C) RETURN c.num AS c, m.num AS m",
    rows(Map("c" -> 4L, "m" -> null)))
  scenario("EXISTS{} with a label expression", g,
    "MATCH (n) WHERE EXISTS { MATCH (n)-[:T]->(:B|C) } RETURN count(*) AS x",
    value(2L))
  scenario("count by expression class", g,
    "MATCH (n:A|B|C) RETURN count(*) AS x", value(4L))

  // ----------------------------------------------- value-position (WHERE)
  scenario("WHERE-position conjunction and negation", g,
    "MATCH (n) WHERE n:A&!B RETURN n.num AS x", value(1L))
  scenario("WHERE-position parenthesized disjunction", g,
    "MATCH (n) WHERE n:(A|C) RETURN count(*) AS x", value(3L))
  scenario("WHERE-position negated unknown label is true", g,
    "MATCH (n) WHERE n:!Zebra RETURN count(*) AS x", value(4L))
  scenario("label predicate inside a comprehension keeps the | separator", g,
    "MATCH (a {num: 1}) RETURN size([(a)-[:T]->(b) WHERE b:B | b.num]) AS x",
    value(1L))

  // ----------------------------------------------- relationship negation
  scenario("negated relationship type traverses the complement", gRel,
    "MATCH (a {num: 1})-[r:!T]->(b) RETURN type(r) AS x ORDER BY x",
    rows(Map("x" -> "S"), Map("x" -> "U")), ordered = true)
  // Per-alternative negation (Cypher 5): !T|S is (!T)|S = everything
  // except T — NOT the complement of {T, S} (round-8 fix: the parser
  // used to silently drop secondary '!' marks and complement the whole
  // list; Neo4j's "neither T nor S" spelling is !T&!S, below).
  scenario("union with one negated alternative is that type's complement", gRel,
    "MATCH (a {num: 1})-[r:!T|S]->(b) RETURN type(r) AS x ORDER BY x",
    rows(Map("x" -> "S"), Map("x" -> "U")), ordered = true)
  scenario("conjunction of negations excludes every listed type", gRel,
    "MATCH (a {num: 1})-[r:!T&!S]->(b) RETURN type(r) AS x", value("U"))
  scenario("union of two distinct negations matches every type", gRel,
    "MATCH (a {num: 1})-[r:!T|!S]->(b) RETURN count(*) AS x", value(3L))
  scenario("a type unioned with its own negation matches every type", gRel,
    "MATCH (a {num: 1})-[r:T|!T]->(b) RETURN count(*) AS x", value(3L))
  scenario("conjunction of two distinct types in a pattern matches nothing", gRel,
    "MATCH (a)-[r:T&S]->(b) RETURN count(*) AS x", value(0L))
  scenario("positive conjoined with a different negation keeps the positive", gRel,
    "MATCH (a {num: 1})-[r:S&!T]->(b) RETURN type(r) AS x", value("S"))
  scenario("a type conjoined with its own negation matches nothing", gRel,
    "MATCH (a)-[r:T&!T]->(b) RETURN count(*) AS x", value(0L))
  scenario("conjunction of negations in a var-length pattern", gRel,
    // !T&!S edges from 1: only U(1->4); no second hop from 4
    "MATCH (a {num: 1})-[:!T&!S*1..2]->(b) RETURN b.num AS x", value(4L))
  scenario("per-alternative negation in a var-length pattern", gRel,
    // !S|U = everything except S: T(1->2), U(1->4), then T(2->4) deep
    "MATCH (a {num: 1})-[:!S|U*1..2]->(b) RETURN count(*) AS x", value(3L))
  scenario("negated types traverse undirected", gRel,
    // undirected !T from 2: S/U edges incident to 2 — none; from 4: U(1-4)
    "MATCH (a {num: 4})-[r:!T]-(b) RETURN type(r) AS x", value("U"))
  scenario("negation with an inline property map still filters", gRel,
    "MATCH (a)-[r:!S]->(b {num: 4}) RETURN count(*) AS x",
    value(2L)) // U(1->4) and T(2->4); S(1->3) targets 3
  scenario("negated union inside a QPP group", gRel,
    "MATCH (s {num: 1}) ((x)-[:!S|U]->(y)){1,2} (t) " +
      "RETURN count(*) AS x", value(3L))
  scenario("none-of conjunction under EXISTS", gRel,
    "MATCH (a) WHERE EXISTS { (a)-[:!T&!U]->() } RETURN a.num AS x",
    value(1L)) // only the S edge 1->3 survives the none-of filter
  scenario("complement of every present type matches nothing (closed world)", gRel,
    "MATCH (a)-[r:!T&!S&!U]->(b) RETURN count(*) AS x", value(0L))
  scenario("union of a negation with a nonexistent type", gRel,
    // !T|ZZZ reduces to !T (ZZZ adds nothing the complement lacks)
    "MATCH (a {num: 1})-[r:!T|ZZZ]->(b) RETURN count(*) AS x", value(2L))
  scenario("negated types in a var-length pattern", gRel,
    // non-S edges from 1: T(1->2), U(1->4), then T(2->4) at depth 2
    "MATCH (a {num: 1})-[:!S*1..2]->(b) RETURN count(*) AS x", value(3L))

  // -------------------------------------- rel type predicate in WHERE
  // (fixed in round 7: `WHERE r:T` on a relationship variable previously
  // compiled against absent label slots and read silently FALSE)
  scenario("WHERE r:T is a relationship type predicate", gRel,
    "MATCH (a {num: 1})-[r]->(b) WHERE r:T RETURN count(*) AS x", value(1L))
  scenario("parenthesized type disjunction in WHERE", gRel,
    "MATCH (a {num: 1})-[r]->(b) WHERE r:(T|S) RETURN count(*) AS x",
    value(2L))
  scenario("negated type predicate in WHERE", gRel,
    "MATCH (a {num: 1})-[r]->(b) WHERE r:!T RETURN count(*) AS x", value(2L))
  scenario("conjunction of two distinct types is statically false", gRel,
    "MATCH (a)-[r]->(b) WHERE r:T&S RETURN count(*) AS x", value(0L))

  // ---------------------------------------- rejected in writing clauses
  // (a label expression describes a MATCH, not a concrete label set;
  // without the rejection CREATE (n:A|B) silently made an unlabeled node)
  errorScenario("label expressions are rejected in CREATE", g,
    "CREATE (n:A|B) RETURN labels(n) AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidArgumentType)
  errorScenario("label expressions are rejected in MERGE", g,
    "MERGE (n:A|B) RETURN count(*) AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidArgumentType)
  errorScenario("inline WHERE is rejected in CREATE patterns", g,
    "CREATE (n:X WHERE true) RETURN 1 AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidSyntax)
  errorScenario("inline WHERE is rejected in MERGE patterns", g,
    "MERGE (n:A WHERE true) RETURN 1 AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidSyntax)

  /** a -T-> b, a -S-> c, a -U-> d, b -T-> d */
  // ---- inline pattern predicates (Cypher 5 `(n WHERE p)`, round 8) ----
  scenario("inline node WHERE filters like clause WHERE", g,
    "MATCH (n:A WHERE n.num > 1) RETURN n.num AS x", value(3L))
  scenario("inline WHERE composes with labels, props and clause WHERE", g,
    "MATCH (n:A WHERE n.num > 0) WHERE n.num < 3 RETURN n.num AS x",
    value(1L))
  scenario("inline relationship WHERE filters the rel", g,
    "MATCH (a)-[r:T WHERE r IS NOT NULL]->(b) RETURN count(*) AS x",
    value(2L))
  scenario("inline WHERE on both endpoints", g,
    "MATCH (a:A WHERE a.num = 1)-[:T]->(b WHERE b.num = 2) " +
      "RETURN count(*) AS x", value(1L))
  scenario("inline WHERE inside EXISTS subquery pattern", g,
    "MATCH (n) WHERE EXISTS { (n WHERE n.num = 1)-[:T]->() } " +
      "RETURN count(*) AS x", value(1L))
  scenario("inline WHERE inside a pattern comprehension", g,
    "RETURN size([(a:A WHERE a.num = 1)-[:T]->(b) | b.num]) AS x",
    value(1L))
  scenario("inline WHERE inside COUNT subquery", g,
    "MATCH (n:A) RETURN COUNT { (n)-[:T]->(b WHERE b.num > 0) } AS x, " +
      "n.num AS num ORDER BY num",
    rows(Map("x" -> 1L, "num" -> 1L), Map("x" -> 1L, "num" -> 3L)),
    ordered = true)

  lazy val gRel = graph(spark,
    Seq(N(1, Set("N"), Map("num" -> 1)), N(2, Set("N"), Map("num" -> 2)),
      N(3, Set("N"), Map("num" -> 3)), N(4, Set("N"), Map("num" -> 4))),
    Seq(R(10, 1, 2, "T"), R(11, 1, 3, "S"), R(12, 1, 4, "U"),
      R(13, 2, 4, "T")))
}
