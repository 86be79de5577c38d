package graft

import graft.api.CypherError

/** TCK-style conformance, part 31 — GQL-style quantified path patterns
  * (BEYOND-reference surface; Cypher 25 / GQL syntax):
  * `(a) ((x)-[r:T]->(y) WHERE pred){m,n} (b)`, shorthand `+` / `*`
  * quantifiers (grouped and postfix on a plain relationship), inner-arrow
  * direction, per-repetition WHERE over that repetition's bindings,
  * juxtaposition label semantics (a chained node carries the previous
  * repetition's dst constraints AND the next one's src constraints), the
  * group relationship variable binding as a list, zero-repetition
  * identity, path functions over groups, and the classified error
  * surface (outer-variable reuse). */
class TckStyleSpec31 extends TckScenarioBase {
  import TckFixtures._

  /** chain a:A -T{w:1}-> m1:M -T{w:2}-> m2:M -T{w:3}-> b:B, plus a
    * side edge m1 -S-> z:Z and a heavy edge a -T{w:9}-> z. */
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("M"), Map("name" -> "m1")),
      N(3, Set("M"), Map("name" -> "m2")),
      N(4, Set("B"), Map("name" -> "b")),
      N(5, Set("Z"), Map("name" -> "z"))),
    Seq(
      R(10, 1, 2, "T", Map("w" -> 1)),
      R(11, 2, 3, "T", Map("w" -> 2)),
      R(12, 3, 4, "T", Map("w" -> 3)),
      R(13, 2, 5, "S"),
      R(14, 1, 5, "T", Map("w" -> 9))))

  // ------------------------------------------------------- quantifiers
  scenario("{n} repeats exactly n times", g,
    "MATCH (a:A) ((x)-[:T]->(y)){3} (b) RETURN b.name AS x", value("b"))
  scenario("{m,n} ranges over the bounds", g,
    "MATCH (a:A) ((x)-[:T]->(y)){1,3} (b) RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "b"), Map("x" -> "m1"), Map("x" -> "m2"),
      Map("x" -> "z")), ordered = true)
  scenario("+ on a group is one-or-more", g,
    "MATCH (a:A) ((x)-[:T]->(y))+ (b:B) RETURN count(*) AS x", value(1L))
  scenario("* on a group includes the zero-repetition identity", g,
    "MATCH (a:A) ((x)-[:T]->(y))* (b) RETURN count(*) AS x",
    value(5L)) // a itself + m1, z (1 hop) + m2 (2) + b (3)
  scenario("{,n} means zero up to n", g,
    "MATCH (a:A) ((x)-[:T]->(y)){,1} (b) RETURN count(*) AS x",
    value(3L)) // a itself, m1, z
  scenario("postfix + on a plain relationship", g,
    "MATCH (a:A)-[:T]->+(b:B) RETURN count(*) AS x", value(1L))
  scenario("postfix * on a plain relationship", g,
    "MATCH (m {name: 'm2'})-[:T]->*(b) RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "b"), Map("x" -> "m2")), ordered = true)

  // ------------------------------------------------------- inner shape
  scenario("inner node labels constrain every repetition boundary", g,
    // dst of each repetition must be :M — so only 1 and 2 hops survive
    "MATCH (a:A) ((x)-[:T]->(y:M)){1,3} (b) RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "m1"), Map("x" -> "m2")), ordered = true)
  scenario("juxtaposition: chained nodes carry src AND dst constraints", g,
    // src must be :A or :M and dst :M or :B: the a->z edge (dst :Z) is out
    "MATCH (a) ((x:A)-[:T]->(y)){1,1} (b) RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "m1"), Map("x" -> "z")), ordered = true)
  scenario("inner relationship property map filters each hop", g,
    "MATCH (a) ((x)-[:T {w: 2}]->(y)){1,1} (b) RETURN b.name AS x",
    value("m2"))
  scenario("inner WHERE filters per repetition", g,
    "MATCH (a:A) ((x)-[r:T]->(y) WHERE r.w < 3){1,3} (b) RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "m1"), Map("x" -> "m2")), ordered = true)
  scenario("inner WHERE may read both endpoint nodes", g,
    "MATCH (s) ((x)-[r:T]->(y) WHERE x.name = 'a' AND y.name = 'z'){1,1} (t) RETURN t.name AS x",
    value("z"))
  scenario("reversed inner arrow walks the edges backwards", g,
    "MATCH (b:B) ((x)<-[:T]-(y)){3,3} (a) RETURN a.name AS x", value("a"))

  // ------------------------------------------------------- group binding
  scenario("the group relationship variable binds as a list", g,
    "MATCH (a:A) ((x)-[r:T]->(y)){2,2} (b) WHERE b.name = 'm2' RETURN size(r) AS x",
    value(2L))
  scenario("zero repetitions bind the empty list", g,
    "MATCH (a:A) ((x)-[r:T]->(y)){0,1} (b) WHERE b.name = 'a' RETURN size(r) AS x",
    value(0L))
  scenario("entity lambdas read group rel properties", g,
    "MATCH (a:A) ((x)-[r:T]->(y)){3,3} (b) RETURN reduce(s = 0, e IN r | s + e.w) AS x",
    value(6L))
  scenario("path over a group has the repetition length", g,
    "MATCH p = (a:A) ((x)-[:T]->(y)){2,2} (b) WHERE b.name = 'm2' RETURN length(p) AS x",
    value(2L))

  // ------------------------------------------- node group variables
  scenario("inner node variables bind as group lists", g,
    "MATCH (a:A) ((x)-[:T]->(y)){2,2} (b) WHERE b.name = 'm2' " +
      "RETURN size(x) AS sx, size(y) AS sy",
    rows(Map("sx" -> 2L, "sy" -> 2L)))
  scenario("zero repetitions bind empty node groups", g,
    "MATCH (a:A) ((x)-[:T]->(y)){0,1} (b) WHERE b.name = 'a' " +
      "RETURN size(x) AS sx, size(y) AS sy",
    rows(Map("sx" -> 0L, "sy" -> 0L)))
  scenario("entity lambdas read node-group properties", g,
    "MATCH (a:A) ((x)-[:T]->(y)){3,3} (b) " +
      "RETURN [e IN y | e.name] AS x",
    value(List("m1", "m2", "b")))
  scenario("src group is shifted one from the dst group", g,
    "MATCH (a:A) ((x)-[:T]->(y)){2,2} (b) WHERE b.name = 'm2' " +
      "RETURN [e IN x | e.name] AS xs, [e IN y | e.name] AS ys",
    rows(Map("xs" -> List("a", "m1"), "ys" -> List("m1", "m2"))))
  errorScenario("a group variable exported earlier conflicts in a later group", g,
    "MATCH (a:A) ((x)-[:T]->(y)){1,1} (m) ((x)-[:T]->(z)){1,1} (b) RETURN count(*) AS n",
    CypherError.SyntaxError, CypherError.VariableAlreadyBound)

  // ------------------------------------------------------- composition
  scenario("group between fixed hops", g,
    "MATCH (a:A)-[:T]->(m) ((x)-[:T]->(y)){1,2} (b) WHERE m.name = 'm1' RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "b"), Map("x" -> "m2")), ordered = true)
  scenario("group endpoints join with outer WHERE", g,
    "MATCH (a) ((x)-[:T]->(y)){1,1} (b) WHERE a.name = 'a' AND b.name = 'z' RETURN count(*) AS x",
    value(1L))
  scenario("two groups in one chain", g,
    "MATCH (a:A) ((x)-[:T]->(y)){1,1} (m) ((u)-[:T]->(v)){1,1} (b) " +
      "WHERE b.name = 'm2' RETURN m.name AS x",
    value("m1"))

  // ------------------------- abbreviated forms (no juxtaposed node)
  scenario("a pattern may BE a quantified group (leading form)", g,
    "MATCH ((x)-[:T]->(y)){1,1} RETURN count(*) AS x", value(4L))
  scenario("leading-form group with a longer quantifier", g,
    "MATCH p = ((x)-[:T]->(y)){2,2} RETURN count(*) AS x", value(2L))
  scenario("juxtaposed head with elided trailing node", g,
    "MATCH (a:A)((x)-[:T]->(y)){1,1} RETURN count(*) AS x", value(2L))

  // ------------------------------------------------------- errors
  errorScenario("outer variable reuse inside a group is rejected", g,
    "MATCH (c:A) ((c)-[r:T]->(y)){1,2} (o) RETURN count(*) AS x",
    CypherError.SyntaxError, CypherError.VariableAlreadyBound)
  errorScenario("group rel var colliding with an outer var is rejected", g,
    "MATCH (q:A)-[w:T]->(m) ((x)-[w:T]->(y)){1,1} (b) RETURN count(*) AS x",
    CypherError.SyntaxError, CypherError.VariableAlreadyBound)
}
