package graft

/** TCK-style conformance, part 24 — literal forms and operator precedence
  * (TCK expressions/literals + expressions/precedence): hex (0x…) and
  * octal (0o…) integer literals (added to the lexer in round 7), exponent
  * floats, and the full operator ladder
  * OR < XOR < AND < NOT < comparison < +|- < *|/|% < unary < ^ with ^
  * right-associative (the two `^`-vs-unary rows live in TckStyleSpec10). */
class TckStyleSpec24 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a", "num" -> 2))),
    Seq.empty)

  // ------------------------------------------------- integer literal forms
  scenario("lowercase hex literal", g, "RETURN 0x13af AS x", value(5039L))
  scenario("longer hex literal", g, "RETURN 0xFC3A9 AS x", value(1033129L))
  scenario("negative hex literal", g, "RETURN -0x66eff AS x", value(-421631L))
  scenario("capital-X hex literal", g, "RETURN 0X1f AS x", value(31L))
  scenario("hex literal composes with arithmetic", g,
    "RETURN 0x10 + 0x01 AS x", value(17L))
  scenario("octal literal", g, "RETURN 0o1372 AS x", value(762L))
  scenario("negative octal literal", g, "RETURN -0o5671 AS x", value(-3001L))
  scenario("octal zero", g, "RETURN 0o0 AS x", value(0L))
  scenario("hex literal in a list subscripts like any int", g,
    "RETURN [10, 20, 30][0x1] AS x", value(20L))

  // ------------------------------------------------- float literal forms
  scenario("exponent float literal", g, "RETURN 1e3 AS x", value(1000.0))
  scenario("negative-exponent float literal", g, "RETURN 1E-2 AS x",
    value(0.01))
  scenario("leading-dot float literal", g, "RETURN .5 AS x", value(0.5))
  scenario("mantissa-dot exponent float", g, "RETURN 2.5e1 AS x", value(25.0))

  // ------------------------------------------------- arithmetic precedence
  scenario("multiplication before addition", g,
    "RETURN 1 + 2 * 3 AS x", value(7L))
  scenario("parentheses override precedence", g,
    "RETURN (1 + 2) * 3 AS x", value(9L))
  scenario("division and multiplication associate left", g,
    "RETURN 6 / 3 * 2 AS x", value(4L))
  scenario("subtraction associates left", g,
    "RETURN 10 - 4 - 3 AS x", value(3L))
  scenario("modulo associates left", g,
    "RETURN 5 % 3 % 2 AS x", value(0L))
  scenario("modulo binds like multiplication", g,
    "RETURN 7 % 3 + 1 AS x", value(2L))
  scenario("power before multiplication before addition", g,
    "RETURN 1 + 2 * 3 ^ 2 AS x", value(19.0))
  scenario("power is right-associative", g,
    "RETURN 2 ^ 3 ^ 2 AS x", value(512.0))
  scenario("power accepts a signed right operand", g,
    "RETURN 2 ^ -1 AS x", value(0.5))
  scenario("double unary minus cancels", g, "RETURN - - 2 AS x", value(2L))
  scenario("subtracting a negated literal", g, "RETURN 2 - -2 AS x",
    value(4L))
  scenario("exponent-form base feeds power", g, "RETURN 2e0 ^ 2 AS x",
    value(4.0))
  scenario("string concatenation chains left", g,
    "RETURN 'a' + 'b' + 'c' AS x", value("abc"))
  scenario("subscript binds tighter than addition", g,
    "RETURN [1, 2, 3][0] + 1 AS x", value(2L))

  // ------------------------------------------------- boolean ladder
  scenario("NOT binds tighter than OR", g,
    "RETURN NOT true OR true AS x", value(true))
  scenario("parenthesized OR under NOT", g,
    "RETURN NOT (true OR true) AS x", value(false))
  scenario("XOR binds tighter than OR", g,
    "RETURN true OR false XOR true AS x", value(true))
  scenario("AND binds tighter than XOR", g,
    "RETURN false XOR true AND false AS x", value(false))
  scenario("AND-then-XOR ordering", g,
    "RETURN false AND true XOR true AS x", value(true))
  scenario("NOT binds tighter than AND", g,
    "RETURN NOT false AND true AS x", value(true))
  scenario("comparison binds tighter than NOT", g,
    "RETURN NOT 1 = 2 AS x", value(true))
  scenario("arithmetic binds tighter than comparison", g,
    "RETURN 1 + 2 = 3 AS x", value(true))
  scenario("comparisons feed AND", g,
    "RETURN 2 * 2 > 3 AND 1 < 2 AS x", value(true))
  scenario("unary minus inside a comparison", g,
    "RETURN -1 < 0 AS x", value(true))
  scenario("IS NULL binds tighter than AND", g,
    "RETURN null IS NULL AND true AS x", value(true))
  scenario("IN binds tighter than AND", g,
    "RETURN 1 IN [1, 2] AND 2 IN [2] AS x", value(true))
  scenario("STARTS WITH under NOT", g,
    "RETURN NOT 'ab' STARTS WITH 'a' AS x", value(false))
  scenario("property access binds tighter than arithmetic", g,
    "MATCH (a:A) RETURN a.num + 1 AS x", value(3L))

  // ------------------------------------- comparison chaining (conjunction)
  scenario("ascending chain is a conjunction", g,
    "RETURN 1 < 2 < 3 AS x", value(true))
  scenario("chain fails on its second link", g,
    "RETURN 1 < 2 < 2 AS x", value(false))
  scenario("mixed-operator chain", g,
    "RETURN 3 > 2 >= 2 AS x", value(true))
  scenario("equality chains pairwise", g,
    "RETURN 1 = 1 = 1 AS x", value(true))
  scenario("equality and inequality chain", g,
    "RETURN 2 = 2 <> 3 AS x", value(true))
  scenario("null in a chain nulls the conjunction", g,
    "RETURN (1 < 2 > null) IS NULL AS x", value(true))
  scenario("parentheses opt out of chaining", g,
    // Explicitly grouped, the left fold applies: (1 < 2) = true compares
    // the boolean result — distinct from the unparenthesized chain.
    "RETURN (1 < 2) = true AS x", value(true))

  // -------------------------- static type mismatches are classified
  // (Spark analyzes eagerly at DataFrame build; DATATYPE_MISMATCH there is
  // a compile-time-detectable type error and must carry TCK coordinates,
  // not leak as a Spark AnalysisException — GraftSession.cypher round 7)
  errorScenario("boolean operator on a number is a classified type error", g,
    "RETURN NOT 3 AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidArgumentType)
  errorScenario("adding a map to a number is a classified type error", g,
    "RETURN 1 + {k: 1} AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidArgumentType)
}
