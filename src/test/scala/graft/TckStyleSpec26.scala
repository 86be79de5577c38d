package graft

import graft.api.CypherError._

/** TCK-style conformance, part 26 — string function boundary semantics
  * (TCK expressions/string): zero-length and past-the-end substrings,
  * clamped left/right, empty-separator and empty-input split, empty-search
  * replace, and classified NegativeIntegerArgument errors for statically
  * negative start/length arguments (round 7 — Spark's substr would
  * otherwise silently treat them as position 1). */
class TckStyleSpec26 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ------------------------------------------------- substring boundaries
  scenario("zero-length substring is empty", g,
    "RETURN substring('hello', 0, 0) AS x", value(""))
  scenario("substring starting past the end is empty", g,
    "RETURN substring('hello', 10) AS x", value(""))
  scenario("substring to the exact end", g,
    "RETURN substring('hello', 2) AS x", value("llo"))
  scenario("substring length clamps at the end", g,
    "RETURN substring('hello', 3, 10) AS x", value("lo"))
  scenario("substring of the empty string", g,
    "RETURN substring('', 0) AS x", value(""))
  scenario("substring is 0-based", g,
    "RETURN substring('hello', 1, 2) AS x", value("el"))

  // ------------------------------------------------- left / right clamps
  scenario("left clamps past the end", g,
    "RETURN left('ab', 5) AS x", value("ab"))
  scenario("right clamps past the end", g,
    "RETURN right('ab', 5) AS x", value("ab"))
  scenario("left of zero is empty", g,
    "RETURN left('ab', 0) AS x", value(""))
  scenario("right of zero is empty", g,
    "RETURN right('ab', 0) AS x", value(""))

  // ------------------------------------------------- split edges
  scenario("split keeps interior empty fields", g,
    "RETURN split('a,,b', ',') AS x", value(List("a", "", "b")))
  scenario("split of the empty string is a single empty field", g,
    "RETURN split('', ',') AS x", value(List("")))
  scenario("split with no separator occurrence is the whole string", g,
    "RETURN split('abc', ',') AS x", value(List("abc")))
  scenario("split keeps a trailing empty field", g,
    "RETURN split('a,', ',') AS x", value(List("a", "")))

  // ------------------------------------------------- replace edges
  scenario("replace with an empty search string is the identity", g,
    "RETURN replace('abc', '', '-') AS x", value("abc"))
  scenario("replace removes every occurrence", g,
    "RETURN replace('aaa', 'a', '') AS x", value(""))
  scenario("replace of an absent target is the identity", g,
    "RETURN replace('abc', 'z', 'y') AS x", value("abc"))

  // ------------------------------------------------- trim family / misc
  scenario("trim strips both ends only", g,
    "RETURN trim('  a b  ') AS x", value("a b"))
  scenario("reverse of a string", g,
    "RETURN reverse('ab') AS x", value("ba"))
  scenario("reverse of the empty string", g,
    "RETURN reverse('') AS x", value(""))
  scenario("case functions leave non-letters alone", g,
    "RETURN toUpper('a1-b') AS x", value("A1-B"))

  // ------------------------------------------------- classified negatives
  errorScenario("negative substring start is classified", g,
    "RETURN substring('hello', -1) AS x",
    ArgumentError, NegativeIntegerArgument)
  errorScenario("negative substring length is classified", g,
    "RETURN substring('hello', 0, -2) AS x",
    ArgumentError, NegativeIntegerArgument)
  errorScenario("negative left length is classified", g,
    "RETURN left('ab', -1) AS x", ArgumentError, NegativeIntegerArgument)
  errorScenario("negative right length is classified", g,
    "RETURN right('ab', -1) AS x", ArgumentError, NegativeIntegerArgument)
}
