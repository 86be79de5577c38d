package graft

import graft.api.CypherError._

/** TCK-style conformance, part 38 — Cypher 5 Unicode normalization:
  * `normalize(str[, NFC|NFD|NFKC|NFKD])` and the
  * `x IS [NOT] [form] NORMALIZED` predicate. Runs through the native
  * codegen'd expression in functions/UnicodeNormalize.scala.
  *
  * Unicode fixtures (written as \uXXXX escapes in the Cypher text so the
  * build stays ASCII-clean): é = precomposed e-acute (NFC),
  * "é" = e + combining acute (NFD), ﬁ = the fi ligature
  * (compatibility-decomposes under NFK*). */
class TckStyleSpec38 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(N(1, Set("Doc"), Map("text" -> "caf\u00e9")),
      N(2, Set("Doc"), Map("text" -> "cafe\u0301"))))

  // --------------------------------------------------------- normalize()
  scenario("normalize defaults to NFC (composes)", g,
    "RETURN normalize('e\\u0301') = '\\u00e9' AS x", value(true))
  scenario("normalize to NFD decomposes", g,
    "RETURN normalize('\\u00e9', NFD) = 'e\\u0301' AS x", value(true))
  scenario("normalize NFC is explicit too", g,
    "RETURN normalize('e\\u0301', NFC) = '\\u00e9' AS x", value(true))
  scenario("NFKC folds compatibility characters", g,
    "RETURN normalize('\\ufb01le', NFKC) AS x", value("file"))
  scenario("NFKD folds and decomposes", g,
    "RETURN normalize('\\ufb01n\\u00e9', NFKD) = 'fine\\u0301' AS x",
    value(true))
  scenario("plain NFC does not fold compatibility characters", g,
    "RETURN normalize('\\ufb01le') = '\\ufb01le' AS x", value(true))
  scenario("normalize of null is null", g,
    "RETURN normalize(null) AS x", value(null))
  scenario("normalize is identity on ASCII", g,
    "RETURN normalize('plain ascii') AS x", value("plain ascii"))
  scenario("normalize output feeds string functions", g,
    "RETURN size(normalize('e\\u0301')) AS a, size('e\\u0301') AS b",
    rows(Map("a" -> 1L, "b" -> 2L)))
  scenario("normalize over node properties", g,
    "MATCH (d:Doc) RETURN count(DISTINCT normalize(d.text)) AS x",
    value(1L))

  // --------------------------------------------- IS [NOT] [form] NORMALIZED
  scenario("composed text IS NORMALIZED", g,
    "RETURN 'caf\\u00e9' IS NORMALIZED AS x", value(true))
  scenario("decomposed text is not NFC-normalized", g,
    "RETURN 'cafe\\u0301' IS NORMALIZED AS x", value(false))
  scenario("IS NFD NORMALIZED checks the decomposed form", g,
    "RETURN 'cafe\\u0301' IS NFD NORMALIZED AS a, " +
      "'caf\\u00e9' IS NFD NORMALIZED AS b",
    rows(Map("a" -> true, "b" -> false)))
  scenario("IS NFKC NORMALIZED rejects compatibility chars", g,
    "RETURN '\\ufb01le' IS NFKC NORMALIZED AS a, " +
      "'file' IS NFKC NORMALIZED AS b",
    rows(Map("a" -> false, "b" -> true)))
  scenario("IS NOT NORMALIZED negates", g,
    "RETURN 'cafe\\u0301' IS NOT NORMALIZED AS a, " +
      "'caf\\u00e9' IS NOT NORMALIZED AS b",
    rows(Map("a" -> true, "b" -> false)))
  scenario("IS NOT NFD NORMALIZED with an explicit form", g,
    "RETURN 'caf\\u00e9' IS NOT NFD NORMALIZED AS x", value(true))
  scenario("null IS NORMALIZED is null, negated too", g,
    "RETURN null IS NORMALIZED AS a, null IS NOT NORMALIZED AS b",
    rows(Map("a" -> null, "b" -> null)))
  scenario("non-string subject yields null", g,
    "RETURN 5 IS NORMALIZED AS a, [1,2] IS NORMALIZED AS b, " +
      "true IS NOT NFKD NORMALIZED AS c",
    rows(Map("a" -> null, "b" -> null, "c" -> null)))
  scenario("normalize output always satisfies its own form", g,
    "MATCH (d:Doc) WITH normalize(d.text, NFD) AS t " +
      "RETURN t IS NFD NORMALIZED AS x", rows(
      Map("x" -> true), Map("x" -> true)))
  scenario("IS NORMALIZED as a WHERE filter", g,
    "MATCH (d:Doc) WHERE d.text IS NORMALIZED RETURN count(*) AS x",
    value(1L))
  scenario("IS NULL still parses after the NORMALIZED extension", g,
    "RETURN null IS NULL AS a, 1 IS NOT NULL AS b",
    rows(Map("a" -> true, "b" -> true)))
  scenario("IS NORMALIZED inside an inline pattern predicate", g,
    "MATCH (d:Doc WHERE d.text IS NOT NORMALIZED) RETURN d.text = 'cafe\\u0301' AS x",
    value(true))

  // ------------------------------------------------------------- errors
  errorScenario("normalize rejects a non-string argument", g,
    "RETURN normalize(5) AS x", TypeError, InvalidArgumentType)
  errorScenario("normalize rejects an unknown normal form", g,
    "RETURN normalize('x', 'NFX') AS x", ArgumentError, InvalidArgumentValue)
}
