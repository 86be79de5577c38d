package graft

import graft.api.CypherError._

/** TCK-style conformance, part 55 — spatial POINT (beyond-reference:
  * the okapi/Morpheus reference has no spatial type; Neo4j users do).
  * 2D only: cartesian (srid 7203) and WGS-84 (srid 4326). Scoped
  * choices (Neo4j docs unreachable offline, recorded in
  * tck_blacklist.md): WGS-84 distance = haversine on the IUGG mean
  * earth radius 6371008.8 m; longitude/latitude on a cartesian point
  * read null (Neo4j raises); null coordinates null the whole point. */
class TckStyleSpec55 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  scenario("cartesian point constructor and accessors", g,
    "WITH point({x: 3.0, y: 4.0}) AS p " +
      "RETURN p.x AS x, p.y AS y, p.srid AS s, p.crs AS c",
    rows(Map("x" -> 3.0, "y" -> 4.0, "s" -> 7203L, "c" -> "cartesian")))
  scenario("geographic point via longitude/latitude", g,
    "WITH point({longitude: 12.78, latitude: 56.7}) AS p " +
      "RETURN p.longitude AS lon, p.latitude AS lat, p.srid AS s, " +
      "p.crs AS c",
    rows(Map("lon" -> 12.78, "lat" -> 56.7, "s" -> 4326L,
      "c" -> "wgs-84")))
  scenario("explicit crs overrides the key heuristic", g,
    "WITH point({x: 1.0, y: 2.0, crs: 'wgs-84'}) AS p RETURN p.srid AS x",
    value(4326L))
  scenario("cartesian distance is euclidean", g,
    "RETURN point.distance(point({x: 0.0, y: 0.0}), " +
      "point({x: 3.0, y: 4.0})) AS x", value(5.0))
  scenario("geographic distance: one degree of longitude at the equator", g,
    // 2*pi*R/360 with R = 6371008.8 => 111195.08023...
    "WITH point.distance(point({longitude: 0.0, latitude: 0.0}), " +
      "point({longitude: 1.0, latitude: 0.0})) AS d " +
      "RETURN round(d, 4) AS x", value(111195.0802))
  scenario("distance across CRSes is null", g,
    "RETURN point.distance(point({x: 0.0, y: 0.0}), " +
      "point({longitude: 0.0, latitude: 0.0})) AS x", value(null))
  scenario("point(null) and null coordinates are null", g,
    "RETURN point(null) AS a, point({x: null, y: 1.0}) AS b",
    rows(Map("a" -> null, "b" -> null)))
  scenario("point equality is (crs, coordinates)", g,
    "RETURN point({x: 1.0, y: 2.0}) = point({x: 1.0, y: 2.0}) AS a, " +
      "point({x: 1.0, y: 2.0}) = point({longitude: 1.0, latitude: 2.0}) AS b",
    rows(Map("a" -> true, "b" -> false)))
  scenario("withinBBox inclusive bounds", g,
    "RETURN point.withinBBox(point({x: 1.0, y: 1.0}), " +
      "point({x: 0.0, y: 0.0}), point({x: 1.0, y: 2.0})) AS a, " +
      "point.withinBBox(point({x: 3.0, y: 1.0}), " +
      "point({x: 0.0, y: 0.0}), point({x: 1.0, y: 2.0})) AS b",
    rows(Map("a" -> true, "b" -> false)))
  scenario("longitude on a cartesian point is null (scoped deviation)", g,
    "RETURN point({x: 1.0, y: 2.0}).longitude AS x", value(null))
  scenario("toString renders the Neo4j shape", g,
    "RETURN toString(point({x: 1.0, y: 2.0})) AS x",
    value("point({srid:7203, x:1.0, y:2.0})"))
  scenario("points group and count", g,
    "UNWIND [point({x: 1.0, y: 1.0}), point({x: 1.0, y: 1.0}), " +
      "point({x: 2.0, y: 1.0})] AS p " +
      "RETURN count(DISTINCT p) AS x", value(2L))
  scenario("point stored as a property round-trips", g,
    "CREATE (s:Shop {loc: point({x: 1.5, y: 2.5})}) WITH * " +
      "MATCH (t:Shop) RETURN t.loc.x AS x, t.loc.srid AS s",
    rows(Map("x" -> 1.5, "s" -> 7203L)))
  scenario("valueType of a point is POINT", g,
    "RETURN valueType(point({x: 1.0, y: 2.0})) AS x", value("POINT"))
  scenario("points are not ordered by < (null, like Neo4j)", g,
    "RETURN point({x: 1.0, y: 1.0}) < point({x: 2.0, y: 1.0}) AS x",
    value(null))
  // point() over map-typed EXPRESSIONS (round 12): the common Neo4j usage
  // point(n.loc) / point(m) — components read off the compiled struct.
  scenario("point over a map variable", g,
    "WITH {x: 1.0, y: 2.0} AS m RETURN point(m).x AS x", value(1.0))
  scenario("point over a geographic map variable defaults to WGS-84", g,
    "WITH {longitude: 1.0, latitude: 2.0} AS m " +
      "RETURN point(m).srid AS x", value(4326L))
  scenario("point over a stored struct property", g,
    "CREATE (s:Depot {loc: {x: 7.0, y: 8.0}}) WITH * " +
      "MATCH (t:Depot) RETURN point(t.loc).y AS x", value(8.0))
  scenario("point crs from a non-literal expression", g,
    "WITH 'wgs-84' AS c RETURN point({x: 1.0, y: 2.0, crs: c}).srid AS x",
    value(4326L))
  scenario("null map expression gives a null point", g,
    "WITH null AS m RETURN point(m) AS x", value(null))
  errorScenario("3D points are rejected", g,
    "RETURN point({x: 1.0, y: 2.0, z: 3.0}) AS p",
    ArgumentError, InvalidArgumentValue)
  errorScenario("unknown point component", g,
    "RETURN point({x: 1.0, y: 2.0, wat: 1}) AS p",
    ArgumentError, InvalidArgumentValue)
  errorScenario("unknown CRS name", g,
    "RETURN point({x: 1.0, y: 2.0, crs: 'mars'}) AS p",
    ArgumentError, InvalidArgumentValue)
}
