package graft

import graft.api.GraftSession
import graft.graph.PropertyGraph
import org.apache.spark.sql.Row

/** Shared framework for the TCK-style conformance suites: each scenario is a
  * (graph, query, expected-bag) triple; results compare as unordered bags
  * unless the query orders (mirrors the TCK's `the result should be` /
  * `...in order` steps, morpheus-tck/.../TckSparkCypherTest.scala:39-100). */
trait TckScenarioBase extends SparkTestBase {

  lazy val session = new GraftSession(spark)

  protected def norm(v: Any): Any = v match {
    case null => null
    case i: java.lang.Integer => i.longValue
    case i: java.lang.Long => i.longValue
    case f: java.lang.Float => f.doubleValue
    case d: java.math.BigDecimal => d.doubleValue
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case a: Array[_] => a.map(norm).toList
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k.toString -> norm(x) }.toMap
    case r: Row =>
      r.schema.fieldNames.zip(r.toSeq).map { case (n, x) => n -> norm(x) }.toMap
    case other => other
  }

  protected def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Map[String, Any]] =
    df.collect().toSeq.map(r =>
      r.schema.fieldNames.zip(r.toSeq).map { case (n, v) => n -> norm(v) }.toMap)

  protected def rowBag(rows: Seq[Map[String, Any]]): Map[Map[String, Any], Int] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size }

  /** Register one scenario as its own test. `expected` is a bag of rows
    * (ordered = true compares as a sequence). */
  private var count = 0
  protected def scenario(name: String, g: => PropertyGraph, query: String,
      expected: Seq[Map[String, Any]], ordered: Boolean = false,
      params: Map[String, Any] = Map.empty): Unit = {
    count += 1
    test(f"[$count%03d] $name") {
      val got = rowsOf(session.cypher(g, query, params))
      val want = expected.map(_.map { case (k, v) => k -> norm(v) })
      if (ordered) assert(got === want)
      else assert(rowBag(got) === rowBag(want),
        s"\nquery: $query\ngot:  $got\nwant: $want")
    }
  }

  protected def rows(ms: Map[String, Any]*): Seq[Map[String, Any]] = ms.toSeq
  protected def value(v: Any): Seq[Map[String, Any]] = Seq(Map("x" -> v))

  /** TCK `a <Type> should be raised at <phase>: <Detail>` step: the query
    * must fail with a classified CypherException carrying exactly these
    * coordinates (collect() forces execution for completeness — graft
    * raises everything it classifies at compile time, before any job). */
  protected def errorScenario(name: String, g: => PropertyGraph, query: String,
      errorType: graft.api.CypherError.Type, detail: String,
      phase: graft.api.CypherError.Phase = graft.api.CypherError.CompileTime)
      : Unit = {
    count += 1
    test(f"[$count%03d] $name") {
      val e = intercept[graft.api.CypherException] {
        session.cypher(g, query).collect()
      }
      assert(e.errorType === errorType,
        s"\nquery: $query\nraised: $e")
      assert(e.detail === detail, s"\nquery: $query\nraised: $e")
      assert(e.phase === phase, s"\nquery: $query\nraised: $e")
    }
  }
}
