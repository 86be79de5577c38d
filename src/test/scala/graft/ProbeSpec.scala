package graft

/** Scratch probe spec (not part of the TCK mirror): drives candidate
  * syntax through the engine to find gaps. Scenarios that reveal real
  * gaps get promoted to a numbered TckStyleSpec part; this file stays
  * minimal between rounds (round-12 batch-5/6/7 findings live in
  * TckStyleSpec61-63). */
class ProbeSpec extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a", "num" -> 1))),
    Seq.empty)

  private var pc = 0
  def probe(name: String, q: String): Unit = {
    pc += 1
    test(f"[$pc%03d] $name") {
      val got = try rowsOf(session.cypher(g, q)).toString
      catch { case e: Throwable => s"RAISED ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}" }
      info(s"$q => $got")
    }
  }

  probe("smoke", "RETURN 1 AS x")
}
