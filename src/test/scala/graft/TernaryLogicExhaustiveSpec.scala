package graft

import graft.api.GraftSession

/** Exhaustive differential check of the ternary-logic comparison
  * compiler (ExprCompiler.ternaryEq / cmp3 / the IN cases): every pair
  * of lists of length <= 2 over the element domain {1, 2, null} (13
  * lists, 169 pairs) is evaluated by the engine under all six
  * comparison operators and compared against an in-spec reference
  * evaluator of the openCypher semantics — equality: length mismatch
  * false, else any pairwise-false -> false, any null pair -> null, else
  * true; ordering: lexicographic walk, first non-equal pair decides,
  * null pair before a decision -> null, equal prefix -> length; IN:
  * any true membership comparison -> true, else any null -> null, else
  * false. One engine query per pair evaluates all six operators as
  * columns, so the sweep is 169 plans, not 1014. */
class TernaryLogicExhaustiveSpec extends SparkTestBase {
  import TckFixtures._

  lazy val session = new GraftSession(spark)
  def g = graph(spark, Seq(N(1, Set("A"), Map("name" -> "a"))), Seq.empty)

  private val domain: Seq[Any] = Seq(1L, 2L, null)
  private val lists: Seq[Seq[Any]] =
    Seq(Seq.empty[Any]) ++ domain.map(Seq(_)) ++
      (for (a <- domain; b <- domain) yield Seq(a, b))

  // ---------------------------------------- reference evaluator
  private def eqv(a: Any, b: Any): Option[Boolean] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Seq[_], y: Seq[_]) =>
      if (x.length != y.length) Some(false)
      else {
        val es = x.zip(y).map { case (p, q) => eqv(p, q) }
        if (es.contains(Some(false))) Some(false)
        else if (es.contains(None)) None
        else Some(true)
      }
    case (x: Long, y: Long) => Some(x == y)
    case _ => sys.error(s"domain: $a $b")
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Seq[_], y: Seq[_]) =>
      val walked = x.zip(y).iterator.map { case (p, q) => cmp(p, q) }
        .find(c => c.isEmpty || c.get != 0)
      walked match {
        case Some(c) => c // None (poison) or the deciding sign
        case None => Some(Integer.compare(x.length, y.length))
      }
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case _ => sys.error(s"domain: $a $b")
  }

  private def in3(needle: Any, hay: Seq[Any]): Option[Boolean] = {
    val es = hay.map(h => eqv(needle, h))
    if (es.contains(Some(true))) Some(true)
    else if (es.contains(None)) None
    else Some(false)
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case s: Seq[_] => s.map(render).mkString("[", ", ", "]")
    case other => other.toString
  }

  private def opt(o: Option[Boolean]): Any = o.map(Boolean.box).orNull

  test("all 169 list pairs agree with the reference under all six operators") {
    var checked = 0
    for (a <- lists; b <- lists) {
      val q = s"RETURN (${render(a)} = ${render(b)}) AS eq, " +
        s"(${render(a)} <> ${render(b)}) AS ne, " +
        s"(${render(a)} < ${render(b)}) AS lt, " +
        s"(${render(a)} <= ${render(b)}) AS le, " +
        s"(${render(a)} > ${render(b)}) AS gt, " +
        s"(${render(a)} >= ${render(b)}) AS ge"
      val row = session.cypher(g, q).collect().head
      val e = eqv(a, b)
      val c = cmp(a, b)
      val want = Seq(
        opt(e), opt(e.map(!_)),
        opt(c.map(_ < 0)), opt(c.map(_ <= 0)),
        opt(c.map(_ > 0)), opt(c.map(_ >= 0)))
      val got = (0 until 6).map(i => if (row.isNullAt(i)) null else row.getBoolean(i))
      assert(got == want, s"\npair: ${render(a)} vs ${render(b)}\nquery: $q")
      checked += 1
    }
    assert(checked == 169)
  }

  test("IN over every (needle, two-candidate haystack) combination") {
    // needles: all 13 lists; haystacks: every pair of lists as a
    // two-element list-of-lists (169) — 2197 membership checks batched
    // 13 per query (one query per haystack).
    for (h1 <- lists; h2 <- lists) {
      val hay = Seq(h1, h2)
      val cols = lists.zipWithIndex.map { case (n, i) =>
        s"(${render(n)} IN ${render(hay)}) AS c$i"
      }.mkString(", ")
      val row = session.cypher(g, s"RETURN $cols").collect().head
      lists.zipWithIndex.foreach { case (n, i) =>
        val want = opt(in3(n, hay))
        val got = if (row.isNullAt(i)) null else row.getBoolean(i)
        assert(got == want,
          s"\nneedle: ${render(n)} IN ${render(hay)} -> got $got want $want")
      }
    }
  }
}
