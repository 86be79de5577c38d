package graft.sources

import graft.graph.PropertyGraph
import org.apache.spark.sql.SparkSession

/** Text form of the SQL-table → property-graph mapping — the role of the
  * reference's Graph DDL (graph-ddl/.../GraphDdl.scala:49), with a
  * simplified declarative syntax over registered tables/views:
  *
  * {{{
  * SET SCHEMA global_temp;                              -- optional prefix
  * CREATE GRAPH (
  *   NODE (Person) FROM persons KEY id PROPERTIES (name, age),
  *   NODE (Person, Admin) FROM admins KEY id,            -- all non-key cols
  *   REL KNOWS FROM knows KEY id SOURCE persons(src) TARGET persons(tgt)
  *     PROPERTIES (since),
  *   REL MEMBER_OF FROM memberships KEY mid
  *     SOURCE persons(m_email JOIN email) TARGET groups(gid)
  * )
  * }}}
  *
  * `PROPERTIES` omitted = every column except key/endpoint columns.
  * `SET SCHEMA p` prefixes unqualified table names with `p.` (the
  * reference Graph DDL's SET SCHEMA, graph-ddl/.../GraphDdl.scala:49).
  * `SOURCE t(c JOIN nc)` is a JOIN mapping: rel column `c` equates to the
  * node table's non-key column `nc` and the loader joins through it.
  * `--` starts a line comment. Table names resolve via `spark.table`.
  */
object GraphDdl {

  def parse(spark: SparkSession, ddl: String): PropertyGraph = {
    val toks = tokenize(ddl)
    val p = new P(toks)
    var schema = ""
    if (p.peekWordIs("SET")) {
      p.next()
      p.expectWord("SCHEMA")
      schema = p.next() + "."
      if (p.peekIs(";")) p.next()
    }
    def qualify(t: String): String =
      if (schema.isEmpty || t.contains(".")) t else schema + t
    p.expectWord("CREATE")
    p.expectWord("GRAPH")
    // optional graph name
    if (!p.peekIs("(")) p.next()
    p.expect("(")
    val nodes = Seq.newBuilder[SqlGraphSource.NodeMapping]
    val rels = Seq.newBuilder[SqlGraphSource.RelMapping]
    var more = true
    while (more) {
      p.peekWord.map(_.toUpperCase) match {
        case Some("NODE") =>
          p.next()
          p.expect("(")
          val labels = Seq.newBuilder[String]
          labels += p.next()
          while (p.peekIs(",")) { p.next(); labels += p.next() }
          p.expect(")")
          p.expectWord("FROM")
          val table = p.next()
          p.expectWord("KEY")
          val key = p.next()
          val props = parseProps(p)
          nodes += SqlGraphSource.NodeMapping(qualify(table),
            labels.result().toSet, key, props.map(k => k -> k).toMap)
        case Some("REL") | Some("RELATIONSHIP") =>
          p.next()
          val relType = p.next()
          p.expectWord("FROM")
          val table = p.next()
          p.expectWord("KEY")
          val key = p.next()
          p.expectWord("SOURCE")
          val (srcTable, srcCol, srcJoin) = parseEndpoint(p)
          p.expectWord("TARGET")
          val (tgtTable, tgtCol, tgtJoin) = parseEndpoint(p)
          val props = parseProps(p)
          rels += SqlGraphSource.RelMapping(qualify(table), relType, key,
            srcCol, tgtCol, qualify(srcTable), qualify(tgtTable),
            props.map(k => k -> k).toMap, srcJoin, tgtJoin)
        case other =>
          throw new IllegalArgumentException(s"expected NODE or REL, got $other")
      }
      if (p.peekIs(",")) p.next() else more = false
    }
    p.expect(")")
    SqlGraphSource.load(spark, nodes.result(), rels.result())
  }

  private def parseEndpoint(p: P): (String, String, Option[String]) = {
    val table = p.next()
    p.expect("(")
    val c = p.next()
    val join = if (p.peekWordIs("JOIN")) { p.next(); Some(p.next()) } else None
    p.expect(")")
    (table, c, join)
  }

  private def parseProps(p: P): Seq[String] =
    if (p.peekWordIs("PROPERTIES")) {
      p.next()
      p.expect("(")
      val ps = Seq.newBuilder[String]
      ps += p.next()
      while (p.peekIs(",")) { p.next(); ps += p.next() }
      p.expect(")")
      ps.result()
    } else Seq.empty

  // -- tiny tokenizer ("("/")"/"," punctuation, words, -- comments) --
  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') i += 1
      } else if ("(),;".contains(c)) { out += c.toString; i += 1 }
      else {
        val st = i
        while (i < s.length && !s(i).isWhitespace && !"(),;".contains(s(i)))
          i += 1
        out += s.substring(st, i)
      }
    }
    out.result()
  }

  private class P(toks: Vector[String]) {
    private var i = 0
    def next(): String = { val t = toks(i); i += 1; t }
    def peekIs(t: String): Boolean = i < toks.length && toks(i) == t
    def peekWord: Option[String] =
      if (i < toks.length && !"(),;".contains(toks(i))) Some(toks(i)) else None
    def peekWordIs(w: String): Boolean =
      peekWord.exists(_.equalsIgnoreCase(w))
    def expect(t: String): Unit = {
      require(peekIs(t), s"expected '$t' at token $i, got ${toks.lift(i)}")
      i += 1
    }
    def expectWord(w: String): Unit = {
      require(peekWordIs(w), s"expected $w at token $i, got ${toks.lift(i)}")
      i += 1
    }
  }
}
