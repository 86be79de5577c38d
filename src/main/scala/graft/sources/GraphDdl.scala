package graft.sources

import graft.graph.PropertyGraph
import org.apache.spark.sql.SparkSession

/** Text form of the SQL-table → property-graph mapping — the role of the
  * reference's Graph DDL (graph-ddl/.../GraphDdl.scala, GraphDdlParser.scala,
  * grammar exercised by graph-ddl/.../GraphDdlTest.scala), re-expressed over
  * Spark-registered tables/views.
  *
  * {{{
  * SET SCHEMA global_temp;                       -- name prefix for views
  *
  * CREATE ELEMENT TYPE Person ( name STRING, age INTEGER )
  * CREATE ELEMENT TYPE Employee EXTENDS Person ( salary FLOAT )
  * CREATE ELEMENT TYPE READS ( rating FLOAT )
  *
  * CREATE GRAPH TYPE fooSchema (
  *   Book ( title STRING ),                      -- local element type
  *   (Person), (Employee), (Book),               -- node types
  *   (Person)-[READS]->(Book)                    -- relationship type
  * )
  *
  * CREATE GRAPH fooGraph OF fooSchema (
  *   (Person)   FROM personView KEY id ( person_name AS name ),
  *   (Employee) FROM employeeView KEY eid,
  *   (Book)     FROM bookView KEY book_id ( book_title AS title ),
  *   (Person)-[READS]->(Book)
  *     FROM readsView e ( value1 AS rating )
  *       START NODES (Person) FROM personView p JOIN ON p.person_id = e.person
  *       END   NODES (Book)   FROM bookView   b JOIN ON e.book = b.book_id
  * )
  * }}}
  *
  * Semantics mirrored from the reference:
  *  - element-type inheritance: `A EXTENDS B, C` — a node type (A) carries
  *    labels {A} ∪ ancestors and the merged property set; conflicting
  *    property types in the hierarchy, unresolved parents, and inheritance
  *    cycles are errors (GraphDdlTest "fails on …" scenarios).
  *  - graph types: local element types shadow global ones; a graph `OF t`
  *    may only map node/rel types declared in `t`.
  *  - multiple `FROM` views per node/rel type, each with its own column →
  *    property renaming `( col AS prop )`; unmapped declared properties
  *    default to the same-named column.
  *  - JOIN mappings: `START/END NODES (T) FROM view alias JOIN ON
  *    a.col = b.col` resolves an endpoint through a non-key node column.
  *  - `SET SCHEMA p` prefixes unqualified view names.
  *
  * Deviations (documented): node mappings take `KEY col` — Spark-side
  * graphs need a stable id column rather than the reference's load-time
  * generated ids; rel mappings may omit KEY (a deterministic synthetic id
  * is derived at load). The legacy compact forms `NODE (A) FROM t KEY k
  * [PROPERTIES (…)]` / `REL R FROM t KEY k SOURCE t(c[ JOIN c2]) TARGET …`
  * remain accepted inside CREATE GRAPH.
  */
object GraphDdl {

  // ------------------------------------------------------------- AST bits
  private case class ElementType(name: String, parents: Seq[String],
      props: Map[String, String])
  private case class GraphType(name: String, local: Map[String, ElementType],
      nodeTypes: Set[Seq[String]], relTypes: Set[(Seq[String], String, Seq[String])])

  def parse(spark: SparkSession, ddl: String): PropertyGraph = {
    val p = new P(tokenize(ddl))
    var schema = ""
    def qualify(t: String): String =
      if (schema.isEmpty || t.contains(".")) t else schema + t

    val globalTypes = scala.collection.mutable.Map.empty[String, ElementType]
    val graphTypes = scala.collection.mutable.Map.empty[String, GraphType]
    var graph: Option[PropertyGraph] = None

    while (p.hasNext && graph.isEmpty) {
      if (p.peekWordIs("SET")) {
        p.next(); p.expectWord("SCHEMA")
        schema = p.next() + "."
        if (p.peekIs(";")) p.next()
      } else {
        p.expectWord("CREATE")
        if (p.peekWordIs("ELEMENT")) {
          p.next(); p.expectWord("TYPE")
          val et = parseElementType(p)
          if (globalTypes.contains(et.name))
            fail(s"duplicate global element type ${et.name}")
          globalTypes(et.name) = et
        } else if (p.peekWordIs("GRAPH") && p.peekWordIs2("TYPE")) {
          p.next(); p.next()
          val gt = parseGraphType(p)
          if (graphTypes.contains(gt.name)) fail(s"duplicate graph type ${gt.name}")
          graphTypes(gt.name) = gt
        } else {
          p.expectWord("GRAPH")
          graph = Some(parseGraph(spark, p, qualify,
            globalTypes.toMap, graphTypes.toMap))
        }
      }
    }
    graph.getOrElse(fail("DDL contains no CREATE GRAPH"))
  }

  // --------------------------------------------------- element/graph types
  /** Property types the reference grammar admits (GraphDdlParserTest
    * "does not accept unknown types"); a trailing `?` marks nullable. */
  private val knownPropTypes = Set("STRING", "INTEGER", "FLOAT", "BOOLEAN",
    "DATE", "DATETIME", "LOCALDATETIME", "TIME", "LOCALTIME", "DURATION",
    "POINT", "ANY")
  private def parsePropType(p: P): String = {
    val raw = p.next()
    val t = raw.stripSuffix("?") // `FLOAT?` = nullable FLOAT
    if (!knownPropTypes(t.toUpperCase))
      fail(s"unknown property type $raw")
    t.toUpperCase
  }

  /** `Name [EXTENDS A, B | <: A, B] [( prop TYPE[?], ... )]
    * [KEY name (col, ...)]` (cursor after TYPE/name). The KEY clause
    * (element keys, GraphDdlParserTest :179) is accepted and recorded
    * nowhere: element identity here is the mapping's view KEY column
    * (the documented Spark-side deviation). */
  private def parseElementType(p: P): ElementType = {
    val name = p.next()
    val parents = Seq.newBuilder[String]
    // `<:` is the reference grammar's EXTENDS shorthand
    val ext = p.peekWordIs("EXTENDS") || p.peekIs("<")
    if (ext) {
      if (p.peekIs("<")) { p.next(); p.expect(":") } else p.next()
      parents += p.next()
      while (p.peekIs(",")) { p.next(); parents += p.next() }
    }
    val props = Map.newBuilder[String, String]
    if (p.peekIs("(")) {
      p.next()
      if (!p.peekIs(")")) {
        props += (p.next() -> parsePropType(p))
        while (p.peekIs(",")) { p.next(); props += (p.next() -> parsePropType(p)) }
      }
      p.expect(")")
    }
    if (p.peekWordIs("KEY")) {
      p.next(); p.next() // key name
      p.expect("(")
      p.next()
      while (p.peekIs(",")) { p.next(); p.next() }
      p.expect(")")
    }
    ElementType(name, parents.result(), props.result())
  }

  private def parseGraphType(p: P): GraphType = {
    val name = p.next()
    p.expect("(")
    val local = scala.collection.mutable.Map.empty[String, ElementType]
    val nodeTypes = Set.newBuilder[Seq[String]]
    val relTypes = Set.newBuilder[(Seq[String], String, Seq[String])]
    var more = !p.peekIs(")")
    while (more) {
      if (p.peekIs("(")) {
        val src = parseNodeTypeRef(p)
        if (p.peekIs("-")) {
          val rel = parseRelArrow(p)
          val tgt = parseNodeTypeRef(p)
          relTypes += ((src, rel, tgt))
        } else nodeTypes += src
      } else {
        val et = parseElementType(p)
        if (local.contains(et.name)) fail(s"duplicate local element type ${et.name}")
        local(et.name) = et
      }
      if (p.peekIs(",")) p.next() else more = false
    }
    p.expect(")")
    GraphType(name, local.toMap, nodeTypes.result(), relTypes.result())
  }

  /** `(A[, B])` → type names. */
  private def parseNodeTypeRef(p: P): Seq[String] = {
    p.expect("(")
    val ts = Seq.newBuilder[String]
    ts += p.next()
    while (p.peekIs(",")) { p.next(); ts += p.next() }
    p.expect(")")
    ts.result()
  }

  /** `-[R]->` (cursor on `-`). The reference grammar also admits label
    * SETS on relationships (`-[R, S]->`, GraphDdlParserTest :205); a
    * Cypher relationship carries exactly one type, so a set is a
    * classified refusal rather than silent truncation. */
  private def parseRelArrow(p: P): String = {
    p.expect("-"); p.expect("[")
    val r = p.next()
    if (p.peekIs(",")) fail(
      s"relationship label sets ([$r, ...]) are unsupported: a " +
        "relationship carries exactly one type")
    p.expect("]"); p.expect("-"); p.expect(">")
    r
  }

  // ------------------------------------------------------ type resolution
  /** labels ∪ merged props up the EXTENDS chain; cycle/unknown/conflict →
    * error (mirrors GraphDdlTest failure scenarios). */
  private def resolve(name: String, types: Map[String, ElementType],
      seen: Set[String] = Set.empty): (Set[String], Map[String, String]) = {
    if (seen(name)) fail(s"cyclic element type inheritance at $name")
    val et = types.getOrElse(name, fail(s"unresolved element type $name"))
    et.parents.foldLeft((Set(name), et.props)) { case ((ls, ps), parent) =>
      val (pls, pps) = resolve(parent, types, seen + name)
      pps.foreach { case (k, t) =>
        ps.get(k).filter(_ != t).foreach(t2 => fail(
          s"conflicting property types in inheritance hierarchy: $name.$k is $t2, $parent.$k is $t"))
      }
      (ls ++ pls, pps ++ ps)
    }
  }

  // ------------------------------------------------------------ mappings
  private def parseGraph(spark: SparkSession, p: P,
      qualify: String => String,
      globalTypes: Map[String, ElementType],
      graphTypes: Map[String, GraphType]): PropertyGraph = {
    if (!p.peekIs("(")) p.next() // optional graph name
    val declared: Option[GraphType] =
      if (p.peekWordIs("OF")) {
        p.next()
        val tn = p.next()
        Some(graphTypes.getOrElse(tn, fail(s"unresolved graph type $tn")))
      } else None
    // Inline graph-type elements (element types, node types, rel types
    // declared directly in the CREATE GRAPH body — GraphDdlParserTest
    // "graph definition with inlined graph type elements").
    val inlineTypes = scala.collection.mutable.Map.empty[String, ElementType]
    val inlineNodeTypes = scala.collection.mutable.Set.empty[Seq[String]]
    val inlineRelTypes =
      scala.collection.mutable.Set.empty[(Seq[String], String, Seq[String])]
    // local graph-type elements shadow globals (GraphDdlTest "prefers
    // local label over global label"); inline elements shadow both
    def types: Map[String, ElementType] =
      globalTypes ++ declared.map(_.local).getOrElse(Map.empty) ++ inlineTypes
    def checkNodeType(ts: Seq[String]): Unit = declared.foreach { gt =>
      if (!gt.nodeTypes(ts) && !inlineNodeTypes(ts))
        fail(s"node type (${ts.mkString(",")}) is not declared in graph type ${gt.name}")
    }
    def checkRelType(src: Seq[String], r: String, tgt: Seq[String]): Unit =
      declared.foreach { gt =>
        if (!gt.relTypes((src, r, tgt)) && !inlineRelTypes((src, r, tgt)))
          fail(s"relationship type (${src.mkString(",")})-[$r]->(${tgt.mkString(",")}) " +
            s"is not declared in graph type ${gt.name}")
      }

    p.expect("(")
    val nodes = Seq.newBuilder[SqlGraphSource.NodeMapping]
    val rels = Seq.newBuilder[SqlGraphSource.RelMapping]
    // KEY column per qualified node view, for plain-FK detection in JOIN ON.
    val nodeKeyByTable = scala.collection.mutable.Map.empty[String, String]

    /** labels + properties for a node/rel type list; implicit element types
      * (not declared anywhere) contribute just their name as label and no
      * declared props ("creates implicit node/edge types from mappings"). */
    def labelsAndProps(ts: Seq[String]): (Set[String], Map[String, String]) =
      ts.foldLeft((Set.empty[String], Map.empty[String, String])) {
        case ((ls, ps), t) =>
          if (types.contains(t)) {
            val (tls, tps) = resolve(t, types)
            (ls ++ tls, ps ++ tps)
          } else (ls + t, ps)
      }

    /** `( col AS prop, ... )` — returns prop -> col. */
    def parseRenames(): Map[String, String] =
      if (!p.peekIs("(")) Map.empty
      else {
        p.next()
        val m = Map.newBuilder[String, String]
        def one(): Unit = {
          val col = p.next(); p.expectWord("AS"); m += (p.next() -> col)
        }
        one()
        while (p.peekIs(",")) { p.next(); one() }
        p.expect(")")
        m.result()
      }

    /** Final property map for a mapping: declared props default to the
      * same-named column, renames override; no declared props → empty map
      * (= SqlGraphSource's "all non-key columns" default). */
    def propMap(declaredProps: Map[String, String],
        renames: Map[String, String]): Map[String, String] =
      if (declaredProps.isEmpty && renames.isEmpty) Map.empty
      else declaredProps.keys.map(k => k -> renames.getOrElse(k, k)).toMap ++
        renames

    /** `alias.column` → (alias, column). */
    def aliasCol(tok: String): (String, String) = tok.split("\\.", 2) match {
      case Array(a, c) => (a, c)
      case _ => fail(s"JOIN ON operand must be alias.column, got $tok")
    }

    var more = !p.peekIs(")")
    while (more) {
      p.peekWord.map(_.toUpperCase) match {
        // ---- legacy compact forms (round-2 grammar) ----
        case Some("NODE") =>
          p.next()
          val ts = parseNodeTypeRef(p)
          p.expectWord("FROM"); val table = p.next()
          p.expectWord("KEY"); val key = p.next()
          val legacyProps = parseLegacyProps(p)
          val (labels, declaredProps) = labelsAndProps(ts)
          checkNodeType(ts)
          val props =
            if (legacyProps.nonEmpty) legacyProps.map(k => k -> k).toMap
            else propMap(declaredProps, Map.empty)
          nodeKeyByTable(qualify(table)) = key
          nodes += SqlGraphSource.NodeMapping(qualify(table), labels, key, props)
        case Some("REL") | Some("RELATIONSHIP") =>
          p.next()
          val relType = p.next()
          p.expectWord("FROM"); val table = p.next()
          p.expectWord("KEY"); val key = p.next()
          p.expectWord("SOURCE")
          val (srcTable, srcCol, srcJoin) = parseLegacyEndpoint(p)
          p.expectWord("TARGET")
          val (tgtTable, tgtCol, tgtJoin) = parseLegacyEndpoint(p)
          val legacyProps = parseLegacyProps(p)
          rels += SqlGraphSource.RelMapping(qualify(table), relType, key,
            srcCol, tgtCol, qualify(srcTable), qualify(tgtTable),
            legacyProps.map(k => k -> k).toMap, srcJoin, tgtJoin)
        // ---- reference-shaped forms ----
        case Some(_) if !p.peekIs("(") =>
          // inline element type declaration: `A ( foo STRING )`, `B`,
          // `B EXTENDS A ( y STRING )`
          val et = parseElementType(p)
          if (inlineTypes.contains(et.name))
            fail(s"duplicate local element type ${et.name}")
          inlineTypes(et.name) = et
        case _ =>
          val ts = parseNodeTypeRef(p)
          if (p.peekIs("-")) {
            // (A)-[R]->(B) FROM view alias (renames)
            //   START NODES (A) FROM nview a JOIN ON a.c = e.c …
            val rel = parseRelArrow(p)
            val tgtTs = parseNodeTypeRef(p)
            if (!p.peekWordIs("FROM")) {
              // inline relationship TYPE declaration: `(A)-[R]->(B),`
              inlineRelTypes += ((ts, rel, tgtTs))
            } else {
              checkRelType(ts, rel, tgtTs)
              val (_, declaredProps) = labelsAndProps(Seq(rel))
              while (p.peekWordIs("FROM")) {
                p.next()
                val table = qualify(p.next())
                val edgeAlias =
                  if (p.peekWord.exists(w => !reservedCheck(w))) p.next()
                  else "edge"
                val renames = parseRenames()
                var key = ""
                if (p.peekWordIs("KEY")) { p.next(); key = p.next() }
                def endpoint(kw: String)
                    : (String, Seq[(String, String)]) = {
                  p.expectWord(kw); p.expectWord("NODES")
                  val ets = parseNodeTypeRef(p)
                  checkNodeType(ets)
                  p.expectWord("FROM")
                  val nTable = qualify(p.next())
                  val nAlias =
                    if (p.peekWord.exists(w => !reservedCheck(w))) p.next()
                    else "node"
                  p.expectWord("JOIN"); p.expectWord("ON")
                  // `a.c = e.c [AND a.c2 = e.c2]*` — composite join keys
                  // (the reference's JoinOnDefinition pair lists)
                  val pairs = Seq.newBuilder[(String, String)]
                  def onePair(): Unit = {
                    val (a1, c1) = aliasCol(p.next())
                    p.expect("=")
                    val (a2, c2) = aliasCol(p.next())
                    val (nodeCol, relCol) =
                      if (a1 == nAlias && a2 == edgeAlias) (c1, c2)
                      else if (a1 == edgeAlias && a2 == nAlias) (c2, c1)
                      else fail(s"JOIN ON must relate $nAlias and $edgeAlias, got $a1 = $a2")
                    pairs += ((relCol, nodeCol))
                  }
                  onePair()
                  while (p.peekWordIs("AND")) { p.next(); onePair() }
                  (nTable, pairs.result())
                }
                val (srcTable, srcPairs) = endpoint("START")
                val (tgtTable, tgtPairs) = endpoint("END")
                rels += SqlGraphSource.RelMapping(table, rel, key,
                  srcPairs.head._1, tgtPairs.head._1, srcTable, tgtTable,
                  propMap(declaredProps, renames),
                  srcJoinPairs = srcPairs, tgtJoinPairs = tgtPairs)
              }
            }
          } else if (!p.peekWordIs("FROM")) {
            // inline node TYPE declaration: `(A, B),`
            inlineNodeTypes += ts
          } else {
            // (A[,B]) FROM view KEY id (renames) [FROM …]*
            checkNodeType(ts)
            val (labels, declaredProps) = labelsAndProps(ts)
            while (p.peekWordIs("FROM")) {
              p.next()
              val table = qualify(p.next())
              p.expectWord("KEY")
              val key = p.next()
              val renames = parseRenames()
              nodeKeyByTable(table) = key
              nodes += SqlGraphSource.NodeMapping(table, labels, key,
                propMap(declaredProps, renames))
            }
          }
      }
      if (p.peekIs(",")) p.next() else more = false
    }
    p.expect(")")
    SqlGraphSource.load(spark, nodes.result(), rels.result())
  }

  private val reserved = Set("START", "END", "FROM", "KEY", "JOIN", "ON",
    "NODES", "AS", "OF", "AND")
  private def reservedCheck(w: String): Boolean = reserved(w.toUpperCase)
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("Graph DDL: " + msg)

  private def parseLegacyEndpoint(p: P): (String, String, Option[String]) = {
    val table = p.next()
    p.expect("(")
    val c = p.next()
    val join = if (p.peekWordIs("JOIN")) { p.next(); Some(p.next()) } else None
    p.expect(")")
    (table, c, join)
  }

  private def parseLegacyProps(p: P): Seq[String] =
    if (p.peekWordIs("PROPERTIES")) {
      p.next()
      p.expect("(")
      val ps = Seq.newBuilder[String]
      ps += p.next()
      while (p.peekIs(",")) { p.next(); ps += p.next() }
      p.expect(")")
      ps.result()
    } else Seq.empty

  // -- tiny tokenizer: punctuation "()[],;=<>-", words (dots kept inside),
  //    -- line comments --
  private def tokenize(s: String): Vector[String] = {
    val punct = "()[],;=<>-"
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') i += 1
      } else if (c == '`') {
        // backtick-quoted identifier (`foo.json`): one token, quotes off
        val st = i + 1
        i = st
        while (i < s.length && s(i) != '`') i += 1
        if (i >= s.length) fail(
          "unterminated backtick identifier in Graph DDL: `" +
            s.substring(st, Math.min(st + 40, s.length)) + "...")
        out += s.substring(st, i)
        i += 1
      } else if (punct.contains(c)) { out += c.toString; i += 1 }
      else {
        val st = i
        while (i < s.length && !s(i).isWhitespace && !punct.contains(s(i)))
          i += 1
        out += s.substring(st, i)
      }
    }
    out.result()
  }

  private class P(toks: Vector[String]) {
    private var i = 0
    def hasNext: Boolean = i < toks.length
    def next(): String = { val t = toks(i); i += 1; t }
    def peekIs(t: String): Boolean = i < toks.length && toks(i) == t
    def peekWord: Option[String] =
      if (i < toks.length && toks(i).length > 0 &&
        !"()[],;=<>-".contains(toks(i).charAt(0))) Some(toks(i))
      else None
    def peekWordIs(w: String): Boolean = peekWord.exists(_.equalsIgnoreCase(w))
    def peekWordIs2(w: String): Boolean =
      i + 1 < toks.length && toks(i + 1).equalsIgnoreCase(w)
    def expect(t: String): Unit = {
      require(peekIs(t), s"Graph DDL: expected '$t' at token $i, got ${toks.lift(i)}")
      i += 1
    }
    def expectWord(w: String): Unit = {
      require(peekWordIs(w), s"Graph DDL: expected $w at token $i, got ${toks.lift(i)}")
      i += 1
    }
  }
}
