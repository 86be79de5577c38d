package graft.api

import graft.graph.PropertyGraph
import graft.impl.Planner
import graft.parser.CypherParser
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Entry point: Cypher over Spark DataFrames.
  *
  * Mirrors the reference's session surface
  * (okapi-relational/.../api/graph/RelationalCypherSession.scala:130-199;
  * okapi-api/.../api/graph/PropertyGraph.scala:46-117): parse -> plan ->
  * lazy DataFrame. Nothing executes until an action on the returned frame.
  */
class GraftSession(val spark: SparkSession) {
  /** Named-graph catalog (SessionGraphDataSource equivalent). */
  val catalog: TrieMap[String, PropertyGraph] = TrieMap.empty

  /** User-registered Cypher functions (procedure-like extension hook):
    * `registerFunction("sq", args => args.head * args.head)` makes `sq(x)`
    * callable from any query in this session. */
  private val functions = TrieMap.empty[String, Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column]
  def registerFunction(name: String,
      fn: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
    functions.put(name.toLowerCase, fn)

  /** Table procedures callable via `CALL name(args) YIELD cols`. Built-ins
    * expose the graph algorithms; users can register more. */
  private val procedures =
    TrieMap.empty[String, (PropertyGraph, Seq[Any]) => DataFrame]
  def registerProcedure(name: String,
      proc: (PropertyGraph, Seq[Any]) => DataFrame): Unit =
    procedures.put(name.toLowerCase, proc)

  private def intArg(args: Seq[Any], i: Int, default: Int): Int =
    args.lift(i).map { case l: Long => l.toInt; case x: Int => x
      case other => throw new IllegalArgumentException(s"int expected: $other")
    }.getOrElse(default)

  private def strArg(args: Seq[Any], i: Int): String =
    args.lift(i) match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(
        s"string expected at CALL argument $i: $other")
    }

  /** Trailing relationship-type varargs (empty = every type). */
  private def strArgs(args: Seq[Any], from: Int): Seq[String] =
    args.drop(from).map {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"relationship type (string) expected: $other")
    }

  private def numArg(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case other => throw new IllegalArgumentException(s"number expected: $other")
  }

  /** Tagged-id frame of every node carrying `label` — the seed-set surface
    * the algorithm procedures use (CALL args are literals, so seeds are
    * named by label, the Neo4j-GDS convention). */
  private def labelIds(g: PropertyGraph, label: String)
      : org.apache.spark.sql.DataFrame = {
    val scans = g.nodeScansFor(Seq(label))
    require(scans.nonEmpty, s"no node table carries label: $label")
    scans.map(_.df.select(
        org.apache.spark.sql.functions.col(PropertyGraph.ID).as("id")))
      .reduce(_.unionByName(_))
  }

  registerProcedure("pagerank", (g, args) =>
    graft.algos.GraphAlgorithms.pageRank(g, iterations = intArg(args, 0, 10))
      .toDF("id", "rank"))
  // CALL pagerankWeighted(iterations, relType, weight [, relType, weight]...)
  registerProcedure("pagerankweighted", (g, args) => {
    val weights = args.drop(1).grouped(2).map {
      case Seq(t: String, w) => t -> numArg(w)
      case other => throw new IllegalArgumentException(
        s"pagerankWeighted expects (relType, weight) pairs after the " +
          s"iteration count: $other")
    }.toMap
    graft.algos.GraphAlgorithms.pageRankWeighted(g, weights,
      iterations = intArg(args, 0, 10)).toDF("id", "rank")
  })
  registerProcedure("connectedcomponents", (g, _) =>
    graft.algos.GraphAlgorithms.connectedComponents(g)
      .toDF("id", "component"))
  registerProcedure("degrees", (g, _) =>
    graft.algos.GraphAlgorithms.degrees(g))
  registerProcedure("trianglecount", (g, _) => {
    val n = graft.algos.GraphAlgorithms.triangleCount(g)
    spark.range(1).select(
      org.apache.spark.sql.functions.lit(n).as("triangles"))
  })
  // Round-7 algorithms surfaced as procedures (the full analytics module is
  // reachable from Cypher, mirroring the reference's session entry points —
  // okapi-api/.../api/graph/CypherSession.scala). Signatures use literal
  // args only (the CALL contract): seed sets are named by node label,
  // relationship types are trailing string varargs (empty = all types).
  // CALL sssp(seedLabel, relType, weight [, relType, weight]...)
  registerProcedure("sssp", (g, args) => {
    val weights = args.drop(1).grouped(2).map {
      case Seq(t: String, w) => t -> numArg(w)
      case other => throw new IllegalArgumentException(
        s"sssp expects (relType, weight) pairs after the seed label: $other")
    }.toMap
    graft.algos.GraphAlgorithms.sssp(g, labelIds(g, strArg(args, 0)), weights)
      .toDF("id", "dist")
  })
  // CALL hits(iterations [, relType...])
  registerProcedure("hits", (g, args) =>
    graft.algos.GraphAlgorithms.hits(g, strArgs(args, 1),
      iterations = intArg(args, 0, 2)).toDF("id", "hub", "auth"))
  // CALL ppr(seedLabel, iterations [, relType...])
  registerProcedure("ppr", (g, args) =>
    graft.algos.GraphAlgorithms.personalizedPageRank(g,
      labelIds(g, strArg(args, 0)), iterations = intArg(args, 1, 10),
      relTypes = strArgs(args, 2)).toDF("id", "rank"))
  // CALL betweenness(seedLabel [, relType...]) — k-source Brandes seeded
  // on the labeled nodes, undirected (the algorithm's default).
  registerProcedure("betweenness", (g, args) =>
    graft.algos.GraphAlgorithms.betweenness(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 1)),
      labelIds(g, strArg(args, 0))).toDF("id", "betweenness"))
  // CALL kcore(k [, relType...]) — members of the k-core with within-core
  // degree.
  registerProcedure("kcore", (g, args) =>
    graft.algos.GraphAlgorithms.kCore(g, intArg(args, 0, 2),
      strArgs(args, 1)).toDF("id", "degree"))
  // CALL ktruss(k [, relType...]) — surviving canonical (a < b) edges.
  registerProcedure("ktruss", (g, args) =>
    graft.algos.GraphAlgorithms.kTrussEdges(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 1)),
      intArg(args, 0, 3)).toDF("a", "b"))
  // CALL toposort([relType...]) — longest-path topological level per node
  // (classified error on a cyclic graph).
  registerProcedure("toposort", (g, args) =>
    graft.algos.GraphAlgorithms.topologicalLevels(g, strArgs(args, 0))
      .toDF("id", "level"))
  // CALL scc([relType...]) — strongly connected component (min member id)
  // per node.
  registerProcedure("scc", (g, args) =>
    graft.algos.GraphAlgorithms.stronglyConnectedComponents(g,
      strArgs(args, 0)).toDF("id", "scc"))
  // CALL harmonic(seedLabel [, relType...]) — exact k-source harmonic
  // centrality seeded on the labeled nodes (undirected).
  registerProcedure("harmonic", (g, args) =>
    graft.algos.GraphAlgorithms.harmonicCentrality(g,
      labelIds(g, strArg(args, 0)), strArgs(args, 1))
      .toDF("id", "harmonic"))
  // CALL labelprop(maxIterations [, relType...])
  registerProcedure("labelprop", (g, args) =>
    graft.algos.GraphAlgorithms.labelPropagation(g, strArgs(args, 1),
      maxIterations = intArg(args, 0, 10)).toDF("id", "label"))
  // CALL assortativity([relType...]) — 1-row degree assortativity.
  registerProcedure("assortativity", (g, args) =>
    graft.algos.GraphAlgorithms.degreeAssortativity(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 0))))
  // CALL articlerank(iterations [, relType...]) — PageRank recurrence
  // with the hub-damped outDeg + avgOutDeg normalizer.
  registerProcedure("articlerank", (g, args) =>
    graft.algos.GraphAlgorithms.articleRank(g,
      iterations = intArg(args, 0, 10), relTypes = strArgs(args, 1))
      .toDF("id", "rank"))
  // CALL transitivity([relType...]) — 1-row global clustering coefficient
  // (3·triangles / wedges) over the undirected simple graph.
  registerProcedure("transitivity", (g, args) =>
    graft.algos.GraphAlgorithms.transitivityEdges(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 0))))
  // CALL modularity(levels, sweeps [, relType...]) — 1-row Newman
  // modularity of the louvain(levels, sweeps) partition on the same
  // rel-type subgraph.
  registerProcedure("modularity", (g, args) => {
    val e = graft.algos.GraphAlgorithms.edges(g, strArgs(args, 2))
    graft.algos.GraphAlgorithms.modularityEdges(e,
      graft.algos.GraphAlgorithms.louvain(e,
        levels = intArg(args, 0, 2), sweeps = intArg(args, 1, 2))
        .toDF("id", "community"))
  })
  // CALL louvain(levels, sweeps [, relType...]) — deterministic Louvain
  // community detection (parity-gated sweeps, smaller-id tie break).
  registerProcedure("louvain", (g, args) =>
    graft.algos.GraphAlgorithms.louvain(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 2)),
      levels = intArg(args, 0, 2), sweeps = intArg(args, 1, 2))
      .toDF("id", "community"))
  // CALL nodesimilarity(topK, degreeCutoff [, relType...]) — Jaccard over
  // shared out-neighbor targets, top-k per node (GDS nodeSimilarity).
  registerProcedure("nodesimilarity", (g, args) =>
    graft.algos.GraphAlgorithms.nodeSimilarity(g, strArgs(args, 2),
      topK = intArg(args, 0, 10), degreeCutoff = intArg(args, 1, 1))
      .toDF("id", "other", "jacc"))
  // CALL closeness(seedLabel [, relType...]) — exact k-source closeness
  // centrality seeded on the labeled nodes (undirected, plain variant;
  // the Wasserman-Faust correction stays programmatic).
  registerProcedure("closeness", (g, args) =>
    graft.algos.GraphAlgorithms.closenessCentrality(g,
      labelIds(g, strArg(args, 0)), strArgs(args, 1))
      .toDF("id", "closeness"))
  // CALL eigenvector(iterations [, relType...]) — power-iteration
  // eigenvector centrality, undirected orientation (the useful mode on
  // DAG-shaped data; the directed variant stays programmatic).
  registerProcedure("eigenvector", (g, args) =>
    graft.algos.GraphAlgorithms.eigenvectorCentrality(g,
      iterations = intArg(args, 0, 3), relTypes = strArgs(args, 1),
      directed = false).toDF("id", "score"))
  // CALL randomwalks(seedLabel, walksPerStart, steps, seed [, relType...])
  // — deterministic DeepWalk-style walks from every labeled node.
  registerProcedure("randomwalks", (g, args) =>
    graft.algos.GraphAlgorithms.randomWalks(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 4)),
      labelIds(g, strArg(args, 0)),
      walksPerStart = intArg(args, 1, 4), steps = intArg(args, 2, 8),
      seed = intArg(args, 3, 42).toLong)
      .toDF("walk_id", "start", "step", "node"))
  // CALL neighborhood(maxHops [, lgK [, relType...]]) — HyperBall ball-size
  // estimates (the scale path; exact 2-hop baseline stays programmatic).
  registerProcedure("neighborhood", (g, args) =>
    graft.algos.GraphAlgorithms.neighborhoodHll(
      graft.algos.GraphAlgorithms.edges(g, strArgs(args, 2)),
      maxHops = intArg(args, 0, 2), lgK = intArg(args, 1, 12))
      .toDF("id", "ball_est"))
  // Neo4j-style schema introspection: the graph schema is known up front
  // (SURVEY §1.1), so these are driver-side constants, no jobs.
  registerProcedure("db.labels", (g, _) => {
    import spark.implicits._
    g.schema.labels.toSeq.sorted.toDF("label")
  })
  registerProcedure("db.relationshiptypes", (g, _) => {
    import spark.implicits._
    g.schema.relTypes.keySet.toSeq.sorted.toDF("relationshipType")
  })
  registerProcedure("db.propertykeys", (g, _) => {
    import spark.implicits._
    (g.schema.labelCombinations.values.flatMap(_.keySet) ++
      g.schema.relTypes.values.flatMap(_.keySet))
      .toSeq.distinct.sorted.toDF("propertyKey")
  })
  // Neo4j's db.schema.nodeTypeProperties / relTypeProperties: one row
  // per (type, property) with the Cypher type name; property-less types
  // get a single null-property row (Neo4j's shape). Statically known —
  // no jobs.
  registerProcedure("db.schema.nodetypeproperties", (g, _) => {
    import spark.implicits._
    g.schema.labelCombinations.toSeq.flatMap { case (labels, props) =>
      val ls = labels.toSeq.sorted
      val nt = ls.map(l => s":`$l`").mkString
      if (props.isEmpty)
        Seq((nt, ls, null.asInstanceOf[String],
          null.asInstanceOf[Seq[String]], false))
      else props.toSeq.sortBy(_._1).map { case (k, t) =>
        (nt, ls, k, Seq(t.toString), true)
      }
    }.toDF("nodeType", "nodeLabels", "propertyName", "propertyTypes",
      "mandatory")
  })
  registerProcedure("db.schema.reltypeproperties", (g, _) => {
    import spark.implicits._
    g.schema.relTypes.toSeq.flatMap { case (t, props) =>
      val rt = s":`$t`"
      if (props.isEmpty)
        Seq((rt, null.asInstanceOf[String],
          null.asInstanceOf[Seq[String]], false))
      else props.toSeq.sortBy(_._1).map { case (k, ct) =>
        (rt, k, Seq(ct.toString), true)
      }
    }.toDF("relType", "propertyName", "propertyTypes", "mandatory")
  })
  registerProcedure("db.schema.nodetypecount", (g, _) => {
    import spark.implicits._
    g.schema.labelCombinations.keySet.toSeq
      .map(ls => ls.toSeq.sorted.mkString(":"))
      .sorted.toDF("labelCombination")
  })

  def store(name: String, g: PropertyGraph): Unit = catalog.put(name, g)
  def graphByName(name: String): PropertyGraph = resolveGraphRef(name)

  /** Parameterized graph views (CatalogDDLTests' CATALOG CREATE VIEW):
    * name -> (parameter names without '$', body text ending RETURN GRAPH). */
  private val views = TrieMap.empty[String, (Seq[String], String)]
  private val viewArgCounter = new java.util.concurrent.atomic.AtomicLong()
  def storeView(name: String, params: Seq[String], body: String): Unit =
    views.put(name, (params, body))
  def dropView(name: String): Unit = views.remove(name)
  def viewNames: Set[String] = views.keySet.toSet

  /** Resolve a graph reference: a catalog name, or a view invocation
    * `v(ref, ...)` whose arguments are themselves graph references
    * (recursively — `inc(inc(a))`). View bodies run with their `$param`
    * occurrences bound to the resolved argument graphs. */
  def resolveGraphRef(ref: String): PropertyGraph = {
    val call = """(?s)\s*([\w`]+)\s*\((.*)\)\s*""".r
    ref match {
      case call(name, argsStr) if views.contains(name) =>
        val (params, body) = views(name)
        val args = splitTopLevel(argsStr).filter(_.nonEmpty)
        require(args.size == params.size,
          s"view $name expects ${params.size} graph arguments, got ${args.size}")
        val bound = args.map(resolveGraphRef)
        var text = body
        // Bind longest parameter names first and replace on a word boundary
        // so $a never clobbers the prefix of $ab.
        val temps = params.zip(bound).sortBy(-_._1.length).map { case (p, g) =>
          val tmp = s"__viewarg_${viewArgCounter.incrementAndGet()}"
          catalog.put(tmp, g)
          text = text.replaceAll(
            java.util.regex.Pattern.quote("$" + p) + "\\b",
            java.util.regex.Matcher.quoteReplacement(tmp))
          tmp
        }
        try cypherGraph(PropertyGraph(Seq.empty), text)
        finally temps.foreach(catalog.remove)
      case _ =>
        val t = ref.trim
        catalog.get(t) match { // literal names win (incl. backticked dots)
          case Some(g) => g
          case None =>
            val i = t.indexOf('.')
            if (i > 0) graphSources.get(t.substring(0, i)) match {
              case Some(src) => src(t.substring(i + 1))
              case None => throw new IllegalArgumentException(
                s"unknown graph namespace: ${t.substring(0, i)}")
            }
            else throw new IllegalArgumentException(
              s"unknown graph or view: $ref")
        }
    }
  }

  /** Graph namespaces (the reference's PGDS namespaces / qualified graph
    * names): `FROM GRAPH ns.name` resolves via the source registered for
    * `ns`. "session" is pre-registered as the catalog itself; register an
    * FS or SQL source to address stored graphs by name. */
  private val graphSources = TrieMap[String, String => PropertyGraph](
    "session" -> ((n: String) => catalog.getOrElse(n,
      throw new IllegalArgumentException(s"unknown session graph: $n"))))
  def registerSource(namespace: String, src: String => PropertyGraph): Unit =
    graphSources.put(namespace, src)

  /** Split "a,b(c,d),e" on top-level commas only. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c =>
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  // CATALOG DDL statements handled at the session level (the reference's
  // CatalogDDL surface: CATALOG CREATE GRAPH/VIEW, CATALOG DROP ...).
  private val CatalogCreateGraphRe =
    """(?is)\s*CATALOG\s+CREATE\s+GRAPH\s+([\w`]+)\s*\{(.*)\}\s*""".r
  private val CatalogCreateViewRe =
    """(?is)\s*CATALOG\s+CREATE\s+VIEW\s+([\w`]+)\s*\(([^)]*)\)\s*\{(.*)\}\s*""".r
  private val CatalogDropRe =
    """(?is)\s*CATALOG\s+DROP\s+(GRAPH|VIEW)\s+([\w`]+)\s*""".r

  private val ShowProceduresRe = """(?is)\A\s*SHOW\s+PROCEDURES\s*\z""".r
  private val ShowFunctionsRe =
    """(?is)\A\s*SHOW\s+(?:USER\s+DEFINED\s+)?FUNCTIONS\s*\z""".r
  // Neo4j migration-script DDL. Indexes are performance-only artifacts —
  // Catalyst plans against parquet statistics, so CREATE/DROP INDEX is an
  // honest no-op (same stance as the discarded USING hints). Constraints
  // are ENFORCEMENT: silently not enforcing a uniqueness/existence rule
  // the user believes is active would be a correctness lie, so CREATE
  // CONSTRAINT refuses with a classified error instead.
  private val IndexDdlRe =
    ("""(?is)\A\s*(?:CREATE\s+(?:TEXT\s+|POINT\s+|RANGE\s+|LOOKUP\s+""" +
      """|FULLTEXT\s+|VECTOR\s+)?INDEX|DROP\s+INDEX)\b.*""").r
  private val CreateConstraintRe =
    """(?is)\A\s*CREATE\s+CONSTRAINT\b.*""".r
  // SHOW INDEXES / SHOW CONSTRAINTS: indexes are no-ops and constraints
  // refuse at CREATE, so the truthful listing is ALWAYS empty — a
  // migration script's inventory pass runs and sees none. DROP CONSTRAINT
  // follows Neo4j: IF EXISTS tolerates the (necessarily) missing
  // constraint; the bare form raises for an unknown name.
  private val ShowIndexesRe =
    """(?is)\A\s*SHOW\s+(?:ALL\s+|TEXT\s+|POINT\s+|RANGE\s+|LOOKUP\s+|FULLTEXT\s+|VECTOR\s+)?INDEXES\s*\z""".r
  private val ShowConstraintsRe =
    """(?is)\A\s*SHOW\s+(?:ALL\s+)?CONSTRAINTS\s*\z""".r
  private val DropConstraintIfExistsRe =
    """(?is)\A\s*DROP\s+CONSTRAINT\s+[\w`]+\s+IF\s+EXISTS\s*\z""".r
  private val DropConstraintRe =
    """(?is)\A\s*DROP\s+CONSTRAINT\b.*""".r

  private def isCatalogDdl(q: String): Boolean =
    CatalogCreateGraphRe.matches(q) || CatalogCreateViewRe.matches(q) ||
      CatalogDropRe.matches(q)

  /** Intercept CATALOG DDL; returns Some(empty DF) when `query` was DDL. */
  private def handleCatalogDdl(graph: PropertyGraph, query: String)
      : Option[DataFrame] = query match {
    case CatalogCreateGraphRe(name, body) =>
      store(name, cypherGraph(graph, body))
      Some(spark.emptyDataFrame)
    case CatalogCreateViewRe(name, paramsStr, body) =>
      val params = paramsStr.split(",").map(_.trim).filter(_.nonEmpty)
        .map(p => if (p.startsWith("$")) p.substring(1) else p)
      storeView(name, params.toSeq, body)
      Some(spark.emptyDataFrame)
    case CatalogDropRe(kind, name) =>
      if (kind.equalsIgnoreCase("VIEW")) dropView(name) else catalog.remove(name)
      Some(spark.emptyDataFrame) // idempotent, like the reference
    case _ => None
  }

  /** Compile and plan a Cypher query against a graph; the result is a lazy
    * DataFrame with user-facing column names. An optional driving table's
    * columns are visible to the query as value variables (reference entry
    * point 3, RelationalCypherSession driving tables). */
  def cypher(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty,
      drivingTable: Option[DataFrame] = None): DataFrame = {
    // EXPLAIN <query>: plan but don't run — one (plan) row with Spark's
    // formatted physical plan (what `.explain("formatted")` prints).
    // PROFILE is accepted as a synonym; with no instrumentation layer the
    // honest answer is the same plan text, not fake per-operator counts.
    val ExplainRe = "(?is)^\\s*(EXPLAIN|PROFILE)\\s+(.*)$".r
    query match {
      case ExplainRe(_, rest) =>
        import spark.implicits._
        // Catalog DDL must NOT run under EXPLAIN ("plan but don't run"):
        // recursing into cypher() would hit handleCatalogDdl and actually
        // create/drop the graph or view. DDL has no Spark plan, so the
        // honest answer is a descriptive row, side-effect free.
        if (isCatalogDdl(rest)) return Seq(
          "catalog DDL statement: no Spark plan; not executed under " +
            "EXPLAIN/PROFILE").toDF("plan")
        val planned = cypher(graph, rest, params, drivingTable)
        val text = planned.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        return Seq(text).toDF("plan")
      case _ =>
    }
    handleCatalogDdl(graph, query) match {
      case Some(ddlResult) => return ddlResult
      case None =>
    }
    // Discovery surface (Neo4j SHOW PROCEDURES / SHOW FUNCTIONS): list the
    // session registries. Built-in scalar functions compile directly in
    // ExprCompiler (no runtime registry), so SHOW FUNCTIONS enumerates the
    // REGISTERED (user) functions — the scoped divergence is recorded in
    // tck_blacklist.md.
    ShowProceduresRe.findFirstIn(query).foreach { _ =>
      import spark.implicits._
      return procedures.keys.toSeq.sorted
        .map(n => (n, "READ")).toDF("name", "mode")
    }
    ShowFunctionsRe.findFirstIn(query).foreach { _ =>
      import spark.implicits._
      return functions.keys.toSeq.sorted
        .map(n => (n, "user")).toDF("name", "category")
    }
    if (ShowIndexesRe.matches(query) || ShowConstraintsRe.matches(query)) {
      import spark.implicits._
      return Seq.empty[(String, String, Seq[String], Seq[String])]
        .toDF("name", "type", "labelsOrTypes", "properties")
    }
    if (DropConstraintIfExistsRe.matches(query)) return spark.emptyDataFrame
    if (DropConstraintRe.matches(query))
      throw new graft.api.CypherException(
        CypherError.SemanticError, CypherError.CompileTime,
        CypherError.UnsupportedExpression,
        "no such constraint: constraints cannot be created in this " +
          "engine (use DROP CONSTRAINT ... IF EXISTS for tolerant scripts)")
    if (IndexDdlRe.matches(query)) return spark.emptyDataFrame
    if (CreateConstraintRe.matches(query))
      throw new graft.api.CypherException(
        CypherError.SemanticError, CypherError.CompileTime,
        CypherError.UnsupportedExpression,
        "constraints are not supported: this engine computes over " +
          "immutable snapshots and cannot enforce uniqueness/existence " +
          "rules; refusing rather than silently not enforcing")
    val ast = CypherParser.parse(query)
    val planner = new Planner(spark, graph, params, drivingTable,
      graphByName, functions.toMap, procedures.toMap)
    classifyingTypeErrors {
      val (df, outs, header) = planner.plan(ast)
      planner.render(df, outs, header)
    }
  }

  /** Spark analyzes eagerly at DataFrame construction, so a static type
    * mismatch (NOT 3, 1 + {map}) surfaces during planning as an
    * AnalysisException. Those are compile-time-detectable type errors in
    * TCK terms — reclassify them instead of leaking Spark internals; the
    * Spark message is kept for diagnosis. Runtime clashes on dynamic
    * values stay Spark's (raised at action time, out of this taxonomy's
    * scope — tck_blacklist.md). */
  private def classifyingTypeErrors[T](body: => T): T =
    try body catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            e.getCondition.startsWith("DATATYPE_MISMATCH") =>
        throw new CypherException(CypherError.SyntaxError,
          CypherError.CompileTime, CypherError.InvalidArgumentType,
          e.getMessage)
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            e.getCondition.startsWith("WRONG_NUM_ARGS") =>
        throw new CypherException(CypherError.SyntaxError,
          CypherError.CompileTime, CypherError.InvalidNumberOfArguments,
          e.getMessage)
      // An aggregate item referencing a grouping EXPRESSION that is not
      // itself listed as a projection item — `RETURN n.x + count(*)` with
      // no `n.x` key. Neo4j rejects implicit grouping the same way
      // ("Aggregation column contains implicit grouping expressions").
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            (e.getCondition.startsWith("MISSING_GROUP_BY") ||
              e.getCondition.startsWith("MISSING_AGGREGATION")) =>
        throw new CypherException(CypherError.SyntaxError,
          CypherError.CompileTime,
          CypherError.AmbiguousAggregationExpression, e.getMessage)
    }

  /** Execute a write query (CREATE / SET / REMOVE / DELETE / MERGE after an
    * optional reading prefix) and return the updated graph. Writes never
    * mutate the input graph — the result is a new immutable PropertyGraph
    * whose tables are lazy views over the old ones (beyond-reference
    * surface: the reference engine is read-only). */
  def update(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): PropertyGraph = {
    val ast = CypherParser.parse(query)
    val planner = new Planner(spark, graph, params, None, graphByName,
      functions.toMap, procedures.toMap)
    classifyingTypeErrors { planner.plan(ast) }
    planner.updatedGraph.getOrElse(
      throw new IllegalArgumentException("query has no write clauses"))
  }

  /** Like update(), additionally returning the RETURN rows of the write
    * query (`CREATE (n) RETURN n.p`). */
  def updateWithResult(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): (DataFrame, PropertyGraph) = {
    val ast = CypherParser.parse(query)
    val planner = new Planner(spark, graph, params, None, graphByName,
      functions.toMap, procedures.toMap)
    val (df, outs, header) = classifyingTypeErrors { planner.plan(ast) }
    val rows = planner.render(df, outs, header)
    (rows, planner.updatedGraph.getOrElse(
      throw new IllegalArgumentException("query has no write clauses")))
  }

  /** Run a query ending in CONSTRUCT ... RETURN GRAPH; returns the built
    * graph (reference multiple-graphs support, SURVEY §2.6). */
  def cypherGraph(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): PropertyGraph = {
    val ast = CypherParser.parse(query)
    val planner = new Planner(spark, graph, params, None, graphByName,
      functions.toMap, procedures.toMap)
    planner.plan(ast)
    planner.constructedGraph.getOrElse(
      throw new IllegalArgumentException(
        "query does not end in CONSTRUCT ... RETURN GRAPH"))
  }

  /** CATALOG CREATE GRAPH equivalent: run a graph-returning query and
    * register the result under a name. */
  def createGraph(name: String, source: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): PropertyGraph = {
    val g = cypherGraph(source, query, params)
    store(name, g)
    g
  }

  /** Collect results as Cypher values (rowToCypherMap parity). */
  def cypherValues(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): Seq[graft.values.CypherMap] =
    cypher(graph, query, params).collect().toSeq
      .map(graft.values.CypherValue.rowToCypherMap)

  /** All nodes (optionally label-filtered) as element structs —
    * PropertyGraph.nodes() parity (PropertyGraph.scala:46-117). */
  /** All nodes with the given labels. `exactLabelMatch = true` returns only
    * nodes whose label set equals the requested combination exactly (the
    * reference's `nodes(name, ct, exactLabelMatch = true)`,
    * okapi-api/.../api/graph/PropertyGraph.scala:46-117) — expressed as a
    * size(labels(n)) guard so the whole check stays one Cypher plan. */
  def nodes(graph: PropertyGraph, labels: Seq[String] = Seq.empty,
      exactLabelMatch: Boolean = false): DataFrame = {
    val pat = s"(n${labels.map(":" + _).mkString})"
    if (exactLabelMatch)
      cypher(graph,
        s"MATCH $pat WHERE size(labels(n)) = ${labels.size} RETURN n")
    else cypher(graph, s"MATCH $pat RETURN n")
  }

  /** All relationships (optionally typed) as element structs. */
  def relationships(graph: PropertyGraph,
      relTypes: Seq[String] = Seq.empty): DataFrame = {
    val t = if (relTypes.isEmpty) "" else relTypes.mkString(":", "|", "")
    cypher(graph, s"MATCH ()-[r$t]->() RETURN r")
  }

  /** Raw SQL passthrough (CAPFSession.sql / MorpheusSession.sql:84-86). */
  def sql(query: String): DataFrame = spark.sql(query)

  /** Formatted physical plan of a Cypher query (debug / plan review). */
  def explain(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): String =
    cypher(graph, query, params).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Printable (logical, physical) plans — the reference's
    * CypherResult.plans surface (okapi-api/.../api/graph/
    * CypherResult.scala:74-84 exposes logical + relational). graft's
    * planning collapses into Catalyst, so the analogue is Catalyst's
    * optimized logical plan and the formatted physical plan — the two
    * layers a user reviews when tuning a query. */
  def plans(graph: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): (String, String) = {
    val qe = cypher(graph, query, params).queryExecution
    (qe.optimizedPlan.toString,
      qe.explainString(org.apache.spark.sql.execution.FormattedMode))
  }
}

object GraftSession {
  def local(cores: Int = 32, shufflePartitions: Int = 32): GraftSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new GraftSession(spark)
  }

  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)
}
