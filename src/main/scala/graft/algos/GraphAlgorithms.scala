package graft.algos

import graft.graph.PropertyGraph
import graft.impl.Pin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-graph analytics over the same element-table scans the Cypher
  * planner uses — DataFrame-native iterative algorithms (no RDD/GraphX
  * legacy): each iteration is a keyed join + aggregation that Catalyst/AQE
  * plans like any other, and intermediate state is pinned via [[graft.impl.Pin]]
  * (lazy localCheckpoint locally, fault-tolerant persist on a cluster) to
  * truncate lineage — the standard scale pattern for iterative Spark.
  *
  * Referential integrity: the iterative algorithms derive their working node
  * set from edge endpoints, assuming rel endpoints are a subset of node ids
  * (true of every graph graft's own sources construct). For foreign data
  * where that may not hold, set `spark.graft.algo.validateNodeIds=true` to
  * semi-join edges against the node-id frame up front (one extra pass over
  * the edge list, so opt-in).
  */
object GraphAlgorithms {

  /** (src, dst) edge frame over the requested rel types (all if empty). */
  def edges(graph: PropertyGraph, relTypes: Seq[String] = Seq.empty): DataFrame =
    graph.relScansFor(relTypes).map(_.df.select(
        col(PropertyGraph.SRC).as("src"), col(PropertyGraph.TGT).as("dst")))
      .reduceOption(_.unionByName(_))
      .getOrElse { // no rel table of the requested types: empty edge frame
        val spark = graph.nodeTables.head.df.sparkSession
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
      }

  def nodeIds(graph: PropertyGraph): DataFrame = graph.nodeIdFrame

  /** Opt-in edge validation for graphs without guaranteed referential
    * integrity: drops edges whose endpoints are missing from the node
    * tables, so the iterative algorithms' edge-derived node sets stay a
    * subset of node ids (and pageRank's mass normalization stays aligned
    * with its rank row set). */
  private def validated(e: DataFrame, graph: PropertyGraph): DataFrame = {
    val validate = e.sparkSession.conf
      .getOption("spark.graft.algo.validateNodeIds").exists(_.toBoolean)
    if (!validate) e
    else {
      val ids = nodeIds(graph)
      e.join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
    }
  }

  /** In/out/total degree per node id. Single pass over the edge frame:
    * each edge contributes one (src, out) and one (dst, in) endpoint row
    * and one groupBy counts both directions — vs the naive two-groupBy +
    * full-outer-join shape, this halves the edge scans and shuffles
    * narrow (id, flag) rows once, which is what survives when the edge
    * list is the 100-TB fact table. */
  def degrees(graph: PropertyGraph, relTypes: Seq[String] = Seq.empty): DataFrame = {
    val endpoints = edges(graph, relTypes)
      .select(explode(array(
        struct(col("src").as("id"), lit(1L).as("o"), lit(0L).as("i")),
        struct(col("dst").as("id"), lit(0L).as("o"), lit(1L).as("i")))).as("ep"))
      .select(col("ep.id").as("id"), col("ep.o").as("o"), col("ep.i").as("i"))
    val deg = endpoints.groupBy(col("id"))
      .agg(sum(col("o")).as("out_degree"), sum(col("i")).as("in_degree"))
    nodeIds(graph)
      .join(deg, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** PageRank with damping; returns (id, rank). Each iteration: one join
    * (ranks x edges) + one aggregation; dangling mass redistributed
    * uniformly so ranks sum to the node count.
    *
    * Nodes with no incident edge of the requested types are carried
    * ANALYTICALLY, not iterated: an isolated node receives no link mass, so
    * its rank is the same scalar every round — r_iso(t+1) = (1-d) + d *
    * miss(t)/n. Only the connected subgraph iterates; on a 100-TB document
    * graph where most nodes are isolated for any given rel-type subset this
    * shrinks every per-round join and checkpoint by the isolated fraction. */
  def pageRank(graph: PropertyGraph, iterations: Int = 10,
      damping: Double = 0.85, relTypes: Seq[String] = Seq.empty): DataFrame = {
    // All intermediate state is pinned lazily (Pin: localCheckpoint locally,
    // persist on a cluster): lineage is cut immediately (bounded plans across
    // rounds), blocks are materialized by the next action that reads them.
    val n = nodeIds(graph).count()
    val e = validated(edges(graph, relTypes), graph)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // The src-keyed equi-join already hash-partitions links on src — the
    // partitioning every per-round join needs. Pinning preserves the
    // partitioning, so no iteration ever re-shuffles the edge list (at
    // 100 TB the edge re-shuffle would dominate every round).
    val links = Pin(e.join(outDeg, "src"))
    // Edge endpoints ARE node ids, so the distinct endpoint set IS the
    // connected-node set — no semi-join against the full node table. The
    // distinct also leaves it hash-partitioned on id for the loop's joins.
    val connected = Pin(e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct())
    var isoRank = 1.0
    var ranks = connected.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to iterations) {
      val contribs = links
        .join(ranks, links("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      // `received` is read twice (mass total + rank update): the lazy
      // checkpoint is materialized by the 1-row mass aggregate — ONE job
      // per round (an eager checkpoint + separate aggregate was two; the
      // per-job overhead dominated the whole algorithm).
      val received = Pin(connected.join(contribs, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("contrib"), lit(0.0)).as("contrib")))
      // Total link-transferred mass; the rest (dangling + isolated mass)
      // is spread uniformly.
      val tc = received.agg(coalesce(sum("contrib"), lit(0.0))).head().getDouble(0)
      val missShare = (n - tc) / n
      ranks = Pin(received.select(col("id"),
        (lit(1.0 - damping) +
          lit(damping) * (col("contrib") + lit(missShare))).as("rank")))
      isoRank = (1.0 - damping) + damping * missShare
    }
    // Isolated nodes receive no link mass, so their rank is the closed-form
    // scalar of the last round; returned lazily — the caller's action reads
    // the checkpointed ranks, no extra materialization pass here.
    val isolated = nodeIds(graph).join(ranks.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(isoRank).as("rank"))
    ranks.unionByName(isolated)
  }

  /** Connected components (undirected) by iterative min-id propagation;
    * returns (id, component). Converges in O(diameter) rounds; each round
    * is one join + aggregation and prints no driver-side state beyond the
    * convergence counter. */
  def connectedComponents(graph: PropertyGraph,
      relTypes: Seq[String] = Seq.empty, maxIterations: Int = 20): DataFrame = {
    val e0 = validated(edges(graph, relTypes), graph)
    // Lazy pinning everywhere (see pageRank): lineage cut now, blocks
    // materialized by the first convergence aggregate. The dst repartition
    // is the partitioning the per-round join consumes, so the edge list
    // never re-shuffles inside the loop.
    val und = Pin(e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst"))).distinct().repartition(col("dst")))
    // Isolated nodes are their own component — only nodes incident to an
    // edge participate in min-id propagation, so every round's join and
    // checkpoint scales with the connected subgraph, not the node count.
    // Edge endpoints ARE node ids (the symmetrized src column covers both
    // directions), so no semi-join against the full node table is needed.
    var comp = Pin(und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component")))
    // Convergence via the monotone invariant sum(component): min-id
    // propagation only ever decreases labels, so the sum strictly
    // decreases until the fixpoint — one cheap aggregate per round
    // instead of a full old-vs-new join.
    var prevSum = BigDecimal(-1)
    var curSum = BigDecimal(0)
    var it = 0
    while (prevSum != curSum && it < maxIterations) {
      val neighborMin = und
        .join(comp, und("dst") === comp("id"))
        .select(und("src").as("id"), col("component"))
        .groupBy("id").agg(min("component").as("nbr_min"))
      // Lazy pin: plan truncated immediately (bounded plans across rounds),
      // blocks materialized by the convergence aggregate below — one job per
      // round instead of an eager checkpoint job plus a separate aggregate.
      val next = Pin(comp.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component")))
      prevSum = curSum
      curSum = BigDecimal(next.agg(coalesce(
        sum(col("component").cast(
          org.apache.spark.sql.types.DecimalType(38, 0))),
        lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0))
      comp = next
      it += 1
    }
    // Isolated singletons appended lazily; the caller's action reads the
    // checkpointed comp frame — no extra materialization pass here.
    val isolated = nodeIds(graph).join(comp.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    comp.unionByName(isolated)
  }

  /** Count of triangles (undirected, each counted once). */
  def triangleCount(graph: PropertyGraph,
      relTypes: Seq[String] = Seq.empty): Long = {
    val e0 = edges(graph, relTypes).filter(col("src") =!= col("dst"))
    // canonical orientation: low id -> high id, deduped
    val canon = e0.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().persist()
    val ab = canon.select(col("a"), col("b"))
    val bc = canon.select(col("a").as("b2"), col("b").as("c"))
    val wedges = ab.join(bc, col("b") === col("b2"))
      .select(col("a"), col("b"), col("c"))
    val closing = canon.select(col("a").as("ca"), col("b").as("cb"))
    val n = wedges.join(closing,
      col("a") === col("ca") && col("c") === col("cb")).count()
    canon.unpersist()
    n
  }
}
