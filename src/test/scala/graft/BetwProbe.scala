package graft

import graft.impl.Pin
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch A/B probe for the betweenness loop restructure (VERDICT r13
  * #1). Replicates the algorithm body inline so structural variants can
  * be compared without touching the library. Not part of the surface. */
object BetwProbe {

  var spark: SparkSession = _
  @volatile var jobs = 0

  def phase(name: String)(f: => Unit): Unit = {
    val j0 = jobs; val t0 = System.nanoTime()
    f
    println(f"[phase]   $name%-20s jobs=${jobs - j0}%4d  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  /** V0: current library shape — visited pinned per round, next.count(). */
  def v0(e: DataFrame, src0: DataFrame, directed: Boolean = false,
      maxDepth: Int = 50): DataFrame = {
    var levels = Vector(Pin(src0.select(col("s"), col("s").as("v"),
      lit(1.0).as("sigma"))))
    var visited = levels.head.select(col("s"), col("v"))
    var depth = 0
    var go = true
    phase("forward") {
      while (go && depth < maxDepth) {
        val next = Pin(levels.last
          .join(e, col("v") === col("src"))
          .select(col("s"), col("dst").as("_v2"), col("sigma"))
          .join(visited.select(col("s"), col("v").as("_v2")),
            Seq("s", "_v2"), "left_anti")
          .groupBy(col("s"), col("_v2"))
          .agg(sum(col("sigma")).as("sigma"))
          .select(col("s"), col("_v2").as("v"), col("sigma")))
        if (next.count() == 0L) go = false
        else {
          levels = levels :+ next
          visited = Pin(visited.unionByName(next.select(col("s"), col("v"))))
          depth += 1
        }
      }
    }
    backward(e, src0, levels, directed)
  }

  /** V1: visited is a LAZY union of the pinned levels (no per-round
    * visited checkpoint write); convergence count folded to an agg on the
    * pinned frame. */
  def v1(e: DataFrame, src0: DataFrame, directed: Boolean = false,
      maxDepth: Int = 50): DataFrame = {
    var levels = Vector(Pin(src0.select(col("s"), col("s").as("v"),
      lit(1.0).as("sigma"))))
    var depth = 0
    var go = true
    phase("forward") {
      while (go && depth < maxDepth) {
        val visited = levels.map(_.select(col("s"), col("v").as("_v2")))
          .reduce(_.unionByName(_))
        val next = Pin(levels.last
          .join(e, col("v") === col("src"))
          .select(col("s"), col("dst").as("_v2"), col("sigma"))
          .join(visited, Seq("s", "_v2"), "left_anti")
          .groupBy(col("s"), col("_v2"))
          .agg(sum(col("sigma")).as("sigma"))
          .select(col("s"), col("_v2").as("v"), col("sigma")))
        if (next.agg(count(lit(1))).head().getLong(0) == 0L) go = false
        else { levels = levels :+ next; depth += 1 }
      }
    }
    backward(e, src0, levels, directed)
  }

  /** V2: V1 forward + restructured backward — the per-level left_outer
    * zero-fill is folded into the NEXT level's `upper` join (coalesce at
    * use site), so each level pins the smaller inner-join contrib frame
    * and drops one join + one exchange per level. */
  def v2(e: DataFrame, src0: DataFrame, directed: Boolean = false,
      maxDepth: Int = 50): DataFrame = {
    var levels = Vector(Pin(src0.select(col("s"), col("s").as("v"),
      lit(1.0).as("sigma"))))
    var depth = 0
    var go = true
    phase("forward") {
      while (go && depth < maxDepth) {
        val visited = levels.map(_.select(col("s"), col("v").as("_v2")))
          .reduce(_.unionByName(_))
        val next = Pin(levels.last
          .join(e, col("v") === col("src"))
          .select(col("s"), col("dst").as("_v2"), col("sigma"))
          .join(visited, Seq("s", "_v2"), "left_anti")
          .groupBy(col("s"), col("_v2"))
          .agg(sum(col("sigma")).as("sigma"))
          .select(col("s"), col("_v2").as("v"), col("sigma")))
        if (next.agg(count(lit(1))).head().getLong(0) == 0L) go = false
        else { levels = levels :+ next; depth += 1 }
      }
    }
    var out: DataFrame = null
    phase("backward") {
      var deltas = Vector.empty[DataFrame]
      var contribAbove: DataFrame = null // delta of level k+1, 0-rows absent
      for (k <- (levels.size - 2) to 0 by -1) {
        val upper =
          if (contribAbove == null)
            levels(k + 1).select(col("s"), col("v").as("_w"),
              col("sigma").as("_sw"), lit(0.0).as("_dw"))
          else levels(k + 1)
            .join(contribAbove.withColumnRenamed("delta", "_d"),
              Seq("s", "v"), "left_outer")
            .select(col("s"), col("v").as("_w"), col("sigma").as("_sw"),
              coalesce(col("_d"), lit(0.0)).as("_dw"))
        val contrib = levels(k)
          .join(e, col("v") === col("src"))
          .select(col("s"), col("v"), col("sigma"), col("dst").as("_w"))
          .join(upper, Seq("s", "_w"))
          .groupBy(col("s"), col("v"))
          .agg(sum(col("sigma") / col("_sw") * (lit(1.0) + col("_dw")))
            .as("delta"))
        contribAbove = Pin(contrib)
        deltas = deltas :+ contribAbove
      }
      val bc: DataFrame =
        if (deltas.isEmpty) null
        else deltas.map(_.filter(col("v") =!= col("s"))
            .select(col("v"), col("delta").as("_b")))
          .reduce(_.unionByName(_))
          .groupBy(col("v")).agg(sum(col("_b")).as("_b"))
      val scale = if (directed) 1.0 else 0.5
      val allNodes = e.select(col("src").as("v"))
        .unionByName(e.select(col("dst").as("v")))
        .unionByName(src0.select(col("s").as("v")))
        .distinct()
      val scored = if (bc == null) allNodes.select(col("v"), lit(0.0).as("_b"))
        else allNodes.join(bc, Seq("v"), "left_outer")
          .select(col("v"), coalesce(col("_b"), lit(0.0)).as("_b"))
      out = scored.select(col("v").as("id"),
        (col("_b") * scale).as("betweenness"))
      out.count()
    }
    out
  }

  /** Shared backward sweep (identical to the library). */
  def backward(e: DataFrame, src0: DataFrame, levels: Vector[DataFrame],
      directed: Boolean): DataFrame = {
    var out: DataFrame = null
    phase("backward") {
      var deltas = Vector.empty[DataFrame]
      var delta = levels.last.select(col("s"), col("v"), lit(0.0).as("delta"))
      for (k <- (levels.size - 2) to 0 by -1) {
        val upper = delta
          .join(levels(k + 1), Seq("s", "v"))
          .select(col("s"), col("v").as("_w"), col("sigma").as("_sw"),
            col("delta").as("_dw"))
        val contrib = levels(k)
          .join(e, col("v") === col("src"))
          .select(col("s"), col("v"), col("sigma"), col("dst").as("_w"))
          .join(upper, Seq("s", "_w"))
          .groupBy(col("s"), col("v"), col("sigma"))
          .agg(sum(col("sigma") / col("_sw") * (lit(1.0) + col("_dw")))
            .as("_acc"))
          .select(col("s"), col("v"), col("_acc").as("delta"))
        delta = Pin(levels(k).select(col("s"), col("v"))
          .join(contrib, Seq("s", "v"), "left_outer")
          .select(col("s"), col("v"), coalesce(col("delta"), lit(0.0)).as("delta")))
        deltas = deltas :+ delta
      }
      val bc: DataFrame =
        if (deltas.isEmpty) null
        else deltas.map(_.filter(col("v") =!= col("s"))
            .select(col("v"), col("delta").as("_b")))
          .reduce(_.unionByName(_))
          .groupBy(col("v")).agg(sum(col("_b")).as("_b"))
      val scale = if (directed) 1.0 else 0.5
      val allNodes = e.select(col("src").as("v"))
        .unionByName(e.select(col("dst").as("v")))
        .unionByName(src0.select(col("s").as("v")))
        .distinct()
      val scored = if (bc == null) allNodes.select(col("v"), lit(0.0).as("_b"))
        else allNodes.join(bc, Seq("v"), "left_outer")
          .select(col("v"), coalesce(col("_b"), lit(0.0)).as("_b"))
      out = scored.select(col("v").as("id"), (col("_b") * scale).as("betweenness"))
      out.count()
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    })

    val scale = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(1)
    val eRaw = graft.bench.ScaleCheck.syntheticEdges(spark, scale)
    val base = eRaw.select(col("src").cast(LongType).as("src"),
      col("dst").cast(LongType).as("dst"))
    val sym = base.unionByName(base.select(col("dst").as("src"),
      col("src").as("dst")))
    val e = Pin(sym.distinct().repartition(col("src")))
    e.count()
    val src0 = Pin(spark.range(8).select((col("id") * 7919L).as("s")).distinct())
    src0.count()

    val all: Map[String, () => DataFrame] = Map(
      "v0" -> (() => v0(e, src0)),
      "v1" -> (() => v1(e, src0)),
      "v2" -> (() => v2(e, src0)))
    val picked = args.filter(all.contains)
    val variants: Seq[(String, () => DataFrame)] =
      (if (picked.nonEmpty) picked.toSeq else Seq("v0", "v1", "v2"))
        .map(n => n -> all(n))
    val order = if (args.contains("rev")) variants.reverse else variants
    val passes = args.collectFirst { case a if a.startsWith("p") &&
      a.drop(1).forall(_.isDigit) => a.drop(1).toInt }.getOrElse(3)
    // alternating passes; first pass warms codegen
    for (round <- 1 to passes; (name, f) <- order) {
      val j0 = jobs; val t0 = System.nanoTime()
      val n = f().count()
      println(f"[betw] $name pass$round  total=${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs=${jobs - j0}%4d  rows=$n")
    }
    spark.stop()
  }
}
