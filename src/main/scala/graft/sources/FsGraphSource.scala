package graft.sources

import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Filesystem graph source: a graph directory holds one dataset per element
  * table plus a schema.json describing labels/types, column mappings, the
  * storage format, and each table's Spark schema — the Spark-native
  * equivalent of the reference's FSGraphSource
  * (flink-cypher/.../api/io/fs/FSGraphSource.scala:47-146,
  * morpheus-spark-cypher/.../api/io/fs/FSGraphSource.scala) with its JSON
  * schema sidecar (JsonSerialization.scala).
  *
  * Formats (reference StorageFormat.scala:33-45): parquet (default), orc,
  * csv, json. The per-table Spark schema recorded in the sidecar is applied
  * on read, so type-erasing formats (csv/json) round-trip exactly and no
  * format pays a schema-inference pass. Avro is omitted: the spark-avro
  * datasource module does not ship in this Spark distribution.
  *
  * Layout:
  *   <dir>/schema.json
  *   <dir>/nodes/<i>/   (data files in the chosen format)
  *   <dir>/rels/<i>/
  */
object FsGraphSource {

  val SupportedFormats: Set[String] = Set("parquet", "orc", "csv", "json")

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def writeTable(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    // CSV needs a header to keep column order human-debuggable; types come
    // back from the sidecar schema, not from inference.
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  private def readTable(spark: SparkSession, path: String, format: String,
      schema: Option[StructType]): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.map(r.schema).getOrElse(r)
    (if (format == "csv") withSchema.option("header", "true") else withSchema)
      .load(path)
  }

  def store(graph: PropertyGraph, dir: String, format: String = "parquet"): Unit = {
    require(SupportedFormats(format),
      s"unsupported storage format '$format' (supported: ${SupportedFormats.mkString(", ")})")
    val nodeEntries = graph.nodeDefs.zipWithIndex.map { case (d, i) =>
      writeTable(d.df, s"$dir/nodes/$i", format)
      s"""{"labels": [${d.labels.toSeq.sorted.map(q).mkString(",")}],
         |"idCol": ${q(d.idCol)}, "idSpace": ${q(d.idSpace)},
         |"properties": {${d.properties.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString(",")}},
         |"sparkSchema": ${q(d.df.schema.json)}}"""
        .stripMargin.replace("\n", " ")
    }
    val relEntries = graph.relDefs.zipWithIndex.map { case (d, i) =>
      writeTable(d.df, s"$dir/rels/$i", format)
      s"""{"type": ${q(d.relType)}, "idCol": ${q(d.idCol)},
         |"srcCol": ${q(d.srcCol)}, "tgtCol": ${q(d.tgtCol)},
         |"idSpace": ${q(d.idSpace)}, "srcSpace": ${q(d.srcSpace)},
         |"tgtSpace": ${q(d.tgtSpace)},
         |"properties": {${d.properties.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString(",")}},
         |"sparkSchema": ${q(d.df.schema.json)}}"""
        .stripMargin.replace("\n", " ")
    }
    val json =
      s"""{"format": ${q(format)},
         |"nodes": [${nodeEntries.mkString(",\n")}],
         |"rels": [${relEntries.mkString(",\n")}]}""".stripMargin
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/schema.json"), json)
  }

  // ------------------------------------------------------------- bucketed
  /** Bucketed storage for co-located joins: each CANONICAL element table
    * (pre-tagged `_id` / `_src` ids) is written as a Spark bucketed table —
    * nodes clustered by `_id`, relationships by `_src`, all with the same
    * bucket count. An expand join `rel._src = node._id` over two such scans
    * is already hash-partitioned on its keys on both sides, so Catalyst
    * plans it WITHOUT a shuffle — the bucketing-for-co-located-joins story
    * a 100 TB deployment relies on (BucketedSourceSpec pins the plan shape;
    * the reverse-expand join on `_tgt` still exchanges the rel side, by
    * design: one clustering column per table).
    *
    * Bucket metadata lives in the session catalog; loading in a NEW session
    * re-registers each table as an external bucketed table over the same
    * files (CREATE TABLE ... CLUSTERED BY ... LOCATION), so co-location
    * survives restarts. */
  def storeBucketed(graph: PropertyGraph, dir: String,
      buckets: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.graph.PropertyGraph.{ID, SRC, TGT, propCol}
    def tbl(kind: String, i: Int) =
      s"graft_bkt_${Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))}_$kind$i"
    val nodeEntries = graph.nodeTables.zipWithIndex.map { case (t, i) =>
      val cols = col(ID) +: t.propTypes.keys.toSeq.sorted.map(k => col(propCol(k)))
      val df = t.df.select(cols: _*)
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, ID).sortBy(ID)
        .option("path", s"$dir/nodes/$i")
        .saveAsTable(tbl("n", i))
      s"""{"labels": [${t.labels.toSeq.sorted.map(q).mkString(",")}],
         |"idCol": ${q(ID)}, "idSpace": ${q("!fs")},
         |"properties": {${t.propTypes.keys.toSeq.sorted
            .map(k => s"${q(k)}: ${q(propCol(k))}").mkString(",")}},
         |"sparkSchema": ${q(df.schema.json)}}"""
        .stripMargin.replace("\n", " ")
    }
    val relEntries = graph.relTables.zipWithIndex.map { case (t, i) =>
      val cols = Seq(col(ID), col(SRC), col(TGT)) ++
        t.propTypes.keys.toSeq.sorted.map(k => col(propCol(k)))
      val df = t.df.select(cols: _*)
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, SRC).sortBy(SRC)
        .option("path", s"$dir/rels/$i")
        .saveAsTable(tbl("r", i))
      s"""{"type": ${q(t.relType)}, "idCol": ${q(ID)},
         |"srcCol": ${q(SRC)}, "tgtCol": ${q(TGT)},
         |"idSpace": ${q("!fs")}, "srcSpace": ${q("!fs")},
         |"tgtSpace": ${q("!fs")},
         |"properties": {${t.propTypes.keys.toSeq.sorted
            .map(k => s"${q(k)}: ${q(propCol(k))}").mkString(",")}},
         |"sparkSchema": ${q(df.schema.json)}}"""
        .stripMargin.replace("\n", " ")
    }
    val json =
      s"""{"format": ${q("parquet")}, "bucketed": true, "buckets": $buckets,
         |"nodes": [${nodeEntries.mkString(",\n")}],
         |"rels": [${relEntries.mkString(",\n")}]}""".stripMargin
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/schema.json"), json)
  }

  /** Read one bucketed table, re-registering it in the catalog when absent
    * (fresh session): an external bucketed table over the stored files. */
  private def readBucketed(spark: SparkSession, dir: String, kind: String,
      i: Int, schema: StructType, clusterCol: String, buckets: Int): DataFrame = {
    val name =
      s"graft_bkt_${Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))}_$kind$i"
    if (!spark.catalog.tableExists(name)) {
      val loc = Paths.get(s"$dir/${if (kind == "n") "nodes" else "rels"}/$i")
        .toAbsolutePath.toUri.toString
      spark.sql(
        s"""CREATE TABLE $name (${schema.toDDL}) USING PARQUET
           |CLUSTERED BY ($clusterCol) SORTED BY ($clusterCol)
           |INTO $buckets BUCKETS
           |LOCATION '$loc'""".stripMargin)
    }
    spark.table(name)
  }

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    val json = Files.readString(Paths.get(s"$dir/schema.json"))
    val parsed = MiniJson.parse(json).asInstanceOf[Map[String, Any]]
    // Sidecars written before the format field default to parquet.
    val format = parsed.get("format").map(_.toString).getOrElse("parquet")
    val bucketed = parsed.get("bucketed").contains(true)
    val buckets = parsed.get("buckets").map(_.toString.toInt).getOrElse(0)
    def tableSchema(e: Map[String, Any]): Option[StructType] =
      e.get("sparkSchema").map(j =>
        DataType.fromJson(j.toString).asInstanceOf[StructType])
    val nodes = parsed("nodes").asInstanceOf[Seq[Any]].zipWithIndex.map {
      case (e0, i) =>
        val e = e0.asInstanceOf[Map[String, Any]]
        val df =
          if (bucketed) readBucketed(spark, dir, "n", i,
            tableSchema(e).get, e("idCol").toString, buckets)
          else readTable(spark, s"$dir/nodes/$i", format, tableSchema(e))
        NodeTableDef(
          e("labels").asInstanceOf[Seq[Any]].map(_.toString).toSet,
          df,
          e("idCol").toString,
          e("properties").asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> v.toString },
          e("idSpace").toString)
    }
    val rels = parsed("rels").asInstanceOf[Seq[Any]].zipWithIndex.map {
      case (e0, i) =>
        val e = e0.asInstanceOf[Map[String, Any]]
        val df =
          if (bucketed) readBucketed(spark, dir, "r", i,
            tableSchema(e).get, e("srcCol").toString, buckets)
          else readTable(spark, s"$dir/rels/$i", format, tableSchema(e))
        RelTableDef(
          e("type").toString,
          df,
          e("idCol").toString, e("srcCol").toString, e("tgtCol").toString,
          e("properties").asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> v.toString },
          e("idSpace").toString, e("srcSpace").toString, e("tgtSpace").toString)
    }
    PropertyGraph(nodes, rels)
  }
}

/** Minimal JSON parser (objects/arrays/strings/numbers/bools/null) — keeps
  * the zero-dependency constraint. */
object MiniJson {
  def parse(s: String): Any = new P(s).value()

  private class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def value(): Any = {
      ws()
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ => num()
      }
    }
    def obj(): Map[String, Any] = {
      i += 1; ws()
      val b = Map.newBuilder[String, Any]
      if (s(i) == '}') { i += 1; return b.result() }
      while (true) {
        ws()
        val k = str()
        ws(); require(s(i) == ':'); i += 1
        b += (k -> value())
        ws()
        if (s(i) == ',') i += 1
        else { require(s(i) == '}'); i += 1; return b.result() }
      }
      b.result()
    }
    def arr(): Seq[Any] = {
      i += 1; ws()
      val b = Seq.newBuilder[Any]
      if (s(i) == ']') { i += 1; return b.result() }
      while (true) {
        b += value()
        ws()
        if (s(i) == ',') i += 1
        else { require(s(i) == ']'); i += 1; return b.result() }
      }
      b.result()
    }
    def str(): String = {
      require(s(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          sb += (s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' => val c = Integer.parseInt(s.substring(i + 1, i + 5), 16)
              i += 4; c.toChar
            case c => c
          })
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    def num(): Any = {
      val st = i
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      val t = s.substring(st, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble else t.toLong
    }
  }
}
