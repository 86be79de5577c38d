package graft.sources

import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Filesystem graph source: a graph directory holds one parquet dataset per
  * element table plus a schema.json describing labels/types and column
  * mappings — the Spark-native equivalent of the reference's FSGraphSource
  * (flink-cypher/.../api/io/fs/FSGraphSource.scala:47-146,
  * morpheus-spark-cypher/.../api/io/fs/FSGraphSource.scala) with its JSON
  * schema sidecar (JsonSerialization.scala).
  *
  * Layout:
  *   <dir>/schema.json
  *   <dir>/nodes/<i>/   (parquet)
  *   <dir>/rels/<i>/    (parquet)
  */
object FsGraphSource {

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def store(graph: PropertyGraph, dir: String): Unit = {
    val nodeEntries = graph.nodeDefs.zipWithIndex.map { case (d, i) =>
      d.df.write.mode("overwrite").parquet(s"$dir/nodes/$i")
      s"""{"labels": [${d.labels.toSeq.sorted.map(q).mkString(",")}],
         |"idCol": ${q(d.idCol)}, "idSpace": ${q(d.idSpace)},
         |"properties": {${d.properties.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString(",")}}}"""
        .stripMargin.replace("\n", " ")
    }
    val relEntries = graph.relDefs.zipWithIndex.map { case (d, i) =>
      d.df.write.mode("overwrite").parquet(s"$dir/rels/$i")
      s"""{"type": ${q(d.relType)}, "idCol": ${q(d.idCol)},
         |"srcCol": ${q(d.srcCol)}, "tgtCol": ${q(d.tgtCol)},
         |"idSpace": ${q(d.idSpace)}, "srcSpace": ${q(d.srcSpace)},
         |"tgtSpace": ${q(d.tgtSpace)},
         |"properties": {${d.properties.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString(",")}}}"""
        .stripMargin.replace("\n", " ")
    }
    val json =
      s"""{"nodes": [${nodeEntries.mkString(",\n")}],
         |"rels": [${relEntries.mkString(",\n")}]}""".stripMargin
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/schema.json"), json)
  }

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    val json = Files.readString(Paths.get(s"$dir/schema.json"))
    val parsed = MiniJson.parse(json).asInstanceOf[Map[String, Any]]
    val nodes = parsed("nodes").asInstanceOf[Seq[Any]].zipWithIndex.map {
      case (e0, i) =>
        val e = e0.asInstanceOf[Map[String, Any]]
        NodeTableDef(
          e("labels").asInstanceOf[Seq[Any]].map(_.toString).toSet,
          spark.read.parquet(s"$dir/nodes/$i"),
          e("idCol").toString,
          e("properties").asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> v.toString },
          e("idSpace").toString)
    }
    val rels = parsed("rels").asInstanceOf[Seq[Any]].zipWithIndex.map {
      case (e0, i) =>
        val e = e0.asInstanceOf[Map[String, Any]]
        RelTableDef(
          e("type").toString,
          spark.read.parquet(s"$dir/rels/$i"),
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
