package graft.values

import org.apache.spark.sql.Row

/** Cypher value ADT, mirroring the reference's CypherValue
  * (okapi-api/.../api/value/CypherValue.scala:139-535). Values only
  * materialize at the API boundary (collect) — the engine works on
  * DataFrames throughout, like CAPFRecords.toCypherMaps
  * (flink-cypher/.../impl/CAPFRecords.scala:142).
  */
sealed trait CypherValue {
  def value: Any
  def isNull: Boolean = this == CypherNull
}

case object CypherNull extends CypherValue { def value: Any = null }
case class CypherString(value: String) extends CypherValue
case class CypherInteger(value: Long) extends CypherValue
case class CypherFloat(value: Double) extends CypherValue
case class CypherBoolean(value: Boolean) extends CypherValue
case class CypherDate(value: java.sql.Date) extends CypherValue
case class CypherLocalDateTime(value: java.sql.Timestamp) extends CypherValue
case class CypherList(items: Seq[CypherValue]) extends CypherValue {
  def value: Any = items.map(_.value)
}
case class CypherMap(properties: Map[String, CypherValue]) extends CypherValue {
  def value: Any = properties.view.mapValues(_.value).toMap
  def apply(key: String): CypherValue = properties.getOrElse(key, CypherNull)
}
case class CypherNode(id: Long, labels: Set[String],
    properties: CypherMap) extends CypherValue {
  def value: Any = this
}
case class CypherRelationship(id: Long, start: Long, end: Long,
    relType: String, properties: CypherMap) extends CypherValue {
  def value: Any = this
}

object CypherValue {
  /** Convert a Spark value (from Row) to a CypherValue; element structs
    * produced by the renderer become nodes/relationships. */
  def fromSpark(v: Any): CypherValue = v match {
    case null => CypherNull
    case s: String => CypherString(s)
    case i: Int => CypherInteger(i.toLong)
    case l: Long => CypherInteger(l)
    case d: Double => CypherFloat(d)
    case f: Float => CypherFloat(f.toDouble)
    case b: Boolean => CypherBoolean(b)
    case d: java.sql.Date => CypherDate(d)
    case t: java.sql.Timestamp => CypherLocalDateTime(t)
    case s: Seq[_] => CypherList(s.map(fromSpark))
    case r: Row =>
      val names = r.schema.fieldNames.toSeq
      if (names.contains("_id") && names.contains("_labels")) {
        CypherNode(r.getAs[Long]("_id"),
          r.getAs[Seq[String]]("_labels").toSet, props(r))
      } else if (names.contains("_id") && names.contains("_type")) {
        CypherRelationship(r.getAs[Long]("_id"), r.getAs[Long]("_src"),
          r.getAs[Long]("_tgt"), r.getAs[String]("_type"), props(r))
      } else {
        CypherMap(names.map(n =>
          n -> fromSpark(r.getAs[Any](n))).toMap)
      }
    case other => CypherString(other.toString)
  }

  private def props(r: Row): CypherMap =
    if (r.schema.fieldNames.contains("_properties")) {
      val p = r.getAs[Row]("_properties")
      if (p == null) CypherMap(Map.empty)
      else CypherMap(p.schema.fieldNames.map(n =>
        n -> fromSpark(p.getAs[Any](n))).toMap
        .filterNot(_._2.isNull))
    } else CypherMap(Map.empty)

  /** Row -> map of column name to CypherValue (rowToCypherMap parity). */
  def rowToCypherMap(r: Row): CypherMap =
    CypherMap(r.schema.fieldNames.map(n =>
      n -> fromSpark(r.getAs[Any](n))).toMap)
}
