package graft.values

import org.apache.spark.sql.Row
import scala.reflect.ClassTag

/** Cypher value ADT, mirroring the reference's CypherValue surface
  * (okapi-api/.../api/value/CypherValue.scala:139-535): construction from
  * arbitrary Scala values, recursive `unwrap`, null-safe `getValue`, safe
  * `as[V]` casting, and the TCK-format `toCypherString` rendering. Values
  * only materialize at the API boundary (collect) — the engine works on
  * DataFrames throughout, like CAPFRecords.toCypherMaps
  * (flink-cypher/.../impl/CAPFRecords.scala:142).
  */
sealed trait CypherValue {
  def value: Any
  def isNull: Boolean = this == CypherNull

  /** Null-safe wrapped value. */
  def getValue: Option[Any] = Option(value)

  /** Recursively unwrap into plain Scala structures (lists/maps of raw
    * values rather than CypherValues). */
  def unwrap: Any = this match {
    case CypherNull => null
    case CypherList(items) => items.map(_.unwrap)
    case CypherMap(props) => props.view.mapValues(_.unwrap).toMap
    case n: CypherNode => n
    case r: CypherRelationship => r
    case p: CypherPath => p
    case other => other.value
  }

  /** Safe cast: Some when this (or its wrapped value) is a V. */
  def as[V: ClassTag]: Option[V] = this match {
    case v: V => Some(v)
    case _ => value match {
      case v: V => Some(v)
      case _ => None
    }
  }

  /** Casting accessor; throws on mismatch. */
  def cast[V: ClassTag]: V = as[V].getOrElse(
    throw new IllegalArgumentException(
      s"cannot cast $value to ${implicitly[ClassTag[V]].runtimeClass.getSimpleName}"))

  /** TCK-style Cypher string form (the format the openCypher TCK's expected
    * results use: quoted strings, `[:TYPE {...}]` rels, `(:L {...})` nodes). */
  def toCypherString: String = this match {
    case CypherNull => "null"
    case CypherString(s) => s"'${CypherValue.escape(s)}'"
    case CypherList(items) => items.map(_.toCypherString).mkString("[", ", ", "]")
    case CypherMap(props) =>
      props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k: ${v.toCypherString}" }
        .mkString("{", ", ", "}")
    case CypherNode(_, labels, props) =>
      val ls = if (labels.isEmpty) "" else labels.toSeq.sorted.mkString(":", ":", "")
      val ps = if (props.properties.isEmpty) "" else props.toCypherString
      Seq(ls, ps).filter(_.nonEmpty).mkString("(", " ", ")")
    case CypherRelationship(_, _, _, relType, props) =>
      val ps = if (props.properties.isEmpty) "" else s" ${props.toCypherString}"
      s"[:$relType$ps]"
    case CypherPath(nodes, rels) =>
      s"<path nodes=${nodes.mkString("[", ", ", "]")} rels=${rels.mkString("[", ", ", "]")}>"
    case CypherFloat(d) =>
      if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
    case d: CypherDuration => d.toIso8601
    case CypherBigDecimal(b) => b.toString
    case other => String.valueOf(other.value)
  }

  /** True when this value is null or (recursively) contains one. */
  def isOrContainsNull: Boolean = isNull || (this match {
    case CypherList(items) => items.exists(_.isOrContainsNull)
    case CypherMap(props) => props.valuesIterator.exists(_.isOrContainsNull)
    case _ => false
  })
}

case object CypherNull extends CypherValue { def value: Any = null }
case class CypherString(value: String) extends CypherValue
case class CypherInteger(value: Long) extends CypherValue
case class CypherFloat(value: Double) extends CypherValue
case class CypherBigDecimal(value: BigDecimal) extends CypherValue
case class CypherBoolean(value: Boolean) extends CypherValue
case class CypherDate(value: java.sql.Date) extends CypherValue
case class CypherLocalDateTime(value: java.sql.Timestamp) extends CypherValue
/** Calendar duration, the engine's (months, days, micros) normal form. */
case class CypherDuration(months: Long, days: Long, micros: Long)
    extends CypherValue {
  def value: Any = this

  /** ISO-8601 duration form ('P1M2DT3.000000004S'), the TCK's rendering:
    * months/days verbatim (calendar components don't normalize into each
    * other), micros split into H/M/S. */
  def toIso8601: String = {
    val sb = new StringBuilder("P")
    if (months != 0) sb.append(months).append('M')
    if (days != 0) sb.append(days).append('D')
    val negT = micros < 0
    val absU = math.abs(micros)
    val h = absU / 3600000000L
    val m = (absU / 60000000L) % 60
    val s = (absU / 1000000L) % 60
    val frac = absU % 1000000L
    if (absU != 0 || (months == 0 && days == 0)) {
      sb.append('T')
      def part(v: Long, unit: Char): Unit =
        if (v != 0) sb.append(if (negT) -v else v).append(unit)
      part(h, 'H'); part(m, 'M')
      if (s != 0 || frac != 0 || (h == 0 && m == 0)) {
        if (negT && (s != 0 || frac != 0)) sb.append('-')
        sb.append(s)
        if (frac != 0) sb.append(f".$frac%06d".reverse.dropWhile(_ == '0').reverse)
        sb.append('S')
      }
    }
    sb.toString
  }
}
case class CypherList(items: Seq[CypherValue]) extends CypherValue {
  def value: Any = items.map(_.value)
}
case class CypherMap(properties: Map[String, CypherValue]) extends CypherValue {
  def value: Any = properties.view.mapValues(_.value).toMap
  def apply(key: String): CypherValue = properties.getOrElse(key, CypherNull)
  def keys: Set[String] = properties.keySet
  def isEmpty: Boolean = properties.isEmpty
}
object CypherMap {
  val empty: CypherMap = CypherMap(Map.empty[String, CypherValue])
  /** Build from raw Scala values: CypherMap("a" -> 1, "b" -> "x"). */
  def apply(pairs: (String, Any)*): CypherMap =
    CypherMap(pairs.map { case (k, v) => k -> CypherValue(v) }.toMap)
}
case class CypherNode(id: Long, labels: Set[String],
    properties: CypherMap) extends CypherValue {
  def value: Any = this
}
case class CypherRelationship(id: Long, start: Long, end: Long,
    relType: String, properties: CypherMap) extends CypherValue {
  def value: Any = this
}
/** A path as the engine renders it: node and relationship id sequences. */
case class CypherPath(nodeIds: Seq[Long], relIds: Seq[Long])
    extends CypherValue {
  def value: Any = this
  def length: Int = relIds.size
}

object CypherValue {
  /** Convert an arbitrary Scala/Java value to a CypherValue. */
  def apply(v: Any): CypherValue = v match {
    case null => CypherNull
    case cv: CypherValue => cv
    case s: String => CypherString(s)
    case i: Byte => CypherInteger(i.toLong)
    case i: Short => CypherInteger(i.toLong)
    case i: Int => CypherInteger(i.toLong)
    case l: Long => CypherInteger(l)
    case d: Double => CypherFloat(d)
    case f: Float => CypherFloat(f.toDouble)
    case d: BigDecimal => CypherBigDecimal(d)
    case d: java.math.BigDecimal => CypherBigDecimal(BigDecimal(d))
    case b: Boolean => CypherBoolean(b)
    case d: java.sql.Date => CypherDate(d)
    case t: java.sql.Timestamp => CypherLocalDateTime(t)
    case d: java.time.LocalDate => CypherDate(java.sql.Date.valueOf(d))
    case t: java.time.LocalDateTime =>
      CypherLocalDateTime(java.sql.Timestamp.valueOf(t))
    case s: Seq[_] => CypherList(s.map(apply))
    case a: Array[_] => CypherList(a.toSeq.map(apply))
    case m: Map[_, _] =>
      CypherMap(m.map { case (k, x) => k.toString -> apply(x) })
    case r: Row => fromSpark(r)
    case other => CypherString(other.toString)
  }

  /** Convert a Spark value (from Row) to a CypherValue; element structs
    * produced by the renderer become nodes/relationships/paths/durations. */
  def fromSpark(v: Any): CypherValue = v match {
    case null => CypherNull
    case s: String => CypherString(s)
    case i: Int => CypherInteger(i.toLong)
    case l: Long => CypherInteger(l)
    case d: Double => CypherFloat(d)
    case f: Float => CypherFloat(f.toDouble)
    case d: java.math.BigDecimal => CypherBigDecimal(BigDecimal(d))
    case b: Boolean => CypherBoolean(b)
    case d: java.sql.Date => CypherDate(d)
    case t: java.sql.Timestamp => CypherLocalDateTime(t)
    case s: Seq[_] => CypherList(s.map(fromSpark))
    case m: scala.collection.Map[_, _] =>
      CypherMap(m.map { case (k, x) => k.toString -> fromSpark(x) }.toMap)
    case r: Row =>
      val names = r.schema.fieldNames.toSeq
      if (names.contains("_id") && names.contains("_labels")) {
        CypherNode(r.getAs[Long]("_id"),
          r.getAs[scala.collection.Seq[String]]("_labels").toSet, props(r))
      } else if (names.contains("_id") && names.contains("_type")) {
        CypherRelationship(r.getAs[Long]("_id"), r.getAs[Long]("_src"),
          r.getAs[Long]("_tgt"), r.getAs[String]("_type"), props(r))
      } else if (names == Seq("nodes", "rels")) {
        // path struct from the renderer / bindPaths
        val ns = Option(r.getAs[scala.collection.Seq[Long]]("nodes"))
          .map(_.toSeq).getOrElse(Seq.empty)
        val rs = Option(r.getAs[scala.collection.Seq[Long]]("rels"))
          .map(_.toSeq).getOrElse(Seq.empty)
        CypherPath(ns, rs)
      } else if (names == Seq("months", "days", "micros")) {
        CypherDuration(r.getAs[Long]("months"), r.getAs[Long]("days"),
          r.getAs[Long]("micros"))
      } else {
        CypherMap(names.map(n =>
          n -> fromSpark(r.getAs[Any](n))).toMap)
      }
    case other => CypherString(other.toString)
  }

  private def props(r: Row): CypherMap =
    if (r.schema.fieldNames.contains("_properties")) {
      val p = r.getAs[Row]("_properties")
      if (p == null) CypherMap.empty
      else CypherMap(p.schema.fieldNames.map(n =>
        n -> fromSpark(p.getAs[Any](n))).toMap
        .filterNot(_._2.isNull))
    } else CypherMap.empty

  /** Row -> map of column name to CypherValue (rowToCypherMap parity). */
  def rowToCypherMap(r: Row): CypherMap =
    CypherMap(r.schema.fieldNames.map(n =>
      n -> fromSpark(r.getAs[Any](n))).toMap)

  private[values] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")
}
