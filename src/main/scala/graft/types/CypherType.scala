package graft.types

import org.apache.spark.sql.types._

/** Cypher type lattice with meet/join/subtype, mirroring the reference's
  * CypherType (okapi-api/.../api/types/CypherType.scala:32-160) with
  * nullability-as-union, mapped onto Spark SQL types per the reference's own
  * Spark conversion table
  * (morpheus-spark-cypher/.../impl/convert/SparkConversions.scala:54-75).
  */
sealed trait CypherType {
  def nullable: Boolean

  /** Least upper bound (union). */
  def join(other: CypherType): CypherType = (this, other) match {
    case (a, b) if a == b => a
    case (CTNull, b) => b.asNullable
    case (a, CTNull) => a.asNullable
    case (CTVoid, b) => b
    case (a, CTVoid) => a
    case (CTInteger, CTFloat) | (CTFloat, CTInteger) => CTNumber
    case (CTNumber, CTInteger | CTFloat) | (CTInteger | CTFloat, CTNumber) =>
      CTNumber
    case (a: CTList, b: CTList) => CTList(a.inner.join(b.inner),
      a.nullable || b.nullable)
    case (a: CTNode, b: CTNode) =>
      CTNode(a.labels.intersect(b.labels), a.nullable || b.nullable)
    case (a: CTRelationship, b: CTRelationship) =>
      CTRelationship(a.types.union(b.types), a.nullable || b.nullable)
    case (a, b) if a.withoutNull == b.withoutNull =>
      if (a.nullable || b.nullable) a.asNullable else a
    case _ => if (nullable || other.nullable) CTAny.asNullable else CTAny
  }

  /** Greatest lower bound (intersection). */
  def meet(other: CypherType): CypherType = (this, other) match {
    case (a, b) if a == b => a
    case (CTAny, b) => b
    case (a, CTAny) => a
    case (CTNumber, b @ (CTInteger | CTFloat)) => b
    case (a @ (CTInteger | CTFloat), CTNumber) => a
    case (a: CTNode, b: CTNode) =>
      CTNode(a.labels.union(b.labels), a.nullable && b.nullable)
    case _ => CTVoid
  }

  def subTypeOf(other: CypherType): Boolean = this.join(other) == other

  def asNullable: CypherType
  def withoutNull: CypherType

  /** Spark physical type. */
  def sparkType: DataType
}

trait MaterialType extends CypherType {
  def nullable = false
  def asNullable: CypherType = CTNullable(this)
  def withoutNull: CypherType = this
}

case class CTNullable(inner: MaterialType) extends CypherType {
  def nullable = true
  def asNullable: CypherType = this
  def withoutNull: CypherType = inner
  def sparkType: DataType = inner.sparkType
  override def toString: String = s"$inner?"
}

case object CTString extends MaterialType { def sparkType = StringType }
case object CTInteger extends MaterialType { def sparkType = LongType }
case object CTFloat extends MaterialType { def sparkType = DoubleType }
case object CTNumber extends MaterialType { def sparkType = DoubleType }
case object CTBoolean extends MaterialType { def sparkType = BooleanType }
case object CTNull extends MaterialType {
  override def nullable = true
  def sparkType = NullType
}
case object CTVoid extends MaterialType { def sparkType = NullType }
case object CTIdentity extends MaterialType { def sparkType = LongType }
case object CTDate extends MaterialType { def sparkType = DateType }
case object CTLocalDateTime extends MaterialType { def sparkType = TimestampType }
/** Months/days/microseconds struct, like the reference's Duration
  * (okapi-api/.../impl/temporal/Duration.scala) — CalendarIntervalType is
  * only semi-public, so a struct encoding is used instead. */
case object CTDuration extends MaterialType {
  def sparkType: DataType = StructType(Seq(
    StructField("months", LongType), StructField("days", LongType),
    StructField("micros", LongType)))
}
case object CTAny extends MaterialType { def sparkType = StringType }
case class CTNode(labels: Set[String] = Set.empty,
    override val nullable: Boolean = false) extends CypherType {
  def asNullable: CypherType = copy(nullable = true)
  def withoutNull: CypherType = copy(nullable = false)
  def sparkType: DataType = LongType
  override def toString: String =
    labels.toSeq.sorted.mkString("NODE(", ":", ")")
}
case class CTRelationship(types: Set[String] = Set.empty,
    override val nullable: Boolean = false) extends CypherType {
  def asNullable: CypherType = copy(nullable = true)
  def withoutNull: CypherType = copy(nullable = false)
  def sparkType: DataType = LongType
}
case class CTList(inner: CypherType,
    override val nullable: Boolean = false) extends CypherType {
  def asNullable: CypherType = copy(nullable = true)
  def withoutNull: CypherType = copy(nullable = false)
  def sparkType: DataType = ArrayType(inner.sparkType)
}
case class CTMap(properties: Map[String, CypherType] = Map.empty,
    override val nullable: Boolean = false) extends CypherType {
  def asNullable: CypherType = copy(nullable = true)
  def withoutNull: CypherType = copy(nullable = false)
  def sparkType: DataType = StructType(properties.toSeq.sortBy(_._1).map {
    case (k, t) => StructField(k, t.sparkType)
  })
}

object CypherType {
  /** Spark -> Cypher type (for schema derivation from DataFrames). */
  def fromSparkType(dt: DataType, nullable: Boolean = false): CypherType = {
    val base: CypherType = dt match {
      case StringType => CTString
      case LongType | IntegerType | ShortType | ByteType => CTInteger
      case DoubleType | FloatType => CTFloat
      case _: DecimalType => CTFloat
      case BooleanType => CTBoolean
      case DateType => CTDate
      case TimestampType | TimestampNTZType => CTLocalDateTime
      case ArrayType(inner, n) => CTList(fromSparkType(inner, n))
      case StructType(fields) =>
        CTMap(fields.map(f => f.name -> fromSparkType(f.dataType, f.nullable)).toMap)
      case NullType => CTNull
      case _ => CTAny
    }
    if (nullable && base != CTNull) base.asNullable else base
  }
}
