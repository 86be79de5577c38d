package graft.impl

import graft.ast
import graft.ast._
import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{CypherError => CE}

/** Planner/compiler failure. Defaults to the semantic-error bucket; sites
  * that correspond to a TCK error class pass the precise coordinates. */
class CypherCompileException(msg: String,
    errorType: CE.Type = CE.SemanticError,
    detail: String = CE.UnsupportedExpression)
  extends graft.api.CypherException(errorType, CE.CompileTime, detail, msg)

object ExprCompiler {
  /** The entity-struct VALUE marker test: `_id` first, PLUS `_labels`
    * (node) or `_src`/`_tgt`/`_type` (relationship). Every builder in the
    * engine emits the full marker set (empty `_labels` arrays included),
    * so requiring it here costs nothing — while a leading-`_id`-only test
    * would capture user map literals like `{_id: 1, name: 'x'}` and
    * silently switch their equality/IN/render semantics to entity
    * identity (ADVICE r12). */
  def isEntityStructType(st: StructType): Boolean =
    st.fieldNames.headOption.contains("_id") &&
      !st.fields.head.metadata.contains(MapLiteralTag) &&
      (st.fieldNames.contains("_labels") ||
        Seq("_src", "_tgt", "_type").forall(st.fieldNames.contains))

  /** StructField-metadata disambiguation for the one shape the structural
    * marker test cannot tell apart (ADVICE r12 / VERDICT r13 what's-wrong
    * #4): a USER map literal `{_id: …, _labels: …}` whose key set equals
    * the entity marker set. The MapLit compiler stamps this tag on the
    * literal's `_id` field, and [[isEntityStructType]] treats a tagged
    * struct as a plain map. The tag direction is deliberately inverted
    * from the advice (tag the literal, not the entity builders): map
    * literals are built in exactly one compile site, and if Spark ever
    * strips field metadata (type reconciliation in unions/CASE), the
    * failure mode is the pre-r14 collision — never an entity losing its
    * entity semantics. */
  val MapLiteralTag = "graft.map_literal"
  private[impl] val mapLiteralMeta =
    new MetadataBuilder().putBoolean(MapLiteralTag, true).build()

  /** Would this literal key set collide with the entity marker shape? */
  def mapKeysCollideWithEntity(keys: Seq[String]): Boolean =
    keys.headOption.contains("_id") &&
      (keys.contains("_labels") ||
        Seq("_src", "_tgt", "_type").forall(keys.contains))

  /** Aggregating function names (SURVEY §2.4 inventory). */
  val aggFns: Set[String] = Set("count", "sum", "avg", "min", "max", "collect",
    "stdev", "stdevp", "percentilecont", "percentiledisc", "_collectordered")

  /** Aggregate anywhere in the tree (generic walk — unlike the instance
    * hasAggregation, covers every node kind via ExprOps.mapChildren). */
  def containsAggregate(e: Expr): Boolean = ast.ExprOps.exists(e) {
    case CountStar => true
    case FuncCall(n, _, _) if aggFns(n) => true
    case _ => false
  }

  /** An aggregate whose own arguments aggregate (`sum(count(x))`) — the
    * TCK's NestedAggregation syntax error. */
  def nestedAggregation(e: Expr): Boolean = ast.ExprOps.exists(e) {
    case FuncCall(n, args, _) if aggFns(n) => args.exists(containsAggregate)
    case _ => false
  }

  /** Average Gregorian month length in days (365.2425 / 12 = 30.436875,
    * the reference's okapi TemporalConstants.AVG_DAYS_PER_MONTH and the
    * java.time ChronoUnit.MONTHS estimate of 2,629,746 s) — used to convert
    * a FRACTIONAL month component into smaller units. Whole months never
    * touch it: they stay calendar-exact in the months field. */
  private val AvgDaysPerMonth = BigDecimal("365.2425") / 12

  /** ISO-8601 duration -> (months, days, micros), the reference's Duration
    * encoding (okapi-api/.../impl/temporal/Duration.scala). Neo4j rule:
    * only the LAST present component may be fractional; its fraction
    * converts into smaller units (P1.5Y = 1 year 6 months, P2.5D = 2 days
    * 12 hours), truncating at microseconds. */
  def parseIsoDuration(s: String): (Long, Long, Long) = {
    // Components may carry their own sign (ISO-8601 / java.time form
    // 'P-2D', 'PT-1H30M'); a leading '-' negates the whole duration.
    val f = """(-?\d+(?:[.,]\d+)?)"""
    val re = ("""(?i)^(-)?P(?:""" + f + """Y)?(?:""" + f + """M)?(?:""" + f +
      """W)?(?:""" + f + """D)?(?:T(?:""" + f + """H)?(?:""" + f +
      """M)?(?:""" + f + """S)?)?$""").r
    s match {
      case re(neg, y, mo, w, d, h, mi, sec) =>
        val comps = Seq(y, mo, w, d, h, mi, sec)
        if (comps.forall(_ == null)) throw new CypherCompileException(
          s"malformed ISO-8601 duration literal: $s",
          CE.ArgumentError, CE.InvalidTemporalValue)
        def big(x: String): BigDecimal =
          if (x == null) BigDecimal(0) else BigDecimal(x.replace(',', '.'))
        // Fractional values only in the last present component (Neo4j).
        val lastIdx = comps.lastIndexWhere(_ != null)
        comps.zipWithIndex.foreach { case (c, i) =>
          if (c != null && i != lastIdx && big(c).scale > 0 &&
              big(c) != big(c).setScale(0, BigDecimal.RoundingMode.DOWN))
            throw new CypherCompileException(
              s"only the smallest duration component may be fractional: $s",
              CE.ArgumentError, CE.InvalidTemporalValue)
        }
        def whole(x: BigDecimal): BigDecimal =
          x.setScale(0, BigDecimal.RoundingMode.DOWN)
        val monthsT = big(y) * 12 + big(mo)
        val monthsW = whole(monthsT)
        val daysT = (monthsT - monthsW) * AvgDaysPerMonth +
          big(w) * 7 + big(d)
        val daysW = whole(daysT)
        val microsT = (daysT - daysW) * 86400000000L +
          (big(h) * 3600L + big(mi) * 60L + big(sec)) * 1000000L
        val sign = if (neg == null) 1L else -1L
        (sign * monthsW.toLong, sign * daysW.toLong,
          sign * whole(microsT).toLong)
      case _ => throw new CypherCompileException(
        s"malformed ISO-8601 duration literal: $s", CE.ArgumentError, CE.InvalidTemporalValue)
    }
  }

  /** POINT normal form (beyond-reference; 2D only): (x, y, srid) with
    * Neo4j's CRS codes — srid 7203 = cartesian-2D, 4326 = WGS-84-2D.
    * Struct equality gives point equality (same CRS + coordinates). */
  val pointType: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("srid", IntegerType)))

  /** The (months, days, micros) duration normal form's Spark type. */
  val durationType: StructType = StructType(Seq(
    StructField("months", LongType), StructField("days", LongType),
    StructField("micros", LongType)))

  /** LOCALTIME normal form: microseconds since midnight, marker-field
    * struct (Spark has no time-of-day type; the single-field struct keeps
    * accessor dispatch and orderability without a new Catalyst type). */
  val localTimeType: StructType =
    StructType(Seq(StructField("_ltus", LongType)))

  /** TIME (offset time) normal form: (_tutc = local micros − offset, the
    * timeline value Neo4j orders by, FIRST so struct ordering is timeline
    * ordering; _tzos = zone offset seconds). Equality therefore requires
    * the same offset too — a documented divergence (Neo4j compares
    * instants only). */
  val timeType: StructType = StructType(Seq(
    StructField("_tutc", LongType), StructField("_tzos", LongType)))

  /** Total-microseconds estimate of a (months, days, micros) duration
    * struct for ordering: months at their Gregorian average length
    * (365.2425 / 12 days), Neo4j's duration comparison rule. */
  def durationTotalMicros(c: Column): Column =
    c.getField("months") * 2629746000000L +
      c.getField("days") * 86400000000L + c.getField("micros")

  /** Cypher-compatible date strings (TemporalTests.scala:207-227):
    * calendar (2010-10-10, 20101010, 2010-12, 201012, 2010), ISO week
    * (2015-W30-2, 2015W302, 2015-W30), quarter (2015-Q2-60, 2015Q2),
    * ordinal (2015-202, 2015202). */
  def parseCypherDate(s0: String): java.time.LocalDate = {
    import java.time.LocalDate
    import java.time.temporal.{ChronoField, IsoFields}
    val s = s0.trim
    val W = """(\d{4})-?W(\d{1,2})-?(\d)?""".r
    val Q = """(\d{4})-?Q([1-4])-?(\d{1,2})?""".r
    val Ymd = """(\d{4})-(\d{1,2})-(\d{1,2})""".r
    val Compact8 = """(\d{4})(\d{2})(\d{2})""".r
    val Ord = """(\d{4})-?(\d{3})""".r
    val Ym = """(\d{4})-(\d{1,2})""".r
    val Compact6 = """(\d{4})(\d{2})""".r
    val Y = """(\d{4})""".r
    try s match {
      case W(y, w, d) =>
        LocalDate.of(2000, 1, 4) // a Tuesday; week fields need a base
          .`with`(IsoFields.WEEK_BASED_YEAR, y.toLong)
          .`with`(IsoFields.WEEK_OF_WEEK_BASED_YEAR, w.toLong)
          .`with`(ChronoField.DAY_OF_WEEK, if (d == null) 1L else d.toLong)
      case Q(y, q, d) =>
        LocalDate.of(y.toInt, 1, 1)
          .`with`(IsoFields.QUARTER_OF_YEAR, q.toLong)
          .`with`(IsoFields.DAY_OF_QUARTER, if (d == null) 1L else d.toLong)
      case Ymd(y, m, d) => LocalDate.of(y.toInt, m.toInt, d.toInt)
      case Compact8(y, m, d) => LocalDate.of(y.toInt, m.toInt, d.toInt)
      case Ord(y, ddd) => LocalDate.ofYearDay(y.toInt, ddd.toInt)
      case Ym(y, m) => LocalDate.of(y.toInt, m.toInt, 1)
      case Compact6(y, m) => LocalDate.of(y.toInt, m.toInt, 1)
      case Y(y) => LocalDate.of(y.toInt, 1, 1)
      case _ => throw new CypherCompileException(s"malformed date literal: $s0", CE.ArgumentError, CE.InvalidTemporalValue)
    } catch {
      // Pattern-shaped but out of calendar range (2019-366, 2020-02-30,
      // month 13): same classified error as a malformed literal.
      case _: java.time.DateTimeException => throw new CypherCompileException(
        s"invalid date literal: $s0", CE.ArgumentError, CE.InvalidTemporalValue)
    }
  }

  /** datetime() literal: every localdatetime form plus an optional
    * offset ('Z', +HH:MM, +HHMM, +HH) and/or a bracketed zone name
    * ('[Europe/Berlin]'); the instant normalizes to UTC — the engine's
    * datetime is session-UTC TimestampType, so the zone itself is not
    * retained (documented divergence, the TIME type's sibling rule). */
  def parseCypherZonedDateTime(s0: String): java.time.LocalDateTime = {
    import java.time.{ZoneId, ZoneOffset}
    var s = s0.trim.replace(' ', 'T')
    var zone: Option[ZoneId] = None
    val bi = s.indexOf('[')
    if (bi >= 0 && s.endsWith("]")) {
      try zone = Some(ZoneId.of(s.substring(bi + 1, s.length - 1)))
      catch {
        case _: java.time.DateTimeException => throw new CypherCompileException(
          s"unknown time zone in datetime literal: $s0",
          CE.ArgumentError, CE.InvalidTemporalValue)
      }
      s = s.substring(0, bi)
    }
    var offset: Option[ZoneOffset] = None
    val ti = s.indexOf('T')
    if (ti >= 0) {
      val OffR = """^(.*?)(Z|[+-]\d{2}(?::?\d{2})?)$""".r
      s.substring(ti + 1) match {
        case OffR(body, off) =>
          offset = Some(if (off == "Z") ZoneOffset.UTC else ZoneOffset.of(off))
          s = s.substring(0, ti + 1) + body
        case _ =>
      }
    }
    val ldt = parseCypherLocalDateTime(s)
    (offset, zone) match {
      case (Some(o), _) => ldt.minusSeconds(o.getTotalSeconds.toLong)
      case (None, Some(z)) =>
        ldt.atZone(z).withZoneSameInstant(ZoneOffset.UTC).toLocalDateTime
      case _ => ldt
    }
  }

  /** Cypher-compatible localdatetime strings: <date>[T<time>] where the
    * date accepts every parseCypherDate form and the time is
    * HH[:MM[:SS[.fff]]] or compact HH[MM[SS[.fff]]]. */
  def parseCypherLocalDateTime(s0: String): java.time.LocalDateTime = {
    import java.time.{LocalDateTime, LocalTime}
    val s = s0.trim.replace(' ', 'T')
    val (datePart, timePart) = s.indexOf('T') match {
      case -1 => (s, None)
      case i => (s.substring(0, i), Some(s.substring(i + 1)))
    }
    val d = parseCypherDate(datePart)
    val t = timePart match {
      case None => LocalTime.MIDNIGHT
      case Some(tp) =>
        val T = """(\d{2}):?(\d{2})?:?(\d{2})?(?:\.(\d{1,9}))?""".r
        tp match {
          case T(h, mi, sec, frac) =>
            val nanos =
              if (frac == null) 0L else frac.padTo(9, '0').toLong
            try LocalTime.of(h.toInt,
              if (mi == null) 0 else mi.toInt,
              if (sec == null) 0 else sec.toInt, nanos.toInt)
            catch {
              case _: java.time.DateTimeException =>
                throw new CypherCompileException(
                  s"invalid time in localdatetime literal: $s0",
                  CE.ArgumentError, CE.InvalidTemporalValue)
            }
          case _ => throw new CypherCompileException(
            s"malformed time in localdatetime literal: $s0",
            CE.ArgumentError, CE.InvalidTemporalValue)
        }
    }
    LocalDateTime.of(d, t)
  }

  /** Cypher time-of-day strings: HH[:MM[:SS[.fff...]]] or compact
    * HH[MM[SS]][.fff...] — the same time grammar the localdatetime parser
    * accepts after 'T'. Sub-microsecond digits are rejected (Spark-wide
    * microsecond resolution, same stance as the datetime map constructor). */
  def parseCypherTime(s0: String): java.time.LocalTime = {
    val s = s0.trim
    val T = """(\d{2}):?(\d{2})?:?(\d{2})?(?:\.(\d{1,9}))?""".r
    s match {
      case T(h, mi, sec, frac) =>
        val nanos = if (frac == null) 0L else frac.padTo(9, '0').toLong
        if (nanos % 1000 != 0) throw new CypherCompileException(
          s"time literal $s0 exceeds microsecond resolution",
          CE.ArgumentError, CE.InvalidArgumentValue)
        try java.time.LocalTime.of(h.toInt,
          if (mi == null) 0 else mi.toInt,
          if (sec == null) 0 else sec.toInt, nanos.toInt)
        catch {
          case _: java.time.DateTimeException =>
            throw new CypherCompileException(s"invalid time literal: $s0",
              CE.ArgumentError, CE.InvalidTemporalValue)
        }
      case _ => throw new CypherCompileException(
        s"malformed time literal: $s0", CE.ArgumentError,
        CE.InvalidTemporalValue)
    }
  }

  /** Offset time strings: <time>[Z | ±HH[:MM] | ±HHMM]. Returns the LOCAL
    * wall time and the offset in seconds (no offset defaults to UTC, the
    * engine's session timezone). Named zones ('[Europe/Paris]') need a
    * date to resolve and are classified unsupported. */
  def parseCypherOffsetTime(s0: String): (java.time.LocalTime, Int) = {
    val s = s0.trim
    if (s.contains("[")) throw new CypherCompileException(
      s"named time zones are not supported in time(): $s0",
      CE.ArgumentError, CE.InvalidArgumentValue)
    val Off = """(.*?)(Z|[+-]\d{2}(?::?\d{2})?)$""".r
    s match {
      case Off(tp, off) =>
        val secs = off match {
          case "Z" => 0
          case o =>
            val sign = if (o.startsWith("-")) -1 else 1
            val digits = o.substring(1).replace(":", "")
            val h = digits.substring(0, 2).toInt
            val m = if (digits.length > 2) digits.substring(2).toInt else 0
            if (h > 18 || m > 59) throw new CypherCompileException(
              s"invalid zone offset in time literal: $s0",
              CE.ArgumentError, CE.InvalidTemporalValue)
            sign * (h * 3600 + m * 60)
        }
        (parseCypherTime(tp), secs)
      case _ => (parseCypherTime(s), 0)
    }
  }
}

/** Compiles graft.ast.Expr to Spark Columns against a RecordHeader.
  *
  * Mirrors the behavior spec of the reference's Spark mapper
  * (morpheus-spark-cypher/.../impl/SparkSQLExprMapper.scala) but targets only
  * public `org.apache.spark.sql.functions` / Column combinators so every
  * expression stays inside whole-stage codegen.
  *
  * @param schema physical schema of the DataFrame the header describes;
  *               used for static type dispatch (string-vs-numeric `+`,
  *               size-of-string vs size-of-list, …).
  * @param env    lambda-bound variables (list comprehensions / reduce).
  */
class ExprCompiler(header: RecordHeader, schema: StructType,
    params: Map[String, Any] = Map.empty,
    env: Map[String, (Column, Option[DataType])] = Map.empty,
    extensions: Map[String, Seq[Column] => Column] = Map.empty) {

  private def colType(name: String): Option[DataType] =
    schema.fields.find(_.name == name).map(_.dataType)

  def withEnv(name: String, c: Column, t: Option[DataType]): ExprCompiler =
    new ExprCompiler(header, schema, params, env + (name -> ((c, t))), extensions)

  // ------------------------------------------------------------ type infer
  /** Best-effort static type; None when unknown. */
  /** Static type gate for `:$(expr)` dynamic label/type terms: Neo4j
    * requires STRING or LIST<STRING> and raises a type error otherwise.
    * An un-inferrable (ANY) expression is rejected at compile time too —
    * the old cast-to-STRING fallback silently rendered a runtime list as
    * "[A, B]" and matched nothing. NULL stays legal (matches nothing at
    * runtime, see HasDynLabels/HasDynType). */
  private def dynLabelType(e: Expr, what: String): Option[DataType] =
    inferType(e) match {
      case t @ Some(StringType | NullType) => t
      case t @ Some(ArrayType(StringType | NullType, _)) => t
      case Some(other) => throw new CypherCompileException(
        s"$what expression must be STRING or LIST<STRING>, got $other",
        CE.TypeError, CE.InvalidArgumentType)
      case None => throw new CypherCompileException(
        s"$what expression must be statically STRING or LIST<STRING>; " +
          "cannot infer a type for it",
        CE.TypeError, CE.InvalidArgumentType)
    }

  /** Runtime CRS-name → SRID mapping for point(): the two supported 2D
    * systems; anything else is NULL (a per-row error is not expressible —
    * the point() caller nulls the whole point, see tck_blacklist.md). */
  private def crsToSrid(c: Column): Column =
    when(F.lower(c.cast(StringType)) === "cartesian", lit(7203))
      .when(F.lower(c.cast(StringType)).isin("wgs-84", "wgs84"), lit(4326))
      .otherwise(lit(null).cast(IntegerType))

  def inferType(e: Expr): Option[DataType] = e match {
    case Var(n) if env.contains(n) =>
      // Entity-struct binders read as their id (see entityStructOf).
      if (entityStructOf(env(n)._2).isDefined) Some(LongType) else env(n)._2
    case Prop(Var(n), k) if env.contains(n) &&
        entityStructOf(env(n)._2).isDefined =>
      entityStructOf(env(n)._2).get.fields.find(_.name == k).map(_.dataType)
    case Var(n) => header.kindOf(n) match {
      case Some(ValueKind) => header.get(ValueSlot(n)).flatMap(colType)
      case Some(NodeKind(_)) | Some(RelKind(_)) => Some(LongType)
      case Some(ListRelKind(_)) | Some(ListNodeKind(_)) =>
        Some(ArrayType(LongType))
      case None => None
    }
    case Prop(Var(n), k) if !env.contains(n) =>
      header.get(PropSlot(n, k)).flatMap(colType)
    case Prop(sub, k) => inferType(sub) match {
      case Some(st: StructType) => st.fields.find(_.name == k).map(_.dataType)
      case Some(MapType(_, vt, _)) => Some(vt)
      case Some(DateType) | Some(TimestampType) | Some(TimestampNTZType) =>
        Some(LongType)
      case _ => None
    }
    case IntLit(_) => Some(LongType)
    case FloatLit(_) => Some(DoubleType)
    case StrLit(_) => Some(StringType)
    case BoolLit(_) => Some(BooleanType)
    case NullLit => Some(NullType)
    case ListLit(items) =>
      // A literal list of entities compiles to entity STRUCTS (the
      // unifyEntities capture below) — the static type must say so too,
      // or type-driven dispatch (concat, IN, render) mis-fires on the
      // element-id type (r13). Try: unification compiles the operands,
      // which may legitimately refuse shapes inferType must not throw on.
      (if (items.nonEmpty && items.exists(isEntityOperand))
        scala.util.Try(unifyTypedEntities(items)).toOption.flatten
          .map { case (_, st) => ArrayType(st) }
      else None).orElse(
        Some(ArrayType(items.flatMap(inferType).headOption.getOrElse(NullType))))
    case MapLit(items) =>
      val collides = ExprCompiler.mapKeysCollideWithEntity(items.map(_._1))
      Some(StructType(items.map { case (k, v) =>
        StructField(k, (v match {
          case Var(n) if !env.contains(n) => entityValueStructType(n)
          case _ => None
        }).orElse(inferType(v)).getOrElse(NullType),
          nullable = true,
          metadata = if (collides && k == "_id") ExprCompiler.mapLiteralMeta
            else Metadata.empty)
      }))
    // Duration algebra keeps the duration struct type.
    case Arith("+" | "-", l, r) if isDuration(l) && isDuration(r) =>
      Some(ExprCompiler.durationType)
    case Arith("*" | "/", l, _) if isDuration(l) =>
      Some(ExprCompiler.durationType)
    case Arith("*", _, r) if isDuration(r) =>
      Some(ExprCompiler.durationType)
    case Arith("+" | "-", l, r) if (r match {
          case FuncCall("duration", _, _) => true
          case _ => false
        }) => inferType(l)
    case Arith("+", l, r) =>
      (inferType(l), inferType(r)) match {
        // List concat/append before string concat (reference Add dispatch);
        // appending to an empty (null-typed) list adopts the element's type.
        case (Some(ArrayType(NullType, n)), Some(ArrayType(et, _))) =>
          Some(ArrayType(et, n))
        case (Some(ArrayType(NullType, n)), Some(et)) => Some(ArrayType(et, n))
        case (Some(a: ArrayType), _) => Some(a)
        case (Some(et), Some(ArrayType(NullType, n))) => Some(ArrayType(et, n))
        case (_, Some(a: ArrayType)) => Some(a)
        case (Some(StringType), _) | (_, Some(StringType)) => Some(StringType)
        case (Some(DoubleType), _) | (_, Some(DoubleType)) => Some(DoubleType)
        case (Some(LongType), Some(LongType)) => Some(LongType)
        case _ => None
      }
    case Arith(op @ ("-" | "*" | "%"), l, r) =>
      (inferType(l), inferType(r)) match {
        case (Some(DoubleType), _) | (_, Some(DoubleType)) => Some(DoubleType)
        case (Some(LongType), Some(LongType)) => Some(LongType)
        case _ => None
      }
    case Arith("/", l, r) =>
      (inferType(l), inferType(r)) match {
        case (Some(LongType), Some(LongType)) => Some(LongType)
        case _ => Some(DoubleType)
      }
    case Arith("^", _, _) => Some(DoubleType)
    case Neg(x) => inferType(x)
    case Param(n) => params.get(n).map(litType)
    case CaseExpr(_, alts, default) =>
      // CASE over entities compiles through unifyEntities (union entity
      // struct) — the static type must say so too, or downstream dispatch
      // (=, IN, property reads) sees the element-id type and mis-fires
      // (r13, same inconsistency as ListLit).
      val results = alts.map(_._2) ++ default.toSeq
      (if (results.exists(isEntityOperand))
        scala.util.Try(unifyTypedEntities(results)).toOption.flatten
          .map(_._2: DataType)
      else None).orElse(results.flatMap(inferType).headOption)
    case FuncCall(name, args, _) => name match {
      case "tointegerornull" => Some(LongType)
      case "tofloatornull" => Some(DoubleType)
      case "tobooleanornull" => Some(BooleanType)
      case "char_length" | "character_length" => Some(LongType)
      case "elementid" | "tostringornull" | "upper" | "lower" |
           "valuetype" | "randomuuid" | "normalize" => Some(StringType)
      case "nullif" => args.headOption.flatMap(inferType)
      case "toset" => args.headOption.flatMap(inferType)
      case "tostring" | "toupper" | "tolower" | "trim" | "ltrim" | "rtrim" |
           "reverse" | "replace" | "substring" | "left" | "right" | "type" => Some(StringType)
      case "tointeger" | "id" | "size" | "length" | "count" | "timestamp" |
           "sign" => Some(LongType)
      case "isnan" | "isempty" => Some(BooleanType)
      case "btrim" => Some(StringType)
      case "vector.similarity.cosine" | "vector.similarity.euclidean" =>
        Some(DoubleType)
      case "point" => Some(ExprCompiler.pointType)
      case "point.distance" => Some(DoubleType)
      case "point.withinbbox" => Some(BooleanType)
      case "tofloat" | "avg" | "sqrt" | "exp" | "log" | "log10" | "sin" |
           "cos" | "tan" | "asin" | "acos" | "atan" | "atan2" | "degrees" |
           "radians" | "rand" | "pi" | "e" | "stdev" | "stdevp" |
           "percentilecont" | "percentiledisc" => Some(DoubleType)
      case "toboolean" | "exists" => Some(BooleanType)
      case "labels" | "keys" | "split" | "tostringlist" =>
        Some(ArrayType(StringType))
      case "tointegerlist" => Some(ArrayType(LongType))
      case "tofloatlist" => Some(ArrayType(DoubleType))
      case "tobooleanlist" => Some(ArrayType(BooleanType))
      case "date" | "date.truncate" | "date.transaction" |
           "date.statement" | "date.realtime" => Some(DateType)
      case "localdatetime" | "datetime" | "datetime.truncate" |
           "localdatetime.truncate" | "datetime.fromepoch" |
           "datetime.fromepochmillis" |
           "datetime.transaction" | "datetime.statement" |
           "datetime.realtime" | "localdatetime.transaction" |
           "localdatetime.statement" | "localdatetime.realtime" =>
        Some(TimestampType)
      case "localtime" | "localtime.truncate" | "localtime.transaction" |
           "localtime.statement" | "localtime.realtime" =>
        Some(ExprCompiler.localTimeType)
      case "time" | "time.truncate" | "time.transaction" |
           "time.statement" | "time.realtime" => Some(ExprCompiler.timeType)
      case "duration.between" | "duration.inmonths" | "duration.indays" |
           "duration.inseconds" => Some(ExprCompiler.durationType)
      case "duration" => Some(StructType(Seq(
        StructField("months", LongType), StructField("days", LongType),
        StructField("micros", LongType))))
      case "range" | "nodes" | "relationships" => Some(ArrayType(LongType))
      case "collect" | "_collectordered" =>
        // collect(n) over an entity var captures full entity structs
        (args.headOption match {
          case Some(Var(n)) if !env.contains(n) => entityValueStructType(n)
          case _ => None
        }).orElse(args.headOption.flatMap(inferType)).map(ArrayType(_))
      case "properties" => args.headOption.flatMap {
        case Var(n) if !env.contains(n) &&
            header.kindOf(n).exists(k =>
              k.isInstanceOf[NodeKind] || k.isInstanceOf[RelKind]) =>
          entityValueStructType(n).map(st => StructType(
            st.fields.filterNot(_.name.startsWith("_"))))
        case v => entityStructOf(envEntity(v).map(_._2).orElse(inferType(v)))
          .map(st => StructType(st.fields.filterNot(_.name.startsWith("_"))
            .sortBy(_.name)))
      }
      case "coalesce" =>
        // coalesce over entities unifies to the union entity struct at
        // compile — mirror it statically (same rule as CASE/ListLit, r13)
        (if (args.exists(isEntityOperand))
          scala.util.Try(unifyTypedEntities(args)).toOption.flatten
            .map(_._2: DataType)
        else None).orElse(args.headOption.flatMap(inferType))
      case "sum" | "min" | "max" | "abs" | "ceil" | "floor" | "round" =>
        args.headOption.flatMap(inferType)
      case "head" | "last" => args.headOption.flatMap(inferType).map {
        case ArrayType(et, _) => et
        case other => other
      }
      case "tail" => args.headOption.flatMap(inferType)
      case _ => None
    }
    case Index(Var(n), idx) if !env.contains(n) &&
        (header.kindOf(n) match {
          case Some(NodeKind(_)) | Some(RelKind(_)) => true
          case _ => false
        }) =>
      idx match {
        case StrLit(k) => header.get(PropSlot(n, k)).flatMap(colType)
        case _ =>
          val types = header.ownedBy(n).collect { case p: PropSlot => p }
            .flatMap(p => header.get(p).flatMap(colType))
          if (types.distinct.size == 1) types.headOption
          else if (types.nonEmpty) Some(DoubleType)
          else None
      }
    case Index(sub, idx) => inferType(sub) match {
      case Some(ArrayType(et, _)) => Some(et)
      // Literal-key struct access types through, so chained map access
      // ({a: {b: 2}}['a']['b']) keeps dispatching as a map, not a list.
      case Some(st: StructType) => idx match {
        case StrLit(key) => st.fields.find(_.name == key).map(_.dataType)
        case _ => None
      }
      case Some(MapType(_, vt, _)) => Some(vt)
      case _ => None
    }
    case Slice(sub, _, _) => inferType(sub)
    case ListComprehension(v, l, _, proj) =>
      val et = inferType(l).collect { case ArrayType(t, _) => t }
      proj match {
        case None => inferType(l)
        case Some(pe) =>
          val inner = new ExprCompiler(header, schema, params,
            env + (v -> ((lit(0), et))), extensions).inferType(pe)
          inner.map(ArrayType(_))
      }
    case _: Cmp | _: Ands | _: Ors | _: Not | _: Xor | _: IsNull | _: In |
         _: IsTyped | _: IsNormalized | _: StartsWith | _: EndsWith | _: Contains |
         _: RegexMatch | _: HasLabels | _: HasDynLabels | _: HasDynType |
         _: IterablePredicate =>
      Some(BooleanType)
    case _ => None
  }

  private def litType(v: Any): DataType = v match {
    case _: Int | _: Long => LongType
    case _: Double | _: Float => DoubleType
    case _: String => StringType
    case _: Boolean => BooleanType
    case s: Seq[_] => ArrayType(s.headOption.map(litType).getOrElse(NullType))
    case m: scala.collection.Map[_, _] =>
      StructType(m.toSeq.map { case (k, x) =>
        StructField(k.toString, litType(x)) })
    case _ => NullType
  }

  private def isStringy(e: Expr): Boolean = inferType(e).contains(StringType)

  /** Comparability class per openCypher: numbers coerce among themselves;
    * everything else only compares within its own class. None = unknown. */
  private def cmpClass(t: DataType): Option[Int] = t match {
    case _: NumericType => Some(1)
    case StringType => Some(2)
    case BooleanType => Some(3)
    case DateType => Some(4)
    case TimestampType | TimestampNTZType => Some(5)
    case StructType(fs) if fs.map(_.name).toSeq == Seq("_ltus") => Some(6)
    case StructType(fs) if fs.map(_.name).toSeq == Seq("_tutc", "_tzos") =>
      Some(7)
    case _ => None // arrays/structs/null: leave to Spark semantics
  }

  /** True iff both operand types are statically known and in different
    * comparability classes. */
  private def crossClass(l: Expr, r: Expr): Boolean = (for {
    lt <- inferType(l); lc <- cmpClass(lt)
    rt <- inferType(r); rc <- cmpClass(rt)
  } yield lc != rc).getOrElse(false)

  /** Path values are (nodes, rels) structs bound by the planner. */
  private def isPathStruct(e: Expr): Boolean = inferType(e) match {
    case Some(StructType(fs)) => fs.map(_.name).toSeq == Seq("nodes", "rels")
    case _ => false
  }

  /** Statically a list or a PLAIN map — not one of the planner's marker
    * structs (path, entity, duration, time-of-day), which keep their own
    * equality semantics. */
  private def containerTyped(e: Expr): Boolean = inferType(e) match {
    case Some(_: ArrayType) => true
    case Some(st: StructType) =>
      entityStructOf(Some(st)).isEmpty && !isPathStruct(e) &&
        !isDuration(e) && !isLocalTimeT(Some(st)) && !isTimeT(Some(st))
    case _ => false
  }

  /** Both sides statically list- or map-typed (per [[containerTyped]]):
    * the type pair for [[ternaryEq]]. */
  private def ternaryEqTypes(l: Expr, r: Expr): Option[(DataType, DataType)] =
    (inferType(l), inferType(r)) match {
      case (Some(lt: ArrayType), Some(rt: ArrayType)) => Some((lt, rt))
      case (Some(lt: StructType), Some(rt: StructType))
          if containerTyped(l) && containerTyped(r) => Some((lt, rt))
      case _ => None
    }

  /** openCypher ternary equality for lists and maps (see the Cmp("=")
    * case): key-set mismatch is definite false; otherwise recursive
    * elementwise 3VL. Map fields compare BY NAME (maps are unordered). */
  private def ternaryEq(lc: Column, rc: Column,
      lt: DataType, rt: DataType): Column = (lt, rt) match {
    case (ls: StructType, rs: StructType)
        if ls.fieldNames.toSet != rs.fieldNames.toSet =>
      when(lc.isNull || rc.isNull, lit(null).cast(BooleanType))
        .otherwise(lit(false))
    case _ => elem3vlEq(lc, rc, lt)
  }

  /** Static Cypher type name of an expression — entity variables first
    * (their inferType is the physical id LongType), then the physical
    * Spark type (shared by valueType() and the IS :: predicate). */
  private def staticTypeName(e: Expr): String = {
    val entity = (e match {
      case Var(n) => header.kindOf(n) match {
        case Some(NodeKind(_)) => Some("NODE")
        case Some(RelKind(_)) => Some("RELATIONSHIP")
        case Some(ListNodeKind(_)) | Some(ListRelKind(_)) => Some("LIST")
        case _ => None
      }
      case _ => None
    }).orElse(entityStructOf(inferType(e)).map(st =>
      // an entity-struct VALUE (collect(n) round-trip) IS the entity
      if (st.fieldNames.contains("_type")) "RELATIONSHIP" else "NODE"))
    entity.getOrElse(dataTypeName(inferType(e),
      isLocalTimeT(inferType(e)), isTimeT(inferType(e))))
  }

  private def dataTypeName(t: Option[DataType], localTime: Boolean,
      zonedTime: Boolean): String = t match {
    case _ if localTime => "LOCAL TIME"
    case _ if zonedTime => "ZONED TIME"
    case Some(st: StructType)
        if st.fieldNames.toSeq == Seq("x", "y", "srid") => "POINT"
    case Some(LongType) | Some(IntegerType) => "INTEGER"
    case Some(DoubleType) | Some(FloatType) => "FLOAT"
    case Some(_: DecimalType) => "FLOAT"
    case Some(StringType) => "STRING"
    case Some(BooleanType) => "BOOLEAN"
    case Some(DateType) => "DATE"
    case Some(TimestampType) | Some(TimestampNTZType) => "LOCAL DATETIME"
    case Some(StructType(fs))
        if fs.map(_.name).toSeq == Seq("months", "days", "micros") =>
      "DURATION"
    case Some(_: ArrayType) => "LIST"
    case Some(_: StructType) | Some(_: MapType) => "MAP"
    case Some(NullType) => "NULL"
    case _ => "ANY"
  }

  /** `x IS [NOT] :: SPEC` (Cypher 5): the match is decided from the
    * STATIC type — a null value inhabits every type unless the spec says
    * NOT NULL (Neo4j semantics), so a static match compiles to
    * true/isNotNull and a mismatch to isNull/false; no runtime type tags
    * exist or are needed. LIST element specs recurse on the static
    * element type; an element-level NOT NULL adds the one genuinely
    * dynamic check (no null elements). */
  private def compileIsTyped(x: Expr, spec: CypherTypeSpec,
      negated: Boolean): Column = {
    val c = compile(x)
    def nameMatches(got: String, want: String): Boolean = want match {
      case "ANY" => true
      case "INT" | "SIGNED INTEGER" => got == "INTEGER"
      case "VARCHAR" => got == "STRING"
      case "TIMESTAMP WITHOUT TIME ZONE" => got == "LOCAL DATETIME"
      case w => got == w
    }
    def specMatches(e: Expr, s: CypherTypeSpec): Boolean = {
      val got = staticTypeName(e)
      if (!nameMatches(got, s.name)) false
      else if (s.elem.isEmpty) true
      else inferType(e) match {
        case Some(ArrayType(et, _)) =>
          val en = dataTypeName(Some(et), false, false)
          s.elem.get.name == "ANY" || nameMatches(en, s.elem.get.name)
        case _ => s.elem.get.name == "ANY"
      }
    }
    val matches = specMatches(x, spec)
    val elemNotNull = spec.elem.exists(_.notNull) &&
      inferType(x).exists(_.isInstanceOf[ArrayType])
    val base: Column =
      if (!matches) { if (spec.notNull) lit(false) else c.isNull }
      else {
        val m0: Column =
          if (spec.notNull) c.isNotNull
          else lit(true)
        if (elemNotNull)
          when(c.isNull, if (spec.notNull) lit(false) else lit(true))
            .otherwise(m0 && !F.exists(c, e => e.isNull))
        else m0
      }
    if (negated) !base else base
  }

  /** Three-way ternary comparison (−1/0/1/null) for [[Cmp]] over lists:
    * lexicographic walk where the FIRST non-equal pair decides, a null
    * element (or null-vs-value pair) encountered before any decision
    * poisons the result to null, and a fully-equal prefix falls back to
    * the length difference. Spark's native array ordering would instead
    * sort null elements first ([null] < [1] -> true; openCypher: null).
    * Maps are unordered in openCypher: equal compares 0, anything else
    * null. */
  private def cmp3(a: Column, b: Column, t: DataType): Column = t match {
    case ArrayType(et, _) =>
      val n = least(F.size(a), F.size(b))
      val pairs = zip_with(F.slice(a, lit(1), n), F.slice(b, lit(1), n),
        (x, y) => cmp3(x, y, et))
      val walked = F.aggregate(pairs, lit(0).cast(IntegerType),
        (acc, c) => when(acc.isNull || acc =!= 0, acc).otherwise(c))
      when(a.isNull || b.isNull, lit(null).cast(IntegerType))
        .when(walked.isNull || walked =!= 0, walked)
        .otherwise(signum(F.size(a) - F.size(b)).cast(IntegerType))
    case st: StructType =>
      when(elem3vlEq(a, b, st) <=> lit(true), lit(0).cast(IntegerType))
        .otherwise(lit(null).cast(IntegerType))
    case _ =>
      when(a.isNull || b.isNull, lit(null).cast(IntegerType))
        .when(a < b, lit(-1)).when(a > b, lit(1)).otherwise(lit(0))
  }

  private def elem3vlEq(a: Column, b: Column, t: DataType): Column = t match {
    case ArrayType(et, _) =>
      val pairs = zip_with(a, b, (x, y) => elem3vlEq(x, y, et))
      when(a.isNull || b.isNull, lit(null).cast(BooleanType))
        .when(F.size(a) =!= F.size(b), lit(false))
        .when(F.exists(pairs, e => !e), lit(false))
        .when(F.exists(pairs, e => e.isNull), lit(null).cast(BooleanType))
        .otherwise(lit(true))
    case st: StructType =>
      val fs = st.fields.toSeq.map(f =>
        elem3vlEq(a.getField(f.name), b.getField(f.name), f.dataType))
      when(a.isNull || b.isNull, lit(null).cast(BooleanType))
        .when(fs.map(c => c <=> lit(false)).reduceOption(_ || _)
          .getOrElse(lit(false)), lit(false))
        .when(fs.map(_.isNull).reduceOption(_ || _).getOrElse(lit(false)),
          lit(null).cast(BooleanType))
        .otherwise(lit(true))
    case _ =>
      when(a.isNull || b.isNull, lit(null).cast(BooleanType))
        .otherwise(a === b)
  }

  /** Entity-element structs produced by the planner's
    * materializeEntityLists (lambdas over relationships(p)/nodes(p)):
    * marker convention is a leading "_id" field, then "_src"/"_tgt"/"_type"
    * for relationships or "_labels" for nodes; property fields follow under
    * their plain names. A bare binder of this type still MEANS its id
    * (entity identity semantics), so compile(Var) projects _id and only
    * Prop / type() / labels() / ... read the other fields. */
  private def entityStructOf(t: Option[DataType]): Option[StructType] = t match {
    case Some(st: StructType) if ExprCompiler.isEntityStructType(st) =>
      Some(st)
    case _ => None
  }

  /** Compile an operand of a BOOLEAN context (AND/OR/XOR/NOT, CASE WHEN,
    * WHERE): a statically non-boolean type is a classified type error
    * (Neo4j: "expected Boolean"), never a leaked Spark DATATYPE_MISMATCH.
    * NULL types pass as boolean null; unknown types fall through. */
  def compileBoolOperand(e: Expr): Column =
    inferType(e) match {
      case Some(NullType) => lit(null).cast(BooleanType)
      case Some(BooleanType) | None => compile(e)
      case Some(other) => throw new CypherCompileException(
        s"expected a boolean predicate, got $other",
        // TCK taxonomy: statically-detected type violations classify as
        // SyntaxError:InvalidArgumentType (TckStyleSpec24 pins NOT 3).
        CE.SyntaxError, CE.InvalidArgumentType)
    }

  private def envEntity(e: Expr): Option[(Column, StructType)] = e match {
    case Var(n) if env.contains(n) =>
      entityStructOf(env(n)._2).map(st => (env(n)._1, st))
    case _ => None
  }

  /** Any expression carrying an entity-struct VALUE: a lambda binder over
    * a materialized entity list (envEntity) or any value whose static
    * type is the flat entity-struct convention (_id first) — e.g. a
    * variable UNWOUND from collect(n). */
  private def entityValue(e: Expr): Option[(Column, StructType)] =
    envEntity(e).orElse(e match {
      case Var(n) if env.contains(n) => None // env binders handled above
      case _ => entityStructOf(inferType(e)).map(st => (compile(e), st))
    })

  /** True when the expression denotes an ENTITY in any representation
    * (header entity var, or an entity-struct value). */
  private def isEntityOperand(e: Expr): Boolean = (e match {
    case Var(n) if !env.contains(n) => header.kindOf(n).exists(k =>
      k.isInstanceOf[NodeKind] || k.isInstanceOf[RelKind])
    case _ => false
  }) || entityValue(e).isDefined

  /** Id column of an ENTITY operand in any representation: a header- or
    * env-bound entity var (already an id) or an entity-struct value. */
  private def entityIdCol(e: Expr): Option[Column] =
    entityValue(e).map { case (c, _) =>
      when(c.isNull, lit(null)).otherwise(c.getField("_id")) }
      .orElse(e match {
        case Var(n) if env.contains(n) &&
            entityStructOf(env(n)._2).isDefined => Some(compile(e))
        case Var(n) if !env.contains(n) && header.kindOf(n).exists(k =>
            k.isInstanceOf[NodeKind] || k.isInstanceOf[RelKind]) =>
          Some(compile(e))
        case _ => None
      })

  /** Both sides of an =/<> as id columns, when at least one side is an
    * entity STRUCT value (mixed-representation comparisons would
    * otherwise hit Spark struct-vs-long analysis errors). */
  private def entityCmpCols(l: Expr, r: Expr): Option[(Column, Column)] = {
    val structSide = entityValue(l).isDefined || entityValue(r).isDefined
    if (!structSide) None
    else for { a <- entityIdCol(l); b <- entityIdCol(r) } yield (a, b)
  }

  /** Element struct of a statically-typed entity-struct LIST. */
  private def entityElemSt(e: Expr): Option[StructType] = inferType(e) match {
    case Some(ArrayType(st: StructType, _))
        if ExprCompiler.isEntityStructType(st) => Some(st)
    case _ => None
  }

  /** Haystacks PROVABLY in the long-id entity-list representation:
    * nodes()/relationships() of a path, or a shape-preserving wrapper
    * over one (tail/reverse/slice/filter-comprehension/concat/coalesce).
    * Detection is syntactic on purpose — a generic ArrayType(LongType)
    * could just as well be an integer list, and id-normalizing THAT
    * would let `node IN [1, 2, 3]` return true on an id collision where
    * openCypher mandates cross-type-class false (ADVICE r12). */
  private def isPathIdList(e: Expr): Boolean = e match {
    case FuncCall("nodes" | "relationships", _, _) => true
    case FuncCall("tail" | "reverse", args, _) => args.exists(isPathIdList)
    case FuncCall("coalesce", args, _) => args.exists(isPathIdList)
    case Slice(s, _, _) => isPathIdList(s)
    case ListComprehension(_, list, _, None) => isPathIdList(list)
    case Arith("+", a, b) => isPathIdList(a) || isPathIdList(b)
    case _ => false
  }

  /** openCypher cross-type-class membership: an entity against a list of
    * non-entities (or vice versa) can never compare TRUE, so IN reduces
    * to the null ladder — null haystack is null, empty list is false,
    * then a null needle or any null element is null, else false. */
  private def crossClassIn(needle: Column, hay: Column): Column =
    when(hay.isNull, lit(null).cast(BooleanType))
      .when(F.size(hay) === 0, lit(false))
      .when(needle.isNull || F.exists(hay, e => e.isNull),
        lit(null).cast(BooleanType))
      .otherwise(lit(false))

  /** Rebuild an entity-struct column onto a UNION property schema
    * (markers kept, absent props null-filled) — lets entities with
    * different label/property sets share one Spark type inside lists,
    * CASE branches and coalesce. */
  private def rebuildEntityStruct(c: Column, st: StructType,
      unionProps: Seq[(String, DataType)]): Column = {
    val markers = st.fieldNames.filter(_.startsWith("_")).toSeq
      .map(m => c.getField(m).as(m))
    val pcols = unionProps.map { case (pk, t) =>
      (if (st.fieldNames.contains(pk)) c.getField(pk)
       else lit(null).cast(t)).as(pk)
    }
    when(c.isNull, lit(null)).otherwise(struct((markers ++ pcols): _*))
  }

  /** Columns of [[unifyTypedEntities]] alone (most callers need no type). */
  private def unifyEntities(args: Seq[Expr]): Option[Seq[Column]] =
    unifyTypedEntities(args).map(_._1)

  /** When EVERY operand is an entity of one genre (header entity vars,
    * entity-struct values, or null literals), compile each to an entity
    * struct over the UNION property schema — plus that union element
    * STRUCT TYPE, so inferType(ListLit/CASE/coalesce) reports exactly
    * what compile builds (r13: inferType used to report the element ID
    * type for a literal list of entity vars while compile built structs,
    * so type-driven dispatch around lists of entities mis-fired). */
  private def unifyTypedEntities(args: Seq[Expr])
      : Option[(Seq[Column], StructType)] = {
    case class Op(isRel: Boolean, props: Seq[(String, DataType)],
        build: Seq[(String, DataType)] => Column)
    def headerOp(n: String): Option[Op] =
      if (env.contains(n)) None
      else header.kindOf(n) match {
        case Some(k @ (NodeKind(_) | RelKind(_))) =>
          val isRel = k.isInstanceOf[RelKind]
          val props = header.ownedBy(n)
            .collect { case sl @ PropSlot(_, pk) =>
              (pk, colType(header.col(sl))) }
            .collect { case (pk, Some(t)) if !pk.startsWith("_") => (pk, t) }
            .sortBy(_._1)
          Some(Op(isRel, props, u => {
            val idc = col(header.col(IdSlot(n)))
            val markers =
              if (isRel) Seq(idc.as("_id"),
                storedEnd(n, src = true).as("_src"),
                storedEnd(n, src = false).as("_tgt"),
                col(header.col(TypeSlot(n))).as("_type"))
              else {
                val labels = header.ownedBy(n)
                  .collect { case sl @ LabelSlot(_, l) =>
                    when(col(header.col(sl)), lit(l)) }
                val lc =
                  if (labels.nonEmpty) array_compact(array(labels: _*))
                  else array().cast(ArrayType(StringType))
                Seq(idc.as("_id"), lc.as("_labels"))
              }
            val pcols = u.map { case (pk, t) =>
              header.get(PropSlot(n, pk)).map(col)
                .getOrElse(lit(null).cast(t)).as(pk) }
            when(idc.isNull, lit(null))
              .otherwise(struct((markers ++ pcols): _*))
          }))
        case _ => None
      }
    def structOp(e: Expr): Option[Op] = entityValue(e).map { case (c, st) =>
      val isRel = st.fieldNames.contains("_type")
      val props = st.fields.filterNot(_.name.startsWith("_"))
        .map(f => (f.name, f.dataType)).toSeq.sortBy(_._1)
      Op(isRel, props, u => rebuildEntityStruct(c, st, u))
    }
    if (args.isEmpty) return None
    val classified: Seq[Option[Op]] = args.map {
      case NullLit => None
      case Var(n) if headerOp(n).isDefined => Some(headerOp(n).get)
      case e => structOp(e) match {
        case Some(o) => Some(o)
        case None => return None // a non-entity, non-null operand
      }
    }
    val ops = classified.flatten
    if (ops.isEmpty || ops.map(_.isRel).distinct.size != 1) return None
    val u = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    ops.flatMap(_.props).foreach { case (k, t) =>
      u.get(k) match {
        case Some(t0) if t0 != t => return None
        case _ => u(k) = t
      }
    }
    val unionProps = u.toSeq.sortBy(_._1)
    val isRel = ops.head.isRel
    val nullT = StructType(
      (if (isRel) Seq(StructField("_id", LongType),
        StructField("_src", LongType), StructField("_tgt", LongType),
        StructField("_type", StringType))
      else Seq(StructField("_id", LongType),
        StructField("_labels", ArrayType(StringType)))) ++
        unionProps.map { case (k, t) => StructField(k, t) })
    Some((classified.map {
      case None => lit(null).cast(nullT)
      case Some(o) => o.build(unionProps)
    }, nullT))
  }

  /** Static type of [[entityValueStruct]]'s column. */
  private def entityValueStructType(n: String): Option[StructType] = {
    def propFields = header.ownedBy(n)
      .collect { case s @ PropSlot(_, k) => (k, colType(header.col(s))) }
      .filterNot(_._1.startsWith("_")).sortBy(_._1)
      .flatMap { case (k, t) => t.map(StructField(k, _)) }
    header.kindOf(n) match {
      case Some(NodeKind(_)) => Some(StructType(
        Seq(StructField("_id", LongType),
          StructField("_labels", ArrayType(StringType))) ++ propFields))
      case Some(RelKind(_)) => Some(StructType(
        Seq(StructField("_id", LongType), StructField("_src", LongType),
          StructField("_tgt", LongType), StructField("_type", StringType)) ++
          propFields))
      case _ => None
    }
  }

  /** The flat entity-struct VALUE (entityElementsDf convention: _id,
    * markers, then plain property fields) for a header-bound entity var —
    * built when an entity is captured INTO a value (collect(n)), so the
    * element keeps identity, labels/endpoints/type and properties through
    * list machinery and back out of UNWIND. */
  private[impl] def entityValueStruct(n: String): Option[Column] =
    header.kindOf(n) match {
      case Some(NodeKind(_)) =>
        val labels = header.ownedBy(n).collect { case s @ LabelSlot(_, l) =>
          when(col(header.col(s)), lit(l))
        }
        val labelCol =
          if (labels.nonEmpty) array_compact(array(labels: _*))
          else array().cast(ArrayType(StringType))
        val props = header.ownedBy(n)
          .collect { case s @ PropSlot(_, k) => (k, col(header.col(s))) }
          .filterNot(_._1.startsWith("_")).sortBy(_._1)
        val idc = col(header.col(IdSlot(n)))
        Some(when(idc.isNull, lit(null)).otherwise(struct(
          (Seq(idc.as("_id"), labelCol.as("_labels")) ++
            props.map { case (k, c) => c.as(k) }): _*)))
      case Some(RelKind(_)) =>
        val props = header.ownedBy(n)
          .collect { case s @ PropSlot(_, k) => (k, col(header.col(s))) }
          .filterNot(_._1.startsWith("_")).sortBy(_._1)
        val idc = col(header.col(IdSlot(n)))
        Some(when(idc.isNull, lit(null)).otherwise(struct(
          (Seq(idc.as("_id"),
            storedEnd(n, src = true).as("_src"),
            storedEnd(n, src = false).as("_tgt"),
            col(header.col(TypeSlot(n))).as("_type")) ++
            props.map { case (k, c) => c.as(k) }): _*)))
      case _ => None
    }

  /** Truthful (as-stored) endpoint of a bound rel var: a rel matched
    * through an UNDIRECTED pattern carries RevSlot marking traversal-
    * reversed rows (Planner.relScanDf); startNode()/endNode() must report
    * storage order regardless of how the pattern walked the rel. */
  private def storedEnd(n: String, src: Boolean): Column = {
    val fwd = F.col(header.col(if (src) SrcSlot(n) else TgtSlot(n)))
    header.get(RevSlot(n)) match {
      case Some(rc) =>
        F.when(F.coalesce(F.col(rc), F.lit(false)),
          F.col(header.col(if (src) TgtSlot(n) else SrcSlot(n)))).otherwise(fwd)
      case None => fwd
    }
  }

  /** LOCALTIME / TIME marker structs (see ExprCompiler.localTimeType). */
  private def isLocalTimeT(t: Option[DataType]): Boolean = t match {
    case Some(StructType(fs)) => fs.map(_.name).toSeq == Seq("_ltus")
    case _ => false
  }
  private def isTimeT(t: Option[DataType]): Boolean = t match {
    case Some(StructType(fs)) => fs.map(_.name).toSeq == Seq("_tutc", "_tzos")
    case _ => false
  }

  /** Durations are (months, days, micros) structs (CTDuration). */
  private def isDuration(e: Expr): Boolean = e match {
    case FuncCall("duration", _, _) => true
    case _ => inferType(e) match {
      case Some(StructType(fs)) =>
        fs.map(_.name).toSeq == Seq("months", "days", "micros")
      case _ => false
    }
  }

  /** duration ± duration: fieldwise on the normal form. */
  private def durFieldwise(a: Column, b: Column)
      (op: (Column, Column) => Column): Column =
    struct(
      op(a.getField("months"), b.getField("months")).as("months"),
      op(a.getField("days"), b.getField("days")).as("days"),
      op(a.getField("micros"), b.getField("micros")).as("micros"))

  /** duration × scalar (also /k as ×(1/k) and unary minus as ×(-1)):
    * each component group scales independently, fractions truncate toward
    * zero — groups never convert into each other. */
  private def durScale(d: Column, k: Column): Column =
    struct(
      (d.getField("months") * k).cast(LongType).as("months"),
      (d.getField("days") * k).cast(LongType).as("days"),
      (d.getField("micros") * k).cast(LongType).as("micros"))

  /** date/timestamp ± duration via make_interval; dates stay dates.
    * Cypher semantics (Neo4j temporal docs): components of the duration
    * finer than the temporal's resolution are DISCARDED, so date + PT25H
    * is the same date — only the months and days groups apply to a date. */
  private val DayUs = 86400000000L
  private def addDuration(l: Column, lType: Option[DataType], dur: Column,
      negate: Boolean): Column = {
    val sign = if (negate) -1L else 1L
    lType match {
      // Time-of-day + duration: only the seconds group applies (month/day
      // components shift the date, which a time has none of) and the
      // result wraps around midnight — Neo4j's rule.
      case t if isLocalTimeT(t) =>
        struct(pmod(l.getField("_ltus") + dur.getField("micros") * sign,
          lit(DayUs)).as("_ltus"))
      case t if isTimeT(t) =>
        val local = l.getField("_tutc") + l.getField("_tzos") * 1000000L
        val newLocal = pmod(local + dur.getField("micros") * sign, lit(DayUs))
        struct((newLocal - l.getField("_tzos") * 1000000L).as("_tutc"),
          l.getField("_tzos").as("_tzos"))
      case Some(DateType) =>
        val interval = call_function("make_interval",
          lit(0), dur.getField("months") * sign, lit(0),
          dur.getField("days") * sign, lit(0), lit(0), lit(0.0))
        (l.cast(TimestampType) + interval).cast(DateType)
      case _ =>
        val interval = call_function("make_interval",
          lit(0), dur.getField("months") * sign, lit(0),
          dur.getField("days") * sign, lit(0), lit(0),
          (dur.getField("micros") * sign).cast(DoubleType) / 1000000.0)
        l + interval
    }
  }
  private def isArrayT(e: Expr): Boolean =
    inferType(e).exists(_.isInstanceOf[ArrayType])

  // --------------------------------------------------------------- compile
  def compile(e: Expr): Column = e match {
    case Var(n) if env.contains(n) =>
      if (entityStructOf(env(n)._2).isDefined) env(n)._1.getField("_id")
      else env(n)._1
    case Var(n) => header.kindOf(n) match {
      case Some(ValueKind) => col(header.col(ValueSlot(n)))
      case Some(NodeKind(_)) | Some(RelKind(_)) => col(header.col(IdSlot(n)))
      case Some(ListRelKind(_)) | Some(ListNodeKind(_)) =>
        col(header.col(PathSlot(n)))
      case None => throw new CypherCompileException(s"unknown variable $n", CE.SyntaxError, CE.UndefinedVariable)
    }
    case Prop(Var(n), k) if env.contains(n) &&
        entityStructOf(env(n)._2).isDefined =>
      val st = entityStructOf(env(n)._2).get
      // absent property -> null, matching header-element semantics
      if (st.fieldNames.contains(k)) env(n)._1.getField(k) else lit(null)
    case Prop(Var(n), k) if !env.contains(n) && header.kinds.contains(n) =>
      header.kindOf(n) match {
        case Some(NodeKind(_)) | Some(RelKind(_)) =>
          header.get(PropSlot(n, k)) match {
            case Some(c) => col(c)
            case None => lit(null) // property absent from schema -> null
          }
        case _ => compileFieldAccess(compile(Var(n)), inferType(Var(n)), k)
      }
    case Prop(sub, k) => compileFieldAccess(compile(sub), inferType(sub), k)
    case Param(n) => litAny(params.getOrElse(n,
      throw new CypherCompileException(s"missing parameter $n", CE.ParameterMissing, CE.MissingParameter)))
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case StrLit(v) => lit(v)
    case BoolLit(v) => lit(v)
    case NullLit => lit(null)
    case ListLit(items) =>
      // a list of entities captures full entity structs over the union
      // property schema (heterogeneous label sets share one type)
      unifyEntities(items).map(array(_: _*))
        .getOrElse(array(items.map(compile): _*))
    case MapLit(items) =>
      // entity-var values capture the full entity struct ({node: n}); a
      // literal whose keys collide with the entity marker shape gets its
      // `_id` field tagged so it classifies as a plain map downstream.
      val collides = ExprCompiler.mapKeysCollideWithEntity(items.map(_._1))
      struct(items.map { case (k, v) =>
        val c = v match {
          case Var(n) if !env.contains(n) =>
            entityValueStruct(n).getOrElse(compile(v))
          case _ => compile(v)
        }
        if (collides && k == "_id") c.as(k, ExprCompiler.mapLiteralMeta)
        else c.as(k)
      }: _*)

    case Ands(es) => es.map(compileBoolOperand).reduce(_ && _)
    case Ors(es) => es.map(compileBoolOperand).reduce(_ || _)
    case Xor(l, r) => compileBoolOperand(l) =!= compileBoolOperand(r)
    case Not(x) => !compileBoolOperand(x)
    // Entity identity across representations: an entity-struct VALUE
    // (the collect(n) round-trip) compares to an id-bound entity var —
    // and to another struct value — by _id (Neo4j: element equality is
    // identity), never by Spark struct equality or a cross-class rule.
    case Cmp(op @ ("=" | "<>"), l, r) if entityCmpCols(l, r).isDefined =>
      val (lc, rc) = entityCmpCols(l, r).get
      if (op == "=") lc === rc else lc =!= rc
    // Cross-type-class semantics (openCypher): values of different type
    // classes are never EQUAL (false, null-propagating) and never ORDERED
    // (null). Spark would instead coerce ('1' = 1 -> true) or fail analysis
    // (true < 1), so the class check runs at compile time where both types
    // are statically known; unknown types fall through to Spark behavior.
    case Cmp("=", l, r) if crossClass(l, r) =>
      when(compile(l).isNull || compile(r).isNull, lit(null))
        .otherwise(lit(false))
    case Cmp("<>", l, r) if crossClass(l, r) =>
      when(compile(l).isNull || compile(r).isNull, lit(null))
        .otherwise(lit(true))
    case Cmp(op, l, r) if crossClass(l, r) &&
        Seq("<", "<=", ">", ">=").contains(op) =>
      // evaluate operands for their effects-free nullness only; result is
      // null either way (incomparable)
      lit(null).cast(BooleanType)
    // List/map equality under ternary logic (openCypher comparability
    // semantics; TCK "Comparing lists with null"): a length or key-set
    // mismatch is definite false; otherwise any pairwise-FALSE element
    // makes the whole comparison false, any null element (or null-vs-value
    // pair) makes it null, else true. Spark's native array/struct equality
    // treats null elements as EQUAL ([null] = [null] -> true) — the
    // reference inherits that and blacklists the TCK rows
    // (morpheus-tck failing_blacklist); here the openCypher answer is
    // compiled directly. Applies only when both sides are statically
    // list/map typed; paths and entity structs keep identity semantics.
    case Cmp("=", l, r) if ternaryEqTypes(l, r).isDefined =>
      val (lt, rt) = ternaryEqTypes(l, r).get
      ternaryEq(compile(l), compile(r), lt, rt)
    case Cmp("<>", l, r) if ternaryEqTypes(l, r).isDefined =>
      val (lt, rt) = ternaryEqTypes(l, r).get
      !ternaryEq(compile(l), compile(r), lt, rt)
    case Cmp("=", l, r) => compile(l) === compile(r)
    case Cmp("<>", l, r) => compile(l) =!= compile(r)
    // Ordering over lists: ternary lexicographic (see cmp3). Over plain
    // maps: openCypher leaves maps unordered — always null.
    case Cmp(op, l, r) if Seq("<", "<=", ">", ">=").contains(op) &&
        ternaryEqTypes(l, r).exists(_._1.isInstanceOf[ArrayType]) =>
      val c = cmp3(compile(l), compile(r), ternaryEqTypes(l, r).get._1)
      val cmp = op match {
        case "<" => c === -1
        case "<=" => c <= 0
        case ">" => c === 1
        case ">=" => c >= 0
      }
      when(c.isNull, lit(null).cast(BooleanType)).otherwise(cmp)
    case Cmp(op, l, r) if Seq("<", "<=", ">", ">=").contains(op) &&
        ternaryEqTypes(l, r).isDefined =>
      // both sides statically plain maps
      when(compile(l).isNotNull && compile(r).isNotNull,
        lit(null).cast(BooleanType))
    case Cmp("<", l, r) => compile(l) < compile(r)
    case Cmp("<=", l, r) => compile(l) <= compile(r)
    case Cmp(">", l, r) => compile(l) > compile(r)
    case Cmp(">=", l, r) => compile(l) >= compile(r)
    case IsNull(x, false) => compile(x).isNull
    case IsNull(x, true) => compile(x).isNotNull
    case IsTyped(x, spec, negated) => compileIsTyped(x, spec, negated)
    // Cypher 5 `x IS [NOT] [form] NORMALIZED`: true iff x equals its own
    // NF* normalization. Null subject -> null; a statically non-string
    // subject is null too (Neo4j semantics — the predicate never raises).
    case IsNormalized(x, form, negated) => inferType(x) match {
      case Some(StringType) =>
        val c = compile(x)
        val eq = c === graft.functions.UnicodeNormalize.normalize(c, form)
        if (negated) !eq else eq
      case _ => lit(null).cast(BooleanType)
    }
    // Cypher: `x IN []` is false for every x, including null.
    case In(_, ListLit(items)) if items.isEmpty => lit(false)
    // Entity needle or entity items in a literal list: compare by id
    // (entity identity). An entity against a non-entity item is a
    // cross-type-class comparison — never true, null only through a null
    // side (ADVICE r12: previously `m IN [n1, n2]` leaked a Spark
    // struct-vs-long DATATYPE_MISMATCH from the isin fallthrough below).
    case In(l, ListLit(items)) if isEntityOperand(l) ||
        items.exists(isEntityOperand) =>
      val lid = entityIdCol(l)
      val lc = lid.getOrElse(compile(l))
      val cmps = items.map { i =>
        (lid, entityIdCol(i)) match {
          case (Some(a), Some(b)) =>
            when(a.isNull || b.isNull, lit(null).cast(BooleanType))
              .otherwise(a === b)
          case (None, None) =>
            // Neither side is an entity — reachable when the branch fired
            // via a DIFFERENT entity item in a mixed list (`1 IN [n, 1]`).
            // Real equality through the full Cmp ladder (cross-class,
            // container-ternary, plain), not cross-type-class FALSE
            // (ADVICE r13).
            compile(Cmp("=", l, i))
          case _ => // exactly one side is an entity: cross-type-class
            val ic = entityIdCol(i).getOrElse(compile(i))
            when(lc.isNull || ic.isNull, lit(null).cast(BooleanType))
              .otherwise(lit(false))
        }
      }
      when(cmps.map(c => c <=> lit(true)).reduce(_ || _), lit(true))
        .when(cmps.map(_.isNull).reduce(_ || _),
          lit(null).cast(BooleanType))
        .otherwise(lit(false))
    // IN with a list/map needle: openCypher defines IN through ternary
    // equality — any TRUE comparison wins, else any null comparison makes
    // the result null, else false. Spark's isin/array_contains would use
    // native array equality ([1,null] IN [[1,null]] -> true; TCK: null).
    case In(l, ListLit(items)) if containerTyped(l) =>
      val lt = inferType(l).get
      val lc = compile(l)
      val cmps = items.map(i =>
        ternaryEq(lc, compile(i), lt, inferType(i).getOrElse(lt)))
      when(cmps.map(c => c <=> lit(true)).reduce(_ || _), lit(true))
        .when(cmps.map(_.isNull).reduce(_ || _),
          lit(null).cast(BooleanType))
        .otherwise(lit(false))
    case In(l, ListLit(items)) =>
      compile(l).isin(items.map(compile): _*)
    // Null needle against a dynamic list: false when empty, else null
    // (array_contains rejects NullType literals outright).
    case In(NullLit, r) =>
      when(F.size(compile(r)) === 0, lit(false))
        .otherwise(lit(null).cast(BooleanType))
    // `x IN null` is null (array_contains rejects the VOID-typed literal).
    case In(_, NullLit) => lit(null).cast(BooleanType)
    // Entity membership across representations: id-normalize ONLY
    // provably-entity haystacks — struct-element lists and path-derived
    // nodes()/relationships() id lists. An entity needle against any
    // OTHER list (an integer array, a parameter) is cross-type-class and
    // can never be true — id-normalizing there would turn an id
    // collision into a wrong TRUE (ADVICE r12).
    case In(l, r) if entityElemSt(r).isDefined =>
      entityIdCol(l) match {
        case Some(id) =>
          array_contains(transform(compile(r), x => x.getField("_id")), id)
        case None => crossClassIn(compile(l), compile(r))
      }
    case In(l, r) if isEntityOperand(l) =>
      // Provably non-entity haystacks: a parameter (params cannot carry
      // entities) or a list whose static element type is not LONG. A bare
      // ArrayType(LongType) stays id membership — `WITH nodes(p) AS ns
      // ... WHERE n IN ns` loses the path provenance but is still an
      // entity list; crossing it would break the common rebinding shape.
      val provablyNonEntity = r match {
        case Param(_) => true
        case FuncCall("range", _, _) => true
        case _ => inferType(r) match {
          case Some(ArrayType(et, _)) => et != LongType
          case _ => false
        }
      }
      if (provablyNonEntity && !isPathIdList(r))
        crossClassIn(entityIdCol(l).getOrElse(compile(l)), compile(r))
      else array_contains(compile(r), entityIdCol(l).get)
    case In(l, r) if containerTyped(l) =>
      val lt = inferType(l).get
      val lc = compile(l)
      val rc = compile(r)
      val cmps = transform(rc, e => elem3vlEq(lc, e, lt))
      when(rc.isNull, lit(null).cast(BooleanType))
        .when(F.exists(cmps, c => c), lit(true))
        .when(F.exists(cmps, c => c.isNull), lit(null).cast(BooleanType))
        .otherwise(lit(false))
    case In(l, r) => array_contains(compile(r), compile(l))
    case StartsWith(l, r) => compile(l).startsWith(compile(r))
    case EndsWith(l, r) => compile(l).endsWith(compile(r))
    case ast.Contains(l, r) => compile(l).contains(compile(r))
    case RegexMatch(l, r) =>
      // Cypher =~ matches the ENTIRE string (Neo4j semantics); Spark's
      // regexp_like is a substring search, so anchor the pattern.
      regexp_like(compile(l),
        concat(lit("^(?:"), compile(r).cast(StringType), lit(")$")))
    case HasLabels(Var(n), labels) if env.contains(n) &&
        entityStructOf(env(n)._2).isDefined =>
      val (c, st) = envEntity(Var(n)).get
      if (!st.fieldNames.contains("_labels"))
        throw new CypherCompileException(
          s"label predicate on relationship $n",
          CE.TypeError, CE.InvalidArgumentType)
      labels.map(l => array_contains(c.getField("_labels"), l)).reduce(_ && _)
    case HasLabels(Var(n), labels) if !env.contains(n) =>
      header.kindOf(n) match {
        // `r:KNOWS` on a RELATIONSHIP variable is a type predicate
        // (Cypher 5); a rel has exactly one type, so a conjunction of
        // several distinct types is statically false. Previously this
        // fell through to absent LabelSlots and read silently false.
        case Some(RelKind(staticTypes)) =>
          if (labels.size > 1) lit(false)
          else header.get(TypeSlot(n)) match {
            case Some(c) => col(c) === labels.head
            case None if staticTypes.nonEmpty =>
              lit(staticTypes.contains(labels.head))
            case None => throw new CypherCompileException(
              s"type predicate on $n needs the relationship type in scope",
              CE.SyntaxError, CE.InvalidArgumentType)
          }
        case _ =>
          labels.map { l =>
            header.get(LabelSlot(n, l)).map(col).getOrElse(lit(false))
          }.reduce(_ && _)
      }
    case HasLabels(_, _) =>
      throw new CypherCompileException("label predicate on non-variable")
    // Dynamic label predicate `n:$(expr)` (Neo4j 5.26/2025): a STRING is
    // one required label, a LIST<STRING> a conjunction (all must be
    // present). A null expr value matches nothing; an empty list is a
    // vacuous constraint. Compiles to array ops over labels(n) — stays
    // inside whole-stage codegen.
    // Dynamic relationship type `-[r:$(expr)]->`: a STRING is one required
    // type; a LIST<STRING> is a union (a rel carries exactly one type).
    // null matches nothing, also under negation (Neo4j: null never
    // satisfies a pattern predicate).
    // Both dynamic predicates evaluate three-valued: a null expr value
    // yields NULL, which the planner's filter sites drop — and, crucially,
    // NULL survives an enclosing Not() (`:!$(null)` must also match
    // nothing; a per-term coalesce-to-false here would flip to match-all
    // under the negation). The planner only ever uses these as filters /
    // join conditions, never as values, so NULL never escapes to a result.
    case HasDynType(sub, e, negated) =>
      val tv = compile(FuncCall("type", Seq(sub), distinct = false))
      val ev = compile(e)
      val core = dynLabelType(e, "dynamic relationship type") match {
        case Some(ArrayType(_, _)) => array_contains(ev, tv)
        case _ => tv === ev.cast(StringType)
      }
      if (negated) !core else core
    case HasDynLabels(sub, e) =>
      val lv = compile(FuncCall("labels", Seq(sub), distinct = false))
      val ev = compile(e)
      dynLabelType(e, "dynamic label") match {
        // forall's 3VL is exactly right: an absent label gives false
        // (array_contains only returns null for a null probe), a null
        // element gives null — so a list with a null matches nothing,
        // under either polarity.
        case Some(ArrayType(_, _)) =>
          forall(ev, x => array_contains(lv, x.cast(StringType)))
        case _ =>
          array_contains(lv, ev.cast(StringType))
      }

    // Duration algebra first: duration ± duration is fieldwise on the
    // (months, days, micros) normal form; scaling multiplies each group
    // and truncates toward zero (no cross-group carry — groups never
    // convert into each other, same rule as the component accessors).
    case Arith("+", l, r) if isDuration(l) && isDuration(r) =>
      durFieldwise(compile(l), compile(r))(_ + _)
    case Arith("-", l, r) if isDuration(l) && isDuration(r) =>
      durFieldwise(compile(l), compile(r))(_ - _)
    case Arith("*", l, r) if isDuration(l) =>
      durScale(compile(l), compile(r))
    case Arith("*", l, r) if isDuration(r) =>
      durScale(compile(r), compile(l))
    case Arith("/", l, r) if isDuration(l) =>
      // Guard the divisor: duration / 0 must be null, not the Long.MaxValue
      // clamp that Infinity-scaled components would cast to (Neo4j errors;
      // null is our non-ANSI analogue).
      val k = compile(r)
      when(k === 0, lit(null)).otherwise(durScale(compile(l), lit(1.0) / k))
    case Neg(x) if isDuration(x) =>
      durScale(compile(x), lit(-1L))
    case Arith("+", l, r) if isDuration(r) =>
      addDuration(compile(l), inferType(l), compile(r), negate = false)
    case Arith("-", l, r) if isDuration(r) =>
      addDuration(compile(l), inferType(l), compile(r), negate = true)
    // Two temporal INSTANTS don't subtract or add in Cypher (Neo4j type
    // error; duration.between is the difference operator) — without this
    // Spark's date subtraction would leak a raw INTERVAL value that
    // nothing else in the engine can consume.
    case Arith("+" | "-", l, r)
        if Seq(inferType(l), inferType(r)).forall { t =>
          t.exists {
            case DateType | TimestampType | TimestampNTZType => true
            case _ => isLocalTimeT(t) || isTimeT(t)
          }
        } =>
      throw new CypherCompileException(
        "temporal instants cannot be added or subtracted; " +
          "use duration.between(a, b)",
        CE.SyntaxError, CE.InvalidArgumentType)
    // List concat/append take precedence over string concat (the
    // reference's Add dispatch, SparkSQLExprMapper.scala:170-187):
    // list+list concatenates, list+scalar / scalar+list appends.
    case Arith("+", l, r) if isArrayT(l) && isArrayT(r) =>
      // entity lists with different property schemas concat onto the
      // union schema (same genre only); identical types take the fast path
      def elemSt(e: Expr): Option[StructType] = entityElemSt(e)
      (elemSt(l), elemSt(r)) match {
        case (Some(lt), Some(rt)) if lt != rt &&
            lt.fieldNames.contains("_type") == rt.fieldNames.contains("_type") =>
          val u = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
          (lt.fields ++ rt.fields).filterNot(_.name.startsWith("_"))
            .foreach(f => u.get(f.name) match {
              case Some(t0) if t0 != f.dataType =>
                throw new CypherCompileException(
                  s"cannot concatenate entity lists: property ${f.name} " +
                    s"has conflicting types", CE.TypeError,
                  CE.InvalidArgumentType)
              case _ => u(f.name) = f.dataType
            })
          val up = u.toSeq.sortBy(_._1)
          concat(
            transform(compile(l), x => rebuildEntityStruct(x, lt, up)),
            transform(compile(r), x => rebuildEntityStruct(x, rt, up)))
        // Mixed representations (ADVICE r12): an entity-struct list
        // concatenated with a path-derived id list normalizes the struct
        // side down to ids — the result stays in the id-list convention
        // (isPathIdList propagates through `+`, so membership and lambda
        // materialization keep working). An entity-struct list against a
        // NON-entity list has no shared Spark element type — classified
        // refusal instead of a leaked DATATYPE_MISMATCH.
        case (Some(_), None) if isPathIdList(r) =>
          concat(transform(compile(l), x => x.getField("_id")), compile(r))
        case (None, Some(_)) if isPathIdList(l) =>
          concat(compile(l), transform(compile(r), x => x.getField("_id")))
        case (Some(lt), Some(rt)) if lt != rt =>
          // node list + relationship list: no union struct exists
          throw new CypherCompileException(
            "cannot concatenate node and relationship lists",
            CE.TypeError, CE.InvalidArgumentType)
        case (Some(_), None) | (None, Some(_)) =>
          throw new CypherCompileException(
            "cannot concatenate an entity list with a non-entity list",
            CE.TypeError, CE.InvalidArgumentType)
        case _ => concat(compile(l), compile(r))
      }
    case Arith("+", l, r) if isArrayT(l) =>
      concat(compile(l), array(compile(r)))
    case Arith("+", l, r) if isArrayT(r) =>
      concat(array(compile(l)), compile(r))
    case Arith("+", l, r) if isStringy(l) || isStringy(r) =>
      concat(compile(l).cast(StringType), compile(r).cast(StringType))
    case Arith("+", l, r) => compile(l) + compile(r)
    case Arith("-", l, r) => compile(l) - compile(r)
    case Arith("*", l, r) => compile(l) * compile(r)
    case Arith("/", l, r) =>
      (inferType(l), inferType(r)) match {
        case (Some(LongType), Some(LongType)) =>
          // Neo4j raises on integer division by zero; the literal form is
          // compile-time checkable. A dynamic zero divisor stays null
          // (Spark non-ANSI; raising would need a task-side throw —
          // documented deviation, tck_blacklist.md).
          r match {
            case IntLit(0) | Neg(IntLit(0)) => throw new CypherCompileException(
              "/ by zero", CE.ArithmeticError, CE.DivisionByZero)
            case _ =>
          }
          try_divide(compile(l), compile(r)).cast(LongType)
        case (lt, rt) if lt.contains(DoubleType) || rt.contains(DoubleType) =>
          // IEEE-754 float division (Neo4j): x/0.0 is ±Infinity, 0.0/0.0
          // and NaN/0.0 are NaN. Spark's non-ANSI Divide nulls every zero
          // divisor, so the zero branch is rebuilt by hand (when-chain —
          // stays inside whole-stage codegen). -0.0 is not distinguished.
          val lc = compile(l).cast(DoubleType)
          val rc = compile(r).cast(DoubleType)
          // NaN must be tested BEFORE the sign branches: Spark's ordering
          // treats NaN as greater than every double, so `lc > 0.0` would
          // send NaN/0.0 to +Infinity instead of NaN.
          when(rc === 0.0,
            when(lc.isNull, lit(null).cast(DoubleType))
              .when(isnan(lc), lit(Double.NaN))
              .when(lc > 0.0, lit(Double.PositiveInfinity))
              .when(lc < 0.0, lit(Double.NegativeInfinity))
              .otherwise(lit(Double.NaN))) // 0.0 numerator
            .otherwise(lc / rc)
        case _ => compile(l) / compile(r)
      }
    case Arith("%", l, r) =>
      (inferType(l), inferType(r)) match {
        case (Some(LongType), Some(LongType)) =>
          r match {
            case IntLit(0) | Neg(IntLit(0)) => throw new CypherCompileException(
              "% by zero", CE.ArithmeticError, CE.DivisionByZero)
            case _ =>
          }
          compile(l) % compile(r)
        case (lt, rt) if lt.contains(DoubleType) || rt.contains(DoubleType) =>
          // IEEE: x % 0.0 is NaN (Neo4j); Spark non-ANSI nulls it.
          val lc = compile(l).cast(DoubleType)
          val rc = compile(r).cast(DoubleType)
          when(rc === 0.0, when(lc.isNotNull, lit(Double.NaN)))
            .otherwise(lc % rc)
        case _ => compile(l) % compile(r)
      }
    case Arith("^", l, r) => pow(compile(l), compile(r))
    case Arith(op, _, _) =>
      throw new CypherCompileException(s"unknown arithmetic op $op")
    case Neg(x) => negate(compile(x))

    case CountStar => count(lit(1))
    case fc: FuncCall => compileFunc(fc)

    case CaseExpr(Some(subject), alts, default) =>
      val s = compile(subject)
      // entity-valued branches unify onto one struct schema
      val resCols = unifyEntities(alts.map(_._2) ++ default.toSeq)
        .map(_.toIndexedSeq)
      def valOf(i: Int, e: Expr): Column =
        resCols.map(_(i)).getOrElse(compile(e))
      val first = when(s === compile(alts.head._1), valOf(0, alts.head._2))
      val chained = alts.tail.zipWithIndex.foldLeft(first) {
        case (acc, ((c, v), ix)) => acc.when(s === compile(c), valOf(ix + 1, v))
      }
      default.map(d => chained.otherwise(valOf(alts.size, d)))
        .getOrElse(chained)
    case CaseExpr(None, alts, default) =>
      // A literal-null condition must type as boolean (never taken),
      // not crash analysis with VOID. A statically non-boolean condition
      // is a classified type error (Neo4j: "expected Boolean"), not a
      // leaked Spark DATATYPE_MISMATCH.
      def cond(c: Expr): Column =
        if (inferType(c).contains(NullType)) lit(null).cast(BooleanType)
        else {
          inferType(c).foreach {
            case BooleanType => ()
            case other => throw new CypherCompileException(
              s"CASE WHEN condition must be a boolean, got $other",
              CE.SyntaxError, CE.InvalidArgumentType)
          }
          compile(c)
        }
      val resCols = unifyEntities(alts.map(_._2) ++ default.toSeq)
        .map(_.toIndexedSeq)
      def valOf(i: Int, e: Expr): Column =
        resCols.map(_(i)).getOrElse(compile(e))
      val first = when(cond(alts.head._1), valOf(0, alts.head._2))
      val chained = alts.tail.zipWithIndex.foldLeft(first) {
        case (acc, ((c, v), ix)) => acc.when(cond(c), valOf(ix + 1, v))
      }
      default.map(d => chained.otherwise(valOf(alts.size, d)))
        .getOrElse(chained)

    // Dynamic property access on a header entity: n[key]. Properties are
    // flattened columns, so a literal key is exact column access (absent
    // from schema -> null, same as n.prop) and a dynamic key compiles to a
    // when-chain over the entity's property columns. The chain needs one
    // result type: identical types pass through, mixed numerics widen to
    // FLOAT, anything else is a classified error (the flattened-columns
    // encoding cannot express ANY-typed results).
    case Index(Var(n), idx) if !env.contains(n) &&
        (header.kindOf(n) match {
          case Some(NodeKind(_)) | Some(RelKind(_)) => true
          case _ => false
        }) =>
      idx match {
        case StrLit(k) =>
          header.get(PropSlot(n, k)).map(col).getOrElse(lit(null))
        case _ =>
          requireKeyType(idx, wantString = true)
          val props = header.ownedBy(n).collect { case p: PropSlot => p }
            .sortBy(_.key)
          val types = props.flatMap(p => header.get(p).flatMap(colType))
          val numeric = Set[DataType](LongType, DoubleType, IntegerType,
            FloatType, ShortType, ByteType)
          val target: Option[DataType] =
            if (types.isEmpty) None
            else if (types.distinct.size == 1) Some(types.head)
            else if (types.forall(numeric)) Some(DoubleType)
            else throw new CypherCompileException(
              s"dynamic property access $n[...] needs properties of one " +
                s"type (or all numeric); $n has ${types.distinct.mkString(", ")}",
              CE.ArgumentError, CE.InvalidArgumentType)
          val key = compile(idx)
          props.foldLeft(target.map(t => lit(null).cast(t))
              .getOrElse(lit(null))) { (acc, p) =>
            val c = col(header.col(p))
            when(key === lit(p.key),
              target.map(c.cast).getOrElse(c)).otherwise(acc)
          }
      }
    case Index(sub, idx) => inferType(sub) match {
      // Struct-backed map with a LITERAL key: exact field access — routing
      // it through the dynamic when-chain would let CaseWhen coerce all
      // value types to a common one (e.g. {name:'x', age:1}['age'] -> '1').
      case Some(st: StructType) =>
        idx match {
          case StrLit(key) =>
            if (st.fieldNames.contains(key)) compile(sub).getField(key)
            else lit(null) // missing key -> null (map semantics)
          case _ =>
            requireKeyType(idx, wantString = true)
            compileFieldAccessDyn(compile(sub), inferType(sub), compile(idx))
        }
      case Some(_: MapType) =>
        requireKeyType(idx, wantString = true)
        compileFieldAccessDyn(compile(sub), inferType(sub), compile(idx))
      // Indexing a statically-null subject: Cypher yields null, but
      // Spark's get() rejects the VOID-typed column at analysis.
      case Some(NullType) => lit(null)
      case subT =>
        if (subT.exists(_.isInstanceOf[ArrayType]))
          requireKeyType(idx, wantString = false)
        // Cypher list index is 0-based; negative counts from the end.
        val c = compile(sub)
        idx match {
          case IntLit(i) if i >= 0 => F.get(c, lit(i.toInt))
          case IntLit(i) => element_at(c, i.toInt)
          case _ =>
            val i = compile(idx)
            when(i >= 0, F.get(c, i.cast(IntegerType)))
              .otherwise(element_at(c, i.cast(IntegerType)))
        }
    }
    case ast.Slice(sub, from, to) =>
      // Cypher [a..b]: 0-based, end-exclusive.
      val c = compile(sub)
      val f = from.map(compile(_).cast(IntegerType)).getOrElse(lit(0))
      val t = to.map(compile(_).cast(IntegerType)).getOrElse(F.size(c))
      val fNorm = when(f < 0, F.size(c) + f).otherwise(f)
      val tNorm = when(t < 0, F.size(c) + t).otherwise(t)
      F.slice(c, fNorm + 1, greatest(tNorm - fNorm, lit(0)))

    // HOFs over a literal null: Cypher yields null, but Spark's array HOFs
    // reject the VOID-typed null at analysis — short-circuit them here.
    case ListComprehension(_, NullLit, _, _) => lit(null)
    case IterablePredicate(_, _, NullLit, _) => lit(null)
    case Reduce(_, _, _, NullLit, _) => lit(null)
    case ListComprehension(v, listE, whereE, projE) =>
      val listC = compile(listE)
      val et = inferType(listE).collect { case ArrayType(t, _) => t }
      val filtered = whereE match {
        case Some(w) => F.filter(listC, x => lambda(v, x, et).compile(w))
        case None => listC
      }
      projE match {
        case Some(pe) => transform(filtered, x => lambda(v, x, et).compile(pe))
        case None => filtered
      }
    case IterablePredicate(kind, v, listE, pred) =>
      val listC = compile(listE)
      val et = inferType(listE).collect { case ArrayType(t, _) => t }
      def p(x: Column) = lambda(v, x, et).compile(pred)
      kind match {
        case "any" => exists(listC, p)
        case "all" => forall(listC, p)
        case "none" => !exists(listC, p)
        // single is three-valued like its siblings (exists/forall carry
        // Spark's native 3VL): with t = #true and u = #unknown elements,
        // t>1 is definitely false; any unknown otherwise makes the count
        // unknowable (an unknown could be another true) → NULL; else t==1.
        // A null list falls through every branch to NULL (size(null) is
        // null, so no WHEN matches and the otherwise compares null).
        case "single" =>
          val t = F.size(F.filter(listC, x => F.coalesce(p(x), lit(false))))
          val u = F.size(F.filter(listC, x => p(x).isNull))
          when(t > 1, lit(false))
            .when(u > 0, lit(null).cast(BooleanType))
            .otherwise(t === 1)
      }
    case Reduce(accName, init, v, listE, step) =>
      val listC = compile(listE)
      val et = inferType(listE).collect { case ArrayType(t, _) => t }
      // An empty-list initial value types as ARRAY<VOID>, which Spark's
      // aggregate rejects; retype it from the list's element type — the
      // accumulator of a concat-flatten IS the element type (an array),
      // that of an append is an array OF the element type.
      val initT = inferType(init) match {
        case Some(ArrayType(NullType, _)) => et.map {
          case a: ArrayType => a: DataType
          case other => ArrayType(other): DataType
        }.orElse(inferType(init))
        case other => other
      }
      F.aggregate(listC, compile(init).cast(initT.getOrElse(LongType)),
        (acc, x) => lambda(accName, acc, initT).lambda(v, x, et).compile(step))

    case MapProjection(v, items) =>
      val isElement = header.kindOf(v) match {
        case Some(NodeKind(_)) | Some(RelKind(_)) => true
        case _ => false
      }
      // Entity-struct VALUES (lambda binders over materialized entity
      // lists, unwound collected nodes) read fields off the STRUCT — a
      // bare compile(Var) of such a binder means its _id (identity
      // semantics), which would leak a getField-on-long analysis error
      // here (r13 probe batch).
      val structVal: Option[(Column, StructType)] = entityValue(Var(v))
      val fields = items.flatMap {
        case ProjProp(k) =>
          if (isElement)
            Seq(header.get(PropSlot(v, k)).map(c => col(c).as(k))
              .getOrElse(lit(null).as(k)))
          else structVal match {
            case Some((c, st)) =>
              // absent property -> null, matching header-element semantics
              Seq((if (st.fieldNames.contains(k)) c.getField(k)
                else lit(null)).as(k))
            case None => Seq(compile(Var(v)).getField(k).as(k))
          }
        case ProjExpr(k, e2) => Seq(compile(e2).as(k))
        case ProjAll =>
          if (isElement)
            header.ownedBy(v).collect { case s @ PropSlot(_, k) => (k, s) }
              .sortBy(_._1).map { case (k, s) => col(header.col(s)).as(k) }
          else structVal match {
            // entity-struct value: all property fields (markers excluded)
            case Some((c, st)) =>
              st.fieldNames.filterNot(_.startsWith("_")).toSeq.sorted
                .map(k => c.getField(k).as(k))
            case None => inferType(Var(v)) match {
              // plain struct-typed value (a map): all fields
              case Some(st: StructType) =>
                val c = compile(Var(v))
                st.fieldNames.filterNot(_.startsWith("_")).toSeq.sorted
                  .map(k => c.getField(k).as(k))
              case _ => Seq.empty
            }
          }
        case ProjVar(name) => Seq(compile(Var(name)).as(name))
      }
      struct(fields: _*)

    case _: PatternPredicate =>
      throw new CypherCompileException(
        "pattern predicate must be planned as a subquery, not compiled inline")
    case PatternComp(_, _, _) =>
      throw new CypherCompileException(
        "pattern comprehension is only supported in RETURN/WITH items and WHERE")
    case other =>
      throw new CypherCompileException(s"unsupported expression $other")
  }

  private def lambda(v: String, c: Column, t: Option[DataType]): ExprCompiler =
    withEnv(v, c, t)

  /** Micros-of-day of another temporal value, for conversions and
    * composition (Neo4j: localtime(dt) truncates to the time-of-day;
    * datetime({date, time}) composes): a LOCALTIME's own field, a TIME's
    * wall time, or a timestamp's time-of-day. None for non-time types. */
  private def localUsOf(e: Expr): Option[Column] = {
    val t = inferType(e)
    lazy val c = compile(e)
    if (isLocalTimeT(t)) Some(c.getField("_ltus"))
    else if (isTimeT(t))
      Some(c.getField("_tutc") + c.getField("_tzos") * 1000000L)
    else if (t.exists(x => x == TimestampType || x == TimestampNTZType))
      Some((hour(c).cast(LongType) * 3600L +
        F.minute(c).cast(LongType) * 60L) * 1000000L +
        (call_function("date_part", lit("SECOND"), c) * 1000000L)
          .cast(LongType))
    else None
  }

  /** Compile a `date:` map entry to a DateType column (accepts date or
    * datetime bases — the TCK's temporal-select inputs). */
  private def dateBaseOf(e: Expr, fn: String): Column = {
    val t = inferType(e)
    val c = compile(e)
    if (t.contains(DateType)) c
    else if (t.exists(x => x == TimestampType || x == TimestampNTZType))
      c.cast(DateType)
    else throw new CypherCompileException(
      s"$fn date component must be a date or datetime value",
      CE.SyntaxError, CE.InvalidArgumentType)
  }

  /** Selection with overrides over a time-of-day base (TCK
    * TemporalSelectAcceptance): every base component is KEPT unless the
    * map overrides it. Components are the ADDITIVE second/millisecond/
    * microsecond convention the component constructor uses (millisecond
    * 0-999 plus microsecond-within-millisecond), so select and construct
    * compose the same way. Returns micros since midnight. */
  private def selectTimeUs(m: Map[String, Expr], base: Column): Column = {
    def ov(k: String, dflt: Column): Column =
      m.get(k).map(e => compile(e).cast(LongType)).getOrElse(dflt)
    // Column./ is double division — cast back to Long for exact components.
    ov("hour", (base / 3600000000L).cast(LongType)) * 3600000000L +
      ov("minute", (base / 60000000L).cast(LongType) % 60) * 60000000L +
      ov("second", (base / 1000000L).cast(LongType) % 60) * 1000000L +
      ov("millisecond", (base / 1000L).cast(LongType) % 1000) * 1000L +
      ov("microsecond", base % 1000L)
  }

  /** Optional third-argument override map of localtime/time.truncate:
    * overrides apply to the truncated local clock via [[selectTimeUs]]. */
  private def timeTruncOverrides(args: Seq[Expr], fn: String,
      trunc: Column): Column =
    if (args.length < 3) trunc
    else args(2) match {
      case MapLit(items) =>
        val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
        val allowed =
          Set("hour", "minute", "second", "millisecond", "microsecond")
        val extra = m.keySet -- allowed
        if (extra.nonEmpty) throw new CypherCompileException(
          s"$fn override map supports ${allowed.toSeq.sorted.mkString("/")}" +
            s", got: ${extra.mkString(", ")}",
          CE.ArgumentError, CE.InvalidArgumentValue)
        selectTimeUs(m, trunc)
      case other => throw new CypherCompileException(
        s"$fn third argument must be a map of component overrides, " +
          s"got $other",
        CE.SyntaxError, CE.InvalidArgumentType)
    }

  /** Time-of-day component accessor over a micros-since-midnight column. */
  private def localTimeAccessor(us: Column, k: String): Column =
    k.toLowerCase match {
      case "hour" => (us / 3600000000L).cast(LongType)
      case "minute" => (us / 60000000L).cast(LongType) % 60
      case "second" => (us / 1000000L).cast(LongType) % 60
      case "millisecond" => (us / 1000L).cast(LongType) % 1000
      case "microsecond" => us % 1000000L
      case other =>
        throw new CypherCompileException(s"unknown time accessor $other")
    }

  /** HH:MM:SS[.ffffff] rendering of micros-since-midnight (fraction only
    * when non-zero, trailing zeros trimmed — Neo4j's time rendering). */
  private def localTimeIso(us: Column): Column = {
    def two(c: Column) = lpad(c.cast(StringType), 2, "0")
    val frac = us % 1000000L
    concat(two(localTimeAccessor(us, "hour")), lit(":"),
      two(localTimeAccessor(us, "minute")), lit(":"),
      two(localTimeAccessor(us, "second")),
      when(frac =!= 0, concat(lit("."),
        regexp_replace(lpad(frac.cast(StringType), 6, "0"), "0+$", "")))
        .otherwise(lit("")))
  }

  /** ±HH:MM offset rendering; UTC renders as 'Z' (Neo4j). */
  private def offsetIso(os: Column): Column = {
    def two(c: Column) = lpad(c.cast(StringType), 2, "0")
    val a = F.abs(os)
    when(os === 0, lit("Z")).otherwise(concat(
      when(os < 0, lit("-")).otherwise(lit("+")),
      two((a / 3600L).cast(LongType)), lit(":"),
      two((a % 3600L / 60L).cast(LongType))))
  }

  /** ISO-8601 rendering of the (months, days, micros) duration struct:
    * P[nY][nM][nD][T[nH][nM][nS]], zero components omitted, 'PT0S' when
    * everything is zero, components individually signed (months: -13 →
    * 'P-1Y-1M' — plain truncating division gives exactly that), seconds
    * carry up to 6 fraction digits with trailing zeros trimmed. Pure
    * column expressions — stays codegen'd. */
  private def durationIso(d: Column): Column = {
    val months = d.getField("months")
    val days = d.getField("days")
    val micros = d.getField("micros")
    val y = (months / 12).cast(LongType)
    val mo = months % 12
    val h = (micros / 3600000000L).cast(LongType)
    val mi = ((micros % 3600000000L) / 60000000L).cast(LongType)
    val secUs = micros % 60000000L
    def part(v: Column, unit: String): Column =
      when(v =!= 0, concat(v.cast(StringType), lit(unit))).otherwise(lit(""))
    val secStr = {
      val whole = when(secUs % 1000000L === 0,
        (secUs / 1000000L).cast(LongType).cast(StringType))
      // decimal(20,6) renders the fraction with trailing zeros; trim them
      // (and a bare trailing dot) off
      val frac = regexp_replace(regexp_replace(
        (secUs.cast(DecimalType(27, 6)) / 1000000).cast(DecimalType(21, 6))
          .cast(StringType),
        "(\\.\\d*?)0+$", "$1"), "\\.$", "")
      when(secUs =!= 0, concat(coalesce(whole, frac), lit("S")))
        .otherwise(lit(""))
    }
    val datePart = concat(part(y, "Y"), part(mo, "M"), part(days, "D"))
    val timePart = concat(part(h, "H"), part(mi, "M"), secStr)
    val body = concat(datePart,
      when(timePart =!= "", concat(lit("T"), timePart)).otherwise(lit("")))
    when(d.isNull, lit(null).cast(StringType))
      .when(body === "", lit("PT0S"))
      .otherwise(concat(lit("P"), body))
  }

  /** date-from-map construction mirroring the reference's parseDateMap
    * (okapi-api/.../impl/temporal/TemporalTypesHelper.scala:184-216): four
    * identifier chains — calendar (year/month/day), ISO week
    * (year/week/dayOfWeek), ordinal (year/ordinalDay), quarter
    * (year/quarter/dayOfQuarter) — each validated for significance order;
    * `year` is always required; keys outside the selected chain are
    * ignored (reference behavior). Values may be arbitrary expressions, so
    * construction is column-level (codegen'd), not driver-side; a runtime
    * value out of calendar range follows non-ANSI Spark (null / roll-over)
    * rather than raising. Keys arrive lowercased. */
  private def dateFromMap(m: Map[String, Expr], fn: String): Column = {
    def part(k: String, dflt: Int): Column =
      m.get(k).map(e => compile(e).cast(IntegerType)).getOrElse(lit(dflt))
    if (!m.contains("year")) throw new CypherCompileException(
      s"$fn map requires `year` (got: ${m.keys.mkString(", ")})",
      CE.ArgumentError, CE.InvalidArgumentValue)
    // Dispatch on ANY key of a chain, so a fine key without its coarser
    // one ({year, dayOfWeek}) is a significance error, not a silently
    // ignored component.
    if (m.contains("week") || m.contains("dayofweek")) {
      checkSignificanceOrder(m, Seq("year", "week", "dayofweek"), fn)
      // ISO week date: week 1 is the week containing Jan 4; Monday start.
      val jan4 = make_date(part("year", 0), lit(1), lit(4))
      val week1Mon = F.date_sub(jan4, F.weekday(jan4))
      F.date_add(week1Mon,
        (part("week", 1) - lit(1)) * lit(7) + part("dayofweek", 1) - lit(1))
    } else if (m.contains("ordinalday")) {
      F.date_add(make_date(part("year", 0), lit(1), lit(1)),
        part("ordinalday", 1) - lit(1))
    } else if (m.contains("quarter") || m.contains("dayofquarter")) {
      checkSignificanceOrder(m, Seq("year", "quarter", "dayofquarter"), fn)
      F.date_add(make_date(part("year", 0),
        (part("quarter", 1) - lit(1)) * lit(3) + lit(1), lit(1)),
        part("dayofquarter", 1) - lit(1))
    } else {
      checkSignificanceOrder(m, Seq("year", "month", "day"), fn)
      make_date(part("year", 0), part("month", 1), part("day", 1))
    }
  }

  /** A statically-negative start/length argument (Neo4j raises; Spark's
    * substr would silently clamp) — literal forms only, dynamic values
    * follow non-ANSI Spark. */
  private def rejectNegativeLiteral(e: Expr, fn: String): Unit = e match {
    case IntLit(n) if n < 0 => throw new CypherCompileException(
      s"$fn expects a non-negative argument, got $n",
      CE.ArgumentError, CE.NegativeIntegerArgument)
    case Neg(IntLit(n)) if n > 0 => throw new CypherCompileException(
      s"$fn expects a non-negative argument, got ${-n}",
      CE.ArgumentError, CE.NegativeIntegerArgument)
    case _ =>
  }

  /** Within one identifier chain a present key must not follow an absent
    * finer one — date({year, day}) omits `month` and is rejected
    * (reference TemporalTypesHelper.checkSignificanceOrder:266-280). */
  private def checkSignificanceOrder(m: Map[String, _], chain: Seq[String],
      fn: String): Unit = {
    val gap = chain.map(m.contains).sliding(2).exists {
      case Seq(false, true) => true
      case _ => false
    }
    if (gap) throw new CypherCompileException(
      s"$fn map omits values of higher significance " +
        s"(got: ${m.keys.mkString(", ")}; order: ${chain.mkString(", ")})",
      CE.ArgumentError, CE.InvalidArgumentValue)
  }

  private def compileFieldAccess(c: Column, t: Option[DataType], k: String): Column =
    t match {
      // Temporal accessors: d.year, ts.month, ... (reference's
      // DateProperty/LocalDateTimeProperty, SparkSQLExprMapper :153-155).
      case Some(DateType) | Some(TimestampType) | Some(TimestampNTZType) =>
        k.toLowerCase match {
        case "year" => year(c).cast(LongType)
        case "quarter" => quarter(c).cast(LongType)
        case "month" => month(c).cast(LongType)
        case "week" => weekofyear(c).cast(LongType)
        // ISO week-based year ('1813-01-01'.weekYear = 1812).
        case "weekyear" => call_function("date_part", lit("YEAROFWEEK"), c)
          .cast(LongType)
        case "day" => dayofmonth(c).cast(LongType)
        // Cypher dayOfWeek is ISO: Monday=1..Sunday=7 (Spark's dayofweek
        // is Sunday=1); weekday() is Monday=0.
        case "dayofweek" | "weekday" => (F.weekday(c) + lit(1)).cast(LongType)
        case "ordinalday" => dayofyear(c).cast(LongType)
        case "dayofquarter" =>
          (datediff(c.cast(DateType), F.date_trunc("quarter", c).cast(DateType))
            + lit(1)).cast(LongType)
        case "hour" => hour(c).cast(LongType)
        case "minute" => F.minute(c).cast(LongType)
        case "second" => F.second(c).cast(LongType)
        // Spark's extract(SECOND) is a decimal with the fraction; slice out
        // the sub-second components from it.
        case "millisecond" =>
          ((call_function("date_part", lit("SECOND"), c) * 1000) % 1000)
            .cast(LongType)
        case "microsecond" =>
          ((call_function("date_part", lit("SECOND"), c) * 1000000) % 1000000)
            .cast(LongType)
        // Neo4j datetime epoch accessors (instant-based).
        case "epochseconds" => unix_seconds(c.cast(TimestampType))
        case "epochmillis" => unix_millis(c.cast(TimestampType))
        case other =>
          throw new CypherCompileException(s"unknown temporal accessor $other")
      }
      // Duration component accessors (Cypher semantics: each accessor is
      // the truncated total of its unit WITHIN its component group —
      // months / days / seconds groups do not convert into each other).
      case Some(st: StructType)
          if st.fieldNames.toSeq == Seq("months", "days", "micros") =>
        val months = c.getField("months")
        val days = c.getField("days")
        val micros = c.getField("micros")
        // Column./ is double division; accessors are whole units truncated
        // toward zero, which cast(long) of the double quotient gives.
        def idiv(a: Column, b: Long) = (a / b).cast(LongType)
        k.toLowerCase match {
          case "years" => idiv(months, 12)
          case "quarters" => idiv(months, 3)
          case "months" => months
          case "weeks" => idiv(days, 7)
          case "days" => days
          case "hours" => idiv(micros, 3600000000L)
          case "minutes" => idiv(micros, 60000000L)
          case "seconds" => idiv(micros, 1000000L)
          case "milliseconds" => idiv(micros, 1000L)
          // raw storage field, used by the oracle's field projection
          case "micros" => micros
          case "microseconds" => micros
          case "quartersofyear" => idiv(months % 12, 3)
          case "monthsofquarter" => months % 3
          case "monthsofyear" => months % 12
          case "minutesofhour" => idiv(micros, 60000000L) % 60
          case "secondsofminute" => idiv(micros, 1000000L) % 60
          case "millisecondsofsecond" => idiv(micros, 1000L) % 1000
          case "microsecondsofsecond" => micros % 1000000L
          case other =>
            throw new CypherCompileException(s"unknown duration accessor $other")
        }
      // Time-of-day accessors (LOCALTIME / TIME marker structs).
      case tt if isLocalTimeT(tt) =>
        localTimeAccessor(c.getField("_ltus"), k)
      case tt if isTimeT(tt) =>
        val os = c.getField("_tzos")
        k.toLowerCase match {
          case "offset" => offsetIso(os)
          case "offsetminutes" => (os / 60L).cast(LongType)
          case "offsetseconds" => os.cast(LongType)
          case other =>
            localTimeAccessor(c.getField("_tutc") + os * 1000000L, other)
        }
      // POINT accessors: x/y/srid direct; crs derived from srid;
      // longitude/latitude only defined on WGS-84 (null on cartesian —
      // Neo4j raises; the engine-wide non-ANSI analogue, documented).
      case Some(st: StructType)
          if st.fieldNames.toSeq == Seq("x", "y", "srid") =>
        k.toLowerCase match {
          case "x" => c.getField("x")
          case "y" => c.getField("y")
          case "srid" => c.getField("srid").cast(LongType)
          case "crs" => when(c.isNull, lit(null))
            .when(c.getField("srid") === 4326, lit("wgs-84"))
            .otherwise(lit("cartesian"))
          case "longitude" =>
            when(c.getField("srid") === 4326, c.getField("x"))
          case "latitude" =>
            when(c.getField("srid") === 4326, c.getField("y"))
          case other => throw new CypherCompileException(
            s"unknown point accessor $other",
            CE.ArgumentError, CE.InvalidArgumentValue)
        }
      // Missing key on a struct-backed map is null (Cypher map semantics);
      // getField on an absent field would fail analysis instead.
      case Some(st: StructType) =>
        if (st.fieldNames.contains(k)) c.getField(k) else lit(null)
      case Some(_: MapType) => element_at(c, k)
      case _ => c.getItem(k)
    }

  /** TCK error classification for container subscripts: a map wants a
    * string key, a list wants an integer — raised only when the key's type
    * is statically known to be wrong (dynamic keys stay permissive). */
  private def requireKeyType(idx: Expr, wantString: Boolean): Unit =
    inferType(idx).foreach {
      case StringType | NullType if wantString => ()
      case ByteType | ShortType | IntegerType | LongType | NullType
          if !wantString => ()
      case bad if wantString => throw new CypherCompileException(
        s"map element access requires a string key, got $bad",
        CE.TypeError, CE.MapElementAccessByNonString)
      case bad => throw new CypherCompileException(
        s"list element access requires an integer index, got $bad",
        CE.TypeError, CE.ListElementAccessByNonInteger)
    }

  private def compileFieldAccessDyn(c: Column, t: Option[DataType], k: Column): Column =
    t match {
      // An empty map literal has no keys: any lookup is null (element_at on
      // a zero-field struct would fail analysis instead).
      case Some(st: StructType) if st.fields.isEmpty => lit(null)
      // Map literals compile to structs; a non-literal string-key lookup
      // becomes a field-dispatch chain. That is only type-sound when all
      // value types agree — CaseWhen silently widens mixed branches to a
      // common type (age 1 would come back as the string '1'), so
      // heterogeneous dynamic access is rejected. (Literal keys never reach
      // here; they take the exact getField path at the Index case.)
      case Some(st: StructType) =>
        val valueTypes = st.fields.map(_.dataType).distinct
        if (valueTypes.length > 1)
          throw new CypherCompileException(
            "dynamic key access on a map with heterogeneous value types (" +
              valueTypes.mkString(", ") + ") is not supported; use a " +
              "literal key, e.g. m['age']")
        val first = when(k === lit(st.fields.head.name),
          c.getField(st.fields.head.name))
        st.fields.tail.foldLeft(first)((acc, f) =>
          acc.when(k === lit(f.name), c.getField(f.name)))
      case _ => element_at(c, k)
    }

  private def litAny(v: Any): Column = v match {
    case s: Seq[_] => array(s.map(litAny): _*)
    case m: scala.collection.Map[_, _] =>
      // Map parameters become structs (the engine's map representation),
      // so `$props` works in value position and in SET n += $props.
      struct(m.toSeq.map { case (k, x) => litAny(x).as(k.toString) }: _*)
    case other => lit(other)
  }

  // -------------------------------------------------------------- functions
  /** True if the expression (tree) contains an aggregating function. */
  def hasAggregation(e: Expr): Boolean = e match {
    case CountStar => true
    case FuncCall(n, _, _) if ExprCompiler.aggFns(n) => true
    case FuncCall(_, args, _) => args.exists(hasAggregation)
    case Prop(s, _) => hasAggregation(s)
    case Ands(es) => es.exists(hasAggregation)
    case Ors(es) => es.exists(hasAggregation)
    case Xor(l, r) => hasAggregation(l) || hasAggregation(r)
    case Not(x) => hasAggregation(x)
    case Cmp(_, l, r) => hasAggregation(l) || hasAggregation(r)
    case Arith(_, l, r) => hasAggregation(l) || hasAggregation(r)
    case Neg(x) => hasAggregation(x)
    case IsNull(x, _) => hasAggregation(x)
    case IsTyped(x, _, _) => hasAggregation(x)
    case IsNormalized(x, _, _) => hasAggregation(x)
    case In(l, r) => hasAggregation(l) || hasAggregation(r)
    case ListLit(items) => items.exists(hasAggregation)
    case MapLit(items) => items.exists(i => hasAggregation(i._2))
    case CaseExpr(s, alts, d) =>
      s.exists(hasAggregation) ||
        alts.exists(a => hasAggregation(a._1) || hasAggregation(a._2)) ||
        d.exists(hasAggregation)
    case Index(s, i) => hasAggregation(s) || hasAggregation(i)
    case ast.Slice(s, f, t) =>
      hasAggregation(s) || f.exists(hasAggregation) || t.exists(hasAggregation)
    case _ => false
  }

  private def compileFunc(fc: FuncCall): Column = {
    val FuncCall(name, args, distinct) = fc
    def a0 = compile(args(0))
    def a1 = compile(args(1))
    name match {
      // ---- aggregators (SURVEY §2.4) ----
      case "count" => if (distinct) count_distinct(a0) else count(a0)
      case "sum" | "avg" if isEntityOperand(args(0)) =>
        throw new CypherCompileException(
          s"$name() cannot aggregate over nodes or relationships",
          CE.TypeError, CE.InvalidArgumentType)
      case "sum" if isDuration(args(0)) =>
        // duration aggregate (TemporalUdafs parity): per-component sums
        struct(sum(a0.getField("months")).as("months"),
          sum(a0.getField("days")).as("days"),
          sum(a0.getField("micros")).as("micros"))
      case "sum" =>
        // openCypher: sum over zero rows (or all-null) is 0, not null.
        F.coalesce(if (distinct) sum_distinct(a0) else sum(a0), lit(0L))
      case "avg" if isDuration(args(0)) =>
        struct(avg(a0.getField("months")).cast(LongType).as("months"),
          avg(a0.getField("days")).cast(LongType).as("days"),
          avg(a0.getField("micros")).cast(LongType).as("micros"))
      case "avg" => avg(a0)
      case "min" if isDuration(args(0)) =>
        min_by(a0, ExprCompiler.durationTotalMicros(a0))
      case "max" if isDuration(args(0)) =>
        max_by(a0, ExprCompiler.durationTotalMicros(a0))
      case "min" => min(a0)
      case "max" => max(a0)
      case "collect" =>
        // collect(n) over an entity var captures the FULL entity struct
        // (identity + labels/type/endpoints + properties), so the list
        // element survives UNWIND as an entity value, not a bare id.
        val v = args(0) match {
          case Var(n) if !env.contains(n) => entityValueStruct(n).getOrElse(a0)
          case _ => a0
        }
        if (distinct) collect_set(v) else collect_list(v)
      // Internal ordered collect for COLLECT { … RETURN x ORDER BY … }
      // (Neo4j returns the list in ORDER BY order): args are the value
      // followed by (sortKey, 'asc'|'desc') pairs. Collect (keys…, value)
      // structs — null-valued rows are skipped, matching collect() — then
      // sort with a Neo4j-order comparator (nulls largest: last under ASC,
      // first under DESC) and strip the keys.
      case "_collectordered" =>
        val value = args(0) match {
          case Var(n) if !env.contains(n) => entityValueStruct(n).getOrElse(a0)
          case _ => a0
        }
        val keyDirs = args.tail.grouped(2).map {
          case Seq(k, StrLit(d)) => (compile(k), d == "asc")
          case other => throw new CypherCompileException(
            s"malformed _collectordered args: $other")
        }.toSeq
        val entry = when(value.isNotNull, struct(
          keyDirs.zipWithIndex.map { case ((k, _), i) => k.as(s"k$i") } :+
            value.as("v"): _*))
        val sorted = array_sort(collect_list(entry), (l, r) => {
          val cmps = keyDirs.zipWithIndex.map { case ((_, asc), i) =>
            val lk = l.getField(s"k$i"); val rk = r.getField(s"k$i")
            when(lk.isNull && rk.isNull, lit(0))
              .when(lk.isNull, lit(if (asc) 1 else -1))
              .when(rk.isNull, lit(if (asc) -1 else 1))
              .when(lk < rk, lit(if (asc) -1 else 1))
              .when(lk > rk, lit(if (asc) 1 else -1))
              .otherwise(lit(0))
          }
          cmps.reduceRight((c, acc) => when(c =!= 0, c).otherwise(acc))
        })
        val listed = transform(sorted, _.getField("v"))
        // collect(DISTINCT x) after ORDER BY: Neo4j keeps first occurrence
        // in sort order; array_distinct preserves first occurrence.
        if (distinct) array_distinct(listed) else listed
      // Neo4j stDev/stDevP return 0 over fewer than two (resp. one)
      // non-null values; Spark's stddev returns null there — coalesce to
      // the Neo4j value (null only ever arises in exactly those cases).
      case "stdev" => F.coalesce(stddev_samp(a0), lit(0.0))
      case "stdevp" => F.coalesce(stddev_pop(a0), lit(0.0))
      case "percentilecont" | "percentiledisc"
          if inferType(args(0)).exists {
            case LongType | IntegerType | DoubleType | FloatType |
                 _: DecimalType | NullType => false
            case _ => true
          } =>
        throw new CypherCompileException(
          s"$name() expects a numeric value, got " +
            s"${inferType(args(0)).get}",
          CE.TypeError, CE.InvalidArgumentType)
      case "percentilecont" => GraftFunctions.percentileCont(a0, a1)
      case "percentiledisc" =>
        // exact discrete percentile: smallest value with cume_dist >= p
        GraftFunctions.percentileDisc(a0, a1)

      // ---- element functions ----
      case "id" => entityValue(args(0)) match {
        // an entity-struct VALUE (collect(n) round-trip) reads its _id;
        // header/env entity vars already compile to the id column.
        case Some((c, _)) if !envEntity(args(0)).isDefined =>
          when(c.isNull, lit(null)).otherwise(c.getField("_id"))
        case _ => a0
      }
      case "labels" => args(0) match {
        case NullLit => lit(null)
        case v if entityValue(v).isDefined =>
          val (c, st) = entityValue(v).get
          if (!st.fieldNames.contains("_labels"))
            throw new CypherCompileException(
              "labels() expects a node, got a relationship",
              CE.TypeError, CE.InvalidArgumentType)
          when(c.isNull, lit(null)).otherwise(c.getField("_labels"))
        case Var(n) if header.kindOf(n).exists(_.isInstanceOf[RelKind]) =>
          throw new CypherCompileException(
            s"labels() expects a node, got relationship $n",
            CE.TypeError, CE.InvalidArgumentType)
        case Var(n) =>
          // labels(null) is null (optional-unmatched node), not []
          val built =
            if (header.ownedBy(n).collect { case LabelSlot(_, l) => l }.isEmpty)
              array()
            else array_compact(array(header.ownedBy(n)
              .collect { case LabelSlot(_, l) => l }.sorted.map(l =>
                when(col(header.col(LabelSlot(n, l))), lit(l))): _*))
          when(compile(Var(n)).isNull, lit(null)).otherwise(built)
        case _ => throw new CypherCompileException("labels() needs a node var", CE.TypeError, CE.InvalidArgumentType)
      }
      case "type" => args(0) match {
        case NullLit => lit(null)
        case v if entityValue(v).isDefined =>
          val (c, st) = entityValue(v).get
          if (!st.fieldNames.contains("_type"))
            throw new CypherCompileException(
              "type() expects a relationship, got a node",
              CE.TypeError, CE.InvalidArgumentType)
          c.getField("_type")
        case Var(n) if !header.kindOf(n).exists(_.isInstanceOf[RelKind]) =>
          throw new CypherCompileException(
            s"type() expects a relationship, got $$n",
            CE.TypeError, CE.InvalidArgumentType)
        case Var(n) => col(header.col(TypeSlot(n)))
        case _ => throw new CypherCompileException("type() needs a rel var", CE.TypeError, CE.InvalidArgumentType)
      }
      case "startnode" => args(0) match {
        case NullLit => lit(null)
        case v if entityValue(v).isDefined =>
          val (c, st) = entityValue(v).get
          if (!st.fieldNames.contains("_src"))
            throw new CypherCompileException(
              "startNode() expects a relationship, got a node",
              CE.TypeError, CE.InvalidArgumentType)
          c.getField("_src")
        case Var(n) if !header.kindOf(n).exists(_.isInstanceOf[RelKind]) =>
          throw new CypherCompileException(
            s"startNode() expects a relationship, got $$n",
            CE.TypeError, CE.InvalidArgumentType)
        case Var(n) => storedEnd(n, src = true)
        case _ => throw new CypherCompileException("startNode() needs a rel var", CE.TypeError, CE.InvalidArgumentType)
      }
      case "endnode" => args(0) match {
        case NullLit => lit(null)
        case v if entityValue(v).isDefined =>
          val (c, st) = entityValue(v).get
          if (!st.fieldNames.contains("_tgt"))
            throw new CypherCompileException(
              "endNode() expects a relationship, got a node",
              CE.TypeError, CE.InvalidArgumentType)
          c.getField("_tgt")
        case Var(n) if !header.kindOf(n).exists(_.isInstanceOf[RelKind]) =>
          throw new CypherCompileException(
            s"endNode() expects a relationship, got $$n",
            CE.TypeError, CE.InvalidArgumentType)
        case Var(n) => storedEnd(n, src = false)
        case _ => throw new CypherCompileException("endNode() needs a rel var", CE.TypeError, CE.InvalidArgumentType)
      }
      case "keys" => args(0) match {
        case NullLit => lit(null)
        case v if entityValue(v).isDefined =>
          val (c, st) = entityValue(v).get
          val ks = st.fieldNames.filterNot(_.startsWith("_")).toSeq.sorted
          val built =
            if (ks.isEmpty) array()
            else array_compact(array(ks.map(k =>
              when(c.getField(k).isNotNull, lit(k))): _*))
          when(c.isNull, lit(null)).otherwise(built)
        case Var(n) if !env.contains(n) =>
          val ks = header.ownedBy(n).collect { case PropSlot(_, k) => k }.sorted
          // keys(null) is null (optional-unmatched element), not []
          val built =
            if (ks.isEmpty) array()
            else array_compact(array(ks.map(k =>
              when(col(header.col(PropSlot(n, k))).isNotNull, lit(k))): _*))
          when(compile(Var(n)).isNull, lit(null)).otherwise(built)
        // keys() of a map value: field names of the struct, null keys
        // (absent values) kept — map keys exist even when values are null
        case m if inferType(m).exists(_.isInstanceOf[StructType]) =>
          val ks = inferType(m).collect { case st: StructType =>
            st.fieldNames.toSeq.sorted }.getOrElse(Seq.empty)
          when(compile(m).isNull, lit(null))
            .otherwise(array(ks.map(lit(_)): _*))
        case m if inferType(m).exists(_.isInstanceOf[MapType]) =>
          map_keys(compile(m))
        case _ => throw new CypherCompileException("keys() needs an element var or map", CE.TypeError, CE.InvalidArgumentType)
      }
      case "properties" => args(0) match {
        case NullLit => lit(null)
        case v if entityValue(v).isDefined =>
          val (c, st) = entityValue(v).get
          val ks = st.fieldNames.filterNot(_.startsWith("_")).toSeq.sorted
          when(c.isNull, lit(null))
            .otherwise(struct(ks.map(k => c.getField(k).as(k)): _*))
        // properties() of a MAP is the map itself (Neo4j identity
        // semantics) — any struct/map-typed value that is not an entity
        // struct (those carry _id first and take the slot paths).
        case m if inferType(m).exists {
          case st: StructType => !ExprCompiler.isEntityStructType(st)
          case _: MapType => true
          case _ => false
        } => compile(m)
        case Var(n) if !env.contains(n) =>
          val ks = header.ownedBy(n).collect { case PropSlot(_, k) => k }.sorted
          // properties(null) is null (optional-unmatched element)
          when(compile(Var(n)).isNull, lit(null))
            .otherwise(struct(ks.map(k => col(header.col(PropSlot(n, k))).as(k)): _*))
        case _ => throw new CypherCompileException("properties() needs an element var or map", CE.TypeError, CE.InvalidArgumentType)
      }
      case "exists" => a0.isNotNull

      // ---- strings ----
      case "toupper" | "upper" => upper(a0)
      case "tolower" | "lower" => lower(a0)
      // Cypher 5 normalize(str[, form]): form is a bare keyword (NFC by
      // default), so it arrives as a Var whose name we read, never compile.
      // Non-string input is a compile-time type error (Neo4j raises at
      // runtime; graft's schema is static, so we can reject earlier).
      case "normalize" =>
        val form = args match {
          case Seq(_) => "NFC"
          case Seq(_, Var(f)) if graft.functions.UnicodeNormalize.forms(f.toUpperCase) =>
            f.toUpperCase
          case Seq(_, StrLit(f)) if graft.functions.UnicodeNormalize.forms(f.toUpperCase) =>
            f.toUpperCase
          case _ => throw new CypherCompileException(
            "normalize() normal form must be NFC, NFD, NFKC or NFKD",
            CE.ArgumentError, CE.InvalidArgumentValue)
        }
        inferType(args.head) match {
          case Some(StringType) =>
            graft.functions.UnicodeNormalize.normalize(a0, form)
          case Some(NullType) => lit(null).cast(StringType)
          case None => // statically untyped (null literal, parameter)
            graft.functions.UnicodeNormalize.normalize(a0.cast(StringType), form)
          case Some(other) => throw new CypherCompileException(
            s"normalize() requires a STRING argument, got ${other.simpleString}",
            CE.TypeError, CE.InvalidArgumentType)
        }
      // Neo4j 5 *OrNull casts: the engine's base casts are already
      // null-on-unparsable (try_cast), so these alias them.
      case "tointegerornull" => compile(FuncCall("tointeger", args, false))
      case "tofloatornull" => compile(FuncCall("tofloat", args, false))
      case "tobooleanornull" => compile(FuncCall("toboolean", args, false))
      case "tostringornull" => compile(FuncCall("tostring", args, false))
      case "char_length" | "character_length" =>
        F.length(a0).cast(LongType)
      case "nullif" => when(a0 <=> a1, lit(null)).otherwise(a0)
      // list dedup (backs COLLECT { ... RETURN DISTINCT ... }); ordering
      // of the result list follows Spark's array_distinct (first wins).
      case "toset" => array_distinct(a0)
      // Neo4j 5 elementId: the string form of the internal id.
      case "elementid" =>
        compile(FuncCall("id", args, false)).cast(StringType)
      // Neo4j 5 valueType: the Cypher type name of the argument's STATIC
      // type (graft plans against a closed schema, so the static type is
      // the runtime type except for null). Divergence (documented):
      // Neo4j appends nullability ("INTEGER NOT NULL"); graft reports the
      // base name, with NULL literally for a null value at runtime.
      case "valuetype" =>
        val tn = staticTypeName(args.head)
        if (tn == "NULL") lit("NULL")
        else when(a0.isNull, lit("NULL")).otherwise(lit(tn))
      // Neo4j 5.13 two-argument trims strip the given character set;
      // btrim is the both-sides form (1-arg btrim = trim).
      case "trim" | "btrim" if args.length == 2 => F.btrim(a0, a1)
      // Spark's 2-arg ltrim/rtrim SQL forms take the trim SET first.
      case "ltrim" if args.length == 2 => call_function("ltrim", a1, a0)
      case "rtrim" if args.length == 2 => call_function("rtrim", a1, a0)
      case "trim" | "btrim" => trim(a0)
      case "ltrim" => ltrim(a0)
      case "rtrim" => rtrim(a0)
      // isEmpty over strings, lists, and maps (statically dispatched; a
      // map's key set is its static struct type, so its emptiness is a
      // null-guarded literal).
      case "isempty" if args.head == NullLit =>
        lit(null).cast(BooleanType)
      case "isempty" => inferType(args.head) match {
        case Some(StringType) => F.length(a0) === 0
        case Some(_: ArrayType) => F.size(a0) === 0
        case Some(st: StructType) =>
          when(a0.isNull, lit(null).cast(BooleanType))
            .otherwise(lit(st.fields.isEmpty))
        case _ => F.size(a0) === 0
      }
      case "reverse" => F.reverse(a0)
      case "replace" => F.replace(a0, a1, compile(args(2)))
      case "substring" =>
        // Cypher substring(s, start[, length]) is 0-based; negative
        // literal start/length is a classified error (Neo4j raises —
        // Spark's substr would silently treat 0/negative as position 1)
        args.drop(1).foreach(rejectNegativeLiteral(_, "substring"))
        if (args.length >= 3)
          a0.substr(a1.cast(IntegerType) + 1, compile(args(2)).cast(IntegerType))
        else a0.substr(a1.cast(IntegerType) + 1, F.length(a0))
      case "left" =>
        rejectNegativeLiteral(args(1), "left")
        a0.substr(lit(1), a1.cast(IntegerType))
      case "right" =>
        rejectNegativeLiteral(args(1), "right")
        a0.substr(F.length(a0) - a1.cast(IntegerType) + 1, a1.cast(IntegerType))
      // Cypher split delimiters are LITERAL strings (Neo4j also accepts a
      // LIST of delimiters); Spark's split takes a regex, so delimiters
      // are quoted — statically for literals, with \Q...\E at runtime for
      // dynamic values ( split('a.b', '.') would otherwise split on every
      // character).
      case "split" =>
        def q(c: Column): Column = concat(lit("\\Q"), c, lit("\\E"))
        val pat = args(1) match {
          case StrLit(d) => lit(java.util.regex.Pattern.quote(d))
          case ListLit(items) if items.forall(_.isInstanceOf[StrLit]) =>
            lit(items.map(i => java.util.regex.Pattern
              .quote(i.asInstanceOf[StrLit].v)).mkString("|"))
          case other => inferType(other) match {
            case Some(_: ArrayType) =>
              array_join(transform(a1, q(_)), "|")
            case _ => q(a1)
          }
        }
        args(1) match {
          // Empty delimiter = per-character split (Neo4j): Spark's regex
          // split appends an artifact empty element — drop empties (every
          // real element is a single character here).
          case StrLit("") => F.filter(F.split(a0, pat), x => x =!= "")
          case StrLit(_) | ListLit(_) => F.split(a0, pat)
          // Dynamic string delimiter: the empty-delimiter case must be
          // decided at runtime, or split(s, x) with x = '' diverges from
          // the literal form split(s, '').
          case other if !inferType(other).exists(_.isInstanceOf[ArrayType]) =>
            when(length(a1) === 0,
              F.filter(F.split(a0, pat), x => x =!= ""))
              .otherwise(F.split(a0, pat))
          case _ => F.split(a0, pat)
        }
      case "tostring" if isEntityOperand(args(0)) =>
        throw new CypherCompileException(
          "toString() cannot render a node or relationship",
          CE.TypeError, CE.InvalidArgumentType)
      case "tostring" =>
        inferType(args(0)) match {
          // Durations render as ISO-8601 (Neo4j toString semantics:
          // 'P1DT2H', componentwise-signed, 'PT0S' when zero) — a plain
          // struct cast would leak the (months, days, micros) encoding.
          case Some(st: StructType)
              if st.fieldNames.toSeq == Seq("months", "days", "micros") =>
            durationIso(compile(args(0)))
          case tt if isLocalTimeT(tt) =>
            localTimeIso(compile(args(0)).getField("_ltus"))
          case tt if isTimeT(tt) =>
            val c = compile(args(0))
            val os = c.getField("_tzos")
            concat(localTimeIso(c.getField("_tutc") + os * 1000000L),
              offsetIso(os))
          // ISO-8601 'T' separator (Neo4j toString), not Spark's space.
          // Zoned and local datetimes share TimestampType (the zone is
          // not retained — documented deviation), so both render as the
          // naive local form with no zone suffix.
          case Some(TimestampType) | Some(TimestampNTZType) =>
            translate(a0.cast(StringType), " ", "T")
          // Neo4j point rendering: point({srid:4326, x:1.0, y:2.0}).
          case Some(st: StructType)
              if st.fieldNames.toSeq == Seq("x", "y", "srid") =>
            when(a0.isNull, lit(null)).otherwise(concat(
              lit("point({srid:"), a0.getField("srid").cast(StringType),
              lit(", x:"), a0.getField("x").cast(StringType),
              lit(", y:"), a0.getField("y").cast(StringType), lit("})")))
          case _ => a0.cast(StringType)
        }

      // ---- casts ----
      case "bigdecimal" | "tobigdecimal" =>
        (args(1), args(2)) match {
          case (IntLit(p), IntLit(sc)) =>
            a0.cast(DecimalType(p.toInt, sc.toInt))
          case other => throw new CypherCompileException(
            s"bigDecimal(x, precision, scale) needs integer literals: $other")
        }
      case "tointeger" => inferType(args.head) match {
        // Neo4j parses float STRINGS too, truncating toward zero
        // (toInteger('3.7') = 3); Spark's long cast alone nulls them.
        // Exact long strings win the coalesce so > 2^53 integers keep
        // full precision.
        case Some(StringType) => F.coalesce(a0.try_cast(LongType),
          a0.try_cast(DoubleType).cast(LongType))
        case _ => a0.try_cast(LongType)
      }
      case "tofloat" => a0.try_cast(DoubleType)
      case "toboolean" => inferType(args.head) match {
        // openCypher accepts exactly 'true'/'false' (case-insensitive);
        // Spark's boolean cast also takes 'yes'/'y'/'1' etc., so strings
        // match strictly here.
        case Some(StringType) =>
          val lc = F.lower(F.trim(a0))
          when(lc === "true", lit(true))
            .when(lc === "false", lit(false))
            .otherwise(lit(null).cast(BooleanType))
        case _ => a0.try_cast(BooleanType)
      }

      // List coercions (Neo4j 4.x toXxxList family): the scalar
      // conversion applied elementwise; unconvertible elements become
      // null ELEMENTS, a null list stays null.
      case "tointegerlist" | "tofloatlist" | "tobooleanlist" |
           "tostringlist" if args.head == NullLit =>
        lit(null).cast(ArrayType(name match {
          case "tointegerlist" => LongType
          case "tofloatlist" => DoubleType
          case "tobooleanlist" => BooleanType
          case _ => StringType
        }))
      // A heterogeneous LIST LITERAL cannot even compile to array() (one
      // Spark element type) — but under a coercion every element converts
      // to the SAME type, so convert elementwise at compile time instead.
      case "tointegerlist" | "tofloatlist" | "tobooleanlist" |
           "tostringlist" if args.head.isInstanceOf[ListLit] &&
             args.head.asInstanceOf[ListLit].items
               .flatMap(inferType(_)).distinct.size > 1 =>
        val scalar = name.stripPrefix("to").stripSuffix("list") match {
          case "integer" => "tointeger"
          case "float" => "tofloat"
          case "boolean" => "toboolean"
          case _ => "tostring"
        }
        array(args.head.asInstanceOf[ListLit].items
          .map(e => compile(FuncCall(scalar, Seq(e), distinct = false))): _*)
      case "tointegerlist" | "tofloatlist" | "tobooleanlist" |
           "tostringlist" =>
        val elemT = inferType(args.head) match {
          case Some(ArrayType(et, _)) => Some(et)
          case _ => None
        }
        def conv(x: Column): Column = name match {
          case "tointegerlist" => elemT match {
            case Some(StringType) => F.coalesce(x.try_cast(LongType),
              x.try_cast(DoubleType).cast(LongType))
            case _ => x.try_cast(LongType)
          }
          case "tofloatlist" => x.try_cast(DoubleType)
          case "tobooleanlist" => elemT match {
            case Some(StringType) =>
              val lc = F.lower(F.trim(x))
              when(lc === "true", lit(true))
                .when(lc === "false", lit(false))
                .otherwise(lit(null).cast(BooleanType))
            case _ => x.try_cast(BooleanType)
          }
          case "tostringlist" => x.cast(StringType)
        }
        F.transform(a0, conv(_))

      // Vector similarity (Neo4j 5.13): scores normalised to [0, 1] the
      // way Neo4j's vector indexes do — cosine as (1 + cos)/2 through the
      // codegen'd CosineSimilarity expression, euclidean as
      // 1 / (1 + squared distance).
      case "vector.similarity.cosine" =>
        (lit(1.0) + graft.pipeline.Similarity.cosine(a0, a1)) / 2
      case "vector.similarity.euclidean" =>
        val d2 = F.aggregate(
          zip_with(a0, a1, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)
        lit(1.0) / (lit(1.0) + d2)

      // ---- spatial POINT (beyond-reference; Neo4j's point type, 2D) ----
      // Representation: (x, y, srid) struct — see ExprCompiler.pointType.
      // 3D is rejected; null coordinates make the whole point null (the
      // engine-wide non-ANSI stance).
      case "point" => args(0) match {
        case NullLit => lit(null).cast(ExprCompiler.pointType)
        case MapLit(items) =>
          val m = items.map { case (k, v) => k.toLowerCase -> v }.toMap
          if (m.contains("z") || m.contains("height"))
            throw new CypherCompileException(
              "3D points are not supported (2D cartesian / WGS-84 only)",
              CE.ArgumentError, CE.InvalidArgumentValue)
          val extra = m.keySet --
            Set("x", "y", "longitude", "latitude", "crs", "srid")
          if (extra.nonEmpty) throw new CypherCompileException(
            s"unknown point component(s): ${extra.toSeq.sorted.mkString(", ")}",
            CE.ArgumentError, CE.InvalidArgumentValue)
          val geoKeys = m.contains("longitude") || m.contains("latitude")
          val srid: Column = (m.get("srid"), m.get("crs")) match {
            case (Some(e), _) => compile(e).cast(IntegerType)
            case (_, Some(StrLit(c))) => c.toLowerCase match {
              case "cartesian" => lit(7203)
              case "wgs-84" | "wgs84" => lit(4326)
              case other => throw new CypherCompileException(
                s"unknown CRS '$other' (cartesian or wgs-84)",
                CE.ArgumentError, CE.InvalidArgumentValue)
            }
            case (_, Some(e)) => crsToSrid(compile(e))
            case _ => if (geoKeys) lit(4326) else lit(7203)
          }
          val xe = m.get("x").orElse(m.get("longitude"))
          val ye = m.get("y").orElse(m.get("latitude"))
          if (xe.isEmpty || ye.isEmpty) throw new CypherCompileException(
            "point() needs x/y or longitude/latitude components",
            CE.ArgumentError, CE.InvalidArgumentValue)
          val xc = compile(xe.get).cast(DoubleType)
          val yc = compile(ye.get).cast(DoubleType)
          when(xc.isNull || yc.isNull,
            lit(null).cast(ExprCompiler.pointType))
            .otherwise(struct(xc.as("x"), yc.as("y"), srid.as("srid")))
        // Map-typed EXPRESSIONS (point(n.loc), point(m)): read the
        // components off the compiled value. A struct type validates its
        // field set at compile time like the literal path; a true MAP
        // type resolves keys per row (an unknown CRS or a z/height
        // component nulls the point — the engine cannot raise per-row,
        // documented in tck_blacklist.md).
        case other => inferType(other) match {
          case Some(NullType) => lit(null).cast(ExprCompiler.pointType)
          case Some(st: StructType) =>
            val mv = compile(other)
            val byLower = st.fieldNames.map(f => f.toLowerCase -> f).toMap
            if (byLower.contains("z") || byLower.contains("height"))
              throw new CypherCompileException(
                "3D points are not supported (2D cartesian / WGS-84 only)",
                CE.ArgumentError, CE.InvalidArgumentValue)
            val extra = byLower.keySet --
              Set("x", "y", "longitude", "latitude", "crs", "srid")
            if (extra.nonEmpty) throw new CypherCompileException(
              s"unknown point component(s): ${extra.toSeq.sorted.mkString(", ")}",
              CE.ArgumentError, CE.InvalidArgumentValue)
            def fld(k: String): Option[Column] =
              byLower.get(k).map(mv.getField)
            val geoKeys =
              byLower.contains("longitude") || byLower.contains("latitude")
            val srid: Column = (fld("srid"), fld("crs")) match {
              case (Some(c), _) => c.cast(IntegerType)
              case (_, Some(c)) => crsToSrid(c)
              case _ => if (geoKeys) lit(4326) else lit(7203)
            }
            val xe = fld("x").orElse(fld("longitude"))
            val ye = fld("y").orElse(fld("latitude"))
            if (xe.isEmpty || ye.isEmpty) throw new CypherCompileException(
              "point() needs x/y or longitude/latitude components",
              CE.ArgumentError, CE.InvalidArgumentValue)
            val xc = xe.get.cast(DoubleType)
            val yc = ye.get.cast(DoubleType)
            when(mv.isNull || xc.isNull || yc.isNull || srid.isNull,
              lit(null).cast(ExprCompiler.pointType))
              .otherwise(struct(xc.as("x"), yc.as("y"), srid.as("srid")))
          case Some(MapType(_, _, _)) =>
            val mv = compile(other)
            def itm(k: String): Column = mv.getItem(k)
            val geoKeys = itm("longitude").isNotNull ||
              itm("latitude").isNotNull
            val srid = F.coalesce(
              itm("srid").cast(IntegerType),
              when(itm("crs").isNotNull, crsToSrid(itm("crs")))
                .otherwise(when(geoKeys, lit(4326)).otherwise(lit(7203))))
            val xc = F.coalesce(itm("x"), itm("longitude")).cast(DoubleType)
            val yc = F.coalesce(itm("y"), itm("latitude")).cast(DoubleType)
            when(mv.isNull || xc.isNull || yc.isNull || srid.isNull ||
                itm("z").isNotNull || itm("height").isNotNull,
              lit(null).cast(ExprCompiler.pointType))
              .otherwise(struct(xc.as("x"), yc.as("y"), srid.as("srid")))
          case _ => throw new CypherCompileException(
            "point() takes a map of components",
            CE.SyntaxError, CE.UnsupportedExpression)
        }
      }
      // Neo4j: null when either point is null or the CRSes differ.
      // Cartesian = euclidean; WGS-84 = haversine great-circle meters on
      // the IUGG mean earth radius 6371008.8 m (Neo4j's exact constant is
      // not verifiable offline — documented in tck_blacklist.md; the
      // registry oracle replicates THIS formula, so the gate pins it).
      case "point.distance" =>
        val dx = a0.getField("x") - a1.getField("x")
        val dy = a0.getField("y") - a1.getField("y")
        val euclid = sqrt(dx * dx + dy * dy)
        val la1 = radians(a0.getField("y"))
        val la2 = radians(a1.getField("y"))
        val dLa = la2 - la1
        val dLo = radians(a1.getField("x")) - radians(a0.getField("x"))
        val h = pow(sin(dLa / 2), 2) +
          cos(la1) * cos(la2) * pow(sin(dLo / 2), 2)
        val haversine = lit(2.0) * lit(6371008.8) * asin(sqrt(h))
        when(a0.isNull || a1.isNull ||
            a0.getField("srid") =!= a1.getField("srid"),
          lit(null).cast(DoubleType))
          .when(a0.getField("srid") === 4326, haversine)
          .otherwise(euclid)
      // point.withinBBox(p, lowerLeft, upperRight): inclusive bounds; no
      // longitude wrap-around (documented).
      case "point.withinbbox" =>
        val p = a0; val lo = a1; val hi = compile(args(2))
        when(p.isNull || lo.isNull || hi.isNull ||
            p.getField("srid") =!= lo.getField("srid") ||
            p.getField("srid") =!= hi.getField("srid"),
          lit(null).cast(BooleanType))
          .otherwise(
            p.getField("x") >= lo.getField("x") &&
            p.getField("x") <= hi.getField("x") &&
            p.getField("y") >= lo.getField("y") &&
            p.getField("y") <= hi.getField("y"))

      // ---- math ----
      case "abs" => F.abs(a0)
      case "sqrt" => F.sqrt(a0)
      case "exp" => F.exp(a0)
      case "log" => F.log(a0)
      case "log10" => F.log(10.0, a0)
      case "ceil" => F.ceil(a0)
      case "floor" => F.floor(a0)
      // round(v, p, mode): Neo4j's seven explicit modes (previously the
      // mode argument was silently ignored — HALF_EVEN ran HALF_UP).
      // Double scaling, not BigDecimal — the engine-wide numeric stance.
      case "round" if args.length == 3 =>
        val p = args(1) match {
          case IntLit(s) => s.toInt
          case other => throw new CypherCompileException(
            s"round() scale must be an integer literal, got $other")
        }
        val mode = args(2) match {
          case StrLit(m) => m.toUpperCase
          case other => throw new CypherCompileException(
            s"round() mode must be a string literal, got $other")
        }
        val m = lit(math.pow(10, p))
        val x = a0.cast(DoubleType)
        val scaled = x * m
        val r = mode match {
          case "HALF_UP" => F.round(x, p)
          case "HALF_EVEN" => F.bround(x, p)
          case "UP" =>
            signum(x) * F.ceil(F.abs(scaled)).cast(DoubleType) / m
          case "DOWN" =>
            signum(x) * F.floor(F.abs(scaled)).cast(DoubleType) / m
          case "CEILING" => F.ceil(scaled).cast(DoubleType) / m
          case "FLOOR" => F.floor(scaled).cast(DoubleType) / m
          case "HALF_DOWN" =>
            signum(x) * F.ceil(F.abs(scaled) - 0.5).cast(DoubleType) / m
          case other => throw new CypherCompileException(
            s"unknown round() mode $other", CE.ArgumentError,
            CE.InvalidArgumentValue)
        }
        r.cast(DoubleType)
      case "round" =>
        if (args.length >= 2) args(1) match {
          // Precision form: HALF_UP away from zero (Neo4j's default
          // round(v, p) mode and what Spark/DuckDB both implement).
          case IntLit(s) => F.round(a0, s.toInt)
          case other => throw new CypherCompileException(
            s"round() scale must be an integer literal, got $other")
        }
        // 1-arg Cypher round ties TOWARD POSITIVE INFINITY (Neo4j docs,
        // java Math.round): round(-2.5) = -2 — Spark's HALF_UP would
        // give -3.
        else F.floor(a0.cast(DoubleType) + 0.5).cast(DoubleType)
      case "randomuuid" => F.uuid()
      case "sign" => F.signum(a0).cast(LongType)
      // Neo4j 4.x isNaN: true only for a floating NaN; null-propagating.
      case "isnan" => when(a0.isNull, lit(null)).otherwise(F.isnan(a0))
      case "acos" => F.acos(a0)
      case "asin" => F.asin(a0)
      case "atan" => F.atan(a0)
      case "atan2" => F.atan2(a0, a1)
      case "cos" => F.cos(a0)
      case "cot" => lit(1.0) / F.tan(a0)
      case "sin" => F.sin(a0)
      case "tan" => F.tan(a0)
      case "degrees" => F.degrees(a0)
      case "radians" => F.radians(a0)
      case "haversin" => (lit(1.0) - F.cos(a0)) / 2.0
      case "rand" => F.rand()
      case "pi" => lit(math.Pi)
      case "e" => lit(math.E)
      case "timestamp" => unix_millis(current_timestamp())

      // ---- paths ----
      case "nodes" => a0.getField("nodes")
      case "relationships" => a0.getField("rels")

      // ---- lists / containers ----
      case "size" | "length" =>
        if (isStringy(args(0))) F.length(a0).cast(LongType)
        else if (isPathStruct(args(0)))
          // A path VALUE may be null (shortestPath(...) with no match);
          // guard like the list case — legacy size(null) is -1.
          when(a0.isNull, lit(null))
            .otherwise(F.size(a0.getField("rels"))).cast(LongType)
        // size(null) is null in Cypher; Spark's legacy size returns -1.
        else when(a0.isNull, lit(null))
          .otherwise(F.size(a0)).cast(LongType)
      case "head" => element_at(a0, 1)
      case "last" => element_at(a0, -1)
      case "tail" => F.slice(a0, lit(2), greatest(F.size(a0) - 1, lit(0)))

      // ---- temporal constructors (Expr.scala :1269-1273) ----
      case "date" =>
        if (args.isEmpty) current_date()
        else args(0) match {
          // Literal strings accept every Cypher date form (week/quarter/
          // ordinal/compact — TemporalTests.scala:207); dynamic strings
          // fall back to Spark's ISO to_date.
          case StrLit(s) =>
            lit(java.sql.Date.valueOf(ExprCompiler.parseCypherDate(s)))
          case MapLit(items) =>
            val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
            // Selection form date({date: base[, year/month/day: ov]}):
            // base components are kept unless overridden (TCK
            // TemporalSelectAcceptance; an override composing an invalid
            // calendar date follows non-ANSI Spark — null, not a raise).
            if (m.contains("date")) {
              val extra = m.keySet -- Set("date", "year", "month", "day")
              if (extra.nonEmpty) throw new CypherCompileException(
                s"date() selection supports year/month/day overrides, " +
                  s"got: ${extra.mkString(", ")}",
                CE.ArgumentError, CE.InvalidArgumentValue)
              val b = dateBaseOf(m("date"), "date()")
              def ov(k: String, dflt: Column) =
                m.get(k).map(e => compile(e).cast(IntegerType)).getOrElse(dflt)
              make_date(ov("year", year(b)), ov("month", month(b)),
                ov("day", dayofmonth(b)))
            } else dateFromMap(m, "date()")
          case _ => to_date(a0)
        }
      case "localdatetime" | "datetime" =>
        // timezone is a datetime-only component (Neo4j allows it on
        // localdatetime only in the bare current-time form).
        args.headOption.foreach {
          case MapLit(items) if name == "localdatetime" &&
              items.exists(_._1.equalsIgnoreCase("timezone")) &&
              items.size > 1 =>
            throw new CypherCompileException(
              "localdatetime() does not take a timezone with components",
              CE.ArgumentError, CE.InvalidArgumentValue)
          case _ =>
        }
        if (args.isEmpty) current_timestamp()
        else args(0) match {
          // datetime() accepts zoned literals (offset/bracketed zone,
          // normalized to the UTC instant); localdatetime keeps rejecting
          // them (Neo4j semantics).
          case StrLit(s) if name == "datetime" =>
            lit(java.sql.Timestamp.valueOf(
              ExprCompiler.parseCypherZonedDateTime(s)))
          case StrLit(s) => lit(java.sql.Timestamp.valueOf(
            ExprCompiler.parseCypherLocalDateTime(s)))
          case MapLit(items) if items.exists { case (k, _) =>
              Set("date", "time").contains(k.toLowerCase) } =>
            // Composition/selection from temporal bases: {date: d[, time:
            // t][, component overrides]} — base components are kept unless
            // overridden (TCK TemporalSelectAcceptance). The no-override
            // form stays on the exact integer-micros path.
            val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
            val ovKeys = Set("year", "month", "day",
              "hour", "minute", "second", "millisecond", "microsecond")
            val extra = m.keySet -- ovKeys -- Set("date", "time", "timezone")
            if (extra.nonEmpty) throw new CypherCompileException(
              s"$name() with a date/time base supports component " +
                s"overrides ${ovKeys.toSeq.sorted.mkString("/")}, got: " +
                extra.mkString(", "),
              CE.ArgumentError, CE.InvalidArgumentValue)
            val dBase = m.get("date").map(dateBaseOf(_, s"$name()"))
            val tBase = m.get("time").map(e => localUsOf(e).getOrElse(
              throw new CypherCompileException(
                s"$name() time component must be a time value",
                CE.SyntaxError, CE.InvalidArgumentType)))
            // Selected/overridden components are wall time in the given
            // zone (when present) — same conversion as the component form.
            def zoned(naive: Column): Column = m.get("timezone") match {
              case Some(tz) =>
                to_utc_timestamp(naive, compile(tz).cast(StringType))
              case None => naive
            }
            if (!m.keySet.exists(ovKeys)) {
              val d = dBase.getOrElse(throw new CypherCompileException(
                s"$name() needs a date component (a year or a date base)",
                CE.ArgumentError, CE.InvalidArgumentValue))
              zoned(timestamp_micros(unix_micros(d.cast(TimestampType)) +
                tBase.getOrElse(lit(0L))))
            } else {
              def ovI(k: String, dflt: Column): Column =
                m.get(k).map(e => compile(e).cast(IntegerType)).getOrElse(dflt)
              val y = m.get("year").map(e => compile(e).cast(IntegerType))
                .orElse(dBase.map(year))
                .getOrElse(throw new CypherCompileException(
                  s"$name() needs a date component (a year or a date base)",
                  CE.ArgumentError, CE.InvalidArgumentValue))
              val mo = ovI("month", dBase.map(month).getOrElse(lit(1)))
              val dd = ovI("day", dBase.map(dayofmonth).getOrElse(lit(1)))
              val us = selectTimeUs(m -- Seq("year", "month", "day", "timezone"),
                tBase.getOrElse(lit(0L)))
              zoned(timestamp_micros(
                unix_micros(make_date(y, mo, dd).cast(TimestampType)) + us))
            }
          case MapLit(items) =>
            val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
            // Spark timestamps are microsecond-precision; a nanosecond
            // component cannot be represented (reference: morpheus
            // TemporalConversions raises "nanosecond resolution").
            if (m.contains("nanosecond")) throw new CypherCompileException(
              s"$name() does not support nanosecond resolution",
              CE.ArgumentError, CE.InvalidArgumentValue)
            if (m.keySet == Set("timezone")) {
              // Bare {timezone: z}: the current moment. datetime keeps the
              // instant (zone unretained); localdatetime is the current
              // WALL CLOCK in that zone.
              if (name == "datetime") current_timestamp()
              else from_utc_timestamp(current_timestamp(),
                compile(m("timezone")).cast(StringType))
            } else if (m.contains("epochseconds") || m.contains("epochmillis")) {
              // Epoch constructors (Neo4j): the instant directly.
              // epochSeconds composes with sub-second additions;
              // epochMillis stands alone. A timezone key only selects the
              // retained zone in Neo4j — this engine normalizes to UTC
              // (documented deviation), so it is accepted and ignored.
              if (m.contains("epochseconds") && m.contains("epochmillis"))
                throw new CypherCompileException(
                  s"$name() cannot combine epochSeconds with epochMillis",
                  CE.ArgumentError, CE.InvalidArgumentValue)
              val allowed =
                if (m.contains("epochseconds"))
                  Set("epochseconds", "millisecond", "microsecond", "timezone")
                else Set("epochmillis", "timezone")
              val bad = m.keySet -- allowed
              if (bad.nonEmpty) throw new CypherCompileException(
                s"$name() epoch constructors do not combine with: " +
                  bad.toSeq.sorted.mkString(", "),
                CE.ArgumentError, CE.InvalidArgumentValue)
              def partL(k: String): Column =
                m.get(k).map(e => compile(e).cast(LongType)).getOrElse(lit(0L))
              timestamp_micros(
                if (m.contains("epochseconds"))
                  partL("epochseconds") * 1000000L +
                    partL("millisecond") * 1000L + partL("microsecond")
                else partL("epochmillis") * 1000L)
            } else {
              val allowed = Set("year", "month", "day", "week", "dayofweek",
                "ordinalday", "quarter", "dayofquarter", "hour", "minute",
                "second", "millisecond", "microsecond", "timezone")
              val unknown = m.keySet -- allowed
              if (unknown.nonEmpty) throw new CypherCompileException(
                s"$name() got unsupported component(s): " +
                  unknown.toSeq.sorted.mkString(", "),
                CE.ArgumentError, CE.InvalidArgumentValue)
              checkSignificanceOrder(m, Seq("hour", "minute", "second"),
                s"$name()")
              def part(k: String, dflt: Int): Column =
                m.get(k).map(e => compile(e).cast(IntegerType))
                  .getOrElse(lit(dflt))
              val d = dateFromMap(m - "timezone", s"$name()")
              def frac(k: String, denom: Int): Column = m.get(k)
                .map(e => compile(e).cast(DecimalType(16, 6)) / denom)
                .getOrElse(lit(java.math.BigDecimal.ZERO))
              val secs = m.get("second")
                .map(e => compile(e).cast(DecimalType(16, 6)))
                .getOrElse(lit(java.math.BigDecimal.ZERO).cast(DecimalType(16, 6)))
              val naive = call_function("make_timestamp",
                year(d), month(d), dayofmonth(d),
                part("hour", 0), part("minute", 0),
                secs + frac("millisecond", 1000) + frac("microsecond", 1000000))
              // timezone: the components are WALL TIME in that zone —
              // convert to the engine's UTC instant with the zone's real
              // rules (DST gaps shift forward, overlaps take the earlier
              // offset — java.time resolution, same as Neo4j). The zone
              // itself is not retained (documented deviation).
              m.get("timezone") match {
                case Some(tz) =>
                  to_utc_timestamp(naive, compile(tz).cast(StringType))
                case None => naive
              }
            }
          case _ => to_timestamp(a0)
        }
      case "localtime" | "time" =>
        // Time-of-day types (BEYOND-reference surface: the reference's
        // Spark backend has neither — Spark has no time type; these are
        // marker structs, see ExprCompiler.localTimeType/timeType).
        def fromComponents(m: Map[String, Expr]): Column = {
          // Same stance as the datetime map constructor: microsecond
          // resolution is the floor, and an unrecognized key is an error
          // (Neo4j), never a silently-zeroed component.
          if (m.contains("nanosecond")) throw new CypherCompileException(
            s"$name() does not support nanosecond resolution",
            CE.ArgumentError, CE.InvalidArgumentValue)
          val allowed = Set("hour", "minute", "second", "millisecond",
            "microsecond") ++ (if (name == "time") Set("timezone") else Set())
          val unknown = m.keySet -- allowed
          if (unknown.nonEmpty) throw new CypherCompileException(
            s"$name() got unsupported component(s): " +
              unknown.toSeq.sorted.mkString(", "),
            CE.ArgumentError, CE.InvalidArgumentValue)
          checkSignificanceOrder(m, Seq("hour", "minute", "second"),
            s"$name()")
          def part(k: String): Column =
            m.get(k).map(e => compile(e).cast(LongType)).getOrElse(lit(0L))
          (part("hour") * 3600000000L + part("minute") * 60000000L +
            part("second") * 1000000L + part("millisecond") * 1000L +
            part("microsecond"))
        }
        def nowLocalUs: Column = {
          val ts = current_timestamp()
          (hour(ts).cast(LongType) * 3600L + F.minute(ts).cast(LongType) * 60L +
            F.second(ts).cast(LongType)) * 1000000L
        }
        if (name == "localtime") args.headOption match {
          case None => struct(nowLocalUs.as("_ltus"))
          case Some(StrLit(s)) => struct(lit(
            ExprCompiler.parseCypherTime(s).toNanoOfDay / 1000L).as("_ltus"))
          case Some(MapLit(items)) =>
            val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
            // Selection with overrides: {time: base[, components]} keeps
            // every base component unless overridden (TCK
            // TemporalSelectAcceptance).
            if (m.contains("time")) {
              val extra = m.keySet -- Set("time", "hour", "minute",
                "second", "millisecond", "microsecond")
              if (extra.nonEmpty) throw new CypherCompileException(
                s"localtime() selection got unsupported keys: " +
                  extra.mkString(", "),
                CE.ArgumentError, CE.InvalidArgumentValue)
              val base = localUsOf(m("time")).getOrElse(
                throw new CypherCompileException(
                  "localtime() time component must be a time value",
                  CE.SyntaxError, CE.InvalidArgumentType))
              struct(selectTimeUs(m, base).as("_ltus"))
            } else struct(fromComponents(m).as("_ltus"))
          case Some(other) => localUsOf(other) match {
            case Some(us) => struct(us.as("_ltus"))
            case None => throw new CypherCompileException(
              s"localtime() expects a map, string literal or temporal value, got $other",
              CE.SyntaxError, CE.InvalidArgumentType)
          }
        } else args.headOption match {
          case None => // session clock is UTC: offset 0
            struct(nowLocalUs.as("_tutc"), lit(0L).as("_tzos"))
          case Some(StrLit(s)) =>
            val (lt, off) = ExprCompiler.parseCypherOffsetTime(s)
            struct(lit(lt.toNanoOfDay / 1000L - off * 1000000L).as("_tutc"),
              lit(off.toLong).as("_tzos"))
          case Some(MapLit(items)) =>
            val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
            val offOv: Option[Long] = m.get("timezone") match {
              case Some(StrLit(z)) =>
                Some(ExprCompiler.parseCypherOffsetTime("00" + z)._2.toLong)
              case None => None
              case Some(other) => throw new CypherCompileException(
                s"time() timezone must be a string literal, got $other",
                CE.SyntaxError, CE.InvalidArgumentType)
            }
            // Selection with overrides: a zoned-time base keeps ITS offset
            // unless a timezone override replaces it; the local clock
            // reading is preserved across the selection (Neo4j keeps
            // wall-clock components, not the instant, when overriding).
            if (m.contains("time")) {
              val extra = m.keySet -- Set("time", "timezone", "hour",
                "minute", "second", "millisecond", "microsecond")
              if (extra.nonEmpty) throw new CypherCompileException(
                s"time() selection got unsupported keys: " +
                  extra.mkString(", "),
                CE.ArgumentError, CE.InvalidArgumentValue)
              val baseT = inferType(m("time"))
              val baseLocal = localUsOf(m("time")).getOrElse(
                throw new CypherCompileException(
                  "time() time component must be a time value",
                  CE.SyntaxError, CE.InvalidArgumentType))
              val off: Column = offOv.map(o => lit(o)).getOrElse(
                if (isTimeT(baseT)) compile(m("time")).getField("_tzos")
                else lit(0L))
              val us = selectTimeUs(m - "timezone", baseLocal)
              struct((us - off * 1000000L).as("_tutc"), off.as("_tzos"))
            } else {
              val off = offOv.getOrElse(0L)
              struct((fromComponents(m - "timezone") - off * 1000000L)
                .as("_tutc"), lit(off).as("_tzos"))
            }
          case Some(other) if isTimeT(inferType(other)) => compile(other)
          case Some(other) => localUsOf(other) match {
            case Some(us) => // session offset is UTC
              struct(us.as("_tutc"), lit(0L).as("_tzos"))
            case None => throw new CypherCompileException(
              s"time() expects a map, string literal or temporal value, got $other",
              CE.SyntaxError, CE.InvalidArgumentType)
          }
        }
      case "localtime.truncate" | "time.truncate" =>
        val unit = args(0) match {
          case StrLit(u) => u.toLowerCase
          case other => throw new CypherCompileException(
            s"$name() unit must be a string literal, got $other",
            CE.SyntaxError, CE.InvalidArgumentType)
        }
        val unitUs: Long = unit match {
          case "day" => DayUs
          case "hour" => 3600000000L
          case "minute" => 60000000L
          case "second" => 1000000L
          case "millisecond" => 1000L
          case "microsecond" => 1L
          case other => throw new CypherCompileException(
            s"$name() cannot truncate to unit '$other'",
            CE.ArgumentError, CE.InvalidArgumentValue)
        }
        val src = compile(args(1))
        val srcT = inferType(args(1))
        // A null source propagates (typed null struct), like every other
        // temporal function.
        if (args(1) == NullLit || srcT.contains(NullType))
          return if (name == "localtime.truncate")
            lit(null).cast(ExprCompiler.localTimeType)
          else lit(null).cast(ExprCompiler.timeType)
        if (name == "localtime.truncate") {
          val us =
            if (isLocalTimeT(srcT)) src.getField("_ltus")
            else if (isTimeT(srcT))
              src.getField("_tutc") + src.getField("_tzos") * 1000000L
            else throw new CypherCompileException(
              s"localtime.truncate() needs a time value",
              CE.SyntaxError, CE.InvalidArgumentType)
          // Optional override map applied to the truncated local clock
          // (the same selection machinery as time construction).
          val trunc = (us / unitUs).cast(LongType) * unitUs
          struct(timeTruncOverrides(args, name, trunc).as("_ltus"))
        } else {
          if (!isTimeT(srcT)) throw new CypherCompileException(
            s"time.truncate() needs a TIME value",
            CE.SyntaxError, CE.InvalidArgumentType)
          val os = src.getField("_tzos")
          val local = src.getField("_tutc") + os * 1000000L
          val trunc = (local / unitUs).cast(LongType) * unitUs
          val local2 = timeTruncOverrides(args, name, trunc)
          struct((local2 - os * 1000000L).as("_tutc"), os.as("_tzos"))
        }
      case "duration" => args(0) match {
        // duration({years:…, months:…, days:…, hours:…, minutes:…,
        // seconds:…}) -> (months, days, micros) struct, matching the
        // reference's Duration encoding (okapi-api/.../temporal/Duration.scala).
        case MapLit(items) =>
          val m = items.toMap
          // Statically-integer components take the exact Long path (no
          // double rounding on large micros). Anything else — a double, or
          // a component whose type can't be inferred (parameter, property)
          // and may be fractional at runtime — takes the fractional path:
          // each component may be fractional and its fraction cascades into
          // smaller units (Neo4j: 0.5 months → 30.436875/2 days),
          // truncating at microseconds. The fractional path is exact for
          // whole values at duration magnitudes (< 2^53 µs ≈ 285 years), so
          // routing unknown-typed whole numbers through it is safe; the
          // alternative (cast to Long) silently truncated runtime fractions.
          val anyFrac = m.values.exists(e =>
            !inferType(e).contains(LongType))
          if (!anyFrac) {
            def part(k: String): Column =
              m.get(k).map(e => compile(e).cast(LongType)).getOrElse(lit(0L))
            struct(
              (part("years") * 12 + part("months")).as("months"),
              (part("weeks") * 7 + part("days")).as("days"),
              ((part("hours") * 3600L + part("minutes") * 60L +
                part("seconds")) * 1000000L +
                part("milliseconds") * 1000L + part("microseconds")).as("micros"))
          } else {
            def part(k: String): Column =
              m.get(k).map(e => compile(e).cast(DoubleType)).getOrElse(lit(0.0))
            val monthsT = part("years") * 12 + part("months")
            val monthsW = monthsT.cast(LongType) // truncates toward zero
            val daysT = (monthsT - monthsW) * 30.436875 +
              part("weeks") * 7 + part("days")
            val daysW = daysT.cast(LongType)
            val microsT = (daysT - daysW) * 86400000000L +
              (part("hours") * 3600 + part("minutes") * 60 +
                part("seconds")) * 1000000L +
              part("milliseconds") * 1000 + part("microseconds")
            struct(monthsW.as("months"), daysW.as("days"),
              microsT.cast(LongType).as("micros"))
          }
        // duration('P1DT2H30M') — ISO-8601 string parsed driver-side into
        // the same (months, days, micros) struct (TemporalTypesHelper
        // parity: okapi-api/.../impl/temporal/TemporalTypesHelper.scala).
        case StrLit(s) =>
          val (mo, d, us) = ExprCompiler.parseIsoDuration(s)
          struct(lit(mo).as("months"), lit(d).as("days"), lit(us).as("micros"))
        case other => throw new CypherCompileException(
          s"duration() expects a map or string literal, got $other")
      }

      // ---- namespaced temporal functions (TemporalTests.scala parity) ----
      // duration.between/inMonths/inDays/inSeconds(a, b): the (months, days,
      // micros) decomposition between two temporal instants. Calendar months
      // are counted via add_months with day-of-month clamping (Jan 31 + 1M =
      // Feb 28), matching Neo4j; the field-difference estimate can overshoot
      // by at most one month, so a single adjustment suffices.
      case "duration.between" | "duration.inmonths" | "duration.indays" |
           "duration.inseconds" =>
        val opA = inferType(args(0))
        val opB = inferType(args(1))
        // Time-of-day operands: the duration is the instant difference
        // within the day (zoned times diff as instants, the ordering
        // convention) — a pure micros-group duration, zero months/days
        // (and inMonths/inDays of a same-day pair are zero by definition).
        def timeish(t: Option[DataType]) = isLocalTimeT(t) || isTimeT(t)
        def nullish(t: Option[DataType]) = t.forall(_ == NullType)
        if ((timeish(opA) && (timeish(opB) || nullish(opB))) ||
            (timeish(opB) && nullish(opA))) {
          def inst(c: Column, t: Option[DataType]): Column =
            if (isLocalTimeT(t)) c.getField("_ltus")
            else if (isTimeT(t)) c.getField("_tutc")
            else lit(null).cast(LongType) // null operand: result is null
          val micros = name match {
            case "duration.inmonths" | "duration.indays" => lit(0L)
            case _ => inst(a1, opB) - inst(a0, opA)
          }
          return when(a0.isNull || a1.isNull,
              lit(null).cast(ExprCompiler.durationType))
            .otherwise(struct(lit(0L).as("months"), lit(0L).as("days"),
              micros.as("micros")))
        }
        val ta = a0.cast(TimestampType)
        val tb = a1.cast(TimestampType)
        val ua = F.unix_micros(ta)
        val ub = F.unix_micros(tb)
        val dayUs = 86400000000L
        // Integer division truncating toward zero (Column./ is double div).
        def quot(x: Column, y: Long): Column = call_function("div", x, lit(y))
        val todA = ua - F.unix_micros(ta.cast(DateType).cast(TimestampType))
        def candUs(m: Column): Column =
          F.unix_micros(F.add_months(ta.cast(DateType), m)
            .cast(TimestampType)) + todA
        lazy val fullMonths: Column = {
          val m0 = (F.year(tb) - F.year(ta)) * 12 + (F.month(tb) - F.month(ta))
          when(ub >= ua && candUs(m0) > ub, m0 - 1)
            .when(ub < ua && candUs(m0) < ub, m0 + 1)
            .otherwise(m0).cast(LongType)
        }
        val result = name match {
          case "duration.inseconds" =>
            struct(lit(0L).as("months"), lit(0L).as("days"),
              (ub - ua).as("micros"))
          case "duration.indays" =>
            struct(lit(0L).as("months"), quot(ub - ua, dayUs).as("days"),
              lit(0L).as("micros"))
          case "duration.inmonths" =>
            struct(fullMonths.as("months"), lit(0L).as("days"),
              lit(0L).as("micros"))
          case _ =>
            val m = fullMonths
            val deltaD = ub - candUs(m.cast(IntegerType))
            struct(m.as("months"), quot(deltaD, dayUs).as("days"),
              (deltaD % dayUs).as("micros"))
        }
        when(a0.isNull || a1.isNull,
          lit(null).cast(ExprCompiler.durationType)).otherwise(result)

      // datetime/localdatetime/date.truncate(unit, temporal): unit must be a
      // literal; maps onto Spark's date_trunc (week truncates to Monday in
      // both). Units outside Spark's set (millennium/century/decade/weekYear)
      // are rejected as classified errors rather than silently misrounded.
      case "datetime.truncate" | "localdatetime.truncate" | "date.truncate" =>
        val unit = args(0) match {
          case StrLit(u) => u.toLowerCase
          case other => throw new CypherCompileException(
            s"$name unit must be a string literal, got $other",
            CE.ArgumentError, CE.InvalidArgumentType)
        }
        val supported = Set("year", "quarter", "month", "week", "day",
          "hour", "minute", "second", "millisecond", "microsecond",
          // year-span units (Neo4j surface; Spark's date_trunc lacks
          // them, so they truncate via year arithmetic below)
          "decade", "century", "millennium")
        if (!supported(unit)) throw new CypherCompileException(
          s"unsupported truncation unit '$unit'",
          CE.ArgumentError, CE.InvalidArgumentValue)
        val yearSpan =
          Map("decade" -> 10, "century" -> 100, "millennium" -> 1000)
        val t = yearSpan.get(unit) match {
          case Some(span) =>
            val y = year(a1.cast(TimestampType))
            make_date(y - F.pmod(y, lit(span)), lit(1), lit(1))
              .cast(TimestampType)
          case None => F.date_trunc(unit, a1.cast(TimestampType))
        }
        // Optional third argument: a map of component overrides applied to
        // the truncated value (Neo4j's truncate(unit, temporal, {map}) —
        // closes the "map argument not supported" divergence of round 6).
        val t2 =
          if (args.length < 3) t
          else args(2) match {
            case MapLit(items) =>
              val m = items.toMap.map { case (k, v) => k.toLowerCase -> v }
              val allowed =
                if (name == "date.truncate") Set("year", "month", "day")
                else Set("year", "month", "day", "hour", "minute",
                  "second", "millisecond", "microsecond")
              val extra = m.keySet -- allowed
              if (extra.nonEmpty) throw new CypherCompileException(
                s"$name override map supports " +
                  s"${allowed.toSeq.sorted.mkString("/")}, got: " +
                  extra.mkString(", "),
                CE.ArgumentError, CE.InvalidArgumentValue)
              def ovI(k: String, dflt: Column): Column =
                m.get(k).map(e => compile(e).cast(IntegerType)).getOrElse(dflt)
              val baseUs = F.unix_micros(t) -
                F.unix_micros(t.cast(DateType).cast(TimestampType))
              timestamp_micros(F.unix_micros(
                make_date(ovI("year", year(t)), ovI("month", month(t)),
                  ovI("day", dayofmonth(t))).cast(TimestampType)) +
                selectTimeUs(m, baseUs))
            case other => throw new CypherCompileException(
              s"$name third argument must be a map of component " +
                s"overrides, got $other",
              CE.SyntaxError, CE.InvalidArgumentType)
          }
        if (name == "date.truncate") t2.cast(DateType) else t2

      case "datetime.fromepoch" =>
        val nanos =
          if (args.length >= 2) call_function("div", a1.cast(LongType), lit(1000L))
          else lit(0L)
        F.timestamp_micros(a0.cast(LongType) * 1000000L + nanos)
      case "datetime.fromepochmillis" =>
        F.timestamp_millis(a0.cast(LongType))
      // Clock-namespace constructors (Neo4j: transaction/statement/
      // realtime clocks). The engine is a one-statement library call —
      // all three clocks are the SAME Spark statement clock; an optional
      // timezone argument is accepted and ignored for the instant types
      // (session-UTC semantics, same stance as zoned datetime literals).
      case "datetime.transaction" | "datetime.statement" | "datetime.realtime" =>
        current_timestamp()
      case "localdatetime.transaction" | "localdatetime.statement" |
           "localdatetime.realtime" => current_timestamp()
      case "date.transaction" | "date.statement" | "date.realtime" =>
        current_date()
      case "localtime.transaction" | "localtime.statement" |
           "localtime.realtime" => compile(FuncCall("localtime", Seq.empty, distinct = false))
      case "time.transaction" | "time.statement" | "time.realtime" =>
        compile(FuncCall("time", Seq.empty, distinct = false))

      // ---- bitwise (Expr.scala :916-949) ----
      case "shiftleft" => call_function("shiftleft", a0, a1)
      case "shiftright" => call_function("shiftright", a0, a1)
      case "shiftrightunsigned" => call_function("shiftrightunsigned", a0, a1)
      case "bitwiseand" => a0.bitwiseAND(a1)
      case "bitwiseor" => a0.bitwiseOR(a1)
      case "bitwisexor" => a0.bitwiseXOR(a1)
      case "range" =>
        // Cypher range(): a direction/step mismatch (range(2,1) or
        // range(1,2,-1)) yields [] — Spark's sequence instead throws, and
        // for literal args it throws at constant-folding time, so the
        // mismatch case must never reach sequence: route it through a safe
        // stop (= start) and emit an empty slice for it. A LITERAL zero
        // step is the TCK's classified NumberOutOfRange (Neo4j: "step
        // argument to range() cannot be zero"); a dynamic zero step joins
        // the mismatch branch ([] — the engine's non-ANSI analogue, same
        // stance as duration / 0).
        args.lift(2).collect {
          case graft.ast.IntLit(0L) =>
            throw new CypherCompileException(
              "step argument to range() cannot be zero",
              CE.SyntaxError, CE.NumberOutOfRange)
        }
        val step = (if (args.length >= 3) compile(args(2)) else lit(1L))
          .cast(LongType)
        val start = a0.cast(LongType)
        val stop = a1.cast(LongType)
        val mismatch = (stop > start && step < 0) ||
          (stop < start && step > 0) || step === 0
        when(mismatch, F.slice(sequence(start, start, lit(1L)), 1, 0))
          .otherwise(sequence(start, when(mismatch, start).otherwise(stop), step))
      case "coalesce" =>
        if (args.isEmpty)
          throw new CypherCompileException(
            "coalesce() requires at least one argument",
            CE.SyntaxError, CE.InvalidNumberOfArguments)
        unifyEntities(args).map(F.coalesce(_: _*))
          .getOrElse(F.coalesce(args.map(compile): _*))

      case other => extensions.get(other) match {
        // session-registered extension functions (procedure-like hooks)
        case Some(fn) => fn(args.map(compile))
        case None =>
          throw new CypherCompileException(s"unknown function $other", CE.SyntaxError, CE.UnknownFunction)
      }
    }
  }
}
