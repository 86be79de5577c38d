package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Fused cosine similarity over two numeric-array columns as a native
  * Catalyst expression: ONE loop computes the dot product and both norms.
  *
  * The `functions.zip_with`/`aggregate` formulation this replaces runs
  * interpreted (Spark higher-order functions have no codegen) and
  * traverses the arrays three times (dot, |a|, |b|); this expression
  * participates in whole-stage codegen, keeping the ANN / embedding-dedup
  * hot paths inside one generated loop. Native-expression precedent in
  * the reference: its custom `Serialize` id expression
  * (morpheus-spark-cypher/.../impl/expressions/Serialize.scala).
  *
  * Semantics match the HOF form it replaces: null if either array is
  * null; null ELEMENTS contribute 0 (only checked when the child type
  * says elements may be null — the check is elided from the generated
  * code otherwise); arrays of different lengths pair up to the shorter
  * one; zero-norm inputs follow IEEE division (NaN), same as the
  * previous formulation and the DuckDB oracle's replay.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two numeric arrays, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    def get(arr: ArrayData, dt: DataType, i: Int): Double =
      if (arr.isNullAt(i)) 0.0
      else dt match {
        case FloatType => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case IntegerType => arr.getInt(i).toDouble
        case LongType => arr.getLong(i).toDouble
        case ShortType => arr.getShort(i).toDouble
        case ByteType => arr.getByte(i).toDouble
        case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
      }
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, lt, i)
      val yi = get(y, rt, i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(e: Expression, arr: String, i: String): String = {
        val raw = elemType(e) match {
          case FloatType => s"(double) $arr.getFloat($i)"
          case DoubleType => s"$arr.getDouble($i)"
          case IntegerType => s"(double) $arr.getInt($i)"
          case LongType => s"(double) $arr.getLong($i)"
          case ShortType => s"(double) $arr.getShort($i)"
          case ByteType => s"(double) $arr.getByte($i)"
          case d: DecimalType =>
            s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
        }
        if (elemNullable(e)) s"($arr.isNullAt($i) ? 0.0 : ($raw))" else raw
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        double $na = 0.0;
        double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = ${getter(left, a, i)};
          double $yi = ${getter(right, b, i)};
          $dot += $xi * $yi;
          $na += $xi * $xi;
          $nb += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
}

object CosineSimilarity {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
