package graft.api

/** TCK-style error classification. The openCypher TCK asserts failures as
  * `a <Type> should be raised at <phase>: <Detail>` (the reference runs
  * those steps through its harness,
  * morpheus-tck/src/test/scala/.../TckSparkCypherTest.scala:39-100); graft
  * carries the same three coordinates on every engine-raised failure so a
  * caller — and the TCK-mirror suite — can classify without string-matching
  * messages.
  *
  * Phases: graft detects everything it can at compile time (parse + plan,
  * before a Spark job runs). Errors that only manifest during execution
  * (e.g. ANSI arithmetic overflow inside a Spark task) surface as Spark's
  * own exceptions at action time and are outside this taxonomy.
  */
object CypherError {

  sealed abstract class Type(val name: String) {
    override def toString: String = name
  }
  case object SyntaxError extends Type("SyntaxError")
  case object SemanticError extends Type("SemanticError")
  case object TypeError extends Type("TypeError")
  case object ArgumentError extends Type("ArgumentError")
  case object ArithmeticError extends Type("ArithmeticError")
  case object ParameterMissing extends Type("ParameterMissing")
  case object ConstraintValidationFailed
    extends Type("ConstraintValidationFailed")

  sealed abstract class Phase(val name: String) {
    override def toString: String = name
  }
  case object CompileTime extends Phase("compile time")
  case object Runtime extends Phase("runtime")

  /** Stable detail codes (the TCK's detail vocabulary, restricted to what a
    * read-only engine can raise). */
  val UndefinedVariable = "UndefinedVariable"
  val InvalidSyntax = "InvalidSyntax"
  val UnknownFunction = "UnknownFunction"
  val InvalidArgumentType = "InvalidArgumentType"
  val InvalidArgumentValue = "InvalidArgumentValue"
  val InvalidAggregation = "InvalidAggregation"
  val NestedAggregation = "NestedAggregation"
  val NegativeIntegerArgument = "NegativeIntegerArgument"
  val InvalidArgumentExpression = "InvalidArgumentExpression"
  val DifferentColumnsInUnion = "DifferentColumnsInUnion"
  val InvalidClauseComposition = "InvalidClauseComposition"
  val ListElementAccessByNonInteger = "ListElementAccessByNonInteger"
  val MapElementAccessByNonString = "MapElementAccessByNonString"
  val InvalidElementAccess = "InvalidElementAccess"
  val MissingParameter = "MissingParameter"
  val InvalidTemporalValue = "InvalidTemporalValue"
  val UnsupportedExpression = "UnsupportedExpression"
  val InvalidDelete = "InvalidDelete"
  val DeleteConnectedNode = "DeleteConnectedNode"
  val NoSingleRelationshipType = "NoSingleRelationshipType"
  val RequiresDirectedRelationship = "RequiresDirectedRelationship"
  val CreatingVarLength = "CreatingVarLength"
  val VariableAlreadyBound = "VariableAlreadyBound"
  val ColumnNameConflict = "ColumnNameConflict"
  val NoExpressionAlias = "NoExpressionAlias"
  val NumberOutOfRange = "NumberOutOfRange"
  val NoVariablesInScope = "NoVariablesInScope"
  val InvalidNumberOfArguments = "InvalidNumberOfArguments"
  val AmbiguousAggregationExpression = "AmbiguousAggregationExpression"
  val DivisionByZero = "DivisionByZero"
}

/** Root of every failure graft itself raises. `errorType`/`phase`/`detail`
  * are the TCK coordinates; `getMessage` stays human-oriented. */
class CypherException(
    val errorType: CypherError.Type,
    val phase: CypherError.Phase,
    val detail: String,
    msg: String)
  extends RuntimeException(msg) {
  override def toString: String =
    s"$errorType at $phase ($detail): $msg"
}
