package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-canonicalization expression (SURVEY.md §2.8 extension
  * surface, same escalation rung as [[VectorExpressions]]): Unicode
  * accent stripping — NFD-decompose, drop combining marks — the way
  * text pipelines canonicalize before dedup/fingerprinting. Spark has
  * no built-in for it and a Scala UDF would box every row and block
  * whole-stage codegen; this stays inside the codegen'd stage and
  * calls one static helper per row.
  *
  * The helper's ASCII fast path matters at corpus scale: web text is
  * overwhelmingly ASCII, and `numBytes == numChars` (every UTF-8 char
  * is one byte ⇒ pure ASCII) returns the input UTF8String untouched —
  * no JVM String materialization, no Normalizer pass — so the common
  * row costs one integer compare. Parity with DuckDB's strip_accents
  * on the Latin range is what the text_normalize oracle checks.
  */
object StringExpressions {
  private val CombiningMarks = Pattern.compile("\\p{M}")

  /** Called from generated code (static forwarder on the companion
    * class), so the signature stays UTF8String → UTF8String. */
  def stripAccentsJava(s: UTF8String): UTF8String = {
    // pure-ASCII fast path: 1 byte per char ⇔ no code point above 0x7F
    if (s.numBytes == s.numChars) s
    else UTF8String.fromString(
      CombiningMarks.matcher(
        Normalizer.normalize(s.toString, Normalizer.Form.NFD))
        .replaceAll(""))
  }

  /** unaccent(string): á→a, ñ→n, ç→c, … (anything NFD splits into a
    * base char + combining marks); non-decomposable chars pass through. */
  case class Unaccent(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "unaccent"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case _: StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${t.sql}")
      }

    override def nullSafeEval(v: Any): Any =
      stripAccentsJava(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.StringExpressions.stripAccentsJava($c);")

    override protected def withNewChildInternal(newChild: Expression): Unaccent =
      copy(child = newChild)
  }

  /** Column-API entry point; registration is idempotent and
    * session-scoped (same route as [[VectorExpressions.vecDot]]). */
  def unaccent(c: Column): Column = {
    register(SparkSession.active)
    call_function("unaccent", c)
  }

  /** SQL registration: makes unaccent usable from spark.sql too. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unaccent", exprs => Unaccent(exprs.head), "built-in")
}
