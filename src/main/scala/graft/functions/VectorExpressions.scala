package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions (SURVEY.md §2.8 declared
  * extension surface). Spark's higher-order functions (zip_with +
  * aggregate) evaluate per element through boxed lambda calls and are
  * excluded from whole-stage codegen; these expressions generate a
  * primitive double loop inline in the codegen'd stage instead —
  * preference order (b) from the engine guidelines: a native
  * `Expression` with doGenCode beats a Scala UDF.
  *
  * Summation is left-to-right like functions.aggregate and DuckDB's
  * list_sum, so results stay bit-identical to the oracle paths.
  */
object VectorExpressions {
  private def checkArrayDouble(name: String,
      children: Seq[Expression]): TypeCheckResult = {
    // match on element type only — containsNull varies by producer
    val bad = children.find(c => c.dataType match {
      case ArrayType(DoubleType, _) => false
      case _ => true
    })
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> arguments, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Σᵢ aᵢ·bᵢ over two array<double> columns (length = min of the two). */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(left, right))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σᵢ aᵢ²) — L2 norm of an array<double> column. */
  case class VecNorm(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayDouble(prettyName, Seq(child))

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) { val v = x.getDouble(i); acc += v * v; i += 1 }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |double $acc = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = $a.getDouble($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): VecNorm =
      copy(child = newChild)
  }

  private def arrD(c: Column): Column =
    org.apache.spark.sql.functions.transform(c, x => x.cast(DoubleType))

  /** Column-API entry points (arrays are cast elementwise to double so
    * float columns work unchanged). Registration is idempotent and
    * session-scoped; Column construction goes through call_function —
    * the public route from a registered Expression builder to a
    * Column in Spark 4. */
  def vecDot(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("vec_dot", arrD(a), arrD(b))
  }

  def vecNorm(a: Column): Column = {
    register(SparkSession.active)
    call_function("vec_norm", arrD(a))
  }

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** No-cast variants for columns that are ALREADY array<double>: the
    * `arrD` elementwise cast is an interpreted HigherOrderFunction, so
    * on a pairwise hot path (O(N²) evaluations) it dominates the
    * codegen'd kernel it feeds. Callers guarantee the element type. */
  def vecDotD(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("vec_dot", a, b)
  }

  def vecNormD(a: Column): Column = {
    register(SparkSession.active)
    call_function("vec_norm", a)
  }

  /** SQL registration: makes vec_dot/vec_norm usable from spark.sql
    * and the Column API. Inputs must be array<double> (the Column
    * wrappers cast elementwise). */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => VecNorm(exprs.head), "built-in")
  }
}
