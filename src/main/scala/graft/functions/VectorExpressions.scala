package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
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

  /** Sparse-vector dot by sorted-key merge intersection:
    * Σ wa[i]·wb[j] over positions where ha[i] == hb[j], with ha/hb
    * each sorted ascending (the packed-vector layout of
    * [[graft.operators.FuzzyJoin]]). A join's output rows stream
    * through this inside whole-stage codegen reading UnsafeArrayData
    * in place — the previous Dataset kernel decoded four primitive
    * arrays per pair (n²/2 allocations on the all-pairs path; the r06
    * driver measured 5.5 s GC for 6.15 s wall on fuzzy_cosine_join).
    * Accumulation order is ascending-key, identical to the old kernel,
    * so emitted values are bit-for-bit unchanged. */
  case class MergeDot(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "merge_dot"
    override def checkInputDataTypes(): TypeCheckResult = {
      def isArr(e: Expression, et: DataType): Boolean = e.dataType match {
        case ArrayType(t, _) => t == et
        case _ => false
      }
      if (isArr(first, LongType) && isArr(third, LongType) &&
          isArr(second, DoubleType) && isArr(fourth, DoubleType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<double>, " +
          s"array<bigint>, array<double>) arguments")
    }

    override def nullSafeEval(ha: Any, wa: Any, hb: Any, wb: Any): Any = {
      val ka = ha.asInstanceOf[ArrayData]; val va = wa.asInstanceOf[ArrayData]
      val kb = hb.asInstanceOf[ArrayData]; val vb = wb.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var acc = 0.0
      val na = ka.numElements(); val nb = kb.numElements()
      while (i < na && j < nb) {
        val x = ka.getLong(i); val y = kb.getLong(j)
        if (x == y) { acc += va.getDouble(i) * vb.getDouble(j); i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (ha, wa, hb, wb) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val acc = ctx.freshName("acc")
        s"""
           |int $i = 0; int $j = 0;
           |int $na = $ha.numElements(); int $nb = $hb.numElements();
           |double $acc = 0.0;
           |while ($i < $na && $j < $nb) {
           |  long $x = $ha.getLong($i); long $y = $hb.getLong($j);
           |  if ($x == $y) { $acc += $wa.getDouble($i) * $wb.getDouble($j); $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression, q: Expression): MergeDot =
      copy(first = f, second = s, third = t, fourth = q)
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

  /** Merge-intersection sparse dot over (keys, weights, keys, weights)
    * columns — keys array<bigint> sorted ascending, weights
    * array<double> parallel to them. */
  def mergeDot(ha: Column, wa: Column, hb: Column, wb: Column): Column = {
    register(SparkSession.active)
    call_function("merge_dot", ha, wa, hb, wb)
  }

  /** SQL registration: makes vec_dot/vec_norm usable from spark.sql
    * and the Column API. Inputs must be array<double> (the Column
    * wrappers cast elementwise). */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => VecNorm(exprs.head), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "merge_dot", exprs => MergeDot(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
  }
}
