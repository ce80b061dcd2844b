package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic over `array<double>` / `array<float>`
  * columns (each side independently; accumulation always in double).
  *
  * The HOF route (`aggregate(zip_with(...))`) evaluates a boxed lambda
  * per element — on the kNN candidate stream that is tens of millions
  * of boxed Doubles per second and the allocation churn throttles
  * per-core throughput at high parallelism. These expressions stay in
  * whole-stage codegen with a primitive double loop. Float support
  * exists so the high-volume LSH candidate shuffle can carry 4-byte
  * elements (half the bus/shuffle bytes) without a per-row cast back.
  */
object VectorExprs {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def checkArrays(l: Expression, r: Expression, name: String): TypeCheckResult =
    if (isVec(l.dataType) && isVec(r.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<double|float>, got ${l.dataType} / ${r.dataType}")

  /** Element accessor (interpreted path): double regardless of storage. */
  private def get(e: Expression, a: ArrayData, i: Int): Double = e.dataType match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Element accessor (codegen): double regardless of storage. */
  private def getGen(e: Expression, arr: String, i: String): String = e.dataType match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  /** Σ (a_i − b_i)² over min length. */
  case class SqDist(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = checkArrays(left, right, "sq_dist")
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "sq_dist"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { val d = get(left, x, i) - get(right, y, i); s += d * d; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val d = ctx.freshName("d"); val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = ${getGen(left, a, i)} - ${getGen(right, b, i)};
           |  $s += $d * $d;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Σ a_i·b_i over min length (left-to-right accumulation — same float
    * semantics as the sequential HOF it replaces).
    */
  case class Dot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = checkArrays(left, right, "vec_dot")
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += get(left, x, i) * get(right, y, i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${getGen(left, a, i)} * ${getGen(right, b, i)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def sq_dist(a: Column, b: Column): Column =
    Bridge.column(SqDist(Bridge.expression(a), Bridge.expression(b)))

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(Dot(Bridge.expression(a), Bridge.expression(b)))
}
