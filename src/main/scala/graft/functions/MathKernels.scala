package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** IEEE-exact math kernels the Column algebra cannot express — ulp/bit
  * stepping and integer gcd loops (reference `unary/numpy.py` /
  * `binary/numpy.py`: spacing, rint, signbit, nextafter, fmax/fmin,
  * gcd/lcm). Same escalation tier as `DotProduct`: a native Expression
  * whose `doGenCode` emits direct JDK-intrinsic Java, so the ops stay
  * inside whole-stage codegen. All ops are total functions of their
  * operands (no state, no partition dependence).
  */
case class MathUnary(op: String, child: Expression) extends UnaryExpression {
  require(MathUnary.ops.contains(op), s"unknown graft_mu op $op")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_mu($op) needs double, got ${t.simpleString}")
  }

  override def dataType: DataType =
    if (op == "signbit") BooleanType else DoubleType

  override def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Double]
    op match {
      // numpy spacing: signed distance to the adjacent representable value
      // away from zero; copysign carries ±0 correctly (spacing(-0.0) < 0)
      case "spacing" => java.lang.Math.copySign(java.lang.Math.ulp(v), v)
      case "rint"    => java.lang.Math.rint(v) // half-even, like numpy.rint
      case "signbit" => (java.lang.Double.doubleToRawLongBits(v) >>> 63) == 1L
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => op match {
      case "spacing" =>
        s"${ev.value} = java.lang.Math.copySign(java.lang.Math.ulp($x), $x);"
      case "rint" => s"${ev.value} = java.lang.Math.rint($x);"
      case "signbit" =>
        s"${ev.value} = (java.lang.Double.doubleToRawLongBits($x) >>> 63) == 1L;"
    })

  override protected def withNewChildInternal(c: Expression): MathUnary =
    copy(child = c)
  override def prettyName: String = s"graft_mu_$op"
}

object MathUnary {
  val ops: Set[String] = Set("spacing", "rint", "signbit")
  def apply(op: String, c: Column): Column =
    GraftSqlShims.column(MathUnary(op, GraftSqlShims.expressionOf(c)))
}

case class MathBinary(op: String, left: Expression, right: Expression)
    extends BinaryExpression {
  require(MathBinary.ops.contains(op), s"unknown graft_mb op $op")

  private def integral = op == "gcd" || op == "lcm"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if integral => TypeCheckResult.TypeCheckSuccess
      case (DoubleType, DoubleType) if !integral => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_mb($op) needs ${if (integral) "bigint" else "double"} operands, " +
          s"got ${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = if (integral) LongType else DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = op match {
    case "nextafter" =>
      java.lang.Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
    // numpy fmax/fmin IGNORE NaN: NaN only when both operands are NaN
    case "fmax" =>
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      if (x.isNaN) y else if (y.isNaN) x else math.max(x, y)
    case "fmin" =>
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      if (x.isNaN) y else if (y.isNaN) x else math.min(x, y)
    case "gcd" => MathBinary.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "lcm" =>
      val g = MathBinary.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
      if (g == 0L) 0L
      else math.abs(a.asInstanceOf[Long] / g * b.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => op match {
      case "nextafter" =>
        s"${ev.value} = java.lang.Math.nextAfter($x, $y);"
      case "fmax" =>
        s"""${ev.value} = java.lang.Double.isNaN($x) ? $y
           |  : (java.lang.Double.isNaN($y) ? $x : java.lang.Math.max($x, $y));""".stripMargin
      case "fmin" =>
        s"""${ev.value} = java.lang.Double.isNaN($x) ? $y
           |  : (java.lang.Double.isNaN($y) ? $x : java.lang.Math.min($x, $y));""".stripMargin
      case "gcd" | "lcm" =>
        val g1 = ctx.freshName("g1")
        val g2 = ctx.freshName("g2")
        val t = ctx.freshName("t")
        val euclid =
          s"""long $g1 = java.lang.Math.abs($x);
             |long $g2 = java.lang.Math.abs($y);
             |while ($g2 != 0L) { long $t = $g1 % $g2; $g1 = $g2; $g2 = $t; }
           """.stripMargin
        if (op == "gcd") s"$euclid\n${ev.value} = $g1;"
        else s"$euclid\n${ev.value} = ($g1 == 0L) ? 0L : java.lang.Math.abs($x / $g1 * $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MathBinary =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = s"graft_mb_$op"
}

object MathBinary {
  val ops: Set[String] = Set("nextafter", "fmax", "fmin", "gcd", "lcm")

  /** Euclid on |a|,|b| (numpy int64 convention: non-negative result;
    * Long.MinValue overflow mirrors numpy's int64 wraparound). */
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0L) { val t = x % y; x = y; y = t }
    x
  }

  def apply(op: String, a: Column, b: Column): Column =
    GraftSqlShims.column(MathBinary(op, GraftSqlShims.expressionOf(a),
      GraftSqlShims.expressionOf(b)))
}
