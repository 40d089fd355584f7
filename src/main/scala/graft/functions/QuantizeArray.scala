package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst element-wise dyadic quantization of a numeric array:
  * out[i] = floor(in[i] · 2^24) / 2^24 — the exact-rational projection
  * Clustering's k-means applies before any aggregation (its determinism
  * contract). Same escalation rationale as DotProduct: the composable
  * `transform(arr, v => floor(v * Q) / Q)` is a HigherOrderFunction, which
  * Spark evaluates INTERPRETED (a per-element lambda dispatch outside
  * whole-stage codegen), and this projection runs over the full corpus once
  * per Lloyd scan. Semantics match the composed form on real embedding
  * data: null ELEMENTS map to 0.0 (embeddings store none — parquet merely
  * declares containsNull); a null ARRAY yields null. Agreement with the
  * composed form is test-pinned (ClusteringSpec).
  */
case class QuantizeArray(child: Expression) extends UnaryExpression {

  private val Q = 16777216.0 // 2^24

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_quantize requires array<float|double>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    // hoisted: elemIsFloat pattern-matches dataType — once per row, not
    // once per element (768× redundant on an embedding corpus)
    val isF = elemIsFloat
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = math.floor(v * Q) / Q
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $x.numElements();
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    $arr[$i] = java.lang.Math.floor(
         |      ((double) $x.$get($i)) * 1.6777216E7) / 1.6777216E7;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeArray =
    copy(child = newChild)

  override def prettyName: String = "graft_quantize"
}

object QuantizeArray {
  def apply(a: Column): Column =
    GraftSqlShims.column(QuantizeArray(GraftSqlShims.expressionOf(a)))
}
