package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import graft.forecast.GraftGbm

/** Batch GraftGbm scoring as a native expression: `ArrayData.toDoubleArray`
  * hands the tree walk a primitive double[] straight from the columnar row,
  * where the previous Scala UDF boxed every feature of every row into a
  * `Seq[Double]` (the fused recursive loop already scored through the
  * unboxed `scorer`; this closes the same gap on the `predict(df)` path).
  * CodegenFallback: the per-row work is data-dependent tree branching that
  * codegen couldn't straighten, and the surrounding projection still
  * whole-stage-compiles around it.
  */
case class GbmScoreExpr(child: Expression,
                        trees: Array[Array[GraftGbm.Node]],
                        base: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ggbm_score"
  // analysis-time rejection of a non-double-array child (a raw
  // ClassCastException or silently-wrong bytes at runtime otherwise);
  // callers cast explicitly like GraftGbmTrained.predict does
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ggbm_score expects array<double>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    // element-wise copy instead of toDoubleArray: a null element must take
    // the model's missing-value branch (NaN), not read as an unsafe-row
    // zero (silently scoring feature=0.0) or NPE on a generic array
    val a = new Array[Double](n)
    var i = 0
    while (i < n) {
      a(i) = if (ad.isNullAt(i)) Double.NaN else ad.getDouble(i)
      i += 1
    }
    GraftGbm.scoreRaw(trees, base, a)
  }

  override protected def withNewChildInternal(newChild: Expression): GbmScoreExpr =
    copy(child = newChild)
}

object GbmScoreExpr {
  /** Column wrapper: score a non-null `array<double>` feature column. */
  def score(features: Column, trees: Array[Array[GraftGbm.Node]],
            base: Double): Column =
    bridge.exprColumn(GbmScoreExpr(bridge.columnExpr(features), trees, base))
}
