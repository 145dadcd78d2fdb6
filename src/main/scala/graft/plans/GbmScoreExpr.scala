package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  protected override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData].toDoubleArray()
    var s = base
    var t = 0
    while (t < trees.length) { s += GraftGbm.walkRaw(trees(t), a); t += 1 }
    s
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
