package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{Decimal, DoubleType, LongType}

/** SQL surface for graft's native Catalyst expressions, the
  * SparkSessionExtensions way: `spark.sql.extensions=graft.plans.
  * GraftExtensions` on a cluster (or `.withExtensions(new GraftExtensions)`
  * at build time) registers
  *
  *  - `ewm(x, alpha)` — the running exponentially-weighted-mean WINDOW
  *    function ([[EwmUpdate]]); use under `OVER (PARTITION BY … ORDER BY …)`
  *  - `top_k_by_score(score, id, k)` — the bounded-heap top-k AGGREGATE
  *    ([[TopKByScore]]); returns array<struct<score, id>> score-desc
  *
  * so SQL-only users (spark.sql, thriftserver, notebooks) reach the same
  * kernels the Column API uses. [[GraftExtensions.registerAll]] performs
  * the identical registration on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def toDouble(e: Expression, what: String): Double = e match {
    case l: Literal => l.value match {
      case d: Double  => d
      case f: Float   => f.toDouble
      case d: Decimal => d.toDouble // bare SQL literals like 0.5
      case n: Number  => n.doubleValue()
      case _ => throw new IllegalArgumentException(s"$what must be a numeric literal")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  private def toInt(e: Expression, what: String): Int = e match {
    case l: Literal => l.value match {
      case i: Int    => i
      // reject instead of Number.intValue-truncating: `2.9` must not run
      // with k=2, and 2^33+2 must not wrap to 2
      case n: Number if n.longValue() == n.intValue() &&
        n.doubleValue() == n.intValue().toDouble => n.intValue()
      case _ => throw new IllegalArgumentException(
        s"$what must be an integer literal (got non-integral or out-of-range value)")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  private def ewmBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "ewm(x, alpha) takes exactly two arguments")
    val alpha = toDouble(args(1), "ewm alpha")
    require(alpha > 0.0 && alpha <= 1.0, s"ewm alpha must be in (0, 1], got $alpha")
    EwmUpdate(Cast(args.head, DoubleType), alpha)
  }

  private def topKBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3, "top_k_by_score(score, id, k) takes three arguments")
    TopKByScore(Cast(args(0), DoubleType), Cast(args(1), LongType),
      toInt(args(2), "top_k_by_score k"))
  }

  /** (identifier, info, builder) triples shared by the extensions hook and
    * [[registerAll]].
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ewm"),
      new ExpressionInfo(classOf[EwmUpdate].getCanonicalName, null, "ewm"),
      ewmBuilder _),
    (FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getCanonicalName, null,
        "top_k_by_score"),
      topKBuilder _),
  )

  /** Register the graft SQL functions on an already-built session (the
    * notebook path — no config restart needed).
    */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      bridge.registerFunction(spark, id, info, builder)
    }
}
