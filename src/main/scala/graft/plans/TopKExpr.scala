package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs under the total
  * order (score DESC, id ASC). A binary min-heap whose root is the WORST
  * retained pair, so each candidate costs O(1) when it loses to the root and
  * O(log k) when it displaces it; memory is exactly k pairs regardless of
  * input size. Non-finite scores are the caller's problem (knnJoin skips
  * them before update).
  */
private[graft] final class TopKBuffer(val k: Int) {
  // parallel arrays beat a PriorityQueue[(Double, Long)] here: no boxing of
  // the hot (score, id) pairs during the corpus scan. Capacity grows on
  // demand (doubling, capped at k): a grouped aggregate with MANY small
  // groups and a large k must cost O(rows-seen) per group, not O(k) —
  // eager k-sized allocation at buffer creation would request k*16 bytes
  // per group regardless of how few rows it ever sees
  private var cap = math.min(k, 16)
  private var scores = new Array[Double](cap)
  private var ids = new Array[Long](cap)
  private var n = 0

  private def grow(): Unit = {
    cap = math.min(k, math.max(cap * 2, 16))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  /** true if (s1, i1) is WORSE than (s2, i2): lower score, or same score
    * and larger id.
    */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of the worst among i and its children
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = ts; ids(w) = ti
      i = w
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (n < k) {
      if (n == cap) grow()
      // sift up
      var i = n
      scores(i) = score; ids(i) = id
      n += 1
      var p = (i - 1) / 2
      while (i > 0 && worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p; p = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  def size: Int = n

  def foreachPair(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  /** Best-first (score DESC, id ASC) snapshot. */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    // a sorts before b iff b is worse — strict, so sortWith is stable here
    out.sortWith { case ((s1, i1), (s2, i2)) => worse(s2, i2, s1, i1) }
  }
}

/** `top_k_by_score(score, id, k)` — a native Catalyst TypedImperativeAggregate
  * returning the k best (score, id) pairs as array<struct<score, id>> in
  * (score DESC, id ASC) order. Partial aggregation applies: every map task
  * folds its rows into one k-bounded heap per group before the shuffle, so a
  * grouped top-k over N rows shuffles O(parts * groups * k) pairs instead of
  * N — the aggregate that makes a k-NN join linear in the corpus. Null and
  * NaN scores and null ids are skipped (NaN compares false both ways, which
  * would silently corrupt the heap's ordering invariant).
  */
case class TopKByScore(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {
  require(k > 0, s"top-k size must be positive, got $k")

  private def score: Expression = left
  private def id: Expression = right

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null && !s.asInstanceOf[Double].isNaN) {
      val i = id.eval(input)
      if (i != null) buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreachPair((s, i) => buffer.insert(s, i))
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (s, i) =>
      InternalRow(s, i): Any
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k)
    bb.putInt(buffer.size)
    buffer.foreachPair((s, i) => { bb.putDouble(s); bb.putLong(i) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bk = bb.getInt
    val n = bb.getInt
    val buf = new TopKBuffer(bk)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKExpr {
  /** Aggregate Column: k best (score, id) pairs per group, score DESC with
    * id ASC tie-break. `id` must be castable to long.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    bridge.exprColumn(
      TopKByScore(
        Cast(bridge.columnExpr(score), DoubleType),
        Cast(bridge.columnExpr(id), LongType), k).toAggregateExpression())
}
