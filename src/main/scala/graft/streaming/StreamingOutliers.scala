package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Outliers

/** Ingest-time outlier gating for panel streams — the stateful Structured
  * Streaming twin of `Outliers.hampelTrailing`: per-series keyed state
  * holds a ring of the last `2k` target values (bounded: 16 bytes × 2k per
  * series, independent of stream length), each arriving row scores against
  * the trailing median/MAD of ring + itself, and the gate emits the row
  * with its flag and the filtered value.
  *
  * Parity contract: under event-time-ordered ingest per series (the same
  * contract as `StreamingAsof`/`StreamingForecast`), the emitted
  * med/mad/flag/filtered values are BIT-EQUAL to the batch
  * `hampelTrailing` output — the kernel replays the Column expression's
  * sort + selection/half-sum arithmetic (`Outliers.medianOfSortedJvm`) and
  * the identical threshold operation order. StreamingSpec asserts it.
  */
object StreamingOutliers {

  /** Row shapes through the keyed state (top-level for Catalyst codegen
    * access, like `StreamingDedup.DocRow`).
    */
  private[streaming] case class PanelIn(id: String, ds: Long, y: Double)
  private[streaming] case class RingState(vals: Array[Double])
  private[streaming] case class HampelRow(unique_id: String, ds: Long,
      y: Double, med: Double, mad: Double, is_outlier: Boolean,
      y_hampel: Double)

  /** Attach the trailing-Hampel gate to a streaming frame with columns
    * (`idCol`, `dsCol` long-castable, `yCol`). Null targets are dropped
    * (the panel contract rejects them upstream). Run with append mode.
    */
  def hampelGate(rows: DataFrame, idCol: String, dsCol: String, yCol: String,
                 k: Int, nSigmas: Double = 3.0): DataFrame = {
    require(k >= 1, s"window half-width k must be >= 1, got $k")
    require(nSigmas > 0, s"nSigmas must be positive, got $nSigmas")
    val spark = rows.sparkSession
    import spark.implicits._
    val keep = 2 * k
    val keyed = rows
      // the ds guard mirrors the y guard: a single null (or non-castable)
      // timestamp would fail PanelIn's non-nullable field on EVERY replay —
      // a poison row taking the whole gate down
      .filter(col(yCol).isNotNull && col(dsCol).cast("long").isNotNull)
      .select(col(idCol).cast("string").as("id"),
        col(dsCol).cast("long").as("ds"), col(yCol).cast("double").as("y"))
      .as[PanelIn]
    keyed.groupByKey(_.id)
      .flatMapGroupsWithState[RingState, HampelRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: String, it: Iterator[PanelIn], state: GroupState[RingState]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
          state.getOption.foreach(s => buf ++= s.vals)
          val out = it.toArray.sortBy(_.ds).map { r =>
            val tail = buf.takeRight(keep)
            val win = new Array[Double](tail.length + 1)
            var i = 0
            while (i < tail.length) { win(i) = tail(i); i += 1 }
            win(tail.length) = r.y
            java.util.Arrays.sort(win)
            val med = Outliers.medianOfSortedJvm(win)
            val dev = new Array[Double](win.length)
            i = 0
            while (i < win.length) { dev(i) = math.abs(win(i) - med); i += 1 }
            java.util.Arrays.sort(dev)
            val mad = Outliers.medianOfSortedJvm(dev)
            // identical operation order to the batch expression:
            // |y - med| > (nSigmas * 1.4826) * mad
            val isOut = math.abs(r.y - med) > nSigmas * 1.4826 * mad
            buf += r.y
            HampelRow(id, r.ds, r.y, med, mad, isOut,
              if (isOut) med else r.y)
          }
          state.update(RingState(buf.takeRight(keep).toArray))
          out.iterator
      }.toDF()
  }
}
