package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time forward-fill for panel streams — the stateful Structured
  * Streaming twin of `PanelFrame.fillForward`: per-series keyed state is
  * ONE value (the last non-null target seen), each arriving row emits the
  * observed value or the carried one. Bit-equal to the batch fill under
  * event-time-ordered ingest (StreamingSpec asserts it); state is 8 bytes
  * per series regardless of stream length — the cheapest possible gate.
  */
object StreamingImpute {

  private[streaming] case class GapIn(id: String, ds: Long,
      y: Option[Double])
  private[streaming] case class LastSeen(v: Double)
  private[streaming] case class FfillRow(unique_id: String, ds: Long,
      y: Option[Double], y_ff: Option[Double])

  /** Attach the forward-fill gate to a streaming frame with columns
    * (`idCol`, `dsCol` long-castable, `yCol` nullable). Append mode.
    */
  def ffillGate(rows: DataFrame, idCol: String, dsCol: String,
                yCol: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val keyed = rows
      // y stays nullable (gaps are the point) but a null/non-castable ds
      // would poison the query: GapIn.ds is non-nullable
      .filter(col(dsCol).cast("long").isNotNull)
      .select(col(idCol).cast("string").as("id"),
        col(dsCol).cast("long").as("ds"), col(yCol).cast("double").as("y"))
      .as[GapIn]
    keyed.groupByKey(_.id)
      .flatMapGroupsWithState[LastSeen, FfillRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: String, it: Iterator[GapIn], state: GroupState[LastSeen]) =>
          var last: Option[Double] = state.getOption.map(_.v)
          val out = it.toArray.sortBy(_.ds).map { r =>
            if (r.y.isDefined) last = r.y
            FfillRow(id, r.ds, r.y, if (r.y.isDefined) r.y else last)
          }
          last.foreach(v => state.update(LastSeen(v)))
          out.iterator
      }.toDF()
  }
}
