package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Stats

/** Streaming drift monitoring — Page's CUSUM as an ingest-time alarm: as
  * target values arrive per series, a two-double keyed state accumulates
  * the one-sided statistics against a reference mean frozen at attach, and
  * every emission carries them plus the alarm flag. This is what sequential
  * CUSUM was designed for (Page 1954): the mean-shift alarm fires online,
  * micro-batches after the drift begins — not in next week's batch job.
  *
  * Reference means ride the task closure (the NB/ACI frozen-model shape);
  * series without a reference are not monitored. The per-step arithmetic
  * is `Stats.pageStep`, the SAME compiled kernel as the batch walk, so
  * stream and batch are bit-equal under event-time-ordered ingest
  * (StreamingSpec asserts it).
  */
object StreamingDrift {

  private[streaming] case class DriftIn(id: String, ds: Long, y: Double)
  private[streaming] case class DriftState(sPos: Double, sNeg: Double)
  private[streaming] case class DriftRow(unique_id: String, ds: Long,
      y: Double, s_pos: Double, s_neg: Double, alarm: Boolean)

  /** Attach the CUSUM gate to a streaming frame with columns (`idCol`,
    * `dsCol` long-castable, `yCol`). `ref` is a STATIC (idCol, muCol)
    * frame of reference means, collected and frozen at attach. Append
    * mode.
    */
  def cusumGate(rows: DataFrame, ref: DataFrame, idCol: String,
                dsCol: String, yCol: String, muCol: String,
                k: Double, h: Double): DataFrame = {
    require(k >= 0, s"slack k must be non-negative, got $k")
    require(h > 0, s"alarm threshold h must be positive, got $h")
    val spark = rows.sparkSession
    import spark.implicits._
    val mus: Map[String, Double] = ref
      .select(col(idCol).cast("string").as("id"),
        col(muCol).cast("double").as("mu"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val kl = k; val hl = h
    val keyed = rows
      // null/non-castable ds would poison the query (non-nullable field)
      .filter(col(yCol).isNotNull && col(dsCol).cast("long").isNotNull)
      .select(col(idCol).cast("string").as("id"),
        col(dsCol).cast("long").as("ds"), col(yCol).cast("double").as("y"))
      .as[DriftIn]
    keyed.groupByKey(_.id)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: String, it: Iterator[DriftIn], state: GroupState[DriftState]) =>
          mus.get(id) match {
            case None => Iterator.empty // unmonitored series
            case Some(mu) =>
              var sp = state.getOption.map(_.sPos).getOrElse(0.0)
              var sn = state.getOption.map(_.sNeg).getOrElse(0.0)
              val out = it.toArray.sortBy(_.ds).map { r =>
                val (sp1, sn1) = Stats.pageStep(sp, sn, r.y, mu, kl)
                sp = sp1; sn = sn1
                DriftRow(id, r.ds, r.y, sp, sn, sp > hl || sn > hl)
              }
              state.update(DriftState(sp, sn))
              out.iterator
          }
      }.toDF()
  }
}
