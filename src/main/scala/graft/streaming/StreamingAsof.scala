package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Ingest-time backward as-of enrichment — the Structured Streaming twin of
  * `operators.TemporalJoin.asofJoin(direction = "backward")`: every left
  * event picks up the latest right-side row at or before its event time,
  * per key. The canonical use is enriching an event stream with the most
  * recent state of a slowly-changing dimension stream.
  *
  * State design: per key, a time-sorted buffer of right rows above the
  * query watermark plus ONE floor entry at-or-below it (so late left rows
  * inside the watermark still match), evicted as the watermark advances —
  * state is bounded by (active keys x watermark horizon x right rate),
  * never by stream length.
  *
  * Semantics vs the batch operator: EXACT when each side arrives in
  * event-time order across micro-batches (the normal ingest shape —
  * within a batch, arrival order never matters: rows are re-sorted). A
  * right row arriving late, after a left row it should have matched was
  * already emitted in an earlier batch, cannot retro-correct that row
  * (append mode emits once); it becomes visible to later lefts. Right
  * rows tied on (key, time) resolve to the lexicographically greatest
  * payload JSON — deterministic, but only guaranteed to agree with the
  * batch tie rule (greatest payload tuple) when ties don't occur; keep
  * right streams unique per (key, time).
  *
  * Forward/nearest directions are deliberately absent: they need future
  * knowledge, i.e. buffering LEFT rows until the watermark passes, which
  * is a different latency contract.
  */
/** Right-side buffer: parallel arrays (time, payload JSON), ascending.
  * Top-level like [[DocRow]]: Catalyst's generated encoder projections
  * need constructor/accessor access.
  */
private[streaming] case class AsofState(rts: Array[Long], pjs: Array[String])

object StreamingAsof {

  /** @param payload (right column -> output name) pairs, like the batch
    *                API; output names must not collide with left columns.
    * @param tolerance in MICROSECONDS (the event-time axis), inclusive.
    * @param watermark duration string for both sides' event-time watermark
    *                  (also the state-eviction horizon).
    */
  def asofEnrichStream(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payload: Seq[(String, String)],
      tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true,
      watermark: String = "10 minutes"): DataFrame = {
    require(keys.nonEmpty, "asofEnrichStream needs at least one equality key")
    require(payload.nonEmpty, "asofEnrichStream needs at least one payload column")
    val leftCols = left.columns.toSeq
    val clash = payload.map(_._2).filter(leftCols.contains)
    require(clash.isEmpty, s"payload output names collide with left columns: $clash")
    // the payload rides through to_json/from_json: reject types that do
    // not round-trip JSON bit-exactly (binary, nested) instead of
    // silently enriching with a lossy copy
    payload.foreach { case (c, _) =>
      val dt = right.schema(c).dataType
      val ok = dt match {
        case StringType | BooleanType | ByteType | ShortType | IntegerType |
             LongType | FloatType | DoubleType | DateType | TimestampType => true
        case _: DecimalType => true
        case _ => false
      }
      require(ok, s"asofEnrichStream payload column '$c' has type " +
        s"${dt.catalogString}, which does not round-trip JSON exactly — " +
        "encode it to a string/numeric upstream")
    }

    // null-distinguishing injective key encoding: a concat_ws spelling
    // would SKIP null columns, colliding (null, "x") with ("x", null) and
    // with "x" — matches the batch equi-join would never produce; JSON
    // escaping also removes separator-in-value collisions
    val keyExpr = to_json(struct(keys.map(col): _*),
      Map("ignoreNullFields" -> "false"))
    // left rows sort after same-t rights when exact matches count, before
    // them when strict — mirroring the batch tag-union ordering
    val leftTie = if (allowExactMatches) 1 else -1
    val lrowExpr = struct(leftCols.map(col): _*)
    val lrowType = left.select(lrowExpr.as("r")).schema.head.dataType
    val payStruct = struct(payload.map { case (c, _) => col(c) }: _*)
    val paySchema = right.select(payStruct.as("p")).schema.head.dataType

    // the raw event-time column rides along top-level (last, so the
    // positional reads above it stay put): flatMapGroupsWithState only
    // exposes getCurrentWatermarkMs when a watermarked attribute reaches
    // its input — unix_micros() or a struct field would strip the marker
    // micros-exact timestamp round-trip for payload columns (the default
    // format truncates to milliseconds — silently diverging from the
    // batch asofJoin on a module whose own axis is microseconds)
    val jsonOpts = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    // a null event time cannot take a position on the axis: drop the row
    // (like the batch operator's null-key no-match) instead of letting a
    // primitive getLong NPE poison the query on every replay
    val lSide = left.filter(col(leftTimeCol).isNotNull)
      .withWatermark(leftTimeCol, watermark).select(
        keyExpr.as("__k"), unix_micros(col(leftTimeCol)).as("__t"),
        lit(1).as("__isL"), lit(leftTie).as("__tie"),
        lrowExpr.as("__lrow"), lit(null).cast("string").as("__pj"),
        col(leftTimeCol).as("__ets"))
    // a right row with a null key column can never match in the batch
    // equi-join; under the JSON key encoding it WOULD group with null-key
    // lefts, so drop it here (null-key lefts still flow through and emit
    // with a null payload, the batch left-join behavior)
    val rSide = right.filter(col(rightTimeCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .withWatermark(rightTimeCol, watermark).select(
        keyExpr.as("__k"), unix_micros(col(rightTimeCol)).as("__t"),
        lit(0).as("__isL"), lit(0).as("__tie"),
        lit(null).cast(lrowType).as("__lrow"),
        to_json(payStruct, jsonOpts).as("__pj"),
        col(rightTimeCol).as("__ets"))
    val unioned = lSide.unionByName(rSide)

    val outSchema = StructType(
      unioned.schema("__lrow").dataType.asInstanceOf[StructType].fields :+
        StructField("__mpj", StringType))
    val lrowIdx = unioned.schema.fieldIndex("__lrow")

    val func = (_: String, it: Iterator[Row], state: GroupState[AsofState]) => {
      val rows = it.toArray.sortBy(r => (r.getLong(1), r.getInt(3)))
      val st = state.getOption.getOrElse(AsofState(Array.empty, Array.empty))
      // merged right timeline: state buffer (all below this batch in
      // event-time-ordered ingest; interleaves correctly regardless
      // because both are time-sorted)
      val rts = scala.collection.mutable.ArrayBuffer(st.rts.toSeq: _*)
      val pjs = scala.collection.mutable.ArrayBuffer(st.pjs.toSeq: _*)
      def insertRight(t: Long, pj: String): Unit = {
        // rights arrive time-sorted within the batch, but may precede
        // buffered state times on out-of-order streams: insert sorted;
        // equal-time duplicates keep the greatest payload JSON
        var i = rts.length
        while (i > 0 && rts(i - 1) > t) i -= 1
        if (i > 0 && rts(i - 1) == t) {
          if (pjs(i - 1) < pj) pjs(i - 1) = pj
        } else { rts.insert(i, t); pjs.insert(i, pj) }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      rows.foreach { r =>
        val t = r.getLong(1)
        if (r.getInt(2) == 0) insertRight(t, r.getString(5))
        else {
          // greatest right time <= t (or < t when strict): binary search
          var lo = 0; var hi = rts.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            val ok = if (allowExactMatches) rts(mid) <= t else rts(mid) < t
            if (ok) lo = mid + 1 else hi = mid
          }
          val lrow = r.getStruct(lrowIdx)
          val mpj =
            if (lo == 0) null
            else if (tolerance.forall(t - rts(lo - 1) <= _)) pjs(lo - 1)
            else null
          out += Row.fromSeq(lrow.toSeq :+ mpj)
        }
      }
      // evict below the watermark, keeping one floor entry for late lefts
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      var keepFrom = 0
      while (keepFrom + 1 < rts.length && rts(keepFrom + 1) <= wmMicros) keepFrom += 1
      state.update(AsofState(rts.drop(keepFrom).toArray, pjs.drop(keepFrom).toArray))
      out.iterator
    }

    val enriched = unioned
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(func)(
        Encoders.product[AsofState], Encoders.row(outSchema))

    val parsed = from_json(col("__mpj"), paySchema, jsonOpts)
    val outPayload = payload.map { case (c, out) => parsed.getField(c).as(out) }
    enriched.select(leftCols.map(col) ++ outPayload: _*)
  }
}
