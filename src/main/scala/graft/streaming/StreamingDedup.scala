package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Ingest-time exact deduplication for document streams — the Structured
  * Streaming twin of `Dedup.exact`/`Dedup.exactGroups`: only the FIRST
  * document per normalized-content fingerprint survives; later exact
  * duplicates (across micro-batches or within one) are dropped.
  *
  * State design: one boolean per distinct fingerprint, keyed by the 64-bit
  * `TextFunctions.fingerprint` (case-folded, punctuation-collapsed content
  * hash), held in the streaming state store — so state size tracks the
  * number of DISTINCT documents, not the stream length, and the key is 8
  * bytes regardless of document size. For unbounded corpora the optional
  * `ttl` expires quiet fingerprints (the standard windowed-dedup
  * compromise: an exact duplicate arriving after `ttl` of key silence is
  * re-emitted); leave it None for exact semantics when the distinct-key
  * space fits the state store.
  */
/** Row shape inside the dedup state pipeline. Top-level and only
  * Scala-private (public in bytecode): Catalyst's generated projections
  * need constructor/accessor access, which a Java-private nested class
  * would deny at codegen time.
  */
private[streaming] case class DocRow(id: String, text: String, fp: Long)

object StreamingDedup {

  /** Attach first-seen-wins dedup to a streaming DataFrame with columns
    * (`idCol`, `textCol`). Emits the surviving rows as (id, text,
    * fingerprint); run with append output mode. Within a micro-batch the
    * smallest id wins (deterministic under replay).
    */
  def firstSeen(docs: DataFrame, idCol: String, textCol: String,
                ttl: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed: Dataset[DocRow] = docs
      .select(col(idCol).cast("string").as("id"), col(textCol).as("text"),
        TextFunctions.fingerprint(col(textCol)).as("fp"))
      .as[DocRow]
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    keyed.groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, DocRow](OutputMode.Append(), timeoutConf) {
        (_: Long, rows: Iterator[DocRow], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // quiet key expired: forget it so a far-future duplicate
            // re-emits (documented ttl semantics)
            state.remove()
            Iterator.empty
          } else {
            val first =
              if (state.exists) Iterator.empty
              else {
                // deterministic within-batch winner: smallest id
                var best: DocRow = null
                rows.foreach { r =>
                  if (best == null || r.id < best.id) best = r
                }
                if (best == null) Iterator.empty else Iterator.single(best)
              }
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            first
          }
      }
      .toDF("id", "text", "fingerprint")
  }
}
