package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.functions.TextFunctions
import graft.operators.Dedup

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

  /** Within-batch winner order: ids that both parse as integers compare
    * numerically (so id 9 beats id 10, matching `nearFirstSeen`'s typed
    * `min`), everything else lexicographically. The id column transits as
    * string through the keyed state, so a bare string '<' would pick "10"
    * over "9".
    */
  private[graft] def idWins(a: String, b: String): Boolean =
    (scala.util.Try(a.toLong).toOption, scala.util.Try(b.toLong).toOption) match {
      // string tie-break on numeric equality ("07" vs "7"): without it the
      // order is not total and the within-batch winner would depend on
      // iterator order — not deterministic under replay
      case (Some(x), Some(y)) => x < y || (x == y && a < b)
      case _ => a < b
    }

  /** Attach first-seen-wins dedup to a streaming DataFrame with columns
    * (`idCol`, `textCol`). Emits the surviving rows as (id, text,
    * fingerprint) with the id stringified; run with append output mode.
    * Within a micro-batch the smallest id wins — numerically when ids are
    * integral ([[idWins]]) — deterministic under replay.
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
                  if (best == null || idWins(r.id, best.id)) best = r
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

  /** Ingest-time NEAR-duplicate dedup — the streaming twin of
    * `Dedup.minhashPairs`: a document is dropped when any of its MinHash
    * band buckets was claimed by an earlier document (a prior micro-batch,
    * or a smaller id within this one). Because every document claims its
    * buckets whether or not it survives, collapse is transitive — one
    * representative per LSH-connected component, the batch connected-
    * components semantics.
    *
    * State is a parquet relation of (band, bhash) keys under `statePath`,
    * PARTITIONED BY the claiming batch_id: each epoch reads only partitions
    * `batch_id < current` (partition-pruned) and dynamic-overwrites its own
    * partition, so a replayed micro-batch reproduces its original output
    * instead of deduping against itself. State grows by distinct new
    * buckets only — `bands` longs per distinct document, independent of
    * document size. The per-batch membership check is one shuffle join of
    * the batch's buckets (bands rows per doc) against the state relation;
    * at very large state, compact old partitions and sort by bhash so the
    * join's scan side prunes row groups.
    *
    * Documents too short to shingle have a null signature, claim nothing,
    * and always survive (matching `minhashPairs`, which excludes them).
    * `onBatch(batchId, survivors)` fires per epoch with columns
    * (`idCol`, `textCol`).
    *
    * RESTART CONTRACT: the state partitioning is keyed by batch_id, which
    * only stays monotonic across query restarts when the query runs with a
    * checkpoint — pass `checkpoint` so a restarted query resumes its batch
    * ids instead of restarting at 0 (which would both ignore all prior
    * claims and dynamically overwrite their partitions). Attaching WITHOUT
    * a checkpoint to a statePath that already holds claims is rejected
    * loudly for exactly that reason; checkpoint-less runs are
    * single-run-lifetime dedup against a fresh state dir.
    */
  def nearFirstSeen(docs: DataFrame, idCol: String, textCol: String,
                    statePath: String, shingleSize: Int = 3,
                    numHashes: Int = 64, bands: Int = 16,
                    checkpoint: Option[String] = None)
                   (onBatch: (Long, DataFrame) => Unit): StreamingQuery = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    if (checkpoint.isEmpty) {
      val spark = docs.sparkSession
      val p = new org.apache.hadoop.fs.Path(statePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(!fs.exists(p) || readBucketState(spark, statePath, Long.MaxValue)
          .isEmpty,
        s"nearFirstSeen: statePath '$statePath' already holds bucket claims " +
          "but no checkpoint was given — a fresh query restarts batch ids " +
          "at 0, silently re-admitting every historical duplicate and " +
          "overwriting old state partitions. Pass checkpoint=Some(dir) to " +
          "resume, or point statePath at a fresh directory.")
    }
    val rpb = numHashes / bands
    val writer = docs.writeStream
      .outputMode("append")
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val stable = batch.localCheckpoint()
        val sigUdf = udf((t: String) => Dedup.minhashJvm(t, shingleSize, numHashes))
        val sig = stable
          .select(col(idCol).as("__id"), sigUdf(col(textCol)).as("__sig"))
          .filter(col("__sig").isNotNull)
        val banded = sig.select(col("__id"),
            explode(transform(sequence(lit(0), lit(bands - 1)),
              b => struct(b.as("band"),
                xxhash64(b, concat_ws(",", slice(col("__sig"), b * lit(rpb) + 1, lit(rpb))))
                  .as("bhash")))).as("__b"))
          .select(col("__id"), col("__b.band").as("band"), col("__b.bhash").as("bhash"))
          .localCheckpoint() // sig/bucket kernels run once, not per consumer
        val prior = readBucketState(spark, statePath, batchId)
        // a doc is dropped iff any bucket is in prior state or has a
        // smaller-id claimant in this batch (set-wise, no sequential scan)
        val batchMin = banded.groupBy("band", "bhash").agg(min(col("__id")).as("__minid"))
        val seen = banded.join(prior.withColumn("__hit", lit(1)), Seq("band", "bhash"), "left")
          .join(batchMin, Seq("band", "bhash"))
          .filter(col("__hit").isNotNull || col("__minid") < col("__id"))
          .select(col("__id")).distinct()
        val survivors = stable.join(seen, stable(idCol) === seen("__id"), "left_anti")
        // claim only buckets NOT already claimed by an earlier batch, so
        // state genuinely grows by distinct new buckets (a boilerplate doc
        // recurring every batch must not re-write its buckets each epoch),
        // and overwrite ONLY this batch_id's partition (replay-safe: a
        // replayed batch sees the same earlier partitions, computes the
        // same anti-join, rewrites the same rows)
        banded.select(col("band"), col("bhash")).distinct()
          .join(prior, Seq("band", "bhash"), "left_anti")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        onBatch(batchId, survivors)
        ()
      }
      .start()
  }

  /** Prior bucket claims (batches before `batchId`). A missing state dir —
    * or one holding no parquet yet, which an all-too-short-to-shingle first
    * batch produces (its write commits zero partitions but still creates
    * the directory) — is genuinely empty state. Any OTHER filesystem error
    * must propagate and fail the batch (which replays safely); treating a
    * transient error as "no prior state" would silently re-admit
    * duplicates.
    */
  private def readBucketState(spark: SparkSession, statePath: String,
                              batchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasParquet(dir: org.apache.hadoop.fs.Path): Boolean = {
      val it = fs.listFiles(dir, true)
      var found = false
      while (!found && it.hasNext) found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    if (fs.exists(p) && hasParquet(p))
      spark.read.parquet(statePath).filter(col("batch_id") < batchId)
        .select(col("band"), col("bhash"))
    else {
      import spark.implicits._
      Seq.empty[(Int, Long)].toDF("band", "bhash")
    }
  }

  /** Ingest-time benchmark decontamination — the streaming complement of
    * `Corpus.benchmarkContamination`, keyed on robust-winnowing
    * fingerprints ([[graft.operators.Dedup.winnowFingerprints]]): every
    * arriving document is annotated with `n_shared_fps`, the number of
    * distinct winnow fingerprints it shares with the held-out benchmark
    * corpus (any shared substring of `k + w - 1`+ normalized chars
    * guarantees at least one), and rows at or above `minShared` are
    * dropped when `drop = true`.
    *
    * Scale shape: a benchmark suite is BOUNDED by definition, so its
    * distinct fingerprint set is collected once at plan time and shipped
    * as a task broadcast; the stream side is completely STATELESS — no
    * state store, no watermark, no shuffle, one compiled O(len) kernel
    * call per row that pipelines into any source at any rate. Works
    * unchanged on a batch DataFrame (the parity StreamingSpec asserts
    * batch == streaming output).
    */
  def benchmarkScreen(docs: DataFrame, textCol: String,
                      bench: DataFrame, benchIdCol: String,
                      benchTextCol: String, k: Int = 5, w: Int = 4,
                      minShared: Int = 1, drop: Boolean = false): DataFrame = {
    require(minShared >= 1, s"minShared must be positive, got $minShared")
    val fps: Array[Long] = Dedup
      .winnowFingerprints(bench, benchIdCol, benchTextCol, k, w)
      .select(col("fp")).distinct().collect().map(_.getLong(0))
    val bc = docs.sparkSession.sparkContext.broadcast(
      scala.collection.immutable.HashSet.from(fps))
    val sharedUdf = udf((text: String) => {
      val bench = bc.value
      val seen = scala.collection.mutable.HashSet.empty[Long]
      var n = 0
      for ((_, fp) <- Dedup.winnowJvm(text, k, w))
        if (bench.contains(fp) && seen.add(fp)) n += 1
      n
    })
    val out = docs.withColumn("n_shared_fps", sharedUdf(col(textCol)))
    if (drop) out.filter(col("n_shared_fps") < minShared) else out
  }
}
