package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k — the correctness baseline; one
  *   scan, no shuffle beyond the final top-k (TakeOrderedAndProject).
  * - Random-hyperplane LSH + IVF coarse quantization as the scale paths:
  *   both turn full-scan search into bucket-pruned search, the standard
  *   public designs (Indyk-Motwani LSH; IVF from the FAISS/Jegou lineage).
  */
object Similarity {

  /** Dot product of an array column with a literal query vector. */
  def dotLit(vec: Column, q: Seq[Double]): Column =
    aggregate(zip_with(vec, lit(q.toArray), (a, b) => a * b), lit(0.0), _ + _)

  def norm(vec: Column): Column =
    sqrt(aggregate(transform(vec, x => x * x), lit(0.0), _ + _))

  /** NaN folds to null: Spark orders NaN ABOVE every real double, so a
    * single corrupt embedding (NaN component, zero norm) would otherwise
    * rank first in every top-k and pass `>= threshold` filters. Null sorts
    * last under desc and fails comparisons — corrupt rows drop out.
    */
  private def nanSafe(c: Column): Column = nanvl(c, lit(null).cast("double"))

  def cosineLit(vec: Column, q: Seq[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    // try_divide: a zero-norm vector is a null cosine, not an ANSI
    // DIVIDE_BY_ZERO task failure
    nanSafe(try_divide(dotLit(vec, q), norm(vec) * lit(qn)))
  }

  /** Cosine of two array columns. */
  def cosine(a: Column, b: Column): Column =
    nanSafe(try_divide(aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _),
      norm(a) * norm(b)))

  /** Exact top-k by cosine against a literal query vector. Catalyst plans
    * orderBy+limit as TakeOrderedAndProject: per-partition heaps, no global
    * sort — this is the right plan at any scale.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, q: Seq[Double], k: Int,
                     idCol: String): DataFrame =
    df.select(col(idCol), cosineLit(col(vecCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Compiled twin of [[cosine]] for the k-NN-join hot loop: same IEEE
    * operation order as the Column spelling (0.0-seeded left fold of
    * products, `dot / (sqrt(na) * sqrt(nb))`), so results are bit-identical
    * to the SQL oracle. Mirrors the expression's null algebra: mismatched
    * lengths or null elements (zip_with pads with null, null products sink
    * the fold), zero denominators (try_divide) and NaN (nanSafe) all return
    * null.
    */
  private[graft] def cosineJvm(a: Seq[java.lang.Double],
                               b: Seq[java.lang.Double]): java.lang.Double = {
    if (a == null || b == null || a.length != b.length) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i); val y = b(i)
      if (x == null || y == null) return null
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) return null
    val c = dot / denom
    if (c.isNaN) null else c
  }

  /** Exact k-NN join: for every row of `queries`, the k nearest `corpus`
    * rows by cosine (score DESC, corpus id ASC tie-break). Output:
    * (query_id, rank, `idCol`, cosine), 1-based rank.
    *
    * Plan shape for scale: the query side is broadcast (a benchmark/probe
    * set is tiny next to a 100 TB corpus), the corpus side is ONE linear
    * scan through a BroadcastNestedLoopJoin, and the grouped top-k runs as
    * a native TypedImperativeAggregate ([[graft.plans.TopKByScore]]) whose
    * map-side partial heaps reduce the shuffle to
    * O(partitions * queries * k) pairs — no global sort, no N*Q shuffle.
    * For corpus-to-corpus self-joins at scale, route each side through
    * [[lshBucket]]/IVF first and knnJoin within buckets.
    */
  /** The k-NN joins key their bounded heaps on long ids; a silent
    * cast('long') would null out UUID-style string ids and return an
    * empty result, so reject non-integral id columns loudly.
    */
  private[graft] def requireIntegralId(df: DataFrame, idCol: String, side: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$side id column '$idCol' must be integral for the top-k heap, got $dt " +
        "(map string ids to a surrogate long first, e.g. xxhash64 or zipWithIndex)")
  }

  def knnJoin(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIntegralId(corpus, idCol, "corpus")
    requireIntegralId(queries, qIdCol, "query")
    val cosUdf = udf(cosineJvm _)
    val q = broadcast(queries.select(col(qIdCol).cast("long").as("__qid"),
      col(qVecCol).cast("array<double>").as("__qv")))
    val scored = corpus
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(q)
      .select(col("__qid"), cosUdf(col("__v"), col("__qv")).as("__score"),
        col("__id"))
    groupedTopK(scored, idCol, k)
  }

  /** Recall@k of an approximate k-NN result against the exact one — the
    * standard ANN index-quality gate (FAISS-style evaluation): per query,
    * |approx ∩ exact| / |exact| over the two (query, neighbor) top-k
    * frames ([[knnJoin]] / [[knnJoinLsh]] outputs, or any frame carrying
    * those columns). Queries the approximate index missed entirely still
    * surface with recall 0. Two grouped aggregates + one equi-join —
    * everything is top-k-sized (queries × k rows), never corpus-sized.
    * Integer hit counts divide exactly, so the recall doubles are
    * hash-reproducible cross-engine.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame,
                queryIdCol: String, idCol: String): DataFrame = {
    // set semantics: a frame carrying duplicate (query, neighbor) pairs
    // (e.g. a pre-dedup multi-probe candidate list) must not double-count
    // hits — recall could otherwise exceed 1.0; top-k producers are
    // already distinct so this is a no-op for them
    val e = exact.select(col(s"`$queryIdCol`").as("query_id"),
      col(s"`$idCol`").as("__id")).distinct()
    val a = approx.select(col(s"`$queryIdCol`").as("query_id"),
      col(s"`$idCol`").as("__id")).distinct()
    val en = e.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
    val hn = e.join(a, Seq("query_id", "__id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    en.join(hn, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * N ranked retrieval results — the standard way to combine a lexical
    * (BM25) and a semantic (k-NN) ranking without score calibration:
    * rrf(q, d) = Σ_sources 1/(k0 + rank_s(q, d)), missing sources
    * contribute nothing. Inputs are ranked frames shaped like
    * [[knnJoin]] / [[graft.operators.Corpus.bm25Join]] output
    * (query id, 1-based rank, doc id); a (query, doc) pair appearing more
    * than once within one source keeps its BEST (minimum) rank, so
    * pre-dedup candidate lists cannot double-count. The fused score sums
    * the per-source terms in source order (ordered fold), so the doubles
    * are hash-reproducible cross-engine. Output: (query_id, rank, `idCol`,
    * rrf) — rank 1-based by (rrf DESC, id ASC).
    *
    * Scale shape: every relation here is top-k-sized (|queries| × k per
    * source), never corpus-sized — the corpus-scale work happened inside
    * the source retrievers. One grouped fold + the same native bounded-heap
    * top-k as the k-NN joins.
    */
  def rrfFuse(results: Seq[DataFrame], queryIdCol: String, idCol: String,
              rankCol: String, k: Int, k0: Double = 60.0): DataFrame = {
    require(results.nonEmpty, "rrfFuse needs at least one ranked input")
    require(k >= 1, s"k must be positive, got $k")
    require(k0 > 0.0, s"k0 must be positive, got $k0")
    results.foreach { df =>
      requireIntegralId(df, queryIdCol, "fusion query")
      requireIntegralId(df, idCol, "fusion doc")
    }
    val tagged = results.zipWithIndex.map { case (df, i) =>
      df.select(col(s"`$queryIdCol`").cast("long").as("__qid"),
          col(s"`$idCol`").cast("long").as("__id"),
          col(s"`$rankCol`").cast("long").as("__rank"),
          lit(i).as("__src"))
        // best-rank dedup within a source (no-op for true top-k frames)
        .groupBy(col("__qid"), col("__id"), col("__src"))
        .agg(min(col("__rank")).as("__rank"))
    }.reduce(_ unionByName _)
      // a rank <= -k0 would flip the 1/(k0 + rank) contribution's sign (or
      // divide by zero); ranks are 1-based by contract — fail loudly. NULL
      // ranks pass (their 1/(k0+null) contribution is null, the pre-guard
      // behavior); the message coalesces so the error text is never null
      .withColumn("__rank",
        when(col("__rank").isNull || col("__rank") >= 1L, col("__rank"))
          .otherwise(raise_error(concat(
            lit(s"rrfFuse: rank column '$rankCol' must be >= 1, got "),
            coalesce(col("__rank").cast("string"), lit("null"))))))
    val fused = tagged
      .select(col("__qid"), col("__id"), col("__src"),
        (lit(1.0) / (lit(k0) + col("__rank").cast("double"))).as("__c"))
      .groupBy(col("__qid"), col("__id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__src"), col("__c")))),
          s => s.getField("__c")),
        lit(0.0), (a, x) => a + x).as("__score"))
    groupedTopK(fused.select(col("__qid"), col("__score"), col("__id")),
      idCol, k, scoreName = "rrf")
  }

  /** Ranked-retrieval quality metrics against a relevance-judgment table
    * (qrels) — the IR-standard eval harness (precision/recall@k, MRR,
    * binary nDCG@k with log2 discount). The eval set is the UNION of the
    * query ids in `results` and `qrels` (trec_eval semantics: a query the
    * retriever returned nothing for scores 0 everywhere instead of
    * silently vanishing from a macro-average). A (query, doc) pair
    * retrieved more than once keeps its best (minimum) rank, so pre-dedup
    * candidate lists cannot double-count hits or inflate recall past 1.
    * Per query:
    *   n_rel   = |qrels(q)|,
    *   n_hit   = |top-k(q) ∩ qrels(q)|,
    *   precision_at_k = n_hit / k,
    *   recall_at_k    = n_hit / n_rel          (null when n_rel = 0),
    *   mrr     = 1 / (first relevant rank)      (0.0 when no hit),
    *   ndcg_at_k = DCG@k / IDCG@k               (null when n_rel = 0),
    * with DCG = Σ_{hit ranks r ascending} discount(r) and
    * IDCG = Σ_{i=1..min(n_rel,k)} discount(i), discount(r) =
    * 1/(log(r+1)/log 2). The k discount values are precomputed ON THE
    * DRIVER into a literal lookup table ([[ndcgDiscounts]]) — rank is
    * k-bounded, so the runtime never evaluates a transcendental at all
    * (Spark's `log` is StrictMath/fdlibm, one ulp off glibc for some
    * arguments — a literal table makes cross-engine exactness a property
    * of decimal round-tripping instead of libm agreement). Both folds run
    * in ascending-rank order, so the doubles hash-match. Every relation
    * is top-k- or qrels-sized; the corpus never appears.
    */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame,
                       queryIdCol: String, idCol: String, rankCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    requireIntegralId(results, queryIdCol, "eval results query")
    requireIntegralId(results, idCol, "eval results doc")
    requireIntegralId(qrels, queryIdCol, "qrels query")
    requireIntegralId(qrels, idCol, "qrels doc")
    val disc = lit(ndcgDiscounts(k))
    val discountAt = (r: Column) => element_at(disc, r.cast("int"))
    val res = results.select(col(s"`$queryIdCol`").cast("long").as("query_id"),
        col(s"`$idCol`").cast("long").as("__id"),
        col(s"`$rankCol`").cast("long").as("__rank"))
      // ranks are 1-based; a corrupt rank <= 0 would silently index the
      // nDCG discount table from the END (Spark element_at negative-index
      // semantics) and flip mrr's sign — fail loudly instead. NULL ranks
      // pass through (the <= k filter drops them, the pre-guard behavior);
      // the message coalesces so the error never carries a null text
      .withColumn("__rank",
        when(col("__rank").isNull || col("__rank") >= 1L, col("__rank"))
          .otherwise(raise_error(concat(
            lit(s"retrievalMetrics: rank column '$rankCol' must be >= 1, got "),
            coalesce(col("__rank").cast("string"), lit("null"))))))
      .filter(col("__rank") <= k)
      // best-rank dedup (no-op for true top-k frames)
      .groupBy(col("query_id"), col("__id"))
      .agg(min(col("__rank")).as("__rank"))
    val rel = qrels.select(col(s"`$queryIdCol`").cast("long").as("query_id"),
      col(s"`$idCol`").cast("long").as("__id")).distinct()
    val nRel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hits = res.join(rel, Seq("query_id", "__id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"),
        min(col("__rank")).as("__first"),
        aggregate(sort_array(collect_list(col("__rank"))),
          lit(0.0), (a, r) => a + discountAt(r)).as("__dcg"))
    res.select(col("query_id")).union(rel.select(col("query_id"))).distinct()
      .join(nRel, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("precision_at_k"),
        when(coalesce(col("n_rel"), lit(0L)) > 0L,
          coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_rel").cast("double")).as("recall_at_k"),
        coalesce(lit(1.0) / col("__first").cast("double"), lit(0.0)).as("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) > 0L,
          coalesce(col("__dcg"), lit(0.0)) /
            aggregate(
              transform(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
                i => discountAt(i)),
              lit(0.0), (a, x) => a + x)).as("ndcg_at_k"))
  }

  /** The binary-nDCG rank discounts 1/(log(r+1)/log 2) for r = 1..k,
    * computed once on the driver (Math.log). Public so an external oracle
    * can replay the exact table as decimal literals (Double.toString
    * round-trips, and a decimal parse is correctly rounded in any engine).
    */
  def ndcgDiscounts(k: Int): Array[Double] =
    Array.tabulate(k)(i => 1.0 / (math.log(i + 2.0) / math.log(2.0)))

  /** MMR re-ranking (Carbonell & Goldstein, SIGIR 1998): from a bounded
    * candidate list per query, greedily select `m` documents maximizing
    * λ·relevance(d) − (1−λ)·max_{s∈selected} cos(d, s). The first pick
    * sees an empty selected set (penalty term exactly 0.0), so it is the
    * pure relevance argmax; ties break on the smaller doc id.
    * `candidates` is a ranked frame shaped like [[knnJoin]] output
    * (query id, doc id, relevance score); `vectors` supplies each
    * candidate's embedding by equi-join on doc id. Rows with a null
    * relevance, a missing vector, or null vector elements drop (the
    * corrupt-input policy of the other ANN paths); a null cosine between
    * two surviving candidates (ragged dims) contributes nothing to the
    * max — a candidate all of whose cosines are null is penalized 0.0.
    * A (query, doc) candidate appearing more than once (fused lists) or a
    * duplicated vector row dedups to its best relevance and the
    * ordering-least vector, so the selection can never repeat a doc.
    * The greedy arithmetic is the literal λ·rel − (1−λ)·maxsim over exact
    * cosines ([[cosineJvm]] = the SQL spelling), and max is order-free,
    * so selections AND scores replay exactly in unrolled SQL.
    * Output: (query_id, rank 1..≤m, `idCol`, mmr) in selection order.
    *
    * Scale shape: per-query cost is O(m·C) cosines with C ≤
    * `maxCandidates` (loud failure beyond — widen consciously, never
    * silently truncate); the corpus-scale search already happened in the
    * retriever that produced `candidates`, and the vector join is an
    * ordinary equi-join. One groupBy, then a per-query-row kernel.
    */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame,
                queryIdCol: String, idCol: String, relCol: String,
                vecIdCol: String, vecCol: String, m: Int,
                lambda: Double = 0.5, maxCandidates: Int = 4096): DataFrame = {
    require(m >= 1, s"m must be positive, got $m")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    require(maxCandidates >= m, s"maxCandidates ($maxCandidates) < m ($m)")
    requireIntegralId(candidates, queryIdCol, "mmr query")
    requireIntegralId(candidates, idCol, "mmr candidate")
    requireIntegralId(vectors, vecIdCol, "mmr vectors")
    val oneMinus = 1.0 - lambda
    val kernel = udf((ids: Seq[Long], rels: Seq[Double],
                      vecs: Seq[Seq[Double]]) => {
      val n = ids.length
      require(n <= maxCandidates,
        s"mmrRerank: $n candidates in one query group exceeds " +
          s"maxCandidates=$maxCandidates — cap the retriever's k or raise it")
      val boxed = vecs.map(v => v.map(java.lang.Double.valueOf))
      val chosen = new Array[Boolean](n)
      // NaN = "no valid cosine to any selected yet" (cosineJvm never
      // returns NaN, so the sentinel is unambiguous)
      val maxSim = Array.fill(n)(Double.NaN)
      val out = Seq.newBuilder[(Long, Double)]
      var step = 0
      var exhausted = false
      while (step < m && !exhausted) {
        var bestI = -1
        var bestMmr = 0.0
        var i = 0
        while (i < n) {
          if (!chosen(i)) {
            val penalty = if (maxSim(i).isNaN) 0.0 else maxSim(i)
            val mmr = lambda * rels(i) - oneMinus * penalty
            if (bestI < 0 || mmr > bestMmr) { bestI = i; bestMmr = mmr }
          }
          i += 1
        }
        if (bestI < 0) exhausted = true
        else {
          chosen(bestI) = true
          out += ((ids(bestI), bestMmr))
          var j = 0
          while (j < n) {
            if (!chosen(j)) {
              val c = cosineJvm(boxed(j), boxed(bestI))
              if (c != null) {
                val cv = c.doubleValue()
                maxSim(j) =
                  if (maxSim(j).isNaN) cv else math.max(maxSim(j), cv)
              }
            }
            j += 1
          }
          step += 1
        }
      }
      out.result()
    })
    val cand = candidates.select(
        col(s"`$queryIdCol`").cast("long").as("__qid"),
        col(s"`$idCol`").cast("long").as("__id"),
        col(s"`$relCol`").cast("double").as("__rel"))
      .filter(col("__rel").isNotNull && !isnan(col("__rel")))
    val vecs = vectors.select(col(s"`$vecIdCol`").cast("long").as("__id"),
        col(s"`$vecCol`").cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), x => x.isNull))
    // defensive dedup: a (query, doc) pair appearing more than once (a
    // fused candidate list, or a duplicated vector row fanning the join
    // out) keeps its best relevance and the ordering-least vector —
    // without this the greedy kernel could select one doc at two ranks
    val joined = cand.join(vecs, Seq("__id"))
      .groupBy(col("__qid"), col("__id"))
      .agg(max(col("__rel")).as("__rel"), min(col("__v")).as("__v"))
    val packed = joined
      .groupBy(col("__qid"))
      // array_sort on the struct orders by __id ASC — a deterministic
      // kernel input independent of partition layout
      .agg(array_sort(collect_list(struct(col("__id"), col("__rel"),
        col("__v")))).as("__c"))
      .select(col("__qid"),
        kernel(transform(col("__c"), s => s.getField("__id")),
          transform(col("__c"), s => s.getField("__rel")),
          transform(col("__c"), s => s.getField("__v"))).as("__sel"))
    packed
      .select(col("__qid").as("query_id"),
        posexplode(col("__sel")).as(Seq("__pos", "__t")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("long").as("rank"),
        col("__t._1").as(idCol),
        col("__t._2").as("mmr"))
  }

  /** Shared tail of the k-NN joins (and Corpus.bm25Join): grouped
    * bounded-heap top-k over (__qid, __score, __id) rows →
    * (query_id, rank, id, `scoreName`).
    */
  private[graft] def groupedTopK(scored: DataFrame, idCol: String, k: Int,
                                 scoreName: String = "cosine"): DataFrame =
    scored.groupBy(col("__qid"))
      .agg(graft.plans.TopKExpr.topKByScore(col("__score"), col("__id"), k)
        .as("__top"))
      .select(col("__qid").as("query_id"),
        posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("long").as("rank"),
        col("__t.id").as(idCol),
        col("__t.score").as(scoreName))

  /** LSH-bucketed approximate k-NN join — the corpus-to-corpus scale path
    * [[knnJoin]]'s scaladoc points at: both sides bucket by signed
    * hyperplane projection, the query side multi-probes (its bucket plus
    * every single-bit flip), and candidates meet in a JOIN ON BUCKET — a
    * co-partitioned equi-join instead of a nested-loop pass, so neither
    * side needs to fit in broadcast and the scored-candidate volume is
    * bucket-local, not |corpus|·|queries|. Each corpus row holds exactly
    * one bucket and a query's probes are distinct, so (query, corpus)
    * candidates are unique without a dedup shuffle. Same grouped
    * bounded-heap top-k tail as the exact join; recall is governed by
    * `nPlanes` (fewer planes = bigger buckets = higher recall and cost).
    * `dim` is the embedding dimension (plane generation is data-free).
    */
  def knnJoinLsh(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String,
                 qIdCol: String, qVecCol: String, k: Int, dim: Int,
                 nPlanes: Int = 12, seed: Long = 42L,
                 portable: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nPlanes >= 1 && nPlanes < 63, s"nPlanes out of range: $nPlanes")
    requireIntegralId(corpus, idCol, "corpus")
    requireIntegralId(queries, qIdCol, "query")
    // a wrong `dim` config would null-pad every projection and funnel both
    // sides into bucket 0 — the exact cross-join blow-up this operator
    // exists to avoid. Probe the MODAL query length loudly: a null or
    // ragged first row must not crash/abort a job the === dim filters
    // below would have handled (corrupt rows drop, the config check stays)
    queries.filter(col(qVecCol).isNotNull)
      .groupBy(size(col(qVecCol)).as("__d")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__d")).take(1).foreach { r =>
        require(r.getInt(0) == dim,
          s"dim=$dim does not match the modal query vector length ${r.getInt(0)}")
      }
    val planes =
      if (portable) hyperplanesPortable(dim, nPlanes)
      else hyperplanes(dim, nPlanes, seed)
    val cosUdf = udf(cosineJvm _)
    // corpus rows of any OTHER length get a null-padded projection; drop
    // them like the other corrupt-input paths (nanSafe) instead of letting
    // them pool deterministically in bucket 0
    val bucketed = corpus
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(size(col("__v")) === dim)
      .withColumn("__bucket", lshBucket(col("__v"), planes))
    val probed = queries
      .select(col(qIdCol).cast("long").as("__qid"),
        col(qVecCol).cast("array<double>").as("__qv"))
      .filter(size(col("__qv")) === dim)
      .withColumn("__qb", lshBucket(col("__qv"), planes))
      .select(col("__qid"), col("__qv"),
        explode(array(col("__qb") +: (0 until nPlanes).map(i =>
          col("__qb").bitwiseXOR(lit(1L << i))): _*)).as("__bucket"))
    val scored = bucketed.join(probed, Seq("__bucket"))
      .select(col("__qid"), cosUdf(col("__v"), col("__qv")).as("__score"),
        col("__id"))
    groupedTopK(scored, idCol, k)
  }

  /** Deterministic unit "random" hyperplanes from a seeded generator. */
  def hyperplanes(dim: Int, n: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Portable hyperplanes: coefficient (i, j) = 2·u − 1 with u the
    * md5-derived 60-bit hash of "plane:i:j" scaled to [0, 1). Uniform
    * rather than gaussian coordinates — still a valid sign-LSH projection
    * family — and reproducible in plain SQL
    * (`2.0*(('0x'||substr(md5('plane:'||i||':'||j),1,15))::BIGINT
    * / 2^60) - 1.0`), which buys the LSH queries an exact DuckDB oracle.
    */
  def hyperplanesPortable(dim: Int, n: Int): Seq[Seq[Double]] =
    Seq.tabulate(n)(i => Seq.tabulate(dim)(j =>
      2.0 * (Dedup.md560(s"plane:$i:$j").toDouble / (1L << 60).toDouble) - 1.0))

  /** Random-hyperplane (sign) LSH bucket id: n-bit signature as a long. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotLit(vec, p) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: search only rows whose bucket matches
    * the query's bucket in ≥ (nPlanes - maxFlips) bits by probing the query
    * bucket and all single-bit flips (multi-probe LSH).
    */
  def lshTopK(df: DataFrame, vecCol: String, q: Seq[Double], k: Int,
              idCol: String, nPlanes: Int = 12, seed: Long = 42L,
              portable: Boolean = false): DataFrame = {
    // same bound as knnJoinLsh: >= 64 planes would wrap 1L << i and alias
    // high planes onto low bucket bits, silently corrupting recall
    require(nPlanes >= 1 && nPlanes < 63, s"nPlanes out of range: $nPlanes")
    val planes =
      if (portable) hyperplanesPortable(q.length, nPlanes)
      else hyperplanes(q.length, nPlanes, seed)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(q).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probes = qBucket +: (0 until nPlanes).map(i => qBucket ^ (1L << i))
    val vecD = col(vecCol).cast("array<double>")
    df.withColumn("__bucket", lshBucket(vecD, planes))
      .filter(col("__bucket").isin(probes: _*))
      .select(col(idCol), cosineLit(vecD, q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Quantization scale: centroid arithmetic runs on floor(x · 2^20)
    * integers. Scaling by a power of two is exact on the float→double
    * values, and integer dimension sums are order-free — the build is
    * bit-deterministic across partitionings, cluster topologies and ENGINES
    * (the DuckDB oracle replays it exactly), where double sums would drift
    * with aggregation order.
    */
  private val QuantScale = 1048576.0 // 2^20

  private def quantized(vec: Column): Column =
    transform(vec.cast("array<double>"), x => floor(x * lit(QuantScale)))

  /** Deterministic training sample: the portable md5 permille filter, then
    * an ABSOLUTE row cap taken in (hash, id) order. The permille knob alone
    * leaves build cost proportional to corpus size at 100 TB; the cap makes
    * it flat — orderBy+limit is TakeOrdered (per-partition heaps), never a
    * full sort, and the (hash, id) order is replayable in any SQL engine.
    * When the cap doesn't bind, the selected set is exactly the permille
    * sample (and downstream consumers are order-insensitive).
    */
  private def cappedHashSample(df: DataFrame, vecCol: String, idCol: String,
                               salt: String, samplePermille: Int,
                               maxSampleRows: Int): DataFrame = {
    val hash = expr(s"cast(conv(substring(md5(concat('$salt:', cast(`$idCol` as string))), 1, 15), 16, 10) as bigint)")
    val base = df.filter(col(vecCol).isNotNull)
    val permilled =
      if (samplePermille == 1000) base
      else base.filter(hash % 1000 < samplePermille)
    permilled.withColumn("__sh", hash)
      .orderBy(col("__sh"), col(idCol)).limit(maxSampleRows)
      .drop("__sh")
  }

  /** Index dimension = the MODAL vector length in the sample (ties to the
    * smaller dim), so one ragged low-id row can't poison the build; loud
    * friendly error on an empty sample instead of a bare head() throw.
    */
  private def sampleDim(samp0: DataFrame, what: String): Int = {
    val rows = samp0.groupBy(size(col("__q")).as("__d"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__d")).take(1)
    require(rows.nonEmpty,
      s"$what sample is empty; raise samplePermille (or check $what input)")
    rows(0).getInt(0)
  }

  /** IVF coarse quantizer: Lloyd's k-means over integer-quantized vectors,
    * trained on a deterministic md5-hash SAMPLE of the corpus (build cost
    * proportional to the sample, not the data — the standard
    * train-the-quantizer-on-a-sample stance; FAISS lineage), deterministic
    * init (first k sampled ids), few iterations, all as DataFrame
    * aggregates. The full-corpus pass is only the final assignment.
    * Returns (centroids, assignments) — the index build.
    */
  def ivfBuild(df: DataFrame, vecCol: String, idCol: String, nLists: Int,
               iters: Int = 5, samplePermille: Int = 250,
               maxSampleRows: Int = 1000000): (Seq[Seq[Double]], DataFrame) = {
    require(samplePermille >= 1 && samplePermille <= 1000)
    require(maxSampleRows >= 1, "maxSampleRows must be positive")
    // md5-derived sample: portable (SQL: ('0x'||substr(md5('ivf:'||id),1,15))
    // ::BIGINT % 1000) and stable under repartitioning, unlike df.sample
    val sampled = cappedHashSample(df, vecCol, idCol, "ivf",
      samplePermille, maxSampleRows)
    val samp0 = sampled
      .select(col(idCol).as("__qid"), quantized(col(vecCol)).as("__q"))
      // each Lloyd's iteration re-reads the sample; pin it instead of
      // re-scanning the corpus per iteration
      .localCheckpoint()
    val dim = sampleDim(samp0, "IVF")
    val samp = samp0.filter(size(col("__q")) === dim)
    var centroids: Seq[Seq[Double]] = samp
      .orderBy(col("__qid")).limit(nLists)
      .select(col("__q")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toSeq).toSeq
    require(centroids.nonEmpty, s"IVF sample is empty; raise samplePermille")
    for (_ <- 0 until iters) {
      val assigned = samp.select(col("__q").as("v"),
        assignToNearest(col("__q").cast("array<double>"), centroids).as("__list"))
      val agg = assigned.groupBy(col("__list"))
        .agg(count(lit(1)).as("n"),
          array((0 until centroids.head.length).map(i =>
            sum(element_at(col("v"), i + 1))): _*).as("sums"))
        .collect()
      // Map lookup, not a linear find per list: with nLists ~ 10^5 the
      // find scan is quadratic on the driver for identical results
      val byList = agg.map(r => r.getInt(0) -> r).toMap
      val updated = centroids.indices.map { li =>
        byList.get(li) match {
          case Some(r) =>
            val n = r.getLong(1).toDouble
            r.getSeq[Long](2).map(_.toDouble / n).toSeq
          case None => centroids(li)
        }
      }
      centroids = updated
    }
    val assignments = df.withColumn("__list",
      assignToNearest(quantized(col(vecCol)).cast("array<double>"), centroids))
    (centroids, assignments)
  }

  /** Index of the nearest centroid by squared L2 (first index wins ties).
    *
    * A compiled JVM loop over the captured centroid matrix, not a
    * per-centroid expression tree: k struct branches of higher-order
    * `aggregate` lambdas are CodegenFallback and re-evaluate per element,
    * so the expression form blows up plan size AND per-row cost linearly in
    * nLists — the scan here does k·dim flops per row either way, but only
    * the closure form keeps it a tight loop. The centroid matrix rides the
    * task closure (k × dim doubles — MBs at most; the same payload FAISS
    * ships to every search thread).
    */
  def assignToNearest(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
    val assign = udf { (v: Seq[Double]) =>
      // null/ragged/corrupt vectors assign to list -1 (never probed)
      // instead of NPE/IndexOutOfBounds killing the job
      if (v == null || cents.isEmpty || v.length != cents(0).length) -1
      else {
        var best = 0; var bestD = Double.MaxValue; var i = 0
        while (i < cents.length) {
          val c = cents(i); var d = 0.0; var j = 0
          while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        best
      }
    }
    assign(vec)
  }

  /** IVF query: probe the `nProbe` nearest lists only (list ranking in the
    * centroids' quantized domain; scoring on the raw vectors).
    */
  def ivfTopK(assignments: DataFrame, centroids: Seq[Seq[Double]],
              vecCol: String, q: Seq[Double], k: Int, idCol: String,
              nProbe: Int = 3): DataFrame = {
    val qq = q.map(x => math.floor(x * QuantScale))
    val byDist = centroids.zipWithIndex.sortBy { case (c, _) =>
      c.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum
    }.take(nProbe).map(_._2)
    val vecD = col(vecCol).cast("array<double>")
    assignments.filter(col("__list").isin(byDist: _*))
      .select(col(idCol), cosineLit(vecD, q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Per-query nProbe nearest coarse lists, in the quantized domain with
    * the same distance fold and (dist, li) tie order as [[ivfTopK]] — the
    * query-side list ranking of the batched IVF joins. Null/ragged query
    * vectors probe nothing (they drop, like every corrupt-input path).
    */
  private def probeListsUdf(centroids: Seq[Seq[Double]],
                            nProbe: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
    udf { (qv: Seq[Double]) =>
      if (qv == null || cents.isEmpty || qv.length != cents(0).length) Array.empty[Int]
      else {
        val qq = new Array[Double](qv.length)
        var j = 0
        while (j < qq.length) { qq(j) = math.floor(qv(j) * QuantScale); j += 1 }
        val dists = cents.map { c =>
          var d = 0.0; var i = 0
          while (i < c.length) { val t = c(i) - qq(i); d += t * t; i += 1 }
          d
        }
        cents.indices.sortBy(li => (dists(li), li)).take(nProbe).toArray
      }
    }
  }

  /** Batched IVF search over a QUERY SET — [[ivfTopK]] as a join (the
    * FAISS-style batch-serving shape the recall gate evaluates): each query
    * ranks the coarse lists in the quantized domain, probes its `nProbe`
    * nearest through an explode + equi-join on the list id, scores the
    * probed candidates with the exact cosine against the raw vectors, and
    * keeps the per-query top-k through the same bounded-heap tail as the
    * exact join. The centroid matrix rides the closure (nLists × dim
    * doubles — the payload FAISS ships to every search thread); the corpus
    * is read only through the probed lists, and each (query, candidate)
    * pair is unique because every corpus row lives in exactly one list.
    * Output: (query_id, rank, `idCol`, cosine).
    */
  def ivfKnnJoin(assignments: DataFrame, centroids: Seq[Seq[Double]],
                 queries: DataFrame, vecCol: String, idCol: String,
                 qIdCol: String, qVecCol: String, k: Int,
                 nProbe: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    requireIntegralId(assignments, idCol, "corpus")
    requireIntegralId(queries, qIdCol, "query")
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    val probed = queries
      .select(col(qIdCol).cast("long").as("__qid"),
        col(qVecCol).cast("array<double>").as("__qv"))
      .filter(col("__qv").isNotNull && size(col("__qv")) === dim)
      .withColumn("__list", explode(probeListsUdf(centroids, nProbe)(col("__qv"))))
    val cosUdf = udf(cosineJvm _)
    val scored = assignments
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"), col("__list"))
      .join(probed, Seq("__list"))
      .select(col("__qid"), cosUdf(col("__v"), col("__qv")).as("__score"),
        col("__id"))
    groupedTopK(scored, idCol, k)
  }

  /** K-means topic/cluster assignment for embedding-space curation — the
    * clustering step of SemDeDup (Abbas et al. 2023) and the DCLM-style
    * cluster-balanced pools: the [[ivfBuild]] coarse quantizer exposed as a
    * first-class clustering. Deterministic build (portable md5 hash sample,
    * first-k init, fixed Lloyd's iterations over integer-quantized vectors),
    * then one full-scan nearest-centroid assignment. Null or short/corrupt
    * vectors land in cluster -1 (never a valid centroid), keeping bad rows
    * observable instead of crashing the job.
    *
    * Output: all input columns plus `cluster`.
    */
  def kmeansAssign(df: DataFrame, vecCol: String, idCol: String, k: Int,
                   iters: Int = 5, samplePermille: Int = 250,
                   maxSampleRows: Int = 1000000): DataFrame = {
    val (_, assigned) =
      ivfBuild(df, vecCol, idCol, k, iters, samplePermille, maxSampleRows)
    assigned.withColumnRenamed("__list", "cluster")
  }

  /** Cluster-balanced curation sample: up to `perCluster` members of every
    * k-means cluster, picked in portable md5 hash order (salted, ties by
    * id) — the diversity-preserving downsample used to keep a corpus's
    * embedding-space coverage while cutting its bulk (big clusters are
    * capped, small clusters survive whole). Invalid vectors (cluster -1)
    * are never selected.
    *
    * Scale shape: the build is sample-sized; selection is one window rank
    * partitioned by cluster over (hash, id) — a single shuffle on cluster
    * (k partitions; with heavily skewed clusters raise
    * spark.sql.shuffle.partitions or pre-salt, the standard move).
    *
    * Output: (cluster, pick, `idCol`) — `pick` is the 1-based hash rank
    * inside the cluster.
    */
  def clusterBalancedSample(df: DataFrame, vecCol: String, idCol: String,
                            k: Int, perCluster: Int, salt: String = "cbs",
                            iters: Int = 5, samplePermille: Int = 250,
                            maxSampleRows: Int = 1000000): DataFrame = {
    require(perCluster >= 1, "perCluster must be positive")
    val assigned =
      kmeansAssign(df, vecCol, idCol, k, iters, samplePermille, maxSampleRows)
    // Column functions, not a string-spliced expr(): `salt` is public API,
    // and a quote in it would break parsing (or rewrite the ranking SQL)
    val key = conv(substring(
      md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    assigned.filter(col("cluster") >= 0)
      .withColumn("pick", row_number().over(
        Window.partitionBy(col("cluster")).orderBy(key, col(idCol))))
      .filter(col("pick") <= perCluster)
      .select(col("cluster"), col("pick"), col(idCol))
  }

  /** Product-quantization codebooks + encoded corpus (Jégou, Douze, Schmid
    * 2011, "Product quantization for nearest neighbor search"; the FAISS
    * PQ/IVFPQ lineage): split the embedding into `m` contiguous subspaces,
    * learn `ksub` centroids per subspace with the same deterministic recipe
    * as [[ivfBuild]] (integer-quantized vectors, portable md5 hash sample,
    * first-k init, fixed Lloyd's iterations), and encode every corpus
    * vector as `m` one-byte-ish codes.
    *
    * This is the memory-bounded ANN path at 100 TB: per-vector index state
    * drops from 4·dim bytes of floats to `m` small ints, so the encoded
    * relation is ~dim·4/m× smaller than the raw corpus and query-side
    * scoring never touches the raw vectors ([[pqTopK]]).
    *
    * Scale shape: training cost is sample-sized (one localCheckpoint of the
    * hash sample; per Lloyd's iteration ONE job — subspaces travel through
    * a single explode, so iterations don't multiply shuffles by `m`); the
    * only full-corpus pass is the final encode, a compiled map.
    *
    * Returns (codebooks[m][ksub][subDim], encoded = input + `__codes`
    * array<int>; null/ragged vectors encode as null and never rank).
    */
  def pqBuild(df: DataFrame, vecCol: String, idCol: String,
              m: Int, ksub: Int, iters: Int = 2,
              samplePermille: Int = 500,
              maxSampleRows: Int = 1000000): (Seq[Seq[Seq[Double]]], DataFrame) = {
    require(m >= 1, s"m must be positive, got $m")
    require(ksub >= 2, s"ksub must be >= 2, got $ksub")
    require(samplePermille >= 1 && samplePermille <= 1000)
    require(maxSampleRows >= 1, "maxSampleRows must be positive")
    val sampled = cappedHashSample(df, vecCol, idCol, "pq",
      samplePermille, maxSampleRows)
    val samp0 = sampled
      .select(col(idCol).as("__qid"), quantized(col(vecCol)).as("__q"))
      .localCheckpoint()
    val dim = sampleDim(samp0, "PQ")
    require(dim % m == 0, s"embedding dim $dim is not divisible into $m subspaces")
    val subDim = dim / m
    val samp = samp0.filter(size(col("__q")) === dim)
    val initRows: Array[Array[Double]] = samp
      .orderBy(col("__qid")).limit(ksub)
      .select(col("__q")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toArray)
    require(initRows.nonEmpty, "PQ sample is empty; raise samplePermille")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { mi =>
      initRows.map(r => r.slice(mi * subDim, (mi + 1) * subDim))
    }
    val mLoc = m; val subDimLoc = subDim
    for (_ <- 0 until iters) {
      val booksLoc = books
      // one job per iteration: each sample row explodes into its m
      // (subspace, nearest-code, subvector) triples, then one groupBy
      val enc = udf { (v: Seq[Long]) =>
        (0 until mLoc).map { mi =>
          val code = nearestSubCode(v, mi, subDimLoc, booksLoc(mi))
          (mi, code, v.slice(mi * subDimLoc, (mi + 1) * subDimLoc))
        }
      }
      val agg = samp.select(explode(enc(col("__q"))).as("e"))
        .select(col("e._1").as("mi"), col("e._2").as("code"), col("e._3").as("sv"))
        .groupBy(col("mi"), col("code"))
        .agg(count(lit(1)).as("n"),
          array((0 until subDim).map(i => sum(element_at(col("sv"), i + 1))): _*).as("sums"))
        .collect()
      // keyed lookup instead of a linear scan per (mi, code): m=64 x
      // ksub=256 finds over the full agg array is ~10^8 comparisons per
      // Lloyd's iteration on the driver for identical results
      val byKey = agg.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      books = Array.tabulate(m) { mi =>
        books(mi).indices.toArray.map { code =>
          byKey.get((mi, code)) match {
            case Some(r) =>
              val n = r.getLong(2).toDouble
              r.getSeq[Long](3).map(_.toDouble / n).toArray
            case None => books(mi)(code)
          }
        }
      }
    }
    val booksFinal = books
    val codesUdf = udf { (v: Seq[Long]) =>
      if (v == null || v.length != mLoc * subDimLoc) null
      else (0 until mLoc).map(mi => nearestSubCode(v, mi, subDimLoc, booksFinal(mi))).toArray
    }
    val encoded = df.withColumn("__codes", codesUdf(quantized(col(vecCol))))
    (books.map(_.map(_.toSeq).toSeq).toSeq, encoded)
  }

  /** Nearest sub-centroid index for subspace `mi` (first index wins ties —
    * the same convention as [[assignToNearest]]; ascending-j summation
    * matches the oracle's list_reduce fold order).
    */
  private def nearestSubCode(v: Seq[Long], mi: Int, subDim: Int,
                             book: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var code = 0
    val off = mi * subDim
    while (code < book.length) {
      val c = book(code); var d = 0.0; var j = 0
      while (j < subDim) { val t = v(off + j).toDouble - c(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = code }
      code += 1
    }
    best
  }

  /** PQ top-k by asymmetric distance computation (ADC): one m×ksub lookup
    * table of exact sub-distances from the (quantized) query to every
    * sub-centroid, then each row's approximate distance is m table lookups
    * summed in subspace order — no raw vectors touched, so the scan reads
    * only the codes column. TakeOrderedAndProject keeps the top-k with
    * per-partition heaps; ties break by id.
    *
    * Returns (`idCol`, adc_dist).
    */
  def pqTopK(encoded: DataFrame, books: Seq[Seq[Seq[Double]]],
             q: Seq[Double], k: Int, idCol: String): DataFrame = {
    val m = books.length
    val subDim = books.head.head.length
    require(q.length == m * subDim,
      s"query dim ${q.length} != codebook dim ${m * subDim}")
    val qq = q.map(x => math.floor(x * QuantScale))
    val table: Array[Array[Double]] = Array.tabulate(m) { mi =>
      books(mi).map { c =>
        var d = 0.0; var j = 0
        while (j < subDim) { val t = qq(mi * subDim + j) - c(j); d += t * t; j += 1 }
        d
      }.toArray
    }
    val adc = udf { (codes: Seq[Int]) =>
      if (codes == null) null.asInstanceOf[java.lang.Double]
      else {
        var d = 0.0; var mi = 0
        while (mi < m) { d += table(mi)(codes(mi)); mi += 1 }
        java.lang.Double.valueOf(d)
      }
    }
    encoded.withColumn("adc_dist", adc(col("__codes")))
      .filter(col("adc_dist").isNotNull)
      .select(col(idCol), col("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ index build: one coarse quantizer ([[ivfBuild]]) + one set of
    * PQ codebooks ([[pqBuild]]) over the same corpus — the FAISS IVFPQ
    * layout. Returns (coarse centroids, PQ codebooks, indexed corpus with
    * both `__list` and `__codes`). Both trainings run on the deterministic
    * hash sample; the corpus pays two compiled map passes (assign + encode)
    * and zero shuffles.
    */
  def ivfPqBuild(df: DataFrame, vecCol: String, idCol: String,
                 nLists: Int, m: Int, ksub: Int, iters: Int = 2,
                 samplePermille: Int = 500)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]], DataFrame) = {
    val (cents, assigned) = ivfBuild(df, vecCol, idCol, nLists, iters, samplePermille)
    val (books, indexed) = pqBuild(assigned, vecCol, idCol, m, ksub, iters, samplePermille)
    (cents, books, indexed)
  }

  /** IVF-PQ query: probe the `nProbe` nearest coarse lists, ADC-score only
    * those rows from the distance table — the serving shape that bounds
    * BOTH the scan fraction (IVF pruning) and the per-row cost (m table
    * lookups, raw vectors never read). Equivalent to [[pqTopK]] restricted
    * to the probed lists (asserted in the spec).
    */
  def ivfPqTopK(indexed: DataFrame, cents: Seq[Seq[Double]],
                books: Seq[Seq[Seq[Double]]], q: Seq[Double], k: Int,
                idCol: String, nProbe: Int = 3): DataFrame = {
    val qq = q.map(x => math.floor(x * QuantScale))
    val byDist = cents.zipWithIndex.sortBy { case (c, _) =>
      c.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum
    }.take(nProbe).map(_._2)
    pqTopK(indexed.filter(col("__list").isin(byDist: _*)), books, q, k, idCol)
  }

  /** Batched plain-PQ search over a QUERY SET — [[pqTopK]] as a join: the
    * (small) query set broadcasts against the encoded corpus and every row
    * ADC-scores per query with exactly pqTopK's table arithmetic. One
    * linear scan of the codes column per batch (no raw vectors), the
    * bounded-heap top-k tail; use [[ivfPqKnnJoin]] when coarse pruning
    * should bound the scan fraction too. Output:
    * (query_id, rank, `idCol`, adc_dist).
    */
  def pqKnnJoin(encoded: DataFrame, books: Seq[Seq[Seq[Double]]],
                queries: DataFrame, qIdCol: String, qVecCol: String,
                k: Int, idCol: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIntegralId(encoded, idCol, "corpus")
    requireIntegralId(queries, qIdCol, "query")
    val m = books.length
    val subDim = books.head.head.length
    val dim = m * subDim
    val adcUdf = adcDistUdf(books)
    val q = broadcast(queries
      .select(col(qIdCol).cast("long").as("__qid"),
        col(qVecCol).cast("array<double>").as("__qv"))
      .filter(col("__qv").isNotNull && size(col("__qv")) === dim))
    val scored = encoded
      .select(col(idCol).cast("long").as("__id"), col("__codes"))
      .filter(col("__codes").isNotNull)
      .crossJoin(q)
      .select(col("__qid"), (-adcUdf(col("__qv"), col("__codes"))).as("__score"),
        col("__id"))
    groupedTopK(scored, idCol, k)
      .withColumn("adc_dist", -col("cosine")).drop("cosine")
  }

  /** [[pqTopK]]'s ADC distance as a two-argument compiled kernel
    * (quantized query sub-distances summed in subspace order — identical
    * bits to the per-query table form, since the table entries ARE these
    * sub-distances). Null/ragged inputs score null and never rank.
    */
  private def adcDistUdf(books: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m = books.length
    val subDim = books.head.head.length
    val dim = m * subDim
    val booksA: Array[Array[Array[Double]]] =
      books.map(_.map(_.toArray).toArray).toArray
    udf { (qv: Seq[Double], codes: Seq[Int]) =>
      if (qv == null || codes == null || qv.length != dim || codes.length != m)
        null.asInstanceOf[java.lang.Double]
      else {
        var dsum = 0.0; var mi = 0
        while (mi < m) {
          val c = booksA(mi)(codes(mi))
          var d = 0.0; var j = 0
          while (j < subDim) {
            val t = math.floor(qv(mi * subDim + j) * QuantScale) - c(j)
            d += t * t; j += 1
          }
          dsum += d; mi += 1
        }
        java.lang.Double.valueOf(dsum)
      }
    }
  }

  /** Batched IVF-PQ search over a QUERY SET — [[ivfPqTopK]] as a join:
    * per-query coarse-list probing (same ranking as [[ivfKnnJoin]]) and
    * ADC scoring of the probed rows' codes. The per-candidate distance is
    * computed with exactly [[pqTopK]]'s table arithmetic (per-subspace
    * quantized squared distance, summed in subspace order), so a single
    * query through this join is bit-equal to ivfPqTopK. Raw corpus vectors
    * are never read — only `__list` and `__codes`. Output:
    * (query_id, rank, `idCol`, adc_dist), per-query top-k by ascending
    * distance with id tie-break (the bounded-heap tail on the negated
    * distance; negation is exact, so the order and values are unchanged).
    */
  def ivfPqKnnJoin(indexed: DataFrame, cents: Seq[Seq[Double]],
                   books: Seq[Seq[Seq[Double]]], queries: DataFrame,
                   qIdCol: String, qVecCol: String, k: Int, idCol: String,
                   nProbe: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    requireIntegralId(indexed, idCol, "corpus")
    requireIntegralId(queries, qIdCol, "query")
    val dim = books.length * books.head.head.length
    val adcUdf = adcDistUdf(books)
    val probed = queries
      .select(col(qIdCol).cast("long").as("__qid"),
        col(qVecCol).cast("array<double>").as("__qv"))
      .filter(col("__qv").isNotNull && size(col("__qv")) === dim)
      .withColumn("__list", explode(probeListsUdf(cents, nProbe)(col("__qv"))))
    val scored = indexed
      .select(col(idCol).cast("long").as("__id"), col("__list"), col("__codes"))
      .filter(col("__codes").isNotNull)
      .join(probed, Seq("__list"))
      .select(col("__qid"), (-adcUdf(col("__qv"), col("__codes"))).as("__score"),
        col("__id"))
    groupedTopK(scored, idCol, k)
      .withColumn("adc_dist", (-col("cosine"))).drop("cosine")
  }

  /** PQ search with exact re-rank: take the `rerank` best ADC candidates,
    * score those (and only those) with the exact cosine against the raw
    * vectors, keep the top k — the standard two-stage IVFPQ serving shape
    * (coarse ADC recall, exact precision on a small candidate set).
    * Returns (`idCol`, cosine).
    */
  def pqTopKRerank(encoded: DataFrame, books: Seq[Seq[Seq[Double]]],
                   vecCol: String, q: Seq[Double], k: Int, idCol: String,
                   rerank: Int = 50): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank smaller than k=$k")
    val cands = pqTopK(encoded, books, q, rerank, idCol).select(col(idCol))
    encoded.join(broadcast(cands), Seq(idCol))
      .select(col(idCol), cosineLit(col(vecCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Per-label centroid cosine — the "how typical of its class is this
    * example" curation score (the centroid-distance signal SemDeDup-style
    * pipelines and CLIP-score filters rank by): each label's centroid is
    * the mean of its members' integer-quantized vectors (exact Long sums,
    * so the centroid is aggregation-order-proof), and every row scores the
    * cosine between its quantized vector and its own label's centroid.
    * Null label, null vector, or ragged vector → null score.
    *
    * Scale shape: one hash aggregate per label with dim running sums, then
    * a broadcast join of the tiny centroid relation back to the corpus —
    * the corpus itself never shuffles.
    *
    * Returns (`idCol`, `labelCol`, centroid_cos).
    */
  def labelCentroidScores(df: DataFrame, vecCol: String, idCol: String,
                          labelCol: String): DataFrame = {
    // MODAL length (same stance as sampleDim): the smallest-id row being
    // ragged would size dim wrong, fail the === dim filter for every
    // normal row, and null-score the entire corpus with no error
    val dims = df.filter(col(vecCol).isNotNull)
      .groupBy(size(col(vecCol)).as("__d")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__d")).take(1)
    require(dims.nonEmpty, s"no non-null vectors in '$vecCol'")
    val dim = dims.head.getInt(0)
    val valid = df.filter(col(vecCol).isNotNull &&
      size(col(vecCol)) === dim && col(labelCol).isNotNull)
    val cents = valid
      .select(col(labelCol).as("__lbl"), quantized(col(vecCol)).as("__q"))
      .groupBy(col("__lbl"))
      .agg(count(lit(1)).as("__n"),
        array((0 until dim).map(i => sum(element_at(col("__q"), i + 1))): _*).as("__sums"))
      .select(col("__lbl"),
        transform(col("__sums"),
          s => s.cast("double") / col("__n").cast("double")).as("__cent"))
    df.join(broadcast(cents), col(labelCol) === col("__lbl"), "left")
      .withColumn("centroid_cos",
        when(col(vecCol).isNotNull && size(col(vecCol)) === dim,
          cosine(quantized(col(vecCol)).cast("array<double>"), col("__cent"))))
      .select(col(idCol), col(labelCol), col("centroid_cos"))
  }

  private def nearDupBuckets(df: DataFrame, idCol: String, vecCol: String,
                             nPlanes: Int, seed: Long,
                             portable: Boolean): DataFrame = {
    // MODAL length, not an unordered take(1): one ragged row answering the
    // probe first would size the hyperplanes wrong, null every normal
    // vector's dot product, and silently pool the whole corpus into bucket
    // 0 (which the maxBucket cap then drops — a no-op dedup with no error)
    val dims = df.filter(col(vecCol).isNotNull)
      .groupBy(size(col(vecCol)).as("__d")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__d")).take(1)
    require(dims.nonEmpty, s"no non-null vectors in '$vecCol'")
    val dim = dims.head.getInt(0)
    val planes =
      if (portable) hyperplanesPortable(dim, nPlanes)
      else hyperplanes(dim, nPlanes, seed)
    val vecD = col(vecCol).cast("array<double>")
    // ragged vectors drop here like the other corrupt-input paths — they
    // would otherwise all hash to one bucket and crowd out real candidates
    val b = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("__id"), vecD.as("__v"),
        lshBucket(vecD, planes).as("__bucket"))
    b.groupBy(col("__bucket"))
      .agg(collect_list(struct(col("__id"), col("__v"))).as("members"))
  }

  /** Buckets dropped by `embeddingNearDupPairs`'s `maxBucket` cap:
    * (bucket, bucket_size) — the observable record of candidate loss.
    */
  def embeddingNearDupDroppedBuckets(df: DataFrame, idCol: String, vecCol: String,
                                     nPlanes: Int = 8, maxBucket: Int = 2000,
                                     seed: Long = 42L,
                                     portable: Boolean = false): DataFrame =
    nearDupBuckets(df, idCol, vecCol, nPlanes, seed, portable)
      .select(col("__bucket").as("bucket"), size(col("members")).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs within a
    * bucket with cosine ≥ threshold. Linear in data + quadratic only within
    * buckets (capped by `maxBucket`; inspect the drops with
    * `embeddingNearDupDroppedBuckets`).
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double = 0.95, nPlanes: Int = 8,
                            maxBucket: Int = 2000, seed: Long = 42L,
                            portable: Boolean = false): DataFrame = {
    val buckets = nearDupBuckets(df, idCol, vecCol, nPlanes, seed, portable)
      .filter(size(col("members")).between(2, maxBucket))
    buckets.select(explode(expr(
      """
      flatten(transform(members, (m, i) ->
        transform(slice(members, i + 2, size(members)), n ->
          struct(least(m.__id, n.__id) as id_a,
                 greatest(m.__id, n.__id) as id_b,
                 nanvl(try_divide(
                   aggregate(zip_with(m.__v, n.__v, (x, y) -> x * y), 0.0d, (a, x) -> a + x),
                   sqrt(aggregate(transform(m.__v, x -> x * x), 0.0d, (a, x) -> a + x))
                    * sqrt(aggregate(transform(n.__v, x -> x * x), 0.0d, (a, x) -> a + x))),
                   cast(null as double))
                   as cosine))))
      """)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.cosine"))
      .groupBy(col("id_a"), col("id_b")).agg(max("cosine").as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): embedding
    * near-duplicate pairs ([[embeddingNearDupPairs]]: hyperplane-LSH
    * buckets, capped, cosine-thresholded) are resolved into clusters by
    * connected components, and every non-minimal cluster member is dropped
    * — one representative survives per semantic duplicate set. Rows whose
    * vector is null/corrupt never pair, so they always survive.
    *
    * Scale shape inherits from the parts: bucketed pair generation (no all
    * pairs), iterative small-edge-list components, one anti-join back to
    * the corpus. Deterministic under the fixed hyperplane seed, so the
    * whole composition carries an exact oracle (emb_semantic_dedup_kept).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.95, nPlanes: Int = 8,
                    maxBucket: Int = 2000, seed: Long = 42L,
                    portable: Boolean = false): DataFrame = {
    val pairs = embeddingNearDupPairs(df, idCol, vecCol, threshold, nPlanes,
      maxBucket, seed, portable)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__loser"))
    df.join(losers, df(idCol) === losers("__loser"), "left_anti")
  }
}
