package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PanelFrame

/** Per-series statistical diagnostics and robust conditioning — the
  * tsfeatures-style companions to the lag-transform engine: local trend
  * strength (rolling correlation against time), autocorrelation at chosen
  * lags (seasonality diagnostics), and percentile winsorization.
  *
  * Exactness stance: every statistic is a FIXED expression over exact
  * integer sums (sum, sum-of-squares, sum-of-products of integer-valued
  * inputs are order-proof), so a SQL twin reproduces results bit-for-bit —
  * streaming corr/stddev aggregates whose value depends on aggregation
  * order are deliberately avoided.
  */
object Stats {

  /** Rolling Pearson correlation of the target against another column over
    * a trailing window of `w` grid rows per series — with `xCol` the time
    * ordinal this is the classic local trend-strength indicator.
    *
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)),
    * computed from per-window sums (only rows where both sides are
    * non-null count). Null when fewer than `minSamples` pairs or either
    * variance is zero. One ordered window over the canonical id partition.
    *
    * Returns the panel plus `corr_{xCol}_w{w}`.
    */
  def rollingCorr(p: PanelFrame, xCol: String, w: Int,
                  minSamples: Int = 2): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    require(minSamples >= 2, s"minSamples must be >= 2, got $minSamples")
    val win = Window.partitionBy(p.id).orderBy(p.ds).rowsBetween(-(w - 1), 0)
    val x = col(xCol).cast("double")
    val y = p.y.cast("double")
    val both = x.isNotNull && y.isNotNull
    def s(c: Column): Column = sum(when(both, c)).over(win)
    val n = count(when(both, lit(1))).over(win).cast("double")
    val sx = s(x); val sy = s(y)
    val sxx = s(x * x); val syy = s(y * y); val sxy = s(x * y)
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val corr = when(n >= minSamples && varX > 0 && varY > 0,
      (n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY)))
    p.df.withColumn(s"corr_${xCol}_w$w", corr)
  }

  /** Rolling distribution-shape features over a trailing window of `w`
    * grid rows per series — the tsfresh-style primitives: mean, sample
    * std, adjusted Fisher–Pearson skewness, adjusted excess kurtosis, and
    * the OLS slope against the time ordinal (local trend rate). All from
    * exact integer power sums (Σx, Σx², Σx³, Σx⁴ and the time cross-sums)
    * in fixed expression order, so a SQL twin replays them bit-for-bit.
    * Null below the moment's minimum sample count (2/3/4) or at zero
    * variance.
    *
    * Returns the panel plus `mean_w{w}`, `std_w{w}`, `skew_w{w}`,
    * `kurt_w{w}`, `slope_w{w}`. One ordered window on the id partition.
    */
  def rollingShape(p: PanelFrame, xCol: String, w: Int): DataFrame = {
    require(w >= 4, s"window must be >= 4 for the kurtosis moment, got $w")
    val win = Window.partitionBy(p.id).orderBy(p.ds).rowsBetween(-(w - 1), 0)
    val y = p.y.cast("double")
    val x = col(xCol).cast("double")
    val both = x.isNotNull && y.isNotNull
    // Materialize each frame sum as ONE column before the moment formulas:
    // inlining them re-instantiates the window expression at every textual
    // use inside skew/kurt (window expressions never dedup across
    // extraction — measured 4.6s vs 1.7s at sf0.1 on that alone). Direct
    // bounded frames, NOT prefix-sum differences: cum(t) − cum(t−w) stops
    // equaling the window sum once a running power sum crosses 2^53
    // (y≈1000 over ~1e6 rows does it for Σy⁴), silently corrupting the
    // high moments; the per-window sums bound the magnitude by w rows.
    val terms: Seq[(String, Column)] = Seq(
      "s1" -> y, "s2" -> y * y, "s3" -> y * y * y, "s4" -> y * y * y * y,
      "sx" -> x, "sxx" -> x * x, "sxy" -> x * y)
    val withDiffs = terms.foldLeft(
      p.df.withColumn("__n",
        count(when(both, lit(1))).over(win).cast("double"))) {
      case (d, (nm, c)) =>
        d.withColumn(s"__s_$nm", coalesce(sum(when(both, c)).over(win), lit(0.0)))
    }
    val n = col("__n")
    val s1 = col("__s_s1"); val s2 = col("__s_s2"); val s3 = col("__s_s3")
    val s4 = col("__s_s4")
    val sx = col("__s_sx"); val sxx = col("__s_sxx"); val sxy = col("__s_sxy")
    // try_divide, not the when-guards alone: codegen's common-subexpression
    // elimination hoists these shared terms OUT of the guards, so an ANSI
    // plain divide would throw on the n = 0 / degenerate rows the guards
    // mask; try_divide yields null there (identical values where n fits)
    val m = try_divide(s1, n)
    val varS = try_divide(s2 - n * m * m, n - lit(1.0))
    // clamp before the sqrt: FP cancellation can leave the variance a hair
    // NEGATIVE on constant non-integer windows, and sqrt(-eps) = NaN would
    // poison null-testing consumers (the doc promises null-or-zero there).
    // The SQL twin clamps identically.
    val std = sqrt(greatest(varS, lit(0.0)))
    val m3 = s3 - lit(3.0) * m * s2 + lit(2.0) * n * m * m * m
    val m4 = s4 - lit(4.0) * m * s3 + lit(6.0) * m * m * s2 -
      lit(3.0) * n * m * m * m * m
    val skew = when(n >= 3 && varS > 0,
      try_divide(n * m3, (n - lit(1.0)) * (n - lit(2.0)) * (std * std * std)))
    val kurt = when(n >= 4 && varS > 0,
      try_divide(n * (n + lit(1.0)) * m4,
        (n - lit(1.0)) * (n - lit(2.0)) * (n - lit(3.0)) * (varS * varS)) -
        try_divide(lit(3.0) * (n - lit(1.0)) * (n - lit(1.0)),
          (n - lit(2.0)) * (n - lit(3.0))))
    val slopeDen = n * sxx - sx * sx
    val slope = when(n >= 2 && slopeDen > 0,
      try_divide(n * sxy - sx * s1, slopeDen))
    withDiffs
      .withColumn(s"mean_w$w", when(n >= 1, m))
      .withColumn(s"std_w$w", when(n >= 2, std))
      .withColumn(s"skew_w$w", skew)
      .withColumn(s"kurt_w$w", kurt)
      .withColumn(s"slope_w$w", slope)
      .drop("__n" +: terms.map { case (nm, _) => s"__s_$nm" }: _*)
  }

  /** Per-series autocorrelation at the given lags — the seasonality /
    * persistence diagnostic (statsmodels `acf` convention: deviations from
    * the FULL-series mean, denominator the total sum of squares):
    *
    *   acf_k = (Σ yₜyₜ₋ₖ − ȳ·Hₖ − ȳ·Tₖ + (n−k)·ȳ²) / (Σy² − n·ȳ²)
    *
    * where Hₖ/Tₖ are the head/tail partial sums of the lagged overlap.
    * Every Σ is an exact integer sum; ȳ enters through one fixed-order
    * expression, so results are bit-reproducible. Series with zero
    * variance or n ≤ k yield null.
    *
    * Returns one row per series: (id, n, acf_k...) with columns `acf{k}`.
    * One window pass for the lags + one aggregate — shuffles only on id.
    */
  def acf(p: PanelFrame, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be positive")
    val win = Window.partitionBy(p.id).orderBy(p.ds)
    val y = p.y.cast("double")
    // null targets are dropped BEFORE lagging so every pair statistic masks
    // identically (lag-k pairs are k-apart OBSERVATIONS): keeping null rows
    // would let nk_k/t_k count pairs whose y is null while sk_k drops them.
    val lagged = lags.foldLeft(
      p.df.filter(y.isNotNull).withColumn("__y", y)) { (d, k) =>
      d.withColumn(s"__lag$k", lag(col("__y"), k).over(win))
    }
    val aggs = Seq(
      count(col("__y")).as("n"),
      sum(col("__y")).as("s"),
      sum(col("__y") * col("__y")).as("syy")) ++
      lags.flatMap { k =>
        val lk = col(s"__lag$k")
        Seq(
          sum(col("__y") * lk).as(s"sk$k"),
          sum(when(lk.isNotNull, col("__y"))).as(s"h$k"),
          sum(when(lk.isNotNull, lk)).as(s"t$k"),
          count(lk).as(s"nk$k"))
      }
    val g = lagged.groupBy(p.id).agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    val ybar = col("s") / nD
    val den = col("syy") - nD * ybar * ybar
    val out = lags.foldLeft(g) { (d, k) =>
      val num = col(s"sk$k") - ybar * col(s"h$k") - ybar * col(s"t$k") +
        col(s"nk$k").cast("double") * ybar * ybar
      d.withColumn(s"acf$k", when(col("n") > k && den > 0, num / den))
    }
    out.select(p.id +: col("n") +: lags.map(k => col(s"acf$k")): _*)
  }

  // Ordered-IEEE sum convention used by the packed folds below (and by
  // Losses/Reconcile): fold `term` in (key, term) sort order so a SQL twin
  // replays bit-for-bit as
  // `list_reduce(list_prepend(0.0, list(term ORDER BY key, term)), (a,x) -> a+x)`.

  /** Classical additive seasonal decomposition (statsmodels
    * `seasonal_decompose` shape, odd periods): trend = centered moving
    * average over `period` rows (null at the edges), seasonal = per-phase
    * mean of the detrended series re-centered to sum to zero across
    * phases, resid = y − trend − seasonal.
    *
    * Exactness: the trend is an integer window sum over `period`; the
    * phase means come from exact integer sums ((Σy − Σws/m)/n); the phase
    * re-centering folds the m phase means in phase order — so a SQL twin
    * replays every float bit-for-bit. Phases with no full-window rows get
    * null seasonal; series shorter than the window get all-null
    * trend/resid (the statsmodels edge behavior).
    *
    * Scale shape: two ordered windows + one (id, phase) aggregate + one
    * m-row-per-series fold + broadcastable joins back on (id, phase) —
    * everything partitions by id.
    *
    * Returns (id, ds, y, trend, seasonal, resid).
    */
  def decompose(p: PanelFrame, period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be an odd integer >= 3 (centered moving average), got $period")
    val h = (period - 1) / 2
    val win = Window.partitionBy(p.id).orderBy(p.ds)
    val cw = win.rowsBetween(-h, h)
    val y = p.y.cast("double")
    val base = p.df
      .withColumn("__y", y)
      .withColumn("__phase", ((row_number().over(win) - 1) % period).cast("long"))
      // count OBSERVATIONS, not rows: a null target inside the window must
      // null the trend (statsmodels' NaN propagation), not silently shrink
      // the mean to the non-null subset while dividing by `period` — the
      // mixed row-count/null-skip masking this family had in cusum once
      .withColumn("__cnt", count(y).over(cw))
      .withColumn("__ws", sum(y).over(cw))
    val withTrend = base.withColumn("trend",
      when(col("__cnt") === period, col("__ws") / lit(period.toDouble)))
    // The phase means, their re-centering and the join-back used to be two
    // aggregates over withTrend joined onto withTrend itself — executing the
    // scan + trend windows TWICE. They are window-expressible over the one
    // pipeline: per-(id, phase) conditional sums (exact integer sums, so
    // order-free), then the phase-ordered re-centering fold over one
    // representative row per phase (same orderedSum fold, collected via a
    // per-id window). A phase with no trend-complete row keeps a null phase
    // mean — identical to the absent-group null of the old left join.
    val tOk = col("trend").isNotNull
    val wp = Window.partitionBy(p.id, col("__phase"))
    val wid = Window.partitionBy(p.id)
    val withPm = withTrend
      .withColumn("__n", count(when(tOk, lit(1))).over(wp))
      .withColumn("__pm",
        (sum(when(tOk, col("__y"))).over(wp) -
          sum(when(tOk, col("__ws"))).over(wp) / lit(period.toDouble)) /
          when(col("__n") > 0, col("__n").cast("double")))
      .withColumn("__rep",
        (row_number().over(Window.partitionBy(p.id, col("__phase"))
          .orderBy(p.ds)) === 1) && (col("__n") > 0))
    val phaseMeans = collect_list(
      when(col("__rep"), struct(col("__phase").as("__k"), col("__pm").as("__t"))))
      .over(wid)
    val withSmean = withPm.withColumn("__smean",
      aggregate(
        transform(array_sort(phaseMeans), s => s.getField("__t")),
        lit(0.0), (a, x) => a + x) /
        count(when(col("__rep"), lit(1))).over(wid).cast("double"))
    withSmean
      .withColumn("seasonal", col("__pm") - col("__smean"))
      .withColumn("resid",
        when(tOk, col("__y") - col("trend") - col("seasonal")))
      .select(p.id, p.ds, col("__y").as("y"), col("trend"), col("seasonal"),
        col("resid"))
  }

  /** Trend / seasonal strength per series (Hyndman tsfeatures convention):
    * F_T = max(0, 1 − Var(R)/Var(T+R)) over the deseasonalized series,
    * F_S = max(0, 1 − Var(R)/Var(S+R)) over the detrended series, from
    * the [[decompose]] components on the rows where the residual exists.
    * Variances use ordered-IEEE folds of x and x² ((Σx² − (Σx)²/n)/(n−1)),
    * so results replay bit-for-bit cross-engine. Null when fewer than two
    * residual rows or a zero denominator variance.
    *
    * Returns (id, n, trend_strength, seasonal_strength).
    */
  def strengths(p: PanelFrame, period: Int): DataFrame = {
    // r14: the residual filter moved INTO the aggregate (conditional
    // collect + count over resid rows) so every input series surfaces from
    // the ONE aggregate over the decompose pipeline — the old shape
    // filtered first and then re-scanned the raw panel for the id list to
    // left-join the filtered-out series back in (a second full pass over
    // the panel lineage + an extra join/exchange for rows the aggregate
    // already saw). A series with no residual rows reports n=0 + null
    // strengths exactly as before (count of an all-null column is 0 and
    // collect_list skips nulls, so the fold sees the same element set).
    val d = decompose(p, period)
      .withColumn("__tr", col("y") - col("seasonal"))
      .withColumn("__sr", col("y") - col("trend"))
    val ds = col(p.timeCol)
    val rOk = col("resid").isNotNull
    // one packed ordered fold instead of seven orderedSum aggregates: the
    // rows are collected/sorted ONCE and each moment accumulates
    // independently in the same element order, so every sum is bit-equal
    // to its standalone orderedSum twin at a seventh of the agg work
    val zero = struct(lit(0.0).as("r1"), lit(0.0).as("r2"), lit(0.0).as("t1"),
      lit(0.0).as("t2"), lit(0.0).as("s1"), lit(0.0).as("s2"))
    val packed = aggregate(
      transform(
        array_sort(collect_list(when(rOk, struct(ds.as("__k"),
          struct(col("resid").as("r"), col("__tr").as("t"),
            col("__sr").as("s")).as("__v"))))),
        e => e.getField("__v")),
      zero,
      (a, x) => struct(
        (a.getField("r1") + x.getField("r")).as("r1"),
        (a.getField("r2") + x.getField("r") * x.getField("r")).as("r2"),
        (a.getField("t1") + x.getField("t")).as("t1"),
        (a.getField("t2") + x.getField("t") * x.getField("t")).as("t2"),
        (a.getField("s1") + x.getField("s")).as("s1"),
        (a.getField("s2") + x.getField("s") * x.getField("s")).as("s2")))
    val g = d.groupBy(p.id).agg(
        count(col("resid")).as("n"), packed.as("__sums"))
      .select(col(p.idCol), col("n"),
        col("__sums.r1").as("r1"), col("__sums.r2").as("r2"),
        col("__sums.t1").as("t1"), col("__sums.t2").as("t2"),
        col("__sums.s1").as("s1"), col("__sums.s2").as("s2"))
    val nD = col("n").cast("double")
    def v(s1: Column, s2: Column): Column = (s2 - s1 * s1 / nD) / (nD - lit(1.0))
    val vr = v(col("r1"), col("r2"))
    val vt = v(col("t1"), col("t2"))
    val vs = v(col("s1"), col("s2"))
    g.select(p.id, col("n"),
      when(col("n") >= 2 && vt > 0,
        greatest(lit(0.0), lit(1.0) - vr / vt)).as("trend_strength"),
      when(col("n") >= 2 && vs > 0,
        greatest(lit(0.0), lit(1.0) - vr / vs)).as("seasonal_strength"))
  }

  /** CUSUM mean-shift changepoint detection per series (Page 1954 lineage,
    * Brownian-bridge normalization): Dₜ = cumsumₜ − t·ȳ, statistic =
    * max|Dₜ| / (s·√n) with the sample std from exact moments, changepoint
    * at the EARLIEST argmax (deterministic ties), flagged when the
    * statistic exceeds `threshold` (1.358 ≈ the 95% Kolmogorov bound) —
    * the regime-shift QA gate a panel runs before trusting one global
    * model per series.
    *
    * Every Dₜ is a fixed expression over exact integer sums, so the
    * statistic and location replay bit-for-bit cross-engine. Zero-variance
    * or n<2 series yield null. One ordered window + one aggregate + one
    * join back — id shuffles only.
    *
    * Returns (id, n, cp_pos, cusum_stat, has_change): cp_pos is the
    * 1-based row position whose prefix ends the first segment.
    */
  def cusumChangepoints(p: PanelFrame, threshold: Double = 1.358): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val win = Window.partitionBy(p.id).orderBy(p.ds)
    val cum = win.rowsBetween(Window.unboundedPreceding, 0)
    val y = p.y.cast("double")
    // null targets are excluded BEFORE positions are assigned, so __t counts
    // observations (matching the moment sums) — mixing row positions with
    // null-skipping sums would silently skew the bridge on gappy panels.
    // Series whose y is entirely null still appear (null stats) via `g`.
    val rows = p.df.filter(y.isNotNull)
      .withColumn("__t", row_number().over(win).cast("double"))
      .withColumn("__cs", sum(y).over(cum))
    val g = p.df.groupBy(p.id).agg(
      count(y).as("n"), sum(y).as("s"), sum(y * y).as("s2"))
    val nD = col("n").cast("double")
    val mean = try_divide(col("s"), nD)
    // try_divide: a single-observation series has divisor n-1 = 0 with a
    // NON-null dividend (0.0), which a plain ANSI divide turns into a
    // job-killing DIVIDE_BY_ZERO for the whole panel
    val sd = sqrt(greatest(
      try_divide(col("s2") - nD * mean * mean, nD - lit(1.0)), lit(0.0)))
    val stats = g.select(p.id, col("n"), mean.as("__m"), sd.as("__sd"))
    // the bridge max and its first position come from per-id WINDOWS over
    // the one bridge pipeline rather than two aggregate+join-back rounds
    // that would re-execute it; max/min are order-insensitive, so the
    // window form is bit-identical to the aggregate form
    val wid = Window.partitionBy(p.id)
    val summarized = rows.join(stats, Seq(p.idCol))
      .withColumn("__absd", abs(col("__cs") - col("__t") * col("__m")))
      .withColumn("__mx", max(col("__absd")).over(wid))
      .withColumn("__cp",
        min(when(col("__absd") === col("__mx"), col("__t"))).over(wid))
      .groupBy(p.id).agg(
        max(col("__mx")).as("__mx"),
        max(col("__cp")).cast("long").as("cp_pos"))
    val valid = col("n") >= 2 && col("__sd") > 0
    val stat = col("__mx") / (col("__sd") * sqrt(col("n").cast("double")))
    stats.join(summarized, Seq(p.idCol), "left")
      .select(p.id, col("n"),
        when(valid, col("cp_pos")).as("cp_pos"),
        when(valid, stat).as("cusum_stat"),
        coalesce(when(valid, stat > threshold), lit(false)).as("has_change"))
  }

  /** One step of Page's recursive CUSUM (shared between [[pageCusum]] and
    * the streaming gate `StreamingDrift.cusumGate`, so the two are
    * bit-equal by construction): s⁺' = max(0, s⁺ + (y − μ − k)),
    * s⁻' = max(0, s⁻ + (μ − y − k)).
    */
  private[graft] def pageStep(sPos: Double, sNeg: Double, y: Double,
                              mu: Double, k: Double): (Double, Double) =
    (math.max(0.0, sPos + (y - mu - k)),
      math.max(0.0, sNeg + (mu - y - k)))

  /** Page's CUSUM drift monitor (Page 1954, the sequential form): walk a
    * monitoring frame per series against a FROZEN reference mean μ,
    * accumulating one-sided statistics with slack `k`, and alarm when
    * either side crosses `h` — the classic online mean-shift alarm, the
    * sequential counterpart of [[cusumChangepoints]]' retrospective test.
    *
    * `test` = (idCol, timeCol, targetCol) rows to monitor (time-ordered);
    * `ref` = (idCol, muCol) reference means — series without a reference
    * are not monitored (inner join; monitoring against nothing is
    * meaningless). The walk is a scalar-pair fold per series (the ACI
    * deployment shape: collapse to sorted arrays, compiled kernel, explode
    * back — one id shuffle, per-series state fits the task).
    *
    * Returns (idCol, timeCol, y, s_pos, s_neg, alarm) with post-update
    * statistics.
    */
  def pageCusum(test: DataFrame, ref: DataFrame, idCol: String,
                timeCol: String, targetCol: String, muCol: String,
                k: Double, h: Double): DataFrame = {
    require(k >= 0, s"slack k must be non-negative, got $k")
    require(h > 0, s"alarm threshold h must be positive, got $h")
    val rows = test
      .filter(col(targetCol).isNotNull)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        col(timeCol).as("__t"),
        col(targetCol).cast("double").as("__y")))).as("__rows"))
    val kl = k; val hl = h
    val walk = udf { (mu: Double, rs: Seq[Row]) =>
      var sp = 0.0; var sn = 0.0
      rs.map { r =>
        val y = r.getDouble(1)
        val (sp1, sn1) = pageStep(sp, sn, y, mu, kl)
        sp = sp1; sn = sn1
        (sp, sn, sp > hl || sn > hl)
      }
    }
    // a null reference mean IS no reference: filter it like the inner
    // join filters absent series — otherwise the null nulls the walk
    // array and explode silently erases the series from the monitor
    rows.join(ref.select(col(idCol), col(muCol).cast("double").as("__mu"))
          .filter(col("__mu").isNotNull),
        Seq(idCol))
      .select(col(idCol), col("__rows"),
        walk(col("__mu"), col("__rows")).as("__walk"))
      .select(col(idCol),
        explode(arrays_zip(col("__rows"), col("__walk"))).as("__z"))
      .select(col(idCol),
        col("__z.__rows.__t").as(timeCol),
        col("__z.__rows.__y").as("y"),
        col("__z.__walk._1").as("s_pos"),
        col("__z.__walk._2").as("s_neg"),
        col("__z.__walk._3").as("alarm"))
  }

  /** Intermittent-demand classification per series (Syntetos–Boylan 2005
    * quadrants): ADI = periods per demand event, CV² = squared coefficient
    * of variation of the NONZERO demand sizes (sample std), classified at
    * the standard 1.32 / 0.49 cut points into smooth / intermittent /
    * erratic / lumpy — the routing signal for Croston/TSB vs plain
    * smoothing. Exact integer sums throughout; fewer than two demand
    * events → null CV² and class.
    *
    * Returns (id, n, n_demand, adi, cv2, demand_class). One aggregate.
    */
  def intermittencyStats(p: PanelFrame): DataFrame = {
    val y = p.y.cast("double")
    val nz = when(y =!= 0.0, y)
    val g = p.df.groupBy(p.id).agg(
      count(y).as("n"),
      count(nz).as("n_demand"),
      sum(nz).as("__s"),
      sum(nz * nz).as("__s2"))
    val nD = col("n_demand").cast("double")
    val adi = when(col("n_demand") > 0, col("n").cast("double") / nD)
    val mean = col("__s") / nD
    val varS = (col("__s2") - nD * mean * mean) / (nD - lit(1.0))
    val cv2 = when(col("n_demand") >= 2 && mean =!= 0.0,
      varS / (mean * mean))
    val cls = when(adi.isNull || cv2.isNull, lit(null).cast("string"))
      .when(adi < 1.32 && cv2 < 0.49, lit("smooth"))
      .when(adi >= 1.32 && cv2 < 0.49, lit("intermittent"))
      .when(adi < 1.32, lit("erratic"))
      .otherwise(lit("lumpy"))
    g.select(p.id, col("n"), col("n_demand"), adi.as("adi"), cv2.as("cv2"),
      cls.as("demand_class"))
  }

  /** Per-series winsorization: clip the target at its own exact [pLo, pHi]
    * percentiles (Spark `percentile` = the type-7 interpolated quantile,
    * replayable cross-engine). One partition-only window carries the two
    * cut points to every row — a single id shuffle, no second pass.
    *
    * Returns (id, ds, y, lo, hi, y_wins).
    */
  def winsorize(p: PanelFrame, pLo: Double = 0.05,
                pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val win = Window.partitionBy(p.id)
    val y = p.y.cast("double")
    val lo = percentile(y, lit(pLo)).over(win)
    val hi = percentile(y, lit(pHi)).over(win)
    p.df
      .withColumn("lo", lo)
      .withColumn("hi", hi)
      .withColumn("y_wins", least(greatest(y, col("lo")), col("hi")))
  }
}
