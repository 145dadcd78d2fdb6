package graft.forecast

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Native histogram gradient-boosted trees — the LightGBM-class model the
  * reference reaches for first (its headline M4 numbers train LightGBM:
  * /root/reference/tests/test_m4.py:16-55, and its Spark branch wraps
  * SynapseML LightGBM: /root/reference/mlforecast/distributed/models/spark/
  * lgb.py:25-33). No JVM LightGBM binding resolves offline, so this is the
  * algorithm itself (Ke et al. 2017, "LightGBM: A Highly Efficient Gradient
  * Boosting Decision Tree"), built Spark-first:
  *
  *   - **Histogram split finding**: features are pre-binned ONCE into at
  *     most `maxBins` quantile bins (edges from a bounded driver sample, the
  *     `bin_construct_sample_cnt` stance) and every training pass aggregates
  *     fixed-size (grad, hess, count) histograms — never raw feature values.
  *   - **Best-first growth under a leaf budget**: each level aggregates
  *     histograms for ALL open nodes in one distributed pass (cost per tree
  *     = maxDepth passes, the data-parallel GBDT cost model), then accepts
  *     splits in gain order while the tree stays under `numLeaves` — the
  *     leaf-wise-under-budget shape of LightGBM at depth-wise pass cost.
  *   - **Missing-direction learning**: bin 0 is reserved for null/NaN and
  *     each split routes it to whichever side gains more (LightGBM's
  *     `zero_as_missing=false` default-direction learning).
  *   - **L2 leaf shrinkage**: leaf value = −G/(H+λ) · learningRate; loss is
  *     (optionally weighted) squared error, so grad = w·(score−y), hess = w.
  *
  * Scale shape: the binned training set (one byte-ish short per feature) is
  * localCheckpoint-pinned and re-scored in place each round (one narrow map;
  * lineage re-cut every `checkpointEvery` rounds); histogram aggregation
  * ships 2^depth·nFeat·maxBins·3 doubles per partition — MBs — and combines
  * partials on the driver IN PARTITION ORDER, so training is deterministic
  * on a fixed layout (IEEE sums in a fixed order; ties in gain break by
  * lowest feature then bin). Nothing about the corpus rides the driver
  * except the bounded bin sample and the per-level histograms.
  */
final case class GraftGbm(name: String = "ggbm",
                          numRounds: Int = 100,
                          numLeaves: Int = 31,
                          maxDepth: Int = 6,
                          learningRate: Double = 0.1,
                          lambdaL2: Double = 1.0,
                          minDataInLeaf: Int = 20,
                          minGain: Double = 0.0,
                          maxBins: Int = 63,
                          binSampleRows: Int = 100000,
                          checkpointEvery: Int = 10) extends ForecastModel {
  require(numRounds >= 1 && numLeaves >= 2 && maxDepth >= 1 &&
    learningRate > 0 && lambdaL2 >= 0 && minDataInLeaf >= 1 &&
    maxBins >= 2 && maxBins <= 255 && binSampleRows >= maxBins &&
    checkpointEvery >= 1, s"bad GraftGbm params: $this")

  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          weightCol: Option[String]): TrainedModel = {
    require(featureCols.nonEmpty, "GraftGbm needs at least one feature")
    val spark = train.sparkSession
    val feats = featureCols.toArray
    val label = col(s"`$labelCol`").cast("double")
    val w = weightCol.map(c => col(s"`$c`").cast("double")).getOrElse(lit(1.0))
    // NaN marks missing — the featurizer emits null for unavailable lags
    val cols = feats.map(c => coalesce(col(s"`$c`").cast("double"), lit(Double.NaN))) :+
      label :+ w
    val rows0 = train.filter(label.isNotNull && w.isNotNull)
      .select(array(cols.toIndexedSeq: _*).as("__r"))

    // ---- bin edges from a bounded sample (deterministic on a fixed layout)
    val sample = rows0.limit(binSampleRows).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "GraftGbm: empty training frame after dropna")
    val nf = feats.length
    val edges: Array[Array[Double]] = Array.tabulate(nf) { f =>
      val vals = sample.iterator.map(_(f)).filter(v => !v.isNaN).toArray
      java.util.Arrays.sort(vals)
      if (vals.isEmpty) Array.empty[Double]
      else {
        val distinct = new scala.collection.mutable.ArrayBuffer[Double]()
        var i = 0
        while (i < vals.length) {
          if (distinct.isEmpty || vals(i) != distinct.last) distinct += vals(i)
          i += 1
        }
        if (distinct.length <= maxBins) distinct.dropRight(1).toArray // upper edge per bin; last bin open
        else {
          // quantile edges over the sorted sample (left-closed bins)
          val out = new scala.collection.mutable.ArrayBuffer[Double]()
          var b = 1
          while (b < maxBins) {
            val q = vals(((vals.length.toLong * b) / maxBins).toInt.min(vals.length - 1))
            if (out.isEmpty || q != out.last) out += q
            b += 1
          }
          out.toArray
        }
      }
    }
    val nBins = edges.map(_.length + 2) // bin 0 = missing; 1..len+1 = value bins
    val maxNodeBins = nBins.max

    // ---- pre-bin: one compiled pass; the binned set is the training state
    val edgesB = spark.sparkContext.broadcast(edges)
    val binned0: RDD[GraftGbm.TrainRow] = rows0.rdd.map { r =>
      val a = r.getSeq[Double](0)
      val bins = new Array[Short](nf)
      var f = 0
      while (f < nf) {
        bins(f) = GraftGbm.binOf(a(f), edgesB.value(f)).toShort
        f += 1
      }
      GraftGbm.TrainRow(bins, a(nf), a(nf + 1), 0.0)
    }
    val binnedPinned = binned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // base score = weighted mean label, in partition order (deterministic)
    val parts0 = binnedPinned.mapPartitionsWithIndex { (pid, it) =>
      var sy = 0.0; var sw = 0.0
      it.foreach { r => sy += r.w * r.y; sw += r.w }
      Iterator((pid, (sy, sw)))
    }.collect().sortBy(_._1).map(_._2)
    val (sumY, sumW) = parts0.foldLeft((0.0, 0.0)) { case ((a, b), (c, d)) => (a + c, b + d) }
    require(sumW > 0, "GraftGbm: zero total weight")
    val baseScore = sumY / sumW
    var data = binnedPinned.map(r => r.copy(score = baseScore))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()
    binnedPinned.unpersist(false)

    val trees = new scala.collection.mutable.ArrayBuffer[Array[GraftGbm.Node]]()
    var round = 0
    while (round < numRounds) {
      val tree = growTree(data, nf, nBins, maxNodeBins)
      trees += tree
      val treeB = spark.sparkContext.broadcast(tree)
      // leaf values already carry the learning-rate shrinkage
      val next = data.map { r =>
        r.copy(score = r.score + GraftGbm.walkBinned(treeB.value, r.bins))
      }
      val pinned =
        if ((round + 1) % checkpointEvery == 0 || round == numRounds - 1)
          next.localCheckpoint()
        else next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned.count()
      data.unpersist(false)
      data = pinned
      round += 1
    }
    data.unpersist(false)

    // binned thresholds → real-valued thresholds for raw-feature scoring
    val scoringTrees = trees.map(_.map { n =>
      if (n.isLeaf) n
      else n.copy(threshold = edges(n.feature)(n.binThreshold - 1))
    }.toArray).toArray
    new GraftGbmTrained(scoringTrees, baseScore, learningRate)
  }

  /** One tree: level-order distributed histogram passes; best-first split
    * acceptance under the leaf budget on the driver.
    */
  private def growTree(data: RDD[GraftGbm.TrainRow], nf: Int,
                       nBins: Array[Int], maxNodeBins: Int): Array[GraftGbm.Node] = {
    // nodes built incrementally; node 0 is the root
    val nodes = new scala.collection.mutable.ArrayBuffer[GraftGbm.Node]()
    nodes += GraftGbm.Node.openLeaf
    var open: Array[Int] = Array(0) // node ids open at the current level
    var leafCount = 1
    var depth = 0
    val lam = lambdaL2
    while (depth < maxDepth && open.nonEmpty && leafCount < numLeaves) {
      val openIdx: Map[Int, Int] = open.zipWithIndex.toMap
      val partial = nodes.toArray // routing snapshot for this level's pass
      val sc = data.sparkContext
      val partialB = sc.broadcast(partial)
      val nOpen = open.length
      val histSize = nOpen * nf * maxNodeBins * 3
      val openIdxB = sc.broadcast(openIdx)
      // per-partition histograms, combined ON THE DRIVER in partition order
      // (deterministic IEEE sums); each partial is nOpen·nf·bins·3 doubles
      val partials = data.mapPartitionsWithIndex { (pid, it) =>
        val h = new Array[Double](histSize)
        val route = partialB.value
        val oi = openIdxB.value
        it.foreach { r =>
          val node = GraftGbm.routeBinned(route, r.bins)
          val slot = oi.getOrElse(node, -1)
          if (slot >= 0) {
            val g = r.w * (r.score - r.y)
            var f = 0
            while (f < nf) {
              val base = ((slot * nf + f) * maxNodeBins + r.bins(f)) * 3
              h(base) += g
              h(base + 1) += r.w
              h(base + 2) += 1.0
              f += 1
            }
          }
        }
        Iterator((pid, h))
      }.collect().sortBy(_._1).map(_._2)
      partialB.destroy()
      openIdxB.destroy()
      val hist = new Array[Double](histSize)
      partials.foreach { p =>
        var i = 0
        while (i < histSize) { hist(i) += p(i); i += 1 }
      }

      // driver-side split finding per open node
      case class Split(node: Int, feature: Int, binThreshold: Int,
                             missingLeft: Boolean, gain: Double,
                             leftValue: Double, rightValue: Double)
      val candidates = open.flatMap { node =>
        val slot = openIdx(node)
        // node totals from feature 0 (every feature sees every row)
        var tg = 0.0; var th = 0.0; var tc = 0.0
        var b = 0
        while (b < maxNodeBins) {
          val base = ((slot * nf) * maxNodeBins + b) * 3
          tg += hist(base); th += hist(base + 1); tc += hist(base + 2)
          b += 1
        }
        if (tc < 2 * minDataInLeaf) None
        else {
          val parentObj = tg * tg / (th + lam)
          var best: Option[Split] = None
          var f = 0
          while (f < nf) {
            val fb = (slot * nf + f) * maxNodeBins * 3
            val mg = hist(fb); val mh = hist(fb + 1); val mc = hist(fb + 2)
            // prefix over value bins 1..nBins(f)-1; split point AFTER bin t
            var lg = 0.0; var lh = 0.0; var lc = 0.0
            var t = 1
            while (t < nBins(f) - 1) {
              val base = fb + t * 3
              lg += hist(base); lh += hist(base + 1); lc += hist(base + 2)
              // try missing on each side (skip the duplicate when no missing)
              val sides = if (mc > 0) Array(true, false) else Array(false)
              var si = 0
              while (si < sides.length) {
                val ml = sides(si)
                val gl = lg + (if (ml) mg else 0.0)
                val hl = lh + (if (ml) mh else 0.0)
                val cl = lc + (if (ml) mc else 0.0)
                val gr = tg - gl; val hr = th - hl; val cr = tc - cl
                if (cl >= minDataInLeaf && cr >= minDataInLeaf && hl + lam > 0 && hr + lam > 0) {
                  val gain = 0.5 * (gl * gl / (hl + lam) + gr * gr / (hr + lam) - parentObj)
                  val better = best match {
                    case None => gain > minGain
                    case Some(s) =>
                      gain > s.gain + 1e-12 ||
                        (math.abs(gain - s.gain) <= 1e-12 &&
                          (f < s.feature || (f == s.feature && t < s.binThreshold)))
                  }
                  if (better && gain > minGain)
                    best = Some(Split(node, f, t, ml, gain,
                      -gl / (hl + lam) * learningRate, -gr / (hr + lam) * learningRate))
                }
                si += 1
              }
              t += 1
            }
            f += 1
          }
          best
        }
      }

      // accept in gain order while under the leaf budget (ties: node order)
      val accepted = candidates.sortBy(s => (-s.gain, s.node))
        .take(math.max(0, numLeaves - leafCount))
      val nextOpen = new scala.collection.mutable.ArrayBuffer[Int]()
      accepted.foreach { s =>
        val li = nodes.length
        nodes += GraftGbm.Node.leaf(s.leftValue)
        val ri = nodes.length
        nodes += GraftGbm.Node.leaf(s.rightValue)
        nodes(s.node) = GraftGbm.Node(s.feature, Double.NaN, s.binThreshold,
          s.missingLeft, li, ri, 0.0, isLeaf = false)
        nextOpen += li
        nextOpen += ri
        leafCount += 1
      }
      open = nextOpen.toArray
      depth += 1
    }
    // leaves that never split keep their value: open leaves at budget/depth
    // exhaustion still carry Node.openLeaf's 0.0 — refine them to the node's
    // optimal constant? They were created with the SPLIT's leaf value, so
    // only the never-split ROOT needs a value; give it the global optimum.
    if (nodes.length == 1) {
      // single-leaf tree: optimal constant is −G/(H+λ) over all rows; G at
      // the current scores. One cheap pass (partition-ordered, deterministic).
      val parts = data.mapPartitionsWithIndex { (pid, it) =>
        var g = 0.0; var h = 0.0
        it.foreach { r => g += r.w * (r.score - r.y); h += r.w }
        Iterator((pid, (g, h)))
      }.collect().sortBy(_._1).map(_._2)
      val (g, h) = parts.foldLeft((0.0, 0.0)) { case ((a, b), (c, d)) => (a + c, b + d) }
      nodes(0) = GraftGbm.Node.leaf(-g / (h + lambdaL2) * learningRate)
    }
    nodes.toArray
  }
}

object GraftGbm {
  /** One binned training row; `score` is the running boosted prediction. */
  final case class TrainRow(bins: Array[Short], y: Double, w: Double, score: Double)

  /** Flat tree node. For split nodes during GROWTH `binThreshold` routes on
    * bin ids (go left when bin <= binThreshold; bin 0 = missing routes by
    * `missingLeft`); for SCORING `threshold` holds the real upper edge of
    * that bin (go left when value <= threshold).
    */
  final case class Node(feature: Int, threshold: Double, binThreshold: Int,
                        missingLeft: Boolean, left: Int, right: Int,
                        value: Double, isLeaf: Boolean)
  object Node {
    val openLeaf: Node = leaf(0.0)
    def leaf(v: Double): Node =
      Node(-1, Double.NaN, -1, missingLeft = true, -1, -1, v, isLeaf = true)
  }

  /** Bin id of a raw value: 0 = missing; else 1 + #edges <= value... bins
    * are `(-inf, e0], (e0, e1], ..., (eLast, +inf)` → 1-based index.
    */
  def binOf(v: Double, edges: Array[Double]): Int = {
    if (v.isNaN) return 0
    var lo = 0; var hi = edges.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= edges(mid)) hi = mid else lo = mid + 1
    }
    lo + 1
  }

  /** Leaf node id a binned row routes to (growth-time routing). */
  def routeBinned(nodes: Array[Node], bins: Array[Short]): Int = {
    var i = 0
    while (!nodes(i).isLeaf) {
      val n = nodes(i)
      val b = bins(n.feature)
      i = if (b == 0) { if (n.missingLeft) n.left else n.right }
      else if (b <= n.binThreshold) n.left
      else n.right
    }
    i
  }

  /** Tree output for a binned row (growth-time scoring). */
  def walkBinned(nodes: Array[Node], bins: Array[Short]): Double = {
    nodes(routeBinned(nodes, bins)).value
  }

  /** Tree output for a raw feature array (NaN = missing). */
  def walkRaw(nodes: Array[Node], vals: Array[Double]): Double = {
    var i = 0
    while (!nodes(i).isLeaf) {
      val n = nodes(i)
      val v = vals(n.feature)
      i = if (v.isNaN) { if (n.missingLeft) n.left else n.right }
      else if (v <= n.threshold) n.left
      else n.right
    }
    nodes(i).value
  }
}

/** Trained GraftGbm: base score + scoring trees (real-valued thresholds).
  * The whole model is driver-sized (trees of numbers) and java-serializes
  * through the save blob, like MLlib models; no sidecar state needed.
  */
private final class GraftGbmTrained(trees: Array[Array[GraftGbm.Node]],
                                    baseScore: Double,
                                    learningRate: Double) extends TrainedModel {
  def predict(df: DataFrame, featureCols: Seq[String], out: String): DataFrame = {
    val treesL = trees
    val base = baseScore
    val score = udf { (vals: Seq[Double]) =>
      val a = vals.toArray
      var s = base
      var t = 0
      while (t < treesL.length) { s += GraftGbm.walkRaw(treesL(t), a); t += 1 }
      s
    }
    val arr = array(featureCols.map(c =>
      coalesce(col(s"`$c`").cast("double"), lit(Double.NaN))): _*)
    df.withColumn(out, score(arr))
  }

  override def scorer(featureCols: Seq[String]): Option[Array[Double] => java.lang.Double] = {
    val treesL = trees
    val base = baseScore
    Some { arr =>
      var s = base
      var t = 0
      while (t < treesL.length) { s += GraftGbm.walkRaw(treesL(t), arr); t += 1 }
      java.lang.Double.valueOf(s)
    }
  }
}
