package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Similarity}

/** Scale smoke for the flagship LLM-pipeline operators: end-to-end
  * MinHash dedup, MinHash-LSH pair generation, LSH k-NN join, SemDeDup,
  * winnowing, and the batched BM25 retrieval join — each run on 1×/4×/16×
  * scaled corpora with wall time
  * and output size per point, and the fitted scaling exponent
  * α = ln(t_b/t_a)/ln(b/a) printed per segment. Banded/bucketed designs
  * must come out sub-quadratic (α well under 2; near-linear once the
  * local[32] job floor amortizes); an accidental all-pairs would show as
  * α → 2 AND an output-count explosion.
  *
  * Corpus scaling is duplicate-structure-preserving, which is the part
  * that makes the exponent honest:
  *   - documents: copy k rewrites every token with a copy-specific
  *     single-char suffix, so shingles differ across copies and NO
  *     cross-copy near-dup pairs form — pair counts must then grow
  *     linearly in K, never K²;
  *   - embeddings: copy k adds a copy-specific constant noise vector
  *     (norm ≈ 0.55), so cross-copy cosines fall far below the SemDeDup
  *     threshold while intra-copy geometry is preserved.
  *
  * A [[PlanGuard]] is installed for the whole run: any unpartitioned
  * window over raw-scale rows or large CartesianProduct at the 16× point
  * fails the smoke (exit 3), same contract as graft.Bench.
  *
  *   sbt "runMain graft.tools.ScaleSmoke /root/testdata/sf0.1"
  */
object ScaleSmoke {

  /** K salted, suffix-rewritten copies of the documents table. */
  def docCorpus(spark: SparkSession, sfDir: String, copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    (0 until copies).map { c =>
      val tag = ('a' + c).toChar.toString // single char: text lengths equal
      base.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1~" + tag).as("text"))
    }.reduce(_ unionByName _)
  }

  /** K salted copies of the embeddings table, each shifted by a
    * copy-specific constant noise vector (per-dimension hash noise in
    * [-0.12, 0.12], norm ≈ 0.55 on 64 dims).
    */
  def embCorpus(spark: SparkSession, sfDir: String, copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull)
    (0 until copies).map { c =>
      base.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(hash(i, lit(c * 7919)), lit(1000)) / lit(1000.0) - lit(0.5))
            * lit(0.24)).cast("float")).as("embedding"))
    }.reduce(_ unionByName _)
  }

  final case class Point(copies: Int, seconds: Double, outRows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val guard = PlanGuard.install(spark, maxRows = 0L)

    val dim = 64
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .filter(col("q_vec").isNotNull)
      .limit(100).cache()
    queries.count()

    // workload name -> corpus-scale runner returning the output row count
    val workloads: Seq[(String, Int => Long)] = Seq(
      "minhash_pairs" -> { k =>
        Dedup.minhashPairs(docCorpus(spark, sfDir, k), "doc_id", "text",
          portable = true).count()
      },
      "dedup_e2e" -> { k =>
        Dedup.deduplicate(docCorpus(spark, sfDir, k), "doc_id", "text",
          portable = true).count()
      },
      "winnow" -> { k =>
        Dedup.winnowFingerprints(docCorpus(spark, sfDir, k), "doc_id", "text")
          .count()
      },
      "semdedup" -> { k =>
        Similarity.semanticDedup(embCorpus(spark, sfDir, k), "vec_id",
          "embedding", threshold = 0.95, portable = true).count()
      },
      "knn_join_lsh" -> { k =>
        Similarity.knnJoinLsh(embCorpus(spark, sfDir, k), queries,
          "vec_id", "embedding", "q_id", "q_vec", k = 3, dim = dim,
          portable = true).count()
      },
      // batched BM25: corpus work is one tokenize pass + the
      // vocabulary-prefiltered postings aggregates (genuinely linear in
      // the corpus, unlike the banded families above); output stays
      // queries×k-bounded. Query terms carry copy-a's token suffix so the
      // match set is scale-invariant while the scanned corpus grows.
      "bm25_join" -> { k =>
        import spark.implicits._
        val bmQueries = Seq(
          (0L, Seq("spark~a", "window~a", "customer~a")),
          (1L, Seq("hash~a", "join~a", "filter~a")),
          (2L, Seq("batch~a", "order~a", "table~a")),
          (3L, Seq("key~a", "value~a", "row~a"))).toDF("qid", "terms")
        Corpus.bm25Join(docCorpus(spark, sfDir, k), "doc_id", "text",
          bmQueries, "qid", "terms", k = 10).count()
      })

    def alpha(a: Point, b: Point): Double =
      math.log(b.seconds / a.seconds) / math.log(b.copies.toDouble / a.copies)

    // Per-family exponent ceilings pinned NEAR the measured values (r8:
    // minhash 0.36, dedup_e2e 0.30, winnow 0.27, semdedup 0.55,
    // knn_join_lsh 0.47) with headroom for box noise — a regression to
    // linear-plus fails the smoke, not just a quadratic one (r8 VERDICT #6).
    val ceilings = Map("minhash_pairs" -> 0.8, "dedup_e2e" -> 0.8,
      "winnow" -> 0.8, "semdedup" -> 1.0, "knn_join_lsh" -> 1.0,
      // linear-by-design (one tokenize pass dominates): the ceiling only
      // catches a super-linear regression, e.g. a lost prefilter turning
      // postings into |corpus|·|queries| work
      "bm25_join" -> 1.2)

    var failed = false
    val results = workloads.map { case (name, run) =>
      guard.label = null
      run(scales.head) // warm classes/codegen, uncounted
      val pts = scales.map { k =>
        guard.label = s"$name@${k}x"
        val t0 = System.nanoTime()
        val out = run(k)
        val sec = (System.nanoTime() - t0) / 1e9
        // drain async listener callbacks (untimed) before the label changes
        // — otherwise the point's PlanGuard violations arrive after the
        // reassignment (or the final null) and are mis-attributed/dropped
        org.apache.spark.sql.graft.bridge.waitForListeners(spark)
        Point(k, sec, out)
      }
      guard.label = null
      val segs = pts.sliding(2).map { case Seq(a, b) =>
        f"a(${a.copies}->${b.copies})=${alpha(a, b)}%.2f"
      }.mkString(" ")
      val aAll = alpha(pts.head, pts.last)
      println(f"[scale] $name%-14s " +
        pts.map(p => f"${p.copies}%2dx ${p.seconds}%6.2fs ${p.outRows}%,12d rows").mkString(" | ") +
        f"  $segs  a_total=$aAll%.2f")
      val ceiling = ceilings.getOrElse(name, 2.0)
      if (aAll >= ceiling) {
        println(f"[scale][FAIL] $name total exponent $aAll%.2f >= ceiling $ceiling " +
          "(regressed from the pinned sub-linear band)")
        failed = true
      }
      (name, pts, aAll)
    }
    org.apache.spark.sql.graft.bridge.waitForListeners(spark)
    if (guard.violations.nonEmpty) {
      guard.violations.foreach(v => println(s"[scale][guard] $v"))
      failed = true
    }
    val json = results.map { case (name, pts, aAll) =>
      s""""$name": {${pts.map(p => s""""${p.copies}x": ${f"${p.seconds}%.2f"}""").mkString(", ")}, "alpha": ${f"$aAll%.2f"}}"""
    }.mkString("{", ", ", "}")
    println(s"""[scale-json] $json""")
    spark.stop()
    if (failed) sys.exit(3)
  }
}
