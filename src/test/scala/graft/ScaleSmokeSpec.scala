package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.tools.{PlanGuard, ScaleSmoke}

/** Failing-on-regression locks for the flagship LLM-pipeline operators'
  * scaling claims (r7 VERDICT #1). tools/ScaleSmoke measures the wall-time
  * exponents at sf0.1 (pinned in SCALING.md); this spec pins the
  * STRUCTURAL facts those exponents rest on, at sf0.001 where they are
  * cheap and deterministic:
  *
  *   1. the scaled corpora are duplicate-structure-preserving — ZERO
  *      cross-copy candidate pairs (the property that makes output sizes,
  *      and therefore honest banded/bucketed work, linear in K);
  *   2. output sizes grow ~linearly 1×→16× — an accidental all-pairs or a
  *      banding regression shows as a K² pair explosion here;
  *   3. the 16× plans are PlanGuard-clean — no unpartitioned window over
  *      raw-scale rows, no large CartesianProduct.
  */
class ScaleSmokeSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private def copyOf(c: org.apache.spark.sql.Column) = floor(c / 10000000L)

  test("scaled corpora are duplicate-structure-preserving: zero cross-copy pairs") {
    val pairs = Dedup.minhashPairs(ScaleSmoke.docCorpus(spark, SfDir, 4),
      "doc_id", "text", portable = true)
    val cross = pairs.filter(copyOf(col("id_a")) =!= copyOf(col("id_b"))).count()
    assert(cross == 0L, s"$cross cross-copy minhash pairs — corpus scaling is contaminated")

    val embPairs = Similarity.embeddingNearDupPairs(
      ScaleSmoke.embCorpus(spark, SfDir, 4), "vec_id", "embedding",
      threshold = 0.95, portable = true)
    val crossEmb = embPairs.filter(copyOf(col("id_a")) =!= copyOf(col("id_b"))).count()
    assert(crossEmb == 0L, s"$crossEmb cross-copy embedding near-dup pairs")
  }

  test("pair/fingerprint outputs grow linearly in corpus copies, never quadratically") {
    def counts(k: Int): (Long, Long, Long) = {
      val docs = ScaleSmoke.docCorpus(spark, SfDir, k)
      (Dedup.minhashPairs(docs, "doc_id", "text", portable = true).count(),
        Dedup.winnowFingerprints(docs, "doc_id", "text").count(),
        Dedup.deduplicate(docs, "doc_id", "text", portable = true).count())
    }
    val (p1, w1, s1) = counts(1)
    val (p16, w16, s16) = counts(16)
    info(s"minhash pairs 1x=$p1 16x=$p16; winnow 1x=$w1 16x=$w16; survivors 1x=$s1 16x=$s16")
    // minhash estimates differ per copy (suffix bijection preserves true
    // jaccard, not hash values), so allow estimation slack around 16x —
    // a quadratic blow-up is 16x further out and cannot hide in it
    assert(p16 <= 16L * p1 * 3 / 2 + 100,
      s"minhash pairs grew superlinearly: $p1 -> $p16 over 16x copies")
    assert(w16 <= 16L * w1 * 6 / 5, s"winnow fingerprints superlinear: $w1 -> $w16")
    assert(w16 >= 16L * w1 * 4 / 5, s"winnow fingerprints sublinear: $w1 -> $w16 — copies dropped?")
    assert(s16 >= 16L * s1 * 9 / 10 && s16 <= 16L * (s1 + p1),
      s"dedup survivors off the per-copy band: 1x=$s1 16x=$s16")
  }

  test("semdedup and LSH knn scale structurally and PlanGuard-clean at 16x") {
    val guard = PlanGuard.install(spark, maxRows = 0L)
    try {
      guard.label = "scale16"
      val emb1 = ScaleSmoke.embCorpus(spark, SfDir, 1)
      val emb16 = ScaleSmoke.embCorpus(spark, SfDir, 16)
      val rows1 = emb1.count()
      val s1 = Similarity.semanticDedup(emb1, "vec_id", "embedding",
        threshold = 0.95, portable = true).count()
      val s16 = Similarity.semanticDedup(emb16, "vec_id", "embedding",
        threshold = 0.95, portable = true).count()
      info(s"semdedup kept 1x=$s1/$rows1 16x=$s16/${16 * rows1}")
      assert(s16 >= 16L * s1 * 9 / 10 && s16 <= 16L * rows1,
        s"semdedup survivors off the per-copy band: 1x=$s1 16x=$s16")

      val queries = spark.read.parquet(s"$SfDir/embeddings.parquet")
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .filter(col("q_vec").isNotNull).limit(50)
      val knn = Similarity.knnJoinLsh(emb16, queries, "vec_id", "embedding",
        "q_id", "q_vec", k = 3, dim = 64, portable = true).count()
      assert(knn > 0 && knn <= 50L * 3, s"LSH knn output $knn out of [1, 150]")

      // the 16x docs pipeline too: runs under the same guard label
      Dedup.deduplicate(ScaleSmoke.docCorpus(spark, SfDir, 16),
        "doc_id", "text", portable = true).count()

      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      guard.label = null
      assert(guard.violations.isEmpty,
        s"PlanGuard violations at 16x: ${guard.violations}")
    } finally spark.listenerManager.unregister(guard)
  }
}
