package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away tonight"), // near-dup of 0
    (2L, "completely different content about spark window aggregation engines"),
    (3L, "The Quick Brown Fox jumps over the lazy dog and runs far away today!"), // exact after normalization of 0
    (4L, "der hund läuft und die katze ist nicht da ein gutes beispiel"),
  ).toDF("doc_id", "text")

  test("text functions: tokens, quality, langid, fingerprint") {
    val out = docs.select($"doc_id",
      TextFunctions.tokenCount($"text").as("n_tok"),
      TextFunctions.langId($"text").as("lang"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.qualityScore($"text").as("q"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_tok") == 14)
    assert(out(0).getAs[String]("lang") == "en")
    assert(out(4).getAs[String]("lang") == "de")
    // doc 3 is doc 0 with different case/punct: same fingerprint
    assert(out(0).getAs[Long]("fp") == out(3).getAs[Long]("fp"))
    assert(out(0).getAs[Long]("fp") != out(1).getAs[Long]("fp"))
    assert(out.forall(r => r.getAs[Double]("q") >= 0 && r.getAs[Double]("q") <= 1))
  }

  test("exact dedup groups by normalized fingerprint") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[scala.collection.Seq[Long]]("doc_ids").toSeq == Seq(0L, 3L))
  }

  test("minhash LSH finds the planted near-duplicate and verifies jaccard") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleSize = 2,
      numHashes = 32, bands = 16)
    val verified = Dedup.jaccardVerify(pairs, docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.5).collect()
    val pairSet = verified.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet.contains((0L, 1L)), s"got $pairSet")
    assert(pairSet.contains((0L, 3L)))
    assert(!pairSet.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash near-dups") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6).collect()
    val pairSet = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet.contains((0L, 3L)), s"got $pairSet") // same normalized tokens modulo case
  }

  test("brute force cosine top-k") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, "embedding", Seq(1.0, 0.0, 0.0), 2, "vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L))
  }

  test("embedding near-dup pairs via LSH") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.1f, 0.2f)),
      (1L, Array(0.99f, 0.01f, 0.1f, 0.2f)),
      (2L, Array(0.0f, 1.0f, -0.5f, 0.3f))).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("IVF matches brute force on small data") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = (0 until 8).map(d => math.sin(3 * 0.7 + d)) // near vec 3
    val bf = Similarity.bruteForceTopK(vecs, "embedding", q, 1, "vec_id")
      .collect()(0).getLong(0)
    val (cents, assigned) = Similarity.ivfBuild(vecs, "embedding", "vec_id", nLists = 4)
    val ivf = Similarity.ivfTopK(assigned, cents, "embedding", q, 1, "vec_id", nProbe = 2)
      .collect()(0).getLong(0)
    assert(bf == 3L && ivf == 3L)
  }

  test("multimodal stub plumbing") {
    val media = Multimodal.syntheticMediaFromDocuments(spark,
      "/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.collect()
    assert(rows.forall(_.ok))
    assert(rows.forall(_.features.length == 8))
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(rows.sortBy(_.asset_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.asset_id).map(_.features.toSeq).toSeq)
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    assert(frames.count() > 0)
  }
}
