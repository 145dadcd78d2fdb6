package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Corpus, Dedup, Multimodal, Similarity}

/** Dev drive for the training-data pipeline operators on real testdata.
  * `sbt "runMain graft.tools.DemoDataOps [sfDir]"`.
  */
object DemoDataOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("== text analysis (first 5) ==")
    docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.stopwordRatio(col("text")).as("stop_ratio"))
      .orderBy("doc_id").show(5, truncate = false)

    println("== exact dup groups ==")
    println(Dedup.exactGroups(docs, "text", "doc_id").count())

    println("== minhash near-dup pairs (est >= 0.5) ==")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleSize = 3)
    val verified = Dedup.jaccardVerify(pairs, docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5)
    println(s"candidates=${pairs.count()} verified=${verified.count()}")
    verified.orderBy(desc("jaccard")).show(5, truncate = false)

    println("== simhash pairs (hamming <= 6) ==")
    println(Dedup.simhashPairs(docs, "doc_id", "text", blocks = 8,
      maxHamming = 6).count())

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toSeq
    println("== brute-force top-5 cosine vs vec 0 ==")
    Similarity.bruteForceTopK(emb, "embedding", q, 5, "vec_id").show(false)
    println("== LSH top-5 (multi-probe) ==")
    Similarity.lshTopK(emb, "embedding", q, 5, "vec_id").show(false)
    println("== IVF top-5 (4 lists, probe 2) ==")
    val (cents, assigned) = Similarity.ivfBuild(emb, "embedding", "vec_id", nLists = 4, iters = 3)
    Similarity.ivfTopK(assigned, cents, "embedding", q, 5, "vec_id", nProbe = 2).show(false)
    println("== embedding near-dup pairs (cos >= 0.95) ==")
    println(Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.95).count())

    println("== k-means curation clusters (16) + balanced sample ==")
    Similarity.kmeansAssign(emb, "embedding", "vec_id", k = 16, iters = 3)
      .groupBy("cluster").count().orderBy("cluster").show(20)
    println(Similarity.clusterBalancedSample(emb, "embedding", "vec_id",
      k = 16, perCluster = 3, iters = 3).count() + " sampled")

    println("== NB looks-like-English classifier (train en vs rest) ==")
    val nb = Corpus.nbQualityScore(
      docs.filter(col("lang") === "en"),
      docs.filter(not(col("lang") <=> "en")), docs, "doc_id", "text")
    nb.groupBy("label").agg(count(lit(1)).as("docs"),
      avg("nb_score").as("mean_score")).show(false)

    println("== temperature-flattened mixture budgets (alpha=0.5, 100k tokens) ==")
    val mix = Corpus.temperatureMixBudgets(docs, "text", "source", 100000L)
    mix.orderBy(desc("n_tokens")).show(5, truncate = false)
    val budgets = mix.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    println(s"kept=${Corpus.sampleToTokenBudget(docs, "doc_id", "text", "source",
      budgets, "demo").count()} docs under the mixture budgets")

    println("== multimodal features (real WAV/PPM/image/MP3/MP4 metadata) ==")
    val media = Multimodal.syntheticMediaFromDocuments(spark, s"$sfDir/documents.parquet")
    val feats = Multimodal.extractFeatures(media)
    println(s"assets=${feats.count()} ok=${feats.filter(_.ok).count()}")
    feats.toDF().groupBy("codec").count().orderBy("codec").show(false)

    spark.stop()
  }
}
