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

  test("langid detects space-free Chinese via stopword characters") {
    val zh = Seq(
      (1L, "我是中国人的朋友他们都很好"),          // no whitespace at all
      (2L, "这 是 一个 有 空格 的 例子"),          // space-separated zh
      (3L, "the cat and the dog ran to the house"), // en control
    ).toDF("doc_id", "text")
    val out = zh.select($"doc_id", TextFunctions.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "zh", s"space-free zh undetected: $out")
    assert(out(2L) == "zh")
    assert(out(3L) == "en")
  }

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
    // subword pre-tokens: letter runs, digit runs, symbol runs each count one
    val sw = Seq(
      (0L, "abc123!! def"),        // abc | 123 | !! | def = 4
      (1L, "hello, world"),        // hello | , | world = 3
      (2L, ""),                    // 0
      (3L, "  \t "),               // whitespace only = 0
      (4L, "v2.0-rc1"),            // v | 2 | . | 0 | - | rc | 1 = 7
    ).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.subwordCount($"text").as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq
    assert(sw == Seq(4, 3, 0, 0, 7), s"got $sw")
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

  test("compiled dedup kernels are bit-identical to the Column expressions") {
    // minhash: JVM kernel vs minhashSignature over the same shingle arrays
    val exprSigs = docs
      .select($"doc_id", TextFunctions.tokens(lower($"text")).as("__ts"))
      .select($"doc_id", TextFunctions.wordShinglesFromTokens($"__ts", 3).as("__shg"))
      .select($"doc_id", Dedup.minhashSignature($"__shg", 16).as("sig"))
      .orderBy("doc_id")
      .collect().map(_.getAs[scala.collection.Seq[Long]]("sig").toSeq)
    val jvmSigs = docs.orderBy("doc_id").collect()
      .map(r => Dedup.minhashJvm(r.getString(1), 3, 16).toSeq)
    assert(exprSigs.toSeq == jvmSigs.toSeq)

    // simhash: JVM kernel vs Column fingerprint
    val exprSim = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .orderBy("doc_id").collect().map(_.getAs[Long]("s"))
    val jvmSim = docs.orderBy("doc_id").collect()
      .map(r => Dedup.simhashJvm(r.getString(1)).longValue)
    assert(exprSim.toSeq == jvmSim.toSeq)

    // shingle sets: JVM kernel vs array_distinct(wordShinglesFromTokens(...))
    val exprSh = docs
      .select($"doc_id", TextFunctions.tokens(lower($"text")).as("__ts"))
      .select($"doc_id",
        array_distinct(TextFunctions.wordShinglesFromTokens($"__ts", 3)).as("sh"))
      .orderBy("doc_id").collect().map(_.getAs[scala.collection.Seq[String]]("sh").toSeq)
    val jvmSh = docs.orderBy("doc_id").collect()
      .map(r => Dedup.distinctShinglesJvm(r.getString(1), 3).toSeq)
    assert(exprSh.toSeq == jvmSh.toSeq)
  }

  test("portable hash family: affine61/md560 match their reference arithmetic") {
    // md560 = top 15 hex digits of md5 (the documented SQL spelling)
    for (s <- Seq("", "a", "hello world", "plane:3:17", "ümlaut λ")) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(Dedup.md560(s) == BigInt(hex.substring(0, 15), 16).toLong, s"md560($s)")
    }
    // affine61 = (a*x + b) mod 2^61-1, exact vs BigInt
    val p = BigInt(Dedup.P61)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val a = math.abs(rnd.nextLong()) % Dedup.P61
      val x = math.abs(rnd.nextLong()) % Dedup.P61
      val b = math.abs(rnd.nextLong()) % Dedup.P61
      val want = ((BigInt(a) * BigInt(x) + BigInt(b)) mod p).toLong
      assert(Dedup.affine61(a, x, b) == want, s"affine61($a, $x, $b)")
    }
  }

  test("portable minhash/simhash find the planted near-duplicate too") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleSize = 2,
      numHashes = 32, bands = 16, portable = true)
    val verified = Dedup.jaccardVerify(pairs, docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.5).collect()
    val pairSet = verified.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet.contains((0L, 1L)), s"got $pairSet")
    assert(!pairSet.exists(p => p._1 == 2L || p._2 == 2L))

    // blocks > maxHamming (and dividing the 60-bit portable print): the
    // pigeonhole guarantee is now a hard require
    val sPairs = Dedup.simhashPairs(docs, "doc_id", "text", blocks = 10,
      maxHamming = 6, portable = true).collect()
    val sSet = sPairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(sSet.contains((0L, 3L)), s"got $sSet") // same normalized tokens modulo case
    // portable fingerprints stay within 60 bits (blocks divide 60)
    val fp = Dedup.simhashJvmPortable("The quick brown fox")
    assert((fp.longValue >>> 60) == 0L)
  }

  test("simhash near-dups") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", blocks = 8,
      maxHamming = 6).collect()
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

  test("connected components: chains, merges, randomized union-find parity") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),                   // chain -> component 1
      (5L, 6L),                             // pair -> component 5
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // longer chain -> 10
      (20L, 21L), (22L, 21L),               // V-shape merge -> 20
    ).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L), s"got $out")
    // empty input -> empty output, no iteration
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // randomized parity with driver-side union-find
    val rnd = new scala.util.Random(13)
    (0 until 3).foreach { trial =>
      val es = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = es.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(x => x -> find(x)).toMap
      // union-find roots are not guaranteed minimal per component; normalize
      val wantMin = want.groupBy(_._2).flatMap { case (_, m) =>
        val mn = m.keys.min; m.keys.map(_ -> mn)
      }
      val got = Dedup.connectedComponents(es.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == wantMin, s"trial $trial: $got vs $wantMin")
    }
  }

  test("deduplicate: exact dups collapse to the smallest id, shorts survive") {
    val corpus = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta"),
      (1L, "alpha beta gamma delta epsilon zeta eta"),  // dup of 3, smaller id wins
      (2L, "alpha beta gamma delta epsilon zeta eta"),  // dup, dropped
      (4L, "completely different content with many unique words"),
      (5L, "xy"),                                       // too short to shingle
    ).toDF("doc_id", "text")
    val kept = Dedup.deduplicate(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L), s"got $kept")
  }

  test("top-k aggregate: bounded heap, tie-breaks, merge, serde") {
    import graft.plans.TopKBuffer
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 3L), (0.9, 1L), (0.1, 7L), (0.7, 2L), (0.9, 5L))
      .foreach { case (s, i) => b.insert(s, i) }
    // ties on 0.9 break by smaller id; 0.1 and 0.5 evicted
    assert(b.sortedDesc.toSeq == Seq((0.9, 1L), (0.9, 3L), (0.9, 5L)))
    // merge keeps global best
    val o = new TopKBuffer(3)
    Seq((0.95, 9L), (0.05, 8L)).foreach { case (s, i) => o.insert(s, i) }
    o.foreachPair((s, i) => b.insert(s, i))
    assert(b.sortedDesc.toSeq == Seq((0.95, 9L), (0.9, 1L), (0.9, 3L)))
    // fewer inputs than k
    val small = new TopKBuffer(5)
    small.insert(0.2, 1L); small.insert(0.8, 0L)
    assert(small.sortedDesc.toSeq == Seq((0.8, 0L), (0.2, 1L)))
  }

  test("recallAtK: hit counting, missed queries surface with recall 0") {
    import graft.operators.Similarity
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "vec_id")
    // query 1: 2/3 hit; query 2: 0/2; query 3 missing from approx entirely
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 98L), (2L, 97L))
      .toDF("query_id", "vec_id")
    val r = Similarity.recallAtK(exact, approx, "query_id", "vec_id")
      .orderBy("query_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((1L, 3L, 2L, 2.0 / 3), (2L, 2L, 0L, 0.0), (3L, 1L, 0L, 0.0)))
  }

  test("knn join: parity with the window-ranked expression spelling") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 20 === 0) // 3 query vectors
    val knn = Similarity.knnJoin(vecs, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 4)
      .orderBy("query_id", "rank").collect()
    assert(knn.length == 12) // 3 queries x 4 neighbors
    // expression twin: broadcast cross join + cosine() + window rank
    val q = queries.select($"vec_id".as("query_id"),
      $"embedding".cast("array<double>").as("qv"))
    val expr = vecs.crossJoin(broadcast(q))
      .select($"query_id", $"vec_id",
        Similarity.cosine($"embedding".cast("array<double>"), $"qv").as("cosine"))
      .filter($"cosine".isNotNull)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= 4)
      .select($"query_id", $"rank".cast("long").as("rank"), $"vec_id", $"cosine")
      .orderBy("query_id", "rank").collect()
    knn.zip(expr).foreach { case (k2, e) => assert(k2 == e, s"$k2 != $e") }
    // self-match ranks first for every query
    knn.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("vec_id"))
    }
    // corrupt query vector (NaN) yields no rows, not a hijacked top-k
    val bad = Seq((99L, Array.fill(8)(Float.NaN))).toDF("vec_id", "embedding")
    assert(Similarity.knnJoin(vecs, bad, "vec_id", "embedding",
      "vec_id", "embedding", k = 3).count() == 0)
  }

  test("lsh knn join: bucket-pruned candidates, self-match, stability") {
    val vecs = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 20 === 0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val lsh = Similarity.knnJoinLsh(vecs, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 4, dim = 8, nPlanes = 5).collect().map(key)
    // every query's own bucket is probed, so rank 1 is the self-match
    val top1 = lsh.filter(_._2 == 1L)
    assert(top1.length == 4 && top1.forall(r => r._1 == r._3))
    // approximate scores are a subset of the exact join's candidate scores:
    // each (query, neighbor, cosine) also appears in exact top-80
    val exact = Similarity.knnJoin(vecs, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 80).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(lsh.forall(r => exact.contains((r._1, r._3, r._4))))
    // per-query results are ranked like the exact join restricted to the
    // same candidates: ranks strictly increase with descending cosine
    lsh.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
    // deterministic under repartitioning
    val again = Similarity.knnJoinLsh(vecs.repartition(7), queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 4, dim = 8,
      nPlanes = 5).collect().map(key)
    assert(lsh.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("top-k aggregate: randomized parity with sort-take-k") {
    import graft.plans.TopKBuffer
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { trial =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(40)
      // coarse scores force ties so the id tie-break is actually exercised
      val pairs = Seq.fill(n)((rnd.nextInt(5) / 4.0, rnd.nextInt(20).toLong))
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      val expect = pairs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(buf.sortedDesc.toSeq == expect, s"trial $trial k=$k pairs=$pairs")
      // merge of a random split equals the unsplit fold
      val (l, r) = pairs.splitAt(rnd.nextInt(n + 1))
      val bl = new TopKBuffer(k); l.foreach { case (s, i) => bl.insert(s, i) }
      val br = new TopKBuffer(k); r.foreach { case (s, i) => br.insert(s, i) }
      br.foreachPair((s, i) => bl.insert(s, i))
      assert(bl.sortedDesc.toSeq == expect, s"merge trial $trial")
    }
  }

  test("cosine kernel: randomized parity with the Column expression") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 120).map { i =>
      val dim = 6
      val v: Seq[java.lang.Double] =
        if (i % 17 == 0) Seq.fill(dim)(java.lang.Double.valueOf(0.0)) // zero norm
        else Seq.fill(dim)(java.lang.Double.valueOf(rnd.nextGaussian()))
      (i.toLong, v)
    }
    val q: Seq[java.lang.Double] = Seq.fill(6)(java.lang.Double.valueOf(rnd.nextGaussian()))
    val df = rows.map { case (id, v) => (id, v.map(_.doubleValue)) }.toDF("id", "v")
      .withColumn("q", lit(q.map(_.doubleValue).toArray))
    val exprOut = df.select($"id", Similarity.cosine($"v", $"q").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    rows.foreach { case (id, v) =>
      val k = Similarity.cosineJvm(v, q)
      val e = exprOut(id)
      assert((k == null && e == null) || k == e, s"id=$id kernel=$k expr=$e")
    }
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

  test("multimodal decodes real WAV PCM16 and PPM P6 payloads") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 0.5s of a 440Hz sine at 8kHz mono PCM16, amplitude 0.5
    val rate = 8000; val n = 4000
    val wav = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes); wav.putInt(36 + 2 * n); wav.put("WAVE".getBytes)
    wav.put("fmt ".getBytes); wav.putInt(16)
    wav.putShort(1); wav.putShort(1); wav.putInt(rate)
    wav.putInt(rate * 2); wav.putShort(2); wav.putShort(16)
    wav.put("data".getBytes); wav.putInt(2 * n)
    for (i <- 0 until n)
      wav.putShort((0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)
    // 2x2 PPM: white, black, mid-red, mid-green
    val ppmHeader = "P6\n2 2\n255\n".getBytes
    val ppmPix = Array(255, 255, 255, 0, 0, 0, 128, 0, 0, 0, 128, 0).map(_.toByte)
    val media = Seq(
      (1L, "audio", wav.array()),
      (2L, "image", ppmHeader ++ ppmPix),
      (3L, "audio", "not really audio".getBytes),
    ).toDF("asset_id", "media_type", "bytes")
    val out = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(f => f.asset_id -> f).toMap
    val a = out(1L)
    assert(a.codec == "wav-pcm16" && a.ok)
    assert(a.sample_rate.contains(rate) && a.duration_ms.contains(500L))
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) in every envelope bucket
    a.features.foreach(f => assert(math.abs(f - 0.5 / math.sqrt(2)) < 0.01, f))
    val img = out(2L)
    assert(img.codec == "ppm-p6" && img.ok)
    assert(img.width.contains(2) && img.height.contains(2))
    // 2x2 thumbnail = the pixels' luminances
    assert(math.abs(img.features(0) - 1.0) < 1e-6)          // white
    assert(math.abs(img.features(1) - 0.0) < 1e-6)          // black
    assert(math.abs(img.features(2) - 0.299 * 128 / 255) < 1e-6) // red
    assert(math.abs(img.features(3) - 0.587 * 128 / 255) < 1e-6) // green
    assert(out(3L).codec == "stub" && out(3L).ok) // falls through, no crash
  }

  test("audio spectral features: Goertzel bands isolate a pure tone") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 0.5s of a 1000Hz sine at 8kHz mono PCM16, amplitude 0.5: 500 whole
    // cycles, and every probe band is a multiple of the 2Hz bin width, so
    // off-tone bands see (near-)orthogonal leakage only
    def sineWav(freq: Double): Array[Byte] = {
      val rate = 8000; val n = 4000
      val wav = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
      wav.put("RIFF".getBytes); wav.putInt(36 + 2 * n); wav.put("WAVE".getBytes)
      wav.put("fmt ".getBytes); wav.putInt(16)
      wav.putShort(1); wav.putShort(1); wav.putInt(rate)
      wav.putInt(rate * 2); wav.putShort(2); wav.putShort(16)
      wav.put("data".getBytes); wav.putInt(2 * n)
      for (i <- 0 until n)
        wav.putShort((0.5 * math.sin(2 * math.Pi * freq * i / rate) * 32767).toShort)
      wav.array()
    }
    val media = Seq(
      (1L, "audio", sineWav(1000.0)),
      (2L, "audio", sineWav(250.0)),
      (3L, "audio", "not audio".getBytes("UTF-8")),
    ).toDF("asset_id", "media_type", "bytes")
    val out = Multimodal.audioSpectralFeatures(media).collect()
      .map(f => f.asset_id -> f).toMap
    val bands = Seq(125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0)
    val a = out(1L)
    assert(a.ok && a.sample_rate.contains(8000))
    val e1 = a.band_energy.get
    // amplitude-0.5 sine at the probe: |X|^2/n^2 = A^2/4 = 0.0625
    assert(math.abs(e1(bands.indexOf(1000.0)) - 0.0625) < 1e-3)
    assert(e1.zipWithIndex.filter(_._2 != bands.indexOf(1000.0))
      .forall(_._1 < 1e-4))
    // 4000Hz band sits AT Nyquist for 8kHz: reported as exactly 0
    assert(e1(bands.indexOf(4000.0)) == 0.0)
    assert(math.abs(a.spectral_centroid_hz.get - 1000.0) < 1.0)
    // zcr of a 1000Hz tone at 8kHz: 2 crossings/cycle = 0.25
    assert(math.abs(a.zcr.get - 0.25) < 0.01)
    val b = out(2L)
    assert(math.abs(b.band_energy.get(bands.indexOf(250.0)) - 0.0625) < 1e-3)
    assert(math.abs(b.spectral_centroid_hz.get - 250.0) < 1.0)
    assert(math.abs(b.zcr.get - 2 * 250.0 / 8000.0) < 0.01)
    // non-audio payloads fail loudly, never fake spectra
    assert(!out(3L).ok && out(3L).band_energy.isEmpty)
  }

  test("mp3 frame-header metadata parses in pure JVM; truncated WAVs fail loudly") {
    // 10 synthetic frames at 48kHz/192kbps = exactly 240 ms
    val mp3 = Multimodal.mp3Bytes(10)
    assert(Multimodal.parseMp3Meta(mp3) == Some((48000, 192, 240L)))
    // ID3v2 tag (syncsafe size 100) before the frames is skipped
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 100) ++
      Array.fill[Byte](100)(0x41) ++ mp3
    assert(Multimodal.parseMp3Meta(id3) == Some((48000, 192, 240L)))
    // junk before the first sync resyncs; junk after frames ends the walk
    assert(Multimodal.parseMp3Meta(
      Array[Byte](1, 2, 3) ++ mp3 ++ Array[Byte](0, 0)) == Some((48000, 192, 240L)))
    assert(Multimodal.parseMp3Meta("plain text".getBytes("UTF-8")).isEmpty)
    // one plausible header in arbitrary binary must NOT classify as mp3
    assert(Multimodal.parseMp3Meta(Multimodal.mp3Bytes(1)).isEmpty)

    // an mp3 asset through the batched decoder: real duration, stub features
    val media = Seq((1L, "audio", mp3)).toDF("asset_id", "media_type", "bytes")
    val mf = Multimodal.extractFeatures(media, dim = 4).collect()(0)
    assert(mf.codec == "mp3" && mf.ok && mf.duration_ms.contains(240L) &&
      mf.sample_rate.contains(48000) && mf.features.length == 4)

    // RIFF/WAVE magic with a data chunk claiming more bytes than exist:
    // must fail the ROW (ok=false), not launder stub features as ok=true
    val truncated = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    truncated.put("RIFF".getBytes); truncated.putInt(1000); truncated.put("WAVE".getBytes)
    truncated.put("fmt ".getBytes); truncated.putInt(16)
    truncated.putShort(1); truncated.putShort(1); truncated.putInt(8000)
    truncated.putInt(16000); truncated.putShort(2); truncated.putShort(16)
    truncated.put("data".getBytes); truncated.putInt(999999)
    val wavMedia = Seq((2L, "audio", truncated.array()))
      .toDF("asset_id", "media_type", "bytes")
    val wf = Multimodal.extractFeatures(wavMedia, dim = 4).collect()(0)
    assert(!wf.ok && wf.codec == "wav-pcm16" && wf.error.contains("decode failed"))
  }

  test("mp4 box-tree + H.264 SPS metadata parses in pure JVM") {
    // multiple-of-16 dims: no cropping in the SPS
    val v = Multimodal.mp4Bytes(128, 64, 12340L)
    assert(v.length == 457) // the constant the oracle SQL twin relies on
    assert(Multimodal.parseMp4Meta(v) ==
      Some(Multimodal.Mp4Meta(Some(128), Some(64), Some(12340L), "mp4-avc1")))
    // non-multiple-of-16 height goes through REAL frame-cropping arithmetic
    val hd = Multimodal.spsNal(1920, 1080)
    assert(Multimodal.parseSps(hd) == Some((1920, 1080)))
    val crop = Multimodal.spsNal(1918, 1078) // asymmetric crop both axes
    assert(Multimodal.parseSps(crop) == Some((1918, 1078)))
    // through the batched decoder: real metadata, stub features, ok=true
    val media = Seq((1L, "video", v)).toDF("asset_id", "media_type", "bytes")
    val mf = Multimodal.extractFeatures(media, dim = 4).collect()(0)
    assert(mf.codec == "mp4-avc1" && mf.ok && mf.width.contains(128) &&
      mf.height.contains(64) && mf.duration_ms.contains(12340L) &&
      mf.features.length == 4)
    // ftyp magic with a truncated/garbled moov: fail the ROW, never
    // launder stub features as ok=true
    val bad = v.take(40)
    val badRow = Seq((2L, "video", bad)).toDF("asset_id", "media_type", "bytes")
      .as("m")
    val bf = Multimodal.extractFeatures(badRow, dim = 4).collect()(0)
    assert(!bf.ok && bf.codec == "mp4" && bf.error.contains("mp4 decode failed"))
    // a plain binary payload with no container magic keeps the stub path
    assert(Multimodal.parseMp4Meta("0123456789abcdef".getBytes).isEmpty)
    // property sweep: encode->parse identity across the even-dimension
    // space, crossing crop/no-crop and multi-byte exp-Golomb boundaries
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val w = (rnd.nextInt(960) + 1) * 2
      val h = (rnd.nextInt(540) + 1) * 2
      assert(Multimodal.parseSps(Multimodal.spsNal(w, h)) == Some((w, h)),
        s"sps round-trip failed for ${w}x$h")
    }
  }

  test("corrupt embeddings cannot hijack top-k or near-dup results") {
    val rows = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(Double.NaN, 1.0)), // NaN component -> NaN cosine
      (4L, null.asInstanceOf[Seq[Double]]), // null vector
      (5L, Seq(0.0, 0.0)), // zero norm -> NaN cosine
    ).toDF("id", "vec")
    val top = Similarity.bruteForceTopK(rows, "vec", Seq(1.0, 0.0), 3, "id")
      .collect().map(_.getLong(0)).toSeq
    assert(top.take(2) == Seq(1L, 2L)) // corrupt rows rank last, not first
    val pairs = Similarity.embeddingNearDupPairs(rows, "id", "vec",
      threshold = 0.5, nPlanes = 2, maxBucket = 100)
    // no pair involving the NaN/zero rows passes the threshold
    assert(pairs.collect().forall(r => !r.getDouble(2).isNaN))
  }

  test("malformed WAV chunks and truncated images fail per-row, not per-task") {
    // negative RIFF chunk size: would loop forever / throw pre-fix
    val bad = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put("RIFF".getBytes); bad.putInt(56); bad.put("WAVE".getBytes)
    bad.put("fmt ".getBytes); bad.putInt(-8)
    val badWav = bad.array()
    // truncated JPEG: sniffs as jpeg, decode fails
    val badJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x00, 0x01)
    val media = Seq(
      (1L, "audio", badWav),
      (2L, "image", badJpeg),
    ).toDF("asset_id", "media_type", "bytes")
    val out = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(f => f.asset_id -> f).toMap
    assert(!out(2L).ok && out(2L).codec == "jpeg") // surfaced, not stubbed
    assert(out(1L).asset_id == 1L) // the task survived the malformed chunk
  }

  test("simhash bucket blocks must divide the fingerprint") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", blocks = 1).collect()
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", blocks = 5).collect()
    }
  }

  test("multimodal decodes real PNG and JPEG payloads via JDK ImageIO") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 2x2 image: white, black, mid-red, mid-green (same as the PPM test)
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0x800000); img.setRGB(1, 1, 0x008000)
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", encode("png")),
      (2L, "image", encode("jpg")),
    ).toDF("asset_id", "media_type", "bytes")
    val out = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(f => f.asset_id -> f).toMap

    val png = out(1L)
    assert(png.codec == "png" && png.ok)
    assert(png.width.contains(2) && png.height.contains(2))
    assert(math.abs(png.features(0) - 1.0) < 1e-6)               // white
    assert(math.abs(png.features(1) - 0.0) < 1e-6)               // black
    assert(math.abs(png.features(2) - 0.299 * 0x80 / 255) < 1e-2) // red
    assert(math.abs(png.features(3) - 0.587 * 0x80 / 255) < 1e-2) // green
    // JPEG is lossy: decode succeeds with real dimensions, features close
    val jpeg = out(2L)
    assert(jpeg.codec == "jpeg" && jpeg.ok)
    assert(jpeg.width.contains(2) && jpeg.height.contains(2))
    assert(math.abs(jpeg.features(0) - 1.0) < 0.15)
  }

  // ------------------------------------------------------------- Corpus ops

  test("repetition stats: kernel parity with the Column-expression twin") {
    import graft.operators.Corpus
    val rep = Seq(
      (0L, "a b a b a b c"),            // heavy bigram repetition
      (1L, "all distinct words here"),  // none
      (2L, "x"),                        // 1 token -> 0 bigrams, null fraction
      (3L, ""),                         // empty
      (4L, null.asInstanceOf[String]),  // null text
      (5L, "Tok tok TOK"),              // case-folds to one token
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(rep, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_tokens") == 7)
    assert(out(0).getAs[Int]("n_distinct_tokens") == 3)
    assert(out(0).getAs[Int]("n_ngrams") == 6)
    assert(out(0).getAs[Int]("n_distinct_ngrams") == 3) // "a b","b a","b c"
    assert(math.abs(out(0).getAs[Double]("dup_ngram_fraction") - 0.5) < 1e-12)
    assert(out(1).getAs[Double]("dup_token_fraction") == 0.0)
    assert(out(2).getAs[Int]("n_ngrams") == 0 && out(2).isNullAt(6))
    assert(out(3).getAs[Int]("n_tokens") == 0 && out(3).isNullAt(5))
    assert(out(4).getAs[Int]("n_tokens") == 0)
    assert(out(5).getAs[Int]("n_distinct_tokens") == 1)
    // parity with the expression spelling on the shared docs fixture
    val exprStats = docs
      .select($"doc_id", TextFunctions.tokens(lower($"text")).as("ts"))
      .select($"doc_id", $"ts",
        TextFunctions.wordShinglesFromTokens($"ts", 2).as("gs"))
      .select($"doc_id", size($"ts").as("nt"), size(array_distinct($"ts")).as("ndt"),
        size($"gs").as("ng"), size(array_distinct($"gs")).as("ndg"))
      .orderBy("doc_id").collect()
    val kernelStats = Corpus.repetitionStats(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    exprStats.zip(kernelStats).foreach { case (e, k) =>
      assert(e.getAs[Int]("nt") == k.getAs[Int]("n_tokens"))
      assert(e.getAs[Int]("ndt") == k.getAs[Int]("n_distinct_tokens"))
      assert(e.getAs[Int]("ng") == k.getAs[Int]("n_ngrams"))
      assert(e.getAs[Int]("ndg") == k.getAs[Int]("n_distinct_ngrams"))
    }
  }

  test("shared shingle stats: cross-corpus contamination fractions") {
    import graft.operators.Corpus
    val out = Corpus.sharedShingleStats(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // docs 0/1/3 share every 3-gram except the one containing the final
    // token ("today" vs "tonight" vs "today!" — whitespace tokenization
    // keeps the punctuation attached, so all three tails differ): 11/12
    assert(out(0).getAs[Double]("shared_fraction") == 11.0 / 12)
    assert(out(3).getAs[Double]("shared_fraction") == 11.0 / 12)
    // doc 2 shares nothing
    assert(out(2).getAs[Long]("n_shared") == 0L)
    assert(out(2).getAs[Double]("shared_fraction") == 0.0)
    val d1 = out(1)
    assert(d1.getAs[Long]("n_shingles") == 12L)
    assert(d1.getAs[Long]("n_shared") == 11L)
    // short/empty docs survive with zero shingles and a null fraction
    val tiny = Seq((0L, "a b"), (1L, "a b c")).toDF("doc_id", "text")
    val t = Corpus.sharedShingleStats(tiny, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(t(0).getAs[Long]("n_shingles") == 0L && t(0).isNullAt(3))
    assert(t(1).getAs[Long]("n_shared") == 0L)
  }

  test("chunk by tokens: windows, overlap, partial tail, empty docs") {
    import graft.operators.Corpus
    val cdf = Seq(
      (0L, (1 to 11).map(i => s"t$i").mkString(" ")),  // 11 tokens
      (1L, "a b c"),                                   // fits one chunk
      (2L, ""),                                        // no tokens -> no rows
    ).toDF("doc_id", "text")
    val out = Corpus.chunkByTokens(cdf, "doc_id", "text", chunkSize = 5, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 0: step 3 -> starts 0,3,6,9 -> 4 chunks; doc 1: 1 chunk
    assert(out.length == 5)
    val d0 = out.filter(_.getLong(0) == 0L)
    assert(d0.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4 t5", "t4 t5 t6 t7 t8", "t7 t8 t9 t10 t11", "t10 t11"))
    assert(d0.map(_.getAs[Int]("n_tokens")).toSeq == Seq(5, 5, 5, 2))
    assert(out.filter(_.getLong(0) == 1L).head.getAs[String]("chunk_text") == "a b c")
    // overlap 0: exact partition, no token lost or duplicated
    val flat = Corpus.chunkByTokens(cdf, "doc_id", "text", chunkSize = 4)
      .orderBy("doc_id", "chunk_idx").collect()
      .filter(_.getLong(0) == 0L).map(_.getAs[String]("chunk_text")).mkString(" ")
    assert(flat == (1 to 11).map(i => s"t$i").mkString(" "))
  }

  test("benchmark contamination: two-table distinct n-gram overlap") {
    import graft.operators.Corpus
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "one two three four"),
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma zeta"),   // 2 trigrams: "alpha beta gamma" hit, "beta gamma zeta" miss
      (11L, "one two three four"),      // fully contained: 2/2
      (12L, "totally novel words here"),// 0/2
      (13L, "xy"),                      // too short: 0 trigrams, null fraction
    ).toDF("doc_id", "text")
    val out = Corpus.benchmarkContamination(train, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_ngrams") == 2L)
    assert(out(0).getAs[Long]("n_contaminated") == 1L)
    assert(out(0).getAs[Double]("contamination_fraction") == 0.5)
    assert(out(1).getAs[Double]("contamination_fraction") == 1.0)
    assert(out(2).getAs[Long]("n_contaminated") == 0L)
    assert(out(2).getAs[Double]("contamination_fraction") == 0.0)
    assert(out(3).getAs[Long]("n_ngrams") == 0L && out(3).isNullAt(3))
    // repeated n-grams in a benchmark doc count once (distinct semantics)
    val rep = Seq((20L, "one two three one two three")).toDF("doc_id", "text")
    val r = Corpus.benchmarkContamination(train, rep, "doc_id", "text", n = 3)
      .collect()(0)
    // distinct trigrams: "one two three", "two three one", "three one two",
    // "one two three" (dup) -> 3 distinct, 1 contaminated
    assert(r.getAs[Long]("n_ngrams") == 3L && r.getAs[Long]("n_contaminated") == 1L)
  }

  test("gopher filter: each rule flips on the right violation") {
    import graft.operators.Corpus
    val longGood = ("the quick brown fox and all of his friends " * 10).trim
    val gdf = Seq(
      (0L, longGood),                                  // passes everything
      (1L, "too short to pass the word count"),        // word_count_ok = 0
      (2L, longGood + " " + ("!?!" * 40)),             // symbol_ratio_ok = 0
      (3L, ("internationalization " * 60).trim),       // mwl + stopwords fail
    ).toDF("doc_id", "text")
    val out = Corpus.gopherFilter(gdf, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("keep") == 1)
    assert(out(1).getAs[Int]("word_count_ok") == 0 && out(1).getAs[Int]("keep") == 0)
    assert(out(2).getAs[Int]("symbol_ratio_ok") == 0 && out(2).getAs[Int]("keep") == 0)
    assert(out(3).getAs[Int]("mean_word_len_ok") == 0)
    assert(out(3).getAs[Int]("stopwords_ok") == 0 && out(3).getAs[Int]("keep") == 0)
  }

  test("gopher filter: compiled kernel parity with the expression twin") {
    import graft.operators.Corpus
    val longGood = ("the quick brown fox and all of his friends " * 10).trim
    val edge = Seq(
      (0L, longGood),
      (1L, null.asInstanceOf[String]),                  // null text
      (2L, ""),                                         // empty
      (3L, "  \t  "),                                   // whitespace-only
      (4L, "naïve café über — σ Σ ΑΣ"),                 // non-ASCII letters
      (5L, "!?!@#$ 12.5 +-*/"),                         // punct/digit heavy
      (6L, "\tthe\tthe  of of of " + longGood),         // tabs + dup stopwords
      (7L, ("ab " * 60).trim),                          // mwl below range
    ).toDF("doc_id", "text")
    val fixtures = Seq(edge, docs)
    fixtures.foreach { fx =>
      val kernel = Corpus.gopherFilter(fx, "doc_id", "text")
        .orderBy("doc_id").collect()
      val expr = Corpus.gopherFilterExprTwin(fx, "doc_id", "text")
        .orderBy("doc_id").collect()
      kernel.zip(expr).foreach { case (k, e) =>
        assert(k == e, s"kernel $k != expr $e")
      }
    }
    // the kernel's raw measures agree with the TextFunctions expressions
    val km = edge.select($"doc_id", $"text").collect().map { r =>
      Corpus.gopherStatsJvm(r.getAs[String]("text"),
        graft.functions.TextFunctions.stopwordList.toSet)
    }
    val em = edge.select(
        coalesce(size(graft.functions.TextFunctions.tokens(lower($"text"))), lit(0)).as("nt"),
        coalesce(graft.functions.TextFunctions.meanWordLength($"text"), lit(0.0)).as("mwl"),
        coalesce(graft.functions.TextFunctions.punctRatio($"text"), lit(0.0)).as("pr"),
        coalesce(graft.functions.TextFunctions.alphaRatio($"text"), lit(0.0)).as("ar"))
      .collect()
    km.zip(em).foreach { case (k, e) =>
      assert(k._1 == math.max(e.getAs[Int]("nt"), 0))
      assert(math.abs(k._2 - e.getAs[Double]("mwl")) < 1e-12)
      assert(math.abs(k._3 - e.getAs[Double]("pr")) < 1e-12)
      assert(math.abs(k._4 - e.getAs[Double]("ar")) < 1e-12)
    }
  }

  test("pii scrub: counts and ordered redaction") {
    import graft.operators.Corpus
    val pii = Seq(
      (0L, "mail a@b.co or x.y_z%2+w@sub.domain.org now"),
      (1L, "server at 10.0.255.3 and 192.168.1.1, call +1-555-0042 or +44 20 7946 0958"),
      (2L, "no pii at all"),
      (3L, "half@way and 999.999.999.999 edge +1-2-3"),  // 3-digit octets still match the shape
    ).toDF("doc_id", "text")
    val out = Corpus.piiScrub(pii, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") == 2)
    assert(out(0).getAs[String]("redacted") == "mail <EMAIL> or <EMAIL> now")
    assert(out(1).getAs[Int]("n_ips") == 2 && out(1).getAs[Int]("n_phones") == 2)
    assert(out(1).getAs[String]("redacted") ==
      "server at <IP> and <IP>, call <PHONE> or <PHONE>")
    assert(out(2).getAs[Int]("n_emails") == 0 && out(2).getAs[String]("redacted") == "no pii at all")
    // the shape-based IPv4 pattern is a scrubber, not a validator: 999s match
    assert(out(3).getAs[Int]("n_ips") == 1)
    // "+1-2-3" is too short for the phone pattern
    assert(out(3).getAs[Int]("n_phones") == 0)
  }

  test("deterministic sampling: stable, bounded, stratified") {
    import graft.operators.Corpus
    val rows = spark.range(0, 2000)
      .select($"id".as("doc_id"), ($"id" % 5).cast("string").as("lang"))
    val s1 = Corpus.hashSample(rows, "doc_id", "salt", 200).collect().map(_.getLong(0)).toSet
    val s2 = Corpus.hashSample(rows.repartition(7), "doc_id", "salt", 200)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash sample must be stable under repartitioning")
    assert(s1.size > 330 && s1.size < 470, s"~20% of 2000, got ${s1.size}")
    // different salt -> different (mostly disjoint-ish) sample
    val s3 = Corpus.hashSample(rows, "doc_id", "other", 200).collect().map(_.getLong(0)).toSet
    assert(s3 != s1)
    // permille bounds
    intercept[IllegalArgumentException] { Corpus.hashSample(rows, "doc_id", "s", 1001) }
    // stratified: exactly k per stratum, deterministic
    val k1 = Corpus.stratifiedSample(rows, Seq("lang"), "doc_id", "seed", 7)
      .groupBy("lang").count().collect()
    assert(k1.forall(_.getAs[Long]("count") == 7L))
    val d1 = Corpus.stratifiedSample(rows, Seq("lang"), "doc_id", "seed", 7)
      .collect().map(_.getLong(0)).sorted.toSeq
    val d2 = Corpus.stratifiedSample(rows.repartition(11), Seq("lang"), "doc_id", "seed", 7)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(d1 == d2)
    // k larger than a stratum returns the whole stratum
    val small = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "lang")
    assert(Corpus.stratifiedSample(small, Seq("lang"), "doc_id", "s", 10).count() == 2)
  }

  test("token-budget mixture: floors honored, straddler kept, stable") {
    import graft.operators.Corpus
    val rows = (0L until 100L).map(i => (i, s"src${i % 2}", "w " * (i % 7 + 1).toInt))
      .toDF("doc_id", "source", "text")
    val out = Corpus.sampleToTokenBudget(rows, "doc_id", "text", "source",
      Map("src0" -> 40L, "src1" -> 0L), "mix")
    val kept = out.collect()
    // only src0 survives (src1 budget 0, unlisted would be 0 too)
    assert(kept.forall(_.getAs[String]("source") == "src0"))
    // every kept doc started strictly below the budget; the straddler may
    // cross it, so total tokens >= budget but minus the largest doc < budget
    val cums = kept.map(r => (r.getAs[Long]("cum_tokens"), r.getAs[Long]("n_tokens")))
    assert(cums.forall { case (c, n) => c - n < 40L })
    val total = cums.map(_._2).sum
    assert(total >= 40L && total - cums.map(_._2).max < 40L, s"total=$total")
    // deterministic under repartitioning
    val again = Corpus.sampleToTokenBudget(rows.repartition(13), "doc_id", "text",
      "source", Map("src0" -> 40L, "src1" -> 0L), "mix")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept.map(_.getLong(0)).sorted.toSeq)
    // unlisted domains drop
    assert(Corpus.sampleToTokenBudget(rows, "doc_id", "text", "source",
      Map("nope" -> 1000L), "mix").count() == 0L)
  }

  test("pack sequences: exact token partition, spans, determinism") {
    import graft.operators.Corpus
    val rows = (0L until 60L).map(i => (i, "t " * (i % 11 + 1).toInt))
      .toDF("doc_id", "text") // token counts 1..11
    val out = Corpus.packSequences(rows, "doc_id", "text",
      capacity = 16, nStreams = 4, salt = "pack")
    val rs = out.collect()
    // every document's slices tile [0, n) exactly — no token lost or doubled
    val byDoc = rs.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == 60)
    for ((id, slices) <- byDoc) {
      val sorted = slices.sortBy(_.getAs[Long]("doc_tok_start"))
      val n = id % 11 + 1
      assert(sorted.head.getAs[Long]("doc_tok_start") == 0L)
      assert(sorted.map(_.getAs[Long]("n_tokens")).sum == n, s"doc $id")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("doc_tok_start") + a.getAs[Long]("n_tokens") ==
            b.getAs[Long]("doc_tok_start"))
        case _ =>
      }
    }
    // every (stream, seq) holds exactly `capacity` tokens except each
    // stream's final partial sequence
    val byStreamTotals = rs.groupBy(_.getAs[Long]("stream"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    for ((stream, seqs) <- rs.groupBy(_.getAs[Long]("stream"))
           .view.mapValues(_.groupBy(_.getAs[Long]("seq_idx"))).toMap) {
      val lastSeq = seqs.keys.max
      for ((seq, slices) <- seqs) {
        val tok = slices.map(_.getAs[Long]("n_tokens")).sum
        if (seq < lastSeq) assert(tok == 16L, s"stream $stream seq $seq has $tok")
        else assert(tok == ((byStreamTotals(stream) - 1) % 16) + 1)
      }
    }
    // stable under repartitioning
    val again = Corpus.packSequences(rows.repartition(9), "doc_id", "text", 16, 4, "pack")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("stream"),
        r.getAs[Long]("seq_idx"), r.getAs[Long]("doc_tok_start"),
        r.getAs[Long]("n_tokens"))).sorted.toSeq
    assert(again == rs.map(r => (r.getLong(0), r.getAs[Long]("stream"),
      r.getAs[Long]("seq_idx"), r.getAs[Long]("doc_tok_start"),
      r.getAs[Long]("n_tokens"))).sorted.toSeq)
  }

  test("bpe: Sennrich merges in order, deterministic ties, segmenter replay") {
    import graft.operators.Bpe
    val corpus = Seq((0L,
      Seq.fill(5)("low").mkString(" ") + " " +
        Seq.fill(2)("lower").mkString(" ") + " " +
        Seq.fill(6)("newest").mkString(" ") + " " +
        Seq.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    // pair counts of the initial character vocabulary
    val pc = Bpe.bpePairCounts(corpus, "text").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("cnt"))).toMap
    assert(pc(("e", "s")) == 9L && pc(("s", "t")) == 9L && pc(("t", "</w>")) == 9L)
    // (w,e): 2 from "lower" + 6 from "newest" (n-e-w-e-s-t has two e's)
    assert(pc(("l", "o")) == 7L && pc(("w", "e")) == 8L && pc(("e", "w")) == 6L)
    // training: count ties break on (left, right) — e<s<t, then es<t, ...
    val merges = Bpe.bpeTrain(corpus, "text", numMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("sym_left"), r.getAs[String]("sym_right")))
    assert(merges.toSeq == Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    // early stop: minPairCount above every count yields no merges
    assert(Bpe.bpeTrain(corpus, "text", 4, minPairCount = 100L).count() == 0L)
    // segmenter replays merges in rank order on unseen words
    val seg = Bpe.bpeSegment(Seq((1L, "lowest")).toDF("doc_id", "text"),
      "text", merges.toSeq).select("bpe_tokens").head.getSeq[String](0)
    assert(seg == Seq("lo", "w", "est</w>"), seg)
    // segmenting a training word reproduces its merged symbols
    val seg2 = Bpe.bpeSegment(Seq((2L, "newest")).toDF("doc_id", "text"),
      "text", merges.toSeq).select("bpe_tokens").head.getSeq[String](0)
    assert(seg2 == Seq("n", "e", "w", "est</w>"), seg2)
  }

  test("bpe: many-merge train stays inside a per-merge job budget (delta fold)") {
    import graft.operators.Bpe
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // 120 distinct 4-char words over a 12-letter alphabet with distinct
    // frequencies -> hundreds of distinct fusable pairs, no early stop
    val alphabet = "abcdefghijkl"
    val words = (0 until 120).map { i =>
      val w = new StringBuilder
      var x = i
      for (_ <- 0 until 4) { w += alphabet(x % 12); x = x / 12 + 3 }
      w.toString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i % 7 + 1)(w) }.mkString(" ")
    val corpus = Seq((0L, text)).toDF("doc_id", "text")

    // distinct root SQL execution ids in the training job group = driver
    // actions the loop issued (AQE stage-jobs inflate raw job counts by a
    // Spark-version-dependent constant; actions are the design quantity)
    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.properties != null && Bpe.TrainJobGroup ==
            js.properties.getProperty("spark.jobGroup.id")) {
          Option(js.properties.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(js.properties.getProperty("spark.sql.execution.id")))
            .foreach(execs.add)
        }
    }
    val n = 60
    spark.sparkContext.addSparkListener(listener)
    try {
      // localVocabCap = 0 forces the distributed delta path (the over-cap
      // fallback) — the driver-local path is budgeted separately below
      val merges = Bpe.bpeTrain(corpus, "text", numMerges = n,
        localVocabCap = 0L).collect()
      assert(merges.length == n, s"early-stopped at ${merges.length} merges")
      // merged symbols are real fusions of the alphabet (sanity)
      assert(merges.forall(r => (r.getAs[String]("sym_left") +
        r.getAs[String]("sym_right")).length >= 2))
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      val e = execs.size()
      info(s"$e driver actions for $n merges")
      // one argmax action per merge + two checkpoint actions every 8
      // merges; a second collect per merge (the old 2-full-jobs shape) or
      // a per-merge checkpoint would blow this budget
      assert(e <= n + 2 * (n / 8) + 4,
        s"$e driver actions for $n merges — per-merge action budget blown")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bpe: driver-local and distributed merge loops produce identical tables") {
    import graft.operators.Bpe
    val alphabet = "abcdefghijkl"
    val words = (0 until 120).map { i =>
      val w = new StringBuilder
      var x = i
      for (_ <- 0 until 4) { w += alphabet(x % 12); x = x / 12 + 3 }
      w.toString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i % 7 + 1)(w) }.mkString(" ")
    val corpus = Seq((0L, text)).toDF("doc_id", "text")
    val n = 40
    def table(cap: Long) = Bpe.bpeTrain(corpus, "text", numMerges = n,
        localVocabCap = cap)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getAs[Long]("cnt")))
      .toSeq
    val local = table(Long.MaxValue)
    val dist = table(0L)
    assert(local == dist, s"paths diverged:\nlocal $local\ndist  $dist")
  }

  test("bpe: supplementary characters (non-BMP) keep local == distributed") {
    import graft.operators.Bpe
    // words over non-BMP code points (emoji + supplementary CJK): a
    // UTF-16-char split would produce lone-surrogate symbols on the local
    // path and diverge from the distributed regex split's code-point units
    val cps = Seq("😀", "🚀", "🤖", // 😀 🚀 🤖
      "𠀀", "𠐁", "a", "b")                    // 𠀀 𠐁
    val words = (0 until 80).map { i =>
      Seq(cps(i % 7), cps((i / 7 + 2) % 7), cps((i / 3 + 4) % 7)).mkString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i % 5 + 1)(w) }.mkString(" ")
    val corpus = Seq((0L, text)).toDF("doc_id", "text")
    def table(cap: Long) = Bpe.bpeTrain(corpus, "text", numMerges = 12,
        localVocabCap = cap)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getAs[Long]("cnt")))
      .toSeq
    val local = table(Long.MaxValue)
    val dist = table(0L)
    assert(local == dist, s"non-BMP paths diverged:\nlocal $local\ndist  $dist")
    // every merged symbol is made of whole code points — no lone surrogates
    local.foreach { case (_, l, r, _) =>
      val s = l + r
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c))
          assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
            s"lone high surrogate in merged symbol ${s.toList}")
        else assert(!Character.isLowSurrogate(c) ||
          (i > 0 && Character.isHighSurrogate(s.charAt(i - 1))),
          s"lone low surrogate in merged symbol ${s.toList}")
        i += 1
      }
    }
  }

  test("bpe: 1k-merge driver-local train inside a 2-action budget") {
    import graft.operators.Bpe
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // rich synthetic vocabulary: 3000 distinct 6-char words over 20 letters
    // with skewed frequencies -> thousands of fusable pairs, no early stop
    val alphabet = "abcdefghijklmnopqrst"
    val words = (0 until 3000).map { i =>
      val w = new StringBuilder
      var x = i * 2654435761L
      for (_ <- 0 until 6) { w += alphabet(((x % 20) + 20).toInt % 20); x = x / 7 + i }
      w.toString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i % 11 + 1)(w) }.mkString(" ")
    val corpus = Seq((0L, text)).toDF("doc_id", "text")
    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.properties != null && Bpe.TrainJobGroup ==
            js.properties.getProperty("spark.jobGroup.id")) {
          Option(js.properties.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(js.properties.getProperty("spark.sql.execution.id")))
            .foreach(execs.add)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val merges = Bpe.bpeTrain(corpus, "text", numMerges = 1000).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(merges.length == 1000, s"early-stopped at ${merges.length} merges")
      // merge ranks are a valid 1..1000 application order with positive counts
      assert(merges.map(_.getInt(0)).sorted.toSeq == (1 to 1000),
        "merge ranks not contiguous")
      assert(merges.forall(_.getAs[Long]("cnt") > 0L))
      org.apache.spark.sql.graft.bridge.waitForListeners(spark)
      // the industrial contract: merge COUNT costs zero Spark actions —
      // only the collapse materialization + the vocab collect hit the
      // cluster, regardless of numMerges
      val e = execs.size()
      info(f"$e driver actions, $secs%.1f s for 1000 merges")
      assert(e <= 3, s"$e driver actions for a driver-local train (budget 3)")
      assert(secs < 60.0, f"driver-local 1k-merge train took $secs%.1f s")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("semantic dedup: exact vector copies collapse, null vectors survive") {
    import graft.operators.Similarity
    // ±1 hypercube corners: distinct ids differ in >=1 of 8 bits, so
    // cosine <= 0.75 — far below threshold; only exact copies collapse
    val base = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(d => (((i >> d) & 1) * 2 - 1).toFloat))
    }
    val copies = base.take(5).map { case (id, v) => (id + 1000L, v) }
    val rows = (base ++ copies :+ ((2000L, null.asInstanceOf[Array[Float]])))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(rows, "vec_id", "embedding",
      threshold = 0.99).collect().map(_.getLong(0)).toSet
    // each copy pairs with its original at cosine 1.0; the smaller id wins
    assert((0L until 5L).forall(kept.contains))
    assert((1000L until 1005L).forall(id => !kept.contains(id)), kept.toSeq.sorted)
    // null embedding never pairs, always survives
    assert(kept.contains(2000L))
    // distinct non-duplicate vectors survive
    assert((5L until 30L).forall(kept.contains))
  }

  test("keyword stats: tf/df scoring, ties on token, top-k bound") {
    import graft.operators.Corpus
    val docs = Seq(
      (0L, "apple apple banana cherry"),
      (1L, "banana cherry cherry"),
      (2L, "apple durian"),
    ).toDF("doc_id", "text")
    // df: apple=2 banana=2 cherry=2 durian=1
    val out = Corpus.keywordStats(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    assert(out.length == 6)
    // doc 0: apple tf2/df2=1.0 > banana 0.5 = cherry 0.5 (banana wins tie)
    assert(out(0).getAs[String]("token") == "apple" &&
      out(0).getAs[Double]("score") == 1.0)
    assert(out(1).getAs[String]("token") == "banana")
    // doc 2: durian tf1/df1=1.0, apple tf1/df2=0.5 -> durian first
    assert(out(4).getAs[String]("token") == "durian" &&
      out(4).getAs[Long]("rank") == 1L)
    // k caps per doc even when more tokens exist
    assert(Corpus.keywordStats(docs, "doc_id", "text", k = 1).count() == 3L)
  }

  test("top ngrams: global counts, deterministic ties, heap plan") {
    import graft.operators.Corpus
    val docs = Seq(
      (0L, "a b c a b"), (1L, "a b x y"), (2L, "c a b"),
    ).toDF("doc_id", "text")
    val out = Corpus.topNgrams(docs, "text", n = 2, k = 3).collect()
    // "a b" x3 ("a b c a b" has it twice... positions: a-b, b-c, c-a, a-b -> 2) + doc1 + doc2 = 4
    assert(out(0).getAs[String]("ngram") == "a b" && out(0).getAs[Long]("cnt") == 4L)
    // "c a" x2 (docs 0, 2); "b c" x1, "b x" x1, "x y" x1 -> tie on 1 broken
    assert(out(1).getAs[String]("ngram") == "c a" && out(1).getAs[Long]("cnt") == 2L)
    assert(out(2).getAs[String]("ngram") == "b c" && out(2).getAs[Long]("cnt") == 1L)
    // plan: TakeOrderedAndProject, not a global sort-exchange
    val plan = Corpus.topNgrams(docs, "text", 2, 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // compiled kernel == expression twin on a messy corpus (casing,
    // repeated whitespace, short docs, nulls)
    val messy = Seq((0L, "A  b C a b"), (1L, " x "), (2L, null.asInstanceOf[String]),
      (3L, "a b c a b"), (4L, "")).toDF("doc_id", "text")
    val kOut = Corpus.topNgrams(messy, "text", 2, 10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val eOut = Corpus.topNgramsExprTwin(messy, "text", 2, 10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(kOut == eOut, s"$kOut vs $eOut")
  }

  test("token drift: symmetric zero on identical corpora, shifted token flagged") {
    import graft.operators.Corpus
    val a = Seq((0L, "x x x y z"), (1L, "x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x x x y z"), (3L, "x y")).toDF("doc_id", "text")
    val same = Corpus.tokenDriftStats(a, b, "text").collect()
    assert(same.forall(_.getAs[Double]("drift") == 0.0))
    // corpus c drops z entirely and floods w
    val c = Seq((4L, "w w w w x y")).toDF("doc_id", "text")
    val drift = Corpus.tokenDriftStats(a, c, "text")
      .orderBy(col("drift").desc).collect()
    val top = drift.head
    assert(top.getAs[String]("token") == "w")
    assert(top.getAs[Long]("count_a") == 0L && top.getAs[Long]("count_b") == 4L)
    // (0 - 4/6)^2 / (4/6) = 4/6
    assert(math.abs(top.getAs[Double]("drift") - 4.0 / 6.0) < 1e-15)
    // minCount filters the long tail
    assert(Corpus.tokenDriftStats(a, c, "text", minCount = 4L)
      .collect().map(_.getAs[String]("token")).toSet == Set("x", "w"))
    // empty corpus is an explicit error, not NaN soup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Corpus.tokenDriftStats(a, empty, "text") }
  }

  test("bigram LM score: counts, smoothing, unseen transitions") {
    import graft.operators.Corpus
    val train = Seq(
      (0L, "the cat sat"), (1L, "the cat ran"), (2L, "the dog sat"),
    ).toDF("doc_id", "text")
    // vocab = {the, cat, sat, ran, dog} = 5
    // bigrams: (the,cat)x2 (cat,sat)x1 (cat,ran)x1 (the,dog)x1 (dog,sat)x1
    // prefix:  the=3, cat=2, dog=1
    val scoreDf = Seq(
      (10L, "the cat sat"),   // p=(2+1)/(3+5), (1+1)/(2+5)
      (11L, "cat the"),       // unseen: (0+1)/(2+5)
      (12L, "zebra"),         // < 2 tokens -> null score
    ).toDF("doc_id", "text")
    val out = Corpus.bigramLmScore(train, scoreDf, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_bigrams") == 2L)
    assert(out(0).getAs[Long]("n_unseen") == 0L)
    assert(math.abs(out(0).getAs[Double]("mean_prob") - (3.0 / 8 + 2.0 / 7) / 2) < 1e-15)
    assert(out(1).getAs[Long]("n_unseen") == 1L)
    assert(math.abs(out(1).getAs[Double]("mean_prob") - 1.0 / 7) < 1e-15)
    assert(out(2).getAs[Long]("n_bigrams") == 0L && out(2).isNullAt(3))
    // self-scored corpus: no unseen transitions, probs in (0, 1]
    val self = Corpus.bigramLmScore(train, train, "doc_id", "text").collect()
    assert(self.forall(_.getAs[Long]("n_unseen") == 0L))
    assert(self.forall { r =>
      val p = r.getAs[Double]("mean_prob"); p > 0.0 && p <= 1.0
    })
  }

  test("GraftExtensions SQL surface: ewm and top_k_by_score match the Column API") {
    import graft.plans.{EwmExpr, GraftExtensions, TopKExpr}
    GraftExtensions.registerAll(spark)
    val df = Seq(
      (1L, 1, 1.0), (1L, 2, Double.NaN), (1L, 3, 4.0), (1L, 4, 2.0),
      (2L, 1, 10.0), (2L, 2, 20.0),
    ).toDF("id", "ds", "y")
    df.createOrReplaceTempView("ext_panel")
    val sqlEwm = spark.sql(
      """SELECT id, ds, ewm(y, 0.5) OVER (PARTITION BY id ORDER BY ds) AS e
        |FROM ext_panel""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val colEwm = df.select(col("id"), col("ds"),
        EwmExpr.ewm(col("y"), 0.5, Seq(col("id")), col("ds")).as("e"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(sqlEwm == colEwm && sqlEwm((1L, 4)) == 0.5 * 2.0 + 0.5 * (0.5 * 4.0 + 0.5 * 1.0))
    val sqlTop = spark.sql(
      "SELECT id, top_k_by_score(y, ds, 2) AS t FROM ext_panel GROUP BY id")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getDouble(0), s.getLong(1)))).toMap
    val colTop = df.groupBy(col("id"))
      .agg(TopKExpr.topKByScore(col("y"), col("ds"), 2).as("t"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getDouble(0), s.getLong(1)))).toMap
    // the NaN row is skipped (it would corrupt the heap comparator), so
    // id 1's top-2 is the two real scores
    assert(sqlTop == colTop && sqlTop(1L) == Seq((4.0, 3L), (2.0, 4L)))
    // misuse fails loudly, not silently
    intercept[Exception](spark.sql("SELECT ewm(y, 1.5) OVER () FROM ext_panel").collect())
    // non-integral k is rejected, never Number-truncated to a smaller k
    intercept[Exception](spark.sql(
      "SELECT top_k_by_score(y, ds, 2.9E0) FROM ext_panel GROUP BY id").collect())
    // the Column API enforces the same alpha domain as the SQL surface
    intercept[IllegalArgumentException](
      EwmExpr.ewm(col("y"), 1.5, Seq(col("id")), col("ds")))
    intercept[IllegalArgumentException](
      graft.functions.ExponentiallyWeightedMean(alpha = 0.0))
  }

  test("top-k buffer grows across the lazy-capacity boundary") {
    import graft.plans.TopKBuffer
    val b = new TopKBuffer(1000) // capacity starts at 16, not k
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(100)((rnd.nextDouble(), rnd.nextLong()))
    pairs.foreach { case (s, i) => b.insert(s, i) }
    assert(b.size == 100)
    assert(b.sortedDesc.toSeq == pairs.sortBy { case (s, i) => (-s, i) })
  }

  test("kmeans clustering + cluster-balanced sample: caps, determinism, bad rows") {
    // two tight blobs far apart + one corrupt row + one null row
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i.toLong, Seq(base + i * 0.01, base - i * 0.01))
    }
    val df = (rows.map { case (id, v) => (id, v.map(_.floatValue)) } ++
      Seq((98L, Seq(1.0f)), (99L, null))).toDF("vec_id", "embedding")
    val assigned = Similarity.kmeansAssign(df, "embedding", "vec_id",
      k = 2, iters = 3, samplePermille = 1000)
    val byId = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // bad rows observable, never a valid cluster
    assert(byId(98L) == -1 && byId(99L) == -1)
    // the two blobs separate and are internally pure
    val evens = (0 until 20 by 2).map(i => byId(i.toLong)).distinct
    val odds = (1 until 20 by 2).map(i => byId(i.toLong)).distinct
    assert(evens.length == 1 && odds.length == 1 && evens != odds)
    // balanced sample: per-cluster cap, 1-based contiguous picks, no -1
    val samp = Similarity.clusterBalancedSample(df, "embedding", "vec_id",
      k = 2, perCluster = 3, iters = 3, samplePermille = 1000).collect()
    assert(samp.length == 6)
    samp.groupBy(_.getInt(0)).foreach { case (c, g) =>
      assert(c >= 0 && g.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
    }
    // deterministic under repartitioning
    val again = Similarity.clusterBalancedSample(df.repartition(7), "embedding",
      "vec_id", k = 2, perCluster = 3, iters = 3, samplePermille = 1000).collect()
    assert(samp.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq ==
      again.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq)
  }

  test("product quantization: deterministic build, ADC recall, exact rerank") {
    // 4 well-separated prototypes in 8 dims, ids interleaved so the
    // deterministic first-k init sees one row from each prototype
    val protos = Seq(
      Seq(10.0, 10, 10, 10, -10, -10, -10, -10),
      Seq(-10.0, -10, -10, -10, 10, 10, 10, 10),
      Seq(10.0, -10, 10, -10, 10, -10, 10, -10),
      Seq(-10.0, 10, -10, 10, -10, 10, -10, 10))
    val rows = for (p <- protos.indices; i <- 0 until 10) yield
      ((i * protos.length + p).toLong,
        protos(p).zipWithIndex.map { case (v, j) => (v + 0.01 * i + 0.001 * j).toFloat })
    val df = (rows ++ Seq((98L, Seq(1.0f)), (99L, null)))
      .toDF("vec_id", "embedding")
    val (books, encoded) = Similarity.pqBuild(df, "embedding", "vec_id",
      m = 2, ksub = 4, iters = 2, samplePermille = 1000)
    assert(books.length == 2 && books.forall(b => b.length == 4 && b.forall(_.length == 4)))
    // corrupt/null vectors encode null and never rank
    val codes = encoded.select("vec_id", "__codes").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Int](1).toSeq)).toMap
    assert(codes(98L) == null && codes(99L) == null)
    // all members of one prototype share the same code word
    assert((0 until 10).map(i => codes((i * 4).toLong)).distinct.length == 1)
    // ADC top-10 for a query at prototype 0 = exactly that blob
    val q = protos(0).map(_ + 0.005)
    val top = Similarity.pqTopK(encoded, books, q, 10, "vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(top == (0 until 10).map(i => (i * 4).toLong).toSet)
    // exact re-rank: a corpus vector queried against itself comes back first
    val q5 = rows.find(_._1 == 5L).get._2.map(_.toDouble)
    val rr = Similarity.pqTopKRerank(encoded, books, "embedding", q5, 3,
      "vec_id", rerank = 12).collect()
    assert(rr.head.getLong(0) == 5L)
    assert(math.abs(rr.head.getDouble(1) - 1.0) < 1e-9)
    // bit-identical build under repartitioning (hash sample + exact sums)
    val (books2, _) = Similarity.pqBuild(df.repartition(5), "embedding", "vec_id",
      m = 2, ksub = 4, iters = 2, samplePermille = 1000)
    assert(books == books2)
    // IVF-PQ == PQ restricted to the probed coarse lists
    val (cents, ibooks, indexed) = Similarity.ivfPqBuild(df, "embedding",
      "vec_id", nLists = 4, m = 2, ksub = 4, iters = 2, samplePermille = 1000)
    val ivfpq = Similarity.ivfPqTopK(indexed, cents, ibooks, q, 5, "vec_id",
      nProbe = 1).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qq = q.map(x => math.floor(x * 1048576.0))
    val probed = cents.zipWithIndex.minBy { case (c, _) =>
      c.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum }._2
    val manual = Similarity.pqTopK(indexed.filter(col("__list") === probed),
      ibooks, q, 5, "vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfpq == manual && ivfpq.nonEmpty)
    // with well-separated blobs the probed list IS the query's blob
    assert(ivfpq.map(_._1).forall(id => id % 4 == 0))
  }

  test("batched IVF / IVF-PQ joins equal the single-query paths per query") {
    // the recall-gate joins must rank exactly what the oracled per-query
    // searches rank: same probe lists, same cosine/ADC bits, same tie order
    val rnd = new scala.util.Random(3)
    val rows = (0L until 60L).map(i =>
      (i, Seq.tabulate(8)(d => (math.sin(i * 0.37 + d) + rnd.nextGaussian() * 0.05).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 20 === 0) // 3 queries
    val (cents, assigned) = Similarity.ivfBuild(df, "embedding", "vec_id",
      nLists = 4, iters = 2, samplePermille = 1000)
    val joined = Similarity.ivfKnnJoin(assigned, cents, queries,
      "embedding", "vec_id", "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val q = qr.getSeq[Float](1).map(_.toDouble).toSeq
      val single = Similarity.ivfTopK(assigned, cents, "embedding", q, 3,
        "vec_id", nProbe = 2).collect()
      single.zipWithIndex.foreach { case (r, i) =>
        assert(joined((qid, i + 1L)) == ((r.getLong(0), r.getDouble(1))),
          s"ivf join/single drift at query $qid rank ${i + 1}")
      }
    }
    val (icents, books, indexed) = Similarity.ivfPqBuild(df, "embedding",
      "vec_id", nLists = 4, m = 2, ksub = 4, iters = 2, samplePermille = 1000)
    val pjoined = Similarity.ivfPqKnnJoin(indexed, icents, books, queries,
      "vec_id", "embedding", k = 3, "vec_id", nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val q = qr.getSeq[Float](1).map(_.toDouble).toSeq
      val single = Similarity.ivfPqTopK(indexed, icents, books, q, 3,
        "vec_id", nProbe = 2).collect()
      single.zipWithIndex.foreach { case (r, i) =>
        assert(pjoined((qid, i + 1L)) == ((r.getLong(0), r.getDouble(1))),
          s"ivfpq join/single drift at query $qid rank ${i + 1}")
      }
    }
  }

  test("label-centroid scores: typical members near 1, off-class low, bad rows null") {
    val rows: Seq[(Long, Seq[Float], java.lang.Integer)] =
      (0 until 5).map(i => (i.toLong, Seq(10.0f, 0.1f * i), Int.box(0))) ++
        (5 until 10).map(i => (i.toLong, Seq(0.1f * i, 10.0f), Int.box(1))) ++
        Seq((20L, Seq(0.1f, 9.0f), Int.box(0)),   // mislabeled into class 0
          (21L, Seq(1.0f), Int.box(0)),            // ragged
          (22L, null, Int.box(1)),                 // null vector
          (23L, Seq(10.0f, 0.0f), null))           // null label
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidScores(df, "embedding", "vec_id", "label")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    // typical members score near 1 (label 0's centroid is dragged a bit by
    // the planted mislabeled row, hence the looser bound there)
    assert(out(0) > 0.95 && out(5) > 0.99)
    assert(out(20) < 0.35)                 // mislabeled row scores low
    assert(out(21) == null && out(22) == null && out(23) == null)
  }

  test("edit-distance pairs: suffix mutations caught, distance exact") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 30)
    val copies = base.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000)
      .withColumn("text", concat(col("text"), lit(" xy")))
    val pairs = Dedup.editDistancePairs(base.unionByName(copies), "doc_id",
      "text", maxDist = 5, portable = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every mutated copy pairs with its original at exactly 3 edits
    val expected = (0 until 10).map(i => (i.toLong, (i + 1000).toLong, 3))
    assert(expected.forall(pairs.contains), s"missing pairs in ${pairs.toSeq}")
    // nothing within maxDist among distinct originals
    assert(pairs.forall { case (a, b, _) => b == a + 1000 })
  }

  test("bloom decontamination screen == exact operator, at tight fpp too") {
    import graft.operators.Corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).sortBy(_._1).toSeq
    val exact = key(Corpus.benchmarkContamination(train, bench, "doc_id", "text", 3))
    // a LOOSE filter (high fpp) floods phase 1 with false positives — the
    // exact verify must still kill every one of them
    val loose = key(Corpus.benchmarkContaminationBloom(train, bench,
      "doc_id", "text", 3, fpp = 0.5))
    val tight = key(Corpus.benchmarkContaminationBloom(train, bench,
      "doc_id", "text", 3, expectedItems = 100000L, fpp = 0.001))
    assert(loose == exact)
    assert(tight == exact)
    assert(exact.exists(_._3 > 0)) // fixture really has contamination
  }

  test("temperature mixture: sqrt flattening, exact budgets, null domains out") {
    import graft.operators.Corpus
    val docs = Seq(
      (0L, "big", "a b c d e f g h i"),  // 9 tokens
      (1L, "big", "a b c d e f g"),      // 7 -> big: 16
      (2L, "small", "x y z w"),          // small: 4
      (3L, null.asInstanceOf[String], "ignored tokens here"),
    ).toDF("doc_id", "source", "text")
    val out = Corpus.temperatureMixBudgets(docs, "text", "source", 1200L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out.keySet == Set("big", "small")) // null domain excluded
    assert(out("big")._1 == 16L && out("small")._1 == 4L)
    // weights 4 and 2 -> budgets 1200*4/6 = 800, 1200*2/6 = 400: raw
    // token share would be 960/240 — sqrt flattens toward the small domain
    assert(out("big")._2 == 4.0 && out("small")._2 == 2.0)
    assert(out("big")._3 == 800L && out("small")._3 == 400L)
    // the budgets compose with sampleToTokenBudget
    val budgets = out.map { case (d, (_, _, b)) => d -> b }
    val kept = Corpus.sampleToTokenBudget(docs.filter(col("source").isNotNull),
      "doc_id", "text", "source", budgets, "mix")
    assert(kept.count() == 3) // everything fits under these budgets
  }

  test("naive bayes quality classifier: separation, smoothing, oov, prior") {
    import graft.operators.Corpus
    val pos = Seq(
      (1L, "good clean prose text"), (2L, "clean text reads well"),
    ).toDF("doc_id", "text") // 8 tokens, 6 types
    val neg = Seq(
      (11L, "spam junk noise garbage"), (12L, "junk noise spam words"),
    ).toDF("doc_id", "text") // 8 tokens, 5 types -> joint vocab V = 11
    val scoreDf = Seq(
      (21L, "clean prose text"),  // all positive-only evidence
      (22L, "spam junk garbage"), // all negative-only evidence
      (23L, "zzz qqq"),           // fully out-of-vocabulary
      (24L, ""),                  // empty -> prior only
    ).toDF("doc_id", "text")
    val out = Corpus.nbQualityScore(pos, neg, scoreDf, "doc_id", "text")
      .orderBy("doc_id").collect()
    // prior = ln(2/2) = 0
    assert(out(0).getAs[Boolean]("label") &&
      out(0).getAs[Double]("nb_score") > 0)
    // clean: w = ln((2+1)*19 / (1*19)) = ln 3; prose: ln 2; text: ln 3
    assert(math.abs(out(0).getAs[Double]("nb_score") -
      (math.log(3) + math.log(2) + math.log(3))) < 1e-12)
    assert(!out(1).getAs[Boolean]("label") &&
      out(1).getAs[Double]("nb_score") < 0)
    // OOV occurrences score the pure smoothing mass ln(19/19) = 0 here
    assert(out(2).getAs[Long]("n_oov") == 2L &&
      out(2).getAs[Double]("nb_score") == 0.0 &&
      !out(2).getAs[Boolean]("label"))
    // empty doc: n_tokens 0, score = prior = 0, label false (not null)
    assert(out(3).getAs[Long]("n_tokens") == 0L &&
      out(3).getAs[Double]("nb_score") == 0.0 &&
      !out(3).getAs[Boolean]("label"))
    // asymmetric doc prior shifts every score by ln(nPos/nNeg)
    val shifted = Corpus.nbQualityScore(
      pos.unionByName(Seq((3L, "good clean prose text")).toDF("doc_id", "text")),
      neg, scoreDf, "doc_id", "text").orderBy("doc_id").collect()
    assert(shifted(3).getAs[Double]("nb_score") == math.log(3.0 / 2.0))
  }

  test("lexical diversity: exact ratios, empty doc null-safe") {
    import graft.operators.Corpus
    val docs = Seq(
      (0L, "a a a b"),      // n=4 types=2 maxtf=3 sumsq=9+1=10
      (1L, "x y z"),        // n=3 types=3 sumsq=3
      (2L, "  "),           // empty after tokenize
    ).toDF("doc_id", "text")
    val out = Corpus.lexicalDiversityStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") == 4L &&
      out(0).getAs[Long]("n_types") == 2L)
    assert(out(0).getAs[Double]("ttr") == 2.0 / 4.0)
    assert(out(0).getAs[Double]("top_share") == 3.0 / 4.0)
    assert(out(0).getAs[Double]("simpson") == 10.0 / 16.0)
    // uniform doc: simpson = 1/n, ttr = 1, top_share = 1/n
    assert(out(1).getAs[Double]("ttr") == 1.0)
    assert(out(1).getAs[Double]("simpson") == 3.0 / 9.0)
    // empty doc: zero counts, null ratios
    assert(out(2).getAs[Long]("n_tokens") == 0L && out(2).isNullAt(3) &&
      out(2).isNullAt(4) && out(2).isNullAt(5))
  }

  test("bm25: rare term outweighs common, tf saturates, top-k bound") {
    import graft.operators.Corpus
    val docs = Seq(
      (0L, "rare common filler filler"),
      (1L, "common filler filler filler"),
      (2L, "common common common common"),
      (3L, "filler filler filler filler"),
    ).toDF("doc_id", "text")
    val out = Corpus.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), k = 4).collect()
    // doc 0 matches both terms, and "rare" (df=1) carries the highest idf
    assert(out.head.getAs[Long]("doc_id") == 0L &&
      out.head.getAs[Long]("n_matched") == 2L)
    // doc 3 matches nothing and is absent entirely
    assert(!out.map(_.getAs[Long]("doc_id")).contains(3L) && out.length == 3)
    // tf saturation: doc 2 (tf=4 of "common") scores less than 4x doc 1 (tf=1)
    val s1 = out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Double]("score")
    val s2 = out.find(_.getAs[Long]("doc_id") == 2L).get.getAs[Double]("score")
    assert(s2 > s1 && s2 < 4.0 * s1)
    // k caps the output
    assert(Corpus.bm25TopK(docs, "doc_id", "text", Seq("common"), k = 1)
      .count() == 1L)
  }

  test("quantile buckets: tercile labels, null scores stay null, no global window") {
    import graft.operators.Corpus
    // scores 1..9: q(1/3) = 1 + 8/3 = 3.667, q(2/3) = 6.333
    val rows = ((1 to 9).map(i => (i.toLong, Some(i.toDouble))) :+
      (10L, Option.empty[Double])).toDF("id", "s")
    val out = Corpus.quantileBuckets(rows, "s",
      cuts = Seq(1.0 / 3.0, 2.0 / 3.0),
      labels = Seq("tail", "middle", "head"))
      .orderBy("id").collect()
    assert(out.take(3).forall(_.getAs[String]("bucket") == "tail"))
    assert((3 until 6).forall(i => out(i).getAs[String]("bucket") == "middle"))
    assert((6 until 9).forall(i => out(i).getAs[String]("bucket") == "head"))
    assert(out(9).isNullAt(out(9).fieldIndex("bucket")))
    // exact boundary: a score equal to the top cutoff lands in the top bucket
    val exact = Seq((0L, 0.0), (1L, 1.0), (2L, 2.0)).toDF("id", "s")
    val b = Corpus.quantileBuckets(exact, "s", Seq(0.5), Seq("lo", "hi"))
      .orderBy("id").collect()
    assert(b.map(_.getAs[String]("bucket")).toSeq == Seq("lo", "hi", "hi"))
    // the plan must not move the corpus to one partition (no global window)
    val plan = Corpus.quantileBuckets(rows, "s", Seq(0.5), Seq("lo", "hi"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("per-stratum quantile buckets: independent cutoffs, null strata null") {
    import graft.operators.Corpus
    // two languages with disjoint score scales: global terciles would dump
    // all of "lo" into tail; per-stratum buckets each language on its own
    val rows = ((1 to 9).map(i => ("lo", i.toLong, Some(i.toDouble))) ++
      (1 to 9).map(i => ("hi", 100L + i, Some(1000.0 + i))) :+
      (null.asInstanceOf[String], 200L, Some(5.0)) :+
      ("lo", 201L, Option.empty[Double])).toDF("lang", "id", "s")
    val out = Corpus.quantileBucketsBy(rows, Seq("lang"), "s",
      cuts = Seq(1.0 / 3.0, 2.0 / 3.0), labels = Seq("tail", "middle", "head"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    // both languages split 3/3/3 on their own scale
    assert((1 to 3).forall(i => out(i.toLong) == "tail") &&
      (7 to 9).forall(i => out(i.toLong) == "head"))
    assert((101 to 103).forall(i => out(i.toLong) == "tail") &&
      (107 to 109).forall(i => out(i.toLong) == "head"))
    // null stratum and null score rows: null bucket, never a global fallback
    assert(out(200L) == null && out(201L) == null)
  }

  test("approx quantile buckets == exact on rank-separated data, same plan shape") {
    import graft.operators.Corpus
    val rows = ((1 to 300).map(i => (i.toLong, Some(i.toDouble))) :+
      (301L, Option.empty[Double])).toDF("id", "s")
    def buckets(df: org.apache.spark.sql.DataFrame) = df.orderBy("id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("bucket"))) null
         else r.getAs[String]("bucket"))).toSeq
    val exact = buckets(Corpus.quantileBuckets(rows, "s",
      cuts = Seq(1.0 / 3.0, 2.0 / 3.0), labels = Seq("tail", "middle", "head")))
    val approx = buckets(Corpus.quantileBucketsApprox(rows, "s",
      cuts = Seq(1.0 / 3.0, 2.0 / 3.0), labels = Seq("tail", "middle", "head"),
      accuracy = 100000))
    // exact percentile INTERPOLATES cutoffs; approx returns an actual
    // element — so at high accuracy only the boundary elements themselves
    // may shift, each between ADJACENT labels
    val order = Seq("tail", "middle", "head")
    val diffs = exact.zip(approx).filter { case (e, a) => e != a }
    assert(diffs.length <= 2, diffs)
    diffs.foreach { case ((_, e), (_, a)) =>
      assert(math.abs(order.indexOf(e) - order.indexOf(a)) == 1, (e, a))
    }
    // identical scale shape: one aggregate + broadcast, zero Window operators
    val plan = Corpus.quantileBucketsApprox(rows, "s", Seq(0.5), Seq("lo", "hi"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("tokens: native spelling == filter spelling on edge inputs") {
    import graft.functions.TextFunctions
    val rows = Seq("a b c", "  a  b ", "", "   ", "\tx\t", "one",
      "a b", "a  \n b", null.asInstanceOf[String]).toDF("text")
    val both = rows.select(
      TextFunctions.tokens(col("text")).as("fast"),
      TextFunctions.tokensFilterTwin(col("text")).as("ref")).collect()
    for (r <- both) {
      val fast = if (r.isNullAt(0)) null else r.getSeq[String](0).toList
      val ref = if (r.isNullAt(1)) null else r.getSeq[String](1).toList
      assert(fast == ref, r)
    }
    // and the fast spelling contains no interpreted ArrayFilter
    val plan = rows.select(TextFunctions.tokens(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("filter(") && !plan.contains("ArrayFilter"), plan)
  }

  test("winnowing: parity with reference impl, shared-substring guarantee") {
    import graft.operators.Dedup
    // driver-side reference: rightmost argmin of md5-60 gram hashes over
    // every full w-window of the normalized text
    def winnowRef(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val nt = text.toLowerCase.replaceAll("\\s+", " ")
      if (nt.length < k + w - 1) Set.empty
      else {
        val hs = nt.sliding(k).map(Dedup.md560).toArray
        (w - 1 until hs.length).map { t =>
          val lo = t - w + 1
          val m = (lo to t).map(hs).min
          ((lo to t).filter(i => hs(i) == m).max.toLong, m)
        }.toSet
      }
    }
    val texts = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs"),
      (2L, "a shared quick brown fox passage appears here"),
      (3L, "short"),  // shorter than k+w-1: no full window
      (4L, "aaaaaaaaaaaa"), // degenerate: all grams identical
    )
    val out = Dedup.winnowFingerprints(texts.toDF("doc_id", "text"),
      "doc_id", "text", k = 5, w = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("pos"), r.getAs[Long]("fp"))).toSet)
      .toMap
    for ((id, t) <- texts)
      assert(out.getOrElse(id, Set.empty) == winnowRef(t, 5, 4), s"doc $id")
    // compiled kernel == window+join expression twin (the oracle's shape)
    val twin = Dedup.winnowFingerprintsExprTwin(texts.toDF("doc_id", "text"),
      "doc_id", "text", k = 5, w = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("pos"), r.getAs[Long]("fp"))).toSet)
      .toMap
    assert(out == twin)
    // MOSS guarantee: docs 0 and 2 share "quick brown fox" (15 chars
    // >= k + w - 1 = 8) -> at least one common fingerprint hash
    val shared = out(0L).map(_._2) intersect out(2L).map(_._2)
    assert(shared.nonEmpty)
    // disjoint-content docs share nothing
    assert((out(0L).map(_._2) intersect out(1L).map(_._2)).isEmpty)
  }

  test("collocations: lift ranks glued pair above frequent-but-independent") {
    import graft.operators.Corpus
    // "new york" always adjacent (lift high); "the", "end" both frequent but
    // paired only once (lift ~ 1); minCount prunes the singleton pair
    val docs = Seq(
      (0L, "new york new york the end"),
      (1L, "new york the story the end"),
      (2L, "the end of the story"),
    ).toDF("doc_id", "text")
    val out = Corpus.collocationTopK(docs, "text", k = 10, minCount = 2L)
      .collect()
    assert(out.head.getAs[String]("w") == "new" &&
      out.head.getAs[String]("v") == "york" &&
      out.head.getAs[Long]("cnt") == 3L)
    // lift of (new, york): 17 tokens, c=3, cw=3, cv=3 -> 3*17/9
    assert(out.head.getAs[Double]("lift") == 3.0 * 17.0 / (3.0 * 3.0))
    // every returned pair met the floor
    assert(out.forall(_.getAs[Long]("cnt") >= 2L))
    // the plan ends in per-partition heaps, not a global sort
    val plan = Corpus.collocationTopK(docs, "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("duplicate spans: maximal runs, cross-doc and within-doc, kernel parity") {
    val spanDocs = Seq(
      // docs 0 and 1 share the 6-token run "one two three four five six"
      // at different positions; with n=3 the 4 marked grams merge to one span
      (0L, "one two three four five six alpha beta gamma"),
      (1L, "zeta one two three four five six omega"),
      // doc 2 repeats a 3-gram INSIDE itself -> two spans in one doc
      (2L, "x y z pad1 pad2 pad3 pad4 x y z"),
      // doc 3 shares nothing
      (3L, "totally unrelated content with no overlap here at all")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(spanDocs, "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    // doc 0: tokens 1..6; doc 1: tokens 2..7 (four grams each)
    assert(spans.contains((0L, 1L, 6L, 4L)), spans.toString)
    assert(spans.contains((1L, 2L, 7L, 4L)), spans.toString)
    // doc 2: the self-repeat marks grams at positions 1 and 8 only
    assert(spans.contains((2L, 1L, 3L, 1L)) && spans.contains((2L, 8L, 10L, 1L)), spans.toString)
    assert(!spans.exists(_._1 == 3L), spans.toString)

    // the cleaning step: globally-first occurrence survives, later ones cut
    val cleaned = Dedup.removeDuplicateSpans(spanDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(cleaned(0L) == ("one two three four five six alpha beta gamma", 0L))
    assert(cleaned(1L) == ("zeta omega", 6L), cleaned(1L).toString)
    assert(cleaned(2L) == ("x y z pad1 pad2 pad3 pad4", 3L), cleaned(2L).toString)
    assert(cleaned(3L)._2 == 0L)
    // a fully-duplicated doc empties rather than disappearing
    val dup2 = Seq((0L, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val c2 = Dedup.removeDuplicateSpans(dup2, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(c2(0L) == ("a b c d", 0L) && c2(1L) == ("", 4L), c2.toString)

    // compiled kernel == expression twin, including empty/short/null text
    val edge = (Seq((10L, ""), (11L, "a b"), (12L, "  tab\tedge  "))
      ++ Seq((13L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val both = spanDocs.union(edge)
      .select($"doc_id",
        Dedup.spanGramHashesExpr($"text", 3).as("expr"),
        udf((t: String) => Dedup.spanGramHashesJvm(t, 3)).apply($"text").as("jvm"))
      .collect()
    both.foreach { r =>
      val e = Option(r.getSeq[Long](1)).map(_.toSeq)
      val j = Option(r.getSeq[Long](2)).map(_.toSeq)
      // the kernel returns empty for null text, the expression null: both
      // explode to zero gram rows, which is the semantics that matters
      assert(e.getOrElse(Nil) == j.getOrElse(Nil), s"doc ${r.getLong(0)}: $e vs $j")
    }
  }

  test("image dHash: codec-invariant, scale-invariant, near-dup pairs bucketed") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def gray(v: Double): Int = {
      val b = math.max(0, math.min(255, (v * 255).toInt)); (b << 16) | (b << 8) | b
    }
    // horizontal sine pattern: mixed gradient signs -> informative hash
    def patt(x: Int, w: Int): Double = 0.5 + 0.45 * math.sin(2 * math.Pi * x / w)
    def img(w: Int, h: Int, f: (Int, Int) => Double): BufferedImage = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, gray(f(x, y)))
      im
    }
    def png(im: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(im, "png", bos); bos.toByteArray
    }
    def ppm(w: Int, h: Int, f: (Int, Int) => Double): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val px = new Array[Byte](3 * w * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px(3 * (y * w + x) + c) =
          math.max(0, math.min(255, (f(x, y) * 255).toInt)).toByte
      header ++ px
    }
    val base = img(64, 48, (x, _) => patt(x, 64))
    // 2x pixel-doubling: nearest 9x8 sampling lands on identical pixels
    val doubled = img(128, 96, (x, _) => patt(x / 2, 64))
    val transposed = img(64, 48, (_, y) => patt(y, 64)) // constant in x
    val media = Seq(
      (1L, "image", png(base)),
      (2L, "image", png(doubled)),
      (3L, "image", png(transposed)),
      (4L, "image", ppm(64, 48, (x, _) => patt(x, 64))),
      (5L, "image", "not an image".getBytes("UTF-8")),
    ).toDF("asset_id", "media_type", "bytes")
    val hashes = Multimodal.imageDHash(media).collect()
      .map(h => h.asset_id -> h).toMap
    assert(hashes(1).ok && hashes(1).codec == "png")
    assert(hashes(4).ok && hashes(4).codec == "ppm-p6")
    assert(!hashes(5).ok && hashes(5).dhash == 0L)
    // codec-invariant: PPM of the same pixels hashes identically
    assert(hashes(1).dhash == hashes(4).dhash)
    // scale-invariant here by construction (identical sampled pixels)
    assert(hashes(1).dhash == hashes(2).dhash)
    // the transposed pattern is flat in x: far from the base hash
    assert(java.lang.Long.bitCount(hashes(1).dhash ^ hashes(3).dhash) > 6)
    val pairs = Multimodal.imageNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) &&
      pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("audio fingerprint: gain-invariant, envelope-sensitive, bucketed pairs") {
    import java.nio.{ByteBuffer, ByteOrder}
    val rate = 8000; val n = 7200
    def wav(amp: Int => Double): Array[Byte] = {
      val buf = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes); buf.putInt(36 + 2 * n); buf.put("WAVE".getBytes)
      buf.put("fmt ".getBytes); buf.putInt(16)
      buf.putShort(1); buf.putShort(1); buf.putInt(rate)
      buf.putInt(rate * 2); buf.putShort(2); buf.putShort(16)
      buf.put("data".getBytes); buf.putInt(2 * n)
      for (i <- 0 until n)
        buf.putShort((amp(i) * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)
      buf.array()
    }
    // stepped envelope drives the time-delta bits
    def env(i: Int): Double = 0.2 + 0.15 * ((i * 7 / n) % 3)
    val base = wav(env)
    val quieter = wav(i => 0.6 * env(i))
    val reversed = wav(i => 0.2 + 0.15 * (2 - (i * 7 / n) % 3))
    val media = Seq(
      (1L, "audio", base),
      (2L, "audio", quieter),
      (3L, "audio", reversed),
      (4L, "audio", "not audio at all".getBytes("UTF-8")),
    ).toDF("asset_id", "media_type", "bytes")
    val hs = Multimodal.audioFingerprint(media).collect()
      .map(h => h.asset_id -> h).toMap
    assert(hs(1).ok && hs(1).duration_ms.contains(900L))
    assert(!hs(4).ok)
    // uniform gain preserves every energy-delta sign exactly
    assert(hs(1).ahash == hs(2).ahash)
    // a reversed envelope flips the time-delta signs
    assert(java.lang.Long.bitCount(hs(1).ahash ^ hs(3).ahash) > 6)
    val pairs = Multimodal.audioNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("paragraph dedup: globally-first survives, structure preserved") {
    val docs = Seq(
      (0L, "unique opening here\nShared boilerplate header.\n\nbody of doc zero"),
      (1L, "Shared boilerplate header.\nbody of doc one"),
      (2L, "repeat me\nrepeat me\nother content"),
      // whitespace-variant matches the trimmed key but keeps doc 0's raw form
      (3L, "  Shared boilerplate header.  "),
      (4L, ""),
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 0 owns the first occurrence of the header; empty line preserved
    assert(out(0).getAs[String]("text") ==
      "unique opening here\nShared boilerplate header.\n\nbody of doc zero")
    assert(out(0).getAs[Int]("n_paragraphs_removed") == 0)
    // doc 1 loses its copy of the header
    assert(out(1).getAs[String]("text") == "body of doc one")
    assert(out(1).getAs[Int]("n_paragraphs_removed") == 1)
    // within-doc repeat: only the first stays
    assert(out(2).getAs[String]("text") == "repeat me\nother content")
    // doc 3's whitespace-variant of the header is cut entirely
    assert(out(3).getAs[String]("text") == "")
    assert(out(3).getAs[Int]("n_paragraphs") == 1)
    assert(out(3).getAs[Int]("n_paragraphs_removed") == 1)
    // empty doc: one empty paragraph, kept
    assert(out(4).getAs[String]("text") == "")
    assert(out(4).getAs[Int]("n_paragraphs") == 1)
    assert(out(4).getAs[Int]("n_paragraphs_removed") == 0)
  }

  test("c4 clean: line retention rules and page-drop precedence") {
    import graft.operators.Corpus
    val docs = Seq(
      (0L, "This is a good sentence.\nshort one.\nNo terminal punctuation here\n" +
        "Another proper sentence stands here.\nA third complete sentence is here.\n" +
        "Fourth sentence right here is fine.\nFifth full sentence completes the page."),
      (1L, "Please enable javascript to view.\n..."),
      (2L, "function f() { return 1; }\nA good sentence sits here."),
      (3L, "Lorem Ipsum dolor sit amet today.\nMore regular text follows after."),
      (4L, "Only two sentences are here today.\nThe second sentence is also fine."),
      (5L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val out = Corpus.c4Clean(docs, "doc_id", "text").orderBy("doc_id").collect()
    // doc 0: 7 lines; "short one." (<3 words) and the unpunctuated line
    // drop; 5 sentences survive -> page kept
    assert(out(0).getAs[Boolean]("kept"))
    assert(out(0).getAs[Int]("n_lines") == 7)
    assert(out(0).getAs[Int]("n_lines_kept") == 5)
    assert(out(0).getAs[Int]("n_sentences") == 5)
    assert(out(0).isNullAt(out(0).fieldIndex("drop_reason")))
    assert(!out(0).getAs[String]("text_clean").contains("short one"))
    // doc 1: javascript line + sub-3-word line -> nothing kept
    assert(!out(1).getAs[Boolean]("kept"))
    assert(out(1).getAs[Int]("n_lines_kept") == 0)
    assert(out(1).getAs[String]("drop_reason") == "too_few_sentences")
    // doc 2: brace on a DROPPED line still marks the page as code
    assert(out(2).getAs[String]("drop_reason") == "brace")
    // doc 3: blocked phrase outranks the sentence-count reason
    assert(out(3).getAs[String]("drop_reason") == "blocked_phrase")
    // doc 4: clean lines but only 2 sentences
    assert(out(4).getAs[Int]("n_lines_kept") == 2)
    assert(out(4).getAs[String]("drop_reason") == "too_few_sentences")
    // doc 5: null text behaves as empty
    assert(out(5).getAs[String]("text_clean") == "")
    assert(out(5).getAs[String]("drop_reason") == "too_few_sentences")
  }

  test("dsir sample: target-like docs outweigh off-target, deterministic, k bound") {
    import graft.operators.Corpus
    // two sharply-distinct vocabularies: "science" docs vs "spam" docs
    val sci = (0L until 20L).map(i =>
      (i, s"quantum field theory lattice boson fermion study $i"))
    val spam = (20L until 40L).map(i =>
      (i, s"buy cheap pills now click here winner prize $i"))
    val raw = (sci ++ spam).toDF("doc_id", "text")
    val targetDf = sci.take(10).toDF("doc_id", "text")
    val out = Corpus.dsirSample(raw, targetDf, "doc_id", "text",
      k = 10, buckets = 256)
    val rows = out.orderBy("rank").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    // log-weights must separate the populations: every science doc scores
    // above every spam doc, so the selection is all-science
    assert(rows.forall(_.getAs[Long]("doc_id") < 20L))
    // deterministic under repartition (seeded hash noise, ordered folds)
    val again = Corpus.dsirSample(raw.repartition(7), targetDf, "doc_id",
      "text", k = 10, buckets = 256).orderBy("rank").collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getInt(0), r.getLong(1))).toSeq)
    // empty / null text docs get weight 0.0 and stay selectable
    val degenerate = Seq((100L, ""), (101L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val degOut = Corpus.dsirSample(degenerate, targetDf, "doc_id", "text",
      k = 2, buckets = 64).collect()
    assert(degOut.length == 2)
    assert(degOut.forall(_.getAs[Double]("log_weight") == 0.0))
  }

  test("bm25 join: per-query parity with the single-query bm25TopK") {
    import graft.operators.Corpus
    val corpus = Seq(
      (0L, "spark window aggregation engines run fast queries"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark spark spark window window customer"),
      (3L, "customer orders join the lineitem table by key"),
      (4L, "window functions rank rows within a partition"),
      (5L, "totally unrelated text about gardens and flowers"),
    ).toDF("doc_id", "text")
    val queries = Seq(
      (10L, Seq("spark", "window")),
      (11L, Seq("customer", "orders")),
      (12L, Seq("Fox", "DOG", "fox")), // casing + dup: normalized like bm25TopK
      (13L, Seq("zzz_nomatch")),       // matches nothing -> no rows
    ).toDF("qid", "terms")
    val joined = Corpus.bm25Join(corpus, "doc_id", "text",
      queries, "qid", "terms", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(!joined.exists(_._1 == 13L))
    Seq(10L -> Seq("spark", "window"), 11L -> Seq("customer", "orders"),
        12L -> Seq("Fox", "DOG", "fox")).foreach { case (qid, terms) =>
      val single = Corpus.bm25TopK(corpus, "doc_id", "text", terms, k = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      val batch = joined.filter(_._1 == qid).sortBy(_._2)
        .map(r => (r._3, r._4))
      assert(batch.toSeq == single.toSeq, s"qid=$qid: $batch vs $single")
    }
    // ranks are 1-based and contiguous per query
    joined.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic under repartitioning (ordered term fold + heap ties)
    val again = Corpus.bm25Join(corpus.repartition(7), "doc_id", "text",
      queries, "qid", "terms", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(joined.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
    // a query id split across rows retrieves with the UNION of its term
    // sets — a term shared between the rows must not contribute twice
    val split = Seq((10L, Seq("spark")), (10L, Seq("spark", "window")))
      .toDF("qid", "terms")
    val one = Seq((10L, Seq("spark", "window"))).toDF("qid", "terms")
    val a = Corpus.bm25Join(corpus, "doc_id", "text", split, "qid", "terms", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val b2 = Corpus.bm25Join(corpus, "doc_id", "text", one, "qid", "terms", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq == b2.toSeq)
  }

  test("rrf fusion: hand-checked scores, best-rank dedup, missing sources") {
    val lex = Seq((1L, 1L, 100L), (1L, 2L, 101L), (1L, 3L, 102L),
      (2L, 1L, 200L)).toDF("query_id", "rank", "doc_id")
    val sem = Seq((1L, 1L, 101L), (1L, 2L, 103L)).toDF("query_id", "rank", "doc_id")
    val fused = Similarity.rrfFuse(Seq(lex, sem), "query_id", "doc_id",
      "rank", k = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), (r.getLong(1), r.getDouble(3))))
      .toMap
    def rr(r: Long) = 1.0 / (60.0 + r.toDouble)
    // doc 101: rank 2 lexically + rank 1 semantically (summed lex-first)
    assert(fused((1L, 101L))._2 == rr(2) + rr(1))
    assert(fused((1L, 100L))._2 == rr(1))
    assert(fused((1L, 103L))._2 == rr(2))
    assert(fused((1L, 102L))._2 == rr(3))
    // 101 (two sources) outranks 100 (one source at rank 1)
    assert(fused((1L, 101L))._1 == 1L && fused((1L, 100L))._1 == 2L)
    // query 2 exists only lexically
    assert(fused((2L, 200L)) == ((1L, rr(1))))
    // duplicate (query, doc) within ONE source keeps its best rank only
    val dup = Seq((1L, 3L, 300L), (1L, 1L, 300L)).toDF("query_id", "rank", "doc_id")
    val d = Similarity.rrfFuse(Seq(dup), "query_id", "doc_id", "rank", k = 2)
      .collect()
    assert(d.length == 1 && d.head.getDouble(3) == rr(1))
  }

  test("retrieval metrics: precision/recall/mrr/ndcg against hand values") {
    val results = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L),
      (3L, 1L, 30L)).toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 98L)).toDF("query_id", "doc_id")
    val m = Similarity.retrievalMetrics(results, qrels, "query_id",
      "doc_id", "rank", k = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // query 1: rel {10,12,99}, hits at ranks 1 and 3
    val q1 = m(1L)
    assert(q1.getLong(1) == 3L && q1.getLong(2) == 2L)
    assert(q1.getDouble(3) == 2.0 / 3.0)            // precision@3
    assert(q1.getDouble(4) == 2.0 / 3.0)            // recall@3
    assert(q1.getDouble(5) == 1.0)                  // mrr: first hit rank 1
    val dcg = 1.0 / log2(2.0) + 1.0 / log2(4.0)
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(q1.getDouble(6) == dcg / idcg)
    // query 2: one relevant doc, never retrieved
    val q2 = m(2L)
    assert(q2.getLong(2) == 0L && q2.getDouble(5) == 0.0 &&
      q2.getDouble(6) == 0.0 && q2.getDouble(4) == 0.0)
    // query 3: no relevance judgments -> recall and ndcg are null
    val q3 = m(3L)
    assert(q3.getLong(1) == 0L && q3.isNullAt(4) && q3.isNullAt(6))
    assert(q3.getDouble(3) == 0.0 && q3.getDouble(5) == 0.0)
    // a query with qrels but NO retrieved rows surfaces with zeros
    // (trec_eval semantics) instead of vanishing from the macro-average
    val qrels2 = qrels.union(Seq((4L, 40L)).toDF("query_id", "doc_id"))
    val m2 = Similarity.retrievalMetrics(results, qrels2, "query_id",
      "doc_id", "rank", k = 3).collect().map(r => r.getLong(0) -> r).toMap
    val q4 = m2(4L)
    assert(q4.getLong(1) == 1L && q4.getLong(2) == 0L &&
      q4.getDouble(3) == 0.0 && q4.getDouble(4) == 0.0 &&
      q4.getDouble(5) == 0.0 && q4.getDouble(6) == 0.0)
    // duplicate (query, doc) rows in results keep their best rank only —
    // recall can never exceed 1 and DCG never counts a doc twice
    val dupRes = Seq((5L, 1L, 50L), (5L, 3L, 50L)).toDF("query_id", "rank", "doc_id")
    val dupRel = Seq((5L, 50L)).toDF("query_id", "doc_id")
    val md = Similarity.retrievalMetrics(dupRes, dupRel, "query_id",
      "doc_id", "rank", k = 3).collect().head
    assert(md.getLong(2) == 1L && md.getDouble(4) == 1.0 &&
      md.getDouble(6) == 1.0)
    // string ids are rejected loudly, not silently nulled by the cast
    val strRes = Seq(("q1", 1L, "d1")).toDF("query_id", "rank", "doc_id")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.retrievalMetrics(strRes, strRes.select("query_id", "doc_id"),
        "query_id", "doc_id", "rank", k = 3)
    }
    assert(e2.getMessage.contains("integral"))
    // a corrupt non-positive rank fails loudly instead of indexing the
    // nDCG discount table from the end (negative element_at) — a silent
    // negative mrr would poison every downstream aggregate
    val negRes = Seq((9L, -2L, 50L), (9L, 1L, 51L)).toDF("query_id", "rank", "doc_id")
    val negRel = Seq((9L, 50L)).toDF("query_id", "doc_id")
    val e3 = intercept[Exception] {
      Similarity.retrievalMetrics(negRes, negRel, "query_id", "doc_id",
        "rank", k = 3).collect()
    }
    assert(e3.getMessage.contains("must be >= 1") ||
      Option(e3.getCause).exists(_.getMessage.contains("must be >= 1")))
    // same contract for fusion: 1/(k0 + rank) must never see rank <= 0
    val e4 = intercept[Exception] {
      Similarity.rrfFuse(Seq(negRes), "query_id", "doc_id", "rank", k = 2)
        .collect()
    }
    assert(e4.getMessage.contains("must be >= 1") ||
      Option(e4.getCause).exists(_.getMessage.contains("must be >= 1")))
    // a NULL rank is NOT corrupt — outer-join results carry them; they
    // pass the guard and drop at the <= k filter (pre-guard behavior)
    val nullRes = Seq((9L, Option.empty[Long], 50L), (9L, Some(1L), 51L))
      .toDF("query_id", "rank", "doc_id")
    val mNull = Similarity.retrievalMetrics(nullRes, negRel, "query_id",
      "doc_id", "rank", k = 3).collect()
    assert(mNull.length == 1 && mNull.head.getLong(2) == 0L) // 51 not relevant
  }

  test("mmr rerank: diversification, lambda extremes, determinism") {
    import org.apache.spark.sql.Row
    // doc 1 and 2 nearly identical, both highly relevant; doc 3 orthogonal
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.04f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val cand = Seq((9L, 1L, 0.99), (9L, 2L, 0.98), (9L, 3L, 0.50),
      (9L, 4L, 0.40)).toDF("query_id", "doc_id", "rel")
    val sel = Similarity.mmrRerank(cand, vecs, "query_id", "doc_id", "rel",
      "vec_id", "embedding", m = 3, lambda = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // first pick: pure relevance argmax, score 0.5*rel - 0.5*0.0
    assert(sel(0) == ((1L, 1L, 0.5 * 0.99 - 0.5 * 0.0)))
    // second pick diversifies: doc 2 is penalized by cos≈1 to doc 1, so
    // the orthogonal doc 3 wins despite lower relevance
    assert(sel(1)._2 == 3L)
    assert(sel.map(_._2).toSeq == Seq(1L, 3L, 4L))
    // lambda = 1.0 degenerates to pure relevance order
    val pure = Similarity.mmrRerank(cand, vecs, "query_id", "doc_id", "rel",
      "vec_id", "embedding", m = 3, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(pure.toSeq == Seq(1L, 2L, 3L))
    // m beyond the candidate count returns all candidates, once each
    val all = Similarity.mmrRerank(cand, vecs, "query_id", "doc_id", "rel",
      "vec_id", "embedding", m = 10)
      .collect().map(_.getLong(2))
    assert(all.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // deterministic under repartitioning
    val again = Similarity.mmrRerank(cand.repartition(5), vecs.repartition(3),
      "query_id", "doc_id", "rel", "vec_id", "embedding", m = 3, lambda = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(sel.toSeq == again.toSeq)
    // duplicate candidate rows (fused lists) dedup to best relevance —
    // the greedy selection can never emit one doc at two ranks
    val dup = Seq((9L, 1L, 0.99), (9L, 1L, 0.80), (9L, 3L, 0.50))
      .toDF("query_id", "doc_id", "rel")
    val dsel = Similarity.mmrRerank(dup, vecs, "query_id", "doc_id", "rel",
      "vec_id", "embedding", m = 3, lambda = 1.0)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(dsel.map(_._1).toSeq == Seq(1L, 3L))
    assert(dsel(0)._2 == 1.0 * 0.99 - 0.0 * 0.0)
    // candidates with a missing vector drop instead of crashing the kernel
    val missing = Seq((9L, 1L, 0.9), (9L, 77L, 0.99)).toDF("query_id", "doc_id", "rel")
    val kept = Similarity.mmrRerank(missing, vecs, "query_id", "doc_id",
      "rel", "vec_id", "embedding", m = 2).collect().map(_.getLong(2))
    assert(kept.toSeq == Seq(1L))
    // the maxCandidates gate fails loudly, not by silent truncation
    val wide = (0 until 20).map(i => (9L, i.toLong, 1.0 / (i + 1)))
      .toDF("query_id", "doc_id", "rel")
    val vecs20 = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(3)(d => math.sin(i + d).toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[Throwable] {
      Similarity.mmrRerank(wide, vecs20, "query_id", "doc_id", "rel",
        "vec_id", "embedding", m = 2, maxCandidates = 10).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("maxCandidates")), msgs.mkString(" | "))
  }
}
