package graft.llm

import graft.SparkSuite
import graft.dedup.{Dedup, Vectors}
import graft.multimodal.Multimodal
import graft.similarity.Ann
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog."),
    (2L, "The quick brown fox jumps over the lazy dog!"),   // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),    // exact after normalize
    (4L, "Der Hund ist nicht schnell und die Katze auch nicht."),
    (5L, "completely different content about spark engines and shuffles"))
    .toDF("doc_id", "text")

  test("fingerprint collapses punctuation/case variants (t4)") {
    val fps = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(2L) == fps(3L))
    assert(fps(1L) != fps(5L))
  }

  test("langid: german stopwords beat english (t3)") {
    val out = TextAnalysis.langId(docs).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L) == "de")
    assert(out(1L) == "en")
  }

  test("quality features: token counts and ratios (t2)") {
    val row = TextAnalysis.qualityFeatures(docs).filter($"doc_id" === 1L).collect()(0)
    assert(row.getAs[Long]("n_tokens") == 9L)
    assert(row.getAs[Long]("punct_count") == 1L)     // the period
    assert(row.getAs[Double]("stopword_ratio") == 0.2222) // 'The','the' / 9
  }

  test("vocabulary: df/tf ordering with lexicographic ties (v1)") {
    val v = TextAnalysis.vocabulary(docs, 5).collect()
    assert(v.length == 5)
    // 'the' appears in docs 1,2,3 (df 3) twice each (tf 6) — top term
    assert(v(0).getAs[String]("term") == "the")
    assert(v(0).getAs[Long]("df") == 3L && v(0).getAs[Long]("tf") == 6L)
    // df sorted non-increasing; ties broken by tf desc then term asc
    val dfs = v.map(_.getAs[Long]("df")).toSeq
    assert(dfs == dfs.sortBy(-_))
  }

  test("tf-idf: integer scores, rare terms outrank common ones (v2)") {
    val out = TextAnalysis.tfIdfTopTerms(docs, 2)
    val top5 = out.filter($"doc_id" === 5L).orderBy("rank").collect()
    assert(top5.length == 2)
    // every term of doc 5 is unique to it (df=1, same tf=1) → the top-2
    // are the lexicographically first of its terms
    assert(top5.map(_.getAs[String]("term")).toSeq ==
      Seq("about", "and"))
    // docs 1-3 are clones, so all of doc 1's terms share df=3 and the
    // only discriminator is tf: 'the' (tf=2) ranks first
    val top1 = out.filter($"doc_id" === 1L).orderBy("rank").collect()
    assert(top1.head.getAs[String]("term") == "the")
    assert(top1.head.getAs[Long]("tf") == 2L)
    assert(top1.head.getAs[Long]("df") == 3L)
  }

  test("oov rate: terms outside the vocab counted per doc (t8)") {
    val vocab = Seq("the", "quick", "brown", "fox").toDF("term")
    val out = TextAnalysis.oovRate(docs, vocab)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 9 terms, in-vocab = the,quick,brown,fox,the (5) → 4 oov
    assert(out(1L).getAs[Long]("n_terms") == 9L)
    assert(out(1L).getAs[Long]("n_oov") == 4L)
    assert(out(1L).getAs[Double]("oov_rate") == 0.4444)
    // doc 5 shares nothing with the vocab
    assert(out(5L).getAs[Double]("oov_rate") == 1.0)
  }

  test("repetition stats: repeated content raises dup_fraction (t6)") {
    val rep = Seq(
      (1L, "abcdefgh"),                 // all shingles distinct
      (2L, "aaaaaaaaaaaa"),             // one shingle repeated
      (3L, "ab"))                       // shorter than k → zero counts
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(rep, 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("dup_fraction") == 0.0)
    assert(out(2L).getAs[Long]("distinct_ngrams") == 1L)
    assert(out(2L).getAs[Long]("max_repeat") == 8L)   // 12 chars → 8 'aaaaa's
    assert(out(2L).getAs[Double]("dup_fraction") == 0.875)
    assert(out(3L).getAs[Long]("total_ngrams") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("dup_fraction")))
  }

  test("pii scrub: emails and phones redacted, counts exact (t7)") {
    val pii = Seq(
      (1L, "write to jane.doe+x@example.org or call +19195551234 now"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(pii).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1L)
    assert(out(1L).getAs[Long]("n_phones") == 1L)
    // digest equals md5 of the expected redacted string
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("write to [EMAIL] or call [PHONE] now".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1L).getAs[String]("redacted_md5") == expected)
    assert(out(2L).getAs[Long]("n_emails") == 0L)
  }

  test("contamination: eval shingles probed against the train set (x1)") {
    import graft.text.Curation
    val sh = Dedup.shingles(docs)   // distinct per doc
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train"), (5L, "test")).toDF("doc_id", "split")
    val out = Curation.crossSplitContamination(sh, splits)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 5L))                  // only eval docs
    assert(out(2L).getAs[Double]("contamination") == 1.0) // near-dup of train doc 1
    assert(out(5L).getAs[Double]("contamination") < 0.2)  // novel content
  }

  test("approx sketches bound against exact values (a9)") {
    val rows = (0L until 3000L)
      .map(i => (i, s"lang${i % 2}", s"src${i % 37}", (i % 1000) + 1))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = rows.groupBy("lang").agg(
      approx_count_distinct(col("source")).as("approx_sources"),
      percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap
    // HLL++ at default precision is well within 10% of the exact 37
    assert(math.abs(got("lang0").getAs[Long]("approx_sources") - 37L) <= 4)
    // with accuracy 10000 over 1500 rows the quantile summary is exact
    val exactP50 = rows.filter(col("lang") === "lang0")
      .stat.approxQuantile("n_chars", Array(0.5), 0.0)(0)
    assert(got("lang0").getAs[Long]("p50") == exactP50.toLong)
  }

  test("stratified sample: per-stratum rates nest within the hash buckets (c3)") {
    import graft.text.Curation
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val out = Curation.stratifiedSample(rows, col("doc_id"), col("lang"),
      Map("en" -> 32, "fr" -> 192), 16)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en kept at ≈32/256 = 12.5%, fr at ≈192/256 = 75%
    assert(out("en") > 60 && out("en") < 200)
    assert(out("fr") > 600 && out("fr") < 900)
    // every kept row also satisfies the bucket rule (membership is content-only)
    val kept = Curation.stratifiedSample(rows, col("doc_id"), col("lang"),
      Map("en" -> 32, "fr" -> 192), 16)
      .select(col("doc_id"), Curation.hashBucket(col("doc_id")).as("b"), col("lang")).collect()
    assert(kept.forall(r =>
      r.getInt(1) < (if (r.getString(2) == "en") 32 else 192)))
  }

  test("minhash: identical normalized docs share full signature; near-dups band-collide (d2/d3)") {
    val sh = Dedup.shingles(docs)
    val sigs = Dedup.minHashSignatures(sh)
    val byId = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(byId(1L) == byId(2L) && byId(2L) == byId(3L)) // same shingle set
    assert(byId(1L) != byId(5L))
    val pairs = Dedup.minHashCandidatePairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 5L)))
  }

  test("jaccard verification: identical sets = 1.0 (d5)") {
    val sh = Dedup.shingles(docs)
    val pairs = Dedup.minHashCandidatePairs(Dedup.minHashSignatures(sh))
    val j = Dedup.jaccardVerify(pairs, sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0 && j((1L, 3L)) == 1.0)
  }

  test("dupGroups: transitive closure over pair edges (d8)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("a_doc_id", "b_doc_id")
    val groups = Dedup.dupGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L) // A~B~C chain
    assert(groups(10L) == 10L && groups(11L) == 10L)
    // a longer chain still converges
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a_doc_id", "b_doc_id")
    val cg = Dedup.dupGroups(chain).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cg.values.toSet == Set(1L))
  }

  test("simhash: near-dups agree, distinct content differs (d4)") {
    val out = Dedup.simHash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(3L))
    assert(out(1L).length == 16 && out(1L).forall(c => c == '0' || c == '1'))
    assert(out(1L) != out(5L))
  }

  test("vector ops: cosine of identical = 1, orthogonal = 0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f, 2.0f)),
      (3L, Array(0.0f, 3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cos = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        Vectors.cosine($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cos((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(cos((1L, 3L))) < 1e-12)
  }

  test("ann: brute-force top-1 is the exact nearest; lsh stays within bucket") {
    val emb = Tables.embeddings
    val queries = emb.filter($"vec_id" < 3)
    val bf = Ann.bruteForceTopK(emb, queries, 3)
    val top = bf.filter($"query_id" === 0 && $"rank" === 1).collect()(0)
    // exhaustively recompute the max cosine for query 0
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").collect()(0).getSeq[Float](0)
    val best = emb.filter($"vec_id" =!= 0)
      .select($"vec_id", Vectors.cosine($"embedding",
        typedLit(q0)).as("c"))
      .orderBy($"c".desc).limit(1).collect()(0)
    assert(top.getAs[Long]("neighbor_id") == best.getLong(0))
    val lsh = Ann.lshTopK(emb, queries, 3)
    assert(lsh.count() <= 9)
    // every lsh neighbor shares the query's sign bucket
    val bucketed = emb.select($"vec_id", Ann.signBucket("embedding", Seq(1, 17, 33, 49)).as("b"))
    val joined = lsh.join(bucketed.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("b", "qb"), "query_id")
      .join(bucketed.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("b", "nb"), "neighbor_id")
    assert(joined.filter($"qb" =!= $"nb").count() == 0)

    // multi-probe recall: candidates found >= single-probe, and
    // closer to the exact top-3 set
    def recallVsExact(approx: org.apache.spark.sql.DataFrame): Long = {
      val exact = bf.select($"query_id", $"neighbor_id")
      approx.select($"query_id", $"neighbor_id").intersect(exact).count()
    }
    val multi = Ann.lshTopK(emb, queries, 3, probes = 5)
    assert(multi.count() >= lsh.count())
    assert(recallVsExact(multi) >= recallVsExact(lsh))
  }

  test("labelKnnAgreement: exact integer kNN, deterministic ties, self excluded") {
    // 1-D embeddings make distances obvious: probe 0 (label 1) at 0.0;
    // neighbors at 0.1(l1), 0.2(l1), 0.3(l2), 0.9(l2)
    val emb = Seq(
      (0L, Array(0.0f), 1), (1L, Array(0.1f), 1), (2L, Array(0.2f), 1),
      (3L, Array(0.3f), 2), (4L, Array(0.9f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.labelKnnAgreement(emb, emb.filter($"vec_id" === 0), k = 3)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    // 3-NN of probe 0 = {1, 2, 3}: two share label 1
    assert(r.getAs[Long]("probe_id") == 0L)
    assert(r.getAs[Long]("n_same_label") == 2L)
    assert(r.getAs[Long]("k_found") == 3L)

    // tie determinism: equidistant neighbors resolve by neighbor id
    val tie = Seq(
      (10L, Array(0.0f), 0), (11L, Array(1.0f), 0), (12L, Array(-1.0f), 1),
      (13L, Array(5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val t = Ann.labelKnnAgreement(tie, tie.filter($"vec_id" === 10), k = 1)
      .collect()(0)
    // 11 and 12 tie at dist 1: lower id (11, label 0) wins -> agreement 1
    assert(t.getAs[Long]("n_same_label") == 1L && t.getAs[Long]("k_found") == 1L)
  }

  test("bucketed label-kNN: recall floor vs exact, budget monotone (e5)") {
    val emb = Tables.embeddings
    val k = 5
    val exact = Ann.knnPairs(emb, emb, k)
      .select($"probe_id", $"neighbor_id")
    def recall(budget: Int): Double = {
      val approx = Ann.knnPairsBucketed(emb, emb, k, probeBudget = budget)
        .select($"probe_id", $"neighbor_id")
      approx.intersect(exact).count().toDouble / exact.count()
    }
    val r1 = recall(1); val r3 = recall(3)
    // stated recall floor for the audit at probeBudget = 3 on the
    // sf0.001 embeddings (measured 0.346): above 0.30, and well above
    // the 3/16 ≈ 0.19 fraction-of-corpus-probed random baseline —
    // i.e. the buckets are informative, not just subsampling
    assert(r3 >= 0.30, s"bucketed kNN recall $r3 below floor 0.30")
    assert(r3 >= 1.25 * 3.0 / 16.0, s"recall $r3 not above random-probe baseline")
    assert(r3 >= r1, s"multi-probe recall $r3 < single-probe $r1")
    // every probe's k_found is bounded by k
    val agg = Ann.labelKnnAgreementBucketed(emb, emb, k)
    assert(agg.filter($"k_found" > k || $"n_same_label" > $"k_found").count() == 0)
  }

  test("embedding near-dups: width subset property, banded recall, adaptive dims (d6/d10)") {
    val emb = Tables.embeddings
    val narrow = Seq(1, 17, 33, 49)                       // 4 bits, 16 buckets
    val wide = Seq(1, 9, 17, 25, 33, 41, 49, 57)          // 8 bits, 256 buckets
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"a_vec_id", $"b_vec_id")
    val pNarrow = pairs(Dedup.embeddingNearDups(emb, 0.25, narrow))
    val pWide = pairs(Dedup.embeddingNearDups(emb, 0.25, wide))
    // wide dims ⊇ narrow dims ⇒ wide buckets refine narrow buckets ⇒
    // every wide-bucket pair is also a narrow-bucket pair
    assert(pWide.exceptAll(pNarrow).count() == 0)
    assert(pWide.count() <= pNarrow.count())
    // banded (2 disjoint 4-bit bands) recovers at least band-0's pairs
    // and strictly dominates the single wide band on recall
    val pBanded = pairs(Dedup.embeddingNearDupsBanded(
      emb, 0.25, graft.queries.LlmOps.NearDupBands))
    assert(pNarrow.exceptAll(pBanded).count() == 0)
    assert(pBanded.count() >= pNarrow.count())
    // adaptive dims: bucket count tracks corpus size, dims stay in range
    assert(Dedup.adaptiveSignDims(1000, 64, 1024) == Seq(1))
    val d1m = Dedup.adaptiveSignDims(1L << 20, 64, 1024)  // 2^20/2^10 -> 10 bits
    assert(d1m.length == 10 && d1m.forall(d => d >= 1 && d <= 64) && d1m.distinct == d1m)
    assert(Dedup.adaptiveSignDims(1L << 40, 64, 1024).length == 30)
    assert(Dedup.adaptiveSignDims(1L << 40, 8, 1024).length == 8) // capped at embDim
    // auto path agrees with explicit dims at the derived width
    val auto = pairs(Dedup.embeddingNearDupsAuto(emb, 0.25, embDim = 64,
      targetBucketRows = emb.count()))
    assert(auto.exceptAll(pairs(Dedup.embeddingNearDups(emb, 0.25, Seq(1)))).count() == 0)
    // banded-auto: disjoint bands at corpus-derived width; recall
    // dominates a single band of the same width
    val n = emb.count()
    val autoBand = pairs(Dedup.embeddingNearDupsBandedAuto(
      emb, 0.25, embDim = 64, numBands = 2, targetBucketRows = math.max(1L, n / 16)))
    val oneBand = pairs(Dedup.embeddingNearDups(
      emb, 0.25, Dedup.adaptiveSignDims(n, 64, math.max(1L, n / 16))))
    assert(oneBand.exceptAll(autoBand).count() == 0)
    assert(autoBand.count() >= oneBand.count())
    // overlapping-band configs are refused, not silently degraded
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupsBandedAuto(emb, 0.25, embDim = 8, numBands = 8,
        targetBucketRows = 1)
    }
    // the integer CASE-ladder form equals the old float-log form for
    // every n (this is what lets d11/e6's ORACLE derive the bit count)
    def logForm(n: Long, t: Long, cap: Int): Int = {
      val needed = if (n <= t) 1
        else math.ceil(math.log(n.toDouble / t) / math.log(2.0)).toInt
      math.max(1, math.min(needed, cap))
    }
    val t = graft.queries.LlmOps.AdaptiveTargetRows
    val cap = graft.queries.LlmOps.AdaptiveMaxBits
    (Seq(1L, 63L, 64L, 65L, 127L, 128L, 129L, 500L, 2000L, 20000L,
      1L << 20, 1L << 40) ++ (1 to 12).map(b => t << b) ++       // exact 2^b edges
      (1 to 12).flatMap(b => Seq((t << b) - 1, (t << b) + 1)) ++
      (1 to 200).map(_ * 97L)).foreach { nn =>
      assert(Dedup.adaptiveSignDims(nn, 64, t, cap).length == logForm(nn, t, cap),
        s"ladder/log divergence at n=$nn")
    }
  }

  test("on-disk IVF index: partition-pruned probe, identical results to in-memory ivfTopK") {
    val emb = Tables.embeddings
    val centroids = emb.filter($"vec_id" < 8)
    val queries = emb.filter($"vec_id" < 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.writeIvfIndex(emb, centroids, dir)
    // physical layout: one directory per inverted list
    val listDirs = new java.io.File(dir).list().count(_.startsWith("centroid_id="))
    assert(listDirs > 0 && listDirs <= 8)
    val indexed = Ann.ivfTopKIndexed(dir, centroids, queries, k = 5, nprobe = 2)
    val inMem = Ann.ivfTopK(emb, centroids, queries, k = 5, nprobe = 2)
    assert(indexed.exceptAll(inMem).isEmpty && inMem.exceptAll(indexed).isEmpty)
    // the centroid_id probe filter must prune partitions before IO
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      "probe filter did not reach the index scan as a partition filter")
  }

  test("brute-force paths guard against corpus-sized probe sets") {
    val emb = Tables.embeddings
    // bruteForceTopK refuses: exactness can't be silently downgraded
    val ex = intercept[IllegalArgumentException] {
      Ann.bruteForceTopK(emb, emb, 3, maxBroadcastProbes = 4L)
    }
    assert(ex.getMessage.contains("lshTopK"))
    // labelKnnAgreement refuses too unless the approximate downgrade
    // is explicitly opted into ...
    val ex2 = intercept[IllegalArgumentException] {
      Ann.labelKnnAgreement(emb, emb, 5, maxBroadcastProbes = 4L)
    }
    assert(ex2.getMessage.contains("allowApproximate"))
    // ... and with the opt-in it routes to the bucketed audit (same schema)
    val routed = Ann.labelKnnAgreement(emb, emb, 5, maxBroadcastProbes = 4L,
      allowApproximate = true)
    val bucketed = Ann.labelKnnAgreementBucketed(emb, emb, 5)
    assert(routed.exceptAll(bucketed).isEmpty && bucketed.exceptAll(routed).isEmpty)
  }

  private object Tables {
    def embeddings = graft.Tables.embeddings(spark, sf("sf0.001"))
  }

  test("empty/whitespace text: zero tokens, null ratios, zero rolling hash") {
    val edge = Seq((1L, ""), (2L, "   "), (3L, "ok")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityFeatures(edge).orderBy("doc_id").collect()
    assert(q(0).getAs[Long]("n_tokens") == 0L && q(0).isNullAt(q(0).fieldIndex("avg_token_len")))
    assert(q(1).getAs[Long]("n_tokens") == 0L && q(1).isNullAt(q(1).fieldIndex("stopword_ratio")))
    assert(q(2).getAs[Long]("n_tokens") == 1L)
    val rh = edge.select(graft.functions.RollingHash(col("text")).as("h"))
      .orderBy(lit(1)).collect()
    assert(rh.exists(_.getLong(0) == 0L))   // empty string hashes to 0, not null
  }

  test("fuzzy pairs: blocking finds every same-prefix pair a brute scan finds (t9)") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog."),
      (2L, "The quick brown fox jumped over the lazy dog!"),   // 2 edits from 1
      (3L, "the quick brown fox jumps over the lazy dog"),     // 0 edits from 1
      (4L, "The quick brown fox " + ("x" * 40)),               // same prefix, too far
      (5L, "A totally different opening line entirely here"),
      (6L, "the quick brown cat jumps over the lazy dog"))     // 2 edits, same prefix
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force reference over pairs sharing the 8-char block prefix
    val norm = docs.select($"doc_id", TextAnalysis.normalized($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- norm.keys; b <- norm.keys if a < b
      if norm(a).take(8) == norm(b).take(8)
      if math.abs(norm(a).length - norm(b).length) <= 8   // within ±1 length bucket reach
      dist = lev(norm(a).take(80), norm(b).take(80)) if dist <= 8
    } yield (a, b) -> dist.toLong).toMap
    assert(got == want)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) == 0L)  // punctuation-only variant
    assert(got.contains((1L, 2L)) && got.contains((1L, 6L)))
    assert(!got.exists { case ((a, b), _) => a == 4L || b == 4L }) // 40 edits away
    assert(!got.exists { case ((a, b), _) => a == 5L || b == 5L }) // different block
  }

  test("fuzzy pairs: suffix-block arm recovers first-character edits the prefix block misses (t13)") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "Xhe quick brown fox jumps over the lazy dog"),  // FIRST char edited
      (3L, "The quick brown fox jumps over the lazy doX"),  // last char edited
      (4L, "An unrelated sentence with nothing shared at all no"))
      .toDF("doc_id", "text")
    // prefix-only blocking: the first-character edit changes the 8-char
    // block key, so (1,2) escapes — the documented recall gap
    val prefixOnly = Dedup.editDistancePairs(docs, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!prefixOnly.contains((1L, 2L)),
      "prefix-only blocking must (by construction) miss the first-char edit")
    assert(prefixOnly.contains((1L, 3L)))
    // suffix second pass: (1,2) shares the normalized suffix, so the
    // second arm pairs them; (1,3) still present exactly once (union+
    // distinct — both arms find it, output keeps one row)
    val both = Dedup.editDistancePairs(docs, maxDist = 8, suffixBlock = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(both.map(_._1).length == both.map(_._1).distinct.length,
      s"pair-level distinct must dedup arms, got $both")
    val m = both.toMap
    assert(m.get((1L, 2L)).contains(1L), s"suffix arm must find the first-char edit, got $m")
    assert(m.get((1L, 3L)).contains(1L))
    assert(!m.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("multimodal: stub decode is deterministic, frame sampling fans out (mm)") {
    val blobs = docs.select($"doc_id", encode($"text", "UTF-8").as("blob"))
    val meta1 = Multimodal.decodeMeta(blobs).collect().sortBy(_.doc_id)
    val meta2 = Multimodal.decodeMeta(blobs).collect().sortBy(_.doc_id)
    assert(meta1.toSeq == meta2.toSeq)
    assert(meta1.forall(m => m.width >= 64 && m.width < 192))
    assert(meta1.forall(m => Set("png", "jpeg")(m.format)))
    val frames = Multimodal.sampleFrames(blobs, 3)
    assert(frames.count() == docs.count() * 3)
    assert(frames.select("frame_md5").distinct().count() == docs.count() * 3)

    // feature-extract: fixed width, deterministic, bounded range
    val feats = Multimodal.extractFeatures(blobs, dim = 16).collect()
    assert(feats.forall(_.getSeq[Float](1).length == 16))
    assert(feats.forall(_.getSeq[Float](1).forall(f => f >= -1.0f && f <= 1.0f)))
    val feats2 = Multimodal.extractFeatures(blobs, dim = 16).collect()
    assert(feats.map(_.getSeq[Float](1)).toSeq == feats2.map(_.getSeq[Float](1)).toSeq)

    // resize: byte budget scales with target area, dims attached
    val small = Multimodal.resize(blobs, 64, 64).collect()
    val large = Multimodal.resize(blobs, 256, 256).collect()
    assert(small.forall(r => r.getInt(2) == 64 && r.getInt(3) == 64))
    val sLen = small.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    val lLen = large.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    assert(sLen.forall { case (id, n) => n <= lLen(id) })
  }

  test("surprisal: rare-term docs outscore common-term docs; hashed score deterministic (t11/t12)") {
    val corpus = Seq(
      (1L, "common common common common"),        // df=3 term only
      (2L, "common rareword unique singleton"),   // three df=1 terms
      (3L, "common common common common common")) // same term as 1
      .toDF("doc_id", "text")
    val s = TextAnalysis.surprisal(corpus)
      .collect().map(r => r.getLong(0) -> r).toMap
    // 'common' df=3 -> w = 32 - len(bin(3)=11) = 30; df=1 -> w = 31
    assert(s(1L).getAs[Long]("total_surprisal") == 4 * 30)
    assert(s(2L).getAs[Long]("total_surprisal") == 30 + 3 * 31)
    assert(s(2L).getAs[Long]("mean_surprisal_scaled") >
      s(1L).getAs[Long]("mean_surprisal_scaled"))

    val h = TextAnalysis.hashedFeatureScore(corpus, dim = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    // identical bags of words hash identically; score scales linearly
    // with term count for a single-term doc
    assert(h(1L).getAs[Long]("n_features") == 1L)
    assert(h(3L).getAs[Long]("score") ==
      h(1L).getAs[Long]("score") / 4 * 5)
    // deterministic across invocations and partitionings
    val h2 = TextAnalysis.hashedFeatureScore(corpus.repartition(3), dim = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score")).toMap
    assert(h.view.mapValues(_.getAs[Long]("score")).toMap == h2)
  }

  test("cross-split near-dup contamination: edited train copy flagged, clean doc not (x2)") {
    import graft.text.Curation
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today!"), // edited copy of 1
      (3L, "entirely unrelated content about distributed query engines and shuffles"),
      (4L, "abc"))                                  // too short to shingle
      .toDF("doc_id", "text")
    // force the split: 1 -> train, 2-4 -> eval
    val splits = Seq((1L, "train"), (2L, "val"), (3L, "test"), (4L, "val"))
      .toDF("doc_id", "split")
    val sigs = Dedup.minHashSignatures(
      Dedup.shingles(corpus, 5, distinct = false), 8)
    val out = Curation.crossSplitNearDups(sigs, splits, 8, 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 3L, 4L))           // ALL eval docs, even unshingleable
    // the edited copy collides with its train original and estimates high
    assert(out(2L).getAs[Long]("n_neardup_train") == 1L)
    assert(out(2L).getAs[Long]("best_train_doc") == 1L)
    assert(out(2L).getAs[Double]("max_est_jaccard") >= 0.5)
    // the clean doc has no train candidates; measure columns stay null
    assert(out(3L).getAs[Long]("n_candidates") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("max_est_jaccard")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("best_train_doc")))
    // the unshingleable doc still appears, with zero candidates
    assert(out(4L).getAs[Long]("n_candidates") == 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("max_est_jaccard")))
  }

  test("duplicate word spans: stats find cross-doc boilerplate, removal keeps the first copy (d12/d13)") {
    val boiler = "all rights reserved contact us for terms of service"  // 9 words
    val corpus = Seq(
      (1L, s"unique alpha beta gamma delta epsilon zeta eta theta $boiler"),
      (2L, s"$boiler other distinct words follow here nine ten eleven twelve"),
      (3L, "nothing here repeats anywhere one two three four five six seven eight"))
      .toDF("doc_id", "text")

    val stats = Dedup.dupSpanStats(corpus, n = 9)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the 9-word boilerplate is a duplicated 9-gram in docs 1 and 2
    assert(stats(1L).getAs[Long]("n_dup_spans") >= 1L)
    assert(stats(2L).getAs[Long]("n_dup_spans") >= 1L)
    assert(stats(3L).getAs[Long]("n_dup_spans") == 0L)
    assert(stats(2L).getAs[Long]("dup_token_count") >= 9L)
    assert(stats(3L).getAs[Long]("dup_token_frac_scaled") == 0L)

    val cleaned = Dedup.removeDupSpans(corpus, n = 9)
      .collect().map(r => r.getLong(0) -> r).toMap
    // first occurrence (doc 1, earlier (id, pos)) survives; doc 2's copy is cut
    assert(cleaned(1L).getAs[Long]("n_removed") == 0L)
    assert(cleaned(2L).getAs[Long]("n_removed") == 9L)
    assert(!cleaned(2L).getAs[String]("cleaned_text").contains("rights reserved"))
    assert(cleaned(2L).getAs[String]("cleaned_text")
      .startsWith("other distinct words"))
    assert(cleaned(3L).getAs[Long]("n_removed") == 0L)
    // idempotence: a second pass over the cleaned corpus removes nothing
    val again = Dedup.removeDupSpans(
      cleaned.values.toSeq.map(r => (r.getLong(0), r.getString(3))).toDF("doc_id", "text"),
      n = 9).collect()
    assert(again.forall(_.getAs[Long]("n_removed") == 0L))
  }

  test("learnBpeMerges: frequency-weighted argmax per round, greedy overlap, dry stop (v6)") {
    // vocab: the×3, cat×1. Round 1: (h,e) and (t,h) tie at 3 — (h,e)
    // wins lexicographically. Round 2: the = [t, he] → (t, he) at 3.
    // Round 3: 'the' is one symbol; (a,t) and (c,a) tie at 1 → (a,t).
    val docs = Seq((1L, "the the the cat")).toDF("doc_id", "text")
    val m = TextAnalysis.learnBpeMerges(docs, rounds = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(m(1L) == (("h", "e", 3L)), s"$m")
    assert(m(2L) == (("t", "he", 3L)), s"$m")
    assert(m(3L) == (("a", "t", 1L)), s"$m")

    // greedy left-to-right overlap: aaaa merges pairwise, not chained,
    // and the loop stops cleanly when no pairs remain
    val rep = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val mr = TextAnalysis.learnBpeMerges(rep, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(mr.toSeq == Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)),
      s"greedy merge then dry stop, got ${mr.toSeq}")
  }

  test("applyBpeMerges: trained merges compress piece counts, train/encode semantics agree (v7)") {
    val docs = Seq((1L, "the the the cat"), (2L, ""), (3L, "he he")).toDF("doc_id", "text")
    // merges learned on this corpus: (h,e) then (t,he) — 'the' becomes
    // ONE piece, 'cat' stays 3 chars, 'he' becomes one piece via merge 1
    val merges = Seq(("h", "e"), ("t", "he"))
    val out = TextAnalysis.applyBpeMerges(docs, merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((4L, 6L)), s"3×the(1) + cat(3) = 6 pieces: $out")
    assert(out(2L) == ((0L, 0L)), "empty doc: zero words, zero pieces")
    assert(out(3L) == ((2L, 2L)), "merge 1 alone collapses 'he'")
    // no merges = character count per word
    val raw = TextAnalysis.applyBpeMerges(docs, Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(1L) == 12L && raw(3L) == 4L)
  }

  test("coOccurrence: window-bounded symmetric counts via the linear offset join (v5)") {
    val docs = Seq((1L, "a b c a"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.coOccurrence(docs, window = 2, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // positions 1a 2b 3c 4a: Δ1 = (a,b),(b,c),(c,a); Δ2 = (a,c),(b,a)
    // symmetric counts: (a,b) = ordered(a,b) + swap(b,a) = 2
    assert(out(("a", "b")) == 2L && out(("b", "a")) == 2L)
    assert(out(("a", "c")) == 2L && out(("c", "a")) == 2L)
    assert(out(("b", "c")) == 1L && out(("c", "b")) == 1L)
    assert(out(("x", "y")) == 1L && out(("y", "x")) == 1L)
    assert(!out.contains(("a", "a")),
      "Δ3 exceeds the window: the two a's must not pair")
    assert(out.forall { case ((t, c), n) => out((c, t)) == n }, "full symmetry")
    // linear shape: the position join is an equi-join, never a range/cross join
    val plan = TextAnalysis.coOccurrence(docs, 2, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"offset join must stay an equi-join, plan:\n${plan.take(2000)}")
  }

  test("pmiTopPairs: associated pairs scored ln-ratio, minCount gates rare pairs (v8)") {
    // x/y co-occur exclusively (5 docs), p/q too but only twice —
    // below minCount, yet still part of the observation total:
    // T = 2·5 + 2·2 = 14, so pmi(x,y) = ln(5·14 / (5·5)) = ln 2.8
    val d = ((1L to 5L).map(i => (i, "x y")) ++ Seq((6L, "p q"), (7L, "p q")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiTopPairs(d, window = 3, minCount = 5, k = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("x", "y"), ("y", "x")))
    assert(out.forall(_.getAs[Double]("pmi") == 1.0296))
  }

  test("charStats: entropy/mode share over the normalized alphabet (t15)") {
    val d = Seq((1L, "aaaa"), (2L, "ab"), (3L, "...")).toDF("doc_id", "text")
    val out = TextAnalysis.charStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_chars_norm") == 4L)
    assert(out(1L).getAs[Long]("n_distinct_chars") == 1L)
    assert(out(1L).getAs[Double]("mode_ratio") == 1.0)
    assert(out(1L).getAs[Double]("char_entropy") == 0.0)
    assert(out(2L).getAs[Double]("char_entropy") == 0.6931) // ln 2
    // '...' normalizes to empty: zero distinct chars, null ratios
    assert(out(3L).getAs[Long]("n_chars_norm") == 0L)
    assert(out(3L).getAs[Long]("n_distinct_chars") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("char_entropy")))
    // scan-level: no shuffle anywhere in the plan
    val plan = TextAnalysis.charStats(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"charStats must not shuffle:\n$plan")
  }

  test("bigramSurprisal: add-one bigram NLL exact; off-distribution docs score higher (t16)") {
    // unigrams a:2 b:2 x:1 y:1 solo:1 → V=5; bigrams "a b":2 "b a":1 "x y":1
    // nll(a b) = floor(-ln((2+1)/(2+5))*1e6) = 847297
    // nll(b a) = floor(-ln((1+1)/(2+5))*1e6) = 1252762
    // nll(x y) = floor(-ln((1+1)/(1+5))*1e6) = 1098612
    val d = Seq((1L, "a b a b"), (2L, "x y"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(out(1L).getAs[Long]("sum_nll_e6") == 2 * 847297L + 1252762L)
    assert(out(1L).getAs[Long]("mean_nll_e6") == (2 * 847297L + 1252762L) / 3)
    assert(out(2L).getAs[Long]("mean_nll_e6") == 1098612L)
    // the doc repeating the corpus's common bigram is LESS surprising
    assert(out(1L).getAs[Long]("mean_nll_e6") < out(2L).getAs[Long]("mean_nll_e6"))
    // one-token and empty docs: zero bigrams, null scores, still present
    Seq(3L, 4L).foreach { id =>
      assert(out(id).getAs[Long]("n_bigrams") == 0L)
      assert(out(id).isNullAt(out(id).fieldIndex("mean_nll_e6")))
    }
    // deterministic under repartition (integer sums are order-free)
    def sums(rows: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
      rows.map { r =>
        val i = r.fieldIndex("sum_nll_e6")
        r.getLong(0) -> (if (r.isNullAt(i)) -1L else r.getLong(i))
      }.toMap
    val out2 = sums(TextAnalysis.bigramSurprisal(d.repartition(5)).collect())
    assert(sums(out.values.toArray) == out2)
  }

  test("sourceDivergence: drifted source scores far above in-distribution ones (t17)") {
    // two sources share the corpus-dominant vocabulary; the third is
    // pure template spam with a disjoint one
    val docs = (
      (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog", "a")) ++
      (21L to 40L).map(i => (i, "the quick brown fox naps under the old dog", "b")) ++
      (41L to 45L).map(i => (i, "buy cheap pills now click here buy cheap", "spam")))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDivergence(docs, topN = 20)
      .collect().map(r => r.getString(0) -> r).toMap
    val klA = out("a").getAs[Long]("kl_e9")
    val klB = out("b").getAs[Long]("kl_e9")
    val klSpam = out("spam").getAs[Long]("kl_e9")
    assert(klSpam > klA && klSpam > klB,
      s"spam KL $klSpam should dominate a=$klA b=$klB")
    // in-distribution sources sit close to the corpus; the drifted one
    // is an order of magnitude away
    assert(klSpam > 2L * math.max(klA, klB))
    // a source with no occurrences still appears (all-smoothing mass)
    val withEmpty = TextAnalysis.sourceDivergence(
      docs.union(Seq((46L, "", "hollow")).toDF("doc_id", "text", "source")),
      topN = 20).filter(col("source") === "hollow").collect()
    assert(withEmpty.length == 1 && withEmpty.head.getAs[Long]("n_obs") == 0L)
  }

  test("zipfSlope: decreasing frequencies slope negative, uniform exactly zero (v9)") {
    // freqs 8,4,2,1 over four terms → strictly decreasing → slope < 0
    val skewed = Seq((1L, (("aa " * 8) + ("bb " * 4) + ("cc " * 2) + "dd").trim))
      .toDF("doc_id", "text")
    val s1 = TextAnalysis.zipfSlope(skewed, topN = 10).collect()(0)
    assert(s1.getAs[Long]("n_terms") == 4L)
    assert(s1.getAs[Double]("zipf_slope") < -0.5)
    // uniform frequencies: y constant → numerator is EXACTLY zero
    val flat = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val s2 = TextAnalysis.zipfSlope(flat, topN = 10).collect()(0)
    assert(s2.getAs[Double]("zipf_slope") == 0.0)
    // single distinct term: denominator zero → null, not a crash
    val one = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val s3 = TextAnalysis.zipfSlope(one, topN = 10).collect()(0)
    assert(s3.isNullAt(s3.fieldIndex("zipf_slope")))
  }

  test("semDedup: in-cluster chains collapse to the earliest id; cross-cluster twins both survive (d14)") {
    // cluster 0: vectors 1,2,3 mutually near-identical (chain), 4 orthogonal
    // cluster 1: vector 5 identical to vector 1 — but scoping means it
    // is never compared against cluster 0, so both survive (that's the
    // SemDeDup trade: the clusterer owns cross-cluster recall)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),
      (3L, Array(0.98f, 0.02f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f)),
      (5L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 1L))
      .toDF("vec_id", "cluster")
    val out = graft.dedup.Dedup.semDedup(emb, assign, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((2L, true)), s"earliest id keeps the cluster: $out")
    assert(out(2L) == ((2L, false)) && out(3L) == ((2L, false)),
      "later chain members drop")
    assert(out(4L) == ((0L, true)), "orthogonal vector untouched")
    assert(out(5L) == ((0L, true)), "cross-cluster twin is out of scope, survives")
  }

  test("removeDupSpans: one dominating hot ngram stays exact (the RefinedWeb stop-ngram case)") {
    // worst case for the old window formulation: ONE boilerplate 9-gram
    // occurring in every document. The min-struct aggregate must keep
    // exactly the global-first copy (doc 1) and strip every other one,
    // including a doc holding two occurrences of the hot span.
    val boiler = "all rights reserved contact us for terms of service"  // 9 words
    // filler words carry the doc index — shared filler would create
    // extra duplicated 9-grams (shared tails like "here with filler
    // tokens all rights reserved ...") and widen the removed range
    // beyond the boiler span itself
    val docs = (1L to 400L).map { i =>
      (i, s"doc$i word$i opens$i uniquely$i here$i with$i filler$i tokens$i $boiler")
    } :+ (401L, s"$boiler again duplicated inside one doc $boiler")
    val cleaned = Dedup.removeDupSpans(docs.toDF("doc_id", "text"), n = 9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(cleaned(1L).getAs[Long]("n_removed") == 0L,
      "global-first occurrence must survive")
    (2L to 400L).foreach { i =>
      assert(cleaned(i).getAs[Long]("n_removed") == 9L, s"doc $i keeps the hot span")
      assert(!cleaned(i).getAs[String]("cleaned_text").contains("rights reserved"))
    }
    assert(cleaned(401L).getAs[Long]("n_removed") == 18L,
      "both later occurrences in one doc must go")
  }

  test("containmentVerify separates engulfing from symmetric near-dup") {
    import spark.implicits._
    val small = "the quick brown fox jumps over the lazy dog tonight"
    val big = small + " and then a very long unrelated tail keeps going " +
      "with plenty of extra words that the small document never mentions at all"
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val pairs = Seq((1L, 2L)).toDF("a_doc_id", "b_doc_id")
    val r = Dedup.containmentVerify(pairs, sh).collect().head
    val (aSz, bSz, inter) = (r.getAs[Long]("a_sz"), r.getAs[Long]("b_sz"),
      r.getAs[Long]("inter"))
    assert(aSz < bSz && inter > 0)
    // A is (nearly) contained in B; B is far from contained in A
    assert(r.getAs[Long]("cont_a_ppm") > 900000L)
    assert(r.getAs[Long]("cont_b_ppm") < 600000L)
    assert(r.getAs[Long]("cont_a_ppm") == inter * 1000000L / aSz)
  }

  test("sourceOverlapMatrix profiles near-dup pairs by unordered source pair") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again ok"
    val docs = Seq(
      (1L, base, "crawlA"), (2L, base, "crawlB"),   // cross-source dup
      (3L, base + "!", "crawlB"),                   // near-dup of 1,2
      (4L, "completely different text about spark plans", "crawlA"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.minHashCandidatePairs(
      Dedup.minHashSignatures(Dedup.shingles(docs, distinct = false)))
    val m = Dedup.sourceOverlapMatrix(pairs, docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 1-2 and 1-3 cross; 2-3 within crawlB
    assert(m(("crawlA", "crawlB")) == 2L)
    assert(m(("crawlB", "crawlB")) == 1L)
    assert(!m.contains(("crawlA", "crawlA")))
    // symmetric pairs must fold onto one unordered key
    assert(m.keys.forall { case (a, b) => a <= b })
  }

  test("mmrRerank skips the near-duplicate of the first pick for a diverse one (e11)") {
    import spark.implicits._
    // probe at origin; c1 closest, c2 a near-dup of c1, c3 farther
    // from the query but far from c1 — MMR must pick c1 then c3
    val corpus = Seq(
      (100L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.01f, 0.0f)),
      (3L, Array(-1.2f, 0.0f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 100L)
    val out = Ann.mmrRerank(Ann.mmrCandidates(corpus, probes, candidateK = 4),
        selectK = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L))
    assert(out(0).isNullAt(out(0).fieldIndex("div_d2"))) // nothing picked yet
    // pure-relevance order would have been c1 then c2
    val pureTop2 = Ann.mmrCandidates(corpus, probes, candidateK = 2)
      .orderBy("rel_d2").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(pureTop2 == Seq(1L, 2L))
  }

  test("noveltyProfile: first holder of a shingle is novel, copies are not (t20)") {
    import spark.implicits._
    val d = Seq(
      (1L, "aaaa bbbb"),        // 5 distinct 5-char shingles, all first here
      (2L, "aaaa bbbb"),        // exact copy: zero novel
      (3L, "aaaa bbbb cccc"))   // extends 1: 10 shingles, 5 first here
      .toDF("doc_id", "text")
    val out = Dedup.noveltyProfile(Dedup.shingles(d, 5))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_ppm"))).toMap
    assert(out(1L) == ((5L, 5L, 1000000L)))
    assert(out(2L) == ((5L, 0L, 0L)))
    assert(out(3L) == ((10L, 5L, 500000L)))
  }
}
