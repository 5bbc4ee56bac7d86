package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = (0L until 1000L).map(i => (i, i * 7)).toDF("doc_id", "n_tokens")

  test("hash sampling is deterministic, uniform-ish, and stable under repartition") {
    val s1 = Curation.sampleByHash(docs, col("doc_id"), 128)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Curation.sampleByHash(docs.repartition(7), col("doc_id"), 128)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)                              // membership is content-only
    assert(s1.size > 400 && s1.size < 600)        // ≈ half of 1000
    // sub-sampling nests: a stricter threshold selects a subset
    val s3 = Curation.sampleByHash(docs, col("doc_id"), 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1))
  }

  test("split assignment partitions the corpus consistently with buckets") {
    val out = docs.select(col("doc_id"),
      Curation.hashBucket(col("doc_id")).as("b"),
      Curation.assignSplit(col("doc_id")).as("split")).collect()
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 256))
    out.foreach { r =>
      val expect = if (r.getInt(1) < 230) "train" else if (r.getInt(1) < 243) "val" else "test"
      assert(r.getString(2) == expect)
    }
    val counts = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(counts("train") > counts("val") && counts("val") > 0 && counts("test") > 0)
  }

  test("token sharding: monotone shard ids, budget respected, big doc gets one shard") {
    val sizes = Seq((1L, 900L), (2L, 900L), (3L, 900L), (4L, 5000L), (5L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Curation.packShards(sizes, "n_tokens", 1000L)
      .orderBy("doc_id").collect()
    val shards = out.map(_.getAs[Long]("shard")).toSeq
    assert(shards == shards.sorted)               // non-decreasing in pack order
    assert(shards.head == 0L)
    // doc4 (5000 tokens > budget) occupies its shard id ALONE
    assert(out.count(_.getAs[Long]("shard") == shards(3)) == 1)
    // shard boundaries respect the cumulative offsets: doc2 starts at 900 -> shard 0
    assert(out(1).getAs[Long]("shard") == 0L)
    assert(out(2).getAs[Long]("shard") == 1L)     // starts at 1800
    // ids skip after the oversized doc: doc5 starts at 7700 -> shard 7
    assert(out(4).getAs[Long]("shard") == 7L)
  }

  test("token sharding runs multi-task (no global single-partition window)") {
    val many = (0L until 5000L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tokens")
      .repartition(8)
    val packed = Curation.packShards(many, "n_tokens", 500L)
    // every Window in the plan is partitioned (no Window.orderBy(global)
    // that would serialize the frame through a single task; AQE may
    // still coalesce this tiny test data to one partition at runtime)
    val wins = packed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
    // and the result is identical to the single-window formulation
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = many
      .withColumn("shard",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 500L).cast("long"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getAs[Long]("shard")))
    val got = packed.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("shard")))
    assert(got.toSeq == expected.toSeq)
  }

  test("chunkWindows: overlap stride, short/empty docs, full coverage, no shuffle") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // short -> 1 chunk
      (3L, "   "),                                    // empty -> no chunks
      (4L, (1 to 11).map(i => s"u$i").mkString(" "))) // last chunk short
      .toDF("doc_id", "text")
    val out = Curation.chunkWindows(docs, maxTokens = 4, overlap = 1)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      (r.getInt(2), r.getString(3))).toMap

    // w=4, stride=3: n=10 -> chunks [1-4][4-7][7-10]; consecutive
    // chunks share exactly `overlap` tokens
    assert(rows((1L, 0)) == ((4, "t1 t2 t3 t4")))
    assert(rows((1L, 1)) == ((4, "t4 t5 t6 t7")))
    assert(rows((1L, 2)) == ((4, "t7 t8 t9 t10")))
    assert(rows((2L, 0)) == ((2, "a b")))
    assert(!rows.keySet.exists(_._1 == 3L))          // empty doc absent
    // n=11 -> 4 chunks, last = [10-11], short but non-empty
    assert(rows((4L, 3)) == ((2, "u10 u11")))
    // every source token appears in at least one chunk (coverage)
    val covered = rows.collect { case ((d, _), (_, txt)) if d == 1L => txt }
      .flatMap(_.split(" ")).toSet
    assert((1 to 10).forall(i => covered(s"t$i")))
    // embarrassingly parallel: no exchange anywhere in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("seededShuffle: a deterministic permutation, stable under repartition") {
    val out = Curation.seededShuffle(docs, "doc_id", "s1")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dense 0..n-1 permutation
    assert(out.values.toSeq.sorted == (0L until 1000L))
    // same seed + any partitioning -> identical order
    val again = Curation.seededShuffle(docs.repartition(13), "doc_id", "s1")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
    // a different seed produces a genuinely different order
    val other = Curation.seededShuffle(docs, "doc_id", "s2")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other != out)
    // shuffled, not sorted: the identity order would be astronomically
    // unlikely under md5
    assert(out.count { case (id, pos) => id == pos } < 10)
    // no single-task global window in the plan
    val windows = Curation.seededShuffle(docs, "doc_id", "s1")
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("sourceMix: epoch fan-out matches weights; fractional epoch nests by hash") {
    val mixed = Curation.sourceMix(
      docs.withColumn("src", concat(lit("s"), col("doc_id") % 2)),
      "doc_id", "src",
      Map("s0" -> ((2, 128)), "s1" -> ((0, 64))), default = (1, 0))
    val byEpoch = mixed.groupBy("src", "epoch").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // s0: two full epochs of all 500 + a ~half fractional epoch
    assert(byEpoch(("s0", 0L)) == 500L && byEpoch(("s0", 1L)) == 500L)
    assert(byEpoch(("s0", 2L)) > 200L && byEpoch(("s0", 2L)) < 300L)
    // s1: no full epoch, only a ~quarter fractional epoch
    assert(!byEpoch.contains(("s1", 1L)))
    assert(byEpoch(("s1", 0L)) > 75L && byEpoch(("s1", 0L)) < 175L)
    // deterministic: same call twice -> identical multiset
    val a = mixed.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = Curation.sourceMix(
      docs.withColumn("src", concat(lit("s"), col("doc_id") % 2)).repartition(5),
      "doc_id", "src",
      Map("s0" -> ((2, 128)), "s1" -> ((0, 64))), default = (1, 0))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a == b)
    // zero shuffles: bounded explode + scan-level filter only
    assert(!mixed.queryExecution.executedPlan.toString.contains("Exchange"))
    // a (0, 0) weight drops its stratum entirely
    val dropped = Curation.sourceMix(
      docs.withColumn("src", concat(lit("s"), col("doc_id") % 2)),
      "doc_id", "src", Map("s0" -> ((0, 0))), default = (1, 0))
    assert(dropped.filter(col("src") === "s0").count() == 0)
    assert(dropped.filter(col("src") === "s1").count() == 500)
  }

  test("curriculumOrder: stages strictly ordered, seeded shuffle within, dense global positions") {
    val staged = docs.withColumn("bucket", col("doc_id") % 4)
    val out = Curation.curriculumOrder(staged, "bucket", "doc_id", "s1")
      .select("doc_id", "bucket", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(out.map(_._3).toSeq == (0L until 1000L), "positions dense from 0")
    // buckets never interleave: all of stage 0 precedes all of stage 1...
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(identity).toSeq,
      "curriculum stages must be globally ordered")
    // within a stage, the order IS the seeded shuffle of that stage
    val within = out.filter(_._2 == 1L).map(_._1).toSeq
    val expected = Curation.seededShuffle(
      staged.filter(col("bucket") === 1L), "doc_id", "s1")
      .orderBy("pos").collect().map(_.getLong(0)).toSeq
    assert(within == expected, "intra-stage order must match the seeded shuffle")
    // stable under repartitioning; windows stay partition-scoped
    val again = Curation.curriculumOrder(staged.repartition(7), "bucket", "doc_id", "s1")
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall { case (id, _, p) => again(id) == p })
    val windows = Curation.curriculumOrder(staged, "bucket", "doc_id", "s1")
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "no single-task global window")
  }

  test("sourceMixByWeights: data-driven weight table matches the literal map exactly") {
    val strat = docs.withColumn("src", concat(lit("s"), col("doc_id") % 2))
    val literal = Curation.sourceMix(strat, "doc_id", "src",
      Map("s0" -> ((2, 128)), "s1" -> ((0, 64))), default = (1, 0))
      .select("doc_id", "epoch")
    val weights = Seq(("s0", 2, 128), ("s1", 0, 64)).toDF("src", "copies", "frac")
    val driven = Curation.sourceMixByWeights(strat, "doc_id", "src",
      weights, default = (1, 0))
      .select("doc_id", "epoch")
    assert(driven.exceptAll(literal).count() == 0 &&
      literal.exceptAll(driven).count() == 0,
      "the two forms must admit identical (doc, epoch) multisets")
    // strata missing from the table fall back to the default
    val partial = Curation.sourceMixByWeights(strat, "doc_id", "src",
      weights.filter(col("src") === "s0"), default = (0, 256))
    assert(partial.filter(col("src") === "s1").count() == 500,
      "default (0,256) keeps the unlisted stratum whole, once")
    // the weight side broadcasts; the corpus never shuffles
    val plan = driven.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast, plan:\n${plan.take(1500)}")
    assert(!plan.contains("ShuffleExchange"),
      "the corpus side must stay shuffle-free")
  }

  test("weightedSampleByHash: keep rate tracks the weight; samples nest monotonically (c9)") {
    val ids = (1L to 2000L).map(Tuple1(_)).toDF("id")
    def kept(w: Double): Set[Long] =
      Curation.weightedSampleByHash(ids.withColumn("w", lit(w)), col("id"), col("w"))
        .collect().map(_.getLong(0)).toSet
    val all = kept(1.0); val half = kept(0.5); val threeQ = kept(0.75)
    val none = kept(0.0)
    assert(all.size == 2000 && none.isEmpty)
    // content-hash membership nests: a higher weight only ADDS rows
    assert(half.subsetOf(threeQ) && threeQ.subsetOf(all))
    // keep rate ≈ weight (md5 buckets are uniform; wide tolerance)
    assert(math.abs(half.size / 2000.0 - 0.5) < 0.05)
    assert(math.abs(threeQ.size / 2000.0 - 0.75) < 0.05)
  }

  test("epochAllocation: exact integer repeat plan; unweighted and empty sources degrade safely (c10)") {
    val docs = Seq(
      ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // a: 10 tokens
      ("b", "w1 w2 w3 w4 w5"),                 // b: 5 tokens
      ("c", "w1 w2"),                          // c: no weight row
      ("d", ""))                               // d: zero tokens
      .toDF("source", "text")
    val weights = Seq(("a", 2L), ("b", 1L), ("d", 1L)).toDF("source", "weight")
    // tot = 4; budget 30: a → 15 desired = 1 epoch + rem 5 → 128/256
    //                     b → 7 desired = 1 epoch + rem 2 → 102/256
    //                     d → 7 desired but 0 tokens → all zero
    val out = Curation.epochAllocation(docs, weights, budgetTokens = 30L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("desired_tokens") == 15L)
    assert(out("a").getAs[Long]("full_epochs") == 1L)
    assert(out("a").getAs[Long]("extra_rate256") == 128L)
    assert(out("b").getAs[Long]("desired_tokens") == 7L)
    assert(out("b").getAs[Long]("full_epochs") == 1L)
    assert(out("b").getAs[Long]("extra_rate256") == 102L) // (2*256) DIV 5
    assert(out("c").getAs[Long]("weight") == 0L)
    assert(out("c").getAs[Long]("desired_tokens") == 0L)
    assert(out("d").getAs[Long]("src_tokens") == 0L)
    assert(out("d").getAs[Long]("full_epochs") == 0L &&
      out("d").getAs[Long]("extra_rate256") == 0L)
  }

  test("decontaminate: leaking train docs dropped at the integer threshold (x4)") {
    // shingles: train doc 1 shares 3/10 grams with eval (30% > 20% ->
    // drop), doc 2 shares 1/10 (10% -> keep), doc 3 clean
    val shingled = (
      (1 to 10).map(i => (1L, if (i <= 3) s"ev$i" else s"a$i")) ++
      (1 to 10).map(i => (2L, if (i <= 1) s"ev$i" else s"b$i")) ++
      (1 to 10).map(i => (3L, s"c$i")) ++
      (1 to 5).map(i => (9L, s"ev$i"))) // the eval doc
      .toDF("doc_id", "shingle")
    val splits = Seq((1L, "train"), (2L, "train"), (3L, "train"), (9L, "val"))
      .toDF("doc_id", "split")
    val out = Curation.decontaminate(shingled, splits, maxPermille = 200)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // only train docs judged
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Long]("n_eval_hits") == 3L)
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("keep") &&
      out(3L).getAs[Long]("n_eval_hits") == 0L)
    // exact boundary: 2/10 = the 200-permille threshold -> KEEP
    // ("maxPermille" is the maximum ALLOWED contamination, inclusive —
    // strict < made maxPermille = 0 drop even zero-hit docs)
    val boundaryDocs = (1 to 10).map(i => (1L, if (i <= 2) s"ev$i" else s"a$i"))
      .toDF("doc_id", "shingle")
      .union(Seq((9L, "ev1"), (9L, "ev2")).toDF("doc_id", "shingle"))
    val boundarySplits = Seq((1L, "train"), (9L, "val")).toDF("doc_id", "split")
    val boundary = Curation.decontaminate(boundaryDocs, boundarySplits,
      maxPermille = 200).collect().head
    assert(boundary.getAs[Boolean]("keep"))
    // one permille under the doc's contamination drops it
    assert(!Curation.decontaminate(boundaryDocs, boundarySplits,
      maxPermille = 199).collect().head.getAs[Boolean]("keep"))
    // zero tolerance: ANY hit drops, a clean doc survives
    val zero = Curation.decontaminate(
      boundaryDocs.union(Seq((2L, "clean")).toDF("doc_id", "shingle")),
      boundarySplits.union(Seq((2L, "train")).toDF("doc_id", "split")),
      maxPermille = 0).collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(!zero(1L) && zero(2L),
      s"zero tolerance must drop any-hit docs but keep clean ones: $zero")
  }

  test("vocabCoverage: exact cumulative coverage, budgets past the vocab saturate (v10)") {
    // vocabulary: w1 x 8, w2 x 4, w3 x 2, w4 x 1 -> total 15
    val docs = Seq((1L, "w1 w1 w1 w1 w1 w1 w1 w1 w2 w2 w2 w2 w3 w3 w4"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, budgets = Seq(1, 2, 16))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("covered") == 8L)
    assert(out(2L).getAs[Long]("covered") == 12L)
    assert(out(2L).getAs[Double]("coverage") == 0.8)
    // budget beyond vocab: all 4 terms, full coverage
    assert(out(16L).getAs[Long]("n_terms") == 4L)
    assert(out(16L).getAs[Long]("covered") == 15L)
    assert(out(16L).getAs[Double]("coverage") == 1.0)
  }

  test("importanceWeights: target-like docs score above off-target ones (c11)") {
    // target docs share a distinctive bigram vocabulary; raw corpus has
    // a disjoint one. A held-out doc WRITTEN LIKE the target must score
    // higher than one written like the background.
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta gamma delta alpha beta", true)) ++
      (21L to 40L).map(i => (i, "red green blue yellow red green", false)) ++
      Seq((41L, "alpha beta gamma delta", false),   // target-like held-out
          (42L, "red green blue yellow", false)))   // background-like
      .toDF("doc_id", "text", "tgt")
    val out = Curation.importanceWeights(docs, col("tgt"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val likeTarget = out(41L).getAs[Long]("mean_w_e6")
    val likeRaw = out(42L).getAs[Long]("mean_w_e6")
    assert(likeTarget > 0 && likeRaw < 0 && likeTarget > likeRaw)
    // empty doc: no bigrams, null scores, still present
    val empty = Curation.importanceWeights(
      docs.union(Seq((43L, "", false)).toDF("doc_id", "text", "tgt")),
      col("tgt")).filter(col("doc_id") === 43L).collect()(0)
    assert(empty.getAs[Long]("n_bigrams") == 0L && empty.isNullAt(3))
  }

  test("temperatureMix: sqrt-share lifts small sources; rates are exact integers (c12)") {
    // 400 vs 100 vs 25 docs: raw shares 16:4:1, sqrt shares 4:2:1
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 500L).map(i => (i, "mid")) ++
      (501L to 525L).map(i => (i, "small"))).toDF("doc_id", "source")
    val bySrc = Curation.temperatureMix(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    // q = floor(sqrt(n)*1000): 20000, 10000, 5000 -> sum 35000
    assert(bySrc("big").getAs[Long]("q") == 20000L)
    assert(bySrc("mid").getAs[Long]("q") == 10000L)
    assert(bySrc("small").getAs[Long]("q") == 5000L)
    // mixture share prop. to sqrt(count); admission rate = qmin/q
    assert(bySrc("big").getAs[Long]("share_e6") == 20000L * 1000000L / 35000L)
    assert(bySrc("big").getAs[Long]("rate_e6") == 5000L * 1000000L / 20000L)
    assert(bySrc("small").getAs[Long]("rate_e6") == 1000000L)
    // smallest source passes whole; the giant is sqrt-downsampled, so
    // its admitted FRACTION is ~rate (0.25) while small keeps ~all
    val admBig = bySrc("big").getAs[Long]("n_admitted").toDouble / 400
    val admSmall = bySrc("small").getAs[Long]("n_admitted").toDouble / 25
    assert(admSmall > 0.9 && admBig < 0.4 && admSmall > admBig)
    // resulting mixture is flattened toward sqrt shares: output ratio
    // big:small ~ 4:1 instead of the raw 16:1
    val outBig = bySrc("big").getAs[Long]("n_admitted").toDouble
    val outSmall = bySrc("small").getAs[Long]("n_admitted").toDouble
    assert(outBig / outSmall < 8.0)
  }

  test("semanticContamination: banded probe finds paraphrase-level leaks, reports absence too (x3)") {
    val emb = Seq(
      (1L, Array(1.0f, 1.0f)),    // train
      (10L, Array(0.9f, 0.95f)),  // eval: same buckets, cos ≈ 1 → hit
      (11L, Array(-1.0f, -1.0f)), // eval: opposite buckets → no candidates
      (12L, Array(1.0f, -1.0f)))  // eval: band-0 collision, cos = 0 → no hit
      .toDF("vec_id", "embedding")
    val splits = Seq((1L, "train"), (10L, "val"), (11L, "test"), (12L, "val"))
      .toDF("vec_id", "split")
    val out = Curation.semanticContamination(emb, splits,
        threshold = 0.25, bands = Seq(Seq(1), Seq(2)))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(10L, 11L, 12L), "train rows must not appear")
    assert(out(10L).getAs[Long]("n_hits") == 1L)
    assert(out(10L).getAs[Long]("best_train_id") == 1L)
    assert(out(10L).getAs[Double]("best_cosine") > 0.99)
    assert(out(11L).getAs[Long]("n_candidates") == 0L &&
      out(11L).getAs[Long]("n_hits") == 0L)
    assert(out(11L).isNullAt(out(11L).fieldIndex("best_train_id")))
    assert(out(12L).getAs[Long]("n_candidates") == 1L &&
      out(12L).getAs[Long]("n_hits") == 0L)
  }

  test("gopherQuality: rule gate fires on the textbook failure modes") {
    // 16 words / 60 word-chars per repeat -> mean 3.75, 4 distinct stopwords
    val good = ("the quick brown fox jumped over the lazy dogs and ran into a house of cards " * 4).trim
    val cases = Seq(
      (1L, good),                                  // passes every rule
      (2L, "short text of the and"),               // too few words
      (3L, ("a " * 60).trim),                      // mean word len < 3
      (4L, (1 to 60).map(_ => "123456").mkString(" ")), // no alpha words
      (5L, ("the quick brown fox jumped over lazy dogs " * 8).trim + " ### ### ### ### ### ###"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(cases)
      .select("doc_id", "gopher_pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L))
    assert(!out(2L) && !out(3L) && !out(4L))
    assert(!out(5L))                               // symbol ratio > 10%
    // all-measure sanity on the passing doc
    val m = TextAnalysis.gopherQuality(cases.filter(col("doc_id") === 1))
      .collect().head
    assert(m.getAs[Long]("n_words") == 64L)
    assert(m.getAs[Long]("distinct_stopwords") >= 2L)
    assert(m.getAs[Long]("alpha_word_frac_scaled") == 10000L)
  }

  test("exactKPerStratum returns exactly k per stratum, stable and nested") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val k5 = Curation.exactKPerStratum(df, col("source"), col("doc_id"), 5)
      .collect()
    assert(k5.length == 15)
    assert(k5.groupBy(_.getString(1)).values.forall(_.length == 5))
    // repartitioning must not change membership
    val k5b = Curation.exactKPerStratum(df.repartition(7), col("source"),
      col("doc_id"), 5).collect().map(_.getLong(0)).toSet
    assert(k5b == k5.map(_.getLong(0)).toSet)
    // k=3 sample nests inside k=5 (same hash order prefix)
    val k3 = Curation.exactKPerStratum(df, col("source"), col("doc_id"), 3)
      .collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(k5b))
  }

  test("exactKPerStratum compiles to WindowGroupLimit") {
    val df = (0L until 100L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val p = Curation.exactKPerStratum(df, col("source"), col("doc_id"), 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("quantileBins gives equal-frequency bins with ordered edges") {
    val df = (0L until 800L).map(i => (i, i / 2)).toDF("doc_id", "v")
    val out = Curation.quantileBins(df, "v", 8)
    val sizes = out.groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    // uniform input → near-equal bins (interpolated edges may put the
    // boundary value on either side by at most one repeat group)
    assert(sizes.values.forall(n => n >= 98 && n <= 102), sizes)
    // bins are ordered: every value in bin b is <= every value in b+1
    val byBin = out.groupBy("bin").agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("bin").collect()
    byBin.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) <= b.getLong(1))
    }
  }
}
