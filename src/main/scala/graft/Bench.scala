package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through a `noop` sink — unlike `count()`,
  * which lets Catalyst prune away projections and per-row work, noop
  * materializes every output row, so the timing covers the real
  * query. local[32] to mirror the driver's execution environment; AQE
  * on (runtime shuffle-partition coalescing + skew handling — the
  * same settings the engine would ship with on a cluster).
  */
/** Pure statistics/serialization helpers for [[Bench]], extracted so
  * the failure-rep semantics are unit-testable: a failed rep is NaN,
  * NaN never enters a median/min/spread/total, and NaN serializes as
  * JSON null (never a fake fast timing).
  */
object BenchStats {
  /** Drop the warm-up rep (index 0) and every failed (NaN) rep.
    * A SINGLE-element vector is a deadline-degraded single-run query
    * (no separate warm-up was affordable): its one rep IS the
    * measurement, so it is kept rather than dropped.
    */
  def measured(v: Vector[Double]): Vector[Double] =
    (if (v.size <= 1) v else v.drop(1)).filterNot(_.isNaN)
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }
  def minOr(v: Vector[Double], d: Double): Double = {
    val m = measured(v); if (m.isEmpty) d else m.min
  }
  def jnum(v: Double): String = if (v.isNaN) "null" else v.toString
  def jmap(m: Seq[(String, Double)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
  def jstr(s: String): String =
    "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                       case c if c < ' ' => " "; case c => c.toString } + "\""

  /** Rep plan under a wall-clock deadline (round-14 verdict #1: two
    * consecutive driver sweeps died rc=124 with a null artifact).
    * Phases by elapsed fraction of the budget:
    *   < 60%          → full plan (warm-up + 2 measured reps for
    *                    sub-cutoff queries, warm-up + 1 past it —
    *                    round-15 verdict #5: the r15 driver sweep
    *                    burned 96% of its deadline; the r12+ rep data
    *                    shows multi-second queries' spread is fixed
    *                    overhead, not jitter, so a second measured rep
    *                    on them adds wall-clock, not information)
    *   60% .. 85%     → warm-up + 1 measured rep
    *   ≥ 85%          → ONE run total (vector of size 1 — see measured)
    * Returned as (nMeasuredReps, singleRunOnly).
    */
  def repPlan(elapsedS: Double, deadlineS: Double,
              warm: Double, slowCutoff: Double): (Int, Boolean) = {
    val frac = if (deadlineS <= 0) 0.0 else elapsedS / deadlineS
    if (frac >= 0.85) (0, true)
    else if (frac >= 0.60) (1, false)
    else if (!warm.isNaN && warm > slowCutoff) (1, false)
    else (2, false)
  }

  /** Spike detector for the warm+1 plan (round-17 verdict #2): with
    * only ONE measured rep backing a >1s query's headline, a single
    * co-tenancy/GC-flood spike (the documented q233 4.9s→17.7s case)
    * lands straight in the total and is indistinguishable from a code
    * regression. A measured rep far above its own warm-up (>3× AND
    * >0.5s absolute — the absolute floor keeps 10ms-scale jitter from
    * triggering confirm reps) earns ONE extra confirm rep, so the
    * min-of-reps headline rests on a non-spike measurement. Purely
    * additive: more reps can only lower (never raise) the min.
    */
  def spikeSuspect(warm: Double, rep: Double): Boolean =
    !warm.isNaN && !rep.isNaN && warm > 0 &&
      rep > 3 * warm && rep - warm > 0.5

  /** Provenance label parsed out of an existing artifact/gate file
    * (round-17 ADVICE: the guard matched only the literal
    * builder-quiet-sweep label, so any OTHER labeled record was still
    * silently clobbered by an unlabeled driver sweep). `None` means
    * the file carries no parseable label.
    */
  def provenanceOf(content: String): Option[String] = {
    val json = "\"provenance\":\"([^\"]*)\"".r
    val txt = "provenance=(\\S+)".r
    json.findFirstMatchIn(content).map(_.group(1))
      .orElse(txt.findFirstMatchIn(content).map(_.group(1)))
  }
}

object Bench {
  import BenchStats._
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Wall-clock budget in seconds. The driver's round budget is ~60
    // min shared with its own work; default to 45 min so a co-tenanted
    // sweep degrades (fewer reps per query) instead of being killed at
    // the budget with NO artifact (r13+r14 both ended rc=124/null).
    val deadlineS = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE_S")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(2700.0)
    val wall0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - wall0) / 1e9
    // AQE coalescing's parallelismFirst — env-tunable for A/B slices.
    // MEASURED r16 (15-query slice, sf0.1): `false` (size partitions
    // by advisory bytes, collapsing toy-SF shuffles to 1 task) is
    // 14% WORSE total (78.9 → 90.0s best, 79.5 → 93.7s median) —
    // task-scheduling overhead is NOT the binding cost at sf0.1;
    // stage parallelism on the shingle/feature explosions is. Default
    // stays `true` (Spark's default).
    val parFirst = sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", parFirst)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once (footer/codegen/JIT warm) so the
    // first timed query doesn't absorb one-time startup costs
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    // Per-query failure ledger (r13 postmortem): a rep that THROWS used
    // to record its time-to-failure as a timing, and min-of-reps then
    // reported a 21s query as "0.02s" (q281/q251/q65 in the driver
    // sweep). A failed rep is now NaN — excluded from every statistic —
    // and the artifact carries a `failures` field with counts + the
    // last exception text so a timeout/kill is diagnosable post hoc.
    val failCount = scala.collection.mutable.LinkedHashMap[String, Int]()
    val failMsg = scala.collection.mutable.LinkedHashMap[String, String]()
    // Per-rep JVM GC time (round-17 verdict #2: make spike reps
    // machine-attributable). Recorded as a parallel vector per query —
    // additive artifact schema; a rep whose gc_ms rivals its wall time
    // was a GC flood, not a code regression.
    import scala.jdk.CollectionConverters._
    def gcMsNow(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val gcReps = scala.collection.mutable.LinkedHashMap[String, Vector[Long]]()
    def timeOnce(spec: QuerySpec): Double = {
      val g0 = gcMsNow()
      val t0 = System.nanoTime()
      val t =
        try {
          spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] ${spec.name} failed: ${e.getMessage}")
          failCount(spec.name) = failCount.getOrElse(spec.name, 0) + 1
          failMsg(spec.name) = String.valueOf(e.getMessage).take(200)
          Double.NaN
        }
      gcReps(spec.name) = gcReps.getOrElse(spec.name, Vector.empty) :+ (gcMsNow() - g0)
      t
    }
    // Hygiene v3 — STORAGE-PRESSURE-TRIGGERED, between REPS as well as
    // queries, always OUTSIDE timed windows. History: localCheckpoint()
    // pins block-manager storage until the checkpointed RDD is GC'd
    // (r15 decomposition: dead checkpoint blocks accumulating across
    // the sweep degraded a 6.9s q292 rep to 83.7s). The cleanup stays
    // GC-DRIVEN (an explicit getPersistentRDDs.unpersist sweep poisons
    // the session-lifetime memoized checkpoints — 28 CC-family queries
    // died CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — while ContextCleaner
    // only ever removes UNREACHABLE RDDs), but r15's fixed every-8th-
    // QUERY cadence was the wrong trigger: a multi-second CDC query
    // creates dead blocks EVERY REP, so its own reps climbed
    // monotonically (q288 10.4 → 17.3 → 26.0s in the r15 quiet sweep)
    // and the whole block of consecutive store-DML queries ran in
    // permanent storage-eviction churn, 2× slower than the same
    // queries at sweep end after a cleanup had landed. v3 checks the
    // block manager's actual storage occupancy after every rep and
    // GCs only past a pressure threshold (default 45% of storage max —
    // eviction churn begins near full, the session-lifetime memo floor
    // is tens of MB): cheap queries never pay a GC pause, accumulating
    // queries get cleaned between reps instead of degrading, and the
    // wall-clock cost is bounded by actual pressure, not cadence.
    val gcFrac = sys.env.get("SPARK_GRAFT_BENCH_GC_FRAC")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.45)
    val gcLog = sys.env.contains("SPARK_GRAFT_BENCH_GC_LOG")
    def storagePair(): (Long, Long) = {
      val s = spark.sparkContext.getExecutorMemoryStatus.values
      (s.map(_._1).sum, s.map(p => p._1 - p._2).sum) // (max, used)
    }
    var sinceGc = 0
    def gcNow(tag: String): Unit = {
      sinceGc = 0
      System.gc() // drives ContextCleaner's weak references
      Thread.sleep(200) // let the async removal queue start draining
      if (gcLog) {
        val (mx, used) = storagePair()
        System.err.println(f"[bench] gc($tag): storage ${used / 1e6}%.0f MB / ${mx / 1e6}%.0f MB")
      }
    }
    def repHygiene(tag: String): Unit =
      if (!sys.env.contains("SPARK_GRAFT_BENCH_NO_UNPERSIST")) {
        val (mx, used) = storagePair()
        if (gcLog)
          System.err.println(f"[bench] $tag: storage ${used / 1e6}%.0f MB / ${mx / 1e6}%.0f MB")
        if (used > gcFrac * mx) gcNow(tag)
      }
    // between queries: the pressure check plus a slow cadence floor
    // (weak-reference hygiene for off-heap/non-storage state the
    // occupancy metric can't see: shuffle files, broadcast blocks,
    // ContextCleaner's reference queue). r16 measurement: block-manager
    // STORAGE never crossed ~2% of max in a full sweep, so the 45%
    // pressure trigger effectively never fires and the floor is the
    // only live trigger — it is therefore tunable
    // (SPARK_GRAFT_BENCH_GC_EVERY), default 12: long 32-query gaps let
    // one natural GC flood the cleaner queue mid-rep (q233 4.9s →
    // 17.7s single-rep spikes in the r16 baseline sweep), while the
    // r15 every-8th cadence's System.gc pauses cost ~+4.7% median-sum.
    val gcEvery = sys.env.get("SPARK_GRAFT_BENCH_GC_EVERY")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(12)
    def dropDeadBlocks(): Unit =
      if (!sys.env.contains("SPARK_GRAFT_BENCH_NO_UNPERSIST")) {
        sinceGc += 1
        if (sinceGc >= gcEvery) gcNow("cadence") else repHygiene("interquery")
      }
    // optional args: restrict to these query names (local iteration;
    // the driver passes none)
    val only = args.toSet
    val specs = SparkEntry.allSpecs
      .filter(s => only.isEmpty || only(s.name))
    val reps = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    // Metric provenance (round-11 advice): "value" changed meaning in
    // round 11 from median-total to min-of-reps total (the judge's
    // prescribed co-tenancy-robust headline). Name the metric version
    // IN the artifact, and label WHICH sweep produced it (the driver's
    // co-tenanted run vs the builder's committed quiet sweep silently
    // shadowed each other in round 11) — builders set
    // SPARK_GRAFT_BENCH_PROVENANCE=builder-quiet-sweep before a
    // committed run; an unlabeled artifact is the driver's.
    val provenance = sys.env.getOrElse("SPARK_GRAFT_BENCH_PROVENANCE", "unlabeled-driver-sweep")
      .flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => ""
                 case c => c.toString } // keep the artifact parseable JSON
    // Provenance guard (round-13 verdict #7): a driver (unlabeled)
    // sweep must not overwrite a committed builder-quiet-sweep artifact
    // in the work tree — it shadowed the quiet numbers every round.
    // Redirect the unlabeled write to <path>.driver.json instead.
    // Resolved ONCE, before the sweep, because the artifact is now
    // flushed incrementally (see writeArtifact).
    // Round-17 ADVICE hardening: protect ANY existing record whose
    // provenance label differs from this run's (not just the literal
    // quiet-sweep label), and treat a read failure as "protected" for
    // an unlabeled sweep — redirecting is always safe, overwriting is
    // not.
    def guardedPath(requested: String, suffix: String): String = {
      val p = java.nio.file.Paths.get(requested)
      val existingLabel: Option[String] =
        try {
          if (!java.nio.file.Files.exists(p)) None
          else provenanceOf(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        } catch { case _: Throwable =>
          if (provenance == "unlabeled-driver-sweep") Some("unreadable") else None
        }
      val protectedByLabel = existingLabel.exists(l =>
        l != provenance && l != "unlabeled-driver-sweep")
      if (provenance == "unlabeled-driver-sweep" && protectedByLabel)
        requested.stripSuffix(suffix) + ".driver" + suffix
      else requested
    }
    val requested = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val outPath = guardedPath(requested, ".json")
    // Degradation markers: the first query run under each reduced plan
    // (null while the full plan held all the way through).
    var degradedWarm1At: Option[String] = None
    var degradedSingleAt: Option[String] = None
    // Serialize CURRENT state into the full artifact JSON. `partial`
    // is true for every mid-sweep flush, false only for the final
    // write — so a killed sweep leaves a parseable artifact that says
    // so (round-14 verdict #1a: r13+r14 driver sweeps both ended
    // rc=124 with `parsed: null`; an artifact flushed after every
    // query makes that outcome impossible).
    def artifactJson(partial: Boolean): String = {
      // TWO summary statistics per query (r10 postmortem): the MEDIAN
      // keeps run-wide drift visible, but one co-tenant-loaded rep
      // mid-sequence still drags it (r9→r10 totals differed 15% on
      // identical code; q213 read 15.4s vs 3.4s steady). The MIN of
      // the measured reps is robust to that — co-tenancy only ever
      // slows a rep, never speeds it — so `best` is the regression
      // metric (the headline "value"); medians stay for drift.
      val results = reps.toSeq.map { case (k, v) => k -> median(measured(v)) }
      val bests = reps.toSeq.map { case (k, v) => k -> minOr(v, Double.NaN) }
      val spreads = reps.toSeq.map { case (k, v) =>
        val m = measured(v)
        k -> (if (m.isEmpty) Double.NaN else m.max - m.min)
      }
      val total = bests.map(_._2).filterNot(_.isNaN).sum
      val medianTotal = results.map(_._2).filterNot(_.isNaN).sum
      val repsJson = reps.toSeq.map { case (k, v) =>
        "\"" + k + "\":" + v.map(jnum).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val failuresJson = failCount.toSeq.map { case (k, n) =>
        "\"" + k + "\":{\"count\":" + n + ",\"last_error\":" + jstr(failMsg.getOrElse(k, "")) + "}"
      }.mkString("{", ",", "}")
      val gcJson = gcReps.toSeq.map { case (k, v) =>
        "\"" + k + "\":" + v.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val degradeJson = "{\"warm1_at\":" +
        degradedWarm1At.map(jstr).getOrElse("null") +
        ",\"single_at\":" + degradedSingleAt.map(jstr).getOrElse("null") + "}"
      s"""{"metric":"total","metric_version":"min_of_reps_v3","rep_plan":"headroom_v5","provenance":"$provenance","partial":$partial,"value":$total,"unit":"sec","median_total":$medianTotal,"n_done":${reps.size},"n_planned":${specs.size},"elapsed_s":${math.rint(elapsedS * 10) / 10},"deadline_s":$deadlineS,"degraded":$degradeJson,"n_failures":${failCount.values.sum},"failures":$failuresJson,"queries":${jmap(bests)},"medians":${jmap(results)},"spreads":${jmap(spreads)},"reps":$repsJson,"gc_ms":$gcJson,"sf":"$sfDir","cpus":$cpus}"""
    }
    def writeArtifact(partial: Boolean): Unit =
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath), artifactJson(partial) + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    // rep 0 = warm-up (recorded, excluded from the median); failed reps
    // (NaN) are excluded from every statistic — see BenchStats.measured.
    // 1 WARM-UP rep (discarded) + measured reps / MEDIAN per query.
    // The r8 postmortem: a first rep carries JIT + shuffle-service +
    // codegen-cache warm-up that a 3-rep median does NOT shed, so rep 0
    // is recorded but never folded into the median. Wall-clock budget
    // (r15 verdict #5 — the r15 driver sweep finished at 96% of its
    // deadline; one more round of registry growth re-creates the
    // rc=124 risk): sub-second queries get warm + 2 measured reps,
    // anything whose warm-up exceeds SLOW_CUTOFF gets warm + 1 — the
    // per-rep data across r12..r15 sweeps shows multi-second queries'
    // spread is fixed overhead (commit chains, state build), not
    // jitter, so extra reps on them buy wall-clock, not information.
    // The slowest-5 second pass below still adds 2 reps to the
    // queries that dominate the total, so the headline min for those
    // rests on 3+ measured reps. On top of that, the DEADLINE phases
    // (repPlan) shrink the plan as the wall-clock budget burns down.
    val SlowCutoff = 1.0
    specs.foreach { spec =>
      // Probe the phase BEFORE spending the warm-up: in the ≥85% phase
      // a query gets exactly one execution, recorded as its own
      // measurement (vector of size 1 — BenchStats.measured keeps it).
      val (_, singleOnlyPre) = repPlan(elapsedS, deadlineS, 0.0, SlowCutoff)
      if (singleOnlyPre) {
        if (degradedSingleAt.isEmpty) {
          degradedSingleAt = Some(spec.name)
          System.err.println(s"[bench] deadline ${deadlineS}s ${math.rint(elapsedS)}s elapsed: single-run mode from ${spec.name}")
        }
        reps(spec.name) = Vector(timeOnce(spec))
      } else {
        val warm = timeOnce(spec)
        val (nMeasured, singleOnly) = repPlan(elapsedS, deadlineS, warm, SlowCutoff)
        if (singleOnly) {
          // crossed 85% during the warm-up: keep the warm-up as the
          // single measurement rather than spending another run
          if (degradedSingleAt.isEmpty) degradedSingleAt = Some(spec.name)
          reps(spec.name) = Vector(warm)
        } else {
          // warm+1 is deadline DEGRADATION only past the 60% phase —
          // pre-deadline it is the normal plan for slow queries (v4);
          // deadlineS <= 0 disables the deadline, so it can never
          // degrade (round-17 ADVICE: the flag fired vacuously there)
          if (nMeasured == 1 && deadlineS > 0 && elapsedS >= 0.60 * deadlineS &&
              degradedWarm1At.isEmpty) {
            degradedWarm1At = Some(spec.name)
            System.err.println(s"[bench] deadline ${deadlineS}s ${math.rint(elapsedS)}s elapsed: warm+1 mode from ${spec.name}")
          }
          // inter-REP hygiene: clean the previous rep's dead blocks
          // BEFORE the next timed window, so an accumulating query's
          // reps measure the query, not its own garbage (hygiene v3)
          repHygiene(spec.name)
          val measuredV = Vector.fill(nMeasured) {
            val t = timeOnce(spec); repHygiene(spec.name); t
          }
          // spike-confirm rep (round-17 verdict #2): a measured rep far
          // above its own warm-up gets ONE extra rep so the headline
          // min never rests solely on a co-tenancy/GC spike. Additive:
          // extra reps only ever LOWER a min.
          val confirmed =
            if (measuredV.exists(t => spikeSuspect(warm, t))) {
              System.err.println(s"[bench] ${spec.name}: spike rep " +
                f"(warm ${warm}%.2fs, reps ${measuredV.mkString(",")}) — confirm rep")
              measuredV :+ { val t = timeOnce(spec); repHygiene(spec.name); t }
            } else measuredV
          reps(spec.name) = warm +: confirmed
        }
      }
      dropDeadBlocks()
      writeArtifact(partial = true)
    }
    // second pass over the 10 slowest (by min — the robust rank): 2
    // extra reps each, so every query that can dominate the total has
    // its headline min rest on 3+ measured reps (round-17 ADVICE: at
    // slowest-5 the mid-tier >1s queries' mins rested on a single
    // warm+1 rep). Skipped entirely once the deadline is past 60% —
    // extra reps on the slowest queries are the most expensive
    // statistics in the sweep.
    if (deadlineS <= 0 || elapsedS < 0.60 * deadlineS) {
      val worst = reps.toSeq.sortBy { case (_, v) => -minOr(v, Double.NegativeInfinity) }
        .take(10).map(_._1).toSet
      specs.filter(s => worst(s.name)).foreach { spec =>
        reps(spec.name) = reps(spec.name) ++ Vector.fill(2) {
          val t = timeOnce(spec); repHygiene(spec.name); t
        }
        writeArtifact(partial = true)
      }
    }
    writeArtifact(partial = false)
    // Gate-record summary (round-14 verdict #8: NOTES.md's gate record
    // shipped as BENCH_TOTAL_PLACEHOLDER because filling it was a
    // hand-edit). One splice-ready line, written by the sweep itself.
    val bests = reps.toSeq.map { case (k, v) => k -> minOr(v, Double.NaN) }
    val total = bests.map(_._2).filterNot(_.isNaN).sum
    val medianTotal = reps.toSeq.map { case (k, v) => median(measured(v)) }
      .filterNot(_.isNaN).sum
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    // same provenance guard as the artifact (r15: the committed quiet
    // gate record was silently overwritten by the driver sweep and had
    // to be retro-filled from BENCH_LOCAL.json)
    val gatePath =
      guardedPath(sys.env.getOrElse("SPARK_GRAFT_BENCH_GATE", "BENCH_GATE.txt"), ".txt")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(gatePath),
      s"bench gate: total(best)=${r3(total)}s median_total=${r3(medianTotal)}s " +
      s"n_queries=${reps.size}/${specs.size} n_failures=${failCount.values.sum} " +
      s"elapsed=${math.rint(elapsedS)}s deadline=${deadlineS}s " +
      s"degraded_warm1=${degradedWarm1At.getOrElse("-")} degraded_single=${degradedSingleAt.getOrElse("-")} " +
      s"provenance=$provenance sf=$sfDir cpus=$cpus\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $gatePath failed: $e") }
    // stdout line must FIT the tail window to stay parseable: report
    // the slowest 25 queries at ms resolution (the ones worth a
    // round-over-round diff) and point at the file for the rest.
    val slowest = bests.filterNot(_._2.isNaN).sortBy(-_._2).take(25)
      .map { case (k, v) => k -> r3(v) }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","median_total":${r3(medianTotal)},"n_failures":${failCount.values.sum},"queries":${jmap(slowest)},"n_queries":${reps.size},"full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
