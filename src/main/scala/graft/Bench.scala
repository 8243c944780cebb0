package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass (trivial job + one parquet scan)
  * runs first so JVM/codegen startup isn't attributed to whichever query
  * happens to run first; queries run in sorted name order for run-to-run
  * comparability.
  *
  * SPARK_GRAFT_REPEAT=N (default 3) runs each query N times back-to-back
  * and reports the per-query MEDIAN: single-pass numbers on this box swing
  * up to 9x on identical code (page-cache / run-order effects measured
  * across three rounds), so one sample can neither catch nor clear a real
  * regression. The JSON line is also written to target/bench.json so the
  * last run survives the console scrollback.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local[32] per the engine's contract (the machine has 32 cores);
    // SPARK_GRAFT_CPUS narrows it for low-variance local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM + codegen + parquet reader init. A bare count() reads
    // only footers — aggregate over every column so the DATA pages are
    // actually decoded (and OS-page-cached): otherwise whichever query
    // first touches a big string/array column pays the cold IO and the
    // per-query numbers become run-order-dependent.
    // The warmup doubles as a CALIBRATION probe: its duration on an idle
    // box is a stable constant (fixed work, fixed data), so an inflated
    // value in the artifact flags machine contention during the run —
    // round 12's driver artifact silently absorbed ~2x contention and the
    // headline number was uninterpretable without a constant like this.
    // 1-minute load BEFORE the warmup ramps this JVM's 32 threads up:
    // a high value here means the machine was already busy at bench start
    val loadAvg: Option[Double] =
      try {
        val s = Files.readString(Paths.get("/proc/loadavg")).trim
        s.split("\\s+").headOption.flatMap(_.toDoubleOption)
      } catch { case _: Exception => None }
    val calibT0 = System.nanoTime()
    val _ = spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach { n =>
      val t = Tables(spark, sfDir, n)
      // bit_xor, not sum: ANSI mode overflows on summed full-range hashes
      t.selectExpr(s"bit_xor(xxhash64(${t.columns.mkString(", ")}))").collect()
    }
    val calibSec = (System.nanoTime() - calibT0) / 1e9
    // SPARK_GRAFT_ONLY=x04,x05 runs just the named (prefix-matched)
    // queries — for local iteration; the driver never sets it. Trim each
    // name and warn on an empty match (a typo'd filter would otherwise
    // silently bench nothing), mirroring Verify.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
    // default 3: medians, not single-pass samples — the driver sets no env,
    // so the default IS the driver's measurement policy
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT")
      .flatMap(_.trim.toIntOption).filter(_ >= 1).getOrElse(3)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    if (selected.isEmpty)
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_ONLY=${only.fold("")(_.mkString(","))} matched no queries")
    // INTERLEAVED calibration: one startup probe cannot attribute
    // contention that arrives mid-run — r16's driver artifact read x125
    // at 25.6 s vs 15.2 s local on identical code, and only a manual
    // rebuild-and-reprobe ritual could prove it was the box. A cheap
    // fixed CPU-bound probe (same plan every time, codegen-cached after
    // the first) runs before every PROBE_EVERY queries within each
    // pass; each query measurement is paired with its segment's probe.
    // time/probe is then a dimensionless "calib unit" that divides box
    // contention out of BOTH intra-run windows and cross-round box
    // drift — the self-attributing series the raw seconds can't be.
    val ProbeEvery = 16
    def probeSec(): Double = {
      val t0 = System.nanoTime()
      spark.range(16000000L).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm the probe's codegen once: the first compilation costs ~4x the
    // steady-state probe, and an inflated FIRST probe would silently
    // deflate every unit in the run's first segment
    val _warmProbe = probeSec()
    // Repeat the WHOLE suite (not each query back-to-back): cross-query
    // memo amortization (shared shingle tables etc.) is part of the
    // per-query cost profile the driver's single pass sees, so each pass
    // must start from a cleared memo and replay the same run order.
    val passTimes: Seq[Map[String, (Double, Option[String], Double)]] =
      (1 to repeat).map { p =>
        if (p > 1) {
          graft.operators.ExtensionQueries.clearMemo()
          graft.operators.Contamination.clearMemo()
          graft.operators.SketchQueries.clearMemo()
          graft.operators.BpeQueries.clearMemo()
          graft.operators.Pq.clearMemo()
          graft.operators.IvfPq.clearMemo()
          graft.operators.Opq.clearMemo()
          graft.operators.Pca.clearMemo()
          graft.operators.UnigramLm.clearMemo()
          graft.operators.RetrievalQueries.clearMemo()
          graft.operators.QualityClassifier.clearMemo()
          graft.operators.KnnGraph.clearMemo()
          graft.operators.DomainMixture.clearMemo()
          spark.catalog.clearCache()
          // localCheckpoint blocks (Dedup/BPE iteration state) are NOT
          // dropped by clearCache; left in place they GC-pressure later
          // passes (the ScaleCheck lesson)
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        }
        var segProbe = 0.0
        selected.zipWithIndex.map { case ((name, fn), i) =>
          if (i % ProbeEvery == 0) segProbe = probeSec()
          val t0 = System.nanoTime()
          // a failed query must surface as an error, never as a fast success
          val err = try { fn(spark, sfDir).count(); None } catch {
            case e: Throwable =>
              Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
          val dt = (System.nanoTime() - t0) / 1e9
          // operators cache intermediates (shingle tables etc.); drop them
          // so accumulated cache doesn't GC-pressure later queries
          spark.catalog.clearCache()
          name -> (dt, err, segProbe)
        }.toMap
      }
    def medianOf(xs: Seq[Double]): Double = {
      val sorted = xs.sorted
      if (sorted.size % 2 == 1) sorted(sorted.size / 2)
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
    }
    val results = selected.map { case (name, _) =>
      val passes = passTimes.map(_(name))
      // median of the passes (mean of the middle two when even) — robust
      // to one cold-IO outlier in a way min/mean are not
      val sorted = passes.map(_._1).sorted
      val median = medianOf(sorted)
      // calib units: each pass's time divided by ITS OWN segment probe,
      // then the median — a contended window inflates numerator and
      // denominator together, so the unit survives what the seconds
      // can't (the normalization rule the r16 verdict asked for)
      val units = medianOf(passes.map(t => t._1 / math.max(t._3, 1e-9)))
      (name, median, passes.flatMap(_._2).headOption, sorted, units)
    }
    // one sample per (pass, segment), POSITIONALLY — value-dedup would
    // collapse two segments that happen to measure the same probe time
    // and skew the med/min/max telemetry
    val allProbes: Seq[Double] = passTimes.flatMap { pt =>
      selected.zipWithIndex.collect {
        case ((n, _), i) if i % ProbeEvery == 0 => pt(n)._3
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // stdout medians round to 4 decimals: the driver keeps only a
    // bounded log tail, so the printed line must stay compact enough to
    // survive truncation intact (sub-0.1ms digits carry no signal anyway)
    def jnum(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val qs = results.map { case (k, v, _, _, _) => jstr(k) + ":" + jnum(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _, _) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Carried-set subtotal: sum of medians over the PREVIOUS round's query
    // set (the committed resource lists it), so round-over-round regression
    // is readable from the driver artifact without summing the BENCH_LOCAL
    // files by hand. None when the resource is absent or nothing matches
    // (e.g. a filtered SPARK_GRAFT_ONLY run).
    val carriedHits = {
      val names =
        try {
          val in = getClass.getResourceAsStream("/graft/carried_queries.txt")
          if (in == null) Set.empty[String]
          else try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().map(_.trim).filter(_.nonEmpty).toSet
          finally in.close()
        } catch { case _: Exception => Set.empty[String] }
      results.filter(r => names.contains(r._1))
    }
    val carriedSec: Option[Double] =
      if (carriedHits.isEmpty) None else Some(carriedHits.map(_._2).sum)
    // carried total in CALIB UNITS: per-query medians of time/segment-
    // probe, summed over the carried set — the contention-normalized
    // round-over-round series (each term divides its own measurement
    // window's probe out, so neither mid-run contention spikes nor a
    // slower box move it; a real code regression does)
    val carriedUnits: Option[Double] =
      if (carriedHits.isEmpty) None else Some(carriedHits.map(_._5).sum)
    // carried normalized by the calibration probe: the r13 artifacts
    // proved the box baseline drifts ~50% intra-day on identical code
    // (calib 7.97 vs 12.29 same session), so the round-over-round signal
    // is carried/calib — box contention inflates numerator and
    // denominator together and divides out, where the raw carried number
    // leaves the reader to do that arithmetic by hand
    val carriedPerCalib: Option[Double] =
      carriedSec.filter(_ => calibSec > 0).map(_ / calibSec)
    // probe summary: median flags the run's baseline, max/med exposes
    // the worst contention window an individual family may have landed
    // in (the attribution the r16 verdict asked the artifact to carry);
    // "contended" makes the worst case a self-flagging boolean so an
    // artifact-only reader knows to trust units over raw seconds
    val probeStats: String =
      if (allProbes.isEmpty) ""
      else s""","probe_med":${jnum(medianOf(allProbes))}""" +
        s""","probe_min":${jnum(allProbes.min)}""" +
        s""","probe_max":${jnum(allProbes.max)}""" +
        s""","contended":${BenchGate.contended(allProbes.max, medianOf(allProbes))}"""
    // CROSS-ROUND REGRESSION GATE: compare this run's per-query calib
    // units against the newest committed BENCH_UNITS_r*.json (same sf
    // only — units are contention-immune, not scale-immune). Queries that
    // errored this run are excluded (their "time" is time-to-exception).
    // The gate makes a genuine per-query slowdown self-report in the
    // artifact instead of waiting for a human to diff rounds.
    // the reference is the ENVELOPE of the last few committed rounds
    // (per-query max): "regressed" = slower than every recent round,
    // which de-flags the measured heavy-tailed cross-session unit noise
    val prevUnits = BenchGate.loadEnvelope(
      Paths.get("."), sys.env.get("SPARK_GRAFT_PREV_UNITS"), sfDir)
    val unitByName = results.collect {
      case (k, _, None, _, u) => k -> u
    }.toMap
    val regress: Seq[(String, Double)] = prevUnits match {
      case Some(p) if p.sf == sfDir => BenchGate.regressions(unitByName, p.units)
      case _                        => Seq.empty
    }
    // emitted only when the gate actually ran (prev file present, same
    // sf): an absent field means "no reference", an empty object means
    // "compared and clean" — the two must stay distinguishable
    val regressStats: String = prevUnits.filter(_.sf == sfDir).fold("") { p =>
      val top = regress.take(8)
        .map { case (k, r) => jstr(k) + ":" + jnum(r) }.mkString("{", ",", "}")
      // unit_drift is the session factor the ratios were graded against
      // (median cross-query unit ratio vs the reference round) — 1.0 on
      // filtered runs with too few common queries to estimate it
      s""","prev_units_round":${p.round}""" +
        s""","unit_drift":${jnum(BenchGate.sessionDrift(unitByName, p.units))}""" +
        s""","regressions":$top"""
    }
    // The driver retains only a ~2000-char stdout tail and json-parses
    // what it finds there. Short-keying the full per-query map (rounds
    // 10-11) still overflowed at 172 queries (~2.4 KB) and only grows
    // with the suite, so the stdout line is now COMPACT BY CONSTRUCTION:
    // total + counts + the K slowest per-query medians (the ones a
    // regression check actually looks at) + a bounded error sample.
    // K=12 slowest entries is ~350 chars all-in — it fits any tail at
    // any future suite size. The COMPLETE per-query medians + raw passes
    // stay in target/bench.json, committed as BENCH_LOCAL_r*.
    def compactLine: String = {
      // short id prefix before the first '_' ("x12g_multimodal_meta_gate"
      // -> "x12g"); colliding prefixes keep their full name
      val counts = results.groupBy(_._1.takeWhile(_ != '_')).map {
        case (p, rs) => p -> rs.size
      }
      def shortOf(k: String): String = {
        val p = k.takeWhile(_ != '_')
        if (counts(p) == 1) p else k
      }
      val slowest = results.sortBy(-_._2).take(12)
        .map { case (k, v, _, _, _) => jstr(shortOf(k)) + ":" + jnum(v) }
        .mkString("{", ",", "}")
      val allErrs = results.collect { case (k, _, Some(e), _, _) => (k, e) }
      // bounded error sample with capped messages: one long stack trace
      // (or a cascade of failures) must not push the line out of the tail
      val se = allErrs.take(8).map { case (k, e) =>
        jstr(shortOf(k)) + ":" + jstr(e.take(60))
      }.mkString("{", ",", "}")
      // calib/load make a contended run self-identifying (r12's driver
      // artifact was ~2x inflated with nothing in it to show why);
      // carried = subtotal over the previous round's committed query set
      val env = s""""calib":${jnum(calibSec)}""" +
        loadAvg.fold("")(l => s""","load":${jnum(l)}""") +
        probeStats +
        carriedSec.fold("")(c => s""","carried":${jnum(c)}""") +
        carriedPerCalib.fold("")(r => s""","carried_per_calib":${jnum(r)}""") +
        carriedUnits.fold("")(u => s""","carried_units":${jnum(u)}""") +
        regressStats
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","passes":$repeat,"n_queries":${results.size},"n_errors":${allErrs.size},$env,"slowest":$slowest,"errors":$se,"sf":"$sfDir","per_query":"target/bench.json"}"""
    }
    // raw per-pass samples (sorted) — lets a reader judge the spread that
    // the median hides; only emitted when there IS a spread to judge
    val raw =
      if (repeat > 1)
        "," + "\"raw\":" + results.map { case (k, _, _, ps, _) =>
          jstr(k) + ":" + ps.map(jnum).mkString("[", ",", "]")
        }.mkString("{", ",", "}")
      else ""
    def lineWith(extra: String): String = {
      val env = s""""calib":${jnum(calibSec)}""" +
        loadAvg.fold("")(l => s""","load":${jnum(l)}""") +
        probeStats +
        carriedSec.fold("")(c => s""","carried":${jnum(c)}""") +
        carriedPerCalib.fold("")(r => s""","carried_per_calib":${jnum(r)}""") +
        carriedUnits.fold("")(u => s""","carried_units":${jnum(u)}""") +
        // the full artifact carries the COMPLETE regression map (the
        // compact stdout line keeps only the 8 worst)
        prevUnits.filter(_.sf == sfDir).fold("") { p =>
          val all = regress.map { case (k, r) => jstr(k) + ":" + jnum(r) }
            .mkString("{", ",", "}")
          s""","prev_units_round":${p.round},"regressions":$all"""
        }
      // full artifact additionally carries every per-query calib-unit
      // median and every interleaved probe sample (per pass, run order)
      val units = results.map { case (k, _, _, _, u) => jstr(k) + ":" + jnum(u) }
        .mkString("{", ",", "}")
      val probes = passTimes.map { pt =>
        selected.zipWithIndex.collect { case ((n, _), i) if i % ProbeEvery == 0 =>
          jnum(pt(n)._3)
        }.mkString("[", ",", "]")
      }.mkString("[", ",", "]")
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","passes":$repeat,$env,"queries":$qs,"units":$units,"probes":$probes,"errors":$errs$extra,"sf":"$sfDir"}"""
    }
    // durable copy FIRST (full line incl. raw passes): the driver
    // captures stdout, but local iteration loses it — target/bench.json
    // always holds the last completed run. Best-effort: a read-only
    // working dir must not fail a bench whose results reach stdout.
    try {
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/bench.json"), lineWith(raw) + "\n")
      // the NEXT round's carried list, mechanically: a full run dumps
      // its sorted key set so the start-of-round refresh is
      // `cp target/current_queries.txt src/main/resources/graft/
      // carried_queries.txt` — the only remaining manual step the r14
      // verdict flagged. Filtered runs skip the dump (a partial list
      // silently shrinking the carried set is the failure mode the
      // QueriesSmokeSpec stale-name check cannot see).
      if (only.isEmpty) {
        Files.writeString(Paths.get("target/current_queries.txt"),
          selected.map(_._1).mkString("", "\n", "\n"))
        // the NEXT round's regression reference, ready to commit:
        // `cp target/bench_units.json BENCH_UNITS_r{N}.json` at round
        // close — the round number lives in the FILENAME (that's what
        // BenchGate's scanner orders by); the body's sf guards against
        // comparing units across scale factors. Filtered runs skip it
        // (a partial unit set would silently shrink the gate's coverage).
        val unitsJson = results.map { case (k, _, _, _, u) =>
          "  " + jstr(k) + ": " + jnum(u)
        }.mkString("{\n \"sf\": " + jstr(sfDir) +
          ",\n \"probe_med\": " + jnum(medianOf(allProbes)) +
          ",\n \"units\": {\n", ",\n", "\n }\n}\n")
        Files.writeString(Paths.get("target/bench_units.json"), unitsJson)
      }
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] WARNING: durable write failed: ${e.getMessage}")
    }
    // the parseable artifact line goes LAST on stdout, compact by
    // construction so the COMPLETE line sits inside the driver's tail
    // window (~1900 chars of budget after sbt's trailing [success] line)
    println(compactLine)
    spark.stop()
  }
}
