package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cross-round bench regression gate.
  *
  * Each round's driver bench commits its per-query calib-unit medians as
  * `BENCH_UNITS_r{N}.json` (Bench writes `target/bench_units.json` with
  * exactly that shape after every full run, so the round-close step is a
  * copy). The NEXT round's Bench loads the highest-numbered committed file
  * from the working directory and flags any query whose unit median rose
  * by more than [[RatioGate]] with an absolute rise of at least
  * [[FloorDelta]] units — so a genuine per-query regression self-reports
  * as a `"regressions"` field in the bench artifact instead of waiting
  * for a manual cross-round diff.
  *
  * Units are time divided by the run's own interleaved CPU probe:
  * dimensionless and contention-immune by construction, so the comparison
  * is valid across boxes and across rounds — but NOT across scale factors
  * (the work changes, not just the box), hence callers must check
  * [[PrevUnits.sf]] against the current run's data dir before comparing.
  */
object BenchGate {
  /** unit ratio above which a query is flagged as regressed */
  val RatioGate = 1.5
  /** absolute unit-drift floor: 1 unit ≈ one probe (~0.27 s on this box).
    * Sub-probe queries have noisy ratios (a 0.1 s query jumping to 0.16 s
    * is measurement spread, not a regression worth a round's attention);
    * requiring the drift to also exceed a whole probe suppresses them. */
  val FloorDelta = 1.0
  /** probe max/med above which the run self-flags as contended: the r17
    * artifact's 1.44 was benign spread; 2.0+ means some measurement
    * window ran on a box at least twice as loaded as the run's median. */
  val ContendedGate = 2.0

  /** A previous round's committed units: round number (from the file
    * name), the sf dir the units were measured on, and name → unit. */
  final case class PrevUnits(round: Int, sf: String, units: Map[String, Double])

  private val FileRe = raw"BENCH_UNITS_r(\d+)\.json".r

  /** All BENCH_UNITS_r*.json in `dir`, numerically ordered by round
    * (r9 < r17, which lexicographic file listing gets wrong). */
  def unitsFiles(dir: Path): Seq[(Int, Path)] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .flatMap { p =>
          p.getFileName.toString match {
            case FileRe(n) => n.toIntOption.map(_ -> p)
            case _         => None
          }
        }
        .toSeq.sortBy(_._1)
      finally s.close()
    }

  /** Highest-numbered BENCH_UNITS_r*.json in `dir`. */
  def latestUnitsFile(dir: Path): Option[(Int, Path)] =
    unitsFiles(dir).lastOption

  /** Parse a BENCH_UNITS file body. `round` comes from the file name, not
    * the body — the body's "round" field is for human readers. Returns
    * None on any malformed input: a corrupt units file must degrade to
    * "no gate this run", never fail the bench. */
  def parseUnits(round: Int, text: String): Option[PrevUnits] =
    try {
      val j = JsonMethods.parse(text)
      val sf = j \ "sf" match { case JString(s) => Some(s); case _ => None }
      val units = j \ "units" match {
        case JObject(fields) =>
          Some(fields.collect {
            case (k, JDouble(v))  => k -> v
            case (k, JDecimal(v)) => k -> v.toDouble
            case (k, JInt(v))     => k -> v.toDouble
            case (k, JLong(v))    => k -> v.toDouble
          }.toMap)
        case _ => None
      }
      for (s <- sf; u <- units if u.nonEmpty) yield PrevUnits(round, s, u)
    } catch { case _: Exception => None }

  /** How many committed rounds back the reference envelope reaches:
    * old enough that one noisy round doesn't dominate, young enough
    * that a slow creep can't hide behind ancient fast rounds forever. */
  val RefWindow = 3

  /** Load the gate's reference units: an explicit path override first
    * (local what-if runs), else the newest committed round file in cwd. */
  def loadLatest(dir: Path, overridePath: Option[String] = None): Option[PrevUnits] =
    overridePath match {
      case Some(p) =>
        val path = dir.resolve(p)
        val n = path.getFileName.toString match {
          case FileRe(k) => k.toIntOption.getOrElse(-1)
          case _         => -1
        }
        if (Files.isReadable(path)) parseUnits(n, Files.readString(path)) else None
      case None =>
        latestUnitsFile(dir).flatMap { case (n, p) =>
          parseUnits(n, Files.readString(p))
        }
    }

  /** The reference ENVELOPE: the last [[RefWindow]] committed rounds at
    * the given sf, collapsed to each query's MAX unit — "regressed"
    * then means "slower than EVERY recent round", which single-round
    * comparison can't say. Measured need (round 18): same-code units
    * re-benched across sessions drift 1.5–1.8× for a heavy-tailed
    * subset of queries while the median stays ~1.0, so one reference
    * round always flags a few tail-noise queries; a query that was
    * ever that slow in a recent committed round is noise, one that is
    * slower than all of them is a regression. The round reported is
    * the newest in the envelope. An explicit override path bypasses
    * the envelope (single-file what-if semantics preserved). */
  def loadEnvelope(dir: Path,
                   overridePath: Option[String] = None,
                   sf: String): Option[PrevUnits] =
    overridePath match {
      case Some(_) => loadLatest(dir, overridePath).filter(_.sf == sf)
      case None =>
        val refs = unitsFiles(dir)
          .flatMap { case (n, p) =>
            try parseUnits(n, Files.readString(p)) catch { case _: Exception => None }
          }
          .filter(_.sf == sf)
          .takeRight(RefWindow)
        refs.lastOption.map { newest =>
          val maxUnits = refs.flatMap(_.units.toSeq)
            .groupMapReduce(_._1)(_._2)(math.max)
          PrevUnits(newest.round, sf, maxUnits)
        }
    }

  /** Minimum common-query count before [[sessionDrift]] trusts its
    * median; below it (filtered runs) the drift factor is 1.0. */
  val MinCommonForDrift = 20

  /** Median per-query unit ratio over queries present in BOTH maps —
    * the cross-SESSION drift factor. The interleaved probe normalizes
    * within-run contention, but unit LEVELS still move between
    * sessions (JIT / codegen-cache / page-cache state): measured in
    * round 18 by re-running the round-START code against the r17
    * units, individual queries drifted 1.5–1.8× with ZERO code change
    * — but the median moved with them, so grading each ratio relative
    * to the median separates a code regression (one query moves
    * against the field) from session state (the whole field moves).
    * 1.0 when too few common queries exist to estimate it. */
  def sessionDrift(cur: Map[String, Double],
                   prev: Map[String, Double]): Double = {
    val ratios = cur.toSeq.flatMap { case (n, c) =>
      prev.get(n).collect { case p if p > 0 && c > 0 => c / p }
    }
    if (ratios.size < MinCommonForDrift) 1.0
    else ratios.sorted.apply(ratios.size / 2)
  }

  /** Flagged regressions, worst first: queries present in BOTH maps whose
    * DRIFT-NORMALIZED unit ratio rose past the gate AND whose unit rose
    * by at least the absolute floor over the drift-adjusted previous
    * value. The reported ratio is the normalized one — what the gate
    * actually graded. Improvements and new/retired queries are never
    * flagged — the gate exists to catch silent slowdowns, not to grade
    * additions. */
  def regressions(
      cur: Map[String, Double],
      prev: Map[String, Double],
      ratioGate: Double = RatioGate,
      floorDelta: Double = FloorDelta): Seq[(String, Double)] = {
    val drift = sessionDrift(cur, prev)
    cur.toSeq
      .flatMap { case (name, c) =>
        prev.get(name).collect {
          case p if p > 0 && c / (p * drift) > ratioGate &&
              c - p * drift >= floorDelta =>
            name -> c / (p * drift)
        }
      }
      .sortBy { case (name, ratio) => (-ratio, name) }
  }

  /** true when the worst probe window ran ≥ [[ContendedGate]]× the median
    * probe — the artifact-only "trust the units, not the seconds" marker. */
  def contended(probeMax: Double, probeMed: Double, gate: Double = ContendedGate): Boolean =
    probeMed > 0 && probeMax / probeMed > gate
}
