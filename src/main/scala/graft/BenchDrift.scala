package graft

/** Window-LOCAL drift adjudication, extracted from Bench.main behind
  * injectable timer/memo seams (r16, VERDICT r15 item 2 — the deferral
  * branch had shipped straight to production with live-run evidence
  * only; BenchDriftSpec now pins all four quadrants, including the r14
  * false-confirm replayed as a test vector).
  *
  * The protocol (r15, VERDICT r14 item 2): a candidate flag must
  * reproduce on a 3-run isolated re-time, and that re-time is
  * normalized by the WINDOW it ran in, not by the whole run. The r14
  * driver run proved the gap: a host stall confined to the run's tail
  * (pass totals 127/146/318 s) pushed isolated re-times of unchanged
  * sub-second queries to 13-72 s, and the whole-run factor (1.036,
  * dominated by the two healthy passes) "confirmed" them. Every
  * adjudication window is therefore BRACKETED by sentinel re-times —
  * the largest-baseline non-candidate queries, known-cost yardsticks
  * timed immediately before and after the candidate's 3 runs — and the
  * candidate's re-time divides by the sentinels' median now/prev ratio
  * (floored at 1.0: a fast window never inflates a reading into a
  * flag). A window whose sentinel factor exceeds the threshold is
  * itself stalled: adjudication defers (one re-queue); a second stalled
  * window records the candidate as DEFERRED, never confirmed — a stall
  * is host evidence, not plan evidence.
  *
  * Everything here is pure given the two injected effects:
  * `retime(name)` (Bench passes runNoop — cache-cleared isolated
  * timing; < 0 means the query FAILED, which is treated as reproduced,
  * worse than the regression being adjudicated, per ADVICE r13) and
  * `rebuildMemos(names)` (Bench passes rebuildMemosUntimed so neither
  * the candidate nor a sentinel is charged a memo build the timed
  * passes amortized). */
object BenchDrift {

  /** one adjudicated candidate, in bench_history field order */
  final case class Verdict(name: String, prev: Double, now: Double,
      retimed: Double, windowFactor: Double, deferred: Boolean,
      reproduced: Boolean)

  /** sentinel selection: the 3 largest-baseline NON-candidates — big
    * enough that their now/prev ratio reads host state, not scatter */
  def sentinelsOf(ratios: Seq[(String, Double, Double, Double)],
      candidateNames: Set[String]): Seq[String] =
    ratios.filterNot { case (k, _, _, _) => candidateNames(k) }
      .sortBy(-_._2).take(3).map(_._1)

  /** median now/prev ratio of the sentinels re-timed NOW; falls back
    * to the whole-run factor when no sentinel has a usable baseline
    * (failed re-time, zero/missing prev) — quadrant 4 of the spec */
  def sentinelFactor(sentinelNames: Seq[String],
      baseline: Map[String, Double], globalFactor: Double,
      retime: String => Double): Double = {
    val fs = sentinelNames.flatMap { n =>
      val t = retime(n)
      baseline.get(n).collect { case b if t >= 0 && b > 0 => t / b }
    }.sorted
    if (fs.isEmpty) globalFactor else fs(fs.size / 2)
  }

  /** adjudicate each candidate (name, prev, now) in its own bracketed
    * window; semantics are exactly the r15 in-line logic, now seam-
    * testable. threshold is 1.4 in production (the measured noise
    * envelope of this box — see Bench.main's scaladoc). */
  def adjudicate(candidates: Seq[(String, Double, Double)],
      baseline: Map[String, Double], sentinelNames: Seq[String],
      globalFactor: Double,
      retime: String => Double,
      rebuildMemos: Seq[String] => Unit,
      threshold: Double = 1.4): Seq[Verdict] =
    candidates.map { case (k, b, v) =>
      def window(): (Double, Double) = {
        // memos for the candidate AND the sentinels: a sentinel must
        // never be charged a memo build the passes amortized
        rebuildMemos(k +: sentinelNames)
        val wPre = sentinelFactor(sentinelNames, baseline, globalFactor, retime)
        val ts = (1 to 3).map(_ => retime(k)).sorted
        val wPost = sentinelFactor(sentinelNames, baseline, globalFactor, retime)
        val wf = math.max((wPre + wPost) / 2.0, 1e-9)
        (ts(ts.size / 2), wf)
      }
      val (rt0, wf0) = window()
      val (rt, wf) = if (wf0 > threshold) window() else (rt0, wf0) // re-queue once
      val deferred = wf > threshold && rt >= 0
      val rtn = if (rt < 0) rt else rt / math.max(wf, 1.0)
      val repro = rt < 0 || (!deferred && rtn / b > threshold)
      Verdict(k, b, v, rt, wf, deferred, repro)
    }
}
