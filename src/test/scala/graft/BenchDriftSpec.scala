package graft

import org.scalatest.funsuite.AnyFunSuite

/** r16 (VERDICT r15 item 2): the window-local drift adjudicator,
  * spec-pinned through its injected timer/memo seams. The deferral
  * branch had never executed anywhere (the live runs happened to clear
  * every candidate inside adjudicable windows); these four quadrants
  * make the rare-event branches committed facts:
  *   1. clean window + real regression        -> CONFIRMED
  *   2. stalled window + unchanged query      -> DEFERRED (the r14
  *      false-confirm replayed: 72 s re-time of an unchanged 1.1 s
  *      query inside a ~2.5x host stall — the OLD whole-run-factor
  *      normalization provably confirms it, the window-local one
  *      defers)
  *   3. stalled-then-clean re-queue           -> adjudicated on the
  *      second window
  *   4. missing sentinel baselines            -> globalFactor fallback
  * plus the ADVICE-r13 invariant: a FAILED re-time (< 0) is reproduced,
  * never cleared, even inside a stalled window. */
class BenchDriftSpec extends AnyFunSuite {
  import BenchDrift._

  private val sentinels = Seq("s1", "s2", "s3")
  // sentinel baselines big enough to be yardsticks (Bench picks the
  // largest-baseline non-candidates for exactly that reason)
  private val base = Map("s1" -> 10.0, "s2" -> 12.0, "s3" -> 15.0,
    "q" -> 1.1)

  /** a host whose every re-time runs at `factor`x its baseline, except
    * the candidate which re-times at a fixed reading; `factors` gives
    * per-window host state (advanced by each rebuildMemos call — the
    * window's first effect), so stalled-then-clean is expressible */
  private final class FakeHost(candReading: Double, factors: Double*) {
    var windows = 0
    var memoCalls = 0
    def rebuild(names: Seq[String]): Unit = {
      // the window rebuilds memos for the candidate AND the sentinels
      assert(names.toSet == Set("q", "s1", "s2", "s3"))
      memoCalls += 1
      windows = math.min(windows + 1, factors.length)
    }
    def retime(n: String): Double = {
      val f = factors(windows - 1)
      if (n == "q") candReading * (if (candReading < 0) 1.0 else f / factors(0))
      else base(n) * f
    }
  }

  private def adjOne(host: FakeHost): Verdict =
    adjudicate(Seq(("q", 1.1, 1.8)), base, sentinels,
      globalFactor = 1.0, retime = host.retime, rebuildMemos = host.rebuild
    ).head

  test("quadrant 1: clean window + real regression -> confirmed") {
    val host = new FakeHost(candReading = 3.3, 1.0) // 3x its 1.1 baseline
    val v = adjOne(host)
    assert(!v.deferred && v.reproduced)
    assert(v.windowFactor === 1.0)
    assert(v.retimed === 3.3)
    assert(host.memoCalls == 1, "a clean window must not re-queue")
  }

  test("quadrant 2: the r14 false-confirm replays as DEFERRED, while " +
      "whole-run-factor normalization would have confirmed it") {
    // the r14 vector: unchanged 1.1 s query re-times at 72 s inside a
    // host stall whose sentinels read ~2.5x; the stall persists through
    // the re-queued window
    val host = new FakeHost(candReading = 72.0, 2.5, 2.5)
    val v = adjOne(host)
    assert(v.deferred, "a doubly-stalled window must defer")
    assert(!v.reproduced, "deferred is never confirmed")
    assert(v.windowFactor > 2.4 && v.windowFactor < 2.6)
    assert(host.memoCalls == 2, "one re-queue, then record deferred")
    // the OLD logic — normalize by the whole-run factor (r14: 1.036,
    // dominated by the run's two healthy passes) — confirms this exact
    // reading: that is the false-confirm class this protocol closed
    val oldLogicConfirms = (72.0 / math.max(1.036, 1.0)) / 1.1 > 1.4
    assert(oldLogicConfirms, "test vector must reproduce the r14 bug")
  }

  test("quadrant 3: stalled-then-clean re-queue adjudicates on the " +
      "second window (unchanged query -> cleared)") {
    // window 1 stalled at 2.5x; window 2 clean, candidate re-times at
    // ~its baseline (host factor 1.0 scales the 72 s stall reading
    // down: candReading*f/factors(0) = 72*1.0/2.5 = 28.8 — still a big
    // reading, so model the unchanged query directly: reading that
    // scales to 1.15 s on the clean window)
    val host = new FakeHost(candReading = 2.875, 2.5, 1.0) // 2.875/2.5*1.0=1.15
    val v = adjOne(host)
    assert(!v.deferred, "the clean second window adjudicates")
    assert(!v.reproduced, "1.15 s vs a 1.1 baseline is parity, cleared")
    assert(v.windowFactor === 1.0, "the verdict carries the SECOND window's factor")
    assert(math.abs(v.retimed - 1.15) < 1e-9)
    assert(host.memoCalls == 2)
  }

  test("quadrant 4: no usable sentinel baselines -> globalFactor fallback") {
    // sentinels whose baselines are absent: sentinelFactor must fall
    // back to the whole-run factor rather than divide by nothing
    val wf = sentinelFactor(Seq("missing1", "missing2"), base,
      globalFactor = 1.23, retime = _ => 5.0)
    assert(wf === 1.23)
    // a failed sentinel re-time (< 0) is likewise unusable
    val wf2 = sentinelFactor(sentinels, base, globalFactor = 1.23,
      retime = _ => -1.0)
    assert(wf2 === 1.23)
    // end-to-end on that fallback: clean global factor + 3x regression
    // still confirms
    val v = adjudicate(Seq(("q", 1.1, 1.8)), base, Seq.empty,
      globalFactor = 1.0, retime = n => { assert(n == "q"); 3.3 },
      rebuildMemos = _ => ()).head
    assert(v.reproduced && !v.deferred)
  }

  test("a FAILED re-time is reproduced, never cleared — even in a " +
      "stalled window (ADVICE r13)") {
    val host = new FakeHost(candReading = -1.0, 2.5, 2.5)
    val v = adjOne(host)
    assert(v.retimed == -1.0)
    assert(!v.deferred, "failure is plan evidence, not host evidence")
    assert(v.reproduced, "a crash during adjudication must surface")
  }

  test("sentinel selection: largest-baseline non-candidates, capped at 3") {
    val ratios = Seq(
      ("cand", 99.0, 200.0, 2.0), ("a", 5.0, 5.0, 1.0),
      ("b", 8.0, 8.0, 1.0), ("c", 2.0, 2.0, 1.0), ("d", 7.0, 7.0, 1.0))
    assert(sentinelsOf(ratios, Set("cand")) == Seq("b", "d", "a"))
  }

  test("a fast window never inflates: windowFactor below 1.0 does not " +
      "turn a parity reading into a flag") {
    // sentinels ran 2x FASTER than baseline (cold-cache luck); the
    // candidate re-times at parity. Dividing by 0.5 would double the
    // reading into a fake confirm — the floor at 1.0 prevents it.
    val v = adjudicate(Seq(("q", 1.1, 1.8)), base, sentinels,
      globalFactor = 1.0,
      retime = n => if (n == "q") 1.1 else base(n) * 0.5,
      rebuildMemos = _ => ()).head
    assert(v.windowFactor === 0.5)
    assert(!v.reproduced, "parity under a fast window must clear")
  }
}
