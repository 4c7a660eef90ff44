package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 verdict's bench-integrity fix: a failed rep is
  * recorded as NaN and NEVER enters a min/median/spread — the driver
  * sweep must not again report a failed 21-second query as a 0.02s
  * "best" (BENCH_LOCAL.json r13: q281 reps [34.9, 28.5, 21.4, 22.6,
  * 0.097, 0.022] → reported best 0.0215s).
  */
class BenchStatsSpec extends AnyFunSuite {
  import BenchStats._

  test("measured drops the warm-up rep and every NaN (failed) rep") {
    val v = Vector(13.5, 3.8, Double.NaN, 3.9)
    assert(measured(v) == Vector(3.8, 3.9))
  }

  test("a failed rep never becomes the min: q281-shaped rep vector") {
    // warm-up 34.9, then three good reps and two failures recorded as
    // NaN (pre-fix these were 0.097 and 0.022 time-to-failure reps)
    val v = Vector(34.9, 28.5, 21.4, 22.6, Double.NaN, Double.NaN)
    assert(minOr(v, Double.NaN) == 21.4)
    assert(median(measured(v)) == 22.6)
  }

  test("all-failed query reports NaN best / NaN median, serialized null") {
    val v = Vector(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    assert(measured(v).isEmpty)
    assert(minOr(v, Double.NaN).isNaN)
    assert(median(measured(v)).isNaN)
    assert(jnum(minOr(v, Double.NaN)) == "null")
    assert(jmap(Seq("q" -> Double.NaN)) == "{\"q\":null}")
  }

  test("median over even/odd counts") {
    assert(median(Seq(1.0, 3.0, 2.0)) == 2.0)
    assert(median(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
    assert(median(Nil).isNaN)
  }

  test("jstr escapes quotes, backslashes, and control chars") {
    assert(jstr("a\"b\\c\nd") == "\"a\\\"b\\\\c d\"")
  }

  test("single-element vector is a degraded single-run measurement, kept") {
    // round-14 verdict #1b: past 85% of the deadline a query gets ONE
    // execution that IS its measurement — not a discarded warm-up
    assert(measured(Vector(4.2)) == Vector(4.2))
    assert(minOr(Vector(4.2), Double.NaN) == 4.2)
    assert(measured(Vector(Double.NaN)).isEmpty) // failed single run
  }

  test("repPlan phases by elapsed fraction of the deadline") {
    // < 60%: full plan — warm+2 for sub-cutoff queries, warm+1 past
    // it (round-15 verdict #5: rebuild driver-sweep headroom; slow
    // queries' spread is fixed overhead, not jitter)
    assert(repPlan(100.0, 2700.0, 0.4, 1.0) == ((2, false)))
    assert(repPlan(100.0, 2700.0, 9.0, 1.0) == ((1, false)))
    assert(repPlan(100.0, 2700.0, Double.NaN, 1.0) == ((2, false)))
    // 60%..85%: warm + 1 regardless of speed
    assert(repPlan(1700.0, 2700.0, 0.4, 1.0) == ((1, false)))
    assert(repPlan(1700.0, 2700.0, 20.0, 1.0) == ((1, false)))
    // ≥ 85%: single run only
    assert(repPlan(2300.0, 2700.0, 0.4, 1.0) == ((0, true)))
    // non-positive deadline never degrades
    assert(repPlan(99999.0, 0.0, 0.4, 1.0) == ((2, false)))
  }

  test("spikeSuspect flags the synthetic GC-flood spike, not jitter") {
    // round-17 verdict #2: the documented q233 case — warm 4.9s, one
    // measured rep at 17.7s — must earn a confirm rep
    assert(spikeSuspect(4.9, 17.7))
    // sub-second jitter never triggers (3× of 10ms is noise)
    assert(!spikeSuspect(0.01, 0.04))
    assert(!spikeSuspect(0.2, 0.65)) // 3.25× but only +0.45s absolute
    // a normal rep near its warm-up never triggers
    assert(!spikeSuspect(5.0, 6.0))
    // failed reps (NaN) never trigger
    assert(!spikeSuspect(Double.NaN, 17.7))
    assert(!spikeSuspect(4.9, Double.NaN))
    // a zero warm-up can't establish a ratio
    assert(!spikeSuspect(0.0, 9.0))
  }

  test("provenanceOf parses JSON artifacts and gate-record lines") {
    assert(provenanceOf("""{"provenance":"builder-quiet-sweep","x":1}""")
      .contains("builder-quiet-sweep"))
    assert(provenanceOf("bench gate: total=1s provenance=my-labeled-run sf=x")
      .contains("my-labeled-run"))
    assert(provenanceOf("no label here").isEmpty)
  }
}
