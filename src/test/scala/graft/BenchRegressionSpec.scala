package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate (VERDICT r12 item 3), in two parts:
  *
  * 1. Comparator unit tests, including the FAILING-BY-CONSTRUCTION case
  *    the verdict asked to see demonstrated: a synthetic 3× ratio
  *    regression MUST be flagged, and the noise shields (one-sidedness,
  *    absolute-delta floor) MUST hold.
  *
  * 2. The live gate: when a fresh local bench detail exists
  *    (`target/bench_detail.jsonl`, written by every `graft.Bench` run)
  *    AND it covers a meaningful slice of the inventory, every common
  *    query is compared against the newest committed
  *    `BENCH_DETAIL_r*_local.jsonl`; any >2× ratio regression that also
  *    slowed ≥0.3 s absolute fails the build. With no fresh detail the
  *    gate cancels (visible as canceled, never silently green) — it
  *    activates on exactly the runs that can regress.
  */
class BenchRegressionSpec extends AnyFunSuite {

  private def line(q: String, sec: Double, ratio: Double): String =
    s"""{"bench_query":"$q","sec":$sec,"ratio":$ratio,"cal":0.450,"warm":$sec,"runs":[$sec,$sec,$sec]}"""

  test("a 3x ratio regression with real absolute cost is flagged") {
    val old = BenchCompare.parse(Seq(line("q99_x", 1.0, 2.0)))
    val next = BenchCompare.parse(Seq(line("q99_x", 3.1, 6.0)))
    val regs = BenchCompare.regressions(old, next)
    assert(regs.map(_.query) == Seq("q99_x"))
    assert(regs.head.factor > 2.9 && regs.head.factor < 3.1)
  }

  test("getting faster never fails the gate") {
    val old = BenchCompare.parse(Seq(line("q99_x", 6.0, 12.0)))
    val next = BenchCompare.parse(Seq(line("q99_x", 1.0, 2.0)))
    assert(BenchCompare.regressions(old, next).isEmpty)
  }

  test("sub-delta noise on fast queries does not trip the gate") {
    // ratio tripled but the query went 0.05 -> 0.16 s: scheduler jitter,
    // not a plan regression — shielded by the absolute-seconds floor.
    val old = BenchCompare.parse(Seq(line("q01_tiny", 0.05, 0.1)))
    val next = BenchCompare.parse(Seq(line("q01_tiny", 0.16, 0.35)))
    assert(BenchCompare.regressions(old, next).isEmpty)
  }

  test("one-sided presence is never a failure; summary lines are ignored") {
    val old = BenchCompare.parse(Seq(line("q_dropped", 1.0, 2.0),
      """{"metric":"total","value":9.9,"unit":"sec"}"""))
    val next = BenchCompare.parse(Seq(line("q_added", 1.0, 2.0)))
    assert(BenchCompare.regressions(old, next).isEmpty)
    assert(old.keySet == Set("q_dropped") && next.keySet == Set("q_added"))
  }

  test("failed queries (sec null) parse to absent, not zero") {
    val parsed = BenchCompare.parse(Seq(
      """{"bench_query":"q_err","sec":null,"ratio":null,"cal":0.450,"warm":null,"runs":[null],"err":true}"""))
    assert(parsed.isEmpty)
  }

  test("live gate: fresh local detail vs newest committed round detail") {
    val fresh = new java.io.File("target/bench_detail.jsonl")
    val committed = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("BENCH_DETAIL_r\\d+_local\\.jsonl"))
      .sortBy(_.getName)
      .lastOption
    assume(fresh.exists() && committed.nonEmpty,
      "no fresh target/bench_detail.jsonl — gate activates after a bench run")
    def read(f: java.io.File): Seq[String] = {
      val src = scala.io.Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }
    val old = BenchCompare.parse(read(committed.get))
    val next = BenchCompare.parse(read(fresh))
    // Spot benches (SPARK_GRAFT_BENCH_ONLY) leave tiny details; gating a
    // 3-query spot file against the round artifact is meaningless.
    assume((old.keySet & next.keySet).size >= 25,
      s"fresh detail covers ${(old.keySet & next.keySet).size} common " +
        "queries (<25) — spot bench, gate not meaningful")
    val regs = BenchCompare.regressions(old, next)
    assert(regs.isEmpty,
      s"bench regression vs ${committed.get.getName}:\n  " +
        regs.mkString("\n  "))
  }
}
