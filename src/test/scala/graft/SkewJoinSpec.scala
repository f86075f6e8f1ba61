package graft

import org.scalatest.funsuite.AnyFunSuite

/** q116's whole point is the RUNTIME plan — AQE's OptimizeSkewedJoin only
  * manifests after the join's input stages materialize, so the static
  * `explain` PlanSpec pins cannot see it. This spec executes the query at
  * sf0.001 and asserts the final adaptive plan actually took the skew
  * split: a SortMergeJoin flagged skew=true reading a skewed
  * AQEShuffleRead. If any of the four preconditions documented at the
  * query regresses (dim partitioning leak, single-map-task fact, AQE
  * broadcast re-plan, downstream-agg veto), the flag disappears and this
  * fails — the result rows alone would stay correct and hide it.
  */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  test("q116: executed plan shows the AQE skew split (SortMergeJoin " +
    "skew=true over a skewed AQEShuffleRead)") {
    val df = SparkEntry.queries("q116_skew_aqe_join")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length === 3, "one row per l_returnflag expected")
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("SortMergeJoin(skew=true)"),
      s"AQE skew split did not fire:\n$finalPlan")
    assert(finalPlan.contains("AQEShuffleRead skewed"),
      s"expected a skewed shuffle read on the fact side:\n$finalPlan")
  }
}
