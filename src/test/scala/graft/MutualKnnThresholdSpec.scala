package graft

import org.scalatest.funsuite.AnyFunSuite

/** q153's adaptive-blocking threshold lives in TWO places — the engine's
  * in-plan CASE (`VectorOps.mutualKnnCodes2`) and the DuckDB oracle's
  * identical CASE (`SparkEntry.oracleSql("q153_mutual_knn")`). Both
  * interpolate `VectorOps.MutualKnnWideningThreshold`, but a future edit
  * could re-inline a literal on one side; then engine and oracle would
  * flip to the wide blocking key at DIFFERENT corpus sizes — output still
  * equal (blocking width never changes the pair set that survives the
  * verify+distinct, only candidate generation), but the oracle would no
  * longer replay the engine's plan, which is the property the q153
  * comment claims and the r14 scaling fix depends on. This spec extracts
  * the number from the BUILT blocking plan and from the oracle SQL text
  * and pins both to the constant, so a one-sided edit fails the build
  * (VERDICT r14 item 3). The helper is plan-inspected directly because
  * q153's final plan hides the CASE behind its localCheckpoint leaves.
  */
class MutualKnnThresholdSpec extends AnyFunSuite with SparkFixture {

  test("engine blocking plan carries the shared widening threshold") {
    import spark.implicits._
    val toyCodes = Seq((0L, 0, 1L), (0L, 1, 2L), (1L, 0, 1L))
      .toDF("vec_id", "m", "code")
    val plan = queries.VectorOps.mutualKnnCodes2(toyCodes)
      .queryExecution.analyzed.toString
    val re = """\(nv#\d+L? > (\d+)\)""".r
    val hits = re.findAllMatchIn(plan).map(_.group(1).toLong).toSeq.distinct
    assert(hits == Seq(queries.VectorOps.MutualKnnWideningThreshold),
      s"engine plan thresholds $hits != shared constant " +
        s"${queries.VectorOps.MutualKnnWideningThreshold}; plan:\n$plan")
  }

  test("oracle SQL carries the shared widening threshold") {
    val sql = SparkEntry.oracleSql("q153_mutual_knn")
    val re = """\(SELECT n FROM nv\)\s*>\s*(\d+)""".r
    val hits = re.findAllMatchIn(sql).map(_.group(1).toLong).toSeq
    assert(hits == Seq(queries.VectorOps.MutualKnnWideningThreshold),
      s"oracle thresholds $hits != shared constant " +
        s"${queries.VectorOps.MutualKnnWideningThreshold}")
  }
}
