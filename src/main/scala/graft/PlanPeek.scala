package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scratch: print formatted plans for named queries (args). */
object PlanPeek {
  def main(argv: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    val sfDir = "/root/testdata/sf0.001"
    argv.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"===== $name =====")
      val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
      val exch = """\(\d+\) Exchange""".r.findAllIn(p).size
      val wins = """\(\d+\) Window""".r.findAllIn(p).size
      println(s"[summary] scans=$scans exchanges=$exch windows=$wins " +
        s"bhj=${p.contains("BroadcastHashJoin")} smj=${p.contains("SortMergeJoin")} " +
        s"cart=${p.contains("CartesianProduct")} bnlj=${p.contains("BroadcastNestedLoopJoin")}")
      println(p.linesIterator.filter(_.matches("""\(\d+\) .*""")).take(80).mkString("\n"))
    }
    spark.stop()
  }
}
