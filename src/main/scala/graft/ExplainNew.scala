package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("q165_group_trend_ols", "q166_column_profiler",
        "q167_inverted_index", "q168_consistent_hash",
        "q169_expectation_suite", "q170_ks_test",
        "q171_pmi_collocations")) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.takeWhile(!_.startsWith("(1) Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
