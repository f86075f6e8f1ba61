package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q188_winnow_fingerprint", "q189_deletion_neighborhood",
        "q190_distinct_ngram_diversity", "q191_recursive_cte",
        "q192_pipe_syntax", "q193_time_decay")
    for (n <- names) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.takeWhile(!_.startsWith("(1) Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
