package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("q103_rolling_time_window", "q104_tfidf_terms")) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.takeWhile(!_.startsWith("(1) Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
