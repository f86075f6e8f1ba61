package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of queries (args = query names), same setup as
  * Bench. `sbt "runMain graft.BenchSome q46_minhash_lsh"`. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.ld(spark, sfDir, n).count())
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    args.foreach { name =>
      // warm-up (run0, excluded) + `iters` measured runs; median reported —
      // same protocol as Bench so isolated numbers are comparable.
      val times = (0 to iters).map { run =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"$name: ${e.getMessage}") }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TIMING $name run$run $sec%.2f s" +
          (if (run == 0) " (warm-up, excluded)" else ""))
        sec
      }
      val m = times.drop(1).sorted.apply((iters - 1) / 2)
      println(f"MEDIAN $name $m%.3f s")
    }
    spark.stop()
  }
}
