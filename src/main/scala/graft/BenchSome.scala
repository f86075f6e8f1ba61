package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time a subset of queries (args = query names), same setup as
  * Bench. `sbt "runMain graft.BenchSome q46_minhash_lsh"`. Prints the same
  * calibration-normalized ratio as Bench (see there) so committed isolated
  * medians are comparable across differently-loaded hosts. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Declared session default: q309's SPJ demo needs it live at
      // physical-planning time (the caller's action), so it cannot be
      // scoped per-query; default-on makes it variance-free across queries.
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.ld(spark, sfDir, n).count())
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    def cal(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, 32)
        .select((col("id") % 1000).as("k"), xxhash64(col("id")).as("h"))
        // avg, not sum: summing 8M xxhash64 longs overflows under ANSI mode
        .groupBy("k").agg(avg("h").as("a"), max("h").as("m"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    cal() // warm-up
    // Per-query hygiene + ADJACENT calibration (r15): without Bench's
    // teardown, checkpoint blocks and shared memos accumulated across a
    // multi-query invocation and inflated late queries ~2× (the r12
    // lesson, re-observed r15: q101 measured 4.4 s at position 27/29 vs
    // its committed 3.8); and a single session-start calibration goes
    // stale under drifting host load. Same teardown set as Bench.
    def teardown(): Unit = {
      queries.Relational.clearShared()
      queries.PipelineOps.clearShared()
      spark.sharedState.cacheManager.clearCache()
      val artifactIds = graft.engine.Artifacts.pinnedRddIds(spark)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => artifactIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    args.foreach { name =>
      val calMed = (1 to 3).map(_ => cal()).sorted.apply(1)
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
      println(f"MEDIAN $name $m%.3f s ratio ${m / calMed}%.2f (vs cal $calMed%.3f)")
      teardown()
    }
    spark.stop()
  }
}
