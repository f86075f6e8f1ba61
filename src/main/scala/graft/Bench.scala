package graft
import org.apache.spark.sql.SparkSession

/** Bench harness: every SparkEntry query against SPARK_GRAFT_SF_DIR, timed
  * end-to-end through a `noop` sink so the FULL plan executes (a bare
  * count() would let Catalyst prune projections/sorts and under-report).
  *
  * Output protocol — the driver keeps only a TAIL of stdout, and r2/r3's
  * summary line (all ~88 per-query times inline, 2.2 KB) still overflowed it
  * three rounds running (`"parsed": null`). So: one compact line per query as
  * it finishes (full detail lives there), and a summary line LAST that is
  * deliberately SMALL (<1.5 KB): total + sf + the 10 slowest queries only.
  * Failed queries are marked `"sec":null,"err":true` in their per-query line
  * and EXCLUDED from min/total, so a crash can't masquerade as a fast run.
  *
  * Each query runs ONE excluded warm-up pass (absorbs Janino codegen, JIT,
  * and first-touch cache effects — r2-r6 showed 2-6x swings on untouched
  * scalar queries from shared-session contention; min-of-2 did NOT remove
  * it: r6 saw q44 5.35 -> 1.15 s and q31 2.64 s -> off-list with zero code
  * change) then SPARK_GRAFT_BENCH_ITERS measured runs (default 3) and
  * reports the per-query MEDIAN — robust to a single interfered run in
  * either direction, so plan-level wins/regressions are attributable
  * round-over-round. The warm-up time is still printed per query
  * (`"warm"`) so a pathological first run stays visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up session, codegen, and parquet footer/file-listing caches so
    // the first measured query doesn't absorb one-time JVM costs.
    Tables.names.foreach(n => Tables.ld(spark, sfDir, n).count())
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // A run that throws yields None — never a (near-zero) elapsed time.
      def run(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      }
      val warm = run() // excluded warm-up
      val times: Seq[Option[Double]] = (1 to iters).map(_ => run())
      val ok = times.flatten
      val runs = times.map(_.map(f3).getOrElse("null")).mkString("[", ",", "]")
      val sec = if (ok.nonEmpty) f3(median(ok)) else "null"
      val anyFail = warm.isEmpty || ok.size < times.size
      val err = if (anyFail) ",\"err\":true" else ""
      val warmS = warm.map(f3).getOrElse("null")
      println(s"""{"bench_query":"$name","sec":$sec,"warm":$warmS,"runs":$runs$err}""")
      (name, if (ok.nonEmpty) Some(median(ok)) else None, anyFail)
    }
    val good = results.collect { case (k, Some(v), _) => k -> v }
    val failed = results.collect { case (k, None, _) => k }
    // flaky = succeeded at least once but also threw at least once; the
    // per-query err line can scroll out of the driver's tail, so surface
    // them in the summary too — a 50%-reproducible crash must not read as
    // a green run.
    val flaky = results.collect { case (k, Some(_), true) => k }
    val slowest = good.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    def names(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = f3(good.map(_._2).sum)
    // Summary stays <1.5 KB and is the absolute last stdout line so the
    // driver's tail capture always ends with a complete JSON record.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${good.size},"failed":${names(failed)},"flaky":${names(flaky)},"slowest":$slowest}""")
    spark.stop()
  }
}
