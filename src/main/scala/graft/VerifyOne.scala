package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump a SUBSET of queries for oracle iteration without paying
  * for the full inventory — `sbt "runMain graft.VerifyOne <sfDir> <outDir>
  * q70_events_hourly ..."` then `python3 tools/check.py <outDir> <sfDir>
  * <names>`. Writes the same layout as Verify (parquet + oracle_sql.json
  * with ALL oracles, which check.py filters by name).
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    Verify.writeOracleJson(outDir)
    spark.stop()
  }
}
