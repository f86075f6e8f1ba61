package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 + pipeline ops);
  * `oracleSql` holds the DuckDB-equivalent SQL for every query whose
  * semantics are ANSI-SQL-expressible (the rest get rows-only checks).
  */
object SparkEntry {

  /** Flagship: the 5-way join + aggregation (TPC-H Q5 flavor) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q11_join_multi")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ TextOps.queries2 ++
      VectorOps.queries ++ VectorOps.queries2 ++
      EventOps.queries ++ EventOps.queries2 ++
      MultimodalOps.queries ++ MultimodalOps.queries2 ++ SinkOps.queries ++
      PipelineOps.queries

  // No whitespace collapsing: it would also rewrite multi-space string
  // literals inside the SQL (e.g. trim('  ' || …)). DuckDB takes the SQL
  // verbatim; Verify JSON-escapes newlines.
  def oracleSql: Map[String, String] =
    (Relational.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
      EventOps.oracle ++ MultimodalOps.oracle ++ SinkOps.oracle ++
      PipelineOps.oracle)
      // trim only — NO stripMargin: every oracle is plain-indented SQL,
      // and stripMargin silently eats one pipe from a line-leading `||`
      // (string concat), which twice shipped a broken oracle (q316,
      // q334) that surfaced only as a DuckDB binder error at check
      // time. A margin-styled oracle would be the bug now.
      .view.mapValues(_.trim).toMap
}
