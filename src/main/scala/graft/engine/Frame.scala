package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Fluent logical-plan builder mirroring the reference's `DataFrame`
  * (reference `logical_plan/dataframe.rs:17-140`): the same seven builder
  * methods over a lazily-planned relation. Thin by design — each method is
  * one Catalyst plan node, exactly like each reference method wraps one
  * `LogicalPlan` variant.
  *
  * Divergences from the reference, chosen deliberately (SURVEY §7):
  *   - `aggregate` output INCLUDES the group keys (the reference emits only
  *     the aggregate columns — `aggregate/mod.rs:117-121` — a limitation,
  *     not a feature).
  *   - multi-key joins use every key pair (the reference silently uses only
  *     the first — `hash_join.rs:134`).
  *   - an empty `on` list produces a true Cartesian product (the
  *     reference's CrossJoin interleaves rows and is only correct when
  *     gcd(|L|,|R|)=1 — `cross_join.rs:74-180`).
  */
final case class Frame(df: DataFrame) {

  /** reference `dataframe.rs` `project` */
  def project(exprs: Column*): Frame = Frame(df.select(exprs: _*))

  /** reference `dataframe.rs` `filter` */
  def filter(cond: Column): Frame = Frame(df.filter(cond))

  /** reference `dataframe.rs` `aggregate(group_exprs, aggr_exprs)` */
  def aggregate(groupExprs: Seq[Column], aggrExprs: Seq[Column]): Frame =
    Frame(
      if (groupExprs.isEmpty) df.agg(aggrExprs.head, aggrExprs.tail: _*)
      else df.groupBy(groupExprs: _*).agg(aggrExprs.head, aggrExprs.tail: _*))

  /** reference `dataframe.rs` `limit` */
  def limit(n: Int): Frame = Frame(df.limit(n))

  /** reference `dataframe.rs` `offset` — applied before limit in SQL, same
    * composition order as the reference (`sql/planner.rs:49-52`). */
  def offset(n: Int): Frame = Frame(df.offset(n))

  /** reference `dataframe.rs` `join(right, join_type, (left_keys,
    * right_keys))`; empty keys ⇒ cross join (`dataframe.rs:114-122`). */
  def join(right: Frame, joinType: String,
           on: Seq[(String, String)]): Frame =
    if (on.isEmpty) crossJoin(right)
    else {
      val cond = on.map { case (l, r) => df(l) === right.df(r) }
        .reduce(_ && _)
      Frame(df.join(right.df, cond, joinType))
    }

  def crossJoin(right: Frame): Frame = Frame(df.crossJoin(right.df))

  /** Additions the reference stubbed (ORDER BY is parsed-then-dropped
    * there — `sql/planner.rs:159-162`). */
  def sort(exprs: Column*): Frame = Frame(df.orderBy(exprs: _*))

  def collect(): Array[Row] = df.collect()
  def show(): Unit = df.show(truncate = false)
  def schema: org.apache.spark.sql.types.StructType = df.schema
}
