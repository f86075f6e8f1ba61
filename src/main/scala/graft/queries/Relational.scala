package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.ld

/** Core relational operator inventory — SURVEY.md §2 re-expressed Spark-first.
  *
  * Covers the reference's whole surface (scan/project/filter/limit/offset,
  * inner+cross+implicit joins, grouped aggregation with expression keys,
  * count/sum/avg/min/max, scalar math, casts — reference
  * `logical_plan/plan.rs:17-50`, `physical_plan/`) plus everything the
  * reference stubbed or TODO'd (ORDER BY `sql/planner.rs:159-162`, outer
  * joins, multi-key joins `hash_join.rs:134`, set ops `sql/planner.rs:58-84`,
  * HAVING, DISTINCT aggregates, windows, subqueries, rollup).
  *
  * Conventions for oracle parity (driver hashes values with columns sorted by
  * name): every computed column is aliased identically in Spark and DuckDB
  * SQL; accumulation-order-sensitive double aggregates are round()ed; output
  * rows get a deterministic ORDER BY (harmless under the driver's own sort,
  * eliminated by Catalyst's EliminateSorts when Bench only count()s).
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> ((s, d) =>
      ld(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    "q02_filter" -> ((s, d) =>
      ld(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),

    "q03_project_arith" -> ((s, d) =>
      ld(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("charge"),
        (col("l_orderkey") % 7).as("bucket"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q04_sort_limit_offset" -> ((s, d) =>
      ld(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(5).limit(10)),

    // Money columns are exactly 2-decimal, so they aggregate as BIGINT
    // CENTS: the row-side decimal→cents conversion is exact (a double sum's
    // value depends on partial-agg merge order, which varies with DOP and
    // shuffle fetch timing), while the AGGREGATION buffer stays a plain
    // long — measured ~3× faster than summing DecimalType (128-bit
    // buffers). Averages round in exact integer space ((2t+n) div 2n =
    // half-up of t/n): both engines then produce bit-identical doubles.
    // SCOPE: the identity (and the Spark-DIV ≡ DuckDB-// equivalence) holds
    // for t ≥ 0 with 2·t·10^s inside BIGINT — true for this corpus's
    // non-negative money sums (≤ ~4.6e14 cents at scale 4). Negative t
    // (refunds) splits the operators (DIV truncates toward zero, // floors)
    // and overflow wraps on Spark but errors on DuckDB; see
    // IntegerRoundingPropsSpec's negative-operand test pinning the bound.
    // See q70 for the measured divergence that motivated this.
    "q05_agg_global" -> ((s, d) =>
      ld(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        count(col("l_shipdate")).as("cnt_ship"),
        sum(expr("CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .as("sqc"),
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .as("spc"),
        count(col("l_extendedprice")).as("np"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
      .selectExpr("cnt", "cnt_ship",
        "CAST(sqc AS DOUBLE) / 100 AS sum_qty",
        """CAST((2 * spc * 100 + np) DIV (2 * np) AS DOUBLE)
           / 10000 AS avg_price""",
        "min_price", "max_price")),

    "q06_agg_group" -> ((s, d) =>
      ld(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus").agg(
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("sqc"),
          sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("sbc"),
          // price(2dec) × (1−disc)(2dec) is an EXACT 4-decimal product →
          // 10⁻⁴-unit integer
          sum(expr("""CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                      (CAST(1 AS DECIMAL(14,2)) -
                       CAST(l_discount AS DECIMAL(14,2))) * 10000 AS BIGINT)"""))
            .as("sdp4"),
          sum(expr("CAST(CAST(l_discount AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("sdc"),
          count(lit(1)).as("cnt"))
        .selectExpr("l_returnflag", "l_linestatus",
          "CAST(sqc AS DOUBLE) / 100 AS sum_qty",
          "CAST(sbc AS DOUBLE) / 100 AS sum_base",
          "CAST(sdp4 AS DOUBLE) / 10000 AS sum_disc_price",
          """CAST((2 * sqc * 100 + cnt) DIV (2 * cnt)
                  AS DOUBLE) / 10000 AS avg_qty""",
          """CAST((2 * sdc * 10000 + cnt) DIV (2 * cnt)
                  AS DOUBLE) / 1000000 AS avg_disc""",
          "cnt")
        .orderBy("l_returnflag", "l_linestatus")),

    // Reference's canonical query 4 (`main.rs:36-40`): expression group key.
    // Divergence (documented SURVEY §7): we include the group key in output.
    "q07_agg_expr_key" -> ((s, d) =>
      ld(s, d, "lineitem")
        .groupBy((col("l_orderkey") % 3).as("k")).agg(
          count("l_orderkey").as("cnt"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("sqc"),
          sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("spc"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"))
        .selectExpr("k", "cnt",
          "CAST(sqc AS DOUBLE) / 100 AS sum_qty",
          """CAST((2 * spc * 100 + cnt) DIV (2 * cnt)
                  AS DOUBLE) / 10000 AS avg_price""",
          "min_qty", "max_qty")
        .orderBy("k")),

    "q08_agg_distinct" -> ((s, d) =>
      ld(s, d, "lineitem")
        .groupBy("l_returnflag").agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    "q09_having" -> ((s, d) =>
      ld(s, d, "orders")
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .filter(col("n") > 100)
        .orderBy("o_orderpriority")),

    "q10_join_broadcast" -> ((s, d) => {
      val o = ld(s, d, "orders"); val c = ld(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment").agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q5 flavor: 5-way join; dims broadcast, fact-side shuffle only on
    // the join keys Catalyst picks (orderkey); survives 100× scale-up.
    // EAGER AGGREGATION below the join: lineitem revenue collapses to one
    // row per order BEFORE touching orders — the parquet is
    // orderkey-clustered, so map-side combine compacts the ~4 lines/order
    // inside each scan partition and the orderkey shuffle moves per-ORDER
    // partials, not per-LINE rows; the later custkey shuffle is 4× thinner
    // too. Sum-of-partial-sums over exact BIGINT cents is
    // associativity-safe, so results are bit-identical to the direct plan.
    // At 100 TB this halves-to-quarters every byte the fact table pushes
    // through the wire (measured sf0.1 min-of-2: 1.88 → 1.35-1.45 s).
    // r12 DRIVER ANOMALY ADJUDICATED (r13): the 7.66 s / ratio 16.7
    // driver number was POSITIONAL, not plan — q11 sorts right after
    // q119, whose per-run PQ re-training stacked checkpoint generations
    // and dumped GC debt into q11's window (BENCH_DETAIL_r12_driver
    // .jsonl: q119 runs [1.97→7.20] s escalating, q11 [4.59→8.30] s,
    // recovery by q121; full note in BASELINE.md §r13). Isolated r13
    // median: 1.64 s / ratio 2.9 (BENCH_DETAIL_r13_iso). Fixed by the
    // Artifacts memo + between-query System.gc() in Bench.
    "q11_join_multi" -> ((s, d) => {
      val r = ld(s, d, "region"); val n = ld(s, d, "nation")
      val c = ld(s, d, "customer"); val o = ld(s, d, "orders")
      val l = ld(s, d, "lineitem")
      // exact 4-dec revenue product summed as a 10⁻⁴-unit BIGINT: a
      // double revenue sum is merge-order-dependent AND its true value
      // can sit exactly on a .xx5 rounding boundary (unlike plain
      // 2-dec money sums); the long buffer keeps the agg fast
      val lrev = l.groupBy("l_orderkey").agg(
        sum(expr("""CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                    (CAST(1 AS DECIMAL(14,2)) -
                     CAST(l_discount AS DECIMAL(14,2))) * 10000 AS BIGINT)"""))
          .as("orev4"),
        count(lit(1)).as("o_lines"))
      lrev.join(o, lrev("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name").agg(
          sum("orev4").as("rev4"), sum("o_lines").as("n_lines"))
        .selectExpr("r_name", "n_name",
          "CAST(rev4 AS DOUBLE) / 10000 AS revenue", "n_lines")
        .orderBy("r_name", "n_name")
    }),

    "q12_join_left" -> ((s, d) => {
      val c = ld(s, d, "customer"); val o = ld(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey").agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spent"))
        .orderBy("c_custkey")
    }),

    "q13_join_right" -> ((s, d) => {
      val l = ld(s, d, "lineitem"); val o = ld(s, d, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"), "right")
        .groupBy("o_orderkey").agg(count(col("l_orderkey")).as("n_items"))
        .orderBy("o_orderkey")
    }),

    "q14_join_full" -> ((s, d) => {
      val c = ld(s, d, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      val p = ld(s, d, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, c("c_nationkey") === p("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    "q15_join_semi" -> ((s, d) => {
      val c = ld(s, d, "customer")
      val big = ld(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q16_join_anti" -> ((s, d) => {
      val c = ld(s, d, "customer")
      val big = ld(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q17_join_cross" -> ((s, d) =>
      ld(s, d, "region").crossJoin(ld(s, d, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name")),

    // Implicit join from WHERE — the reference's one real planner feature
    // (`sql/planner.rs:305-380`); Catalyst rewrites Filter(CrossJoin)→equi-join.
    "q18_join_implicit" -> ((s, d) => {
      graft.Tables.view(s, d, "customer", "orders")
      s.sql("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
               FROM customer, orders
               WHERE c_custkey = o_custkey AND o_totalprice > 480000
               ORDER BY o_orderkey""")
    }),

    // Multi-key equi-join (reference only ever used the first key pair —
    // `hash_join.rs:134`).
    "q19_join_multikey" -> ((s, d) => {
      // Self-join sharing ONE exchange: both branches (the per-(part,supp)
      // aggregate and the probe) hang off the same repartition on the join
      // keys, so the plan shuffles lineitem ONCE (ReusedExchange) and the
      // aggregate + join both run exchange-free on top. (part,supp) pairs
      // are near-unique per line, so partial aggregation would NOT shrink a
      // second shuffle — sharing beats combining here, the opposite
      // trade-off from q11's orderkey-clustered eager agg. shuffle_hash
      // keeps both branches sort-free (SMJ would add two sorts; broadcast
      // would rebuild the pipeline under BroadcastExchange — the r4 q45
      // lesson). Measured sf0.1 min-of-2: 1.62 → ~1.0 s.
      // ISOLATED MEDIAN (BenchSome, warm-up + median-of-3, r8, untouched
      // code): 0.77 s calm host / 1.02 s loaded host (ratio 2.9× the
      // synthetic calibration run) — BENCH_r07's 4.508 s was a host-load
      // phantom, the q24 class; the plan did not regress.
      val base = ld(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity")
        .repartition(col("l_partkey"), col("l_suppkey"))
      val ps = base.groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("tot_qty"))
      base.join(ps.hint("shuffle_hash"),
          base("l_partkey") === ps("pk") && base("l_suppkey") === ps("sk"))
        .filter(col("n_lines") >= 2)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "tot_qty")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q20_union_all" -> ((s, d) =>
      ld(s, d, "customer").select(col("c_nationkey").as("nk"), lit("cust").as("side"))
        .unionAll(
          ld(s, d, "supplier").select(col("s_nationkey").as("nk"), lit("supp").as("side")))
        .orderBy("side", "nk")),

    "q21_union_distinct" -> ((s, d) =>
      ld(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(ld(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")),

    "q22_intersect" -> ((s, d) =>
      ld(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(ld(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    "q23_except" -> ((s, d) =>
      ld(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(ld(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // CAST — parse-only in the reference (`cast.rs:40-88` all todo!()).
    // Perf note (r6 verdict asked): BENCH_r05/r06 showed q24 at 4.1/3.4 s —
    // #2 slowest — absurd for a 600k-row cast projection. Isolated
    // (BenchSome, r7, two sessions): 0.59-0.92 s median, warm-up ≤1.4 s.
    // The in-suite number was SUITE INTERFERENCE (codegen/GC from
    // neighbouring queries under min-of-2), not this plan; the r7 bench
    // protocol (excluded warm-up + median-of-3) exists to stop that class
    // of phantom from masquerading as a plan cost.
    "q24_cast" -> ((s, d) =>
      ld(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("bigint").as("ln_big"),
        col("l_orderkey").cast("string").as("ok_str"),
        col("l_shipdate").cast("date").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Scalar math incl. a *correct* tan (reference dispatches tan→cos,
    // `unary.rs:96`). Transcendentals rounded: libm vs Java may differ 1 ulp.
    "q25_scalar_math" -> ((s, d) =>
      ld(s, d, "part").select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("abs_v"),
        round(sin(col("p_size").cast("double")), 6).as("sin_v"),
        round(cos(col("p_size").cast("double")), 6).as("cos_v"),
        round(tan(col("p_size").cast("double")), 6).as("tan_v"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_v"),
        round(log(col("p_retailprice")), 6).as("ln_v"),
        floor(col("p_retailprice")).as("floor_v"),
        ceil(col("p_retailprice")).as("ceil_v"))
        .orderBy("p_partkey")),

    // String functions — enumerated but todo!() in the reference
    // (`unary.rs:97-106`).
    // Perf note (r2 flagged 4.8 s for a 15k-row projection): the cost is
    // one-time Janino compilation of the wide codegen'd projection, not
    // data work — measured first/second run 3.68s/0.60s at sf0.1 and
    // 2.63s/0.27s at sf0.001 (same compile cost on 100× less data).
    // Steady-state is in line with q24/q25; Bench reports min-of-2, which
    // amortizes exactly this kind of per-plan JIT cost — as any warm
    // long-lived session (or a 100 TB run, where compile is noise) would.
    "q26_string_funcs" -> ((s, d) =>
      ld(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up_name"),
        lower(col("c_name")).as("lo_name"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_pfx"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("tagged"),
        reverse(col("c_name")).as("rev_name"),
        regexp_replace(col("c_name"), "0", "_").as("subbed"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"))
        .orderBy("c_custkey")),

    // CASE / NULL semantics / Kleene three-valued logic (`binary.rs:133-148`).
    "q27_case_null" -> ((s, d) =>
      ld(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("band"),
        nullif(col("o_orderstatus"), lit("O")).as("st_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st2"),
        (col("o_totalprice") > 300000 && nullif(lit(1), lit(1)) === 1).as("kleene_and"))
        .orderBy("o_orderkey")),

    "q28_window" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wr = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
      ld(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(wr).as("rnk"),
        round(sum("o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("run_sum"),
        lag("o_totalprice", 1).over(w).as("prev_price"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    "q29_subq_scalar" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
               ORDER BY o_orderkey""")
    }),

    "q30_subq_in" -> ((s, d) => {
      graft.Tables.view(s, d, "part", "lineitem")
      s.sql("""SELECT p_partkey, p_name FROM part
               WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
               ORDER BY p_partkey""")
    }),

    "q31_topk" -> ((s, d) =>
      ld(s, d, "lineitem")
        .groupBy("l_partkey").agg(
          // exact integer-cents revenue (see q11) — also makes the top-k
          // ORDER itself engine-deterministic, not just the emitted digits
          sum(expr("""CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                      (CAST(1 AS DECIMAL(14,2)) -
                       CAST(l_discount AS DECIMAL(14,2))) * 10000 AS BIGINT)"""))
            .as("rev4"))
        .selectExpr("l_partkey", "CAST(rev4 AS DOUBLE) / 10000 AS revenue")
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(25)),

    // ISOLATED MEDIAN (BenchSome, warm-up + median-of-3, r8, untouched
    // code): 0.38 s calm host / 0.54 s loaded host (ratio 1.6× the
    // synthetic calibration run) — BENCH_r07's 3.252 s was a host-load
    // phantom (same class as q24, proven r7, and q19): a pure codegen'd
    // date projection over 600 k rows cannot cost 3 s.
    "q32_date_funcs" -> ((s, d) =>
      ld(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("mo_start"))
        .orderBy("o_orderkey")),

    "q33_rollup" -> ((s, d) =>
      ld(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus").agg(
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    "q34_distinct" -> ((s, d) =>
      ld(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    "q35_cube" -> ((s, d) =>
      ld(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus").agg(
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))),

    "q36_grouping_sets" -> ((s, d) => {
      // register only the table the SQL touches — views() re-reads all 10
      // parquet footers per call and was 2.3× of q35's whole runtime
      graft.Tables.view(s, d, "lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
                      grouping(l_returnflag) AS g_rf
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                       (l_returnflag, l_linestatus))
               ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    }),

    // Generator/UDTF surface (absent in the reference — SURVEY §2.9):
    // explode a computed array, re-aggregate. Scale shape: Generate is
    // pipelined inside codegen; the groupBy is one keyed shuffle.
    "q37_explode_tokens" -> ((s, d) =>
      ld(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 3)
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))),

    // Approximate aggregates (HLL + quantile sketch) next to their exact
    // counterparts, as a BANDED ORACLE (r13; previously CI-exempted): raw
    // sketch values are engine-specific, so the query emits the EXACT
    // distinct counts (DuckDB-replayable) plus booleans asserting each
    // sketch landed inside its documented error band — computed from
    // exact ranks/counts IN the data. A drifting sketch flips a flag and
    // the hash compare goes red, so the exemption list goes to zero.
    // Bands: HLL at rsd=0.02 checked at ±6 % (3σ); the quantile sketch at
    // accuracy=1000 checked at rank error n/1000 + 1 (the same band
    // SketchPropertySpec asserted since r4, now cross-checked per round).
    // The exact COUNT(DISTINCT) runs in its own aggregation: mixing it with
    // the sketches made Catalyst Expand-duplicate every input row for the
    // distinct path, and the sketch buffers then updated on the expanded
    // stream (~2× the work, measured 4.3 s vs ~1.5 s split at sf0.1). The
    // 3-row sketch frame is localCheckpoint-pinned so its two consumers
    // (the verdict join and the rank probe) run ONE sketch pass.
    "q38_approx_agg" -> ((s, d) => {
      val l = ld(s, d, "lineitem")
      val exact = l.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"))
      val approx = l.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("amed"))
        .localCheckpoint()
      // exact rank interval of the sketch's median pick: one broadcast
      // probe over the fact table, map-side combined
      val ranks = l
        .join(broadcast(approx.select("l_returnflag", "amed")),
          "l_returnflag")
        .groupBy("l_returnflag").agg(
          sum(when(col("l_extendedprice") < col("amed"), 1L)
            .otherwise(0L)).as("rank_lo"),
          sum(when(col("l_extendedprice") <= col("amed"), 1L)
            .otherwise(0L)).as("rank_hi"))
      exact.join(broadcast(approx), "l_returnflag")
        .join(broadcast(ranks), "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.06).as("hll_ok"),
          // value spans exact ranks [rank_lo+1, rank_hi]; sketch contract:
          // that interval must touch target n/2 ± (n/1000 + 1)
          (col("rank_hi") > col("rank_lo") &&
            (col("rank_lo") + 1).cast("double")
              <= col("n_rows") / 2.0 + col("n_rows") / 1000.0 + 1 &&
            col("rank_hi").cast("double")
              >= col("n_rows") / 2.0 - col("n_rows") / 1000.0 - 1)
            .as("med_rank_ok"))
        .orderBy("l_returnflag")
    }),

    // Ordered array aggregation over a keyed group (array column surface).
    // The array is serialized to CSV for the compare: the driver's pandas
    // hash can't digest a raw array column (r2's only red row). The native
    // ArrayType output of sort_array(collect_list(..)) stays pinned by
    // EngineSpec's "array aggregation" test.
    "q39_array_agg" -> ((s, d) =>
      ld(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        .agg(concat_ws(",",
            sort_array(collect_list(col("l_linenumber")))).as("linenums"),
          round(sum("l_quantity"), 2).as("tot_qty"))
        .orderBy("l_orderkey")),

    // Window-function suite beyond q28: ntile, percent_rank, cume_dist,
    // first/last over a RANGE frame, dense_rank — one shuffle on the
    // partition key, evaluated in a single window pass per frame spec.
    "q58_window_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ld(s, d, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          dense_rank().over(w).as("drank"),
          first("o_totalprice").over(w).as("min_price_so_far"),
          round(avg("o_totalprice").over(
            w.rowsBetween(-2, 0)), 4).as("mov_avg3"))
        .orderBy("o_orderkey")
    }),

    // Date/interval arithmetic (Timestamp/Decimal are todo!() in the
    // reference's type table — sql/planner.rs:516-518).
    "q59_date_arith" -> ((s, d) =>
      ld(s, d, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"), col("o_orderdate"),
          date_add(col("o_orderdate"), 90).as("due_date"),
          add_months(col("o_orderdate"), 3).as("plus_q"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))
            .as("days_to_eoy"),
          (quarter(col("o_orderdate"))).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")),

    // Statistical aggregates (absent in the reference). Rounded: Spark and
    // DuckDB accumulate in different orders; only order-stable digits kept.
    "q52_stats_agg" -> ((s, d) =>
      ld(s, d, "lineitem")
        .groupBy("l_returnflag").agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(avg("l_quantity"), 4).as("avg_qty"))
        .orderBy("l_returnflag")),

    // Non-equi (range) join: lineitem banded by quantity against a small
    // ranges dim. Broadcasting the dim turns the BNLJ linear — the scale
    // pattern for range predicates against small lookup tables; for
    // fact×fact ranges you'd bin both sides to an equi-join key instead.
    "q53_range_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("tiny", 0.0, 10.0), ("small", 10.0, 20.0), ("mid", 20.0, 30.0),
        ("large", 30.0, 40.0), ("huge", 40.0, 100.0))
        .toDF("band", "lo", "hi")
      val l = ld(s, d, "lineitem")
      l.join(broadcast(bands),
          l("l_quantity") >= bands("lo") && l("l_quantity") < bands("hi"))
        .groupBy("band").agg(
          count(lit(1)).as("n"),
          (sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("double") / 100).as("sum_price"))
        .orderBy("band")
    }),

    // Custom typed Aggregator (UDAF with distributed merge — see
    // graft.functions.GeoMean): geometric mean of extended price per flag.
    "q54_custom_udaf" -> ((s, d) => {
      val geo = udaf(graft.functions.GeoMean)
      ld(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(geo(col("l_extendedprice")), 2).as("geo_price"))
        .orderBy("l_returnflag")
    }),

    // Exact money arithmetic on DecimalType — declared in the reference's
    // DDL type table but stubbed (`sql/planner.rs:518` todo!()). Everything
    // stays in decimal end-to-end (no double drift): sums of DECIMAL(12,2)
    // are exact, Tungsten keeps the aggregation buffer in a 128-bit decimal
    // (decimalMoneyExact below; its DecimalType schema is pinned by
    // QueriesSmokeSpec). ONLY for the driver compare, the final projection
    // casts every decimal to a string: the driver reads Spark parquet via
    // pandas (DECIMAL → decimal.Decimal, stringifies '901.00') but the
    // DuckDB oracle via .df() (DECIMAL → float64, stringifies '901.0'), so
    // any trailing-zero value hash-diverges unless both sides emit the same
    // representation. Both engines render DECIMAL(p,s)→string with all s
    // fractional digits, so the strings are bit-identical. No division:
    // quotient rounding at internal scale is engine-specific; exact ops only.
    "q69_decimal_money" -> ((s, d) =>
      decimalMoneyExact(s, d).select(
        col("l_returnflag"),
        col("sum_price").cast("string").as("sum_price"),
        col("sum_disc_price").cast("string").as("sum_disc_price"),
        col("min_price").cast("string").as("min_price"),
        col("max_price").cast("string").as("max_price"),
        col("n"))),

    // Skew-resistant two-phase aggregation (salting): partial agg on
    // (key, salt) spreads a hot key over 16 reducers, final agg merges.
    // Result is identical to a direct groupBy — the oracle is the plain
    // GROUP BY. At 100 TB this is the pattern for power-law keys; here
    // l_returnflag has only 3 values, the canonical hot-key shape.
    // Hand-salted SKEW JOIN — the join-side twin of q50's salted agg.
    // l_returnflag has 3 values, so a plain shuffle join on it routes ~1/3
    // of the fact through ONE reducer; at 100 TB that reducer runs for
    // hours while 999 executors idle. The fix: replicate the dim row
    // across 16 salts (dim×16 stays tiny), derive the fact's salt
    // deterministically from orderkey, and join on (flag, salt) — each hot
    // key now spreads over 16 reducers, and the result is provably
    // identical to the unsalted join (the oracle runs the plain join).
    // AQE's skew split only rescues sort-merge joins after the fact;
    // salting is the portable fix and the only one for shuffled-hash.
    // shuffle_hash pins the honest shape (Spark would broadcast the
    // 48-row dim here and hide the story — the q94 tactic). The
    // above-average test multiplies cents×count instead of dividing —
    // exact integer compare, no quotient rounding to diverge (q70 class).
    "q86_skew_salted_join" -> ((s, d) => {
      val S = 16
      val l = ld(s, d, "lineitem")
      val dim = l.groupBy("l_returnflag").agg(
        sum(expr("CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .as("fqc"),
        count(lit(1)).as("fn"))
      val salted = dim.withColumn("salt",
        explode(sequence(lit(0), lit(S - 1))))
      val fact = l.select(col("l_returnflag"), col("l_quantity"),
        (col("l_orderkey") % S).cast("int").as("salt"))
      fact.join(salted.hint("shuffle_hash"), Seq("l_returnflag", "salt"))
        .filter(expr(
          "CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT) * fn > fqc"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_above_avg"))
        .orderBy("l_returnflag")
    }),

    // q86's AUTOMATIC twin: the same skewed join (3-value key, broadcast
    // disabled) left unsalted and handed to AQE's OptimizeSkewedJoin,
    // which splits oversized post-shuffle partitions on the fact side and
    // replicates the matching dim partition — the runtime version of what
    // q86's salt does by construction. SkewJoinSpec pins the EXECUTED
    // plan: SortMergeJoin(skew=true) + an "AQEShuffleRead skewed" on the
    // fact side. Getting the rule to fire at all is the documentation
    // here — it demands exactly this shape (each probed on Spark 4.1):
    //   1. The dim must arrive with UNKNOWN partitioning (here: written to
    //      parquet and read back, as a real dim table would) — a groupBy
    //      dim already satisfies the join's clustering, so EnsureRequire-
    //      ments inserts no dim-side Exchange and the rule's pattern
    //      (raw ENSURE_REQUIREMENTS shuffle under BOTH sort sides) never
    //      matches. An explicit repartition(col) doesn't help either:
    //      REPARTITION_BY_COL origin is rejected by the same pattern.
    //   2. The skewed partition splits at map-output granularity, so the
    //      fact side needs MANY map tasks. A toy-scale parquet is one
    //      row group = one map task = unsplittable; the round-robin
    //      repartition(32) below stands in for the thousands of upstream
    //      tasks a real fact has (and is why salting needs no such prop).
    //   3. spark.sql.adaptive.autoBroadcastJoinThreshold must ALSO be
    //      disabled — AQE re-plans the SMJ into a broadcast join from
    //      runtime stats before skew handling is ever consulted.
    //   4. forceOptimizeSkewedJoin, because the downstream same-key
    //      aggregate otherwise vetoes the split (it breaks the join's
    //      output partitioning; AQE re-shuffles for the agg instead —
    //      the documented price of the automatic path).
    // WHEN TO USE WHICH: AQE's split is free to adopt (no query rewrite)
    // but is engine-specific, only rescues sort-merge/shuffled-hash
    // shapes matching the pattern above, and splits by map ranges — one
    // monster key spread across few map outputs still bottlenecks.
    // q86's salting is a deterministic, engine-portable REWRITE that
    // spreads even a single hot key over S reducers by construction —
    // the choice at 100 TB when one key dominates or the join shape
    // doesn't match the rule. The aggregate itself needs no rescue either
    // way: partial aggregation shrinks every task to ≤3 rows pre-shuffle.
    "q116_skew_aqe_join" -> ((s, d) => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      ss.conf.set("spark.sql.shuffle.partitions", "32")
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      ss.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      ss.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      val l = ld(ss, d, "lineitem")
      // per-invocation unique scratch path (concurrent builds in one
      // session can never clobber each other's dim mid-read — the q110
      // session-mutation class); lives in system tmp and is removed at
      // JVM exit, so nothing accumulates under target/ across bench runs
      val dimPath = SinkOps.scratchDir("graft_q116_dim_") + "/dim"
      l.groupBy("l_returnflag").agg(
        sum(expr("CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .as("fqc"),
        count(lit(1)).as("fn"))
        .write.mode("overwrite").parquet(dimPath)
      l.select(col("l_returnflag"), col("l_quantity")).repartition(32)
        .join(ss.read.parquet(dimPath), Seq("l_returnflag"))
        .filter(expr(
          "CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT) * fn > fqc"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_above_avg"))
        .orderBy("l_returnflag")
    }),

    // Runtime BLOOM-FILTER join (semi-join reduction): a selective filter
    // on orders means most lineitem rows can't find a partner — Catalyst's
    // InjectRuntimeFilter builds a bloom filter over the filtered orders'
    // keys and applies might_contain() to the lineitem scan, pruning the
    // fact BEFORE its shuffle. At 100 TB this is the difference between
    // shuffling the whole fact and shuffling the ~1 % that survives; it
    // composes with (not replaces) dynamic partition pruning. Runs on a
    // cloned session: the application-side size threshold defaults to
    // 10 GB (the test fact is 20 MB — the optimization would silently not
    // fire and the plan pin would test nothing), and broadcast is disabled
    // because a broadcast join already semi-join-reduces by construction —
    // at real fact×fact scale neither side broadcasts, which is exactly
    // when the bloom filter earns its keep. PlanSpec pins
    // bloom_filter_agg + might_contain in the plan.
    "q99_runtime_filter_join" -> ((s, d) => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      ss.conf.set("spark.sql.shuffle.partitions", "32")
      ss.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = ld(ss, d, "orders").filter(col("o_totalprice") > 490000)
      val l = ld(ss, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n_lines"),
          (sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("double") / 100).as("tot_price"))
        .orderBy("o_orderpriority")
    }),

    "q50_salted_agg" -> ((s, d) => {
      val partial = ld(s, d, "lineitem")
        .withColumn("salt", col("l_orderkey") % 16)
        .groupBy("l_returnflag", "salt").agg(
          count(lit(1)).as("pn"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("pqc"))
      partial.groupBy("l_returnflag").agg(
          sum("pn").as("n"),
          (sum("pqc").cast("double") / 100).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Fixed-point integer PageRank, K=3 rounds, damping 0.85 (= 17/20 in
    // integer arithmetic), over the undirected part↔supplier bipartite
    // graph of distinct lineitem pairs (nodes namespaced into one BIGINT
    // space: part → 2k, supplier → 2k+1). Complements the connected-
    // components primitive (q101's label propagation) with WEIGHTED
    // iterative propagation — the other canonical relational-iteration
    // shape. Scores live in integer micro-units and every contribution is
    // floor-divided ((r·17) DIV (20·deg)), so each round is bit-exact and
    // the DuckDB oracle replays all three rounds as a CTE chain — no
    // float accumulation order to diverge. Undirected edges mean every
    // node has out-degree ≥ 1: no dangling-mass term. The per-round plan
    // is one join keyed on src (the edge frame is degree-annotated and
    // checkpointed ONCE, partitioned by src — each round reshuffles only
    // the rank frame, |nodes| rows) plus one dst-keyed agg, both map-side
    // combined; K is fixed and small, the standard production choice
    // (power iteration to tolerance is the same loop with q101's
    // observe()-metric convergence read).
    "q131_pagerank" -> ((s, d) => {
      // r15 (§1.2/§2.6): pin the DISTINCT pair list once — the old shape
      // ran the corpus scan + distinct TWICE (once inside the deg
      // checkpoint, once inside the withDeg checkpoint). deg itself no
      // longer needs its own eager pin: inside the single withDeg action
      // the edges exchange is shared between the join side and the
      // groupBy side (ReusedExchange), and the rank-init re-derives deg
      // from the pinned pair frame (edge-list-sized, not corpus-sized).
      // Net: one corpus scan + distinct instead of two, 3 eager actions
      // → 2.
      val pairs = ld(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("p"),
          (col("l_suppkey") * 2 + 1).as("q"))
        .distinct()
        .localCheckpoint()
      val edges = pairs.select(col("p").as("src"), col("q").as("dst"))
        .unionAll(pairs.select(col("q").as("src"), col("p").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val withDeg = edges.join(deg, "src").localCheckpoint()
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      // No per-round checkpoint (r15): each round's rank frame is consumed
      // exactly ONCE by the next round, so lineage stays linear in K = 3 —
      // the checkpoint bought nothing and cost one eager job + one block
      // write/read per round (3 fewer driver→cluster round-trips; guide
      // §2.6's job-overhead point). The edge frame (read 3×) stays pinned.
      for (_ <- 1 to 3) {
        ranks = withDeg.join(ranks, col("src") === col("node"))
          .groupBy("dst")
          .agg(sum(expr("(r * 17) DIV (20 * deg)")).as("inflow"))
          .select(col("dst").as("node"),
            (lit(150000L) + col("inflow")).as("r"))
      }
      ranks.orderBy("node")
    }),

    // Per-node TRIANGLE counting with DEGREE-ORIENTED edges — the third
    // canonical relational-graph primitive next to q101's connected
    // components and q131's PageRank (triangle counts drive clustering
    // coefficients / community strength in curation graphs). Graph:
    // suppliers co-supplying SIGNIFICANTLY more parts than chance. A fixed
    // absolute threshold is degenerate (at sf0.01 every supplier pair
    // shares ≥ 98 parts) and bare lift (shared·n > deg_a·deg_b) keeps
    // ~half of all pairs at every sf (the mean is 1 by construction); the
    // shipped test is lift > 1 AND one hypergeometric sd above expectation
    // — (shared·n − da·db)²·(n−1) ≥ da·db·(n−da)·(n−db), exact in
    // DECIMAL(38) (BIGINT overflows past sf0.1) and mirrored by HUGEINT in
    // the oracle. DECIMAL(38) itself has a ceiling: both sides are ≤ n⁵,
    // so exactness holds while n < 4·10⁷ parts (≈ sf200); past that,
    // non-ANSI Spark would overflow to NULL — filter()=false, an edge
    // SILENTLY dropped — while the oracle's HUGEINT raises. The in-plan
    // assert_true on the 1-row nparts frame (codegen'd, free) makes Spark
    // fail loudly at the same boundary instead. The test ADAPTS with
    // scale: the sd shrinks relative to the
    // mean as |parts| grows, so bigger corpora give sparser, more
    // meaningful graphs (probed: 5/45 edges at sf0.001, 767/4,950 → 676
    // triangles at sf0.01, 79,403/499,500 → 686 k at sf0.1 — vs 242 k
    // edges / 19.1 M triangles under bare lift). The
    // naive triangle join is wedges = Σ deg², unbounded under hubs; each
    // undirected edge is instead directed from the (degree, id)-SMALLER
    // endpoint to the larger — a total order, so every triangle survives
    // as exactly ONE wedge (a→b, a→c with π(b) < π(c)) plus one closing-
    // edge probe, and out-degrees are O(√m)-bounded (arboricity bound):
    // wedge volume drops from Σ deg² to Σ outdeg² — the classic
    // MapReduce triangle recipe. All joins are keyed (wedge build on the
    // apex, closing probe a LEFT SEMI on the directed pair); the only
    // broadcast is the 1-row part count.
    "q134_triangle_count" -> ((s, d) => {
      val pinned = coSupplyEdges(s, d)
      val und = pinned.select(col("s1").as("u"), col("s2").as("v"))
        .unionAll(pinned.select(col("s2").as("u"), col("s1").as("v")))
      val gdeg = und.groupBy("u").agg(count(lit(1)).as("gd"))
      // π(x) = (graph-degree, id): a total order over nodes
      val dir = und
        .join(gdeg.hint("shuffle_hash"), "u")
        .join(gdeg.select(col("u").as("v"), col("gd").as("gdv"))
          .hint("shuffle_hash"), "v")
        .filter(col("gd") < col("gdv") ||
          (col("gd") === col("gdv") && col("u") < col("v")))
        .select("u", "v", "gdv")
        .localCheckpoint()
      val tri = dir.as("e1")
        .join(dir.as("e2").hint("shuffle_hash"),
          col("e1.u") === col("e2.u") &&
            (col("e1.gdv") < col("e2.gdv") ||
              (col("e1.gdv") === col("e2.gdv") && col("e1.v") < col("e2.v"))))
        .select(col("e1.u").as("na"), col("e1.v").as("nb"),
          col("e2.v").as("nc"))
        // π(nb) < π(nc), so the closing edge, if present, is nb→nc
        .join(dir.select(col("u").as("nb"), col("v").as("nc"))
          .hint("shuffle_hash"), Seq("nb", "nc"), "left_semi")
      tri.select(explode(array(col("na"), col("nb"), col("nc")))
          .as("supplier"))
        .groupBy("supplier").agg(count(lit(1)).as("n_tri"))
        .orderBy("supplier")
    }),

    // POINT-IN-TIME (feature-store) lookup: every lineitem joined to the
    // customer's cumulative spend AS OF its ship date — the PIT join a
    // feature store serves for training-data assembly (no feature
    // leakage: a fact must never see a dim version from its future).
    // Composes q130's SCD versioning (the dim: one cumulative-spend
    // version per (customer, order date), same-date orders collapsed
    // into one boundary) with q49's carry-forward machinery — but where
    // q49 carries a timestamp between two event streams, this carries
    // versioned dim ATTRIBUTES onto a fact table. The scalable shape is
    // the same: union-tag version and fact rows, ONE custkey-keyed
    // ordered window pass with last(ignoreNulls) carrying the newest
    // version value forward (version rows sort before facts at an equal
    // instant, so a same-day version is visible — inclusive PIT). No
    // per-fact range join, no version explosion; money in exact BIGINT
    // cents. DuckDB's native ASOF LEFT JOIN is the oracle.
    "q145_pit_lookup" -> ((s, d) => {
      val wv = Window.partitionBy("custkey").orderBy("vdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val versions = ld(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"),
          col("o_orderdate").as("vdate"))
        .agg(sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .as("day_cents"))
        .withColumn("spend_cents", sum("day_cents").over(wv))
      val facts = ld(s, d, "lineitem")
        .join(ld(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
          col("l_shipdate").as("fdate"))
      val tagged = versions.select(col("custkey"), col("vdate").as("dt"),
          lit(0).as("is_fact"), lit(null).cast("long").as("l_orderkey"),
          lit(null).cast("int").as("l_linenumber"), col("spend_cents"))
        .unionByName(facts.select(col("custkey"), col("fdate").as("dt"),
          lit(1).as("is_fact"), col("l_orderkey"), col("l_linenumber"),
          lit(null).cast("long").as("spend_cents")))
      val wc = Window.partitionBy("custkey")
        .orderBy(col("dt"), col("is_fact"), col("l_orderkey"),
          col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("spend_asof",
          last(col("spend_cents"), ignoreNulls = true).over(wc))
        .filter(col("is_fact") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
          col("dt").as("ship_date"),
          coalesce(col("spend_asof"), lit(0L)).as("spend_asof_cents"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Per-group OLS trend: the closed-form least-squares slope of order
    // value (cents) over time, one slope per order priority — the
    // "is this source's quality drifting?" monitor in regression form.
    // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), computed ENTIRELY in
    // exact integer space and emitted as the (numerator, denominator)
    // pair rendered to digit strings — regr_slope() in either engine is
    // accumulation-order-dependent floating point, but both engines agree
    // bit-for-bit on the integer sums. x is re-based per group
    // (day − min(day) OVER grp) to shrink magnitudes; the min-window and
    // the groupBy share one hash partitioning on grp (one Exchange).
    // Cast ladder: inputs at DECIMAL(18,0) → x·y products DECIMAL(37,0)
    // → sums DECIMAL(38,0); true values stay under 38 digits until
    // n²·x̄·ȳ ≈ 1e38 (sf ≫ 1e6), far past any real corpus — same
    // overflow-posture note as q134, but with ~20 digits more headroom
    // because x is re-based. At 100 TB the shape is unchanged: one
    // window + one partial-aggregated groupBy on a 5-key column.
    "q165_group_trend_ols" -> ((s, d) => {
      val dec18 = (c: Column) => c.cast("decimal(18,0)")
      val base = ld(s, d, "orders").select(
        col("o_orderpriority").as("grp"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
          .as("cents"))
      val x = base.withColumn("x",
        col("day") - min("day").over(Window.partitionBy("grp")))
      val sums = x.groupBy("grp").agg(
        count(lit(1)).as("n"),
        sum(dec18(col("x"))).as("sx"),
        sum(dec18(col("cents"))).as("sy"),
        sum(dec18(col("x")) * dec18(col("cents"))).as("sxy"),
        sum(dec18(col("x")) * dec18(col("x"))).as("sxx"))
      sums.select(col("grp"), col("n"),
          (dec18(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
          (dec18(col("n")) * col("sxx") - col("sx") * col("sx")).as("den"))
        .select(col("grp"), col("n"),
          col("num").cast("string").as("slope_num"),
          col("den").cast("string").as("slope_den"),
          when(col("num") > 0, "up").when(col("num") < 0, "down")
            .otherwise("flat").as("trend"))
        .orderBy("grp")
    }),

    // Two-sample Kolmogorov–Smirnov test: are URGENT and LOW order values
    // drawn from the same distribution? D = max|F₁−F₂| over the pooled
    // support, kept EXACT by clearing denominators — the statistic is
    // d_num / (n1·n2) where d_num = max|cum1·n2 − cum2·n1| is an integer
    // both engines compute identically. The α=0.05 verdict compares
    // 10⁴·d_num² > 18441·(n1+n2)·n1·n2 (c(0.05)² = 1.8441 scaled to
    // basis-point² space) in DECIMAL(38,0) — no sqrt, no doubles, so the
    // boolean can't flip across engines at the boundary. Plan shape: the
    // cumulative window runs over the DISTINCT-value frame (|V| ≪ N rows
    // after the groupBy), which is what makes the global orderBy window
    // tolerable; at 100 TB the drop-in substitute is a range partition on
    // cents + per-partition prefix sums + a broadcast of per-partition
    // totals (same numbers, no single-task window).
    "q170_ks_test" -> ((s, d) => {
      val o = ld(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
          expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
            .as("cents"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("g1"),
          when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L)
            .as("g2"))
      val per = o.groupBy("cents").agg(sum("g1").as("c1"),
        sum("g2").as("c2"))
      val wo = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = per
        .withColumn("cum1", sum("c1").over(wo))
        .withColumn("cum2", sum("c2").over(wo))
      val tot = o.agg(sum("g1").as("n1"), sum("g2").as("n2"))
      val dec18 = (c: Column) => c.cast("decimal(18,0)")
      cum.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dn"))
        .groupBy("n1", "n2").agg(max("dn").as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          expr("(10000 * d_num) DIV (n1 * n2)").as("d_bp"),
          (dec18(col("d_num")) * dec18(col("d_num")) * lit(10000) >
            dec18(lit(18441)) * dec18(col("n1") + col("n2")) *
              dec18(col("n1")) * dec18(col("n2"))).as("reject_h0"))
    }),

    // Frequent-itemset mining (A-priori 2-itemsets): which part pairs
    // co-occur in the same order far beyond chance — the market-basket
    // primitive, and structurally the same co-occurrence join a
    // co-citation / co-click analysis runs. Baskets are (order →
    // distinct parts); the pair join is keyed on the ORDER key, so the
    // worst case per task is Σ|basket|² with |basket| ≤ 13 here (bounded
    // fanout, never a part×part product); support ≥ 3 prunes the pair
    // table before the two vocabulary-sized item-support broadcasts.
    // Lift is q171's exact rational recipe in half-up micro-units. At
    // 100 TB the same plan holds because basket size is a data invariant
    // — the shuffle is |lineitem|-sized, the join output Σ|b|²-sized,
    // the supports dimension-sized.
    "q174_frequent_pairs" -> ((s, d) => {
      val b = ld(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .distinct()
        // pinned (r15): feeds the basket count, the item counts, and
        // both self-join sides — the q293 pin, previously missing here
        .localCheckpoint()
      val nb = b.agg(countDistinct("k").as("n_baskets"))
      val item = b.groupBy("p").agg(count(lit(1)).as("ci"))
      b.as("a")
        .join(b.as("x"), col("a.k") === col("x.k") && col("a.p") < col("x.p"))
        .groupBy(col("a.p").as("pa"), col("x.p").as("pb"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
        .join(broadcast(item.select(col("p").as("pa"), col("ci").as("ca"))),
          "pa")
        .join(broadcast(item.select(col("p").as("pb"), col("ci").as("cb"))),
          "pb")
        .crossJoin(broadcast(nb))
        .selectExpr("pa", "pb", "support", "ca", "cb",
          "CAST((2 * support * n_baskets * 1000000 + (ca * cb))" +
            " DIV (2 * (ca * cb)) AS BIGINT) AS lift_micro")
        .orderBy(desc("support"), col("pa"), col("pb"))
    }),

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE → UnionLoop/UnionLoopExec):
    // bill-of-materials closure over a synthetic binary assembly tree
    // (parent of part k is part k DIV 2 — deterministic, derived from
    // the key itself so both engines walk the identical graph). Per
    // root assembly (keys 1-10): total component count, max depth, and
    // the exact BIGINT key-sum fingerprint of the subtree. The SQL text
    // is SHARED VERBATIM with the DuckDB oracle (only the table name
    // differs) — the strongest cross-engine contract in the inventory:
    // same query string, same rows. The recursion walks UPWARD
    // (node → parent), so every loop step is a JOIN-FREE map over the
    // shrinking frontier (rows whose ancestor hasn't reached the root
    // yet) — isolated median 5.8 s (ratio 9.2) vs 11.3 s (ratio 29.7)
    // for the equivalent downward OR-join form, whose per-round
    // broadcast nested-loop join against the dimension paid broadcast +
    // join latency on top of every round. Both forms are ROUND-
    // dominated: Spark materializes each UnionLoop step as a job, so 11
    // rounds cost ~0.5 s of fixed scheduling latency each regardless of
    // the 22 k total frontier rows — the honest price of recursion on a
    // batch engine, and why the iterative code here (PageRank q131, CC
    // q101) fuses work into as few actions as possible. O(log n)
    // rounds, O(n log n) frontier rows; at dimension scale with FEW
    // roots the downward equi-join form (child keys exploded outside
    // the recursive branch) does O(subtree) work instead.
    "q191_recursive_cte" -> ((s, d) => {
      ld(s, d, "part").createOrReplaceTempView("graft_rc_part")
      s.sql(bomClosureSql("graft_rc_part"))
    }),

    // SQL PIPE SYNTAX (Spark 4's |> operator chain): the same
    // filter → derive → aggregate → having → order pipeline every query
    // in this file writes as DataFrame calls, expressed in the new
    // linear SQL form — each |> stage consumes the previous table, so
    // the text reads in EXECUTION order (the pedagogical point of the
    // syntax) and parses to exactly the plan the classic nested SQL
    // produces: one scan, one partial/final aggregate pair, the HAVING
    // as a post-aggregate filter. Revenue in the q31 exact integer
    // 1e-4-unit recipe, so the emitted doubles are engine-identical.
    "q192_pipe_syntax" -> ((s, d) => {
      ld(s, d, "lineitem").createOrReplaceTempView("graft_pipe_li")
      s.sql("""FROM graft_pipe_li
               |> WHERE l_discount > 0.02
               |> EXTEND CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                    (CAST(1 AS DECIMAL(14,2)) -
                     CAST(l_discount AS DECIMAL(14,2))) * 10000 AS BIGINT)
                    AS rev4
               |> AGGREGATE count(*) AS n,
                    CAST(sum(rev4) AS BIGINT) AS rev4_sum,
                    CAST(min(rev4) AS BIGINT) AS rev4_min
                    GROUP BY l_returnflag, l_linestatus
               |> WHERE n > 50
               |> ORDER BY l_returnflag, l_linestatus""")
    }),

    // COLLATION-aware grouping (Spark 4 string collations): entity names
    // arrive in mixed case (half are upper-cased here, deterministically
    // by key parity — the multi-source ingest reality) and the dedup
    // group key is declared UTF8_LCASE, so case-insensitive equality is
    // a PROPERTY OF THE TYPE — the grouping hash/equality respects it
    // inside codegen, where the classic lower()-wrapper approach
    // materializes a second string per row and hides the intent from
    // the optimizer. The emitted representative is normalized via
    // lower() (collation picks an arbitrary group member), so the
    // output is deterministic and the oracle — which groups by lower()
    // — proves the UTF8_LCASE groups are EXACTLY the lower() groups on
    // this corpus. Still a partial+final aggregate with one keyed
    // Exchange — but collated keys plan as SortAggregate (no hash
    // support for non-binary collations in 4.1), the one physical cost
    // of declaring the semantics in the type; PlanSpec pins it so a
    // future Spark that restores hashing shows up as a plan diff.
    "q197_collation_group" -> ((s, d) =>
      ld(s, d, "part")
        .selectExpr("p_partkey",
          "CASE WHEN p_partkey % 2 = 1 THEN upper(p_name)" +
            " ELSE p_name END AS name_cased")
        .groupBy(expr("collate(name_cased, 'UTF8_LCASE')").as("k"))
        .agg(count(lit(1)).as("n"), min("p_partkey").as("min_key"))
        .selectExpr("lower(CAST(k AS STRING)) AS name", "n", "min_key")
        .orderBy("name")),

    // GROUP BY ALL / ORDER BY ALL (the DuckDB-born sugar Spark 4
    // adopted): the grouping keys are INFERRED from the non-aggregate
    // select items and the ordering from the full output row — which
    // kills the classic copy-paste bug where a select-list edit silently
    // desyncs from a positional GROUP BY 1, 2. Same shared-verbatim-SQL
    // contract as q191: one string, two engines, equal rows; plans to
    // the identical partial+final aggregate as the explicit form.
    "q201_group_order_all" -> ((s, d) => {
      ld(s, d, "lineitem").createOrReplaceTempView("graft_all_li")
      s.sql(groupAllSql("graft_all_li"))
    }),

    // LATERAL correlated subquery (per-group top-k as the optimizer
    // sees it from SQL): for each source, the 3 longest documents via a
    // correlated ORDER BY … LIMIT subquery in the FROM clause — the
    // form analysts actually write, decorrelated by Catalyst into the
    // same rank-window plan the DataFrame API builds by hand (q31's
    // shape), rather than executing one subquery per outer row. Also a
    // shared-verbatim-SQL contract with the oracle (DuckDB executes
    // LATERAL natively).
    "q202_lateral_topk" -> ((s, d) => {
      ld(s, d, "documents").createOrReplaceTempView("graft_lat_docs")
      s.sql(lateralTopkSql("graft_lat_docs"))
    }),

    // SQL-DEFINED FUNCTION (Spark 4's CREATE FUNCTION … RETURN expr —
    // the declarative UDF): the exact-cents money recipe packaged once
    // as a named function instead of copy-pasted into every query.
    // Unlike a Scala/Python UDF, the body is a Catalyst EXPRESSION —
    // the analyzer INLINES it at every call site, so it folds,
    // pushes down, and stays inside whole-stage codegen (PlanSpec pins
    // zero black-box eval nodes in the plan) — the first UDF mechanism
    // with no codegen tax, which is why it's the right home for
    // fleet-wide semantic conventions like "net price in cents".
    "q206_sql_udf" -> ((s, d) => {
      ld(s, d, "lineitem").createOrReplaceTempView("graft_udf_li")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_net_e4(
                 p DOUBLE, disc DOUBLE) RETURNS BIGINT
               RETURN CAST(CAST(p AS DECIMAL(14,2)) *
                 (CAST(1 AS DECIMAL(14,2)) - CAST(disc AS DECIMAL(14,2)))
                 * 10000 AS BIGINT)""")
      // 1e-4 units, not cents: the scale-4 decimal times 10000 is an
      // EXACT integer, so the BIGINT cast never meets a fraction —
      // Spark truncates casts, DuckDB rounds them, and *100 left a
      // sub-cent residue that flipped ~half the rows one unit apart
      // (measured: net sums differed by 7.5k e-2 units over 16k rows)
      s.sql("""SELECT l_returnflag, count(*) AS n,
                      CAST(sum(graft_net_e4(l_extendedprice,
                        l_discount)) AS BIGINT) AS net_e4,
                      CAST(max(graft_net_e4(l_extendedprice,
                        l_discount)) AS BIGINT) AS max_e4
               FROM graft_udf_li WHERE l_quantity > 10
               GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // LABEL-PROPAGATION community detection — the fourth relational-
    // graph primitive (CC q101 finds connectivity, PageRank q131 finds
    // centrality, triangles q134 find local density; LPA finds
    // COMMUNITIES — the structure inside one giant connected component,
    // which is exactly what the co-supply graph is). Three SYNCHRONOUS
    // rounds from singleton labels: each node adopts its neighbors'
    // majority label, ties broken toward the SMALLEST label — the
    // deterministic variant (classic async LPA is order-dependent and
    // could never be oracle-checked; synchronous LPA can oscillate on
    // bipartite structures, which fixed K sidesteps — after K rounds
    // both engines hold the identical label vector, oscillating or
    // not). Each round is one edge-keyed join + one (node, label)
    // majority aggregate with a rank-1 window — all keyed on the node,
    // checkpoint-pinned per round (the q131 fused-action recipe). The
    // edge build is q134's shared, memoized derivation — at 100 TB the
    // persisted edge table both passes start from.
    "q208_label_propagation" -> ((s, d) => {
      val edges = coSupplyEdges(s, d)
      val und = edges.select(col("s1").as("u"), col("s2").as("v"))
        .unionAll(edges.select(col("s2").as("u"), col("s1").as("v")))
        .localCheckpoint()
      var labels = und.select(col("u").as("node")).distinct()
        .withColumn("lbl", col("node"))
      val wTop = Window.partitionBy("u")
        .orderBy(col("c").desc, col("lbl"))
      for (_ <- 1 to 3) {
        labels = und.join(labels, col("v") === col("node"))
          .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") === 1)
          .select(col("u").as("node"), col("lbl"))
          .localCheckpoint()
      }
      labels.select(col("node"), col("lbl").as("community"))
        .orderBy("node")
    }),

    // HITS hubs & authorities (Kleinberg) over the supplier→part supply
    // bipartite graph — the eigenvector-centrality sibling of q131's
    // PageRank for BIPARTITE structure: a part's authority is the summed
    // hub weight of its suppliers, a supplier's hub weight the summed
    // authority of its parts. Two full alternations in exact integer
    // pico-units; each half-round is one keyed join+agg riding the edge
    // list's key, plus an L1 normalization whose total is a 1-row
    // broadcast (never a shuffle of the graph). Normalization is integer
    // division by GREATEST(1, total DIV 10^12) — deterministic and
    // replayable, unlike a float L2 norm whose sqrt would drift with
    // aggregation order. BIGINT headroom: raw totals are |E|·10¹²; ANSI
    // mode makes an overflow past |E| ≈ 9·10⁶ edges a loud error, and the
    // 100 TB build would move the accumulator to DECIMAL(38,0) (the q134
    // ladder). Output: top-20 parts by final authority, ties by id.
    "q212_hits" -> ((s, d) => {
      val e = ld(s, d, "lineitem")
        .select(col("l_suppkey").as("sup"), col("l_partkey").as("prt"))
        .distinct().localCheckpoint()
      // the raw half-round frame is pinned BEFORE the total is taken:
      // unpinned, every consumer (the 1-row total AND the scaled output)
      // re-derives the whole upstream chain, and because each round nests
      // the previous one the plan grows 2^rounds subtrees (observed: 7
      // copies of the normalization cross for 3 norms)
      def norm(df0: DataFrame, key: String): DataFrame = {
        val df = df0.localCheckpoint()
        val dvr = df.agg(sum("v").as("tot"))
          .selectExpr("GREATEST(1L, tot DIV 1000000000000L) AS dvr")
        df.crossJoin(broadcast(dvr)).selectExpr(key, "v DIV dvr AS v")
      }
      val a1 = norm(e.groupBy("prt")
        .agg((count(lit(1)) * lit(1000000000000L)).as("v")), "prt")
      val h1 = norm(e.join(a1, "prt").groupBy("sup")
        .agg(sum("v").as("v")), "sup")
      val a2 = norm(e.join(h1, "sup").groupBy("prt")
        .agg(sum("v").as("v")), "prt")
      a2.orderBy(col("v").desc, col("prt")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("v").desc, col("prt"))))
        .select(col("rank"), col("prt").as("partkey"),
          col("v").as("authority"))
    }),

    // `Dataset.observe` + `Observation` — pipeline telemetry accumulated
    // ON the data pass itself, not by a second scan: the corpus-wide
    // counters (docs, chars, max) ride the SAME job that computes the
    // quality-gate survivor count, as AccumulatorV2-backed metrics on the
    // task results. At 100 TB that is the difference between "stats for
    // free with the write" and "a second full-corpus aggregation job" —
    // the mechanism behind every production pipeline's row-count/bytes
    // dashboard. The builder triggers the one action (the gate count) and
    // surfaces the observed map as the result frame; the oracle recomputes
    // the same four numbers relationally, so a metric that silently
    // stopped firing (listener detached, wrong column) hash-mismatches.
    "q219_observe_metrics" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation()
      val gated = ld(s, d, "documents")
        .observe(obs,
          count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("tot_chars"),
          max(col("n_chars").cast("long")).as("max_chars"))
        .filter(col("n_chars") >= 200)
      val kept = gated.count() // the ONE action; metrics ride its tasks
      val m = obs.get
      import s.implicits._
      Seq((m("n_docs").asInstanceOf[Long], m("tot_chars").asInstanceOf[Long],
        m("max_chars").asInstanceOf[Long], kept))
        .toDF("n_docs", "tot_chars", "max_chars", "n_kept")
    }),

    // Parameterized SQL (named parameter markers, Spark 4 `sql(text,
    // args)`) — the injection-safe templating surface a query service
    // puts in front of the engine: the literal arrives as a typed
    // parameter bound at parse time, NOT string-spliced, so the SAME plan
    // text caches across invocations and a malicious value can never
    // change the query shape. Plan-wise the bound parameter folds to a
    // literal before optimization — the filter still pushes down to the
    // scan (PlanSpec-pinned for the classic shape in q201).
    "q220_parameterized_sql" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
                  sum(CAST(l_quantity AS BIGINT)) AS qty
           FROM lineitem WHERE l_quantity >= :minq
           GROUP BY l_returnflag ORDER BY l_returnflag""",
        Map("minq" -> 30))
    }),

    // Multi-source BFS hop distance — the fourth relational-graph
    // primitive beside components (q101), PageRank (q131), and triangles
    // (q134): how far is every node from a SEED SET (here parts 0–4 in
    // q131's part↔supplier bipartite graph), the reachability question
    // behind blast-radius analysis and influence frontiers. K=4
    // synchronous frontier rounds: each round is ONE src-keyed join of
    // the (small) frontier against the degree-partitioned edge frame +
    // one anti-join against the visited set — never a path enumeration
    // (a recursive path walk on a dense bipartite graph explodes
    // combinatorially; frontier BFS moves each node at most once). The
    // oracle replays the same four rounds as a CTE chain, so hop
    // assignment is bit-identical. Report: nodes per hop + the
    // unreached remainder (hop −1) against the full node inventory.
    "q240_bfs_hops" -> ((s, d) => {
      val pairs = ld(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("p"),
          (col("l_suppkey") * 2 + 1).as("q"))
        .distinct()
      // Partitioned by src BEFORE the checkpoint (the q131 trick):
      // localCheckpoint preserves outputPartitioning, so each round's
      // frontier join reshuffles only the frontier — measured 5.0 s →
      // 2.8 s at sf0.1 when the edge side stopped re-exchanging 4×.
      val edges = pairs.select(col("p").as("src"), col("q").as("dst"))
        .unionAll(pairs.select(col("q").as("src"), col("p").as("dst")))
        .repartition(col("src"))
        .localCheckpoint()
      val nodes = edges.select(col("src").as("node")).distinct()
        .localCheckpoint()
      var visited = nodes.filter(col("node") < 10 && col("node") % 2 === 0)
        .withColumn("hop", lit(0L)).localCheckpoint()
      var frontier = visited.select("node")
      // `visited` stays a LAZY union of the per-round checkpointed
      // frontiers (r15): every leaf below the union is already
      // materialized, so re-reading it per anti-join costs block reads
      // only, and the old per-round visited checkpoint (one extra eager
      // job + block copy per round) bought nothing. Frontiers keep their
      // checkpoint — each is consumed by round r+1 AND every later
      // anti-join, and it bounds the union's depth at K.
      for (r <- 1 to 4) {
        frontier = edges.join(frontier, col("src") === col("node"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .localCheckpoint()
        visited = visited
          .unionByName(frontier.withColumn("hop", lit(r.toLong)))
      }
      nodes.join(visited, Seq("node"), "left")
        .na.fill(-1L, Seq("hop"))
        .groupBy("hop").agg(count(lit(1)).as("n_nodes"))
        .orderBy("hop")
    }),

    // Bounded k-core peel of the significant co-supply graph (q134's
    // memoized edge set) — the density-core extraction that separates a
    // graph's stable community backbone from its fringe (dedup/entity
    // graphs use exactly this to decide which clusters are trustworthy
    // enough to canonicalize). k is data-derived but deterministic —
    // avg degree + 1, so the peel always bites without hand-tuning per
    // scale factor — and each of the 4 synchronous rounds is one degree
    // rollup + two semi-join filters of the shrinking edge frame (the
    // alive set is node-sized and checkpointed; nothing rescans the
    // original graph). Full k-core iterates to fixpoint; the bounded
    // prefix is the production compromise (same stance as q131's K=3
    // PageRank) and the oracle replays every round as a CTE chain, so
    // per-round survivor counts are bit-identical. Measured finding on
    // this corpus (both sfs): the co-supply graph's degrees are so
    // uniform that no (avg+1)-core exists — the peel CASCADES to empty
    // within 3 rounds (sf0.01: 44 alive → 1 → 0). That all-or-nothing
    // collapse is itself the measurement: uniform-degree graphs have no
    // above-average backbone, and a dedup rollout reading this report
    // keeps cluster trust decisions OUT of core membership here.
    "q243_kcore_peel" -> ((s, d) => {
      val e0 = coSupplyEdges(s, d)
      var edges = e0.select(col("s1").as("u"), col("s2").as("v"))
        .unionAll(e0.select(col("s2").as("u"), col("s1").as("v")))
        .localCheckpoint()
      val kf = edges
        .agg(count(lit(1)).as("ne"), countDistinct(col("u")).as("nv"))
        .selectExpr("ne DIV nv + 1 AS k")
      var result: DataFrame = null
      for (r <- 1 to 4) {
        val deg = edges.groupBy("u").agg(count(lit(1)).as("dg"))
          .crossJoin(broadcast(kf)).localCheckpoint()
        val keep = deg.filter(col("dg") >= col("k")).select("u")
          .localCheckpoint()
        edges = edges.join(keep, "u")
          .join(keep.withColumnRenamed("u", "v"), "v")
          .select("u", "v").localCheckpoint()
        // coalesce: once the peel cascades to an empty subgraph the agg
        // runs over zero rows and sum() is NULL — the oracle's count(*)
        // says 0, so 0 is the contract.
        val row = deg.agg(
            coalesce(sum(when(col("dg") < col("k"), 1L).otherwise(0L)),
              lit(0L)).as("n_removed"),
            coalesce(sum(when(col("dg") >= col("k"), 1L).otherwise(0L)),
              lit(0L)).as("n_alive"))
          .withColumn("round", lit(r))
        result = if (result == null) row else result.unionByName(row)
      }
      result.select("round", "n_alive", "n_removed").orderBy("round")
    }),

    // Rank-window surface — ntile / percent_rank / cume_dist, the last
    // SQL window family the inventory hadn't exercised: orders bucketed
    // into price quartiles WITHIN their priority class. ntile's output
    // depends only on the window order, which is made a total order by
    // the (cents, key) tie-break (the q60 stance), so bucket assignment
    // is engine-identical; percent_rank and cume_dist are emitted as
    // exact half-up bp from rank arithmetic — same numbers the builtin
    // doubles encode, minus any float-division representation risk. One
    // priority-keyed shuffle carries all three windows plus the rollup
    // (quartile stats per class, 20 rows out) — and because the
    // partition key is in every window, this scales as ordinary keyed
    // work, never a global sort.
    "q244_rank_windows" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("cents", "o_orderkey")
      ld(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("q", ntile(4).over(w))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1))
          .over(Window.partitionBy("o_orderpriority")))
        .groupBy("o_orderpriority", "q")
        .agg(count(lit(1)).as("n"),
          min("cents").as("min_cents"), max("cents").as("max_cents"),
          max(expr("CASE WHEN cnt = 1 THEN 0L ELSE" +
            " (2 * (rn - 1) * 10000 + (cnt - 1))" +
            " DIV (2 * (cnt - 1)) END")).as("max_pr_bp"),
          max(expr("(2 * rn * 10000 + cnt) DIV (2 * cnt)"))
            .as("max_cume_bp"))
        .orderBy("o_orderpriority", "q")
    }),

    // PERSONALIZED PageRank over q131's part↔supplier graph: reset mass
    // lands ONLY on a seed cohort (every 10th supplier node — a
    // scale-stable, EXPRESSION-computable membership, so no seed-table
    // join enters the loop), making rank proximity TO THE SEEDS rather
    // than global prominence — the "more like these" primitive behind
    // seed-expanded source curation and related-item retrieval. Same
    // fixed-point integer recipe as q131 (17/20 damping in micro-units,
    // r0 = 10⁶ on seeds and 0 elsewhere, every round bit-exact and
    // CTE-replayed by the oracle); the seed indicator is a map-side
    // CASE on the node id, so each of the K = 3 rounds is still ONE
    // keyed join + one rollup over the pinned degree'd edge list, and
    // non-seed nodes hold rank only through inflow.
    "q255_personalized_ppr" -> ((s, d) => {
      // r15: pinned pair list + in-plan deg (ReusedExchange dedups the
      // edges exchange inside the one withDeg action) — one corpus
      // scan + distinct instead of two; see q131.
      val pairs = ld(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("p"),
          (col("l_suppkey") * 2 + 1).as("q"))
        .distinct()
        .localCheckpoint()
      val edges = pairs.select(col("p").as("src"), col("q").as("dst"))
        .unionAll(pairs.select(col("q").as("src"), col("p").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val withDeg = edges.join(deg, "src").localCheckpoint()
      def seedMass(node: String, m: Long) =
        s"CASE WHEN $node % 2 = 1 AND (($node - 1) DIV 2) % 10 = 0" +
          s" THEN ${m}L ELSE 0L END"
      var ranks = deg.select(col("src").as("node"))
        .withColumn("r", expr(seedMass("node", 1000000L)))
      // no per-round checkpoint — linear K=3 lineage, same as q131 (r15)
      for (_ <- 1 to 3) {
        ranks = withDeg.join(ranks, col("src") === col("node"))
          .groupBy("dst")
          .agg(sum(expr("(r * 17) DIV (20 * deg)")).as("inflow"))
          .select(col("dst").as("node"),
            (expr(seedMass("dst", 150000L)) + col("inflow")).as("r"))
      }
      ranks.orderBy("node")
    }),

    // Pareto (skyline) frontier over parts — minimize price, maximize
    // size: the multi-objective shortlist ("no part is both cheaper and
    // bigger") that single-key top-k can't produce. The naive skyline is
    // an O(n²) dominance anti-join; the sweep identity collapses it to
    // histogram space: a part is on the frontier iff its size equals its
    // OWN price group's max AND strictly exceeds the running max over
    // all strictly-cheaper prices (ties at both price and size are
    // mutually non-dominating — kept, which the strict > / = split
    // encodes exactly). So the corpus is scanned ONCE for the price
    // group-max histogram, the prefix max runs over that distinct-price
    // frame only (bounded by the price domain, never corpus-sized —
    // q224's histogram-space trick), and membership is a broadcast join
    // + map-side filter back on the scan.
    "q260_pareto_frontier" -> ((s, d) => {
      val p = ld(s, d, "part")
        .select(col("p_partkey"),
          expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100" +
            " AS BIGINT)").as("cents"),
          col("p_size").cast("long").as("sz"))
        .localCheckpoint() // histogram + membership share one scan
      val pre = p.groupBy("cents").agg(max("sz").as("gmax"))
        // distinct-price frame: tiny, single-partition cum by design
        .withColumn("pmax", coalesce(max("gmax").over(
          Window.orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(-1L)))
      p.join(broadcast(pre), "cents")
        .filter(col("sz") === col("gmax") && col("sz") > col("pmax"))
        .select("p_partkey", "cents", "sz")
        .orderBy("cents", "p_partkey")
    }),

    // One-pass correlation MATRIX — q52's corr() for one pair becomes
    // all 6 pairs of 4 lineitem measures from a SINGLE aggregate: raw
    // moments (Σx, Σx², Σxy) in exact DECIMAL(38) integers, so the
    // reduction is ORDER-INDEPENDENT under any partitioning (the q70
    // float-drift lesson applied to covariance — a Welford-style
    // streaming corr drifts with partition order; exact integer moments
    // cannot), and floats appear only in the final 6 scalar divisions
    // (IEEE-deterministic on 1-row data). Magnitudes: Σ(price·price) ≤
    // n·10¹⁴ — DECIMAL(38) holds to n ≈ 10²³ rows. Adding a measure
    // adds columns to the aggregate, never a pass — the q169 posture
    // for profiling at 100 TB. Output: one row per pair with the
    // round-4 Pearson r; zero-variance pairs yield NULL, not NaN.
    "q266_corr_matrix" -> ((s, d) => {
      val vs = Seq("qty", "price_c", "disc_c", "tax_c")
      val prs = for {
        i <- vs.indices; j <- (i + 1) until vs.size
      } yield (vs(i), vs(j))
      def dec(c: String) = s"CAST($c AS DECIMAL(38,0))"
      val moments =
        count(lit(1)).cast("decimal(38,0)").as("n") +:
        (vs.map(v => sum(expr(dec(v))).as(s"s_$v")) ++
          vs.map(v => sum(expr(s"${dec(v)} * $v")).as(s"q_${v}_$v")) ++
          prs.map { case (a, b) =>
            sum(expr(s"${dec(a)} * $b")).as(s"q_${a}_$b") })
      def corr(a: String, b: String) =
        s"""CASE WHEN n * q_${a}_$a - s_$a * s_$a = 0
                   OR n * q_${b}_$b - s_$b * s_$b = 0
                 THEN CAST(NULL AS DOUBLE)
                 ELSE round(CAST(n * q_${a}_$b - s_$a * s_$b AS DOUBLE)
                      / sqrt(CAST(n * q_${a}_$a - s_$a * s_$a AS DOUBLE)
                        * CAST(n * q_${b}_$b - s_$b * s_$b AS DOUBLE)), 4)
                 END"""
      val stackArgs = prs
        .map { case (a, b) => s"'$a~$b', ${corr(a, b)}" }.mkString(", ")
      ld(s, d, "lineitem").selectExpr(
          "CAST(l_quantity AS BIGINT) AS qty",
          "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
            " AS price_c",
          "CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " AS disc_c",
          "CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) AS tax_c")
        .agg(moments.head, moments.tail: _*)
        .selectExpr("CAST(n AS BIGINT) AS n",
          s"stack(${prs.size}, $stackArgs) AS (pair, corr4)")
        .select("pair", "n", "corr4")
        .orderBy("pair")
    }),

    // Degree assortativity of the co-supply graph (Newman's r): do
    // high-degree suppliers link to other hubs (r > 0, resilient
    // core-periphery) or to leaves (r < 0, hub-and-spoke — the common
    // shape of supply networks)? It is exactly the q266 recipe applied
    // to the (deg(u), deg(v)) pairs of every directed orientation of
    // the significance-pruned edge list (q134's memoized derivation —
    // the bench pays the build once): exact DECIMAL(38) moments over
    // the edge frame, one float division at the end, NULL on a
    // degree-regular graph instead of NaN. Scale: two keyed joins
    // attach degrees, one 1-row moment aggregate — edges never
    // self-join.
    "q267_assortativity" -> ((s, d) => {
      val e = coSupplyEdges(s, d)
      val und = e.select(col("s1").as("u"), col("s2").as("v"))
        .unionAll(e.select(col("s2").as("u"), col("s1").as("v")))
        .localCheckpoint() // degree rollup + pair pass share the frame
      val gdeg = und.groupBy("u").agg(count(lit(1)).as("gd"))
      und.join(gdeg, "u").withColumnRenamed("gd", "du")
        .join(gdeg.select(col("u").as("v"), col("gd").as("dv")), "v")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(expr("CAST(du AS DECIMAL(38,0))")).as("su"),
          sum(expr("CAST(dv AS DECIMAL(38,0))")).as("sv"),
          sum(expr("CAST(du AS DECIMAL(38,0)) * du")).as("suu"),
          sum(expr("CAST(dv AS DECIMAL(38,0)) * dv")).as("svv"),
          sum(expr("CAST(du AS DECIMAL(38,0)) * dv")).as("suv"))
        .selectExpr("CAST(n AS BIGINT) AS n_edges",
          """CASE WHEN n * suu - su * su = 0 OR n * svv - sv * sv = 0
                  THEN CAST(NULL AS DOUBLE)
                  ELSE round(CAST(n * suv - su * sv AS DOUBLE)
                       / sqrt(CAST(n * suu - su * su AS DOUBLE)
                         * CAST(n * svv - sv * sv AS DOUBLE)), 4)
                  END AS assort4""")
    }),

    // SQL UNPIVOT clause surface — the melt (wide → tidy) inverse of
    // q274's PIVOT, as the pure-SQL clause (Spark 3.4+'s UNPIVOT ...
    // FOR ... IN): a per-priority status-count matrix folded back into
    // (priority, metric, value) rows — the tidy shape every downstream
    // grouped analysis wants. Internally this is the same Expand node
    // the profiler's stack() uses (q165); what's pinned here is the
    // ANSI surface. One rollup, one expand, no joins.
    "q271_unpivot" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""SELECT o_orderpriority, metric, CAST(v AS BIGINT) AS v
               FROM (SELECT o_orderpriority,
                            count(CASE WHEN o_orderstatus = 'F'
                                  THEN 1 END) AS n_f,
                            count(CASE WHEN o_orderstatus = 'O'
                                  THEN 1 END) AS n_o,
                            count(CASE WHEN o_orderstatus = 'P'
                                  THEN 1 END) AS n_p
                     FROM orders GROUP BY o_orderpriority)
               UNPIVOT (v FOR metric IN (n_f, n_o, n_p))
               ORDER BY o_orderpriority, metric""")
    }),

    // Top-k WITH TIES — q31/q202 pick exactly k rows by breaking ties
    // arbitrarily-but-deterministically; this is the other contract
    // (ANSI FETCH FIRST k WITH TIES / rank() ≤ k): every row tied with
    // the k-th qualifies, so equal-value rows are never split by luck.
    // rank() (not row_number) over a per-priority window keeps the
    // query keyed work, and Spark's WindowGroupLimit pushes the k-limit
    // below the sort — pinned in PlanSpec — so each group prunes to its
    // top rows BEFORE the full window materializes: the plan property
    // that makes per-group top-k survive 100 TB groups.
    "q275_topk_with_ties" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("cents").desc)
      ld(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100" +
            " AS BIGINT)").as("cents"))
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "cents")
        .orderBy("o_orderpriority", "rk", "o_orderkey")
    }),

    // Median-of-means — the robust aggregate a fleet uses when some
    // SHARDS are corrupt (a bad worker, a poisoned partition): the mean
    // collapses under one bad shard, but the MEDIAN of 16 per-shard
    // means tolerates up to 7 arbitrarily-corrupt shards. Shards are
    // md5(orderkey) buckets (engine-portable, the q57 ticket recipe);
    // per-shard means are exact half-up cents (integer — so the
    // estimator is bit-stable, unlike averaging doubles shard-wise);
    // the median is rank-selected over the 16-row shard frame. The
    // plain global mean ships alongside so the audit SHOWS the gap
    // (here ≈ 0: no corruption — the estimator's cost in the clean
    // case, which is what you need to know before adopting it).
    "q276_median_of_means" -> ((s, d) => {
      val sh = ld(s, d, "orders")
        .selectExpr(
          "CAST(conv(substring(md5(concat('mm:', CAST(o_orderkey" +
            " AS STRING))), 1, 8), 16, 10) AS BIGINT) % 16 AS shard",
          "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " AS cents")
        .localCheckpoint() // shard means + global mean share one scan
      val means = sh.groupBy("shard")
        .agg(count(lit(1)).as("n"), sum("cents").as("tc"))
        .selectExpr("shard", "n", "(2 * tc + n) DIV (2 * n) AS mean_c")
        .withColumn("rn", row_number().over(
          Window.orderBy("mean_c", "shard"))) // 16-row frame, by design
      val mom = means.filter(col("rn") === (16 + 1) / 2)
        .select(col("mean_c").as("mom_cents"))
      sh.agg(count(lit(1)).as("n_rows"), sum("cents").as("tc"))
        .selectExpr("n_rows", "(2 * tc + n_rows) DIV (2 * n_rows)" +
          " AS mean_cents")
        .crossJoin(broadcast(mom))
        .withColumn("gap_cents", abs(col("mean_cents") - col("mom_cents")))
    }),

    // CLUSTER BY surface — the write-side layout clause every ETL job
    // uses before a partitioned write (DISTRIBUTE BY key + SORT BY key:
    // co-locate each key's rows in one task, sorted, WITHOUT a global
    // sort). Plans as RepartitionByExpression + a partition-local Sort
    // — pinned in PlanSpec, since the whole point is what it does NOT
    // do (no range exchange, no global order). The outer ORDER BY
    // exists only to make the verification output deterministic; a
    // production writer stops at the clustered shape and writes.
    "q283_cluster_by" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""SELECT * FROM (
                 SELECT l_returnflag, l_orderkey, l_linenumber,
                        l_quantity
                 FROM lineitem WHERE l_orderkey < 200
                 CLUSTER BY l_returnflag)
               ORDER BY l_returnflag, l_orderkey, l_linenumber""")
    }),

    // try_* error-safe arithmetic — under Spark 4's default ANSI mode a
    // single dirty row (division by zero, BIGINT overflow, a bad cast)
    // kills the whole 100 TB job; try_divide / try_add / try_cast are
    // the per-row NULL-absorbing forms that keep ingest running and
    // make the failure COUNTABLE. This audit counts each failure class
    // per group at PRODUCTION incidence: the dirty rows are
    // predicate-keyed (quantity = 25 for div-by-zero; orderkey % 1000
    // for overflow and bad cast) so try_* absorbs thousands of
    // failures, not one caught JVM exception per row — an all-fail
    // construction measured 25× slower because Math.addExact /
    // NumberFormatException fire 1.2M times per pass. The all-fail
    // NULL semantics stay pinned by a literal-row test in
    // ExpressionSemanticsSpec. One scan, one partial+final rollup.
    "q284_try_arithmetic" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""SELECT l_returnflag, count(*) AS n,
                      sum(CASE WHEN try_divide(l_extendedprice,
                            l_quantity - 25) IS NULL
                          THEN 1L ELSE 0L END) AS n_div0,
                      sum(CASE WHEN try_add(9223372036854775807L,
                            CASE WHEN l_orderkey % 1000 = 0
                                 THEN CAST(l_quantity AS BIGINT)
                                 ELSE 0L END) IS NULL
                          THEN 1L ELSE 0L END) AS n_overflow,
                      sum(CASE WHEN try_cast(
                            CASE WHEN l_orderkey % 1000 = 0
                                 THEN concat('x', l_returnflag)
                                 ELSE '7' END AS INT) IS NULL
                          THEN 1L ELSE 0L END) AS n_badcast
               FROM lineitem GROUP BY l_returnflag
               ORDER BY l_returnflag""")
    }),

    // ITEM-ITEM COLLABORATIVE FILTERING — the recommender rung beside
    // q174's frequent itemsets: cosine similarity between parts from
    // order-basket co-occurrence (cos = c_ij/√(n_i·n_j), carried as
    // the cross-multiplied cos² in half-up bp — no sqrt, the q128
    // trick), top-3 neighbors per item via an item-partitioned rank
    // window. The pair build is the orderkey-keyed basket self-join —
    // per-basket fanout is |basket|² with |basket| ≤ 7 here, the bound
    // that keeps item-item CF linear in orders at any scale (Amazon's
    // classic argument); support c ≥ 2 prunes noise pairs before the
    // similarity math. All joins keyed + shuffle_hash (item-count and
    // pair frames are catalog-proportional, not broadcastable at 100
    // TB); ties broken by neighbor id so the ranking is bit-stable.
    "q293_item_cf" -> ((s, d) => {
      val b = ld(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
        .distinct()
        .localCheckpoint() // both self-join sides + the item counts
      val ni = b.groupBy("i").agg(count(lit(1)).as("n"))
      val co = b.as("a").join(b.as("b").hint("shuffle_hash"),
          col("a.o") === col("b.o") && col("a.i") < col("b.i"))
        .groupBy(col("a.i").as("i1"), col("b.i").as("i2"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
      val sym = co.select(col("i1").as("i"), col("i2").as("j"), col("c"))
        .unionByName(
          co.select(col("i2").as("i"), col("i1").as("j"), col("c")))
        .join(ni.select(col("i"), col("n").as("n_i"))
          .hint("shuffle_hash"), "i")
        .join(ni.select(col("i").as("j"), col("n").as("n_j"))
          .hint("shuffle_hash"), "j")
        .select(col("i"), col("j"), col("c"),
          expr("(2 * c * c * 10000 + n_i * n_j) DIV (2 * n_i * n_j)")
            .as("cos2_bp"))
      val wr = Window.partitionBy("i")
        .orderBy(col("cos2_bp").desc, col("j"))
      sym.withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= 3)
        .select(col("i"), col("rn").cast("long").as("rn"), col("j"),
          col("c"), col("cos2_bp"))
        .orderBy("i", "rn")
    }),

    // THEIL–SEN ROBUST TREND — the median-of-pairwise-slopes estimator
    // beside q165's OLS: breakdown point 29 % where one corrupted week
    // drags the least-squares slope arbitrarily. The series is the
    // weekly revenue per order priority (time-aggregated FIRST, so the
    // pair space is weeks² — it grows with the calendar, never with
    // corpus size: the scale bound that makes exact Theil–Sen feasible
    // at 100 TB). Slopes in exact integer micro units via the portable
    // signed floor-division identity (dy − pmod(dy,dx)) DIV dx (the
    // q289 contract — truncating DIV and flooring // agree once the
    // numerator is shifted to an exact multiple); the median is the
    // lower median rank-selected inside a grp-partitioned window, ties
    // ordered by (slope, w1, w2) so selection is bit-stable. ~59k
    // pairs per group from 345 weeks; the only corpus-sized work is
    // the one map-side combined weekly rollup.
    "q295_theil_sen" -> ((s, d) => {
      val wk = weeklyRevenue(s, d)
      val pairs = wk.as("a").join(wk.as("b").hint("shuffle_hash"),
          col("a.grp") === col("b.grp") && col("a.w") < col("b.w"))
        .select(col("a.grp").as("grp"), col("a.w").as("w1"),
          col("b.w").as("w2"),
          ((col("b.y") - col("a.y")) * lit(1000000L)).as("dy"),
          (col("b.w") - col("a.w")).as("dx"))
        .select(col("grp"), col("w1"), col("w2"),
          expr("CAST((dy - (((dy % dx) + dx) % dx)) DIV dx AS BIGINT)")
            .as("slope"))
      val wr = Window.partitionBy("grp").orderBy("slope", "w1", "w2")
      val cnt = pairs.groupBy("grp").agg(count(lit(1)).as("m"))
      pairs.withColumn("rn", row_number().over(wr))
        .join(broadcast(cnt), "grp")
        .filter(col("rn") === expr("(m + 1) DIV 2"))
        .select(col("grp"), col("m").as("n_pairs"),
          col("slope").as("med_slope_micro"),
          when(col("slope") > 0, "up").when(col("slope") < 0, "down")
            .otherwise("flat").as("trend"))
        .orderBy("grp")
    }),

    // NATIVE DataSource V2 scan — the reference's `TableSource` seam
    // (`datasource/mod.rs:20-28`) and projection-honouring MemTable
    // (`memory.rs:31-41`) re-expressed as a first-class Spark V2
    // source (graft.sources.GraftMemSource): column pruning via
    // SupportsPushDownRequiredColumns, predicate pushdown via
    // SupportsPushDownFilters with the correct partial-pushdown
    // residual contract, multi-partition reads. The query registers
    // the 25-row nation dim in the memory catalog (a collect() of a
    // bounded DIMENSION table — the one honest collect; the same
    // three classes would read external storage for anything bigger)
    // and runs a filtered, projected aggregate THROUGH the V2 scan;
    // the DuckDB oracle replays it over the parquet table, so the
    // source's pushdown path is hash-checked end-to-end.
    // MemSourceSpec pins the pruned-schema and pushed/residual filter
    // telemetry; PlanSpec pins that the plan reads the BatchScan, not
    // parquet.
    "q303_dsv2_memscan" -> ((s, d) => {
      val nation = ld(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      graft.sources.GraftMemRegistry.register("nation_mem",
        nation.schema, nation.collect().toSeq)
      s.read.format("graft.sources.GraftMemSource")
        .option("table", "nation_mem").load()
        .filter(col("n_regionkey") > 1L)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), min("n_name").as("first_name"))
        .orderBy("n_regionkey")
    }),

    // DataSource V2 AGGREGATE pushdown — the q303 seam taken one
    // optimizer level deeper: with the pushAgg option on,
    // GraftMemSource implements SupportsPushDownAggregates with
    // supportCompletePushDown for GROUP BY plain columns +
    // count(*)/min/max, so Catalyst plans NO Aggregate node at all —
    // the BatchScan's output IS the final grouped result (readSchema =
    // group columns ++ agg columns, the positional contract), and the
    // query runs as scan + sort. Identical answer path to q303 checked
    // against the identical DuckDB oracle, so the two plans prove the
    // pushdown changed WHERE the aggregation runs, never WHAT it
    // computes. At 100 TB this contract is why a storage-side engine
    // (or a pre-aggregated index) can serve a groupBy without moving a
    // row — the same interface parquet metadata-only count() uses.
    "q305_dsv2_agg_pushdown" -> ((s, d) => {
      val nation = ld(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      graft.sources.GraftMemRegistry.register("nation_mem_agg",
        nation.schema, nation.collect().toSeq)
      s.read.format("graft.sources.GraftMemSource")
        .option("table", "nation_mem_agg").option("pushAgg", "true").load()
        .filter(col("n_regionkey") > 1L)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), min("n_name").as("first_name"))
        .orderBy("n_regionkey")
    }),

    // STORAGE-PARTITIONED JOIN through the V2 source — the deepest
    // optimizer integration in the q303/q305 family: both tables are
    // registered with partitionKey=regionkey, the scans report
    // KeyGroupedPartitioning(identity(key)) with one HasPartitionKey
    // input partition per key value, and under
    // spark.sql.sources.v2.bucketing.enabled EnsureRequirements
    // certifies the two sides co-partitioned BY VALUE and elides the
    // join Exchange entirely — the V2 generalization of q92's bucketed
    // join, and exactly how Iceberg/Delta serve shuffle-free joins on
    // partition-aligned tables at 100 TB (the shuffle that dominates a
    // fact-fact join simply never happens). The downstream aggregate
    // groups on a superset of the cluster key, so IT needs no Exchange
    // either; PlanSpec pins zero hash Exchanges in the whole plan.
    "q309_dsv2_spj" -> ((s, d) => {
      // Unlike q330's parse-time flag, V2 bucketing acts at PHYSICAL
      // PLANNING — i.e. when the caller's ACTION runs, long after this
      // builder returns — so a try/finally restore here would silently
      // disable the SPJ elision being demonstrated. The flag is instead a
      // declared session default in every graft session builder
      // (Bench/Verify/VerifyOne/specs), making this set idempotent: no
      // cross-query variance (r12 ADVICE), and any external session still
      // gets the right plan.
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val nation = ld(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val region = ld(s, d, "region").select("r_regionkey", "r_name")
      graft.sources.GraftMemRegistry.register("nation_spj",
        nation.schema, nation.collect().toSeq)
      graft.sources.GraftMemRegistry.register("region_spj",
        region.schema, region.collect().toSeq)
      def mem(t: String, key: String) =
        s.read.format("graft.sources.GraftMemSource")
          .option("table", t).option("partitionKey", key).load()
      mem("nation_spj", "n_regionkey")
        .join(mem("region_spj", "r_regionkey"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_regionkey", "r_name")
        .agg(count(lit(1)).as("n_nations"),
          min("n_name").as("first_nation"))
        .orderBy("r_regionkey")
    }),

    // V2 TableCatalog at the SQL layer — the reference's `Catalog`
    // (`catalog.rs:20-23`; name → table lookup `catalog.rs:60-65`)
    // completed as a first-class Spark catalog plugin: with
    // spark.sql.catalog.graftcat = graft.sources.GraftMemCatalog, a
    // registered memory table is addressable as `graftcat.<name>` in
    // PLAIN SQL — no read.format() plumbing — and the entire pushdown
    // stack (pruning, filters, q305's aggregates, q309's partitioning)
    // applies because loadTable returns the same GraftMemTable. This is
    // the three-level namespace a lakehouse exposes; the catalog is
    // read-only by design, like the reference's (registration happens
    // outside SQL). Oracle replays over the parquet table.
    "q310_dsv2_catalog" -> ((s, d) => {
      val nation = ld(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      graft.sources.GraftMemRegistry.register("nation_cat",
        nation.schema, nation.collect().toSeq)
      s.conf.set("spark.sql.catalog.graftcat",
        "graft.sources.GraftMemCatalog")
      s.sql("""SELECT n_regionkey, count(*) AS n,
                      max(n_nationkey) AS max_key
               FROM graftcat.nation_cat
               WHERE n_nationkey < 20
               GROUP BY n_regionkey ORDER BY n_regionkey""")
    }),

    // REFERENTIAL-INTEGRITY (FK orphan) AUDIT — every foreign-key edge
    // of the schema checked in one pass each: child keys with no
    // matching parent, via LEFT ANTI joins (the q98 decontamination
    // shape applied to integrity). The audit is the gate a pipeline
    // runs before joins are TRUSTED — an orphaned fact silently
    // disappears from every inner join downstream (q11's 5-way chain),
    // which is a data-loss bug that never throws. Per edge: child
    // cardinality, orphan count, intact verdict. Anti-joins are keyed
    // shuffles; parent key sets are corpus-proportional so nothing
    // broadcasts by hint — Catalyst may still broadcast the genuinely
    // tiny dims (nation/region), which is correct.
    "q311_fk_orphans" -> ((s, d) => {
      def keyed(df: DataFrame, k: String): DataFrame =
        df.select(col(k).as("k"))
      def audit(edge: String, childK: DataFrame,
          parentK: DataFrame): DataFrame = {
        val orphans = childK
          .join(parentK.distinct(), Seq("k"), "left_anti")
        childK.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(edge).as("fk_edge"), col("n_child"),
            col("n_orphans"), (col("n_orphans") === 0L).as("intact"))
      }
      val li = ld(s, d, "lineitem"); val o = ld(s, d, "orders")
      val c = ld(s, d, "customer"); val su = ld(s, d, "supplier")
      val n = ld(s, d, "nation"); val r = ld(s, d, "region")
      val p = ld(s, d, "part")
      Seq(
        audit("lineitem.l_orderkey->orders.o_orderkey",
          keyed(li, "l_orderkey"), keyed(o, "o_orderkey")),
        audit("lineitem.l_partkey->part.p_partkey",
          keyed(li, "l_partkey"), keyed(p, "p_partkey")),
        audit("lineitem.l_suppkey->supplier.s_suppkey",
          keyed(li, "l_suppkey"), keyed(su, "s_suppkey")),
        audit("orders.o_custkey->customer.c_custkey",
          keyed(o, "o_custkey"), keyed(c, "c_custkey")),
        audit("customer.c_nationkey->nation.n_nationkey",
          keyed(c, "c_nationkey"), keyed(n, "n_nationkey")),
        audit("supplier.s_nationkey->nation.n_nationkey",
          keyed(su, "s_nationkey"), keyed(n, "n_nationkey")),
        audit("nation.n_regionkey->region.r_regionkey",
          keyed(n, "n_regionkey"), keyed(r, "r_regionkey")))
        .reduce(_ unionByName _)
        .orderBy("fk_edge")
    }),

    // TRENDING RANK MOVEMENT — month-over-month part-popularity rank
    // deltas, the "what is rising" monitor a feed ranks with: parts
    // ranked per month by order-line count (month-partitioned
    // row_number, ties by part key — bit-stable), adjacent months
    // joined on the part, and the last month's top-10 risers by rank
    // improvement. New entrants (no prior-month rank) are excluded by
    // the inner join — deliberately: a rank DELTA needs both ends; the
    // entrant report is a different query (q204-family). Per-month
    // partitions are catalog-sized, never corpus-sized; the only
    // corpus-wide work is one map-side-combined (month, part) rollup.
    "q313_trending_rank" -> ((s, d) => {
      val cnt = ld(s, d, "lineitem")
        .select(expr("CAST(year(l_shipdate) * 12 + month(l_shipdate)" +
          " AS BIGINT)").as("ym"), col("l_partkey"))
        .groupBy("ym", "l_partkey").agg(count(lit(1)).as("n"))
        .localCheckpoint() // both adjacent-month join sides
      // r15 (§2.3): only the LAST TWO months can contribute to the
      // report (c.ym = maxym forces p.ym = maxym − 1), so the max-month
      // filter moves BELOW the rank window and the self-join — the
      // window partitions BY month, so ranks within a kept month are
      // unchanged by dropping other months, and the old plan ranked and
      // joined every month of history only to discard all but the last
      // pair. At 100 TB this is |2 months| of rank work instead of the
      // whole calendar.
      val last = cnt.agg(max("ym").as("maxym"))
      val tail2 = cnt.crossJoin(broadcast(last))
        .filter(col("ym") >= col("maxym") - 1)
      val w = Window.partitionBy("ym")
        .orderBy(col("n").desc, col("l_partkey"))
      val rk = tail2.withColumn("rnk", row_number().over(w))
      rk.as("p").join(rk.as("c").hint("shuffle_hash"),
          col("c.ym") === col("p.ym") + 1 &&
            col("c.l_partkey") === col("p.l_partkey"))
        .filter(col("c.ym") === col("c.maxym"))
        .select(col("c.l_partkey").as("l_partkey"),
          col("p.rnk").cast("long").as("rank_prev"),
          col("c.rnk").cast("long").as("rank_now"),
          (col("p.rnk").cast("long") - col("c.rnk").cast("long"))
            .as("rank_delta"))
        .orderBy(col("rank_delta").desc, col("l_partkey")).limit(10)
    }),

    // DSv2 WRITE PATH — the missing half of the q303/q305/q309/q310
    // source family: BATCH_WRITE through the V2 two-phase commit
    // protocol. Executors buffer rows per task and hand them up as
    // WriterCommitMessages; the driver's BatchWrite.commit installs
    // ALL partitions in one atomic registry swap (partition-ordered,
    // so the committed row order is deterministic regardless of task
    // finish order), and a failed task routes to abort() leaving the
    // table untouched — DsV2WriteSpec pins both arms, this query
    // drives the happy path end to end: aggregate lineitem, write
    // with mode(Overwrite) (negotiated via SupportsTruncate), read
    // the committed table back through the same V2 scan the q303
    // family pins. At 100 TB the identical contract holds with staged
    // files + a manifest swap instead of a registry entry — commit
    // atomicity lives in the driver-side swap either way.
    "q321_dsv2_write_commit" -> ((s, d) => {
      val agg = ld(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100" +
            " AS BIGINT)")).as("revenue_cents"))
      graft.sources.GraftMemRegistry.register("li_sink", agg.schema, Nil)
      agg.write.format("graft.sources.GraftMemSource")
        .option("table", "li_sink").mode("overwrite").save()
      s.read.format("graft.sources.GraftMemSource")
        .option("table", "li_sink").load()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ADAMIC–ADAR LINK PREDICTION — the classic common-neighbor score
    // weighted by neighbor RARITY: AA(s₁,s₂) = Σ_{shared part}
    // 1/ln(deg(part)), so two suppliers sharing a niche part signal a
    // stronger tie than two sharing a commodity everyone supplies —
    // the link-prediction rung beside q134's triangle significance and
    // q255's personalized PPR. The irrational 1/ln(d) weights come
    // from ONE Scala-generated micro-unit lookup (d ∈ 2..512) rendered
    // into BOTH engines (the q319/q301 discipline — no libm log drift
    // can exist because neither engine ever calls log), an in-plan
    // assert_true fails loudly if a degree ever exceeds the table, and
    // the pair space is part-blocked (common-neighbor join on the part
    // key, never supplier²). Top-50 ties broken on (s1, s2); rides
    // TakeOrderedAndProject.
    "q324_adamic_adar" -> ((s, d) => {
      import s.implicits._
      val ps = ld(s, d, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sp"))
        .distinct()
        .localCheckpoint() // feeds the degree frame + both pair sides
      val deg = ps.groupBy("p").agg(count(lit(1)).as("dg"))
        .withColumn("_mag_ok", assert_true(col("dg") <= 512L,
          lit("q324 AA weight table covers deg 2..512: widen lnLut")))
        .filter(col("_mag_ok").isNull).drop("_mag_ok")
      val lut = lnLut.toDF("dg", "w_micro")
      val wp = deg.filter(col("dg") >= 2)
        .join(broadcast(lut), Seq("dg"))
        .select(col("p"), col("w_micro"))
      // r15 (§2.3): the AA weight is a function of the apex part p, so
      // attach it to the A side BEFORE the pair self-join — the weight
      // rides into every pair row for free instead of a second keyed
      // join over the full WEDGE frame (the largest frame in the query,
      // Σ C(deg,2) rows). The inner pre-join also drops deg-1 parts from
      // the A side, which produce no pairs anyway (a.sp < b.sp needs two
      // suppliers) — bit-identical output, one fewer pair-frame shuffle.
      ps.as("a")
        .join(wp.as("w").hint("shuffle_hash"), col("a.p") === col("w.p"))
        .join(ps.as("b").hint("shuffle_hash"),
          col("a.p") === col("b.p") && col("a.sp") < col("b.sp"))
        .groupBy(col("a.sp").as("s1"), col("b.sp").as("s2"))
        .agg(count(lit(1)).as("common_parts"),
          sum("w_micro").as("aa_micro"))
        .orderBy(col("aa_micro").desc, col("s1"), col("s2")).limit(50)
    }),

    // SQL SCRIPTING — Spark 4's procedural surface (BEGIN/DECLARE/
    // WHILE/IF/LEAVE, SQL/PSM) driving a real curation decision: find
    // the largest halving-chain length cutoff that still passes ≥60 %
    // of the corpus (the budget-driven quality-gate search every
    // data-mix owner runs). The loop body is ONE aggregate per probe —
    // the script engine orchestrates, the cluster aggregates; at
    // 100 TB each probe is a scan-bounded job and the chain is ≤11
    // probes. Oracle: the same search unrolled relationally (the
    // halving chain as a VALUES list, first passing cutoff by chain
    // order). Exact integers only (bp via DIV).
    "q330_sql_scripting" -> ((s, d) => {
      graft.Tables.view(s, d, "documents")
      // Scripting gates the PARSER only, and the whole script executes
      // inside sql() (the returned frame is the already-resolved last
      // SELECT) — so the flag can be restored immediately after, q336's
      // try/finally pattern (r12 ADVICE: the bare set leaked into every
      // later query of the session).
      val prevScripting = s.conf.getOption("spark.sql.scripting.enabled")
      s.conf.set("spark.sql.scripting.enabled", "true")
      try s.sql("""
        BEGIN
          DECLARE cutoff BIGINT DEFAULT 800;
          DECLARE pass_bp BIGINT DEFAULT 0;
          DECLARE total BIGINT;
          SET total = (SELECT count(*) FROM documents);
          gate: WHILE cutoff >= 0 DO
            SET pass_bp = (SELECT (10000 * count(*)) DIV total
                           FROM documents WHERE n_chars >= cutoff);
            IF pass_bp >= 6000 THEN
              LEAVE gate;
            END IF;
            SET cutoff = cutoff DIV 2;
          END WHILE;
          SELECT cutoff AS chosen_cutoff, pass_bp, total AS n_docs;
        END""")
      finally prevScripting match {
        case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
        case None => s.conf.unset("spark.sql.scripting.enabled")
      }
    }),

    // EXPLICIT CACHING (persist/InMemoryRelation) — the remaining
    // reuse primitive beside localCheckpoint (lineage CUT, used by the
    // shared-frame pins) and AQE stage reuse (same-plan dedup):
    // cache() keeps the LINEAGE and serves all downstream consumers
    // from the columnar in-memory form — the right tool when one
    // derived frame feeds many differently-shaped consumers in a
    // session. Both branch aggregates here must read
    // InMemoryTableScan (plan-pinned), and the per-part rollup is
    // computed once, not per branch. Memory-and-disk semantics mean
    // at 100 TB the hot partitions stay resident and the cold spill —
    // the Bench harness clears the cache between queries so the pin
    // never leaks across measurements.
    "q332_cached_reuse" -> ((s, d) => {
      val perPart = ld(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n_lines"))
        .persist()
      val hi = perPart.filter(col("qty") > 150)
        .agg(lit("hi").as("band"), count(lit(1)).as("n_parts"),
          sum("qty").as("tot_qty"), sum("n_lines").as("tot_lines"))
      val lo = perPart.filter(col("qty") <= 150)
        .agg(lit("lo").as("band"), count(lit(1)).as("n_parts"),
          sum("qty").as("tot_qty"), sum("n_lines").as("tot_lines"))
      hi.unionByName(lo).orderBy("band")
    }),

    // SQL SESSION VARIABLES — the second Spark 4 scripting-family
    // surface: DECLARE VARIABLE / SET VAR with a scalar-subquery
    // initializer, then plain SQL referencing the variable — the
    // parameterize-without-string-splicing mechanism (q220's named
    // parameters are per-call; variables persist across statements in
    // the session). The variable pins the 90%-of-max price threshold
    // once; the consumer query filters against it.
    "q331_session_variables" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("DECLARE OR REPLACE VARIABLE g_hi_cut BIGINT")
      s.sql("""SET VAR g_hi_cut =
                 (SELECT (max(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                               * 100 AS BIGINT)) * 90) DIV 100
                  FROM orders)""")
      s.sql("""SELECT o_orderpriority, count(*) AS n_high,
                      min(g_hi_cut) AS cut_cents
               FROM orders
               WHERE CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                          AS BIGINT) >= g_hi_cut
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // ARRAY HIGHER-ORDER FUNCTIONS — the lambda SQL surface
    // (transform / filter / aggregate / exists) over a per-row array,
    // a type family the reference does not have at all (DataType::List
    // exists only as an unreachable cast todo!(), cast.rs:66-85).
    // Token-length profiling per document: lengths via transform, the
    // fold via aggregate with a 0L seed (so the sum accumulates in
    // BIGINT), selective counting via filter, a threshold probe via
    // exists. NOTE the engine boundary this family sits on: Spark
    // evaluates HOF lambdas INTERPRETED (no codegen), which is why the
    // hot-path operators here (q67's SimHash64, q113's chunker) are
    // native Expressions instead — this query pins the SURFACE, and
    // per-row array work at this size is projection-cheap. One scan,
    // no shuffle except the output sort.
    "q307_array_hof" -> ((s, d) => {
      graft.Tables.view(s, d, "documents")
      s.sql("""SELECT doc_id,
                      CAST(size(lens) AS BIGINT) AS n_toks,
                      aggregate(lens, 0L, (a, x) -> a + x) AS sum_len,
                      CAST(array_max(lens) AS BIGINT) AS max_len,
                      CAST(size(filter(lens, x -> x > 5)) AS BIGINT)
                        AS n_long,
                      exists(lens, x -> x >= 9) AS has_long9
               FROM (SELECT doc_id,
                            transform(split(text, ' '), t -> length(t))
                              AS lens
                     FROM documents)
               ORDER BY doc_id""")
    }),

    // KENDALL TAU trend test — the rank-correlation verdict beside
    // q234's Spearman and q295's Theil–Sen, over the same weekly
    // revenue series: concordant/discordant pair counts against the
    // (always-increasing) time axis, so τ_a = (C − D)/m is the signed
    // share of weeks-pairs moving the "right" way — the
    // distribution-free is-there-a-trend-at-all test that needs no
    // residual assumptions and no floats. C/D/T are exact integer
    // counts from the same calendar-bounded pair join as q295 (weeks²,
    // never corpus²); τ in signed floor bp via the portable
    // floor-division identity so both engines agree on negative
    // values. Only the weekly rollup touches the corpus.
    "q297_kendall_tau" -> ((s, d) => {
      val wk = weeklyRevenue(s, d)
      wk.as("a").join(wk.as("b").hint("shuffle_hash"),
          col("a.grp") === col("b.grp") && col("a.w") < col("b.w"))
        .select(col("a.grp").as("grp"),
          when(col("b.y") > col("a.y"), 1L).otherwise(0L).as("cc"),
          when(col("b.y") < col("a.y"), 1L).otherwise(0L).as("dd"),
          when(col("b.y") === col("a.y"), 1L).otherwise(0L).as("tt"))
        .groupBy("grp").agg(sum("cc").as("c"), sum("dd").as("d"),
          sum("tt").as("t"))
        .select(col("grp"), (col("c") + col("d") + col("t")).as("m"),
          col("c"), col("d"), col("t"),
          expr("CAST((((c - d) * 10000) - ((((((c - d) * 10000) % (c + d + t))" +
            " + (c + d + t)) % (c + d + t)))) DIV (c + d + t) AS BIGINT)")
            .as("tau_a_bp"))
        .orderBy("grp")
    }),

    // CALENDAR-CYCLE ARITHMETIC — month arithmetic is NOT addition:
    // `add_months` clamps Jan 31 + 1 month to Feb 29/28 (the billing
    // date a real invoice cycle uses), `last_day` marks end-of-month
    // billing, and `next_day` finds the strictly-next Monday shipping
    // cutoff. These are the calendar semantics a partition-by-month
    // 100 TB layout inherits, and every engine implements them
    // slightly differently — so the audit rolls all three up per bill
    // month and proves agreement with the oracle's interval algebra
    // (DuckDB has no add_months/next_day; its `+ INTERVAL 1 MONTH`
    // clamps identically and next-Monday is the isodow congruence).
    // Pure narrow ops into one month-keyed agg — map-side combined,
    // one shuffle of ~80 month keys regardless of corpus size.
    "q339_billing_cycles" -> ((s, d) => {
      ld(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("od"))
        .select(col("od"), add_months(col("od"), 1).as("bill"),
          last_day(col("od")).as("eom"),
          next_day(col("od"), "MON").as("cutoff"))
        .select(date_format(col("bill"), "yyyy-MM").as("bill_month"),
          when(dayofmonth(col("bill")) < dayofmonth(col("od")), 1L)
            .otherwise(0L).as("clamped"),
          when(col("od") === col("eom"), 1L).otherwise(0L).as("on_eom"),
          datediff(col("cutoff"), col("od")).as("cutoff_gap"))
        .groupBy("bill_month")
        .agg(count(lit(1)).as("n_orders"), sum("clamped").as("n_clamped"),
          sum("on_eom").as("n_eom"),
          sum("cutoff_gap").as("sum_cutoff_days"))
        .orderBy("bill_month")
    }),

    // MOMENT STATISTICS — per-group skewness/kurtosis of the price
    // distribution, the shape diagnostics a sampling or outlier gate
    // reads before trusting a mean. Spark's `skewness`/`kurtosis` are
    // POPULATION moments (g1, excess g2) while DuckDB's are the
    // bias-corrected SAMPLE estimators — the audit applies the exact
    // estimator conversion in-plan (G1 = g1·√(n(n−1))/(n−2); G2 =
    // (n−1)/((n−2)(n−3))·((n+1)g2+6)) so both engines report the same
    // number, documenting the divergence instead of hiding it. One
    // partial+final aggregate; moments merge associatively, so the
    // map-side combine works at any executor count.
    "q340_moment_stats" -> ((s, d) => {
      ld(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          skewness(col("l_extendedprice")).as("g1"),
          kurtosis(col("l_extendedprice")).as("g2"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(col("g1") * sqrt(col("n") * (col("n") - 1)) /
            (col("n") - 2), 5).as("skew_sample"),
          round((col("n") - 1) / ((col("n") - 2) * (col("n") - 3)) *
            ((col("n") + 1) * col("g2") + 6), 5).as("kurt_sample"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // CONTRACT-CHECK AGGREGATES — `count_if` / `bool_and` / `bool_or`
    // turn a data contract ("quantity within the contracted band",
    // "no ship date before the catalog epoch") into ONE aggregate
    // pass instead of N filtered subqueries: the boolean aggregates
    // fold flags map-side, so the whole SLA audit is a single shuffle
    // of |returnflag| keys. The violation COUNTS ride along with the
    // pass/fail verdicts, so a red contract comes with its incidence
    // for free.
    "q341_contract_checks" -> ((s, d) => {
      ld(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          expr("count_if(l_discount > 0.05)").as("n_discounted"),
          expr("count_if(l_extendedprice > 50000)").as("n_big_tickets"),
          expr("bool_and(l_quantity >= 1 AND l_quantity <= 50)")
            .as("qty_in_contract"),
          expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
          expr("bool_and(l_shipdate >= DATE '1992-01-01')")
            .as("ship_after_epoch"))
        .orderBy("l_returnflag")
    }),

    // EQUI-WIDTH HISTOGRAM + OGIVE — `width_bucket` bins prices into
    // 64 buckets whose width (2048) is a power of two, so the
    // float division is a pure exponent shift and the bucket edge
    // arithmetic is EXACT in both engines (a 10.24-width bucket would
    // hash-diverge on edge values); the cumulative share is integer
    // ppm via DIV so no float rounding can flip a digit. The corpus
    // pass is one map-side-combined 64-key aggregate; the window runs
    // over the 64-row histogram, never the corpus — the ogive a
    // quantile-layout planner reads costs nothing at 100 TB.
    "q342_price_histogram" -> ((s, d) => {
      val h = ld(s, d, "lineitem")
        .select(expr("width_bucket(l_extendedprice, 0D, 131072D, 64)")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val wCum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      h.select(col("bucket"), col("n"),
          sum("n").over(wCum).as("cum_n"),
          sum("n").over(wAll).as("total"))
        .select(col("bucket"), col("n"), col("cum_n"),
          expr("CAST((cum_n * 1000000) DIV total AS BIGINT)")
            .as("cum_ppm"))
        .orderBy("bucket")
    }),

    // SPATIAL GRID NEAREST NEIGHBOR — exact NN over a planar point
    // cloud without the n² pair join: points land in 62500-unit grid
    // cells, each point probes only its 3×3 cell neighborhood (an
    // EQUI-join on cell coords, so it hash-partitions and scales), and
    // a candidate at d < cell width is CERTIFIED optimal — any point
    // outside the neighborhood is ≥ one full cell away. The rare
    // uncertified points (sparse corners where the true NN may sit
    // beyond the neighborhood) ESCALATE to a brute-force pass — a
    // broadcast of just those points against the cloud, so exactness
    // never costs n². Coordinates are md5-derived integer micro-units
    // (the engine-portable determinism recipe), distances exact
    // BIGINT; ties break to the smaller neighbor id via the packed
    // d²·10⁶+id encoding. Oracle: DuckDB brute-forces the full n²
    // min — same packing, same answer.
    "q344_grid_nearest_neighbor" -> ((s, d) => {
      val cell = 62500L
      val pts = ld(s, d, "customer").selectExpr(
        "c_custkey AS id",
        "CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 8)," +
          " 16, 10) AS BIGINT) % 1000000 AS x",
        "CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 9, 8)," +
          " 16, 10) AS BIGINT) % 1000000 AS y")
        .localCheckpoint()
      val probe = pts.selectExpr("id", "x", "y",
          s"explode(sequence(x DIV $cell - 1, x DIV $cell + 1)) AS cx")
        .selectExpr("id", "x", "y", "cx",
          s"explode(sequence(y DIV $cell - 1, y DIV $cell + 1)) AS cy")
      val build = pts.selectExpr("id AS bid", "x AS bx", "y AS by",
        s"x DIV $cell AS cx", s"y DIV $cell AS cy")
      // one row per point — checkpointed so the three consumers
      // (certified filter, escalation semi, no-candidate anti) read
      // the grid join ONCE, not three times
      val grid = probe.join(build.hint("shuffle_hash"), Seq("cx", "cy"))
        .where(col("id") =!= col("bid"))
        .selectExpr("id",
          "((bx - x) * (bx - x) + (by - y) * (by - y)) * 1000000L + bid" +
            " AS pack")
        .groupBy("id").agg(min("pack").as("pack"))
        .localCheckpoint()
      val certified = grid.where(col("pack") < lit(cell * cell * 1000000L))
      val escalate = pts.join(broadcast(grid.where(
          col("pack") >= lit(cell * cell * 1000000L)).select("id")),
          Seq("id"), "left_semi")
        .unionByName(pts.join(broadcast(grid.select("id")), Seq("id"),
          "left_anti"))
      val brute = broadcast(escalate).as("a")
        .join(pts.selectExpr("id AS bid", "x AS bx", "y AS by"),
          col("id") =!= col("bid"))
        .selectExpr("id",
          "((bx - x) * (bx - x) + (by - y) * (by - y)) * 1000000L + bid" +
            " AS pack")
        .groupBy("id").agg(min("pack").as("pack"))
      certified.unionByName(brute)
        .selectExpr("id", "CAST(pack DIV 1000000 AS BIGINT) AS d2",
          "CAST(pack % 1000000 AS BIGINT) AS nn_id",
          s"pack DIV 1000000 < ${cell * cell}L AS certified")
        .orderBy("id")
    }),

    // BITMAP DISTINCT ACCELERATION — count(DISTINCT key) at 100 TB
    // pays a full expand+reshuffle of every (group, key) pair; the
    // bitmap aggregate family replaces it with fixed 4 KB bucket
    // bitmaps (32768 bits each) that OR together associatively: the
    // map side emits at most |buckets| bitmaps per group no matter how
    // many duplicate keys it saw, and the merge is bitwise. The audit
    // reports the bitmap-derived distinct count per priority next to
    // the bucket count (= how many 4 KB pages the key range actually
    // touched); the oracle's exact COUNT(DISTINCT) proves the bitmaps
    // lose nothing.
    "q345_bitmap_distinct" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""SELECT o_orderpriority,
                      CAST(sum(bitmap_count(b)) AS BIGINT)
                        AS n_distinct_custs,
                      CAST(count(*) AS BIGINT) AS n_buckets
               FROM (SELECT o_orderpriority,
                            bitmap_bucket_number(o_custkey) AS bkt,
                            bitmap_construct_agg(
                              bitmap_bit_position(o_custkey)) AS b
                     FROM orders GROUP BY 1, 2)
               GROUP BY 1 ORDER BY 1""")
    }),

    // GROUPING-ID PROVENANCE — a ROLLUP emits detail rows and total
    // rows into ONE result; downstream consumers must tell them apart
    // WITHOUT string-matching on nulls (a real nation named 'ALL'
    // would corrupt a coalesce-only scheme). grouping()/grouping_id()
    // are the provenance bits: 0 = real key, 1 = aggregated away —
    // identical bit semantics in DuckDB's GROUPING_ID. Keys are
    // coalesced to a sentinel ONLY for display/ordering; the bits are
    // the truth. Customer and nation are broadcast dims; the rollup
    // itself is one expand+aggregate over the fact.
    "q347_grouping_provenance" -> ((s, d) => {
      Seq("orders", "customer", "nation")
        .foreach(graft.Tables.view(s, d, _))
      s.sql("""SELECT coalesce(n_name, 'ALL') AS nation,
                      coalesce(o_orderpriority, 'ALL') AS priority,
                      CAST(grouping_id() AS BIGINT) AS gid,
                      CAST(grouping(n_name) AS BIGINT) AS g_nation,
                      CAST(count(*) AS BIGINT) AS n_orders,
                      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                                    * 100 AS BIGINT)) AS BIGINT)
                        AS cents
               FROM orders
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY ROLLUP(n_name, o_orderpriority)
               ORDER BY gid, nation, priority""")
    }),

    // XML INGEST PATH — the third semi-structured format beside JSON
    // (q304) and CSV (q335): `from_xml` parses attribute + element
    // fields against a declared schema and the Hive `xpath_*` family
    // extracts ad hoc. The documents are constructed from order
    // columns in-plan, so the oracle can compute the SAME rollup from
    // the base columns directly — if the parse path drops, mangles,
    // or mistypes one field, the aggregate diverges. Parsing is a
    // per-row projection (no shuffle); the rollup is the only
    // exchange. The parsed total re-enters exact cents space before
    // aggregation so no decimal-vs-float drift can hide.
    // The Hive xpath_* family instantiates a javax XPath evaluator
    // per call (measured 13× the schema'd from_xml parse at sf0.1),
    // so the xpath cross-check runs at 1/97 spot-check incidence —
    // the q284 lesson: an audit samples the expensive path at
    // production rate, it does not pay it on every row.
    "q349_xml_ingest" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH docs AS (
          SELECT o_orderkey AS k,
                 concat('<order id="', o_orderkey, '"><priority>',
                        o_orderpriority, '</priority><total>',
                        CAST(CAST(o_totalprice AS DECIMAL(14,2))
                             AS STRING), '</total></order>') AS doc
          FROM orders),
        parsed AS (
          SELECT from_xml(doc,
                   '_id BIGINT, priority STRING, total DECIMAL(14,2)')
                   AS x,
                 CASE WHEN k % 97 = 0
                      THEN xpath_long(doc, '/order/@id') END AS xp_id
          FROM docs)
        SELECT x.priority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(x.total * 100 AS BIGINT)) AS BIGINT)
                 AS cents,
               CAST(sum(x._id) AS BIGINT) AS sum_ids,
               CAST(sum(CASE WHEN x._id = xp_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_xpath_agree
        FROM parsed GROUP BY 1 ORDER BY 1""")
    }),

    // SQL PIPE SYNTAX — Spark 4's |> operator chain: each stage is a
    // self-contained relational step applied top-to-bottom, so the
    // query reads in EXECUTION order (the way a pipeline author
    // thinks) instead of SQL's inside-out nesting. Semantically it
    // plans to the identical tree — same broadcast dim join, same
    // partial+final aggregate — which the plain-SQL oracle proves.
    // The statement also exercises the injected parser seam
    // (GraftExtensions delegates non-extension syntax to the stock
    // parser, q176's lesson): pipe syntax must survive the
    // extension's parser wrapper.
    "q355_pipe_syntax" -> ((s, d) => {
      Seq("orders", "customer", "nation")
        .foreach(graft.Tables.view(s, d, _))
      s.sql("""FROM orders
               |> JOIN customer ON o_custkey = c_custkey
               |> JOIN nation ON c_nationkey = n_nationkey
               |> WHERE o_totalprice > 1000
               |> EXTEND CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT) AS cents
               |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                            CAST(sum(cents) AS BIGINT) AS cents
                  GROUP BY n_name
               |> WHERE n_orders >= 10
               |> ORDER BY n_name""")
    }),

    // HASH-RING NEGATIVE SAMPLING — contrastive training needs K
    // negatives per (user, positive) WITHOUT a user×catalog cross
    // join. The closed form: negative k for user u is simply
    // catalog key md5(u,k) mod |catalog| — no join materializes the
    // candidate, the only join is the COLLISION check against the
    // user's positives (an equi-join on (user, candidate), linear in
    // users·K). Collisions are counted, not silently kept — the
    // consumer decides whether 1/|catalog| leakage matters. Part
    // keys are contiguous 0..P−1 in this corpus, so mod maps
    // directly onto real keys; |catalog| rides in as a broadcast
    // scalar.
    "q365_negative_sampling" -> ((s, d) => {
      val pos = ld(s, d, "orders")
        .join(ld(s, d, "lineitem").hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint()
      val nParts = ld(s, d, "part").agg(count(lit(1)).as("np"))
      val cands = ld(s, d, "customer").select(col("c_custkey").as("u"))
        .crossJoin(broadcast(nParts))
        .select(col("u"), explode(expr("sequence(1, 3)")).as("k"),
          col("np"))
        .selectExpr("u", "k",
          "CAST(conv(substr(md5(concat(CAST(u AS STRING), '#'," +
            " CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT) % np" +
            " AS cand")
      cands.join(pos.hint("shuffle_hash"),
          cands("u") === pos("u") && col("cand") === col("pk"),
          "left")
        .select(cands("u").as("u"), col("cand"),
          col("pk").isNotNull.as("collision"))
        .groupBy("u")
        .agg(expr("count_if(NOT collision)").as("n_neg_clean"),
          expr("count_if(collision)").as("n_collisions"),
          sum("cand").cast("long").as("cand_checksum"))
        .orderBy("u")
    }),

    // ORDERED-SET AGGREGATES + FILTER CLAUSE — the two declarative
    // aggregate surfaces a metrics layer leans on: percentile_cont
    // WITHIN GROUP (ORDER BY …) interpolates the exact type-7
    // quantile inside the aggregate (no manual row_number scaffold),
    // and FILTER (WHERE …) scopes a measure without a second scan or
    // a CASE-NULL idiom. One partial+final pass; the quantile state
    // is per-group collected values — bounded here by group size,
    // the documented trade against the q141 sketch for exactness.
    "q366_ordered_set_aggs" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""SELECT o_orderpriority,
                      CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                           AS BIGINT) AS n_big,
                      round(percentile_cont(0.5)
                            WITHIN GROUP (ORDER BY o_totalprice), 2)
                        AS p50,
                      round(percentile_cont(0.95)
                            WITHIN GROUP (ORDER BY o_totalprice), 2)
                        AS p95,
                      round(avg(o_totalprice)
                            FILTER (WHERE o_totalprice > 100000), 2)
                        AS avg_big
               FROM orders GROUP BY 1 ORDER BY 1""")
    }),

    // ENCRYPTED COLUMN AT REST — the PII column family's crypto
    // rung beside q356's redaction: aes_encrypt/aes_decrypt (ECB for
    // determinism — GCM's random IV can't hash-compare), base64
    // transport encoding, and the roundtrip proven per row. The
    // oracle never encrypts: AES-ECB+PKCS ciphertext length is PURE
    // ARITHMETIC — (⌊len/16⌋+1)·16 bytes, 4·⌈ct/3⌉ base64 chars — so
    // byte accounting is provable from the plaintext lengths alone,
    // and a wrong padding mode or a truncated cipher shows up as a
    // count mismatch. Per-row projections; one |nations| rollup.
    "q367_encrypted_column" -> ((s, d) => {
      graft.Tables.view(s, d, "customer")
      s.sql("""
        WITH e AS (
          SELECT c_nationkey, c_name,
                 aes_encrypt(c_name, '0123456789abcdef', 'ECB') AS ct
          FROM customer),
        r AS (
          SELECT c_nationkey, c_name, ct,
                 CAST(aes_decrypt(ct, '0123456789abcdef', 'ECB')
                      AS STRING) AS rt
          FROM e)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
               CAST(count_if(rt = c_name) AS BIGINT) AS n_roundtrip_ok,
               CAST(sum(length(ct)) AS BIGINT) AS ct_bytes,
               CAST(sum(length(base64(ct))) AS BIGINT) AS b64_chars
        FROM r GROUP BY 1 ORDER BY 1""")
    }),

    // DIFFERENCE-IN-DIFFERENCES — the pre/post × A/B estimator that
    // closes the experimentation family (q358 CUPED, q363 Wilson):
    // DiD = (B_post − B_pre) − (A_post − A_pre) cancels both the
    // variant-level baseline and the period-level shock. Means are
    // exact-cents sums divided at the end (one integer state per
    // cell); assignment is the same md5 ring as q358 so both engines
    // agree on membership. One corpus pass into four cells.
    "q368_did_estimator" -> ((s, d) => {
      ld(s, d, "orders")
        .selectExpr(
          "CAST(conv(substr(md5(CAST(o_custkey AS STRING)), 1, 4)," +
            " 16, 10) AS BIGINT) % 2 AS variant",
          "CASE WHEN year(o_orderdate) >= 1998 THEN 'post'" +
            " ELSE 'pre' END AS period",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
            " AS cents")
        .groupBy("variant", "period")
        .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        .agg(
          expr("""round(
              sum(CASE WHEN variant = 1 AND period = 'post'
                       THEN CAST(sc AS DOUBLE) / n END)
            - sum(CASE WHEN variant = 1 AND period = 'pre'
                       THEN CAST(sc AS DOUBLE) / n END)
            - sum(CASE WHEN variant = 0 AND period = 'post'
                       THEN CAST(sc AS DOUBLE) / n END)
            + sum(CASE WHEN variant = 0 AND period = 'pre'
                       THEN CAST(sc AS DOUBLE) / n END), 2)""")
            .as("did_cents"),
          sum("n").cast("long").as("n_orders"),
          count(lit(1)).as("n_cells"))
    }),

    // KAPLAN–MEIER SURVIVAL — the censoring-aware churn curve the
    // experimentation family (q358/q363/q368) still lacked: customers
    // whose last order sits inside the observation window are EVENTS
    // (churned at lifetime t), the rest are right-censored — dropping
    // them (naive churn rate) biases survival down. Estimator:
    // S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with the risk set nᵢ = everyone
    // whose lifetime ≥ tᵢ, censored included (the whole point). Shape:
    // one customer rollup (map-side combined), then EVERYTHING runs on
    // the |lifetime-buckets| frame (≤ ~90 rows at any sf): the risk
    // set is a reverse cumulative window, the product is
    // exp(Σ ln(1−d/n)) — one window pass, rounded at 1e-6, eight
    // orders above libm noise (the q361 stance). The d = n_risk
    // terminal factor (ln 0) is excluded from both the sum and the
    // output — S has already hit its floor there.
    "q369_kaplan_meier" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH life AS (
          SELECT o_custkey,
                 datediff(CAST(max(o_orderdate) AS DATE),
                          CAST(min(o_orderdate) AS DATE)) DIV 28 AS t,
                 CASE WHEN max(o_orderdate) < TIMESTAMP '2001-01-01'
                      THEN 1 ELSE 0 END AS ev
          FROM orders GROUP BY o_custkey),
        by_t AS (
          SELECT t, CAST(count_if(ev = 1) AS BIGINT) AS d,
                 CAST(count(*) AS BIGINT) AS tot
          FROM life GROUP BY t),
        risk AS (
          SELECT t, d,
                 CAST(sum(tot) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                      AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
          FROM by_t),
        curve AS (
          SELECT t, d, n_risk,
                 round(exp(sum(CASE WHEN d < n_risk
                        THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk) END)
                      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)), 6) AS survival
          FROM risk)
        SELECT t, n_risk, d AS n_events, survival
        FROM curve WHERE d > 0 AND d < n_risk ORDER BY t""")
    }),

    // SPRT — Wald's sequential probability ratio test, the
    // early-stopping gate a streaming experiment runs INSTEAD of the
    // fixed-horizon tests (q348 χ², q363 Wilson): walk the trials in
    // event order, accumulate the log-likelihood ratio for
    // H1: p=0.72 vs H0: p=0.65, stop the first time it leaves
    // (ln β/(1−α), ln (1−β)/α). The per-trial increments and the
    // ±ln 19 boundaries are INTEGER NANO-NAT literals (74107972,
    // −223143551, 2944438979) — the cumulative walk is exact integer
    // arithmetic, no libm in either engine, bit-identical by
    // construction. One variant-filtered pass, one ordered window
    // cumsum, then a single aggregate with FILTER clauses finds the
    // first crossing (min seq) — never a per-row early-exit loop. The
    // ordered walk is single-partition BY DEFINITION (a sequential
    // test is a total order over trials); at scale the walk runs per
    // experiment-arm partition, and each arm's trial stream is the
    // size of ONE experiment, not the corpus.
    "q370_sprt_ab" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH t AS (
          SELECT CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                      AS BIGINT) AS seq,
                 CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS x
          FROM orders
          WHERE CAST(conv(substr(md5(CAST(o_custkey AS STRING)), 1, 4),
                          16, 10) AS BIGINT) % 2 = 1),
        llr AS (
          SELECT seq,
                 CAST(sum(CASE WHEN x = 1 THEN 74107972
                          ELSE -223143551 END)
                      OVER (ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS llr_nano
          FROM t)
        SELECT CAST(count(*) AS BIGINT) AS n_trials,
               max_by(llr_nano, seq) AS llr_final,
               min(seq) FILTER (WHERE abs(llr_nano) >= 2944438979)
                 AS n_at_decision,
               min_by(llr_nano, seq)
                 FILTER (WHERE abs(llr_nano) >= 2944438979)
                 AS llr_at_decision,
               CASE WHEN count(*)
                         FILTER (WHERE abs(llr_nano) >= 2944438979) = 0
                    THEN 'continue'
                    WHEN min_by(llr_nano, seq)
                         FILTER (WHERE abs(llr_nano) >= 2944438979) > 0
                    THEN 'accept_h1' ELSE 'accept_h0' END AS decision
        FROM llr""")
    }),

    // BELLMAN–FORD (bounded) — WEIGHTED shortest path over the
    // part↔supplier graph, the cost-aware sibling of q240's unit-hop
    // BFS: edge weight = min lineitem quantity for the pair, seeds =
    // part nodes 0–4 at distance 0, K=4 synchronous relaxation
    // rounds. Each round is ONE src-keyed join of the tentative-
    // distance frame against the edge frame plus a min-rollup —
    // distances only ever tighten, so the frame stays node-sized and
    // there is no path enumeration. The edge frame is partitioned by
    // src BEFORE its one checkpoint (the q240 trick: only the small
    // distance frame reshuffles per round). All-integer weights and
    // distances; the oracle replays the identical four rounds as a
    // CTE chain, so every tentative distance is bit-identical.
    "q371_bellman_ford" -> ((s, d) => {
      val pairs = ld(s, d, "lineitem")
        .groupBy((col("l_partkey") * 2).as("p"),
          (col("l_suppkey") * 2 + 1).as("q"))
        .agg(min("l_quantity").cast("long").as("w"))
      val edges = pairs.select(col("p").as("src"), col("q").as("dst"),
          col("w"))
        .unionAll(pairs.select(col("q").as("src"), col("p").as("dst"),
          col("w")))
        .repartition(col("src"))
        .localCheckpoint()
      var dist = edges.select(col("src").as("node")).distinct()
        .filter(col("node") < 10 && col("node") % 2 === 0)
        .withColumn("dist", lit(0L))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val relaxed = edges.join(dist, col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy("node").agg(min("dist").as("dist"))
          .localCheckpoint()
      }
      edges.select(col("src").as("node")).distinct()
        .join(dist.withColumnRenamed("node", "rn"),
          col("node") === col("rn"), "left")
        .agg(count(lit(1)).as("n_nodes"),
          count(col("rn")).as("n_reached"),
          sum("dist").cast("long").as("sum_dist"),
          max("dist").as("max_dist"),
          expr("count_if(dist = 0)").as("n_seeds"))
    }),

    // POINT-IN-POLYGON — ray casting as a RELATIONAL operator (the
    // geofence/service-area classifier beside q344's grid NN):
    // deterministic md5-derived integer coordinates per customer, a
    // 5-edge literal polygon, and the classic odd-crossings parity
    // test. The divisionless crossing predicate cross-multiplies both
    // sides by (y2−y1) and flips the inequality with its sign, so the
    // whole test is EXACT BIGINT arithmetic (coords ≤ 10⁴, products
    // ≤ 10⁸ — no overflow, no FP edge jitter, both engines agree on
    // every boundary case by construction). Shape: points ⨯ broadcast
    // 5-row edge table (bounded 5× inflation), parity per point, one
    // |nations| rollup — no shuffle wider than the final groupBy.
    "q372_point_in_polygon" -> ((s, d) => {
      val pts = ld(s, d, "customer").selectExpr("c_custkey", "c_nationkey",
        "CAST(conv(substr(md5(concat('x#', CAST(c_custkey AS STRING)))," +
          " 1, 8), 16, 10) AS BIGINT) % 10000 AS px",
        "CAST(conv(substr(md5(concat('y#', CAST(c_custkey AS STRING)))," +
          " 1, 8), 16, 10) AS BIGINT) % 10000 AS py")
      val poly = s.sql("""SELECT * FROM VALUES
          (2000L, 1000L, 8000L, 2000L), (8000L, 2000L, 9000L, 7000L),
          (9000L, 7000L, 5000L, 9500L), (5000L, 9500L, 1000L, 6000L),
          (1000L, 6000L, 2000L, 1000L) AS poly(x1, y1, x2, y2)""")
      pts.crossJoin(broadcast(poly))
        .withColumn("c", expr(
          """CASE WHEN (y1 > py) != (y2 > py)
                   AND (CASE WHEN y2 > y1
                        THEN (px - x1) * (y2 - y1) < (x2 - x1) * (py - y1)
                        ELSE (px - x1) * (y2 - y1) > (x2 - x1) * (py - y1)
                        END)
              THEN 1 ELSE 0 END"""))
        .groupBy("c_custkey", "c_nationkey")
        .agg(sum("c").as("nc"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          expr("count_if(nc % 2 = 1)").as("n_inside"))
        .orderBy("c_nationkey")
    }),

    // LEVENSHTEIN BLOCKED FUZZY JOIN — typo-tolerant matching via the
    // codegen'd edit-distance kernel, the general-alphabet sibling of
    // q189's deletion-neighborhood trick (which only catches single
    // deletions): match DISTINCT part names within a blocking key
    // (the product noun) at edit distance ≤ 2. The DICTIONARY-LEVEL
    // shape is the scale story: names dedup to a vocabulary frame
    // orders of magnitude smaller than the corpus (64 vs 2000 rows
    // here; the same ratio holds at 100 TB), the quadratic lev work
    // runs inside blocks of that small frame, and the corpus only
    // ever joins back BY EQUALITY. The |len_a − len_b| ≤ 2 length
    // filter is the standard lev lower bound, applied before the
    // O(n·m) kernel runs.
    "q373_levenshtein_block" -> ((s, d) => {
      // The dictionary is built ONCE and checkpointed — a CTE self-join
      // would inline the rollup twice (two corpus scans).
      val names = ld(s, d, "part")
        .groupBy(col("p_name"),
          expr("split_part(p_name, ' ', 2)").as("noun"))
        .agg(count(lit(1)).as("n_parts"))
        .localCheckpoint()
      val a = names.select(col("p_name").as("name_a"), col("noun"),
        col("n_parts").as("parts_a"))
      val b = names.select(col("p_name").as("name_b"),
        col("noun").as("noun_b"), col("n_parts").as("parts_b"))
      a.join(b, col("noun") === col("noun_b") &&
          col("name_a") < col("name_b"))
        .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2
          && levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long")
            .as("dist"),
          col("parts_a"), col("parts_b"))
        .orderBy("name_a", "name_b")
    }),

    // CDC NET-EFFECT COMPACTION — collapse an ordered I/U/D change
    // log to one net operation per key (the Debezium-consumer /
    // MERGE-prep primitive beside q130's SCD2 and q94's incremental
    // dedup): insert-then-delete nets to nothing, insert-then-updates
    // net to one insert carrying the LAST image, pre-existing keys
    // net to upsert or delete. The log is synthesized
    // deterministically from orders (md5-derived op mix 20/60/20).
    // Shape: ONE key-partitioned aggregate — min_by/max_by on a
    // single composite BIGINT sequence key (epoch·10⁶ + orderkey, no
    // per-key window pass, no sort) — then a 4-row rollup. At 100 TB
    // the compaction is exactly one shuffle of the log by key, which
    // is the floor for any per-key fold.
    "q375_cdc_net_effect" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH log AS (
          SELECT o_orderkey % 2000 AS k,
                 unix_timestamp(o_orderdate) * 1000000
                   + o_orderkey % 1000000 AS seq,
                 CASE WHEN CAST(conv(substr(md5(concat('op#',
                        CAST(o_orderkey AS STRING))), 1, 4), 16, 10)
                        AS BIGINT) % 10 < 2 THEN 'I'
                      WHEN CAST(conv(substr(md5(concat('op#',
                        CAST(o_orderkey AS STRING))), 1, 4), 16, 10)
                        AS BIGINT) % 10 < 8 THEN 'U'
                      ELSE 'D' END AS op,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                      AS BIGINT) AS cents
          FROM orders),
        per_key AS (
          SELECT k, min_by(op, seq) AS first_op,
                 max_by(op, seq) AS last_op,
                 max_by(cents, seq) AS last_cents,
                 CAST(count(*) AS BIGINT) AS n_ops
          FROM log GROUP BY k),
        net AS (
          SELECT k, n_ops, last_cents,
                 CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'drop'
                      WHEN first_op = 'I' THEN 'insert'
                      WHEN last_op = 'D' THEN 'delete'
                      ELSE 'upsert' END AS net_op
          FROM per_key)
        SELECT net_op, CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n_ops) AS BIGINT) AS n_source_ops,
               CAST(sum(CASE WHEN net_op IN ('insert', 'upsert')
                        THEN last_cents ELSE 0 END) AS BIGINT)
                 AS final_cents
        FROM net GROUP BY 1 ORDER BY 1""")
    }),

    // UPLIFT / QINI DECILES — the incremental-impact evaluation that
    // closes the causal family (q358 CUPED, q368 DiD): rank by a
    // model score, walk the deciles top-down, and at each depth
    // compare treated vs control response RATES (Qini's
    // unequal-arm-size correction). Two scale decisions: (1) deciles
    // come from the UNIFORM HASH SCORE's range (score DIV 100000) —
    // no global sort, no single-partition row_number, bucket
    // boundaries identical in both engines by construction; (2) the
    // cumulative walk runs on the 10-row decile frame. Qini numerator
    // is kept as the EXACT integer crt·cnc − crc·cnt; only the final
    // rate divides, rounded at 1e-6.
    "q376_uplift_qini" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH base AS (
          SELECT CAST(conv(substr(md5(concat('t#',
                   CAST(o_custkey AS STRING))), 1, 4), 16, 10)
                   AS BIGINT) % 2 AS treat,
                 CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
                   AS resp,
                 9 - (CAST(conv(substr(md5(concat('s#',
                   CAST(o_orderkey AS STRING))), 1, 8), 16, 10)
                   AS BIGINT) % 1000000) DIV 100000 AS d
          FROM orders),
        dec AS (
          SELECT d, CAST(count_if(treat = 1) AS BIGINT) AS n_t,
                 CAST(count_if(treat = 0) AS BIGINT) AS n_c,
                 CAST(sum(CASE WHEN treat = 1 THEN resp ELSE 0 END)
                      AS BIGINT) AS resp_t,
                 CAST(sum(CASE WHEN treat = 0 THEN resp ELSE 0 END)
                      AS BIGINT) AS resp_c
          FROM base GROUP BY d),
        cum AS (
          SELECT d, n_t, n_c, resp_t, resp_c,
                 CAST(sum(n_t) OVER w AS BIGINT) AS cnt,
                 CAST(sum(n_c) OVER w AS BIGINT) AS cnc,
                 CAST(sum(resp_t) OVER w AS BIGINT) AS crt,
                 CAST(sum(resp_c) OVER w AS BIGINT) AS crc
          FROM dec
          WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW))
        SELECT d, n_t, n_c, resp_t, resp_c,
               crt * cnc - crc * cnt AS qini_num,
               round(CAST(crt * cnc - crc * cnt AS DOUBLE)
                     / (cnt * cnc), 6) AS uplift
        FROM cum ORDER BY d""")
    }),

    // OCC WRITE-WRITE CONFLICT AUDIT — snapshot-isolation validation
    // over a transaction log: two transactions conflict iff their
    // [start, commit) intervals overlap AND they touch the same lock
    // key; first-committer-wins aborts the later one. Transactions
    // are synthesized deterministically from orders (md5-derived
    // duration ≤ 72 h). The scale move is the q53/q132 INTERVAL
    // BANDING recipe with a key twist: candidates must share (lock,
    // 3-day bucket) — an EQUI-join after a bounded explode (duration
    // cap ⇒ ≤ 2 buckets per txn), so the candidate set is 475 pairs
    // from 15 000 txns here and stays per-lock-local at any scale —
    // never an all-pairs interval test. DISTINCT collapses pairs
    // found in two shared buckets; everything is integer seconds.
    "q378_occ_conflicts" -> ((s, d) => {
      // The banded-explode frame is checkpointed ONCE and self-joined —
      // a CTE self-join would inline the scan + explode twice; the
      // conflict frame (475 rows at sf0.01) is checkpointed because
      // three aggregates branch off it.
      val ex = ld(s, d, "orders").selectExpr(
          "o_orderkey AS tid", "o_custkey % 500 AS lock",
          "unix_timestamp(o_orderdate) AS st",
          "unix_timestamp(o_orderdate) + 3600 * (1 + CAST(conv(" +
            "substr(md5(concat('d#', CAST(o_orderkey AS STRING)))," +
            " 1, 4), 16, 10) AS BIGINT) % 72) AS en")
        .selectExpr("tid", "lock", "st", "en",
          "explode(sequence(st DIV 259200, en DIV 259200)) AS bk")
        .localCheckpoint()
      val a = ex.select(col("tid").as("ta"), col("lock"), col("bk"),
        col("st").as("sa"), col("en").as("ea"))
      val x = ex.select(col("tid").as("tb"),
        col("lock").as("lock_x"), col("bk").as("bk_x"),
        col("st").as("sb"), col("en").as("eb"))
      val conf = a.join(x, col("lock") === col("lock_x") &&
          col("bk") === col("bk_x") && col("ta") < col("tb"))
        .select("ta", "tb", "lock", "sa", "ea", "sb", "eb").distinct()
        .withColumn("overlap", col("sa") < col("eb") &&
          col("sb") < col("ea"))
        .localCheckpoint()
      val nTx = ex.select("tid").distinct()
        .agg(count(lit(1)).as("n_txns"))
      val nAborted = conf.filter(col("overlap"))
        .select(when(col("ea") >= col("eb"), col("ta"))
          .otherwise(col("tb")).as("t")).distinct()
        .agg(count(lit(1)).as("n_aborted_txns"))
      conf.agg(count(lit(1)).as("n_candidate_pairs"),
          expr("count_if(overlap)").as("n_conflicts"))
        .crossJoin(broadcast(nTx)).crossJoin(broadcast(nAborted))
        .select("n_txns", "n_candidate_pairs", "n_conflicts",
          "n_aborted_txns")
    }),

    // REGR_* AGGREGATE FAMILY — the ANSI bivariate-regression
    // aggregates (slope/intercept/R²/avgx/avgy/count) as ONE
    // declarative map-side-combined pass, the surface q165 built by
    // hand from sums: price-per-quantity fit per return flag.
    // Both engines implement the same textbook moments; the doubles
    // are rounded a decade above the engines' accumulation-order
    // noise (slope/intercept at 1e-4 on ~1e4-magnitude values, R²
    // at 1e-6 on [0,1]). regr_count is exact.
    "q380_regr_aggregates" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
                 AS n,
               round(regr_slope(l_extendedprice, l_quantity), 4)
                 AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                 AS icept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               round(regr_avgx(l_extendedprice, l_quantity), 4)
                 AS avgx,
               round(regr_avgy(l_extendedprice, l_quantity), 4)
                 AS avgy
        FROM lineitem GROUP BY 1 ORDER BY 1""")
    }),

    // INTERSECT ALL / EXCEPT ALL — the BAG-semantics set operators
    // q22/q23 left uncovered (their DISTINCT forms answer "which
    // keys", these answer "how many occurrences survive"): bag
    // intersection keeps min(multiplicity), bag difference subtracts
    // with clamping — the semantics a reconciliation between two
    // event logs actually needs (losing duplicates under-counts).
    // Both engines plan this as one partial-aggregated count join —
    // a single shuffle on the key, no row-level materialization of
    // either multiset beyond its count frame.
    "q381_bag_set_ops" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH a AS (SELECT l_partkey AS k FROM lineitem
                   WHERE l_returnflag = 'R'),
        b AS (SELECT l_partkey AS k FROM lineitem
              WHERE l_linestatus = 'F'),
        ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
        ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        SELECT i.n_intersect_all, i.sum_intersect_all,
               e.n_except_all, e.sum_except_all
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_intersect_all,
                     CAST(sum(k) AS BIGINT) AS sum_intersect_all
              FROM ia) i
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS n_except_all,
                     CAST(sum(k) AS BIGINT) AS sum_except_all
              FROM ea) e""")
    }),

    // MAP HIGHER-ORDER FUNCTIONS — the MapType transformation
    // surface (map_from_entries / map_zip_with / map_filter /
    // transform_values) that q225/q357 only read: build two aligned
    // per-priority maps (status→count, status→cents), zip them into
    // an exact integer average, filter by value, and explode back to
    // rows. The lambdas run INSIDE codegen per row of the 5-row maps
    // frame — the map stage is a second-level aggregate over the
    // |prio|×|status| cell frame, so the corpus is scanned once and
    // everything map-typed is broadcast-sized. The oracle computes
    // the same cells relationally — the map machinery must be a
    // lossless detour.
    "q382_map_hof" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH cells AS (
          SELECT o_orderpriority AS prio, o_orderstatus AS st,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                      * 100 AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        maps AS (
          SELECT prio,
                 map_from_entries(sort_array(collect_list(
                   struct(st, n)))) AS mn,
                 map_from_entries(sort_array(collect_list(
                   struct(st, cents)))) AS mc
          FROM cells GROUP BY prio),
        z AS (
          SELECT prio,
                 map_filter(map_zip_with(mn, mc,
                   (k, a, b) -> b DIV a), (k, v) -> v > 15000000)
                   AS avg_map,
                 transform_values(mn, (k, v) -> v * 2) AS twice_map
          FROM maps)
        SELECT prio, ex.key AS st, ex.value AS avg_cents,
               element_at(twice_map, ex.key) AS n_twice
        FROM z LATERAL VIEW explode(avg_map) ex AS key, value
        ORDER BY prio, st""")
    }),

    // ROLLING REGRESSION — regr_slope as a WINDOW aggregate (the
    // q380 family moved onto a trailing frame): the 8-week rolling
    // revenue trend per order priority, the drift detector a
    // forecasting pipeline recomputes incrementally. Reuses the
    // weeklyRevenue rollup (exact integer cents), so the window walk
    // runs on the ~340-row weekly frame, partitioned by priority —
    // never the order corpus. Only FULL 8-week frames are emitted:
    // shorter prefixes would compare each engine's under-determined
    // fit (n=1 slope is NaN in DuckDB, NULL in Spark — a contract
    // mismatch by construction, excluded rather than papered over).
    "q383_rolling_regr" -> ((s, d) => {
      val win = Window.partitionBy("grp").orderBy("w")
        .rowsBetween(-7, 0)
      val rn = Window.partitionBy("grp").orderBy("w")
      weeklyRevenue(s, d)
        .withColumn("slope8",
          round(expr("regr_slope(CAST(y AS DOUBLE)," +
            " CAST(w AS DOUBLE))").over(win), 2))
        .withColumn("rn", row_number().over(rn))
        .filter(col("rn") >= 8)
        .select("grp", "w", "slope8")
        .orderBy("grp", "w")
    }),

    // BORŮVKA PHASE — the minimum-spanning-forest round that seeds
    // every distributed MST: each node picks its cheapest incident
    // edge (deterministic composite tie-break w·10⁸+dst — min_by on
    // ONE scalar, no sort), picks are normalized to undirected edges
    // and deduped, and the component count after the union is the
    // CLOSED FORM nodes − forest_edges (a forest never cycles — no
    // iterative CC needed to count components, the insight that
    // keeps this one aggregate + one dedup instead of a fixpoint
    // loop). One pass over the q371 edge frame; everything after is
    // node-sized.
    "q384_boruvka_phase" -> ((s, d) => {
      // Edge frame checkpointed once (the q371 recipe): both consumers
      // branch off it. r15 (§2.3/§2.4): the pick carries (dst, w) as a
      // struct through min_by, so the picked edge's weight needs NO
      // re-join against the |edges| frame (w is functionally determined
      // by the directed edge — pairs is grouped on (p,q) — and the
      // symmetrized twin carries the same w, so the normalized distinct
      // over (u, v, w) equals the old distinct over (u, v) + weight
      // fetch, bit-identically); and the node census is the count of
      // pick's groups (edges are symmetrized, so every node appears as
      // src) — sharing pick's src exchange via ReusedExchange instead
      // of a second full-edge-frame distinct. Removes the two
      // |edges|-sized passes the old shape paid after the pick.
      val pairs = ld(s, d, "lineitem")
        .groupBy((col("l_partkey") * 2).as("p"),
          (col("l_suppkey") * 2 + 1).as("q"))
        .agg(min("l_quantity").cast("long").as("w"))
      val edges = pairs.select(col("p").as("src"), col("q").as("dst"),
          col("w"))
        .unionAll(pairs.select(col("q").as("src"), col("p").as("dst"),
          col("w")))
        .localCheckpoint()
      val pick = edges.groupBy("src")
        .agg(min_by(struct(col("dst"), col("w")),
          col("w") * lit(100000000L) + col("dst")).as("pk"))
      val norm = pick
        .select(least(col("src"), col("pk.dst")).as("u"),
          greatest(col("src"), col("pk.dst")).as("v"), col("pk.w").as("w"))
        .distinct()
      val nNodes = pick.agg(count(lit(1)).as("n_nodes"))
      norm.agg(count(lit(1)).as("n_forest_edges"),
          sum("w").cast("long").as("forest_weight"))
        .crossJoin(broadcast(nNodes))
        .select(col("n_nodes"), col("n_forest_edges"),
          col("forest_weight"),
          (col("n_nodes") - col("n_forest_edges")).as("n_components"))
    }),

    // GAPS & ISLANDS — longest consecutive-month purchase streak per
    // customer via the classic difference trick: within a customer,
    // month_index − dense_rank(month_index) is CONSTANT exactly along
    // a consecutive run, so streaks fall out of one grouped count —
    // no self-join chain, no iterative expansion (the naive "extend
    // while adjacent" loop is O(longest streak) passes; this is one
    // window + two rollups, and the window partitions by customer so
    // the walk never crosses executor boundaries at scale). The
    // output is the retention-curve histogram: customers by best
    // streak length.
    "q385_order_streaks" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH m AS (SELECT DISTINCT o_custkey,
                     year(o_orderdate) * 12 + month(o_orderdate) AS mo
                   FROM orders),
        g AS (SELECT o_custkey, mo,
                mo - dense_rank() OVER (PARTITION BY o_custkey
                                        ORDER BY mo) AS grp
              FROM m),
        runs AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS len
                 FROM g GROUP BY o_custkey, grp),
        best AS (SELECT o_custkey, max(len) AS best_streak
                 FROM runs GROUP BY o_custkey)
        SELECT best_streak, CAST(count(*) AS BIGINT) AS n_customers
        FROM best GROUP BY 1 ORDER BY 1""")
    }),

    // BASKET JACCARD DRIFT — how much a customer's consecutive
    // baskets overlap, the repeat-purchase signal behind
    // substitution/loyalty analysis: per order, the DISTINCT part
    // set as a native array (sort_array(collect_set)); per customer,
    // lag() pairs each basket with its predecessor; array_intersect/
    // array_union sizes give exact Jaccard. The array algebra runs
    // per ROW on basket-sized arrays (≤ ~40 parts), the window
    // partitions by customer — nothing quadratic, nothing global.
    // The oracle has no array types: it recomputes |∩| via a
    // positional three-way join and |∪| by inclusion–exclusion, so
    // the Spark array kernels are checked against pure relational
    // algebra.
    "q386_basket_jaccard" -> ((s, d) => {
      val items = ld(s, d, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val baskets = items.groupBy("l_orderkey")
        .agg(sort_array(collect_set("l_partkey")).as("basket"))
      val ord = ld(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      ord.join(baskets, col("o_orderkey") === col("l_orderkey"))
        .withColumn("prev", lag("basket", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("i",
          size(array_intersect(col("basket"), col("prev"))).cast("long"))
        .withColumn("u",
          size(array_union(col("basket"), col("prev"))).cast("long"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("i").cast("double") / col("u")), 6)
            .as("avg_jaccard"),
          expr("count_if(i = 0)").as("n_disjoint"),
          sum("i").cast("long").as("sum_overlap"))
    }),

    // HAVERSINE HUB kNN — great-circle top-3 per service hub, the
    // spherical sibling of q344's planar grid NN: deterministic
    // md5-derived lat/lon per customer, 5 literal hubs, the
    // half-angle haversine evaluated in codegen (sin/cos/asin — libm
    // on both engines, distances rounded at 1 m where the inter-rank
    // gaps are hundreds of km). Shape: points ⨯ broadcast 5-row hub
    // table, then row_number per hub — the per-hub top-k is
    // TakeOrdered-sized, never a global sort of the corpus. At real
    // scale the hub table stays broadcast and a bounding-box
    // prefilter (q344's grid) would cut the cross product first.
    "q387_haversine_knn" -> ((s, d) => {
      graft.Tables.view(s, d, "customer")
      s.sql("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST(conv(substr(md5(concat('lat#',
                   CAST(c_custkey AS STRING))), 1, 8), 16, 10)
                   AS BIGINT) % 1400000 / 10000.0 - 70 AS lat,
                 CAST(conv(substr(md5(concat('lon#',
                   CAST(c_custkey AS STRING))), 1, 8), 16, 10)
                   AS BIGINT) % 3600000 / 10000.0 - 180 AS lon
          FROM customer),
        hubs AS (SELECT * FROM VALUES
          (1, 40.7D, -74.0D), (2, 51.5D, -0.1D), (3, 35.7D, 139.7D),
          (4, -33.9D, 151.2D), (5, 19.4D, -99.1D)
          AS hubs(hub_id, hlat, hlon)),
        d AS (
          SELECT hub_id, c_custkey,
                 round(2 * 6371.0 * asin(sqrt(
                   sin(radians((lat - hlat) / 2))
                     * sin(radians((lat - hlat) / 2))
                   + cos(radians(hlat)) * cos(radians(lat))
                     * sin(radians((lon - hlon) / 2))
                     * sin(radians((lon - hlon) / 2)))), 3) AS km
          FROM pts CROSS JOIN hubs),
        r AS (SELECT hub_id, c_custkey, km,
                     row_number() OVER (PARTITION BY hub_id
                       ORDER BY km, c_custkey) AS rank
              FROM d)
        SELECT hub_id, rank, c_custkey, km
        FROM r WHERE rank <= 3 ORDER BY hub_id, rank""")
    }),

    // CORRELATED SUBQUERY DECORRELATION — EXISTS, NOT EXISTS, and a
    // correlated scalar aggregate in one query, the surface Catalyst
    // must rewrite into joins (RewritePredicateSubquery → semi/anti;
    // scalar → aggregate + left outer) because a tuple-at-a-time
    // evaluation is O(customers × orders) at scale. The three
    // subqueries all correlate on custkey, so the physical plan is
    // three key-partitioned joins off ONE orders scan lineage — the
    // decorrelated shape is what makes this runnable at 100 TB.
    // Exact cents everywhere; per-nation rollup.
    "q388_correlated_exists" -> ((s, d) => {
      graft.Tables.view(s, d, "customer", "orders", "nation")
      s.sql("""
        WITH base AS (
          SELECT c_custkey, c_nationkey,
                 (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(14,2))
                              * 100) AS BIGINT)
                  FROM orders o WHERE o.o_custkey = c.c_custkey)
                   AS max_cents
          FROM customer c),
        whale AS (SELECT c_custkey FROM customer c
                  WHERE EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_totalprice > 400000)),
        nosmall AS (SELECT c_custkey FROM customer c
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_custkey = c.c_custkey
                                        AND o.o_totalprice < 20000))
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(w.c_custkey) AS BIGINT) AS n_whales,
               CAST(count(ns.c_custkey) AS BIGINT) AS n_never_small,
               CAST(sum(coalesce(max_cents, 0)) AS BIGINT)
                 AS sum_max_cents
        FROM base b JOIN nation ON b.c_nationkey = n_nationkey
        LEFT JOIN whale w ON w.c_custkey = b.c_custkey
        LEFT JOIN nosmall ns ON ns.c_custkey = b.c_custkey
        GROUP BY n_name ORDER BY n_name""")
    }),

    // BITEMPORAL SNAPSHOT AUDIT — the two-axis version question SCD2
    // (q130) and PIT lookup (q145) can't answer: "what did we BELIEVE
    // on Feb 1 about the state valid on Jan 1, and how did that
    // belief change by Jun 1?" Versions carry valid_from (when true)
    // AND tx_from (when recorded, md5-derived ≤ 180-day lag); each
    // snapshot is an argmax over valid time among versions RECORDED
    // by the transaction horizon. Both snapshots are FILTERed max_by
    // aggregates on ONE composite BIGINT key in ONE grouped pass —
    // no window, no self-join, and moving the transaction horizon is
    // a filter change, not a recompute. n_late_revisions counts parts
    // whose Jan-1 truth was revised by late-arriving data — the
    // number that justifies bitemporal bookkeeping at all.
    "q389_bitemporal_audit" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH v AS (
          SELECT l_partkey AS pk,
                 unix_timestamp(l_shipdate) AS valid_from,
                 unix_timestamp(l_shipdate) + 86400 *
                   (CAST(conv(substr(md5(concat('tx#',
                      CAST(l_orderkey AS STRING), '#',
                      CAST(l_linenumber AS STRING))), 1, 4), 16, 10)
                      AS BIGINT) % 180) AS tx_from,
                 CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                      AS BIGINT) AS cents,
                 l_orderkey * 10 + l_linenumber AS vid
          FROM lineitem),
        snap AS (
          SELECT pk,
                 max_by(cents, valid_from * 10000000 + vid % 10000000)
                   FILTER (WHERE valid_from <=
                       unix_timestamp(TIMESTAMP '1998-01-01')
                     AND tx_from <=
                       unix_timestamp(TIMESTAMP '1998-02-01'))
                   AS cents_t1,
                 max_by(cents, valid_from * 10000000 + vid % 10000000)
                   FILTER (WHERE valid_from <=
                       unix_timestamp(TIMESTAMP '1998-01-01')
                     AND tx_from <=
                       unix_timestamp(TIMESTAMP '1998-06-01'))
                   AS cents_t2
          FROM v GROUP BY pk)
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(count(cents_t1) AS BIGINT) AS n_known_t1,
               CAST(count(cents_t2) AS BIGINT) AS n_known_t2,
               CAST(sum(coalesce(cents_t2, 0)) AS BIGINT)
                 AS snapshot_cents,
               CAST(count_if(NOT (cents_t1 <=> cents_t2)) AS BIGINT)
                 AS n_late_revisions
        FROM snap""")
    }),

    // WEIGHTED MEDIAN — the survey-statistics quantile q141/q278
    // don't cover: the median priced UNIT (weight = quantity), not
    // the median line item — a fleet-pricing / cost-of-goods number
    // where heavy lines must count by volume. Exact integer
    // algorithm: collapse to (group, cents) cells with summed
    // weights, one cumulative window per group ordered by cents, and
    // the answer is the first cents where 2·cum ≥ total (type-1
    // weighted quantile — no interpolation, no doubles anywhere).
    // The window runs on the distinct-price cell frame, partitioned
    // by group.
    "q390_weighted_median" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH g AS (
          SELECT l_returnflag AS flag,
                 CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                      AS BIGINT) AS cents,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
          FROM lineitem GROUP BY 1, 2),
        c AS (
          SELECT flag, cents, wt,
                 CAST(sum(wt) OVER (PARTITION BY flag ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
                 CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT)
                   AS tot
          FROM g)
        SELECT flag, CAST(min(tot) AS BIGINT) AS total_weight,
               CAST(min(CASE WHEN 2 * cum >= tot THEN cents END)
                    AS BIGINT) AS weighted_median_cents
        FROM c GROUP BY flag ORDER BY flag""")
    }),

    // ABC CLASSIFICATION — the 80/95 cumulative-revenue-share split
    // behind inventory tiering (the single-axis sibling of q260's
    // Pareto frontier): parts ranked by revenue, classified by where
    // their INCLUSIVE cumulative share lands. Class boundaries are
    // integer cross-multiplications (cum·100 ≤ tot·80) — no share
    // division until the final basis-point report, which uses the
    // q261 half-up integer idiom. The global ordered window runs on
    // the |parts| rollup (dim-sized), not the corpus; ties break by
    // part key so both engines rank identically.
    "q391_abc_classification" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH rev AS (
          SELECT l_partkey AS pk,
                 CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                      * 100 AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem GROUP BY 1),
        c AS (
          SELECT pk, cents,
                 CAST(sum(cents) OVER (ORDER BY cents DESC, pk
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
                 CAST(sum(cents) OVER () AS BIGINT) AS tot
          FROM rev),
        cls AS (
          SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                      WHEN cum * 100 <= tot * 95 THEN 'B'
                      ELSE 'C' END AS abc,
                 cents, tot FROM c)
        SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(cents) AS BIGINT) AS class_cents,
               CAST((2 * sum(cents) * 10000 + min(tot))
                    DIV (2 * min(tot)) AS BIGINT) AS share_bp
        FROM cls GROUP BY 1 ORDER BY 1""")
    }),

    // DUPLICATE-CHARGE DETECTION — the billing-fraud audit: same
    // customer, same exact amount, charged twice within two days.
    // Ground truth is INJECTED (the q356 synthesize-then-detect
    // recipe): 1-in-97 orders get a clone a day later, and the
    // detector must find exactly that plant. The blocking insight:
    // (customer, exact cents) equality IS the block — the join is a
    // plain equi-join whose candidate set is near-empty on clean
    // data (real float prices almost never collide), so no banding
    // is needed and the date filter runs on a tiny frame. The charge
    // log is checkpointed once and self-joined.
    "q392_duplicate_charges" -> ((s, d) => {
      val base = ld(s, d, "orders").selectExpr(
        "o_orderkey AS ok", "o_custkey AS ck",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
          " AS cents",
        "unix_timestamp(o_orderdate) DIV 86400 AS day")
      val log = base.unionAll(base.filter(col("ok") % 97 === 0)
          .select((col("ok") * 1000000 + 1).as("ok"), col("ck"),
            col("cents"), (col("day") + 1).as("day")))
        .localCheckpoint()
      val a = log.select(col("ck"), col("cents"),
        col("ok").as("ok_a"), col("day").as("day_a"))
      val b = log.select(col("ck").as("ck_b"),
        col("cents").as("cents_b"), col("ok").as("ok_b"),
        col("day").as("day_b"))
      val p = a.join(b, col("ck") === col("ck_b") &&
          col("cents") === col("cents_b") &&
          col("ok_a") < col("ok_b"))
        .filter(abs(col("day_a") - col("day_b")) <= 2)
      val nCh = log.agg(count(lit(1)).as("n_charges"))
      p.agg(count(lit(1)).as("n_pairs"),
          countDistinct("ck").as("n_customers"),
          sum("cents").cast("long").as("dup_cents"))
        .crossJoin(broadcast(nCh))
        .select("n_pairs", "n_customers", "dup_cents", "n_charges")
    }),

    // HAAR ENERGY COMPACTION — three levels of the unnormalized Haar
    // transform over the dense daily-revenue series (the
    // signal-processing sibling of q327's OHLC and q328's
    // delta-encoding audits): per level, approximations are pairwise
    // SUMS and details pairwise DIFFERENCES, so the whole pyramid is
    // exact BIGINT arithmetic (dollars, not cents, keep the squared
    // detail energies under 2⁶³). Level energies tell a compression
    // planner how much signal survives each halving — the decision
    // number behind storing coarse aggregates + sparse corrections.
    // The dense 2048-day spine is checkpointed ONCE (2 KB); every
    // level is a k-keyed rollup of the level above, so no shuffle
    // ever exceeds the series length.
    "q393_haar_energy" -> ((s, d) => {
      val rev = ld(s, d, "orders").selectExpr(
          "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')" +
            " AS day",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
            " DIV 100 AS dollars")
        .groupBy("day").agg(sum("dollars").as("v"))
      s.sql("SELECT explode(sequence(0, 2047)) AS day")
        .join(rev, Seq("day"), "left").na.fill(0L, Seq("v"))
        .localCheckpoint()
        .createOrReplaceTempView("haar_series")
      s.sql("""
        WITH l1 AS (SELECT day DIV 2 AS k,
                      CAST(sum(CASE WHEN day % 2 = 0 THEN v ELSE -v
                               END) AS BIGINT) AS dt,
                      CAST(sum(v) AS BIGINT) AS ap
                    FROM haar_series GROUP BY 1),
        l2 AS (SELECT k DIV 2 AS k,
                 CAST(sum(CASE WHEN k % 2 = 0 THEN ap ELSE -ap END)
                      AS BIGINT) AS dt,
                 CAST(sum(ap) AS BIGINT) AS ap
               FROM l1 GROUP BY 1),
        l3 AS (SELECT k DIV 2 AS k,
                 CAST(sum(CASE WHEN k % 2 = 0 THEN ap ELSE -ap END)
                      AS BIGINT) AS dt,
                 CAST(sum(ap) AS BIGINT) AS ap
               FROM l2 GROUP BY 1)
        SELECT * FROM (
          SELECT 0 AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
                 CAST(sum(v * v) AS BIGINT) AS energy
          FROM haar_series
          UNION ALL SELECT 1, CAST(count(*) AS BIGINT),
                 CAST(sum(dt * dt) AS BIGINT) FROM l1
          UNION ALL SELECT 2, CAST(count(*) AS BIGINT),
                 CAST(sum(dt * dt) AS BIGINT) FROM l2
          UNION ALL SELECT 3, CAST(count(*) AS BIGINT),
                 CAST(sum(dt * dt) AS BIGINT) FROM l3)
        ORDER BY level""")
    }),

    // QQ DECILES — distribution-shift diagnosis by QUANTILE PAIRS
    // (where the shift lives), complementing q170's KS statistic (one
    // number saying whether it exists): exact type-1 deciles of two
    // priority classes side by side. The pick index ⌈q·n/10⌉ is the
    // integer (q·n + 9) DIV 10, row_number ties break by order key —
    // no interpolation, no percentile state, both engines pick the
    // IDENTICAL row. Windows partition by priority class (corpus-
    // partitioned); the decile join is against a 9-row literal range.
    "q395_qq_deciles" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH x AS (
          SELECT o_orderpriority AS p,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                      AS BIGINT) AS cents,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(14,2))
                            * 100 AS BIGINT), o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        qs AS (SELECT CAST(id AS BIGINT) AS q FROM range(1, 10)),
        picks AS (SELECT p, q, cents FROM x
                  JOIN qs ON rn = (q * n + 9) DIV 10)
        SELECT q,
               CAST(max(CASE WHEN p = '1-URGENT' THEN cents END)
                    AS BIGINT) AS qa_cents,
               CAST(max(CASE WHEN p = '5-LOW' THEN cents END)
                    AS BIGINT) AS qb_cents,
               CAST(max(CASE WHEN p = '1-URGENT' THEN cents END)
                    - max(CASE WHEN p = '5-LOW' THEN cents END)
                    AS BIGINT) AS diff_cents
        FROM picks GROUP BY q ORDER BY q""")
    }),

    // MAHALANOBIS OUTLIERS — bivariate outlier detection that the
    // univariate robust stats (q156 MAD, q150 winsorize) cannot do:
    // a tripled price at normal quantity is invisible marginally but
    // far outside the (quantity, price) covariance ellipse. Dirt is
    // INJECTED at 1-in-97 via a single-scan explode (each row emits
    // 1 or 2 copies — no second corpus pass for the plant). The 2×2
    // moments are EXACT INTEGER sums (dollars bound y² under 2⁶³), so
    // both engines derive bit-identical covariance doubles and the
    // closed-form inverse needs no linear algebra. Two corpus passes
    // total (moments, then score) — the correct trade at 100 TB
    // versus caching the corpus. The avg(m²) = 2.0 identity (trace
    // of the standardized covariance) is a built-in self-check.
    "q396_mahalanobis_outliers" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH b AS (
          SELECT CAST(l_quantity AS BIGINT) AS x,
                 (CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) DIV 100) * mult AS y
          FROM lineitem
          LATERAL VIEW explode(CASE WHEN l_orderkey % 97 = 0
            THEN array(1L, 3L) ELSE array(1L) END) t AS mult),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x*x) AS BIGINT) AS sxx,
                     CAST(sum(x*y) AS BIGINT) AS sxy,
                     CAST(sum(y*y) AS BIGINT) AS syy
              FROM b),
        c AS (SELECT n, CAST(sx AS DOUBLE)/n AS mx,
                     CAST(sy AS DOUBLE)/n AS my,
                     CAST(sxx AS DOUBLE)/n
                       - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n)
                       AS vxx,
                     CAST(sxy AS DOUBLE)/n
                       - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)
                       AS vxy,
                     CAST(syy AS DOUBLE)/n
                       - (CAST(sy AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)
                       AS vyy
              FROM m),
        dd AS (SELECT b.x, b.y, c.n,
                     ((b.x - mx)*(b.x - mx)*vyy
                       - 2*(b.x - mx)*(b.y - my)*vxy
                       + (b.y - my)*(b.y - my)*vxx)
                       / (vxx*vyy - vxy*vxy) AS m2
              FROM b CROSS JOIN c)
        SELECT CAST(min(n) AS BIGINT) AS n,
               CAST(count_if(round(m2, 6) > 9.21034) AS BIGINT)
                 AS n_outliers,
               round(avg(m2), 6) AS avg_m2
        FROM dd""")
    }),

    // LARGEST-REMAINDER APPORTIONMENT — allocate a fixed integer
    // capacity (1000 shard-slots) across priority classes in
    // proportion to revenue, the quota-assignment primitive behind
    // proportional samplers and partition budgeting (q180's
    // waterfill solves the CONTINUOUS version; this is the integer
    // one where naive rounding loses or invents slots). Hamilton's
    // method, fully integer: floor quotas via (capacity·cents) DIV
    // total, leftover slots to the largest remainders with a
    // deterministic priority tie-break — Σ seats = capacity EXACTLY,
    // by construction, at any scale. Everything after the one corpus
    // rollup runs on the |priorities| frame.
    "q400_largest_remainder" -> ((s, d) => {
      // One corpus scan: the |priorities| revenue frame is
      // checkpointed; CTE inlining would re-run the rollup for the
      // total, the floor quotas, and the remainder ranking.
      ld(s, d, "orders")
        .groupBy(col("o_orderpriority").as("p"))
        .agg(expr("CAST(sum(CAST(CAST(o_totalprice" +
          " AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT)")
          .as("cents"))
        .localCheckpoint()
        .createOrReplaceTempView("seat_rev")
      s.sql("""
        WITH rev AS (SELECT p, cents FROM seat_rev),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
        qf AS (SELECT p, cents, (1000 * cents) DIV t AS fl,
                      (1000 * cents) % t AS rem
               FROM rev CROSS JOIN tot),
        extra AS (SELECT CAST(1000 - sum(fl) AS BIGINT) AS e FROM qf),
        rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, p)
                 AS rr FROM qf)
        SELECT p, cents, CAST(fl AS BIGINT) AS floor_seats,
               CAST(fl + CASE WHEN rr <= e THEN 1 ELSE 0 END
                    AS BIGINT) AS seats
        FROM rk CROSS JOIN extra ORDER BY p""")
    }),

    // DECISION STUMP — the best single Gini split of quantity
    // predicting high-price lines, the depth-1 tree that seeds every
    // boosting/feature-importance pipeline. The scale insight: a
    // stump does NOT scan the corpus per candidate threshold — one
    // rollup to the |distinct x| value frame, one cumulative window,
    // and every threshold's left/right class counts fall out of the
    // prefix sums (the classic sorted-histogram split search).
    // Gini is evaluated in doubles from exact integer counts
    // (identical inputs ⇒ identical doubles), rounded at 1e-9 before
    // the argmin, threshold tie-break — both engines pick the same
    // split.
    "q401_gini_stump" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                     CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0
                     END AS y
                   FROM lineitem),
        tv AS (SELECT x AS xv, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(y) AS BIGINT) AS pos
               FROM b GROUP BY 1),
        cum AS (SELECT xv,
                  CAST(sum(n) OVER w AS BIGINT) AS nl,
                  CAST(sum(pos) OVER w AS BIGINT) AS pl,
                  CAST(sum(n) OVER () AS BIGINT) AS nt,
                  CAST(sum(pos) OVER () AS BIGINT) AS pt
                FROM tv
                WINDOW w AS (ORDER BY xv ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)),
        g AS (SELECT xv AS thr, nl, nt - nl AS nr, pl, pt - pl AS pr,
                (CAST(nl AS DOUBLE)/nt)
                  * (1.0 - (CAST(pl AS DOUBLE)/nl)
                           *(CAST(pl AS DOUBLE)/nl)
                         - (1.0-CAST(pl AS DOUBLE)/nl)
                           *(1.0-CAST(pl AS DOUBLE)/nl))
                + (CAST(nt-nl AS DOUBLE)/nt)
                  * (1.0 - (CAST(pt-pl AS DOUBLE)/(nt-nl))
                           *(CAST(pt-pl AS DOUBLE)/(nt-nl))
                         - (1.0-CAST(pt-pl AS DOUBLE)/(nt-nl))
                           *(1.0-CAST(pt-pl AS DOUBLE)/(nt-nl)))
                  AS gini_w
              FROM cum WHERE nl > 0 AND nt - nl > 0),
        r AS (SELECT *, row_number() OVER (ORDER BY round(gini_w, 9),
                thr) AS rk FROM g)
        SELECT CAST(thr AS BIGINT) AS best_threshold,
               CAST(nl AS BIGINT) AS n_left,
               CAST(nr AS BIGINT) AS n_right,
               CAST(pl AS BIGINT) AS pos_left,
               CAST(pr AS BIGINT) AS pos_right,
               round(gini_w, 6) AS gini
        FROM r WHERE rk = 1""")
    }),

    // ASSOCIATION RULES — support/confidence/lift over order baskets
    // (the metric layer on top of q174's frequent pairs): pair
    // supports from one basket self-join blocked by order key, item
    // supports and the transaction count derived from the SAME items
    // frame, confidence as half-up integer bp, lift in doubles from
    // exact counts. The honest finding on this corpus — lift ≈ 1
    // everywhere (baskets are independent draws) — is exactly what
    // the audit should report; the top-15 by confidence is still the
    // deterministic contract. Support pruning (≥ 100) happens at the
    // pair rollup, BEFORE the metric joins.
    "q402_association_rules" -> ((s, d) => {
      val items = ld(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          (col("l_partkey") % 20).as("it"))
        .distinct()
        .localCheckpoint() // pairs, supports, txn count share it
      val nt = items.select("ok").distinct()
        .agg(count(lit(1)).as("nt"))
      val sup = items.groupBy("it").agg(count(lit(1)).as("s"))
      val pairs = items.join(
          items.select(col("ok").as("ok2"), col("it").as("it2")),
          col("ok") === col("ok2") && col("it") < col("it2"))
        .groupBy(col("it").as("ia"), col("it2").as("ib"))
        .agg(count(lit(1)).as("sab"))
        .filter(col("sab") >= 100)
      pairs
        .join(broadcast(sup.select(col("it").as("ia"),
          col("s").as("s_a"))), "ia")
        .join(broadcast(sup.select(col("it").as("ib"),
          col("s").as("s_b"))), "ib")
        .crossJoin(broadcast(nt))
        .selectExpr("ia", "ib", "sab", "s_a", "s_b",
          "(2 * sab * 10000 + s_a) DIV (2 * s_a) AS conf_bp",
          "round((CAST(sab AS DOUBLE) * nt)" +
            " / (CAST(s_a AS DOUBLE) * s_b), 4) AS lift")
        // top-15 via TakeOrderedAndProject (r13): the rank column was
        // dropped anyway, so a global row_number window (single-partition
        // sort of the whole rule frame) buys nothing a distributed
        // top-k doesn't
        .orderBy(col("conf_bp").desc, col("ia"), col("ib")).limit(15)
        .select("ia", "ib", "sab", "s_a", "s_b", "conf_bp", "lift")
        .orderBy("ia", "ib")
    }),

    // POWER ANALYSIS — the sample-size planner that closes the
    // experimentation loop (q358 reduces variance, q363 bounds rates,
    // q370 stops early; this says how long to RUN): n per arm =
    // 2(z_α/2+z_β)²σ²/δ² at 95% confidence / 80% power for relative
    // MDEs of 1–5%. Variance comes from EXACT integer dollar moments
    // in one corpus pass (the q396 recipe — dollars keep Σy² under
    // 2⁶³); the z constants are literals; the MDE sweep is a 5-row
    // range against the one-row moment frame.
    "q404_power_analysis" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH v AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(CAST(o_totalprice
                          AS DECIMAL(14,2)) * 100 AS BIGINT)
                          DIV 100) AS BIGINT) AS s,
                     CAST(sum((CAST(CAST(o_totalprice
                          AS DECIMAL(14,2)) * 100 AS BIGINT) DIV 100)
                        * (CAST(CAST(o_totalprice
                          AS DECIMAL(14,2)) * 100 AS BIGINT)
                          DIV 100)) AS BIGINT) AS ss
                   FROM orders),
        p AS (SELECT n, CAST(s AS DOUBLE)/n AS mean,
                     (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n)
                       / (n - 1) AS var
              FROM v),
        mde AS (SELECT CAST(id AS BIGINT) AS pct FROM range(1, 6))
        SELECT pct, round(p.mean, 2) AS mean_dollars,
               CAST(ceil(2 * power(1.959963984540054
                    + 0.8416212335729143, 2) * p.var
                    / power(p.mean * pct / 100.0, 2)) AS BIGINT)
                 AS n_per_arm
        FROM p CROSS JOIN mde ORDER BY pct""")
    }),

    // INSTRUMENTAL VARIABLE (Wald) — the causal estimator for when
    // treatment UPTAKE is self-selected but an ENCOURAGEMENT was
    // randomized (the one confounding shape q368's DiD and q376's
    // Qini can't handle): LATE = ITT effect ÷ compliance delta.
    // Instrument and compliance are md5-synthesized (70/30 uptake by
    // arm), outcomes are exact cents; the whole estimator is FOUR
    // integer cells from one corpus pass — the 2×2 (z × Σx, Σy)
    // frame — and every division happens on that 2-row frame.
    "q405_iv_wald" -> ((s, d) => {
      // ONE corpus scan: the 2-row cell frame is checkpointed —
      // every scalar subquery below would otherwise re-derive it
      // from orders (9 scans, measured before this pin).
      ld(s, d, "orders").selectExpr(
          "CAST(conv(substr(md5(concat('z#'," +
            " CAST(o_custkey AS STRING))), 1, 4), 16, 10)" +
            " AS BIGINT) % 2 AS z",
          "CAST(conv(substr(md5(concat('c#'," +
            " CAST(o_orderkey AS STRING))), 1, 4), 16, 10)" +
            " AS BIGINT) % 100 AS u",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100" +
            " AS BIGINT) AS cents")
        .selectExpr("z",
          "CASE WHEN (z = 1 AND u < 70) OR (z = 0 AND u < 30)" +
            " THEN 1 ELSE 0 END AS x", "cents")
        .groupBy("z")
        .agg(count(lit(1)).as("n"), sum("x").cast("long").as("sx"),
          sum("cents").cast("long").as("sc"))
        .localCheckpoint()
        .createOrReplaceTempView("iv_cells")
      s.sql("""
        WITH cells AS (SELECT z, n, sx, sc FROM iv_cells)
        SELECT round((SELECT CAST(sc AS DOUBLE)/n FROM cells
                      WHERE z=1)
                   - (SELECT CAST(sc AS DOUBLE)/n FROM cells
                      WHERE z=0), 2) AS itt_cents,
               round((SELECT CAST(sx AS DOUBLE)/n FROM cells
                      WHERE z=1)
                   - (SELECT CAST(sx AS DOUBLE)/n FROM cells
                      WHERE z=0), 6) AS compliance_delta,
               round(((SELECT CAST(sc AS DOUBLE)/n FROM cells
                       WHERE z=1)
                    - (SELECT CAST(sc AS DOUBLE)/n FROM cells
                       WHERE z=0))
                   / ((SELECT CAST(sx AS DOUBLE)/n FROM cells
                       WHERE z=1)
                    - (SELECT CAST(sx AS DOUBLE)/n FROM cells
                       WHERE z=0)), 2) AS late_cents,
               (SELECT CAST(sum(n) AS BIGINT) FROM cells)
                 AS n_orders""")
    }),

    // CHANGEPOINT (binary segmentation, one split) — the best
    // single break in the weekly revenue series by SSE reduction,
    // the level-shift detector beside q235's CUSUM (which flags
    // drift against a FIXED baseline; this finds the optimal split
    // point): prefix sums of y and y² make every candidate split's
    // two-segment SSE a closed form — one window pass over the
    // ~340-week frame, no per-split rescan (the q401 stump recipe in
    // regression form). Minimum segment length 8 excludes the
    // degenerate edge splits every real changepoint package also
    // guards against; argmin rounds at 1e-6 with week tie-break.
    // The honest finding — var_explained ≈ 1% — says this series
    // has NO strong break, which is the audit's answer.
    "q407_changepoint" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH wk AS (
          SELECT datediff(CAST(o_orderdate AS DATE),
                          DATE '1995-01-01') DIV 7 AS w,
                 CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                      * 100 AS BIGINT) DIV 100) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        cum AS (SELECT w, y,
                  CAST(sum(y) OVER o AS BIGINT) AS cy,
                  CAST(sum(y*y) OVER o AS BIGINT) AS cy2,
                  CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS i,
                  CAST(sum(y) OVER () AS BIGINT) AS ty,
                  CAST(sum(y*y) OVER () AS BIGINT) AS ty2,
                  CAST(count(*) OVER () AS BIGINT) AS nt
                FROM wk
                WINDOW o AS (ORDER BY w ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)),
        sse AS (SELECT w, i, nt,
                  (CAST(cy2 AS DOUBLE) - CAST(cy AS DOUBLE)*cy/i)
                  + (CAST(ty2-cy2 AS DOUBLE)
                     - CAST(ty-cy AS DOUBLE)*(ty-cy)/(nt-i)) AS sse2,
                  CAST(ty2 AS DOUBLE) - CAST(ty AS DOUBLE)*ty/nt
                    AS sse1
                FROM cum WHERE i >= 8 AND i <= nt - 8),
        r AS (SELECT *, row_number() OVER (ORDER BY round(sse2, 6),
                w) AS rk FROM sse)
        SELECT CAST(w AS BIGINT) AS changepoint_week,
               CAST(i AS BIGINT) AS n_left,
               CAST(nt - i AS BIGINT) AS n_right,
               round(sse1, 2) AS sse_nosplit,
               round(sse2, 2) AS sse_split,
               round(1.0 - sse2 / sse1, 6) AS var_explained
        FROM r WHERE rk = 1""")
    }),

    // MERKLE DIVERGENCE LOCATION — anti-entropy repair between two
    // table replicas (one with a planted 1-in-4999 divergence): q173
    // proves WHETHER tables differ in one digest; this finds WHERE,
    // the way Cassandra/Dynamo repair does — compare coarse 512-key
    // range digests, drill 64-key digests ONLY into mismatched
    // ranges, fetch rows only from mismatched fine ranges. Digests
    // are order-independent integer sums of md5 words, so each level
    // is one map-side-combined rollup; the drill-down predicate is a
    // broadcast semi-join of the tiny mismatch list. Probed-vs-
    // possible (27 of 235 fine buckets here) is the audit's
    // bandwidth-saving number.
    "q408_merkle_repair" -> ((s, d) => {
      // One parquet scan: replica B's plant derives from the same
      // frame; both digest levels and the row fetch branch off the
      // checkpointed (k, v_a, v_b) pair frame.
      val pair = ld(s, d, "orders").selectExpr(
          "o_orderkey AS k",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
            " AS va")
        .selectExpr("k", "va",
          "CASE WHEN k % 4999 = 0 THEN va + 1 ELSE va END AS vb")
        .selectExpr("k", "va", "vb",
          "CAST(conv(substr(md5(concat(CAST(k AS STRING), '#'," +
            " CAST(va AS STRING))), 1, 8), 16, 10) AS BIGINT) AS ha",
          "CAST(conv(substr(md5(concat(CAST(k AS STRING), '#'," +
            " CAST(vb AS STRING))), 1, 8), 16, 10) AS BIGINT) AS hb")
        .localCheckpoint()
      pair.createOrReplaceTempView("merkle_pair")
      s.sql("""
        WITH l1 AS (SELECT k DIV 512 AS b1,
                      CAST(sum(ha) AS BIGINT) AS da,
                      CAST(sum(hb) AS BIGINT) AS db
                    FROM merkle_pair GROUP BY 1),
        m1 AS (SELECT b1 FROM l1 WHERE da <> db),
        l2 AS (SELECT k DIV 64 AS b2,
                 CAST(sum(ha) AS BIGINT) AS da,
                 CAST(sum(hb) AS BIGINT) AS db
               FROM merkle_pair
               WHERE k DIV 512 IN (SELECT b1 FROM m1) GROUP BY 1),
        m2 AS (SELECT b2 FROM l2 WHERE da <> db),
        rows_div AS (SELECT k FROM merkle_pair
                     WHERE va <> vb
                       AND k DIV 64 IN (SELECT b2 FROM m2))
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM l1)
                 AS n_l1_buckets,
               (SELECT CAST(count(*) AS BIGINT) FROM m1)
                 AS n_l1_mismatch,
               (SELECT CAST(count(*) AS BIGINT) FROM l2)
                 AS n_l2_probed,
               (SELECT CAST(count(*) AS BIGINT) FROM m2)
                 AS n_l2_mismatch,
               (SELECT CAST(count(*) AS BIGINT) FROM rows_div)
                 AS n_rows_diverged""")
    }),

    // RANK-WINDOW SUITE — percent_rank / cume_dist / ntile, the three
    // normalized-position window functions the window family (q28,
    // q58, q244) had not yet exercised: quartile the price
    // distribution per return flag with ntile(4) under a TOTAL order
    // (cents, orderkey, linenumber — ntile assigns by position, so
    // the order must be tie-free for cross-engine determinism), and
    // report each quartile's bounds plus the exact-rational
    // percent_rank/cume_dist aggregates. One scan, windows partition
    // by flag, output is the 12-row quartile frame.
    "q409_rank_window_suite" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        WITH x AS (
          SELECT l_returnflag AS flag,
                 CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                      AS BIGINT) AS cents,
                 percent_rank() OVER w AS pr,
                 cume_dist() OVER w AS cd,
                 ntile(4) OVER w AS nt
          FROM lineitem
          WINDOW w AS (PARTITION BY l_returnflag
                       ORDER BY CAST(CAST(l_extendedprice
                                AS DECIMAL(14,2)) * 100 AS BIGINT),
                                l_orderkey, l_linenumber))
        SELECT flag, nt, CAST(count(*) AS BIGINT) AS n,
               CAST(min(cents) AS BIGINT) AS min_cents,
               CAST(max(cents) AS BIGINT) AS max_cents,
               round(avg(pr), 6) AS avg_pr,
               round(max(cd), 6) AS max_cd
        FROM x GROUP BY 1, 2 ORDER BY 1, 2""")
    }),

    // GRAPH MODULARITY — does the co-supply graph's community
    // structure follow supplier NATIONS? Q = Σ_c (e_c/m − (d_c/2m)²)
    // over the top-5% strongest co-supply edges (RANK-thresholded —
    // shared-part counts scale with sf, a fixed cutoff wouldn't
    // survive a 10× corpus; the rank rule is scale-free and
    // tie-broken). The honest finding — Q ≈ −0.03, nations explain
    // NOTHING about who co-supplies — is the audit's answer, the
    // baseline a real community detector (q208's label propagation)
    // must beat. Edge and community frames are checkpointed (both
    // ≤ |edges| rows); all modularity math runs on the
    // |communities| frame.
    "q410_graph_modularity" -> ((s, d) => {
      val co = ld(s, d, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      val pairs = co.join(co.select(col("p").as("p2"),
          col("s").as("s2")),
          col("p") === col("p2") && col("s") < col("s2"))
        .groupBy(col("s").as("u"), col("s2").as("v"))
        .agg(count(lit(1)).as("shared"))
      // top-5 % selection WITHOUT a global single-partition window (r13):
      // the old row_number() over (shared desc, u, v) pushed the whole
      // pair frame through ONE task — the q141/q209 two-stage rank
      // applies instead. Stage 1: per-DISTINCT-shared-value counts (a
      // |distinct counts|-sized frame — a global window THERE is bounded
      // and broadcastable at any corpus size) give each value its
      // preceding-pairs offset and the total. Stage 2: the fine
      // row_number runs PARTITIONED BY shared (keyed shuffle), tie order
      // (u, v) as before; global rank = offset + within-value rank.
      // Selection is bit-identical to the old global sort.
      // Inline two-stage (not Ranks.stagedGlobalRank): the helper PINS
      // its input, and checkpointing the full pair frame costs more than
      // the rank saves (measured 1.1 → 3.2 s). Here the bucket-offset
      // table also carries the cutoff, so buckets entirely past the top
      // 5 % drop AT THE BROADCAST JOIN (a map-side filter) and the fine
      // window shuffles only the ~5 % of survivors — the pair frame is
      // derived twice (counts pass + filtered pass), which at 100 TB is
      // two scans instead of one materialization + one global sort.
      val vc = pairs.groupBy("shared").agg(count(lit(1)).as("nv"))
      val off = vc
        .withColumn("before", coalesce(sum("nv").over(
          Window.orderBy(col("shared").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("k",
          expr("(sum(nv) OVER (PARTITION BY 1) + 19) DIV 20"))
        .filter(col("before") < col("k")) // bucket straddles/below cutoff
        .select("shared", "before", "k")
      val wuv = Window.partitionBy("shared").orderBy("u", "v")
      // r15 (§2.6): no eager pin on e — it has exactly ONE consumer
      // (comm), so the pin bought nothing and cost one extra action +
      // one block write/read of the edge frame; comm's own checkpoint
      // (4 SQL consumers) now covers the whole chain in one action.
      val e = pairs.join(broadcast(off), "shared")
        .withColumn("r", col("before") + row_number().over(wuv))
        .filter(col("r") <= col("k"))
        .select("u", "v")
      val sup = ld(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val comm = e
        .join(broadcast(sup.select(col("s_suppkey").as("u"),
          col("s_nationkey").as("cu"))), "u")
        .join(broadcast(sup.select(col("s_suppkey").as("v"),
          col("s_nationkey").as("cv"))), "v")
        .localCheckpoint()
      comm.createOrReplaceTempView("mod_comm")
      s.sql("""
        WITH m AS (SELECT CAST(count(*) AS BIGINT) AS m
                   FROM mod_comm),
        din AS (SELECT cu AS c, CAST(count_if(cu = cv) AS BIGINT)
                  AS e_in
                FROM mod_comm GROUP BY 1),
        deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM (
                  SELECT cu AS c FROM mod_comm
                  UNION ALL SELECT cv FROM mod_comm) GROUP BY 1)
        SELECT (SELECT m FROM m) AS n_edges,
               CAST(count(*) AS BIGINT) AS n_communities,
               round(sum(CAST(coalesce(e_in, 0) AS DOUBLE)
                       / (SELECT m FROM m)
                     - (CAST(d AS DOUBLE) / (2 * (SELECT m FROM m)))
                       * (CAST(d AS DOUBLE)
                          / (2 * (SELECT m FROM m)))), 6)
                 AS modularity
        FROM deg LEFT JOIN din ON deg.c = din.c""")
    }),

    // NEGATIVE-BINOMIAL FIT — overdispersion diagnosis of per-
    // customer order counts by method of moments: a Poisson process
    // has variance = mean; real purchase counts overdisperse, and
    // the NB(r, p) parameters (r = μ²/(σ²−μ), p = μ/σ²) tell a
    // simulator/forecaster what to actually sample from. One keyed
    // rollup to per-customer counts, one EXACT integer moment pass
    // (k ≤ ~10³ keeps Σk² trivially in range), closed form on the
    // 1-row frame; NULL when the data is under-dispersed (the
    // estimator's own validity condition, encoded, not papered
    // over).
    "q411_negbin_fit" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
                   FROM orders GROUP BY 1),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(k) AS BIGINT) AS s,
                     CAST(sum(k*k) AS BIGINT) AS ss FROM k),
        p AS (SELECT n, CAST(s AS DOUBLE)/n AS mean,
                     (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n)
                       /(n-1) AS var
              FROM m)
        SELECT n, round(mean, 6) AS mean_orders,
               round(var, 6) AS var_orders,
               round(var / mean, 6) AS dispersion,
               round(CASE WHEN var > mean
                     THEN mean * mean / (var - mean) END, 6) AS nb_r,
               round(CASE WHEN var > mean THEN mean / var END, 6)
                 AS nb_p
        FROM p""")
    }),

    // MRR WATERFALL — the SaaS revenue-motion decomposition: each
    // month's revenue change split into new / expansion /
    // contraction / flat / churn per customer, where CHURN rows
    // must be GENERATED for the month the customer went absent
    // (lead()-gap detection — absence has no row to classify). The
    // month×customer frame is checkpointed once; both the active
    // classification and the churn generation branch off it, and the
    // waterfall rollup is |months|×5 rows. Exact cents; gaps longer
    // than a month produce churn-then-new, which is the correct
    // motion semantics.
    "q412_mrr_waterfall" -> ((s, d) => {
      val wu = Window.partitionBy("ck").orderBy("m")
      val span = ld(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
        .groupBy(col("o_custkey").as("ck"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("m"))
        .agg(expr("CAST(sum(CAST(CAST(o_totalprice" +
          " AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT)")
          .as("rev"))
        .withColumn("prev_m", lag("m", 1).over(wu))
        .withColumn("prev_rev", lag("rev", 1).over(wu))
        .withColumn("next_m", lead("m", 1).over(wu))
        .localCheckpoint() // active + churn branches share it
      span.createOrReplaceTempView("mrr_span")
      s.sql("""
        WITH maxm AS (SELECT max(m) AS mm FROM mrr_span),
        active AS (
          SELECT m, CASE WHEN prev_m IS NULL OR prev_m < m - 1
                         THEN 'new'
                         WHEN rev > prev_rev THEN 'expansion'
                         WHEN rev < prev_rev THEN 'contraction'
                         ELSE 'flat' END AS bucket,
                 rev - CASE WHEN prev_m = m - 1 THEN prev_rev
                            ELSE 0 END AS delta
          FROM mrr_span),
        churn AS (
          SELECT m + 1 AS m, 'churn' AS bucket, -rev AS delta
          FROM mrr_span CROSS JOIN maxm
          WHERE (next_m IS NULL AND m < mm) OR next_m > m + 1),
        flows AS (SELECT * FROM active UNION ALL SELECT * FROM churn)
        SELECT CAST(m AS BIGINT) AS m, bucket,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(delta) AS BIGINT) AS delta_cents
        FROM flows GROUP BY 1, 2 ORDER BY 1, 2""")
    }),

    // SIMPSON'S PARADOX DETECTOR — does the pooled price~quantity
    // association survive stratification by nation? The classic
    // aggregation trap (q347's grouping provenance tells you WHAT was
    // pooled; this tells you whether pooling LIED): per-stratum
    // association sign from the EXACT integer covariance numerator
    // n·Σxy − Σx·Σy (no division, no doubles, no rounding anywhere —
    // sign comparisons on BIGINTs whose magnitudes stay under 10¹⁸
    // through sf0.1), compared against the pooled sign derived from
    // the SAME per-stratum sums. One fact scan through broadcast
    // dims, then everything runs on the |nations| frame. Finding
    // here: ~half the strata disagree with the pooled sign — the
    // association is noise, and a pooled-only report would invent
    // one.
    "q413_simpson_paradox" -> ((s, d) => {
      val cells = ld(s, d, "lineitem")
        .join(ld(s, d, "orders")
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(ld(s, d, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          col("l_quantity").cast("long").as("x"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100" +
            " AS BIGINT) DIV 100").as("y"))
        .groupBy("nk")
        .agg(count(lit(1)).as("n"), sum("x").cast("long").as("sx"),
          sum("y").cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"))
        .localCheckpoint() // pooled + per-stratum signs share it
      cells.createOrReplaceTempView("simpson_cells")
      s.sql("""
        WITH pooled AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                               CAST(sum(sx) AS BIGINT) AS sx,
                               CAST(sum(sy) AS BIGINT) AS sy,
                               CAST(sum(sxy) AS BIGINT) AS sxy
                        FROM simpson_cells),
        sg AS (SELECT nk, CASE WHEN n*sxy - sx*sy > 0 THEN 1
                               WHEN n*sxy - sx*sy < 0 THEN -1
                               ELSE 0 END AS sgn
               FROM simpson_cells),
        ps AS (SELECT CASE WHEN n*sxy - sx*sy > 0 THEN 1
                           WHEN n*sxy - sx*sy < 0 THEN -1
                           ELSE 0 END AS psgn
               FROM pooled)
        SELECT (SELECT psgn FROM ps) AS pooled_sign,
               CAST(count(*) AS BIGINT) AS n_strata,
               CAST(count_if(sgn = (SELECT psgn FROM ps)) AS BIGINT)
                 AS n_agree,
               CAST(count_if(sgn <> (SELECT psgn FROM ps)) AS BIGINT)
                 AS n_flip
        FROM sg""")
    }),

    // MASE — forecast-quality floor for the weekly revenue series:
    // is a SEASONAL naive (lag-52) better than plain naive (lag-1)?
    // MASE < 1 says yes; the honest answer here is ~1.04 — this
    // series has no annual seasonality worth a model, which is the
    // result a forecasting pipeline needs BEFORE fitting anything.
    // Exact integer absolute errors on the ~340-week frame (both
    // "models" are lags — one ordered window pass), one division at
    // the end.
    "q414_mase_forecast" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH wk AS (SELECT datediff(CAST(o_orderdate AS DATE),
                             DATE '1995-01-01') DIV 7 AS w,
                      CAST(sum(CAST(CAST(o_totalprice
                           AS DECIMAL(14,2)) * 100 AS BIGINT)
                           DIV 100) AS BIGINT) AS y
                    FROM orders GROUP BY 1),
        f AS (SELECT w, y, lag(y, 1) OVER (ORDER BY w) AS naive,
                     lag(y, 52) OVER (ORDER BY w) AS snaive
              FROM wk),
        e AS (SELECT abs(y - naive) AS e1, abs(y - snaive) AS e52
              FROM f WHERE naive IS NOT NULL AND snaive IS NOT NULL)
        SELECT CAST(count(*) AS BIGINT) AS n_weeks,
               CAST(sum(e1) AS BIGINT) AS mae_naive_sum,
               CAST(sum(e52) AS BIGINT) AS mae_seasonal_sum,
               round(CAST(sum(e52) AS DOUBLE) / sum(e1), 6) AS mase
        FROM e""")
    }),

    // HUBER M-ESTIMATOR — the robust mean between q156's MAD-reject
    // (discards outliers entirely) and the plain mean (lets them
    // dominate): three IRLS rounds of winsorizing-at-1.345·MAD
    // around the previous center. Each round is ONE corpus pass
    // against a broadcast 1-row (center, scale) frame — the CTE
    // chain re-derives the projection per round, which IS the
    // iterative algorithm's cost (rounds of passes, like q131; you
    // don't checkpoint a 100 TB corpus to save a scan). Center/MAD
    // seed from percentile_cont (the q366-proven DuckDB
    // quantile_cont pair); dollars keep everything in exact range
    // until the per-round division.
    "q415_huber_mean" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH y AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2))
                        * 100 AS BIGINT) DIV 100 AS y FROM orders),
        med AS (SELECT CAST(percentile_cont(0.5)
                       WITHIN GROUP (ORDER BY y) AS DOUBLE) AS m0
                FROM y),
        mad AS (SELECT CAST(percentile_cont(0.5)
                       WITHIN GROUP (ORDER BY abs(y - m0))
                       AS DOUBLE) AS s
                FROM y CROSS JOIN med),
        r1 AS (SELECT sum(CASE WHEN abs(y - m0) <= 1.345 * s THEN y
                          ELSE m0 + sign(y - m0) * 1.345 * s END)
                      / count(*) AS mu
               FROM y CROSS JOIN med CROSS JOIN mad),
        r2 AS (SELECT sum(CASE WHEN abs(y - mu) <= 1.345 * s THEN y
                          ELSE mu + sign(y - mu) * 1.345 * s END)
                      / count(*) AS mu
               FROM y CROSS JOIN r1 CROSS JOIN mad),
        r3 AS (SELECT sum(CASE WHEN abs(y - mu) <= 1.345 * s THEN y
                          ELSE mu + sign(y - mu) * 1.345 * s END)
                      / count(*) AS mu
               FROM y CROSS JOIN r2 CROSS JOIN mad)
        SELECT round((SELECT m0 FROM med), 2) AS median_dollars,
               round((SELECT s FROM mad), 2) AS mad_dollars,
               round((SELECT mu FROM r1), 2) AS huber_r1,
               round((SELECT mu FROM r3), 2) AS huber_r3,
               round((SELECT avg(CAST(y AS DOUBLE)) FROM y), 2)
                 AS plain_mean""")
    }),

    // LTV CURVE — cumulative revenue per customer by cohort age,
    // the unit-economics readout built on q138's retention cohorts
    // (retention says who's still here; LTV says what they're
    // WORTH): cohort = first-order month, the per-cohort cumulative
    // window runs on the |cohorts|×|ages| rollup, and per-customer
    // LTV divides by the FIXED cohort size (not survivors — the
    // standard definition, so the curve flattens as churn bites).
    // Exact cents; floor division for the per-customer figure.
    "q416_ltv_curve" -> ((s, d) => {
      // first-order month and monthly revenue derive from ONE
      // grouped pass each over the same scan lineage; fo is
      // customer-sized and checkpointed (joined twice: ages + sizes).
      val fo = ld(s, d, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(min(year(col("o_orderdate")) * 12 +
          month(col("o_orderdate"))).as("cohort"))
        .localCheckpoint()
      val mo = ld(s, d, "orders")
        .groupBy(col("o_custkey").as("ck2"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("m"))
        .agg(expr("CAST(sum(CAST(CAST(o_totalprice" +
          " AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT)")
          .as("rev"))
      val cs = fo.groupBy("cohort").agg(count(lit(1)).as("cohort_n"))
      val wc = Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      mo.join(fo, col("ck2") === col("ck"))
        .select(col("cohort"), (col("m") - col("cohort")).as("age"),
          col("rev"))
        .groupBy("cohort", "age").agg(sum("rev").as("rev"))
        .withColumn("cum_rev", sum("rev").over(wc).cast("long"))
        .join(broadcast(cs), "cohort")
        .filter(col("cohort").between(23941, 23952) &&
          col("age") <= 12)
        .selectExpr("cohort", "age", "cum_rev", "cohort_n",
          "CAST(cum_rev DIV cohort_n AS BIGINT) AS ltv_per_customer")
        .orderBy("cohort", "age")
    }),

    // IN-ENGINE LOGISTIC REGRESSION — four Newton/IRLS rounds
    // training a one-feature quality classifier, the trainable rung
    // above q163's fixed-threshold gates: each round is ONE corpus
    // pass computing the 5 sufficient sums (gradient + Hessian)
    // against the BROADCAST 1-row coefficient frame, and the 2×2
    // Newton solve is a closed-form projection on that 1-row frame.
    // The per-round coefficients are localCheckpoint-pinned — a pure
    // CTE chain re-expands the corpus subtree per reference (first
    // cut measured 18 parquet scans for 4 rounds; checkpointing the
    // 1-ROW frames, never the corpus, collapses it to the honest 5).
    // The label is a PLANTED noisy monotone rule (md5 noise, the
    // q392 recipe), so the audit has ground truth: the trainer must
    // recover β ≈ (−4.43, 11.95) at round 4. Verified
    // reorder-stable to 1e-7 (sum-order drift contracts through
    // Newton); coefficients reported at 1e-4, accuracy as exact
    // integers. Five corpus passes IS the iterative algorithm's
    // honest cost (q131 stance) — you don't cache a 100 TB corpus
    // to save scans.
    "q418_logistic_irls" -> ((s, d) => {
      // (x, y) pinned ONCE (r15): the md5 label derivation is the
      // expensive per-row work, and the 4 IRLS rounds + accuracy pass
      // re-ran it 6× unpinned (guide §1.2 "don't compute things you
      // throw away"). The pinned frame is 2 doubles/row — smaller than
      // the source scan at any scale; production would persist the
      // design matrix the same way before an iterative fit.
      val b = ld(s, d, "lineitem").selectExpr(
        "CAST(l_quantity AS DOUBLE) / 50 AS x",
        """CASE WHEN CAST(l_quantity AS BIGINT)
              + CAST(conv(substr(md5(concat('n#',
                  CAST(l_orderkey AS STRING), '#',
                  CAST(l_linenumber AS STRING))), 1, 4),
                  16, 10) AS BIGINT) % 25 > 30
             THEN 1.0D ELSE 0.0D END AS y""")
        .localCheckpoint()
      var coef = s.sql("SELECT 0.0D AS b0, 0.0D AS b1").localCheckpoint()
      for (_ <- 1 to 4) {
        coef = b.crossJoin(broadcast(coef))
          .groupBy("b0", "b1")
          .agg(
            expr("sum(y - 1/(1+exp(-(b0 + b1*x))))").as("g0"),
            expr("sum(x*(y - 1/(1+exp(-(b0 + b1*x)))))").as("g1"),
            expr("sum((1/(1+exp(-(b0+b1*x))))" +
              "*(1-1/(1+exp(-(b0+b1*x)))))").as("w00"),
            expr("sum(x*(1/(1+exp(-(b0+b1*x))))" +
              "*(1-1/(1+exp(-(b0+b1*x)))))").as("w01"),
            expr("sum(x*x*(1/(1+exp(-(b0+b1*x))))" +
              "*(1-1/(1+exp(-(b0+b1*x)))))").as("w11"))
          .selectExpr(
            "b0 + (w11*g0 - w01*g1)/(w00*w11 - w01*w01) AS b0",
            "b1 + (w00*g1 - w01*g0)/(w00*w11 - w01*w01) AS b1")
          .localCheckpoint()
      }
      val acc = b.crossJoin(broadcast(coef)).agg(
          expr("CAST(count_if((1/(1+exp(-(b0 + b1*x))) >= 0.5)" +
            " = (y = 1.0D)) AS BIGINT)").as("n_correct"),
          expr("CAST(count(*) AS BIGINT)").as("n"))
        .localCheckpoint()
      coef.crossJoin(acc).selectExpr(
        "round(b0, 4) AS beta0", "round(b1, 4) AS beta1",
        "n_correct", "n")
    }),

    // LIKE QUANTIFIERS — Spark's LIKE ALL / LIKE ANY multi-pattern
    // predicates (the parser surface, not just the semantics: the
    // quantified form is what a generated WHERE clause emits when a
    // filter UI hands it N patterns), plus NOT LIKE and RLIKE in the
    // same pass. The oracle proves the QUANTIFIER rewrite — DuckDB
    // has no LIKE ALL/ANY, so it states the conjunction/disjunction
    // explicitly, and the counts must match exactly. One dimension
    // scan, four codegen'd predicates, one row out.
    "q420_like_quantifiers" -> ((s, d) => {
      graft.Tables.view(s, d, "part")
      s.sql("""
        SELECT CAST(count_if(p_name LIKE ALL ('%bolt%', 'c%'))
                 AS BIGINT) AS n_like_all,
               CAST(count_if(p_name LIKE ANY ('%bolt%', '%gear%'))
                 AS BIGINT) AS n_like_any,
               CAST(count_if(p_name NOT LIKE '%o%') AS BIGINT)
                 AS n_not_like,
               CAST(count_if(p_name RLIKE '^(red|blue) (bolt|gear)$')
                 AS BIGINT) AS n_rlike
        FROM part""")
    }),

    // ONE-WAY ANOVA F — does order value differ by priority class?
    // The parametric counterpart of q426's rank test, kept EXACT the
    // whole way: the between/total sum-of-squares identities clear
    // means by integer division (SSB = Σ⌊S_g²/n_g⌋ − ⌊S²/N⌋,
    // truncation < k units² on e15-scale values, identical in both
    // engines), and F and η² come out as half-up e6/bp integers in
    // DECIMAL(38,0) — no doubles, no libm, nothing order-dependent.
    // y is WHOLE DOLLARS, not cents: Spark's decimal DIV converts
    // the quotient through a long, and the cents-scale ⌊S²/N⌋ ≈
    // 9.4e18 crosses Long.Max and WRAPS NEGATIVE (found live: sst
    // came out bigger than Σy²; DuckDB's HUGEINT // is immune).
    // Dollar-scale quotients stay ~1e15 at sf0.1 with headroom to
    // ~sf1000. One map-side combined rollup to a 5-row frame;
    // everything after is 1-row math.
    "q427_anova_f" -> ((s, d) => {
      val g = ld(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100" +
            " AS BIGINT) DIV 100").as("y"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_g"),
          sum(col("y").cast("decimal(38,0)")).as("s_g"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("ss_g"))
      g.agg(sum("n_g").as("n"), count(lit(1)).as("k"),
          sum("s_g").as("s"), sum("ss_g").as("ss"),
          // quotients re-enter DECIMAL(38,0) immediately: summed and
          // rescaled by 2·(n−k)·10⁶ below, they overflow BIGINT
          sum(expr("CAST((s_g * s_g) DIV n_g AS DECIMAL(38,0))"))
            .as("sb_raw"))
        .selectExpr("n", "k",
          "ss - CAST((s * s) DIV n AS DECIMAL(38,0)) AS sst",
          "sb_raw - CAST((s * s) DIV n AS DECIMAL(38,0)) AS ssb")
        .selectExpr("n", "k",
          "CAST(sst AS STRING) AS sst_d2",
          "CAST(ssb AS STRING) AS ssb_d2",
          "CAST((2 * ssb * (n - k) * 1000000 + (sst - ssb) * (k - 1))" +
            " DIV (2 * (sst - ssb) * (k - 1)) AS BIGINT) AS f_e6",
          "CAST((2 * ssb * 10000 + sst) DIV (2 * sst) AS BIGINT)" +
            " AS eta2_bp")
    }),

    // BOOLEAN + BITWISE AGGREGATES — the last aggregate-surface
    // corner q366's ordered-set family left open: bool_and/bool_or,
    // the ANSI `every` synonym, and the bit_and/bit_or/bit_xor
    // lattice aggregates (bit_xor is the q173/q298 checksum
    // primitive as a FIRST-CLASS aggregate here). The oracle proves
    // the synonym rewrite — DuckDB has no `every`, so it states
    // bool_and — and the bit lattice exactly. One scan, one
    // map-side-combined rollup.
    "q433_bool_bit_aggs" -> ((s, d) => {
      graft.Tables.view(s, d, "lineitem")
      s.sql("""
        SELECT l_returnflag,
               bool_and(CAST(l_quantity AS BIGINT) > 1)
                 AS all_qty_gt1,
               bool_or(CAST(l_quantity AS BIGINT) > 49)
                 AS any_qty_gt49,
               every(CAST(l_discount AS DOUBLE) >= 0)
                 AS every_disc_nonneg,
               bit_and(CAST(l_quantity AS BIGINT)) AS qty_bit_and,
               bit_or(CAST(l_quantity AS BIGINT)) AS qty_bit_or,
               bit_xor(CAST(l_quantity AS BIGINT)) AS qty_bit_xor,
               CAST(count_if(CAST(l_quantity AS BIGINT) % 2 = 0)
                 AS BIGINT) AS n_even
        FROM lineitem GROUP BY 1 ORDER BY 1""")
    }),

    // LATERAL COLUMN ALIASES — a SELECT item referencing an alias
    // defined earlier in the SAME select list (cents → dollars →
    // k-dollar bucket), the generated-SQL surface (Spark 3.4+) that
    // otherwise needs nested subqueries. The chain lives in the
    // inner SELECT; the rollup on top proves the aliases resolve to
    // the same values DuckDB computes (DuckDB resolves lateral
    // aliases natively too — the oracle is near-verbatim). Still
    // one scan + one aggregate: alias chains are pure projection
    // sugar and must cost nothing.
    "q434_lateral_alias" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        SELECT kd AS k_dollars, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dollars) AS BIGINT) AS dollars
        FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents,
                     cents DIV 100 AS dollars,
                     dollars DIV 100000 AS kd
              FROM orders)
        GROUP BY kd ORDER BY kd""")
    }),

    // IDENTIFIER() CLAUSE — SQL templating without string
    // interpolation: table and column names arrive as constant
    // STRING expressions and bind late (Spark 3.5+), the
    // injection-safe seam a query generator needs beside q220's
    // parameter markers (values) — this one parameterizes
    // IDENTIFIERS. The oracle is the resolved plain statement: the
    // clause must be pure name indirection with zero semantic
    // residue.
    "q435_identifier_clause" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        SELECT IDENTIFIER('o_orderpriority') AS pri,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(IDENTIFIER('o_totalprice')) AS DOUBLE)
                 AS max_price
        FROM IDENTIFIER('orders')
        GROUP BY 1 ORDER BY 1""")
    }),

    // GRUBBS OUTLIER STATISTIC — "is the single most extreme order
    // a statistical outlier?" The max-studentized-deviation test,
    // kept EXACT by clearing every denominator: maxdevN = max|n·y −
    // S| is an integer, and G² = maxdevN²·(n−1) / (n·(nΣy²−S²))
    // comes out half-up e6 in DECIMAL(38,0) — no sqrt (G² is
    // compared against critical², the q170 no-libm stance), no
    // doubles. Whole dollars (the q427 decimal-DIV-wrap lesson).
    // One scan, two 1-row aggregates off one checkpointed moment
    // frame.
    "q436_grubbs" -> ((s, d) => {
      val y = ld(s, d, "orders")
        .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100" +
          " AS BIGINT) DIV 100 AS y")
        .localCheckpoint()
      val m = y.agg(count(lit(1)).as("n"),
        sum(col("y").cast("decimal(38,0)")).as("s"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("ss"))
        .localCheckpoint()
      y.crossJoin(broadcast(m))
        .selectExpr("n", "s", "ss",
          "abs(CAST(n AS DECIMAL(38,0)) * y - s) AS devn")
        .groupBy("n", "s", "ss")
        .agg(max("devn").as("maxdevn"))
        .selectExpr("n",
          "CAST(maxdevn DIV n AS BIGINT) AS max_dev_dollars",
          "CAST((2 * maxdevn * maxdevn * (n - 1) * 1000000" +
            " + n * (n * ss - s * s))" +
            " DIV (2 * n * (n * ss - s * s)) AS BIGINT) AS g2_e6",
          "CAST(((n - 1) * (n - 1) * 1000000) DIV n AS BIGINT)" +
            " AS g2_max_e6")
    }),

    // BROWN–FORSYTHE (median Levene) — q427 tests MEANS assuming
    // equal variances; this tests the VARIANCES themselves, the
    // robust way (deviations from the group MEDIAN, so heavy tails
    // don't masquerade as unequal spread): z = |y − med_g| stays a
    // whole-dollar INTEGER because the lower median is an actual
    // data point (row_number = ⌈n_g/2⌉ under ORDER BY y — the value
    // at a rank is tie-order-invariant), and the ANOVA-F identities
    // on z reuse q427's exact DECIMAL(38) machinery verbatim. One
    // scan to the checkpointed (grp,y) frame; the median is one
    // group-partitioned rank window over it (at 100 TB: per-group
    // range partition, the q87 stance).
    "q437_brown_forsythe" -> ((s, d) => {
      val y = ld(s, d, "orders")
        .selectExpr("o_orderpriority AS grp",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100" +
            " AS BIGINT) DIV 100 AS y")
        .localCheckpoint()
      val wg = Window.partitionBy("grp").orderBy("y")
      val med = y
        .withColumn("rn", row_number().over(wg))
        .withColumn("ng", count(lit(1)).over(Window.partitionBy("grp")))
        .filter(expr("rn = (ng + 1) DIV 2"))
        .selectExpr("grp", "y AS med")
      val g = y.join(broadcast(med), "grp")
        .selectExpr("grp", "abs(y - med) AS z")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_g"),
          sum(col("z").cast("decimal(38,0)")).as("s_g"),
          sum(col("z").cast("decimal(38,0)") * col("z")).as("ss_g"))
      g.agg(sum("n_g").as("n"), count(lit(1)).as("k"),
          sum("s_g").as("s"), sum("ss_g").as("ss"),
          sum(expr("CAST((s_g * s_g) DIV n_g AS DECIMAL(38,0))"))
            .as("sb_raw"))
        .selectExpr("n", "k",
          "ss - CAST((s * s) DIV n AS DECIMAL(38,0)) AS sst",
          "sb_raw - CAST((s * s) DIV n AS DECIMAL(38,0)) AS ssb")
        .selectExpr("n", "k",
          "CAST((2 * ssb * (n - k) * 1000000 + (sst - ssb) * (k - 1))" +
            " DIV (2 * (sst - ssb) * (k - 1)) AS BIGINT)" +
            " AS f_bf_e6")
    }),

    // WALD–WOLFOWITZ RUNS TEST — is the daily-revenue series RANDOM
    // around its median, or does it trend/cluster (the yes/no
    // randomness gate under q352's ACF and q228's seasonality —
    // those measure structure, this certifies its existence): sign
    // = day above/below the lower-median revenue day (ties with the
    // median drop, the textbook rule), R = sign-change runs via one
    // ordered lag, and z² = (Rn−2ab−n)²(n−1) / (2ab(2ab−n)) with
    // every denominator cleared — half-up e6 in DECIMAL(38,0), no
    // doubles. Two keyed rollups (day frame ≪ corpus), one global
    // rank for the median and one ordered lag over the |days| frame.
    "q439_runs_test" -> ((s, d) => {
      val day = ld(s, d, "orders")
        .groupBy(col("o_orderdate").as("dt"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).cast("long").as("rev"))
        .localCheckpoint()
      val med = day
        .withColumn("rn", row_number().over(Window.orderBy("rev")))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy()))
        .filter(expr("rn = (nd + 1) DIV 2"))
        .selectExpr("rev AS med")
      val sg = day.crossJoin(broadcast(med))
        .filter(col("rev") =!= col("med"))
        .selectExpr("dt", "CAST(rev > med AS INT) AS sg")
      sg.withColumn("chg", expr("CAST(sg <> lag(sg, 1)" +
          " OVER (ORDER BY dt) AS INT)"))
        .agg(count(lit(1)).as("n"),
          sum("sg").as("a"),
          expr("1 + sum(coalesce(chg, 0))").as("runs"))
        .selectExpr("n", "a", "n - a AS b", "runs")
        .selectExpr("n", "a", "b", "runs",
          "CAST((2 * CAST((runs * n - 2 * a * b - n)" +
            " AS DECIMAL(38,0))" +
            " * (runs * n - 2 * a * b - n) * (n - 1) * 1000000" +
            " + 2 * a * b * (2 * a * b - n))" +
            " DIV (2 * 2 * a * b * (2 * a * b - n)) AS BIGINT)" +
            " AS z2_e6")
    }),

    // UNION BY NAME — schema-drift-tolerant union: the second
    // branch arrives with reordered columns AND a missing one
    // (priority), the exact shape a multi-vintage ingest produces.
    // unionByName(allowMissingColumns=true) aligns by NAME and
    // null-fills the gap — positional UNION would silently zip the
    // wrong columns (key under cents), the classic silent-corruption
    // bug. DuckDB's UNION ALL BY NAME is the independent semantics
    // check. The rollup on top proves both the alignment and the
    // null-fill.
    "q442_union_by_name" -> ((s, d) => {
      val cents = "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100" +
        " AS BIGINT)"
      val a = ld(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .selectExpr("o_orderkey AS k", "o_orderpriority AS pri",
          s"$cents AS cents")
      val b = ld(s, d, "orders")
        .filter(col("o_orderpriority") === "5-LOW")
        .selectExpr(s"$cents AS cents", "o_orderkey AS k")
      a.unionByName(b, allowMissingColumns = true)
        .groupBy(coalesce(col("pri"), lit("<missing>")).as("pri"))
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("cents"),
          expr("CAST(min(k) AS BIGINT)").as("min_key"))
        .orderBy("pri")
    }),

    // JONCKHEERE–TERPSTRA — the ORDERED-alternative k-sample test
    // (q426's Kruskal–Wallis asks "any difference?"; this asks
    // "does order value RISE with priority class?"): J = Σ_{g<h}
    // U_gh, computed WITHOUT the pairwise explosion by the q317
    // value-domain collapse generalized to 5 groups — per-value
    // conditional counts c1..c5, one shared prefix window p1..p5,
    // and all 10 pair terms fold into ONE pass over the value
    // frame: J₂ = Σ_v Σ_{g<h} (2·c_h·p_g + c_g·c_h) (doubled units,
    // ties counted half — exact). The null moments clear to
    // integers (2μ = (n²−Σn_g²)/2·2 is even by construction; 72·Var
    // is the textbook polynomial), so z² lands half-up e6 in
    // DECIMAL(38,0) — no doubles anywhere. Whole dollars.
    "q450_jonckheere" -> ((s, d) => {
      val cs = (1 to 5).map(g =>
        sum(expr(s"CAST(g = $g AS BIGINT)")).as(s"c$g"))
      val cells = ld(s, d, "orders")
        .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100" +
          " AS BIGINT) DIV 100 AS v",
          "CAST(substr(o_orderpriority, 1, 1) AS INT) AS g")
        .groupBy("v").agg(cs.head, cs.tail: _*)
        .localCheckpoint()
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pf = cells.select(col("*") +:
        (1 to 5).map(g => coalesce(sum(s"c$g").over(w), lit(0L))
          .as(s"p$g")): _*)
      val pairTerms = (for { g <- 1 to 4; h <- (g + 1) to 5 }
        yield s"2*c$h*p$g + c$g*c$h").mkString(" + ")
      pf.agg(
          sum(expr(pairTerms)).as("j2"),
          sum(expr("c1+c2+c3+c4+c5")).as("n"))
        .crossJoin(cells.agg(
          expr("sum(c1)").as("n1"), expr("sum(c2)").as("n2"),
          expr("sum(c3)").as("n3"), expr("sum(c4)").as("n4"),
          expr("sum(c5)").as("n5")))
        .selectExpr("j2", "n",
          "(n * n - (n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5))" +
            " DIV 2 AS mu2",
          "n * n * (2 * n + 3)" +
            " - (n1*n1*(2*n1+3) + n2*n2*(2*n2+3) + n3*n3*(2*n3+3)" +
            " + n4*n4*(2*n4+3) + n5*n5*(2*n5+3)) AS den72")
        .selectExpr("n", "j2", "mu2",
          "CAST((2 * 18 * CAST((j2 - mu2) AS DECIMAL(38,0))" +
            " * (j2 - mu2) * 1000000 + den72)" +
            " DIV (2 * den72) AS BIGINT) AS z2_e6",
          "CAST(j2 > mu2 AS BOOLEAN) AS trend_up")
    }),

    // FRIEDMAN TEST — blocked rank ANOVA: within each complete week
    // (block), rank the 5 priority classes by revenue, and test
    // whether any class ranks systematically high/low across
    // blocks: Q = 12/(Nk(k+1))·ΣR_j² − 3N(k+1), half-up e6 from
    // pure BIGINTs. Blocks are the |weeks| frame (one keyed rollup
    // off the corpus); incomplete weeks drop (the textbook rule);
    // exact-cents revenue makes within-block ties measure-zero and
    // rank() resolves any that DO occur identically in both engines
    // (min-rank convention, documented). The rank window partitions
    // by week — never a global sort.
    "q451_friedman_test" -> ((s, d) => {
      val wk = ld(s, d, "orders")
        .groupBy(expr("CAST(datediff(o_orderdate, DATE'1992-01-01')" +
          " AS BIGINT) DIV 7").as("w"),
          col("o_orderpriority").as("pri"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).as("rev"))
        .localCheckpoint()
      wk.withColumn("npri", count(lit(1)).over(Window.partitionBy("w")))
        .filter(col("npri") === 5)
        .withColumn("r", rank().over(
          Window.partitionBy("w").orderBy("rev")).cast("long"))
        .groupBy("pri")
        .agg(sum("r").as("rj"), count(lit(1)).as("nblk"))
        .agg(count(lit(1)).as("k"), min("nblk").as("nb"),
          sum(expr("rj * rj")).as("sr2"))
        .selectExpr("nb AS n_blocks", "k", "sr2",
          "CAST((2 * 12 * sr2 * 1000000 + nb * k * (k + 1))" +
            " DIV (2 * nb * k * (k + 1))" +
            " - 3 * nb * (k + 1) * 1000000 AS BIGINT) AS q_e6")
    }),

    // JOIN STRATEGY HINTS — the escape hatch when statistics lie:
    // /*+ SHUFFLE_MERGE(c) */ forces a sort-merge join on the
    // customer side that Spark would otherwise broadcast, and
    // /*+ BROADCAST(na) */ pins the nation dim the other way.
    // PlanSpec asserts BOTH strategies appear — the hint surface is
    // the point; the oracle proves hints change the plan, never the
    // answer. (At 100 TB this is how you stop a 2 GB "small" table
    // from OOMing every executor.)
    "q454_join_hints" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      graft.Tables.view(s, d, "customer")
      graft.Tables.view(s, d, "nation")
      s.sql("""
        SELECT /*+ BROADCAST(na), SHUFFLE_MERGE(c) */
               na.n_name, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                 * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation na ON c.c_nationkey = na.n_nationkey
        GROUP BY 1 ORDER BY 1""")
    }),

    // CENTRALITY PROBE — closeness AND harmonic centrality from 4
    // deterministic seeds over the significant co-supply graph
    // (q134's memoized edges), via the q240 multi-SOURCE labeled
    // BFS (frontier carries the seed, the visited set keys on
    // (seed,node)): 4 synchronous rounds, frontier-partitioned
    // checkpoints. Harmonic sums Σ1/d EXACTLY as Σ⌊720/d⌋ integer
    // numerators (720 = lcm(1..6) — d ≤ 4 here, so the floor never
    // truncates); closeness is Wasserman–Faust R²/((n−1)·Σd),
    // half-up e6. Disconnected nodes simply never enter the sum —
    // the harmonic column is exactly why that's sound (the
    // textbook reason harmonic beats closeness on disconnected
    // graphs).
    "q457_centrality_probe" -> ((s, d) => {
      val e0 = coSupplyEdges(s, d)
      val edges = e0.select(col("s1").as("src"), col("s2").as("dst"))
        .unionAll(e0.select(col("s2").as("src"), col("s1").as("dst")))
        .repartition(col("src"))
        .localCheckpoint()
      val nodes = edges.select(col("src").as("node")).distinct()
        .localCheckpoint()
      val seeds = nodes.orderBy("node").limit(4)
        .select(col("node").as("seed")).localCheckpoint()
      var visited = seeds.select(col("seed"), col("seed").as("node"))
        .withColumn("hop", lit(0L)).localCheckpoint()
      var frontier = visited.select("seed", "node")
      // visited stays a LAZY union of checkpointed frontiers (r15, the
      // q240 note): leaves are materialized, the per-round visited
      // checkpoint was an extra eager job per round for nothing.
      for (r <- 1 to 4) {
        frontier = edges.join(frontier, col("src") === col("node"))
          .select(col("seed"), col("dst").as("node")).distinct()
          .join(visited.select("seed", "node"), Seq("seed", "node"),
            "left_anti")
          .localCheckpoint()
        visited = visited
          .unionByName(frontier.withColumn("hop", lit(r.toLong)))
      }
      val nn = nodes.agg(count(lit(1)).as("n_nodes"))
      visited.filter(col("hop") > 0)
        .groupBy("seed")
        .agg(count(lit(1)).as("n_reached"),
          sum("hop").as("sum_d"),
          sum(expr("720 DIV hop")).as("harm720"))
        .crossJoin(broadcast(nn))
        .selectExpr("seed", "n_reached", "CAST(sum_d AS BIGINT)" +
          " AS sum_d",
          "CAST((2 * n_reached * n_reached * 1000000" +
            " + (n_nodes - 1) * sum_d)" +
            " DIV (2 * (n_nodes - 1) * sum_d) AS BIGINT)" +
            " AS closeness_e6",
          "CAST((2 * harm720 * 1000000 + 720 * (n_nodes - 1))" +
            " DIV (2 * 720 * (n_nodes - 1)) AS BIGINT)" +
            " AS harmonic_e6")
        .orderBy("seed")
    }),

    // ROW-LEVEL SECURITY VIEWS — multi-tenant isolation as the
    // engine enforces it: per-tenant TEMP VIEWS carry the tenant
    // predicate (the only layer many lakehouse RLS schemes have),
    // consumers query the view never the base table, and the audit
    // columns PROVE isolation — the cross-view key intersection is
    // emitted as n_leaked and must be 0. The governance rung beside
    // q160 (k-anonymity), q245 (DP release), q356 (redaction),
    // q367 (encryption at rest): those protect values, this
    // protects ROWS.
    "q458_rls_tenant_views" -> ((s, d) => {
      // the tenant views share ONE checkpoint-pinned base projection
      // — naive per-view join trees re-scanned the three dims 12×
      // (views re-derive per reference; at 100 TB customer is a
      // corpus table, so the base materializes once)
      ld(s, d, "customer").as("c")
        .join(ld(s, d, "nation").as("n"),
          col("c.c_nationkey") === col("n.n_nationkey"))
        .join(broadcast(ld(s, d, "region").as("r")),
          col("n.n_regionkey") === col("r.r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"))
        .localCheckpoint()
        .createOrReplaceTempView("rls_base")
      Seq("ASIA", "EUROPE").foreach { t =>
        s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW
            rls_${t.toLowerCase} AS
          SELECT c_custkey, n_name, r_name FROM rls_base
          WHERE r_name = '$t'""")
      }
      s.sql("""
        SELECT r_name AS tenant,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations,
               CAST((SELECT count(*) FROM rls_asia a
                     JOIN rls_europe e ON a.c_custkey = e.c_custkey)
                 AS BIGINT) AS n_leaked
        FROM (SELECT * FROM rls_asia
              UNION ALL SELECT * FROM rls_europe)
        GROUP BY 1 ORDER BY 1""")
    }),

    // GOODMAN–KRUSKAL GAMMA — ordinal×ordinal association (does
    // priority CLASS track value QUARTILE?), the contingency-table
    // sibling of q297's pairwise Kendall: concordant/discordant
    // mass comes from the 5×4 cell table self-joined (20×20 rows —
    // broadcast scale), never from order pairs. γ = (C−D)/(C+D) in
    // half-up e6 with the SIGN SPLIT spelled out (both branches
    // divide positives — Spark DIV truncates toward zero, DuckDB
    // // floors, and on negatives they'd disagree; the split makes
    // the question never arise). Quartiles are one corpus-ranked
    // ntile (q425 stance).
    "q462_gk_gamma" -> ((s, d) => {
      // staged quartiles via ntile COUNTS (r14, Ranks.stagedNtileCounts):
      // the query only needs the 5×4 (class × quartile) CELL TABLE, so
      // only the ≤3 boundary-straddling cents buckets ever see a
      // row_number — whole buckets contribute through the same coarse
      // (bucket × class) aggregate the cell table already implies. r13's
      // general staged rank checkpointed the corpus and ranked every
      // order for ranks this groupBy immediately discarded (0.39→0.85 s
      // local); selection is still bit-identical to the corpus ntile.
      val cells = Ranks.stagedNtileCounts(
          ld(s, d, "orders")
            .selectExpr("CAST(substr(o_orderpriority, 1, 1) AS INT)" +
              " AS g",
              "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
                " AS cents", "o_orderkey"),
          expr("cents DIV 1000000"), Seq(col("cents"), col("o_orderkey")),
          4, Seq("g"), "b", "n")
        .withColumn("b", col("b").cast("int"))
        .localCheckpoint()
      val pairs = cells.as("x").crossJoin(broadcast(cells.as("y")))
      pairs.agg(
          sum(expr("CASE WHEN y.g > x.g AND y.b > x.b" +
            " THEN x.n * y.n ELSE 0 END")).as("c"),
          sum(expr("CASE WHEN y.g > x.g AND y.b < x.b" +
            " THEN x.n * y.n ELSE 0 END")).as("dd"))
        .selectExpr("c AS concordant", "dd AS discordant",
          "CASE WHEN c >= dd THEN" +
            " CAST((2 * (c - dd) * 1000000 + (c + dd))" +
            " DIV (2 * (c + dd)) AS BIGINT)" +
            " ELSE -CAST((2 * (dd - c) * 1000000 + (c + dd))" +
            " DIV (2 * (c + dd)) AS BIGINT) END AS gamma_e6")
    }),

    // FULFILLMENT LAG PROFILE — order-to-ship days per priority
    // class, the operations SLA readout: exact day lags from one
    // orders⋈lineitem key join, then the percentile machinery runs
    // on the (priority, lag) VALUE DOMAIN (the q317 collapse — a
    // few hundred distinct lags, never a corpus sort): lower-median
    // p50 and ceil-indexed p90 are conditional mins over the
    // prefix-cumulated value frame; the mean is half-up e2. All
    // BIGINT.
    "q466_fulfillment_lag" -> ((s, d) => {
      val lag = ld(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          col("l_shipdate").cast("date").as("sd"))
        .join(ld(s, d, "orders").select(col("o_orderkey").as("ok"),
          col("o_orderdate").as("od"), col("o_orderpriority")
            .as("pri")), "ok")
        .selectExpr("pri",
          "CAST(datediff(sd, od) AS BIGINT) AS lag")
        .groupBy("pri", "lag").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val w = Window.partitionBy("pri").orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, 0)
      lag
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(Window.partitionBy("pri")))
        .withColumn("sx", sum(expr("cnt * lag"))
          .over(Window.partitionBy("pri")))
        .groupBy("pri")
        .agg(max("n").as("n"), max("sx").as("sx"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("lag")))
            .as("p50_lag"),
          min(when(expr("cum >= (9 * n + 9) DIV 10"), col("lag")))
            .as("p90_lag"),
          max("lag").as("max_lag"))
        .selectExpr("pri", "n",
          "CAST((2 * sx * 100 + n) DIV (2 * n) AS BIGINT)" +
            " AS mean_lag_e2",
          "p50_lag", "p90_lag", "max_lag")
        .orderBy("pri")
    }),

    // QUANTILE TREATMENT EFFECTS — averages hide WHERE an effect
    // lands; the QTE curve shows it per decile: a +500-dollar
    // effect is PLANTED on the md5 arm, and the per-arm decile
    // values come from the (arm, dollars) VALUE-DOMAIN prefix
    // frame (the q466 machinery, ceil-indexed picks) — never a
    // per-arm corpus sort. The readout: a constant additive effect
    // shows up flat ≈ +500 across deciles (location shift), which
    // is exactly what the curve certifies. All BIGINT.
    "q468_qte_deciles" -> ((s, d) => {
      val vals = ld(s, d, "orders")
        .selectExpr(
          "CAST(conv(substr(md5(concat('ar#'," +
            " CAST(o_custkey AS STRING))), 1, 4), 16, 10) AS BIGINT)" +
            " % 2 AS arm",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
            " DIV 100 AS y0")
        .selectExpr("arm", "y0 + 500 * arm AS y")
        .groupBy("arm", "y").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val w = Window.partitionBy("arm").orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = vals
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(Window.partitionBy("arm")))
      val qs = broadcast(s.range(1, 10)
        .selectExpr("CAST(id AS BIGINT) AS q"))
      cum.crossJoin(qs)
        .filter(expr("cum >= (q * n + 9) DIV 10"))
        .groupBy("q", "arm").agg(min("y").as("yq"))
        .groupBy("q")
        .agg(max(when(col("arm") === 0, col("yq"))).as("y_control"),
          max(when(col("arm") === 1, col("yq"))).as("y_treated"))
        .selectExpr("q AS decile", "y_control", "y_treated",
          "y_treated - y_control AS qte_dollars")
        .orderBy("decile")
    }),

    // SPLIT-CONFORMAL INTERVAL — distribution-free forecast bands
    // with a finite-sample guarantee (the modern answer to "what's
    // the error bar on q414's naive forecaster?"): calibration
    // residuals |y_w − y_{w−1}| on weeks 100–279, q̂ = the
    // ⌈0.9·(n+1)⌉-th smallest residual picked off the cumulated
    // residual VALUE frame (ceil-indexed, the q466 machinery), and
    // the held-out weeks 280–320 report empirical coverage — the
    // guarantee says ≥ ~90%, and the query MEASURES it. Exact
    // cents end to end; one weekly rollup, one lag window.
    "q477_conformal_interval" -> ((s, d) => {
      val wk = ld(s, d, "orders")
        .groupBy(expr("CAST(datediff(o_orderdate, DATE'1992-01-01')" +
          " AS BIGINT) DIV 7").as("w"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).as("y"))
        .localCheckpoint()
      val res = wk
        .withColumn("yl", lag("y", 1).over(Window.orderBy("w")))
        .filter(col("yl").isNotNull)
        .selectExpr("w", "abs(y - yl) AS r")
        .localCheckpoint()
      val cal = res.filter(col("w").between(100, 279))
        .groupBy("r").agg(count(lit(1)).as("cnt"))
      val qhat = cal
        .withColumn("cum", sum("cnt").over(Window.orderBy("r")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum("cnt").over(Window.partitionBy()))
        .filter(expr("cum >= (9 * (n + 1) + 9) DIV 10"))
        .agg(min("r").as("qhat"), max("n").as("n_cal"))
      res.filter(col("w").between(280, 320))
        .crossJoin(broadcast(qhat))
        .agg(max("n_cal").as("n_cal"), max("qhat").as("qhat_cents"),
          count(lit(1)).as("n_test"),
          expr("sum(CAST(r <= qhat AS BIGINT))").as("n_covered"))
        .selectExpr("n_cal", "qhat_cents", "n_test", "n_covered",
          "CAST((2 * n_covered * 10000 + n_test) DIV (2 * n_test)" +
            " AS BIGINT) AS coverage_bp")
    }),

    // SEASONAL PROFILE (decomposition) — q352's ACF detects
    // seasonality, this EXTRACTS it: trend = the centered 53-week
    // moving average (complete windows only), the detrended series
    // averages by week-of-year into the 52-row seasonal profile —
    // each mean a SIGN-SPLIT half-up e2 (detrended values go
    // negative, where Spark DIV truncates and DuckDB // floors;
    // the split keeps both engines dividing positives). The rank
    // column hands a planner the peak/trough weeks directly. One
    // weekly rollup; one ordered MA window; one 52-key rollup.
    "q478_seasonal_profile" -> ((s, d) => {
      val wk = ld(s, d, "orders")
        .groupBy(expr("CAST(datediff(o_orderdate, DATE'1992-01-01')" +
          " AS BIGINT) DIV 7").as("w"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).as("y"))
        .localCheckpoint()
      val wma = Window.orderBy("w").rowsBetween(-26, 26)
      wk
        .withColumn("tsum", sum("y").over(wma))
        .withColumn("tn", count(lit(1)).over(wma))
        .filter(col("tn") === 53)
        .selectExpr("w % 52 AS woy",
          "y * 100 - CAST((2 * tsum * 100 + 53) DIV 106 AS BIGINT)" +
            " AS d_e2")
        .groupBy("woy")
        .agg(count(lit(1)).as("n"), sum("d_e2").as("sd"))
        .selectExpr("woy", "n",
          "CASE WHEN sd >= 0 THEN" +
            " CAST((2 * sd + n) DIV (2 * n) AS BIGINT)" +
            " ELSE -CAST((2 * -sd + n) DIV (2 * n) AS BIGINT)" +
            " END AS seasonal_e2")
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("seasonal_e2").desc, col("woy")))
          .cast("long"))
        .orderBy("woy")
    }),

    // KEYSET PAGINATION — the O(page) alternative to OFFSET (which
    // re-sorts and discards at every page — the classic API-scaling
    // bug): each page seeks past the previous page's last key with
    // the explicit (d > bd) OR (d = bd AND k > bk) predicate (Spark
    // has no row-value comparison; this IS the portable spelling),
    // under the total order (o_orderdate, o_orderkey). Three pages
    // emitted with their page tags; the oracle re-derives the same
    // pages, proving keyset ≡ offset pagination on a stable order.
    // Boundaries come from deterministic scalar subqueries here; a
    // real API passes them as cursor state.
    "q475_keyset_pagination" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""
        WITH ord AS (SELECT o_orderkey AS k,
                            CAST(o_orderdate AS DATE) AS dt
                     FROM orders),
        b1 AS (SELECT dt AS bd, k AS bk FROM ord
               ORDER BY dt, k LIMIT 1 OFFSET 4),
        b2 AS (SELECT dt AS bd, k AS bk FROM ord
               ORDER BY dt, k LIMIT 1 OFFSET 9),
        p1 AS (SELECT 1 AS page, dt, k FROM ord
               ORDER BY dt, k LIMIT 5),
        p2 AS (SELECT 2 AS page, dt, k FROM ord, b1
               WHERE dt > bd OR (dt = bd AND k > bk)
               ORDER BY dt, k LIMIT 5),
        p3 AS (SELECT 3 AS page, dt, k FROM ord, b2
               WHERE dt > bd OR (dt = bd AND k > bk)
               ORDER BY dt, k LIMIT 5)
        SELECT CAST(page AS BIGINT) AS page, dt AS order_date,
               CAST(k AS BIGINT) AS order_key
        FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
              UNION ALL SELECT * FROM p3)
        ORDER BY page, order_date, order_key""")
    }),

    // PAGE'S L TREND TEST — Friedman (q451) asks "any treatment
    // difference across blocks?"; Page's L asks the ORDERED
    // question — do ranks RISE with priority class? L = Σ_j j·R̄...
    // computed as Σ_j g_j·R_j with g_j the priority digit over
    // q451's exact blocked ranks, and the null moments are closed
    // forms (μ_L = Nk(k+1)²/4, 144·Var_L = N·k²(k+1)²(k²−1)·
    // ... cleared to the textbook z² = 12·(L−μ)²·... — here kept
    // as the exact integer pair (L, 4L − Nk(k+1)² which is 4·(L−μ),
    // sign included) plus z² half-up e6 with every denominator
    // cleared: z² = 144·(L−μ)²/(N·k²(k+1)²(k²−1)/... ), using
    // Var_L = N(k³−k)²/144·... the standard form Var = N·k²(k+1)²
    // (k²−1)/144. All BIGINT.
    "q476_page_trend" -> ((s, d) => {
      val wk = ld(s, d, "orders")
        .groupBy(expr("CAST(datediff(o_orderdate, DATE'1992-01-01')" +
          " AS BIGINT) DIV 7").as("w"),
          expr("CAST(substr(o_orderpriority, 1, 1) AS INT)").as("g"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).as("rev"))
        .localCheckpoint()
      wk.withColumn("npri", count(lit(1)).over(Window.partitionBy("w")))
        .filter(col("npri") === 5)
        .withColumn("r", rank().over(
          Window.partitionBy("w").orderBy("rev")).cast("long"))
        .agg(countDistinct("w").as("nb"),
          sum(expr("g * r")).as("l"))
        .selectExpr("nb", "l",
          "4 * l - nb * 5 * 36 AS l_dev4")
        .selectExpr("nb", "l", "l_dev4",
          // z² = (L−μ)²/Var, Var = N·k²(k+1)²(k²−1)/144 with k=5:
          // 144·Var = N·25·36·24 = 21600·N; (L−μ)² = l_dev4²/16
          "CAST((2 * 9 * l_dev4 * l_dev4 * 1000000" +
            " + 1350 * nb * 16)" +
            " DIV (2 * 1350 * nb * 16) AS BIGINT) AS z2_e6",
          "l_dev4 > 0 AS trend_up")
    }),

    // ROLLING-ORIGIN BACKTEST — the evaluation PROTOCOL around
    // q414's MASE: four training origins, each forecasting the
    // next 8 weeks, naive(last) vs seasonal(lag-52) scored per
    // fold — a single split overfits the split; the fold table is
    // what a forecasting rollout actually reviews. The weekly
    // frame is built once (checkpoint); each fold's predictions
    // are two tiny self-joins against it (origin row broadcast,
    // lag row keyed); MAE in exact cents, winner by integer
    // comparison. Folds grid is literal — at 100 TB the weekly
    // frame is still |weeks|-sized.
    "q471_rolling_origin_backtest" -> ((s, d) => {
      val wk = ld(s, d, "orders")
        .groupBy(expr("CAST(datediff(o_orderdate, DATE'1992-01-01')" +
          " AS BIGINT) DIV 7").as("w"))
        .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).as("y"))
        .localCheckpoint()
      val folds = broadcast(s.range(1, 5)
        .selectExpr("CAST(id AS BIGINT) AS fold",
          "CAST(280 + 8 * (id - 1) AS BIGINT) AS origin_w"))
      val test = wk.crossJoin(folds)
        .filter(col("w") > col("origin_w") &&
          col("w") <= col("origin_w") + 8)
      val naive = wk.selectExpr("w AS origin_w", "y AS y_naive")
      val snaive = wk.selectExpr("w + 52 AS w", "y AS y_snaive")
      test
        .join(broadcast(naive), "origin_w")
        .join(snaive, "w")
        .groupBy("fold", "origin_w")
        .agg(count(lit(1)).as("n_test"),
          sum(expr("abs(y - y_naive)")).as("mae_naive_sum_c"),
          sum(expr("abs(y - y_snaive)")).as("mae_snaive_sum_c"))
        .selectExpr("fold", "origin_w", "n_test",
          "mae_naive_sum_c", "mae_snaive_sum_c",
          "CASE WHEN mae_snaive_sum_c < mae_naive_sum_c" +
            " THEN 'seasonal' ELSE 'naive' END AS winner")
        .orderBy("fold")
    }),

    // INTERFERENCE (SUTVA) AUDIT — before trusting any of the
    // experiment estimators (q368/q405/q460/q464/q468), check the
    // no-interference assumption on units that share an edge:
    // suppliers are md5-randomized, outcomes are exact revenue
    // cents, and the audit splits CONTROL units by exposure —
    // has-a-treated-co-supply-neighbor vs isolated — because under
    // interference the exposed controls drift toward treatment.
    // Exposure is one semi-join over q134's memoized edge frame;
    // the contrast is sign-split half-up e2 in DECIMAL(38,0)
    // (cents sums cross BIGINT when rescaled). No estimator here,
    // deliberately: this query GATES the others.
    "q469_interference_audit" -> ((s, d) => {
      val arm = (c: String) =>
        s"CAST(conv(substr(md5(concat('ia#', CAST($c AS STRING)))," +
          s" 1, 4), 16, 10) AS BIGINT) % 2"
      val rev = ld(s, d, "lineitem")
        .groupBy(col("l_suppkey").as("sk"))
        .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2))" +
          " * 100 AS BIGINT)")).as("cents"))
        .selectExpr("sk", "cents", s"${arm("sk")} AS t")
        .localCheckpoint()
      val e0 = coSupplyEdges(s, d)
      val und = e0.select(col("s1").as("u"), col("s2").as("v"))
        .unionAll(e0.select(col("s2").as("u"), col("s1").as("v")))
      val exposed = und
        .join(rev.filter(col("t") === 1).select(col("sk").as("v")),
          "v")
        .select(col("u").as("sk")).distinct()
      rev.filter(col("t") === 0)
        .join(exposed.withColumn("ex", lit(1L)), Seq("sk"), "left")
        .selectExpr("cents", "coalesce(ex, 0L) AS ex")
        .groupBy("ex")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        .agg(
          expr("max(CASE WHEN ex = 1 THEN n END)").as("n_exposed"),
          expr("max(CASE WHEN ex = 0 THEN n END)").as("n_isolated"),
          expr("max(CASE WHEN ex = 1 THEN s END)").as("s_exp"),
          expr("max(CASE WHEN ex = 0 THEN s END)").as("s_iso"))
        .selectExpr("n_exposed", "n_isolated",
          "CASE WHEN s_exp * n_isolated >= s_iso * n_exposed THEN" +
            " CAST((2 * CAST(s_exp * n_isolated - s_iso * n_exposed" +
            " AS DECIMAL(38,0)) * 100 + n_exposed * n_isolated)" +
            " DIV (2 * CAST(n_exposed AS DECIMAL(38,0))" +
            " * n_isolated) AS BIGINT)" +
            " ELSE -CAST((2 * CAST(s_iso * n_exposed - s_exp" +
            " * n_isolated AS DECIMAL(38,0)) * 100" +
            " + n_exposed * n_isolated)" +
            " DIV (2 * CAST(n_exposed AS DECIMAL(38,0))" +
            " * n_isolated) AS BIGINT) END AS exposure_diff_e2")
    }),
  )

  /** Weekly revenue per order priority — the calendar-bounded series
    * shared by q295 (Theil–Sen) and q297 (Kendall): one map-side
    * combined rollup, pinned because both consumers self-join it. */
  private def weeklyRevenue(s: SparkSession, d: String): DataFrame =
    ld(s, d, "orders").select(
        col("o_orderpriority").as("grp"),
        expr("CAST(datediff(o_orderdate, DATE'1992-01-01') AS BIGINT)" +
          " DIV 7").as("w"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy("grp", "w").agg(sum("cents").as("y"))
      .localCheckpoint() // both sides of the pair self-join

  /** q201's query text, shared verbatim with the DuckDB oracle. */
  private[queries] def groupAllSql(t: String): String =
    s"""SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
        FROM $t WHERE l_quantity > 40
        GROUP BY ALL ORDER BY ALL"""

  /** q202's query text, shared verbatim with the DuckDB oracle. */
  private[queries] def lateralTopkSql(t: String): String =
    s"""SELECT s.source, t.doc_id, t.n_chars
        FROM (SELECT DISTINCT source FROM $t) s,
             LATERAL (SELECT doc_id, n_chars FROM $t d
                      WHERE d.source = s.source
                      ORDER BY n_chars DESC, doc_id LIMIT 3) t
        ORDER BY s.source, t.n_chars DESC, t.doc_id"""

  /** The significance-pruned co-supply edge list (q134's derivation,
    * shared by q208's label propagation): supplier pairs co-supplying
    * one hypergeometric sd above chance, exact in DECIMAL(38).
    * CHECKPOINT-pinned: the edge list is consumed by many downstream
    * references (q134: und ×2, dir ×3; q208: the symmetrized frame per
    * round); without pinning, Catalyst re-expands the whole
    * ps-self-join subtree per reference (measured: a 252-Exchange plan,
    * 10.5 s at sf0.1). In production this is the persisted edge table
    * every graph pass starts from. Memoized per (session, dir) like the
    * q117/q123 shared derivation, so a bench run pays the build once. */
  /** q324's Adamic–Adar weights: round(1e6 / ln(d)) for d ∈ 2..512,
    * generated ONCE in Scala and rendered both as the Spark broadcast
    * lookup and the oracle's VALUES literal — neither engine ever
    * evaluates log, so libm rounding cannot diverge. */
  private[queries] lazy val lnLut: Seq[(Long, Long)] =
    (2 to 512).map(dg => (dg.toLong, math.round(1e6 / math.log(dg))))

  private[queries] lazy val lnLutValues: String =
    lnLut.map { case (dg, w) => s"($dg, $w)" }.mkString(", ")

  private val coSupplyCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  /** Drop the memoized edge frame so its localCheckpoint blocks become
    * collectible — the bench harness calls this between queries; r11's
    * driver bench showed later unrelated queries inflated ~2× by
    * accumulated checkpoint blocks from these session-lifetime pins. */
  private[graft] def clearShared(): Unit = coSupplyCache.clear()
  private[queries] def coSupplyEdges(s: SparkSession, d: String): DataFrame =
    coSupplyCache.computeIfAbsent((s, d), { _ =>
      val ps = ld(s, d, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sp"))
        .distinct()
      val nparts = ps.agg(countDistinct(col("p")).as("n"))
        .withColumn("_mag_ok", assert_true(col("n") <= 40000000L,
          lit("q134 significance test exceeds DECIMAL(38) exactness " +
            "(n^5 past 38 digits): widen the arithmetic before scaling")))
        .filter(col("_mag_ok").isNull).drop("_mag_ok")
      val deg = ps.groupBy("sp").agg(count(lit(1)).as("dg"))
      ps.as("a")
        .join(ps.as("b").hint("shuffle_hash"),
          col("a.p") === col("b.p") && col("a.sp") < col("b.sp"))
        .groupBy(col("a.sp").as("s1"), col("b.sp").as("s2"))
        .agg(count(lit(1)).as("shared"))
        .join(deg.select(col("sp").as("s1"), col("dg").as("d1"))
          .hint("shuffle_hash"), "s1")
        .join(deg.select(col("sp").as("s2"), col("dg").as("d2"))
          .hint("shuffle_hash"), "s2")
        .crossJoin(broadcast(nparts))
        .filter(col("shared") * col("n") > col("d1") * col("d2"))
        .filter(expr(
          """CAST(shared * n - d1 * d2 AS DECIMAL(38, 0))
               * (shared * n - d1 * d2) * (n - 1)
             >= CAST(d1 AS DECIMAL(38, 0)) * d2 * (n - d1) * (n - d2)"""))
        .select("s1", "s2")
        .localCheckpoint()
    })

  /** q191's BOM closure, parameterized only by the table name: the SAME
    * string runs on Spark (over the temp view) and DuckDB (over the
    * parquet view) — cross-engine row equality on an identical query
    * text. Roots start at 1: part 0 would be its own parent (0 DIV 2 =
    * 0) and never terminate. floor(anc / 2) instead of integer DIV
    * because `/` is double division in BOTH dialects while DIV (Spark)
    * and // (DuckDB) differ textually — exact below 2^53. */
  private[queries] def bomClosureSql(t: String): String =
    s"""WITH RECURSIVE walk AS (
          SELECT p_partkey AS node, p_partkey AS anc, 0 AS depth
          FROM $t WHERE p_partkey >= 1
          UNION ALL
          SELECT node, CAST(floor(anc / 2) AS BIGINT) AS anc,
                 depth + 1 AS depth
          FROM walk WHERE anc >= 2
        )
        SELECT anc AS root, count(*) AS n_nodes, max(depth) AS max_depth,
               CAST(sum(node) AS BIGINT) AS key_sum
        FROM walk WHERE anc >= 1 AND anc <= 10
        GROUP BY anc ORDER BY root"""

  /** q69's exact-decimal aggregation, pre-stringification. Kept as a named
    * seam so QueriesSmokeSpec can pin that the arithmetic really runs on
    * DecimalType (128-bit exact buffers) and is not silently promoted to
    * double — the public q69 entry stringifies this frame only for the
    * driver's representation-independent compare.
    */
  private[graft] def decimalMoneyExact(s: SparkSession, d: String): DataFrame =
    ld(s, d, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_discount").cast("decimal(12,2)").as("disc"))
      .groupBy("l_returnflag")
      .agg(
        sum(col("price")).cast("decimal(18,2)").as("sum_price"),
        sum(col("price") * (lit(1).cast("decimal(12,2)") - col("disc")))
          .cast("decimal(18,4)").as("sum_disc_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** q134's significance-pruned co-supply edge derivation as a DuckDB
    * CTE chain ending in the symmetrized `und(u, v)` frame — shared
    * verbatim by the q134 and q208 oracles (the graph both passes walk
    * must be the SAME graph). */
  private lazy val duckCoSupplyUnd: String =
    """ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sp
                     FROM lineitem),
              np AS (SELECT count(DISTINCT p) AS n FROM ps),
              deg AS (SELECT sp, count(*) AS dg FROM ps GROUP BY 1),
              sh AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS shared
                     FROM ps a JOIN ps b ON a.p = b.p AND a.sp < b.sp
                     GROUP BY 1, 2),
              lifted AS (SELECT s1, s2 FROM sh, np, deg da, deg db
                         WHERE da.sp = s1 AND db.sp = s2
                           AND shared * np.n > da.dg * db.dg
                           AND (shared * np.n - da.dg * db.dg)::HUGEINT
                               * (shared * np.n - da.dg * db.dg)
                               * (np.n - 1)
                               >= (da.dg)::HUGEINT * db.dg
                                  * (np.n - da.dg) * (np.n - db.dg)),
              und AS (SELECT s1 AS u, s2 AS v FROM lifted
                      UNION ALL SELECT s2, s1 FROM lifted)"""

  val oracle: Map[String, String] = Map(
    "q303_dsv2_memscan" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
                min(n_name) AS first_name
         FROM nation WHERE n_regionkey > 1
         GROUP BY 1 ORDER BY 1""",

    // q305: deliberately the SAME oracle text as q303 — the pushdown
    // must change where the aggregation runs, never the answer.
    "q305_dsv2_agg_pushdown" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
                min(n_name) AS first_name
         FROM nation WHERE n_regionkey > 1
         GROUP BY 1 ORDER BY 1""",

    "q293_item_cf" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                    FROM lineitem),
              ni AS (SELECT i, count(*) AS n FROM b GROUP BY 1),
              co AS (SELECT a.i AS i1, b.i AS i2, count(*) AS c
                     FROM b a JOIN b b ON a.o = b.o AND a.i < b.i
                     GROUP BY 1, 2 HAVING count(*) >= 2),
              sym AS (SELECT i1 AS i, i2 AS j, c FROM co
                      UNION ALL SELECT i2, i1, c FROM co),
              sc AS (SELECT sym.i, sym.j, sym.c,
                            CAST((2 * sym.c * sym.c * 10000 + ni.n * nj.n)
                                 // (2 * ni.n * nj.n) AS BIGINT)
                              AS cos2_bp
                     FROM sym JOIN ni ON sym.i = ni.i
                              JOIN ni nj ON sym.j = nj.i),
              rk AS (SELECT *, row_number() OVER (PARTITION BY i
                       ORDER BY cos2_bp DESC, j) AS rn
                     FROM sc)
         SELECT i, CAST(rn AS BIGINT) AS rn, j, CAST(c AS BIGINT) AS c,
                cos2_bp
         FROM rk WHERE rn <= 3 ORDER BY i, rn""",

    "q309_dsv2_spj" ->
      """SELECT r_regionkey, r_name, CAST(count(*) AS BIGINT) AS n_nations,
                min(n_name) AS first_nation
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1""",

    "q310_dsv2_catalog" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
                CAST(max(n_nationkey) AS BIGINT) AS max_key
         FROM nation WHERE n_nationkey < 20
         GROUP BY n_regionkey ORDER BY n_regionkey""",

    // q311: the seven FK edges generated by the same loop shape as the
    // Spark side so the edge inventory can never drift.
    "q311_fk_orphans" -> {
      val edges = Seq(
        ("lineitem.l_orderkey->orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier.s_suppkey",
          "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation.n_nationkey",
          "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region.r_regionkey",
          "nation", "n_regionkey", "region", "r_regionkey"))
      edges.map { case (edge, ct, ck, pt, pk) =>
        s"""SELECT '$edge' AS fk_edge,
                   CAST((SELECT count(*) FROM $ct) AS BIGINT) AS n_child,
                   CAST((SELECT count(*) FROM $ct c
                         WHERE NOT EXISTS (SELECT 1 FROM $pt p
                                           WHERE p.$pk = c.$ck))
                        AS BIGINT) AS n_orphans,
                   ((SELECT count(*) FROM $ct c
                     WHERE NOT EXISTS (SELECT 1 FROM $pt p
                                       WHERE p.$pk = c.$ck)) = 0)
                     AS intact"""
      }.mkString(" UNION ALL ") + " ORDER BY fk_edge"
    },

    "q313_trending_rank" ->
      """WITH cnt AS (SELECT CAST(year(l_shipdate) * 12
                             + month(l_shipdate) AS BIGINT) AS ym,
                             l_partkey, count(*) AS n
                      FROM lineitem GROUP BY 1, 2),
              rk AS (SELECT ym, l_partkey, n,
                            row_number() OVER (PARTITION BY ym
                              ORDER BY n DESC, l_partkey) AS rnk
                     FROM cnt),
              mx AS (SELECT max(ym) AS maxym FROM rk)
         SELECT c.l_partkey, CAST(p.rnk AS BIGINT) AS rank_prev,
                CAST(c.rnk AS BIGINT) AS rank_now,
                CAST(p.rnk - c.rnk AS BIGINT) AS rank_delta
         FROM rk p JOIN rk c
           ON c.ym = p.ym + 1 AND c.l_partkey = p.l_partkey, mx
         WHERE c.ym = mx.maxym
         ORDER BY rank_delta DESC, c.l_partkey LIMIT 10""",

    // q321: the oracle sees only the numbers — the write/read-back
    // round trip must be invisible to the result.
    "q321_dsv2_write_commit" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    // q324: the lut literal is the SAME Scala-generated table the
    // Spark side broadcasts.
    "q324_adamic_adar" ->
      s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sp
                      FROM lineitem),
               deg AS (SELECT p, count(*) AS dg FROM ps GROUP BY p),
               lut(dg, w_micro) AS (VALUES $lnLutValues),
               wp AS (SELECT deg.p, w_micro FROM deg
                      JOIN lut ON deg.dg = lut.dg
                      WHERE deg.dg >= 2),
               pr AS (SELECT a.p, a.sp AS s1, b.sp AS s2
                      FROM ps a JOIN ps b
                        ON a.p = b.p AND a.sp < b.sp)
          SELECT s1, s2, count(*) AS common_parts,
                 CAST(sum(w_micro) AS BIGINT) AS aa_micro
          FROM pr JOIN wp ON pr.p = wp.p
          GROUP BY 1, 2
          ORDER BY aa_micro DESC, s1, s2 LIMIT 50""",

    // q332: the cache is invisible to the answer — the oracle computes
    // both bands straight from the rollup.
    "q332_cached_reuse" ->
      """WITH pp AS (SELECT l_partkey,
                            sum(CAST(l_quantity AS BIGINT)) AS qty,
                            count(*) AS n_lines
                     FROM lineitem GROUP BY 1)
         SELECT band, CAST(n_parts AS BIGINT) AS n_parts,
                CAST(tot_qty AS BIGINT) AS tot_qty,
                CAST(tot_lines AS BIGINT) AS tot_lines
         FROM (SELECT 'hi' AS band, count(*) AS n_parts,
                      sum(qty) AS tot_qty, sum(n_lines) AS tot_lines
               FROM pp WHERE qty > 150
               UNION ALL
               SELECT 'lo', count(*), sum(qty), sum(n_lines)
               FROM pp WHERE qty <= 150)
         ORDER BY band""",

    // q330: the script's halving-chain search unrolled relationally.
    "q330_sql_scripting" ->
      """WITH total AS (SELECT count(*) AS t FROM documents),
              cand(cutoff, ord) AS (VALUES (800, 0), (400, 1), (200, 2),
                (100, 3), (50, 4), (25, 5), (12, 6), (6, 7), (3, 8),
                (1, 9), (0, 10)),
              fr AS (SELECT cutoff, ord,
                            (10000 * (SELECT count(*) FROM documents
                                      WHERE n_chars >= cutoff)) // t AS bp
                     FROM cand, total)
         SELECT CAST(cutoff AS BIGINT) AS chosen_cutoff,
                CAST(bp AS BIGINT) AS pass_bp,
                CAST(t AS BIGINT) AS n_docs
         FROM fr, total WHERE bp >= 6000 ORDER BY ord LIMIT 1""",

    // q331: variable replayed as a scalar subquery.
    "q331_session_variables" ->
      """WITH cut AS (SELECT (max(CAST(CAST(o_totalprice
                        AS DECIMAL(14,2)) * 100 AS BIGINT)) * 90) // 100
                        AS g FROM orders)
         SELECT o_orderpriority, count(*) AS n_high,
                CAST(min(g) AS BIGINT) AS cut_cents
         FROM orders, cut
         WHERE CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               >= g
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q307_array_hof" ->
      """SELECT doc_id,
                CAST(len(lens) AS BIGINT) AS n_toks,
                CAST(list_sum(lens) AS BIGINT) AS sum_len,
                CAST(list_max(lens) AS BIGINT) AS max_len,
                CAST(len(list_filter(lens, x -> x > 5)) AS BIGINT)
                  AS n_long,
                (len(list_filter(lens, x -> x >= 9)) > 0) AS has_long9
         FROM (SELECT doc_id,
                      list_transform(string_split(text, ' '),
                                     t -> length(t)) AS lens
               FROM documents)
         ORDER BY doc_id""",

    "q297_kendall_tau" ->
      """WITH wk AS (SELECT o_orderpriority AS grp,
                            (CAST(o_orderdate AS DATE)
                              - DATE '1992-01-01') // 7 AS w,
                            sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                                     * 100 AS BIGINT)) AS y
                     FROM orders GROUP BY 1, 2),
              cd AS (SELECT a.grp,
                            sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END) AS c,
                            sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS d,
                            sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS t
                     FROM wk a JOIN wk b
                       ON a.grp = b.grp AND a.w < b.w
                     GROUP BY 1)
         SELECT grp, CAST(c + d + t AS BIGINT) AS m,
                CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
                CAST(t AS BIGINT) AS t,
                CAST((((c - d) * 10000) - ((((((c - d) * 10000) % (c + d + t))
                      + (c + d + t)) % (c + d + t)))) // (c + d + t)
                     AS BIGINT) AS tau_a_bp
         FROM cd ORDER BY grp""",

    "q295_theil_sen" ->
      """WITH wk AS (SELECT o_orderpriority AS grp,
                            (CAST(o_orderdate AS DATE)
                              - DATE '1992-01-01') // 7 AS w,
                            sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                                     * 100 AS BIGINT)) AS y
                     FROM orders GROUP BY 1, 2),
              pr AS (SELECT a.grp, a.w AS w1, b.w AS w2,
                            (b.y - a.y) * 1000000 AS dy,
                            b.w - a.w AS dx
                     FROM wk a JOIN wk b
                       ON a.grp = b.grp AND a.w < b.w),
              sl AS (SELECT grp, w1, w2,
                            CAST((dy - (((dy % dx) + dx) % dx)) // dx
                                 AS BIGINT) AS slope
                     FROM pr),
              rk AS (SELECT grp, slope, w1, w2,
                            row_number() OVER (PARTITION BY grp
                              ORDER BY slope, w1, w2) AS rn,
                            count(*) OVER (PARTITION BY grp) AS m
                     FROM sl)
         SELECT grp, CAST(m AS BIGINT) AS n_pairs,
                slope AS med_slope_micro,
                CASE WHEN slope > 0 THEN 'up' WHEN slope < 0 THEN 'down'
                     ELSE 'flat' END AS trend
         FROM rk WHERE rn = (m + 1) // 2 ORDER BY grp""",

    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_quantity > 45 AND l_discount < 0.05 ORDER BY l_orderkey, l_linenumber""",
    "q03_project_arith" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
                l_orderkey % 7 AS bucket
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q04_sort_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""",
    "q05_agg_global" ->
      """SELECT cnt, cnt_ship,
                CAST(sqc AS DOUBLE) / 100 AS sum_qty,
                CAST((2 * spc * 100 + np) // (2 * np)
                     AS DOUBLE) / 10000 AS avg_price,
                min_price, max_price
         FROM (SELECT count(*) AS cnt, count(l_shipdate) AS cnt_ship,
                      sum(CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS sqc,
                      sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS spc,
                      count(l_extendedprice) AS np,
                      min(l_extendedprice) AS min_price,
                      max(l_extendedprice) AS max_price
               FROM lineitem)""",
    "q06_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sqc AS DOUBLE) / 100 AS sum_qty,
                CAST(sbc AS DOUBLE) / 100 AS sum_base,
                CAST(sdp4 AS DOUBLE) / 10000 AS sum_disc_price,
                CAST((2 * sqc * 100 + cnt) // (2 * cnt)
                     AS DOUBLE) / 10000 AS avg_qty,
                CAST((2 * sdc * 10000 + cnt) // (2 * cnt)
                     AS DOUBLE) / 1000000 AS avg_disc,
                cnt
         FROM (SELECT l_returnflag, l_linestatus,
                      sum(CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS sqc,
                      sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS sbc,
                      sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                               (CAST(1 AS DECIMAL(14,2)) -
                                CAST(l_discount AS DECIMAL(14,2))) * 10000
                               AS BIGINT)) AS sdp4,
                      sum(CAST(CAST(l_discount AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS sdc,
                      count(*) AS cnt
               FROM lineitem GROUP BY l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",
    "q07_agg_expr_key" ->
      """SELECT k, cnt,
                CAST(sqc AS DOUBLE) / 100 AS sum_qty,
                CAST((2 * spc * 100 + cnt) // (2 * cnt)
                     AS DOUBLE) / 10000 AS avg_price,
                min_qty, max_qty
         FROM (SELECT l_orderkey % 3 AS k, count(l_orderkey) AS cnt,
                      sum(CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS sqc,
                      sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                               AS BIGINT)) AS spc,
                      min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
               FROM lineitem GROUP BY 1)
         ORDER BY k""",
    "q08_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT l_partkey) AS n_part, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q09_having" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY o_orderpriority HAVING count(*) > 100
         ORDER BY o_orderpriority""",
    "q10_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q11_join_multi" ->
      """SELECT r_name, n_name,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                          (CAST(1 AS DECIMAL(14,2)) -
                           CAST(l_discount AS DECIMAL(14,2))) * 10000
                          AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
                count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q12_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                round(coalesce(sum(o_totalprice), 0), 2) AS spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q13_join_right" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_items
         FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "q14_join_full" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
              s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
         SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
                coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM c FULL JOIN s ON c_nationkey = s_nationkey ORDER BY nationkey""",
    "q15_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "q16_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "q17_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "q18_join_implicit" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
         FROM customer, orders
         WHERE c_custkey = o_custkey AND o_totalprice > 480000
         ORDER BY o_orderkey""",
    "q19_join_multikey" ->
      """WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk, count(*) AS n_lines,
                            round(sum(l_quantity), 2) AS tot_qty
                     FROM lineitem GROUP BY 1, 2)
         SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, tot_qty
         FROM lineitem JOIN ps ON l_partkey = pk AND l_suppkey = sk
         WHERE n_lines >= 2 ORDER BY l_orderkey, l_linenumber""",
    "q20_union_all" ->
      """SELECT c_nationkey AS nk, 'cust' AS side FROM customer
         UNION ALL SELECT s_nationkey AS nk, 'supp' AS side FROM supplier
         ORDER BY side, nk""",
    "q21_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",
    "q22_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",
    "q23_except" ->
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",
    "q24_cast" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(l_linenumber AS BIGINT) AS ln_big,
                CAST(l_orderkey AS VARCHAR) AS ok_str,
                CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q25_scalar_math" ->
      """SELECT p_partkey, abs(p_size - 25) AS abs_v,
                round(sin(CAST(p_size AS DOUBLE)), 6) AS sin_v,
                round(cos(CAST(p_size AS DOUBLE)), 6) AS cos_v,
                round(tan(CAST(p_size AS DOUBLE)), 6) AS tan_v,
                round(sqrt(p_retailprice), 6) AS sqrt_v,
                round(ln(p_retailprice), 6) AS ln_v,
                CAST(floor(p_retailprice) AS BIGINT) AS floor_v,
                CAST(ceil(p_retailprice) AS BIGINT) AS ceil_v
         FROM part ORDER BY p_partkey""",
    "q26_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS up_name, lower(c_name) AS lo_name,
                CAST(length(c_name) AS INTEGER) AS name_len,
                substr(c_name, 1, 8) AS name_pfx,
                c_name || '-' || c_mktsegment AS tagged,
                reverse(c_name) AS rev_name,
                regexp_replace(c_name, '0', '_', 'g') AS subbed,
                lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
                trim('  ' || c_name || '  ') AS trimmed
         FROM customer ORDER BY c_custkey""",
    "q27_case_null" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 300000 THEN 'high'
                     WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS band,
                nullif(o_orderstatus, 'O') AS st_or_null,
                coalesce(nullif(o_orderstatus, 'O'), 'open') AS st2,
                (o_totalprice > 300000 AND nullif(1, 1) = 1) AS kleene_and
         FROM orders ORDER BY o_orderkey""",
    "q28_window" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER w AS rn,
                  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
                  round(sum(o_totalprice) OVER
                    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
                  lag(o_totalprice, 1) OVER w AS prev_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
         ) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q29_subq_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
         ORDER BY o_orderkey""",
    "q30_subq_in" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
         ORDER BY p_partkey""",
    "q31_topk" ->
      """SELECT l_partkey, CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                          (CAST(1 AS DECIMAL(14,2)) -
                           CAST(l_discount AS DECIMAL(14,2))) * 10000
                          AS BIGINT)) AS DOUBLE) / 10000 AS revenue
         FROM lineitem GROUP BY l_partkey
         ORDER BY revenue DESC, l_partkey LIMIT 25""",
    "q32_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
                CAST(month(o_orderdate) AS INTEGER) AS mo,
                CAST(day(o_orderdate) AS INTEGER) AS dom,
                date_trunc('month', o_orderdate) AS mo_start
         FROM orders ORDER BY o_orderkey""",
    "q33_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q34_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q35_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q36_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(grouping(l_returnflag) AS INTEGER) AS g_rf
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus))
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q37_explode_tokens" ->
      """SELECT tok, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         WHERE length(tok) > 3
         GROUP BY tok ORDER BY n DESC, tok""",
    // banded oracle (r13): exact distinct counts replayed; the booleans
    // are Spark-side sketch-vs-exact band verdicts — DuckDB contributes
    // the literal true, so any in-band drift stays green and any
    // out-of-band sketch flips the hash red
    "q38_approx_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
                true AS hll_ok, true AS med_rank_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q39_array_agg" ->
      """SELECT l_orderkey,
                array_to_string(list(l_linenumber ORDER BY l_linenumber), ',')
                  AS linenums,
                round(sum(l_quantity), 2) AS tot_qty
         FROM lineitem WHERE l_orderkey < 100
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q50_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT))
                     AS DOUBLE) / 100 AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // bloom filtering must be result-invisible: the oracle is the plain join
    "q99_runtime_filter_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS DOUBLE) / 100 AS tot_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice > 490000
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    // the UNSALTED join — salting must be result-invisible; q116 (the AQE
    // twin) must produce the identical answer, so it shares this oracle
    // modulo the alias
    "q116_skew_aqe_join" ->
      """WITH f AS (SELECT l_returnflag,
                           sum(CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100
                                    AS BIGINT)) AS fqc,
                           count(*) AS fn
                    FROM lineitem GROUP BY l_returnflag)
         SELECT l.l_returnflag, count(*) AS n_above_avg
         FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
         WHERE CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT) * fn > fqc
         GROUP BY l.l_returnflag
         ORDER BY l.l_returnflag""",
    // the UNSALTED join — salting must be result-invisible
    "q86_skew_salted_join" ->
      """WITH f AS (SELECT l_returnflag,
                           sum(CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100
                                    AS BIGINT)) AS fqc,
                           count(*) AS fn
                    FROM lineitem GROUP BY l_returnflag)
         SELECT l.l_returnflag, count(*) AS n_above_avg
         FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
         WHERE CAST(CAST(l_quantity AS DECIMAL(14,2)) * 100 AS BIGINT) * fn > fqc
         GROUP BY l.l_returnflag
         ORDER BY l.l_returnflag""",
    "q58_window_suite" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume,
                CAST(dense_rank() OVER w AS INTEGER) AS drank,
                first_value(o_totalprice) OVER w AS min_price_so_far,
                round(avg(o_totalprice) OVER
                  (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
         FROM orders WHERE o_orderkey < 2000
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey""",
    "q59_date_arith" ->
      """SELECT o_orderkey, o_orderdate,
                CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_q,
                datediff('day', o_orderdate, DATE '1998-12-31') AS days_to_eoy,
                CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
                CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS dow,
                last_day(o_orderdate) AS month_end
         FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""",
    "q52_stats_agg" ->
      """SELECT l_returnflag,
                round(stddev_samp(l_quantity), 4) AS sd_qty,
                round(var_samp(l_quantity), 4) AS var_qty,
                round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
                round(avg(l_quantity), 4) AS avg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q53_range_join" ->
      """SELECT band, count(*) AS n,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS DOUBLE) / 100 AS sum_price
         FROM lineitem
         JOIN (VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 20.0),
                      ('mid', 20.0, 30.0), ('large', 30.0, 40.0),
                      ('huge', 40.0, 100.0)) AS bands(band, lo, hi)
           ON l_quantity >= lo AND l_quantity < hi
         GROUP BY band ORDER BY band""",
    "q69_decimal_money" ->
      """WITH t AS (SELECT l_returnflag,
                           CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                           CAST(l_discount AS DECIMAL(12,2)) AS disc
                    FROM lineitem)
         SELECT l_returnflag,
                CAST(CAST(sum(price) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price,
                CAST(CAST(sum(price * (1 - disc)) AS DECIMAL(18,4)) AS VARCHAR)
                  AS sum_disc_price,
                CAST(min(price) AS VARCHAR) AS min_price,
                CAST(max(price) AS VARCHAR) AS max_price,
                count(*) AS n
         FROM t GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q54_custom_udaf" ->
      """SELECT l_returnflag,
                round(exp(avg(ln(l_extendedprice))), 2) AS geo_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // All three fixed-point rounds replayed as a CTE chain ('//' is
    // DuckDB's floor division, Spark's DIV); HUGEINT sums cast back.
    "q131_pagerank" -> {
      val rounds = (1 to 3).map(k =>
        s"""r$k AS (SELECT dst AS node,
                           150000 + sum((r * 17) // (20 * deg)) AS r
                    FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.node
                    GROUP BY dst)""").mkString(", ")
      s"""WITH pairs AS (SELECT DISTINCT l_partkey * 2 AS p,
                                l_suppkey * 2 + 1 AS q
                         FROM lineitem),
              e AS (SELECT p AS src, q AS dst FROM pairs
                    UNION ALL SELECT q, p FROM pairs),
              deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
              ed AS (SELECT e.src, e.dst, deg.deg
                     FROM e JOIN deg USING (src)),
              r0 AS (SELECT src AS node, 1000000 AS r FROM deg),
              $rounds
         SELECT node, CAST(r AS BIGINT) AS r FROM r3 ORDER BY node"""
    },
    "q255_personalized_ppr" -> {
      def seed(node: String, m: Long) =
        s"CASE WHEN $node % 2 = 1 AND (($node - 1) // 2) % 10 = 0" +
          s" THEN $m ELSE 0 END"
      val rounds = (1 to 3).map(k =>
        s"""r$k AS (SELECT dst AS node,
                           ${seed("dst", 150000L)}
                             + sum((r * 17) // (20 * deg)) AS r
                    FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.node
                    GROUP BY dst)""").mkString(", ")
      s"""WITH pairs AS (SELECT DISTINCT l_partkey * 2 AS p,
                                l_suppkey * 2 + 1 AS q
                         FROM lineitem),
              e AS (SELECT p AS src, q AS dst FROM pairs
                    UNION ALL SELECT q, p FROM pairs),
              deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
              ed AS (SELECT e.src, e.dst, deg.deg
                     FROM e JOIN deg USING (src)),
              r0 AS (SELECT src AS node, ${seed("src", 1000000L)} AS r
                     FROM deg),
              $rounds
         SELECT node, CAST(r AS BIGINT) AS r FROM r3 ORDER BY node"""
    },
    "q260_pareto_frontier" ->
      """WITH p AS (SELECT p_partkey,
                           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                                AS BIGINT) AS cents,
                           CAST(p_size AS BIGINT) AS sz
                    FROM part),
              g AS (SELECT cents, max(sz) AS gmax FROM p GROUP BY 1),
              pre AS (SELECT cents, gmax,
                             coalesce(max(gmax) OVER (ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), -1) AS pmax
                      FROM g)
         SELECT p.p_partkey, p.cents, p.sz
         FROM p JOIN pre USING (cents)
         WHERE p.sz = pre.gmax AND p.sz > pre.pmax
         ORDER BY p.cents, p.p_partkey""",
    "q266_corr_matrix" -> {
      val vs = Seq("qty", "price_c", "disc_c", "tax_c")
      val prs = for {
        i <- vs.indices; j <- (i + 1) until vs.size
      } yield (vs(i), vs(j))
      val moments = ("count(*)::HUGEINT AS n" +:
        (vs.map(v => s"sum($v::HUGEINT) AS s_$v") ++
          vs.map(v => s"sum($v::HUGEINT * $v) AS q_${v}_$v") ++
          prs.map { case (a, b) =>
            s"sum($a::HUGEINT * $b) AS q_${a}_$b" })).mkString(", ")
      def corr(a: String, b: String) =
        s"""CASE WHEN n * q_${a}_$a - s_$a * s_$a = 0
                   OR n * q_${b}_$b - s_$b * s_$b = 0
                 THEN CAST(NULL AS DOUBLE)
                 ELSE round(CAST(n * q_${a}_$b - s_$a * s_$b AS DOUBLE)
                      / sqrt(CAST(n * q_${a}_$a - s_$a * s_$a AS DOUBLE)
                        * CAST(n * q_${b}_$b - s_$b * s_$b AS DOUBLE)), 4)
                 END"""
      val rows = prs.map { case (a, b) =>
        s"SELECT '$a~$b' AS pair, CAST(n AS BIGINT) AS n," +
          s" ${corr(a, b)} AS corr4 FROM m" }.mkString(" UNION ALL ")
      s"""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
                            CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                                 * 100 AS BIGINT) AS price_c,
                            CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
                                 AS BIGINT) AS disc_c,
                            CAST(CAST(l_tax AS DECIMAL(12,2)) * 100
                                 AS BIGINT) AS tax_c
                     FROM lineitem),
              m AS (SELECT $moments FROM b)
         $rows ORDER BY pair"""
    },
    "q267_assortativity" ->
      s"""WITH $duckCoSupplyUnd,
              gdeg AS (SELECT u, count(*) AS gd FROM und GROUP BY 1),
              pr AS (SELECT gu.gd AS du, gv.gd AS dv
                     FROM und JOIN gdeg gu ON und.u = gu.u
                              JOIN gdeg gv ON und.v = gv.u),
              m AS (SELECT count(*)::HUGEINT AS n,
                           sum(du::HUGEINT) AS su, sum(dv::HUGEINT) AS sv,
                           sum(du::HUGEINT * du) AS suu,
                           sum(dv::HUGEINT * dv) AS svv,
                           sum(du::HUGEINT * dv) AS suv
                    FROM pr)
         SELECT CAST(n AS BIGINT) AS n_edges,
                CASE WHEN n * suu - su * su = 0 OR n * svv - sv * sv = 0
                     THEN CAST(NULL AS DOUBLE)
                     ELSE round(CAST(n * suv - su * sv AS DOUBLE)
                          / sqrt(CAST(n * suu - su * su AS DOUBLE)
                            * CAST(n * svv - sv * sv AS DOUBLE)), 4)
                     END AS assort4
         FROM m""",
    "q271_unpivot" ->
      """WITH w AS (SELECT o_orderpriority,
                           count(CASE WHEN o_orderstatus = 'F'
                                 THEN 1 END) AS n_f,
                           count(CASE WHEN o_orderstatus = 'O'
                                 THEN 1 END) AS n_o,
                           count(CASE WHEN o_orderstatus = 'P'
                                 THEN 1 END) AS n_p
                    FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, metric, CAST(v AS BIGINT) AS v FROM (
           SELECT o_orderpriority, 'n_f' AS metric, n_f AS v FROM w
           UNION ALL
           SELECT o_orderpriority, 'n_o', n_o FROM w
           UNION ALL
           SELECT o_orderpriority, 'n_p', n_p FROM w)
         ORDER BY o_orderpriority, metric""",
    "q275_topk_with_ties" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey,
                           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                AS BIGINT) AS cents,
                           rank() OVER (PARTITION BY o_orderpriority
                                        ORDER BY CAST(CAST(o_totalprice
                                          AS DECIMAL(12,2)) * 100
                                          AS BIGINT) DESC) AS rk
                    FROM orders)
         SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey,
                cents
         FROM r WHERE rk <= 3
         ORDER BY o_orderpriority, rk, o_orderkey""",
    "q276_median_of_means" ->
      """WITH sh AS (SELECT ('0x' || substr(md5('mm:' || o_orderkey),
                              1, 8))::BIGINT % 16 AS shard,
                            CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                 * 100 AS BIGINT) AS cents
                     FROM orders),
              means AS (SELECT shard, count(*) AS n, sum(cents) AS tc,
                               CAST((2 * sum(cents) + count(*))
                                    // (2 * count(*)) AS BIGINT)
                                 AS mean_c
                        FROM sh GROUP BY shard),
              r AS (SELECT mean_c, row_number() OVER
                      (ORDER BY mean_c, shard) AS rn
                    FROM means),
              mom AS (SELECT mean_c AS mom_cents FROM r WHERE rn = 8),
              g AS (SELECT count(*) AS n_rows,
                           CAST((2 * sum(cents) + count(*))
                                // (2 * count(*)) AS BIGINT) AS mean_cents
                    FROM sh)
         SELECT CAST(n_rows AS BIGINT) AS n_rows, mean_cents,
                CAST(abs(mean_cents - mom_cents) AS BIGINT) AS gap_cents,
                CAST(mom_cents AS BIGINT) AS mom_cents
         FROM g, mom""",
    "q283_cluster_by" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
         FROM lineitem WHERE l_orderkey < 200
         ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    "q284_try_arithmetic" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_div0,
                CAST(sum(CASE WHEN l_orderkey % 1000 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_overflow,
                CAST(sum(CASE WHEN l_orderkey % 1000 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_badcast
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q134_triangle_count" ->
      s"""WITH $duckCoSupplyUnd,
              gdeg AS (SELECT u, count(*) AS gd FROM und GROUP BY 1),
              dir AS (SELECT und.u, und.v, gv.gd AS gdv
                      FROM und JOIN gdeg gu ON und.u = gu.u
                               JOIN gdeg gv ON und.v = gv.u
                      WHERE gu.gd < gv.gd
                         OR (gu.gd = gv.gd AND und.u < und.v)),
              tri AS (SELECT e1.u AS na, e1.v AS nb, e2.v AS nc
                      FROM dir e1 JOIN dir e2 ON e1.u = e2.u
                       AND (e1.gdv < e2.gdv
                            OR (e1.gdv = e2.gdv AND e1.v < e2.v))
                      WHERE EXISTS (SELECT 1 FROM dir e3
                                    WHERE e3.u = e1.v AND e3.v = e2.v)),
              nodes AS (SELECT na AS supplier FROM tri
                        UNION ALL SELECT nb FROM tri
                        UNION ALL SELECT nc FROM tri)
         SELECT supplier, count(*) AS n_tri
         FROM nodes GROUP BY 1 ORDER BY supplier""",
    "q145_pit_lookup" ->
      """WITH v0 AS (SELECT o_custkey AS custkey, o_orderdate AS vdate,
                            sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                                     * 100 AS BIGINT)) AS day_cents
                     FROM orders GROUP BY 1, 2),
              v AS (SELECT custkey, vdate,
                           CAST(sum(day_cents) OVER
                             (PARTITION BY custkey ORDER BY vdate
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS spend_cents
                    FROM v0),
              f AS (SELECT l.l_orderkey, l.l_linenumber,
                           o.o_custkey AS custkey, l.l_shipdate AS ship_date
                    FROM lineitem l JOIN orders o
                      ON l.l_orderkey = o.o_orderkey)
         SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ship_date,
                coalesce(v.spend_cents, 0) AS spend_asof_cents
         FROM f ASOF LEFT JOIN v
           ON f.custkey = v.custkey AND f.ship_date >= v.vdate
         ORDER BY f.l_orderkey, f.l_linenumber""",
    // HUGEINT sums mirror Spark's DECIMAL(38,0) ladder; both render the
    // slope fraction as plain digit strings (representation-stable).
    "q165_group_trend_ols" ->
      """WITH b AS (SELECT o_orderpriority AS grp,
                           datediff('day', DATE '1992-01-01',
                                    CAST(o_orderdate AS DATE)) AS day,
                           CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                                AS BIGINT) AS cents
                    FROM orders),
              c AS (SELECT grp,
                           CAST(day - min(day) OVER (PARTITION BY grp)
                                AS HUGEINT) AS x,
                           CAST(cents AS HUGEINT) AS y
                    FROM b),
              a AS (SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                           sum(x * y) AS sxy, sum(x * x) AS sxx
                    FROM c GROUP BY grp)
         SELECT grp, CAST(n AS BIGINT) AS n,
                CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
                CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den,
                CASE WHEN n * sxy - sx * sy > 0 THEN 'up'
                     WHEN n * sxy - sx * sy < 0 THEN 'down'
                     ELSE 'flat' END AS trend
         FROM a ORDER BY grp""",
    "q170_ks_test" ->
      """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                               AS BIGINT) AS cents,
                          CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                               ELSE 0 END AS g1,
                          CASE WHEN o_orderpriority = '5-LOW' THEN 1
                               ELSE 0 END AS g2
                   FROM orders
                   WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             per AS (SELECT cents, CAST(sum(g1) AS BIGINT) AS c1,
                            CAST(sum(g2) AS BIGINT) AS c2
                     FROM o GROUP BY cents),
             cum AS (SELECT cents,
                            sum(c1) OVER (ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum1,
                            sum(c2) OVER (ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum2
                     FROM per),
             tot AS (SELECT CAST(sum(g1) AS BIGINT) AS n1,
                            CAST(sum(g2) AS BIGINT) AS n2 FROM o),
             d AS (SELECT n1, n2,
                          CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT)
                            AS d_num
                   FROM cum CROSS JOIN tot GROUP BY n1, n2)
        SELECT n1, n2, d_num,
               CAST((10000 * d_num) // (n1 * n2) AS BIGINT) AS d_bp,
               (10000 * CAST(d_num AS HUGEINT) * d_num >
                18441 * CAST(n1 + n2 AS HUGEINT) * n1 * n2) AS reject_h0
        FROM d""",
    "q174_frequent_pairs" ->
      """WITH b AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k,
                           CAST(l_partkey AS BIGINT) AS p
                    FROM lineitem),
              nb AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n_baskets
                     FROM b),
              item AS (SELECT p, CAST(count(*) AS BIGINT) AS ci
                       FROM b GROUP BY p),
              pr AS (SELECT a.p AS pa, x.p AS pb,
                            CAST(count(*) AS BIGINT) AS support
                     FROM b a JOIN b x ON a.k = x.k AND a.p < x.p
                     GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT pa, pb, support, ua.ci AS ca, ub.ci AS cb,
                CAST((2 * support * n_baskets * 1000000 + (ua.ci * ub.ci))
                     // (2 * (ua.ci * ub.ci)) AS BIGINT) AS lift_micro
         FROM pr JOIN item ua ON pr.pa = ua.p
                 JOIN item ub ON pr.pb = ub.p
                 CROSS JOIN nb
         ORDER BY support DESC, pa, pb""",
    // the exact Spark query text, re-pointed at the parquet view — one
    // string, two engines, equal rows
    "q191_recursive_cte" -> bomClosureSql("part"),
    "q192_pipe_syntax" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(rev4) AS BIGINT) AS rev4_sum,
                CAST(min(rev4) AS BIGINT) AS rev4_min
         FROM (SELECT l_returnflag, l_linestatus,
                      CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                           (CAST(1 AS DECIMAL(14,2)) -
                            CAST(l_discount AS DECIMAL(14,2))) * 10000
                           AS BIGINT) AS rev4
               FROM lineitem WHERE l_discount > 0.02)
         GROUP BY 1, 2 HAVING count(*) > 50
         ORDER BY l_returnflag, l_linestatus""",
    // lower()-grouping replays the UTF8_LCASE groups exactly (ASCII corpus)
    "q197_collation_group" ->
      """SELECT lower(CASE WHEN p_partkey % 2 = 1 THEN upper(p_name)
                           ELSE p_name END) AS name,
                count(*) AS n, min(p_partkey) AS min_key
         FROM part GROUP BY 1 ORDER BY name""",
    "q201_group_order_all" -> groupAllSql("lineitem"),
    "q202_lateral_topk" -> lateralTopkSql("documents"),
    // the function body inlined by hand — what Spark's analyzer does
    "q206_sql_udf" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                  (CAST(1 AS DECIMAL(14,2)) -
                   CAST(l_discount AS DECIMAL(14,2))) * 10000 AS BIGINT))
                  AS BIGINT) AS net_e4,
                CAST(max(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
                  (CAST(1 AS DECIMAL(14,2)) -
                   CAST(l_discount AS DECIMAL(14,2))) * 10000 AS BIGINT))
                  AS BIGINT) AS max_e4
         FROM lineitem WHERE l_quantity > 10
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    // three synchronous rounds replayed as chained CTEs over the SAME
    // shared edge derivation q134's oracle uses
    "q208_label_propagation" -> {
      def round(prev: String, cur: String) =
        s"""r$cur AS (SELECT e.u, l.lbl, count(*) AS c
                      FROM und e JOIN $prev l ON e.v = l.node
                      GROUP BY 1, 2),
              $cur AS (SELECT u AS node, lbl
                       FROM (SELECT u, lbl, row_number() OVER (
                               PARTITION BY u ORDER BY c DESC, lbl) AS rn
                             FROM r$cur)
                       WHERE rn = 1)"""
      s"""WITH $duckCoSupplyUnd,
              l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und),
              ${round("l0", "l1")},
              ${round("l1", "l2")},
              ${round("l2", "l3")}
         SELECT node, lbl AS community FROM l3 ORDER BY node"""
    },
    // full two-alternation replay in the same integer pico-units; DuckDB's
    // BIGINT sums widen to HUGEINT internally but every materialized value
    // fits BIGINT, so the final CASTs line up
    "q212_hits" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS sup, l_partkey AS prt
                    FROM lineitem),
              a1r AS (SELECT prt, count(*) * 1000000000000 AS v
                      FROM e GROUP BY 1),
              d1 AS (SELECT GREATEST(1, sum(v) // 1000000000000) AS dvr
                     FROM a1r),
              a1 AS (SELECT prt, v // dvr AS v FROM a1r, d1),
              h1r AS (SELECT sup, sum(a1.v) AS v
                      FROM e JOIN a1 USING (prt) GROUP BY 1),
              d2 AS (SELECT GREATEST(1, sum(v) // 1000000000000) AS dvr
                     FROM h1r),
              h1 AS (SELECT sup, v // dvr AS v FROM h1r, d2),
              a2r AS (SELECT prt, sum(h1.v) AS v
                      FROM e JOIN h1 USING (sup) GROUP BY 1),
              d3 AS (SELECT GREATEST(1, sum(v) // 1000000000000) AS dvr
                     FROM a2r),
              a2 AS (SELECT prt, v // dvr AS v FROM a2r, d3)
         SELECT CAST(row_number() OVER (ORDER BY v DESC, prt) AS INTEGER)
                  AS rank,
                prt AS partkey, CAST(v AS BIGINT) AS authority
         FROM a2 ORDER BY v DESC, prt LIMIT 20""",
    "q219_observe_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS tot_chars,
                CAST(max(n_chars) AS BIGINT) AS max_chars,
                CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_kept
         FROM documents""",
    "q220_parameterized_sql" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem WHERE l_quantity >= 30
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q240_bfs_hops" -> {
      // Four frontier rounds as a CTE chain — same synchronous BFS the
      // Spark loop runs, so hop assignment is bit-identical. Rounds are
      // MATERIALIZED (q243's lesson): default inlining re-evaluates the
      // lineitem-distinct edge derivation once per reference, ~3^rounds
      // times through the chain.
      val rounds = (1 to 4).map { r =>
        s"""f$r AS MATERIALIZED (SELECT DISTINCT dst AS node
                    FROM edges JOIN f${r - 1} ON src = f${r - 1}.node
                    WHERE dst NOT IN (SELECT node FROM v${r - 1})),
            v$r AS MATERIALIZED (SELECT node, hop FROM v${r - 1}
                    UNION ALL SELECT node, $r FROM f$r)"""
      }.mkString(",\n            ")
      s"""WITH pairs AS MATERIALIZED (SELECT DISTINCT l_partkey * 2 AS p,
                                l_suppkey * 2 + 1 AS q FROM lineitem),
              edges AS MATERIALIZED (SELECT p AS src, q AS dst FROM pairs
                        UNION ALL SELECT q, p FROM pairs),
              nodes AS MATERIALIZED (SELECT DISTINCT src AS node
                                     FROM edges),
              f0 AS MATERIALIZED (SELECT node FROM nodes
                     WHERE node < 10 AND node % 2 = 0),
              v0 AS MATERIALIZED (SELECT node, 0 AS hop FROM f0),
              $rounds
         SELECT CAST(coalesce(hop, -1) AS BIGINT) AS hop,
                CAST(count(*) AS BIGINT) AS n_nodes
         FROM nodes LEFT JOIN v4 ON nodes.node = v4.node
         GROUP BY 1 ORDER BY hop"""
    },
    "q243_kcore_peel" -> {
      // Same 4 peel rounds as the Spark loop, each a deg/keep/edges CTE
      // triple off the shared significant-co-supply edge chain. Every
      // round CTE is MATERIALIZED: the chain references each previous
      // round several times, and DuckDB's default CTE inlining would
      // re-evaluate the expensive co-supply self-join once per
      // reference — exponentially across 4 rounds (observed as a
      // minutes-long hang at sf0.1 before materialization).
      val rounds = (1 to 4).map { r =>
        val src = if (r == 1) "undm" else s"e${r - 1}"
        s"""deg$r AS MATERIALIZED (SELECT u, count(*) AS dg FROM $src
                                   GROUP BY 1),
            keep$r AS MATERIALIZED (SELECT u FROM deg$r, kk
                                    WHERE dg >= kk.k),
            s$r AS (SELECT $r AS round,
                           (SELECT count(*) FROM deg$r, kk
                            WHERE dg >= kk.k) AS n_alive,
                           (SELECT count(*) FROM deg$r, kk
                            WHERE dg < kk.k) AS n_removed),
            e$r AS MATERIALIZED (SELECT e.u, e.v FROM $src e
                    JOIN keep$r a ON e.u = a.u
                    JOIN keep$r b ON e.v = b.u)"""
      }.mkString(",\n            ")
      val un = (1 to 4).map(r =>
        s"SELECT round, n_alive, n_removed FROM s$r")
        .mkString("\n            UNION ALL ")
      s"""WITH $duckCoSupplyUnd,
              undm AS MATERIALIZED (SELECT u, v FROM und),
              kk AS MATERIALIZED (SELECT count(*) // count(DISTINCT u) + 1
                                    AS k
                                  FROM undm),
              $rounds
         SELECT CAST(round AS INTEGER) AS round,
                CAST(n_alive AS BIGINT) AS n_alive,
                CAST(n_removed AS BIGINT) AS n_removed
         FROM ($un) ORDER BY round"""
    },
    "q244_rank_windows" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
                           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT) AS cents
                    FROM orders),
              r AS (SELECT o_orderpriority, cents,
                           ntile(4) OVER w AS q,
                           CAST(row_number() OVER w AS BIGINT) AS rn,
                           count(*) OVER (PARTITION BY o_orderpriority)
                             AS cnt
                    FROM o
                    WINDOW w AS (PARTITION BY o_orderpriority
                                 ORDER BY cents, o_orderkey))
         SELECT o_orderpriority, CAST(q AS INTEGER) AS q,
                CAST(count(*) AS BIGINT) AS n,
                CAST(min(cents) AS BIGINT) AS min_cents,
                CAST(max(cents) AS BIGINT) AS max_cents,
                CAST(max(CASE WHEN cnt = 1 THEN 0
                         ELSE (2 * (rn - 1) * 10000 + (cnt - 1))
                              // (2 * (cnt - 1)) END) AS BIGINT)
                  AS max_pr_bp,
                CAST(max((2 * rn * 10000 + cnt) // (2 * cnt)) AS BIGINT)
                  AS max_cume_bp
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    // q339: DuckDB has no add_months/next_day — `+ INTERVAL 1 MONTH`
    // clamps identically; next-Monday is the isodow congruence with
    // the 0 → 7 remap so Monday maps strictly forward.
    "q339_billing_cycles" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders),
              e AS (SELECT od,
                           od + INTERVAL 1 MONTH AS bill,
                           last_day(od) AS eom,
                           od + CAST(CASE WHEN (8 - isodow(od)) % 7 = 0
                                          THEN 7
                                          ELSE (8 - isodow(od)) % 7 END
                                     AS INTEGER) * INTERVAL 1 DAY
                             AS cutoff
                    FROM o)
         SELECT strftime(bill, '%Y-%m') AS bill_month,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CASE WHEN day(bill) < day(od)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
                CAST(sum(CASE WHEN od = CAST(eom AS DATE)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_eom,
                CAST(sum(date_diff('day', od, CAST(cutoff AS DATE)))
                     AS BIGINT) AS sum_cutoff_days
         FROM e GROUP BY 1 ORDER BY 1""",

    // q340: DuckDB's skewness/kurtosis ARE the sample estimators the
    // Spark side converts its population moments into.
    "q340_moment_stats" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                round(skewness(l_extendedprice), 5) AS skew_sample,
                round(kurtosis(l_extendedprice), 5) AS kurt_sample
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q341_contract_checks" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(count_if(l_discount > 0.05) AS BIGINT)
                  AS n_discounted,
                CAST(count_if(l_extendedprice > 50000) AS BIGINT)
                  AS n_big_tickets,
                bool_and(l_quantity >= 1 AND l_quantity <= 50)
                  AS qty_in_contract,
                bool_or(l_discount > 0.09) AS any_deep_discount,
                bool_and(l_shipdate >= DATE '1992-01-01')
                  AS ship_after_epoch
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // q342: width_bucket replayed as the floor identity — exact
    // because the bucket width 2048 is a power of two.
    "q342_price_histogram" ->
      """WITH b AS (SELECT CASE WHEN l_extendedprice < 0 THEN 0
                               WHEN l_extendedprice >= 131072 THEN 65
                               ELSE CAST(floor(l_extendedprice / 2048)
                                         AS BIGINT) + 1 END AS bucket
                    FROM lineitem),
              h AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(n AS BIGINT) AS n,
                CAST(sum(n) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_n,
                CAST((sum(n) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      * 1000000) // (sum(n) OVER ()) AS BIGINT)
                  AS cum_ppm
         FROM h ORDER BY bucket""",

    // q344: the oracle brute-forces the full n² min with the same
    // md5-derived coordinates and the same d²·10⁶+id tie packing —
    // the grid+escalation path must land on the identical optimum.
    "q344_grid_nearest_neighbor" ->
      """WITH p AS (SELECT c_custkey AS id,
                           CAST(('0x' || substr(md5(
                                CAST(c_custkey AS VARCHAR)), 1, 8))
                                AS BIGINT) % 1000000 AS x,
                           CAST(('0x' || substr(md5(
                                CAST(c_custkey AS VARCHAR)), 9, 8))
                                AS BIGINT) % 1000000 AS y
                    FROM customer),
              m AS (SELECT a.id,
                           min(((b.x - a.x) * (b.x - a.x)
                                + (b.y - a.y) * (b.y - a.y)) * 1000000
                               + b.id) AS pack
                    FROM p a JOIN p b ON a.id <> b.id
                    GROUP BY a.id)
         SELECT id, CAST(pack // 1000000 AS BIGINT) AS d2,
                CAST(pack % 1000000 AS BIGINT) AS nn_id,
                pack // 1000000 < 3906250000 AS certified
         FROM m ORDER BY id""",

    // q345: exact COUNT(DISTINCT) proves the bitmaps lossless; the
    // bucket number is 1 + floor((key-1)/32768) — FLOOR, not DuckDB's
    // truncating //, so key 0 lands in bucket 0 exactly like Spark.
    "q345_bitmap_distinct" ->
      """SELECT o_orderpriority,
                CAST(count(DISTINCT o_custkey) AS BIGINT)
                  AS n_distinct_custs,
                CAST(count(DISTINCT 1 + CAST(floor((o_custkey - 1)
                       / 32768.0) AS BIGINT)) AS BIGINT)
                  AS n_buckets
         FROM orders GROUP BY 1 ORDER BY 1""",

    // q347: DuckDB's GROUPING_ID takes the columns explicitly; the
    // bit semantics (1 = aggregated away, first column = high bit)
    // match Spark's zero-arg grouping_id().
    "q347_grouping_provenance" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
                coalesce(o_orderpriority, 'ALL') AS priority,
                CAST(GROUPING_ID(n_name, o_orderpriority) AS BIGINT)
                  AS gid,
                CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS BIGINT) AS cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name, o_orderpriority)
         ORDER BY gid, nation, priority""",

    // q349: the oracle never parses XML — it computes the rollup from
    // the base columns, which is exactly what the parse must recover.
    "q349_xml_ingest" ->
      """SELECT o_orderpriority AS priority,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS BIGINT) AS cents,
                CAST(sum(o_orderkey) AS BIGINT) AS sum_ids,
                CAST(count_if(o_orderkey % 97 = 0) AS BIGINT)
                  AS n_xpath_agree
         FROM orders GROUP BY 1 ORDER BY 1""",

    // q355: the same query in ordinary nested SQL — pipe syntax must
    // be pure surface, zero semantic difference.
    "q355_pipe_syntax" ->
      """SELECT n_name,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS BIGINT) AS cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_totalprice > 1000
         GROUP BY n_name
         HAVING count(*) >= 10
         ORDER BY n_name""",

    // q365: same md5 ring, same collision check.
    "q365_negative_sampling" ->
      """WITH pos AS (SELECT DISTINCT o_custkey AS u,
                             l_partkey AS pk
                      FROM orders JOIN lineitem
                        ON o_orderkey = l_orderkey),
              np AS (SELECT count(*) AS np FROM part),
              c AS (SELECT c_custkey AS u,
                           CAST(unnest(generate_series(1, 3))
                                AS INTEGER) AS k
                    FROM customer),
              cand AS (SELECT u, k,
                              CAST(('0x' || substr(md5(concat(
                                   CAST(u AS VARCHAR), '#',
                                   CAST(k AS VARCHAR))), 1, 8))
                                   AS BIGINT) % np AS cand
                       FROM c CROSS JOIN np),
              j AS (SELECT cand.u AS u, cand.cand,
                           (pk IS NOT NULL) AS collision
                    FROM cand LEFT JOIN pos
                      ON cand.u = pos.u AND cand.cand = pos.pk)
         SELECT u, CAST(count_if(NOT collision) AS BIGINT)
                  AS n_neg_clean,
                CAST(count_if(collision) AS BIGINT) AS n_collisions,
                CAST(sum(cand) AS BIGINT) AS cand_checksum
         FROM j GROUP BY 1 ORDER BY 1""",

    // q366: quantile_cont is the same type-7 interpolation; FILTER
    // syntax is shared verbatim.
    "q366_ordered_set_aggs" ->
      """SELECT o_orderpriority,
                CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                     AS BIGINT) AS n_big,
                round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
                round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
                round(avg(o_totalprice)
                      FILTER (WHERE o_totalprice > 100000), 2)
                  AS avg_big
         FROM orders GROUP BY 1 ORDER BY 1""",

    // q367: the oracle is pure length arithmetic — AES-ECB+PKCS is
    // (⌊len/16⌋+1)·16 bytes, base64 is 4·⌈bytes/3⌉ chars.
    "q367_encrypted_column" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
                CAST(sum((length(c_name) // 16 + 1) * 16) AS BIGINT)
                  AS ct_bytes,
                CAST(sum(4 * (((length(c_name) // 16 + 1) * 16 + 2)
                              // 3)) AS BIGINT) AS b64_chars
         FROM customer GROUP BY 1 ORDER BY 1""",

    // q368: same four cells, same md5 ring, same exact-cents means.
    "q368_did_estimator" ->
      """WITH c AS (SELECT
                      CAST(('0x' || substr(md5(CAST(o_custkey
                           AS VARCHAR)), 1, 4)) AS BIGINT) % 2
                        AS variant,
                      CASE WHEN year(o_orderdate) >= 1998 THEN 'post'
                           ELSE 'pre' END AS period,
                      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT) AS cents
                    FROM orders),
              g AS (SELECT variant, period, count(*) AS n,
                           sum(cents) AS sc
                    FROM c GROUP BY 1, 2)
         SELECT round(
                  (SELECT CAST(sc AS DOUBLE) / n FROM g
                   WHERE variant = 1 AND period = 'post')
                - (SELECT CAST(sc AS DOUBLE) / n FROM g
                   WHERE variant = 1 AND period = 'pre')
                - (SELECT CAST(sc AS DOUBLE) / n FROM g
                   WHERE variant = 0 AND period = 'post')
                + (SELECT CAST(sc AS DOUBLE) / n FROM g
                   WHERE variant = 0 AND period = 'pre'), 2)
                  AS did_cents,
                (SELECT CAST(sum(n) AS BIGINT) FROM g) AS n_orders,
                (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_cells""",

    // q369: same lifetime buckets, same reverse-cumulative risk set,
    // same exp-sum-ln product with the terminal ln(0) factor excluded.
    "q369_kaplan_meier" ->
      """WITH life AS (
           SELECT o_custkey,
                  date_diff('day', min(o_orderdate), max(o_orderdate))
                    // 28 AS t,
                  CASE WHEN max(o_orderdate) < TIMESTAMP '2001-01-01'
                       THEN 1 ELSE 0 END AS ev
           FROM orders GROUP BY o_custkey),
         by_t AS (
           SELECT t, CAST(count_if(ev = 1) AS BIGINT) AS d,
                  CAST(count(*) AS BIGINT) AS tot
           FROM life GROUP BY t),
         risk AS (
           SELECT t, d,
                  CAST(sum(tot) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
           FROM by_t),
         curve AS (
           SELECT t, d, n_risk,
                  round(exp(sum(CASE WHEN d < n_risk
                         THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk) END)
                       OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)), 6) AS survival
           FROM risk)
         SELECT t, n_risk, d AS n_events, survival
         FROM curve WHERE d > 0 AND d < n_risk ORDER BY t""",

    // q370: identical integer nano-nat walk; only the md5-ring spelling
    // differs by dialect.
    "q370_sprt_ab" ->
      """WITH t AS (
           SELECT CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                       AS BIGINT) AS seq,
                  CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS x
           FROM orders
           WHERE CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                       1, 4)) AS BIGINT) % 2 = 1),
         llr AS (
           SELECT seq,
                  CAST(sum(CASE WHEN x = 1 THEN 74107972
                           ELSE -223143551 END)
                       OVER (ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS llr_nano
           FROM t)
         SELECT CAST(count(*) AS BIGINT) AS n_trials,
                max_by(llr_nano, seq) AS llr_final,
                min(seq) FILTER (WHERE abs(llr_nano) >= 2944438979)
                  AS n_at_decision,
                min_by(llr_nano, seq)
                  FILTER (WHERE abs(llr_nano) >= 2944438979)
                  AS llr_at_decision,
                CASE WHEN count(*)
                          FILTER (WHERE abs(llr_nano) >= 2944438979) = 0
                     THEN 'continue'
                     WHEN min_by(llr_nano, seq)
                          FILTER (WHERE abs(llr_nano) >= 2944438979) > 0
                     THEN 'accept_h1' ELSE 'accept_h0' END AS decision
         FROM llr""",

    // q371: the four relaxation rounds replayed as a CTE chain —
    // min-rollup per round over (carry ∪ one-hop extensions).
    "q371_bellman_ford" ->
      """WITH pairs AS (
           SELECT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS q,
                  CAST(min(l_quantity) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
         edges AS (
           SELECT p AS src, q AS dst, w FROM pairs
           UNION ALL SELECT q, p, w FROM pairs),
         d0 AS (
           SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
           FROM edges WHERE src < 10 AND src % 2 = 0),
         r1 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d0
           UNION ALL SELECT e.dst, d.dist + e.w FROM d0 d
           JOIN edges e ON d.node = e.src) GROUP BY node),
         r2 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM r1
           UNION ALL SELECT e.dst, d.dist + e.w FROM r1 d
           JOIN edges e ON d.node = e.src) GROUP BY node),
         r3 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM r2
           UNION ALL SELECT e.dst, d.dist + e.w FROM r2 d
           JOIN edges e ON d.node = e.src) GROUP BY node),
         r4 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM r3
           UNION ALL SELECT e.dst, d.dist + e.w FROM r3 d
           JOIN edges e ON d.node = e.src) GROUP BY node),
         nodes AS (SELECT DISTINCT src AS node FROM edges)
         SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(count(r.node) AS BIGINT) AS n_reached,
                CAST(sum(r.dist) AS BIGINT) AS sum_dist,
                CAST(max(r.dist) AS BIGINT) AS max_dist,
                CAST(count_if(r.dist = 0) AS BIGINT) AS n_seeds
         FROM nodes n LEFT JOIN r4 r ON n.node = r.node""",

    // q372: same integer cross-multiplied crossing test, same literal
    // pentagon; only the md5-hex spelling differs by dialect.
    "q372_point_in_polygon" ->
      """WITH pts AS (
           SELECT c_custkey, c_nationkey,
                  CAST(('0x' || substr(md5('x#' ||
                       CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 10000 AS px,
                  CAST(('0x' || substr(md5('y#' ||
                       CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 10000 AS py
           FROM customer),
         poly(x1, y1, x2, y2) AS (VALUES
           (2000, 1000, 8000, 2000), (8000, 2000, 9000, 7000),
           (9000, 7000, 5000, 9500), (5000, 9500, 1000, 6000),
           (1000, 6000, 2000, 1000)),
         hits AS (
           SELECT c_custkey, c_nationkey,
                  sum(CASE WHEN (y1 > py) <> (y2 > py)
                            AND (CASE WHEN y2 > y1
                                 THEN (px - x1) * (y2 - y1)
                                    < (x2 - x1) * (py - y1)
                                 ELSE (px - x1) * (y2 - y1)
                                    > (x2 - x1) * (py - y1) END)
                           THEN 1 ELSE 0 END) AS nc
           FROM pts CROSS JOIN poly
           GROUP BY 1, 2)
         SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
                CAST(count_if(nc % 2 = 1) AS BIGINT) AS n_inside
         FROM hits GROUP BY 1 ORDER BY 1""",

    // q373: DuckDB's levenshtein is the same unit-cost edit distance.
    "q373_levenshtein_block" ->
      """WITH names AS (
           SELECT p_name, split_part(p_name, ' ', 2) AS noun,
                  CAST(count(*) AS BIGINT) AS n_parts
           FROM part GROUP BY 1, 2),
         pairs AS (
           SELECT a.p_name AS name_a, b.p_name AS name_b,
                  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                    AS dist,
                  a.n_parts AS parts_a, b.n_parts AS parts_b
           FROM names a JOIN names b
             ON a.noun = b.noun AND a.p_name < b.p_name
           WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
             AND levenshtein(a.p_name, b.p_name) <= 2)
         SELECT name_a, name_b, dist, parts_a, parts_b
         FROM pairs ORDER BY name_a, name_b""",

    // q375: epoch() is unix_timestamp under the UTC session — the
    // composite sequence key is the same BIGINT in both engines.
    "q375_cdc_net_effect" ->
      """WITH log AS (
           SELECT o_orderkey % 2000 AS k,
                  epoch(o_orderdate) * 1000000
                    + o_orderkey % 1000000 AS seq,
                  CASE WHEN CAST(('0x' || substr(md5('op#' ||
                         CAST(o_orderkey AS VARCHAR)), 1, 4))
                         AS BIGINT) % 10 < 2 THEN 'I'
                       WHEN CAST(('0x' || substr(md5('op#' ||
                         CAST(o_orderkey AS VARCHAR)), 1, 4))
                         AS BIGINT) % 10 < 8 THEN 'U'
                       ELSE 'D' END AS op,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents
           FROM orders),
         per_key AS (
           SELECT k, min_by(op, seq) AS first_op,
                  max_by(op, seq) AS last_op,
                  max_by(cents, seq) AS last_cents,
                  CAST(count(*) AS BIGINT) AS n_ops
           FROM log GROUP BY k),
         net AS (
           SELECT k, n_ops, last_cents,
                  CASE WHEN first_op = 'I' AND last_op = 'D'
                       THEN 'drop'
                       WHEN first_op = 'I' THEN 'insert'
                       WHEN last_op = 'D' THEN 'delete'
                       ELSE 'upsert' END AS net_op
           FROM per_key)
         SELECT net_op, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(n_ops) AS BIGINT) AS n_source_ops,
                CAST(sum(CASE WHEN net_op IN ('insert', 'upsert')
                         THEN last_cents ELSE 0 END) AS BIGINT)
                  AS final_cents
         FROM net GROUP BY 1 ORDER BY 1""",

    // q376: same hash deciles, same integer Qini numerator.
    "q376_uplift_qini" ->
      """WITH base AS (
           SELECT CAST(('0x' || substr(md5('t#' ||
                    CAST(o_custkey AS VARCHAR)), 1, 4)) AS BIGINT) % 2
                    AS treat,
                  CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
                    AS resp,
                  9 - (CAST(('0x' || substr(md5('s#' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 1000000) // 100000 AS d
           FROM orders),
         dec AS (
           SELECT d, CAST(count_if(treat = 1) AS BIGINT) AS n_t,
                  CAST(count_if(treat = 0) AS BIGINT) AS n_c,
                  CAST(sum(CASE WHEN treat = 1 THEN resp ELSE 0 END)
                       AS BIGINT) AS resp_t,
                  CAST(sum(CASE WHEN treat = 0 THEN resp ELSE 0 END)
                       AS BIGINT) AS resp_c
           FROM base GROUP BY d),
         cum AS (
           SELECT d, n_t, n_c, resp_t, resp_c,
                  CAST(sum(n_t) OVER w AS BIGINT) AS cnt,
                  CAST(sum(n_c) OVER w AS BIGINT) AS cnc,
                  CAST(sum(resp_t) OVER w AS BIGINT) AS crt,
                  CAST(sum(resp_c) OVER w AS BIGINT) AS crc
           FROM dec
           WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW))
         SELECT d, n_t, n_c, resp_t, resp_c,
                crt * cnc - crc * cnt AS qini_num,
                round(CAST(crt * cnc - crc * cnt AS DOUBLE)
                      / (cnt * cnc), 6) AS uplift
         FROM cum ORDER BY d""",

    // q378: identical integer-seconds banding; epoch() under the UTC
    // session is unix_timestamp.
    "q378_occ_conflicts" ->
      """WITH txn AS (
           SELECT o_orderkey AS tid, o_custkey % 500 AS lock,
                  CAST(epoch(o_orderdate) AS BIGINT) AS st,
                  CAST(epoch(o_orderdate) AS BIGINT) + 3600 *
                    (1 + CAST(('0x' || substr(md5('d#' ||
                      CAST(o_orderkey AS VARCHAR)), 1, 4))
                      AS BIGINT) % 72) AS en
           FROM orders),
         b AS (SELECT tid, lock, st, en, st // 259200 AS b0,
                      en // 259200 AS b1 FROM txn),
         ex AS (SELECT tid, lock, st, en,
                       unnest(generate_series(b0, b1)) AS bk FROM b),
         cand AS (
           SELECT a.tid AS ta, x.tid AS tb, a.lock AS lock,
                  a.st AS sa, a.en AS ea, x.st AS sb, x.en AS eb
           FROM ex a JOIN ex x
             ON a.lock = x.lock AND a.bk = x.bk AND a.tid < x.tid),
         dist AS (SELECT DISTINCT ta, tb, lock, sa, ea, sb, eb
                  FROM cand),
         conf AS (SELECT *, (sa < eb AND sb < ea) AS overlap
                  FROM dist),
         aborted AS (SELECT DISTINCT CASE WHEN ea >= eb THEN ta
                            ELSE tb END AS t
                     FROM conf WHERE overlap)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM txn) AS n_txns,
                CAST(count(*) AS BIGINT) AS n_candidate_pairs,
                CAST(count_if(overlap) AS BIGINT) AS n_conflicts,
                (SELECT CAST(count(*) AS BIGINT) FROM aborted)
                  AS n_aborted_txns
         FROM conf""",

    // q380: same ANSI aggregates in DuckDB, same rounding decades.
    "q380_regr_aggregates" ->
      """SELECT l_returnflag,
                CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
                  AS n,
                round(regr_slope(l_extendedprice, l_quantity), 4)
                  AS slope,
                round(regr_intercept(l_extendedprice, l_quantity), 4)
                  AS icept,
                round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                round(regr_avgx(l_extendedprice, l_quantity), 4)
                  AS avgx,
                round(regr_avgy(l_extendedprice, l_quantity), 4)
                  AS avgy
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // q381: identical bag-semantics text.
    "q381_bag_set_ops" ->
      """WITH a AS (SELECT l_partkey AS k FROM lineitem
                    WHERE l_returnflag = 'R'),
         b AS (SELECT l_partkey AS k FROM lineitem
               WHERE l_linestatus = 'F'),
         ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
         ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
         SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM ia)
             AS n_intersect_all,
           (SELECT CAST(sum(k) AS BIGINT) FROM ia)
             AS sum_intersect_all,
           (SELECT CAST(count(*) AS BIGINT) FROM ea) AS n_except_all,
           (SELECT CAST(sum(k) AS BIGINT) FROM ea)
             AS sum_except_all""",

    // q382: the oracle skips the map machinery entirely — same cells,
    // same integer average, same filter, relationally.
    "q382_map_hof" ->
      """SELECT o_orderpriority AS prio, o_orderstatus AS st,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                     * 100 AS BIGINT))
                     // count(*) AS BIGINT) AS avg_cents,
                CAST(count(*) * 2 AS BIGINT) AS n_twice
         FROM orders GROUP BY 1, 2
         HAVING sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                    AS BIGINT)) // count(*) > 15000000
         ORDER BY prio, st""",

    // q383: same weekly cents rollup, same trailing frame, full
    // windows only.
    "q383_rolling_regr" ->
      """WITH wr AS (
           SELECT o_orderpriority AS grp,
                  date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) // 7 AS w,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                       * 100 AS BIGINT)) AS BIGINT) AS y
           FROM orders GROUP BY 1, 2),
         r AS (
           SELECT grp, w,
                  round(regr_slope(CAST(y AS DOUBLE),
                        CAST(w AS DOUBLE))
                    OVER (PARTITION BY grp ORDER BY w
                          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
                    2) AS slope8,
                  row_number() OVER (PARTITION BY grp ORDER BY w)
                    AS rn
           FROM wr)
         SELECT grp, w, slope8 FROM r WHERE rn >= 8
         ORDER BY grp, w""",

    // q384: identical pick/normalize/count chain.
    "q384_boruvka_phase" ->
      """WITH pairs AS (
           SELECT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS q,
                  CAST(min(l_quantity) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
         edges AS (
           SELECT p AS src, q AS dst, w FROM pairs
           UNION ALL SELECT q, p, w FROM pairs),
         pick AS (
           SELECT src, min_by(dst, w * 100000000 + dst) AS dst
           FROM edges GROUP BY src),
         norm AS (
           SELECT DISTINCT least(src, dst) AS u,
                  greatest(src, dst) AS v
           FROM pick),
         wmin AS (
           SELECT n.u, n.v, min(e.w) AS w
           FROM norm n JOIN edges e ON e.src = n.u AND e.dst = n.v
           GROUP BY n.u, n.v)
         SELECT
           (SELECT CAST(count(DISTINCT src) AS BIGINT) FROM edges)
             AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_forest_edges,
           CAST(sum(w) AS BIGINT) AS forest_weight,
           (SELECT CAST(count(DISTINCT src) AS BIGINT) FROM edges)
             - CAST(count(*) AS BIGINT) AS n_components
         FROM wmin""",

    // q385: identical difference-trick text.
    "q385_order_streaks" ->
      """WITH m AS (SELECT DISTINCT o_custkey,
                      year(o_orderdate) * 12 + month(o_orderdate)
                        AS mo
                    FROM orders),
         g AS (SELECT o_custkey, mo,
                 mo - dense_rank() OVER (PARTITION BY o_custkey
                                         ORDER BY mo) AS grp
               FROM m),
         runs AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS len
                  FROM g GROUP BY o_custkey, grp),
         best AS (SELECT o_custkey, max(len) AS best_streak
                  FROM runs GROUP BY o_custkey)
         SELECT best_streak, CAST(count(*) AS BIGINT) AS n_customers
         FROM best GROUP BY 1 ORDER BY 1""",

    // q386: |∩| via a positional three-way join, |∪| by
    // inclusion–exclusion — no array types on the oracle side.
    "q386_basket_jaccard" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
         sizes AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
                   FROM items GROUP BY 1),
         -- rank only orders WITH baskets: the Spark side inner-joins
         -- baskets before the lag, so basket-less orders neither pair
         -- nor break adjacency.
         ord AS (SELECT o_orderkey, o_custkey,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS rn
                 FROM orders
                 JOIN sizes ON o_orderkey = l_orderkey),
         pairs AS (SELECT a.o_orderkey AS ka, b.o_orderkey AS kb
                   FROM ord a JOIN ord b
                     ON a.o_custkey = b.o_custkey
                      AND b.rn = a.rn + 1),
         inter AS (SELECT p.ka, p.kb, CAST(count(*) AS BIGINT) AS i
                   FROM pairs p
                   JOIN items x ON x.l_orderkey = p.ka
                   JOIN items y ON y.l_orderkey = p.kb
                     AND y.l_partkey = x.l_partkey
                   GROUP BY 1, 2),
         j AS (SELECT p.ka, coalesce(i.i, 0) AS i,
                      sa.c + sb.c - coalesce(i.i, 0) AS u
               FROM pairs p
               JOIN sizes sa ON sa.l_orderkey = p.ka
               JOIN sizes sb ON sb.l_orderkey = p.kb
               LEFT JOIN inter i ON i.ka = p.ka AND i.kb = p.kb)
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                round(avg(CAST(i AS DOUBLE) / u), 6) AS avg_jaccard,
                CAST(count_if(i = 0) AS BIGINT) AS n_disjoint,
                CAST(sum(i) AS BIGINT) AS sum_overlap
         FROM j""",

    // q387: same half-angle haversine; only the md5-hex and double-
    // literal spellings differ by dialect.
    "q387_haversine_knn" ->
      """WITH pts AS (
           SELECT c_custkey,
                  CAST(('0x' || substr(md5('lat#' ||
                    CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 1400000 / 10000.0 - 70 AS lat,
                  CAST(('0x' || substr(md5('lon#' ||
                    CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 3600000 / 10000.0 - 180 AS lon
           FROM customer),
         hubs(hub_id, hlat, hlon) AS (VALUES
           (1, 40.7, -74.0), (2, 51.5, -0.1), (3, 35.7, 139.7),
           (4, -33.9, 151.2), (5, 19.4, -99.1)),
         d AS (
           SELECT hub_id, c_custkey,
                  round(2 * 6371.0 * asin(sqrt(
                    sin(radians((lat - hlat) / 2))
                      * sin(radians((lat - hlat) / 2))
                    + cos(radians(hlat)) * cos(radians(lat))
                      * sin(radians((lon - hlon) / 2))
                      * sin(radians((lon - hlon) / 2)))), 3) AS km
           FROM pts CROSS JOIN hubs),
         r AS (SELECT hub_id, c_custkey, km,
                      row_number() OVER (PARTITION BY hub_id
                        ORDER BY km, c_custkey) AS rank
               FROM d)
         SELECT hub_id, rank, c_custkey, km
         FROM r WHERE rank <= 3 ORDER BY hub_id, rank""",

    // q388: identical decorrelation-shaped text.
    "q388_correlated_exists" ->
      """WITH base AS (
           SELECT c_custkey, c_nationkey,
                  (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(14,2))
                               * 100) AS BIGINT)
                   FROM orders o WHERE o.o_custkey = c.c_custkey)
                    AS max_cents
           FROM customer c),
         whale AS (SELECT c_custkey FROM customer c
                   WHERE EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_totalprice > 400000)),
         nosmall AS (SELECT c_custkey FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_custkey = c.c_custkey
                                         AND o.o_totalprice < 20000))
         SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
                CAST(count(w.c_custkey) AS BIGINT) AS n_whales,
                CAST(count(ns.c_custkey) AS BIGINT) AS n_never_small,
                CAST(sum(coalesce(max_cents, 0)) AS BIGINT)
                  AS sum_max_cents
         FROM base b JOIN nation ON b.c_nationkey = n_nationkey
         LEFT JOIN whale w ON w.c_custkey = b.c_custkey
         LEFT JOIN nosmall ns ON ns.c_custkey = b.c_custkey
         GROUP BY n_name ORDER BY n_name""",

    // q389: IS DISTINCT FROM is DuckDB's spelling of Spark's
    // NOT (a <=> b); everything else is the same integer argmax.
    "q389_bitemporal_audit" ->
      """WITH v AS (
           SELECT l_partkey AS pk,
                  CAST(epoch(l_shipdate) AS BIGINT) AS valid_from,
                  CAST(epoch(l_shipdate) AS BIGINT) + 86400 *
                    (CAST(('0x' || substr(md5('tx#' ||
                       CAST(l_orderkey AS VARCHAR) || '#' ||
                       CAST(l_linenumber AS VARCHAR)), 1, 4))
                       AS BIGINT) % 180) AS tx_from,
                  CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents,
                  l_orderkey * 10 + l_linenumber AS vid
           FROM lineitem),
         snap AS (
           SELECT pk,
                  max_by(cents, valid_from * 10000000
                                + vid % 10000000)
                    FILTER (WHERE valid_from <=
                        CAST(epoch(TIMESTAMP '1998-01-01') AS BIGINT)
                      AND tx_from <=
                        CAST(epoch(TIMESTAMP '1998-02-01') AS BIGINT))
                    AS cents_t1,
                  max_by(cents, valid_from * 10000000
                                + vid % 10000000)
                    FILTER (WHERE valid_from <=
                        CAST(epoch(TIMESTAMP '1998-01-01') AS BIGINT)
                      AND tx_from <=
                        CAST(epoch(TIMESTAMP '1998-06-01') AS BIGINT))
                    AS cents_t2
           FROM v GROUP BY pk)
         SELECT CAST(count(*) AS BIGINT) AS n_parts,
                CAST(count(cents_t1) AS BIGINT) AS n_known_t1,
                CAST(count(cents_t2) AS BIGINT) AS n_known_t2,
                CAST(sum(coalesce(cents_t2, 0)) AS BIGINT)
                  AS snapshot_cents,
                CAST(count_if(cents_t1 IS DISTINCT FROM cents_t2)
                     AS BIGINT) AS n_late_revisions
         FROM snap""",

    // q390: identical exact type-1 weighted quantile.
    "q390_weighted_median" ->
      """WITH g AS (
           SELECT l_returnflag AS flag,
                  CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                    AS wt
           FROM lineitem GROUP BY 1, 2),
         c AS (
           SELECT flag, cents, wt,
                  CAST(sum(wt) OVER (PARTITION BY flag ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cum,
                  CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT)
                    AS tot
           FROM g)
         SELECT flag, CAST(min(tot) AS BIGINT) AS total_weight,
                CAST(min(CASE WHEN 2 * cum >= tot THEN cents END)
                     AS BIGINT) AS weighted_median_cents
         FROM c GROUP BY flag ORDER BY flag""",

    // q391: identical integer class boundaries.
    "q391_abc_classification" ->
      """WITH rev AS (
           SELECT l_partkey AS pk,
                  CAST(sum(CAST(CAST(l_extendedprice
                       AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT)
                    AS cents
           FROM lineitem GROUP BY 1),
         c AS (
           SELECT pk, cents,
                  CAST(sum(cents) OVER (ORDER BY cents DESC, pk
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cum,
                  CAST(sum(cents) OVER () AS BIGINT) AS tot
           FROM rev),
         cls AS (
           SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                       WHEN cum * 100 <= tot * 95 THEN 'B'
                       ELSE 'C' END AS abc,
                  cents, tot FROM c)
         SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(cents) AS BIGINT) AS class_cents,
                CAST((2 * sum(cents) * 10000 + min(tot))
                     // (2 * min(tot)) AS BIGINT) AS share_bp
         FROM cls GROUP BY 1 ORDER BY 1""",

    // q392: same injected clones, same equi-block join.
    "q392_duplicate_charges" ->
      """WITH base AS (
           SELECT o_orderkey AS ok, o_custkey AS ck,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents,
                  CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
           FROM orders),
         log AS (
           SELECT ok, ck, cents, day FROM base
           UNION ALL
           SELECT ok * 1000000 + 1, ck, cents, day + 1 FROM base
           WHERE ok % 97 = 0),
         p AS (
           SELECT a.ck, a.cents
           FROM log a JOIN log b
             ON a.ck = b.ck AND a.cents = b.cents AND a.ok < b.ok
           WHERE abs(a.day - b.day) <= 2)
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT ck) AS BIGINT) AS n_customers,
                CAST(sum(cents) AS BIGINT) AS dup_cents,
                (SELECT CAST(count(*) AS BIGINT) FROM log)
                  AS n_charges
         FROM p""",

    // q393: identical integer pyramid over the same dense spine.
    "q393_haar_energy" ->
      """WITH days AS (SELECT unnest(generate_series(0, 2047))
                         AS day),
         rev AS (
           SELECT date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) AS day,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                       * 100 AS BIGINT) // 100) AS BIGINT) AS v
           FROM orders GROUP BY 1),
         s AS (SELECT d.day, coalesce(r.v, 0) AS v
               FROM days d LEFT JOIN rev r ON d.day = r.day),
         l1 AS (SELECT day // 2 AS k,
                  CAST(sum(CASE WHEN day % 2 = 0 THEN v ELSE -v END)
                       AS BIGINT) AS dt,
                  CAST(sum(v) AS BIGINT) AS ap
                FROM s GROUP BY 1),
         l2 AS (SELECT k // 2 AS k,
                  CAST(sum(CASE WHEN k % 2 = 0 THEN ap ELSE -ap END)
                       AS BIGINT) AS dt,
                  CAST(sum(ap) AS BIGINT) AS ap
                FROM l1 GROUP BY 1),
         l3 AS (SELECT k // 2 AS k,
                  CAST(sum(CASE WHEN k % 2 = 0 THEN ap ELSE -ap END)
                       AS BIGINT) AS dt,
                  CAST(sum(ap) AS BIGINT) AS ap
                FROM l2 GROUP BY 1)
         SELECT * FROM (
           SELECT 0 AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
                  CAST(sum(v * v) AS BIGINT) AS energy FROM s
           UNION ALL SELECT 1, CAST(count(*) AS BIGINT),
                  CAST(sum(dt * dt) AS BIGINT) FROM l1
           UNION ALL SELECT 2, CAST(count(*) AS BIGINT),
                  CAST(sum(dt * dt) AS BIGINT) FROM l2
           UNION ALL SELECT 3, CAST(count(*) AS BIGINT),
                  CAST(sum(dt * dt) AS BIGINT) FROM l3)
         ORDER BY level""",

    // q395: identical integer pick indices.
    "q395_qq_deciles" ->
      """WITH x AS (
           SELECT o_orderpriority AS p,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY CAST(CAST(o_totalprice AS DECIMAL(14,2))
                             * 100 AS BIGINT), o_orderkey) AS rn,
                  count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         qs AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT)
                  AS q),
         picks AS (SELECT p, q, cents FROM x
                   JOIN qs ON rn = (q * n + 9) // 10)
         SELECT q,
                CAST(max(CASE WHEN p = '1-URGENT' THEN cents END)
                     AS BIGINT) AS qa_cents,
                CAST(max(CASE WHEN p = '5-LOW' THEN cents END)
                     AS BIGINT) AS qb_cents,
                CAST(max(CASE WHEN p = '1-URGENT' THEN cents END)
                     - max(CASE WHEN p = '5-LOW' THEN cents END)
                     AS BIGINT) AS diff_cents
         FROM picks GROUP BY q ORDER BY q""",

    // q396: same single-scan unnest plant, same exact integer
    // moments, same closed-form inverse.
    "q396_mahalanobis_outliers" ->
      """WITH b AS (
           SELECT CAST(l_quantity AS BIGINT) AS x,
                  (CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                        AS BIGINT) // 100) * mult AS y
           FROM lineitem,
                unnest(CASE WHEN l_orderkey % 97 = 0
                       THEN [CAST(1 AS BIGINT), CAST(3 AS BIGINT)]
                       ELSE [CAST(1 AS BIGINT)] END) AS t(mult)),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(x*y) AS BIGINT) AS sxy,
                      CAST(sum(y*y) AS BIGINT) AS syy
               FROM b),
         c AS (SELECT n, CAST(sx AS DOUBLE)/n AS mx,
                      CAST(sy AS DOUBLE)/n AS my,
                      CAST(sxx AS DOUBLE)/n
                        - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n)
                        AS vxx,
                      CAST(sxy AS DOUBLE)/n
                        - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)
                        AS vxy,
                      CAST(syy AS DOUBLE)/n
                        - (CAST(sy AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)
                        AS vyy
               FROM m),
         dd AS (SELECT b.x, b.y, c.n,
                      ((b.x - mx)*(b.x - mx)*vyy
                        - 2*(b.x - mx)*(b.y - my)*vxy
                        + (b.y - my)*(b.y - my)*vxx)
                        / (vxx*vyy - vxy*vxy) AS m2
               FROM b CROSS JOIN c)
         SELECT CAST(min(n) AS BIGINT) AS n,
                CAST(count_if(round(m2, 6) > 9.21034) AS BIGINT)
                  AS n_outliers,
                round(avg(m2), 6) AS avg_m2
         FROM dd""",

    // q400: identical integer Hamilton apportionment.
    "q400_largest_remainder" ->
      """WITH rev AS (SELECT o_orderpriority AS p,
                        CAST(sum(CAST(CAST(o_totalprice
                             AS DECIMAL(14,2)) * 100 AS BIGINT))
                             AS BIGINT) AS cents
                      FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
         qf AS (SELECT p, cents, (1000 * cents) // t AS fl,
                       (1000 * cents) % t AS rem
                FROM rev CROSS JOIN tot),
         extra AS (SELECT CAST(1000 - sum(fl) AS BIGINT) AS e
                   FROM qf),
         rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, p)
                  AS rr FROM qf)
         SELECT p, cents, CAST(fl AS BIGINT) AS floor_seats,
                CAST(fl + CASE WHEN rr <= e THEN 1 ELSE 0 END
                     AS BIGINT) AS seats
         FROM rk CROSS JOIN extra ORDER BY p""",

    // q401: identical prefix-sum split search.
    "q401_gini_stump" ->
      """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0
                      END AS y
                    FROM lineitem),
         tv AS (SELECT x AS xv, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(y) AS BIGINT) AS pos
                FROM b GROUP BY 1),
         cum AS (SELECT xv,
                   CAST(sum(n) OVER w AS BIGINT) AS nl,
                   CAST(sum(pos) OVER w AS BIGINT) AS pl,
                   CAST(sum(n) OVER () AS BIGINT) AS nt,
                   CAST(sum(pos) OVER () AS BIGINT) AS pt
                 FROM tv
                 WINDOW w AS (ORDER BY xv ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW)),
         g AS (SELECT xv AS thr, nl, nt - nl AS nr, pl,
                 pt - pl AS pr,
                 (CAST(nl AS DOUBLE)/nt)
                   * (1.0 - (CAST(pl AS DOUBLE)/nl)
                            *(CAST(pl AS DOUBLE)/nl)
                          - (1.0-CAST(pl AS DOUBLE)/nl)
                            *(1.0-CAST(pl AS DOUBLE)/nl))
                 + (CAST(nt-nl AS DOUBLE)/nt)
                   * (1.0 - (CAST(pt-pl AS DOUBLE)/(nt-nl))
                            *(CAST(pt-pl AS DOUBLE)/(nt-nl))
                          - (1.0-CAST(pt-pl AS DOUBLE)/(nt-nl))
                            *(1.0-CAST(pt-pl AS DOUBLE)/(nt-nl)))
                   AS gini_w
               FROM cum WHERE nl > 0 AND nt - nl > 0),
         r AS (SELECT *, row_number() OVER (ORDER BY round(gini_w, 9),
                 thr) AS rk FROM g)
         SELECT CAST(thr AS BIGINT) AS best_threshold,
                CAST(nl AS BIGINT) AS n_left,
                CAST(nr AS BIGINT) AS n_right,
                CAST(pl AS BIGINT) AS pos_left,
                CAST(pr AS BIGINT) AS pos_right,
                round(gini_w, 6) AS gini
         FROM r WHERE rk = 1""",

    // q402: same blocked pair rollup and metric joins.
    "q402_association_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok,
                          l_partkey % 20 AS it
                        FROM lineitem),
         n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nt
               FROM items),
         sup AS (SELECT it, CAST(count(*) AS BIGINT) AS s
                 FROM items GROUP BY 1),
         pairs AS (SELECT a.it AS ia, b.it AS ib,
                     CAST(count(*) AS BIGINT) AS sab
                   FROM items a JOIN items b
                     ON a.ok = b.ok AND a.it < b.it
                   GROUP BY 1, 2 HAVING count(*) >= 100),
         rules AS (
           SELECT ia, ib, sab, sa.s AS s_a, sb.s AS s_b,
                  (2 * sab * 10000 + sa.s) // (2 * sa.s) AS conf_bp,
                  round((CAST(sab AS DOUBLE) * nt)
                        / (CAST(sa.s AS DOUBLE) * sb.s), 4) AS lift
           FROM pairs JOIN sup sa ON sa.it = pairs.ia
           JOIN sup sb ON sb.it = pairs.ib CROSS JOIN n),
         r AS (SELECT *, row_number() OVER (ORDER BY conf_bp DESC,
                 ia, ib) AS rk FROM rules)
         SELECT ia, ib, sab, s_a, s_b,
                CAST(conf_bp AS BIGINT) AS conf_bp, lift
         FROM r WHERE rk <= 15 ORDER BY ia, ib""",

    // q404: same exact dollar moments, same closed form.
    "q404_power_analysis" ->
      """WITH v AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CAST(CAST(o_totalprice
                           AS DECIMAL(14,2)) * 100 AS BIGINT)
                           // 100) AS BIGINT) AS s,
                      CAST(sum((CAST(CAST(o_totalprice
                           AS DECIMAL(14,2)) * 100 AS BIGINT) // 100)
                         * (CAST(CAST(o_totalprice
                           AS DECIMAL(14,2)) * 100 AS BIGINT)
                           // 100)) AS BIGINT) AS ss
                    FROM orders),
         p AS (SELECT n, CAST(s AS DOUBLE)/n AS mean,
                      (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n)
                        / (n - 1) AS var
               FROM v),
         mde AS (SELECT CAST(unnest(generate_series(1, 5)) AS BIGINT)
                   AS pct)
         SELECT pct, round(p.mean, 2) AS mean_dollars,
                CAST(ceil(2 * power(1.959963984540054
                     + 0.8416212335729143, 2) * p.var
                     / power(p.mean * pct / 100.0, 2)) AS BIGINT)
                  AS n_per_arm
         FROM p CROSS JOIN mde ORDER BY pct""",

    // q405: identical four-cell Wald.
    "q405_iv_wald" ->
      """WITH b AS (
           SELECT CAST(('0x' || substr(md5('z#' ||
                    CAST(o_custkey AS VARCHAR)), 1, 4)) AS BIGINT)
                    % 2 AS z,
                  CAST(('0x' || substr(md5('c#' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 4)) AS BIGINT)
                    % 100 AS u,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents
           FROM orders),
         t AS (SELECT z, CASE WHEN (z = 1 AND u < 70)
                               OR (z = 0 AND u < 30) THEN 1 ELSE 0
                         END AS x, cents
               FROM b),
         cells AS (SELECT z, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(cents) AS BIGINT) AS sc
                   FROM t GROUP BY z)
         SELECT round((SELECT CAST(sc AS DOUBLE)/n FROM cells
                       WHERE z=1)
                    - (SELECT CAST(sc AS DOUBLE)/n FROM cells
                       WHERE z=0), 2) AS itt_cents,
                round((SELECT CAST(sx AS DOUBLE)/n FROM cells
                       WHERE z=1)
                    - (SELECT CAST(sx AS DOUBLE)/n FROM cells
                       WHERE z=0), 6) AS compliance_delta,
                round(((SELECT CAST(sc AS DOUBLE)/n FROM cells
                        WHERE z=1)
                     - (SELECT CAST(sc AS DOUBLE)/n FROM cells
                        WHERE z=0))
                    / ((SELECT CAST(sx AS DOUBLE)/n FROM cells
                        WHERE z=1)
                     - (SELECT CAST(sx AS DOUBLE)/n FROM cells
                        WHERE z=0)), 2) AS late_cents,
                (SELECT CAST(sum(n) AS BIGINT) FROM cells)
                  AS n_orders""",

    // q407: identical prefix-sum SSE search with the same guards.
    "q407_changepoint" ->
      """WITH wk AS (
           SELECT date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) // 7 AS w,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                       * 100 AS BIGINT) // 100) AS BIGINT) AS y
           FROM orders GROUP BY 1),
         cum AS (SELECT w, y,
                   CAST(sum(y) OVER o AS BIGINT) AS cy,
                   CAST(sum(y*y) OVER o AS BIGINT) AS cy2,
                   CAST(row_number() OVER (ORDER BY w) AS BIGINT)
                     AS i,
                   CAST(sum(y) OVER () AS BIGINT) AS ty,
                   CAST(sum(y*y) OVER () AS BIGINT) AS ty2,
                   CAST(count(*) OVER () AS BIGINT) AS nt
                 FROM wk
                 WINDOW o AS (ORDER BY w ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW)),
         sse AS (SELECT w, i, nt,
                   (CAST(cy2 AS DOUBLE) - CAST(cy AS DOUBLE)*cy/i)
                   + (CAST(ty2-cy2 AS DOUBLE)
                      - CAST(ty-cy AS DOUBLE)*(ty-cy)/(nt-i))
                     AS sse2,
                   CAST(ty2 AS DOUBLE) - CAST(ty AS DOUBLE)*ty/nt
                     AS sse1
                 FROM cum WHERE i >= 8 AND i <= nt - 8),
         r AS (SELECT *, row_number() OVER (ORDER BY round(sse2, 6),
                 w) AS rk FROM sse)
         SELECT CAST(w AS BIGINT) AS changepoint_week,
                CAST(i AS BIGINT) AS n_left,
                CAST(nt - i AS BIGINT) AS n_right,
                round(sse1, 2) AS sse_nosplit,
                round(sse2, 2) AS sse_split,
                round(1.0 - sse2 / sse1, 6) AS var_explained
         FROM r WHERE rk = 1""",

    // q408: same two-level digest drill-down.
    "q408_merkle_repair" ->
      """WITH pair AS (
           SELECT o_orderkey AS k,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS va,
                  CASE WHEN o_orderkey % 4999 = 0
                       THEN CAST(CAST(o_totalprice AS DECIMAL(14,2))
                            * 100 AS BIGINT) + 1
                       ELSE CAST(CAST(o_totalprice AS DECIMAL(14,2))
                            * 100 AS BIGINT) END AS vb
           FROM orders),
         h AS (SELECT k, va, vb,
                 CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '#' ||
                      CAST(va AS VARCHAR)), 1, 8)) AS BIGINT) AS ha,
                 CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '#' ||
                      CAST(vb AS VARCHAR)), 1, 8)) AS BIGINT) AS hb
               FROM pair),
         l1 AS (SELECT k // 512 AS b1, CAST(sum(ha) AS BIGINT) AS da,
                       CAST(sum(hb) AS BIGINT) AS db
                FROM h GROUP BY 1),
         m1 AS (SELECT b1 FROM l1 WHERE da <> db),
         l2 AS (SELECT k // 64 AS b2, CAST(sum(ha) AS BIGINT) AS da,
                       CAST(sum(hb) AS BIGINT) AS db
                FROM h WHERE k // 512 IN (SELECT b1 FROM m1)
                GROUP BY 1),
         m2 AS (SELECT b2 FROM l2 WHERE da <> db),
         rows_div AS (SELECT k FROM h
                      WHERE va <> vb
                        AND k // 64 IN (SELECT b2 FROM m2))
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM l1)
                  AS n_l1_buckets,
                (SELECT CAST(count(*) AS BIGINT) FROM m1)
                  AS n_l1_mismatch,
                (SELECT CAST(count(*) AS BIGINT) FROM l2)
                  AS n_l2_probed,
                (SELECT CAST(count(*) AS BIGINT) FROM m2)
                  AS n_l2_mismatch,
                (SELECT CAST(count(*) AS BIGINT) FROM rows_div)
                  AS n_rows_diverged""",

    // q409: identical tie-free total order, identical quartiles.
    "q409_rank_window_suite" ->
      """WITH x AS (
           SELECT l_returnflag AS flag,
                  CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) AS cents,
                  percent_rank() OVER w AS pr,
                  cume_dist() OVER w AS cd,
                  ntile(4) OVER w AS nt
           FROM lineitem
           WINDOW w AS (PARTITION BY l_returnflag
                        ORDER BY CAST(CAST(l_extendedprice
                                 AS DECIMAL(14,2)) * 100 AS BIGINT),
                                 l_orderkey, l_linenumber))
         SELECT flag, nt, CAST(count(*) AS BIGINT) AS n,
                CAST(min(cents) AS BIGINT) AS min_cents,
                CAST(max(cents) AS BIGINT) AS max_cents,
                round(avg(pr), 6) AS avg_pr,
                round(max(cd), 6) AS max_cd
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""",

    // q410: same rank-thresholded edges, same closed form.
    "q410_graph_modularity" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                     FROM lineitem),
         co AS (SELECT a.s AS u, b.s AS v,
                       CAST(count(*) AS BIGINT) AS shared
                FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
                GROUP BY 1, 2),
         rk AS (SELECT u, v, row_number() OVER (ORDER BY shared DESC,
                  u, v) AS r,
                count(*) OVER () AS nt FROM co),
         e AS (SELECT u, v FROM rk WHERE r <= (nt + 19) // 20),
         comm AS (SELECT e.u, e.v, a.s_nationkey AS cu,
                         b.s_nationkey AS cv
                  FROM e JOIN supplier a ON e.u = a.s_suppkey
                  JOIN supplier b ON e.v = b.s_suppkey),
         m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM comm),
         din AS (SELECT cu AS c, CAST(count_if(cu = cv) AS BIGINT)
                   AS e_in
                 FROM comm GROUP BY 1),
         deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM (
                   SELECT cu AS c FROM comm
                   UNION ALL SELECT cv FROM comm) GROUP BY 1)
         SELECT (SELECT m FROM m) AS n_edges,
                CAST(count(*) AS BIGINT) AS n_communities,
                round(sum(CAST(coalesce(e_in, 0) AS DOUBLE)
                        / (SELECT m FROM m)
                      - (CAST(d AS DOUBLE) / (2 * (SELECT m FROM m)))
                        * (CAST(d AS DOUBLE)
                           / (2 * (SELECT m FROM m)))), 6)
                  AS modularity
         FROM deg LEFT JOIN din ON deg.c = din.c""",

    // q411: identical exact moments and closed form.
    "q411_negbin_fit" ->
      """WITH k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
                    FROM orders GROUP BY 1),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(k) AS BIGINT) AS s,
                      CAST(sum(k*k) AS BIGINT) AS ss FROM k),
         p AS (SELECT n, CAST(s AS DOUBLE)/n AS mean,
                      (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n)
                        /(n-1) AS var
               FROM m)
         SELECT n, round(mean, 6) AS mean_orders,
                round(var, 6) AS var_orders,
                round(var / mean, 6) AS dispersion,
                round(CASE WHEN var > mean
                      THEN mean * mean / (var - mean) END, 6)
                  AS nb_r,
                round(CASE WHEN var > mean THEN mean / var END, 6)
                  AS nb_p
         FROM p""",

    // q412: identical classification and churn generation.
    "q412_mrr_waterfall" ->
      """WITH mo AS (SELECT o_custkey AS ck,
                       year(o_orderdate)*12 + month(o_orderdate)
                         AS m,
                       CAST(sum(CAST(CAST(o_totalprice
                            AS DECIMAL(14,2)) * 100 AS BIGINT))
                            AS BIGINT) AS rev
                     FROM orders
                     WHERE o_orderdate >= TIMESTAMP '2000-01-01'
                     GROUP BY 1, 2),
         span AS (SELECT ck, m, rev,
                    lag(m) OVER (PARTITION BY ck ORDER BY m)
                      AS prev_m,
                    lag(rev) OVER (PARTITION BY ck ORDER BY m)
                      AS prev_rev,
                    lead(m) OVER (PARTITION BY ck ORDER BY m)
                      AS next_m
                  FROM mo),
         maxm AS (SELECT max(m) AS mm FROM span),
         active AS (
           SELECT m, CASE WHEN prev_m IS NULL OR prev_m < m - 1
                          THEN 'new'
                          WHEN rev > prev_rev THEN 'expansion'
                          WHEN rev < prev_rev THEN 'contraction'
                          ELSE 'flat' END AS bucket,
                  rev - CASE WHEN prev_m = m - 1 THEN prev_rev
                             ELSE 0 END AS delta
           FROM span),
         churn AS (
           SELECT m + 1 AS m, 'churn' AS bucket, -rev AS delta
           FROM span CROSS JOIN maxm
           WHERE (next_m IS NULL AND m < mm) OR next_m > m + 1),
         flows AS (SELECT * FROM active
                   UNION ALL SELECT * FROM churn)
         SELECT CAST(m AS BIGINT) AS m, bucket,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(delta) AS BIGINT) AS delta_cents
         FROM flows GROUP BY 1, 2 ORDER BY 1, 2""",

    // q413: identical integer sign test.
    "q413_simpson_paradox" ->
      """WITH b AS (
           SELECT c_nationkey AS nk, CAST(l_quantity AS BIGINT) AS x,
                  CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) // 100 AS y
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey),
         g AS (SELECT nk, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*y) AS BIGINT) AS sxy
               FROM b GROUP BY nk),
         pooled AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                           CAST(sum(sx) AS BIGINT) AS sx,
                           CAST(sum(sy) AS BIGINT) AS sy,
                           CAST(sum(sxy) AS BIGINT) AS sxy
                    FROM g),
         sg AS (SELECT nk, CASE WHEN n*sxy - sx*sy > 0 THEN 1
                                WHEN n*sxy - sx*sy < 0 THEN -1
                                ELSE 0 END AS sgn
                FROM g),
         ps AS (SELECT CASE WHEN n*sxy - sx*sy > 0 THEN 1
                            WHEN n*sxy - sx*sy < 0 THEN -1
                            ELSE 0 END AS psgn
                FROM pooled)
         SELECT (SELECT psgn FROM ps) AS pooled_sign,
                CAST(count(*) AS BIGINT) AS n_strata,
                CAST(count_if(sgn = (SELECT psgn FROM ps)) AS BIGINT)
                  AS n_agree,
                CAST(count_if(sgn <> (SELECT psgn FROM ps))
                     AS BIGINT) AS n_flip
         FROM sg""",

    // q414: identical lag errors.
    "q414_mase_forecast" ->
      """WITH wk AS (SELECT date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) // 7 AS w,
                       CAST(sum(CAST(CAST(o_totalprice
                            AS DECIMAL(14,2)) * 100 AS BIGINT)
                            // 100) AS BIGINT) AS y
                     FROM orders GROUP BY 1),
         f AS (SELECT w, y, lag(y, 1) OVER (ORDER BY w) AS naive,
                      lag(y, 52) OVER (ORDER BY w) AS snaive
               FROM wk),
         e AS (SELECT abs(y - naive) AS e1, abs(y - snaive) AS e52
               FROM f
               WHERE naive IS NOT NULL AND snaive IS NOT NULL)
         SELECT CAST(count(*) AS BIGINT) AS n_weeks,
                CAST(sum(e1) AS BIGINT) AS mae_naive_sum,
                CAST(sum(e52) AS BIGINT) AS mae_seasonal_sum,
                round(CAST(sum(e52) AS DOUBLE) / sum(e1), 6) AS mase
         FROM e""",

    // q415: quantile_cont is percentile_cont's proven twin; same
    // three IRLS rounds.
    "q415_huber_mean" ->
      """WITH y AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2))
                         * 100 AS BIGINT) // 100 AS y FROM orders),
         med AS (SELECT CAST(quantile_cont(y, 0.5) AS DOUBLE) AS m0
                 FROM y),
         mad AS (SELECT CAST(quantile_cont(abs(y - m0), 0.5)
                        AS DOUBLE) AS s
                 FROM y CROSS JOIN med),
         r1 AS (SELECT sum(CASE WHEN abs(y - m0) <= 1.345 * s THEN y
                           ELSE m0 + sign(y - m0) * 1.345 * s END)
                       / count(*) AS mu
                FROM y CROSS JOIN med CROSS JOIN mad),
         r2 AS (SELECT sum(CASE WHEN abs(y - mu) <= 1.345 * s THEN y
                           ELSE mu + sign(y - mu) * 1.345 * s END)
                       / count(*) AS mu
                FROM y CROSS JOIN r1 CROSS JOIN mad),
         r3 AS (SELECT sum(CASE WHEN abs(y - mu) <= 1.345 * s THEN y
                           ELSE mu + sign(y - mu) * 1.345 * s END)
                       / count(*) AS mu
                FROM y CROSS JOIN r2 CROSS JOIN mad)
         SELECT round((SELECT m0 FROM med), 2) AS median_dollars,
                round((SELECT s FROM mad), 2) AS mad_dollars,
                round((SELECT mu FROM r1), 2) AS huber_r1,
                round((SELECT mu FROM r3), 2) AS huber_r3,
                round((SELECT avg(CAST(y AS DOUBLE)) FROM y), 2)
                  AS plain_mean""",

    // q416: identical cohort ages and floor division.
    "q416_ltv_curve" ->
      """WITH fo AS (SELECT o_custkey AS ck,
                       min(year(o_orderdate)*12 + month(o_orderdate))
                         AS cohort
                     FROM orders GROUP BY 1),
         mo AS (SELECT o_custkey AS ck,
                  year(o_orderdate)*12 + month(o_orderdate) AS m,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                       * 100 AS BIGINT)) AS BIGINT) AS rev
                FROM orders GROUP BY 1, 2),
         j AS (SELECT fo.cohort AS cohort, mo.m - fo.cohort AS age,
                      mo.rev AS rev
               FROM mo JOIN fo ON mo.ck = fo.ck),
         cs AS (SELECT cohort AS cohort2,
                       CAST(count(*) AS BIGINT) AS cohort_n
                FROM fo GROUP BY 1),
         agg AS (SELECT cohort, age, CAST(sum(rev) AS BIGINT) AS rev
                 FROM j GROUP BY 1, 2),
         cum AS (SELECT cohort, age,
                   CAST(sum(rev) OVER (PARTITION BY cohort
                        ORDER BY age ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cum_rev
                 FROM agg)
         SELECT cohort, age, cum_rev, cohort_n,
                CAST(cum_rev // cohort_n AS BIGINT)
                  AS ltv_per_customer
         FROM cum JOIN cs ON cohort = cohort2
         WHERE cohort BETWEEN 23941 AND 23952 AND age <= 12
         ORDER BY cohort, age""",

    // q418: identical four Newton rounds from the same planted rule.
    "q418_logistic_irls" ->
      """WITH b AS (
           SELECT CAST(l_quantity AS DOUBLE) / 50 AS x,
                  CASE WHEN CAST(l_quantity AS BIGINT)
                        + CAST(('0x' || substr(md5('n#' ||
                            CAST(l_orderkey AS VARCHAR) || '#' ||
                            CAST(l_linenumber AS VARCHAR)), 1, 4))
                            AS BIGINT) % 25 > 30
                       THEN 1.0 ELSE 0.0 END AS y
           FROM lineitem),
         c0 AS (SELECT 0.0 AS b0, 0.0 AS b1),
         c1 AS (
           SELECT b0 + (w11*g0 - w01*g1)/(w00*w11 - w01*w01) AS b0,
                  b1 + (w00*g1 - w01*g0)/(w00*w11 - w01*w01) AS b1
           FROM (
             SELECT b0, b1,
                    sum(y - 1/(1+exp(-(b0 + b1*x)))) AS g0,
                    sum(x*(y - 1/(1+exp(-(b0 + b1*x))))) AS g1,
                    sum((1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w00,
                    sum(x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w01,
                    sum(x*x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w11
             FROM b CROSS JOIN c0 GROUP BY b0, b1)),
         c2 AS (
           SELECT b0 + (w11*g0 - w01*g1)/(w00*w11 - w01*w01) AS b0,
                  b1 + (w00*g1 - w01*g0)/(w00*w11 - w01*w01) AS b1
           FROM (
             SELECT b0, b1,
                    sum(y - 1/(1+exp(-(b0 + b1*x)))) AS g0,
                    sum(x*(y - 1/(1+exp(-(b0 + b1*x))))) AS g1,
                    sum((1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w00,
                    sum(x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w01,
                    sum(x*x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w11
             FROM b CROSS JOIN c1 GROUP BY b0, b1)),
         c3 AS (
           SELECT b0 + (w11*g0 - w01*g1)/(w00*w11 - w01*w01) AS b0,
                  b1 + (w00*g1 - w01*g0)/(w00*w11 - w01*w01) AS b1
           FROM (
             SELECT b0, b1,
                    sum(y - 1/(1+exp(-(b0 + b1*x)))) AS g0,
                    sum(x*(y - 1/(1+exp(-(b0 + b1*x))))) AS g1,
                    sum((1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w00,
                    sum(x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w01,
                    sum(x*x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w11
             FROM b CROSS JOIN c2 GROUP BY b0, b1)),
         c4 AS (
           SELECT b0 + (w11*g0 - w01*g1)/(w00*w11 - w01*w01) AS b0,
                  b1 + (w00*g1 - w01*g0)/(w00*w11 - w01*w01) AS b1
           FROM (
             SELECT b0, b1,
                    sum(y - 1/(1+exp(-(b0 + b1*x)))) AS g0,
                    sum(x*(y - 1/(1+exp(-(b0 + b1*x))))) AS g1,
                    sum((1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w00,
                    sum(x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w01,
                    sum(x*x*(1/(1+exp(-(b0+b1*x))))
                        *(1-1/(1+exp(-(b0+b1*x))))) AS w11
             FROM b CROSS JOIN c3 GROUP BY b0, b1)),
         acc AS (SELECT count_if((1/(1+exp(-(b0 + b1*x))) >= 0.5)
                                 = (y = 1.0)) AS n_correct,
                        count(*) AS n
                 FROM b CROSS JOIN c4)
         SELECT round((SELECT b0 FROM c4), 4) AS beta0,
                round((SELECT b1 FROM c4), 4) AS beta1,
                (SELECT CAST(n_correct AS BIGINT) FROM acc)
                  AS n_correct,
                (SELECT CAST(n AS BIGINT) FROM acc) AS n""",

    // q420: DuckDB lacks LIKE ALL/ANY — the oracle states the
    // conjunction/disjunction the quantifier must rewrite to.
    "q420_like_quantifiers" ->
      """SELECT CAST(count_if(p_name LIKE '%bolt%'
                              AND p_name LIKE 'c%') AS BIGINT)
                  AS n_like_all,
                CAST(count_if(p_name LIKE '%bolt%'
                              OR p_name LIKE '%gear%') AS BIGINT)
                  AS n_like_any,
                CAST(count_if(p_name NOT LIKE '%o%') AS BIGINT)
                  AS n_not_like,
                CAST(count_if(regexp_matches(p_name,
                     '^(red|blue) (bolt|gear)$')) AS BIGINT)
                  AS n_rlike
         FROM part""",

    // q427: HUGEINT mirrors DECIMAL(38,0); // floors = Spark DIV
    // truncation on these all-positive quantities. Whole dollars,
    // like the Spark side (see the decimal-DIV wrap note there).
    "q427_anova_f" ->
      """WITH y AS (SELECT o_orderpriority AS grp,
                           CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                                AS HUGEINT) // 100 AS y
                    FROM orders),
              g AS (SELECT grp, count(*) AS n_g, sum(y) AS s_g,
                           sum(y * y) AS ss_g
                    FROM y GROUP BY 1),
              a AS (SELECT sum(n_g) AS n, count(*) AS k, sum(s_g) AS s,
                           sum(ss_g) AS ss,
                           sum((s_g * s_g) // n_g) AS sb_raw
                    FROM g),
              b AS (SELECT n, k, ss - (s * s) // n AS sst,
                           sb_raw - (s * s) // n AS ssb
                    FROM a)
         SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
                CAST(sst AS VARCHAR) AS sst_d2,
                CAST(ssb AS VARCHAR) AS ssb_d2,
                CAST((2 * ssb * (n - k) * 1000000
                      + (sst - ssb) * (k - 1))
                     // (2 * (sst - ssb) * (k - 1)) AS BIGINT) AS f_e6,
                CAST((2 * ssb * 10000 + sst) // (2 * sst) AS BIGINT)
                  AS eta2_bp
         FROM b""",

    // q433: DuckDB has no `every` — bool_and states the synonym's
    // semantics; count_if via CASE for 1.0 compatibility.
    "q433_bool_bit_aggs" ->
      """SELECT l_returnflag,
                bool_and(CAST(l_quantity AS BIGINT) > 1)
                  AS all_qty_gt1,
                bool_or(CAST(l_quantity AS BIGINT) > 49)
                  AS any_qty_gt49,
                bool_and(CAST(l_discount AS DOUBLE) >= 0)
                  AS every_disc_nonneg,
                bit_and(CAST(l_quantity AS BIGINT)) AS qty_bit_and,
                bit_or(CAST(l_quantity AS BIGINT)) AS qty_bit_or,
                bit_xor(CAST(l_quantity AS BIGINT)) AS qty_bit_xor,
                CAST(sum(CASE WHEN CAST(l_quantity AS BIGINT) % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_even
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // q434: DuckDB resolves lateral select-list aliases natively —
    // near-verbatim statement.
    "q434_lateral_alias" ->
      """SELECT kd AS k_dollars, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(dollars) AS BIGINT) AS dollars
         FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                        AS BIGINT) AS cents,
                      cents // 100 AS dollars,
                      dollars // 100000 AS kd
               FROM orders)
         GROUP BY kd ORDER BY kd""",

    // q435: the resolved statement — IDENTIFIER() must be pure name
    // indirection.
    "q435_identifier_clause" ->
      """SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n,
                CAST(max(o_totalprice) AS DOUBLE) AS max_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    // q436: HUGEINT mirrors DECIMAL(38,0); whole dollars like the
    // Spark side.
    "q436_grubbs" ->
      """WITH y AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2))
                           * 100 AS HUGEINT) // 100 AS y
                    FROM orders),
              m AS (SELECT count(*) AS n, sum(y) AS s, sum(y * y) AS ss
                    FROM y),
              dv AS (SELECT n, s, ss, max(abs(n * y - s)) AS maxdevn
                     FROM y CROSS JOIN m GROUP BY 1, 2, 3)
         SELECT CAST(n AS BIGINT) AS n,
                CAST(maxdevn // n AS BIGINT) AS max_dev_dollars,
                CAST((2 * maxdevn * maxdevn * (n - 1) * 1000000
                      + n * (n * ss - s * s))
                     // (2 * n * (n * ss - s * s)) AS BIGINT) AS g2_e6,
                CAST(((n - 1) * (n - 1) * 1000000) // n AS BIGINT)
                  AS g2_max_e6
         FROM dv""",

    // q437: same lower-median + exact ANOVA-on-|y−med| identities.
    "q437_brown_forsythe" ->
      """WITH y AS (SELECT o_orderpriority AS grp,
                           CAST(CAST(o_totalprice AS DECIMAL(14,2))
                             * 100 AS HUGEINT) // 100 AS y
                    FROM orders),
              r AS (SELECT grp, y,
                           row_number() OVER (PARTITION BY grp
                             ORDER BY y) AS rn,
                           count(*) OVER (PARTITION BY grp) AS ng
                    FROM y),
              med AS (SELECT grp, y AS med FROM r
                      WHERE rn = (ng + 1) // 2),
              z AS (SELECT y.grp, abs(y.y - med.med) AS z
                    FROM y JOIN med ON y.grp = med.grp),
              g AS (SELECT grp, count(*) AS n_g, sum(z) AS s_g,
                           sum(z * z) AS ss_g
                    FROM z GROUP BY 1),
              a AS (SELECT sum(n_g) AS n, count(*) AS k,
                           sum(s_g) AS s, sum(ss_g) AS ss,
                           sum((s_g * s_g) // n_g) AS sb_raw
                    FROM g),
              b AS (SELECT n, k, ss - (s * s) // n AS sst,
                           sb_raw - (s * s) // n AS ssb
                    FROM a)
         SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
                CAST((2 * ssb * (n - k) * 1000000
                      + (sst - ssb) * (k - 1))
                     // (2 * (sst - ssb) * (k - 1)) AS BIGINT)
                  AS f_bf_e6
         FROM b""",

    // q439: same dropped-median-tie rule and cleared-denominator z².
    "q439_runs_test" ->
      """WITH day AS (SELECT o_orderdate AS dt,
                             sum(CAST(CAST(o_totalprice
                               AS DECIMAL(14,2)) * 100 AS BIGINT))
                               AS rev
                      FROM orders GROUP BY 1),
              r AS (SELECT dt, rev,
                           row_number() OVER (ORDER BY rev) AS rn,
                           count(*) OVER () AS nd
                    FROM day),
              med AS (SELECT rev AS med FROM r
                      WHERE rn = (nd + 1) // 2),
              sg AS (SELECT dt, CAST(rev > med AS INT) AS sg
                     FROM day CROSS JOIN med WHERE rev <> med),
              ch AS (SELECT sg, CAST(sg <> lag(sg, 1)
                       OVER (ORDER BY dt) AS INT) AS chg
                     FROM sg),
              ag AS (SELECT count(*) AS n, sum(sg) AS a,
                            1 + sum(coalesce(chg, 0)) AS runs
                     FROM ch),
              fx AS (SELECT n, a, n - a AS b, runs FROM ag)
         SELECT CAST(n AS BIGINT) AS n, CAST(a AS BIGINT) AS a,
                CAST(b AS BIGINT) AS b, CAST(runs AS BIGINT) AS runs,
                CAST((2 * CAST(runs * n - 2 * a * b - n AS HUGEINT)
                      * (runs * n - 2 * a * b - n) * (n - 1) * 1000000
                      + 2 * a * b * (2 * a * b - n))
                     // (2 * 2 * a * b * (2 * a * b - n)) AS BIGINT)
                  AS z2_e6
         FROM fx""",

    // q442: DuckDB's native UNION ALL BY NAME null-fills the missing
    // column — the independent check of Spark's unionByName.
    "q442_union_by_name" ->
      """SELECT coalesce(pri, '<missing>') AS pri,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cents) AS BIGINT) AS cents,
                CAST(min(k) AS BIGINT) AS min_key
         FROM (
           SELECT o_orderkey AS k, o_orderpriority AS pri,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                    AS BIGINT) AS cents
           FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL BY NAME
           SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                    AS BIGINT) AS cents, o_orderkey AS k
           FROM orders WHERE o_orderpriority = '5-LOW')
         GROUP BY 1 ORDER BY 1""",

    // q450: same value-domain collapse; explicit c/p columns.
    "q450_jonckheere" ->
      """WITH y AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2))
                           * 100 AS BIGINT) // 100 AS v,
                           CAST(substr(o_orderpriority, 1, 1) AS INT)
                             AS g
                    FROM orders),
         cells AS (SELECT v,
                          sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1,
                          sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS c2,
                          sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS c3,
                          sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS c4,
                          sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS c5
                   FROM y GROUP BY 1),
         pf AS (SELECT *, coalesce(sum(c1) OVER pw, 0) AS p1,
                       coalesce(sum(c2) OVER pw, 0) AS p2,
                       coalesce(sum(c3) OVER pw, 0) AS p3,
                       coalesce(sum(c4) OVER pw, 0) AS p4,
                       coalesce(sum(c5) OVER pw, 0) AS p5
                FROM cells
                WINDOW pw AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND 1 PRECEDING)),
         a AS (SELECT sum(2*c2*p1 + c1*c2 + 2*c3*p1 + c1*c3
                        + 2*c4*p1 + c1*c4 + 2*c5*p1 + c1*c5
                        + 2*c3*p2 + c2*c3 + 2*c4*p2 + c2*c4
                        + 2*c5*p2 + c2*c5 + 2*c4*p3 + c3*c4
                        + 2*c5*p3 + c3*c5 + 2*c5*p4 + c4*c5) AS j2,
                      sum(c1+c2+c3+c4+c5) AS n
               FROM pf),
         ng AS (SELECT sum(c1) AS n1, sum(c2) AS n2, sum(c3) AS n3,
                       sum(c4) AS n4, sum(c5) AS n5
                FROM cells),
         b AS (SELECT j2, n,
                      (n * n - (n1*n1 + n2*n2 + n3*n3 + n4*n4
                        + n5*n5)) // 2 AS mu2,
                      n * n * (2 * n + 3)
                        - (n1*n1*(2*n1+3) + n2*n2*(2*n2+3)
                           + n3*n3*(2*n3+3) + n4*n4*(2*n4+3)
                           + n5*n5*(2*n5+3)) AS den72
               FROM a CROSS JOIN ng)
         SELECT CAST(n AS BIGINT) AS n, CAST(j2 AS BIGINT) AS j2,
                CAST(mu2 AS BIGINT) AS mu2,
                CAST((2 * 18 * CAST(j2 - mu2 AS HUGEINT) * (j2 - mu2)
                      * 1000000 + den72) // (2 * den72) AS BIGINT)
                  AS z2_e6,
                j2 > mu2 AS trend_up
         FROM b""",

    // q451: same complete-block filter, min-rank tie convention.
    "q451_friedman_test" ->
      """WITH wk AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                             o_orderdate) AS BIGINT) // 7 AS w,
                           o_orderpriority AS pri,
                           sum(CAST(CAST(o_totalprice
                             AS DECIMAL(14,2)) * 100 AS BIGINT))
                             AS rev
                    FROM orders GROUP BY 1, 2),
         cb AS (SELECT w, pri, rev,
                       count(*) OVER (PARTITION BY w) AS npri
                FROM wk),
         rk AS (SELECT pri, rank() OVER (PARTITION BY w ORDER BY rev)
                         AS r
                FROM cb WHERE npri = 5),
         rs AS (SELECT pri, sum(r) AS rj, count(*) AS nblk
                FROM rk GROUP BY 1),
         a AS (SELECT count(*) AS k, min(nblk) AS nb,
                      sum(rj * rj) AS sr2
               FROM rs)
         SELECT CAST(nb AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
                CAST(sr2 AS BIGINT) AS sr2,
                CAST((2 * 12 * sr2 * 1000000 + nb * k * (k + 1))
                     // (2 * nb * k * (k + 1))
                     - 3 * nb * (k + 1) * 1000000 AS BIGINT) AS q_e6
         FROM a""",

    // q454: the unhinted statement — hints must not change answers.
    "q454_join_hints" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
                  * 100 AS BIGINT)) AS BIGINT) AS cents
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation na ON c.c_nationkey = na.n_nationkey
         GROUP BY 1 ORDER BY 1""",

    // q457: same labeled multi-source BFS, rounds MATERIALIZED (the
    // q240/q243 inlining lesson).
    "q457_centrality_probe" -> {
      val rounds = (1 to 4).map { r =>
        s"""f$r AS MATERIALIZED (SELECT DISTINCT f.seed, e.dst AS node
                 FROM undm e JOIN f${r - 1} f ON e.src = f.node
                 WHERE NOT EXISTS (SELECT 1 FROM v${r - 1} v
                   WHERE v.seed = f.seed AND v.node = e.dst)),
            v$r AS MATERIALIZED (SELECT seed, node, hop FROM v${r - 1}
                 UNION ALL SELECT seed, node, $r FROM f$r)"""
      }.mkString(",\n            ")
      s"""WITH $duckCoSupplyUnd,
              undm AS MATERIALIZED (SELECT u AS src, v AS dst
                                    FROM und),
              nodes AS MATERIALIZED (SELECT DISTINCT src AS node
                                     FROM undm),
              nn AS (SELECT count(*) AS n_nodes FROM nodes),
              seeds AS MATERIALIZED (SELECT node AS seed FROM nodes
                                     ORDER BY node LIMIT 4),
              v0 AS MATERIALIZED (SELECT seed, seed AS node, 0 AS hop
                                  FROM seeds),
              f0 AS MATERIALIZED (SELECT seed, node FROM v0),
              $rounds,
              agg AS (SELECT seed, count(*) AS n_reached,
                             sum(hop) AS sum_d,
                             sum(720 // hop) AS harm720
                      FROM v4 WHERE hop > 0 GROUP BY 1)
         SELECT CAST(seed AS BIGINT) AS seed,
                CAST(n_reached AS BIGINT) AS n_reached,
                CAST(sum_d AS BIGINT) AS sum_d,
                CAST((2 * n_reached * n_reached * 1000000
                      + (n_nodes - 1) * sum_d)
                     // (2 * (n_nodes - 1) * sum_d) AS BIGINT)
                  AS closeness_e6,
                CAST((2 * harm720 * 1000000 + 720 * (n_nodes - 1))
                     // (2 * 720 * (n_nodes - 1)) AS BIGINT)
                  AS harmonic_e6
         FROM agg CROSS JOIN nn ORDER BY seed"""
    },

    // q458: views inlined as CTEs — predicate semantics, not view
    // machinery, decide the rows.
    "q458_rls_tenant_views" ->
      """WITH rls_asia AS (
           SELECT c.c_custkey, n.n_name, r.r_name
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'ASIA'),
         rls_europe AS (
           SELECT c.c_custkey, n.n_name, r.r_name
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'EUROPE')
         SELECT r_name AS tenant,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations,
                CAST((SELECT count(*) FROM rls_asia a
                      JOIN rls_europe e ON a.c_custkey = e.c_custkey)
                  AS BIGINT) AS n_leaked
         FROM (SELECT * FROM rls_asia
               UNION ALL SELECT * FROM rls_europe)
         GROUP BY 1 ORDER BY 1""",

    // q462: same cell table and sign-split gamma.
    "q462_gk_gamma" ->
      """WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT)
                             AS g,
                           CAST(CAST(o_totalprice AS DECIMAL(14,2))
                             * 100 AS BIGINT) AS cents, o_orderkey
                    FROM orders),
              q AS (SELECT g, ntile(4) OVER (ORDER BY cents,
                      o_orderkey) AS b
                    FROM o),
              cells AS (SELECT g, b, count(*) AS n FROM q
                        GROUP BY 1, 2),
              a AS (SELECT sum(CASE WHEN y.g > x.g AND y.b > x.b
                             THEN x.n * y.n ELSE 0 END) AS c,
                           sum(CASE WHEN y.g > x.g AND y.b < x.b
                             THEN x.n * y.n ELSE 0 END) AS dd
                    FROM cells x CROSS JOIN cells y)
         SELECT CAST(c AS BIGINT) AS concordant,
                CAST(dd AS BIGINT) AS discordant,
                CASE WHEN c >= dd THEN
                  CAST((2 * (c - dd) * 1000000 + (c + dd))
                       // (2 * (c + dd)) AS BIGINT)
                ELSE
                  -CAST((2 * (dd - c) * 1000000 + (c + dd))
                       // (2 * (c + dd)) AS BIGINT) END AS gamma_e6
         FROM a""",

    // q466: same value-domain percentile machinery.
    "q466_fulfillment_lag" ->
      """WITH lag AS (
           SELECT o.o_orderpriority AS pri,
                  CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag,
                  count(*) AS cnt
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey
           GROUP BY 1, 2),
         cu AS (SELECT pri, lag, cnt,
                       sum(cnt) OVER (PARTITION BY pri ORDER BY lag
                         ROWS BETWEEN UNBOUNDED PRECEDING AND
                         CURRENT ROW) AS cum,
                       sum(cnt) OVER (PARTITION BY pri) AS n,
                       sum(cnt * lag) OVER (PARTITION BY pri) AS sx
                FROM lag),
         a AS (SELECT pri, max(n) AS n, max(sx) AS sx,
                      min(CASE WHEN cum >= (n + 1) // 2 THEN lag
                          END) AS p50_lag,
                      min(CASE WHEN cum >= (9 * n + 9) // 10
                          THEN lag END) AS p90_lag,
                      max(lag) AS max_lag
               FROM cu GROUP BY 1)
         SELECT pri, CAST(n AS BIGINT) AS n,
                CAST((2 * sx * 100 + n) // (2 * n) AS BIGINT)
                  AS mean_lag_e2,
                CAST(p50_lag AS BIGINT) AS p50_lag,
                CAST(p90_lag AS BIGINT) AS p90_lag,
                CAST(max_lag AS BIGINT) AS max_lag
         FROM a ORDER BY pri""",

    // q468: same planted shift, same ceil-indexed decile picks.
    "q468_qte_deciles" ->
      """WITH v AS (SELECT ('0x' || substr(md5('ar#'
                      || CAST(o_custkey AS VARCHAR)), 1, 4))::BIGINT
                      % 2 AS arm,
                           CAST(CAST(o_totalprice AS DECIMAL(14,2))
                             * 100 AS BIGINT) // 100 AS y0
                    FROM orders),
         vv AS (SELECT arm, y0 + 500 * arm AS y, count(*) AS cnt
                FROM v GROUP BY 1, 2),
         cu AS (SELECT arm, y, cnt,
                       sum(cnt) OVER (PARTITION BY arm ORDER BY y
                         ROWS BETWEEN UNBOUNDED PRECEDING AND
                         CURRENT ROW) AS cum,
                       sum(cnt) OVER (PARTITION BY arm) AS n
                FROM vv),
         qs AS (SELECT unnest(range(1, 10)) AS q),
         pk AS (SELECT q, arm, min(y) AS yq
                FROM cu CROSS JOIN qs
                WHERE cum >= (q * n + 9) // 10
                GROUP BY 1, 2)
         SELECT CAST(q AS BIGINT) AS decile,
                CAST(max(CASE WHEN arm = 0 THEN yq END) AS BIGINT)
                  AS y_control,
                CAST(max(CASE WHEN arm = 1 THEN yq END) AS BIGINT)
                  AS y_treated,
                CAST(max(CASE WHEN arm = 1 THEN yq END)
                     - max(CASE WHEN arm = 0 THEN yq END) AS BIGINT)
                  AS qte_dollars
         FROM pk GROUP BY 1 ORDER BY decile""",

    // q477: same ceil-indexed q̂ pick and held-out coverage.
    "q477_conformal_interval" ->
      """WITH wk AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                             o_orderdate) AS BIGINT) // 7 AS w,
                            sum(CAST(CAST(o_totalprice
                              AS DECIMAL(14,2)) * 100 AS BIGINT))
                              AS y
                     FROM orders GROUP BY 1),
         res AS (SELECT w, abs(y - yl) AS r FROM (
                   SELECT w, y, lag(y, 1) OVER (ORDER BY w) AS yl
                   FROM wk) s
                 WHERE yl IS NOT NULL),
         cal AS (SELECT r, count(*) AS cnt FROM res
                 WHERE w BETWEEN 100 AND 279 GROUP BY 1),
         cu AS (SELECT r,
                       sum(cnt) OVER (ORDER BY r ROWS BETWEEN
                         UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       sum(cnt) OVER () AS n
                FROM cal),
         qh AS (SELECT min(r) AS qhat, max(n) AS n_cal FROM cu
                WHERE cum >= (9 * (n + 1) + 9) // 10),
         t AS (SELECT r FROM res WHERE w BETWEEN 280 AND 320)
         SELECT CAST(max(n_cal) AS BIGINT) AS n_cal,
                CAST(max(qhat) AS BIGINT) AS qhat_cents,
                CAST(count(*) AS BIGINT) AS n_test,
                CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_covered,
                CAST((2 * sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END)
                      * 10000 + count(*)) // (2 * count(*))
                  AS BIGINT) AS coverage_bp
         FROM t CROSS JOIN qh""",

    // q478: same complete-window MA and sign-split seasonal means.
    "q478_seasonal_profile" ->
      """WITH wk AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                             o_orderdate) AS BIGINT) // 7 AS w,
                            sum(CAST(CAST(o_totalprice
                              AS DECIMAL(14,2)) * 100 AS BIGINT))
                              AS y
                     FROM orders GROUP BY 1),
         ma AS (SELECT w, y,
                       sum(y) OVER (ORDER BY w ROWS BETWEEN 26
                         PRECEDING AND 26 FOLLOWING) AS tsum,
                       count(*) OVER (ORDER BY w ROWS BETWEEN 26
                         PRECEDING AND 26 FOLLOWING) AS tn
                FROM wk),
         dd AS (SELECT w % 52 AS woy,
                       y * 100 - (2 * tsum * 100 + 53) // 106 AS d_e2
                FROM ma WHERE tn = 53),
         g AS (SELECT woy, count(*) AS n, sum(d_e2) AS sd FROM dd
               GROUP BY 1),
         sg AS (SELECT woy, n,
                       CASE WHEN sd >= 0 THEN (2 * sd + n) // (2 * n)
                            ELSE -((2 * -sd + n) // (2 * n)) END
                         AS seasonal_e2
                FROM g)
         SELECT CAST(woy AS BIGINT) AS woy, CAST(n AS BIGINT) AS n,
                CAST(seasonal_e2 AS BIGINT) AS seasonal_e2,
                CAST(row_number() OVER (ORDER BY seasonal_e2 DESC,
                  woy) AS BIGINT) AS rnk
         FROM sg ORDER BY woy""",

    // q475: the same three pages — keyset ≡ offset on a stable
    // total order.
    "q475_keyset_pagination" ->
      """WITH ord AS (SELECT o_orderkey AS k,
                             CAST(o_orderdate AS DATE) AS dt
                      FROM orders),
         b1 AS (SELECT dt AS bd, k AS bk FROM ord
                ORDER BY dt, k LIMIT 1 OFFSET 4),
         b2 AS (SELECT dt AS bd, k AS bk FROM ord
                ORDER BY dt, k LIMIT 1 OFFSET 9),
         p1 AS (SELECT 1 AS page, dt, k FROM ord
                ORDER BY dt, k LIMIT 5),
         p2 AS (SELECT 2 AS page, dt, k FROM ord, b1
                WHERE dt > bd OR (dt = bd AND k > bk)
                ORDER BY dt, k LIMIT 5),
         p3 AS (SELECT 3 AS page, dt, k FROM ord, b2
                WHERE dt > bd OR (dt = bd AND k > bk)
                ORDER BY dt, k LIMIT 5)
         SELECT CAST(page AS BIGINT) AS page, dt AS order_date,
                CAST(k AS BIGINT) AS order_key
         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
               UNION ALL SELECT * FROM p3)
         ORDER BY page, order_date, order_key""",

    // q476: same blocked ranks, closed-form null moments for k=5.
    "q476_page_trend" ->
      """WITH wk AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                             o_orderdate) AS BIGINT) // 7 AS w,
                            CAST(substr(o_orderpriority, 1, 1)
                              AS INT) AS g,
                            sum(CAST(CAST(o_totalprice
                              AS DECIMAL(14,2)) * 100 AS BIGINT))
                              AS rev
                     FROM orders GROUP BY 1, 2),
         cb AS (SELECT w, g, rev,
                       count(*) OVER (PARTITION BY w) AS npri
                FROM wk),
         rk AS (SELECT w, g, rank() OVER (PARTITION BY w
                         ORDER BY rev) AS r
                FROM cb WHERE npri = 5),
         a AS (SELECT count(DISTINCT w) AS nb, sum(g * r) AS l
               FROM rk),
         b AS (SELECT nb, l, 4 * l - nb * 5 * 36 AS l_dev4 FROM a)
         SELECT CAST(nb AS BIGINT) AS nb, CAST(l AS BIGINT) AS l,
                CAST(l_dev4 AS BIGINT) AS l_dev4,
                CAST((2 * 9 * l_dev4 * l_dev4 * 1000000
                      + 1350 * nb * 16)
                     // (2 * 1350 * nb * 16) AS BIGINT) AS z2_e6,
                l_dev4 > 0 AS trend_up
         FROM b""",

    // q471: same folds and tiny self-joins on the weekly frame.
    "q471_rolling_origin_backtest" ->
      """WITH wk AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                             o_orderdate) AS BIGINT) // 7 AS w,
                            sum(CAST(CAST(o_totalprice
                              AS DECIMAL(14,2)) * 100 AS BIGINT))
                              AS y
                     FROM orders GROUP BY 1),
         folds AS (SELECT f AS fold,
                          CAST(280 + 8 * (f - 1) AS BIGINT)
                            AS origin_w
                   FROM (SELECT unnest(range(1, 5)) AS f)),
         test AS (SELECT fold, origin_w, w, y
                  FROM wk CROSS JOIN folds
                  WHERE w > origin_w AND w <= origin_w + 8),
         j AS (SELECT t.fold, t.origin_w, t.y, nv.y AS y_naive,
                      sn.y AS y_snaive
               FROM test t JOIN wk nv ON nv.w = t.origin_w
                 JOIN wk sn ON sn.w + 52 = t.w)
         SELECT CAST(fold AS BIGINT) AS fold,
                CAST(origin_w AS BIGINT) AS origin_w,
                CAST(count(*) AS BIGINT) AS n_test,
                CAST(sum(abs(y - y_naive)) AS BIGINT)
                  AS mae_naive_sum_c,
                CAST(sum(abs(y - y_snaive)) AS BIGINT)
                  AS mae_snaive_sum_c,
                CASE WHEN sum(abs(y - y_snaive))
                       < sum(abs(y - y_naive))
                     THEN 'seasonal' ELSE 'naive' END AS winner
         FROM j GROUP BY 1, 2 ORDER BY fold""",

    // q469: same exposure split over the shared co-supply chain.
    "q469_interference_audit" ->
      s"""WITH $duckCoSupplyUnd,
              rev AS (SELECT l_suppkey AS sk,
                             sum(CAST(CAST(l_extendedprice
                               AS DECIMAL(14,2)) * 100 AS BIGINT))
                               AS cents
                      FROM lineitem GROUP BY 1),
              ra AS (SELECT sk, cents,
                            ('0x' || substr(md5('ia#'
                              || CAST(sk AS VARCHAR)), 1, 4))::BIGINT
                              % 2 AS t
                     FROM rev),
              exposed AS (SELECT DISTINCT und.u AS sk
                          FROM und JOIN ra ON und.v = ra.sk
                            AND ra.t = 1),
              ctl AS (SELECT ra.cents,
                             CASE WHEN exposed.sk IS NOT NULL
                                  THEN 1 ELSE 0 END AS ex
                      FROM ra LEFT JOIN exposed
                        ON ra.sk = exposed.sk
                      WHERE ra.t = 0),
              g AS (SELECT ex, count(*) AS n, sum(cents) AS s
                    FROM ctl GROUP BY 1),
              a AS (SELECT max(CASE WHEN ex = 1 THEN n END)
                             AS n_exposed,
                           max(CASE WHEN ex = 0 THEN n END)
                             AS n_isolated,
                           max(CASE WHEN ex = 1 THEN s END) AS s_exp,
                           max(CASE WHEN ex = 0 THEN s END) AS s_iso
                    FROM g)
         SELECT CAST(n_exposed AS BIGINT) AS n_exposed,
                CAST(n_isolated AS BIGINT) AS n_isolated,
                CASE WHEN s_exp * n_isolated >= s_iso * n_exposed
                THEN CAST((2 * CAST(s_exp * n_isolated
                       - s_iso * n_exposed AS HUGEINT) * 100
                       + n_exposed * n_isolated)
                     // (2 * CAST(n_exposed AS HUGEINT)
                        * n_isolated) AS BIGINT)
                ELSE -CAST((2 * CAST(s_iso * n_exposed
                       - s_exp * n_isolated AS HUGEINT) * 100
                       + n_exposed * n_isolated)
                     // (2 * CAST(n_exposed AS HUGEINT)
                        * n_isolated) AS BIGINT)
                END AS exposure_diff_e2
         FROM a""",
  )
}
