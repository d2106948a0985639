package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage over the driver testdata (SURVEY.md §3.2–
  * §3.7), each with a DuckDB-oracle twin in [[Oracles]].
  *
  * Float discipline: double aggregates are cast to exact DECIMAL before
  * summation in BOTH engines, so results are bit-identical regardless of
  * summation order (per-row IEEE double ops are deterministic; only
  * reductions are order-sensitive). Every query ends in a total ORDER BY.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: grouped aggregation (TPC-H Q1 shape) — partial+final hash agg
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(22, 6))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J1/J2: multi-way star join with broadcast dims; revenue per nation
    "q02_revenue_by_nation" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(22, 6))).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // O1/W1: global top-k (TakeOrderedAndProject)
    "q03_topk_orders" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("total"))
        .orderBy(col("total").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // J7: left-semi (EXISTS)
    "q04_semi_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // J2-shape: left-anti (NOT EXISTS)
    "q05_anti_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    }),

    // W3-shape: per-group top-k via row_number window
    "q06_window_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // W4: lag-based delta per partition
    "q07_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("prev_price",
          lag(col("o_totalprice").cast(DecimalType(18, 2)), 1).over(w))
        .filter(col("prev_price").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) - col("prev_price"))
            .cast("double").as("price_delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // W5: running sum with explicit frame
    "q08_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .withColumn("running_qty",
          sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast("double"))
        .filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // A2: distinct
    "q09_distinct_pairs" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // O3/O4/O5: set ops — one-row summary of union/except/intersect sizes.
    // ONE distributed pass, no driver actions: both sides are key-unique
    // (c_custkey is the PK; active is distinct), so a full-outer join
    // tagged with membership flags yields one row per union member and
    // the three counts fall out of a single aggregation.
    "q10_set_ops" -> ((s, d) => {
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey")).withColumn("in_rich", lit(true))
      val active = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
        .distinct().withColumn("in_active", lit(true))
      rich.join(active, Seq("c_custkey"), "full_outer")
        .agg(
          count(lit(1)).as("union_cnt"),
          sum(when(col("in_rich").isNotNull && col("in_active").isNull, 1L)
            .otherwise(0L)).as("except_cnt"),
          sum(when(col("in_rich").isNotNull && col("in_active").isNotNull, 1L)
            .otherwise(0L)).as("intersect_cnt"))
    }),

    // A5: group-having
    "q11_group_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 15)
        .orderBy(col("o_custkey"))
    }),

    // A3/A6: arg-max per group (deterministic tie-break)
    "q12_argmax_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey").as("top_custkey"),
          col("c_acctbal").cast(DecimalType(18, 2)).cast("double").as("top_acctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // A8: rollup with grouping id
    "q13_rollup" -> ((s, d) => {
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region"))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("r_name"), col("n_name"))
    }),

    // R12: JSON extraction from the events stream table
    "q14_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_val"))
        .filter(col("k_val").isNotNull)
        .orderBy(col("event_id"))
        .limit(500)
    }),

    // R10: date arithmetic / truncation
    "q15_date_trunc_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("month_total"))
        .orderBy(col("month"))
    }),

    // A4-shape: conditional aggregation over the events table
    "q16_conditional_agg" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") > 10, col("value").cast(DecimalType(18, 2)))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("big_value_sum"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // R4/R5-shape: regex predicates + extraction on free text
    "q17_regex_match" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          col("text").rlike("\\bspark\\b").as("mentions_spark"),
          regexp_extract(col("text"), "\\b(join|window|shuffle)\\b", 1).as("first_op"))
        .orderBy(col("doc_id"))
    }),

    // J1: broadcast-hint dimension join
    "q18_broadcast_join" -> ((s, d) => {
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("s_acctbal").cast(DecimalType(18, 2))).cast("double").as("total_bal"))
        .orderBy(col("n_name"))
    }),

    // T5-shape: event-time tumbling window aggregation (batch twin of the
    // streaming windowedCounts — see graft.streaming.EventStreams)
    "q20_time_window_agg" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Catalyst subquery decorrelation, through the SQL entry point
    "q21_correlated_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_custkey, count(*) AS n_above_avg
          |FROM v_orders o
          |WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
          |                      FROM v_orders o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
    }),

    // scalar subquery (global aggregate reused per row)
    "q22_scalar_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_rich
          |FROM v_customer
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_customer)
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    // O3: union + distinct aggregation across two sources
    "q19_union_distinct_agg" -> ((s, d) => {
      val cn = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.unionByName(sn)
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_parties"))
        .orderBy(col("nationkey"))
    }))
}
