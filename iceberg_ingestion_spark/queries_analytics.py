"""Analytics breadth: TPC-H-style queries adapted to the testdata schema, plus
rollup, top-N-per-group and as-of-join showcases. Same cross-engine exactness
conventions as queries.py (decimal-exact sums cast to double at the end,
identical aliases both sides, timestamps as formatted strings).

The testdata is reduced TPC-H (no partsupp, no commit/receipt dates, no
shipmode), so the classics are adapted: the join/aggregation shape and the
Spark physical strategy notes are the point, not TPC-H compliance.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators.asof import asof_join
from iceberg_ingestion_spark.queries import TS_FMT_DUCK, _dec, _fmt_ts, read_table
from iceberg_ingestion_spark.queries_ext import read_events_us

_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"


def _disc_price() -> F.Column:
    return _dec("l_extendedprice", 12) * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 12))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side filter + global agg — the predicate-pushdown
    showcase (every filter reaches the parquet scan; no shuffle but the final
    1-row combine)."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice", 12) * _dec("l_discount", 12))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join lineitem->orders, count by priority.
    (Adapted: 'late' = shipped after the order date; no commitdate column.)"""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair revenue by ship year. Both nation
    dims broadcast; one shuffle on the group keys."""
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over parts
    matching a name pattern. (Adapted: cost = p_retailprice * quantity; no
    partsupp table.)"""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    amount = _disc_price() - _dec("p_retailprice", 12) * _dec("l_quantity", 12)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in one quarter."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count histogram via LEFT OUTER join with a
    non-key predicate, then double aggregation."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregate share — promo revenue percentage."""
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    dp = _disc_price()
    agged = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", dp)).cast("double").alias("promo"),
            F.sum(dp).cast("double").alias("total"),
        )
    )
    return agged.select(
        (F.lit(100.0) * F.col("promo") / F.col("total")).alias("promo_revenue_pct")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: suppliers whose quarterly revenue equals the maximum (the
    max joins back as a broadcast 1-row aggregate — no second scan, no
    single-task global window)."""
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    # global max as a broadcast 1-row aggregate: an empty-partitionBy window
    # would drag every per-supplier row through ONE task at any scale (r4 —
    # same fix class as q11/tfidf; bounded BNLJ, allow-listed in the audit)
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lineitems under 20% of their part's average quantity. The
    correlated scalar subquery becomes a per-part window (one shuffle, no
    re-scan); the average is decimal-sum / count for cross-engine exactness."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    l = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    thr = F.lit(0.2) * (
        F.sum(_dec("l_quantity")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    )
    small = l.withColumn("thr", thr).filter(F.col("l_quantity") < F.col("thr"))
    return small.join(F.broadcast(p), small.l_partkey == p.p_partkey).agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders above a total-quantity threshold, with customer."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 250.0)
    )
    out = (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
    return _fmt_ts(out, "o_orderdate")


def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity brackets — tests OR
    predicate handling across a broadcast join."""
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q22_inactive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and no
    urgent orders — broadcast scalar threshold + anti-join."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    inactive = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return inactive.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part (of a size bracket), the supplier(s) offering
    its minimum observed price — the correlated-min pattern as a per-part
    window over the (supplier, part) aggregate. (Adapted: lineitem is the
    part-supplier bridge and 'cost' = min extendedprice/quantity observed; no
    partsupp table.)"""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    l = read_table(spark, sf_dir, "lineitem")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    per_sp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_suppkey", "l_partkey", "p_name", unit)
        .groupBy("l_suppkey", "l_partkey", "p_name")
        .agg(F.min("unit_price").alias("min_unit_price"))
    )
    w = Window.partitionBy("l_partkey")
    best = per_sp.withColumn("part_min", F.min("min_unit_price").over(w)).filter(
        F.col("min_unit_price") == F.col("part_min")
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"), "p_name", "s_name",
            F.col("n_name").alias("supp_nation"), "min_unit_price",
        )
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose share of total inventory value exceeds a
    threshold — group + broadcast-total share, HAVING-style filter. (Adapted:
    value = retailprice * shipped quantity via lineitem; no partsupp.)"""
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem")
    val = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec("p_retailprice", 12) * _dec("l_quantity", 12))
            .cast("double")
            .alias("part_value")
        )
    )
    # global share denominator as a broadcast 1-row aggregate — the empty
    # partitionBy window funneled every per-part row through one task (r4)
    total = val.agg(F.sum("part_value").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.0005) * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


def q12_return_class_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per lineitem class, how many orders are high- vs
    low-priority — the conditional two-way count after a fact join. (Adapted:
    the class column is l_returnflag; no shipmode.)"""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue into one
    region, by year. Share = double division of two decimal-exact sums."""
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n_cust = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    dp = _disc_price()
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
    )
    return (
        vol.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", dp)).cast("double").alias("nation_rev"),
            F.sum(dp).cast("double").alias("total_rev"),
        )
        .select(
            "o_year",
            (F.coalesce(F.col("nation_rev"), F.lit(0.0)) / F.col("total_rev")).alias("mkt_share"),
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, size) bucket, excluding
    one brand — the COUNT(DISTINCT) + exclusion-filter pattern (adapted to
    lineitem as the part-supplier bridge; no partsupp table)."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 30% of a part's total
    1996 volume, for parts matching a name pattern. The correlated 'excess
    share' subquery becomes a per-part window over the (supplier, part)
    aggregate — one shuffle, no re-scan."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    per_sp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    share = per_sp.withColumn("part_qty", F.sum("supp_qty").over(w)).filter(
        F.col("supp_qty") > F.lit(0.3) * F.col("part_qty")
    )
    return (
        share.join(F.broadcast(s), share.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "l_partkey", "supp_qty", "part_qty")
    )


def q21_single_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, the number of multi-supplier orders where
    that supplier was the ONLY one to ship after the order date. Double
    correlated EXISTS/NOT EXISTS collapses to one per-order aggregate."""
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    # two-level aggregate instead of countDistinct pairs: the first groupBy
    # collapses to one row per (order, supplier), so the per-order pass needs
    # no expand-based distinct — same result, one fewer wide pass.
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_shipdate") > F.col("o_orderdate"), 1).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("is_late").alias("n_late_supp"),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(F.broadcast(s), per_order.late_supp == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of extended price per return flag — quantile as the
    value at ``ceil(q*n)`` in sort order (percentile_disc semantics), so both
    engines pick the identical element (approx-percentile sketches are
    engine-specific; this is the deterministic form).

    Two-phase distributed selection — the group key has only 3 distinct
    values, so a ``Window.partitionBy(l_returnflag)`` rank would funnel the
    whole table through 3 tasks. Instead:

    1. range-repartition on the full sort key — the range exchange spreads
       each group across MANY partitions, contiguously in sort order;
    2. per (partition, group) row counts -> cumulative offsets (a window over
       #partitions × #groups rows — driver-scale, not data-scale);
    3. local ``row_number`` within each (partition, group) — parallel across
       range partitions — plus the broadcast offset = the exact global rank.

    Every stage is bounded by the range-partition size at any data scale; the
    GK sketch (``sketch_approx_quantiles``) remains the documented default
    when ±1% rank error is acceptable."""
    from iceberg_ingestion_spark.session import default_parallelism

    sort_cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    l = read_table(spark, sf_dir, "lineitem").select("l_returnflag", *sort_cols)
    # `ranged` feeds TWO plan subtrees (offsets and ranked) whose correctness
    # requires IDENTICAL pid assignment in both — one materialized evaluation.
    # localCheckpoint (eager) pins that: pids are frozen in the materialized
    # blocks (executor memory spilling to local disk) and the lineage is
    # truncated, so neither subtree can re-run the range exchange. Unlike the
    # previous cache(), the blocks don't live in the unified cache region
    # competing with the rest of a 100 TB job's working set, and an evicted
    # block can't be recomputed down a different sampling path — pid
    # consistency is structural, not an artifact of exchange reuse.
    ranged = (
        l.repartitionByRange(
            default_parallelism(), "l_returnflag", *[F.col(c) for c in sort_cols]
        )
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    seg = ranged.groupBy("pid", "l_returnflag").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.partitionBy("l_returnflag").orderBy("pid")
    offsets = seg.select(
        "pid",
        "l_returnflag",
        (F.sum("cnt").over(w_off) - F.col("cnt")).alias("offset"),
        F.sum("cnt").over(Window.partitionBy("l_returnflag")).alias("n"),
    )

    w_local = Window.partitionBy("pid", "l_returnflag").orderBy(*sort_cols)
    ranked = (
        ranged.withColumn("lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["pid", "l_returnflag"])
        .withColumn("rn", F.col("offset") + F.col("lrn"))
    )
    # one conditional-aggregation pass picks all three quantiles (no re-scan)
    picks = [
        F.max(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("l_extendedprice"))
        ).alias(name)
        for q, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    ]
    return ranked.groupBy("l_returnflag").agg(*picks)


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Score = tf * N / df with
    multiplication/division only (no log — libm rounding differs across
    engines; the ranking is identical). Shape: explode -> (doc, term) counts
    -> term document-frequency join -> per-doc window top-k."""
    d = read_table(spark, sf_dir, "documents", spread=True)
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    # N folded into the plan as a broadcast 1-row aggregate — a separate
    # d.count() action was an extra full corpus scan before the main job.
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.col("_n_docs") / F.col("df"))
        .drop("_n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "score")
    )


def running_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order-value totals (rows-frame cumulative window) —
    decimal-exact cumulative sums cast to double per row. One shuffle on the
    customer key; frame evaluation is streaming within each partition."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
    )
    return _fmt_ts(out, "o_orderdate")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) customer-balance subtotals (grand total included):
    multi-level aggregation in one pass."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_balance",
        )
    )


def layout_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order curve values for (p_size, p_retailprice) — the layout key
    `zorder_layout` clusters files by. Driver-checks the interleaving math
    itself: min/max grid normalization (the one bounded driver collect —
    the codebook pattern) + bit interleave, reproduced bit-for-bit by the
    oracle's generated 16-term SQL."""
    from iceberg_ingestion_spark.operators.layout import zorder_value

    p = read_table(spark, sf_dir, "part")
    z = zorder_value(p, ["p_size", "p_retailprice"], bits=8)
    return p.select("p_partkey", z.alias("zvalue"))


def _zorder_oracle_sql(bits: int = 8) -> str:
    cols = ["p_size", "p_retailprice"]
    quant = []
    for i, c in enumerate(cols):
        span = f"(CASE WHEN hi{i} - lo{i} = 0 THEN 1.0 ELSE hi{i} - lo{i} END)"
        quant.append(
            f"CAST(least(255, floor((CAST({c} AS DOUBLE) - lo{i}) / {span} * 256))"
            f" AS BIGINT) AS q{i}"
        )
    terms = " + ".join(
        f"((q{i} >> {b}) & 1) * {1 << (b * len(cols) + i)}"
        for b in range(bits)
        for i in range(len(cols))
    )
    stats = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS lo{i}, max(CAST({c} AS DOUBLE)) AS hi{i}"
        for i, c in enumerate(cols)
    )
    return f"""
        WITH stats AS (SELECT {stats} FROM part),
        q AS (SELECT p_partkey, {', '.join(quant)} FROM part, stats)
        SELECT p_partkey, CAST({terms} AS BIGINT) AS zvalue FROM q
    """


def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth on one pass: lag / lead / ntile / percent_rank
    / cume_dist per customer over order history. The partition key is
    high-cardinality (custkey), so the window parallelism IS the shuffle
    parallelism — the low-cardinality trap ``topn_orders_per_segment``
    documents doesn't apply. Rank ties are impossible by construction
    (total order on (o_orderdate, o_orderkey))."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(returnflag, linestatus) quantity totals — all four grouping-set
    levels in one pass, with per-column GROUPING flags distinguishing
    'aggregated over' from a genuine NULL key (the flag is what makes CUBE
    output joinable/filterable downstream without string sentinels).

    The 3-column projection is repartitioned to session parallelism before
    the CUBE: Expand multiplies every input row by the number of grouping
    sets (4x here) BEFORE the partial aggregate, and the driver parquet is a
    single row group — without the spread the 4x row blow-up and the decimal
    sums all run ~3-wide (measured 3.9-5.7s solo at sf0.1; ~0.6s spread)."""
    from iceberg_ingestion_spark.session import default_parallelism

    l = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .repartition(default_parallelism())
    )
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_returnflag"),
            F.grouping("l_linestatus").cast("int").alias("g_linestatus"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "g_returnflag",
            "g_linestatus",
            "n_items",
            "sum_qty",
        )
    )


def topn_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment — windowed top-N over a
    LOW-cardinality group key, via two-phase distributed selection
    (``low_cardinality_top_n``): a plain ``Window.partitionBy(segment)``
    would funnel every joined row through 5 tasks at any data size; phase 1
    ranks within (segment, 64-way salt) spread across the cluster and keeps
    local top-3s, phase 2 re-ranks the ≤ 5*64*3 candidates. Result identical
    (exactness argued in the operator docstring), pinned by the oracle's
    naive single-window SQL."""
    from iceberg_ingestion_spark.operators.skew import low_cardinality_top_n

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    out = low_cardinality_top_n(
        j,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        n=3,
        salt_on="o_orderkey",
    )
    return out.select("c_mktsegment", "rank", "o_orderkey", "o_totalprice", "c_name")


def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click at or
    before it (clicks pre-aggregated to one row per (user, ts) for determinism).
    """
    ev = read_events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(
        purchases, clicks, ["user_id"], "ts_us", "ts_us", ["click_id"], prefix="m_"
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("m_click_id").alias("click_id"),
        F.col("m_ts_us").alias("click_ts_us"),
        (F.col("ts_us") - F.col("m_ts_us")).alias("gap_us"),
    )


#: Measures reshaped by the unpivot entry (all integer-cent money / small
#: exact decimals, so the decimal sums are cross-engine exact).
UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def analytics_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape via ``DataFrame.unpivot`` (ANSI UNPIVOT / melt):
    the four lineitem measures become (measure, value) rows, then one
    uniform groupBy per (returnflag, measure). Unpivot is a narrow map-side
    transform — rows multiply by 4 but never shuffle until the keyed
    aggregate, and column pruning still reaches the scan (only the id +
    measure columns are read)."""
    l = read_table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        ["l_returnflag"], UNPIVOT_MEASURES, "measure", "value"
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.sum(_dec("value")).cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )


#: Pivot spine: o_orderstatus domain, pinned EXPLICITLY. Passing the value
#: list to ``pivot()`` matters at scale — without it Spark runs a separate
#: distinct-collect job over the pivot column before it can even plan.
PIVOT_STATUSES = ["F", "O", "P"]


def analytics_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide reshape (the inverse of the unpivot entry): revenue and
    order counts per priority, one column pair per order status. Pivot with a
    pinned spine compiles to ONE conditional aggregation — a single shuffle
    on the groupBy key, exactly the plan the hand-written CASE-sum form
    produces, with map-side partials absorbing the fan-in. Decimal-exact
    sums cast to double (q1 convention), NULL-filled to 0.0 so the result is
    total (a priority with no orders in some status reads as zero revenue,
    not a hole)."""
    o = read_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .na.fill(0)
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.col(f"{s}_{m}").alias(f"{m}_{s.lower()}")
            for s in PIVOT_STATUSES
            for m in ("revenue", "n_orders")
        ],
    )


QUERIES_ANALYTICS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "analytics_unpivot_measures": analytics_unpivot_measures,
    "analytics_pivot_status": analytics_pivot_status,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_late_shipment_priority": q4_late_shipment_priority,
    "q11_important_parts": q11_important_parts,
    "q12_return_class_priority": q12_return_class_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_nation_volume": q7_nation_volume,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_part_share_suppliers": q20_part_share_suppliers,
    "q21_single_late_supplier": q21_single_late_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q19_bracketed_revenue": q19_bracketed_revenue,
    "q22_inactive_balance": q22_inactive_balance,
    "analytics_exact_quantiles": exact_quantiles,
    "analytics_tfidf_top_terms": tfidf_top_terms,
    "analytics_running_totals": running_customer_totals,
    "rollup_revenue": rollup_revenue,
    "cube_flag_status": cube_flag_status,
    "analytics_window_suite": window_suite,
    "layout_zorder_values": layout_zorder_values,
    "topn_orders_per_segment": topn_orders_per_segment,
    "asof_last_click_before_purchase": asof_last_click_before_purchase,
}

_SUM_DBL = "CAST(SUM({expr}) AS DOUBLE)"


_UNPIVOT_LEGS = "\n            UNION ALL ".join(
    f"SELECT l_returnflag, '{m}' AS measure, {m} AS value FROM lineitem"
    for m in UNPIVOT_MEASURES
)

ORACLES_ANALYTICS: dict[str, str] = {
    "analytics_unpivot_measures": f"""
        WITH long AS (
            {_UNPIVOT_LEGS}
        )
        SELECT l_returnflag, measure,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               count(*) AS n_rows
        FROM long GROUP BY 1, 2
    """,
    "analytics_pivot_status": """
        SELECT o_orderpriority,
               COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
                   AS revenue_f,
               count(*) FILTER (o_orderstatus = 'F') AS n_orders_f,
               COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
                   AS revenue_o,
               count(*) FILTER (o_orderstatus = 'O') AS n_orders_o,
               COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P'
                   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
                   AS revenue_p,
               count(*) FILTER (o_orderstatus = 'P') AS n_orders_p
        FROM orders GROUP BY o_orderpriority
    """,
    "q2_min_cost_supplier": """
        WITH per_sp AS (
            SELECT l_suppkey, l_partkey, p_name,
                   min(l_extendedprice / l_quantity) AS min_unit_price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size BETWEEN 10 AND 20
            GROUP BY l_suppkey, l_partkey, p_name
        ), best AS (
            SELECT *, min(min_unit_price) OVER (PARTITION BY l_partkey) AS part_min
            FROM per_sp
        )
        SELECT l_partkey AS p_partkey, p_name, s_name,
               n_name AS supp_nation, min_unit_price
        FROM best
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE min_unit_price = part_min
    """,
    "q11_important_parts": """
        WITH val AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS part_value
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY l_partkey
        )
        SELECT l_partkey, part_value
        FROM (SELECT *, SUM(part_value) OVER () AS total_value FROM val)
        WHERE part_value > 0.0005 * total_value
    """,
    # SUM over INTEGER is HUGEINT in DuckDB (int128 -> float64 in Arrow) while
    # Spark's is LongType; CAST AS BIGINT keeps the value-hash type-identical.
    "q12_return_class_priority": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
    """,
    "q4_late_shipment_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "q7_nation_volume": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(SUM({_DISC_PRICE}
                        - CAST(p_retailprice AS DECIMAL(12,2))
                          * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q13_order_count_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} END) AS DOUBLE)
               / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               coalesce(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_DISC_PRICE} END)
                             AS DOUBLE), 0.0)
               / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
        GROUP BY 1
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
        GROUP BY p_brand, p_size
    """,
    "q20_part_share_suppliers": """
        WITH per_sp AS (
            SELECT l_suppkey, l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supp_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%blue%'
              AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
        ), share AS (
            SELECT *, SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty FROM per_sp
        )
        SELECT s_suppkey, s_name, l_partkey, supp_qty, part_qty
        FROM share JOIN supplier ON l_suppkey = s_suppkey
        WHERE supp_qty > 0.3 * part_qty
    """,
    "q21_single_late_supplier": """
        WITH per_order AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END)
                       AS n_late_supp,
                   max(CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END) AS late_supp
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_orderkey
        )
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM per_order JOIN supplier ON late_supp = s_suppkey
        WHERE n_supp >= 2 AND n_late_supp = 1
        GROUP BY s_suppkey, s_name
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        QUALIFY total_revenue = max(total_revenue) OVER ()
    """,
    "q17_small_quantity_revenue": """
        WITH x AS (
            SELECT l_partkey, l_quantity, l_extendedprice,
                   0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                               OVER (PARTITION BY l_partkey) AS DOUBLE)
                          / COUNT(*) OVER (PARTITION BY l_partkey)) AS thr
            FROM lineitem
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM x JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3' AND l_quantity < thr
    """,
    "q18_large_volume_orders": f"""
        WITH big AS (
            SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
               o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_bracketed_revenue": f"""
        SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue, count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    "q22_inactive_balance": """
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey, count(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
    """,
    "analytics_exact_quantiles": """
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        )
        SELECT l_returnflag,
               max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p50,
               max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p90,
               max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p99
        FROM ranked GROUP BY l_returnflag
    """,
    "analytics_tfidf_top_terms": """
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), df_ AS (
            SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
            GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, rank, term, score FROM (
            SELECT tf.doc_id, tf.term,
                   tf.tf * (SELECT CAST(n_docs AS DOUBLE) FROM n) / df_.df AS score,
                   ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf * (SELECT CAST(n_docs AS DOUBLE) FROM n) / df_.df DESC,
                                tf.term) AS rank
            FROM tf JOIN df_ USING (term)
        ) WHERE rank <= 3
    """,
    "analytics_running_totals": f"""
        SELECT o_custkey, o_orderkey, strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS order_seq
        FROM orders
    """,
    "rollup_revenue": """
        SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    "layout_zorder_values": _zorder_oracle_sql(),
    "analytics_window_suite": """
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "cube_flag_status": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_returnflag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_linestatus,
               count(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "topn_orders_per_segment": """
        SELECT c_mktsegment, rank, o_orderkey, o_totalprice, c_name FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice, c_name,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rank <= 3
    """,
    "asof_last_click_before_purchase": """
        WITH e AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
        ),
        p AS (SELECT event_id AS purchase_id, user_id, ts_us FROM e
              WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts_us, max(event_id) AS click_id FROM e
              WHERE event_type = 'click' GROUP BY user_id, ts_us)
        SELECT p.purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
               c.click_id, c.ts_us AS click_ts_us,
               p.ts_us - c.ts_us AS gap_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
}
