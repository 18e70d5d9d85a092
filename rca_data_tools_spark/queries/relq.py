"""Extended relational coverage: the remaining classic decision-support
shapes not already exercised by queries/core.py — EXISTS/NOT-EXISTS
semi/anti joins, correlated scalar subqueries, outer-join histograms,
ROLLUP grouping sets, multi-column DISTINCT aggregation.

The reference pipeline never runs these (its joins are all small-dim
broadcasts, SURVEY §2.3), but an engine that replaces it must still be a
complete relational substrate; each query here is the canonical TPC-H shape
adapted to the driver's synthetic star schema (no partsupp table, no
commit/receipt dates — equivalent predicates are built from shipdate vs
orderdate instead).

Scale notes are per-query; the common theme: correlated subqueries are
decorrelated by hand into aggregate + broadcast-join forms (what a good
optimizer does internally), so nothing here degenerates to a per-row
subquery execution, and every scalar-subquery comparison value rides a
1-row broadcast, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from rca_data_tools_spark.operators.layout import zorder_key_sql
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over a correlated predicate -> left-semi join.

    The semi join shuffles on l_orderkey and keeps only the key + two
    timestamp columns on the probe side; at 100 TB the orders quarter-filter
    prunes to date partitions before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q8_market_share",
    oracle=f"""
WITH flat AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
)
SELECT o_year,
       {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")} AS share_num,
       {dsum_sql('volume')} AS share_den
FROM flat GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share = conditional aggregate over a
    7-way star join. Every dimension (orders filter aside) is
    broadcast-sized; the single shuffle is the groupBy on o_year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01 00:00:00", "1997-12-31 00:00:00")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return flat.groupBy("o_year").agg(
        dsum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
        ).alias("share_num"),
        dsum("volume").alias("share_den"),
    )


@query(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       {dsum_sql('l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year) for one part
    family. The part LIKE-filter broadcasts and prunes lineitem FIRST (the
    selective dimension drives the plan); orders joins on the shuffled fact
    key. supplycost is proxied by 0.5*retailprice (no partsupp table)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving customers with zero orders,
    then a histogram of per-customer order counts. COUNT(o_orderkey) counts
    non-null keys only, so unmatched customers land in bucket 0.

    Scale: the outer join shuffles both sides on custkey; the second groupBy
    is on the tiny (c_count) domain and map-side combines to nothing."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar subquery (global max) against a grouped view.

    The max rides a 1-row broadcast join — no driver collect, no
    single-partition window. Ties all surface (exact decimal revenue makes
    the equality deterministic)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("__max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.2 * (
    SELECT {davg_sql('l_quantity')} FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average, decorrelated into a
    grouped aggregate + broadcast join (exactly what Catalyst's subquery
    rewrite produces, but stated explicitly so the per-part avg uses the
    deterministic decimal mean on both engines).

    Scale: the per-part avg aggregates the full lineitem but ships only
    (partkey, avg) — broadcast-sized after the brand filter's semi-join
    prune is applied to it."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # Per-part average quantity, only for parts of the selected brand
    # (semi-join prune keeps the broadcast tiny at scale).
    part_avg = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(davg("l_quantity").alias("avg_qty"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(part_avg), l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
""",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order. The oracle states it with EXISTS / NOT EXISTS;
    the Spark plan proves the equivalent aggregate formulation: one pass
    computing per-order supplier/late-supplier counts, joined back — two
    shuffles on l_orderkey total, versus three correlated-subquery joins.

    Scale: both formulations shuffle on the same key; the aggregate one
    reads lineitem once instead of three times."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    j = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast(
            "int"
        ),
    )
    # One explicit hash partitioning on l_orderkey serves the whole rest of
    # the plan: HashPartitioning(l_orderkey) satisfies the clustering needs
    # of the (l_orderkey, l_suppkey) agg (subset rule), the l_orderkey agg,
    # AND the qualifying self-join — 1 shuffle of the joined fact instead of
    # 3 separate ones.
    j = j.repartition("l_orderkey")
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late"), F.sum("late").alias("n_late_lines")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("any_late").alias("n_late_supp")
    )
    qualifying = (
        per_os.filter(F.col("any_late") == 1)
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        qualifying.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )


@query(
    "q22_idle_customers",
    oracle=f"""
SELECT c_mktsegment, COUNT(*) AS numcust, {dsum_sql('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_mktsegment
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (every synthetic customer has some order, so the idleness cutoff
    makes the anti-join set non-degenerate) — a scalar subquery (global
    filtered mean, 1-row broadcast) plus an anti join on the orders key,
    grouped by segment. The recency filter prunes the anti-join build side
    before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("__avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


@query(
    "q11_important_parts",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey, {dsum_sql('l_extendedprice * l_quantity')} AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, value
FROM pv
WHERE value > 0.0005 * (SELECT {dsum_sql('value')} FROM pv)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's suppliers,
    kept where above a fraction of the nation's total (partsupp's
    supplycost*availqty proxied by extendedprice*quantity — no partsupp
    table in this schema).

    Scale: one shuffle on l_partkey for the grouped value; the fraction
    threshold is a 1-row broadcast (re-aggregated from the grouped view, not
    a second fact scan); nation/supplier dims broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    # Per-part values AND the global total from ONE grouping: rollup(l_partkey)
    # emits the (partkey) groups plus the () grand-total row, and both
    # consumers below sit over the identical Exchange so Catalyst/AQE can
    # dedup it (the broadcast dim side is plan-audited ReusedExchange; the
    # shuffle stage recomputes under AQE's eager broadcast planning — worst
    # case two pushdown-pruned fact scans). Chosen over .persist(), which held
    # a cache entry for the session's lifetime in a long-lived multi-query
    # driver (unbounded across hundreds of queries) for the same worst-case
    # scan count on a cache miss.
    pv = (
        l.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
               l.l_suppkey == s.s_suppkey)
        .rollup("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    parts = pv.filter(F.col("l_partkey").isNotNull())
    threshold = pv.filter(F.col("l_partkey").isNull()).select(
        (F.col("value") * 0.0005).alias("__thr")
    )
    return parts.join(F.broadcast(threshold), parts.value > F.col("__thr")).select(
        "l_partkey", "value"
    )


@query(
    "q16_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute triple,
    excluding a NOT-IN supplier denylist (negative account balance standing
    in for the original's complaint-comment filter).

    Scale: the denylist is an anti join against a broadcast-sized dim (never
    a NOT-IN per-row subquery); the part predicate broadcasts and prunes
    lineitem before its countDistinct shuffle on the attribute triple."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_promotable_suppliers",
    oracle=f"""
WITH sp AS (
  SELECT l_suppkey,
         {dsum_sql("CASE WHEN EXTRACT(year FROM l_shipdate) = 1996 THEN l_quantity ELSE 0 END")} AS qty_1996,
         {dsum_sql('l_quantity')} AS qty_all
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%gear%'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
  AND EXISTS (
    SELECT 1 FROM sp
    WHERE sp.l_suppkey = s_suppkey AND qty_1996 > 0.5 * qty_all
  )
""",
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested-IN supplier qualification — suppliers in one
    nation with at least one part family (name-LIKE) whose 1996 shipments
    exceed half their all-time shipments of that part (availqty > half-
    shipped proxied via the two-epoch quantity comparison; no partsupp).

    Scale: the correlated half-sum is decorrelated into ONE grouped pass
    computing both sums (conditional + total) per (supplier, part) — the
    fact table is read once, not twice — then a semi join qualifies the
    broadcast-sized supplier dim."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    qty_1996 = F.when(F.year("l_shipdate") == 1996, F.col("l_quantity")).otherwise(0.0)
    sp = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(qty_1996).alias("qty_1996"), dsum("l_quantity").alias("qty_all"))
        .filter(F.col("qty_1996") > 0.5 * F.col("qty_all"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(sp, s.s_suppkey == sp.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       {dsum_sql('l_quantity')} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping-sets aggregation (ROLLUP): per (flag, status),
    per flag, and grand total in ONE pass — Spark expands the grouping sets
    before the exchange, so it still map-side combines (no re-reading the
    fact table per level, which is how a naive union-of-groupbys would do
    it). GROUPING() markers disambiguate real NULL keys from subtotal rows."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one grouped query. Spark plans this
    with an Expand (one stream per distinct column) + two-phase aggregate —
    the exact-distinct workhorse. At 100 TB prefer approx_count_distinct
    (see agg_approx_distinct) unless exactness is contractual."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group — the 100 TB face of
    agg_multi_distinct: one pass, no Expand duplication, fixed-size sketch
    per (group, column) that merges associatively map-side. rsd=0.01 keeps
    the sketch ~all-distinct-exact at these cardinalities; accuracy vs the
    exact counts is asserted in tests/test_parity.py (no DuckDB oracle —
    sketch estimates are implementation-defined)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("n_supp"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "layout_zorder_clustering",
    oracle=f"""
WITH base AS (
  SELECT datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS d,
         l_partkey AS p
  FROM lineitem
),
stats AS (
  SELECT MIN(d) AS dmin, MAX(d) AS dmax, MIN(p) AS pmin, MAX(p) AS pmax FROM base
),
binned AS (
  SELECT d, p,
         CAST(FLOOR((d - dmin) * 256.0 / (dmax - dmin + 1)) AS BIGINT) AS da,
         CAST(FLOOR((p - pmin) * 256.0 / (pmax - pmin + 1)) AS BIGINT) AS pa
  FROM base, stats
),
keyed AS (
  SELECT d, p, {zorder_key_sql('da', 'pa', 8)} >> 12 AS bucket FROM binned
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(d) - MIN(d) AS BIGINT) AS d_span,
       CAST(MAX(p) - MIN(p) AS BIGINT) AS p_span
FROM keyed GROUP BY bucket
""",
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering diagnostic: bin ship-date and partkey to
    8 bits each, interleave into a Morton key (operators/layout.py), bucket
    by the key's top 4 bits (16 write buckets), and report each bucket's
    row count and the span of BOTH original dimensions. Interleaving keeps
    both spans a fraction of the global range simultaneously — the footer
    min/max locality that makes file skipping work for filters on either
    dimension; single-dimension sorting bounds only its own column (the
    test asserts the quantitative gap). Pure codegen arithmetic over one
    scan plus a 1-row bounds broadcast."""
    from rca_data_tools_spark.operators.layout import bin_to, zorder_key

    li = load_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("d"),
        F.col("l_partkey").alias("p"),
    )
    stats = li.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax"),
        F.min("p").alias("pmin"), F.max("p").alias("pmax"),
    )
    j = li.crossJoin(F.broadcast(stats))
    da = bin_to(F.col("d"), F.col("dmin"), F.col("dmax"), 8)
    pa = bin_to(F.col("p"), F.col("pmin"), F.col("pmax"), 8)
    keyed = j.select("d", "p", F.shiftright(zorder_key(da, pa, 8), 12).alias("bucket"))
    return keyed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("d") - F.min("d")).cast("long").alias("d_span"),
        (F.max("p") - F.min("p")).cast("long").alias("p_span"),
    )
