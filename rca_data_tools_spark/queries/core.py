"""Core relational queries: scans, filters, aggregation, joins, top-k.

These exercise the engine's bread-and-butter operators (SURVEY §2.1-2.7) on
the driver's TPC-H-ish corpus. Every aggregate of doubles uses the
deterministic decimal-sum scheme from functions.numeric on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


# --- flagship: TPC-H Q1 pricing summary (A5/A6/A12 aggregate family) -------

@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3-style: multi-way join + agg + deterministic top-k ------------

@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    # customer is the small side -> broadcast; orders⋈lineitem shuffles on the key.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- TPC-H Q5-style: 6-way star join, revenue per nation -------------------

@query(
    "q5_nation_revenue",
    oracle=f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Dims (supplier/nation/region/customer) broadcast; the single shuffle is
    # the orders⋈lineitem key join.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- P2: the workhorse time-range slice ------------------------------------

@query(
    "p2_time_slice",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-17 00:00:00'
""",
)
def p2_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window predicate (reference: ds.sel(time=slice(...)),
    qaqc/dashboard.py:576). On a date-partitioned layout this prunes
    partitions; here it pushes down to the parquet row groups. Bounds are
    passed to load_table so they land on the raw scan column (the stored
    nanos long), not on the rebuilt timestamp where pushdown is impossible."""
    e = load_table(
        spark, sf_dir, "events",
        time_filters={"ts": ("2024-01-10 00:00:00", "2024-01-17 00:00:00")},
    )
    return e.select("event_id", "ts", "user_id", "event_type", "value")


# --- P4/P5: value predicate + null handling --------------------------------

@query(
    "p4_value_filter",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE value < 400.0 AND value IS NOT NULL AND event_type <> 'error'
""",
)
def p4_value_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value predicate (reference: drop pCO2 >= 2000, qaqc/dashboard.py:428)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter((F.col("value") < 400.0) & F.col("value").isNotNull() & (F.col("event_type") != "error"))
        .select("event_id", "user_id", "value")
    )


# --- A2: pivot (long -> wide counts, zero-filled) --------------------------

@query(
    "a2_pivot_counts",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id
""",
)
def a2_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit categories (reference: image_status pivot,
    qaqc/visual_data.py:120-134). Explicit value list avoids the extra
    distinct-scan Spark needs to discover pivot values."""
    e = load_table(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    return e.groupBy("user_id").pivot("event_type", cats).count().na.fill(0, cats)


# --- A3: windowed mean / coarsen -------------------------------------------

@query(
    "a3_windowed_mean",
    oracle=f"""
SELECT event_type,
       CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour_bucket,
       {davg_sql('value')} AS avg_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type, hour_bucket
""",
)
def a3_windowed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window mean (reference: ds.coarsen(time=w).mean(),
    qaqc/plots.py:193-201) expressed as an epoch-bucket groupBy — a plain
    hash aggregate, map-side combinable at any scale."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("hour_bucket", F.floor(F.unix_timestamp("ts") / 3600).cast("long"))
        .groupBy("event_type", "hour_bucket")
        .agg(davg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
    )


# --- A12/O5: distinct + deterministic top-k per group ----------------------

@query(
    "w9_topk_per_group",
    oracle="""
SELECT user_id, event_id, value
FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
)
def w9_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key via row_number (reference: latest-deployment top-1,
    qaqc/dashboard.py:563). Ties broken by event_id for determinism."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )


# --- P7: fixed-band extraction ---------------------------------------------

@query(
    "p7_band_extraction",
    oracle="""
SELECT CAST(FLOOR(value / 0.5) AS BIGINT) AS band, COUNT(*) AS n,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM events
WHERE value >= 10.0 AND value < 20.0
GROUP BY 1
""",
)
def p7_band_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width band extraction (reference: depth-band series
    d < press < d+0.5 per configured depth, qaqc/plots.py:340-353) via
    floor-bucketing — one scan for every band at once instead of one
    filter per depth."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter((F.col("value") >= 10.0) & (F.col("value") < 20.0))
        .groupBy(F.floor(F.col("value") / 0.5).cast("long").alias("band"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("min_v"), F.max("value").alias("max_v"))
    )


# --- P10: set-membership filter --------------------------------------------

@query(
    "p10_isin_filter",
    oracle="""
SELECT event_type, user_id, COUNT(*) AS n
FROM events
WHERE event_type NOT IN ('error', 'signup')
GROUP BY 1, 2
""",
)
def p10_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-type style isin filter (reference: skip dark frames SDB/SDF/NDF,
    advanced_qaqc/calculateFunctions.py:418-420)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(~F.col("event_type").isin("error", "signup"))
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- J6: multi-way equi-join on time bucket --------------------------------

@query(
    "j6_multiway_time_join",
    oracle=f"""
WITH c AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hb, {davg_sql('value')} AS click_avg
  FROM events WHERE event_type = 'click' GROUP BY 1
), v AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hb, {davg_sql('value')} AS view_avg
  FROM events WHERE event_type = 'view' GROUP BY 1
), p AS (
  SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hb, {davg_sql('value')} AS purchase_avg
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT c.hb AS hour_bucket, click_avg, view_avg, purchase_avg
FROM c JOIN v ON c.hb = v.hb JOIN p ON c.hb = p.hb
""",
)
def j6_multiway_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join on the time axis (reference: decimated per-variable
    frames merged back with reduce(pd.merge(on='time')), qaqc/decimate.py:
    224-226). Each branch aggregates to the hour, then joins on the bucket —
    all three branches share one underlying scan and the join keys are
    identically partitioned, so AQE collapses the exchanges."""
    e = load_table(spark, sf_dir, "events")
    hb = F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hb")

    def branch(etype: str, out: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .groupBy(hb)
            .agg(davg("value").alias(out))
        )

    c = branch("click", "click_avg")
    v = branch("view", "view_avg")
    p = branch("purchase", "purchase_avg")
    return (
        c.join(v, "hb").join(p, "hb")
        .select(F.col("hb").alias("hour_bucket"), "click_avg", "view_avg", "purchase_avg")
    )


# --- E2: union + distinct --------------------------------------------------

@query(
    "e2_union_distinct",
    oracle="""
SELECT user_id FROM (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
  UNION
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-22 00:00:00' AND ts < TIMESTAMP '2024-01-29 00:00:00'
)
""",
)
def e2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + dedupe of pre/post window key sets (reference: pre/post-deploy
    week keys, qaqc/dashboard.py:1383-1387). Each week's bounds push down to
    the scan via load_table's raw-column time filter."""

    def week(lo: str, hi: str) -> DataFrame:
        return (
            load_table(spark, sf_dir, "events", time_filters={"ts": (lo, hi)})
            .select("user_id")
            .distinct()
        )

    return week("2024-01-01 00:00:00", "2024-01-08 00:00:00").union(
        week("2024-01-22 00:00:00", "2024-01-29 00:00:00")
    ).distinct()


# --- TPC-H Q7-style: volume shipping between two nations -------------------

@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join with a disjunctive cross-nation predicate.
    The two nation dims broadcast; the fact-side join order (lineitem->orders
    ->customer) keeps the big tables on the streamed side throughout."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1998-12-31 00:00:00").cast("timestamp"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), volume.alias("volume")
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"))
    )


# --- TPC-H Q10-style: returned-item revenue per customer -------------------

@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filters (order window + return flag)
    pushed to both scans before the joins; nation broadcast; deterministic
    top-20 by (revenue, custkey)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- TPC-H Q18-style: large orders (join back after group-having) ----------

@query(
    "q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dsum_sql('l_quantity')} AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-having gates the detail rows. Expressed as a
    windowed sum over l_orderkey, NOT a broadcast semi-join of the having
    key set: the key set grows with the data (every qualifying order), so
    broadcasting it is an unbounded driver-side build — the round-6 scale
    study measured the broadcast shape at 9-40s (unstable, memory-pressure
    bound) vs 4.8s stable for this one at the 100x corpus, and at 100 TB
    the broadcast would simply die. The window needs the same
    hash-partition of lineitem the aggregation needed anyway, scans
    lineitem ONCE (the semi-join scanned it twice), and everything
    downstream reuses that partitioning."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    gated = (
        l.select("l_orderkey", "l_quantity")
        .withColumn("__q", F.sum("l_quantity").over(Window.partitionBy("l_orderkey")))
        .filter(F.col("__q") > 150)
    )
    return (
        gated.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


# --- TPC-H Q2-style: correlated minimum (cheapest supplier per part) --------

@query(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem WHERE l_quantity > 0
), ranked AS (
  SELECT l_partkey, l_suppkey, ROUND(unit_price, 6) AS unit_price,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY ROUND(unit_price, 6), l_suppkey) AS rn
  FROM unit
)
SELECT r.l_partkey, r.l_suppkey, r.unit_price, s.s_name, n.n_name
FROM ranked r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE r.rn = 1
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated 'MIN over the group, then the row that
    achieves it' subquery, expressed as a window top-1 (one shuffle on
    partkey) instead of a self-join against a grouped MIN (two). Supplier and
    nation decorate via broadcast."""
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    unit = l.select(
        "l_partkey", "l_suppkey", F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = unit.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", "l_suppkey", "unit_price", "s_name", "n_name")
    )


# --- semi + anti join: active-then-churned customers ------------------------

@query(
    "q_semi_anti_churn",
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o96.o_orderkey) AS n_orders_1996
FROM customer c
JOIN orders o96 ON o96.o_custkey = c.c_custkey
 AND o96.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
 AND o96.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
WHERE NOT EXISTS (
  SELECT 1 FROM orders o97
  WHERE o97.o_custkey = c.c_custkey
    AND o97.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o97.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY 1, 2
""",
)
def q_semi_anti_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS shape (TPC-H Q21/Q22 family): customers with 1996
    orders and none in 1997 — a semi-join (implicit via inner+group) plus an
    anti-join, both of which Catalyst executes as hash joins without
    materializing the subquery."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def year(y: int):
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        )

    churned = c.join(
        year(1997).select(F.col("o_custkey").alias("__k97")),
        F.col("c_custkey") == F.col("__k97"),
        "left_anti",
    )
    return (
        churned.join(year(1996), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders_1996"))
    )


# --- TPC-H Q6-style: forecast revenue change (pure scan-side predicate) -----

@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue, COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate reaches the scan (PushedFilters on
    shipdate/discount/quantity), then a single map-side-combined global agg —
    zero joins, one tiny shuffle of partial sums."""
    l = load_table(spark, sf_dir, "lineitem")
    f = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --- TPC-H Q14-style: promo revenue ratio (conditional agg over a join) -----

@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT
  CAST(100.0 AS DOUBLE)
    * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_pct,
  COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate over a broadcast dim join —
    the month filter prunes the fact scan, part broadcasts, and both decimal
    sums ride one partial-agg pass."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0).cast("double") * dsum(promo) / dsum(disc)).alias("promo_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- TPC-H Q19-style: disjunction of conjunctive brand/size/qty bands -------

@query(
    "q19_banded_revenue",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue, COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive bands mixing dim (brand, size) and
    fact (quantity) predicates. Catalyst extracts the common l_partkey
    equi-condition so the join stays a broadcast hash join with the residual
    disjunction as a post-join filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --- TPC-H Q12-style: late-shipment counts by priority class ----------------

@query(
    "q12_priority_shipping",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late_items,
       COUNT(*) AS total_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted to the columns present): conditional counts
    per priority class of items shipped >90 days after order. One key-join
    shuffle; the conditional count is a map-side-combined CASE aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(late, 1)).alias("late_items"),
            F.count(F.lit(1)).alias("total_items"),
        )
    )


# --- rollup: multi-level aggregation in one pass ----------------------------

@query(
    "a14_rollup_counts",
    oracle=f"""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_key,
       COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM events
GROUP BY ROLLUP(event_type, day_key)
""",
)
def a14_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: (type, day), (type), and grand-total rows in one
    partial-aggregated pass — the multi-level summary the reference computes
    with repeated groupBys (qaqc/visual_data.py:113-134), expressed as the
    single-scan grouping-sets plan Spark compiles rollup into."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day_key", F.date_trunc("day", F.col("ts"))
    )
    return e.rollup("event_type", "day_key").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )


# --- exact interpolated percentiles per group -------------------------------

@query(
    "a15_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       COUNT(value) AS n
FROM events
GROUP BY 1
""",
)
def a15_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per key (the distributional
    summary behind the reference's color-limit min/max reductions,
    qaqc/dashboard.py:842-859, generalized). Spark's percentile and DuckDB's
    quantile_cont share the p*(n-1) linear-interpolation definition and are
    bit-identical on doubles (verified at both SFs). Scalar columns (not an
    array) so downstream consumers — and the driver's canonicalizer — see
    hashable cells. At 100 TB swap in percentile_approx for one-pass
    sketching; this exact form sorts within the aggregation buffer."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.count("value").alias("n"),
    )


@query(
    "agg_mode",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, user_id, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cnt DESC, user_id ASC) AS rk
  FROM c
)
SELECT event_type, user_id AS mode_user, cnt AS mode_count
FROM r WHERE rk = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent value per group (mode), with an explicit deterministic
    tie-break (highest count, then lowest key) — never an engine-native
    mode() whose tie behavior is unspecified.

    Scale shape: one map-side-combined (group, value) count, then a window
    over the dim-sized count table partitioned by group. The fact table
    shuffles once, on the composite count key.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").asc()
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "agg_histogram",
    oracle="""
SELECT event_type,
       CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
       COUNT(*) AS n,
       ROUND(MIN(value), 6) AS bin_min,
       ROUND(MAX(value), 6) AS bin_max
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per series (bin width 10): the
    distribution summary behind dashboard color scaling, as one
    map-side-combined aggregation — bins are computed in the projection, so
    a 100 TB histogram is one scan plus a tiny shuffle of (series, bin)
    partials.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(10.0)).cast("long").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("bin_min"),
            F.round(F.max("value"), 6).alias("bin_max"),
        )
    )
