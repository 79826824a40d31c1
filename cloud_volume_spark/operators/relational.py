"""Core relational operators over the TPC-H-ish test tables.

These exercise the engine surface a cloud-volume user gets "for free"
by moving to Spark (SURVEY.md §2.4 notes the reference has no
grouping-sets, windows, or top-k — here they are): scan+filter+agg,
multi-way broadcast joins, top-k, rollup, window functions,
sessionization, and as-of style joins.

Scale notes (100 TB design):
- bounded dimensions (region=5, nation=25 rows) carry explicit
  broadcast hints; tables that grow with scale (customer, supplier,
  per-key aggregates) carry NO hint — AQE broadcasts them while they
  fit and falls back to shuffle joins when they don't, so the same
  plan text is safe at any SF.
- aggregations are expressed as groupBy so Catalyst plans partial
  (map-side) aggregation before the exchange.
- doubles that cross the duckdb oracle are rounded (4 dp) to absorb
  summation-order differences between engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.operators.common import load as _plain_load
from cloud_volume_spark.operators.common import load_spread

# Fact tables get the under-split-input spread (guide §2.5): the
# single-file test parquet plans ONE scan task, so the probe side of
# every broadcast join and every map-side partial aggregation ran on
# one core of N. Dimension tables stay plain — they are broadcast
# builds where a repartition would only add an exchange.
_SPREAD_TABLES = frozenset({"lineitem", "orders", "events"})


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table in _SPREAD_TABLES:
        return load_spread(spark, sf_dir, table)
    return _plain_load(spark, sf_dir, table)


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): the flagship scan+agg
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3 — shipping priority (join + top-k)
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    # rank on an exact integer-cent sum, not a rounded float sum: the
    # engines' partial-agg merge orders differ, and a ~1-ulp float-sum
    # difference at a rounding boundary would flip which order is rank
    # 10 vs 11 (the same mechanism orders_above_customer_avg documents).
    # cents/100.0 at the end is a single correctly-rounded IEEE divide
    # of an exactly-representable integer — bit-identical across engines
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(cents).alias("revenue_cents"))
        .select(
            "l_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            (F.col("revenue_cents") / 100.0).alias("revenue"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
        .drop("revenue_cents")
    )


Q3_SQL = """
SELECT l_orderkey,
       FLOOR(EPOCH(o_orderdate))::BIGINT AS o_orderdate_epoch,
       SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)
           / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)
         DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5 — local supplier volume (5-way join, broadcast dims)
# ---------------------------------------------------------------------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q6 — revenue forecast (pure filter+agg; predicate pushdown showcase)
# ---------------------------------------------------------------------------

def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# top customers — window rank over join+agg
# ---------------------------------------------------------------------------

def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    # rank on the exact integer-cent sum (o_totalprice is a 2-dp
    # amount, so cents are exact); a rounded float sum could flip rank
    # 3 vs 4 between engines at a .005 boundary
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    revenue = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.sum(cents).alias("spend_cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("spend_cents"), F.asc("c_custkey")
    )
    return (
        revenue.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(
            "n_name", "c_custkey", "c_name",
            (F.col("spend_cents") / 100.0).alias("total_spend"),
            "rnk",
        )
    )


TOP_CUSTOMERS_SQL = """
WITH revenue AS (
    SELECT c_custkey, c_name, c_nationkey,
           SUM(FLOOR(o_totalprice * 100 + 0.5)::BIGINT) AS spend_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, c_nationkey
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_nationkey
        ORDER BY spend_cents DESC, c_custkey ASC
    ) AS rnk
    FROM revenue
)
SELECT n_name, c_custkey, c_name, spend_cents / 100.0 AS total_spend, rnk
FROM ranked JOIN nation ON c_nationkey = n_nationkey
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# rollup — hierarchical aggregate (region → nation)
# ---------------------------------------------------------------------------

def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ROLLUP_SQL = """
SELECT r_name, n_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# events: running totals (window), sessionization (gaps-and-islands),
# as-of join (latest order per user before the event stream)
# ---------------------------------------------------------------------------

def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


EVENTS_RUNNING_SQL = """
SELECT event_id, user_id,
       FLOOR(EPOCH(ts))::BIGINT AS ts_epoch,
       ROUND(SUM(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS running_value
FROM events
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-timeout sessions per user: the batch gaps-and-islands
    form of what :mod:`cloud_volume_spark.streaming` does incrementally."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events.withColumn(
        "prev_ts", F.lag("ts").over(w)
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800),
            1,
        ).otherwise(0),
    )
    with_id = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_id.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        F.unix_timestamp(F.max("ts")).alias("session_end_epoch"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


EVENTS_SESSIONIZE_SQL = """
WITH with_gap AS (
    SELECT *,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN prev_ts IS NULL
                     -- FLOOR on BOTH operands: Spark's unix_timestamp
                     -- is whole-second, so a raw EPOCH diff here would
                     -- break a session at a 1800.4 s gap that Spark
                     -- (floored diff 1800) keeps open
                     OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(prev_ts)) > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM with_gap
), with_id AS (
    SELECT *,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM flagged
)
SELECT user_id, session_id::BIGINT AS session_id,
       COUNT(*) AS n_events,
       FLOOR(EPOCH(MIN(ts)))::BIGINT AS session_start_epoch,
       FLOOR(EPOCH(MAX(ts)))::BIGINT AS session_end_epoch,
       ROUND(SUM(value), 4) AS session_value
FROM with_id
GROUP BY user_id, session_id
"""


def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the user's most recent
    order at-or-before the event time — the pattern behind graphene's
    timestamped supervoxel→root resolution (SURVEY §2.3), expressed as
    a time-bounded join + per-event max rather than a per-row server
    call."""
    events = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    # TRUE as-of: only orders at-or-before the event time qualify — an
    # unconditional per-customer MAX would report an order from the
    # event's future.  Equi-join on the customer key with the time
    # bound as a join predicate, then a per-event max: each event
    # expands only into its own customer's qualifying orders (bounded
    # per-key fan-out), never a cross product.
    return (
        events.join(
            orders,
            (events.user_id == orders.o_custkey)
            & (F.unix_timestamp(orders.o_orderdate)
               <= F.unix_timestamp(events.ts)),
            "left",
        )
        .groupBy("event_id", "user_id", "ts")
        .agg(F.max("o_orderdate").alias("latest_order_date"))
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").alias("ts_epoch"),
            F.unix_timestamp("latest_order_date").alias("latest_order_epoch"),
        )
    )


EVENTS_ASOF_SQL = """
SELECT event_id, user_id,
       FLOOR(EPOCH(ts))::BIGINT AS ts_epoch,
       FLOOR(EPOCH(MAX(o_orderdate)))::BIGINT AS latest_order_epoch
FROM events LEFT JOIN orders
  ON user_id = o_custkey
     AND FLOOR(EPOCH(o_orderdate)) <= FLOOR(EPOCH(ts))
WHERE event_type = 'purchase'
GROUP BY event_id, user_id, ts
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_revenue_forecast": q6_revenue_forecast,
    "top_customers_per_nation": top_customers_per_nation,
    "rollup_revenue": rollup_revenue,
    "events_running_total": events_running_total,
    "events_sessionize": events_sessionize,
    "events_asof_latest_order": events_asof_latest_order,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_revenue_forecast": Q6_SQL,
    "top_customers_per_nation": TOP_CUSTOMERS_SQL,
    "rollup_revenue": ROLLUP_SQL,
    "events_running_total": EVENTS_RUNNING_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_asof_latest_order": EVENTS_ASOF_SQL,
}


# ---------------------------------------------------------------------------
# second wave: anti/semi joins, correlated patterns, pivot, set ops,
# distribution stats — rounding out the relational operator surface
# ---------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never placed an order."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern: orders priced above 1.5x their
    customer's average — decorrelated to window sums. Prices are
    quantized to integer cents before aggregating so the predicate is
    exact integer arithmetic (a float sum's addition order would
    otherwise flip boundary rows between engines)."""
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cents", cents)
        .withColumn("sum_cents", F.sum("cents").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .where(F.col("cents") * F.col("cnt") * 2 > F.col("sum_cents") * 3)
        .select(
            "o_orderkey", "o_custkey",
            F.col("cents").alias("totalprice_cents"),
            F.floor(F.col("sum_cents") / F.col("cnt")).cast("long")
            .alias("cust_avg_cents"),
        )
    )


ORDERS_ABOVE_AVG_SQL = """
WITH w AS (
    SELECT o_orderkey, o_custkey,
           FLOOR(o_totalprice * 100 + 0.5)::BIGINT AS cents,
           SUM(FLOOR(o_totalprice * 100 + 0.5)::BIGINT)
               OVER (PARTITION BY o_custkey) AS sum_cents,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
    FROM orders
)
SELECT o_orderkey, o_custkey,
       cents AS totalprice_cents,
       FLOOR(sum_cents / cnt)::BIGINT AS cust_avg_cents
FROM w WHERE cents * cnt * 2 > sum_cents * 3
"""


def urgent_orders_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (TPC-H Q4 shape): priority histogram of orders having
    at least one line item shipped after the order date."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qualifying = li.where(F.col("l_shipdate") > F.lit("1996-01-01")).select(
        "l_orderkey"
    )
    return (
        orders.join(qualifying, orders.o_orderkey == qualifying.l_orderkey,
                    "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


URGENT_ORDERS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-01-01'
)
GROUP BY o_orderpriority
"""


def brand_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (deterministic column names in
    both engines): part counts and retail-price totals per brand, split
    by size class.  Prices are quantized to integer cents before
    summing — integer addition is order-independent, so Spark and the
    oracle agree bit-for-bit regardless of partial-aggregation order
    (same trick as orders_above_customer_avg)."""
    part = load(spark, sf_dir, "part")
    small = F.when(F.col("p_size") < 25, 1).otherwise(0)
    large = F.when(F.col("p_size") >= 25, 1).otherwise(0)
    cents = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
    return part.groupBy("p_brand").agg(
        F.sum(small).alias("n_small"),
        F.sum(large).alias("n_large"),
        F.sum(cents * small).alias("small_value_cents"),
        F.sum(cents * large).alias("large_value_cents"),
    )


BRAND_PIVOT_SQL = """
SELECT p_brand,
       SUM(CASE WHEN p_size < 25 THEN 1 ELSE 0 END)::BIGINT AS n_small,
       SUM(CASE WHEN p_size >= 25 THEN 1 ELSE 0 END)::BIGINT AS n_large,
       SUM(FLOOR(p_retailprice * 100 + 0.5)::BIGINT
           * CASE WHEN p_size < 25 THEN 1 ELSE 0 END)::BIGINT
           AS small_value_cents,
       SUM(FLOOR(p_retailprice * 100 + 0.5)::BIGINT
           * CASE WHEN p_size >= 25 THEN 1 ELSE 0 END)::BIGINT
           AS large_value_cents
FROM part GROUP BY p_brand
"""


def nations_customers_no_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: nation keys having customers EXCEPT those having
    suppliers."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    with_cust = customer.select(F.col("c_nationkey").alias("nk")).distinct()
    with_supp = supplier.select(F.col("s_nationkey").alias("nk")).distinct()
    return (
        with_cust.exceptAll(with_supp)
        .join(F.broadcast(nation), F.col("nk") == nation.n_nationkey)
        .select(F.col("nk").alias("n_nationkey"), "n_name")
    )


NATIONS_EXCEPT_SQL = """
WITH wc AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
ws AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT nk AS n_nationkey, n_name
FROM (SELECT nk FROM wc EXCEPT SELECT nk FROM ws) d
JOIN nation ON nk = n_nationkey
"""


def global_row_number(
    df: DataFrame,
    order_col: str,
    tie_cols: Sequence[str] = (),
    out_col: str = "_rn",
    nbuckets: int = 64,
) -> tuple:
    """Exact global ``row_number`` without the single-partition window
    (``Window.orderBy`` with no partition moves ALL rows to one task —
    the WindowExec degradation warning; fatal at 100 TB).

    The distributed pattern: (1) range-bucket rows on approx-quantile
    boundaries — collected once, so every downstream job shares the same
    literal boundaries; (2) rank inside each bucket with an ordinary
    partitioned window (bucket-parallel); (3) add broadcast per-bucket
    prefix-sum offsets. Exactness does not depend on boundary quality —
    skewed boundaries only unbalance bucket sizes.

    Returns ``(df_with_out_col, total_rows)``.
    """
    # keep the PERSISTED handle: withColumn below rebinds `df`, and
    # unpersist() on the rebound frame is a silent no-op (it only drops
    # a cache entry whose plan sameResults the given plan) — the
    # original frame would stay pinned for the life of the session
    base = df.persist()
    df = base
    qs = [i / nbuckets for i in range(1, nbuckets)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.aggregate(
            barr, F.lit(0),
            lambda acc, b: acc + F.when(F.col(order_col) > b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    df = df.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["n"]
        for r in df.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_bkt").orderBy(
        F.asc(order_col), *[F.asc(t) for t in tie_cols]
    )
    out = df.withColumn(
        out_col,
        (F.row_number().over(w) + off_map[F.col("_bkt")]).cast("long"),
    ).drop("_bkt")
    # release the quantile/count cache without yanking it from under
    # the (lazy) result: checkpoint the small ranked output locally,
    # then unpersist — otherwise every call leaks one pinned copy of
    # the keyed frame for the life of the session
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out, acc


GLOBAL_RANK_SMALL_N = 10_000_000  # below this, one-task window is cheaper


def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) distribution of per-customer spend, built on the
    scalable :func:`global_row_number` instead of a global NTILE
    window (same results; bucket-parallel instead of one-task).

    Small-input fast path: when the aggregated row count is under
    GLOBAL_RANK_SMALL_N, the plain single-partition window wins — the
    distributed ranking's extra driver round-trips (quantiles +
    per-bucket counts) are cluster insurance that only pays off when
    one task cannot hold the rows."""
    orders = load(spark, sf_dir, "orders")
    # integer-cent spend: the ranking key must be exact, or a float-sum
    # ulp at a decile boundary moves a customer between deciles in one
    # engine only (cents order == dollar order, so NTILE is unchanged)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents).alias("spend")
    ).persist()
    n = spend.count()
    if n < GLOBAL_RANK_SMALL_N:
        w = Window.orderBy(F.asc("spend"), F.asc("o_custkey"))
        ranked = spend.withColumn(
            "_rn", F.row_number().over(w).cast("long")
        )
    else:
        ranked, n = global_row_number(spend, "spend", ("o_custkey",))
    # NTILE(k): first n%k tiles get n//k+1 rows, the rest n//k
    q, rem = divmod(n, 10)
    big = rem * (q + 1)
    rn = F.col("_rn")
    decile = F.when(
        rn <= big, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(rem + F.floor((rn - 1 - big) / max(q, 1)) + 1)
    out = (
        ranked.withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("spend") / 100.0).alias("decile_spend"),
        )
    )
    # the result is bounded (≤10 rows): materialize it now so the
    # intermediate persist can be released deterministically instead of
    # leaking until session end
    rows = out.collect()
    schema = out.schema
    spend.unpersist()
    return spark.createDataFrame(rows, schema=schema)


DECILES_SQL = """
WITH spend AS (
    SELECT o_custkey,
           SUM(FLOOR(o_totalprice * 100 + 0.5)::BIGINT) AS spend
    FROM orders GROUP BY o_custkey
), tiled AS (
    SELECT *, NTILE(10) OVER (ORDER BY spend ASC, o_custkey ASC) AS decile
    FROM spend
)
SELECT decile, COUNT(*) AS n_customers, SUM(spend) / 100.0 AS decile_spend
FROM tiled GROUP BY decile
"""


def largest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-1 (max_by pattern) with deterministic tie-break."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("largest_orderkey"),
            F.round("o_totalprice", 2).alias("largest_totalprice"),
        )
    )


LARGEST_ORDER_SQL = """
WITH ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
    ) AS rn
    FROM orders
)
SELECT o_custkey, o_orderkey AS largest_orderkey,
       ROUND(o_totalprice, 2) AS largest_totalprice
FROM ranked WHERE rn = 1
"""


def event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total via window over a grouped aggregate."""
    events = load(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    total = counts.agg(F.sum("n").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "event_type", "n", "total_value",
        F.floor(F.col("n") * 1000000 / F.col("_total")).alias("share_ppm"),
    )


EVENT_SHARE_SQL = """
WITH counts AS (
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY event_type
)
SELECT event_type, n, total_value,
       FLOOR(n * 1000000 / SUM(n) OVER ())::BIGINT AS share_ppm
FROM counts
"""


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: bilateral trade volume between supplier and
    customer nations by ship year. The two nation joins broadcast (25
    rows); the lineitem–orders join is the one real shuffle. Pair
    selection uses name ordering (supp < cust) instead of the spec's
    fixture-specific nation constants so it runs on any nation set."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31"))
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate)::BIGINT AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: top-20 customers by revenue lost to returned
    items — join-heavy aggregation plus a deterministic top-k (rounded
    revenue desc, custkey asc)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    # exact integer units (10^-4 dollars, matching the old 4-dp round)
    # so the top-20 cut can't flip on engine-dependent float-sum order;
    # units/10000.0 is a bit-identical IEEE divide in both engines
    units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(units).alias("revenue_units"))
    )
    # Top-k as sort-limit (TakeOrderedAndProject — distributed per-partition
    # top-20 + driver merge), NOT a global row_number window, which would pull
    # every aggregated customer row into one task (~15M rows at sf100).  The
    # rank is then attached on the already-bounded 20-row result, where the
    # single-partition window is O(20).
    top = agg.orderBy(F.desc("revenue_units"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue_units"), F.asc("c_custkey"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(
            "c_custkey", "c_name", "n_name",
            (F.col("revenue_units") / 10000.0).alias("revenue"),
            "rnk",
        )
    )


Q10_SQL = """
WITH agg AS (
    SELECT c_custkey, c_name, n_name,
           SUM(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT)
               AS revenue_units
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name, revenue_units / 10000.0 AS revenue, rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY revenue_units DESC, c_custkey ASC
    ) AS rnk
    FROM agg
)
WHERE rnk <= 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: promo revenue share for one ship month — a
    part⨝lineitem join feeding a conditional-aggregate ratio. Parity
    convention: the ratio is computed from integer-cent sums (exact in
    any order), one float division + round at the end."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = load(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", 1).otherwise(0)
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(cents * promo).alias("promo_cents"),
        F.sum(cents).alias("total_cents"),
        F.round(
            F.sum(cents * promo) * 100 / F.sum(cents), 4
        ).alias("promo_share_pct"),
    )


Q14_SQL = """
SELECT SUM(cents * promo)::BIGINT AS promo_cents,
       SUM(cents)::BIGINT AS total_cents,
       ROUND(SUM(cents * promo) * 100 / SUM(cents)::DOUBLE, 4)
           AS promo_share_pct
FROM (
    SELECT FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT
               AS cents,
           CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate < TIMESTAMP '1995-10-01'
)
"""


# ---------------------------------------------------------------------------
# third wave: sequential funnel + semi-structured (JSON) extraction —
# the event-analytics shapes a telemetry/clickstream pipeline runs at
# 100 TB that the reference engine has no analog for
# ---------------------------------------------------------------------------

def funnel(events: DataFrame, stages: Sequence[str],
           key: str = "user_id", ts: str = "ts",
           stage_col: str = "event_type") -> DataFrame:
    """General N-stage ordered funnel: for each key, the first stage-0
    event, then for each later stage the first event at-or-after the
    previous stage's chosen instant — the sequential dependency that
    makes funnels harder than N independent mins. Returns one row per
    key that reached stage 0, with ``<stage>_epoch`` (floored seconds,
    NULL when unreached) per stage and ``funnel_depth``.

    Scale shape (r14 rewrite, guide §1.2 "the distributed algorithm"):
    ONE pass. Before, each stage re-scanned the event log, joined it
    against the previous stage's per-key aggregate and re-shuffled —
    N scans, N shuffles, N-1 joins plus the final left-join chain
    (before plan: 6 events scans, 20 Exchanges for 3 stages). The
    sequential dependency only needs, per key, stage 0's minimum and
    each later stage's timestamp MULTISET — so one groupBy(key) over
    the stage-filtered stream collects exactly that (min for stage 0,
    collect_list per later stage), and the chained minima fold as
    array_min(filter(list, >= prev)) — pure map work over the
    aggregate, no joins. The event log is scanned ONCE and shuffled
    ONCE (the same (key, ts) rows the old stage joins shuffled, now in
    one exchange). Join-on-key semantics are preserved exactly: a NULL
    key never matched the old per-stage equi-joins, so later stages
    are NULL-guarded on the key; stage-0 membership is "has a stage-0
    event" (a key whose stage-0 timestamps are all NULL still appears,
    with NULL epoch — the old groupBy kept that group too); a NULL
    prev instant yields an empty filter, reproducing the old
    ``_ts >= NULL`` reject. Raw-timestamp comparisons (microsecond
    exact); epochs floored only at the output edge, per the module
    convention."""
    if not stages:
        raise ValueError("funnel: need at least one stage")
    if len(set(stages)) != len(stages):
        # a repeated stage would build two <stage>_ts frames whose
        # join raises AMBIGUOUS_REFERENCE at best — refuse clearly
        raise ValueError(f"funnel: duplicate stage in {tuple(stages)}")
    aggs = [
        F.min(F.when(F.col(stage_col) == stages[0], F.col(ts)))
        .alias(f"{stages[0]}_ts"),
        F.count(F.when(F.col(stage_col) == stages[0], F.lit(1)))
        .alias("_n0"),
    ]
    for stage in stages[1:]:
        # collect_SET, not collect_list (r15 skew guard, guide §5):
        # the chained minimum min(filter(l, >= prev)) is duplicate-
        # insensitive, so deduping inside the aggregation buffer is
        # result-identical while bounding per-key state by DISTINCT
        # timestamps — a bot replaying the same events a million
        # times (the realistic hot-key pathology: retries, refresh
        # loops, at-least-once delivery) now costs one buffer entry
        # per distinct (stage, ts), not one per event, map-side
        # partials included. A key with millions of DISTINCT stage
        # timestamps still grows the buffer — that residual bound is
        # documented here deliberately: the exact funnel needs those
        # values (any of them can be the first-at-or-after instant),
        # and the join-free single-pass shape is worth more at 100 TB
        # than a lossy cap; tests/test_event_ops.py pins the hot-key
        # behavior.
        aggs.append(
            F.collect_set(F.when(F.col(stage_col) == stage, F.col(ts)))
            .alias(f"_l_{stage}")
        )
    out = (
        events.where(F.col(stage_col).isin(list(stages)))
        .groupBy(key).agg(*aggs)
        .where(F.col("_n0") > 0).drop("_n0")
    )
    prev = f"{stages[0]}_ts"
    for stage in stages[1:]:
        chained = F.array_min(
            F.filter(f"_l_{stage}", lambda x: x >= F.col(prev))
        )
        out = out.withColumn(
            f"{stage}_ts",
            # the old per-stage equi-join never matched a NULL key
            F.when(F.col(key).isNotNull(), chained),
        ).drop(f"_l_{stage}")
        prev = f"{stage}_ts"
    depth = F.lit(1)
    for stage in stages[1:]:
        depth = depth + F.col(f"{stage}_ts").isNotNull().cast("int")
    return out.select(
        key,
        *[F.unix_timestamp(f"{s}_ts").alias(f"{s}_epoch") for s in stages],
        depth.alias("funnel_depth"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase over the events table — the registered
    3-stage instance of :func:`funnel` (see it for the scale notes)."""
    return funnel(load(spark, sf_dir, "events"),
                  ("view", "click", "purchase"))


EVENTS_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, MIN(ts) AS view_ts
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS click_ts
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts >= v.view_ts
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
    GROUP BY e.user_id
)
SELECT v.user_id,
       FLOOR(EPOCH(view_ts))::BIGINT AS view_epoch,
       FLOOR(EPOCH(click_ts))::BIGINT AS click_epoch,
       FLOOR(EPOCH(purchase_ts))::BIGINT AS purchase_epoch,
       (1 + (click_ts IS NOT NULL)::INT
          + (purchase_ts IS NOT NULL)::INT) AS funnel_depth
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
"""


def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON props
    column and aggregate per event type. ``get_json_object`` is a JVM
    built-in (no Python in the hot path) and a malformed/missing key
    degrades to NULL on both engines (Spark returns NULL natively;
    the oracle goes through TRY_CAST), surfaced via n_with_k rather
    than crashing the scan — the posture a 100 TB log pipeline needs.
    All-integer aggregates, so parity is exact in any addition order.

    Only integer-LITERAL strings count as k: the same explicit
    ``^-?[0-9]+$`` gate on both engines, because the engines' native
    casts disagree at every edge (duckdb TRY_CAST rounds '1.5' where
    Spark NULLs it; Spark's cast trims whitespace and accepts '+5'
    where the gate rejects both) — the regexp IS the cross-engine
    numeric contract, not a convenience."""
    events = load(spark, sf_dir, "events")
    raw = F.get_json_object(F.col("props"), "$.k")
    # try_cast, not cast: under ANSI mode a non-numeric "$.k" value
    # would fail the whole scan; degrade-to-NULL is the contract here
    k = F.when(raw.rlike("^-?[0-9]+$"), raw.try_cast("long"))
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
        )
    )


# json_valid guard: duckdb's json_extract_string RAISES on malformed
# JSON where Spark's get_json_object returns NULL — the guard aligns
# the oracle with the engine's degrade-to-NULL contract. The integer
# regexp gate matters too: a bare TRY_CAST('1.5' AS BIGINT) ROUNDS in
# duckdb while Spark's try_cast('long') yields NULL — only
# integer-literal strings count as k on either engine.
EVENT_PROPS_SQL = """
WITH extracted AS (
    SELECT event_type,
           CASE WHEN json_valid(props)
                     AND regexp_matches(
                         COALESCE(json_extract_string(props, '$.k'), ''),
                         '^-?[0-9]+$')
                -- TRY_CAST still (not CAST): an overflowing integer
                -- literal passes the regexp and must NULL, not raise,
                -- exactly like Spark's try_cast
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k
    FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       COUNT(k) AS n_with_k,
       MIN(k) AS k_min,
       MAX(k) AS k_max,
       SUM(k)::BIGINT AS k_sum
FROM extracted GROUP BY event_type
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users cohorted by the epoch-week of
    their first event; for each (cohort_week, week_offset), how many of
    that cohort were active offset weeks later. Two partial-aggregating
    shuffles (per-user first event; distinct user-weeks) plus a join
    against the per-user cohort map — user-level aggregates, so AQE
    broadcasts while small and co-partitions beyond. Epoch-weeks are
    floor(whole-second epoch / 604800) in BOTH engines — all-integer,
    so parity is exact."""
    events = load(spark, sf_dir, "events")
    week = F.floor(F.unix_timestamp("ts") / 604800).cast("long")
    cohorts = (
        events.groupBy("user_id")
        .agg(F.min(week).alias("cohort_week"))
    )
    active = events.select("user_id", week.alias("week")).distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy("cohort_week",
                 (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        # plain count, NOT count_distinct: active is already distinct
        # on (user_id, week) and a user has exactly ONE cohort_week, so
        # each user contributes at most one row per group — a distinct
        # aggregate here would add a whole extra shuffle round for an
        # identical answer
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


COHORT_RETENTION_SQL = """
WITH weeks AS (
    SELECT user_id,
           FLOOR(FLOOR(EPOCH(ts)) / 604800)::BIGINT AS week
    FROM events
), cohorts AS (
    SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, week FROM weeks
)
SELECT cohort_week, (week - cohort_week) AS week_offset,
       COUNT(*) AS n_active
FROM active a JOIN cohorts c USING (user_id)
GROUP BY cohort_week, week_offset
"""


def top_paths(events: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Top-k length-``n`` event-type paths (consecutive per-user
    transitions) — the sequence-mining primitive behind "what do users
    do right before purchase" questions.

    Determinism: within a user the sequence orders on (ts, event_id) —
    event_id breaks timestamp ties exactly like the sessionizer — and
    the top-k boundary breaks count ties on the path string, so the
    result is engine-exact.

    Scale: ONE shuffle on user_id for the lead() window — the same
    partitioning every other per-user operator here shuffles on, so at
    100 TB a pre-bucketed events table serves all of them shuffle-free
    — then a groupBy on the path string whose partial aggregate
    collapses each task to ≤|event_type|^n rows (path cardinality, not
    event cardinality), and a sort-limit top-k over that tiny aggregate
    (TakeOrderedAndProject, never a single-partition global sort).

    NULL rows are dropped up front (the streaming counterpart's
    contract): a NULL ts has no deterministic window position — and
    the engines even disagree on it, ASC NULLS FIRST vs LAST — and a
    NULL event_type would silently shorten its paths under concat_ws's
    skip-null semantics, misgrouping them with genuine (n-1)-grams.
    event_id is dropped too: it is the ts tie-breaker, so a NULL there
    sorts NULLS FIRST in Spark and NULLS LAST in DuckDB on a tied ts,
    silently permuting the path (round-10 advice).
    """
    if n < 2:
        raise ValueError("top_paths: need n >= 2 (a length-1 'path' "
                         "is event_type_share's plain frequency count)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    clean = events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull())
    cols = [F.col("event_type")] + [
        F.lead("event_type", i).over(w).alias(f"_t{i}") for i in range(1, n)
    ]
    steps = clean.select(*cols)
    last = f"_t{n - 1}"
    return (
        steps.where(F.col(last).isNotNull())
        .select(F.concat_ws(">", *[c for c in steps.columns]).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(k)
    )


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type trigram paths over the events table — the
    registered n=3 instance of :func:`top_paths`."""
    return top_paths(load(spark, sf_dir, "events"), n=3, k=20)


EVENTS_TOP_PATHS_SQL = """
WITH seq AS (
    SELECT event_type AS t0,
           LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
           LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS t2
    FROM events
    -- same NULL-drop as the Spark side: NULL ts (or a NULL event_id
    -- tie-breaker on a tied ts) would ORDER BY differently across
    -- engines (NULLS FIRST vs LAST) and NULL event_type would
    -- shorten paths under skip-null concat
    WHERE ts IS NOT NULL AND event_type IS NOT NULL
      AND event_id IS NOT NULL
)
SELECT t0 || '>' || t1 || '>' || t2 AS path,
       COUNT(*) AS n_paths
FROM seq
WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY 1
ORDER BY n_paths DESC, path
LIMIT 20
"""


def conversion_lag_frame(events: DataFrame) -> DataFrame:
    """(user_id, day_idx, lag_s): each user's seconds from FIRST view
    to their first purchase at-or-after it, with the epoch-day index
    of the first view — the per-user stage shared by
    :func:`events_conversion_lag` (batch per-day rollup) and
    ``streaming.streaming_conversion_lag`` (the stateful on-arrival
    emitter, tested row-equal to this frame)."""
    ev = events.where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    fv = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    fp = (ev.where(F.col("event_type") == "purchase")
          .join(fv, "user_id")
          .where(F.col("ts") >= F.col("first_view"))
          .groupBy("user_id")
          .agg(F.min("ts").alias("first_purchase")))
    return fv.join(fp, "user_id").select(
        "user_id",
        F.floor(F.unix_timestamp("first_view") / 86400)
        .cast("long").alias("day_idx"),
        (F.unix_timestamp("first_purchase")
         - F.unix_timestamp("first_view")).cast("long").alias("lag_s"),
    )


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day time-to-convert: for each user, seconds from their
    FIRST view to their first purchase at-or-after it, aggregated by
    the day of the first view — count, min, max, exact mean, and the
    exact MEDIAN — the funnel-latency readout next to
    ``events_funnel``'s step counts.

    Engine-exact median without quantile functions (Spark
    ``percentile`` and DuckDB ``quantile_cont`` interpolate by
    different formulas): rank lags per day on (lag, user_id), take the
    rows at floor((n+1)/2) and ceil((n+1)/2), average — at most two
    integers, so the mean is exact in a double. Days are integer
    epoch-day indexes (floor(epoch/86400)): timezone-free on both
    engines where a calendar DATE cast is not.

    Scale: two partial-aggregated shuffles on user_id (first-view,
    first-purchase) + one user_id equi-join — the same key every event
    operator shuffles on, so a pre-bucketed events table serves them
    all co-located — then a day-keyed window over day-sized groups and
    a day-cardinality aggregate. NULL ts/user_id drop at the edge
    (the NULLS FIRST/LAST divergence)."""
    # r15 (guide §2.4, replacing r14's lazy checkpoint — its floors
    # measured ~flat while pinning blocks for the session): the
    # per-user lag frame feeds BOTH the median branch and the stats
    # branch, and the whole first-view/first-purchase derivation sits
    # below user_id exchanges that are IDENTICAL in the two branches —
    # AQE's runtime stage reuse collapses the repeats, the event log
    # is scanned/shuffled once, and only the converted-users-sized
    # join + day-level tail re-executes per branch.
    lag = conversion_lag_frame(load(spark, sf_dir, "events"))
    w = Window.partitionBy("day_idx").orderBy("lag_s", "user_id")
    wn = Window.partitionBy("day_idx")
    ranked = (lag.withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(wn)))
    med = (ranked.where(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.ceil((F.col("n") + 1) / 2)))
        .groupBy("day_idx")
        .agg(F.round(F.sum("lag_s") / F.count(F.lit(1)), 1)
             .alias("median_lag_s")))
    stats = lag.groupBy("day_idx").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lag_s").alias("min_lag_s"),
        F.max("lag_s").alias("max_lag_s"),
        F.round(F.sum("lag_s") / F.count(F.lit(1)), 6)
        .alias("avg_lag_s"),
    )
    return stats.join(med, "day_idx")


CONVERSION_LAG_SQL = """
WITH ev AS (
    SELECT * FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
), fv AS (
    SELECT user_id, MIN(ts) AS first_view
    FROM ev WHERE event_type = 'view' GROUP BY user_id
), fp AS (
    SELECT e.user_id, MIN(e.ts) AS first_purchase
    FROM ev e JOIN fv USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
    GROUP BY e.user_id
), lag AS (
    -- FLOOR(EPOCH(..)): duckdb EPOCH keeps fractional seconds where
    -- Spark unix_timestamp truncates — the repo-wide epoch idiom
    SELECT fv.user_id,
           CAST(FLOOR(FLOOR(EPOCH(fv.first_view)) / 86400) AS BIGINT)
               AS day_idx,
           CAST(FLOOR(EPOCH(fp.first_purchase))
                - FLOOR(EPOCH(fv.first_view)) AS BIGINT) AS lag_s
    FROM fv JOIN fp USING (user_id)
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY day_idx
                                 ORDER BY lag_s, user_id) AS rn,
           COUNT(*) OVER (PARTITION BY day_idx) AS n
    FROM lag
), med AS (
    SELECT day_idx, ROUND(SUM(lag_s) / COUNT(*), 1) AS median_lag_s
    FROM ranked
    WHERE rn = FLOOR((n + 1) / 2) OR rn = CEIL((n + 1) / 2)
    GROUP BY day_idx
), stats AS (
    SELECT day_idx, COUNT(*) AS n_converted, MIN(lag_s) AS min_lag_s,
           MAX(lag_s) AS max_lag_s,
           ROUND(SUM(lag_s) / COUNT(*), 6) AS avg_lag_s
    FROM lag GROUP BY day_idx
)
SELECT stats.day_idx, n_converted, min_lag_s, max_lag_s, avg_lag_s,
       median_lag_s
FROM stats JOIN med USING (day_idx)
"""


Q8_REGION = "ASIA"
Q8_TYPE = "STANDARD"
Q8_NATION = "NATION_3"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): for each order year in
    [1995, 1996], the share of {Q8_REGION}-customer revenue on
    {Q8_TYPE} parts supplied by {Q8_NATION} (reference workload shape:
    an 8-table snowflake join reduced to a two-level aggregate; the
    reference repo has no partsupp table, which Q8 does not need).

    Scale: every join is an equi-join on a key; part/nation/region
    prune map-side behind pushed filters and broadcast (dimension
    tables), lineitem→orders is the one fact-fact shuffle. Share =
    exact decimal SUMs (order-independent) divided once, rounded 6dp —
    the cross-engine determinism recipe (a double SUM's partial-agg
    order could flip the rounding)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31"))
    part = load(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    vol = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat.alias("n1"),
              F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(reg, F.col("n1.n_regionkey") == reg.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat.alias("n2"),
              F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")
    return (
        vol.groupBy("o_year")
        .agg(F.round(
            dec(F.when(F.col("supp_nation") == Q8_NATION,
                       F.col("volume")).otherwise(F.lit(0.0)))
            / dec(F.col("volume")), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH vol AS (
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
      AND o_orderdate >= '1995-01-01' AND o_orderdate <= '1996-12-31'
)
SELECT o_year,
       ROUND(
         CAST(SUM(CAST(CASE WHEN supp_nation = '{Q8_NATION}'
                       THEN volume ELSE 0.0 END
                       AS DECIMAL(38,12))) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(38,12))) AS DOUBLE),
         6) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): histogram of
    customers by number of non-urgent orders, including the
    zero-order customers the left join preserves. (The reference
    schema has no o_comment, so the 'special requests' exclusion is
    adapted to o_orderpriority = '1-URGENT' — same plan shape: a
    filtered left outer join.)

    Scale: one c_custkey left equi-join (orders side filtered
    map-side), a per-customer partial-aggregating count, then a
    histogram groupBy whose cardinality is the max order count —
    tiny. Pure integer outputs: engine-exact with no rounding."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) per
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# the synthetic schema has no l_commitdate/l_receiptdate, so the
# classic "line arrived late" predicate adapts to shipping more than
# LATE_DAYS after the order date — same correlated-EXISTS plan shape
LATE_SHIP_DAYS = 60


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): count one quarter's orders
    per priority where at least one line shipped late — the classic
    correlated EXISTS, planned as a LEFT SEMI hash join so each order
    is counted once no matter how many late lines it has (a plain
    inner join would need a re-distinct).

    Scale: the orders side is filtered map-side by the pushed date
    window before the semi join; lineitem is projected to two columns
    (column pruning reaches the scan); the late predicate rides the
    semi join as a post-match filter on the o_orderkey equi-key — one
    shuffle, then a 5-row aggregate. No date functions that disagree
    across engines: timestamp + INTERVAL arithmetic is exact."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-04-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01")))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate
           > orders.o_orderdate + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1996-04-01' AND o_orderdate < '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                                   + INTERVAL {LATE_SHIP_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


Q21_NATION = "NATION_9"  # the synthetic nation with the most suppliers


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for one nation's
    suppliers, count late lines on finished multi-supplier orders
    where this supplier was the ONLY late one — the classic
    EXISTS + NOT EXISTS pair, planned as a LEFT SEMI then a LEFT ANTI
    join on the same l_orderkey equi-key with the supplier-inequality
    as a post-match condition (never a nested-loop product). Late =
    shipped > LATE_SHIP_DAYS after the order date (schema adaptation,
    see :data:`LATE_SHIP_DAYS`).

    Scale: the lateness flag is computed ONCE on a lineitem⋈orders
    projection and reused by all three legs (l1 / the EXISTS side /
    the NOT-EXISTS side), so the fact table is scanned once per leg
    with two columns; the semi and anti joins shuffle on l_orderkey
    (co-partitioned, AQE-coalesced); supplier⋈nation is a broadcast;
    the final top-100 is a sort-limit (TakeOrderedAndProject)."""
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    l = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate")
         + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")).alias("late"))
    l1 = l.where(F.col("late"))
    others = l.select(F.col("l_orderkey").alias("o_key"),
                      F.col("l_suppkey").alias("o_supp"))
    others_late = (l.where(F.col("late"))
                   .select(F.col("l_orderkey").alias("o_key"),
                           F.col("l_suppkey").alias("o_supp")))
    cand = l1.join(
        others,
        (l1.l_orderkey == others.o_key)
        & (l1.l_suppkey != others.o_supp), "left_semi")
    cand = cand.join(
        others_late,
        (cand.l_orderkey == others_late.o_key)
        & (cand.l_suppkey != others_late.o_supp), "left_anti")
    nat = load(spark, sf_dir, "nation").where(
        F.col("n_name") == Q21_NATION)
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"))
    return (cand.join(supp, cand.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(100))


Q21_SQL = f"""
WITH l AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM l l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE l1.late AND n_name = '{Q21_NATION}'
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose one-quarter
    revenue equals the maximum — the classic scalar-subquery-on-an-
    aggregate shape. The revenue table is per-supplier (dimension-
    sized); the max is a 1-row broadcast crossed against it, so the
    'subquery' costs one extra reduction over an already-aggregated
    frame, never a second fact scan (the quarter-filtered lineitem is
    scanned ONCE).

    Engine-exact: revenue is rounded to 4 dp immediately after the
    identical sum chain on both engines, and the max-equality compare
    happens on the ROUNDED value, so a last-ulp summation-order
    difference cannot select different winners."""
    # the explicit isnotnull matters for the exchange reuse below: the
    # supplier equi-join infers isnotnull(l_suppkey) and pushes it
    # into the ROWS branch's scan only, which would make the two
    # branch subtrees canonically different and block the reuse.
    # Filtering at the edge puts the identical predicate in both
    # (l_suppkey is a non-null fact FK in this schema — TESTDATA.md —
    # so no group is dropped; the repo's NULL-at-the-operator-edge
    # convention).
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
        & F.col("l_suppkey").isNotNull())
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))), 4)
        .alias("total_revenue"))
    # TPC-H defines rev as a VIEW consumed twice (per-supplier rows +
    # the scalar max). r15: both consumers sit above the identical
    # Exchange hashpartitioning(l_suppkey), which AQE's runtime stage
    # reuse collapses into a ReusedExchange — lineitem is scanned once
    # (plan-gated on the executed plan) with no checkpoint, no pinned
    # blocks, and the lineage visible; only the supplier-sized final
    # aggregate re-executes for the max branch.
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# Q17's p_container predicate adapts to p_type (the synthetic part
# table has no container column); same selective-dimension plan shape
Q17_BRAND = "Brand#4"
Q17_TYPE = "MEDIUM"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): weekly revenue lost
    if small-quantity lines of one brand/type were not filled — the
    correlated scalar-AVG subquery, decorrelated into a per-part
    average over the SAME brand-filtered join both engines compute
    once (the filtered slice is scanned, grouped, and self-joined on
    l_partkey; the full lineitem is never aggregated).

    Engine-exact without rounding tricks: l_quantity values are
    integral doubles, so SUM is exact in fp regardless of order and
    AVG = exact_sum / count reproduces bit-identically on both
    engines — the 'l_quantity < 0.2 * avg' cut cannot flip."""
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") == Q17_BRAND)
        & (F.col("p_type") == Q17_TYPE)).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    flt = li.join(F.broadcast(part),
                  li.l_partkey == part.p_partkey).drop("p_partkey")
    av = flt.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh"))
    return (
        flt.join(av, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4)
             .alias("avg_yearly"))
    )


Q17_SQL = f"""
WITH flt AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = '{Q17_BRAND}' AND p_type = '{Q17_TYPE}'
), av AS (
    SELECT l_partkey, AVG(l_quantity) * 0.2 AS qty_thresh
    FROM flt GROUP BY l_partkey
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM flt JOIN av USING (l_partkey)
WHERE l_quantity < qty_thresh
"""


Q18_QTY_THRESHOLD = 250  # between the p90 (180) and p99 (262) order sums


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total line
    quantity exceeds a threshold, with their customer — the IN-on-a-
    grouped-HAVING-subquery shape, planned as a LEFT SEMI join against
    the per-order quantity aggregate (partial map-side sums; the
    aggregate is orders-cardinality, not lineitem-cardinality).
    Top-100 by price via sort-limit; o_orderkey breaks residual ties
    for a total order. Quantities are integral doubles, so the sums
    are fp-exact on both engines."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("_sum_qty"))
           .where(F.col("_sum_qty") > Q18_QTY_THRESHOLD)
           .select(F.col("l_orderkey").alias("_big_key")))
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = (orders.join(big, orders.o_orderkey == big._big_key, "left_semi")
         .join(li, orders.o_orderkey == li.l_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey))
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                  "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 4) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_QTY_THRESHOLD})
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# Q19's container/shipmode predicates adapt to p_size/l_quantity
# bands (the synthetic schema has neither column); the plan-family
# essence — a disjunction of per-brand conjunctive bands evaluated
# INSIDE one equi-join — is unchanged
Q19_BANDS = [
    ("Brand#4", 1, 15, 1, 15),
    ("Brand#2", 1, 25, 10, 25),
    ("Brand#19", 1, 40, 20, 35),
]


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue over an OR of per-brand
    (size-band AND quantity-band) conjunctions — the disjunctive-
    predicate join family the rest of the TPC-H set never exercises.
    The disjunction stays a residual condition on the p_partkey
    EQUI-join (hash join + post-match filter, never a nested-loop
    product), and Catalyst still pushes the derivable per-side
    bounds: part scans with a p_size range, lineitem with the overall
    l_quantity envelope.

    Scale: part is the dimension side (broadcast while it fits, AQE
    otherwise); one scan of each table; single-row output rounded
    after the identical sum chain."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    disj = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_BANDS:
        c = ((F.col("p_brand") == brand)
             & F.col("p_size").between(s_lo, s_hi)
             & F.col("l_quantity").between(q_lo, q_hi))
        disj = c if disj is None else (disj | c)
    return (
        li.join(part, (li.l_partkey == part.p_partkey) & disj)
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )


_Q19_DISJ_SQL = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_BANDS
)

Q19_SQL = f"""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_DISJ_SQL}
"""


# Q2's partsupp is derived from lineitem (the synthetic schema ships
# no partsupp table): supplycost(part, supplier) = the minimum
# observed unit price MIN(ROUND(l_extendedprice / l_quantity, 4)).
# The division of identical parquet doubles is IEEE-exact on both
# engines and the 4-dp round happens BEFORE the MIN, so the
# correlated-minimum compares identical values everywhere.
Q2_REGION = "EUROPE"
Q2_MIN_SIZE = 45
Q2_TYPE = "LARGE"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each large high-size part,
    the EUROPE supplier(s) whose derived supply cost equals the
    region-wide minimum for that part — the correlated-MIN-subquery-
    over-a-join family, decorrelated into a per-part MIN over the
    region-filtered cost table joined back on (partkey, cost).

    Scale: the part slice is dimension-tiny behind pushed size/type
    filters and BROADCAST into the lineitem scan, so the fact table is
    filtered map-side before the (partkey, suppkey) partial-agg
    shuffle; supplier⋈nation⋈region is a broadcast chain; the
    correlated MIN runs over the already part-bounded cost table
    (dimension-sized), never a second fact pass. Top-100 by account
    balance is a sort-limit."""
    region = load(spark, sf_dir, "region").where(
        F.col("r_name") == Q2_REGION)
    nat = (load(spark, sf_dir, "nation")
           .join(F.broadcast(region),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    part = load(spark, sf_dir, "part").where(
        (F.col("p_size") >= Q2_MIN_SIZE) & (F.col("p_type") == Q2_TYPE)
    ).select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    cost = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.round(
                F.col("l_extendedprice") / F.col("l_quantity"), 4))
                .alias("supplycost")))
    rc = cost.join(supp, cost.l_suppkey == supp.s_suppkey)
    # r14 (guide §2.4): the per-part minimum is a window over rc, not a
    # groupBy + join-back — before, rc's WHOLE subtree (the broadcast
    # part slice into the fact scan, the cost partial-agg, the supplier
    # chain) was evaluated twice, once per consumer (11 scans / 2
    # SortMergeJoins in the before plan). A min().over(partkey) +
    # equality filter computes the identical keep-all-ties set (NULL
    # never equals the min in either form) in ONE pass of the
    # dimension-bounded rc — one partkey Exchange replaces the second
    # subtree, the two SMJ exchanges, and the join itself.
    w = Window.partitionBy("l_partkey")
    return (
        rc.withColumn("_min_cost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("_min_cost"))
        .join(F.broadcast(part), rc.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name",
                F.col("l_partkey").alias("p_partkey"), "p_type",
                "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH part_f AS (
    SELECT p_partkey, p_type FROM part
    WHERE p_size >= {Q2_MIN_SIZE} AND p_type = '{Q2_TYPE}'
), supp_r AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q2_REGION}'
), cost AS (
    SELECT l_partkey, l_suppkey,
           MIN(ROUND(l_extendedprice / l_quantity, 4)) AS supplycost
    FROM lineitem JOIN part_f ON l_partkey = p_partkey
    GROUP BY l_partkey, l_suppkey
), rc AS (
    SELECT c.l_partkey, c.supplycost,
           s.s_suppkey, s.s_name, s.s_acctbal, s.n_name
    FROM cost c JOIN supp_r s ON c.l_suppkey = s.s_suppkey
)
SELECT s_acctbal, s_name, n_name, rc.l_partkey AS p_partkey,
       p_type, supplycost
FROM rc JOIN part_f ON rc.l_partkey = p_partkey
WHERE supplycost = (SELECT MIN(supplycost) FROM rc r2
                    WHERE r2.l_partkey = rc.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# Q11's ps_supplycost*ps_availqty inventory value is derived from
# lineitem: value(part) = discounted revenue supplied by one region's
# suppliers. The HAVING-vs-global-scalar family is unchanged; the
# TPC-H FRACTION (0.0001/SF — it must shrink as the part count grows)
# becomes a multiple of the MEAN per-part value, which keeps the
# output a stable slice of the distribution at every SF instead of
# going empty past sf0.01.
Q11_REGION = "ASIA"
Q11_MEAN_MULT = 2.0


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): per-part supplied
    value from one region's suppliers, keeping parts whose value
    exceeds FRACTION of the region's total — the group-HAVING vs
    global-scalar family. The scalar is one extra reduction over the
    ALREADY-AGGREGATED per-part table (never a second fact scan),
    broadcast as a 1-row cross join into the filter.

    Engine-exact: per-part values are rounded to 4 dp after identical
    sum chains; the global total then sums the ROUNDED per-part values
    in decimal (order-independent, exact), so the > compare is
    bit-identical on both engines."""
    nat = (load(spark, sf_dir, "nation")
           .join(F.broadcast(load(spark, sf_dir, "region")
                             .where(F.col("r_name") == Q11_REGION)),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
           .groupBy("l_partkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 4)
                .alias("value")))
    # r15: the per-part aggregate feeds both the rows and the scalar,
    # and BOTH branches sit above the identical
    # Exchange hashpartitioning(l_partkey) — AQE's runtime stage reuse
    # collapses the second into a ReusedExchange, so lineitem scans
    # once with no checkpoint (r14's lazy localCheckpoint hid the
    # lineage in a separate RDD, which both blinded the plan gate and
    # pinned the frame in executor storage; only the part-sized final
    # aggregate re-executes per branch now)
    total = val.agg(
        (F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
         / F.count(F.lit(1)) * F.lit(Q11_MEAN_MULT)).alias("_thresh"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("_thresh"))
        .select(F.col("l_partkey").alias("ps_partkey"), "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


Q11_SQL = f"""
WITH val AS (
    SELECT l_partkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q11_REGION}'
    GROUP BY l_partkey
)
SELECT l_partkey AS ps_partkey, value
FROM val
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(*) * {Q11_MEAN_MULT} FROM val)
ORDER BY value DESC, ps_partkey
"""


# Q20's ps_availqty is derived from lineitem: a supplier's "available
# quantity" of a part = total quantity they ever shipped of it; the
# correlated 0.5×SUM threshold is the part's one-year shipped total.
Q20_NAME_PREFIX = "red "
Q20_REGION = "ASIA"


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers in one region
    holding more of a 'red' part than half of what the whole market
    shipped of it in 1996 — the doubly-nested semi-join with a
    correlated 0.5×SUM subquery, decorrelated into two bounded
    aggregates joined on partkey, then a LEFT SEMI from supplier onto
    the qualifying supplier set.

    Scale: the part-name slice broadcasts into BOTH lineitem passes
    (map-side filter before each partial-agg shuffle); the all-time
    and 1996 aggregates are (part×supplier)- and part-sized; the
    qualifying-supplier set is dimension-sized for the semi join.
    Quantities are integral doubles, so sums are fp-exact on both
    engines and the 0.5× compare cannot flip."""
    redp = load(spark, sf_dir, "part").where(
        F.col("p_name").startswith(Q20_NAME_PREFIX)).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    red_li = li.join(F.broadcast(redp), li.l_partkey == redp.p_partkey)
    # r14 (guide §2.4): ONE fact pass, not two. The all-time and 1996
    # sums fuse into a single (partkey, suppkey) conditional aggregate
    # (quantities are integral doubles, so partial-sum regrouping is
    # fp-exact); the per-part 0.5× market total then derives from the
    # already-reduced frame as a partkey window — sum ignores NULL _q96
    # rows and yields NULL when NO supplier shipped the part in 1996,
    # so the `_qty > _half` filter reproduces the old inner-join-on-
    # partkey restriction exactly. The `.distinct()` the old join-back
    # needed is gone too — the LEFT SEMI below is membership already.
    # Plan diff: 2 fact scans + 2 partial-agg shuffles + 1 join + 1
    # distinct Exchange → 1 fact scan + 1 partial-agg shuffle + 1
    # dimension-sized window Exchange.
    in96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01")))
    ps = (red_li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("_qty"),
               F.sum(F.when(in96, F.col("l_quantity"))).alias("_q96")))
    qual = (ps.withColumn(
        "_half",
        (F.sum("_q96").over(Window.partitionBy("l_partkey")) * 0.5))
        .where(F.col("_qty") > F.col("_half"))
        .select("l_suppkey"))
    nat = (load(spark, sf_dir, "nation")
           .join(F.broadcast(load(spark, sf_dir, "region")
                             .where(F.col("r_name") == Q20_REGION)),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey")))
    return (supp.join(qual, supp.s_suppkey == qual.l_suppkey,
                      "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_name"))


Q20_SQL = f"""
WITH redp AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
), ps AS (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
    FROM lineitem JOIN redp ON l_partkey = p_partkey
    GROUP BY l_partkey, l_suppkey
), half AS (
    SELECT l_partkey, 0.5 * SUM(l_quantity) AS half_qty
    FROM lineitem JOIN redp ON l_partkey = p_partkey
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
    GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (SELECT l_suppkey FROM ps
                    JOIN half USING (l_partkey) WHERE qty > half_qty)
ORDER BY s_name
"""


# Q16's partsupp derives from lineitem (DISTINCT (partkey, suppkey)
# pairs — who ever supplied what), and the 'Customer Complaints'
# comment exclusion adapts to negative account balance (no comment
# column in the synthetic schema). The plan-family essence — NOT IN
# subquery + grouped COUNT DISTINCT — is unchanged.
Q16_EXCL_BRAND = "Brand#4"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 9, 19, 23, 36, 45, 49, 50)


def q16_parts_supplier_relationship(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers can provide each interesting (brand, type, size) combo,
    excluding complained-about suppliers — the NOT-IN-subquery +
    grouped-COUNT-DISTINCT family. The NOT IN plans as a LEFT ANTI
    hash join (s_suppkey is never NULL, so the semantics coincide —
    the anti join IS how engines decorrelate a null-free NOT IN).

    Scale (r15, guide §2.4 "a distinct on data that is already
    unique" — here, a distinct UNDER a count-distinct): the derived
    partsupp's ``.distinct()`` was redundant — duplicate (partkey,
    suppkey) pairs collapse to the same (brand, type, size, suppkey)
    row, which COUNT DISTINCT dedups anyway — yet it cost a full
    Exchange of every distinct pair BEFORE the part slice filtered
    anything. Dropped: the broadcast part join (pushed brand/type/size
    filters) and the anti join now run MAP-SIDE over the raw two-column
    scan, and the count-distinct's own partial aggregate dedups
    (brand, type, size, suppkey) before the one remaining
    pair-carrying Exchange — one less corpus-pair shuffle, and the
    surviving shuffle carries only part-slice-filtered rows. The
    excluded-supplier set stays dimension-tiny behind a pushed acctbal
    filter."""
    ps = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"))
    excl = load(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(excl, ps.ps_suppkey == excl.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SIZES_SQL = ", ".join(str(s) for s in Q16_SIZES)

Q16_SQL = f"""
WITH ps AS (
    SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
    FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN ({_Q16_SIZES_SQL})
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# Q22's phone-prefix country code adapts to c_nationkey % 10 (the
# synthetic customer table has no phone column), and "no orders in
# 7 years" to "no orders on/after Q22_CUTOFF" (every synthetic
# customer has SOME order, so the literal anti-join would be empty).
Q22_CODES = (1, 3, 5, 7, 9)
Q22_CUTOFF = "1999-01-01"


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): wealthy, inactive
    customers in selected country codes — the anti-join + scalar-AVG
    family: the balance cut compares against the average positive
    balance over the SAME code slice (a 1-row broadcast), and
    inactivity is a LEFT ANTI join against the date-filtered orders.

    Engine-exact: the average is decimal-exact (balances carry 2 dp,
    so DECIMAL(18,2) sums are order-independent) and cast to double
    ONCE before the compare; the output total is the exact decimal
    sum cast to double — no float-accumulation drift anywhere."""
    cust = load(spark, sf_dir, "customer").where(
        (F.col("c_nationkey") % 10).isin(*Q22_CODES)
    ).select(
        "c_custkey", "c_acctbal",
        (F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
    # exact decimal sum → ONE double division (decimal÷int division
    # scale/rounding rules differ between engines; double division of
    # identical operands does not)
    avgbal = (cust.where(F.col("c_acctbal") > 0.0)
              .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                    .cast("double")
                    / F.count(F.lit(1))).alias("_avg")))
    recent = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF)).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avgbal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
             .cast("double").alias("totacctbal"))
        .orderBy("cntrycode")
    )


_Q22_CODES_SQL = ", ".join(str(c) for c in Q22_CODES)

Q22_SQL = f"""
WITH c AS (
    SELECT c_custkey, c_acctbal,
           CAST(c_nationkey % 10 AS INT) AS cntrycode
    FROM customer
    WHERE c_nationkey % 10 IN ({_Q22_CODES_SQL})
), avgbal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS a
    FROM c WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS totacctbal
FROM c
WHERE c_acctbal > (SELECT a FROM avgbal)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '{Q22_CUTOFF}')
GROUP BY cntrycode
ORDER BY cntrycode
"""


# Q9's classic '%green%' name filter becomes a token with comparable
# selectivity on the synthetic p_name vocabulary (24/200 parts at
# sf0.001 — the spec's color filter keeps ~1/17)
Q9_PART_TOKEN = "bolt"


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): nation × order-year profit over
    parts matching a name token, profit = discounted revenue minus
    supply cost × quantity. This corpus has no partsupp table, so
    ps_supplycost is DERIVED as Q2/Q11 derive it: the minimum
    per-(partkey, suppkey) unit price over lineitem, fixed-pointed to
    1e-4 units (FLOOR, not ROUND — see the in-body parity note).

    Scale: the name-filtered part slice is BROADCAST into the fact
    scan, so lineitem is filtered map-side before any shuffle and both
    consumers (the cost derivation and the profit rows) share that one
    part-bounded projection; the derived cost table is
    (filtered-parts × suppliers)-bounded and broadcast back into the
    fact join — the correlated table never costs a fact-side shuffle;
    supplier⋈nation is a broadcast chain. The only fact shuffles are
    the (partkey, suppkey) partial agg and the orderkey join — no
    product joins anywhere (plan-gated)."""
    part = load(spark, sf_dir, "part").where(
        F.col("p_name").like(f"%{Q9_PART_TOKEN}%")).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    li_b = li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
    # supplycost in 1e-4 units via FLOOR(x*1e4+0.5) instead of Q2's
    # ROUND(x,4): Spark rounds the DECIMAL rendering half-up while
    # DuckDB rounds the BINARY double, so an exact half like
    # 4479.01125 diverges (4479.0113 vs .0112) — FLOOR of the same
    # IEEE product is bit-deterministic on both engines
    cost = (li_b.groupBy(F.col("l_partkey").alias("c_pk"),
                         F.col("l_suppkey").alias("c_sk"))
            .agg(F.min(F.floor(
                F.col("l_extendedprice") / F.col("l_quantity")
                * 10000 + 0.5).cast("long")).alias("sc_e4")))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(load(spark, sf_dir, "nation")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "n_name"))
    # q14's parity convention: per-row integer cents (identical IEEE
    # double ops on both engines, then an exact long sum in any
    # order), ONE division at the end — a plain double SUM + ROUND
    # lands on the half-cent boundary in ~2% of groups here because
    # the profit subtraction cancels most of each term's magnitude
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    cost_cents = F.floor(
        F.col("sc_e4") / 10000.0 * F.col("l_quantity") * 100 + 0.5
    ).cast("long")
    amount_cents = rev_cents - cost_cents
    return (
        li_b
        .join(F.broadcast(cost), (F.col("l_partkey") == F.col("c_pk"))
              & (F.col("l_suppkey") == F.col("c_sk")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount_cents) / 100.0, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
WITH part_f AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '%{Q9_PART_TOKEN}%'
), lb AS (
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
           l_extendedprice, l_discount
    FROM lineitem JOIN part_f ON l_partkey = p_partkey
), cost AS (
    SELECT l_partkey AS c_pk, l_suppkey AS c_sk,
           MIN(FLOOR(l_extendedprice / l_quantity * 10000 + 0.5)::BIGINT)
               AS sc_e4
    FROM lb GROUP BY 1, 2
)
SELECT n_name AS nation, YEAR(o_orderdate)::BIGINT AS o_year,
       ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100
                       + 0.5)::BIGINT
                 - FLOOR(sc_e4 / 10000.0 * l_quantity * 100
                         + 0.5)::BIGINT
                 ) / 100.0, 2) AS sum_profit
FROM lb
JOIN cost ON l_partkey = c_pk AND l_suppkey = c_sk
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


Q12_YEAR_START = "1996-01-01"
Q12_YEAR_END = "1997-01-01"
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): per line class,
    how many late-shipped lines in one year came from high- vs
    low-priority orders — the CASE-conditional aggregate over a
    fact⋈fact join. Schema adaptation (this corpus carries no
    l_shipmode / l_commitdate / l_receiptdate): ``l_returnflag``
    stands in for the line's mode class, and late = shipped more than
    LATE_SHIP_DAYS after the order date — the same lateness rule Q4
    and Q21 established.

    Scale: ONE pass over each fact — the ship-date window pushes into
    the lineitem scan, orders is projected to three columns before
    the orderkey equi-join (co-partitioned shuffle, AQE-coalesced),
    and both conditional SUMs ride the same CASE with map-side
    partial aggregation into 3 output rows; there is no second scan
    for the low/high split (plan-gated: single lineitem scan,
    partial_count present)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q12_YEAR_START))
        & (F.col("l_shipdate") < F.lit(Q12_YEAR_END))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS"))
    high = F.when(
        F.col("o_orderpriority").isin(*Q12_HIGH_PRIORITIES), 1
    ).otherwise(0)
    return (late.groupBy("l_returnflag")
            .agg(F.sum(high).alias("high_line_count"),
                 F.sum(1 - high).alias("low_line_count"))
            .orderBy("l_returnflag"))


_Q12_HIGH_SQL = ", ".join(f"'{p}'" for p in Q12_HIGH_PRIORITIES)

Q12_SQL = f"""
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ({_Q12_HIGH_SQL})
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ({_Q12_HIGH_SQL})
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR_START}'
  AND l_shipdate < TIMESTAMP '{Q12_YEAR_END}'
  AND l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES.update({
    "q7_nation_trade": q7_nation_trade,
    "q14_promo_revenue": q14_promo_revenue,
    "q10_returned_items": q10_returned_items,
    "events_funnel": events_funnel,
    "event_props_extract": event_props_extract,
    "events_cohort_retention": events_cohort_retention,
    "events_top_paths": events_top_paths,
})

# the driver's correctness window covers the first 50 registered
# queries; q10's top-k was rewritten in round 5 (sort-limit instead of
# a single-partition window) and was re-keyed first that round for a
# fresh driver row (green in CORRECTNESS_r05). The ordering is now
# round-rotated at the module level instead — see
# operators/__init__.py::ALL_MODULES. events_conversion_lag,
# q8_market_share, and q13_customer_distribution are NEW in round 11
# and keyed second/third/fourth so they land inside the window's
# relational head (the r11 window = 31 rotated + 6 new module-front
# queries + the first 13 relational entries; the single source of
# truth for the arithmetic is the ALL_MODULES comment).
QUERIES = {
    "q10_returned_items": QUERIES["q10_returned_items"],
    "events_conversion_lag": events_conversion_lag,
    "q8_market_share": q8_market_share,
    "q13_customer_distribution": q13_customer_distribution,
    **{k: v for k, v in QUERIES.items() if k != "q10_returned_items"},
}

QUERIES.update({
    "q9_product_type_profit": q9_product_type_profit,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    "q20_potential_promotion": q20_potential_promotion,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q4_order_priority": q4_order_priority,
    "q21_suppliers_waiting": q21_suppliers_waiting,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q19_discounted_revenue": q19_discounted_revenue,
    "nations_customers_no_suppliers": nations_customers_no_suppliers,
    "customer_spend_deciles": customer_spend_deciles,
    "largest_order_per_customer": largest_order_per_customer,
    "event_type_share": event_type_share,
})

ORACLE_SQL.update({
    "q7_nation_trade": Q7_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q10_returned_items": Q10_SQL,
    "nations_customers_no_suppliers": NATIONS_EXCEPT_SQL,
    "customer_spend_deciles": DECILES_SQL,
    "largest_order_per_customer": LARGEST_ORDER_SQL,
    "event_type_share": EVENT_SHARE_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "event_props_extract": EVENT_PROPS_SQL,
    "events_cohort_retention": COHORT_RETENTION_SQL,
    "events_top_paths": EVENTS_TOP_PATHS_SQL,
    "events_conversion_lag": CONVERSION_LAG_SQL,
    "q8_market_share": Q8_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q4_order_priority": Q4_SQL,
    "q21_suppliers_waiting": Q21_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_volume_customer": Q18_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_parts_supplier_relationship": Q16_SQL,
    "q20_potential_promotion": Q20_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
})


# retired r14 to free driver slots (registry capped at 100), each
# subsumed by a registered superset of the same plan shape — the
# local DuckDB parity suite still runs all three every round:
# - customers_without_orders: plain customer⋈orders LEFT ANTI, inside
#   q22_global_sales_opportunity (anti join against date-filtered
#   orders + scalar-AVG cut) and mirrored by
#   nations_customers_no_suppliers
# - urgent_orders_with_lineitems: its own docstring names it "TPC-H
#   Q4 shape" — q4_order_priority is the registered superset (same
#   LEFT SEMI + priority histogram, plus the correlated date rule)
# - brand_type_pivot: SUM(CASE) conditional-agg pivot with integer
#   cents; the shape is carried by q12_shipmode_priority (conditional
#   agg over a join) and q14_promo_revenue (conditional ratio)
# - orders_above_customer_avg (retired r14, slot freed for
#   pq_ann_topk): decorrelated per-group AVG broadcast back into the
#   fact scan — the shape q17_small_qty_revenue runs per part and
#   q22_global_sales_opportunity runs as a scalar cut
RETIRED_QUERIES = {
    "customers_without_orders": customers_without_orders,
    "urgent_orders_with_lineitems": urgent_orders_with_lineitems,
    "brand_type_pivot": brand_type_pivot,
    "orders_above_customer_avg": orders_above_customer_avg,
}

RETIRED_ORACLE_SQL = {
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "urgent_orders_with_lineitems": URGENT_ORDERS_SQL,
    "brand_type_pivot": BRAND_PIVOT_SQL,
    "orders_above_customer_avg": ORDERS_ABOVE_AVG_SQL,
}
