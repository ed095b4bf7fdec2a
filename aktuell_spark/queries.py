"""Driver-contract query registry: every SURVEY §2 operator as a
(spark_fn, oracle_sql) pair over the /root/testdata tables.

Each Spark query is the engine's operator applied to the TPC-H-ish
tables (``events`` plays the CDC/stream role: event_id≈seq,
user_id≈conv_id); each oracle is ANSI SQL DuckDB runs on the same
parquet. Column names and value shapes are aligned on both sides
(floats rounded, timestamps → epoch seconds) so the driver's
order-insensitive value-hash matches.

Registry shape: ``QUERIES[name] = (fn, sql_or_None)`` — ``None`` marks
non-SQL-expressible ops (streaming/stateful), which get the driver's
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aktuell_spark.operators.snapshot import SnapshotOptions, snapshot_scan
from aktuell_spark.operators.topk import topk_per_key
from aktuell_spark.operators.windows import session_counts, sliding_counts, tumbling_counts

def _epoch(c):
    """Epoch seconds from a (possibly NTZ) timestamp; session tz is UTC
    so NTZ→timestamp is identity."""
    return F.col(c).cast("timestamp").cast("long")


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ----------------------------------------------------------------------
# §2.1 sources/scans + §2.2 filters
# ----------------------------------------------------------------------

def q_subscription_filter(spark, sf_dir):
    """F1/S2: subscription predicate with isin pushdown (reference:
    $match on ns.coll, pkg/sync/database.go:67-75)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        _epoch("ts").alias("ts_epoch"),
    )


SQL_SUBSCRIPTION_FILTER = """
SELECT event_id, user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM events WHERE event_type IN ('click', 'purchase')
"""


def q_json_projection(spark, sf_dir):
    """S4: decode + nested projection (parseChangeEvent analogue,
    pkg/sync/database.go:124-181) — JSON payload → typed column."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).filter(F.col("k") > 50)


SQL_JSON_PROJECTION = """
SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
FROM events WHERE CAST(props->>'k' AS INTEGER) > 50
"""


def q_snapshot_scan(spark, sf_dir):
    """S6/O1/O2: bounded snapshot — filter + sort + limit
    (StreamSnapshot, pkg/sync/database.go:225-333)."""
    ev = load(spark, sf_dir, "events")
    snap = snapshot_scan(
        ev,
        SnapshotOptions(
            filter_expr="value > 10.0",
            sort=[("ts", "desc"), ("event_id", "desc")],
            limit=1000,
        ),
    )
    return snap.select(
        "event_id", "user_id", "event_type",
        F.round("value", 2).alias("value"),
        _epoch("ts").alias("ts_epoch"),
    )


SQL_SNAPSHOT_SCAN = """
SELECT event_id, user_id, event_type, round(value, 2) AS value,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM events WHERE value > 10.0
ORDER BY ts DESC, event_id DESC LIMIT 1000
"""


def q_count_filtered(spark, sf_dir):
    """S7: CountDocuments(filter) (pkg/sync/database.go:254-266)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").agg(
        F.count(F.lit(1)).alias("n_errors")
    )


SQL_COUNT_FILTERED = "SELECT count(*) AS n_errors FROM events WHERE event_type = 'error'"


# ----------------------------------------------------------------------
# §2.3 joins + §2.4 aggregations
# ----------------------------------------------------------------------

def q_postimage_enrich(spark, sf_dir):
    """J1: UpdateLookup post-image enrichment (database.go:78) as a
    broadcast stream-static join: event ⟕ dimension row."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(
            F.broadcast(cust),
            ev.user_id + 1 == cust.c_custkey,
            "left",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_POSTIMAGE_ENRICH = """
SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events LEFT JOIN customer ON events.user_id + 1 = customer.c_custkey
GROUP BY c_mktsegment
"""


def q_cdc_latest_image(spark, sf_dir):
    """J2/T4: last-writer-wins materialization — newest event per key
    (client merge semantics, useAktuellStream.ts:125-171; LWW collapse
    = row_number over seq desc)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("event_id").alias("last_event_id"),
            F.round("value", 2).alias("last_value"),
        )
    )


SQL_CDC_LATEST_IMAGE = """
SELECT user_id, event_type AS last_event_type, event_id AS last_event_id,
       round(value, 2) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


def q_op_counts(spark, sf_dir):
    """A2/A3: ChangeEventsByType stats (pkg/sync/manager.go:126-142)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.col("event_type"),
    ).select("event_type", "n", "avg_value")


SQL_OP_COUNTS = """
SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
"""


# ----------------------------------------------------------------------
# §2.5 windows
# ----------------------------------------------------------------------

def q_tumbling_window(spark, sf_dir):
    """W3/A4: tumbling 1h per-type rollup."""
    ev = load(spark, sf_dir, "events")
    return tumbling_counts(ev, "ts", "1 hour", keys=["event_type"])


SQL_TUMBLING_WINDOW = """
SELECT event_type,
       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_sliding_window(spark, sf_dir):
    """W2: sliding 1h/15min rollup (changes-per-second dashboard stat)."""
    ev = load(spark, sf_dir, "events")
    return sliding_counts(ev, "ts", "1 hour", "15 minutes", keys=["event_type"])


SQL_SLIDING_WINDOW = """
SELECT event_type,
       (epoch_us(ts) // 900000000) * 900 - k * 900 AS window_start,
       count(*) AS n
FROM events, (SELECT unnest(range(4)) AS k)
GROUP BY 1, 2
"""


def q_session_window(spark, sf_dir):
    """W4: session windows, 30 min gap per user (conversation close on
    inactivity; idle-deadline analogue websocket.go:336-345)."""
    ev = load(spark, sf_dir, "events")
    return session_counts(ev, "ts", "30 minutes", keys=["user_id"])


SQL_SESSION_WINDOW = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS e,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
), g AS (
  SELECT user_id, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY e
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM o
)
SELECT user_id,
       min(e) // 1000000 AS session_start,
       max(e) // 1000000 AS last_ts,
       count(*) AS n
FROM g GROUP BY user_id, grp
"""


def q_topk_recent(spark, sf_dir):
    """W1/O4: top-3 newest events per user (ring-buffer analogue,
    useAktuellStream.ts:248)."""
    ev = load(spark, sf_dir, "events")
    top = topk_per_key(ev, ["user_id"], ["ts", "event_id"], k=3)
    return top.select(
        "user_id", "event_id", "rn", _epoch("ts").alias("ts_epoch")
    )


SQL_TOPK_RECENT = """
SELECT user_id, event_id, rn, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn <= 3
"""


# ----------------------------------------------------------------------
# Relational classics (free coverage from Spark SQL; bench headliners)
# ----------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3-style join + top-k revenue (broadcast dim, AQE join)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "subscription_filter": (q_subscription_filter, SQL_SUBSCRIPTION_FILTER),
    "json_projection": (q_json_projection, SQL_JSON_PROJECTION),
    "snapshot_scan": (q_snapshot_scan, SQL_SNAPSHOT_SCAN),
    "count_filtered": (q_count_filtered, SQL_COUNT_FILTERED),
    "postimage_enrich": (q_postimage_enrich, SQL_POSTIMAGE_ENRICH),
    "cdc_latest_image": (q_cdc_latest_image, SQL_CDC_LATEST_IMAGE),
    "op_counts": (q_op_counts, SQL_OP_COUNTS),
    "tumbling_window": (q_tumbling_window, SQL_TUMBLING_WINDOW),
    "sliding_window": (q_sliding_window, SQL_SLIDING_WINDOW),
    "session_window": (q_session_window, SQL_SESSION_WINDOW),
    "topk_recent": (q_topk_recent, SQL_TOPK_RECENT),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_revenue_orders": (q_top_revenue_orders, SQL_TOP_REVENUE_ORDERS),
}
