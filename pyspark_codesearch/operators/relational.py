"""Relational operator inventory over the driver testdata (SURVEY §2).

Each function is the Spark-first expression of a reference operator
class; entry_queries registers them with DuckDB oracles. Scale notes
inline: broadcast dims, partial aggregation, single-shuffle plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---- pricing summary (TPC-H Q1 shape: partial+final agg, pushdown filter)
def pricing_summary(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2002-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---- revenue by nation (star join: broadcast the small dims)
def revenue_by_nation(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---- top customers by revenue (join + agg + ordered top-k)
def top_customers(spark, sf_dir, k: int = 15) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
             F.count(F.lit(1)).alias("n_orders"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), F.asc("custkey"))
        .limit(k)
    )


def top_customers_sql(k: int = 15) -> str:
    return f"""
SELECT c_custkey AS custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spent, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, custkey ASC LIMIT {k}
"""


# ---- event sessionization (gap > 30 min -> new session; lag window)
def sessionize_events(spark, sf_dir, gap_minutes: int = 30) -> DataFrame:
    return sessionize_df(_t(spark, sf_dir, "events"), gap_minutes)


def sessionize_df(ev: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The batch gap rule over any events frame (user_id, event_id, ts,
    value) — shared by the driver entry and the stream-parity tests."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer epoch microseconds on both engines (ts is TIMESTAMP_NTZ;
    # session tz is UTC so the NTZ->LTZ cast is the identity)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = with_flag.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # sum in integer cents: `value` is 2-decimal quantized, and summing
    # doubles lands exactly on .005 boundaries where Spark's and DuckDB's
    # different summation orders round apart (round-1 driver mismatch).
    # bigint cents sum identically everywhere; /100.0 is one exact-rounded
    # IEEE division of the same integer on both engines.
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / F.lit(100.0)).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


def sessionize_events_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_minutes * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  -- CAST: DuckDB's windowed sum returns HUGEINT, which pandas widens to
  -- float64 — the driver's value-hash then sees 1.0 vs Spark's int64 1.
  SELECT user_id, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS session_value
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


# ---- JSON extraction + filter + agg (events.props is a JSON string)
def events_json_agg(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("event_type").isin("click", "purchase", "error"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_AGG_SQL = """
SELECT event_type, count(*) AS cnt,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       round(sum(value), 2) AS total_value
FROM events
WHERE event_type IN ('click', 'purchase', 'error')
GROUP BY event_type ORDER BY event_type
"""


# ---- distinct counting: exact (oracle-checkable) + approx (engine-only)
def distinct_users_daily(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("users"), F.count(F.lit(1)).alias("events"))
        .orderBy("day")
    )


DISTINCT_USERS_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS users,
       count(*) AS events
FROM events GROUP BY day ORDER BY day
"""


def approx_distinct_users(spark, sf_dir) -> DataFrame:
    """A3: HLL approx distinct, restructured to be oracle-checkable: the
    approximate value itself is engine-defined, so the driver-compared
    columns are the EXACT count plus a BUCKETED relative-error bound.
    rsd=0.01 puts the observed error well under 2%, so the 5% bucket has
    wide slack — and if Spark's HLL ever drifts past it, the row goes red
    showing 10 (or 100) instead of an undiagnosable boolean flip."""
    ev = _t(spark, sf_dir, "events")
    rel = F.abs(
        F.approx_count_distinct("user_id", 0.01) - F.countDistinct("user_id")
    ) / F.countDistinct("user_id")
    return ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.when(rel <= 0.05, F.lit(5))
        .when(rel <= 0.10, F.lit(10))
        .otherwise(F.lit(100))
        .alias("rel_err_le_pct"),
    )


APPROX_DISTINCT_USERS_SQL = """
SELECT count(DISTINCT user_id) AS exact_users, 5 AS rel_err_le_pct FROM events
"""


# ---- dedup-keep-best (D1: order-preserving first-wins after score sort)
def orders_latest_per_customer(spark, sf_dir) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )


ORDERS_LATEST_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) t
WHERE rn = 1 ORDER BY o_custkey
"""
