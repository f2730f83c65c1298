"""Window-function coverage (SURVEY.md §2.14).

ECL predates SQL windows; its idioms (RANK/RANKED, ITERATE lag, DEDUP BEST
top-k, COUNTER numbering) all lower to Window.partitionBy().orderBy() — the
Spark engine exposes windows directly as a strict superset.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpcc_platform_spark.queries.registry import query, tables
from hpcc_platform_spark.sources.inline import inline_dataset


@query(
    "window_rank",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(rank()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS drnk,
           CAST(row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS rn
    FROM supplier
    """,
    category="window",
)
def window_rank(spark, sf_dir):
    """RANK/RANKED (no_rank/no_ranked, ecl/hql/hqlexpr.hpp:407-408) —
    ranking within nation by account balance."""
    (supp,) = tables(spark, sf_dir, "supplier")
    by_bal = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    by_bal_tb = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(by_bal).cast("int").alias("rnk"),
        F.dense_rank().over(by_bal).cast("int").alias("drnk"),
        F.row_number().over(by_bal_tb).cast("int").alias("rn"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 4) AS delta_prev
    FROM orders
    """,
    category="window",
)
def window_lag_delta(spark, sf_dir):
    """ITERATE's previous-row access (TAKiterate :895) as LAG: per-customer
    spend delta between consecutive orders."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 4).alias(
            "delta_prev"
        ),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
    FROM events
    """,
    category="window",
)
def window_moving_avg(spark, sf_dir):
    """Moving frame aggregate — rowsBetween(-2, 0) 3-row moving average."""
    (events,) = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg3"),
    )


@query(
    "sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
    FROM gaps
    """,
    category="window",
)
def sessionize(spark, sf_dir):
    """Sessionization — the batch analogue of session windows: lag-gap >
    30 min starts a new session; cumulative sum numbers sessions per user.
    (The reference has no streaming/session construct at all — SURVEY §2.13;
    this is part of the Spark-side superset.)"""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        events.withColumn("new_session", new_s)
        .select(
            "user_id",
            "event_id",
            F.sum("new_session").over(run).cast("int").alias("session_id"),
        )
    )


_MAINT_WINDOWS = [
    ("w1", "2024-01-03 06:00:00", "2024-01-04 18:00:00"),
    ("w2", "2024-01-10 00:00:00", "2024-01-10 23:59:59"),
    ("w3", "2024-01-15 12:00:00", "2024-01-18 12:00:00"),
    ("w4", "2024-01-25 00:00:00", "2024-01-27 06:00:00"),
]


@query(
    "interval_bucket_join",
    oracle=f"""
    WITH win(win_id, w_start, w_end) AS (
      SELECT * FROM (VALUES {", ".join(f"('{w}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for w, s, e in _MAINT_WINDOWS)}) v
    )
    SELECT w.win_id, COUNT(*) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM win w JOIN events e ON e.ts >= w.w_start AND e.ts <= w.w_end
    GROUP BY w.win_id
    """,
    category="window",
)
def interval_bucket_join(spark, sf_dir):
    """Pure range/interval join WITHOUT an equality prefix (the general
    JFslidingmatch case, eclhelper.hpp:1729): naive form is a cartesian ×
    range filter — a non-starter at 100 TB. Scale shape used here: bucket
    time into days, explode each interval to its covered day-buckets, and
    equi-join on the bucket with the precise range predicate as the
    residual — candidate pairs are |events| × overlapping-buckets, never
    |events| × |intervals|. Skewed buckets split via AQE."""
    windows = inline_dataset(
        spark, _MAINT_WINDOWS, "win_id string, w_start_s string, w_end_s string"
    ).select(
        "win_id",
        F.col("w_start_s").cast("timestamp").alias("w_start"),
        F.col("w_end_s").cast("timestamp").alias("w_end"),
    )
    (events,) = tables(spark, sf_dir, "events")
    day = lambda c: F.to_date(c)  # noqa: E731 — day-granularity bucket
    win_buckets = windows.withColumn(
        "bucket", F.explode(F.sequence(day(F.col("w_start")), day(F.col("w_end"))))
    )
    ev = events.withColumn("bucket", day(F.col("ts")))
    joined = ev.join(F.broadcast(win_buckets), "bucket").where(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
    )
    return joined.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "timeseries_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 4) AS day_value
      FROM events WHERE user_id < 40 GROUP BY user_id, CAST(ts AS DATE)
    ), spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT s.user_id, CAST(g.day AS DATE) AS day
      FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day
      ) g
    )
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
           COALESCE(d.day_value, 0.0) AS day_value,
           CAST(d.day_value IS NULL AS BOOLEAN) AS filled
    FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    """,
    category="window",
)
def timeseries_gapfill(spark, sf_dir):
    """Time-series resample / gap fill: per-user daily totals with missing
    days zero-filled over each user's [min_day, max_day] span — the dense
    grid a downstream model expects. Scale shape: the grid is generated by
    exploding sequence(min, max) per user (rows ∝ span, distributed by
    user), then ONE left join back on (user, day) — never a driver loop,
    never a global calendar cross join."""
    (events,) = tables(spark, sf_dir, "events")
    daily = (
        events.where(F.col("user_id") < 40)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("day_value"))
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    out = grid.join(daily, ["user_id", "day"], "left")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
        F.col("day_value").isNull().alias("filled"),
    )


@query(
    "window_distribution_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(10) OVER w AS INT) AS decile,
           ROUND(percent_rank() OVER w, 4) AS pct_rank,
           ROUND(cume_dist() OVER w, 4) AS cdist
    FROM orders
    WHERE o_orderkey <= 30000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    category="window",
)
def window_distribution_ranks(spark, sf_dir):
    """Distribution ranks (superset of the reference's RANKED/DISTRIBUTION
    pair, :916): ntile deciles, percent_rank, cume_dist per priority
    class. Partitioned window — parallel across partitions, no global
    funnel; deterministic tie-break on the key."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return orders.where(F.col("o_orderkey") <= 30000).select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cdist"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, epoch_day,
           CAST(SUM(cnt_one) OVER (PARTITION BY o_custkey ORDER BY epoch_day
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS INT) AS n_orders_30d,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch_day
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS spend_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) / 86400 AS BIGINT) AS epoch_day,
             1 AS cnt_one
      FROM orders WHERE o_custkey <= 2000
    )
    """,
    category="window",
)
def window_range_frame(spark, sf_dir):
    """RANGE-frame windows (value-based, not row-based — the moving-window
    form ECL expresses with ITERATE+self-lookup): trailing-30-day order
    count and spend per customer. rangeBetween needs a single numeric sort
    key, so the date becomes epoch days; partitioned by customer —
    scale-parallel."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.where(F.col("o_custkey") <= 2000).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        (F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) / 86400)
        .cast("long")
        .alias("epoch_day"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-30, Window.currentRow)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "epoch_day",
        F.count(F.lit(1)).over(w).cast("int").alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("spend_30d"),
    )


@query(
    "window_hopping",
    oracle="""
    WITH e AS (
      -- floor, not CAST: DuckDB double->BIGINT casts ROUND, which shifts
      -- events with fractional seconds near a window boundary.
      SELECT event_type, value,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ep
      FROM events
    ),
    hopped AS (
      -- 10-min windows sliding every 5 min: each event lands in exactly
      -- ceil(600/300)=2 windows, whose starts are floor((ep-off)/600)*600+off
      -- for off in {0, 300} (Spark aligns window starts to slide multiples).
      -- CAST to naive TIMESTAMP: to_timestamp yields TIMESTAMPTZ, which
      -- pandas surfaces tz-aware and hash-mismatches Spark's naive value.
      SELECT CAST(to_timestamp((ep - off) // 600 * 600 + off) AS TIMESTAMP) AS window_start,
             event_type, value
      FROM e, UNNEST([0, 300]) AS t(off)
      WHERE (ep - off) >= 0
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           -- DECIMAL sum: exact and order-independent, so the rounded
           -- total can't flip on cross-engine summation order (double
           -- sums differ in the last ulp; with ~16k groups one lands on
           -- a round-half boundary).
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM hopped GROUP BY window_start, event_type
    """,
    category="window",
)
def window_hopping(spark, sf_dir):
    """Hopping (sliding) time windows — 10-minute windows every 5 minutes,
    so each event aggregates into two overlapping windows (the streaming
    dashboard shape; tumbling and session windows live in streaming/).
    Spark's F.window handles the fan-out natively; the oracle replays the
    window-start arithmetic (starts aligned to slide multiples)."""
    (ev,) = tables(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
