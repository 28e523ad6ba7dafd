"""Time-series catalog queries over ``events`` (hypertable-style
bucket / gap-fill / rollup family; SURVEY.md §2 extension surface).

All measures are summed as DECIMAL and cast to double only at the
output boundary — float sums are order-dependent across partitionings,
decimal sums are exact in both engines (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query
from .operators.timeseries import dense_grid, forward_fill, time_bucket
from .session import prep
from .sources.testdata import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return load_table(spark, sf_dir, "events")


@query(
    "ts_gapfill_ffill",
    oracle="""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_ts, value
      FROM events
      WHERE user_id < 10 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    ), b AS (
      SELECT user_id, bucket_ts,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(12,2))) AS s
      FROM ev GROUP BY 1, 2
    ), grid AS (
      SELECT u.user_id, g.ts AS bucket_ts
      FROM (SELECT DISTINCT user_id FROM ev) u,
           (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                          TIMESTAMP '2024-01-07 23:00:00',
                                          INTERVAL 1 HOUR)) AS ts) g
    )
    SELECT g.user_id, g.bucket_ts,
           CAST(COALESCE(b.n_events, 0) AS BIGINT) AS n_events,
           CAST(b.s AS DOUBLE) AS bucket_sum,
           CAST(last_value(b.s IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.bucket_ts
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS filled_sum
    FROM grid g LEFT JOIN b USING (user_id, bucket_ts)
    ORDER BY user_id, bucket_ts
    """,
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled per-user series with forward fill: bucket
    aggregate → dense (user × hour) grid → left join → carry the last
    observed sum through empty buckets (operators/timeseries.py). The
    grid is built from one exploded hour sequence × the user dimension
    (intentional tiny cross join); the fill is one window per user —
    partition-local, parallel across users. Decimal sums keep the
    filled values engine-exact.
    """
    ev = _events(spark, sf_dir).filter(
        (F.col("user_id") < 10)
        & (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    )
    b = ev.groupBy(
        "user_id", time_bucket("ts", "1 hour").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
    )
    grid = dense_grid(
        ev.select("user_id").distinct(),
        spark,
        "2024-01-01",
        "2024-01-08",
        "1 HOUR",
    )
    joined = grid.join(b, ["user_id", "bucket_ts"], "left")
    filled = forward_fill(joined, "user_id", "bucket_ts", ["s"])
    return (
        filled.select(
            "user_id",
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.col("s").cast("double").alias("bucket_sum"),
            F.col("s_ffill").cast("double").alias("filled_sum"),
        )
        .orderBy("user_id", "bucket_ts")
    )


@query(
    "ts_hierarchical_rollup",
    oracle="""
    SELECT event_type,
           date_trunc('day', ts) AS day_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ts_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup reaggregation: the daily rollup is computed
    FROM the hourly rollup's partials (sum of sums, sum of counts), not
    from raw events — the continuous-aggregate cascade where each
    coarser level touches rows proportional to the finer rollup. The
    oracle aggregates raw events directly, pinning the equivalence the
    cascade must preserve.
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", time_bucket("ts", "1 hour").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
    )
    daily = (
        hourly.groupBy(
            "event_type", F.date_trunc("day", "hour_ts").alias("day_ts")
        )
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
        )
    )
    return daily.orderBy("event_type", "day_ts")
