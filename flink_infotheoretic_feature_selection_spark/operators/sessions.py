"""Sessionization — gap-based event sessions per user.

Part of the extension surface (the reference is batch feature selection
only, SURVEY.md §2.8): a training-data pipeline over event logs needs
session assembly before per-session features can be extracted.

Batch semantics here exactly match Spark's streaming ``session_window``
merge rule so the two paths are interchangeable: an event belongs to the
current session iff ``ts < prev_ts + gap`` — i.e. a NEW session starts
when ``ts - prev_ts >= gap`` (strict ``>=``, see
``streaming/ops.py::sessionize_stream``).

Scale notes:
- one shuffle on ``user_id`` (window partition + reuse by the groupBy —
  Catalyst collapses the two into a single exchange since the grouping
  keys are a superset of the partition key);
- per-user state is a running flag + cumulative sum, streamed by the
  window operator in ts order — no per-user materialization;
- hot users (skew) bound the longest task but not memory; AQE skew
  handling cannot split an ORDER BY partition, which is inherent to
  order-dependent sessionization in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "duration_us",
    "sessionize",
    "sessionize_query",
    "sessionize_skew",
    "sessionize_skew_query",
    "SESSIONIZE_GAP",
    "SESSIONIZE_ORACLE",
]

_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
}


def duration_us(spec: str) -> int:
    """Parse a Spark-style interval string ("30 minutes", "1 day") to µs."""
    qty, unit = spec.strip().split()
    unit = unit.rstrip("s")
    if unit not in _UNIT_US:
        raise ValueError(f"unsupported duration unit: {spec!r}")
    return int(qty) * _UNIT_US[unit]


def sessionize(
    events: DataFrame,
    gap: str = "12 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    Output: ``(user_id, sess_seq, session_start_us, session_end_us,
    n_events, sum_value)``.  Timestamps are emitted as epoch microseconds
    (long) so results hash identically across engines.
    """
    gap_ = duration_us(gap)
    w = Window.partitionBy(user_col).orderBy("ts_us")
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(value_col).alias("value"),
        )
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") >= gap_),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_seq", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


SESSIONIZE_GAP = "12 hours"


def sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``queries()`` wrapper: sessionize the events table."""
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    return sessionize(load_events(spark, sf_dir), gap=SESSIONIZE_GAP)


SESSIONIZE_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
    ),
    flagged AS (
      SELECT user_id, ts_us, value,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w >= {duration_us(SESSIONIZE_GAP)}
                  THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    numbered AS (
      SELECT user_id, ts_us, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us) AS sess_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(sess_seq AS BIGINT) AS sess_seq,
           min(ts_us) AS session_start_us,
           max(ts_us) AS session_end_us,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM numbered GROUP BY user_id, sess_seq
"""


def sessionize_skew(
    events: DataFrame,
    gap: str = "12 hours",
    bucket: str = "30 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Skew-tolerant sessionize — identical output to :func:`sessionize`.

    Plain sessionization serializes each user's full history through one
    window partition; a hot user bounds the job.  Here:

    - **phase 1** sessionizes within ``(user, time-bucket)`` partitions —
      a hot user's history splits across ``range/bucket`` tasks;
    - **phase 2** stitches sub-sessions whose boundary gap is < ``gap``
      via ``applyInPandas`` per user over sub-session SUMMARIES — rows
      are O(sessions + buckets) per user, never O(events).

    The merge rule is exactly the single-pass rule: across a bucket
    boundary the previous event is the prior sub-session's last event,
    so stitch iff ``next.start − prev.end < gap``.
    """
    import pandas as pd

    gap_ = duration_us(gap)
    bucket_ = duration_us(bucket)
    w = Window.partitionBy(user_col, "bkt").orderBy("ts_us")
    sub = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(value_col).alias("value"),
        )
        .withColumn("bkt", F.expr(f"ts_us div {bucket_}"))
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_sub",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") >= gap_),
                1,
            ).otherwise(0),
        )
        .withColumn("sub_seq", F.sum("new_sub").over(w))
        .groupBy("user_id", "bkt", "sub_seq")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )

    out_schema = (
        "user_id long, sess_seq long, session_start_us long, "
        "session_end_us long, n_events long, sum_value double"
    )

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("start_us").reset_index(drop=True)
        rows = []
        for r in pdf.itertuples(index=False):
            if rows and r.start_us - rows[-1][2] < gap_:
                prev = rows[-1]
                rows[-1] = [
                    prev[0],
                    prev[1],
                    max(prev[2], r.end_us),
                    prev[3] + r.n_events,
                    prev[4] + r.sum_value,
                ]
            else:
                rows.append(
                    [len(rows) + 1, r.start_us, r.end_us, r.n_events, r.sum_value]
                )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])] * len(rows),
                "sess_seq": [r[0] for r in rows],
                "session_start_us": [r[1] for r in rows],
                "session_end_us": [r[2] for r in rows],
                "n_events": [r[3] for r in rows],
                # RAW sums here; rounding happens Spark-side below so
                # the half-up tie-breaking matches sessionize/the oracle
                # exactly (Python round() is banker's half-EVEN: a sum
                # landing on a representable 4-decimal tie like 0.03125
                # would emit 0.0312 vs Spark/DuckDB's 0.0313).
                "sum_value": [r[4] for r in rows],
            }
        )

    return sub.groupBy("user_id").applyInPandas(stitch, out_schema).withColumn(
        "sum_value", F.round("sum_value", 4)
    )


def sessionize_skew_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``queries()`` wrapper — shares ``SESSIONIZE_ORACLE`` (same output)."""
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    return sessionize_skew(load_events(spark, sf_dir), gap=SESSIONIZE_GAP)
