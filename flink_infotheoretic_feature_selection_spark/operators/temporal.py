"""Temporal join operators: as-of join, bucketed range join, hypertable
rollup.

These are the prompt-level "custom operators Spark lacks" — ABSENT from
the reference (SURVEY.md §2.8, extension surface), standard in
time-series engines (kdb+ ``aj``, TimescaleDB continuous aggregates,
DuckDB ``ASOF JOIN``), and re-expressed here in the shapes that survive
100 TB:

- :func:`asof_join` — NOT a join at all on the Spark side: both inputs
  are interleaved by ``(key, ts)`` into ONE window pass
  (``last(..., ignorenulls)`` over a running frame).  A single shuffle
  on the key, zero join, zero state beyond the window frame — the
  merge-interleave formulation every production as-of implementation
  uses, and the only one that doesn't degenerate when one side is much
  denser than the other.
- :func:`range_join` — point-in-interval join WITHOUT an equi-key.  The
  naive plan is a cross product; the scale shape buckets time at the
  maximum interval width, explodes each interval onto the ≤2 buckets it
  covers, and equi-joins probe rows on their single floor bucket, then
  refines with the exact predicate.  Every probe row matches a
  candidate interval in exactly one bucket (its own), so no dedup pass
  is needed.  Shuffle volume = rows, not rows × intervals.
- :func:`hypertable_rollup` — multi-granularity time rollup (hour AND
  day grains, TimescaleDB continuous-aggregate style) in ONE scan via
  GROUPING SETS: the Expand happens map-side, the shuffle carries only
  (bucket, event_type) cells.

Hash-stability contract (driver gate, round-3 lesson): no emitted value
is ever a cross-engine float aggregate.  Sums of the double ``value``
column are carried as exact integer cents (``CAST(round(value*100) AS
BIGINT)`` — the generator emits 2-decimal values, so ×100 never lands on
a .5 tie and both engines round identically); raw doubles only ever pass
through unchanged (bit-identical from the same parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "asof_join_query",
    "ASOF_JOIN_ORACLE",
    "asof_join_forward_query",
    "ASOF_JOIN_FORWARD_ORACLE",
    "range_join",
    "range_join_query",
    "RANGE_JOIN_ORACLE",
    "hypertable_rollup",
    "HYPERTABLE_ROLLUP_ORACLE",
]


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------
def asof_join(
    left: DataFrame,
    ref: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    ref_cols: tuple[str, ...] = ("ref_value",),
    ref_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every ``left`` row, attach the latest ``ref`` row with
    ``ref.ts <= left.ts`` for the same ``key`` (inclusive, i.e. kdb+
    ``aj`` / DuckDB ``ASOF`` with ``>=`` semantics); NULLs if none.

    ``direction="forward"`` flips the match to the EARLIEST ref with
    ``ref.ts >= left.ts`` (DuckDB ``ASOF`` with ``<=``) — same plan,
    the window just traverses time DESCENDING, so the running ``last()``
    holds the nearest future ref instead of the nearest past one.

    ``ref`` must be unique per ``(key, ts)`` — OR pass ``ref_tiebreak``,
    a ref column whose MAXIMUM picks the winning row among equal
    ``(key, ts)`` duplicates.  The tiebreak folds into the window SORT
    ORDER (duplicates sort ascending, ``last()`` keeps the max) instead
    of a pre-aggregation, which would cost a second exchange on
    ``(key, ts)`` before the window's exchange on ``key``.

    Plan shape: union-interleave + one running window.  ``ref`` rows
    sort BEFORE ``left`` rows at equal ``ts`` (side 0 < 1) so an exact
    tie matches, per the inclusive contract.  ONE exchange on ``key``
    total (plan-pinned); no join operator in the plan at all — at
    100 TB this is one data-sized shuffle and a linear in-partition
    pass, with no build-side memory and no skew amplification (a hot
    key costs one fat sorted partition, not a quadratic probe).
    """
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.window import Window

    left_cols = [c for c in left.columns if c != key and c != ts]
    tb_type = ref.schema[ref_tiebreak].dataType if ref_tiebreak else None
    # the whole ref row travels as ONE struct: per-column
    # last(ignorenulls) would mix columns from DIFFERENT ref rows when a
    # ref column is NULL (a frankenrow the ASOF contract forbids); the
    # struct itself is non-null for every ref row even when its members
    # are null, so last() carries the latest ref row atomically
    ref_struct_type = StructType(
        [StructField("ref_ts", ref.schema[ts].dataType)]
        + [StructField(c, ref.schema[c].dataType) for c in ref_cols]
    )
    ref_side = ref.select(
        key,
        ts,
        F.lit(0).alias("__side"),
        *([F.col(ref_tiebreak).alias("__tb")] if ref_tiebreak else []),
        F.struct(
            F.col(ts).alias("ref_ts"), *[F.col(c) for c in ref_cols]
        ).alias("__ref"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    left_side = left.select(
        key,
        ts,
        F.lit(1).alias("__side"),
        *([F.lit(None).cast(tb_type).alias("__tb")] if ref_tiebreak else []),
        F.lit(None).cast(ref_struct_type).alias("__ref"),
        *[F.col(c) for c in left_cols],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # among equal (key, ts) ref duplicates, ascending tiebreak puts the
    # max LAST so the running last() picks it; left rows' NULL tiebreak
    # is irrelevant because __side already orders them after every ref.
    # forward: ts DESCENDS so the running last() holds the smallest
    # future ts; equal-ts refs still precede left rows (side asc).
    ts_order = F.col(ts).desc() if direction == "forward" else F.col(ts).asc()
    order = [ts_order, F.col("__side")] + ([F.col("__tb")] if ref_tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__ref", ignorenulls=True).over(w)
    return (
        ref_side.unionByName(left_side)
        .select(
            key,
            ts,
            "__side",
            *left_cols,
            carried.getField("ref_ts").alias("ref_ts"),
            *[carried.getField(c).alias(c) for c in ref_cols],
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: each ``click`` event gets the latest prior-or-equal
    ``error`` event's (ts, value) for the same user."""
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    ev = load_events(spark, sf_dir)
    # duplicate (user_id, ts) refs resolve to the max-event_id row — as
    # a window-order tiebreak, NOT a pre-aggregation (saves a second
    # exchange; the oracle states the same rule as max_by)
    ref = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.col("value").alias("ref_value")
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(left, ref, ref_tiebreak="event_id")
    return out.select("event_id", "ts", "user_id", "value", "ref_ts", "ref_value")


ASOF_JOIN_ORACLE = """
WITH ref AS (
  SELECT user_id, ts, max_by(value, event_id) AS ref_value
  FROM events WHERE event_type = 'error'
  GROUP BY user_id, ts
),
l AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click'
)
SELECT l.event_id, l.ts, l.user_id, l.value, r.ts AS ref_ts, r.ref_value
FROM l ASOF LEFT JOIN ref r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# Bucketed range join
# ---------------------------------------------------------------------------
RANGE_WINDOW_SEC = 120  # interval length == bucket width


def range_join(
    intervals: DataFrame,
    probe: DataFrame,
    bucket_width_us: int,
    ts: str = "ts",
) -> DataFrame:
    """Rows of ``probe`` matched to every ``intervals`` row whose
    ``[start, end)`` contains ``probe.ts`` — no equi-key required.

    ``bucket_width_us`` must be ≥ the longest interval so each interval
    spans at most 2 buckets.  The interval side explodes onto its
    covered buckets (≤2 rows each); the probe side computes its single
    floor bucket — so each true match is produced exactly once and no
    distinct/dedup pass exists in the plan.  Shuffle = one exchange of
    both sides on ``bucket``; at 100 TB the probe side shuffles once at
    data size and the interval side at ≤2× interval count.  (A
    pathological hot bucket — e.g. all intervals in one hour — is the
    same skew class as any hot join key; `joins.salted_join` composes.)
    """
    # integer `div`, never `/`: float division of epoch-micros can land
    # one ulp below an exact bucket boundary and truncate into the wrong
    # bucket (the round-1 nanos lesson, NOTES.md)
    w = int(bucket_width_us)
    # guard empty/inverted intervals BEFORE the explode: Spark's
    # sequence(a, b) with b < a runs DESCENDING (default step -1), so one
    # corrupted end<=start row would fan out into thousands of spurious
    # bucket rows (filtered later, but after shuffling them)
    intervals = intervals.filter(F.col("end") > F.col("start"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(start) div {w}"),
                F.expr(f"(unix_micros(`end`) - 1) div {w}"),
            )
        ),
    )
    pb = probe.withColumn("__bucket", F.expr(f"unix_micros({ts}) div {w}"))
    return (
        pb.join(iv, "__bucket")
        .filter((F.col(ts) >= F.col("start")) & (F.col(ts) < F.col("end")))
        .drop("__bucket")
    )


def range_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: per error event, the count + exact-cents sum of ALL
    ``view`` events (any user) inside ``[error.ts, error.ts + 2 min)``.
    """
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    ev = load_events(spark, sf_dir)
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr(f"INTERVAL {RANGE_WINDOW_SEC} SECONDS")).alias("end"),
    )
    probe = ev.filter(F.col("event_type") == "view").select("ts", "value")
    matched = range_join(intervals, probe, RANGE_WINDOW_SEC * 1_000_000)
    return matched.groupBy("interval_id").agg(
        F.count("*").alias("n_hits"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
    )


RANGE_JOIN_ORACLE = f"""
WITH intervals AS (
  SELECT event_id AS interval_id, ts AS start,
         ts + INTERVAL {RANGE_WINDOW_SEC} SECOND AS "end"
  FROM events WHERE event_type = 'error'
)
SELECT i.interval_id,
       count(*) AS n_hits,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM intervals i
JOIN events e
  ON e.event_type = 'view' AND e.ts >= i.start AND e.ts < i."end"
GROUP BY i.interval_id
"""


# ---------------------------------------------------------------------------
# Hypertable rollup (multi-granularity continuous aggregate)
# ---------------------------------------------------------------------------
def _hypertable_sql() -> str:
    # identical text on both engines: date_trunc, GROUPING SETS and
    # grouping() are ANSI and behave the same in Spark SQL and DuckDB
    return """
SELECT CASE WHEN grouping(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
       CASE WHEN grouping(h) = 0 THEN h ELSE d END AS bucket_ts,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (SELECT date_trunc('hour', ts) AS h,
             date_trunc('day', ts) AS d,
             event_type, value
      FROM events)
GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
"""


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour AND day rollups of the events stream in one scan.

    The GROUPING SETS Expand is map-side (each input row emits one
    hour-cell and one day-cell BEFORE the exchange, partial-aggregated
    in place), so the single shuffle carries only distinct
    (grain, bucket, event_type) cells — at 100 TB that is bounded by
    buckets × types, independent of row count.  This is the batch
    equivalent of a TimescaleDB continuous aggregate / Druid rollup.
    """
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_hypertable_sql())


# INDEPENDENTLY-FORMULATED oracle (round-5 review fix: it used to be the
# byte-identical GROUPING SETS text as the engine query).  The naive
# form the Expand-based rollup replaces: one aggregation per grain,
# unioned — two scans the engine does in one, but an independent check
# of the grouping()/CASE plumbing.  round()/cents arithmetic matches the
# engine query text, which the replica already proved cross-engine-stable.
HYPERTABLE_ROLLUP_ORACLE = """
SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket_ts, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day' AS grain, date_trunc('day', ts) AS bucket_ts, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 2, 3
"""


def asof_join_forward_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: each ``click`` event gets the EARLIEST at-or-after
    ``error`` event's (ts, value) for the same user — time-to-next-error
    attribution, the forward twin of :func:`asof_join_query`."""
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    ev = load_events(spark, sf_dir)
    ref = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.col("value").alias("ref_value")
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(left, ref, ref_tiebreak="event_id", direction="forward")
    return out.select("event_id", "ts", "user_id", "value", "ref_ts", "ref_value")


ASOF_JOIN_FORWARD_ORACLE = """
WITH ref AS (
  SELECT user_id, ts, max_by(value, event_id) AS ref_value
  FROM events WHERE event_type = 'error'
  GROUP BY user_id, ts
),
l AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click'
)
SELECT l.event_id, l.ts, l.user_id, l.value, r.ts AS ref_ts, r.ref_value
FROM l ASOF LEFT JOIN ref r ON l.user_id = r.user_id AND l.ts <= r.ts
"""
