"""Event-payload (JSON) operators.

The events table carries a JSON ``props`` column; these operators parse
it with built-in JSON expressions (``get_json_object`` — JVM-side,
codegen) rather than a UDF, so payload extraction fuses into the scan.
JSON functions are ABSENT from the reference (SURVEY §2.8) — extension
surface.

Scale shape: parse is a narrow per-row expression; the aggregate
shuffles only (event_type) group cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "parse_props",
    "events_props_agg",
    "EVENTS_PROPS_AGG_ORACLE",
    "funnel_conversion",
    "FUNNEL_CONVERSION_ORACLE",
]


def parse_props(events: DataFrame) -> DataFrame:
    """events + ``k`` extracted from the JSON props payload (int, null on
    malformed/missing).

    STRICTNESS CONTRACT: ``k`` is extracted only from payloads that are
    strict (RFC 8259) JSON.  Spark's ``get_json_object`` leniently
    parses single-quoted JSON (``{'k': 7}`` → 7) where DuckDB's
    ``json_valid`` is false, so a lenient Spark side diverges from the
    strict oracle (found by the r6 advisor — the prior guard comment
    claimed both sides NULL such payloads; empirically false).  The
    validity probe is ``from_json`` with ``allowSingleQuotes=false``
    plus a ``columnNameOfCorruptRecord`` column: the corrupt column is
    non-null exactly when strict parsing failed, mirroring
    ``json_valid``'s verdict (verified: single quotes, unquoted keys,
    leading-zero numbers, bare scalars and junk all flag corrupt; a
    valid object missing ``k`` does not).  Payloads that are valid JSON
    but not objects ('5', '[1,2]') flag corrupt on Spark while
    ``json_valid`` is true on DuckDB — no divergence, because ``$.k``
    extracts NULL from them on both engines either way.

    The cast is guarded by the SAME integer-text regexp the DuckDB oracle
    uses (both trim first, so ``" 5"`` parses as 5 on both engines while
    ``"3.7"`` or ``"+5"`` is NULL on both by construction) — engine-
    native string→int cast quirks (Spark's lenient truncating cast,
    DuckDB's rounding TRY_CAST) can never diverge.  The digit count is
    bounded to 18 so the guarded text always fits the BIGINT both
    engines cast to — an unbounded ``[0-9]+`` would let an overflowing
    payload return NULL from Spark's non-ANSI cast while DuckDB's CAST
    raises, aborting the oracle.  Still narrow JVM-side per-row
    expressions fused into the scan: from_json + get_json_object +
    rlike + cast, no Python UDF.
    """
    from pyspark.sql import functions as F

    strict = F.from_json(
        "props",
        "k string, _strict_corrupt string",
        {
            "allowSingleQuotes": "false",
            "columnNameOfCorruptRecord": "_strict_corrupt",
        },
    )
    raw = F.trim(F.get_json_object("props", "$.k"))
    return events.withColumn(
        "k",
        F.when(
            strict["_strict_corrupt"].isNull() & raw.rlike("^-?[0-9]{1,18}$"),
            raw.cast("bigint"),
        ),
    )


def events_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type stats over the JSON payload field ``k``."""
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    ev = parse_props(load_events(spark, sf_dir))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_bad"),
    )


# The inner CASE mirrors the guard in parse_props exactly (NULL for any
# non-integer-text payload on BOTH engines).  sum(k) is CAST to BIGINT
# because DuckDB types sum(integer) as HUGEINT — arrow decimal128(38,0),
# which a bit-level driver hash serializes differently from Spark's
# int64 even when the values are equal (the round-3 corpus_rollup /
# events_props_agg hash-fail root cause).
EVENTS_PROPS_AGG_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       count(CASE WHEN k IS NULL THEN 1 END) AS n_bad
FROM (SELECT event_type,
             CASE WHEN regexp_matches(trim(kx), '^-?[0-9]{1,18}$')
                  THEN CAST(trim(kx) AS BIGINT) END AS k
      FROM (SELECT event_type,
                   CASE WHEN json_valid(props)
                        THEN json_extract_string(props, '$.k') END AS kx
            FROM events))
GROUP BY event_type
"""
# kx is guarded by json_valid because DuckDB's json_extract_string
# RAISES on malformed JSON where Spark's get_json_object returns NULL —
# an oracle abort, not a value divergence (found by the random-events
# cross-engine sweep; the r4 fix covered only the int64-overflow
# payload).  The Spark side mirrors this strictness with its own
# strict-JSON probe (see parse_props's STRICTNESS CONTRACT): without
# it, single-quoted payloads parse leniently on Spark only and k
# diverges.


# ---------------------------------------------------------------------------
# Funnel (ordered-sequence) conversion
# ---------------------------------------------------------------------------
# steps are fixed (view -> click -> purchase): the running-min chain
# hard-codes one CTE level per step, so the sequence is not a parameter
FUNNEL_HORIZON = "INTERVAL 1 DAY"


def _funnel_sql() -> str:
    """Users reaching each funnel stage IN ORDER within the horizon.

    The naive formulation is one self-join per step (events scanned
    len(steps) times, len(steps) shuffles).  This is the one-partitioning
    form: running conditional minimums over ``(user_id ORDER BY ts)``
    compute "earliest qualified step-k time so far" per row — step k+1
    qualifies only where step k's running min is already set, so order
    is enforced positionally, not by joins.  Two stacked window CTEs
    share ONE exchange+sort (same window spec); the final agg is
    per-user cells.  Identical text on both engines.

    The per-step unpivot references the aggregate chain ONCE (scalar
    totals × a constant step dimension): Spark INLINES CTEs, so the
    natural ``UNION ALL of three SELECT ... FROM u`` re-executed the
    whole scan+window tree per step (3 scans, 3 shuffles — caught by
    the plan test; the round-1 minhash CTE lesson again).

    Horizon: click and purchase must land within ``FUNNEL_HORIZON`` of
    the user's earliest view (the anchoring semantics product funnels
    use).  Ties order by (ts, event_id) so same-timestamp events
    sequence deterministically; a click at the exact view timestamp
    counts only if it sorts after the view (>= via running-min
    inclusion of the current row).
    """
    h = FUNNEL_HORIZON
    return f"""
    WITH seq AS (
      SELECT user_id, ts, event_type, event_id,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t1r
      FROM events),
    seq2 AS (
      SELECT user_id, ts, event_type, t1r,
             min(CASE WHEN event_type = 'click' AND t1r IS NOT NULL
                           AND ts <= t1r + {h} THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t2r
      FROM seq),
    u AS (
      SELECT user_id,
             max(CASE WHEN t1r IS NOT NULL THEN 1 ELSE 0 END) AS s1,
             max(CASE WHEN t2r IS NOT NULL THEN 1 ELSE 0 END) AS s2,
             max(CASE WHEN event_type = 'purchase' AND t2r IS NOT NULL
                           AND ts <= t1r + {h} THEN 1 ELSE 0 END) AS s3
      FROM seq2 GROUP BY user_id),
    totals AS (
      SELECT CAST(sum(s1) AS BIGINT) AS n1,
             CAST(sum(s2) AS BIGINT) AS n2,
             CAST(sum(s3) AS BIGINT) AS n3
      FROM u)
    SELECT step,
           CASE step WHEN 'view' THEN n1 WHEN 'click' THEN n2 ELSE n3 END AS n_users
    FROM totals
    CROSS JOIN (SELECT 'view' AS step
                UNION ALL SELECT 'click'
                UNION ALL SELECT 'purchase') steps
    """


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion counts (ordered, 1-day horizon)."""
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_funnel_sql())


# INDEPENDENTLY-FORMULATED oracle (round-5 review fix: the oracle used to
# be the byte-identical SQL text as the engine query, so the gate only
# proved Spark and DuckDB agree on one statement).  This is the naive
# self-join/EXISTS form the windowed engine query optimizes away:
#
# - the windowed running-min t1r at any row equals the ts of the user's
#   order-first view (the (ts, event_id)-minimal view precedes every
#   other view, so "some view precedes this row" == "THE first view
#   precedes this row", and the min of preceding view ts is its ts);
# - a click qualifies iff that first view strictly precedes it in
#   (ts, event_id) order within the horizon;  t2r is non-null at a row
#   iff the ORDER-FIRST qualified click precedes it (total order);
# - a purchase converts iff the first qualified click strictly precedes
#   it and it lands within the horizon of the first view.
FUNNEL_CONVERSION_ORACLE = f"""
WITH v1 AS (
  SELECT user_id, ts AS t1s, event_id AS t1id
  FROM events WHERE event_type = 'view'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
),
qc1 AS (
  SELECT c.user_id, c.ts AS t2s, c.event_id AS t2id
  FROM events c JOIN v1 ON c.user_id = v1.user_id
  WHERE c.event_type = 'click'
    AND (c.ts > v1.t1s OR (c.ts = v1.t1s AND c.event_id > v1.t1id))
    AND c.ts <= v1.t1s + {FUNNEL_HORIZON}
  QUALIFY row_number() OVER (PARTITION BY c.user_id ORDER BY c.ts, c.event_id) = 1
),
qp AS (
  SELECT DISTINCT p.user_id
  FROM events p
  JOIN qc1 ON p.user_id = qc1.user_id
  JOIN v1 ON p.user_id = v1.user_id
  WHERE p.event_type = 'purchase'
    AND (p.ts > qc1.t2s OR (p.ts = qc1.t2s AND p.event_id > qc1.t2id))
    AND p.ts <= v1.t1s + {FUNNEL_HORIZON}
),
totals AS (
  SELECT (SELECT count(*) FROM v1) AS n1,
         (SELECT count(*) FROM qc1) AS n2,
         (SELECT count(*) FROM qp) AS n3
)
SELECT step,
       CASE step WHEN 'view' THEN n1 WHEN 'click' THEN n2 ELSE n3 END AS n_users
FROM totals
CROSS JOIN (SELECT 'view' AS step
            UNION ALL SELECT 'click'
            UNION ALL SELECT 'purchase') steps
"""
