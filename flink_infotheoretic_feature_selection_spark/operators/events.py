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
]


def parse_props(events: DataFrame) -> DataFrame:
    """events + ``k`` extracted from the JSON props payload (int, null on
    malformed/missing).

    The cast is guarded by the SAME integer-text regexp the DuckDB oracle
    uses (both trim first, so ``" 5"`` parses as 5 on both engines while
    ``"3.7"`` or ``"+5"`` is NULL on both by construction) — engine-
    native string→int cast quirks (Spark's lenient truncating cast,
    DuckDB's rounding TRY_CAST) can never diverge.  The digit count is
    bounded to 18 so the guarded text always fits the BIGINT both
    engines cast to — an unbounded ``[0-9]+`` would let an overflowing
    payload return NULL from Spark's non-ANSI cast while DuckDB's CAST
    raises, aborting the oracle.  Still a narrow codegen expression
    fused into the scan: get_json_object + rlike + cast, no UDF.
    """
    from pyspark.sql import functions as F

    raw = F.trim(F.get_json_object("props", "$.k"))
    return events.withColumn(
        "k", F.when(raw.rlike("^-?[0-9]{1,18}$"), raw.cast("bigint"))
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
             CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^-?[0-9]{1,18}$')
                  THEN CAST(trim(json_extract_string(props, '$.k')) AS BIGINT) END AS k
      FROM events)
GROUP BY event_type
"""
