"""Join strategies for scale: broadcast, salting, bucketing.

The reference's only join is a hand-rolled broadcast (SURVEY.md §2.4 J1).
At 100 TB the other two standard shapes matter just as much, so the
engine ships them as utilities with plan-level tests:

- :func:`broadcast_dim_join` — pin the small side to a broadcast hash
  join (dimension tables, probability tables, split arrays).
- :func:`salted_join` — split a skewed join key into ``n_salts``
  sub-keys: the big side gets a deterministic salt, the small side is
  replicated across all salts.  Turns one straggler task into
  ``n_salts`` even ones.  (AQE's skew-join handles moderate skew on its
  own; salting is for the pathological keys AQE can't split, e.g. a
  single null-like key holding >50% of rows.)
- :func:`write_bucketed` / :func:`read_bucketed` — persist both sides
  bucketed by the join key so repeated joins are co-located:
  zero-shuffle sort-merge joins across jobs, the batch analogue of
  co-partitioned state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["broadcast_dim_join", "salted_join", "write_bucketed", "read_bucketed"]


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Fact ⋈ broadcast(dim) — never lets the dimension side shuffle."""
    return fact.join(F.broadcast(dim), on, how)


_SALTED_JOIN_TYPES = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed[on]`` has pathological hot keys.

    The skewed side gets ``salt = monotonically_increasing_id() %
    n_salts``; ``other`` is exploded ``n_salts``× so every (key, salt)
    bucket finds its match.  The hot key's rows now spread over
    ``n_salts`` tasks.  The salt must be content-INDEPENDENT: a content
    hash (the previous implementation) assigns fully-duplicate hot-key
    rows — the common case after projecting to the join key plus a few
    low-cardinality columns — one identical salt, reproducing the
    exact straggler salting exists to break.  The id is partition-and-
    position derived, so the spread is deterministic for a fixed input
    partitioning (like every Spark op that depends on physical row
    placement), not content-derived.

    Only join types that preserve the ``other`` side's row multiplicity
    are allowed (inner/left/left_semi/left_anti): under right/full joins
    the replicated ``other`` rows would emit each unmatched row
    ``n_salts`` times, so those types raise.
    """
    if how.lower().replace("_", "") not in {t.replace("_", "") for t in _SALTED_JOIN_TYPES}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "replicating the non-skewed side breaks right/full multiplicity"
        )
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("__salt")
    left = skewed.select("*", salt)
    right = other.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16, path: str | None = None
) -> None:
    """Persist bucketed-by-key: later joins on ``key`` between tables
    bucketed the same way need no shuffle (co-located partitions)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
