"""EqualFrequencyDiscretizer — sample→stride quantile splits + bucketize.

Faithful re-expression of the reference's ``FrequencyDiscretizer.scala``:

- sampling: ``fraction = min(max(numBins², 10000)/N, 1)`` with a seeded
  Bernoulli sample collected to the driver (``FreqDisc:167-179``) — the
  sample is bounded (~10k rows) regardless of data scale, so the driver
  collect is safe at 100 TB.
- split candidates: per-feature value-count map sorted by value, then the
  stride walk that emits the previous value whenever it is the closest to
  the running target count (``FreqDisc:185-225``).
- split finishing: strip/append ±∞ sentinels; degenerate default
  ``[−∞, 0, +∞]`` (``FreqDisc:231-254``); strict monotonicity check
  (``FreqDisc:257-272``).
- transform: binary-search bucketize with "value == last split → last
  bucket" (``FreqDisc:278-296``) — delegated to Spark's JVM-side
  multi-column ``Bucketizer`` (same search semantics), so the hot path
  never enters Python.

Divergence (documented, WON'T FIX — SURVEY.md §7.1): the reference seeds
Flink's sampler through ``XORShiftRandom(seed).nextInt()`` per partition;
which rows it samples is a function of Flink 1.0's physical partitioning
of that job, not of the data, so bit-replaying it would mean simulating a
defunct runtime's split planning.  We pass ``seed`` to Spark's sampler:
deterministic per (seed, input partitioning), identical fraction formula,
identical sample→stride walk downstream; inputs at or below the
10 000-row sample floor (fraction 1.0) are bit-par by construction — the
``equal_freq_bucket`` oracle runs in that regime.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.ml.feature import Bucketizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EqualFrequencyDiscretizer",
    "EqualFrequencyDiscretizerModel",
    "equal_freq_bucket_oracle",
]

DEFAULT_SEED = 481366818  # reference default, FreqDisc:75
MIN_SAMPLES_REQUIRED = 10000  # FreqDisc:166


def _find_split_candidates(values: np.ndarray, num_splits: int) -> np.ndarray:
    """The stride walk of ``FreqDisc:185-225`` over one feature's sample."""
    vals32 = values.astype(np.float32)
    uniq, counts = np.unique(vals32, return_counts=True)
    # sentinel (Float.MaxValue, 1) appended so the walk can emit the last real value
    uniq = np.append(uniq, np.float32(np.finfo(np.float32).max))
    counts = np.append(counts, 1)
    possible_splits = len(uniq) - 1
    if possible_splits <= num_splits:
        return uniq[:-1]
    stride = math.ceil(len(values) / (num_splits + 1))
    splits: list[float] = []
    current = int(counts[0])
    target = float(stride)
    for index in range(1, len(uniq)):
        previous = current
        current += int(counts[index])
        if abs(previous - target) < abs(current - target):
            splits.append(float(uniq[index - 1]))
            target += stride
    return np.array(splits, dtype=np.float32)


def _finish_splits(cand: np.ndarray) -> list[float]:
    """±∞ sentinels + degenerate default (``FreqDisc:231-254``)."""
    eff = [float(c) for c in cand if not math.isinf(c)]
    if not eff:
        return [-math.inf, 0.0, math.inf]
    return [-math.inf, *eff, math.inf]


def check_all_splits(splits: dict[str, list[float]]) -> bool:
    """len ≥ 3, no NaN, strictly increasing (``FreqDisc:257-272``).

    NaN must be rejected EXPLICITLY: every comparison against NaN is
    False, so ``any(a >= b ...)`` alone fails OPEN on a NaN split (from
    a null-bearing sample) and the invalid model only blows up later
    inside the JVM Bucketizer with an opaque error."""
    for s in splits.values():
        if len(s) < 3 or any(math.isnan(v) for v in s):
            return False
        if any(a >= b for a, b in zip(s, s[1:])):
            return False
    return True


@dataclass
class EqualFrequencyDiscretizerModel:
    splits: dict[str, list[float]]  # input col -> ascending splits with ±inf
    output_suffix: str = "_bucket"
    as_bytes: bool = False

    def transform(self, df: DataFrame) -> DataFrame:
        in_cols = [c for c in self.splits if c in df.columns]
        out_cols = [c + self.output_suffix for c in in_cols]
        bucketizer = Bucketizer(
            splitsArray=[self.splits[c] for c in in_cols],
            inputCols=in_cols,
            outputCols=out_cols,
            handleInvalid="error",
        )
        out = bucketizer.transform(df)
        if self.as_bytes:
            for c in out_cols:
                out = out.withColumn(c, F.col(c).cast("tinyint"))
        return out

    def save(self, path: str) -> None:
        """JSON persistence (±inf survives via Python's non-strict JSON)."""
        import json

        with open(path, "w") as fh:
            json.dump(
                {
                    "splits": self.splits,
                    "output_suffix": self.output_suffix,
                    "as_bytes": self.as_bytes,
                },
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "EqualFrequencyDiscretizerModel":
        import json

        with open(path) as fh:
            d = json.load(fh)
        return cls(
            splits={k: [float(v) for v in s] for k, s in d["splits"].items()},
            output_suffix=d["output_suffix"],
            as_bytes=d["as_bytes"],
        )


class EqualFrequencyDiscretizer:
    def __init__(
        self,
        input_cols: list[str],
        num_buckets: int = 2,
        seed: int = DEFAULT_SEED,
        output_suffix: str = "_bucket",
        as_bytes: bool = False,
    ) -> None:
        if num_buckets < 2:
            raise ValueError("num_buckets must be ≥ 2")
        self.input_cols = list(input_cols)
        self.num_buckets = int(num_buckets)
        self.seed = int(seed)
        self.output_suffix = output_suffix
        self.as_bytes = as_bytes

    def fit(self, df: DataFrame) -> EqualFrequencyDiscretizerModel:
        n = df.count()
        if n == 0:
            raise ValueError("EqualFrequencyDiscretizer requires a non-empty input")
        required = max(self.num_buckets * self.num_buckets, MIN_SAMPLES_REQUIRED)
        fraction = min(required / n, 1.0)
        sample = (
            df.select([F.col(c).cast("double").alias(c) for c in self.input_cols])
            .sample(withReplacement=False, fraction=fraction, seed=self.seed)
            .toPandas()
        )
        if len(sample) == 0:
            # pathological: a Bernoulli sample with expected size >= 10000
            # returned zero rows (P ~ e^-10000; reachable only on crafted
            # tiny inputs where fraction < 1 rounds everything away).
            # Keep the SAME double cast as the primary path so exotic
            # column types (decimal, string numerics) behave identically.
            sample = df.select(
                [F.col(c).cast("double").alias(c) for c in self.input_cols]
            ).toPandas()
        splits = {
            c: _finish_splits(
                _find_split_candidates(sample[c].to_numpy(), self.num_buckets - 1)
            )
            for c in self.input_cols
        }
        if not check_all_splits(splits):
            raise ValueError(f"invalid splits computed: {splits}")
        return EqualFrequencyDiscretizerModel(
            splits=splits, output_suffix=self.output_suffix, as_bytes=self.as_bytes
        )


class EqualWidthDiscretizer:
    """Equal-width binning: interior boundaries at ``lo + i·(hi−lo)/k``.

    Complements the reference's equal-frequency discretizer (no
    reference analogue — extension surface).  ``fit`` is one distributed
    min/max aggregate (no sampling needed: the bounds are exact);
    ``transform`` reuses the same JVM ``Bucketizer`` model class as the
    frequency path, so persistence and byte-casting come for free.

    Boundary arithmetic is pinned to ``lo + i * ((hi - lo) / k)`` in
    this exact IEEE evaluation order so a SQL oracle can reproduce the
    split points bit-for-bit.
    """

    def __init__(
        self,
        input_cols: list[str],
        num_buckets: int = 2,
        output_suffix: str = "_bucket",
        as_bytes: bool = False,
    ) -> None:
        if num_buckets < 2:
            raise ValueError("num_buckets must be ≥ 2")
        self.input_cols = list(input_cols)
        self.num_buckets = int(num_buckets)
        self.output_suffix = output_suffix
        self.as_bytes = as_bytes

    def fit(self, df: DataFrame) -> EqualFrequencyDiscretizerModel:
        aggs = []
        for c in self.input_cols:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
        row = df.agg(*aggs).collect()[0]
        splits: dict[str, list[float]] = {}
        for c in self.input_cols:
            lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
            if lo is None or hi is None:
                raise ValueError(f"cannot fit equal-width splits on all-null {c!r}")
            if hi == lo:
                # degenerate column: one interior boundary at the constant
                # (mirrors the frequency path's degenerate [-inf, x, +inf]
                # shape, which the shared split validator requires)
                splits[c] = [float("-inf"), lo, float("inf")]
                continue
            w = (hi - lo) / self.num_buckets
            splits[c] = (
                [float("-inf")]
                + [lo + i * w for i in range(1, self.num_buckets)]
                + [float("inf")]
            )
        if not check_all_splits(splits):
            raise ValueError(f"invalid splits computed: {splits}")
        return EqualFrequencyDiscretizerModel(
            splits=splits, output_suffix=self.output_suffix, as_bytes=self.as_bytes
        )


def equal_width_bucket_oracle(table: str, col: str, num_buckets: int) -> str:
    """DuckDB oracle for the equal-width bucket distribution: the bucket
    index is the number of interior boundaries ≤ x, with each boundary
    spelled in the same IEEE order the fit uses.  The hi = lo branch
    mirrors the fit's degenerate [-inf, lo, +inf] shape (every row in
    bucket 1) — without it all k−1 zero-width boundary terms would fire
    and the oracle would report bucket k−1."""
    k = num_buckets
    terms = " + ".join(
        f"(CASE WHEN {col} >= lo + {i} * ((hi - lo) / {k}.0) THEN 1 ELSE 0 END)"
        for i in range(1, k)
    )
    return f"""
    WITH b AS (SELECT min(CAST({col} AS DOUBLE)) AS lo,
                      max(CAST({col} AS DOUBLE)) AS hi FROM {table})
    SELECT CAST(CASE WHEN hi = lo THEN 1 ELSE {terms} END AS INT) AS bucket,
           count(*) AS cnt
    FROM {table}, b
    GROUP BY 1
    """


def equal_freq_bucket_oracle(
    table: str, col: str, num_buckets: int, n_rows_at_most: int = 10000
) -> str:
    """DuckDB oracle replaying fit+transform on a small table.

    Valid only when the table has ≤ ``n_rows_at_most`` rows (the 10k
    sample floor) so the engine's seeded Bernoulli sample has fraction
    1.0 (the whole table, deterministically) — enforced in-query via
    ``error()`` so a violation fails loudly instead of hash-mismatching —
    then the sample→stride walk (``FreqDisc:185-225``)
    is replayed exactly by a recursive CTE:  unique float32 values sorted
    with a float32-max sentinel appended, cumulative counts, and the
    "emit previous value when it is closer to the running target" rule
    with target += stride per emission.  Bucket assignment mirrors the
    JVM Bucketizer: bucket(v) = #{interior split s : s ≤ v} on float64.

    (The reference's possible_splits ≤ num_splits shortcut is not
    replayed — callers must pick a column with more distinct values than
    buckets, as the gate query does.)
    """
    num_splits = num_buckets - 1
    f32_max = float(np.finfo(np.float32).max)
    return f"""
    WITH RECURSIVE
    vals AS (SELECT CAST(CAST({col} AS DOUBLE) AS FLOAT) AS v FROM {table}),
    vc AS MATERIALIZED (
      SELECT v, count(*) AS cnt FROM vals GROUP BY v
      UNION ALL SELECT CAST({f32_max!r} AS FLOAT), 1),
    params AS (
      SELECT CASE WHEN (SELECT count(*) FROM vals) > {n_rows_at_most}
                  THEN error('equal_freq oracle invalid: table exceeds the '
                             'full-sample bound of {n_rows_at_most} rows')
                  ELSE ceil((SELECT count(*) FROM vals) * 1.0
                            / {num_splits + 1}) END AS stride),
    u AS MATERIALIZED (
      SELECT v, cnt,
             row_number() OVER (ORDER BY v) AS idx,
             sum(cnt)    OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
             lag(v)      OVER (ORDER BY v) AS prev_v
      FROM vc),
    walk(idx, target, emit) AS (
      SELECT 1, (SELECT stride FROM params), CAST(NULL AS FLOAT)
      UNION ALL
      SELECT u.idx,
             CASE WHEN abs((u.cum - u.cnt) - w.target) < abs(u.cum - w.target)
                  THEN w.target + p.stride ELSE w.target END,
             CASE WHEN abs((u.cum - u.cnt) - w.target) < abs(u.cum - w.target)
                  THEN u.prev_v ELSE CAST(NULL AS FLOAT) END
      FROM walk w
      JOIN u ON u.idx = w.idx + 1
      CROSS JOIN params p),
    splits AS (SELECT CAST(emit AS DOUBLE) AS s FROM walk WHERE emit IS NOT NULL),
    bucketed AS (
      SELECT (SELECT count(*) FROM splits WHERE s <= CAST(t.{col} AS DOUBLE)) AS bucket
      FROM {table} t)
    SELECT CAST(bucket AS INT) AS bucket, count(*) AS cnt
    FROM bucketed GROUP BY bucket
    """
