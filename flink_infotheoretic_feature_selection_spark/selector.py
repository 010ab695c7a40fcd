"""InfoThSelector — greedy information-theoretic feature selection.

Re-expresses the reference's flagship (``InfoSelector.scala``; lifecycle
traced in SURVEY.md §3.1) as an idiomatic PySpark Estimator/Model:

- fit stage 1: cache the wide tinyint matrix (the Spark analogue of the
  reference's columnar transpose + HDFS persist, ``InfoSelector.scala:
  425-437``).  Default ``loop_engine="packed"``: ONE scan of the source
  packs per-partition NumPy column blocks into a persisted RDD
  (operators/packed.py) — the direct analogue of the reference's
  hand-rolled byte layout; ``loop_engine="arrow"`` keeps the
  Tungsten-cache + per-iteration Arrow-exchange route.
- fit stage 2: per-feature dims (``counterByFeat``), 2-D histograms vs the
  label, relevances = MI(X; class) (``InfoTheory.scala:413-432``) — from
  the blocks (packed) or a Catalyst aggregate + codegen histogram pass
  (arrow).
- fit stage 3: MIM short-circuit = top-k by relevance
  (``InfoSelector.scala:313-315``); otherwise the greedy loop
  (``InfoSelector.scala:353-362``) runs on the driver — one Spark job per
  selected feature (3-D histogram pass + driver MI/CMI + criterion
  updates), the idiomatic Spark replacement for Flink bulk iteration.
- transform: narrow column projection (``InfoSelector.scala:229-263``) —
  pure Catalyst, no shuffle.

Differences from the reference, deliberate and documented:

- ``NF``/``NI`` parameters dropped — derived from schema / count
  (SURVEY.md §1.3).
- argmax ties broken by lowest feature index (the reference's reduce
  order is nondeterministic — SURVEY.md §7.1), and the comparison
  happens at ``tie_precision`` decimals (default 5, the gate's emission
  precision): two engines summing the same MI/CMI terms in different
  orders disagree in the last ulps, so full-precision argmax over
  mathematically-tied scores picks a different feature per engine and
  the tie rule never fires (found by the random-matrix cross-engine
  sweep on duplicate-heavy data; sub-1e-5 score gaps are summation
  noise, not signal).  The quantization is ``floor(score·10^p + 0.5)``
  — identical IEEE-double steps to the oracle's
  ``CAST(floor(score * 100000.0 + 0.5) AS BIGINT)`` — NOT each
  engine's ``round()``: Python rounds the binary double half-to-even
  while DuckDB rounds the decimal rendering half-away-from-zero, so a
  score near an x.xxxxx5 boundary rounds differently per engine and
  re-opens the divergence (r6 advisor finding).  Library users whose
  score gaps are genuinely sub-1e-5 signal (very large N) pass
  ``tie_precision=None`` for full-precision argmax — deterministic via
  the id tiebreak, but not oracle-reproducible across engines.
- the sparse path is handled by the same columnar code (the reference's
  sparse path throws, ``InfoSelector.scala:378-386``).
"""

from __future__ import annotations

import math
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from flink_infotheoretic_feature_selection_spark.functions.criteria import Criterion, criterion_factory
from flink_infotheoretic_feature_selection_spark.functions.infotheory import mi_and_cmi, mutual_info
from flink_infotheoretic_feature_selection_spark.operators.histogram import (
    collect_hist2d,
    feature_dims,
    feature_dims_and_count,
    hist2d,
    hist3d_mi_cmi,
)

__all__ = ["InfoThSelector", "InfoThSelectorModel", "SparseInfoThSelector"]

# Serializes the sparse pack's session-global skew-join override so two
# concurrent fits cannot interleave set/restore (see SparseInfoThSelector.fit).
_SKEW_CONF_LOCK = threading.Lock()


def _tie_key(score: float, precision: int | None):
    """Argmax comparison key under the tie contract (module docstring).

    ``precision=None`` → the raw score (full-precision argmax);
    otherwise ``floor(score·10^p + 0.5)`` — the exact IEEE-double step
    sequence the DuckDB oracles run as
    ``CAST(floor(score * 100000.0 + 0.5) AS BIGINT)``, so both engines
    quantize every score to the SAME integer before comparing.  Not
    ``round()``: the two engines' round() disagree on x.xxxxx5
    boundaries (Python half-to-even on the binary double, DuckDB
    half-away-from-zero on the decimal rendering).
    """
    if precision is None:
        return score
    return math.floor(score * 10.0**precision + 0.5)


@dataclass
class InfoThSelectorModel:
    """Fitted model: selected feature columns (ascending, like
    ``InfoSelector.scala:491``) plus the selection path with scores."""

    feature_cols: list[str]
    label_col: str
    selected_cols: list[str]
    selection_path: list[tuple[str, float]]  # (col, score at selection time)
    relevances: dict[str, float]
    # wall-clock breakdown of the fit phases (pack/stats/relevance/loop,
    # iteration count) — diagnostics only; not persisted by save()
    fit_timings: dict | None = None

    def transform(self, df: DataFrame) -> DataFrame:
        """Project to (selected features, label) — narrow Catalyst select,
        the reference's transform (``InfoSelector.scala:229-263``).

        Missing selected columns RAISE (r8): silently dropping them
        would hand downstream training the wrong feature set on a schema
        mismatch.  A missing label stays optional — transform of
        unlabeled serving data is the normal case."""
        missing = [c for c in self.selected_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"input is missing selected feature columns: {missing}"
            )
        cols = list(self.selected_cols) + (
            [self.label_col] if self.label_col in df.columns else []
        )
        return df.select(*cols)

    def save(self, path: str) -> None:
        """Persist the fitted model as JSON (MLlib-style save/load; the
        reference keeps only ``selectedFeatures`` in memory —
        ``InfoSelector.scala:79``)."""
        import json

        with open(path, "w") as fh:
            json.dump(
                {
                    "feature_cols": self.feature_cols,
                    "label_col": self.label_col,
                    "selected_cols": self.selected_cols,
                    "selection_path": self.selection_path,
                    "relevances": self.relevances,
                },
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "InfoThSelectorModel":
        import json

        with open(path) as fh:
            d = json.load(fh)
        return cls(
            feature_cols=d["feature_cols"],
            label_col=d["label_col"],
            selected_cols=d["selected_cols"],
            selection_path=[tuple(p) for p in d["selection_path"]],
            relevances=d["relevances"],
        )


class InfoThSelector:
    """Estimator. ``criterion`` ∈ {mim, mifs, jmi, mrmr, cmim, if, icap};
    default mrmr (``InfoSelector.scala:149``).

    ``beta`` (MIFS only) defaults to 1.0 — a deliberate divergence from
    the reference's 0.0 default, which degenerates MIFS into MIM; pass
    ``beta=0.0`` for reference parity.  See ``criterion_factory``.

    ``tie_precision`` — decimals at which argmax compares scores before
    the lowest-feature-index tiebreak (default 5, the gate emission
    precision; see the module docstring's tie contract for the
    cross-engine rationale).  ``None`` → full-precision argmax: two
    scores differing by any amount order by score, equal scores still
    break deterministically by index — for callers whose sub-1e-5 gaps
    are real signal rather than summation noise.  ``tie_precision=None``
    is the reference-faithful mode: the Flink job argmaxes raw float
    scores with no quantization (``InfoSelector.scala:452``), so library
    users wanting byte-parity with the reference's selection order on
    near-tied scores must pass ``None``.

    ``loop_engine`` — substrate for stage 2 + the greedy loop, identical
    output (pinned by tests/test_packed.py):

    - ``"packed"`` (default): pack the matrix once into a persisted RDD
      of NumPy column blocks (operators/packed.py); each iteration is a
      plain closure over the blocks — no per-iteration Catalyst plan or
      Arrow conversion.  2.3× faster per iteration at sf0.1, more on
      wide matrices.
    - ``"arrow"``: the round-3..6 route — fresh ``mapInArrow`` plan over
      the Tungsten cache per iteration (``histogram.hist3d_mi_cmi``).
      Kept as the pure-DataFrame cross-check.

    ``pack_route`` (packed engine only) — how the one-time pack is
    produced; all routes yield bit-identical blocks-by-value (see
    :meth:`_fit_packed`): ``"auto"`` (default) detects a bare local
    parquet scan and direct-packs its files with pyarrow (no JVM row
    transit — the r9 ``fit_parquet`` win applied automatically), else
    takes the ``mapInArrow`` scan pack; ``"scan"`` / ``"direct"`` /
    ``"spill"`` pin a route.  ``spill_dir`` — where the explicit spill
    route writes its temp parquet (must be executor-visible; defaults
    to the local temp dir, fine on single-host masters).
    """

    def __init__(
        self,
        n_to_select: int = 10,
        criterion: str = "mrmr",
        feature_cols: list[str] | None = None,
        label_col: str = "label",
        beta: float = 1.0,
        emit_f32: bool = True,
        validate: bool = False,
        tie_precision: int | None = 5,
        loop_engine: str = "packed",
        pack_route: str = "auto",
        spill_dir: str | None = None,
        speculation: int | str = "auto",
    ) -> None:
        if loop_engine not in ("packed", "arrow"):
            raise ValueError(f"loop_engine must be 'packed' or 'arrow', got {loop_engine!r}")
        if pack_route not in ("auto", "scan", "spill", "direct"):
            raise ValueError(
                f"pack_route must be 'auto', 'scan', 'spill' or 'direct', got {pack_route!r}"
            )
        if speculation != "auto" and (
            not isinstance(speculation, int) or speculation < 0
        ):
            raise ValueError(
                f"speculation must be 'auto' or a non-negative int, got {speculation!r}"
            )
        self.n_to_select = int(n_to_select)
        self.criterion = criterion
        self.feature_cols = feature_cols
        self.label_col = label_col
        self.beta = beta
        self.emit_f32 = emit_f32
        self.validate = validate
        self.tie_precision = tie_precision
        self.loop_engine = loop_engine
        self.pack_route = pack_route
        self.spill_dir = spill_dir
        self.speculation = speculation

    def fit(self, df: DataFrame) -> InfoThSelectorModel:
        df = self._widen_vectors(df)
        feats = self.feature_cols or [c for c in df.columns if c != self.label_col]
        if self.n_to_select > len(feats):
            # reference: require(nToSelect < nFeatures), InfoSelector.scala:419
            raise ValueError(
                f"n_to_select={self.n_to_select} exceeds n_features={len(feats)}"
            )
        label = self.label_col
        if self.loop_engine == "packed":
            # The packed path scans the source EXACTLY ONCE (the pack is
            # the cache) and derives dims/count/validation from the NumPy
            # blocks — no DataFrame persist and no wide Catalyst
            # aggregates, whose plan cost explodes with column count
            # (632-column dims agg measured at 60.9 s vs 0.17 s from
            # blocks; see operators/packed.py).
            return self._fit_packed(df, feats, label)
        if self.validate:
            # label rides the same histogram index arithmetic as the
            # features — validate it too (r8: a NULL/fractional label
            # used to pass validation and die later in index code)
            self._validate_byte_range(df, feats + [label])

        matrix = df.select(*feats, label).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._fit_cached(matrix, feats, label)
        finally:
            matrix.unpersist()

    def fit_parquet(self, spark, path: str, filesystem=None) -> InfoThSelectorModel:
        """Fit straight from a MATERIALIZED parquet feature matrix via
        the direct row-group pack (``PackedMatrix.pack_parquet``) —
        skips the DataFrame scan's JVM row round-trip, the dominant
        cost on wide matrices (BASELINE r9: 600k×631 pack 113 s →
        seconds).  Semantics are identical to ``fit`` on
        ``spark.read.parquet(path)`` — bit-identical selection, same
        dims/validation contract — PROVIDED the parquet columns already
        hold the final feature values (no Catalyst expressions are
        applied; derive-then-write first if your features are computed).
        ``feature_cols`` defaults to the parquet schema order minus
        ``label_col``.  ``filesystem`` (r10) — an optional
        ``pyarrow.fs.FileSystem`` for non-local storage (S3, HDFS, a
        wrapped fsspec); footer reads and executor row-group reads both
        go through it."""
        import time

        import pyarrow.parquet as pq_mod

        from flink_infotheoretic_feature_selection_spark.operators.packed import (
            PackedMatrix,
            _list_parquet_files_fs,
            list_parquet_files,
        )

        if self.loop_engine != "packed":
            raise ValueError("fit_parquet requires loop_engine='packed'")
        # list_parquet_files raises the clear 'no parquet files' error on
        # an empty directory (r10, advisor find: the old sorted(glob)[0]
        # raised a bare IndexError first) and resolves nested /
        # Spark-partitioned layouts recursively
        first = (
            list_parquet_files(path)
            if filesystem is None
            else _list_parquet_files_fs(filesystem, path)
        )[0]
        schema_names = pq_mod.ParquetFile(first, filesystem=filesystem).schema_arrow.names
        feats = self.feature_cols or [c for c in schema_names if c != self.label_col]
        if self.n_to_select > len(feats):
            raise ValueError(
                f"n_to_select={self.n_to_select} exceeds n_features={len(feats)}"
            )
        label = self.label_col
        timings: dict = {"pack_route": "direct"}
        t0 = time.perf_counter()
        packed = PackedMatrix.pack_parquet(
            spark, path, feats + [label],
            rows_per_partition=self.LOOP_ROWS_PER_PARTITION,
            filesystem=filesystem,
        )
        timings["pack_sec"] = round(time.perf_counter() - t0, 3)
        return self._fit_from_packed(packed, feats, label, timings)

    def _fit_packed(self, df: DataFrame, feats: list[str], label: str) -> InfoThSelectorModel:
        """Route the pack (r10, VERDICT ask #1) — all routes produce
        bit-identical blocks-by-value and therefore identical selections
        (pinned by tests/test_direct_pack.py):

        - ``direct``: the input is a bare local parquet scan (optionally
          column-pruned) → read the scan's own files with pyarrow — no
          JVM row transit at all.  ``auto`` detects this itself via
          ``plans.inspect.bare_parquet_scan_files``, so ``fit`` on
          ``spark.read.parquet(...)`` gets ``fit_parquet``'s 21× wide
          pack without the caller materializing anything.
        - ``scan``: the ``mapInArrow`` pack — handles every input, and
          is what ``auto`` takes for DERIVED frames.  Measured r10
          (BASELINE "spill route vs scan pack"): a derived frame's
          expression evaluation is row-oriented either way, and the
          parquet WRITER pays a per-field row cost that crosses the
          Arrow transit's from ~128 columns up (631 cols × 100k rows:
          write 18.5 s vs scan pack 12.3 s) — so spilling a derived
          frame does NOT beat packing it, outside a shallow ~40-100
          column band (~20%).  ``auto`` therefore never spills.
        - ``spill``: explicit only — write ``cols`` to temp parquet
          once (one JVM pass), direct-pack the files.  For callers in
          the mid-width band, or who point ``spill_dir`` at shared
          storage a later ``fit_parquet`` can reuse.
        """
        import time

        from flink_infotheoretic_feature_selection_spark.operators.packed import PackedMatrix
        from flink_infotheoretic_feature_selection_spark.plans.inspect import (
            bare_parquet_scan_files,
        )

        cols = feats + [label]
        route = self.pack_route
        if route in ("auto", "direct"):
            files = bare_parquet_scan_files(df, cols)
            if files is None:
                if route == "direct":
                    raise ValueError(
                        "pack_route='direct' requires the input to be a bare "
                        "local parquet scan (optionally column-pruned); this "
                        "plan computes expressions — use 'auto' or 'spill', "
                        "or fit_parquet on the materialized path"
                    )
            else:
                timings: dict = {"pack_route": "direct"}
                t0 = time.perf_counter()
                try:
                    packed = PackedMatrix.pack_parquet(
                        df.sparkSession, files, cols,
                        rows_per_partition=self.LOOP_ROWS_PER_PARTITION,
                    )
                except ValueError:
                    if route == "direct":
                        raise
                    # footer-stage ineligibility (a file missing a column
                    # under mergeSchema, all-empty row groups) — the scan
                    # route handles or re-diagnoses these.  The try wraps
                    # ONLY the pack: a contract ValueError from the fit
                    # itself (dims>256, byte-range validation) must
                    # propagate, not silently re-run the fit on another
                    # route (r10 self-review find)
                    packed = None
                if packed is not None:
                    timings["pack_sec"] = round(time.perf_counter() - t0, 3)
                    return self._fit_from_packed(packed, feats, label, timings)
        if route == "spill":
            return self._fit_spill(df, feats, label)
        timings = {"pack_route": "scan"}
        t0 = time.perf_counter()
        packed = PackedMatrix.pack(df, cols)
        timings["pack_sec"] = round(time.perf_counter() - t0, 3)
        return self._fit_from_packed(packed, feats, label, timings)

    def _fit_spill(self, df: DataFrame, feats: list[str], label: str) -> InfoThSelectorModel:
        import os
        import shutil
        import tempfile
        import time
        import uuid

        from flink_infotheoretic_feature_selection_spark.operators.packed import PackedMatrix

        cols = feats + [label]
        # the caller owns spill-dir visibility: the default temp dir is
        # only executor-readable on single-host masters (local[...] /
        # local-cluster[...]); on a real cluster pass spill_dir on
        # shared storage or the pyarrow readers fail loudly
        base = self.spill_dir or tempfile.gettempdir()
        spill = os.path.join(base, f"infoth_spill_{uuid.uuid4().hex}")
        timings: dict = {"pack_route": "spill"}
        try:
            t0 = time.perf_counter()
            # 16 MB row groups bound the direct reader's split atom even
            # when the plan writes few (or one) output files; ordinary
            # multi-partition plans write one file per partition anyway
            (
                df.select(*cols)
                .write.option("parquet.block.size", str(16 * 1024 * 1024))
                .parquet(spill)
            )
            timings["spill_write_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            packed = PackedMatrix.pack_parquet(
                df.sparkSession, spill, cols,
                rows_per_partition=self.LOOP_ROWS_PER_PARTITION,
            )
            timings["pack_sec"] = round(time.perf_counter() - t0, 3)
            # _fit_from_packed unpersists before returning/raising, so the
            # spill files are never deleted under a live block lineage
            return self._fit_from_packed(packed, feats, label, timings)
        finally:
            shutil.rmtree(spill, ignore_errors=True)

    def _fit_from_packed(
        self, packed, feats: list[str], label: str, timings: dict
    ) -> InfoThSelectorModel:
        """Everything after the pack — shared by :meth:`fit` (DataFrame
        pack) and :meth:`fit_parquet` (direct row-group pack); the two
        routes differ ONLY in how the blocks were produced."""
        import time

        try:
            t0 = time.perf_counter()
            if self.validate:
                # BEFORE dims derivation: NULL-bearing columns would
                # otherwise hit dims_and_count's blunter NaN-contract
                # error instead of the actionable byte-range message
                offenders = packed.validate_byte_range(feats + [label])
                if offenders:
                    raise ValueError(self._byte_range_message(offenders))
            # r12 (guide §1.2): fuse the dims pass with the stage-2
            # relevance histograms — one scan of the blocks instead of
            # two — whenever the per-partition collect stays inside the
            # driver-merge budget (h2 comes back None otherwise and the
            # flow below falls back to the separate relevances pass,
            # costing exactly what the unfused flow always cost).  Only
            # in the bounded-partition regime; at 100 TB partition
            # counts the treeReduce dims pass keeps the driver volume
            # flat.  Bit-identical either way (integer pad-merge; pinned
            # by tests/test_packed.py).
            #
            # r13 (ADVICE r12, medium): do NOT fuse when the
            # parallelism-starved re-layout below is about to fire — the
            # fused histograms would execute serially inside the very
            # partitions the rebalance exists to split; run the cheap
            # stats pass, re-layout, and take the relevances pass over
            # the spread blocks instead.  The prediction uses the pack's
            # free n_rows (same numbers the real decision below uses).
            h2_fused = None
            fuse = (
                packed.n_partitions * len(packed.cols) * 16
                <= type(packed).DRIVER_STATS_MAX_BYTES
            )
            nr = packed.n_rows
            if fuse and nr and nr >= 2 * self.LOOP_ROWS_PER_PARTITION:
                sc = packed.rdd.context
                ideal = -(-nr // self.LOOP_ROWS_PER_PARTITION)
                target = max(1, min(ideal, sc.defaultParallelism))
                cells = (nr * len(packed.cols)) / max(packed.n_partitions, 1)
                if (
                    packed.n_partitions < -(-target // 2)
                    and cells >= self.REBALANCE_MIN_CELLS_PER_PART
                ):
                    fuse = False
            if fuse:
                dims, n, h2_fused = packed.dims_count_hist2d(label)
            else:
                dims, n = packed.dims_and_count()
            timings["stats_sec"] = round(time.perf_counter() - t0, 3)
            # The re-layout exists for the greedy LOOP (dims/relevances
            # already ran above it); MIM and k=1 fits never run a loop
            # pass, so re-laying out for them is pure waste (r13 — the
            # MIM bench paid a 0.55 s coalesce for zero loop jobs).
            needs_loop = self.criterion.lower() != "mim" and self.n_to_select >= 2
            if needs_loop and n >= 2 * self.LOOP_ROWS_PER_PARTITION:
                sc = packed.rdd.context
                # ideal = the layout the loop's memory model is built on
                # (~LOOP_ROWS_PER_PARTITION rows per block); the
                # core-clamped target exists ONLY for the starved case
                # (spread few huge blocks across the cores).
                ideal = -(-n // self.LOOP_ROWS_PER_PARTITION)
                target = max(1, min(ideal, sc.defaultParallelism))
                cur = packed.n_partitions
                # Re-layout only for GROSS mismatch: parallelism-starved
                # (cur < half the core-clamped target — e.g. one giant
                # unsplit file) pays a one-time chunk shuffle; over-split
                # (cur > 4× IDEAL — e.g. a 100 TB scan's millions of tiny
                # input splits) is a shuffle-free coalesce DOWN TO IDEAL.
                # The over-split test compares against IDEAL, never the
                # core-clamped target: at 60M×631 the pack's 901
                # right-sized blocks exceeded 4×32 cores and the old
                # band coalesced them into 32 blocks of 1.9M rows /
                # 1.2 GB each, whose concat OOM-killed the box — more
                # partitions than cores is exactly how big data is
                # supposed to look (r10 decade-run find).
                #
                # r12 (guide §2.4 — remove shuffles outright): the
                # starved re-layout must also be WORTH its own job + a
                # full shuffle of the packed bytes.  Spreading a
                # partition only pays when the per-task histogram work it
                # removes, summed over the loop's k-1 iterations, exceeds
                # the one-time re-layout; below ~32M cells (≈32 MB of
                # int8 blocks) per partition the per-iteration task
                # compute is tens of ms and the shuffle can never win it
                # back (measured sf0.1, 600k×33, local[32]: the 3→10
                # split cost 1.3-1.8 s and the loop iteration read
                # 0.39 s vs 0.38 s — parity).  A genuinely starved big
                # input (one unsplit multi-GB file) is far above the
                # threshold and still re-lays out.  Partition-count
                # choices never affect results: histogram merges are
                # partition-agnostic integer sums (pinned by
                # tests/test_packed.py).
                # r13: the over-split band tightened 4×ideal → 2×ideal.
                # The loop's per-pass merge volume grows linearly with
                # partition count (each partition emits one partial per
                # (cond, feature) table), so an over-split layout pushes
                # the pass into the shuffled combineByKey regime where
                # the one-stage driver merge would do.  Measured sf0.1,
                # 32 blocks vs the coalesced ideal 10: pass m=1
                # 0.68 → 0.33 s, m=8 1.42 → 0.82 s, against a one-time
                # shuffle-free coalesce of 0.64 s.  The coalesce target
                # stays IDEAL (≈LOOP_ROWS_PER_PARTITION-row blocks, the
                # loop's memory model) — never the core count, which is
                # what OOM-killed the r10 decade run.
                cells_per_part = (n * len(feats + [label])) / max(cur, 1)
                if cur < -(-target // 2) and cells_per_part >= self.REBALANCE_MIN_CELLS_PER_PART:
                    t0 = time.perf_counter()
                    packed = packed.rebalance(target, self.LOOP_ROWS_PER_PARTITION)
                    timings["rebalance_sec"] = round(time.perf_counter() - t0, 3)
                elif cur > 2 * ideal:
                    t0 = time.perf_counter()
                    packed = packed.rebalance(ideal, self.LOOP_ROWS_PER_PARTITION)
                    timings["rebalance_sec"] = round(time.perf_counter() - t0, 3)
            timings["loop_partitions"] = packed.n_partitions
            # matrix=None: with a packed substrate _fit_stages never
            # touches the DataFrame (both histogram passes and the
            # partition probe run on the blocks)
            return self._fit_stages(
                None, feats, label, dims, n, dims[label], packed=packed,
                timings=timings, h2_fused=h2_fused,
            )
        finally:
            packed.unpersist()

    # -- internal ----------------------------------------------------------

    @staticmethod
    def _validate_byte_range(df: DataFrame, feats: list[str]) -> None:
        """Input validation (``InfoSelector.scala:404-416``).

        Documented divergence: the reference's message says "[0, 255]"
        while its code accepts −128..127 and only checks the sparse path
        (SURVEY.md §1.2) — yet a negative value would crash its histogram
        indexing just like ours.  We enforce what both engines actually
        require — integers in [0, 255] — on every path, opt-in, as ONE
        aggregation job (no extra pass per column).
        """
        from pyspark.sql import functions as F

        # isNull is a separate disjunct: every other predicate evaluates
        # to NULL for a null cell and F.sum skips NULLs, so without it a
        # null feature passes "validation" and crashes the fit later with
        # an unrelated indexing error.
        bad = df.select(
            *[
                F.sum(
                    (
                        F.col(c).isNull()
                        | (F.col(c) < 0)
                        | (F.col(c) > 255)
                        | (F.col(c).cast("double") % 1 != 0)
                    ).cast("long")
                ).alias(c)
                for c in feats
            ]
        ).collect()[0]
        offenders = [c for c in feats if (bad[c] or 0) > 0]
        if offenders:
            raise ValueError(InfoThSelector._byte_range_message(offenders))

    @staticmethod
    def _byte_range_message(offenders: list[str]) -> str:
        return (
            "features must be non-null integers in [0, 255] (the range the "
            "histogram engine indexes by; cf. InfoSelector.scala:411-414 "
            "whose −128..127 check contradicts its own [0,255] message); "
            f"violating columns: {offenders}"
        )

    def _widen_vectors(self, df: DataFrame) -> DataFrame:
        """Accept (label, features: VectorUDT) rows directly — the
        reference's ``LabeledVector`` API shape (``InfoSelector.scala:172``).
        Auto-converts to the wide tinyint layout via the JVM-side bridge."""
        if self.feature_cols is not None:
            return df
        vector_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("vector", "vectorudt")
        ]
        if len(vector_cols) == 1 and self.label_col in df.columns:
            from flink_infotheoretic_feature_selection_spark.sources.libsvm import vectors_to_wide

            return vectors_to_wide(
                df, features_col=vector_cols[0], label_col=self.label_col
            )
        return df

    # Rows per cache partition the loop aims for, matched to the Arrow
    # batch size it clamps (one batch per task amortizes the per-batch
    # Python/Arrow overhead).  Matched to sf0.1 measurement: the natural
    # parquet layout gave 3 partitions on a 32-core box — every loop
    # pass ran 3-wide; ~64k-row partitions cut per-iteration wall time
    # 1.05 s → 0.52 s.  Data below 2× this floor is never repartitioned
    # (the shuffle would cost more than it saves).
    LOOP_ROWS_PER_PARTITION = 65536
    # Minimum per-partition cell count (rows × packed columns) for the
    # parallelism-starved re-layout to fire — see _fit_from_packed.
    # Scale-free: compares actual per-partition work against the fixed
    # cost of one extra job + shuffling every packed byte once.
    REBALANCE_MIN_CELLS_PER_PART = 32 * 1024 * 1024

    def _loop_partition_target(self, matrix: DataFrame, n: int) -> int | None:
        """Partition count the loop should run at, or None to keep the
        input layout (small data: a shuffle would cost more than it
        saves; near-target layouts: good enough)."""
        if n < 2 * self.LOOP_ROWS_PER_PARTITION:
            return None
        sc = matrix.sparkSession.sparkContext
        target = max(
            1, min(-(-n // self.LOOP_ROWS_PER_PARTITION), sc.defaultParallelism)
        )
        cur = matrix.rdd.getNumPartitions()
        # same gross-mismatch band as the packed engine: starved (< half
        # the target) pays the re-layout, over-split (> 4x) coalesces
        # shuffle-free in _fit_cached, near-target layouts are kept
        return None if -(-target // 2) <= cur <= 4 * target else target

    def _fit_cached(self, matrix: DataFrame, feats: list[str], label: str) -> InfoThSelectorModel:
        from flink_infotheoretic_feature_selection_spark.session import conf_clamp

        # one job: dims + count together (also materializes the cache)
        dims, n = feature_dims_and_count(matrix, feats + [label])
        y_dim = dims[label]
        target = self._loop_partition_target(matrix, n)

        with conf_clamp(
            matrix.sparkSession,
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            "65536",
        ):
            repart = None
            try:
                if target is not None:
                    # input-file-derived partitioning is parallelism-starved
                    # (or over-split): re-layout ONCE, reuse k times.
                    # Over-split consolidation is a shuffle-free coalesce
                    # (the packed engine's band, r8) — only the starved
                    # case pays a full repartition shuffle.
                    cur = matrix.rdd.getNumPartitions()
                    relayout = matrix.coalesce(target) if cur > target else matrix.repartition(target)
                    repart = relayout.persist(StorageLevel.MEMORY_AND_DISK)
                    matrix = repart
                return self._fit_stages(matrix, feats, label, dims, n, y_dim)
            finally:
                if repart is not None:
                    repart.unpersist()

    def _fit_stages(
        self,
        matrix: DataFrame | None,  # None iff packed is provided
        feats: list[str],
        label: str,
        dims: dict[str, int],
        n: int,
        y_dim: int,
        packed=None,
        timings: dict | None = None,
        h2_fused: dict | None = None,
    ) -> InfoThSelectorModel:
        import time as _time

        timings = {} if timings is None else timings
        # Stage 2 — relevances: one histogram pass over all features
        # (or zero, when the fused dims+hist2d pass already produced the
        # global tables — driver-side MI math only).
        _t0 = _time.perf_counter()
        if h2_fused is not None:
            relevances = {
                c: mutual_info(h2_fused[c], n, emit_f32=self.emit_f32)
                for c in feats
            }
        elif packed is not None:
            relevances = packed.relevances(
                feats, label, dims, n, emit_f32=self.emit_f32
            )
        else:
            h2 = collect_hist2d(
                hist2d(matrix, feats, label, dims, y_dim), feats, dims, y_dim
            )
            relevances = {c: mutual_info(h2[c], n, emit_f32=self.emit_f32) for c in feats}
        timings["relevance_sec"] = round(_time.perf_counter() - _t0, 3)

        state: dict[str, Criterion] = {
            c: criterion_factory(self.criterion, self.beta).init(relevances[c]) for c in feats
        }

        path: list[tuple[str, float]] = []
        _t0 = _time.perf_counter()
        if self.criterion.lower() == "mim":
            # MIM fast path: pure top-k by relevance, InfoSelector.scala:313-315.
            order = sorted(
                feats,
                key=lambda c: (
                    -_tie_key(relevances[c], self.tie_precision),
                    feats.index(c),
                ),
            )
            path = [(c, relevances[c]) for c in order[: self.n_to_select]]
        else:
            n_parts = None if packed is not None else matrix.rdd.getNumPartitions()
            remaining = list(feats)
            # Speculative prefetch (r13, guide §1.2 — the greedy loop is
            # k−1 SEQUENTIAL jobs and at bench scale each pays far more
            # in job-launch latency than in histogram compute): the loop
            # consumes only the pairwise quantities
            # (MI(c; s), CMI(c; s | label)), which do not depend on the
            # iteration they are consumed in — so one launch can compute
            # the pass for the known winner AND for the `width` features
            # most likely to win next (ranked by the same argmax key the
            # selection uses).  When a later winner is already prefetched
            # its pass is skipped outright.  Results are bit-identical by
            # construction: every (c, s) table is the same integer-merged
            # histogram, and updates are replayed one winner at a time in
            # selection order, so float accumulation order never changes
            # (pinned by tests/test_packed.py).  A miss wastes only the
            # speculated bincounts inside an already-launched job; the
            # auto width adapts to the observed consumption (halve on a
            # fully-wasted launch, grow with hits, cap 7) so adversarial
            # data decays to the old one-cond-per-job behavior.
            prefetched: dict[str, dict[str, tuple[float, float]]] = {}
            spec_auto = self.speculation == "auto"
            width = 3 if spec_auto else int(self.speculation)
            consumed_since_launch = 0
            loop_jobs = 0
            spec_hits = 0
            while len(path) < self.n_to_select:
                # tie_precision comparison: module-docstring tie contract
                best = max(
                    remaining,
                    key=lambda c: (
                        _tie_key(state[c].score, self.tie_precision),
                        -feats.index(c),
                    ),
                )
                path.append((best, state[best].score))
                # parity artifact, not control flow: mirrors the
                # reference's setValid(false) (InfoCriterion.scala) —
                # exclusion here is driven by `remaining`
                state[best].valid = False
                remaining.remove(best)
                if len(path) >= self.n_to_select or not remaining:
                    break
                # Redundancy pass: 3-D histograms of every remaining feature
                # vs (selected=best, class) — InfoTheory.scala:445-461.
                # Distributed dense-blob route (see hist3d_mi_cmi): one
                # packed int32 count matrix per (feature, partition)
                # shipped through a per-feature merge, MI/CMI computed
                # executor-side, n_features scalar rows collected.  An
                # Arrow plan, NOT codegen: each iteration is a fresh plan
                # (remaining shrinks, best changes) and posexplode codegen
                # compilation costs seconds per fresh plan.  One-shot
                # passes (relevance init, the hist2d/hist3d gate queries)
                # keep the codegen route.
                if best in prefetched:
                    # the prefetching pass scored a SUPERSET of the
                    # current remaining set (remaining only shrinks)
                    scores = prefetched.pop(best)
                    spec_hits += 1
                    consumed_since_launch += 1
                elif packed is not None:
                    if loop_jobs and spec_auto:
                        width = (
                            min(2 * consumed_since_launch + 1, 7)
                            if consumed_since_launch
                            else width // 2
                        )
                    consumed_since_launch = 0
                    # a speculated cond is only consumable by a FUTURE
                    # pass; the fit needs exactly
                    # n_to_select − len(path) − 1 more of them, so wider
                    # speculation past that bound is guaranteed waste
                    w_eff = min(width, self.n_to_select - len(path) - 1)
                    spec: list[str] = []
                    if w_eff > 0:
                        spec = sorted(
                            (c for c in remaining if c not in prefetched),
                            key=lambda c: (
                                _tie_key(state[c].score, self.tie_precision),
                                -feats.index(c),
                            ),
                            reverse=True,
                        )[:w_eff]
                    multi = packed.hist3d_mi_cmi_multi(
                        remaining, [best] + spec, label, dims, n,
                        emit_f32=self.emit_f32,
                    )
                    loop_jobs += 1
                    scores = multi.pop(best)
                    prefetched.update(multi)
                else:
                    scores = hist3d_mi_cmi(
                        matrix,
                        remaining,
                        best,
                        label,
                        dims,
                        dims[best],
                        y_dim,
                        n,
                        emit_f32=self.emit_f32,
                        n_partitions=n_parts,
                    )
                    loop_jobs += 1
                for c in remaining:
                    state[c].update(*scores[c])
            timings["loop_jobs"] = loop_jobs
            timings["speculation_hits"] = spec_hits

        timings["loop_sec"] = round(_time.perf_counter() - _t0, 3)
        # MIM never runs a redundancy pass — reporting k-1 would hand
        # per-iteration diagnostics a nonsense denominator (r8 review)
        timings["iterations"] = (
            0 if self.criterion.lower() == "mim" else max(len(path) - 1, 0)
        )
        selected = sorted((c for c, _ in path), key=feats.index)
        return InfoThSelectorModel(
            feature_cols=feats,
            label_col=label,
            selected_cols=selected,
            selection_path=path,
            relevances=relevances,
            fit_timings=timings,
        )


class SparseInfoThSelector:
    """Greedy selection over sparse long-format input — the path the
    reference declares but never implemented working
    (``InfoSelector.scala:378-386``; see operators/sparse.py).

    Input: ``nonzeros`` (row_id, feat, x) with x ≠ 0 implicit-zero
    semantics, ``labels`` (row_id, y).  Selection semantics are identical
    to the dense path — verified by the dense-vs-densified test.

    ``loop_engine``, identical output (tests/test_packed.py):

    - ``"sql"`` (default): persisted zipper layout, one co-partitioned
      join + sparse-cell collect per iteration.  Its one-time setup is
      cheapest (the cache materializes in Tungsten, no Python transit),
      so it wins at small k.
    - ``"packed"``: one zipper join attaches labels, then the cells pack
      into row_id-co-partitioned CSC blocks
      (operators/packed.py::PackedSparse); every iteration's z-attach is
      a partition-local scatter — zero per-iteration joins or plans.
      The pack pays a one-time Python/Arrow transit of the cells
      (~6.8 s at sf0.1's 4.6M nonzeros) that 0.30 s/iteration (vs the
      SQL route's ~0.9 s) amortizes from k ≈ 6 selected features up
      AT THAT DATA SIZE (measured sf0.1: k=8 fit 9.0 s packed vs
      10.9 s sql; k=3 the SQL route stays ahead).  The crossover does
      NOT extend with data volume: at 10× (sf1-shape, 16 features /
      ~90M cells, k=10) the cell transit outgrows the per-iteration
      savings — 107.7 s packed vs 86.1 s sql, identical selection —
      because the SQL route's join machinery is JVM-side and
      data-parallel while the pack is a fixed per-byte Python toll.
      Unlike the DENSE packed engine, whose pack REPLACES same-cost
      Catalyst setup and wins at every k and scale, the sparse packed
      engine is a small-data / many-iteration option; the sql default
      is the scale path.
    """

    def __init__(
        self,
        n_features: int,
        n_to_select: int = 10,
        criterion: str = "mrmr",
        beta: float = 1.0,
        emit_f32: bool = True,
        tie_precision: int | None = 5,
        loop_engine: str = "sql",
    ) -> None:
        if loop_engine not in ("packed", "sql"):
            raise ValueError(f"loop_engine must be 'packed' or 'sql', got {loop_engine!r}")
        self.n_features = int(n_features)
        self.n_to_select = int(n_to_select)
        self.criterion = criterion
        self.beta = beta
        self.emit_f32 = emit_f32
        self.tie_precision = tie_precision
        self.loop_engine = loop_engine

    def fit(self, nonzeros: DataFrame, labels: DataFrame) -> InfoThSelectorModel:
        if self.n_to_select > self.n_features:
            raise ValueError(
                f"n_to_select={self.n_to_select} exceeds n_features={self.n_features}"
            )
        import numpy as np
        from pyspark.sql import functions as F

        # One data-sized join for the whole fit: attach the label to every
        # nonzero cell, persist partitioned+sorted by row_id.  Every
        # per-iteration join (remaining cells vs. the selected feature's
        # column) then has BOTH sides co-partitioned on row_id — no
        # further shuffle of the big table, k iterations reuse one layout.
        # Zero-crediting (InfoTheory.scala:296-304, :377-384) moves to the
        # driver: it only needs the dims-bounded y / (y,z) histograms.
        # The merge-join HINT is load-bearing twice over: (1) it stops AQE
        # electing a broadcast join (whose output would keep the file
        # partitioning, not row_id's, breaking the zipper property — and
        # broadcasting a row-count-sized label column is unbounded at
        # scale anyway); (2) the SMJ's own exchanges leave the output
        # hash-partitioned AND sorted by row_id, so no explicit
        # repartition/sort is needed — the round-3 build paid one extra
        # full shuffle of the joined table here (measured: 3.8 s → 2.1 s
        # at sf0.1).  sortWithinPartitions is kept as a declarative
        # guard: it collapses to a no-op while the SMJ ordering holds.
        packed = None
        nzy_joined = nonzeros.join(labels.hint("merge"), "row_id").select(
            "row_id", "feat", "x", "y"
        )
        if self.loop_engine == "packed":
            # The zipper join's SMJ exchange hash partitions its output by
            # row_id (co-locating every cell of a row — what makes the
            # per-iteration z-attach partition-local), and PackedSparse
            # scans that output exactly once.  Two guards protect the
            # co-location property the packed histograms silently depend
            # on: (1) AQE's skew-join split — the one optimizer rewrite
            # that re-scatters a hash-partitioned join output by mapper
            # ranges — is disabled for the materializing jobs; (2) the
            # pack verifies Σ per-partition distinct rows == global
            # distinct rows and raises instead of silently mis-scoring.
            # The transient persist means the join runs once for both the
            # distinct count and the pack; it is dropped immediately
            # after (the pack is the loop's cache).
            from flink_infotheoretic_feature_selection_spark.operators.packed import PackedSparse

            spark = nonzeros.sparkSession
            skew_key = "spark.sql.adaptive.skewJoin.enabled"
            cached = nzy_joined.persist(StorageLevel.MEMORY_AND_DISK)
            # _SKEW_CONF_LOCK serializes the set/restore window: two
            # concurrent fits interleaving set/restore could otherwise
            # leave the session conf wrong after both finish (r9,
            # advisor find).  The override is still SESSION-global while
            # held — unrelated queries running on the same session
            # during the pack lose skew-join mitigation for that window
            # (availability only; the pack's co-location check catches
            # any correctness fallout).  Spark offers no per-job conf
            # scope for AQE rewrites, so this is the best available.
            with _SKEW_CONF_LOCK:
                skew_prev = spark.conf.get(skew_key, "true")
                try:
                    spark.conf.set(skew_key, "false")
                    distinct_rows = cached.agg(
                        F.countDistinct("row_id").alias("d")
                    ).collect()[0]["d"]
                    packed = PackedSparse.pack(
                        cached, self.n_features, expected_distinct_rows=int(distinct_rows)
                    )
                finally:
                    spark.conf.set(skew_key, skew_prev)
                    cached.unpersist()
            nzy = None
        else:
            nzy = (
                nzy_joined.sortWithinPartitions("row_id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        try:
            nf = self.n_features
            y_hist = {}
            for r in labels.groupBy("y").agg(F.count("*").alias("cnt")).collect():
                if r["y"] is None:
                    raise ValueError("labels contain NULL y values")
                y_hist[int(r["y"])] = int(r["cnt"])
            if not y_hist:
                raise ValueError(
                    "labels is empty — cannot derive class priors"
                )
            n = sum(y_hist.values())
            y_dim = max(y_hist) + 1
            if min(y_hist) < 0:
                raise ValueError("labels must be >= 0 in the sparse path")
            if y_dim > 256:
                # same byte contract as the features: one corrupt label
                # would size n_y and EVERY per-feature histogram by it
                raise ValueError(
                    f"label values exceed the byte range (dim>256): {y_dim}"
                )
            n_y = np.zeros(y_dim, dtype=np.int64)
            for y_, c_ in y_hist.items():
                n_y[y_] = c_
            # dims: per-feature max+1 (≥1 so empty features still get x=0)
            h2nz = None
            if packed is not None:
                # dims ride the init histogram pass — one job for both
                drow, h2nz = packed.dims_and_hist2d(y_dim)
            else:
                drow = {
                    r["feat"]: int(r["d"])
                    for r in nzy.groupBy("feat").agg((F.max("x") + 1).alias("d")).collect()
                }
            # Same 256 cap as the dense path's feature_dims: without it a
            # single corrupt cell (x = 1e6) would size every per-feature
            # ndarray by it — hundreds of GB of driver allocations
            # instead of one clear error.
            over = {i: d for i, d in drow.items() if d > 256}
            if over:
                raise ValueError(
                    f"sparse feature values exceed the byte range (dim>256): {over}"
                )
            dims = {i: max(drow.get(i, 1), 1) for i in range(nf)}

            def collect2d(hdf) -> dict[int, np.ndarray]:
                out = {i: np.zeros((dims[i], y_dim), dtype=np.int64) for i in range(nf)}
                pdf = hdf.toPandas()
                # negative values must ERROR: numpy fancy indexing would
                # silently wrap them to the end of the histogram (the
                # dense collect_hist2d raises for the same input)
                if len(pdf) and (pdf[["x", "y"]].to_numpy() < 0).any():
                    raise ValueError("sparse histogram indices must be >= 0")
                for f_, x_, y_, c_ in pdf[["feat", "x", "y", "cnt"]].itertuples(index=False):
                    out[f_][x_, y_] = c_
                # credited zeros: count(x=0, y) = N_y − Σ_{x≠0} count(x, y)
                for i in range(nf):
                    out[i][0] = n_y - out[i][1:].sum(axis=0)
                    if (out[i][0] < 0).any():
                        # duplicate (row_id, feat) cells over-count the
                        # nonzeros past the label totals; mutual_info's
                        # p>0 mask would silently skip the negative cell
                        raise ValueError(
                            "nonzero counts exceed label totals for "
                            f"feature {i}: duplicate (row_id, feat) cells"
                        )
                return out

            if packed is not None:
                h2 = h2nz
                # credited zeros: count(x=0, y) = N_y − Σ_{x≠0} count(x, y)
                for i in range(nf):
                    h2[i][0] = n_y - h2[i][1:].sum(axis=0)
                    if (h2[i][0] < 0).any():
                        raise ValueError(
                            "nonzero counts exceed label totals for "
                            f"feature {i}: duplicate (row_id, feat) cells"
                        )
            else:
                h2 = collect2d(
                    nzy.groupBy("feat", "x", "y").agg(F.count("*").alias("cnt"))
                )
            relevances = {
                i: mutual_info(h2[i], n, emit_f32=self.emit_f32) for i in range(nf)
            }
            state = {
                i: criterion_factory(self.criterion, self.beta).init(relevances[i])
                for i in range(nf)
            }

            path: list[tuple[int, float]] = []
            if self.criterion.lower() == "mim":
                order = sorted(
                    range(nf),
                    key=lambda i: (-_tie_key(relevances[i], self.tie_precision), i),
                )
                path = [(i, relevances[i]) for i in order[: self.n_to_select]]
            else:
                remaining = list(range(nf))
                while len(path) < self.n_to_select:
                    # tie_precision comparison: module-docstring tie contract
                    best = max(
                        remaining,
                        key=lambda i: (_tie_key(state[i].score, self.tie_precision), -i),
                    )
                    path.append((best, state[best].score))
                    state[best].valid = False
                    remaining.remove(best)
                    if len(path) >= self.n_to_select or not remaining:
                        break
                    sel_dim = dims[best]
                    # full (z, y) totals — NO Spark job: count(x_best=z,
                    # label=y) is exactly the init-time 2-D histogram
                    # h2[best] (credited zeros included).  The round-3
                    # build re-aggregated the selected column every
                    # iteration; an interim version kept a transposed
                    # copy only to transpose it back at the use site.
                    n_zy = h2[best]

                    if packed is not None:
                        # partition-local z-attach + bincount, zero joins
                        h3 = packed.hist3d_nonzero(
                            remaining, best, dims, sel_dim, y_dim
                        )
                        for i in remaining:
                            out_i = h3[i]
                            # credited zeros: count(x=0, z, y) = N_zy − Σ_{x≠0}
                            out_i[0] = n_zy - out_i[1:].sum(axis=0)
                            mi, cmi = mi_and_cmi(out_i, n, emit_f32=self.emit_f32)
                            state[i].update(mi, cmi)
                        continue

                    # z column = selected feature's nonzeros (absent ⇒ z=0);
                    # same row_id partitioning as nzy, so the join below is
                    # exchange-free (AQE may still elect broadcast).
                    nz_best = nzy.filter(F.col("feat") == best).select(
                        "row_id", F.col("x").alias("z")
                    )

                    h3df = (
                        nzy.filter(F.col("feat").isin(remaining))
                        .join(nz_best, "row_id", "left")
                        .groupBy(
                            "feat", "x", "y", F.coalesce("z", F.lit(0)).alias("z")
                        )
                        .agg(F.count("*").alias("cnt"))
                    )
                    # mi_and_cmi convention: counts[x, y=selected, z=class]
                    # (InfoTheory.scala:445-461) — our y is the class and z
                    # the selected feature, so swap on fill.
                    out = {
                        i: np.zeros((dims[i], sel_dim, y_dim), dtype=np.int64)
                        for i in remaining
                    }
                    pdf = h3df.toPandas()
                    if len(pdf) and (pdf[["x", "y", "z"]].to_numpy() < 0).any():
                        raise ValueError("sparse histogram indices must be >= 0")
                    for f_, x_, y_, z_, c_ in pdf[
                        ["feat", "x", "y", "z", "cnt"]
                    ].itertuples(index=False):
                        out[f_][x_, z_, y_] = c_
                    # credited zeros: count(x=0, z, y) = N_yz − Σ_{x≠0}
                    for i in remaining:
                        out[i][0] = n_zy - out[i][1:].sum(axis=0)
                        mi, cmi = mi_and_cmi(out[i], n, emit_f32=self.emit_f32)
                        state[i].update(mi, cmi)

            names = [f"f{i}" for i in range(nf)]
            selected = sorted(i for i, _ in path)
            return InfoThSelectorModel(
                feature_cols=names,
                label_col="y",
                selected_cols=[names[i] for i in selected],
                selection_path=[(names[i], s) for i, s in path],
                relevances={names[i]: relevances[i] for i in range(nf)},
            )
        finally:
            if packed is not None:
                packed.unpersist()
            if nzy is not None:
                nzy.unpersist()
