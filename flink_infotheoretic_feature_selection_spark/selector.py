"""InfoThSelector — greedy information-theoretic feature selection.

Re-expresses the reference's flagship (``InfoSelector.scala``; lifecycle
traced in SURVEY.md §3.1) as an idiomatic PySpark Estimator/Model:

- fit stage 1: cache the wide tinyint matrix (the Spark analogue of the
  reference's columnar transpose + HDFS persist, ``InfoSelector.scala:
  425-437`` — Tungsten columnar cache + Arrow exchange replace the
  hand-rolled byte layout).
- fit stage 2: per-feature dims (``counterByFeat``), 2-D histograms vs the
  label, relevances = MI(X; class) (``InfoTheory.scala:413-432``).
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
  order is nondeterministic — SURVEY.md §7.1).
- the sparse path is handled by the same columnar code (the reference's
  sparse path throws, ``InfoSelector.scala:378-386``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from flink_infotheoretic_feature_selection_spark.functions.criteria import Criterion, criterion_factory
from flink_infotheoretic_feature_selection_spark.functions.infotheory import mi_and_cmi, mutual_info
from flink_infotheoretic_feature_selection_spark.operators.histogram import (
    collect_hist2d,
    collect_hist3d,
    feature_dims,
    hist2d,
    hist3d,
)

__all__ = ["InfoThSelector", "InfoThSelectorModel"]


@dataclass
class InfoThSelectorModel:
    """Fitted model: selected feature columns (ascending, like
    ``InfoSelector.scala:491``) plus the selection path with scores."""

    feature_cols: list[str]
    label_col: str
    selected_cols: list[str]
    selection_path: list[tuple[str, float]]  # (col, score at selection time)
    relevances: dict[str, float]

    def transform(self, df: DataFrame) -> DataFrame:
        """Project to (selected features, label) — narrow Catalyst select,
        the reference's transform (``InfoSelector.scala:229-263``)."""
        keep = [c for c in self.selected_cols if c in df.columns]
        cols = keep + ([self.label_col] if self.label_col in df.columns else [])
        return df.select(*cols)


class InfoThSelector:
    """Estimator. ``criterion`` ∈ {mim, mifs, jmi, mrmr, cmim, if, icap};
    default mrmr (``InfoSelector.scala:149``)."""

    def __init__(
        self,
        n_to_select: int = 10,
        criterion: str = "mrmr",
        feature_cols: list[str] | None = None,
        label_col: str = "label",
        beta: float = 1.0,
        emit_f32: bool = True,
    ) -> None:
        self.n_to_select = int(n_to_select)
        self.criterion = criterion
        self.feature_cols = feature_cols
        self.label_col = label_col
        self.beta = beta
        self.emit_f32 = emit_f32

    def fit(self, df: DataFrame) -> InfoThSelectorModel:
        feats = self.feature_cols or [c for c in df.columns if c != self.label_col]
        if self.n_to_select > len(feats):
            # reference: require(nToSelect < nFeatures), InfoSelector.scala:419
            raise ValueError(
                f"n_to_select={self.n_to_select} exceeds n_features={len(feats)}"
            )
        label = self.label_col

        matrix = df.select(*feats, label).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._fit_cached(matrix, feats, label)
        finally:
            matrix.unpersist()

    # -- internal ----------------------------------------------------------

    def _fit_cached(self, matrix: DataFrame, feats: list[str], label: str) -> InfoThSelectorModel:
        dims = feature_dims(matrix, feats + [label])
        y_dim = dims[label]
        n = matrix.count()

        # Stage 2 — relevances: one histogram pass over all features.
        h2 = collect_hist2d(hist2d(matrix, feats, label, dims, y_dim), feats, dims, y_dim)
        relevances = {c: mutual_info(h2[c], n, emit_f32=self.emit_f32) for c in feats}

        state: dict[str, Criterion] = {
            c: criterion_factory(self.criterion, self.beta).init(relevances[c]) for c in feats
        }

        path: list[tuple[str, float]] = []
        if self.criterion.lower() == "mim":
            # MIM fast path: pure top-k by relevance, InfoSelector.scala:313-315.
            order = sorted(feats, key=lambda c: (-relevances[c], feats.index(c)))
            path = [(c, relevances[c]) for c in order[: self.n_to_select]]
        else:
            remaining = list(feats)
            while len(path) < self.n_to_select:
                best = max(remaining, key=lambda c: (state[c].score, -feats.index(c)))
                path.append((best, state[best].score))
                state[best].valid = False
                remaining.remove(best)
                if len(path) >= self.n_to_select or not remaining:
                    break
                # Redundancy pass: 3-D histograms of every remaining feature
                # vs (selected=best, class) — InfoTheory.scala:445-461.
                h3 = collect_hist3d(
                    hist3d(matrix, remaining, best, label, dims, dims[best], y_dim),
                    remaining,
                    dims,
                    dims[best],
                    y_dim,
                )
                for c in remaining:
                    mi, cmi = mi_and_cmi(h3[c], n, emit_f32=self.emit_f32)
                    state[c].update(mi, cmi)

        selected = sorted((c for c, _ in path), key=feats.index)
        return InfoThSelectorModel(
            feature_cols=feats,
            label_col=label,
            selected_cols=selected,
            selection_path=path,
            relevances=relevances,
        )
