"""Information-theory math over contingency tables.

Formulas reproduced from the reference (Brown et al. JMLR 2012 framework):

- mutual information  MI(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))),
  zero cells skipped — ``InfoTheory.scala:62-96`` (formula at 80-89).
- conditional mutual information
  CMI(X;Y|Z) = Σ_z p(z) Σ_{x,y} p(xy|z)·log2(p(xy|z)/(p(x|z)p(y|z))),
  with MI fused in the same pass — ``InfoTheory.scala:110-176``
  (formula at 150-168).
- entropy (defined but dead code in the reference,
  ``InfoTheory.scala:638-651``) — provided for completeness.

The reference accumulates in double and emits Float32
(``InfoTheory.scala:90``, ``:169``); we accumulate in float64 and expose
``np.float32`` casts at the API edge via ``emit_f32``.

These run on the *driver* over collected count tables — the tables are at
most ``n_features × 256 × 256`` cells regardless of data scale, so this is
never a distributed computation (matches the reference's design where
probability tables are small broadcast/cached sides).
"""

from __future__ import annotations

import numpy as np

__all__ = ["mutual_info", "mi_and_cmi", "entropy"]


def mutual_info(counts: np.ndarray, n: int, emit_f32: bool = False) -> float:
    """MI(X;Y) from a 2-D count table ``counts[x, y]``."""
    p = counts.astype(np.float64) / float(n)
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    mask = p > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = p * np.log2(p / (px * py))
    mi = float(terms[mask].sum())
    return float(np.float32(mi)) if emit_f32 else mi


def mi_and_cmi(counts: np.ndarray, n: int, emit_f32: bool = False) -> tuple[float, float]:
    """(MI(X;Y), CMI(X;Y|Z)) from a 3-D count table ``counts[x, y, z]``.

    In the greedy loop X = candidate feature, Y = newly selected feature,
    Z = class — matching ``InfoTheory.scala:445-461`` where the 3-D
    histogram is built vs (argmax feature, class) and
    ``computeConditionalMutualInfo`` fuses both quantities.
    """
    c = counts.astype(np.float64) / float(n)
    pz = c.sum(axis=(0, 1))               # (zd,)
    pxz = c.sum(axis=1)                   # (xd, zd)
    pyz = c.sum(axis=0)                   # (yd, zd)

    mi = mutual_info(counts.sum(axis=2), n)

    # CMI: Σ pz · (c/pz)·log2( c·pz / (pxz·pyz) )  — the pz outside and the
    # 1/pz inside cancel to   Σ c·log2(c·pz/(pxz·pyz)).
    denom = pxz[:, None, :] * pyz[None, :, :]
    num = c * pz[None, None, :]
    mask = (c > 0) & (denom > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = c * np.log2(num / denom)
    cmi = float(terms[mask].sum())

    if emit_f32:
        return float(np.float32(mi)), float(np.float32(cmi))
    return mi, cmi


def entropy(counts: np.ndarray, n: int) -> float:
    """H(X) = −Σ (q/n)·log2(q/n) over a 1-D count vector.

    Reference defines this but never calls it (``InfoTheory.scala:638-651``).
    """
    p = counts.astype(np.float64) / float(n)
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())
