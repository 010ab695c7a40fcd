"""The 7 information-theoretic selection criteria + factory.

Exact update algebra from the reference (``InfoThCriterion.scala``; table
in SURVEY.md §2.7 — these ARE the product):

| criterion | score                       | update(mi, cmi)                     | cite (InfoCriterion) |
|-----------|-----------------------------|-------------------------------------|----------------------|
| MIM       | rel                         | no-op (top-k fast path)             | :77-87               |
| MIFS(β)   | rel − β·red                 | red += mi                           | :92-108              |
| JMI       | rel − red/k + condRed/k     | red += mi; condRed += cmi; k += 1   | :114-137             |
| mRMR      | rel − red/k                 | red += mi; k += 1                   | :143-164 (default)   |
| CMIM      | rel − modifier              | modifier = max(modifier, mi − cmi)  | :169-185             |
| IF        | = CMIM                      | = CMIM                              | :191-193             |
| ICAP      | rel − modifier              | modifier += max(0, mi − cmi)        | :199-214             |

State lives on the driver (one tiny object per feature) — the Spark
analogue of the reference's ``DataSet[(Int, InfoThCriterion)]`` which only
existed because Flink iteration state had to be distributed.
"""

from __future__ import annotations

__all__ = ["Criterion", "criterion_factory", "CRITERION_NAMES"]


class Criterion:
    """Base: relevance-only scoring (MIM). ``InfoThCriterion.scala:23-71``."""

    uses_redundancy = False

    def __init__(self) -> None:
        self.relevance = 0.0
        self.valid = True

    def init(self, relevance: float) -> "Criterion":
        self.relevance = float(relevance)
        return self

    def update(self, mi: float, cmi: float) -> None:  # noqa: ARG002
        pass

    @property
    def score(self) -> float:
        return self.relevance


class Mim(Criterion):
    pass


class Mifs(Criterion):
    uses_redundancy = True

    def __init__(self, beta: float = 1.0) -> None:
        super().__init__()
        self.beta = float(beta)
        self.redundancy = 0.0

    def update(self, mi: float, cmi: float) -> None:  # noqa: ARG002
        self.redundancy += mi

    @property
    def score(self) -> float:
        return self.relevance - self.beta * self.redundancy


class Jmi(Criterion):
    uses_redundancy = True

    def __init__(self) -> None:
        super().__init__()
        self.redundancy = 0.0
        self.cond_redundancy = 0.0
        self.k = 0

    def update(self, mi: float, cmi: float) -> None:
        self.redundancy += mi
        self.cond_redundancy += cmi
        self.k += 1

    @property
    def score(self) -> float:
        if self.k == 0:
            return self.relevance
        return self.relevance - self.redundancy / self.k + self.cond_redundancy / self.k


class Mrmr(Criterion):
    uses_redundancy = True

    def __init__(self) -> None:
        super().__init__()
        self.redundancy = 0.0
        self.k = 0

    def update(self, mi: float, cmi: float) -> None:  # noqa: ARG002
        self.redundancy += mi
        self.k += 1

    @property
    def score(self) -> float:
        if self.k == 0:
            return self.relevance
        return self.relevance - self.redundancy / self.k


class Cmim(Criterion):
    uses_redundancy = True

    def __init__(self) -> None:
        super().__init__()
        self.modifier = 0.0

    def update(self, mi: float, cmi: float) -> None:
        self.modifier = max(self.modifier, mi - cmi)

    @property
    def score(self) -> float:
        return self.relevance - self.modifier


class If_(Cmim):
    """Informative Fragments — identical to CMIM (``InfoThCriterion.scala:191-193``)."""


class Icap(Criterion):
    uses_redundancy = True

    def __init__(self) -> None:
        super().__init__()
        self.modifier = 0.0

    def update(self, mi: float, cmi: float) -> None:
        self.modifier += max(0.0, mi - cmi)

    @property
    def score(self) -> float:
        return self.relevance - self.modifier


CRITERION_NAMES = ("mim", "mifs", "jmi", "mrmr", "cmim", "if", "icap")


def criterion_factory(name: str, beta: float = 1.0) -> Criterion:
    """Construct a criterion by name (``InfoThCriterionFactory.scala:35-63``).

    ``beta`` only affects MIFS (``InfoThCriterionFactory.scala:54``).

    DELIBERATE DIVERGENCE: the reference factory defaults ``beta = 0.0f``
    (``InfoThCriterionFactory.scala:37``), which degenerates MIFS to MIM
    (zero redundancy penalty).  This factory defaults ``beta = 1.0`` —
    Battiti's original MIFS setting — so default MIFS selections differ
    from the reference's; pass ``beta=0.0`` for byte-parity.
    """
    name = name.lower()
    if name == "mim":
        return Mim()
    if name == "mifs":
        return Mifs(beta)
    if name == "jmi":
        return Jmi()
    if name == "mrmr":
        return Mrmr()
    if name == "cmim":
        return Cmim()
    if name == "if":
        return If_()
    if name == "icap":
        return Icap()
    raise ValueError(f"unknown criterion {name!r}; expected one of {CRITERION_NAMES}")
