"""Criterion update algebra vs hand-computed values (SURVEY.md §2.7 table)."""

import pytest

from flink_infotheoretic_feature_selection_spark.functions.criteria import CRITERION_NAMES, criterion_factory


def test_factory_all_names():
    for name in CRITERION_NAMES:
        c = criterion_factory(name)
        c.init(0.5)
        assert c.score == 0.5


def test_factory_unknown():
    with pytest.raises(ValueError):
        criterion_factory("nope")


def test_mim_update_noop():
    c = criterion_factory("mim").init(0.8)
    c.update(0.5, 0.1)
    assert c.score == 0.8


def test_mifs_beta():
    c = criterion_factory("mifs", beta=0.5).init(1.0)
    c.update(0.4, 0.0)
    c.update(0.2, 0.0)
    assert c.score == pytest.approx(1.0 - 0.5 * 0.6)


def test_jmi():
    c = criterion_factory("jmi").init(1.0)
    c.update(0.4, 0.1)
    c.update(0.2, 0.3)
    assert c.score == pytest.approx(1.0 - 0.6 / 2 + 0.4 / 2)


def test_mrmr():
    c = criterion_factory("mrmr").init(1.0)
    assert c.score == 1.0  # k=0 → relevance
    c.update(0.4, 99.0)  # cmi ignored
    c.update(0.2, -1.0)
    assert c.score == pytest.approx(1.0 - 0.3)


def test_cmim_and_if():
    for name in ("cmim", "if"):
        c = criterion_factory(name).init(1.0)
        c.update(0.5, 0.2)  # modifier = 0.3
        c.update(0.4, 0.3)  # max(0.3, 0.1) = 0.3
        c.update(0.9, 0.1)  # max(0.3, 0.8) = 0.8
        assert c.score == pytest.approx(0.2)


def test_icap():
    c = criterion_factory("icap").init(1.0)
    c.update(0.5, 0.2)  # +0.3
    c.update(0.1, 0.4)  # max(0, -0.3) = 0
    assert c.score == pytest.approx(0.7)


def test_mifs_default_beta_documented_divergence():
    # Reference factory defaults beta=0.0 (InfoThCriterionFactory.scala:37),
    # which makes MIFS degenerate to MIM.  This repo deliberately defaults
    # beta=1.0 (documented in criterion_factory); beta=0.0 restores parity.
    default = criterion_factory("mifs").init(1.0)
    default.update(0.4, 0.0)
    assert default.score == pytest.approx(1.0 - 0.4)  # penalty active

    parity = criterion_factory("mifs", beta=0.0).init(1.0)
    parity.update(0.4, 0.0)
    mim = criterion_factory("mim").init(1.0)
    mim.update(0.4, 0.0)
    assert parity.score == mim.score == 1.0
