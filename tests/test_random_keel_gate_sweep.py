"""Randomized cross-engine sweep for the KEEL reader — the io twin of
the corpus/events/matrix sweeps.

The keel_read gate parses ONE fixed file; this sweep generates random
KEEL datasets (random attribute specs — nominal value lists, integer /
real kinds — random @inputs reordering, dense rows, Weka-style sparse
rows, '?' / '<null>' missing tokens, blank and @-comment lines, ragged
whitespace) and checks ``sources.keel.read_keel`` cell-for-cell against
the generic DuckDB oracle (``__spark_entry__.keel_oracle_sql``), which
re-parses the same file through DuckDB's CSV reader with the
nominal->index map unrolled in SQL.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from __spark_entry__ import keel_oracle_sql
from flink_infotheoretic_feature_selection_spark.sources.keel import read_keel

NOMINAL_POOLS = [
    ["red", "green", "blue"],
    ["yes", "no"],
    ["a", "b", "c", "d"],
    ["low", "mid", "high"],
]


def _random_keel(seed: int) -> tuple[str, list, list, str]:
    rng = random.Random(seed)
    n_attr = rng.randint(3, 7)
    attrs = []
    for i in range(n_attr):
        kind = rng.choice(["nominal", "integer", "real"])
        if kind == "nominal":
            attrs.append((f"a{i}", rng.choice(NOMINAL_POOLS)))
        else:
            attrs.append((f"a{i}", None))
    label, label_vals = f"a{n_attr - 1}", attrs[-1][1]
    if label_vals is None:  # label must be nominal for the index map
        attrs[-1] = (label, rng.choice(NOMINAL_POOLS))
    inputs = [n for n, _ in attrs[:-1]]
    rng.shuffle(inputs)

    lines = ["@relation rand-keel"]
    for name, vals in attrs:
        if vals:
            lines.append(f"@attribute {name} {{{', '.join(vals)}}}")
        else:
            kind = rng.choice(["integer [0, 9]", "real [0.0, 5.0]"])
            lines.append(f"@attribute {name} {kind}")
    lines.append(f"@inputs {', '.join(inputs)}")
    lines.append(f"@outputs {label}")
    lines.append("@data")

    def cell(vals) -> str:
        if rng.random() < 0.12:
            return rng.choice(["?", "<null>"])
        if vals:
            return rng.choice(vals)
        return rng.choice(["0", "3", "7", "1.5", "-2.25", " 4 "]).strip()

    for _ in range(rng.randint(8, 20)):
        roll = rng.random()
        if roll < 0.08:
            lines.append("")  # blank line: filtered
        elif roll < 0.14:
            lines.append("@garbage header-ish line, skipped")
        elif roll < 0.40:  # sparse row over a random subset of attrs
            idxs = sorted(rng.sample(range(len(attrs)), rng.randint(0, len(attrs))))
            ents = []
            for i in idxs:
                vals = attrs[i][1]
                v = rng.choice(vals) if vals else rng.choice(["1", "2.5", "8"])
                ents.append(f"{i}{' ' * rng.randint(1, 3)}{v}")
            lines.append("{" + ", ".join(ents) + "}")
        else:  # dense row, ragged whitespace
            pad = " " * rng.randint(0, 2)
            lines.append(
                ", ".join(f"{pad}{cell(vals)}{pad}" for _, vals in attrs)
            )
    # the sweep's sanity floor asserts >= 5 data rows; blank/@-garbage
    # rolls can leave fewer (seed 408: 8 body lines, 4 data rows) — top
    # up with dense rows so the floor is a property of the GENERATOR,
    # not of the dice
    n_data = sum(
        1 for ln in lines[lines.index("@data") + 1 :]
        if ln.strip() and not ln.strip().startswith("@")
    )
    for _ in range(max(0, 5 - n_data)):
        lines.append(", ".join(cell(vals) for _, vals in attrs))
    return "\n".join(lines) + "\n", attrs, inputs, label


@pytest.mark.parametrize("seed", [3, 17, 41, 59])
def test_keel_reader_cross_engine_on_random_files(spark, tmp_path, seed):
    content, attrs, inputs, label = _random_keel(seed)
    path = str(tmp_path / f"rand_{seed}.dat")
    with open(path, "w") as fh:
        fh.write(content)

    sdf = read_keel(spark, path)
    got = sorted(
        (tuple(r) for r in sdf.select(*sorted(sdf.columns)).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
    osql = keel_oracle_sql(path, attrs, inputs, label)
    exp = sorted(
        (
            tuple(r)
            for r in duckdb.connect()
            .execute(f"SELECT {cols} FROM ({osql})")
            .fetchall()
        ),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got == exp, (seed, got[:4], exp[:4])
    assert len(got) >= 5  # the generator produced real data rows


@pytest.mark.parametrize("seed", [7, 29])
def test_keel_write_roundtrip_on_random_files(spark, tmp_path, seed):
    # r12: write_keel closure — random file -> read -> write -> read
    # must be value-identical (incl. '?' NULLs, nominal re-mapping, and
    # out-of-declaration fractional values under integer kinds)
    from flink_infotheoretic_feature_selection_spark.sources.keel import (
        parse_keel_header,
        write_keel,
    )

    content, attrs, inputs, label = _random_keel(seed)
    src = str(tmp_path / f"src_{seed}.dat")
    with open(src, "w") as fh:
        fh.write(content)
    header = parse_keel_header(content.splitlines())
    df = read_keel(spark, src)
    out = str(tmp_path / "export")
    write_keel(df, out, header)
    back = read_keel(spark, f"{out}/body", header_path=f"{out}/header.dat")
    key = lambda t: tuple((v is None, v) for v in t)
    got = sorted(map(tuple, back.select(*df.columns).collect()), key=key)
    exp = sorted(map(tuple, df.collect()), key=key)
    assert got == exp, (seed, got[:4], exp[:4])
    assert len(got) >= 5
