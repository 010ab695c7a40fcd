"""Replica of the driver's correctness gate, runnable per-query.

Usage:  python tools/gate_check.py [sf_dir] [query ...]

Builds a BARE SparkSession (deliberately NOT session.get_spark — the
driver harness constructs its own session without our confs, so this
catches any accidental dependency on session-level settings), runs each
requested queries() entry and its oracle_sql() twin in DuckDB at the
given sf_dir, and reports rows/schema/value-hash matches exactly like
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import sys
import traceback

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from flink_infotheoretic_feature_selection_spark.datasets import TABLES  # noqa: E402


def normalize(rows, columns):
    """BIT-EXACT canonical form: floats compare by their IEEE-754 bit
    pattern (so +0.0 != -0.0 and last-ulp differences FAIL, exactly like
    the driver's value hash).  The round-3 replica rounded to 6 decimals
    here, which masked the very divergence class the driver catches —
    never reintroduce rounding."""
    import struct

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = ("f64", struct.pack("<d", v).hex())
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def nonscalar_columns(sdf):
    """Gate outputs must be FLAT — scalar columns only.  The driver's
    canonicalizer pandas-sorts the frame and dies on any array/map/struct
    column ("unhashable type: 'list'" — media_features in r1,
    embedding_quantize in r4) while this replica's repr-sort silently
    handles it; that gap is how r4 shipped a locally-green gate that
    crashed the driver.  Fix recipe: emit long format — one row per
    element with an index column, e.g. (vec_id, pos, qv, scale) instead
    of (vec_id, q array, scale) — see _quantize_sql / extract_features_long."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def duck_type_flags(duck, sql):
    """DuckDB result columns whose ARROW type a bit-level hash serializes
    differently from any Spark output type: HUGEINT/decimal128 (from
    sum(integer)), uints, large_* — the round-3 hash-fail root cause."""
    arrow = duck.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow()
    return {
        f.name: str(f.type)
        for f in arrow.schema
        if any(k in str(f.type) for k in ("decimal", "128", "uint", "large_"))
    }


def main() -> None:
    args = sys.argv[1:]
    # a path argument is recognized ANYWHERE (not just argv[1]) — a path
    # after a query name used to be silently dropped, validating the
    # default scale factor instead of the requested one
    paths = [a for a in args if "/" in a]
    if len(paths) > 1:
        sys.exit(f"at most one sf_dir path argument allowed, got: {paths}")
    sf_dir = paths[0] if paths else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = names or sorted(queries)
    failures = 0
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            bad_cols = nonscalar_columns(sdf)
            if bad_cols:
                failures += 1
                print(
                    f"{name}: FAIL non-scalar output columns {bad_cols} — the "
                    "driver canonicalizer crashes on these (unhashable list); "
                    "emit LONG format instead (one row per element + index "
                    "column, see tools/gate_check.py::nonscalar_columns)"
                )
                continue
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
            if name not in oracles:
                print(f"{name}: no_oracle rows={len(spark_rows)}")
                continue
            res = duck.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            schema_ok = sorted(spark_cols) == sorted(duck_cols)
            rows_ok = len(spark_rows) == len(duck_rows)
            a = normalize(spark_rows, spark_cols)
            b = normalize(duck_rows, duck_cols)
            flags = duck_type_flags(duck, oracles[name])
            hash_ok = a == b and not flags
            status = "PASS" if (schema_ok and rows_ok and hash_ok) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name}: {status} rows={len(spark_rows)}/{len(duck_rows)} "
                f"schema={schema_ok} hash={hash_ok}"
            )
            if flags:
                print(f"  hash-unstable duckdb types: {flags}")
            if not schema_ok:
                print(f"  spark cols: {spark_cols}\n  duck cols:  {duck_cols}")
            if schema_ok and not hash_ok:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                bset, aset = set(b), set(a)  # hoisted: rebuilding per
                # element is quadratic — a 60k-row diff would hang
                only_a = [x for x in a if x not in bset][:3]
                only_b = [y for y in b if y not in aset][:3]
                print(f"  first diffs: {diff}\n  only-spark: {only_a}\n  only-duck: {only_b}")
        except Exception:
            failures += 1
            print(f"{name}: ERROR")
            traceback.print_exc(limit=5)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
