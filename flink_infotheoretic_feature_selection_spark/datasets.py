"""Dataset loaders + the deterministic feature-matrix spec (FIXTURES.md F1).

The feature matrix `features_dense` is derived from `lineitem` with pure
arithmetic (mod / clamp / datediff) so that Spark SQL and DuckDB compute
bit-identical tinyint values — this is the fixture every info-theory
operator and its DuckDB oracle run against.

Reference data model being reproduced: byte-valued feature columns plus a
label column (reference `InfoSelector.scala:404-416` requires values
representable as bytes; label ships as the last column,
`InfoSelector.scala:431`).

Scale note: every expression here is a narrow per-row map — at 100 TB it
fuses into the parquet scan inside one WholeStageCodegen stage, no
shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Feature spec.  Each entry is (name, expr) where expr is valid in BOTH
# Spark SQL and DuckDB, or (name, spark_expr, duckdb_expr) where dialects
# diverge (datediff).  All results are integers in [0, 127] so the
# TINYINT cast is lossless in both engines.  ``_DD`` is the day offset of
# l_shipdate — the only dialect-specific building block.
# ---------------------------------------------------------------------------
_DD_SPARK = "datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01')"
_DD_DUCK = "datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))"

_RAW_SPEC: list[tuple[str, ...]] = [
    ("f0", "CAST(l_quantity AS INT) % 50"),
    ("f1", "CAST(FLOOR(l_extendedprice / 1000.0) AS INT) % 128"),
    ("f2", "CAST(FLOOR(l_discount * 100 + 0.5) AS INT)"),
    ("f3", "CAST(FLOOR(l_tax * 100 + 0.5) AS INT)"),
    ("f4", "l_linenumber - 1"),
    ("f5", "CAST(l_partkey % 100 AS INT)"),
    ("f6", "CAST(l_suppkey % 100 AS INT)"),
    ("f7", f"CAST({_DD_SPARK} % 128 AS INT)", f"CAST({_DD_DUCK} % 128 AS INT)"),
    ("f8", "CAST(l_orderkey % 64 AS INT)"),
    ("f9", "CAST(FLOOR(l_partkey / 100.0) AS INT) % 64"),
    ("f10", "CAST(FLOOR(l_suppkey / 10.0) AS INT) % 32"),
    ("f11", "CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) % 97 AS INT)"),
    ("f12", "CAST(FLOOR(l_extendedprice / 500.0) AS INT) % 64"),
    ("f13", "(CAST(l_quantity AS INT) * 2) % 100"),
    ("f14", f"CAST({_DD_SPARK} % 7 AS INT)", f"CAST({_DD_DUCK} % 7 AS INT)"),
    (
        "f15",
        f"CAST(FLOOR({_DD_SPARK} / 30.0) AS INT) % 36",
        f"CAST(FLOOR({_DD_DUCK} / 30.0) AS INT) % 36",
    ),
    ("f16", "CAST(FLOOR(l_orderkey / 8.0) AS INT) % 128"),
    ("f17", "CAST((l_partkey + l_suppkey) % 50 AS INT)"),
    ("f18", "(CAST(l_quantity AS INT) + l_linenumber) % 53"),
    (
        "f19",
        "CAST(FLOOR(l_tax * 100 + 0.5) + FLOOR(l_discount * 100 + 0.5) AS INT)",
    ),
    ("f20", "CAST(CAST(FLOOR(l_extendedprice / 10.0) AS BIGINT) % 10 AS INT)"),
    ("f21", "CAST(l_orderkey % 3 AS INT)"),
    ("f22", "CAST((l_orderkey + l_linenumber) % 16 AS INT)"),
    (
        "f23",
        f"CAST(FLOOR({_DD_SPARK} / 365.0) AS INT) % 10",
        f"CAST(FLOOR({_DD_DUCK} / 365.0) AS INT) % 10",
    ),
    ("f24", "CAST(l_suppkey % 7 AS INT)"),
    ("f25", "CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) % 101 AS INT)"),
    ("f26", "CAST(l_orderkey % 11 AS INT)"),
    ("f27", "CAST((l_partkey * 3 + 7) % 64 AS INT)"),
    ("f28", "CAST(l_quantity AS INT) % 8"),
    ("f29", f"CAST({_DD_SPARK} % 30 AS INT)", f"CAST({_DD_DUCK} % 30 AS INT)"),
    ("f30", "CAST((l_suppkey + l_linenumber) % 29 AS INT)"),
    ("f31", "CAST(l_orderkey % 128 AS INT)"),
]

FEATURE_SPEC: list[tuple[str, str, str]] = [
    (e[0], e[1], e[-1]) for e in _RAW_SPEC
]

LABEL_EXPR_SPARK = "CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END"
LABEL_EXPR_DUCKDB = LABEL_EXPR_SPARK

FEATURE_NAMES = [name for name, _, _ in FEATURE_SPEC]
N_FEATURES = len(FEATURE_SPEC)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events' physical ts layout varies across testdata generations
        # (TIMESTAMP(NANOS) is unreadable by a plain scan) — always go
        # through the adaptive reader so register_tables/load_table keep
        # working whatever the generator wrote.
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# events.parquet's physical type for ``ts`` has varied across testdata
# generations: TIMESTAMP(NANOS) (which Spark's scan rejects unless read
# with an explicit LONG schema) and plain timestamp[us].  Hardcoding
# either layout breaks when the data is regenerated, so every events
# read — batch and streaming — probes the parquet footer and adapts.


def _events_schema(ts_as_long: bool) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField(
                "ts", LongType() if ts_as_long else TimestampType()
            ),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def events_read_plan(path: str) -> tuple[StructType, bool]:
    """Probe the parquet footer of ``path`` (file or directory) and return
    ``(schema, ts_is_nanos)``.

    - ``ts`` stored as timestamp[us/ms/s] → read as ``TimestampType``
      directly, no conversion.
    - ``ts`` stored as int64 or timestamp[ns] (the TIMESTAMP(NANOS)
      layout Spark cannot scan as a timestamp) → read as ``LongType``
      and convert nanos → micros.

    Driver-side footer read of ONE file — O(KB), no data scan; the
    result is fixed for the lifetime of the read plan, so this is safe
    for streaming file sources too (all files in a stream directory
    share a layout by contract).

    URI paths (``s3://``, ``hdfs://``, ``file://``) probe through
    ``pyarrow.fs.FileSystem.from_uri`` so remote deployments read the
    real footer too.  Only when nothing can be probed — an empty stream
    landing directory whose files arrive later, or a URI scheme with no
    filesystem driver in this build — is the CURRENT generator layout
    (``timestamp[us]``) assumed (with a loud warning), so streaming
    deployments keep the schema-up-front contract file sources require.
    """
    import glob
    import os

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    try:
        if "://" in path:
            # Non-local URI (s3://, hdfs://, file://): resolve through
            # pyarrow.fs so remote deployments probe the real footer
            # instead of falling straight to the assumed layout.  Raises
            # (caught below) when the scheme's driver isn't available.
            from pyarrow import fs as pafs

            fsys, rel = pafs.FileSystem.from_uri(path)
            info = fsys.get_file_info(rel)
            if info.type == pafs.FileType.Directory:
                sel = pafs.FileSelector(rel, recursive=True)
                files = sorted(
                    f.path
                    for f in fsys.get_file_info(sel)
                    if f.is_file and f.path.endswith(".parquet")
                )
                if not files:
                    raise FileNotFoundError(path)
                rel = files[0]
            t = pq.read_schema(rel, filesystem=fsys).field("ts").type
            ts_is_nanos = (not pat.is_timestamp(t)) or t.unit == "ns"
            return _events_schema(ts_as_long=ts_is_nanos), ts_is_nanos
        probe = path
        if os.path.isdir(probe):
            files = sorted(
                glob.glob(os.path.join(probe, "**", "*.parquet"), recursive=True)
            )
            if not files:
                raise FileNotFoundError(path)
            probe = files[0]
        t = pq.read_schema(probe).field("ts").type
    except (FileNotFoundError, OSError, KeyError, ValueError, NotImplementedError) as exc:
        # NotImplementedError = pyarrow's ArrowNotImplementedError when a
        # URI scheme has no filesystem driver in this build.
        # empty dir, unreadable/foreign/corrupt footer (pyarrow's
        # ArrowInvalid is a ValueError), or a parquet without a ts field.
        # Surface the assumption loudly: if files later arrive in the
        # nanos/int64 layout, the scan fails with a schema mismatch and
        # this warning is the diagnosis pointer (streaming landing dirs
        # and non-local paths the driver FS can't probe hit this).
        import warnings

        warnings.warn(
            f"events_read_plan: could not probe a parquet footer under "
            f"{path!r} ({type(exc).__name__}); assuming the generator's "
            "timestamp[us] layout. If the scan later fails on a schema "
            "mismatch, the files use the nanos/int64 layout — probe a "
            "readable file or pass the schema explicitly.",
            stacklevel=2,
        )
        return _events_schema(ts_as_long=False), False
    ts_is_nanos = (not pat.is_timestamp(t)) or t.unit == "ns"
    return _events_schema(ts_as_long=ts_is_nanos), ts_is_nanos


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a real timestamp, whatever the file layout.

    Probes the footer via :func:`events_read_plan`; the nanos build gets
    a narrow JVM-side ``timestamp_micros(ts div 1000)`` conversion, the
    timestamp build is read as-is.  No session conf dependency.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    schema, ts_is_nanos = events_read_plan(path)
    df = spark.read.schema(schema).parquet(path)
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def features_select_spark() -> str:
    """Spark SQL SELECT list producing the tinyint feature matrix."""
    cols = [f"CAST({expr} AS TINYINT) AS {name}" for name, expr, _ in FEATURE_SPEC]
    cols.append(f"CAST({LABEL_EXPR_SPARK} AS TINYINT) AS label")
    return ",\n       ".join(cols)


def features_select_duckdb() -> str:
    """DuckDB SELECT list producing the same matrix (TINYINT for parity)."""
    cols = [f"CAST({expr} AS TINYINT) AS {name}" for name, _, expr in FEATURE_SPEC]
    cols.append(f"CAST({LABEL_EXPR_DUCKDB} AS TINYINT) AS label")
    return ",\n       ".join(cols)


def features_dense(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """The wide tinyint feature matrix: columns f0..f{n-1}, label.

    Pure narrow projection over the lineitem scan — Catalyst prunes the
    parquet read to exactly the source columns.

    r13 (guide §2.5): the scan is spread when parallelism-starved (the
    single-row-group small-file case runs the WHOLE derive + cache +
    every downstream aggregation on one task; identity on any real
    multi-split input).  Safe here because every FEATURE_SPEC expression
    and the label are pure row-local functions of lineitem columns and
    every consumer is row-order independent (integer histogram merges,
    max-per-column dims, count) — the projection sits ABOVE the spread
    exchange so the derivation itself parallelizes.  The ``lineitem``
    temp view stays the RAW scan: other consumers of the view may be
    order-sensitive.
    """
    from flink_infotheoretic_feature_selection_spark.session import spread_starved_scan

    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("lineitem")
    exprs = [
        f"CAST({expr} AS TINYINT) AS {name}" for name, expr, _ in FEATURE_SPEC
    ] + [f"CAST({LABEL_EXPR_SPARK} AS TINYINT) AS label"]
    return spread_starved_scan(
        lineitem, cache_key=f"{sf_dir}/lineitem.parquet"
    ).selectExpr(*exprs)


def features_dense_oracle_sql() -> str:
    """DuckDB SQL equivalent of :func:`features_dense`."""
    return f"SELECT {features_select_duckdb()} FROM lineitem"
