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
# Feature spec: (name, spark_sql_expr, duckdb_sql_expr).
# Expressions are kept dialect-minimal; where dialects diverge (datediff)
# both spellings are given.  All results are integers in [0, 255].
# ---------------------------------------------------------------------------
FEATURE_SPEC: list[tuple[str, str, str]] = [
    ("f0", "CAST(l_quantity AS INT) % 50", "CAST(l_quantity AS INT) % 50"),
    (
        "f1",
        "CAST(FLOOR(l_extendedprice / 1000.0) AS INT) % 128",
        "CAST(FLOOR(l_extendedprice / 1000.0) AS INT) % 128",
    ),
    (
        "f2",
        "CAST(FLOOR(l_discount * 100 + 0.5) AS INT)",
        "CAST(FLOOR(l_discount * 100 + 0.5) AS INT)",
    ),
    (
        "f3",
        "CAST(FLOOR(l_tax * 100 + 0.5) AS INT)",
        "CAST(FLOOR(l_tax * 100 + 0.5) AS INT)",
    ),
    ("f4", "l_linenumber - 1", "l_linenumber - 1"),
    ("f5", "CAST(l_partkey % 100 AS INT)", "CAST(l_partkey % 100 AS INT)"),
    ("f6", "CAST(l_suppkey % 100 AS INT)", "CAST(l_suppkey % 100 AS INT)"),
    (
        "f7",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01') % 128 AS INT)",
        "CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) % 128 AS INT)",
    ),
]

LABEL_EXPR_SPARK = "CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END"
LABEL_EXPR_DUCKDB = LABEL_EXPR_SPARK

FEATURE_NAMES = [name for name, _, _ in FEATURE_SPEC]
N_FEATURES = len(FEATURE_SPEC)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(f"SELECT {features_select_spark()} FROM lineitem")


def features_dense_oracle_sql() -> str:
    """DuckDB SQL equivalent of :func:`features_dense`."""
    return f"SELECT {features_select_duckdb()} FROM lineitem"
