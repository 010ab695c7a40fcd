"""Physical-plan inspection — the engine's scale guardrails.

The reference hand-schedules its data movement (SURVEY.md §4); on Spark
the physical strategy is Catalyst's, so our scale discipline lives in
*assertions about the chosen plan*: filters reach the parquet scan,
projections prune the read schema, small dimensions broadcast, and
per-operator shuffle counts stay at their designed minimum.  Tests pin
these properties so a regression that silently de-optimizes a plan (a
UDF blocking pushdown, a join falling back to sort-merge-shuffle) fails
CI rather than surfacing as a 100× slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _split_top_level(body: str) -> list[str]:
    """Split on commas at paren/angle-bracket depth 0 — plan fragments
    like ``GreaterThan(l_quantity,30.0)`` or ``decimal(12,2)`` carry
    commas INSIDE their arguments, so a bare ``split(',')`` corrupts
    them into garbage fragments."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "exchange_count",
    "broadcast_join_count",
    "wholestage_codegen_count",
    "bare_parquet_scan_files",
]


def bare_parquet_scan_files(df: DataFrame, cols: list[str]) -> list[str] | None:
    """Local parquet files behind ``df`` IFF the frame is a BARE scan —
    i.e. reading ``cols`` straight from the files with pyarrow yields
    exactly the values Spark would deliver.  None otherwise (the caller
    must take a route that executes the plan).

    This is the eligibility probe for ``InfoThSelector``'s auto direct
    pack (r10, VERDICT ask #1).  Eligible shapes, checked on the
    OPTIMIZED logical plan so Catalyst has already collapsed aliases and
    redundant projections:

    - ``LogicalRelation`` over a parquet ``HadoopFsRelation``, optionally
      under attribute-only ``Project`` nodes (column pruning / reorder —
      the direct reader prunes by name itself).  Any computed expression,
      ``Alias`` (a rename would break name-keyed reading), ``Filter``,
      join, or non-V1 source → None.
    - none of ``cols`` is a Hive PARTITION column (those live in
      directory names, not in the files).
    - every input file is local (``file:`` or schemeless) — pyarrow
      opens them directly on the executors.

    Conservative by construction: every check failure (including py4j
    surprises on future Spark versions) returns None, never a wrong
    file list — the fallback routes are correct for everything.
    """
    try:
        if not set(cols) <= set(df.columns):
            # a column the frame's projection dropped may still exist in
            # the files; the direct route must not read data from outside
            # the user's frame (r11, advisor find) — let the scan route
            # raise its usual unresolved-column error instead
            return None
        node = df._jdf.queryExecution().optimizedPlan()
        while node.getClass().getSimpleName() == "Project":
            # ONE py4j call for the whole projectList: per-element
            # apply(i).getClass() costs a py4j round-trip each — ~1.3 s
            # of pure RPC at 632 columns (r10 bench b16 vs b16c).  An
            # AttributeReference prints as a bare `name#id[typeSuffix]`
            # token; an Alias prints `expr AS name#id` and any computed
            # expression carries spaces/parens — both fail the token
            # regex and return None (conservative: odd column names
            # merely fall back to the scan route).
            plist = node.projectList().toString()
            body = plist[plist.index("(") + 1 : plist.rindex(")")]
            if body and not all(
                re.fullmatch(r"[^\s,()#]+#\d+[A-Za-z]*", e.strip())
                for e in body.split(",")
            ):
                return None
            node = node.child()
        if node.getClass().getSimpleName() != "LogicalRelation":
            return None
        rel = node.relation()
        if rel.getClass().getSimpleName() != "HadoopFsRelation":
            return None
        if "Parquet" not in rel.fileFormat().getClass().getSimpleName():
            return None
        part_cols = {str(n) for n in rel.partitionSchema().fieldNames()}
        if part_cols & set(cols):
            return None
        files = list(df.inputFiles())
        if not files:
            return None
        out: list[str] = []
        for f in files:
            if f.startswith("file:"):
                from urllib.parse import unquote, urlparse

                out.append(unquote(urlparse(f).path))
            elif "://" not in f:
                out.append(f)
            else:
                return None  # non-local filesystem: the scan route reads it
        return out
    except Exception:
        return None


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan accepted (``PushedFilters: [...]``)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (``ReadSchema``) — the
    column-pruning witness."""
    cols: list[str] = []
    # struct<...> may nest types with commas AND angle brackets
    # (decimal(12,2), array<int>) — match to the balanced closer by
    # scanning, then split depth-aware.
    plan = formatted_plan(df)
    for m in re.finditer(r"ReadSchema: struct<", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            if plan[i] == "<":
                depth += 1
            elif plan[i] == ">":
                depth -= 1
            i += 1
        for field in _split_top_level(plan[m.end() : i - 1]):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (excludes broadcast
    exchanges — those ship dims, not data).  Formatted mode prints each
    node as ``(N) Exchange`` / ``(N) BroadcastExchange``."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def round_robin_exchange_count(df: DataFrame) -> int:
    """Number of round-robin (keyless spread) exchanges in the plan —
    the shape ``session.spread_starved_scan`` introduces on
    parallelism-starved scans (identity at any real scale).  Lets plan
    guardrails allow exactly the documented spread while still
    forbidding unexpected hash/range row shuffles."""
    plan = formatted_plan(df)
    return len(re.findall(r"RoundRobinPartitioning", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (more of the
    plan fused into generated JVM loops)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
