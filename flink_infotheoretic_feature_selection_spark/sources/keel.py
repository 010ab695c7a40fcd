"""KEEL dataset format reader (header + CSV body).

Replaces the reference's ~8300-line vendored JavaCC parser
(``src/main/scala/keel/Dataset/*``, driven by ``KeelParser.scala:13-59``)
with ~100 lines of header parsing + a Catalyst CSV scan.

Semantics reproduced from ``KeelParser.scala``:

- header lines: ``@relation``, ``@attribute name {a,b,c}`` (NOMINAL),
  ``@attribute name integer [lo, hi]``, ``@attribute name real [lo, hi]``
  (``keel/Dataset/Attribute.java:57-68``);
- ``@inputs`` / ``@outputs`` select feature/label columns; when absent,
  the last attribute is the label (``KeelParser.scala:42-59``);
- nominal values map to their declared-order index
  (``KeelParser.scala:27-32``); numerics parse as doubles (``:47-53``);
- body lines starting with ``@`` are skipped (``InfoSelectorTest.scala:110``).

Spark-first: the body is read with ``spark.read.csv`` (distributed,
pushdown-capable); nominal→index is a chain of JVM-side ``CASE WHEN``
expressions, not a UDF — at 100 TB this is a plain scan + narrow map.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "KeelHeader",
    "KeelAttribute",
    "parse_keel_header",
    "read_keel",
    "write_keel",
    "format_keel_header",
]

_ATTR_RE = re.compile(
    r"@attribute\s+(?P<name>[^\s{\[]+)\s*"
    r"(?:(?P<nominal>\{[^}]*\})|(?P<type>integer|real)\s*(?:\[(?P<range>[^\]]*)\])?)?",
    re.IGNORECASE,
)


@dataclass
class KeelAttribute:
    name: str
    kind: str  # 'nominal' | 'integer' | 'real'
    values: list[str] = field(default_factory=list)  # nominal declared order
    lo: float | None = None  # declared [lo, hi] range (numeric kinds)
    hi: float | None = None


@dataclass
class KeelHeader:
    relation: str
    attributes: list[KeelAttribute]
    inputs: list[str]
    outputs: list[str]

    @property
    def label(self) -> str:
        return self.outputs[-1] if self.outputs else self.attributes[-1].name


def parse_keel_header(lines: list[str]) -> KeelHeader:
    relation = ""
    attributes: list[KeelAttribute] = []
    inputs: list[str] = []
    outputs: list[str] = []
    for raw in lines:
        line = raw.strip()
        low = line.lower()
        if low.startswith("@relation"):
            relation = line.split(None, 1)[1] if " " in line else ""
        elif low.startswith("@attribute"):
            m = _ATTR_RE.match(line)
            if not m:
                raise ValueError(f"unparseable @attribute line: {line!r}")
            if m.group("nominal"):
                vals = [v.strip() for v in m.group("nominal").strip("{}").split(",")]
                attributes.append(KeelAttribute(m.group("name"), "nominal", vals))
            else:
                kind = (m.group("type") or "real").lower()
                lo = hi = None
                if m.group("range"):
                    bounds = [b.strip() for b in m.group("range").split(",")]
                    if len(bounds) == 2:
                        try:
                            lo, hi = float(bounds[0]), float(bounds[1])
                        except ValueError:
                            # non-numeric range text (real KEEL files have
                            # these) — ignore, as the pre-range parser did;
                            # normalize falls back to data-derived bounds
                            lo = hi = None
                attributes.append(KeelAttribute(m.group("name"), kind, lo=lo, hi=hi))
        elif low.startswith("@inputs"):
            parts = line.split(None, 1)
            if len(parts) < 2 or not parts[1].strip():
                raise ValueError(f"@inputs directive with no names: {line!r}")
            inputs = [c.strip() for c in parts[1].split(",")]
        elif low.startswith("@outputs"):
            parts = line.split(None, 1)
            if len(parts) < 2 or not parts[1].strip():
                raise ValueError(f"@outputs directive with no names: {line!r}")
            outputs = [c.strip() for c in parts[1].split(",")]
        elif low.startswith("@data"):
            break
    if not attributes:
        raise ValueError("KEEL header declares no attributes")
    return KeelHeader(relation, attributes, inputs, outputs)


def read_keel(
    spark: SparkSession,
    path: str,
    header_path: str | None = None,
    label_as: str = "label",
    normalize: bool = False,
) -> DataFrame:
    """Read a KEEL file into (features..., label) with nominals indexed.

    ``header_path`` defaults to the data file itself (headers usually
    precede ``@data`` in the same file).  Only the header is read on the
    driver (bounded); the body scan is distributed.

    Feature columns come out in ``@inputs`` declared order (real KEEL
    files reorder inputs relative to the attribute declarations), falling
    back to declaration order when ``@inputs`` is absent.

    ``normalize=True`` applies the reference's min-max rule
    (``keel/Dataset/Attribute.java:600-606``) to the INPUT attributes
    only (the label is never rescaled): nominal → index unchanged,
    integer → ``val − min``, real → ``(val − min)/(max − min)``.  Bounds
    come from the header's ``[lo, hi]`` declarations; attributes without
    declared bounds fall back to data-derived min/max (the reference
    grows bounds while parsing).  Default False — the reference's own
    ``KeelParser.parseLabeledPoint`` ships with normalization commented
    out (``KeelParser.scala:47-53``).  A degenerate real range
    (max == min) emits 0.0 where the reference would divide by zero —
    documented divergence.
    """
    header_src = header_path or path
    head_lines = []
    with open(header_src) as fh:
        for line in fh:
            head_lines.append(line)
            if line.strip().lower().startswith("@data"):
                break
    header = parse_keel_header(head_lines)

    names = [a.name for a in header.attributes]
    # Text scan + header/comment filter (InfoSelectorTest.scala:110) —
    # csv inference would mis-shape on the in-file @header lines.
    #
    # Body dialects (both pure JVM expressions, decided per row):
    # - dense CSV: ``v0, v1, ..., vn``
    # - sparse ARFF-style: ``{idx value, idx value}`` — attributes not
    #   listed default to 0 (numerics) / the first declared value
    #   (nominals), Weka sparse semantics.  Mixed files work.
    trimmed = F.trim("value")
    _entries_sql = (
        "transform("
        "  filter(split(regexp_replace(trim(value), '^\\\\{|\\\\}$', ''), ','),"
        "         t -> trim(t) != ''),"
        "  t -> struct(TRY_CAST(element_at(split(trim(t), '\\\\s+'), 1) AS INT) AS k,"
        # try_element_at: an index-only entry like '{3}' has no second
        # token, and under ANSI element_at(.., 2) would THROW a deep
        # INVALID_ARRAY_INDEX at scan time; NULL v reaches the readable
        # raise_error below instead
        "              try_element_at(split(trim(t), '\\\\s+'), 2) AS v))"
    )
    # Malformed sparse rows fail here with a READABLE error carrying the
    # offending row text, instead of the engine's own deep-in-the-scan
    # failures (a non-numeric index TRY_CASTs to a NULL map key -> "Cannot
    # use null as map key"; a duplicate index hits mapKeyDedupPolicy).
    sparse_entries = F.expr(
        f"CASE WHEN exists({_entries_sql}, e -> e.k IS NULL) THEN "
        f"raise_error(concat('malformed sparse KEEL entry (non-numeric index): ', trim(value))) "
        f"WHEN exists({_entries_sql}, e -> e.v IS NULL) THEN "
        f"raise_error(concat('malformed sparse KEEL entry (index without value): ', trim(value))) "
        f"WHEN size(array_distinct(transform({_entries_sql}, e -> e.k))) != size({_entries_sql}) THEN "
        f"raise_error(concat('duplicate sparse index in KEEL row: ', trim(value))) "
        f"ELSE map_from_entries({_entries_sql}) END"
    )
    raw = (
        spark.read.text(path)
        .filter(~trimmed.startswith("@"))
        .filter(trimmed != "")
        .select(
            F.split("value", ",").alias("parts"),
            trimmed.startswith("{").alias("is_sparse"),
            # CASE WHEN short-circuits per row, so dense rows never
            # evaluate the map (whose keys would be null there)
            F.when(trimmed.startswith("{"), sparse_entries).alias("entries"),
        )
    )
    feature_names = header.inputs or [n for n in names if n != header.label]
    exprs: dict[str, F.Column] = {}
    needs_bounds: list[tuple[str, KeelAttribute]] = []
    for idx, attr in enumerate(header.attributes):
        default = attr.values[0] if attr.kind == "nominal" else "0"
        c = F.when(
            F.col("is_sparse"),
            F.coalesce(F.col("entries").getItem(idx), F.lit(default)),
        ).otherwise(F.trim(F.col("parts").getItem(idx)))
        # Missing-value tokens: real-world KEEL bodies carry '?' (the
        # KEEL/ARFF convention, keel/Dataset/Attribute.java) and some
        # exports '<null>'.  They become SQL NULL — explicitly, because
        # under Spark 4's default ANSI mode CAST('?' AS DOUBLE) would
        # THROW at scan time, and a silent nominal-map miss would be
        # indistinguishable from a typo.
        c = F.when(F.lower(c).isin("?", "<null>"), F.lit(None)).otherwise(c)
        if attr.kind == "nominal":
            # declared-order index (KeelParser.scala:27-32)
            mapping = F.create_map(
                *[x for i, v in enumerate(attr.values) for x in (F.lit(v), F.lit(i))]
            )
            expr = mapping.getItem(c).cast("int")
        else:
            expr = c.cast("double")
            if (
                normalize
                and attr.name != header.label
                and (attr.lo is None or attr.hi is None)
            ):
                needs_bounds.append((attr.name, attr))
        exprs[attr.name] = expr

    if normalize and needs_bounds:
        # data-derived bounds for undeclared ranges — one distributed agg
        # over the body (the reference grows bounds during its parse,
        # InstanceSet/Attribute enlargeBounds); result is 2 doubles per
        # attribute, driver-bounded.
        aggs = []
        for name, _ in needs_bounds:
            aggs.append(F.min(exprs[name]).alias(f"__lo_{name}"))
            aggs.append(F.max(exprs[name]).alias(f"__hi_{name}"))
        row = raw.agg(*aggs).collect()[0]
        for name, attr in needs_bounds:
            attr.lo = row[f"__lo_{name}"] if attr.lo is None else attr.lo
            attr.hi = row[f"__hi_{name}"] if attr.hi is None else attr.hi

    if normalize:
        # Features only — the reference's normalizeValue is applied to
        # input attributes; the target/label is never rescaled.
        for attr in header.attributes:
            if attr.name == header.label or attr.kind == "nominal":
                continue
            if attr.lo is None or attr.hi is None:
                raise ValueError(
                    f"cannot normalize {attr.name!r}: no declared [lo, hi] "
                    "range and no data rows to derive bounds from"
                )
            if attr.kind == "integer":
                exprs[attr.name] = exprs[attr.name] - F.lit(float(attr.lo))
            elif attr.kind == "real":
                span = float(attr.hi) - float(attr.lo)
                if span == 0:
                    exprs[attr.name] = F.lit(0.0)
                else:
                    exprs[attr.name] = (exprs[attr.name] - F.lit(float(attr.lo))) / F.lit(
                        span
                    )

    unknown = [n for n in feature_names if n not in exprs]
    if unknown:
        # silently dropping them would hand the selector a narrower
        # feature frame with no diagnostic (e.g. an @inputs case typo)
        raise ValueError(
            f"@inputs names not declared as @attribute: {unknown}; "
            f"declared: {sorted(exprs)}"
        )
    cols = [
        exprs[name].alias(name)
        for name in feature_names
        if name != header.label
    ]
    cols.append(exprs[header.label].alias(label_as))
    return raw.select(*cols)


def format_keel_header(header: KeelHeader) -> str:
    """Serialize a :class:`KeelHeader` back to its ``@``-directive text
    (through ``@data``) — the write-back twin of :func:`parse_keel_header`
    (reference: ``keel/Dataset/InstanceSet.java`` print/write paths).
    """
    lines = [f"@relation {header.relation or 'spark-export'}"]
    for a in header.attributes:
        if a.kind == "nominal":
            lines.append(f"@attribute {a.name} {{{', '.join(a.values)}}}")
        elif a.lo is not None and a.hi is not None:
            lo = int(a.lo) if a.kind == "integer" else a.lo
            hi = int(a.hi) if a.kind == "integer" else a.hi
            lines.append(f"@attribute {a.name} {a.kind} [{lo}, {hi}]")
        else:
            lines.append(f"@attribute {a.name} {a.kind}")
    if header.inputs:
        lines.append(f"@inputs {', '.join(header.inputs)}")
    if header.outputs:
        lines.append(f"@outputs {', '.join(header.outputs)}")
    lines.append("@data")
    return "\n".join(lines) + "\n"


def write_keel(
    df: DataFrame,
    path: str,
    header: KeelHeader,
    label_as: str = "label",
    single_file: bool = False,
) -> None:
    """Write a ``read_keel``-shaped frame back to the KEEL dense dialect
    (``keel/Dataset/InstanceSet.java`` print/write paths — the one
    reference surface without a Spark twin until r12).

    ``df`` carries the attributes named as in ``header`` with the label
    under ``label_as`` — exactly what :func:`read_keel` returns (indexed
    nominals, double numerics).  Cell formatting mirrors the reference's
    printing: nominal index → its declared value string, integer kinds →
    integral text, real kinds → shortest round-trip double text, NULL →
    ``'?'``.  Everything is JVM column expressions over a distributed
    text write — no driver-side row loop.

    Layout: ``path/`` gets ``header.dat`` (the ``@``-directives through
    ``@data``, driver-written, bounded by attribute count) plus
    distributed ``body/part-*`` shards; read back with
    ``read_keel(spark, f"{path}/body", header_path=f"{path}/header.dat")``.
    ``single_file=True`` additionally concatenates the shards into ONE
    ``path/data.dat`` interop file (header inline, the classic KEEL
    shape) — a driver-side byte copy, sized for exports to KEEL tooling,
    not for corpus-scale output.
    """
    import os
    import shutil

    missing = [
        a.name
        for a in header.attributes
        if a.name != header.label and a.name not in df.columns
    ]
    if missing:
        raise ValueError(f"frame lacks header attributes: {missing}")
    cells = []
    for a in header.attributes:
        col = F.col(label_as if a.name == header.label else a.name)
        if a.kind == "nominal":
            # ',' breaks the dense row, padding breaks the re-parse trim,
            # and the missing-value tokens would read back as NULL
            bad = [
                v
                for v in a.values
                if "," in v or v.strip() != v or v.lower() in ("?", "<null>")
            ]
            if bad:
                raise ValueError(
                    f"nominal values of {a.name!r} not dense-dialect-safe: {bad}"
                )
            # declared-order index -> value string via a map lookup, the
            # exact inverse of read_keel's value->index map.  NOT
            # element_at(array, col+1): under Spark 4.1's default ANSI
            # mode a NULL index makes element_at return the LAST array
            # element instead of NULL (probe-verified in a bare session;
            # ansi=false and map lookups are both correct) — a missing
            # nominal would silently write as the final declared value
            # instead of '?'.  Caught by the roundtrip unit.
            mapping = F.create_map(
                *[x for i, v in enumerate(a.values) for x in (F.lit(i), F.lit(v))]
            )
            cell = mapping[col.cast("int")]
        elif a.kind == "integer":
            # integer attributes normally hold integral doubles — emit
            # them without the trailing '.0'.  Real files break their own
            # declarations though (read_keel happily parses '1.5' under
            # an integer kind), so non-integral / out-of-int64 values
            # fall back to the double text instead of truncating or
            # throwing (try_cast: ANSI CAST would throw on overflow).
            dbl = col.cast("double")
            as_int = dbl.try_cast("bigint")
            cell = F.when(
                as_int.isNotNull() & (as_int.cast("double") == dbl),
                as_int.cast("string"),
            ).otherwise(dbl.cast("string"))
        else:
            cell = col.cast("double").cast("string")
        cells.append(F.coalesce(cell, F.lit("?")))

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/header.dat", "w") as fh:
        fh.write(format_keel_header(header))
    body_dir = f"{path}/body"
    df.select(F.concat_ws(", ", *cells).alias("value")).write.mode(
        "overwrite"
    ).text(body_dir)

    if single_file:
        with open(f"{path}/data.dat", "w") as out:
            out.write(format_keel_header(header))
            for part in sorted(os.listdir(body_dir)):
                if part.startswith(("_", ".")) or not part.endswith(".txt"):
                    continue
                with open(f"{body_dir}/{part}") as src:
                    shutil.copyfileobj(src, out)
