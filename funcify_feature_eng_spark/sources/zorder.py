"""Z-order (Morton) layout: multi-column data-skipping for the scan tier.

A table sorted by one key prunes scans on that key only; a feature corpus
is read by (entity, time), (source, quality-bucket), (user, event-window)
— two-dimensional predicates that a one-key sort cannot skip for. The
fix is the classic space-filling-curve layout (Delta's OPTIMIZE ZORDER,
Iceberg's sort-order z-transform): interleave the bits of the key
columns into one Morton code, range-partition + sort the files by it,
and every parquet footer's per-column min/max becomes a tight bounding
box — a point/box predicate on ANY keyed dimension skips most files.

The reference has no layout tier at all (its sources are HTTP/GraphQL
services — `rest-data-source/.../RestApiService.kt`); this module is the
100 TB ingest companion to ``ingest_bucketed`` (one-dimensional bucket
layout) in `sources/tables.py`.

Determinism contract: the z-value is pure integer bit arithmetic —
reproducible in any engine (the DuckDB oracle twin runs the identical
unrolled expression, see ``zvalue_sql``).

Scale shape: computing z-values is map-only; the layout write is ONE
range-exchange on the z-value (sampled range boundaries — Spark's
repartitionByRange), then a sort WITHIN each output file. No global
sort, no driver involvement. At 100 TB this is exactly the compaction
job's shape, amortized once at ingest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "zvalue",
    "zvalue_sql",
    "write_zordered",
    "parquet_file_stats",
    "files_overlapping_box",
]


def zvalue(cols: Sequence[Column | str], bits: int = 21, check: bool = True) -> Column:
    """Morton code of 2..3 non-negative integer columns: bit ``b`` of
    column ``c`` lands at position ``b*k + c``. ``bits`` per column
    (k·bits <= 63 enforced — the code must fit a signed BIGINT).

    Inputs must lie in ``[0, 2^bits)``; map raw keys onto the grid first
    (``pmod(hash, 2^bits)``, ``epoch DIV bucket % 2^bits``, quantile
    bins…). With ``check=True`` (default) an out-of-range row raises with
    the offending column named — silent truncation would interleave
    garbage bits and quietly destroy locality.
    """
    k = len(cols)
    if not 2 <= k <= 3:
        raise ValueError(f"zvalue: need 2 or 3 columns, got {k}")
    if bits < 1 or k * bits > 63:
        raise ValueError(f"zvalue: k*bits must be in [k, 63], got {k}*{bits}")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    terms = []
    for ci, c in enumerate(cs):
        for b in range(bits):
            terms.append(F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + ci))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    if not check:
        return z
    lim = F.lit(1 << bits)
    ok = None
    for c in cs:
        this = (c >= 0) & (c < lim)
        ok = this if ok is None else (ok & this)
    return F.when(ok, z).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"zvalue: input outside [0, 2^{bits}): ("),
                F.concat_ws(", ", *[c.cast("string") for c in cs]),
                F.lit(")"),
            )
        ).cast("long")
    )


def zvalue_sql(col_names: Sequence[str], bits: int = 21) -> str:
    """The identical Morton expression as portable SQL (DuckDB/ANSI
    integer ``>> & <<``) — the oracle twin of :func:`zvalue`."""
    k = len(col_names)
    terms = [
        # BIGINT cast up front: an INT32 left operand overflows past << 31
        f"(((CAST({name} AS BIGINT) >> {b}) & 1) << {b * k + ci})"
        for ci, name in enumerate(col_names)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 21,
    n_files: int | None = None,
    grid: dict[str, Column] | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of ``cols``.

    ``grid`` optionally maps a column name to its on-grid integer
    expression (e.g. ``{"ts": F.unix_date("ts") % (1 << bits)}``); columns
    without an entry must already be on-grid integers. The z-value is a
    transient sort key — it is NOT persisted (the per-file min/max of the
    ORIGINAL columns is what scan pruning reads).

    ONE range exchange (sampled boundaries) + per-file sort; ``n_files``
    defaults to the session's shuffle partitions. At 100 TB run per
    partition-of-the-table (e.g. per day) so the range sampler sees one
    partition at a time.
    """
    grid = grid or {}
    exprs = [grid.get(c, F.col(c)) for c in cols]
    z = zvalue(exprs, bits=bits)
    staged = df.withColumn("__z", z)
    if n_files is not None:
        staged = staged.repartitionByRange(n_files, F.col("__z"))
    else:
        staged = staged.repartitionByRange(F.col("__z"))
    staged.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)


def parquet_file_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file column min/max from the parquet footers — the exact
    metadata a scan's file-pruning reads. Driver-side, O(#files); the
    evidence tool for layout tests/benches, not a data-path operator."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                st = col.statistics
                if not st.has_min_max:
                    continue
                lo[name] = st.min if name not in lo else min(lo[name], st.min)
                hi[name] = st.max if name not in hi else max(hi[name], st.max)
        out.append({"file": os.path.basename(f), "min": lo, "max": hi})
    return out


def files_overlapping_box(
    stats: list[dict], box: dict[str, tuple[object, object]]
) -> int:
    """How many files a box predicate must read, given
    :func:`parquet_file_stats` output — min/max overlap per dimension,
    the same test a file-pruning scan applies."""
    n = 0
    for s in stats:
        hit = True
        for c, (lo, hi) in box.items():
            if c not in s["min"]:
                continue  # no stats → cannot prune → must read
            if s["max"][c] < lo or s["min"][c] > hi:
                hit = False
                break
        n += hit
    return n
