"""Multi-dimensional data layout: Z-order (Morton) clustered writes.

Parquet data skipping is driven by per-file / per-row-group min-max
statistics: a filter can skip a file only when the file's value range
for that column is narrow. A plain sort makes ONE column's ranges
narrow and leaves every other column's range spanning the whole table.
Interleaving the bits of several columns into one Morton key and
range-partitioning + sorting on it gives every participating column
piecewise-narrow ranges, so filters on ANY of them (or any
conjunction) skip most files — the layout trick behind
Delta/Databricks ``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered
rewrites, reproduced here with plain DataFrame ops.

Scale notes:
- The key is a pure Column expression (shift/mask/sum) — JVM codegen,
  no UDF, no extra shuffle beyond the one ``repartitionByRange`` that
  any clustered write needs.
- Column bounds for the fixed-point scaling come from catalog stats
  when you have them (pass ``bounds=``); the fallback is one min/max
  aggregate over the input — a map-side-combined single pass, cheap
  relative to the write it precedes, but at 100 TB prefer passing
  bounds from table metadata.
- Linear min/max scaling assumes roughly value-uniform columns. For
  heavily skewed columns (e.g. power-law ids), pre-transform (log,
  rank-bucket) or the hot range collapses into few key prefixes and
  skipping degrades toward single-column sort behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_COL = "__zkey"


def zorder_key(
    cols: list[str], bounds: dict[str, tuple[float, float]], bits: int = 16
) -> Column:
    """Morton-interleaved BIGINT key over ``cols``.

    Each column is scaled to a ``bits``-bit integer grid via its
    ``(min, max)`` bounds, then bit ``i`` of column ``j`` lands at
    position ``i * len(cols) + j``. ``bits * len(cols)`` must fit a
    signed 64-bit key (<= 62 to stay clear of the sign bit). NULL
    scales to grid cell 0, so null rows cluster together at the low
    end instead of spraying across files.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns (one column: just sort)")
    if bits * n > 62:
        raise ValueError(
            f"bits*len(cols) = {bits * n} exceeds 62 — lower bits "
            f"(grid resolution) or columns"
        )
    grid = (1 << bits) - 1
    parts: list[Column] = []
    for j, c in enumerate(cols):
        lo, hi = bounds[c]
        if lo is None or hi is None:
            # all-NULL column (column_bounds yields (None, None)):
            # every row is grid cell 0 — skip it like a constant column
            continue
        span = float(hi) - float(lo)
        if span <= 0:  # constant column: contributes nothing to the key
            continue
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * grid
        )
        cell = F.least(F.greatest(F.coalesce(scaled, F.lit(0)), F.lit(0)), F.lit(grid)).cast("long")
        for i in range(bits):
            parts.append(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j))
            )
    if not parts:
        return F.lit(0).cast("long")
    key = parts[0]
    for p in parts[1:]:
        key = key + p
    return key


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per column in ONE aggregate pass (map-side combined)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order key of ``cols``: ``repartitionByRange`` on the key (range
    exchange — contiguous key runs per file) + ``sortWithinPartitions``
    (narrow row-group stats inside each file). The key column is
    dropped before the write; it is derivable, not data.
    """
    if bounds is None:
        bounds = column_bounds(df, cols)
    keyed = df.withColumn(_Z_COL, zorder_key(cols, bounds, bits=bits))
    (
        keyed.repartitionByRange(n_files, _Z_COL)
        .sortWithinPartitions(_Z_COL)
        .drop(_Z_COL)
        .write.mode(mode)
        .parquet(path)
    )


def file_span_report(path: str, cols: list[str]) -> dict[str, float]:
    """Layout-quality audit from parquet footers only (no data read):
    for each column, the mean per-file (max-min) span as a fraction of
    the global span. ~1.0 means files span the whole domain (no
    skipping possible); small values mean range filters prune files.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for f in files:
        md = pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        per_col: dict[str, tuple[float, float]] = {}
        for c in cols:
            idx = name_to_idx[c]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                per_col[c] = (float(lo), float(hi))
        for c, lohi in per_col.items():
            spans[c].append(lohi)
    out: dict[str, float] = {}
    for c, lohis in spans.items():
        glo = min(lo for lo, _ in lohis)
        ghi = max(hi for _, hi in lohis)
        gspan = ghi - glo
        if gspan <= 0:
            out[c] = 0.0
            continue
        out[c] = sum(hi - lo for lo, hi in lohis) / len(lohis) / gspan
    return out
