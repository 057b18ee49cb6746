"""Z-order (Morton) clustered parquet layout + a footer-driven pruned read.

The data-skipping pattern behind every lakehouse `OPTIMIZE ZORDER BY`: sort
the table by the bit-interleaved code of two (quantized) columns before
writing, so parquet row-group min/max footer stats become tight along BOTH
dimensions at once; a rectangle predicate then prunes most row groups from
the FOOTERS ALONE — no data pages read — and only surviving row groups are
scanned (distributed, one task per file) and exact-filtered. At 100 TB this
turns a full-corpus scan for a (user-range x time-range) slice into a read
of the few blocks whose z-range intersects the rectangle; the same layout
serves every rectangle on the same two columns (write once, prune forever —
the storage-side sibling of prune-at-the-read column projection).

Quantization is integer-exact and driver-free: each cluster column maps to
16-bit rank space via (v - lo) * 65535 // (hi - lo) with (lo, hi) computed
by a cheap 2-column min/max aggregate; the z-code is layout metadata only —
query results NEVER depend on it (exact filters re-check every row), so a
skewed quantization can cost pruning efficiency but can never cost
correctness.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

Z_COL = "__z"


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread each bit of a 16-bit lane to even positions of a uint32."""
    v = v.astype(np.uint32)
    v = (v | (v << 8)) & np.uint32(0x00FF00FF)
    v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint32(0x33333333)
    v = (v | (v << 1)) & np.uint32(0x55555555)
    return v


def morton2(x16: np.ndarray, y16: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit lanes into one uint32 Morton code."""
    return (_spread16(x16) << np.uint32(1)) | _spread16(y16)


def _as_int64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if pa.types.is_timestamp(arr.type):
        arr = pc.cast(arr, pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def _quant16(v: np.ndarray, lo: int, hi: int) -> np.ndarray:
    span = max(1, hi - lo)
    q = (v - lo).astype(np.int64) * 65535 // span
    return np.clip(q, 0, 65535).astype(np.uint32)


def write_zordered(ds, col_x: str, col_y: str, path: str,
                   rows_per_file: int = 4096, row_group_size: int = 1024):
    """Cluster ``ds`` by the Morton code of (col_x, col_y) and write it
    under ``path`` (idempotent overwrite): min/max aggregate -> z-code
    map_batches -> ONE global sort -> per-batch file writes with small row
    groups (the pruning granule). Returns {files, rows}."""
    from ray.data.aggregate import Max, Min

    bounds = ds.select_columns([col_x, col_y]).aggregate(
        Min(col_x, alias_name="xlo"), Max(col_x, alias_name="xhi"),
        Min(col_y, alias_name="ylo"), Max(col_y, alias_name="yhi"),
    )
    conv = (lambda v: _stat_val(v) if not isinstance(v, (int, np.integer)) else int(v))
    xlo, xhi, ylo, yhi = (conv(bounds[k]) for k in ("xlo", "xhi", "ylo", "yhi"))

    def add_z(b: pa.Table) -> pa.Table:
        b = b.replace_schema_metadata(None)  # drop pandas metadata: unhashable in Ray's sort schema dedup
        if b.num_rows == 0:
            return b.append_column(Z_COL, pa.array([], type=pa.int64()))
        x = _quant16(_as_int64(b.column(col_x)), xlo, xhi)
        y = _quant16(_as_int64(b.column(col_y)), ylo, yhi)
        return b.append_column(Z_COL, pa.array(morton2(x, y).astype(np.int64), type=pa.int64()))

    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    def write_file(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"file": pa.array([], type=pa.string()), "rows": pa.array([], type=pa.int64())})
        body = b.drop_columns([Z_COL])
        name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(path, "." + name + ".tmp")
        pq.write_table(body, tmp, row_group_size=row_group_size)
        os.replace(tmp, os.path.join(path, name))
        return pa.table({"file": pa.array([name]), "rows": pa.array([b.num_rows], type=pa.int64())})

    manifest = (
        ds.map_batches(add_z, batch_format="pyarrow")
        .sort(Z_COL)
        .map_batches(write_file, batch_format="pyarrow", batch_size=rows_per_file)
        .to_pandas()
    )
    return {"files": len(manifest), "rows": int(manifest["rows"].sum()) if len(manifest) else 0}


def pd_ts_to_us(v) -> int:
    """Any pandas/py datetime -> int64 epoch-us (the arrow cast unit of the
    test tables' timestamp[us] columns)."""
    import pandas as pd

    return pd.Timestamp(v).value // 1000


def _stat_val(v):
    import datetime

    if isinstance(v, datetime.datetime) or hasattr(v, "value"):
        return pd_ts_to_us(v)
    return v


def pruned_read(path: str, ranges: list[tuple], stats: dict | None = None):
    """Footer-driven rectangle read over a directory written by
    ``write_zordered``. ``ranges`` is a list of ``(col, lo, hi, closed)``
    with ``closed`` in {"both", "left"}; values for timestamp columns are
    int64 epoch-us. The driver touches FOOTERS ONLY (row-group min/max); one
    distributed task per surviving file reads only its surviving row groups
    and applies the exact per-row filter. ``stats`` (optional dict) receives
    {"rg_total", "rg_kept", "files_kept"} — the no-silent-caps counter for
    how much the layout actually pruned."""
    import ray.data as rd

    files = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
    keep: list[tuple[str, list[int]]] = []
    rg_total = rg_kept = 0
    schema = None
    for n in files:
        pf = pq.ParquetFile(os.path.join(path, n))
        if schema is None:
            schema = pf.schema_arrow
        idx = {pf.schema_arrow.names[i]: i for i in range(len(pf.schema_arrow.names))}
        kept_rgs = []
        for i in range(pf.metadata.num_row_groups):
            rg_total += 1
            ok = True
            for col, lo, hi, closed in ranges:
                st = pf.metadata.row_group(i).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot prune this predicate
                mn, mx = _stat_val(st.min), _stat_val(st.max)
                if mx < lo or (mn > hi if closed == "both" else mn >= hi):
                    ok = False
                    break
            if ok:
                kept_rgs.append(i)
                rg_kept += 1
        if kept_rgs:
            keep.append((n, kept_rgs))
    if stats is not None:
        stats.update({"rg_total": rg_total, "rg_kept": rg_kept, "files_kept": len(keep)})

    def read_one(batch: pa.Table) -> pa.Table:
        out = []
        for name, rgs in zip(batch.column("file").to_pylist(), batch.column("rgs").to_pylist()):
            t = pq.ParquetFile(os.path.join(path, name)).read_row_groups(list(rgs))
            mask = None
            for col, lo, hi, closed in ranges:
                c = t.column(col)
                if pa.types.is_timestamp(c.type):
                    c = pc.cast(c, pa.int64())
                m = pc.and_(pc.greater_equal(c, lo),
                            pc.less_equal(c, hi) if closed == "both" else pc.less(c, hi))
                mask = m if mask is None else pc.and_(mask, m)
            out.append(t.filter(mask) if mask is not None else t)
        return pa.concat_tables(out) if out else schema.empty_table()

    if not keep:
        return rd.from_arrow(schema.empty_table()) if schema is not None else rd.from_items([])
    items = pa.table({
        "file": pa.array([n for n, _ in keep]),
        "rgs": pa.array([r for _, r in keep], type=pa.list_(pa.int64())),
    })
    return rd.from_arrow(items).repartition(len(keep)).map_batches(
        read_one, batch_format="pyarrow", batch_size=None
    )
