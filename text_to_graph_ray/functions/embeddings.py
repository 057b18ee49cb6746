"""Embedding-column aggregates.

``label_centroids``: per-label mean vector (class centroids — classifier
init, cluster seeding, drift monitoring). Combiner-first: each batch reduces
to one (sum_vector, count) partial per label, so the exchange carries
O(labels × dim), never O(rows × dim). Output is exploded to one
(label, dim, mean_val) row per dimension so a SQL oracle can reproduce it
exactly with list indexing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from text_to_graph_ray.util import vec_matrix


def label_centroids(ds, label_col: str = "label", vec_col: str = "embedding", ndigits: int = 4):
    # ndigits=4: float64 summation-order noise across shuffle orders is
    # ~1e-13 relative, so a 5e-5 rounding boundary is effectively never
    # crossed — the value hash stays stable run-to-run and vs the SQL avg()
    def partial(b: pa.Table) -> pa.Table:
        labels = np.asarray(b.column(label_col).to_pylist(), dtype=np.int64)
        vecs = vec_matrix(b.column(vec_col))
        out_l, out_sum, out_n = [], [], []
        for lab in np.unique(labels):
            mask = labels == lab
            out_l.append(int(lab))
            out_sum.append(vecs[mask].sum(axis=0).tolist())
            out_n.append(int(mask.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, type=pa.int64()),
                "vsum": pa.array(out_sum, type=pa.list_(pa.float64())),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        lab = int(g["label"].iloc[0])
        total = np.sum([np.asarray(v, dtype=np.float64) for v in g["vsum"]], axis=0)
        n = int(g["n"].sum())
        mean = np.round(total / n, ndigits)
        # metadata-free Arrow: keeps schemas hashable for Ray's reduce dedup
        return pa.table(
            {
                "label": pa.array(np.full(len(mean), lab, dtype="int64"), type=pa.int64()),
                "dim": pa.array(np.arange(len(mean), dtype="int64"), type=pa.int64()),
                "mean_val": pa.array(mean.astype("float64"), type=pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("label").map_groups(merge, batch_format="pandas").sort(["label", "dim"])


def quantize_int8_profile(ds, vec_col: str = "embedding", num_buckets: int = 8):
    """Two-pass per-dimension int8 quantization profile — the vector-
    compression prep (scalar quantization) that shrinks an ANN corpus 4x
    before indexing. Pass 1: per-batch per-dim (min, max) partials (a
    dims-sized row per batch) merged by one tiny bucketed aggregate; the
    (lo, hi) table is dims-sized and broadcast once via ray.put. Pass 2:
    one scan quantizes q = floor((v - lo) * 255 / (hi - lo)) clamped to
    [0, 255] (floor, NOT round: identical IEEE semantics on both engines;
    constant dims quantize to 0 by the hi==lo guard) and pre-sums per dim.

    Exactness: float32 inputs are widened to float64 (exact), the quantize
    expression is the same three IEEE ops in the same order as the SQL
    mirror, and the output sums are integers. Returns
    (dim, lo, hi, n, sum_q) sorted by dim — a corpus-level compression
    profile whose hash checks every quantized value."""
    import ray

    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.util import sort_coalesced

    mm_schema = pa.schema([("dim", pa.int64()), ("lo", pa.float64()), ("hi", pa.float64())])

    def mat(b: pa.Table) -> np.ndarray:
        return vec_matrix(b.column(vec_col))

    def minmax_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return mm_schema.empty_table()
        m = mat(b)
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1]), type=pa.int64()),
            "lo": pa.array(m.min(axis=0), type=pa.float64()),
            "hi": pa.array(m.max(axis=0), type=pa.float64()),
        }, schema=mm_schema)

    bounds = bucketed_aggregate(
        ds.map_batches(minmax_partial, batch_format="pyarrow"), ["dim"],
        {"lo": ("lo", "min"), "hi": ("hi", "max")},
        out_schema=mm_schema, num_buckets=num_buckets, in_schema=mm_schema,
    ).materialize()
    bt = pa.concat_tables([t for t in ray.get(bounds.to_arrow_refs()) if t.num_rows])
    order = np.argsort(np.asarray(bt.column("dim").to_pylist(), dtype=np.int64))
    lo = np.asarray(bt.column("lo").to_pylist(), dtype=np.float64)[order]
    hi = np.asarray(bt.column("hi").to_pylist(), dtype=np.float64)[order]
    ref = ray.put((lo, hi))

    part_schema = pa.schema([("dim", pa.int64()), ("n", pa.int64()), ("sum_q", pa.int64())])

    def quant_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        blo, bhi = ray.get(ref)
        m = mat(b)
        span = bhi - blo
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((m - blo) * 255.0 / span)
        q = np.where(span == 0.0, 0.0, q)
        q = np.clip(q, 0.0, 255.0).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1]), type=pa.int64()),
            "n": pa.array(np.full(m.shape[1], m.shape[0]), type=pa.int64()),
            "sum_q": pa.array(q.sum(axis=0), type=pa.int64()),
        }, schema=part_schema)

    sums = bucketed_aggregate(
        ds.map_batches(quant_partial, batch_format="pyarrow"), ["dim"],
        {"n": ("n", "sum"), "sum_q": ("sum_q", "sum")},
        out_schema=part_schema, num_buckets=num_buckets, in_schema=part_schema,
    )
    def attach(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("dim", pa.int64()), ("lo", pa.float64()), ("hi", pa.float64()),
                              ("n", pa.int64()), ("sum_q", pa.int64())]).empty_table()
        blo, bhi = ray.get(ref)
        d = np.asarray(b.column("dim").to_pylist(), dtype=np.int64)
        return pa.table({
            "dim": pa.array(d, type=pa.int64()),
            "lo": pa.array(blo[d], type=pa.float64()),
            "hi": pa.array(bhi[d], type=pa.float64()),
            "n": b.column("n"), "sum_q": b.column("sum_q"),
        })

    return sort_coalesced(sums.map_batches(attach, batch_format="pyarrow"), "dim")
