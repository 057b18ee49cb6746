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


def label_centroids(ds, label_col: str = "label", vec_col: str = "embedding", ndigits: int = 4):
    # ndigits=4: float64 summation-order noise across shuffle orders is
    # ~1e-13 relative, so a 5e-5 rounding boundary is effectively never
    # crossed — the value hash stays stable run-to-run and vs the SQL avg()
    def partial(b: pa.Table) -> pa.Table:
        labels = np.asarray(b.column(label_col).to_pylist(), dtype=np.int64)
        vecs = np.asarray(b.column(vec_col).to_pylist(), dtype=np.float64)
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
