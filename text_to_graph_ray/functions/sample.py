"""Deterministic sampling operators for training-data pipelines.

Both are shuffle-light: ``mod_sample`` is a pure per-batch filter (no exchange
at all); ``stratified_sample`` exchanges only group keys and survives skew by
truncating per group. Both are exactly reproducible in SQL, so the driver
hash-checks them against DuckDB.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def mod_sample(ds, rate_pct: int, id_col: str = "doc_id", knuth: int = 2654435761):
    """Deterministic ~rate_pct% sample: keep rows where
    (id * knuth) mod 100 < rate_pct (Knuth multiplicative hash — spreads
    sequential ids; pure column arithmetic, reproducible anywhere including
    SQL). No shuffle, no RNG state."""

    def f(b: pa.Table) -> pa.Table:
        import numpy as np

        # product stays < 2^63 for any realistic id, so numpy and SQL compute
        # the identical exact value — no wraparound semantics to match
        ids = np.asarray(b.column(id_col).to_pylist(), dtype=np.uint64)
        keep = (ids * np.uint64(knuth)) % np.uint64(100) < np.uint64(rate_pct)
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow").sort(id_col)


def stratified_sample(ds, key_col: str, n_per_key: int, id_col: str = "doc_id"):
    """First n rows (by id) per key value — deterministic per-stratum cap
    (per-language / per-source quotas in corpus building). One groupby
    exchange; a hyper-skewed stratum still only emits n rows."""

    def take_first(g: pd.DataFrame) -> pa.Table:
        from text_to_graph_ray.util import pa_from_pandas

        return pa_from_pandas(g.sort_values(id_col).head(n_per_key))

    return ds.groupby(key_col).map_groups(take_first, batch_format="pandas").sort([key_col, id_col])
