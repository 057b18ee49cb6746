"""High-cardinality aggregation without per-group Python dispatch.

Ray's built-in ``groupby().aggregate()`` (sort-based shuffle) combines per
GROUP at the Python level in both the map and the reduce tasks — fine for a
handful of groups, ruinous when the key is near-unique (measured at sf0.1:
a 147k-group Sum over 581k rows spends ~10 s / ~200 µs-per-group in
AggregateMap+AggregateReduce combine; the same aggregate through
``bucketed_aggregate`` runs in ~1.5 s). ``GroupedData.map_groups`` pays the
same tax: one block-slice + batch-format conversion + UDF call per fine
group.

These helpers shuffle on a COARSE hash bucket instead (cardinality =
``num_buckets``, so Ray's per-group dispatch runs ``num_buckets`` times
total) and run the real per-key aggregation VECTORIZED (one
``DataFrame.groupby`` per bucket) inside each bucket. Because every row of a
fine key lands in exactly one bucket, any per-group aggregate — including
non-decomposable ones (median, nunique) — is exact, not approximate.

Scale shape: the exchange moves the same bytes as a keyed groupby would
(it IS a keyed shuffle, just on ``hash(key) % B``), so skew across fine
keys is smoothed over buckets; one pathological hot KEY still lands in one
bucket, the same hot-spot a plain groupby would have. ``num_buckets``
should be ~2-8× cluster cores so bucket tasks saturate the cluster.

Bucket assignment uses ``pandas.util.hash_pandas_object`` (SipHash with a
fixed key) — deterministic across processes, machines and runs, vectorized
in C, and defined for string, numeric and multi-column keys alike.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from text_to_graph_ray.util import pa_from_pandas

BUCKET_COL = "__agg_bucket"


def _as_key_list(keys) -> list:
    return [keys] if isinstance(keys, str) else list(keys)


def with_bucket(ds, keys, num_buckets: int = 64, in_schema: pa.Schema | None = None):
    """Append a deterministic coarse-bucket column (``hash(keys) % B``).

    Arrow-native: the block stays zero-copy; only the key columns round-trip
    through pandas for the SipHash. ``in_schema`` (recommended) pins the
    schema of schema-less empty blocks (an all-empty upstream partition loses
    its column list through Ray's block plumbing) so this stage emits a
    stable RefBundle schema.
    """
    keys = _as_key_list(keys)

    def add(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            sch = in_schema if (in_schema is not None and t.num_columns == 0) else t.schema
            return pa.schema(list(sch) + [pa.field(BUCKET_COL, pa.int64())]).empty_table()
        h = pd.util.hash_pandas_object(t.select(keys).to_pandas(), index=False).to_numpy()
        return t.append_column(BUCKET_COL, pa.array((h % num_buckets).astype("int64")))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None)


def bucketed_aggregate(
    ds,
    keys,
    aggs: dict,
    out_schema: pa.Schema | None = None,
    num_buckets: int = 64,
    in_schema: pa.Schema | None = None,
):
    """``ds.groupby(keys).aggregate(...)`` for high-cardinality keys.

    ``aggs`` maps output column name -> ``(input_col, pandas_op)`` where
    ``pandas_op`` is any ``DataFrame.groupby().agg`` reduction (``"sum"``,
    ``"min"``, ``"max"``, ``"size"``, ``"mean"``, ``"median"``, ...).
    NOTE: non-reassociable ops (``mean``/``median``) see the rows that reach
    this operator — if the caller pre-combined per batch, pass the
    decomposed sums instead.

    ``out_schema`` (recommended) pins the output column types so empty or
    skewed buckets cannot destabilize downstream RefBundle schemas.
    """
    keys = _as_key_list(keys)
    named = {a: pd.NamedAgg(column=c, aggfunc=op) for a, (c, op) in aggs.items()}

    def agg_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 and out_schema is not None:  # empty shuffle partition (may be schema-less)
            return out_schema.empty_table()
        g = df.groupby(keys, as_index=False, sort=False).agg(**named)
        if out_schema is not None:
            return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in out_schema})
        return pa_from_pandas(g)

    out = (
        with_bucket(ds, keys, num_buckets, in_schema=in_schema)
        # ~B/2 shuffle partitions => >= 2 bucket values per sampled boundary
        # range, so the groupby's sort-shuffle emits no schema-less empty
        # partitions (same trick as ann._merge_topk)
        .repartition(max(1, num_buckets // 2))
        .groupby(BUCKET_COL)
        .map_groups(agg_bucket, batch_format="pandas")
    )
    if out_schema is not None:
        out = _pin_schema(out, out_schema)
    return out


def bucketed_map_groups(ds, keys, fn, out_schema: pa.Schema, num_buckets: int = 64, in_schema: pa.Schema | None = None):
    """``ds.groupby(keys).map_groups(fn)`` with per-fine-group dispatch done
    by an in-process ``DataFrame.groupby`` instead of one Ray UDF call (and
    one batch-format conversion) per group. ``fn`` receives each fine group
    as a DataFrame (bucket column already dropped) and must return a
    ``pa.Table``; results are concatenated per bucket under ``out_schema``.
    """
    keys = _as_key_list(keys)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:  # empty shuffle partition (may be schema-less)
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL])
        outs = []
        for _, g in df.groupby(keys, sort=False):
            t = fn(g)
            if t is not None and t.num_rows:
                outs.append(t.cast(out_schema))
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    return _pin_schema(
        with_bucket(ds, keys, num_buckets, in_schema=in_schema)
        .repartition(max(1, num_buckets // 2))  # see bucketed_aggregate
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas"),
        out_schema,
    )


def _pin_schema(ds, out_schema: pa.Schema):
    """Union a zero-row out_schema block so a zero-group input (map_groups
    emits NO blocks) still yields a dataset with the declared schema.  The
    pinned block goes FIRST — the union's schema resolves from the first
    non-empty operand schema."""
    import ray.data as rd

    return rd.from_arrow(out_schema.empty_table()).union(ds)


def topk_per_group(
    ds,
    keys,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
    out_schema: pa.Schema | None = None,
    num_buckets: int = 64,
    in_schema: pa.Schema | None = None,
):
    """Top-``k`` rows per fine group, ordered by ``order_col`` (then
    ``tiebreak`` ascending, for a deterministic result set).

    Scale shape: a PER-BATCH combiner prunes each upstream batch to its own
    local top-k per key before the exchange (the global top-k per key is a
    subset of the union of per-batch top-ks), so the shuffle carries at most
    ``k`` rows per key per upstream batch — the hot-key bound is ``k × #batches``,
    not the key's row count. The bucketed reduce then takes the exact top-k
    per key vectorized (one sort + ``groupby.head`` per bucket).
    """
    keys = _as_key_list(keys)
    by = keys + [order_col] + ([tiebreak] if tiebreak else [])
    asc = [True] * len(keys) + [not descending] + ([True] if tiebreak else [])

    def prune(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            sch = in_schema or out_schema
            return sch.empty_table() if sch is not None else pa_from_pandas(df)
        top = df.sort_values(by, ascending=asc, kind="mergesort").groupby(keys, sort=False).head(k)
        return pa_from_pandas(top.reset_index(drop=True))

    def per_group(g: pd.DataFrame) -> pa.Table:
        top = g.sort_values(by[len(keys):], ascending=asc[len(keys):], kind="mergesort").head(k)
        if out_schema is not None:
            return pa.table({f.name: pa.array(top[f.name], type=f.type) for f in out_schema})
        return pa_from_pandas(top.reset_index(drop=True))

    pruned = ds.map_batches(prune, batch_format="pandas", batch_size=None)
    if out_schema is None:
        # derive a pinned schema from the input if available
        raise ValueError("topk_per_group requires out_schema (stable empty-block schemas)")
    return bucketed_map_groups(pruned, keys, per_group, out_schema, num_buckets=num_buckets, in_schema=in_schema)
