"""Canonicalization + graph materialize — the wide (shuffle) stages.

Reference semantics re-expressed as two-phase distributed aggregation:
* entity grouping by ``entity_key = sanitize(label).lower()`` with type-set
  union (/root/reference/graph_extractor/src/graph_utils.py:13-88 G1),
* cross-document provenance union (graph_utils.py:144-251 G3) as a proper
  ``repos`` list column instead of ``"label|d1|d2"`` string packing,
* exact triple dedup on ``(src_key, lower(pred), dst_key)``
  (graph_utils.py:61-64 G2),
* deterministic dense ids by rank over ``sort(entity_key)`` — a deliberate
  strengthening of the reference's insertion-order ids
  (sqlite_support.py:468-474 has no ORDER BY; see SURVEY §1.3).

Skew design: each batch is pre-aggregated (combiner) before the shuffle, so a
hot key ("log" called from every file, "utils.py" at 10^12-file scale) ships at
most one row per upstream batch into the exchange instead of one per mention —
the two-phase/salted-aggregation requirement of the north rule. Groups are
merged with ``map_groups`` over packed partial sets.

Label rule: canonical label = lexicographically-min original label whose own
entity_key equals the group key (deterministic stand-in for the reference's
order-dependent first-seen casing, graph_utils.py:41-45; identical whenever a
key has a single casing, which conformance fixtures assert).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from text_to_graph_ray.keys import entity_key

SEP = "\x1f"  # packs partial sets; never appears in sanitized labels/types/repos


def node_partials(batch: pa.Table) -> pa.Table:
    """records (kind=node, with resolved a_key) -> one partial row per entity
    key per batch: packed label/type/repo sets. The combiner half of G1/G3."""
    kinds = batch.column("kind").to_pylist()
    keys = batch.column("a_key").to_pylist()
    labels = batch.column("a").to_pylist()
    types = batch.column("b").to_pylist()
    repos = batch.column("repo").to_pylist()

    agg: dict[str, tuple[set, set, set]] = {}
    for kind, k, label, typ, repo in zip(kinds, keys, labels, types, repos):
        if kind != "node":
            continue
        ls, ts, rs = agg.setdefault(k, (set(), set(), set()))
        ls.add(label)
        ts.add(typ)
        rs.add(repo)
    out_keys = sorted(agg)
    return pa.table(
        {
            "entity_key": pa.array(out_keys, type=pa.string()),
            "labels_packed": pa.array([SEP.join(sorted(agg[k][0])) for k in out_keys], type=pa.string()),
            "types_packed": pa.array([SEP.join(sorted(agg[k][1])) for k in out_keys], type=pa.string()),
            "repos_packed": pa.array([SEP.join(sorted(agg[k][2])) for k in out_keys], type=pa.string()),
        }
    )


def merge_node_group(group: pd.DataFrame) -> pd.DataFrame:
    """Final merge of one entity's partials (runs inside groupby.map_groups)."""
    key = group["entity_key"].iloc[0]
    labels: set = set()
    types: set = set()
    repos: set = set()
    for ls, ts, rs in zip(group["labels_packed"], group["types_packed"], group["repos_packed"]):
        labels.update(ls.split(SEP))
        types.update(ts.split(SEP))
        repos.update(rs.split(SEP))
    own = [l for l in labels if entity_key(l) == key]
    label = min(own) if own else min(labels)
    return pd.DataFrame(
        {
            "entity_key": [key],
            "label": [label],
            "types_packed": ["|".join(sorted(t for t in types if t))],
            "repos_packed": ["|".join(sorted(repos))],
        }
    )


def edge_partials(batch: pa.Table) -> pa.Table:
    """records (kind=edge, resolved a_key/c_key) -> one partial row per triple
    per batch with a packed repo set. The combiner half of G2/G3."""
    kinds = batch.column("kind").to_pylist()
    srcs = batch.column("a_key").to_pylist()
    preds = batch.column("b").to_pylist()
    dsts = batch.column("c_key").to_pylist()
    repos = batch.column("repo").to_pylist()

    agg: dict[tuple, set] = {}
    for kind, s, p, d, r in zip(kinds, srcs, preds, dsts, repos):
        if kind != "edge":
            continue
        agg.setdefault((s, p.lower(), d), set()).add(r)
    items = sorted(agg)
    return pa.table(
        {
            "src_key": pa.array([k[0] for k in items], type=pa.string()),
            "pred": pa.array([k[1] for k in items], type=pa.string()),
            "dst_key": pa.array([k[2] for k in items], type=pa.string()),
            "repos_packed": pa.array([SEP.join(sorted(agg[k])) for k in items], type=pa.string()),
        }
    )


def merge_edge_group(group: pd.DataFrame) -> pd.DataFrame:
    repos: set = set()
    for rs in group["repos_packed"]:
        repos.update(rs.split(SEP))
    first = group.iloc[0]
    return pd.DataFrame(
        {
            "src_key": [first["src_key"]],
            "pred": [first["pred"]],
            "dst_key": [first["dst_key"]],
            "repos_packed": ["|".join(sorted(repos))],
        }
    )


def add_dense_index(ds, col: str = "entity_id"):
    """Deterministic 0..N-1 ids over an already-sorted Dataset.

    The Dataset API has no zip-with-index, so this drops to raw Ray for the one
    thing it can't express: per-block offsets. The sorted dataset's blocks are
    counted (tiny metadata tasks), a prefix sum computed on the driver, and
    each block gets a range column — no data leaves the object store.
    """
    import ray

    @ray.remote
    def count_rows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def with_index(t: pa.Table, offset: int) -> pa.Table:
        import numpy as np

        idx = pa.array(np.arange(offset, offset + t.num_rows, dtype="int64"))
        return t.add_column(0, col, idx)

    mds = ds.materialize()
    refs = mds.to_arrow_refs()
    counts = ray.get([count_rows.remote(r) for r in refs])
    offsets = []
    total = 0
    for c in counts:
        offsets.append(total)
        total += c
    out_refs = [with_index.remote(r, o) for r, o in zip(refs, offsets)]
    import ray.data as rd

    return rd.from_arrow_refs(out_refs)
