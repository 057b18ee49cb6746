"""Canonicalization + graph materialize — the wide (shuffle) stages.

Reference semantics re-expressed as two-phase distributed aggregation:
* entity grouping by ``entity_key = sanitize(label).lower()`` with type-set
  union (/root/reference/graph_extractor/src/graph_utils.py:13-88 G1),
* cross-document provenance union (graph_utils.py:144-251 G3) as list columns
  instead of ``"label|d1|d2"`` string packing,
* exact triple dedup on ``(src_key, lower(pred), dst_key)``
  (graph_utils.py:61-64 G2),
* deterministic dense ids by rank over ``sort(entity_key)`` — a deliberate
  strengthening of the reference's insertion-order ids
  (sqlite_support.py:468-474 has no ORDER BY; SURVEY §1.3).

Physical design (why it looks the way it does):
* **Combined single pass**: node mentions and edges shuffle TOGETHER (a
  ``kind`` column), so nodes+edges need one consumption of the record stream
  and one groupby — no mid-pipeline materialize of the full record table.
* **Combiner first**: each batch is reduced to DISTINCT partial rows
  (vectorized pandas ``drop_duplicates``) before the exchange, so a hot key
  ("log" called from every file, "utils.py" at 10^12-file scale) ships one row
  per upstream batch, not one per mention — the salted/two-phase-aggregation
  requirement of the north rule.
* **Hash-bucket groups**: the shuffle groups by a stable hash bucket of the
  key (``pandas.util.hash_pandas_object``, process-stable), and each bucket
  merges all its keys in one vectorized call — same result as a per-key
  groupby at a fraction of the per-group scheduling overhead.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from text_to_graph_ray.util import pa_from_pandas

from text_to_graph_ray.keys import entity_key

SEP = "\x1f"


def _stable_bucket(series: pd.Series, buckets: int) -> pd.Series:
    # deterministic across processes (fixed hash key, no PYTHONHASHSEED issues)
    return (pd.util.hash_pandas_object(series, index=False) % buckets).astype("int64")


def combined_partials(batch: pa.Table, buckets: int, salt: int = 1) -> pa.Table:
    """Resolved records -> distinct partial rows for BOTH kinds:

      kind='n': k1=entity_key, k2=label,        k3=type,    repo
      kind='e': k1=src_key,    k2=lower(pred),  k3=dst_key, repo

    One vectorized drop_duplicates per kind; bucket = stable hash of the
    grouping key.

    ``salt > 1`` enables the SALTED two-phase plan (north-rule skew
    handling): the bucket additionally hashes a salt derived from the row's
    VALUE payload (nodes: (label, type, repo); edges: repo; defs: module), so
    a hot key's surviving distinct rows spread across up to ``salt`` merge
    tasks instead of serializing in one. The phase-A merge is the ordinary
    ``merge_bucket`` (it groups by key within each salted bucket); a second
    unsalted exchange over the (already partially packed) rows finishes with
    ``merge_bucket_packed`` — set-union semantics make the two-phase result
    value-identical regardless of how values split across salts."""
    df = batch.select(["kind", "a", "b", "c", "a_key", "c_key", "repo"]).to_pandas()

    n = df[df["kind"] == "node"]
    nodes = pd.DataFrame(
        {"kind": "n", "k1": n["a_key"], "k2": n["a"], "k3": n["b"], "repo": n["repo"]}
    ).drop_duplicates()
    nkey = nodes["k1"]
    if salt > 1:
        nkey = nkey + SEP + _stable_bucket(nodes["k2"] + SEP + nodes["k3"] + SEP + nodes["repo"], salt).astype(str)
    nodes["bucket"] = _stable_bucket(nkey, buckets)

    e = df[df["kind"] == "edge"]
    edges = pd.DataFrame(
        {"kind": "e", "k1": e["a_key"], "k2": e["b"].str.lower(), "k3": e["c_key"], "repo": e["repo"]}
    ).drop_duplicates()
    ekey = edges["k1"] + SEP + edges["k2"] + SEP + edges["k3"]
    if salt > 1:
        ekey = ekey + SEP + _stable_bucket(edges["repo"], salt).astype(str)
    edges["bucket"] = _stable_bucket(ekey, buckets)

    d = df[df["kind"] == "def"]
    defs = pd.DataFrame({"kind": "d", "k1": d["a_key"], "k2": d["b"], "k3": "", "repo": ""}).drop_duplicates()
    dkey = defs["k1"]
    if salt > 1:
        dkey = dkey + SEP + _stable_bucket(defs["k2"], salt).astype(str)
    defs["bucket"] = _stable_bucket(dkey, buckets)

    out = pd.concat([nodes, edges, defs], ignore_index=True)
    return pa_from_pandas(out)


def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Merge one hash bucket: entity rows -> (entity_key, label, types_packed,
    repos_packed); edge rows -> (src,pred,dst, repos_packed). Python dict work
    is proportional to the bucket's DISTINCT rows (already combiner-reduced)."""
    rows_kind, rows_k1, rows_k2, rows_k3, rows_pack = [], [], [], [], []

    n = group[group["kind"] == "n"]
    ents: dict[str, tuple[set, set, set]] = {}
    for k1, k2, k3, repo in zip(n["k1"], n["k2"], n["k3"], n["repo"]):
        ent = ents.get(k1)
        if ent is None:
            ent = ents[k1] = (set(), set(), set())
        ent[0].add(k2)
        ent[1].add(k3)
        ent[2].add(repo)
    for k in sorted(ents):
        labels, types, repos = ents[k]
        own = [l for l in labels if entity_key(l) == k]
        rows_kind.append("n")
        rows_k1.append(k)
        rows_k2.append(min(own) if own else min(labels))
        rows_k3.append("|".join(sorted(t for t in types if t)))
        rows_pack.append("|".join(sorted(repos)))

    e = group[group["kind"] == "e"]
    eds: dict[tuple, set] = {}
    for k1, k2, k3, repo in zip(e["k1"], e["k2"], e["k3"], e["repo"]):
        eds.setdefault((k1, k2, k3), set()).add(repo)
    for (k1, k2, k3) in sorted(eds):
        rows_kind.append("e")
        rows_k1.append(k1)
        rows_k2.append(k2)
        rows_k3.append(k3)
        rows_pack.append("|".join(sorted(eds[(k1, k2, k3)])))

    _append_def_rows(group, rows_kind, rows_k1, rows_k2, rows_k3, rows_pack)

    # return Arrow, not pandas: object-dtype pandas blocks force a slow
    # string conversion in every downstream stage (and in materialize)
    return _merged_table(rows_kind, rows_k1, rows_k2, rows_k3, rows_pack)


def _append_def_rows(group, rows_kind, rows_k1, rows_k2, rows_k3, rows_pack):
    d = group[group["kind"] == "d"]
    if len(d):
        for k1, k2 in sorted(set(zip(d["k1"], d["k2"]))):
            rows_kind.append("d")
            rows_k1.append(k1)
            rows_k2.append(k2)
            rows_k3.append("")
            rows_pack.append("")


def _merged_table(kind, k1, k2, k3, pack) -> pa.Table:
    return pa.table(
        {
            "kind": pa.array(kind, type=pa.string()),
            "k1": pa.array(k1, type=pa.string()),
            "k2": pa.array(k2, type=pa.string()),
            "k3": pa.array(k3, type=pa.string()),
            "repos_packed": pa.array(pack, type=pa.string()),
        }
    )


def merge_bucket_packed(group: pd.DataFrame) -> pd.DataFrame:
    """Second-phase merge after entity linking re-keys the (already merged,
    vocabulary-sized) graph: groups whose keys collided post-linking union
    their packed label/type/repo sets. Input/output schema == merge_bucket's
    output."""
    rows_kind, rows_k1, rows_k2, rows_k3, rows_pack = [], [], [], [], []

    n = group[group["kind"] == "n"]
    ents: dict[str, tuple[set, set, set]] = {}
    for k1, k2, k3, rp in zip(n["k1"], n["k2"], n["k3"], n["repos_packed"]):
        ent = ents.get(k1)
        if ent is None:
            ent = ents[k1] = (set(), set(), set())
        ent[0].add(k2)
        ent[1].update(k3.split("|") if k3 else [])
        ent[2].update(rp.split("|"))
    for k in sorted(ents):
        labels, types, repos = ents[k]
        own = [l for l in labels if entity_key(l) == k]
        rows_kind.append("n")
        rows_k1.append(k)
        rows_k2.append(min(own) if own else min(labels))
        rows_k3.append("|".join(sorted(t for t in types if t)))
        rows_pack.append("|".join(sorted(repos)))

    e = group[group["kind"] == "e"]
    eds: dict[tuple, set] = {}
    for k1, k2, k3, rp in zip(e["k1"], e["k2"], e["k3"], e["repos_packed"]):
        eds.setdefault((k1, k2, k3), set()).update(rp.split("|"))
    for (k1, k2, k3) in sorted(eds):
        rows_kind.append("e")
        rows_k1.append(k1)
        rows_k2.append(k2)
        rows_k3.append(k3)
        rows_pack.append("|".join(sorted(eds[(k1, k2, k3)])))

    _append_def_rows(group, rows_kind, rows_k1, rows_k2, rows_k3, rows_pack)

    return _merged_table(rows_kind, rows_k1, rows_k2, rows_k3, rows_pack)


def split_nodes(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    t = batch.filter(pc.equal(batch.column("kind"), "n"))
    return pa.table(
        {
            "entity_key": t.column("k1"),
            "label": t.column("k2"),
            "types_packed": t.column("k3"),
            "repos_packed": t.column("repos_packed"),
        }
    )


def split_edges(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    t = batch.filter(pc.equal(batch.column("kind"), "e"))
    return pa.table(
        {
            "src_key": t.column("k1"),
            "pred": t.column("k2"),
            "dst_key": t.column("k3"),
            "repos_packed": t.column("repos_packed"),
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
