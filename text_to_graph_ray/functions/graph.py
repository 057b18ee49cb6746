"""Generic graph operators over an edge Dataset.

``connected_components``: weakly-connected components with the same guarded
two-path design as every small-side assumption in this repo — exact driver
union-find while the edge table is comfortably small (<= collect_max rows,
broadcast only the result), else distributed min-label propagation (one hash
join + groupby-min per round, label-sum convergence, loud failure if a
component's diameter outruns max_rounds). Works for integer or string node
ids (component representative = the min id under the type's natural order).

Used by ``dedup.near_dup_survivors`` (doc-id pair graph) and the
``kg_components`` driver query (entity-key graph).
"""

from __future__ import annotations

import pyarrow as pa


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b", max_rounds: int = 64, collect_max: int = 2_000_000):
    """(a, b) edge rows -> (node, component) for every node in the graph."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    pairs = pairs_ds.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        sch = pairs.schema()
        t = sch.types[sch.names.index(a_col)] if sch is not None and a_col in sch.names else pa.int64()
        return rd.from_arrow(pa.table({"node": pa.array([], type=t), "component": pa.array([], type=t)}))

    if n_pairs <= collect_max:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for a, bb in zip(b.column(a_col).to_pylist(), b.column(b_col).to_pylist()):
                parent.setdefault(a, a)
                parent.setdefault(bb, bb)
                ra, rb = find(a), find(bb)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
        nodes = sorted(parent)
        comp = [find(x) for x in nodes]
        t = pa.array(nodes).type
        return rd.from_arrow(pa.table({"node": pa.array(nodes, type=t), "component": pa.array(comp, type=t)}))

    # distributed min-label propagation
    def undirected(b: pa.Table) -> pa.Table:
        a, bb = b.column(a_col), b.column(b_col)
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), bb.combine_chunks()]),
                "dst": pa.concat_arrays([bb.combine_chunks(), a.combine_chunks()]),
            }
        )

    from text_to_graph_ray.functions.dedup import join_partitions_for

    edges = pairs.map_batches(undirected, batch_format="pyarrow").materialize()
    labels = (
        edges.map_batches(lambda b: pa.table({"node": b.column("src"), "label": b.column("src")}), batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    n_parts = join_partitions_for()
    prev = None
    converged = False
    for _ in range(max_rounds):
        msgs = edges.join(
            labels, join_type="inner", num_partitions=n_parts, on=("src",), right_on=("node",), partition_size_hint=32 << 20
        ).map_batches(lambda b: pa.table({"node": b.column("dst"), "label": b.column("label")}), batch_format="pyarrow")
        labels = msgs.union(labels).groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        # labels fall monotonically under min-propagation: any change alters
        # the (node,label) content, so a fixed content signature means
        # converged. The signature is a 128-bit md5-sum (order-insensitive,
        # per-block partials combined on the driver — #blocks rows only):
        # collision probability ~2^-128, i.e. not a realistic failure mode,
        # and it works for string ids where an exact label-sum does not.
        sig = _labels_signature(labels)
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds — increase max_rounds"
        )
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "component": b.column("label")}), batch_format="pyarrow"
    )


def _batch_sig(b: pa.Table) -> str:
    """Order-insensitive 128-bit content partial of a (node, label) batch:
    sum of md5(row) as a big int, returned as a decimal string (Arrow batches
    can't carry >64-bit ints)."""
    import hashlib

    tot = 0
    for n, l in zip(b.column("node").to_pylist(), b.column("label").to_pylist()):
        tot += int.from_bytes(hashlib.md5(f"{n}\x00{l}".encode("utf-8")).digest(), "little")
    return str(tot)


def _labels_signature(labels) -> int:
    """Combine per-block partials on the driver (#blocks rows, tiny)."""
    parts = labels.map_batches(
        lambda b: pa.table({"h": pa.array([_batch_sig(b)], type=pa.string())}), batch_format="pyarrow"
    ).take_all()
    return sum(int(r["h"]) for r in parts)
