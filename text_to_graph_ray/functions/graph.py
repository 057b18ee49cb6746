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
        t = sch.types[sch.names.index(a_col)] if a_col in sch.names else pa.int64()
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
        # labels fall monotonically under min-propagation; a fixed point of the
        # (label-count per label) histogram hash means converged. min() on the
        # label column is type-agnostic; for the convergence check we hash a
        # distributed aggregate instead of sum() so string ids work too.
        sig = labels.map_batches(
            lambda b: pa.table({"h": pa.array([_batch_sig(b)], type=pa.int64())}), batch_format="pyarrow"
        ).sum("h")
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


def _batch_sig(b: pa.Table) -> int:
    """Order-insensitive content signature of a (node, label) batch: sum of
    crc32(node=label) per row, wrapped to int64. Used for convergence
    detection that works for string ids too."""
    import zlib

    tot = 0
    for n, l in zip(b.column("node").to_pylist(), b.column("label").to_pylist()):
        tot = (tot + zlib.crc32(f"{n}\x00{l}".encode("utf-8"))) & 0x7FFFFFFFFFFF
    return tot
