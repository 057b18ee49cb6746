"""Round-5 new-operator scale smoke: deterministic distributed synthetic
inputs, walls are smoke-scale proofs on a shared host (not steady-state
benchmarks). Run: python -u scripts/ops_scale_check3.py [num_cpus]

Covers:
- triangle_counts on a CELEBRITY graph (one hub wired to every node): the
  round-4 id-oriented plan would enumerate deg(hub)^2 wedges from the hub
  (~1e10 rows at hub degree 1e5 — unrunnable); the degree-ordered plan
  sources every wedge at a low-degree spoke, so wedge rows stay O(m).
- lookup_join at 10M facts x 200k dims, broadcast AND fallback plans.
- mad_outliers at 10M rows / 50 groups.
- lexical_stats at 400k synthetic docs (vectorized ttr + token entropy).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def log(msg):
    print(msg, flush=True)


def gen_range(n, parts, fn):
    """Distributed deterministic generator: fn(start, stop) -> pa.Table."""
    bounds = np.linspace(0, n, parts + 1, dtype=np.int64)
    items = [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]

    def make(batch):
        out = [fn(a, b) for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist())]
        return pa.concat_tables(out)

    src = rd.from_arrow(pa.table({"a": pa.array([a for a, _ in items], type=pa.int64()),
                                  "b": pa.array([b for _, b in items], type=pa.int64())}))
    return src.repartition(len(items)).map_batches(make, batch_format="pyarrow", batch_size=1)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # --- 1. celebrity-graph triangles -------------------------------------
    # hub 0 -- every spoke 1..N; ring i--i+1 over the spokes. Triangles =
    # one per ring edge = N-2. Old plan: deg(hub)=N -> N^2 wedges from the
    # hub (1e10 at N=1e5). New plan: hub edges orient spoke->hub, wedges
    # come only from degree<=3 spokes.
    N = 100_000

    def edges_fn(a, b):
        i = np.arange(a, b, dtype=np.int64)
        hub_src = np.zeros(len(i), dtype=np.int64)
        ring_src = i[(i >= 1) & (i < N - 1)]
        return pa.table({
            "src": pa.array(np.concatenate([hub_src, ring_src]), type=pa.int64()),
            "dst": pa.array(np.concatenate([i, ring_src + 1]), type=pa.int64()),
        })

    from text_to_graph_ray.functions.graph import triangle_counts

    edges = gen_range(N, 64, edges_fn).materialize()
    t0 = time.time()
    tri = triangle_counts(edges).materialize()
    rows = tri.count()
    import pyarrow.compute as pc

    total = sum(pc.sum(t.column("triangles")).as_py() for t in ray.get(tri.to_arrow_refs()) if t.num_rows)
    hub = [t.filter(pc.equal(t.column("node"), 0)) for t in ray.get(tri.to_arrow_refs())]
    hub_n = sum(t.column("triangles")[0].as_py() for t in hub if t.num_rows)
    log(f"triangles celebrity N={N}: {time.time()-t0:.1f}s rows={rows} "
        f"sum={total} (expect {3*(N-2)}) hub={hub_n} (expect {N-2})")
    assert total == 3 * (N - 2) and hub_n == N - 2

    # --- 2. lookup_join 10M x 200k ----------------------------------------
    NF, ND = 10_000_000, 200_000

    def facts_fn(a, b):
        i = np.arange(a, b, dtype=np.int64)
        return pa.table({"k": pa.array(i % (2 * ND), type=pa.int64()),  # half miss
                         "v": pa.array(i, type=pa.int64())})

    def dim_fn(a, b):
        i = np.arange(a, b, dtype=np.int64)
        return pa.table({"dk": pa.array(i, type=pa.int64()),
                         "w": pa.array(i * 7, type=pa.int64())})

    from text_to_graph_ray.functions.joins import lookup_join

    facts = gen_range(NF, 64, facts_fn).materialize()
    dim = gen_range(ND, 8, dim_fn).materialize()
    for tag, bmax in (("broadcast", 5_000_000), ("fallback", 0)):
        t0 = time.time()
        out = lookup_join(facts, dim, key="k", right_key="dk", cols=["w"], broadcast_max=bmax).materialize()
        n = out.count()
        matched = sum(
            t.filter(pc.is_valid(t.column("w"))).num_rows for t in ray.get(out.to_arrow_refs()) if t.num_rows
        )
        log(f"lookup_join[{tag}] {NF/1e6:.0f}M x {ND/1e3:.0f}k: {time.time()-t0:.1f}s "
            f"rows={n} matched={matched} (expect {NF//2})")
        assert n == NF and matched == NF // 2

    # --- 3. mad_outliers 10M rows / 50 groups -----------------------------
    NM, G = 10_000_000, 50

    def vals_fn(a, b):
        i = np.arange(a, b, dtype=np.int64)
        g = i % G
        # deterministic pseudo-noise; every 1000th value is a 100x outlier
        base = ((i * 2654435761) % 1000).astype(np.float64) / 100.0 + g * 10.0
        base[i % 1000 == 0] += 1000.0
        return pa.table({"g": pa.array(g.astype(str), type=pa.string()),
                         "x": pa.array(base, type=pa.float64())})

    from text_to_graph_ray.functions.stats import mad_outliers

    vals = gen_range(NM, 64, vals_fn).materialize()
    t0 = time.time()
    out = mad_outliers(vals, "g", "x", k=3.0).materialize()
    tt = pa.concat_tables([t for t in ray.get(out.to_arrow_refs()) if t.num_rows])
    n_tot = pc.sum(tt.column("n")).as_py()
    n_anom = pc.sum(tt.column("n_anomalies")).as_py()
    log(f"mad_outliers {NM/1e6:.0f}M/{G}g: {time.time()-t0:.1f}s groups={tt.num_rows} "
        f"n={n_tot} anomalies={n_anom} (expect {NM//1000})")
    assert n_tot == NM and n_anom == NM // 1000

    # --- 4. lexical_stats 400k docs ---------------------------------------
    ND2 = 400_000
    VOCAB = np.array([f"w{j}" for j in range(5000)], dtype=object)

    def docs_fn(a, b):
        i = np.arange(a, b, dtype=np.int64)
        texts = [" ".join(VOCAB[(int(x) * 17 + np.arange(64) * (1 + int(x) % 7)) % 5000]) for x in i]
        return pa.table({"doc_id": pa.array(i, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    from text_to_graph_ray.functions.text import lexical_stats

    docs = gen_range(ND2, 64, docs_fn).materialize()
    t0 = time.time()
    lex = docs.map_batches(lexical_stats, batch_format="pyarrow").materialize()
    n = lex.count()
    log(f"lexical_stats {ND2/1e3:.0f}k docs x 64 toks: {time.time()-t0:.1f}s rows={n}")
    assert n == ND2

    log("ops_scale_check3: ALL OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
