"""Round-5 part-3/4 operator scale smoke: deterministic distributed
synthetic inputs, walls are smoke-scale proofs on a shared host (not
steady-state benchmarks). Run: python -u scripts/ops_scale_check4.py [num_cpus]

Covers:
- event_type_transitions at 10M events / 500k users / 20 types (one
  user-keyed exchange; transition exchange carries <= buckets*K^2 rows).
- bigram_lm_nll at 200k synthetic docs (combiner counting pass +
  lookup_join count attachment + keyed reduce).
- categorical_drift_chi2 at 10M rows / 40 categories (combiner partials
  only; answer-sized finish).
- common_neighbor_topk on a CELEBRITY graph (100k-degree hub): exact
  common-neighbor counting is inherently Σ deg(center)^2 — the hub alone
  is 1e10 wedge rows, unrunnable — so this smoke proves the documented
  mitigation: hub_degree_cap skips the hub (surfaced count) and the
  remaining ring wedges finish in seconds. RA weights ride along.
- minhash_cross_pairs at 100k x 100k docs (fuzzy decontamination shape:
  only cross-side pairs generate).
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

    # --- 1. markov transitions at 10M events ------------------------------
    from text_to_graph_ray.pipelines.analytics import event_type_transitions

    N_EV, N_USERS, N_TYPES = 10_000_000, 500_000, 20

    def ev_chunk(a, b):
        i = np.arange(a, b, dtype=np.int64)
        # deterministic mixed congruential streams
        u = (i * 2654435761) % N_USERS
        ty = ((i * 40503) ^ (i >> 7)) % N_TYPES
        ts = (i * 997) % 86_400_000_000
        return pa.table({
            "event_id": pa.array(i, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(u, type=pa.int64()),
            "event_type": pa.array(np.char.add("t", ty.astype(str)), type=pa.string()),
        })

    import tempfile

    tmp = tempfile.mkdtemp(prefix="ops4_")
    gen_range(N_EV, 128, ev_chunk).write_parquet(f"{tmp}/events.parquet")
    t0 = time.monotonic()
    out = event_type_transitions(tmp).to_pandas()
    w = time.monotonic() - t0
    # the congruential type stream need not produce every (from, to) combo
    assert 0 < len(out) <= N_TYPES * N_TYPES, len(out)
    assert int(out["n"].sum()) == N_EV - N_USERS  # every user's first event has no prev
    log(f"markov_transitions 10M events/500k users: {w:.1f}s ({len(out)} cells)")

    # --- 2. bigram LM at 200k docs ----------------------------------------
    from text_to_graph_ray.functions.text import bigram_lm_nll

    N_DOCS = 200_000
    VOCAB = np.array([f"w{j}" for j in range(5000)])

    def doc_chunk(a, b):
        ids = np.arange(a, b, dtype=np.int64)
        texts = []
        for i in ids:
            L = 40 + (i * 31) % 160
            idx = (i * 7919 + np.arange(L) * ((i % 97) + 3)) % len(VOCAB)
            texts.append(" ".join(VOCAB[idx]))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    docs = gen_range(N_DOCS, 64, doc_chunk).materialize()
    t0 = time.monotonic()
    lm = bigram_lm_nll(docs)
    n_rows = lm.count()
    w = time.monotonic() - t0
    assert n_rows == N_DOCS
    log(f"bigram_lm_nll 200k docs (~24M tokens): {w:.1f}s")

    # --- 3. drift chi2 at 10M rows ----------------------------------------
    from text_to_graph_ray.functions.stats import categorical_drift_chi2

    def drift_chunk(a, b):
        i = np.arange(a, b, dtype=np.int64)
        cat = (i * 48271) % 40
        # plant drift: category 7 appears 3x more often on side B
        side = ((i * 69621) % 97) < 48
        side = side | (cat == 7) & (((i * 131) % 4) != 0)
        return pa.table({"cat": pa.array(np.char.add("c", cat.astype(str)), type=pa.string()),
                         "side": pa.array(side, type=pa.bool_())})

    dr = gen_range(N_EV, 128, drift_chunk)
    t0 = time.monotonic()
    out = categorical_drift_chi2(dr, "cat", "side").to_pandas()
    w = time.monotonic() - t0
    assert len(out) == 40
    top = out.sort_values("chi2_term").iloc[-1]["cat"]
    assert top == "c7", top
    log(f"drift_chi2 10M rows/40 cats: {w:.1f}s (top drift {top})")

    # --- 4. celebrity-graph common neighbors with hub cap ------------------
    from text_to_graph_ray.functions.graph import common_neighbor_topk

    N = 100_000

    def edge_chunk(a, b):
        spokes = np.arange(max(a, 1), b, dtype=np.int64)
        hub = pa.table({"src": pa.array(np.zeros(len(spokes), dtype=np.int64), type=pa.int64()),
                        "dst": pa.array(spokes, type=pa.int64())})
        ring_lo = spokes[spokes < N - 1]
        ring = pa.table({"src": pa.array(ring_lo, type=pa.int64()),
                         "dst": pa.array(ring_lo + 1, type=pa.int64())})
        return pa.concat_tables([hub, ring])

    edges = gen_range(N, 64, edge_chunk).materialize()
    stats: dict = {}
    t0 = time.monotonic()
    out = common_neighbor_topk(edges, k=50, min_common=1, hub_degree_cap=1000,
                               stats=stats, rank_by="ra", include_ra=True).to_pandas()
    w = time.monotonic() - t0
    assert stats["cn_hubs_skipped"] == 1
    # ring spokes i, i+2 share center i+1 (degree 3): top RA pairs
    assert len(out) == 50 and out.iloc[0]["cn"] >= 1
    log(f"common_neighbor_topk celebrity(100k-deg hub, capped): {w:.1f}s "
        f"(skipped={stats['cn_hubs_skipped']}; exact would be ~1e10 hub wedges)")

    # --- 5. cross-corpus minhash at 100k x 100k ---------------------------
    from text_to_graph_ray.functions.dedup import minhash_cross_pairs

    N_SIDE = 100_000

    def corpus_chunk(offset):
        def f(a, b):
            ids = np.arange(a, b, dtype=np.int64)
            texts = []
            for i in ids:
                base = (i * 2654435761) % 50_000  # ~2x collision rate across sides
                idx = (base * 7919 + np.arange(60) * (base % 89 + 3)) % len(VOCAB)
                texts.append(" ".join(VOCAB[idx]))
            return pa.table({"doc_id": pa.array(ids + offset, type=pa.int64()),
                             "text": pa.array(texts, type=pa.string())})
        return f

    left = gen_range(N_SIDE, 64, corpus_chunk(0)).materialize()
    right = gen_range(N_SIDE, 64, corpus_chunk(0)).materialize()  # same generator: every doc has a cross twin
    stats2: dict = {}
    t0 = time.monotonic()
    pairs = minhash_cross_pairs(left, right, threshold=0.5, stats=stats2)
    n_pairs = pairs.count()
    w = time.monotonic() - t0
    assert n_pairs > 0
    log(f"minhash_cross_pairs 100k x 100k: {w:.1f}s ({n_pairs} pairs, "
        f"dropped={stats2.get('lsh_pairs_dropped')})")

    ray.shutdown()


if __name__ == "__main__":
    main()
