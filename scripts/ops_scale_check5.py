"""Round-5 part-6 operator scale smoke: deterministic distributed synthetic
inputs, walls are smoke-scale proofs on a shared host (not steady-state
benchmarks). Run: python -u scripts/ops_scale_check5.py [num_cpus]

Covers:
- bpe_train at 400k docs / ~48M tokens / 50k-word vocabulary: the corpus
  pass is one word-count exchange; both the driver merge loop and the
  distributed merge loop (word_collect_max=0, 40 vocab-sized exchanges)
  are timed and must agree.
- semdedup at 500k x 64-dim embeddings / 512 centroids: cluster sizes
  ~1k, so the within-cluster quadratic is ~1M sims per cluster — the
  clustering is what makes 500k^2 tractable.
- events_throttle_first at 20M events / 500k users: combiner-first, the
  exchange carries one partial row per (user, window) per upstream batch.
- mixture_plan(temperature=True) at 400k docs / 200 sources.
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

    # --- 1. BPE at 400k docs / 50k-word vocab ------------------------------
    from text_to_graph_ray.functions.bpe import bpe_train

    N_DOCS, N_WORDS = 400_000, 50_000
    VOCAB = np.array([f"w{j}x{j % 7}" for j in range(N_WORDS)])

    def doc_chunk(a, b):
        ids = np.arange(a, b, dtype=np.int64)
        texts = []
        for i in ids:
            L = 60 + (i * 31) % 120
            idx = (i * 7919 + np.arange(L) * ((i % 97) + 3)) % N_WORDS
            texts.append(" ".join(VOCAB[idx]))
        return pa.table({"text": pa.array(texts, type=pa.string())})

    docs = gen_range(N_DOCS, 64, doc_chunk).materialize()
    t0 = time.monotonic()
    a = bpe_train(docs, n_merges=40).to_pandas()
    w_drv = time.monotonic() - t0
    t0 = time.monotonic()
    b = bpe_train(docs, n_merges=40, word_collect_max=0).to_pandas()
    w_dist = time.monotonic() - t0
    assert a.equals(b), "driver vs distributed BPE plans diverged"
    assert len(a) == 40
    log(f"bpe_train 400k docs/~48M tokens/50k vocab: driver plan {w_drv:.1f}s, "
        f"distributed plan {w_dist:.1f}s (40 merges, plans identical)")

    # --- 2. semdedup at 500k x 64 dims -------------------------------------
    from text_to_graph_ray.functions.dedup import semdedup

    N_VEC, DIM = 500_000, 64

    def vec_chunk(a, b):
        ids = np.arange(a, b, dtype=np.int64)
        rng = np.random.default_rng(a)  # chunk-deterministic
        v = rng.standard_normal((len(ids), DIM)).astype(np.float32)
        # plant near-dups: every 1000th vector duplicates its predecessor
        dup = (ids % 1000 == 0) & (ids > 0)
        if dup.any():
            v[dup] = v[np.where(dup)[0] - 1] + 1e-4
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "embedding": pa.array([r.tolist() for r in v], type=pa.list_(pa.float32()))})

    emb = gen_range(N_VEC, 64, vec_chunk).materialize()
    t0 = time.monotonic()
    out = semdedup(emb, tau=0.99, n_centroids=512, cluster_rows_max=200_000)
    n_removed = out.map_batches(
        lambda t: pa.table({"r": pa.array([int((~t.column("kept").to_numpy(zero_copy_only=False)).sum())])}),
        batch_format="pyarrow",
    ).sum("r")
    w = time.monotonic() - t0
    log(f"semdedup 500k x 64d / 512 clusters: {w:.1f}s ({n_removed} removed; "
        f"planted near-dup pairs only collapse when both land in one cluster — scoping is the design trade)")
    assert n_removed > 0

    # --- 3. throttle at 20M events -----------------------------------------
    from text_to_graph_ray.pipelines.analytics import events_throttle_first

    N_EV, N_USERS = 20_000_000, 500_000

    def ev_chunk(a, b):
        i = np.arange(a, b, dtype=np.int64)
        u = (i * 2654435761) % N_USERS
        ts = (i * 499) % 86_400_000_000
        return pa.table({
            "event_id": pa.array(i, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(u, type=pa.int64()),
        })

    import tempfile

    tmp = tempfile.mkdtemp(prefix="ops5_")
    gen_range(N_EV, 128, ev_chunk).write_parquet(f"{tmp}/events.parquet")
    t0 = time.monotonic()
    th = events_throttle_first(tmp, window_s=60)
    n_windows = th.count()
    n_total = int(th.sum("n_events"))
    w = time.monotonic() - t0
    assert n_total == N_EV
    log(f"events_throttle 20M events/500k users: {w:.1f}s ({n_windows} windows kept)")

    # --- 4. temperature mixture at 400k docs / 200 sources ------------------
    from text_to_graph_ray.functions.sample import mixture_plan

    def src_chunk(a, b):
        ids = np.arange(a, b, dtype=np.int64)
        src = (ids * 31) % 200
        texts = [" ".join(["tok"] * int(20 + (i % 50))) for i in ids]
        return pa.table({"source": pa.array(np.char.add("s", src.astype(str)), type=pa.string()),
                         "text": pa.array(texts, type=pa.string())})

    sdocs = gen_range(N_DOCS, 64, src_chunk).materialize()
    t0 = time.monotonic()
    mx = mixture_plan(sdocs, budget_tokens=10_000_000, by="source", temperature=True).to_pandas()
    w = time.monotonic() - t0
    assert int(mx["alloc_tokens"].sum()) == 10_000_000
    log(f"mixture_plan(temperature) 400k docs/200 sources: {w:.1f}s (allocs sum exactly)")

    ray.shutdown()


if __name__ == "__main__":
    main()
