"""Round-5 part-10 operator scale smoke: deterministic distributed synthetic
inputs, walls are smoke-scale proofs on a shared host (not steady-state
benchmarks). Run: python -u scripts/ops_scale_check7.py [num_cpus]

Covers:
- ktruss_bounded at 2M distinct edges / 50k nodes (k=5, 3 rounds): per
  round one degree-oriented per-edge support pass; plus a celebrity-hub
  graph (100k-degree node) where the degree orientation keeps the wedge
  volume near-linear.
- naive_bayes_classify at 400k docs / 5 synthetic classes: model stays
  distributed (pair combiner -> token pivot), classification is one
  lookup_join + doc-keyed sum.
- kmeans_profile at 1M x 64-dim embeddings: bounded sample fit, broadcast
  centroids, bincount partials only.
- user_ema + cusum_changepoint at 10M events / 100k users: ONE keyed
  coarse-bucket exchange each, vectorized segment kernels.
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
    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from text_to_graph_ray.functions.ann import kmeans_profile
    from text_to_graph_ray.functions.graph import ktruss_bounded
    from text_to_graph_ray.functions.text import naive_bayes_classify
    from text_to_graph_ray.pipelines.analytics import cusum_changepoint, user_ema

    # --- ktruss: 2M-edge random graph on 50k nodes -------------------------
    N_NODE, N_EDGE = 50_000, 2_000_000

    def edge_chunk(a, b):
        i = np.arange(a, b, dtype=np.int64)
        s = (i * 6364136223846793005 + 1442695040888963407) % N_NODE
        d = (i * 2862933555777941757 + 3037000493) % N_NODE
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    edges = gen_range(N_EDGE, 128, edge_chunk)
    t0 = time.monotonic()
    stats = {}
    out = ktruss_bounded(edges, k=5, max_rounds=3, stats=stats)
    n = out.count()
    log(f"ktruss 2M edges k=5: {time.monotonic()-t0:.1f}s surviving={n} rounds={stats['ktruss_rounds']}")

    # celebrity hub: node 0 adjacent to 100k nodes + a clique background
    def hub_chunk(a, b):
        i = np.arange(a, b, dtype=np.int64)
        return pa.table({"src": pa.array(np.zeros_like(i)), "dst": pa.array(i + 1)})

    hub = gen_range(100_000, 16, hub_chunk)
    ring = gen_range(100_000, 16, lambda a, b: pa.table({
        "src": pa.array(np.arange(a, b, dtype=np.int64) + 1),
        "dst": pa.array((np.arange(a, b, dtype=np.int64) + 1) % 100_000 + 1),
    }))
    t0 = time.monotonic()
    nh = ktruss_bounded(hub.union(ring), k=3, max_rounds=2).count()
    log(f"ktruss celebrity hub (100k-deg): {time.monotonic()-t0:.1f}s surviving={nh}")

    # --- Naive Bayes: 400k docs / 5 classes --------------------------------
    CLS = ["aa", "bb", "cc", "dd", "ee"]
    VOC = np.array([f"t{j}" for j in range(20_000)])

    def doc_chunk(a, b):
        ids = np.arange(a, b, dtype=np.int64)
        texts, labs = [], []
        for i in ids:
            c = int((i // 7) % 5)  # NOT i%5: the train/test split is id%5
            L = 40 + (i * 13) % 60
            idx = (i * 104729 + np.arange(L) * ((i % 89) + 2)) % 4000 + c * 4000
            texts.append(" ".join(VOC[idx]))
            labs.append(CLS[c])
        return pa.table({"doc_id": pa.array(ids), "lang": pa.array(labs, type=pa.string()),
                         "text": pa.array(texts, type=pa.string())})

    docs = gen_range(400_000, 128, doc_chunk).materialize()
    t0 = time.monotonic()
    nb = naive_bayes_classify(docs)
    acc = nb.map_batches(lambda t: pa.table({"c": [int(pa.compute.sum(t.column("correct")).as_py() or 0)],
                                             "n": [t.num_rows]}), batch_format="pyarrow").to_pandas()
    log(f"naive_bayes 400k docs: {time.monotonic()-t0:.1f}s acc={acc['c'].sum()}/{acc['n'].sum()}")

    # --- kmeans profile: 1M x 64 embeddings --------------------------------
    def vec_chunk(a, b):
        ids = np.arange(a, b, dtype=np.int64)
        base = ((ids[:, None] * 31 + np.arange(64)[None, :] * 17) % 1000).astype(np.float32) / 500 - 1
        return pa.table({"vec_id": pa.array(ids),
                         "embedding": pa.array(list(base), type=pa.list_(pa.float32()))})

    vecs = gen_range(1_000_000, 128, vec_chunk).materialize()
    t0 = time.monotonic()
    km = kmeans_profile(vecs).to_pandas()
    log(f"kmeans_profile 1M x 64: {time.monotonic()-t0:.1f}s clusters={len(km)} total={km['n_vecs'].sum()}")

    # --- EMA + CUSUM: 10M events / 100k users ------------------------------
    import tempfile

    def ev_chunk(a, b):
        i = np.arange(a, b, dtype=np.int64)
        return pa.table({
            "event_id": pa.array(i),
            "ts": pa.array(i * 1000 + (i * 7919) % 997, type=pa.timestamp("us")),
            "user_id": pa.array((i * 2654435761) % 100_000),
            "event_type": pa.array(np.where(i % 3 == 0, "click", np.where(i % 3 == 1, "view", "buy"))),
            "value": pa.array(((i * 37) % 40000).astype(np.float64) / 100 + 0.01),
            "props": pa.array(np.full(len(i), "{}")),
        })

    with tempfile.TemporaryDirectory() as d:
        gen_range(10_000_000, 128, ev_chunk).write_parquet(d)
        # user_ema/cusum read {dir}/events.parquet: compact the shards there
        sf = os.path.join(d, "sf")
        os.makedirs(sf)
        import glob
        import pyarrow.parquet as pq
        import pyarrow.dataset as pds

        dset = pds.dataset([f for f in glob.glob(f"{d}/*.parquet")])
        pq.write_table(dset.to_table(), os.path.join(sf, "events.parquet"))
        t0 = time.monotonic()
        ne = user_ema(sf).count()
        log(f"user_ema 10M events/100k users: {time.monotonic()-t0:.1f}s users={ne}")
        t0 = time.monotonic()
        nc = cusum_changepoint(sf).count()
        log(f"cusum 10M events/3 types: {time.monotonic()-t0:.1f}s rows={nc}")

    ray.shutdown()


if __name__ == "__main__":
    main()
