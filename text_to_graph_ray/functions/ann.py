"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exact baseline: query matrix broadcast once via
  ``ray.put``; each batch is one float64 matmul; per-batch top-k partials are
  merged with a final tiny groupby (combiner-first, no full shuffle of the
  corpus).
* ``lsh_topk`` — the scale path: signed-random-projection buckets; only
  same-bucket (plus probe) candidates are scored. Approximate by design;
  recall measured in tests, rows-only checked by the driver.

Determinism: scores computed in float64 and rounded to 1e-6; ranking key is
(round(sim,6) DESC, id ASC) so ties break identically in the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from text_to_graph_ray.util import vec_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_partials_fn(ref, id_col, vec_col, k):
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(vec_matrix(batch.column(vec_col)))
        sims = np.round(q_mat @ vecs.T, 6)  # (Q, B)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        take = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # batch-local top-k partial; ties -> lower vec_id first
            order = np.lexsort((ids, -sims[qi]))[:take]
            rows["query_id"].extend([int(q_ids[qi])] * len(order))
            rows["vec_id"].extend(int(ids[j]) for j in order)
            rows["sim"].extend(float(sims[qi, j]) for j in order)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
                "sim": pa.array(rows["sim"], type=pa.float64()),
            }
        )

    return fn


def _merge_partials(partials, q_ids, k):
    """Final per-query merge of the (tiny: #blocks × Q × k rows) top-k
    partials. Coalescing to ~Q blocks first keeps the groupby's shuffle from
    emitting schema-less empty partitions (Ray warns on those) and cuts
    per-tiny-group scheduling overhead; the query set is broadcast-bounded,
    so Q is small by construction."""
    # ~Q/2 partitions: with >= 2 keys per sampled boundary range every shuffle
    # partition is (near-)guaranteed non-empty
    n_parts = max(1, min((len(q_ids) + 1) // 2, 16))
    return partials.repartition(n_parts).groupby("query_id").map_groups(_merge_topk(k), batch_format="pandas")


def _merge_topk(k):
    def fn(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        # fixed metadata-free Arrow schema (schema-stable through sort/union)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(dtype="int64"), type=pa.int64()),
                "vec_id": pa.array(g["vec_id"].to_numpy(dtype="int64"), type=pa.int64()),
                "sim": pa.array(g["sim"].to_numpy(dtype="float64"), type=pa.float64()),
                "rank": pa.array(np.arange(1, len(g) + 1, dtype="int64"), type=pa.int64()),
            }
        )

    return fn


def brute_force_topk(ds, query_ids, query_vecs, k=10, id_col="vec_id", vec_col="embedding"):
    """Exact top-k cosine neighbors for each query vector.
    query_vecs: (Q, D) array-like; returns (query_id, rank, vec_id, sim)."""
    import ray

    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ref = ray.put((q_ids, q_mat))
    partials = ds.map_batches(_topk_partials_fn(ref, id_col, vec_col, k), batch_format="pyarrow")
    merged = _merge_partials(partials, q_ids, k)
    return merged.sort(["query_id", "rank"])


def queries_from_dataset(ds, n_queries=8, id_col="vec_id", vec_col="embedding"):
    """First n vectors (by id) as the query set — deterministic."""
    rows = ds.sort(id_col).limit(n_queries).take_all()
    ids = [r[id_col] for r in rows]
    vecs = [r[vec_col] for r in rows]
    return ids, np.asarray(vecs, dtype=np.float64)


# ---------------------------------------------------------------------------
# IVF variant (coarse k-means quantizer; the list-pruned scale path)
# ---------------------------------------------------------------------------


def kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means over a (normalized) float64 sample:
    init = first n_centroids sample rows, cosine assignment, mean update,
    empty clusters keep their previous centroid. No RNG anywhere — the same
    sample always yields the same centroids (the oracle reproduces this)."""
    sample = _normalize(sample.astype(np.float64))
    n_centroids = min(n_centroids, len(sample))
    cent = sample[:n_centroids].copy()
    for _ in range(iters):
        cn = _normalize(cent)
        assign = np.argmax(sample @ cn.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return _normalize(cent)


class IvfAssigner:
    """Actor-pool stage: centroids held once per actor; each batch gets its
    nearest-centroid list id appended."""

    def __init__(self, centroids_ref=None, centroids: np.ndarray | None = None, vec_col: str = "embedding"):
        if centroids is None:
            import ray

            centroids = ray.get(centroids_ref)
        self.cent = centroids
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(vec_matrix(batch.column(self.vec_col)))
        lists = np.argmax(vecs @ self.cent.T, axis=1).astype("int64")
        return batch.append_column("list_id", pa.array(lists))


def ivf_topk(
    ds,
    query_ids,
    query_vecs,
    k=10,
    n_centroids=16,
    nprobe=4,
    train_rows=2048,
    id_col="vec_id",
    vec_col="embedding",
):
    """IVF approximate top-k: a coarse k-means quantizer trained on a BOUNDED
    deterministic sample (first train_rows by id — O(train_rows) driver
    memory regardless of corpus size), centroids broadcast once; every vector
    is assigned to its nearest list by an actor pool, and each query scores
    only the nprobe nearest lists. Recall rises with nprobe (= n_centroids
    recovers brute force)."""
    import ray

    sample_rows = ds.sort(id_col).limit(train_rows).take_all()
    if not sample_rows:  # zero-row corpus: nothing to index, schema-stable empty result
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        )
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_fit(sample, n_centroids)

    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_sims = q_mat @ cent.T
    nprobe = min(nprobe, cent.shape[0])
    q_lists = np.argsort(-q_sims, axis=1)[:, :nprobe]  # (Q, nprobe) probed list ids
    ref = ray.put((q_ids, q_mat, q_lists))
    cent_ref = ray.put(cent)

    assigned = ivf_assigned(ds, cent_ref, vec_col)

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, ql = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(vec_matrix(batch.column(vec_col)))
        lists = np.asarray(batch.column("list_id").to_pylist(), dtype=np.int64)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        for q in range(len(qi)):
            mask = np.isin(lists, ql[q])
            if not mask.any():
                continue
            sims = np.round(qm[q] @ vecs[mask].T, 6)
            cand = ids[mask]
            take = min(k, len(cand))
            order = np.lexsort((cand, -sims))[:take]
            rows["query_id"].extend([int(qi[q])] * len(order))
            rows["vec_id"].extend(int(cand[j]) for j in order)
            rows["sim"].extend(float(sims[j]) for j in order)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
                "sim": pa.array(rows["sim"], type=pa.float64()),
            }
        )

    partials = assigned.map_batches(score, batch_format="pyarrow")
    return _merge_partials(partials, q_ids, k).sort(["query_id", "rank"])


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------


_STAGE_CACHE: dict = {}


def lsh_bucketed(ds, dim: int, n_planes: int, seed: int, vec_col: str):
    """LshIndexer as a TASK pool with per-process cached planes — trivial
    state, so a task pool scales with the scheduler while paying the
    construction once per reused worker process (see NOTES.md: Ray's
    autoscaling actor pool plateaus well below its ceiling)."""
    key = ("lsh", dim, n_planes, seed, vec_col)

    def fn(b: pa.Table) -> pa.Table:
        ix = _STAGE_CACHE.get(key)
        if ix is None:
            ix = _STAGE_CACHE[key] = LshIndexer(dim, n_planes, seed, vec_col)
        return ix(b)

    return ds.map_batches(fn, batch_format="pyarrow")


def ivf_assigned(ds, centroids_ref, vec_col: str):
    """IvfAssigner as a TASK pool: centroids fetched once per worker process
    via the object store (zero-copy shared memory), same rationale as
    lsh_bucketed. Cache is keyed by vec_col ONLY and swaps when the ref
    changes, so repeated ivf_topk calls don't accumulate stale centroid
    matrices in long-lived workers."""
    ref_id = centroids_ref.hex() if hasattr(centroids_ref, "hex") else id(centroids_ref)

    def fn(b: pa.Table) -> pa.Table:
        key = ("ivf", vec_col)
        cached = _STAGE_CACHE.get(key)
        if cached is None or cached[0] != ref_id:
            cached = _STAGE_CACHE[key] = (ref_id, IvfAssigner(centroids_ref=centroids_ref, vec_col=vec_col))
        return cached[1](b)

    return ds.map_batches(fn, batch_format="pyarrow")


class LshIndexer:
    """Signed-random-projection bucketer: hyperplanes drawn once per process
    (see lsh_bucketed) or per actor from a fixed seed; each batch appends its
    bucket key."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42, vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim)).astype(np.float64)
        self.vec_col = vec_col

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) >= 0
        return (signs.astype(np.uint32) << np.arange(signs.shape[1], dtype=np.uint32)).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(vec_matrix(batch.column(self.vec_col)))
        return batch.append_column("bucket", pa.array(self.bucket_of(vecs).astype("int64")))


def lsh_topk(ds, query_ids, query_vecs, k=10, id_col="vec_id", vec_col="embedding", n_planes=8, seed=42):
    """Approximate top-k: score only vectors whose bucket matches a query's
    bucket. Smaller n_planes -> bigger buckets -> higher recall/cost."""
    import ray

    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = q_mat.shape[1]
    indexer = LshIndexer(dim, n_planes, seed, vec_col)
    q_buckets = indexer.bucket_of(q_mat)
    ref = ray.put((q_ids, q_mat, q_buckets))

    bucketed = lsh_bucketed(ds, dim, n_planes, seed, vec_col)

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, qb = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(vec_matrix(batch.column(vec_col)))
        buckets = np.asarray(batch.column("bucket").to_pylist(), dtype=np.int64)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        for q in range(len(qi)):
            mask = buckets == qb[q]
            if not mask.any():
                continue
            sims = np.round(qm[q] @ vecs[mask].T, 6)
            cand = ids[mask]
            take = min(k, len(cand))
            order = np.lexsort((cand, -sims))[:take]
            rows["query_id"].extend([int(qi[q])] * len(order))
            rows["vec_id"].extend(int(cand[j]) for j in order)
            rows["sim"].extend(float(sims[j]) for j in order)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
                "sim": pa.array(rows["sim"], type=pa.float64()),
            }
        )

    partials = bucketed.map_batches(score, batch_format="pyarrow")
    return _merge_partials(partials, q_ids, k).sort(["query_id", "rank"])


def topk_recall(approx_ds, exact_ds, k: int):
    """recall@k of an approximate top-k result against the exact
    brute-force ground truth — the acceptance metric for the LSH / IVF
    scale paths (how much quality the bucketing trades for speed).

    Both inputs are top-k result tables (query_id, vec_id, ...), ANSWER-
    sized by construction (n_queries x k rows), so the driver intersects
    them directly — no exchange. recall = hits / k is one integer ratio
    + one IEEE division + round(6), mirrored verbatim in SQL. Queries are
    taken from the APPROX side (a query whose buckets returned nothing
    has no row anywhere, matching the SQL's distinct-from-approx frame).

    Returns (query_id, hits int64, recall float64) sorted by query_id."""
    import pyarrow as pa

    approx = {(int(r["query_id"]), int(r["vec_id"])) for r in approx_ds.take_all()}
    exact = {(int(r["query_id"]), int(r["vec_id"])) for r in exact_ds.take_all()}
    qids = sorted({q for q, _ in approx})
    hits = {q: 0 for q in qids}
    for q, v in approx & exact:
        hits[q] += 1
    return pa.table({
        "query_id": pa.array(qids, type=pa.int64()),
        "hits": pa.array([hits[q] for q in qids], type=pa.int64()),
        "recall": pa.array([round(float(hits[q]) / float(k), 6) for q in qids], type=pa.float64()),
    })


def kmeans_profile(ds, n_centroids: int = 16, train_rows: int = 2048,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic k-means clustering profile of the embedding corpus:
    (list_id, n_vecs, simq_sum) per cluster — the vector-store layout /
    corpus-clustering report (cluster balance + cohesion) built on the same
    quantizer the IVF index uses.

    Same spec as ``ivf_topk``: Lloyd k-means on the first ``train_rows``
    vectors by id (bounded, deterministic, no RNG), centroids broadcast
    once; every vector's cosine to its NEAREST centroid is quantized to
    int64 ``round(sim·10⁹)`` per row, so per-cluster sums are integers —
    order-independent and reproducible by the naive oracle. Per-batch
    partials are ≤ n_centroids rows; the driver folds #blocks·n_centroids
    ints (answer-sized)."""
    import ray
    import ray.data as rd

    out_schema = pa.table({
        "list_id": pa.array([], type=pa.int64()),
        "n_vecs": pa.array([], type=pa.int64()),
        "simq_sum": pa.array([], type=pa.int64()),
    }).schema
    sample_rows = ds.sort(id_col).limit(train_rows).take_all()
    if not sample_rows:
        return rd.from_arrow(out_schema.empty_table())
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_fit(sample, n_centroids)
    cent_ref = ray.put(cent)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        c = ray.get(cent_ref)
        vn = _normalize(vec_matrix(batch.column(vec_col)))
        sims = vn @ c.T
        lists = np.argmax(sims, axis=1).astype(np.int64)
        best = np.max(sims, axis=1)
        simq = np.round(best * 1e9)  # < 2^53: float bincount sums stay exact
        n = np.bincount(lists, minlength=len(c)).astype(np.int64)
        s = np.bincount(lists, weights=simq, minlength=len(c)).astype(np.int64)
        keep = n > 0
        return pa.table({
            "list_id": pa.array(np.flatnonzero(keep).astype(np.int64), type=pa.int64()),
            "n_vecs": pa.array(n[keep], type=pa.int64()),
            "simq_sum": pa.array(s[keep], type=pa.int64()),
        }, schema=out_schema)

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in rows:
        a = acc.setdefault(int(r["list_id"]), [0, 0])
        a[0] += int(r["n_vecs"])
        a[1] += int(r["simq_sum"])
    lids = sorted(acc)
    return rd.from_arrow(pa.table({
        "list_id": pa.array(lids, type=pa.int64()),
        "n_vecs": pa.array([acc[i][0] for i in lids], type=pa.int64()),
        "simq_sum": pa.array([acc[i][1] for i in lids], type=pa.int64()),
    }, schema=out_schema))


def kmeans_outliers(ds, n_centroids: int = 16, train_rows: int = 2048, z: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Cluster-cohesion outlier screen: vectors whose cosine to their
    assigned centroid sits more than ``z`` standard deviations BELOW the
    cluster mean — the embedding-corpus anomaly filter riding the same
    deterministic quantizer as ``kmeans_profile``.

    Exactness without overflow: per-vector cosines quantize to
    q = round(sim·10⁷) (so q² ≤ 10¹⁴ and a 4096-row batch's Σq² ≤ 4·10¹⁷
    stay comfortably inside int64); per-cluster sufficient sums (n, Σq,
    Σq²) fold in arbitrary-precision Python ints on the driver, and the
    z-test ``(mean − x)/σ > z`` ⇔ ``d = Σq − n·x ≥ isqrt(z²(n·Σq² − Σq²ᵗᵒᵗ)) + 1``
    collapses to ONE integer boundary per cluster:
    ``x ≤ X_c = (Σq − isqrt(z²·(n·Σq² − (Σq)²)) − 1) // n`` (math.isqrt is
    exact) — so the second pass flags with a single vectorized int64
    compare. A zero-variance cluster flags every strictly-below-mean
    member (the σ→0 limit of the test); an exactly-uniform cluster flags
    none. Returns (vec_id, list_id, simq) flagged rows sorted by vec_id.
    """
    import math

    import ray
    import ray.data as rd

    out_schema = pa.schema([("vec_id", pa.int64()), ("list_id", pa.int64()), ("simq", pa.int64())])
    sample_rows = ds.sort(id_col).limit(train_rows).take_all()
    if not sample_rows:
        return rd.from_arrow(out_schema.empty_table())
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_fit(sample, n_centroids)
    cent_ref = ray.put(cent)
    nc = len(cent)

    part_schema = pa.schema([("list_id", pa.int64()), ("n", pa.int64()),
                             ("s", pa.int64()), ("ss", pa.int64())])

    def assign(batch: pa.Table):
        c = ray.get(cent_ref)
        vn = _normalize(vec_matrix(batch.column(vec_col)))
        sims = vn @ c.T
        lists = np.argmax(sims, axis=1).astype(np.int64)
        simq = np.round(np.max(sims, axis=1) * 1e7).astype(np.int64)
        return lists, simq

    def stats_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        lists, simq = assign(batch)
        n = np.bincount(lists, minlength=nc).astype(np.int64)
        s = np.bincount(lists, weights=simq, minlength=nc).astype(np.int64)
        ss = np.bincount(lists, weights=(simq * simq).astype(np.float64), minlength=nc)
        # q² ≤ 1e14 and ≤ 4096 rows/batch: the float64 bincount sums are
        # exact (< 2^53); cast back loss-free
        ss = ss.astype(np.int64)
        keep = n > 0
        idx = np.flatnonzero(keep).astype(np.int64)
        return pa.table({"list_id": pa.array(idx), "n": pa.array(n[keep]),
                         "s": pa.array(s[keep]), "ss": pa.array(ss[keep])}, schema=part_schema)

    rows = ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=4096).take_all()
    acc: dict = {}
    for r in rows:  # Python ints: no overflow at any corpus size
        a = acc.setdefault(int(r["list_id"]), [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["s"])
        a[2] += int(r["ss"])
    bounds = np.full(nc, np.iinfo(np.int64).min, dtype=np.int64)
    for li, (n, s, ss) in acc.items():
        t = z * z * (n * ss - s * s)
        bounds[li] = (s - math.isqrt(t) - 1) // n
    bounds_ref = ray.put(bounds)

    def flag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        lists, simq = assign(batch)
        b = ray.get(bounds_ref)
        m = simq <= b[lists]
        if not m.any():
            return out_schema.empty_table()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vec_id": pa.array(ids[m]), "list_id": pa.array(lists[m]),
                         "simq": pa.array(simq[m])}, schema=out_schema)

    from text_to_graph_ray.util import sort_coalesced

    return sort_coalesced(ds.map_batches(flag, batch_format="pyarrow", batch_size=4096), "vec_id")
