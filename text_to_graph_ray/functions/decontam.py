"""Benchmark decontamination: flag training documents that share any n-token
n-gram with a held-out evaluation split — the standard pre-training hygiene
pass (13-gram overlap in GPT-3 appendix C; the same shape removes eval
leakage from any 100-TB crawl before training).

No reference analogue (the reference is a single-corpus KG extractor); this is
one of the first-class LLM-data-pipeline operators this engine adds.

Scale shape (mirrors the repo's guarded-small-side discipline):

1. ONE pruned read, shingled per batch; per-document DISTINCT n-grams are
   taken inside the batch (each document is one row, so per-row dedup is
   exact) — the exchange carries each (doc, gram) at most once.
2. The eval side collapses to a global DISTINCT gram table via the same
   coarse-bucket distinct used everywhere (``functions.agg.distinct_rows``).
3. Guarded broadcast: while the eval gram set is provably small (row-count
   guard, like every other small side in this repo) it ships ONCE via
   ``ray.put`` and train shingles filter against it inside ``map_batches``;
   past the guard it falls back to a distributed hash join on the gram —
   the train side is never materialized on the driver either way.
4. Per-doc shared-gram counts via one coarse-bucket aggregate
   (``bucketed_aggregate``), so a 10^9-doc contaminated set never funnels
   through per-group Python dispatch.

Tokenization contract: ``text.split(' ')`` — exactly DuckDB
``string_split(text, ' ')`` — so the oracle is expressible in pure SQL
(list-slice n-grams over the split array).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EVAL_BROADCAST_MAX_ROWS = 5_000_000  # ~100s of MB of grams; past this, join


def _doc_grams(text, n: int) -> set:
    """DISTINCT n-grams of one doc — THE tokenization contract
    (``text.split(' ')`` == SQL ``string_split(text, ' ')``); every consumer
    funnels through here so the contract cannot drift between plans."""
    toks = (text or "").split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _shingle_rows(texts: list, ids: np.ndarray, n: int):
    """Per-doc DISTINCT n-grams (space-joined token windows)."""
    out_ids: list[int] = []
    out_grams: list[str] = []
    for did, text in zip(ids, texts):
        grams = _doc_grams(text, n)
        out_ids.extend([int(did)] * len(grams))
        out_grams.extend(grams)
    return out_ids, out_grams


def ngram_contamination(
    docs,
    eval_sources,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    eval_broadcast_max: int = EVAL_BROADCAST_MAX_ROWS,
    num_buckets: int = 64,
):
    """(doc_id, n_shared) for every TRAIN doc (source not in ``eval_sources``)
    sharing >= 1 distinct n-token gram with any EVAL doc; ``n_shared`` is the
    number of DISTINCT shared grams. Sorted by doc_id."""
    import ray

    from text_to_graph_ray.functions.agg import bucketed_aggregate, distinct_rows

    eval_set = frozenset(eval_sources)
    gram_schema = pa.schema([("g", pa.string())])
    pair_schema = pa.schema([(id_col, pa.int64()), ("g", pa.string())])
    out_schema = pa.schema([(id_col, pa.int64()), ("n_shared", pa.int64())])

    def shingles(want_eval: bool):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return (gram_schema if want_eval else pair_schema).empty_table()
            src = b.column(source_col).to_pylist()
            keep = np.array([(s in eval_set) == want_eval for s in src], dtype=bool)
            ids = np.asarray(b.column(id_col).to_pylist(), dtype=np.int64)[keep]
            texts = [t for t, k in zip(b.column(text_col).to_pylist(), keep) if k]
            out_ids, out_grams = _shingle_rows(texts, ids, n)
            if want_eval:
                return pa.table({"g": pa.array(sorted(set(out_grams)), type=pa.string())})
            return pa.table(
                {id_col: pa.array(out_ids, type=pa.int64()), "g": pa.array(out_grams, type=pa.string())}
            )

        return fn

    eval_grams = distinct_rows(
        docs.map_batches(shingles(True), batch_format="pyarrow"), ["g"], gram_schema, num_buckets=num_buckets
    ).materialize()  # small by contract (eval split); guarded below

    from text_to_graph_ray.util import sort_coalesced

    n_eval = eval_grams.count()
    if n_eval <= eval_broadcast_max:
        # Each document is ROW-ATOMIC (all its grams live in the batch holding
        # its row) and per-doc grams are already distinct, so the per-doc
        # shared-gram count is exact WITHIN the batch: shingle -> membership
        # filter -> count, ONE fused UDF, zero exchanges. (Also avoids Ray's
        # fused-chain empty-batch drop, which emits schema-less blocks when a
        # mid-chain stage empties a block.)
        ref = ray.put(
            frozenset(g for b in eval_grams.iter_batches(batch_format="pyarrow") for g in b.column("g").to_pylist())
        )

        def count_shared(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            gset = ray.get(ref)
            src = b.column(source_col).to_pylist()
            ids = b.column(id_col).to_pylist()
            out_ids: list[int] = []
            out_n: list[int] = []
            for did, s, text in zip(ids, src, b.column(text_col).to_pylist()):
                if s in eval_set:
                    continue
                shared_n = sum(1 for g in _doc_grams(text, n) if g in gset)
                if shared_n:
                    out_ids.append(int(did))
                    out_n.append(shared_n)
            return pa.table(
                {id_col: pa.array(out_ids, type=pa.int64()), "n_shared": pa.array(out_n, type=pa.int64())}
            )

        return sort_coalesced(docs.map_batches(count_shared, batch_format="pyarrow"), id_col)

    from text_to_graph_ray.functions.dedup import join_partitions_for

    train_sh = docs.map_batches(shingles(False), batch_format="pyarrow")
    shared = train_sh.join(
        eval_grams,
        join_type="inner",
        num_partitions=join_partitions_for(),
        on=("g",),
        partition_size_hint=32 << 20,
    )
    out = bucketed_aggregate(
        shared,
        id_col,
        {"n_shared": ("g", "size")},
        out_schema=out_schema,
        num_buckets=num_buckets,
        in_schema=pair_schema,
    )
    return sort_coalesced(out, id_col)
