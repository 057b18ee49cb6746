"""Bloom-filter semi/anti key filtering — the broadcast that never grows.

``joins.filter_by_keys`` broadcasts the right side's DISTINCT keys while they
fit ``broadcast_max`` and falls back to a full distributed hash join past it.
Between those regimes sits the classic 100-TB pattern this module provides: a
right side too big to ship as raw keys (hundreds of millions of ids) filtering
a left stream that should never have to shuffle. A Bloom filter over the right
keys is FIXED-SIZE (``bits_per_key`` bits per distinct key, ~1.25 MB per
million keys at the default 10/7 parameters, ~0.8% false-positive rate) and
OR-mergeable, so it builds distributedly and broadcasts once via ``ray.put``.

Exactness is preserved by routing only the Bloom-*maybe* rows through an exact
join (``filter_by_keys``, itself guarded broadcast-vs-distributed):

* ``mode="semi"``  — keep left rows whose key IS in right. Bloom-negative rows
  are definitely absent and drop immediately; the survivors (true matches +
  ~FP-rate of non-matches) go through the exact semijoin. ONE pass over left
  plus a join whose left input is already ~|matches|.
* ``mode="anti"``  — keep left rows whose key is NOT in right. Bloom-negative
  rows are definitely-keep and pass through exchange-free (this is the common
  curation shape: most of the corpus is not on the blocklist); only the maybes
  (matches + FPs) go through the exact anti join, and the two branches union.
  Costs two scans of ``left`` (the branches re-execute the read) — the trade
  is two cheap column-pruned scans against shuffling the full stream, which
  at corpus scale is the right side of the ledger. Pass a materialized
  ``left`` to scan once.

``exact=False`` skips the verification join and returns the raw Bloom
decision — approximate (semi keeps ~FP-rate extra rows; anti drops them),
useful when downstream tolerates it (e.g. candidate generation).

Hashing: ``pd.util.hash_pandas_object`` (SipHash, fixed key — deterministic
across processes/machines, vectorized in C, any key dtype) gives h1; h2 is a
splitmix64 remix of h1 (pandas' numeric hashing ignores ``hash_key``, so a
second seeded call would NOT be independent for int keys). Bit positions are
``(h1 + i*h2) % m`` (Kirsch-Mitzenmacher double hashing), h2 forced odd.

Contract: ``key`` is non-null on both sides (same as filter_by_keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _hash_pair(table: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hashes of one column, vectorized, process-stable."""
    h1 = pd.util.hash_pandas_object(table.select([col]).to_pandas()[col], index=False).to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (h1 ^ (h1 >> np.uint64(30))) * _SPLITMIX_1 + _GOLDEN
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_2
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd: never cycles on one slot
    return h1, h2


def _set_bits(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray, num_hashes: int) -> None:
    m = np.uint64(bitmap.size * 8)
    with np.errstate(over="ignore"):
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64), (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray, num_hashes: int) -> np.ndarray:
    m = np.uint64(bitmap.size * 8)
    hit = np.ones(len(h1), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % m
            hit &= (bitmap[(idx >> np.uint64(3)).astype(np.int64)] & (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8)) != 0
    return hit


def build_bloom(right, key: str, bits_per_key: int = 10, num_hashes: int = 7,
                expected_keys: int | None = None):
    """Distributed Bloom build: per-batch partial bitmaps OR-merged on the
    driver in a stream (two bitmaps resident, never blocks × bitmap). Returns
    (bitmap ObjectRef, num_hashes, bitmap_bytes). ``expected_keys`` skips the
    sizing count when the caller already knows the cardinality (an upper
    bound is fine — oversizing only lowers the FP rate)."""
    import ray

    n = expected_keys if expected_keys is not None else right.count()
    m_bits = max(8 * 1024, int(n) * bits_per_key)
    m_bytes = (m_bits + 7) // 8

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(m_bytes, dtype=np.uint8)
        if b.num_rows and key in b.schema.names:
            h1, h2 = _hash_pair(b, key)
            _set_bits(bm, h1, h2, num_hashes)
        return pa.table({"bloom": pa.array([bm.tobytes()], type=pa.binary())})

    merged = np.zeros(m_bytes, dtype=np.uint8)
    partials = right.map_batches(partial, batch_format="pyarrow")
    for batch in partials.iter_batches(batch_size=1, batch_format="pyarrow"):
        for blob in batch.column("bloom").to_pylist():
            np.bitwise_or(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return ray.put(merged), num_hashes, m_bytes


def bloom_filter_by_keys(left, right, key: str, right_key: str | None = None,
                         mode: str = "semi", bits_per_key: int = 10,
                         num_hashes: int = 7, exact: bool = True,
                         expected_keys: int | None = None):
    """Semi/anti filter of ``left`` on ``key`` ∈/∉ ``right[right_key]`` via a
    broadcast Bloom filter, exact by construction when ``exact=True`` (the
    default — Bloom maybes are verified by ``joins.filter_by_keys``, itself
    guarded broadcast-vs-distributed). See module docstring for the plan."""
    import ray

    from text_to_graph_ray.functions.joins import filter_by_keys

    right_key = right_key or key
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    ref, k, _ = build_bloom(right, right_key, bits_per_key, num_hashes, expected_keys)

    def _mask(b: pa.Table, keep_maybe: bool) -> pa.Table:
        if b.num_rows == 0:
            return b
        bm = ray.get(ref)
        h1, h2 = _hash_pair(b, key)
        hit = _test_bits(bm, h1, h2, k)
        return b.filter(pa.array(hit if keep_maybe else ~hit))

    maybes = left.map_batches(lambda b: _mask(b, True), batch_format="pyarrow")
    if mode == "semi":
        return filter_by_keys(maybes, right, key, right_key, mode="semi") if exact else maybes
    definite_out = left.map_batches(lambda b: _mask(b, False), batch_format="pyarrow")
    if not exact:
        return definite_out
    return definite_out.union(filter_by_keys(maybes, right, key, right_key, mode="anti"))
