"""Sequence packing for LM training: lay the corpus end-to-end in id order
and cut it into fixed-length training sequences.

The hard part at scale is the GLOBAL weighted prefix-sum (every document
needs the total token count of everything before it). The Dataset API has no
cumsum, so this drops to the same raw-Ray block-offset pattern as
``canonicalize.add_dense_index``: per-block token sums are collected as
metadata (#blocks numbers — not data), prefix-summed on the driver, and each
block adds its base offset to an intra-block cumulative sum. No data leaves
the object store; driver work is O(#blocks).

Output is per-document placement — (doc_id, n_tokens, offset, seq_id,
seq_pos) — which a downstream tokenizing writer can consume independently per
block; the exploded token stream is never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sequence_pack_offsets(ds, seq_len: int = 1024, id_col: str = "doc_id", text_col: str = "text"):
    """-> (doc_id, n_tokens, offset, seq_id, seq_pos) sorted by id.
    offset = tokens before this doc; seq_id/seq_pos = where the doc's first
    token lands in the packed fixed-length sequence stream."""
    import ray
    import ray.data as rd

    def count_tokens(b: pa.Table) -> pa.Table:
        n = [len((t or "").split()) for t in b.column(text_col).to_pylist()]
        return pa.table({id_col: b.column(id_col), "n_tokens": pa.array(n, type=pa.int64())})

    counted = ds.map_batches(count_tokens, batch_format="pyarrow").sort(id_col).materialize()
    refs = counted.to_arrow_refs()

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "n_tokens" not in t.schema.names:  # empty sort outputs lose their schema
            return 0
        return int(pc.sum(t.column("n_tokens")).as_py() or 0)

    sums = ray.get([block_sum.remote(r) for r in refs])
    bases = []
    total = 0
    for s in sums:
        bases.append(total)
        total += s

    @ray.remote
    def with_offsets(t: pa.Table, base: int, sl: int) -> pa.Table:
        if t.num_rows == 0 or "n_tokens" not in t.schema.names:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "offset": pa.array([], type=pa.int64()),
                    "seq_id": pa.array([], type=pa.int64()),
                    "seq_pos": pa.array([], type=pa.int64()),
                }
            )
        n = np.asarray(t.column("n_tokens"), dtype=np.int64)
        intra = np.concatenate(([0], np.cumsum(n)[:-1])) if len(n) else np.array([], dtype=np.int64)
        off = base + intra
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": t.column("n_tokens"),
                "offset": pa.array(off, type=pa.int64()),
                "seq_id": pa.array(off // sl, type=pa.int64()),
                "seq_pos": pa.array(off % sl, type=pa.int64()),
            }
        )

    out_refs = [with_offsets.remote(r, b, seq_len) for r, b in zip(refs, bases)]
    return rd.from_arrow_refs(out_refs)


def packed_sequences(ds, seq_len: int = 1024, vocab: int = 32768, id_col: str = "doc_id", text_col: str = "text"):
    """Per-sequence summary (seq_id, n_filled, tok_sum) of the packed
    training stream (token hash id = crc32(token) %% vocab).

    Key observation: after ONE sort of (id, text) by id, the packed stream is
    literally the concatenation of the sorted blocks — the global position of
    the k-th token of a block is ``base + k`` where ``base`` is the prefix
    sum of earlier blocks' token counts. So per-sequence partials fall out of
    a single ``np.add.reduceat`` over each block's flat token-id array at the
    sequence boundaries, and only those partials (~tokens/seq_len + #blocks
    rows) reach the final exchange. No corpus-sized join, no token lists
    crossing the network; driver work is O(#blocks) prefix-summing."""
    import zlib

    import ray
    import ray.data as rd

    from text_to_graph_ray.functions.agg import bucketed_aggregate

    sel = ds.map_batches(
        lambda b: pa.table({id_col: b.column(id_col), "__t": b.column(text_col)}), batch_format="pyarrow"
    )
    blocks = sel.sort(id_col).materialize().to_arrow_refs()

    @ray.remote(num_returns=2)
    def tokenize(t: pa.Table):
        # split stays C-level; crc32 runs once per DISTINCT token via
        # dictionary-encode, the corpus-sized id stream is one numpy gather
        if t.num_rows == 0 or "__t" not in t.schema.names:  # empty sort outputs lose their schema
            return np.array([], dtype=np.int64), 0
        flat = [tok for s in t.column("__t").to_pylist() for tok in (s or "").split()]
        if not flat:
            return np.array([], dtype=np.int64), 0
        enc = pa.array(flat, type=pa.string()).dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        uhash = np.fromiter((zlib.crc32(u.encode("utf-8")) for u in uniq), dtype=np.int64, count=len(uniq)) % vocab
        ids = uhash[np.asarray(enc.indices)]
        return ids, int(ids.size)

    tok_refs = [tokenize.remote(r) for r in blocks]
    totals = ray.get([t[1] for t in tok_refs])
    bases = np.concatenate(([0], np.cumsum(totals, dtype=np.int64)[:-1])) if totals else np.array([], dtype=np.int64)

    out_schema = pa.schema([("seq_id", pa.int64()), ("n_filled", pa.int64()), ("tok_sum", pa.int64())])

    @ray.remote
    def seq_partials(ids: np.ndarray, base: int, sl: int) -> pa.Table:
        total = ids.size
        if total == 0:
            return out_schema.empty_table()
        first = (-base) % sl  # offset of the first sequence boundary inside this block
        bnds = np.arange(first, total, sl, dtype=np.int64)
        if first != 0:
            bnds = np.concatenate(([np.int64(0)], bnds))
        return pa.table(
            {
                "seq_id": pa.array(base // sl + np.arange(len(bnds), dtype=np.int64), type=pa.int64()),
                "n_filled": pa.array(np.diff(np.append(bnds, total)), type=pa.int64()),
                "tok_sum": pa.array(np.add.reduceat(ids, bnds), type=pa.int64()),
            }
        )

    part_refs = [seq_partials.remote(t[0], int(b), seq_len) for t, b in zip(tok_refs, bases)]
    # a sequence straddling a block boundary contributes one partial per block
    n_seqs = int(sum(totals)) // seq_len + 1
    merged = bucketed_aggregate(
        rd.from_arrow_refs(part_refs),
        "seq_id",
        {"n_filled": ("n_filled", "sum"), "tok_sum": ("tok_sum", "sum")},
        out_schema=out_schema,
        num_buckets=max(2, min(64, n_seqs // 100_000 + 2)),
    )
    return merged.sort("seq_id")
