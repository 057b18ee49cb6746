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
    """Materialize the packed training stream: every token (hash id =
    crc32(token) %% vocab) lands at its global position; documents crossing a
    sequence boundary split into per-sequence SPANS inside ``map_batches``;
    one ``groupby(seq_id)`` assembles fixed-length sequences. Returns a
    compact per-sequence summary (seq_id, n_filled, tok_sum) — enough for an
    exact oracle without shipping the exploded stream to the driver."""
    import pandas as pd
    import zlib

    from text_to_graph_ray.functions.dedup import join_partitions_for

    offs = sequence_pack_offsets(ds, seq_len=seq_len, id_col=id_col, text_col=text_col)
    texts = ds.map_batches(
        lambda b: pa.table({id_col: b.column(id_col), "__text": b.column(text_col)}), batch_format="pyarrow"
    )
    j = offs.join(
        texts, join_type="inner", num_partitions=join_partitions_for(), on=(id_col,), partition_size_hint=32 << 20
    )

    def spans(b: pa.Table) -> pa.Table:
        # token-id kernel, vectorized: split stays C-level (str.split), then
        # the batch's tokens are dictionary-encoded so crc32 runs ONCE per
        # DISTINCT token (vocabulary-sized, not corpus-sized) and the
        # corpus-sized id stream is a single numpy gather
        tok_lists = [(t or "").split() for t in b.column("__text").to_pylist()]
        flat = [tok for toks in tok_lists for tok in toks]
        if flat:
            enc = pa.array(flat, type=pa.string()).dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            uhash = np.fromiter((zlib.crc32(u.encode("utf-8")) for u in uniq), dtype=np.int64, count=len(uniq)) % vocab
            flat_ids = uhash[np.asarray(enc.indices)]
        else:
            flat_ids = np.array([], dtype=np.int64)
        seq_ids, poss, id_chunks = [], [], []
        start = 0
        for off, toks in zip(b.column("offset").to_pylist(), tok_lists):
            n = len(toks)
            ids = flat_ids[start : start + n]
            start += n
            i = 0
            while i < n:  # O(#spans) = O(n/seq_len + 1), not O(tokens)
                pos = (off + i) % seq_len
                take = min(seq_len - pos, n - i)
                seq_ids.append((off + i) // seq_len)
                poss.append(pos)
                id_chunks.append(ids[i : i + take])
                i += take
        values = np.concatenate(id_chunks) if id_chunks else np.array([], dtype=np.int64)
        offsets = np.zeros(len(id_chunks) + 1, dtype=np.int32)
        if id_chunks:
            np.cumsum([len(c) for c in id_chunks], out=offsets[1:])
        ids_col = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int64()))
        return pa.table(
            {
                "seq_id": pa.array(seq_ids, type=pa.int64()),
                "pos": pa.array(poss, type=pa.int64()),
                "ids": ids_col,
            }
        )

    def assemble(g: pd.DataFrame) -> pa.Table:
        chunks = [np.asarray(ids, dtype=np.int64) for ids in g["ids"]]
        flat = np.concatenate(chunks) if chunks else np.array([], dtype=np.int64)
        return pa.table(
            {
                "seq_id": pa.array([int(g["seq_id"].iloc[0])], type=pa.int64()),
                "n_filled": pa.array([int(flat.size)], type=pa.int64()),
                "tok_sum": pa.array([int(flat.sum())], type=pa.int64()),
            }
        )

    return (
        j.map_batches(spans, batch_format="pyarrow")
        .groupby("seq_id")
        .map_groups(assemble, batch_format="pandas")
        .sort("seq_id")
    )
